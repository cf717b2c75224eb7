"""crysda_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of naqvis/CrysDA (reference read-only at
/root/reference), re-expressed Spark-first.

Architecture (SURVEY.md §7): an immutable ``Frame`` wrapper over a lazy
``pyspark.sql.DataFrame``; grouping as wrapper metadata; every verb a
declarative DataFrame op that Catalyst/AQE optimize; Pandas UDFs only
where built-ins can't express the semantics (row-wise predicates,
multimodal decode).

Beyond the reference surface: LLM-data-pipeline operators
(``crysda_spark.pipeline``: dedup, similarity search, text analysis,
multimodal plumbing) and Structured Streaming (``crysda_spark.streaming``).
"""

from .frame import Ctx, Frame
from .session import get_spark
from .sources import (
    dataframe_of,
    empty_df,
    from_json,
    from_records,
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    read_warc,
    read_xml,
)
from .sources.sinks import write_csv, write_json, write_parquet, write_xml

__version__ = "0.1.0"

__all__ = [
    "Frame", "Ctx", "get_spark",
    "read_csv", "read_json", "read_parquet", "read_jdbc", "read_orc", "read_text", "read_warc",
    "read_xml",
    "dataframe_of", "from_records", "from_json", "empty_df",
    "write_csv", "write_json", "write_parquet", "write_xml",
    "bind_rows", "bind_cols",
]


def bind_rows(*frames):
    from .operators.setops import bind_rows as _br
    return _br(*frames)


def bind_cols(left, right, rename_duplicates: bool = True):
    from .operators.setops import bind_cols as _bc
    return _bc(left, right, rename_duplicates)
