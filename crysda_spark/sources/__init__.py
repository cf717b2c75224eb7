from .readers import (
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
from .sinks import write_csv, write_json, write_parquet, write_xml

__all__ = [
    "read_csv", "read_json", "read_parquet", "read_jdbc",
    "read_orc", "read_text", "read_warc", "read_xml",
    "dataframe_of", "from_records", "from_json", "empty_df",
    "write_csv", "write_json", "write_parquet", "write_xml",
]
