"""Golden print/schema formatter output (reference style:
src/crysda/dataframe.cr:603-664; golden specs spec/core_spec.cr:426-493)."""

from __future__ import annotations

from crysda_spark import from_records
from crysda_spark.functions.format import render, schema_str


def _df(spark):
    return from_records(spark, [
        {"name": "Cheetah", "vore": "carni", "rem": None},
        {"name": "Owl monkey", "vore": "omni", "rem": 1.8},
        {"name": "Cow", "vore": "herbi", "rem": 0.7},
    ], order=["name", "vore", "rem"])


def test_render_golden(spark):
    got = render(_df(spark), title="sleep")
    assert got == "\n".join([
        "sleep: 3 x 3",
        "        name    vore    rem",
        "1    Cheetah   carni   <NA>",
        "2 Owl monkey    omni    1.8",
        "3        Cow   herbi    0.7",
    ])


def test_render_more_rows_footer(spark):
    f = from_records(spark, [{"x": i} for i in range(15)])
    got = render(f.sort_by("x"), title="t", max_rows=10)
    assert got.splitlines()[0] == "t: 15 x 3" or got.splitlines()[0] == "t: 15 x 1"
    assert got.splitlines()[-1] == "and 5 more rows"


def test_render_hidden_variables_footer(spark):
    f = from_records(spark, [{f"col_{i}": "v" * 20 for i in range(10)}])
    got = render(f, title="wide", max_width=60)
    assert "more variables:" in got.splitlines()[-1]


def test_render_groups_line(spark):
    got = render(_df(spark).group_by("vore"), title="g")
    assert got.splitlines()[1] == "Groups: vore"


def test_schema_str(spark):
    got = schema_str(_df(spark))
    lines = got.splitlines()
    assert lines[0] == "DataFrame with 3 observations"
    assert lines[1].startswith("name  [string]")
    assert "<NA>" in lines[3]  # null rem rendered as sentinel
