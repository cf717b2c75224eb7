"""Snapshot MERGE / upsert (operators/merge.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.operators.merge import merge_into


@pytest.fixture()
def frames(spark):
    target = Frame(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double"))
    source = Frame(spark.createDataFrame(
        [(2, "b2", 200.0),     # update
         (3, "c2", -1.0),      # matched; delete_condition target
         (9, "i", 90.0)],      # insert
        "k long, name string, v double"))
    return target, source


def _snap(frame):
    return sorted(tuple(r) for r in frame.sdf.collect())


def test_merge_update_insert(frames):
    t, s = frames
    out = _snap(merge_into(t, s, on="k"))
    assert out == [(1, "a", 10.0), (2, "b2", 200.0), (3, "c2", -1.0),
                   (9, "i", 90.0)]


def test_merge_with_delete_condition(frames):
    t, s = frames
    out = _snap(merge_into(t, s, on="k", delete_condition=F.col("v") < 0))
    assert out == [(1, "a", 10.0), (2, "b2", 200.0), (9, "i", 90.0)]


def test_merge_keep_and_ignore(frames):
    t, s = frames
    out = _snap(merge_into(t, s, on="k", when_matched="keep",
                           when_not_matched="ignore"))
    assert out == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]


def test_merge_null_values_survive_presence_tracking(spark):
    """Rows whose VALUE columns are null must not be confused with
    join-miss nulls — presence flags, not value nullness, drive the
    branch."""
    t = Frame(spark.createDataFrame([(1, None), (2, "x")],
                                    "k long, name string"))
    s = Frame(spark.createDataFrame([(2, None), (5, None)],
                                    "k long, name string"))
    out = _snap(merge_into(t, s, on="k"))
    assert out == [(1, None), (2, None), (5, None)]


def test_merge_rejects_mismatched_columns(spark, frames):
    t, _ = frames
    bad = Frame(t.sdf.withColumnRenamed("v", "w"))
    with pytest.raises(ValueError, match="column sets differ"):
        merge_into(t, bad, on="k")


def test_merge_rejects_bad_modes(frames):
    t, s = frames
    with pytest.raises(ValueError, match="when_matched"):
        merge_into(t, s, on="k", when_matched="explode")
    with pytest.raises(ValueError, match="when_not_matched"):
        merge_into(t, s, on="k", when_not_matched="explode")
    with pytest.raises(ValueError, match="not in columns"):
        merge_into(t, s, on="zz")


def test_merge_rejects_duplicate_source_keys(frames, spark):
    t, _ = frames
    dup = Frame(spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "k long, name string, v double"))
    with pytest.raises(Exception, match="duplicate source key"):
        merge_into(t, dup, on="k").sdf.collect()
    # escape hatch for pre-deduped feeds: no assertion in the plan
    out = merge_into(t, dup, on="k", validate_source_unique=False)
    assert out.sdf.count() == 4  # fan-out happens, caller opted in


# ------------------------------------------------------------ SCD2
def _scd_dim(spark):
    rows = [
        # cust 1: one closed + one open version
        (1, "street A", "gold",   "2023-01-01 00:00:00", "2023-06-01 00:00:00", False),
        (1, "street B", "gold",   "2023-06-01 00:00:00", None, True),
        # cust 2: single open version
        (2, "road X",   "silver", "2023-02-01 00:00:00", None, True),
        # cust 3: fully closed history, no open version
        (3, "gone St",  "tin",    "2023-01-01 00:00:00", "2023-03-01 00:00:00", False),
    ]
    df = spark.createDataFrame(
        rows, "cust long, addr string, tier string, valid_from string, "
              "valid_to string, is_current boolean")
    return Frame(df.withColumn("valid_from", F.col("valid_from").cast("timestamp"))
                 .withColumn("valid_to", F.col("valid_to").cast("timestamp")))


def test_scd2_apply_versions(spark):
    from crysda_spark.operators.merge import scd2_apply
    dim = _scd_dim(spark)
    changes = Frame(spark.createDataFrame(
        [(1, "street B", "platinum"),   # tier changed → new version
         (2, "road X", "silver"),       # unchanged → no-op
         (9, "new Ave", "tin")],        # unseen key → first version
        "cust long, addr string, tier string"))
    out = scd2_apply(dim, changes, "cust", "2024-01-01 00:00:00")
    rows = sorted(((r["cust"], str(r["valid_from"]),
                    str(r["valid_to"]), r["is_current"], r["tier"])
                   for r in out.sdf.collect()))
    # cust 1: old closed row + previously-open row now closed + new open
    c1 = [r for r in rows if r[0] == 1]
    assert len(c1) == 3
    assert ("2023-06-01 00:00:00", "2024-01-01 00:00:00", False) in \
        {(r[1], r[2], r[3]) for r in c1}
    assert ("2024-01-01 00:00:00", "None", True, "platinum") in \
        {(r[1], r[2], r[3], r[4]) for r in c1}
    # cust 2 untouched; cust 3 history untouched; cust 9 inserted open
    assert sum(1 for r in rows if r[0] == 2) == 1
    assert [r for r in rows if r[0] == 3][0][3] is False
    c9 = [r for r in rows if r[0] == 9]
    assert len(c9) == 1 and c9[0][3] is True and c9[0][1] == "2024-01-01 00:00:00"
    # exactly one open version per changed/inserted key
    open_counts = {r[0]: 0 for r in rows}
    for r in rows:
        open_counts[r[0]] += int(r[3])
    assert open_counts == {1: 1, 2: 1, 3: 0, 9: 1}


def test_scd2_apply_is_idempotent_on_replay(spark):
    from crysda_spark.operators.merge import scd2_apply
    dim = _scd_dim(spark)
    changes = Frame(spark.createDataFrame(
        [(1, "street C", "gold")], "cust long, addr string, tier string"))
    once = scd2_apply(dim, changes, "cust", "2024-01-01 00:00:00")
    twice = scd2_apply(once, changes, "cust", "2024-02-01 00:00:00")
    # replaying the SAME state later must not fork another version
    assert twice.sdf.count() == once.sdf.count()


def test_scd2_null_safe_attribute_compare(spark):
    from crysda_spark.operators.merge import scd2_apply
    dim = Frame(spark.createDataFrame(
        [(1, None, "2023-01-01 00:00:00", None, True)],
        "k long, v string, valid_from string, valid_to string, "
        "is_current boolean")
        .withColumn("valid_from", F.col("valid_from").cast("timestamp"))
        .withColumn("valid_to", F.col("valid_to").cast("timestamp")))
    same = Frame(spark.createDataFrame([(1, None)], "k long, v string"))
    out = scd2_apply(dim, same, "k", "2024-01-01 00:00:00")
    assert out.sdf.count() == 1  # NULL == NULL for change detection
    diff = Frame(spark.createDataFrame([(1, "x")], "k long, v string"))
    out2 = scd2_apply(dim, diff, "k", "2024-01-01 00:00:00")
    assert out2.sdf.count() == 2  # NULL → 'x' IS a change


def test_scd2_duplicate_change_key_fails_lazily(spark):
    import pytest
    from crysda_spark.operators.merge import scd2_apply
    dim = _scd_dim(spark)
    dup = Frame(spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "y")], "cust long, addr string, tier string"))
    out = scd2_apply(dim, dup, "cust", "2024-01-01 00:00:00")
    with pytest.raises(Exception, match="duplicate change key"):
        out.sdf.collect()


def test_scd2_schema_validation(spark):
    import pytest
    from crysda_spark.operators.merge import scd2_apply
    dim = _scd_dim(spark)
    with pytest.raises(ValueError, match="SCD column"):
        scd2_apply(Frame(dim.sdf.drop("is_current")),
                   Frame(dim.sdf.select("cust", "addr")), "cust",
                   "2024-01-01 00:00:00")
    with pytest.raises(ValueError, match="must not carry"):
        scd2_apply(dim, Frame(dim.sdf.select("cust", "is_current")),
                   "cust", "2024-01-01 00:00:00")
    with pytest.raises(ValueError, match="align schemas"):
        scd2_apply(dim, Frame(dim.sdf.select("cust", "addr")), "cust",
                   "2024-01-01 00:00:00")


def test_scd2_random_batches_match_reference_model(spark):
    """Property: applying k random change batches sequentially must
    equal a dict-based SCD2 reference model — versions, validity
    windows, and current flags all exact. Deterministic seed; covers
    change/no-change/new-key interleavings the handwritten cases
    can't enumerate."""
    import random
    from crysda_spark.operators.merge import scd2_apply
    rnd = random.Random(77)
    keys = list(range(6))
    vals = ["a", "b", "c", None]

    # reference: key -> list of [vf, vt, v, current]
    ref: dict[int, list] = {}

    def ref_apply(batch, ts):
        for k, v in batch.items():
            versions = ref.setdefault(k, [])
            cur = next((x for x in versions if x[3]), None)
            if cur is None:
                versions.append([ts, None, v, True])
            elif cur[2] != v:
                cur[1], cur[3] = ts, False
                versions.append([ts, None, v, True])

    dim = Frame(spark.createDataFrame(
        [], "k long, v string, valid_from timestamp, valid_to timestamp, "
            "is_current boolean"))
    for step in range(4):
        ts = f"2024-0{step + 1}-01 00:00:00"
        batch = {k: rnd.choice(vals)
                 for k in rnd.sample(keys, rnd.randint(1, 5))}
        ref_apply(batch, ts)
        changes = Frame(spark.createDataFrame(
            [(k, v) for k, v in batch.items()], "k long, v string"))
        dim = scd2_apply(dim, changes, "k", ts)
    got = sorted((r["k"], str(r["valid_from"]), str(r["valid_to"]),
                  r["v"], r["is_current"]) for r in dim.sdf.collect())
    want = sorted((k, f"{vf}", f"{vt}" if vt else "None", v, cur)
                  for k, versions in ref.items()
                  for vf, vt, v, cur in versions)
    assert got == want
