"""Multimodal column plumbing: binary payload layout, Arrow-batched
decode kernels, frame sampling. Codecs are stubbed (no PIL/ffmpeg in
the container); these tests pin the distributed plan shape — schema,
batch flow, row multiplicity — which is codec-independent."""

from __future__ import annotations

from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.pipeline import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"


def _payloads(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return mm.attach_binary(
        Frame(docs.withColumn("payload", F.encode("text", "utf-8"))),
        "doc_id", "payload")


def test_attach_binary_layout(spark):
    f = _payloads(spark)
    assert [x[0] for x in f.sdf.dtypes] == ["id", "payload", "meta"]
    assert dict(f.sdf.dtypes)["payload"] == "binary"
    row = f.sdf.filter(F.col("id") == 0).collect()[0]
    assert int(row.meta["bytes"]) == len(row.payload)


def test_decode_images_schema_and_determinism(spark):
    f = _payloads(spark)
    out = mm.decode_images(f, n_feat=8)
    assert out.sdf.schema.simpleString() == \
        "struct<id:bigint,width:int,height:int,channels:int,features:array<float>>"
    rows = out.sdf.limit(50).collect()
    assert all(len(r.features) == 8 for r in rows)
    assert all(abs(sum(r.features) - 1.0) < 1e-5 for r in rows)
    # deterministic kernel: same input → same features
    again = {r.id: r.features for r in mm.decode_images(f, n_feat=8)
             .sdf.limit(50).collect()}
    assert all(again[r.id] == r.features for r in rows)


def test_sample_frames_multiplicity(spark):
    f = _payloads(spark)
    out = mm.sample_frames(f)
    n_in = f.sdf.count()
    got = out.sdf.agg(F.count(F.lit(1)).alias("n"),
                      F.min("frame_idx").alias("lo")).collect()[0]
    assert got.n == n_in and got.lo == 0
    assert out.sdf.schema == mm.FRAME_SCHEMA
