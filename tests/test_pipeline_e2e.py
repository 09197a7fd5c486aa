"""Golden end-to-end: Spark pipeline output == plain-pandas oracle on the
seed-fixed synthetic corpus (FIXTURES F1/F5). This validates the
distributed plumbing: explode, offset-rank ordering, Arrow batching,
salted repartition, reassembly, error isolation."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from german_ocr_spark.golden import golden_extract
from german_ocr_spark.operators.extract import extract_pipeline, reassemble
from german_ocr_spark.synth import docs_to_spark, synth_docs

N_DOCS = 120


def _collect_sorted(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return (
        pdf.sort_values(["doc_id", "order"])
        .reset_index(drop=True)
        .astype({"order": "int64"})
    )


def test_span_sequence_equality(spark):
    docs = synth_docs(N_DOCS, seed=42, heavy_every=50, heavy_spans=(30, 60))
    sdf = docs_to_spark(spark, docs)
    out = extract_pipeline(sdf, salt_partitions=16)
    got = _collect_sorted(out)
    want = golden_extract(docs).astype({"order": "int64"})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_error_isolation(spark):
    """Malformed html span → (text='', error set); all other spans of the
    corpus unaffected; job exits cleanly (reference semantics A6)."""
    docs = synth_docs(10, seed=42)  # doc 3 carries the malformed html span
    sdf = docs_to_spark(spark, docs)
    out = extract_pipeline(sdf).cache()
    bad = out.filter(F.col("error").isNotNull()).collect()
    assert len(bad) == 1
    assert bad[0].doc_id == "doc-00000003"
    assert bad[0].text == ""
    assert "malformed" in bad[0].error
    assert out.filter(F.col("error").isNull()).count() > 0
    out.unpersist()


def test_unsorted_offsets_reordered(spark):
    docs = synth_docs(10, seed=42)
    sdf = docs_to_spark(spark, docs)
    out = extract_pipeline(sdf)
    rows = (
        out.filter(F.col("doc_id") == "doc-00000004")
        .orderBy("order")
        .select("text")
        .collect()
    )
    assert [r.text for r in rows] == ["erster Teil", "zweiter Teil", "dritter Teil"]


def test_empty_spans_doc_absent(spark):
    docs = synth_docs(10, seed=42)
    sdf = docs_to_spark(spark, docs)
    out = extract_pipeline(sdf)
    assert out.filter(F.col("doc_id") == "doc-00000001").count() == 0


def test_reassemble_roundtrip(spark):
    docs = synth_docs(40, seed=7, edge_cases=False, heavy_every=0)
    sdf = docs_to_spark(spark, docs)
    extracted = extract_pipeline(sdf)
    docs_out = reassemble(extracted)
    row = docs_out.filter(F.col("doc_id") == "doc-00000000").collect()[0]
    orders = [s["order"] for s in row.spans]
    assert orders == sorted(orders) == list(range(len(orders)))
    assert row.span_count == len(orders)
    assert row.error_count == 0
