"""v2 document-intelligence operator (operators/docintel.py): per-block
bounding boxes + XY-cut reading rank through the distributed pipeline
(reference README.md:241-252 template contract)."""

from __future__ import annotations

import pandas as pd

from german_ocr_spark.kernels.parse import serialize_records
from german_ocr_spark.operators.docintel import (
    document_intelligence,
    golden_docintel,
)
from german_ocr_spark.synth import docs_to_spark, synth_docs


def _doc(doc_id: str, blocks: list[list]) -> tuple:
    return (doc_id, [("pdf", serialize_records(blocks), "", 0)])


def test_two_column_reading_order_and_bboxes(spark):
    # two-column page: naive (y, x) order interleaves the columns; the
    # XY-cut rank must read the whole left column, then the right one
    blocks = [
        [1, 50.0, 20.0, 550.0, 35.0, "header"],
        [1, 50.0, 60.0, 290.0, 100.0, "L1"],
        [1, 310.0, 60.0, 550.0, 100.0, "R1"],
        [1, 50.0, 110.0, 290.0, 150.0, "L2"],
        [1, 310.0, 110.0, 550.0, 150.0, "R2"],
        [1, 50.0, 780.0, 550.0, 795.0, "footer"],
    ]
    out = (
        document_intelligence(docs_to_spark(spark, [_doc("d1", blocks)]))
        .toPandas()
        .sort_values("block_rank")
    )
    assert list(out["text"]) == ["header", "L1", "L2", "R1", "R2", "footer"]
    assert list(out["block_rank"]) == [0, 1, 2, 3, 4, 5]
    # bbox columns carry the source coordinates untouched
    row = out[out["text"] == "R2"].iloc[0]
    assert (row.x0, row.y0, row.x1, row.y1) == (310.0, 110.0, 550.0, 150.0)
    assert row.page == 1


def test_malformed_span_contributes_no_blocks(spark):
    docs = [
        _doc("ok", [[1, 0.0, 0.0, 10.0, 10.0, "a"]]),
        ("bad", [("pdf", "999", "", 0)]),  # too few fields
    ]
    out = document_intelligence(docs_to_spark(spark, docs)).toPandas()
    assert set(out["doc_id"]) == {"ok"}


def test_spark_matches_golden_twin(spark):
    docs = synth_docs(60, seed=13)
    got = (
        document_intelligence(docs_to_spark(spark, docs), salt_partitions=8)
        .toPandas()
        .sort_values(["doc_id", "order", "block_rank"])
        .reset_index(drop=True)
    )
    want = golden_docintel(docs)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_order_joins_extraction_output(spark):
    # a block row's (doc_id, order) identifies the SAME span the text
    # pipeline emits, so coordinates join text 1:1 per pdf span
    from german_ocr_spark.operators.extract import extract_pipeline

    docs = docs_to_spark(spark, synth_docs(40, seed=21))
    spans = extract_pipeline(docs).filter("kind = 'pdf' AND error IS NULL")
    blocks = document_intelligence(docs).select("doc_id", "order").distinct()
    n_spans = spans.select("doc_id", "order").distinct().count()
    joined = spans.join(blocks, ["doc_id", "order"]).count()
    assert n_spans > 0 and joined == n_spans
