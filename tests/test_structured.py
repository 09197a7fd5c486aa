"""Structured extraction (A9-A11) semantics tests, mirroring the
reference behaviors in german_ocr/extractor.py:110-223."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from german_ocr_spark.operators.structured import (
    invoice_fields,
    structured_extract,
)


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(
        [
            ("fenced", '```json\n{"type":"invoice","invoice_number":"I1",'
                       '"items":[{"p":"x"},{"p":"y"}],"totals":{"gross":1.5,"net":1.2}}\n```'),
            ("form", '{"type":"form","title":"Antrag","fields":[{"name":"f"}]}'),
            ("prose", 'Ergebnis: {"type":"invoice","invoice_number":"I3"} Ende.'),
            ("broken", '{"type":"invoice", KAPUTT'),
            ("nojson", "kein JSON hier"),
            ("notype", '{"invoice_number":"NT-1"}'),
        ],
        "doc_id string, raw_response string",
    )
    return structured_extract(df).cache()


def _row(extracted, doc_id):
    return extracted.filter(F.col("doc_id") == doc_id).collect()[0]


def test_fence_stripping(extracted):
    r = _row(extracted, "fenced")
    assert r.success and r.doc_type == "invoice"
    assert r.data.invoice_number == "I1"
    assert r.data.totals["gross"] == 1.5


def test_prose_brace_fallback(extracted):
    # extractor.py:122-126: regex-extract the outermost {...}
    r = _row(extracted, "prose")
    assert r.success and r.data.invoice_number == "I3"


def test_malformed_is_error_row_not_exception(extracted):
    for doc_id in ("broken", "nojson"):
        r = _row(extracted, doc_id)
        assert r.success is False
        assert r.error == "failed to parse JSON"
        assert r.data is None and r.doc_type is None


def test_missing_type_defaults_to_document(extracted):
    # extractor.py:204-211: unknown/missing type → DocumentData
    r = _row(extracted, "notype")
    assert r.success and r.doc_type == "document"
    assert r.data.invoice_number == "NT-1"


def test_invoice_fields_defaults(extracted):
    inv = invoice_fields(extracted).toPandas().set_index("doc_id")
    assert set(inv.index) == {"fenced", "prose"}
    # dict.get-style defaults (extractor.py:132-142): missing → ""
    assert inv.loc["prose", "date"] == ""
    assert inv.loc["fenced", "invoice_number"] == "I1"


def test_plan_is_jvm_only(extracted):
    # the whole chain must codegen: no ArrowEvalPython / MapInPandas
    plan = extracted._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_confidence_column_parity(extracted):
    """The reference's structured result carries a constant
    confidence field (ollama_backend.py:145, 1.0); here it is a
    column — 1.0 on parse success, 0.0 on failure."""
    rows = {r.doc_id: r.confidence for r in extracted.collect()}
    assert rows["fenced"] == 1.0 and rows["form"] == 1.0
    assert rows["broken"] == 0.0 and rows["nojson"] == 0.0
