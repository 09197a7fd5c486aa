"""Canonical schemas (SURVEY.md §1.4, FIXTURES.md F1-F6).

The document unit of the reference (one image / one multi-page PDF,
``german_ocr/ocr.py:196-202``, ``cloud_client.py:269-311``) generalizes
to one row of a span table: ``(doc_id, spans: array<struct<kind, text,
media_ref, offset>>)`` — the authoritative ``input_hint`` shape from
BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Span kinds understood by the extraction pipeline. Mirrors the
# reference's backend/kind dispatch (german_ocr/ocr.py:80-120) as a
# data-driven kernel registry instead of backend objects.
SPAN_KINDS = ("text", "html", "pdf", "ocr", "image")

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

# F1: primary pipeline input.
DOCUMENTS_SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
    ]
)

# Exploded working shape: one row per span.
SPAN_ROW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
    ]
)

# Extraction output: the golden-equality shape (F5) plus per-row error
# isolation columns (reference semantics: extract_batch appends
# ``{"text": "", "error": ...}`` and continues, ollama_backend.py:167-172).
EXTRACTED_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("order", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        # closed domain, see operators.extract.ERROR_CODES (SURVEY A19)
        T.StructField("error_code", T.StringType(), True),
    ]
)

# F2: serialized DOM-node table (one row per node of an html span).
DOM_NODES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_offset", T.IntegerType(), False),
        T.StructField("node_id", T.IntegerType(), False),
        T.StructField("parent_id", T.IntegerType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("tag", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("text_len", T.IntegerType(), True),
        T.StructField("link_text_len", T.IntegerType(), True),
        T.StructField("block_id", T.IntegerType(), True),
    ]
)

# F3: PDF layout block table.
PDF_BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_offset", T.IntegerType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("x0", T.DoubleType(), True),
        T.StructField("y0", T.DoubleType(), True),
        T.StructField("x1", T.DoubleType(), True),
        T.StructField("y1", T.DoubleType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

# Structured-extraction result (reference extractor.py:19-56 dataclasses
# InvoiceData/FormData/DocumentData + ExtractionResult re-expressed as a
# superset StructType; SURVEY A10/A11).
INVOICE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("invoice_number", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("sender", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("recipient", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "items", T.ArrayType(T.MapType(T.StringType(), T.StringType())), True
        ),
        T.StructField("totals", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("title", T.StringType(), True),
        T.StructField(
            "fields", T.ArrayType(T.MapType(T.StringType(), T.StringType())), True
        ),
    ]
)

# Multimodal media rows: opaque binary payload + typed metadata
# (reference MIME-typed uploads, cloud_client.py:269-311; media_ref
# points into object storage at scale, fixtures inline the bytes).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

# F6: lineage / checkpoint records (SURVEY B15).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("bucket_id", T.IntegerType(), False),
        T.StructField("doc_count", T.LongType(), True),
        T.StructField("span_count", T.LongType(), True),
        T.StructField("error_count", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("committed_at", T.StringType(), True),
        # data files written by this bucket's commit group (file-manifest
        # commits: readers resolve committed data by unioning these
        # lists, Iceberg-manifest style — never by listing the dir)
        T.StructField("files", T.ArrayType(T.StringType()), True),
    ]
)
