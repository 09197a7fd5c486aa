"""Structured extraction (SURVEY A9-A11): model-emitted JSON → typed
columns, entirely in JVM expressions.

Re-expresses the reference's DocumentExtractor path
(``german_ocr/extractor.py:110-223``): strip markdown code fences →
parse JSON leniently (bad JSON → null, never an exception) → dispatch
on the ``type`` tag (invoice / form / other) → per-type struct shaping
with defaults → wrap with (success, error) columns. The reference does
this per document in Python; here it is one ``select`` chain of
``regexp_replace`` + ``from_json`` + ``when`` that whole-stage-codegens
— no Python at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..schema import INVOICE_SCHEMA

# ```json ... ``` / ``` ... ``` fences, as emitted by chat models and
# stripped by the reference at extractor.py:113-118.
_FENCE_OPEN = r"^\s*```(?:json)?\s*"
_FENCE_CLOSE = r"\s*```\s*$"

# PERMISSIVE from_json turns malformed input into an all-null struct,
# not a null — the corrupt-record column is the reliable malformed-ness
# signal (it captures the raw text iff parsing failed).
_PARSE_SCHEMA = T.StructType(
    list(INVOICE_SCHEMA.fields)
    + [T.StructField("_corrupt", T.StringType(), True)]
)


def strip_fences(col: Column) -> Column:
    """Remove surrounding markdown code fences (A9, extractor.py:113-118)."""
    return F.regexp_replace(F.regexp_replace(col, _FENCE_OPEN, ""), _FENCE_CLOSE, "")


def parse_payload(col: Column) -> Column:
    """Lenient JSON parse into the superset struct (A9/A10).

    ``from_json`` returns null on malformed input — the exact analogue
    of ``_parse_json`` returning None (extractor.py:127-130). The
    regex-fallback branch of the reference (grab the outermost
    ``{...}``) is reproduced with ``regexp_extract`` before parsing.
    """
    candidate = strip_fences(col)
    # reference fallback: if the payload has prose around the JSON,
    # extract the outermost brace block (extractor.py:122-126)
    braced = F.regexp_extract(candidate, r"(\{[\s\S]*\})", 1)
    chosen = F.when(F.length(braced) > 0, braced).otherwise(candidate)
    parsed = F.from_json(
        chosen, _PARSE_SCHEMA, {"columnNameOfCorruptRecord": "_corrupt"}
    )
    # malformed → null (the reference's _parse_json returning None)
    return F.when(parsed["_corrupt"].isNull(), parsed.dropFields("_corrupt"))


def structured_extract(df: DataFrame, payload_col: str = "raw_response") -> DataFrame:
    """raw model output → ExtractionResult-shaped row (A11).

    Output columns: doc_type (tagged union dispatch, extractor.py:204-211
    with the same "missing type → document" default), data (typed
    struct), raw_response, success, error, confidence. Failures are
    per-row values, never task failures (extractor.py:219-223).
    ``confidence`` mirrors the reference's structured-result field
    (``ollama_backend.py:145``, constant 1.0 on success); a failed
    parse gets 0.0 so downstream filters can threshold on one column.
    """
    parsed = parse_payload(F.col(payload_col))
    doc_type = F.coalesce(parsed["type"], F.lit("document"))
    return df.withColumn("_parsed", parsed).select(
        *df.columns,
        F.when(F.col("_parsed").isNull(), F.lit(None)).otherwise(doc_type).alias(
            "doc_type"
        ),
        F.col("_parsed").alias("data"),
        F.col("_parsed").isNotNull().alias("success"),
        F.when(F.col("_parsed").isNull(), F.lit("failed to parse JSON")).alias(
            "error"
        ),
        # derived from the SAME predicate as success so the two
        # columns can never desynchronize
        F.col("_parsed").isNotNull().cast("double").alias("confidence"),
    )


def invoice_fields(df: DataFrame) -> DataFrame:
    """Flatten invoice rows to the InvoiceData fields (extractor.py:19-29)
    with the reference's dict.get defaults (extractor.py:132-142)."""
    return df.filter(F.col("doc_type") == "invoice").select(
        *[c for c in df.columns if c not in ("data", "doc_type")],
        F.coalesce(F.col("data.invoice_number"), F.lit("")).alias("invoice_number"),
        F.coalesce(F.col("data.date"), F.lit("")).alias("date"),
        F.col("data.sender").alias("sender"),
        F.col("data.recipient").alias("recipient"),
        F.col("data.items").alias("items"),
        F.col("data.totals").alias("totals"),
    )
