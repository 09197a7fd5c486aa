"""JSONL (newline-delimited JSON) source and sink — the wire format
web-scale text corpora actually arrive in (Common-Crawl-derived dumps,
exported annotation sets, inter-pipeline handoffs), generalizing the
reference's multi-format file ingest (german_ocr/cloud_client.py file
upload / format map) to a splittable, schema-checked bulk source.

Design rules:

- **Explicit schema, never inference.** `spark.read.json` without a
  schema runs a full extra pass over the data to infer one — at 100 TB
  that doubles the ingest cost and can silently widen types between
  runs. Every reader here takes (or derives) an explicit schema, so
  the scan is one pass and the output schema is run-invariant.
- **PERMISSIVE + corrupt-record isolation, not failfast.** A billion-
  line crawl dump always contains malformed lines; a single bad line
  must neither kill the job (FAILFAST) nor silently vanish (DROPMALFORMED).
  Bad lines land in a `_corrupt_record` column and are split into a
  quarantine frame — the same per-row error-isolation contract as the
  extraction kernels (operators/extract.py error/error_code columns).
- **gzip-aware but splittability-honest.** `.jsonl.gz` reads work, but
  a gzip member is ONE split — a single 500 GB .gz file serializes to
  one task. `write_jsonl_sharded` therefore writes MANY files sized by
  a target row count per shard, so downstream readers parallelize
  regardless of codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents-table schema as it travels over JSONL (doc_id widens
#: back to long on read; JSON has no int width).
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """One-pass PERMISSIVE JSONL scan with corrupt-line capture.

    Reads as TEXT and parses with `from_json` rather than using the
    JSON datasource directly: the datasource forbids any query whose
    referenced columns reduce to the corrupt column alone
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — and the
    optimizer's column pruning reduces a quarantine split to exactly
    that), with `.cache()` as the documented workaround, which is the
    wrong default for a 100 TB ingest. text+from_json has no such
    restriction, stays one-pass and splittable, and the quarantine
    keeps the RAW LINE verbatim (the datasource's reconstructed
    corrupt record is not guaranteed byte-identical). Cost: the JSON
    tokenizer can't column-prune — irrelevant for ingest, which
    materializes every payload column anyway."""
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.from_json(
            F.col("value"),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r"),
        F.col("value"),
    )
    payload = [F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    return parsed.select(
        *payload,
        F.when(F.col(f"r.{CORRUPT_COL}").isNotNull(), F.col("value"))
        .alias(CORRUPT_COL),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows lose the corrupt column; the
    quarantine frame carries the raw offending line for replay/audit —
    the bulk-source analog of the extract kernels' error rows.

    Spark caveat encoded here: a PERMISSIVE parse marks a bad line by
    setting the corrupt column AND nulling the payload columns, but a
    line that is valid JSON with a wrong TYPE (e.g. doc_id as string)
    also lands in the corrupt column — both classes quarantine, which
    is the behavior a 100 TB ingest wants (schema drift surfaces as
    quarantine volume, not as silent nulls)."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def write_jsonl_sharded(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    compression: str | None = "gzip",
) -> None:
    """Sharded JSONL export (training-data handoff format). Shard
    count is derived from the actual row count so files stay near
    `rows_per_shard` regardless of corpus size — the property that
    keeps every DOWNSTREAM reader parallel even through gzip (one
    member per file, many files). The count is one cheap action on an
    already-computed frame; at cluster scale prefer passing a known
    count via `rows_per_shard` tuning instead of recounting.

    repartition (round-robin) rather than coalesce: coalesce would
    collapse upstream parallelism into the writer tasks; round-robin
    also balances shard sizes when the input is skewed."""
    n = df.count()
    shards = max(1, (n + rows_per_shard - 1) // rows_per_shard)
    w = df.repartition(shards).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
