"""Checkpoint/resume + per-partition lineage (SURVEY B15, A15-A18).

Spark-native re-expression of the reference's async job lifecycle
(``german_ocr/cloud_client.py:320-462``: submit → poll JobStatus
(pending/processing/completed/failed) → resume/cancel): a run is split
into deterministic *buckets* (``pmod(xxhash64(doc_id), n_buckets)`` — an
Iceberg ``bucket(N, doc_id)`` partition transform emulated on plain
parquet). Each committed bucket appends a lineage row; a rerun anti-joins
committed buckets and processes only the remainder. ``JobStatus.status``
maps to lineage ``status``; ``current_page/total_pages`` progress maps to
committed-bucket counts.

Output layout:
    <out>/data/bucket_id=<k>/*.parquet     extracted spans
    <out>/_lineage/*.parquet               lineage rows (append-only)

Atomicity: data is written with dynamic partition overwrite (a killed
job leaves staged files only; a re-run overwrites exactly its buckets),
and a bucket only counts as committed once its lineage row exists —
written strictly after the data job succeeds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import LINEAGE_SCHEMA

N_BUCKETS_DEFAULT = 32


def bucket_col(n_buckets: int):
    # xxhash64 can be negative; pmod keeps the bucket in [0, n).
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")


def lineage_path(output_dir: str) -> str:
    return os.path.join(output_dir, "_lineage")


def data_path(output_dir: str) -> str:
    return os.path.join(output_dir, "data")


def committed_buckets(spark: SparkSession, output_dir: str) -> set[int]:
    path = lineage_path(output_dir)
    try:
        lin = spark.read.parquet(path)
    except Exception:
        return set()
    rows = (
        lin.filter(F.col("status") == "committed")
        .select("bucket_id")
        .distinct()
        .collect()
    )
    return {r.bucket_id for r in rows}


def read_lineage(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).parquet(lineage_path(output_dir))


def commit_bucket_group(
    spark: SparkSession,
    extracted: DataFrame,
    output_dir: str,
    buckets: list[int],
    snapshot_id: str,
    committed_at: str,
) -> None:
    """Write one bucket group's extracted spans, then its lineage rows.

    ``extracted`` must already carry a ``bucket_id`` column and contain
    only rows of ``buckets``.
    """
    # Cluster rows by bucket before the write: without this, every
    # upstream (salted) task writes a sliver of every bucket —
    # tasks × buckets tiny files, and the serial driver-side commit of
    # that file count dwarfs the job at scale. One shuffle keyed on
    # bucket_id bounds output to one file per bucket per shuffle
    # partition (n_buckets is sized >> cores on a real cluster, so this
    # loses no write parallelism).
    extracted = extracted.repartition(max(len(buckets), 1), "bucket_id")
    (
        extracted.write.mode("overwrite")
        .partitionBy("bucket_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(data_path(output_dir))
    )
    # Lineage stats are computed by reading BACK the committed files —
    # one column-pruned scan that doubles as a readability check; no
    # persist of the full extract is needed.
    written = spark.read.parquet(data_path(output_dir)).filter(
        F.col("bucket_id").isin(buckets)
    )
    stats = (
        written.groupBy("bucket_id")
        .agg(
            F.countDistinct("doc_id").alias("doc_count"),
            F.count("*").alias("span_count"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "error_count"
            ),
        )
        .collect()
    )
    by_bucket = {r.bucket_id: r for r in stats}
    rows = [
        (
            snapshot_id,
            int(b),
            int(by_bucket[b].doc_count) if b in by_bucket else 0,
            int(by_bucket[b].span_count) if b in by_bucket else 0,
            int(by_bucket[b].error_count) if b in by_bucket else 0,
            "committed",
            committed_at,
        )
        for b in buckets
    ]
    spark.createDataFrame(rows, schema=LINEAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(lineage_path(output_dir))
