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

Atomicity (manifest commit, the Iceberg snapshot model on plain
parquet): the lineage row IS the commit point. Data files are written
with append mode + task-side commits (no serial driver-side staging
move — on a lazily-backed FS that move was the job's largest serial
fraction); a killed job leaves orphan files in uncommitted bucket dirs,
which (a) readers never see because every read prunes to committed
buckets via the lineage table, and (b) the resuming run deletes before
rewriting those buckets.
"""

from __future__ import annotations

import os
import shutil

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
    write_parallelism: int | None = None,
) -> None:
    """Write one bucket group's extracted spans, then its lineage rows.

    ``extracted`` must already carry a ``bucket_id`` column and contain
    only rows of ``buckets``.
    """
    # Cluster rows by bucket before the write: without this, every
    # upstream task writes a sliver of every bucket — tasks × buckets
    # tiny files, and the serial driver-side commit of that file count
    # dwarfs the job at scale. One shuffle keyed on (bucket_id, salt)
    # bounds files to files_per_bucket per bucket while keeping the
    # write as wide as the cluster (a bare bucket_id key would cap the
    # write at len(buckets) tasks — fine when n_buckets >> cores, a 4x
    # scaling-efficiency hole when it isn't).
    if write_parallelism is None:
        write_parallelism = int(spark.sparkContext.defaultParallelism) * 2
    files_per_bucket = max(1, write_parallelism // max(len(buckets), 1))
    extracted = extracted.repartition(
        max(len(buckets) * files_per_bucket, 1),
        "bucket_id",
        F.pmod(F.xxhash64("doc_id", "order"), F.lit(files_per_bucket)),
    )
    # Clear orphans from any previous uncommitted attempt at these
    # buckets, then append: with the lineage row as the commit marker,
    # the write itself needs no atomic staging move. (Local-FS delete;
    # a cluster deployment swaps in the Hadoop FileSystem API or an
    # Iceberg overwrite — one call site.)
    for b in buckets:
        shutil.rmtree(
            os.path.join(data_path(output_dir), f"bucket_id={b}"),
            ignore_errors=True,
        )
    (
        extracted.write.mode("append")
        .partitionBy("bucket_id")
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
