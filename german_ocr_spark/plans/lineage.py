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
    <out>/data/*.parquet                   extracted spans (flat files)
    <out>/_lineage/*.parquet               lineage rows (append-only)

Atomicity (file-manifest commit — the Iceberg model on plain parquet):
the lineage row IS the commit point and carries the exact list of data
files its commit group wrote. Readers resolve committed data by
unioning those file lists — never by listing the directory — so a
killed job's orphan files are simply invisible, no cleanup or staging
move needed, and the data write itself requires NO shuffle or
partitioned layout: map tasks append files directly. ``vacuum`` deletes
unreferenced files opportunistically.
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


def _list_data_files(output_dir: str) -> set[str]:
    d = data_path(output_dir)
    try:
        return {
            n for n in os.listdir(d) if n.endswith(".parquet")
        }
    except FileNotFoundError:
        return set()


def committed_files(spark: SparkSession, output_dir: str) -> list[str]:
    """Union of data files referenced by committed lineage rows — the
    manifest-resolved view of the table (orphans invisible)."""
    try:
        lin = read_lineage(spark, output_dir)
    except Exception:
        return []
    rows = (
        lin.filter(F.col("status") == "committed")
        .select(F.explode("files").alias("f"))
        .distinct()
        .collect()
    )
    d = data_path(output_dir)
    return sorted(os.path.join(d, r.f) for r in rows)


def vacuum(spark: SparkSession, output_dir: str) -> list[str]:
    """Delete data files not referenced by any committed lineage row
    (orphans from killed uncommitted writes). Safe any time: readers
    only ever see manifest-referenced files."""
    referenced = {os.path.basename(f) for f in committed_files(spark, output_dir)}
    removed = []
    for n in _list_data_files(output_dir) - referenced:
        os.remove(os.path.join(data_path(output_dir), n))
        removed.append(n)
    return sorted(removed)


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
    only rows of ``buckets``, and must include each document's
    complete span set — per-bucket ``doc_count`` is measured as the
    number of ``order == 0`` rows (one per non-empty document), so
    committing a projection that filters out order-0 spans would
    undercount documents (span/error counts stay exact either way).
    The write is shuffle-free: map tasks
    append flat files; the before/after listing diff is the file set
    this group committed. (On a multi-writer object store the listing
    diff would be replaced by collecting task-committed file names; one
    call site.)
    """
    from pyspark.sql import Observation

    # Lineage stats ride on the write action itself (Observation
    # metrics accumulate during the single pass — no second read-back
    # scan of the written data). doc_count = spans with order 0: every
    # document with >=1 span emits exactly one order-0 span, so this
    # equals countDistinct(doc_id) while staying observe-legal.
    obs = Observation()
    metric_cols = []
    for b in buckets:
        in_b = F.col("bucket_id") == b
        metric_cols += [
            F.sum(F.when(in_b & (F.col("order") == 0), 1).otherwise(0)).alias(
                f"d{b}"
            ),
            F.sum(F.when(in_b, 1).otherwise(0)).alias(f"s{b}"),
            F.sum(
                F.when(in_b & F.col("error").isNotNull(), 1).otherwise(0)
            ).alias(f"e{b}"),
        ]
    before = _list_data_files(output_dir)
    extracted.observe(obs, *metric_cols).write.mode("append").parquet(
        data_path(output_dir)
    )
    new_files = sorted(_list_data_files(output_dir) - before)
    stats = obs.get
    rows = [
        (
            snapshot_id,
            int(b),
            int(stats[f"d{b}"] or 0),
            int(stats[f"s{b}"] or 0),
            int(stats[f"e{b}"] or 0),
            "committed",
            committed_at,
            new_files,
        )
        for b in buckets
    ]
    spark.createDataFrame(rows, schema=LINEAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(lineage_path(output_dir))
