"""Top-level pipeline driver (SURVEY §3.1 re-expression of
``CloudClient.analyze`` = submit + wait): plan buckets → execute the
extraction stages per bucket group → commit lineage → return metrics.

``run()`` is what ``spark-submit --py-files german_ocr_spark.zip job.py``
invokes on a real cluster; locally it runs identically on ``local[N]``.
Resume: a rerun over the same ``output_dir`` skips committed buckets
(reference job-resume semantics, ``cloud_client.py:415-462``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extract import ordered_span_rows, run_extract
from .plans import lineage as lin


@dataclass
class RunResult:
    snapshot_id: str
    buckets_total: int
    buckets_processed: int
    buckets_skipped: int
    doc_count: int
    span_count: int
    error_count: int


def run(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str,
    n_buckets: int = lin.N_BUCKETS_DEFAULT,
    bucket_group_size: int | None = None,
    salt_partitions: int | None = None,
    snapshot_id: str = "snap-0001",
    committed_at: str = "1970-01-01T00:00:00Z",
    max_groups: int | None = None,
) -> RunResult:
    """Extract ``docs`` (doc_id, spans) into ``output_dir`` with
    checkpointed bucket commits.

    bucket_group_size: buckets per commit (default: all pending in one
        commit). Smaller groups = finer-grained resume, more jobs.
    max_groups: stop after N commit groups (used by tests to simulate a
        killed job; a real kill anywhere leaves the same on-disk states).
    committed_at: injected timestamp — never wall-clock (determinism).
    """
    done = lin.committed_buckets(spark, output_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    if bucket_group_size is None:
        bucket_group_size = max(len(pending), 1)

    docs_b = docs.withColumn("bucket_id", lin.bucket_col(n_buckets))
    groups = [
        pending[i : i + bucket_group_size]
        for i in range(0, len(pending), bucket_group_size)
    ]
    if max_groups is not None:
        groups = groups[:max_groups]

    processed = 0
    for group in groups:
        subset = docs_b.filter(F.col("bucket_id").isin(group))
        rows = ordered_span_rows(subset.drop("bucket_id"))
        extracted = run_extract(rows, salt_partitions=salt_partitions)
        extracted = extracted.withColumn("bucket_id", lin.bucket_col(n_buckets))
        lin.commit_bucket_group(
            spark, extracted, output_dir, group, snapshot_id, committed_at
        )
        processed += len(group)

    ldf = lin.read_lineage(spark, output_dir)
    tot = ldf.filter(F.col("status") == "committed").agg(
        F.sum("doc_count").alias("d"),
        F.sum("span_count").alias("s"),
        F.sum("error_count").alias("e"),
    ).collect()[0]
    return RunResult(
        snapshot_id=snapshot_id,
        buckets_total=n_buckets,
        buckets_processed=processed,
        buckets_skipped=len(done),
        doc_count=int(tot.d or 0),
        span_count=int(tot.s or 0),
        error_count=int(tot.e or 0),
    )


def read_output(spark: SparkSession, output_dir: str) -> DataFrame:
    """Extracted spans, shaped like operators.extract.EXTRACT_DDL.

    Manifest-resolved read (the Iceberg snapshot-read model): the scan
    is given exactly the data files referenced by committed lineage
    rows, so orphan files from killed uncommitted writes are invisible
    without any cleanup pass."""
    files = lin.committed_files(spark, output_dir)
    if not files:
        from .schema import EXTRACTED_SPAN_SCHEMA

        return spark.createDataFrame([], schema=EXTRACTED_SPAN_SCHEMA)
    return spark.read.parquet(*files).select(
        "doc_id", "order", "kind", "text", "media_ref", "error", "error_code"
    )
