"""Staged IVF-PQ index (operators/staged_pq.py): the 100 TB path for
q124 must (a) reproduce the inline q124 ADC top-k row-for-row off the
materialized (cell, codes) relation and (b) behave like an index —
bucket-pruned probe reads, and NO full-precision embedding column in
the staged table at all."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from german_ocr_spark.operators.staged_pq import (
    ivfpq_search_staged,
    stage_pq_index,
)
from german_ocr_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


def test_staged_search_matches_inline_q124(spark):
    spark.sql("DROP TABLE IF EXISTS t_staged_pq")
    try:
        staged = stage_pq_index(
            spark, SF_DIR, table="t_staged_pq", n_buckets=N_BUCKETS
        )
        # the index stores cell + codes only — never the vector
        assert set(staged.columns) == {"neighbor_id", "cell", "codes"}
        got = sorted(
            map(tuple, ivfpq_search_staged(spark, SF_DIR, staged).collect())
        )
        want = sorted(
            map(tuple, QUERIES["q124_ivfpq_search"](spark, SF_DIR).collect())
        )
        assert got == want
        assert len(want) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_staged_pq")


def test_staged_pq_search_bucket_prunes(spark):
    spark.sql("DROP TABLE IF EXISTS t_staged_pq2")
    auto = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    )
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        staged = stage_pq_index(
            spark, SF_DIR, table="t_staged_pq2", n_buckets=N_BUCKETS
        )
        search = ivfpq_search_staged(spark, SF_DIR, staged)
        plan = search._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, "the staged IVF-PQ search must bucket-prune"
        assert int(m.group(1)) < int(m.group(2)) == N_BUCKETS
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", auto
        )
        spark.sql("DROP TABLE IF EXISTS t_staged_pq2")
