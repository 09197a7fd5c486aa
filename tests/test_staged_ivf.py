"""Staged IVF inverted lists (operators/staged_ivf.py): the 100 TB
path for q44 must (a) reproduce the inline q44 top-k row-for-row off
the materialized assignment and (b) actually behave like an index —
reading only the probed cells' buckets (SelectedBucketsCount < total)
instead of scanning the whole table."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from german_ocr_spark.operators.staged_ivf import (
    ivf_search_staged,
    stage_inverted_lists,
)
from german_ocr_spark.queries import IVF_N_CELLS, QUERIES, _ivf_assign_probes

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


def test_staged_search_matches_inline_q44(spark):
    spark.sql("DROP TABLE IF EXISTS t_staged_ivf")
    try:
        staged = stage_inverted_lists(spark, SF_DIR, table="t_staged_ivf",
                                      n_buckets=N_BUCKETS)
        got = sorted(
            map(tuple, ivf_search_staged(spark, SF_DIR, staged).collect())
        )
        want = sorted(
            map(tuple, QUERIES["q44_ivf_topk_search"](spark, SF_DIR).collect())
        )
        assert got == want
        assert len(want) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_staged_ivf")


def test_staged_probe_reads_only_probed_buckets(spark):
    spark.sql("DROP TABLE IF EXISTS t_staged_ivf2")
    # a bare filter scan has no join/agg to "need" bucketing, so the
    # DisableUnnecessaryBucketedScan rule would silently fall back to a
    # full (all-files) scan; pin the bucketed read on so the cell
    # filter can prune buckets, as a real index probe would
    auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        staged = stage_inverted_lists(spark, SF_DIR, table="t_staged_ivf2",
                                      n_buckets=N_BUCKETS)
        # one query's probe list: IVF_NPROBE cells out of IVF_N_CELLS
        _, probes = _ivf_assign_probes(spark, SF_DIR)
        cells = [
            int(r.cell)
            for r in probes.filter(F.col("query_id") == IVF_N_CELLS)
            .select("cell")
            .collect()
        ]
        assert 0 < len(cells) < IVF_N_CELLS
        scan = staged.filter(F.col("cell").isin(cells))
        plan = scan._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, "bucket pruning must apply to a cell-id probe filter"
        selected, total = int(m.group(1)), int(m.group(2))
        assert total == N_BUCKETS
        assert selected <= len(set(cells)) < total
        # and the pruned read still returns exactly the probed cells
        left = {int(r.cell) for r in scan.select("cell").distinct().collect()}
        assert left <= set(cells)
        # the ACTUAL search path must prune too — ivf_search_staged
        # pushes its probed cells as a literal filter, so its scan node
        # must show a pruned bucket count, not a full read
        search = ivf_search_staged(spark, SF_DIR, staged)
        splan = search._jdf.queryExecution().executedPlan().toString()
        ms = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", splan)
        assert ms, "the staged search itself must bucket-prune"
        assert int(ms.group(1)) < int(ms.group(2)) == N_BUCKETS
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", auto
        )
        spark.sql("DROP TABLE IF EXISTS t_staged_ivf2")
