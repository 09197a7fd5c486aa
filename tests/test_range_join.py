"""range_join semantics: half-open containment, bucket-boundary
straddling, multi-bucket intervals, no duplicate pairs, and the
manufactured equi-key keeps the plan a hash join (never a nested-loop
cross product)."""

from __future__ import annotations

from datetime import datetime

from german_ocr_spark.operators.range_join import range_join


def _t(s):
    return datetime.fromisoformat(s)


def _pairs(spark, points, intervals, bucket=60):
    p = spark.createDataFrame(points, "p_id long, ts timestamp")
    i = spark.createDataFrame(
        intervals, "w_id long, w_start timestamp, w_end timestamp"
    )
    out = range_join(p, i, "ts", "w_start", "w_end", bucket)
    return {(r.p_id, r.w_id) for r in out.collect()}


def test_half_open_containment(spark):
    iv = [(1, _t("2024-01-01T10:00:00"), _t("2024-01-01T10:01:00"))]
    pts = [
        (1, _t("2024-01-01T10:00:00")),  # == start: in
        (2, _t("2024-01-01T10:00:59")),  # inside
        (3, _t("2024-01-01T10:01:00")),  # == end: out
        (4, _t("2024-01-01T09:59:59")),  # before: out
    ]
    assert _pairs(spark, pts, iv) == {(1, 1), (2, 1)}


def test_interval_straddles_bucket_boundary(spark):
    # interval 10:00:30-10:01:30 covers buckets 10:00 and 10:01; points
    # in either bucket must match, each exactly once
    iv = [(1, _t("2024-01-01T10:00:30"), _t("2024-01-01T10:01:30"))]
    pts = [
        (1, _t("2024-01-01T10:00:45")),  # first bucket
        (2, _t("2024-01-01T10:01:15")),  # second bucket
        (3, _t("2024-01-01T10:01:45")),  # after end
    ]
    assert _pairs(spark, pts, iv) == {(1, 1), (2, 1)}


def test_interval_much_longer_than_bucket(spark):
    # 5-minute interval with 60s buckets -> explodes to 6 buckets; a
    # point still pairs exactly once
    iv = [(1, _t("2024-01-01T10:00:00"), _t("2024-01-01T10:05:00"))]
    pts = [(1, _t("2024-01-01T10:03:30"))]
    assert _pairs(spark, pts, iv) == {(1, 1)}


def test_overlapping_intervals_all_match(spark):
    iv = [
        (1, _t("2024-01-01T10:00:00"), _t("2024-01-01T10:02:00")),
        (2, _t("2024-01-01T10:01:00"), _t("2024-01-01T10:03:00")),
    ]
    pts = [(1, _t("2024-01-01T10:01:30"))]
    assert _pairs(spark, pts, iv) == {(1, 1), (1, 2)}


def test_plan_is_hash_join_not_nested_loop(spark):
    p = spark.createDataFrame(
        [(1, _t("2024-01-01T10:00:30"))], "p_id long, ts timestamp"
    )
    i = spark.createDataFrame(
        [(1, _t("2024-01-01T10:00:00"), _t("2024-01-01T10:01:00"))],
        "w_id long, w_start timestamp, w_end timestamp",
    )
    plan = (
        range_join(p, i, "ts", "w_start", "w_end", 60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
    # equi-join on the manufactured bucket key: hash or sort-merge,
    # either way keyed — never the keyless cross-product fallback
    assert "HashJoin [_b" in plan or "SortMergeJoin [_b" in plan
