"""asof_join semantics: latest right row at-or-before each left row per
key, null when none precedes, equal timestamps match, later rows never
leak backwards, and multi-column keys partition correctly."""

from __future__ import annotations

from datetime import datetime

from german_ocr_spark.operators.asof import asof_join


def _t(s):
    return datetime.fromisoformat(s)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _t("2024-01-01T10:00:00")),
            (2, "u", _t("2024-01-01T12:00:00")),
            (3, "u", _t("2024-01-01T09:00:00")),  # before every right row
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _t("2024-01-01T09:30:00"), "early"),
            ("u", _t("2024-01-01T11:00:00"), "late"),
            ("u", _t("2024-01-01T12:00:00"), "exact"),  # == left id=2 ts
        ],
        "k string, ts timestamp, tag string",
    )
    out = {
        r.id: r.tag
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", payload={"tag": "tag"}
        ).collect()
    }
    assert out == {1: "early", 2: "exact", 3: None}


def test_asof_keys_do_not_cross(spark):
    left = spark.createDataFrame(
        [(1, "a", _t("2024-01-01T10:00:00")), (2, "b", _t("2024-01-01T10:00:00"))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _t("2024-01-01T09:00:00"), "for-a")],
        "k string, ts timestamp, tag string",
    )
    out = {
        r.id: r.tag
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", payload={"tag": "tag"}
        ).collect()
    }
    assert out == {1: "for-a", 2: None}


def test_asof_multi_key_and_multi_payload(spark):
    left = spark.createDataFrame(
        [(1, "a", 7, _t("2024-01-01T10:00:00"))],
        "id long, k1 string, k2 int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", 7, _t("2024-01-01T09:00:00"), "match", 1.5),
            ("a", 8, _t("2024-01-01T09:30:00"), "wrong-k2", 9.9),
        ],
        "k1 string, k2 int, ts timestamp, tag string, score double",
    )
    rows = asof_join(
        left,
        right,
        on=["k1", "k2"],
        left_ts="ts",
        right_ts="ts",
        payload={"tag": "tag", "right_score": "score"},
    ).collect()
    assert len(rows) == 1
    assert rows[0].tag == "match"
    assert rows[0].right_score == 1.5
    # left columns pass through untouched
    assert rows[0].id == 1 and rows[0].k1 == "a" and rows[0].k2 == 7


def test_asof_preserves_left_cardinality(spark):
    left = spark.createDataFrame(
        [(i, "u", _t(f"2024-01-01T10:00:{i:02d}")) for i in range(20)],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _t("2024-01-01T10:00:05"), "x"), ("u", _t("2024-01-01T10:00:15"), "y")],
        "k string, ts timestamp, tag string",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", payload={"tag": "tag"}
    )
    assert out.count() == 20
    got = {r.id: r.tag for r in out.collect()}
    assert got[0] is None and got[4] is None
    assert all(got[i] == "x" for i in range(5, 15))
    assert all(got[i] == "y" for i in range(15, 20))
