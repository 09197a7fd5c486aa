"""Bloom-pruned semi join: exact-result equivalence, zero false
negatives by construction, and a bounded false-positive pass-through
rate on the pre-filter."""

from __future__ import annotations

import pandas as pd

from german_ocr_spark.operators.bloom_join import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_build,
    bloom_probe_col,
    bloom_semi_join,
)


def _dfs(spark, n_big=20000, n_keys=150):
    big = spark.range(n_big).selectExpr(
        "id AS k", "id % 17 AS payload"
    )
    # selected keys: a deterministic scattered subset
    small = spark.range(n_keys).selectExpr("id * 131 + 7 AS k")
    return big, small


def test_bloom_semi_join_equals_plain_semi_join(spark):
    big, small = _dfs(spark)
    got = (
        bloom_semi_join(big, small, "k", "k")
        .orderBy("k")
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        big.join(small.distinct(), "k", "left_semi")
        .orderBy("k")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 150  # every selected key < 20000 exists once


def test_bloom_prefilter_no_false_negatives_and_bounded_fpr(spark):
    big, small = _dfs(spark)
    words = bloom_build(small, "k")
    passed = big.filter(bloom_probe_col("k", words))
    true_keys = {r.k for r in small.collect()}
    passed_keys = {r.k for r in passed.select("k").collect()}
    # no false negatives: every true key passes the filter
    assert true_keys <= passed_keys
    # bounded false positives: fpr ~ (1 - e^(-k*n/m))^k ~ 1.1e-3 here;
    # 20k probes -> expect ~22 extras, assert a generous 5x ceiling
    n_extra = len(passed_keys) - len(true_keys & passed_keys)
    assert n_extra <= 120, n_extra


def test_bloom_words_shape(spark):
    _, small = _dfs(spark, n_keys=10)
    words = bloom_build(small, "k")
    assert len(words) == (BLOOM_M_BITS + 62) // 63
    # sign bit never set (63 bits/word packing)
    assert all(0 <= w < (1 << 63) for w in words)
    # at most k bits per key
    assert sum(bin(w).count("1") for w in words) <= 10 * BLOOM_K
