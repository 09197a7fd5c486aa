"""Staged-postings dedup (operators/staged_dedup.py): the 100 TB path
for q18 must (a) reproduce the inline q18 pairs row-for-row and (b)
actually delete the shuffle its docstring claims — the pair stage's
groupBy(shh) over the shh-bucketed staged table runs with zero
Exchange nodes."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from german_ocr_spark.operators.staged_dedup import (
    jaccard_pairs_staged,
    stage_postings,
)
from german_ocr_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def test_staged_pairs_match_inline_q18(spark):
    spark.sql("DROP TABLE IF EXISTS t_staged_postings")
    try:
        staged = stage_postings(spark, SF_DIR, table="t_staged_postings")
        got = sorted(map(tuple, jaccard_pairs_staged(staged).collect()))
        want = sorted(
            map(tuple, QUERIES["q18_ngram_jaccard_pairs"](spark, SF_DIR).collect())
        )
        assert got == want
        assert len(want) > 0  # the fixture corpus has near-dups
    finally:
        spark.sql("DROP TABLE IF EXISTS t_staged_postings")


def test_staged_group_agg_is_shuffle_free(spark):
    spark.sql("DROP TABLE IF EXISTS t_staged_postings2")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        staged = stage_postings(spark, SF_DIR, table="t_staged_postings2")
        groups = staged.groupBy("shh").agg(
            F.array_sort(F.collect_list("doc_id")).alias("ds")
        )
        assert _exchanges(groups) == 0, (
            "groupBy(shh) over the shh-bucketed staged table must be "
            "bucket-local"
        )
        assert groups.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_staged_postings2")
