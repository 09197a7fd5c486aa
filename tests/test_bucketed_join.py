"""Co-located joins via bucketing (SURVEY B11 at scale): two tables
bucketed+sorted on doc_id must join with ZERO Exchange nodes, versus
two shuffles for the same join on plain parquet."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from german_ocr_spark.sources import write_bucketed


def _exchanges(df) -> int:
    # \bExchange\b cannot match inside "ReusedExchange" ('d' before 'E'
    # is a word char), so the raw count is already reuse-free
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    spark.sql("DROP TABLE IF EXISTS tb_docs")
    spark.sql("DROP TABLE IF EXISTS tb_golden")
    docs = spark.range(5000).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id"),
        F.col("id").alias("v"),
    )
    golden = docs.select("doc_id", (F.col("v") * 7).alias("expected"))

    write_bucketed(docs, "tb_docs", n_buckets=8)
    write_bucketed(golden, "tb_golden", n_buckets=8)
    try:
        bucketed = spark.table("tb_docs").join(spark.table("tb_golden"), "doc_id")
        assert _exchanges(bucketed) == 0, "bucketed join must not shuffle"
        assert bucketed.count() == 5000

        # control: identical join over plain parquet shuffles both sides
        docs.write.mode("overwrite").parquet(str(tmp_path / "p_docs"))
        golden.write.mode("overwrite").parquet(str(tmp_path / "p_golden"))
        plain = spark.read.parquet(str(tmp_path / "p_docs")).join(
            spark.read.parquet(str(tmp_path / "p_golden")), "doc_id"
        )
        assert _exchanges(plain) == 2, "plain join shuffles both sides"
        assert plain.count() == 5000

        # values identical either way
        a = sorted(map(tuple, bucketed.collect()))
        b = sorted(map(tuple, plain.collect()))
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_docs")
        spark.sql("DROP TABLE IF EXISTS tb_golden")
