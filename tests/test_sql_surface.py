"""The SQL-string API surface: the engine's queries are DataFrame
programs, but users of spark.sql(...) must get the SAME plans and the
SAME rows from registered views. Pins (a) row-for-row parity between a
Spark-SQL spelling and the DataFrame program for a representative
aggregate query, and (b) that the SQL route goes through the identical
Catalyst machinery (pushed filters, partial aggregation)."""

from __future__ import annotations

from german_ocr_spark.queries import QUERIES, load

SF_DIR = "/root/testdata/sf0.001"

Q01_SPARK_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT) div 100)
         AS sum_base_price_cents,
       SUM((CAST(ROUND(l_extendedprice * 10000) AS BIGINT)
            * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
           div 1000000) AS sum_disc_price_cents,
       floor(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*) * 1000000.0) / 1000000.0 AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def test_sql_string_matches_dataframe_program(spark):
    load(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    via_sql = spark.sql(Q01_SPARK_SQL)
    via_df = QUERIES["q01_pricing_summary"](spark, SF_DIR)
    assert via_sql.columns == via_df.columns
    assert via_sql.exceptAll(via_df).isEmpty()
    assert via_df.exceptAll(via_sql).isEmpty()


def test_sql_route_pushes_filter_and_partial_agg(spark):
    load(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    plan = (
        spark.sql(Q01_SPARK_SQL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # filter reaches the parquet scan; aggregate is two-phase
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
    assert "partial_" in plan  # map-side partial aggregation


def test_null_safe_join_semantics(spark):
    """NULL join keys: a plain equi-join silently DROPS null-keyed
    rows (NULL = NULL is not true), the null-safe operator <=>
    matches them — the difference between losing unattributed docs
    and keeping them through a dimension join. Both behaviors pinned
    so neither regresses silently."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("a", "h1"), ("b", None), ("c", "h2")], "doc string, host string"
    )
    dim = spark.createDataFrame(
        [("h1", "good"), (None, "unattributed"), ("h2", "bad")],
        "host string, verdict string",
    )
    plain = left.join(dim, "host").select("doc", "verdict")
    assert {r.doc for r in plain.collect()} == {"a", "c"}  # b dropped
    safe = left.join(dim, left.host.eqNullSafe(dim.host)).select(
        "doc", "verdict"
    )
    rows = {r.doc: r.verdict for r in safe.collect()}
    assert rows == {"a": "good", "b": "unattributed", "c": "bad"}
    # same via SQL text
    left.createOrReplaceTempView("l")
    dim.createOrReplaceTempView("r")
    sql_rows = {
        r.doc: r.verdict
        for r in spark.sql(
            "SELECT doc, verdict FROM l JOIN r ON l.host <=> r.host"
        ).collect()
    }
    assert sql_rows == rows
