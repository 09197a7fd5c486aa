"""In-suite version of the driver's correctness gate: every registered
query vs its DuckDB oracle at sf0.001 (the full sf0.01 sweep lives in
tools/validate_queries.py, run before each commit)."""

from __future__ import annotations

import duckdb
import pytest

from german_ocr_spark.queries import ORACLES, QUERIES
from tools.validate_queries import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(sdf) > 0, f"{name}: rows-only query returned 0 rows"
        return
    ddf = duck.sql(ORACLES[name]).fetchdf()
    err = compare(sdf, ddf)
    assert err is None, f"{name}: {err}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
