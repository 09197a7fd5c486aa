"""Local stand-in for the driver's correctness gate: run every
registered query on Spark AND its DuckDB oracle, compare row count,
column names, and order-insensitive values. Usage:

    python tools/validate_queries.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        return f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: spark={len(a)} duck={len(b)}"
    # Driver-strictness: the driver's value hash distinguishes 4523 from
    # 4523.0, so an int-vs-float dtype divergence (classic cause: DuckDB
    # SUM(int) -> HUGEINT -> float64 while Spark returns int64) must FAIL
    # here even when the values are numerically identical. Fix the oracle
    # with CAST(SUM(...) AS BIGINT), never loosen this check.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb:
            return (
                f"dtype kind differs on '{c}': spark={spark_pdf[c].dtype} "
                f"duck={duck_pdf[c].dtype} (driver hash would mismatch)"
            )
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        return str(e).split("\n")[0] + " (values differ)"
    return None


def main(sf_dir: str, name_filter: str = "") -> int:
    from german_ocr_spark.queries import ORACLES, QUERIES
    from german_ocr_spark.session import get_spark

    spark = get_spark(cores=16, app_name="validate-queries")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in sorted(QUERIES.items()):
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only check)")
            if len(sdf) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            ddf = con.sql(ORACLES[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        err = compare(sdf, ddf)
        if err:
            print(f"FAIL  {name}: {err}")
            failures += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    sys.exit(1 if main(sf, filt) else 0)
