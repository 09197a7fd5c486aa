"""Property-based tests (hypothesis): the determinism contracts that
golden fixtures can't exhaustively cover.

The decisive engine property (BASELINE.json: bitwise-identical output
everywhere) reduces to: every kernel is a pure function implemented
identically in pandas, Spark Column, and DuckDB SQL. Hypothesis feeds
adversarial text (umlauts, ß, Fraktur long-s, CRLF, hyphen-linebreaks,
regex metacharacters) through all three and requires equality.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from german_ocr_spark.functions.german import (
    duck_lit,
    normalize_col,
    normalize_series,
    normalize_sql,
)
from german_ocr_spark.functions.textstats import fingerprint_sql

# Alphabet tuned to hit every rule: German letters, Fraktur long-s,
# line-ending and hyphen constructs, plus regex metacharacters.
_ALPHABET = st.sampled_from(
    list("abcdefsSFNnu ch") + list("ÄÖÜäöüßſ") + list("-\r\n\t.\\$^[](){}|+*?")
)
_TEXT = st.text(alphabet=_ALPHABET, max_size=60)


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_normalize_output_invariants(s):
    out = normalize_series(pd.Series([s], dtype=object)).iloc[0]
    # rules guarantee: no CR/LF/tab survives, no Fraktur long-s, no
    # space runs (collapse is the final rule)
    for banned in ("\r", "\n", "\t", "ſ", "  "):
        assert banned not in out, (s, out, banned)


@settings(max_examples=60, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=30))
def test_normalize_pandas_duckdb_parity(texts):
    got_pd = normalize_series(pd.Series(texts, dtype=object)).tolist()
    con = duckdb.connect()
    got_duck = [
        con.sql(f"SELECT {normalize_sql(duck_lit(t))} AS x").fetchone()[0]
        for t in texts
    ]
    assert got_pd == got_duck


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_normalize_spark_parity(spark, texts):
    pdf = pd.DataFrame({"i": range(len(texts)), "t": pd.Series(texts, dtype=object)})
    sdf = spark.createDataFrame(pdf)
    got_spark = [
        r["x"]
        for r in sdf.orderBy("i").select(normalize_col(F.col("t")).alias("x")).collect()
    ]
    got_pd = normalize_series(pdf["t"]).tolist()
    assert got_spark == got_pd


@settings(max_examples=100, deadline=None)
@given(_TEXT)
def test_fingerprint_whitespace_invariance(s):
    # the canonical-text fingerprint must not care about whitespace
    # shape (runs, kind, leading/trailing) — only content
    noisy = "\t " + s.replace(" ", "  \t") + " \r\n"
    con = duckdb.connect()
    a = con.sql(f"SELECT {fingerprint_sql(duck_lit(s))} AS x").fetchone()[0]
    b = con.sql(f"SELECT {fingerprint_sql(duck_lit(noisy))} AS x").fetchone()[0]
    assert a == b


@pytest.mark.parametrize("bad", [None])
def test_normalize_null_passthrough(bad):
    out = normalize_series(pd.Series([bad, "ok"], dtype=object))
    assert out.iloc[0] is None or pd.isna(out.iloc[0])
    assert out.iloc[1] == "ok"
