"""PII detection/redaction: pattern behavior on planted strings,
Spark-vs-DuckDB parity of counts AND redacted text, and the q52 report
run with its own oracle SQL over a planted fixture (the live corpus is
PII-free, so this fixture is where the nonzero parity evidence lives)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from german_ocr_spark.functions import pii
from german_ocr_spark.queries import ORACLES, QUERIES
from tools.validate_queries import compare

DOCS = [
    (0, "kontakt unter max.mustermann+spam@beispiel-firma.de bitte melden", "de", "src0"),
    (1, "zwei adressen a@b.org und c.d@e.co in einem satz", "de", "src0"),
    (2, "konto DE44500105175407324931 bei der bank", "de", "src1"),
    (3, "rufen sie +49 170 1234567 an", "de", "src1"),
    (4, "gar keine kontaktdaten hier nur text", "de", "src1"),
    (5, "mail x@y.de und konto DE02120300000000202051 und tel +43 660/7654321", "de", "src2"),
]


def _fixture_dir(tmp_path_factory):
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    out = tmp_path_factory.mktemp("pii")
    pdf.to_parquet(f"{out}/documents.parquet", index=False)
    return str(out)


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    return _fixture_dir(tmp_path_factory)


def test_counts_on_planted_strings(spark, pii_dir):
    t = F.col("text")
    rows = {
        r.doc_id: r
        for r in spark.read.parquet(f"{pii_dir}/documents.parquet")
        .select(
            "doc_id",
            pii.pii_count_col(t, "email").alias("e"),
            pii.pii_count_col(t, "iban").alias("i"),
            pii.pii_count_col(t, "phone").alias("p"),
        )
        .collect()
    }
    assert (rows[0].e, rows[0].i, rows[0].p) == (1, 0, 0)
    assert rows[1].e == 2
    assert rows[2].i == 1
    assert rows[3].p == 1
    assert (rows[4].e, rows[4].i, rows[4].p) == (0, 0, 0)
    assert (rows[5].e, rows[5].i, rows[5].p) == (1, 1, 1)


def test_redaction_replaces_all_spans(spark, pii_dir):
    got = {
        r.doc_id: r.red
        for r in spark.read.parquet(f"{pii_dir}/documents.parquet")
        .select("doc_id", pii.pii_redact_col(F.col("text")).alias("red"))
        .collect()
    }
    assert got[5] == "mail [EMAIL] und konto [IBAN] und tel [PHONE]"
    assert got[4] == DOCS[4][1]  # untouched
    assert "@" not in got[1] and got[1].count("[EMAIL]") == 2


def test_redaction_parity_with_duckdb(spark, pii_dir):
    sdf = (
        spark.read.parquet(f"{pii_dir}/documents.parquet")
        .select("doc_id", pii.pii_redact_col(F.col("text")).alias("red"))
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{pii_dir}/documents.parquet'"
    )
    ddf = con.sql(
        f"SELECT doc_id, {pii.pii_redact_sql('text')} AS red FROM documents"
    ).fetchdf()
    assert compare(sdf, ddf) is None


def test_q52_matches_oracle_on_planted_fixture(spark, pii_dir):
    sdf = QUERIES["q52_pii_scan"](spark, pii_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{pii_dir}/documents.parquet'"
    )
    ddf = con.sql(ORACLES["q52_pii_scan"]).fetchdf()
    assert compare(sdf, ddf) is None
    # and the fixture really exercises nonzero counts
    by_src = sdf.set_index("source")
    assert by_src.loc["src0", "n_emails"] == 3
    assert by_src.loc["src2", "n_docs_with_pii"] == 1
