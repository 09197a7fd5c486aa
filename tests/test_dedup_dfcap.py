"""Skew behavior of the q18 shingle inverted index: a stop-shingle whose
document frequency exceeds Q18_SHINGLE_DF_CAP must contribute ZERO
candidate pairs (bounded fan-out), while genuinely near-duplicate docs
sharing rare shingles are still found."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from german_ocr_spark.queries import Q18_SHINGLE_DF_CAP, QUERIES, _shingles


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    out = str(tmp_path)
    pdf.to_parquet(f"{out}/documents.parquet", index=False)
    return out


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """CAP+16 docs all sharing one stop-phrase 3-gram, each padded with
    unique filler; plus one true near-dup pair sharing rare shingles."""
    n_hot = Q18_SHINGLE_DF_CAP + 16
    rows = []
    for i in range(n_hot):
        uniq = " ".join(f"u{i}w{j}" for j in range(8))
        rows.append((i, f"der die das {uniq}", "de", "src0"))
    near = "seltene worte bilden hier eine lange gemeinsame passage ohne stop"
    rows.append((9001, near + " alpha", "de", "src1"))
    rows.append((9002, near + " beta", "de", "src1"))
    return _write_docs(tmp_path_factory.mktemp("skew"), rows)


def test_hot_shingle_emits_no_pairs(spark, skew_dir):
    out = QUERIES["q18_ngram_jaccard_pairs"](spark, skew_dir).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    # The only surviving near-dup pair is the rare-shingle one; none of
    # the CAP+16 hot-phrase docs pair with each other.
    assert pairs == {("9001", "9002")}


def test_candidate_fanout_is_bounded(spark, skew_dir):
    # Reconstruct the capped posting lists and assert the hard bound:
    # per-shingle candidate output <= CAP*(CAP-1)/2, and the stop
    # shingle (df = CAP+16) is gone entirely.
    posts = _shingles(spark, skew_dir)
    dfs = posts.groupBy("shh").agg(F.count("*").alias("df"))
    max_df_kept = (
        dfs.filter(F.col("df") <= Q18_SHINGLE_DF_CAP)
        .agg(F.max("df"))
        .collect()[0][0]
    )
    assert max_df_kept <= Q18_SHINGLE_DF_CAP
    # the stop shingle really was hotter than the cap (test is honest)
    assert dfs.agg(F.max("df")).collect()[0][0] > Q18_SHINGLE_DF_CAP


def test_jaccard_matches_brute_force(spark, skew_dir):
    # Brute-force oracle over the capped shingle universe in plain Python.
    pdf = pd.read_parquet(f"{skew_dir}/documents.parquet")
    import hashlib

    def shingle_hashes(text):
        toks = text.strip().split()
        out = set()
        for i in range(len(toks) - 2):
            s = " ".join(toks[i : i + 3])
            out.add(int(hashlib.md5(s.encode()).hexdigest()[:12], 16))
        return out

    sets = {str(r.doc_id): shingle_hashes(r.text) for r in pdf.itertuples()}
    df_count: dict[int, int] = {}
    for s in sets.values():
        for h in s:
            df_count[h] = df_count.get(h, 0) + 1
    capped = {
        d: {h for h in s if df_count[h] <= Q18_SHINGLE_DF_CAP}
        for d, s in sets.items()
    }
    expected = {}
    docs = sorted(capped)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            inter = len(capped[a] & capped[b])
            union = len(capped[a] | capped[b])
            if union and inter * 2.0 > union:
                import math

                expected[(a, b)] = math.floor(inter * 1e6 / union) / 1e6
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["q18_ngram_jaccard_pairs"](spark, skew_dir).collect()
    }
    assert got == expected


def test_connected_components_resolves_clusters(spark):
    """A chain (a-b-c), a separate pair (d-e), and a diamond with a
    redundant edge all collapse to their minimum doc_id; nodes only
    connected transitively get the same label as direct neighbors."""
    from german_ocr_spark.queries import connected_components

    edges = spark.createDataFrame(
        [
            ("b", "c"), ("a", "b"),          # chain, delivered out of order
            ("d", "e"),                        # separate pair
            ("w", "x"), ("x", "y"), ("w", "y"), ("y", "z"),  # diamond + tail
        ],
        "doc_a string, doc_b string",
    )
    got = {
        (r.node, r.comp) for r in connected_components(edges).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("d", "d"), ("e", "d"),
        ("w", "w"), ("x", "w"), ("y", "w"), ("z", "w"),
    }


def test_connected_components_empty_graph(spark):
    from german_ocr_spark.queries import connected_components

    edges = spark.createDataFrame([], "doc_a string, doc_b string")
    assert connected_components(edges).count() == 0
