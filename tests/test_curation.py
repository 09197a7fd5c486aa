"""Behavioral tests for the curation-family queries: benchmark
decontamination (q46) finds a planted verbatim n-gram leak and nothing
shorter, and the repetition metrics (q47) score crafted degenerate vs
healthy texts on the right side of the keep/drop rule."""

from __future__ import annotations

import pandas as pd
import pytest

from german_ocr_spark.queries import (
    CONTAM_NGRAM_N,
    QUERIES,
    REP_DUP_2GRAM_MAX,
    REP_TOP_WORD_MAX,
)

# doc_ids chosen so the salted eval-hash puts them on the intended side
# (substr(md5('eval:'||id),1,2) < '10' means eval): 12 is eval; 0-5 are
# train — verified by recomputing the md5 in this test, not assumed.
EVAL_ID, TRAIN_LEAK_ID, TRAIN_NEAR_ID, TRAIN_CLEAN_ID = 12, 0, 1, 2


def _hash_side(doc_id: int) -> str:
    import hashlib

    return hashlib.md5(f"eval:{doc_id}".encode()).hexdigest()[:2]


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    out = str(tmp_path)
    pdf.to_parquet(f"{out}/documents.parquet", index=False)
    return out


@pytest.fixture(scope="module")
def contam_dir(tmp_path_factory):
    assert _hash_side(EVAL_ID) < "10"
    for t in (TRAIN_LEAK_ID, TRAIN_NEAR_ID, TRAIN_CLEAN_ID):
        assert _hash_side(t) >= "10"
    secret = " ".join(f"secret{i}" for i in range(CONTAM_NGRAM_N))
    near_miss = " ".join(f"secret{i}" for i in range(CONTAM_NGRAM_N - 1))
    rows = [
        (EVAL_ID, f"benchmark prompt begins {secret} benchmark prompt ends", "en", "eval"),
        # full verbatim n-gram copy -> contaminated
        (TRAIN_LEAK_ID, f"scraped page containing {secret} and other words", "en", "web"),
        # shares only N-1 consecutive words -> NOT contaminated
        (TRAIN_NEAR_ID, f"scraped page containing {near_miss} truncated here", "en", "web"),
        (TRAIN_CLEAN_ID, "completely unrelated words about weather and trains today", "en", "web"),
    ]
    return _write_docs(tmp_path_factory.mktemp("contam"), rows)


def test_decontaminate_flags_only_verbatim_leak(spark, contam_dir):
    out = {r.doc_id: r for r in QUERIES["q46_decontaminate"](spark, contam_dir).collect()}
    assert set(out) == {TRAIN_LEAK_ID}
    # "containing secret0..secret7" etc: the leaked window plus the two
    # overlapping windows extending into shared neighbors don't exist
    # (neighbors differ), so exactly the windows inside the copied span.
    assert out[TRAIN_LEAK_ID].n_shared_ngrams == 1
    assert out[TRAIN_LEAK_ID].n_eval_docs == 1


def test_decontaminate_counts_multiple_leaks(spark, tmp_path_factory):
    # Two disjoint leaked spans from the same eval doc -> 2 shared
    # n-grams, still 1 eval doc.
    span_a = " ".join(f"alpha{i}" for i in range(CONTAM_NGRAM_N))
    span_b = " ".join(f"beta{i}" for i in range(CONTAM_NGRAM_N))
    rows = [
        (EVAL_ID, f"{span_a} separator {span_b}", "en", "eval"),
        (TRAIN_LEAK_ID, f"x {span_a} y {span_b} z", "en", "web"),
    ]
    d = _write_docs(tmp_path_factory.mktemp("contam2"), rows)
    out = {r.doc_id: r for r in QUERIES["q46_decontaminate"](spark, d).collect()}
    assert out[TRAIN_LEAK_ID].n_shared_ngrams == 2
    assert out[TRAIN_LEAK_ID].n_eval_docs == 1


def test_repetition_metrics_split_degenerate_from_healthy(spark, tmp_path_factory):
    rows = [
        # 10x the same word: top_word_frac = 1.0, dup bigrams = 1.0
        (0, " ".join(["spam"] * 10), "en", "src0"),
        # all-distinct words: every metric 0
        (1, " ".join(f"w{i}" for i in range(10)), "en", "src0"),
        # single word: bigram list empty -> dup_2gram_frac defined as 0
        (2, "lonely", "en", "src0"),
    ]
    d = _write_docs(tmp_path_factory.mktemp("rep"), rows)
    out = {r.doc_id: r for r in QUERIES["q47_repetition_metrics"](spark, d).collect()}

    assert out[0].verdict == "drop"
    assert out[0].top_word_frac == 1.0
    assert out[0].dup_word_frac == pytest.approx(0.9)
    # 9 bigrams, 1 distinct -> floor6(8/9)
    assert out[0].dup_2gram_frac == pytest.approx(0.888888)

    assert out[1].verdict == "keep"
    assert out[1].dup_word_frac == 0.0
    assert out[1].top_word_frac == pytest.approx(0.1)
    assert out[1].dup_2gram_frac == 0.0

    assert out[2].n_words == 1
    assert out[2].dup_2gram_frac == 0.0
    # a 1-word doc's only word is its top word: frac 1.0 -> drop (the
    # Gopher-style rule pairs this with a min-length filter upstream)
    assert out[2].top_word_frac == 1.0
    assert out[2].verdict == "drop"


def test_repetition_thresholds_are_reachable():
    # guard against threshold drift that would make the verdict
    # constant: both constants sit strictly inside (0, 1)
    assert 0.0 < REP_TOP_WORD_MAX < 1.0
    assert 0.0 < REP_DUP_2GRAM_MAX < 1.0
