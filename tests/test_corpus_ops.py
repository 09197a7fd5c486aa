"""Planted-fixture semantics for the corpus-ops queries (q53–q58):
passage dedup, interleaved audit, TF-IDF keywords, quality classifier,
histogram percentiles, cube. The driver oracle gate proves parity on
the live corpus; these tests prove the SEMANTICS on inputs constructed
to hit the interesting cases (shared passages, planted violations,
rare-word keywords, percentile interpolation against numpy)."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest

from german_ocr_spark.queries import (
    HLL_M,
    ORACLES,
    PASSAGE_W,
    QC_MOD,
    QUERIES,
    TFIDF_TOP_K,
)
from tools.validate_queries import compare


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, text, lang, source[, n_chars])."""
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    fixed = []
    for r in rows:
        r = list(r)
        if len(r) == 4:
            r.append(len(r[1]))
        fixed.append(r)
    pdf = pd.DataFrame(fixed, columns=cols)
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    pdf.to_parquet(f"{tmp_path}/documents.parquet", index=False)
    return str(tmp_path)


def _oracle(sf_dir, name):
    import os

    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(ORACLES[name]).fetchdf()


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_q53_shared_passage_detection(spark, tmp_path):
    shared = _words("s", PASSAGE_W)  # one exact chunk-aligned passage
    d = _write_docs(
        tmp_path,
        [
            (0, shared + " " + _words("a", PASSAGE_W), "en", "src0"),
            (1, shared + " " + _words("b", PASSAGE_W), "en", "src0"),
            (2, _words("c", PASSAGE_W + 5), "en", "src1"),
        ],
    )
    name = "q53_passage_dedup"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("doc_id")
    # docs 0 and 1 share exactly their first passage: 2 passages each,
    # 1 shared -> frac 500000 -> drop at the >= 500000 threshold
    for i in (0, 1):
        assert (
            by.loc[i, "n_passages"],
            by.loc[i, "n_shared"],
            by.loc[i, "shared_frac_e6"],
            by.loc[i, "verdict"],
        ) == (2, 1, 500000, "drop")
    # doc 2: a full chunk + a 5-word tail chunk, nothing shared
    assert (by.loc[2, "n_passages"], by.loc[2, "n_shared"]) == (2, 0)
    assert by.loc[2, "verdict"] == "keep"


def test_q53_within_doc_repeat_not_counted_as_shared(spark, tmp_path):
    # the same passage twice in ONE doc is not cross-doc duplication
    p = _words("r", PASSAGE_W)
    d = _write_docs(tmp_path, [(0, p + " " + p, "en", "src0")])
    sdf = QUERIES["q53_passage_dedup"](spark, d).toPandas()
    row = sdf.iloc[0]
    # distinct passages: 1 (both chunks identical); none shared
    assert (row["n_passages"], row["n_shared"], row["verdict"]) == (
        1,
        0,
        "keep",
    )


def test_q54_planted_violations(spark, tmp_path):
    name = "q54_interleaved_audit"
    d = _write_docs(
        tmp_path,
        [(i, f"doc {i} text", "en", "src0") for i in range(14)],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = dict(zip(sdf["status"], sdf["n_docs"]))
    # residues 3/5/6 are planted violations, twice each over 0..13
    assert got == {
        "OK": 8,
        "OFFSET_ORDER": 2,
        "MEDIA_REF": 2,
        "KIND_DOMAIN": 2,
    }


def test_q55_rare_word_wins(spark, tmp_path):
    name = "q55_tfidf_keywords"
    common = "the data spark"
    d = _write_docs(
        tmp_path,
        [
            (0, common + " zebra", "en", "src0"),
            (1, common, "en", "src0"),
            (2, common, "en", "src0"),
            (3, "unrelated words here", "en", "src1"),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("doc_id")
    kw0 = by.loc[0, "keywords"].split(",")
    # zebra: df=1 -> score 1e6*N/1, strictly above any df>=3 word
    assert kw0[0] == "zebra"
    assert len(kw0) <= TFIDF_TOP_K
    assert by.loc[0, "top_score_e6"] == 1000000 * 4
    # every doc emits a row even if it dominates nothing
    assert set(by.index) == {0, 1, 2, 3}


def test_q56_matches_hand_computed_weights(spark, tmp_path):
    name = "q56_quality_classifier"
    d = _write_docs(
        tmp_path,
        [(0, "alpha beta gamma", "en", "src0"), (1, "alpha alpha", "en", "src0")],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None

    def w(tok):
        h = int(hashlib.md5(f"w:{tok}".encode()).hexdigest()[:12], 16)
        return h % QC_MOD

    by = sdf.set_index("doc_id")
    exp0 = (w("alpha") + w("beta") + w("gamma")) * 1000 // 3
    exp1 = (2 * w("alpha")) * 1000 // 2
    assert by.loc[0, "quality_e3"] == exp0
    assert by.loc[1, "quality_e3"] == exp1
    for i, exp in ((0, exp0), (1, exp1)):
        assert by.loc[i, "verdict"] == ("keep" if exp >= 500000 else "drop")


def test_q57_interpolation_cases(spark, tmp_path):
    name = "q57_length_percentiles"
    rows, did = [], 0
    for lang, vals in (
        ("xx", [1, 2, 3, 4]),  # p50=2.5, p90=3.7
        ("yy", [7]),  # single value: both = 7.0
        ("zz", [5, 5, 5, 9]),  # ties: p50=5.0, p90=5+0.7*4=7.8
    ):
        for v in vals:
            rows.append((did, "t", lang, "s", v))
            did += 1
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("lang")
    assert (by.loc["xx", "p50_chars_e1"], by.loc["xx", "p90_chars_e1"]) == (25, 37)
    assert (by.loc["yy", "p50_chars_e1"], by.loc["yy", "p90_chars_e1"]) == (70, 70)
    assert (by.loc["zz", "p50_chars_e1"], by.loc["zz", "p90_chars_e1"]) == (50, 78)


def test_q57_matches_numpy_linear_percentile(spark, tmp_path):
    rng = np.random.default_rng(421)
    rows, did, expect = [], 0, {}
    for g in range(8):
        lang = f"l{g}"
        vals = rng.integers(10, 5000, size=int(rng.integers(1, 60))).tolist()
        for v in vals:
            rows.append((did, "t", lang, "s", int(v)))
            did += 1
        expect[lang] = (
            int(round(np.percentile(vals, 50, method="linear") * 10)),
            int(round(np.percentile(vals, 90, method="linear") * 10)),
        )
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES["q57_length_percentiles"](spark, d).toPandas()
    by = sdf.set_index("lang")
    for lang, (p50, p90) in expect.items():
        assert (by.loc[lang, "p50_chars_e1"], by.loc[lang, "p90_chars_e1"]) == (
            p50,
            p90,
        ), lang


def _hll_vec(sdf, source):
    got = {
        int(r.register): int(r.max_rho)
        for _, r in sdf[sdf.source == source].iterrows()
    }
    return [got.get(j, 0) for j in range(HLL_M)]


def _hll_estimate(vec):
    import math

    m = len(vec)
    alpha = 0.709  # m = 64
    raw = alpha * m * m / sum(2.0**-v for v in vec)
    zeros = vec.count(0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)  # linear-counting correction
    return raw


def test_q59_estimate_accuracy(spark, tmp_path):
    name = "q59_hll_sketch"
    rows = [(i, f"unique text number {i}", "en", "src0") for i in range(300)]
    rows += [(300 + i, "the same text", "en", "src1") for i in range(50)]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    est0 = _hll_estimate(_hll_vec(sdf, "src0"))
    assert abs(est0 - 300) / 300 < 0.30  # HLL sigma ~= 1.04/sqrt(64) ~ 13%
    # src1 holds ONE distinct text repeated 50x: exactly one register set
    vec1 = _hll_vec(sdf, "src1")
    assert sum(1 for v in vec1 if v > 0) == 1
    assert 0.5 < _hll_estimate(vec1) < 2.5


def test_q59_sketch_union_is_elementwise_max(spark, tmp_path):
    """The property that makes HLL distributable: the sketch of a union
    equals the register-wise max of the parts' sketches — per-partition
    / per-snapshot sketches merge without re-touching the data."""
    name = "q59_hll_sketch"
    rows = [(i, f"item {i} payload", "en", "srcA") for i in range(200)]
    parts = {}
    for sub, rs in (("full", rows), ("h1", rows[:100]), ("h2", rows[100:])):
        p = tmp_path / sub
        p.mkdir()
        parts[sub] = _write_docs(p, rs)
    full, half1, half2 = parts["full"], parts["h1"], parts["h2"]
    v_full = _hll_vec(QUERIES[name](spark, full).toPandas(), "srcA")
    v1 = _hll_vec(QUERIES[name](spark, half1).toPandas(), "srcA")
    v2 = _hll_vec(QUERIES[name](spark, half2).toPandas(), "srcA")
    assert v_full == [max(a, b) for a, b in zip(v1, v2)]


def _cm_estimate(sdf, word):
    import hashlib

    from german_ocr_spark.queries import CM_D, CM_W

    cells = {
        (int(r.r), int(r.c)): int(r.total) for _, r in sdf.iterrows()
    }
    # Kirsch-Mitzenmacher addressing: one hash, cell_r = (h1 + r*h2) % W
    h = int(hashlib.md5(f"cm:{word}".encode()).hexdigest()[:12], 16)
    h1, h2 = h % 256, ((h // 256) % 128) * 2 + 1
    est = None
    for r in range(CM_D):
        v = cells.get((r, (h1 + r * h2) % CM_W), 0)
        est = v if est is None else min(est, v)
    return est


def test_q60_point_queries_bound_truth(spark, tmp_path):
    name = "q60_countmin_sketch"
    # a planted heavy hitter plus a long tail of singletons
    rows = [(0, " ".join(["hot"] * 120 + ["warm"] * 7), "en", "src0")]
    rows += [
        (1 + i, f"cold{i} filler{i} word{i}", "en", "src0") for i in range(40)
    ]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    truth = {"hot": 120, "warm": 7, "cold3": 1, "word17": 1}
    ests = {w: _cm_estimate(sdf, w) for w in truth}
    # count-min never underestimates
    for w, t in truth.items():
        assert ests[w] >= t, (w, ests[w], t)
    # and the planted heavy hitter dominates every probed estimate
    assert ests["hot"] == max(ests.values())
    # total mass conservation per hash row: each row sums to n_tokens
    per_row = sdf.groupby("r")["total"].sum()
    n_tokens = 127 + 40 * 3
    assert (per_row == n_tokens).all()


def test_q61_scrub_keeps_keeper_and_order(spark, tmp_path):
    name = "q61_passage_scrub"
    shared = _words("s", PASSAGE_W)
    a_tail = _words("a", PASSAGE_W)
    b_head = _words("b", PASSAGE_W)
    d = _write_docs(
        tmp_path,
        [
            # doc 0 is the keeper (min doc_id holding the shared chunk)
            (0, shared + " " + a_tail, "en", "src0"),
            # doc 1 holds it mid-text: scrub must keep surrounding order
            (1, b_head + " " + shared + " " + _words("c", 5), "en", "src0"),
            (2, _words("u", PASSAGE_W), "en", "src1"),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("doc_id")
    assert by.loc[0, "clean_text"] == shared + " " + a_tail  # untouched
    assert (by.loc[0, "n_kept"], by.loc[0, "n_dropped"]) == (2, 0)
    # doc 1 loses ONLY the shared middle chunk, order preserved
    assert by.loc[1, "clean_text"] == b_head + " " + _words("c", 5)
    assert (by.loc[1, "n_kept"], by.loc[1, "n_dropped"]) == (2, 1)
    assert by.loc[2, "n_dropped"] == 0


def test_q61_fully_duplicated_doc_scrubs_to_empty(spark, tmp_path):
    p = _words("z", PASSAGE_W)
    d = _write_docs(
        tmp_path,
        [(0, p, "en", "src0"), (1, p, "en", "src0")],
    )
    sdf = QUERIES["q61_passage_scrub"](spark, d).toPandas()
    assert compare(sdf, _oracle(d, "q61_passage_scrub")) is None
    by = sdf.set_index("doc_id")
    assert by.loc[0, "clean_text"] == p  # keeper
    assert by.loc[1, "clean_text"] == ""  # scrubbed empty, row still emitted
    assert (by.loc[1, "n_kept"], by.loc[1, "n_dropped"]) == (0, 1)


def test_q66_budget_semantics(spark, tmp_path):
    from german_ocr_spark.queries import MIX_TOKEN_CAP

    name = "q66_token_budget_mix"
    rows = [(i, _words("s", 10), "en", "small") for i in range(3)]
    rows += [
        (100 + i, _words(f"b{i}_", 50), "en", "big") for i in range(200)
    ]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("source")
    # under-budget source passes through whole
    assert (by.loc["small", "n_docs_kept"], by.loc["small", "tokens_kept"]) == (
        3,
        30,
    )
    # over-budget source (10000 tokens) is sampled toward the cap
    assert 0 < by.loc["big", "n_docs_kept"] < 200
    assert 0 < by.loc["big", "tokens_kept"] < 10000
    assert abs(by.loc["big", "tokens_kept"] - MIX_TOKEN_CAP) < 3 * MIX_TOKEN_CAP
    assert by.loc["big", "source_tokens"] == 10000


def test_q58_grand_total_row(spark, tmp_path):
    d = _write_docs(
        tmp_path,
        [
            (0, "aa", "en", "src0"),
            (1, "bbb", "en", "src1"),
            (2, "cccc", "de", "src0"),
        ],
    )
    sdf = QUERIES["q58_cube_stats"](spark, d).toPandas()
    assert compare(sdf, _oracle(d, "q58_cube_stats")) is None
    total = sdf[sdf["lang"].isna() & sdf["source"].isna()]
    assert len(total) == 1
    assert int(total["n_docs"].iloc[0]) == 3
    assert int(total["total_chars"].iloc[0]) == 9
    # 4 grouping sets: (lang,source)=3 combos + 2 langs + 2 sources + 1
    assert len(sdf) == 8


def test_q69_shard_assignment_semantics(spark, tmp_path):
    from german_ocr_spark.queries import SHARD_N

    name = "q69_shard_assignment"
    rows = [
        (i, _words(f"d{i}_", 5 + i % 7), "en", f"src{i % 3}")
        for i in range(60)
    ]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    # placement audit invariants: every doc/token lands in exactly one
    # shard, shard ids are in range, shares floor-sum to <= 1e6 and the
    # rounding loss is < SHARD_N ppm
    assert sdf["n_docs"].sum() == 60
    assert sdf["tokens"].sum() == sum(5 + i % 7 for i in range(60))
    assert sdf["shard"].between(0, SHARD_N - 1).all()
    assert 1000000 - SHARD_N < sdf["share_ppm"].sum() <= 1000000


def test_q69_placement_matches_md5_rule(spark, tmp_path):
    from german_ocr_spark.queries import SHARD_N

    name = "q69_shard_assignment"
    d = _write_docs(tmp_path, [(7, "one two three", "en", "src0")])
    sdf = QUERIES[name](spark, d).toPandas()
    expected = int(hashlib.md5(b"shard:7").hexdigest()[:4], 16) % SHARD_N
    assert len(sdf) == 1
    assert int(sdf["shard"].iloc[0]) == expected
    assert int(sdf["tokens"].iloc[0]) == 3


def test_q70_divergence_hand_computed(spark, tmp_path):
    name = "q70_source_divergence"
    d = _write_docs(
        tmp_path,
        [
            (0, "a a a b", "en", "srcA"),
            (1, "b b b b", "en", "srcB"),
            (2, "a a a b b b b b", "en", "srcC"),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("source")
    # corpus: a=6/16, b=10/16 -> pc = 375000 / 625000 ppm
    # srcA (a=3/4, b=1/4): |750000-375000| + |250000-625000| = 750000
    # srcB (b=4/4):        |0-375000|      + |1000000-625000| = 750000
    # srcC == corpus distribution -> 0
    assert int(by.loc["srcA", "l1_div_ppm"]) == 750000
    assert int(by.loc["srcB", "l1_div_ppm"]) == 750000
    assert int(by.loc["srcC", "l1_div_ppm"]) == 0
    assert int(by.loc["srcC", "src_tokens"]) == 8


def test_q71_partial_copy_high_containment_low_jaccard(spark, tmp_path):
    name = "q71_containment_pairs"
    big = _words("w", 100)                      # w0..w99
    small = _words("w", 20)                     # prefix copy: w0..w19
    other = _words("z", 50)                     # unrelated
    d = _write_docs(
        tmp_path, [(1, big, "en", "s"), (2, small, "en", "s"), (3, other, "en", "s")]
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    # exactly the (big, small) pair: containment 1.0 (every shingle of
    # the prefix copy is in the big doc) but jaccard 18/98 — the pair
    # q18's union denominator misses by construction
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert {row["doc_a"], row["doc_b"]} == {"1", "2"}
    assert row["contained_doc"] == "2"
    assert row["containment"] == 1.0
    assert row["jaccard"] < 0.5


def test_q71_threshold_excludes_weak_overlap(spark, tmp_path):
    name = "q71_containment_pairs"
    # docs share a 12-word run out of 30 -> containment 10/28 < 0.8
    shared = _words("s", 12)
    a = shared + " " + _words("a", 18)
    b = shared + " " + _words("b", 18)
    d = _write_docs(tmp_path, [(1, a, "en", "s"), (2, b, "en", "s")])
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert len(sdf) == 0


# ---------------------------------------------------------------- q72–q78


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _is_new(doc_id: int) -> bool:
    """q73/q78 batch-membership rule, recomputed independently."""
    from german_ocr_spark.queries import INC_BATCH_THRESHOLD

    return _md5hex(f"batch:{doc_id}")[:2] < INC_BATCH_THRESHOLD


def test_q72_matches_hand_computed_acceptance(spark, tmp_path):
    from german_ocr_spark.queries import QC_SCORE_MAX_E3

    name = "q72_importance_sample"
    rows = [
        (i, _words(f"t{i}_", 3 + i % 5), "en", f"src{i % 2}") for i in range(40)
    ]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    # recompute the acceptance rule per doc in pure Python
    exp = {}
    for i, text, _, src, _n in (r + (None,) for r in rows):
        toks = text.split()
        q = sum(int(_md5hex(f"w:{t}")[:12], 16) % QC_MOD for t in toks) * 1000 // len(toks)
        h16 = int(_md5hex(f"imp:{i}")[:4], 16)
        keep = h16 * QC_SCORE_MAX_E3 < q * 65536
        e = exp.setdefault(src, [0, 0, 0, 0])  # total, kept, tokens, qsum
        e[0] += 1
        if keep:
            e[1] += 1
            e[2] += len(toks)
            e[3] += q
    by = sdf.set_index("source")
    for src, (tot, kept, toks, qsum) in exp.items():
        row = by.loc[src]
        assert int(row["n_total"]) == tot
        assert int(row["n_kept"]) == kept
        assert int(row["tokens_kept"]) == toks
        assert int(row["avg_quality_kept_e3"]) == (qsum // kept if kept else 0)


def test_q73_verdict_classes(spark, tmp_path):
    name = "q73_incremental_dedup"
    new_ids = [i for i in range(200) if _is_new(i)]
    old_ids = [i for i in range(200) if not _is_new(i)]
    assert len(new_ids) >= 4 and len(old_ids) >= 1
    n1, n2, n3, n4 = new_ids[:4]
    o1 = old_ids[0]
    shared = _words("snap", 8)
    within = _words("batch", 8)
    d = _write_docs(
        tmp_path,
        [
            (o1, shared, "en", "s"),
            # case/whitespace variant of the snapshot doc: canonical
            # fingerprint still matches (q17's rule)
            (n1, "  " + shared.upper() + "  ", "en", "s"),
            (min(n2, n3), within, "en", "s"),
            (max(n2, n3), within, "en", "s"),
            (n4, _words("uniq", 8), "en", "s"),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    v = sdf.set_index("doc_id")["verdict"]
    assert v.loc[n1] == "dup_of_snapshot"
    assert v.loc[min(n2, n3)] == "new"          # first claim wins
    assert v.loc[max(n2, n3)] == "dup_within_batch"
    assert v.loc[n4] == "new"
    assert o1 not in v.index                    # snapshot rows never emitted


def test_q74_packing_matches_rule_and_never_splits(spark, tmp_path):
    from german_ocr_spark.queries import PACK_CAP, PACK_LANES

    name = "q74_sequence_packing"
    rows = [
        (i, _words(f"p{i}_", 50 + (i * 37) % 300), "en", "s") for i in range(48)
    ]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    # recompute lanes + greedy cumsum independently
    lanes = {}
    for i, text, *_ in rows:
        lane = int(_md5hex(f"pack:{i}")[:4], 16) % PACK_LANES
        lanes.setdefault(lane, []).append((i, len(text.split())))
    exp = {}
    for lane, docs in lanes.items():
        cum = 0
        for i, nt in sorted(docs):
            exp[i] = (lane, cum // PACK_CAP, cum % PACK_CAP, nt)
            cum += nt
    by = sdf.set_index("doc_id")
    for i, (lane, seq, off, nt) in exp.items():
        row = by.loc[i]
        assert (int(row["lane"]), int(row["seq_id"]), int(row["seq_offset"]),
                int(row["nt"])) == (lane, seq, off, nt)


def test_q75_planted_cross_source_passage(spark, tmp_path):
    name = "q75_source_overlap_matrix"
    shared = _words("s", PASSAGE_W)  # chunk-aligned shared passage
    d = _write_docs(
        tmp_path,
        [
            (0, shared + " " + _words("a", PASSAGE_W), "en", "src0"),
            (1, shared + " " + _words("b", PASSAGE_W), "en", "src1"),
            (2, shared + " " + _words("c", PASSAGE_W), "en", "src1"),
            (3, _words("z", PASSAGE_W), "en", "src2"),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    # exactly one overlapping source pair; the passage lives in 1 src0
    # doc and 2 src1 docs -> 1 shared hash, 1*2 cross pairs
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert (row["source_a"], row["source_b"]) == ("src0", "src1")
    assert (int(row["n_shared_passages"]), int(row["n_cross_pairs"])) == (1, 2)


def test_q76_chunk_coverage_and_hashes(spark, tmp_path):
    from german_ocr_spark.queries import CHUNK_STRIDE, CHUNK_W

    name = "q76_train_chunks"
    texts = {
        0: _words("a", 80),   # 3 full windows: starts 1, 25, 49
        1: _words("b", 10),   # single short chunk
        2: _words("c", CHUNK_W + 1),  # boundary: 2 chunks, tail len 9
    }
    d = _write_docs(tmp_path, [(i, t, "en", "s") for i, t in texts.items()])
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    for i, text in texts.items():
        toks = text.split()
        nt = len(toks)
        n_chunks = 1 + max(0, -(-(nt - CHUNK_W) // CHUNK_STRIDE)) if nt > CHUNK_W else 1
        rows = sdf[sdf["doc_id"] == i].sort_values("chunk_id")
        assert len(rows) == n_chunks
        covered = set()
        for _, r in rows.iterrows():
            start = int(r["start_tok"])
            chunk = toks[start - 1 : start - 1 + CHUNK_W]
            assert int(r["chunk_toks"]) == len(chunk)
            assert int(r["chunk_hash"]) == int(
                _md5hex(" ".join(chunk))[:12], 16
            )
            covered.update(range(start - 1, start - 1 + len(chunk)))
        assert covered == set(range(nt))  # total coverage, no token lost


def test_q77_planted_collocation_wins(spark, tmp_path):
    from german_ocr_spark.queries import COLL_MIN_SUP

    name = "q77_collocation_lift"
    k = COLL_MIN_SUP + 1
    rows = [
        (i, f"new york w{i}a w{i}b", "en", "s") for i in range(k)
    ]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    # only "new york" reaches the support floor; lift = k*N*1e6/(k*k)
    # with N = 4k tokens -> exactly 4e6
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert row["bigram"] == "new york"
    assert (int(row["c_ab"]), int(row["c_a"]), int(row["c_b"])) == (k, k, k)
    assert int(row["lift_e6"]) == 4_000_000


def test_q78_diff_statuses(spark, tmp_path):
    name = "q78_snapshot_diff"
    new_ids = [i for i in range(200) if _is_new(i)]
    old_ids = [i for i in range(200) if not _is_new(i)]
    d = _write_docs(
        tmp_path,
        [
            (old_ids[0], _words("a", 10), "de", "src_grew"),
            (new_ids[0], _words("b", 20), "de", "src_grew"),
            (old_ids[1], _words("c", 30), "de", "src_stale"),
            (new_ids[1], _words("d", 40), "fr", "src_fresh"),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("source")
    grew = by.loc["src_grew"]
    assert grew["status"] == "grew"
    assert (int(grew["docs_before"]), int(grew["docs_added"])) == (1, 1)
    assert (int(grew["tokens_before"]), int(grew["tokens_added"])) == (10, 20)
    stale = by.loc["src_stale"]
    assert stale["status"] == "no_growth"
    assert (int(stale["docs_added"]), int(stale["tokens_added"])) == (0, 0)
    fresh = by.loc["src_fresh"]
    assert fresh["status"] == "new_cell"
    assert (int(fresh["docs_before"]), int(fresh["tokens_before"])) == (0, 0)
    assert int(fresh["tokens_added"]) == 40


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts_iso, user_id, event_type, value)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["event_id"] = pdf["event_id"].astype("int64")
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf["user_id"] = pdf["user_id"].astype("int64")
    pdf["value"] = pdf["value"].astype("float64")
    pdf["props"] = "{}"
    pdf.to_parquet(f"{tmp_path}/events.parquet", index=False)
    return str(tmp_path)


def test_q79_planted_spike_and_quiet(spark, tmp_path):
    from german_ocr_spark.queries import ANOM_BASE

    name = "q79_rate_anomaly"
    rows, eid = [], 0
    # type 'a': 1 event/hour for ANOM_BASE hours, then a 10x spike
    for h in range(ANOM_BASE + 1):
        n = 10 if h == ANOM_BASE else 1
        for i in range(n):
            rows.append(
                (eid, f"2026-01-{1 + h // 24:02d}T{h % 24:02d}:{i:02d}:00", 7,
                 "a", 1.0)
            )
            eid += 1
    # type 'b': 9/hour for 3 hours then 1 -> quiet (1e6/9 < 333334)
    for h, n in enumerate([9, 9, 9, 1]):
        for i in range(n):
            rows.append(
                (eid, f"2026-01-01T{h:02d}:{30 + i:02d}:00", 8, "b", 1.0)
            )
            eid += 1
    d = _write_events(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    a = sdf[sdf["event_type"] == "a"].sort_values("hour").reset_index(drop=True)
    assert a.loc[0, "flag"] == "warmup"
    assert set(a.loc[1 : ANOM_BASE - 1, "flag"]) == {"normal"}
    spike = a.iloc[ANOM_BASE]
    assert spike["flag"] == "spike"
    # baseline: ANOM_BASE hours of 1 event -> ratio exactly 10e6
    assert (int(spike["n"]), int(spike["base_hours"]), int(spike["base_sum"]),
            int(spike["ratio_e6"])) == (10, ANOM_BASE, ANOM_BASE, 10_000_000)
    b = sdf[sdf["event_type"] == "b"].sort_values("hour").reset_index(drop=True)
    assert list(b["flag"]) == ["warmup", "normal", "normal", "quiet"]
    assert int(b.loc[3, "ratio_e6"]) == 1_000_000 * 3 // 27


def test_q80_bloom_matches_python_reference(spark, tmp_path):
    from german_ocr_spark.queries import BLOOM_BITS, BLOOM_K, BLOOM_WORDS

    name = "q80_bloom_sketch"
    rows = [
        (i, _words(f"b{i}_", 4 + i % 3), "en", f"src{i % 2}") for i in range(30)
    ]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    # rebuild each source's bloom words in pure Python
    import re as _re

    exp = {}
    for _i, text, _l, src, _n in (r + (None,) for r in rows):
        canon = _re.sub(r"\s+", " ", text.lower()).strip()
        fp = hashlib.md5(canon.encode()).hexdigest()
        h1 = int(hashlib.md5(fp.encode()).hexdigest()[:12], 16) % BLOOM_BITS
        h2 = (int(hashlib.md5(fp.encode()).hexdigest()[12:24], 16)
              % (BLOOM_BITS - 1)) + 1
        words = exp.setdefault(src, [0] * BLOOM_WORDS)
        for r_ in range(BLOOM_K):
            b = (h1 + r_ * h2) % BLOOM_BITS
            words[b // 63] |= 1 << (b % 63)
    got = {
        (r["source"], int(r["word_idx"])): int(r["word_val"])
        for _, r in sdf.iterrows()
    }
    for src, words in exp.items():
        for wi, wv in enumerate(words):
            if wv:  # words with no bits set emit no row (no fp hits them)
                assert got[(src, wi)] == wv
    # every emitted word must be in the reference (no phantom bits)
    for (src, wi), wv in got.items():
        assert exp[src][wi] == wv


def test_q81_winsorized_hand_computed(spark, tmp_path):
    name = "q81_winsorized_stats"
    rows, did = [], 0
    for v in range(1, 11):            # xx: 1..10
        rows.append((did, "t", "xx", "s", v)); did += 1
    for v in (1, 1, 1, 1000):         # yy: heavy upper outlier
        rows.append((did, "t", "yy", "s", v)); did += 1
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("lang")
    xx = by.loc["xx"]
    # p10 = 1.9, p90 = 9.1; clamped e1 sum = 19+20+..+90+91 = 550
    assert (int(xx["p10_e1"]), int(xx["p90_e1"])) == (19, 91)
    assert int(xx["winsor_mean_e2"]) == 550
    assert (int(xx["n_clamped_low"]), int(xx["n_clamped_high"])) == (1, 1)
    yy = by.loc["yy"]
    # p10 = 1.0, p90 = 1 + 0.7*999 = 700.3; the outlier is damped:
    # winsorized mean 175.82 vs raw mean 250.75
    assert (int(yy["p10_e1"]), int(yy["p90_e1"])) == (10, 7003)
    assert int(yy["winsor_mean_e2"]) == (10 + 10 + 10 + 7003) * 10 // 4
    assert (int(yy["n_clamped_low"]), int(yy["n_clamped_high"])) == (0, 1)


def _kmv_hash(text):
    return int(hashlib.md5(f"kmv:{text}".encode()).hexdigest()[:12], 16)


def _kmv_vals(sdf, source):
    return sorted(
        int(r.hv) for _, r in sdf[sdf["source"] == source].iterrows()
    )


def test_q82_kmv_estimate_and_merge(spark, tmp_path):
    from german_ocr_spark.queries import KMV_K

    name = "q82_kmv_sketch"
    rows = [(i, f"unique kmv text {i}", "en", "srcA") for i in range(300)]
    parts = {}
    for sub, rs in (("full", rows), ("h1", rows[:150]), ("h2", rows[150:])):
        p = tmp_path / sub
        p.mkdir()
        parts[sub] = _write_docs(p, rs)
    sdf = QUERIES[name](spark, parts["full"]).toPandas()
    assert compare(sdf, _oracle(parts["full"], name)) is None
    vals = _kmv_vals(sdf, "srcA")
    assert len(vals) == KMV_K
    # sketch holds exactly the k smallest hashes of the distinct set
    truth = sorted(_kmv_hash(f"unique kmv text {i}") for i in range(300))
    assert vals == truth[:KMV_K]
    # cardinality estimate (k-1) * 2^48 / kth_min within KMV error bounds
    est = (KMV_K - 1) * (1 << 48) / vals[-1]
    assert abs(est - 300) / 300 < 0.6  # sigma ~= 1/sqrt(k-1) ~ 18%
    # mergeability: k smallest of the union of part sketches == full
    v1 = _kmv_vals(QUERIES[name](spark, parts["h1"]).toPandas(), "srcA")
    v2 = _kmv_vals(QUERIES[name](spark, parts["h2"]).toPandas(), "srcA")
    merged = sorted(set(v1) | set(v2))[:KMV_K]
    assert merged == vals


def test_q83_resemblance_exact_extremes(spark, tmp_path):
    """Identical sources estimate Jaccard exactly 1; disjoint sources
    exactly 0 — deterministic regardless of sketch size."""
    name = "q83_kmv_resemblance"
    rows = []
    for i in range(100):  # twin and copy: identical text sets
        rows.append((i, f"shared text {i}", "en", "twin"))
        rows.append((100 + i, f"shared text {i}", "en", "copy"))
        rows.append((200 + i, f"private text {i}", "en", "other"))
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index(["source_a", "source_b"])
    assert int(by.loc[("copy", "twin"), "jaccard_est_ppm"]) == 1000000
    assert int(by.loc[("copy", "other"), "jaccard_est_ppm"]) == 0
    assert int(by.loc[("other", "twin"), "jaccard_est_ppm"]) == 0


def test_q83_partial_overlap_estimate(spark, tmp_path):
    name = "q83_kmv_resemblance"
    rows = [(i, f"common doc {i}", "en", "srcA") for i in range(100)]
    rows += [(100 + i, f"common doc {i}", "en", "srcB") for i in range(100)]
    rows += [(200 + i, f"only a {i}", "en", "srcA") for i in range(100)]
    rows += [(300 + i, f"only b {i}", "en", "srcB") for i in range(100)]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    # true J = 100 / 300; k=32 sampling sigma ~ sqrt(J(1-J)/k) ~ 0.083
    ppm = int(sdf.set_index(["source_a", "source_b"])
              .loc[("srcA", "srcB"), "jaccard_est_ppm"])
    assert 83000 < ppm < 633000  # J_hat within ~3.6 sigma of 1/3


def test_q84_one_sided_guarantee_and_exact_rescore(spark, tmp_path):
    from german_ocr_spark.queries import HH_FRACTION_DEN

    name = "q84_heavy_hitters"
    # heavy hitter 'hot' carries ~44% of mass; tail of singletons
    rows = [(0, " ".join(["hot"] * 160 + ["warm"] * 40), "en", "src0")]
    rows += [
        (1 + i, f"cold{i} filler{i} word{i} pad{i} x{i}", "en", "src0")
        for i in range(40)
    ]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("tok")
    n_tokens = 200 + 40 * 5
    assert int(by.loc["hot", "exact_count"]) == 160
    assert int(by.loc["warm", "exact_count"]) == 40
    # count-min never underestimates -> no true-heavy word is missed
    for tok, cnt in (("hot", 160), ("warm", 40)):
        assert cnt * HH_FRACTION_DEN >= n_tokens  # fixture sanity
        assert tok in by.index
        assert int(by.loc[tok, "cm_estimate"]) >= cnt
        assert int(by.loc[tok, "overestimate"]) >= 0


def test_q85_retention_hand_computed(spark, tmp_path):
    name = "q85_cohort_retention"
    rows = [
        # u1: day0, day1, day2; u2: day0, day2; u3: day1 only
        (0, "2026-01-01 08:00:00", 1, "view", 1.0),
        (1, "2026-01-02 09:00:00", 1, "view", 1.0),
        (2, "2026-01-03 10:00:00", 1, "view", 1.0),
        (3, "2026-01-01 11:00:00", 2, "click", 1.0),
        (4, "2026-01-03 12:00:00", 2, "click", 1.0),
        (5, "2026-01-02 13:00:00", 3, "view", 1.0),
        # u2 twice on day0: distinct (user, day) counts once
        (6, "2026-01-01 23:00:00", 2, "view", 1.0),
    ]
    d = _write_events(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index(["cohort_day", "day_offset"])
    c0 = "2026-01-01"
    assert int(by.loc[(c0, 0), "n_users"]) == 2
    assert int(by.loc[(c0, 1), "n_users"]) == 1
    assert int(by.loc[(c0, 2), "n_users"]) == 2
    assert int(by.loc[(c0, 0), "retention_ppm"]) == 1000000
    assert int(by.loc[(c0, 1), "retention_ppm"]) == 500000
    assert int(by.loc[(c0, 2), "retention_ppm"]) == 1000000
    assert int(by.loc[("2026-01-02", 0), "n_users"]) == 1


def _write_embeddings(tmp_path, rows):
    """rows: list of (vec_id, embedding list[float], label)."""
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf["vec_id"] = pdf["vec_id"].astype("int64")
    pdf["label"] = pdf["label"].astype("int32")
    pdf["embedding"] = pdf["embedding"].apply(
        lambda v: np.asarray(v, dtype="float32")
    )
    pdf.to_parquet(f"{tmp_path}/embeddings.parquet", index=False)
    return str(tmp_path)


def test_q86_perfect_recall_on_single_cluster(spark, tmp_path):
    """When every corpus vector lands in one IVF cell the probe set
    covers all candidates, so IVF top-k == brute-force top-k and the
    audit must report exactly 1000000 ppm for every query."""
    from german_ocr_spark.queries import IVF_N_CELLS, IVF_TOP_K

    name = "q86_ann_recall_audit"
    dim = 8
    rows = []
    # spread-out centroids 0..15
    for c in range(IVF_N_CELLS):
        v = [0.0] * dim
        v[c % dim] = 100.0 * (1 + c // dim)
        rows.append((c, v, 0))
    # corpus 16..40: one tight cluster near centroid 0
    for i in range(25):
        v = [100.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        v[1] = 0.01 * i
        v[2] = 0.003 * (i % 7)
        rows.append((IVF_N_CELLS + i, v, 1))
    d = _write_embeddings(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert len(sdf) == 5
    assert (sdf["n_matched"] == IVF_TOP_K).all()
    assert (sdf["recall_ppm"] == 1000000).all()


def test_q87_multiplicity_and_lane_mass_conservation(spark, tmp_path):
    from german_ocr_spark.queries import SAMPLE_LANES, SAMPLE_STEP

    name = "q87_systematic_sample"
    rows = [(i, _words(f"d{i}_", 37), "en", "src0") for i in range(60)]
    # one giant doc: > 2 steps of tokens -> multiplicity >= 2
    rows.append((60, _words("g", 2 * SAMPLE_STEP + 50), "en", "src0"))
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("doc_id")
    assert int(by.loc[60, "n_picks"]) >= 2
    # per-lane pick totals equal floor(lane token mass / STEP)
    def lane(i):
        h = int(hashlib.md5(f"samp:{i}".encode()).hexdigest()[:4], 16)
        return h % SAMPLE_LANES

    mass = {}
    for i in range(60):
        mass[lane(i)] = mass.get(lane(i), 0) + 37
    mass[lane(60)] = mass.get(lane(60), 0) + 2 * SAMPLE_STEP + 50
    got = sdf.groupby("lane")["n_picks"].sum().to_dict()
    want = {ln: m // SAMPLE_STEP for ln, m in mass.items() if m // SAMPLE_STEP}
    assert {int(k): int(v) for k, v in got.items()} == want


def test_q88_deciles_hand_computed_and_tie_coherent(spark, tmp_path):
    name = "q88_length_deciles"
    rows, did = [], 0
    for v in range(1, 11):  # xx: one doc per length 1..10
        rows.append((did, "t", "xx", "s", v)); did += 1
    for v in (5, 5, 5, 9):  # yy: ties share a decile
        rows.append((did, "t", "yy", "s", v)); did += 1
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    xx = sdf[sdf.lang == "xx"].set_index("n_chars")["decile"]
    # uniform 1..10: decile of v = ceil(10*v/10) = v
    assert {int(k): int(v) for k, v in xx.items()} == {
        v: v for v in range(1, 11)
    }
    yy = sdf[sdf.lang == "yy"]
    # all three 5s: cum 3 of 4 -> ceil(30/4) = 8; the 9: decile 10
    assert set(yy[yy.n_chars == 5]["decile"]) == {8}
    assert set(yy[yy.n_chars == 9]["decile"]) == {10}


def test_q91_invoice_fields_hand_computed(spark, tmp_path):
    """The German-locale normalization is exact: doc_id 1234567 yields
    amount 1.234.567,89-style grouping (three dot groups), an ISO
    date, and cents that match the closed-form fixture rule."""
    name = "q91_invoice_fields"
    d = _write_docs(
        tmp_path,
        [(1234567, "x", "de", "src0"), (3, "y", "de", "src0")],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("doc_id")
    assert by.loc[1234567, "invoice_no"] == "RE-2024-1234567"
    # day = 1 + id%28, month = 1 + id%12
    assert by.loc[1234567, "invoice_date"] == "2024-08-20"
    assert by.loc[1234567, "amount_cents"] == (1234567 * 7919 + 4242) % 10**7
    assert by.loc[3, "invoice_date"] == "2024-04-04"
    assert by.loc[3, "amount_cents"] == 3 * 7919 + 4242


def test_q92_lm_cost_hand_computed(spark, tmp_path):
    """'table' = bigrams ta(3) ab(12) bl(12) le(3) -> total 30 over 4
    bigrams -> 7500 e3 (keep); 'zzzzz' pays the default everywhere ->
    12000 e3 (drop)."""
    name = "q92_lm_quality"
    d = _write_docs(
        tmp_path,
        [(0, "table", "en", "src0"), (1, "zzzzz", "en", "src0")],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("doc_id")
    assert by.loc[0, "lm_cost_e3"] == (3 + 12 + 12 + 3) * 1000 // 4
    assert bool(by.loc[0, "keep"]) is True
    assert by.loc[1, "lm_cost_e3"] == 12000
    assert bool(by.loc[1, "keep"]) is False


def test_q93_url_canonicalization_semantics(spark, tmp_path):
    """Host lowercased + www-stripped; every utm_* param deleted; the
    non-tracking param survives; no trailing separator left behind."""
    name = "q93_url_canonical"
    d = _write_docs(tmp_path, [(42, "x", "de", "srcA")])
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    row = sdf.iloc[0]
    assert row["host"] == "srca.de"
    assert row["canonical_url"] == "https://WWW.srcA.de/doc/42?id=42"


def test_q94_sentence_count_protects_abbreviations(spark, tmp_path):
    """doc 2 -> 1 lead + 3 repeated + 1 tail = 5 sentences; the six
    abbreviation dots (Dr., z. B., Nr., ca., bzw.) never count."""
    name = "q94_sentence_segment"
    d = _write_docs(tmp_path, [(2, "x", "de", "src0"), (0, "y", "de", "src0")])
    sdf = QUERIES[name](spark, d).toPandas().set_index("doc_id")
    assert compare(
        sdf.reset_index(), _oracle(d, name)
    ) is None
    assert sdf.loc[2, "n_sentences"] == 5
    assert sdf.loc[0, "n_sentences"] == 3


def test_q95_fertility_hand_computed(spark, tmp_path):
    """'Hallo, Welt' -> 2 ws tokens, 4 BPE-ish tokens (word, comma,
    word) ... fertility = bpe*1e6 // ws, exact."""
    name = "q95_tokenizer_fertility"
    d = _write_docs(
        tmp_path,
        [(0, "Hallo, Welt", "de", "s0"), (1, "a b c", "en", "s0")],
    )
    sdf = QUERIES[name](spark, d).toPandas().set_index("lang")
    assert compare(sdf.reset_index(), _oracle(d, name)) is None
    # de: ws=2; bpe: 'Hallo' ',' ' Welt' -> 3
    assert (sdf.loc["de", "n_ws_tokens"], sdf.loc["de", "n_bpe_tokens"]) == (2, 3)
    assert sdf.loc["de", "fertility_ppm"] == 3 * 1000000 // 2
    assert (sdf.loc["en", "n_ws_tokens"], sdf.loc["en", "n_bpe_tokens"]) == (3, 3)
    assert sdf.loc["en", "fertility_ppm"] == 1000000


def test_q96_decompound_branches(spark, tmp_path):
    """doc 8: plain compound head+tail; doc 3: Fugen-s; doc 0 (%7==0):
    bare dictionary word, no split."""
    name = "q96_decompound"
    d = _write_docs(
        tmp_path,
        [(8, "x", "de", "s0"), (3, "x", "de", "s0"), (0, "x", "de", "s0")],
    )
    sdf = QUERIES[name](spark, d).toPandas().set_index("doc_id")
    assert compare(sdf.reset_index(), _oracle(d, name)) is None
    # doc 8: dict[0]='rechnung' + dict[1]='nummer'
    assert (sdf.loc[8, "head"], sdf.loc[8, "tail"], bool(sdf.loc[8, "fugen_s"])) == (
        "rechnung", "nummer", False,
    )
    assert sdf.loc[8, "word"] == "rechnungnummer"
    # doc 3: dict[3]='kunden' + 's' + dict[6]='steuer'
    assert (sdf.loc[3, "head"], sdf.loc[3, "tail"], bool(sdf.loc[3, "fugen_s"])) == (
        "kunden", "steuer", True,
    )
    assert sdf.loc[3, "word"] == "kundenssteuer"
    # doc 0: bare word stays whole
    assert (sdf.loc[0, "head"], sdf.loc[0, "tail"], bool(sdf.loc[0, "fugen_s"])) == (
        "rechnung", "", False,
    )


def test_q97_host_weighted_mean(spark, tmp_path):
    """Two docs on one host: the host score is the token-WEIGHTED mean
    (sum wsum / sum tokens), not the mean of per-doc means."""
    name = "q97_host_curation"
    d = _write_docs(
        tmp_path,
        [(0, "alpha beta", "en", "hostA"), (8, "alpha", "en", "hostA")],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None

    def w(tok):
        h = int(hashlib.md5(f"w:{tok}".encode()).hexdigest()[:12], 16)
        return h % QC_MOD

    row = sdf.set_index("host").loc["hosta.de"]
    total_w = w("alpha") + w("beta") + w("alpha")
    assert (row["n_docs"], row["n_tokens"]) == (2, 3)
    assert row["host_quality_e3"] == total_w * 1000 // 3
    assert row["verdict"] == (
        "keep" if total_w * 1000 // 3 >= 500000 else "drop"
    )


def test_q98_calibration_exactness(spark, tmp_path):
    """Two identical docs: est = exact = 1e6, err 0. A near-dup pair
    (one token changed out of many) must report exact < 1e6 and the
    est/exact gap bounded by the 6-component granularity."""
    name = "q98_minhash_calibration"
    base = _words("w", 30)
    near = base.replace("w29", "zzz")
    d = _write_docs(
        tmp_path,
        [(0, base, "en", "s0"), (1, base, "en", "s0"), (2, near, "en", "s0")],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    pairs = {
        (r.doc_a, r.doc_b): r for r in sdf.itertuples(index=False)
    }
    dup = pairs[("0", "1")]
    assert (dup.est_ppm, dup.exact_ppm, dup.abs_err_ppm) == (
        1000000, 1000000, 0,
    )
    for key in (("0", "2"), ("1", "2")):
        if key in pairs:
            r = pairs[key]
            assert r.exact_ppm < 1000000
            assert r.abs_err_ppm == abs(r.est_ppm - r.exact_ppm)


def test_q99_pagerank_matches_integer_reference(spark, tmp_path):
    """3-node planted graph vs a plain-Python replica of the exact
    integer recurrence (floors and all) — bit equality, and the node
    every doc links to outranks the teleport-only sources."""
    name = "q99_host_pagerank"
    # doc_id 0 -> dst src1; doc_id 5 -> dst src16; two source nodes
    d = _write_docs(
        tmp_path, [(0, "x", "en", "a"), (5, "x", "en", "b")]
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None

    edges = {("a", "src1"): 1, ("b", "src16"): 1}
    nodes = {"a", "b", "src1", "src16"}
    out = {}
    for (s, _), w in edges.items():
        out[s] = out.get(s, 0) + w
    r = {n: 10**9 for n in nodes}
    for _ in range(3):
        nxt = {}
        for n in nodes:
            s = sum(
                (r[u] * w) // out[u]
                for (u, v), w in edges.items()
                if v == n
            )
            nxt[n] = 150_000_000 + (85 * s) // 100
        r = nxt
    got = sdf.set_index("host")["rank_e9"].to_dict()
    assert got == r
    assert got["src1"] > got["a"]  # linked node outranks leaf sources


def test_q100_mojibake_planted_damage_and_lossless_repair(spark, tmp_path):
    """doc 0 (residue 0) is damaged and carries ä+ö+ß -> 3 hits; doc 4
    (residue 0) is damaged but has no German chars -> 0 hits and NOT
    counted as mojibake; docs 1/3 are undamaged; repair round-trips on
    every document."""
    name = "q100_mojibake_repair"
    d = _write_docs(
        tmp_path,
        [
            (0, "value group plain", "de", "src0"),
            (1, "value value", "de", "src0"),
            (3, "plain only", "de", "src0"),
            (4, "no markers here", "de", "src0"),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    row = sdf.set_index("source").loc["src0"]
    assert row["n_docs"] == 4
    assert row["mojibake_docs"] == 1
    assert row["umlaut_hits"] == 3
    assert row["repaired_ok_docs"] == 4


def test_q101_savings_histogram_collapses_padded_recrawl(spark, tmp_path):
    """docs 0 and 7 (residue 0) are re-crawled with padding by the
    query's planting rule; canonical fp collapses all four 'hello
    world' variants into one size-4 group (redundant: 3 docs, 41 chars
    = 11+15+15 over the 11-char keeper); doc 3 stays a singleton."""
    name = "q101_dedup_savings"
    d = _write_docs(
        tmp_path,
        [
            (0, "hello world", "de", "src0"),
            (7, "hello world", "de", "src0"),
            (3, "unique", "de", "src0"),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by_sz = sdf.set_index("group_size")
    assert by_sz.loc[4, "n_groups"] == 1
    assert by_sz.loc[4, "redundant_docs"] == 3
    assert by_sz.loc[4, "redundant_chars"] == 41
    assert by_sz.loc[1, "n_groups"] == 1
    assert by_sz.loc[1, "redundant_docs"] == 0


def test_q102_simpson_hand_computed(spark, tmp_path):
    """de: sources (3,1) -> n=4, s2=10 -> (16-10)*1e6 div 16 = 375000;
    en: single source -> 0 diversity."""
    name = "q102_source_diversity"
    d = _write_docs(
        tmp_path,
        [
            (0, "a", "de", "src0"),
            (1, "b", "de", "src0"),
            (2, "c", "de", "src0"),
            (3, "d", "de", "src1"),
            (4, "e", "en", "src2"),
            (5, "f", "en", "src2"),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas().set_index("lang")
    assert compare(sdf.reset_index(), _oracle(d, name)) is None
    assert sdf.loc["de", "simpson_e6"] == 375000
    assert sdf.loc["de", "n_sources"] == 2
    assert sdf.loc["en", "simpson_e6"] == 0


def test_q103_yield_and_exact_roundtrip(spark, tmp_path):
    """10-char main text inside the 62-char construction -> yield
    161290 ppm; the regex block equals the main text exactly."""
    name = "q103_extraction_yield"
    d = _write_docs(tmp_path, [(0, "hello welt", "de", "srcA")])
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    row = sdf.iloc[0]
    assert row["extracted_chars"] == 10
    assert row["exact_ok_docs"] == 1
    assert row["yield_ppm"] == row["extracted_chars"] * 1000000 // row["wire_chars"]


def test_q104_profile_counts_planted_violations(spark, tmp_path):
    """null text (counts as null AND blank), padded-blank text,
    negative id, blank lang, and a stale n_chars are each counted in
    exactly the right cell."""
    name = "q104_ingest_profile"
    d = _write_docs(
        tmp_path,
        [
            (0, None, "de", "src0", 5),
            (1, "abc", "de", "src0", 99),
            (2, "  ", "de", "src0", 2),
            (-3, "x", " ", "src0", 1),
        ],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    v = sdf.set_index(["col", "metric"])["value"]
    assert v[("text", "nulls")] == 1
    assert v[("text", "blanks")] == 2
    assert v[("text", "max_len")] == 3
    assert v[("doc_id", "negatives")] == 1
    assert v[("lang", "blanks")] == 1
    assert v[("n_chars", "mismatches")] == 1


def test_q105_centroid_update_matches_numpy(spark, tmp_path):
    """One Lloyd step on the live sf0.001 embeddings: per-cell means
    must equal a numpy replica of assign->mean (floor6), and member
    counts must cover the whole corpus exactly once."""
    import numpy as np

    name = "q105_kmeans_update"
    sf = "/root/testdata/sf0.001"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    import pandas as pd

    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    emb = emb[emb["embedding"].apply(len) > 0]
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    cents = {i: vecs[i] for i in range(16) if i in vecs}
    members = {}
    for vid, v in vecs.items():
        if vid < 16:
            continue
        best = min(cents, key=lambda c: (float(((v - cents[c]) ** 2).sum()), c))
        members.setdefault(best, []).append(v)
    # every corpus vector lands in exactly one cell
    assert sdf.groupby("cell")["n_members"].first().sum() == sum(
        len(m) for m in members.values()
    )
    for (cell, pos), grp in sdf.groupby(["cell", "pos"]):
        arr = np.stack(members[cell])
        want = np.floor(arr[:, pos - 1].mean() * 1e6) / 1e6
        got = float(grp["mean_f6"].iloc[0])
        assert abs(got - want) <= 1e-6, (cell, pos, got, want)


def test_q106_sample_is_threshold_ranked_and_capped(spark, tmp_path):
    """Every sampled hash is under the prefilter threshold, ranks are
    1..n<=K per lang, and the draw equals the oracle bit-for-bit."""
    from german_ocr_spark.queries import INSPECT_K, INSPECT_PRE_T

    name = "q106_inspection_sample"
    sf = "/root/testdata/sf0.001"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    assert (sdf["h16"] < INSPECT_PRE_T).all()
    for lang, grp in sdf.groupby("lang"):
        assert list(grp.sort_values("rk")["rk"]) == list(
            range(1, len(grp) + 1)
        )
        assert len(grp) <= INSPECT_K


def test_q107_dupspan_merge_and_counts(spark, tmp_path):
    """Planted duplicate runs: a 7-token run shared by two docs merges
    its three overlapping 5-gram hits into ONE span covering exactly 7
    tokens; a 5-token run repeated twice inside one doc (and once in
    another) yields TWO merged spans; a fully unique doc emits no row.
    Hand-computed counts + oracle parity on the planted fixture."""
    shared7 = "s1 s2 s3 s4 s5 s6 s7"
    run5 = "t1 t2 t3 t4 t5"
    sf = _write_docs(
        tmp_path,
        [
            (1, f"a1 a2 a3 {shared7} a4 a5", "de", "srcA"),
            (2, f"b1 b2 {shared7} b3", "de", "srcA"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8", "de", "srcB"),
            (4, f"d1 {run5} d2 d3 d4 d5 {run5} d6", "de", "srcB"),
            (5, f"e1 {run5} e2", "de", "srcB"),
        ],
    )
    name = "q107_dupspan_removal"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    got = {
        int(r.doc_id): (int(r.n_tokens), int(r.dup_tokens), int(r.dup_spans))
        for r in sdf.itertuples()
    }
    # doc 1: 12 tokens, gram starts {4,5,6} merge to one 7-token span
    # doc 2: 10 tokens, starts {3,4,5} -> one 7-token span
    # doc 4: 16 tokens, starts {2,11}, gap 9 >= K -> two 5-token spans
    # doc 5:  7 tokens, start {2} -> one 5-token span
    assert got == {
        1: (12, 7, 1),
        2: (10, 7, 1),
        4: (16, 10, 2),
        5: (7, 5, 1),
    }
    keep = {int(r.doc_id): r.keep_ratio for r in sdf.itertuples()}
    assert keep[1] == pytest.approx((12 - 7) / 12, abs=2e-6)


def test_q108_langmix_hand_computed(spark, tmp_path):
    """Two languages with 100 vs 400 tokens: sqrt basis 10 vs 20, so
    temp shares are 1/3 and 2/3 against raw shares 0.2 / 0.8 and the
    low-resource boost is (10*500)/(30*100) = 5/3."""
    lo = " ".join(f"w{i}" for i in range(100))
    hi = " ".join(f"v{i}" for i in range(400))
    sf = _write_docs(
        tmp_path, [(1, lo, "lo", "s"), (2, hi, "hi", "s")]
    )
    name = "q108_language_mix"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    r = {row.lang: row for row in sdf.itertuples()}
    assert (r["lo"].n_tokens, r["hi"].n_tokens) == (100, 400)
    assert r["lo"].raw_share == pytest.approx(0.2, abs=2e-6)
    assert r["lo"].temp_share == pytest.approx(1 / 3, abs=2e-6)
    assert r["hi"].temp_share == pytest.approx(2 / 3, abs=2e-6)
    assert r["lo"].epoch_boost == pytest.approx(5 / 3, abs=2e-6)
    assert r["hi"].epoch_boost == pytest.approx(5 / 6, abs=2e-6)


def test_q109_nfc_composes_planted_sequences(spark, tmp_path):
    """Every 'a' gains a combining diaeresis; NFC must compose each
    back into one precomposed codepoint, so n_composed == count('a')
    and the normalized hash equals the hand-built expectation."""
    sf = _write_docs(
        tmp_path,
        [(1, "Bar baz", "de", "s"), (2, "Ohne Treffer", "de", "s")],
    )
    name = "q109_nfc_normalize"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    got = {int(r.doc_id): r for r in sdf.itertuples()}
    assert got[1].n_composed == 2
    assert got[2].n_composed == 0
    exp = hashlib.md5("Bär bäz".encode()).hexdigest()[:16]
    assert got[1].norm_hash == exp


def test_q111_stitch_found_and_template_tail_capped(spark, tmp_path):
    """A genuine (prev, next) page split is stitched with the overlap
    counted once; a template tail shared by more than CONT_DF_CAP docs
    is dropped by the stop-template guard, so its would-be continuation
    never pairs."""
    from german_ocr_spark.queries import CONT_DF_CAP, CONT_K

    assert CONT_K == 3
    rows = [
        (1, "a b c x1 x2 x3", "de", "s"),
        (2, "x1 x2 x3 d e f g", "de", "s"),
    ]
    # CONT_DF_CAP + 2 docs ending in the same template tail
    for i in range(CONT_DF_CAP + 2):
        rows.append((100 + i, f"p{i} q{i} r{i} z1 z2 z3", "de", "s"))
    rows.append((300, "z1 z2 z3 w1 w2 w3 w4", "de", "s"))
    sf = _write_docs(tmp_path, rows)
    name = "q111_continuation_pairs"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    pairs = {(int(a), int(b)) for a, b in zip(sdf["prev_doc"], sdf["next_doc"])}
    assert pairs == {(1, 2)}
    row = sdf.iloc[0]
    assert (row.prev_n, row.next_n, row.stitched_n) == (6, 7, 10)


def test_q112_cluster_key_prevents_split_straddle(spark, tmp_path):
    """Docs 1 and 4 are near-duplicates; hashed INDEPENDENTLY doc 1
    lands in train and doc 4 in val (verified below), so a naive
    per-doc split would leak the pair across the boundary. The cluster
    representative ('1' = lexicographic min) must pull BOTH into
    train, leaving val with zero clustered docs and the crossing-pair
    audit at zero."""
    import hashlib as _hl

    from german_ocr_spark.queries import SPLIT_TEST_T, SPLIT_VAL_T

    def h16(x):
        return int(_hl.md5(("split:" + x).encode()).hexdigest()[:4], 16)

    assert h16("1") >= SPLIT_TEST_T  # naive: train
    assert h16("4") < SPLIT_VAL_T  # naive: val
    shared = "gleicher inhalt wird geteilt zwischen seiten eins und zwei"
    rows = [(1, shared, "de", "s"), (4, shared, "de", "s")]
    for i in range(16):
        rows.append((100 + i, f"einzig{i} text{i} ohne{i} paar{i}", "de", "s"))
    sf = _write_docs(tmp_path, rows)
    name = "q112_leakage_free_split"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {r.split: r for r in sdf.itertuples()}
    assert (sdf["crossing_pairs"] == 0).all()
    assert int(sdf["n_docs"].sum()) == len(rows)
    assert by["train"].n_clustered == 2
    assert "val" not in by or by["val"].n_clustered == 0


def test_q113_double_extraction_planted_residues(spark, tmp_path):
    """doc 12 plants the html/ocr duplicate (12%5==2), doc 10 the
    pdf/text duplicate (10%7==3), doc 17 BOTH (17%5==2 and 17%7==3),
    doc 11 neither; texts exceed 40 chars so the pdf prefix span never
    accidentally equals a full span."""
    long = "dies ist ein deutlich laengerer text der vierzig zeichen klar ueberschreitet"
    sf = _write_docs(
        tmp_path,
        [(i, f"{long} nummer {i}", "de", "s") for i in (10, 11, 12, 17)],
    )
    name = "q113_double_extraction"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    got = {
        (r.kind_a, r.kind_b): (int(r.n_pairs), int(r.n_docs))
        for r in sdf.itertuples()
    }
    assert got == {("html", "ocr"): (2, 2), ("pdf", "text"): (2, 2)}


def test_q114_incremental_joins_new_against_index_only(spark, tmp_path):
    """The daily batch (doc_id % 10 == 7) pairs against the standing
    index, but index-internal near-dups are NEVER emitted — the
    incremental property that makes the daily run cheap."""
    dup1 = "der gemeinsame inhalt erscheint im neuen crawl und im index"
    dup2 = "dieser index interne doppelte inhalt darf nie auftauchen hier"
    sf = _write_docs(
        tmp_path,
        [
            (7, dup1, "de", "s"),  # new batch
            (21, dup1, "de", "s"),  # index twin of 7
            (13, dup2, "de", "s"),  # index-internal dup pair...
            (23, dup2, "de", "s"),  # ...must not be emitted
            (17, "voellig anderer einzigartiger neuer text heute", "de", "s"),
        ],
    )
    name = "q114_incremental_near_dup"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    pairs = {(a, b) for a, b in zip(sdf["new_doc"], sdf["index_doc"])}
    assert ("7", "21") in pairs
    assert all(n in ("7", "17") for n, _ in pairs)
    assert not any({a, b} == {"13", "23"} for a, b in pairs)
    ham = sdf.set_index(["new_doc", "index_doc"]).loc[("7", "21"), "hamming"]
    assert int(ham) == 0


def test_q115_hard_negatives_exclude_same_label_and_other_bucket(spark, tmp_path):
    """Anchor 0 (label 1): its closest vector shares the label (never a
    negative), its cross-bucket twin is outside the ANN candidate set,
    and the two same-bucket different-label vectors rank by cosine."""
    import numpy as np
    import pandas as pd

    def vec(scale, first_dim=1.0, noise=0.0):
        v = np.full(64, 1.0) * scale
        v[0] = first_dim * scale
        v[63] += noise
        return [float(x) for x in v]

    rows = [
        (0, vec(1.0), 1),            # anchor, label 1
        (10, vec(0.9), 1),           # cos 1.0 but SAME label -> excluded
        (11, vec(1.0, noise=0.5), 2),  # near, diff label -> rank 1
        (12, vec(1.0, noise=8.0), 2),  # farther, diff label -> rank 2
        (13, vec(1.0, first_dim=-1.0), 2),  # different bucket -> excluded
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf["vec_id"] = pdf["vec_id"].astype("int64")
    pdf["label"] = pdf["label"].astype("int32")
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(pdf["vec_id"], pa.int64()),
            "embedding": pa.array(pdf["embedding"], pa.list_(pa.float32())),
            "label": pa.array(pdf["label"], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
    name = "q115_hard_negatives"
    sdf = QUERIES[name](spark, str(tmp_path)).toPandas()
    assert compare(sdf, _oracle(str(tmp_path), name)) is None
    mine = sdf[sdf["query_id"] == 0].sort_values("rn")
    assert list(mine["neighbor_id"]) == [11, 12]
    assert 10 not in set(sdf["neighbor_id"])
    assert 13 not in set(sdf["neighbor_id"])
    assert mine.iloc[0].cos_sim > mine.iloc[1].cos_sim


def test_q116_coverage_hand_computed_on_skewed_vocab(spark, tmp_path):
    """Counts a:8 b:4 c:2 d:1 e:1 (total 16) give coverage 0.5 / 0.75
    / 0.9375 at K = 1/2/4 and saturate at 1.0 with all 5 types."""
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d", "e"])
    sf = _write_docs(tmp_path, [(1, text, "de", "s")])
    name = "q116_vocab_coverage"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {int(r.k): r for r in sdf.itertuples()}
    assert by[1].coverage == pytest.approx(0.5, abs=2e-6)
    assert by[2].coverage == pytest.approx(0.75, abs=2e-6)
    assert by[4].coverage == pytest.approx(0.9375, abs=2e-6)
    assert by[16].n_types == 5 and by[16].coverage == pytest.approx(1.0)
    assert by[31].n_types == 5


def test_q117_quantize_hand_computed(spark, tmp_path):
    """Vector [0, .5, 1, 1]: codes 0/127/255/255 (floor, clamped), the
    only reconstruction error is dim 2's 0.5 - 127/255; a constant
    vector takes the guard branch (all codes 0, zero error)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(
                [[0.0, 0.5, 1.0, 1.0], [2.0, 2.0, 2.0]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
    name = "q117_embedding_quantize"
    sdf = QUERIES[name](spark, str(tmp_path)).toPandas()
    assert compare(sdf, _oracle(str(tmp_path), name)) is None
    by = {int(r.vec_id): r for r in sdf.itertuples()}
    assert by[0].code_sum == 0 + 127 + 255 + 255
    exp_err = 0.5 - 127 / 255
    assert by[0].max_abs_err == pytest.approx(exp_err, abs=2e-6)
    assert by[0].mean_abs_err == pytest.approx(exp_err / 4, abs=2e-6)
    assert by[1].code_sum == 0
    assert by[1].max_abs_err == 0.0 and by[1].mean_abs_err == 0.0


def test_q117_null_element_matches_oracle(spark, tmp_path):
    """A NULL embedding element must not poison the folds (the
    review-r02 repro): its error is skipped like SQL SUM, the mean
    still divides by the full dimension count, and both engines agree
    — including on the code itself, which clamps to 255 because
    least() SKIPS nulls identically in Spark and DuckDB."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array(
                [[0.0, None, 1.0, 1.0]], pa.list_(pa.float32())
            ),
            "label": pa.array([0], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")
    name = "q117_embedding_quantize"
    sdf = QUERIES[name](spark, str(tmp_path)).toPandas()
    assert compare(sdf, _oracle(str(tmp_path), name)) is None
    r = sdf.iloc[0]
    assert int(r.code_sum) == 0 + 255 + 255 + 255
    assert r.max_abs_err == 0.0 and r.mean_abs_err == 0.0


def test_q118_checksum_validity_by_residue(spark, tmp_path):
    """doc_ids 0..5: residue-3 docs (0, 3) carry the digit-rotated
    IBAN and must fail mod-97; the other four validate. The Python
    reference implementation agrees on every planted literal."""
    from german_ocr_spark.queries import _IBANS

    def mod97(iban):
        acc = 0
        for ch in iban[4:] + iban[:4]:
            acc = (
                (acc * 10 + ord(ch) - 48) % 97
                if ch.isdigit()
                else (acc * 100 + ord(ch) - 55) % 97
            )
        return acc

    assert all(mod97(i) == 1 for i in _IBANS)
    rot = str.maketrans("0123456789", "1234567890")
    assert all(mod97(i[:21] + i[21:].translate(rot)) != 1 for i in _IBANS)
    sf = _write_docs(
        tmp_path, [(i, f"beleg {i}", "de", "s") for i in range(6)]
    )
    name = "q118_iban_checksum"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    r = sdf.iloc[0]
    assert (r.n_docs, r.n_valid, r.n_invalid) == (6, 4, 2)


def test_q119_clean_text_and_full_removal(spark, tmp_path):
    """The 7-token shared run disappears from both carriers (hash of
    exactly the surrounding tokens); a fully-duplicated doc cleans to
    the empty string; a unique doc emits no row."""
    shared7 = "s1 s2 s3 s4 s5 s6 s7"
    full = "u1 u2 u3 u4 u5 u6"
    sf = _write_docs(
        tmp_path,
        [
            (1, f"a1 a2 a3 {shared7} a4 a5", "de", "s"),
            (2, f"b1 b2 {shared7} b3", "de", "s"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8", "de", "s"),
            (6, full, "de", "s"),
            (7, full, "de", "s"),
        ],
    )
    name = "q119_dupspan_clean"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {int(r.doc_id): r for r in sdf.itertuples()}
    assert 3 not in by
    assert by[1].kept_tokens == 5
    assert by[1].clean_hash == hashlib.md5(b"a1 a2 a3 a4 a5").hexdigest()[:16]
    assert by[2].kept_tokens == 3
    assert by[2].clean_hash == hashlib.md5(b"b1 b2 b3").hexdigest()[:16]
    for d in (6, 7):
        assert by[d].kept_tokens == 0
        assert by[d].clean_hash == hashlib.md5(b"").hexdigest()[:16]


def test_q120_pq_codes_and_adc_ranking_hand_computed(spark, tmp_path):
    """Codebook from constant seed vectors (seed k == k*10 in every
    dim) makes every subspace centroid [10k]*8, so codes and ADC
    distances are hand-computable: a constant-c vector takes code
    argmin_k (c-10k)^2 in EVERY subspace, and a half-and-half vector
    splits its codes 0000 1111. ADC(query const a, neighbor coded k)
    = 64*(a-10k)^2 summed per the neighbor's per-subspace codes."""
    from german_ocr_spark.queries import PQ_K, PQ_M, PQ_SUBDIM

    dim = PQ_M * PQ_SUBDIM
    rows = [(k, [10.0 * k] * dim, 0) for k in range(PQ_K)]
    rows.append((4, [1.0] * dim, 1))
    rows.append((5, [11.0] * dim, 1))
    rows.append((6, [21.0] * dim, 1))
    rows.append((7, [31.0] * dim, 1))
    rows.append((8, [1.0] * 32 + [11.0] * 32, 1))
    d = _write_embeddings(tmp_path, rows)
    name = "q120_pq_adc_topk"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    packed = {
        int(r.neighbor_id): int(r.code_packed) for r in sdf.itertuples()
    }
    assert packed[4] == 0
    assert packed[5] == sum(4**m for m in range(8))  # 21845
    assert packed[6] == 2 * 21845
    assert packed[7] == 3 * 21845
    assert packed[8] == sum(4**m for m in range(4, 8))  # 21760
    q4 = sdf[sdf.query_id == 4].sort_values("rn")
    assert list(q4.neighbor_id) == [8, 5, 6, 7]
    assert list(q4.approx_d2) == [2624.0, 5184.0, 23104.0, 53824.0]


def test_q121_pair_counts_weighted_by_word_frequency(spark, tmp_path):
    """'ab' appears 3x so pair (a,b) counts 3; the (b,a)/(c,d) tie
    breaks on lch; single-character words contribute no pairs; digits
    and punctuation are delimiters."""
    sf = _write_docs(
        tmp_path,
        [
            (1, "ab ab ba", "de", "s"),
            (2, "ab cd7cd", "de", "s"),
            (3, "x y z", "de", "s"),
        ],
    )
    name = "q121_bpe_pair_merge"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    got = [tuple(r) for r in sdf[["lch", "rch", "pair_count"]].values]
    assert got == [("a", "b", 3), ("c", "d", 2), ("b", "a", 1)]


def test_q122_bm25_rational_scoring_hand_computed(spark, tmp_path):
    """Three docs, scores replayed by a plain-Python replica of the
    integer-rational BM25 (same floor-of-double-division per term).
    The doc with two 'vector' hits outranks the single-hit docs; a
    doc with none of the terms scores 0 but still ranks (tiebreak
    doc_id) inside the top-k window."""
    import math

    from german_ocr_spark.queries import BM25_TERMS

    texts = {
        1: "vector join alpha beta",
        2: "vector vector gamma",
        3: "delta epsilon zeta eta",
        4: "customer vector",
    }
    sf = _write_docs(
        tmp_path, [(i, t, "de", "s") for i, t in texts.items()]
    )
    name = "q122_bm25_search"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None

    toks = {i: t.split() for i, t in texts.items()}
    T = sum(len(v) for v in toks.values())
    N = len(toks)

    def score(i):
        s = 0
        for t in BM25_TERMS:
            tf = toks[i].count(t)
            df = sum(1 for v in toks.values() if t in v)
            dl = len(toks[i])
            num = 22 * T * tf * (2 * N - 2 * df + 1)
            den = (2 * df + 1) * (10 * T * tf + 3 * T + 9 * dl * N)
            s += math.floor(num / den * 1000000.0)
        return s

    expect = sorted(
        ((score(i), i) for i in toks), key=lambda p: (-p[0], p[1])
    )
    got = sdf.sort_values("rank")
    assert list(got.doc_id) == [i for _, i in expect]
    assert list(got.score_ppm) == [s for s, _ in expect]
    # two DISTINCT terms in the shortest doc beat a repeated single
    # term (tf saturation + length normalization — the BM25 point),
    # and the no-hit doc scores exactly 0 at the bottom
    assert int(got.iloc[0].doc_id) == 4
    assert int(got.iloc[-1].doc_id) == 3
    assert int(got.iloc[-1].score_ppm) == 0


def test_q123_homoglyph_planting_and_mixed_flag(spark, tmp_path):
    """doc 0 (residue 7) gets its confusables rewritten: 'papa tree
    ox' keeps latin t/r but gains cyrillic р/а/е/о/х — mixed; doc 1
    is untouched pure latin. Counts are exact: 7 of the 9 letters in
    doc 0 are confusables."""
    sf = _write_docs(
        tmp_path,
        [(0, "papa tree ox", "de", "sA"), (1, "plain text", "de", "sA")],
    )
    name = "q123_script_mix_audit"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    r = sdf.iloc[0]
    # doc0 letters: p a p a t r e e o x -> cyr: p,a,p,a,e,e,o,x = 8
    assert (r.n_docs, r.n_mixed, r.cyr_chars) == (2, 1, 8)
    n_lat_total = 2 + 9  # doc0 keeps t,r; doc1 has 9 letters
    assert r.cyr_ppm == math_floor_ppm(8, 8 + n_lat_total)


def math_floor_ppm(a, b):
    import math

    return math.floor(a * 1000000.0 / b)


def test_q124_ivfpq_probe_restriction_and_adc_ranking(spark, tmp_path):
    """IVF centroids c=[100c]*64 and PQ seeds 0..3 (=[0/100/200/300])
    make the composition hand-checkable: query 16 (const 99) probes
    cells {1,0,2,3}, every corpus vector is a candidate, and ADC
    collapses to 64*(99 - 100*code)^2 — so the two code-1 neighbors
    tie at 64 and break on neighbor_id."""
    from german_ocr_spark.queries import IVF_N_CELLS

    dim = 64
    rows = [(c, [100.0 * c] * dim, 0) for c in range(IVF_N_CELLS)]
    vals = {16: 99.0, 17: 101.0, 18: 199.0, 19: 201.0, 20: 301.0,
            21: 98.0}
    rows += [(i, [v] * dim, 1) for i, v in vals.items()]
    d = _write_embeddings(tmp_path, rows)
    name = "q124_ivfpq_search"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    q16 = sdf[sdf.query_id == 16].sort_values("rn")
    assert list(q16.neighbor_id) == [17, 21, 18, 19, 20]
    assert list(q16.approx_d2) == [64.0, 64.0, 652864.0, 652864.0,
                                   2585664.0]


def test_q125_amstad_hand_computed(spark, tmp_path):
    """doc 0 (one repeat of the middle sentence): protection leaves 3
    real terminators; 15 words; 17 vowel runs; FRE_de*1000 =
    180000 - 1000*15/3 - 58500*17/15 = 108700 exactly. The
    abbreviation dots (Dr./z. B./Nr./ca./bzw.) must NOT count as
    sentence ends — without protection s would be 8, not 3."""
    sf = _write_docs(tmp_path, [(0, "unused", "de", "s")])
    name = "q125_flesch_readability"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    r = sdf.iloc[0]
    assert (r.n_sentences, r.n_words, r.n_syllables) == (3, 15, 17)
    assert r.flesch_e3 == 108700
    assert r.band == "leicht"


def test_q126_transition_counts_and_exact_ppm(spark, tmp_path):
    """User 1: view->view->click->view (transitions vv, vc, cv);
    user 2: view->buy. From 'view': vv 1, vc 1, vb 1 -> 333333 ppm
    each (floor). Cross-user pairs must NOT count: the last event of
    user 1 has no successor."""
    rows = [
        (1, "2026-01-01 10:00:00", 1, "view", 0.0),
        (2, "2026-01-01 10:01:00", 1, "view", 0.0),
        (3, "2026-01-01 10:02:00", 1, "click", 0.0),
        (4, "2026-01-01 10:03:00", 1, "view", 0.0),
        (5, "2026-01-01 11:00:00", 2, "view", 0.0),
        (6, "2026-01-01 11:05:00", 2, "buy", 0.0),
    ]
    d = _write_events(tmp_path, rows)
    name = "q126_event_transitions"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = {
        (r.from_type, r.to_type): (int(r.n_transitions), int(r.p_ppm))
        for r in sdf.itertuples()
    }
    assert by[("view", "view")] == (1, 333333)
    assert by[("view", "click")] == (1, 333333)
    assert by[("view", "buy")] == (1, 333333)
    assert by[("click", "view")] == (1, 1000000)
    assert len(by) == 4  # no buy-> row, no cross-user pair


def test_q127_all_three_formats_and_umlaut_month(spark, tmp_path):
    """doc 0 numeric '01.01.2020'; doc 1 written Januar; doc 2 ISO
    passthrough; doc 7 exercises the umlaut month ('8. März 2022');
    doc 34 the last month arm ('7. Dezember 2024'). Every iso value
    is the same date the construction encoded."""
    sf = _write_docs(
        tmp_path, [(i, "x", "de", "s") for i in (0, 1, 2, 7, 34)]
    )
    name = "q127_date_normalize"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {int(r.doc_id): r for r in sdf.itertuples()}
    assert (by[0].raw, by[0].fmt, by[0].iso) == (
        "01.01.2020", "de_numeric", "2020-01-01")
    assert (by[1].raw, by[1].fmt, by[1].iso) == (
        "2. Januar 2021", "de_written", "2021-01-02")
    assert (by[2].raw, by[2].fmt, by[2].iso) == (
        "2022-01-03", "iso", "2022-01-03")
    assert (by[7].raw, by[7].fmt, by[7].iso) == (
        "8. März 2022", "de_written", "2022-03-08")
    assert (by[34].raw, by[34].fmt, by[34].iso) == (
        "7. Dezember 2024", "de_written", "2024-12-07")


def test_q128_full_recall_on_small_candidate_set(spark, tmp_path):
    """With only 4 candidates and k=5 both the exact-L2 and ADC top-k
    contain the whole candidate set, so recall is exactly 1000000 for
    every query — even though ADC and exact ORDER differ for the
    half-and-half vector (ADC quantizes it toward the code-1
    centroid). The oracle compare proves the per-query counts."""
    from german_ocr_spark.queries import PQ_K, PQ_M, PQ_SUBDIM

    dim = PQ_M * PQ_SUBDIM
    rows = [(k, [10.0 * k] * dim, 0) for k in range(PQ_K)]
    rows.append((4, [1.0] * dim, 1))
    rows.append((5, [11.0] * dim, 1))
    rows.append((6, [21.0] * dim, 1))
    rows.append((7, [31.0] * dim, 1))
    rows.append((8, [1.0] * 32 + [11.0] * 32, 1))
    d = _write_embeddings(tmp_path, rows)
    name = "q128_pq_recall_audit"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert len(sdf) == 5
    assert (sdf["n_matched"] == 4).all()
    assert (sdf["recall_ppm"] == 1000000).all()


def test_q129_trained_costs_hand_computed(spark, tmp_path):
    """Corpus 'aaaa'+'abab'+'ba'+'xy' has bigram counts aa:3 ab:2 ba:2
    xy:1 (t=8); ranks break count ties on the bigram string, ppm is the
    exact floor, and cost_bits = floor(log2(t div n)) computed via
    bin() length: 8//3=2 -> 1 bit, 8//2=4 -> 2, 8//1=8 -> 3."""
    sf = _write_docs(
        tmp_path,
        [(0, "aaaa", "de", "s"), (1, "abab", "de", "s"),
         (2, "ba", "de", "s"), (3, "xy", "de", "s")],
    )
    name = "q129_lm_train_bigrams"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    rows = [
        (r.rank, r.bigram, r.n, r.ppm, r.cost_bits)
        for r in sdf.sort_values("rank").itertuples()
    ]
    assert rows == [
        (1, "aa", 3, 375000, 1),
        (2, "ab", 2, 250000, 2),
        (3, "ba", 2, 250000, 2),
        (4, "xy", 1, 125000, 3),
    ]


def test_q130_dsir_weights_and_selection_hand_computed(spark, tmp_path):
    """'der' and 'the' hash to distinct buckets (212 vs 196). Target
    slice (de) holds 2 of the 6 tokens, all 'der': weight(der) =
    2e6//2 - 3e6//6 = +500000, weight(the) = -500000. doc0 (der der)
    scores +500000 -> selected; doc1 (the the) scores -500000 ->
    dropped; doc2 (der the) scores exactly 0 -> selected at the >= 0
    threshold."""
    import hashlib as _h

    b = lambda t: int(_h.md5(t.encode()).hexdigest()[:4], 16) % 256
    assert b("der") != b("the")
    sf = _write_docs(
        tmp_path,
        [(0, "der der", "de", "s0"), (1, "the the", "en", "s0"),
         (2, "der the", "en", "s1")],
    )
    name = "q130_dsir_selection"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {r.source: r for r in sdf.itertuples()}
    assert (by["s0"].n_docs, by["s0"].n_selected, by["s0"].sel_tokens) == (
        2, 1, 2)
    assert (by["s1"].n_docs, by["s1"].n_selected, by["s1"].sel_tokens) == (
        1, 1, 2)


def test_q131_alpha_half_mix_hand_computed(spark, tmp_path):
    """Token masses 9/4/1 across three languages give isqrt weights
    3/2/1 (tw=6): mix shares are the exact ppm floors 500000/333333/
    166666 and the 1M-token budget allocates the same floors."""
    sf = _write_docs(
        tmp_path,
        [(0, "a b c d e", "de", "s"), (1, "f g h i", "de", "s"),
         (2, "j k l m", "en", "s"), (3, "n", "fr", "s")],
    )
    name = "q131_temperature_mix"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {r.lang: r for r in sdf.itertuples()}
    assert (by["de"].n_tokens, by["de"].wgt, by["de"].mix_ppm,
            by["de"].alloc_tokens) == (9, 3, 500000, 500000)
    assert (by["en"].wgt, by["en"].mix_ppm) == (2, 333333)
    assert (by["fr"].wgt, by["fr"].mix_ppm) == (1, 166666)


def test_q132_deciles_share_buckets_on_ties(spark, tmp_path):
    """10 docs at three distinct LM costs: 'the' = (3+3)*1000/2 = 3000,
    'key' = (5+6)*1000/2 = 5500, 'zz' = 12000 (default cost). Bucket =
    10 * strictly-cheaper-count div 10: the four 3000-docs all land in
    bucket 0, the four 5500-docs in bucket 4, the two 12000-docs in
    bucket 8 — ties NEVER split across buckets."""
    rows = [(i, "the", "en", "s") for i in range(4)]
    rows += [(i + 4, "key", "en", "s") for i in range(4)]
    rows += [(8, "zz", "de", "s"), (9, "zz", "de", "s")]
    sf = _write_docs(tmp_path, rows)
    name = "q132_curriculum_deciles"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {int(r.bucket): r for r in sdf.itertuples()}
    assert sorted(by) == [0, 4, 8]
    assert (by[0].n_docs, by[0].min_cost_e3, by[0].max_cost_e3) == (
        4, 3000, 3000)
    assert (by[4].n_docs, by[4].min_cost_e3) == (4, 5500)
    assert (by[8].n_docs, by[8].min_cost_e3) == (2, 12000)


def _cdc_chunks(text, w=3, bits=4):
    """Plain-Python replica of q133's boundary rule + chunk hashes."""
    toks = text.strip().split()
    n = len(toks)
    cuts = [0]
    for i in range(w, n):  # 1-based cut positions w..n-1
        win = " ".join(toks[i - w:i])
        if int(hashlib.md5(win.encode()).hexdigest()[:12], 16) % (1 << bits) == 0:
            cuts.append(i)
    cuts.append(n)
    out = []
    for a, b in zip(cuts, cuts[1:]):
        seg = " ".join(toks[a:b])
        out.append(
            (int(hashlib.md5(seg.encode()).hexdigest()[:12], 16), b - a)
        )
    return out


def test_q133_exact_dup_doc_duplicates_every_chunk(spark, tmp_path):
    """Two identical docs share ALL chunks; a disjoint-vocabulary doc
    shares none. Expected counts come from a plain-Python replica of
    the boundary rule."""
    t = " ".join(f"w{i % 37}x{(i * 7) % 11}" for i in range(120))
    u = " ".join(f"q{i % 29}y{(i * 5) % 13}" for i in range(80))
    ct, cu = _cdc_chunks(t), _cdc_chunks(u)
    assert len(ct) >= 3  # the fixture must actually contain boundaries
    assert len(set(h for h, _ in ct)) == len(ct)  # chunks distinct
    assert not set(h for h, _ in ct) & set(h for h, _ in cu)
    sf = _write_docs(
        tmp_path, [(0, t, "de", "s"), (1, t, "de", "s"), (2, u, "de", "s")]
    )
    name = "q133_cdc_chunk_dedup"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    r = sdf.iloc[0]
    assert r.n_chunks == 2 * len(ct) + len(cu)
    assert r.n_distinct == len(ct) + len(cu)
    assert r.dup_chunks == len(ct)
    assert r.dup_tokens == 120


def test_q133_insertion_shifts_at_most_local_chunks(spark, tmp_path):
    """The CDC property: prepending one token to a document re-keys
    only the chunks before the first post-edit boundary — later chunks
    are byte-identical and dedup against the original (fixed-width
    passages would re-key everything)."""
    t = " ".join(f"w{i % 37}x{(i * 7) % 11}" for i in range(120))
    t2 = "zzz " + t
    shared = set(h for h, _ in _cdc_chunks(t)) & set(
        h for h, _ in _cdc_chunks(t2)
    )
    assert shared  # the property under test, pinned by the replica
    sf = _write_docs(tmp_path, [(0, t, "de", "s"), (1, t2, "de", "s")])
    name = "q133_cdc_chunk_dedup"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    assert sdf.iloc[0].dup_chunks == len(shared)


def test_q134_moments_hand_computed(spark, tmp_path):
    """3 vectors of dim 2: dim0 = (1, 2, 3) and dim1 = (-1, -1, 4);
    expected mean/variance (including the negative-mean floor) come
    from the exact float replica below — same expression tree as the
    query, so equality is exact, not approximate."""
    rows = [
        (0, [1.0, -1.0], 0),
        (1, [2.0, -1.0], 0),
        (2, [3.0, 4.0], 0),
    ]
    sf = _write_embeddings(tmp_path, rows)
    name = "q134_embedding_dim_stats"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    import math

    by = {int(r.dim): r for r in sdf.itertuples()}
    for dim, vals in ((0, [1.0, 2.0, 3.0]), (1, [-1.0, -1.0, 4.0])):
        n = len(vals)
        sx, sx2 = sum(vals), sum(v * v for v in vals)
        mean = math.floor(sx / n * 1e6) / 1e6
        var = math.floor((sx2 - sx * sx / n) / n * 1e6) / 1e6
        assert by[dim].n == n
        assert by[dim].mean_e6 == pytest.approx(mean, abs=0)
        assert by[dim].var_e6 == pytest.approx(var, abs=0)


def _semdedup_fixture(tmp_path):
    """16 centroids (0..15) spread so only cells 0 ([1,0]) and 1
    ([0,1]) attract the corpus; corpus vectors planted to hit every
    verdict branch: an identical same-cell pair (drop), and a
    high-cosine pair SPLIT across the cell boundary (both keep — the
    method's documented blind spot vs q34's random-projection LSH)."""
    rows = [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0)]
    rows += [(i, [100.0 + 10.0 * i, -100.0 - 10.0 * i], 0) for i in range(2, 16)]
    rows += [
        (16, [2.0, 0.1], 1),  # cell 0
        (17, [2.0, 0.1], 1),  # identical twin of 16, same cell -> drop
        (18, [0.1, 2.0], 1),  # cell 1
        (19, [0.1, 2.0], 1),  # identical twin of 18, same cell -> drop
        (20, [121.0, -121.0], 1),  # cell 2 } collinear (cos = 1) but
        (21, [129.0, -129.0], 1),  # cell 3 } split across two cells
    ]
    return _write_embeddings(tmp_path, rows)


def test_q135_semdedup_same_cell_twin_dropped(spark, tmp_path):
    sf = _semdedup_fixture(tmp_path)
    name = "q135_semdedup"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {int(r.vec_id): r for r in sdf.itertuples()}
    assert by[16].verdict == "keep" and by[16].n_close == 0
    assert by[17].verdict == "drop" and by[17].n_close == 1
    assert by[17].best_cos == pytest.approx(1.0, abs=1e-6)
    assert by[18].verdict == "keep"
    assert by[19].verdict == "drop"
    assert by[17].cell == by[16].cell and by[19].cell == by[18].cell


def test_q135_cell_boundary_pair_not_compared(spark, tmp_path):
    """20/21 have cosine well above SEMDEDUP_TAU but land in different
    cells, so SemDeDup keeps both — the cell-bounded pair space never
    sees the pair (the cost bound IS the blind spot)."""
    sf = _semdedup_fixture(tmp_path)
    sdf = QUERIES["q135_semdedup"](spark, sf).toPandas()
    by = {int(r.vec_id): r for r in sdf.itertuples()}
    assert by[20].cell != by[21].cell
    assert by[20].verdict == "keep" and by[21].verdict == "keep"


def test_q136_standardize_hand_computed(spark, tmp_path):
    """dim0 = (1, 2, 3): mean 2, pop var 2/3 -> z = +-1/sqrt(2/3), 0;
    dim1 constant -> dead dimension, every z forced to 0 on both
    engines. Expected values from the exact float replica (same
    expression tree as the query)."""
    import math

    rows = [
        (0, [1.0, 5.0], 0),
        (1, [2.0, 5.0], 0),
        (2, [3.0, 5.0], 0),
    ]
    sf = _write_embeddings(tmp_path, rows)
    name = "q136_embedding_standardize"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {int(r.dim): r for r in sdf.itertuples()}
    std0 = math.sqrt((14.0 - 36.0 / 3.0) / 3.0)
    zmax = math.floor((3.0 - 2.0) / std0 * 1e6) / 1e6
    zmin = math.floor((1.0 - 2.0) / std0 * 1e6) / 1e6
    assert by[0].zmax_e6 == pytest.approx(zmax, abs=0)
    assert by[0].zmin_e6 == pytest.approx(zmin, abs=0)
    assert by[0].mean_z_e6 in (0.0, -1e-6)  # floor of an exact-0 sum
    assert by[0].var_z_e6 == pytest.approx(1.0, abs=2e-6)
    # dead dimension: all z exactly 0
    assert by[1].zmin_e6 == 0.0 and by[1].zmax_e6 == 0.0
    assert by[1].mean_z_e6 == 0.0 and by[1].var_z_e6 == 0.0


def test_q137_rrf_fusion_semantics(spark, tmp_path):
    """Planted candidates: docs 0-3 contain BM25 terms (0 strongest),
    doc 4 matches nothing and must never appear. rrf_score must equal
    the exact integer fusion of the two ranks the query reports."""
    rows = [
        (0, "vector join customer vector join", "en", "s0"),
        (1, "vector join filler words here", "en", "s0"),
        (2, "customer filler words here too", "en", "s1"),
        (3, "vector filler filler filler filler", "en", "s1"),
        (4, "nothing relevant in this text", "en", "s2"),
    ]
    sf = _write_docs(tmp_path, rows)
    name = "q137_rrf_hybrid"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    assert 4 not in set(sdf.doc_id)
    assert set(sdf.doc_id) == {0, 1, 2, 3}
    for r in sdf.itertuples():
        assert r.rrf_score == 10**9 // (60 + r.bm25_rank) + 10**9 // (
            60 + r.quality_rank
        )
    # ranks are permutations of 1..4 on both axes
    assert sorted(sdf.bm25_rank) == [1, 2, 3, 4]
    assert sorted(sdf.quality_rank) == [1, 2, 3, 4]


def test_q138_c4_rules_hand_checked(spark, tmp_path):
    """Every rule branch on planted docs: doc 12 gets all three junk
    lines (js wall via %3, cookie+nav via %4) and must shed exactly
    them; doc 7's single 4-word line dies on the min-words rule so the
    whole doc drops; doc 1 is pure content and keeps everything."""
    w24 = " ".join(f"w{i}" for i in range(24))  # 3 full 8-word lines
    rows = [
        (1, w24, "en", "s0"),
        (7, "just four words here", "en", "s0"),
        (12, w24, "en", "s1"),
    ]
    sf = _write_docs(tmp_path, rows)
    name = "q138_c4_line_filter"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {int(r.doc_id): r for r in sdf.itertuples()}
    assert by[1].n_lines_wire == 3 and by[1].n_lines_kept == 3
    assert by[1].verdict == "keep"
    # doc 12: 3 content + 3 junk in the wire; all junk removed
    assert by[12].n_lines_wire == 6 and by[12].n_lines_kept == 3
    assert by[12].verdict == "keep"
    assert by[12].clean_hash == by[1].clean_hash  # identical cleaned text
    # doc 7: its only line has 4 words -> rule 2 kills it -> doc drops
    assert by[7].n_lines_wire == 1 and by[7].n_lines_kept == 0
    assert by[7].verdict == "drop" and by[7].n_chars_clean == 0


def test_q139_bpe_greedy_merge_cascade(spark, tmp_path):
    """'aaaa' x2 + 'bb' x1: iteration 1 learns (a,a) with count 6 and
    the greedy left-to-right fold respells 'a a a a' as [aa, aa] (the
    odd-run rule: no overlap); iteration 2 learns (aa, aa) — a merge of
    MERGED symbols; iteration 3 is left with (b, b). Every number
    below is hand-derived."""
    rows = [(0, "aaaa aaaa bb", "en", "s0")]
    sf = _write_docs(tmp_path, rows)
    name = "q139_bpe_train"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    got = sorted(
        (int(r.iteration), r.merge_l, r.merge_r, int(r.pair_count),
         int(r.syms_e3))
        for r in sdf.itertuples()
    )
    assert got == [
        (1, "a", "a", 6, 2000),
        (2, "aa", "aa", 2, 1333),
        (3, "b", "b", 1, 1000),
    ]


def test_q140_kanon_suppression(spark, tmp_path):
    """s0: 6 en docs (published) + 2 de docs (suppressed into
    __redacted__); s1: 1 fr doc (suppressed). Totals must reconcile."""
    rows = []
    i = 0
    for lang, src, n in (("en", "s0", 6), ("de", "s0", 2), ("fr", "s1", 1)):
        for _ in range(n):
            rows.append((i, f"text {i}", lang, src))
            i += 1
    sf = _write_docs(tmp_path, rows)
    name = "q140_kanon_report"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {(r.source, r.lang): r for r in sdf.itertuples()}
    assert by[("s0", "en")].n_docs == 6 and by[("s0", "en")].n_cells == 1
    assert by[("s0", "__redacted__")].n_docs == 2
    assert by[("s1", "__redacted__")].n_docs == 1
    assert ("s0", "de") not in by and ("s1", "fr") not in by
    assert int(sdf.n_docs.sum()) == 9  # mass conserved


def _vat_check(d8: str) -> int:
    p = 10
    for ch in d8:
        s = (int(ch) + p) % 10
        if s == 0:
            s = 10
        p = (2 * s) % 11
    c = 11 - p
    return 0 if c == 10 else c


def test_q141_vat_checksum_replica(spark, tmp_path):
    """The fold must equal the published MOD 11,10 algorithm (replica
    verified against the canonical DE136695976 example) on every
    planted ID, and flag exactly the doc_id % 3 == 0 corruptions."""
    assert _vat_check("13669597") == 6  # DE136695976
    rows = [(i, f"text {i}", "de", "s0") for i in (0, 1, 2, 3, 5, 6, 97)]
    sf = _write_docs(tmp_path, rows)
    name = "q141_vat_checksum"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    for r in sdf.itertuples():
        d8 = r.vat_id[2:10]
        assert int(r.expected_check) == _vat_check(d8)
        assert bool(r.is_valid) == (int(r.doc_id) % 3 != 0)
        assert int(r.check_digit) == int(r.vat_id[10])


def test_q142_shared_run_lengths_hand_derived(spark, tmp_path):
    """doc 0 (w0..w29) gets an automatic planted re-crawl (id 200000)
    copying its first 20 tokens: 13 consecutive shared 8-gram windows
    -> longest run exactly 20. doc 2 embeds w5..w20 (16 tokens) mid-
    document: 9 windows on one diagonal -> run exactly RUN_MIN_TOKENS,
    included. doc 2 vs the re-crawl shares only w5..w19 (15 tokens,
    run < min) and must be filtered. doc 1 shares nothing."""
    w = [f"w{i}" for i in range(30)]
    x = [f"x{i}" for i in range(30)]
    doc2 = [f"y{i}" for i in range(10)] + w[5:21] + [f"z{i}" for i in range(6)]
    rows = [
        (0, " ".join(w), "en", "s0"),
        (1, " ".join(x), "en", "s0"),
        (2, " ".join(doc2), "en", "s1"),
    ]
    sf = _write_docs(tmp_path, rows)
    name = "q142_shared_span_detect"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    got = {
        (int(r.doc_a), int(r.doc_b)): (
            int(r.longest_run_tokens),
            int(r.n_gram_matches),
        )
        for r in sdf.itertuples()
    }
    assert got[(0, 200000)] == (20, 13)
    assert got[(0, 2)] == (16, 9)
    assert (2, 200000) not in got  # 15-token overlap is below the floor
    assert not any(1 in p for p in got)


def test_q143_truncation_recall_identical_prefix(spark, tmp_path):
    """Vectors whose information lives ENTIRELY in the first
    TRUNC_DIMS dims rank identically under truncation -> recall is
    exactly 1000000 for every query. 16 centroid ids are padded out of
    the corpus domain; queries are 16..20."""
    import math

    dim = 64
    rows = []
    for i in range(16):
        rows.append((i, [1000.0 + i] * dim, 0))
    # corpus: distinct directions in the FIRST 2 dims, zeros after
    for k in range(16, 28):
        v = [0.0] * dim
        ang = (k - 16) / 12.0
        v[0] = math.cos(ang)
        v[1] = math.sin(ang)
        rows.append((k, v, 1))
    sf = _write_embeddings(tmp_path, rows)
    name = "q143_truncation_recall"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    assert set(sdf.query_id) == {16, 17, 18, 19, 20}
    assert (sdf.recall_ppm == 1000000).all()
    assert (sdf.n_matched == 5).all()


def test_q144_markov_eval_deterministic_stream(spark, tmp_path):
    """Train user 0 emits a,b,a,b,... so the model maps a->b and b->a;
    eval user 1 follows the same pattern except ONE deviation, eval
    user 3 inverts it entirely. Accuracy per state is hand-countable."""
    rows = []
    eid = 0

    def emit(uid, seq):
        nonlocal eid
        for t, et in enumerate(seq):
            rows.append((eid, t + 1, uid, et, 1.0, "{}"))
            eid += 1

    emit(0, ["a", "b", "a", "b", "a", "b"])  # train: a->b x3, b->a x2
    emit(1, ["a", "b", "a", "c"])  # eval: a->b ok, b->a ok, a->c wrong
    emit(3, ["b", "b", "b"])  # eval: b->b wrong x2
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    )
    for c in ("event_id", "ts", "user_id"):
        pdf[c] = pdf[c].astype("int64")
    pdf.to_parquet(f"{tmp_path}/events.parquet", index=False)
    sf = str(tmp_path)
    name = "q144_markov_eval"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {r.from_type: r for r in sdf.itertuples()}
    # eval transitions from 'a': a->b (correct), a->c (wrong)
    assert by["a"].n_eval == 2 and by["a"].n_correct == 1
    assert by["a"].acc_ppm == 500000
    # eval transitions from 'b': b->a (correct), b->b x2 (wrong)
    assert by["b"].n_eval == 3 and by["b"].n_correct == 1
    assert by["b"].acc_ppm == 333333


def test_q145_blocklist_semantics(spark, tmp_path):
    """Hosts derive from source: planted sources src3/src18 must come
    back blocked (proving www-strip + lowercase hit the list), others
    kept; counts per host are exact."""
    rows = [
        (0, "t", "en", "src3"),
        (1, "t", "en", "src3"),
        (2, "t", "en", "src18"),
        (3, "t", "en", "src1"),
    ]
    sf = _write_docs(tmp_path, rows)
    name = "q145_blocklist_filter"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {r.host: r for r in sdf.itertuples()}
    assert by["src3.de"].verdict == "blocked" and by["src3.de"].n_docs == 2
    assert by["src18.de"].verdict == "blocked"
    assert by["src1.de"].verdict == "kept"


def test_q146_hub_vector_dominates(spark, tmp_path):
    """One cell: a central hub vector plus 4 satellites arranged so
    each satellite's nearest neighbor is the hub (satellites are
    near-orthogonal to each other, all correlated with the hub) ->
    the hub's in-degree is 4, each satellite's is 0 except the one
    the hub itself picks (in-degree 1)."""
    dim = 8
    rows = [(0, [1.0] * dim, 0)]  # centroid 0 at the corpus's center
    for i in range(1, 16):  # far-away unused centroids
        rows.append((i, [1000.0 + i] + [0.0] * (dim - 1), 0))
    hub = [1.0] * dim
    rows.append((16, hub, 1))
    for k in range(4):  # satellite: hub + strong spike on dim k
        v = [1.0] * dim
        v[k] = 6.0
        rows.append((17 + k, v, 1))
    sf = _write_embeddings(tmp_path, rows)
    name = "q146_knn_hubness"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    hist = {int(r.in_degree): int(r.n_vectors) for r in sdf.itertuples()}
    assert hist[4] == 1  # the hub
    assert hist[1] == 1  # the satellite the hub picked
    assert hist[0] == 3  # the remaining satellites
    assert sum(hist.values()) == 5


def test_q147_centroid_matrix_hand_computed(spark, tmp_path):
    """Two labels with known centroids: label 1 = {(2,0),(0,2)} ->
    centroid (1,1); label 2 = {(3,3)} -> centroid (3,3); cosine
    exactly 1. Label 3 = {(5,0)} is orthogonal to nothing: cos with
    (1,1) = 1/sqrt(2), with (3,3) = 1/sqrt(2) — floored e6."""
    import math

    dim = 2
    rows = [(i, [100.0 + i, -50.0 - i], 0) for i in range(16)]
    rows += [
        (16, [2.0, 0.0], 1),
        (17, [0.0, 2.0], 1),
        (18, [3.0, 3.0], 2),
        (19, [5.0, 0.0], 3),
    ]
    sf = _write_embeddings(tmp_path, rows)
    name = "q147_label_centroid_matrix"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by = {(int(r.label_a), int(r.label_b)): r.cos_e6 for r in sdf.itertuples()}
    inv_sqrt2 = math.floor(1.0 / math.sqrt(2.0) * 1e6) / 1e6
    assert by[(1, 2)] == pytest.approx(
        math.floor((3.0 + 3.0) / (math.sqrt(2) * math.sqrt(18)) * 1e6) / 1e6,
        abs=0,
    )
    assert by[(1, 2)] in (1.0, 0.999999)  # cos((1,1),(3,3)) == 1, floor-safe
    assert by[(1, 3)] == pytest.approx(inv_sqrt2, abs=0)
    assert by[(2, 3)] == pytest.approx(inv_sqrt2, abs=0)


def test_q148_exact_dup_caught_by_both_detectors(spark, tmp_path):
    """An exact duplicate pair has identical shingle sets (every
    MinHash band collides) AND identical simhash (hamming 0), so it
    must be in the intersection; the Jaccard is bounded by the set
    algebra."""
    base = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"alt{i}" for i in range(40))
    rows = [
        (0, base, "en", "s0"),
        (1, base, "en", "s0"),  # exact dup of 0
        (2, other, "en", "s1"),
    ]
    sf = _write_docs(tmp_path, rows)
    name = "q148_detector_agreement"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    r = sdf.iloc[0]
    assert r.n_both >= 1
    assert r.n_both <= min(r.n_minhash, r.n_simhash)
    union = r.n_minhash + r.n_simhash - r.n_both
    assert r.jaccard_ppm == r.n_both * 1000000 // union


def test_q149_kappa_hand_computed(spark, tmp_path):
    """Confusion counts and kappa re-derived in plain Python from the
    query's own per-doc verdict rules (q56 classifier / q92 LM) on a
    small corpus; also pins the degenerate-marginal convention by
    checking the cross-multiplied formula directly."""
    rows = [(i, f"some tokens here doc {i} variant {i % 7}", "en", "s0")
            for i in range(12)]
    sf = _write_docs(tmp_path, rows)
    name = "q149_filter_kappa"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    r = sdf.iloc[0]
    kk, kd, dk, dd = (int(r.n_keep_keep), int(r.n_keep_drop),
                      int(r.n_drop_keep), int(r.n_drop_drop))
    n = kk + kd + dk + dd
    assert n == 12
    assert int(r.agree_ppm) == (kk + dd) * 10**6 // n
    pe_num = (kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)
    den = n * n - pe_num
    expect = 10**6 if den == 0 else (n * (kk + dd) - pe_num) * 10**6 // den
    assert int(r.kappa_ppm) == expect


def test_q168_frontier_hand_constructed(spark, tmp_path):
    """Skyline semantics on planted points: same-x domination, distinct
    frontier corners, a dominated interior point, a second language
    whose lone doc is trivially on its own frontier, and a duplicated
    frontier point carrying n_docs=2. n_chars is set EXPLICITLY
    (decoupled from len(text)) so both axes are controlled."""
    rows = [
        (0, _words("a", 10), "en", "s0", 100),   # dominated by doc 1 (same x, more tokens)
        (1, _words("b", 12), "en", "s0", 100),   # frontier (100, 12)
        (2, _words("c", 5), "en", "s0", 200),    # frontier (200, 5)
        (3, _words("d", 20), "en", "s0", 50),    # frontier (50, 20)
        (4, _words("e", 6), "en", "s0", 60),     # dominated by doc 1
        (5, _words("f", 12), "en", "s0", 100),   # duplicate of doc 1's point
        (6, _words("g", 3), "de", "s1", 30),     # lone de doc: frontier
    ]
    sf = _write_docs(tmp_path, rows)
    name = "q168_pareto_frontier"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    got = {
        (r.lang, int(r.n_chars), int(r.n_tokens)): int(r.n_docs)
        for r in sdf.itertuples()
    }
    assert got == {
        ("en", 200, 5): 1,
        ("en", 100, 12): 2,
        ("en", 50, 20): 1,
        ("de", 30, 3): 1,
    }


def test_q169_triangle_hand_constructed(spark, tmp_path):
    """One planted triangle src1-src2-src3 plus a pendant src4 and a
    self-loop-only src5 (must vanish entirely); a duplicate doc for one
    edge proves edge-set semantics (distinct, not weighted). Edge rule:
    source -> 'src'||(doc_id*3+1)%20, so doc_id ≡ 7 (mod 20) emits dst
    src2, ≡ 14 emits src3, ≡ 1 emits src4, ≡ 8 emits src5."""
    rows = [
        (7, "x", "en", "src1"),    # src1 - src2
        (27, "x", "en", "src1"),   # duplicate src1 - src2 edge
        (34, "x", "en", "src1"),   # src1 - src3
        (14, "x", "en", "src2"),   # src2 - src3  -> closes the triangle
        (1, "x", "en", "src1"),    # src1 - src4 (pendant)
        (8, "x", "en", "src5"),    # src5 self-loop: excluded
    ]
    sf = _write_docs(tmp_path, rows)
    name = "q169_host_triangles"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    got = {r.node: (int(r.deg), int(r.n_tri)) for r in sdf.itertuples()}
    assert got == {
        "src1": (3, 1),
        "src2": (2, 1),
        "src3": (2, 1),
        "src4": (1, 0),
    }


def test_q171_ks_hand_computed(spark, tmp_path):
    """Exact KS on a 5-doc planted corpus, re-derived by hand:
    s0 lengths [1,1,2], s1 lengths [2,3]; global cum (2,4,5) over grid
    (1,2,3). s0: sup|cum_s*n_g - cum_g*n_s| = |2*5-2*3| = 4 at x=1 ->
    floor(4e6/15) = 266666 ppm; s1: |0*5-2*2| = 4 at x=1 (a value s1
    never takes — the grid cross join is what makes that step exist)
    -> floor(4e6/10) = 400000 ppm."""
    rows = [
        (0, "a", "de", "s0", 1),
        (1, "b", "de", "s0", 1),
        (2, "c", "de", "s0", 2),
        (3, "d", "de", "s1", 2),
        (4, "e", "de", "s1", 3),
    ]
    sf = _write_docs(tmp_path, rows)
    name = "q171_ks_drift"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    got = {
        r.source: (int(r.n_docs), int(r.ks_ppm), int(r.ks_at))
        for r in sdf.itertuples()
    }
    assert got == {"s0": (3, 266666, 1), "s1": (2, 400000, 1)}


def test_q172_pps_semantics(spark, tmp_path):
    """PPS systematic invariants on a planted stratum: (a) a doc
    heavier than the step is ALWAYS selected (certainty unit), (b)
    zero-weight docs never are, (c) ticket count per source is at most
    PPS_K + 1 and at least 1 for a non-empty stratum, (d) oracle
    parity."""
    from german_ocr_spark.queries import PPS_K

    rows = [(0, "h", "de", "s0", 900)]  # certainty unit: 900 of 1000
    rows += [(i, "t", "de", "s0", 10) for i in range(1, 11)]  # 100 mass
    rows += [(20, "z", "de", "s0", 0)]  # zero weight
    rows += [(30, "x", "de", "s1", 5)]  # tiny stratum: step clamps to 1
    sf = _write_docs(tmp_path, rows)
    name = "q172_pps_sample"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    sel = {(r.source, r.doc_id) for r in sdf.itertuples()}
    assert ("s0", 0) in sel          # heavy doc certain
    assert ("s0", 20) not in sel     # zero weight impossible
    assert ("s1", 30) in sel         # tiny stratum still sampled
    per_src = sdf.groupby("source").size().to_dict()
    assert 1 <= per_src["s0"] <= PPS_K + 1


def test_q173_koelner_published_examples():
    """The rule table against the published Kölner Phonetik examples
    (Postel 1969 / common references), via the plain-Python replica
    that mirrors the generated SQL CASE."""
    from german_ocr_spark.functions.german import koelner_phonetik_py as k

    assert k("müller") == "657"
    assert k("breschnew") == "17863"
    assert k("wikipedia") == "3412"
    assert k("müllerlüdenscheidt") == "65752682"
    assert k("meyer") == k("maier") == "67"
    assert k("schmidt") == k("schmitt") == "862"
    assert k("heinz") == "068"  # leading 0 survives


def test_q173_blocking_clusters_planted(spark, tmp_path):
    """Planted OCR-variant pairs cluster under one code; an unrelated
    token does not; SQL (both engines) agrees with the Python replica
    for every emitted code."""
    from german_ocr_spark.functions.german import koelner_phonetik_py as k

    rows = [
        (0, "meyer maier besuch", "de", "s0"),
        (1, "schmidt schmitt besuch", "de", "s0"),
    ]
    sf = _write_docs(tmp_path, rows)
    name = "q173_koelner_blocking"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    by_code = {r.code: r for r in sdf.itertuples()}
    assert by_code[k("meyer")].n_forms == 2
    assert (by_code[k("meyer")].min_form, by_code[k("meyer")].max_form) == (
        "maier",
        "meyer",
    )
    assert by_code[k("schmidt")].n_forms == 2
    assert by_code[k("besuch")].n_forms == 1
    assert by_code[k("besuch")].n_occ == 2


def test_q174_chisq_hand_computed(spark, tmp_path):
    """2x2 planted contingency (30/10 vs 10/30, uniform marginals):
    every expectation is exactly 20 (e3 = 20000) and every cell
    contributes exactly (O-E)^2/E = 5 -> 5,000,000 ppm; implied
    chi-square = 20. Verified against the closed form by hand."""
    rows = []
    i = 0
    for src, de_n, en_n in (("s0", 30, 10), ("s1", 10, 30)):
        for _ in range(de_n):
            rows.append((i, "t", "de", src)); i += 1
        for _ in range(en_n):
            rows.append((i, "t", "en", src)); i += 1
    sf = _write_docs(tmp_path, rows)
    name = "q174_chisq_cells"
    sdf = QUERIES[name](spark, sf).toPandas()
    assert compare(sdf, _oracle(sf, name)) is None
    assert len(sdf) == 4
    assert set(sdf.expected_e3) == {20000}
    assert set(sdf.contrib_ppm) == {5000000}
    assert sdf.contrib_ppm.sum() == 20 * 10**6


def test_q175_decay_activity_hand_computed(spark, tmp_path):
    """User 1: 10 active hours with counts 1..10 (count = hour index +
    1); only the 8 most recent rank, so score_x256 =
    10*128 + 9*64 + 8*32 + 7*16 + 6*8 + 5*4 + 4*2 + 3*1 = 2303
    (decay 8.99609375). User 2: 3 hours x 2 events =>
    2*(128+64+32) = 448 (decay 1.75). Both by hand."""
    rows, eid = [], 0
    for h in range(10):
        for _ in range(h + 1):
            rows.append((eid, f"2024-01-01 {h:02d}:15:00", 1, "click", 1.0))
            eid += 1
    for h in range(3):
        for _ in range(2):
            rows.append((eid, f"2024-01-02 {h:02d}:45:00", 2, "view", 1.0))
            eid += 1
    d = _write_events(tmp_path, rows)
    name = "q175_decay_activity"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {r.user_id: r for r in sdf.itertuples()}
    assert got[1].n_hours == 8 and got[1].score_x256 == 2303
    assert got[1].decay_score == 2303 / 256
    assert got[1].last_hour == "2024-01-01 09:00:00"
    assert got[2].n_hours == 3 and got[2].score_x256 == 448
    assert got[2].decay_score == 1.75


def test_q176_kcenter_hand_computed(spark, tmp_path):
    """8 points in 2-D, greedy FPS by hand. Seed = v0 (0,0). Round 2
    picks the farthest point v4 (10,1), d2=101; then v2 (0,6), d2=36;
    v7 (0,-5), d2=25; v5 (3,3), d2=18; v6 (-4,0), d2=16. The
    at-selection distances are non-increasing — the k-center
    invariant — and every value is an exact integer so floor6 is
    lossless."""
    pts = {
        0: (0.0, 0.0),
        1: (10.0, 0.0),
        2: (0.0, 6.0),
        3: (1.0, 0.0),
        4: (10.0, 1.0),
        5: (3.0, 3.0),
        6: (-4.0, 0.0),
        7: (0.0, -5.0),
    }
    d = _write_embeddings(
        tmp_path, [(i, list(v), 0) for i, v in pts.items()]
    )
    name = "q176_kcenter_coreset"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = sdf.sort_values("pick_order")
    assert list(got.vec_id) == [0, 4, 2, 7, 5, 6]
    assert list(got.min_d2_f6) == [0.0, 101.0, 36.0, 25.0, 18.0, 16.0]
    # non-increasing from the first non-seed pick on
    ds = list(got.min_d2_f6)[1:]
    assert all(a >= b for a, b in zip(ds, ds[1:]))


def _qe4_replica(text):
    """Python-float replica of textstats.quality_score_e4 for
    all-stopword, punctuation-free fixtures (sw_ratio capped at 0.4,
    punct_ratio 0) — identical IEEE ops in identical order."""
    import math

    len_part = min(float(len(text)), 2000.0) / 2000.0 * 0.4
    sw_part = 0.4 / 0.4 * 0.4
    punct_part = (1.0 - 0.0 / 0.25) * 0.2
    return math.floor((len_part + sw_part + punct_part) * 10000.0)


def test_q177_calibration_hand_computed(spark, tmp_path):
    """Two bins. Bin of text A ('der' x157, langid de): one doc
    labelled de (y=1) and one labelled en (y=0) -> obs exactly
    500000 ppm, Brier = ((qA-1e4)^2 + qA^2)//2. Bin of text B
    ('the and is', langid en, lang en): perfect outcome, obs 1e6."""
    text_a = "der " * 156 + "das"
    text_b = "the and is"
    d = _write_docs(
        tmp_path,
        [
            (0, text_a, "de", "web"),
            (1, text_a, "en", "web"),
            (2, text_b, "en", "web"),
        ],
    )
    name = "q177_quality_calibration"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    qa, qb = _qe4_replica(text_a), _qe4_replica(text_b)
    assert qa // 1000 != qb // 1000  # genuinely two bins
    rows = {int(r.bin): r for r in sdf.itertuples()}
    ba = rows[min(qa // 1000, 9)]
    assert ba.n_docs == 2
    assert ba.mean_pred_ppm == qa * 100
    assert ba.obs_ppm == 500000
    assert ba.gap_ppm == qa * 100 - 500000
    assert ba.brier_e8 == ((qa - 10000) ** 2 + qa**2) // 2
    bb = rows[min(qb // 1000, 9)]
    assert bb.n_docs == 1
    assert bb.obs_ppm == 1000000
    assert bb.brier_e8 == (qb - 10000) ** 2


def test_q178_waterfill_hand_computed(spark, tmp_path):
    """Host counts (1, 100, 100), budget = 201//2 = 100. Staircase:
    S(1) = 1*3 = 3 <= 100; S(100) = 201 > 100, so i*=1, k=2,
    c = 1 + (100-3)//2 = 49, leftover = 97 - 2*48 = 1. aaa.de keeps
    its 1 doc; bbb.de and ccc.de are capped at 49 and the single
    leftover goes to the lexicographically first of the two equal
    largest hosts -> bbb.de gets 50. Sum(alloc) == budget."""
    rows, i = [], 0
    for src, k in (("aaa", 1), ("bbb", 100), ("ccc", 100)):
        for _ in range(k):
            rows.append((i, f"text {i} der", "de", src))
            i += 1
    d = _write_docs(tmp_path, rows)
    name = "q178_host_waterfill"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {r.host: r for r in sdf.itertuples()}
    assert got["aaa.de"].alloc == 1 and not got["aaa.de"].capped
    assert got["bbb.de"].alloc == 50 and got["bbb.de"].capped
    assert got["ccc.de"].alloc == 49 and got["ccc.de"].capped
    assert all(r.cap == 49 for r in sdf.itertuples())
    assert int(sdf.alloc.sum()) == 100  # = min(B, total)


def test_q178_waterfill_uncapped_when_budget_covers(spark, tmp_path):
    """Counts (1, 5): budget 3. S(1)=2<=3, S(5)=6>3 -> c=2; the big
    host is capped at 2, no leftover. Degenerate staircase arms
    (istar=0 / istar=m) are covered by the formula the same test
    family pins in the docstring."""
    rows, i = [], 0
    for src, k in (("aaa", 1), ("bbb", 5)):
        for _ in range(k):
            rows.append((i, f"text {i} der", "de", src))
            i += 1
    d = _write_docs(tmp_path, rows)
    name = "q178_host_waterfill"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {r.host: r for r in sdf.itertuples()}
    assert got["aaa.de"].alloc == 1 and got["bbb.de"].alloc == 2
    assert int(sdf.alloc.sum()) == 3


def test_q179_novelty_hand_computed(spark, tmp_path):
    """Batch 0 (doc 0): 2 grams, both first occurrences -> 1e6 ppm.
    Batch 1: doc 100 repeats one of doc 0's 5-grams (1 novel of 2),
    doc 101 is a verbatim copy of doc 0 (0 novel of 2), doc 102 is
    too short for any gram -> 4 grams, 1 novel, 250000 ppm, 3 docs."""
    d = _write_docs(
        tmp_path,
        [
            (0, "a b c d e f", "de", "web"),
            (100, "a b c d e x", "de", "web"),
            (101, "a b c d e f", "de", "web"),
            (102, "short doc", "de", "web"),
        ],
    )
    name = "q179_novelty_curve"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {int(r.batch): r for r in sdf.itertuples()}
    b0, b1 = got[0], got[1]
    assert (b0.n_docs, b0.n_grams, b0.n_novel, b0.novelty_ppm) == (1, 2, 2, 1000000)
    assert (b1.n_docs, b1.n_grams, b1.n_novel, b1.novelty_ppm) == (3, 4, 1, 250000)


def test_q180_truncation_hand_computed(spark, tmp_path):
    """Source 'web': docs of 600 and 100 tokens. At ctx=512 only the
    600-token doc truncates: lost 88 of 700 -> floor(88e6/700) =
    125714 ppm; at every larger ctx nothing is lost."""
    d = _write_docs(
        tmp_path,
        [
            (0, " ".join(f"t{i}" for i in range(600)), "de", "web"),
            (1, " ".join(f"t{i}" for i in range(100)), "de", "web"),
        ],
    )
    name = "q180_truncation_waste"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    rows = {int(r.ctx): r for r in sdf.itertuples()}
    assert set(rows) == {512, 1024, 2048, 4096}
    r512 = rows[512]
    assert (r512.n_docs, r512.total_tokens, r512.lost_tokens) == (2, 700, 88)
    assert r512.n_truncated == 1
    assert r512.waste_ppm == 88 * 1000000 // 700
    for ctx in (1024, 2048, 4096):
        assert rows[ctx].lost_tokens == 0 and rows[ctx].waste_ppm == 0


def test_q181_lexicon_hand_computed(spark, tmp_path):
    """3 docs: 'Casino' matches case-insensitively (1 hit, 4 tokens),
    one clean doc, one with 3 hits in 3 tokens. 2 of 3 docs flagged
    -> 666666 ppm; 7 of 11 tokens lost -> 636363 ppm; 4 total hits."""
    d = _write_docs(
        tmp_path,
        [
            (0, "das Casino ist offen", "de", "web"),
            (1, "alles gut hier heute", "de", "web"),
            (2, "lotterie lotterie casino", "de", "web"),
        ],
    )
    name = "q181_lexicon_filter"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    r = sdf.iloc[0]
    assert (r.n_docs, r.n_flagged, r.total_hits) == (3, 2, 4)
    assert r.flagged_ppm == 2 * 1000000 // 3
    assert (r.total_tokens, r.tokens_lost) == (11, 7)
    assert r.lost_ppm == 7 * 1000000 // 11


def test_q182_invoice_reconcile_hand_computed(spark, tmp_path):
    """doc 7 (% 7 == 0): 4 items 260+273+286+299 = 1118 cents, stated
    total planted at 1119 -> delta +1, ok False. doc 1: 38+51 = 89,
    total 89 -> ok True. Fixture text itself is asserted so the
    German-locale formatting (decimal comma, lpad cents) is pinned."""
    d = _write_docs(
        tmp_path,
        [(1, "x", "de", "web"), (7, "x", "de", "web")],
    )
    name = "q182_invoice_reconcile"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {int(r.doc_id): r for r in sdf.itertuples()}
    r1, r7 = got[1], got[7]
    assert (r1.n_items, r1.items_sum_cents, r1.total_cents) == (2, 89, 89)
    assert r1.delta_cents == 0 and bool(r1.ok)
    assert (r7.n_items, r7.items_sum_cents, r7.total_cents) == (4, 1118, 1119)
    assert r7.delta_cents == 1 and not bool(r7.ok)


def test_q183_wilson_rank_inversion(spark, tmp_path):
    """'tiny': 3/3 keeps -> raw 1e6 ppm but Wilson LB (5-2)/7 =
    428571 ppm. 'big': 99/100 keeps -> raw 990000 ppm, Wilson LB
    ~944025 ppm. The raw rate ranks tiny first; Wilson inverts —
    that inversion is the operator's purpose."""
    import math

    de = "der die das und ist nicht ein mit"
    en = "the and is not a with of to"
    rows, i = [], 0
    for _ in range(3):
        rows.append((i, de, "de", "tiny")); i += 1
    for _ in range(99):
        rows.append((i, de, "de", "big")); i += 1
    rows.append((i, en, "de", "big")); i += 1
    d = _write_docs(tmp_path, rows)
    name = "q183_wilson_source_rank"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {r.source: r for r in sdf.itertuples()}
    t, b = got["tiny"], got["big"]
    assert (t.n, t.k, t.keep_ppm) == (3, 3, 1000000)
    assert (b.n, b.k, b.keep_ppm) == (100, 99, 990000)

    def lb(k, n):
        return math.floor(
            (k + 2 - 2 * math.sqrt((k * (n - k)) / n + 1.0))
            / (n + 4) * 1000000.0
        )

    assert t.wilson_lb_ppm == lb(3, 3) == 428571
    assert b.wilson_lb_ppm == lb(99, 100)
    assert b.rnk < t.rnk  # Wilson inverts the raw-rate order


def test_q184_padding_hand_computed(spark, tmp_path):
    """Lengths 1, 2, 3, 5, 8, 9 tokens -> buckets 1, 2, 4, 8, 8, 16
    (exact powers stay put, 2^j + 1 doubles). total 28 tokens, 39
    slots, 11 pad -> floor(11e6/39) = 282051 ppm."""
    lens = [1, 2, 3, 5, 8, 9]
    d = _write_docs(
        tmp_path,
        [
            (i, " ".join(f"w{j}" for j in range(L)), "de", "web")
            for i, L in enumerate(lens)
        ],
    )
    name = "q184_padding_waste"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    r = sdf.iloc[0]
    assert (r.n_docs, r.total_tokens, r.total_slots) == (6, 28, 39)
    assert r.pad_tokens == 11
    assert r.pad_ppm == 11 * 1000000 // 39


def test_q185_rolling_hll_mergeability(spark, tmp_path):
    """Day 1: users 1..200; day 5: users 101..300 (union 300). The
    day-5 window merges both daily sketches; building ONE sketch over
    the union (fixture B, all 300 users on one day) must give the
    IDENTICAL estimate — register-MAX merge == build-on-union, the
    property that lets 10^12-row windows reuse daily sketches."""
    rows, eid = [], 0
    for u in range(1, 201):
        rows.append((eid, "2024-01-01 10:00:00", u, "click", 1.0)); eid += 1
    for u in range(101, 301):
        rows.append((eid, "2024-01-05 10:00:00", u, "view", 1.0)); eid += 1
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    da = _write_events(tmp_path / "a", rows)
    name = "q185_rolling_hll"
    sa = QUERIES[name](spark, da).toPandas()
    assert compare(sa, _oracle(da, name)) is None
    got = {r.day: r for r in sa.itertuples()}
    d1, d5 = got["2024-01-01"], got["2024-01-05"]
    assert (d1.window_days, d1.exact_users) == (1, 200)
    assert (d5.window_days, d5.exact_users) == (2, 300)
    assert d1.err_ppm < 200000 and d5.err_ppm < 200000

    rows_b = [
        (i, "2024-01-05 10:00:00", u, "click", 1.0)
        for i, u in enumerate(range(1, 301))
    ]
    db = _write_events(tmp_path / "b", rows_b)
    sb = QUERIES[name](spark, db).toPandas()
    union_est = int(sb[sb.day == "2024-01-05"].hll_est.iloc[0])
    assert int(d5.hll_est) == union_est  # merge == build-on-union


def test_q186_histogram_quantiles_hand_computed(spark, tmp_path):
    """n_chars 10..100 step 10 split across two sources. isqrt
    buckets: 3,4,5,6,7,7,8,8,9,10. P50 cut lands in bucket 7 ->
    est 8^2-1 = 63 vs exact 50; P90 -> bucket 9, est 99 vs 90;
    P99 -> bucket 10, est 120 vs 100. est >= exact always. The same
    docs in ONE source must give the identical table (summary merge
    is plain addition)."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    vals = list(range(10, 101, 10))

    def mk(dirname, sources):
        return _write_docs(
            tmp_path / dirname,
            [
                (i, "x" * v, "de", sources[i % len(sources)], v)
                for i, v in enumerate(vals)
            ],
        )

    name = "q186_histogram_quantiles"
    da = mk("a", ["s1", "s2"])
    sa = QUERIES[name](spark, da).toPandas()
    assert compare(sa, _oracle(da, name)) is None
    got = {int(r.q_pct): r for r in sa.itertuples()}
    assert (got[50].exact_val, got[50].est_val, got[50].err_abs) == (50, 63, 13)
    assert (got[90].exact_val, got[90].est_val, got[90].err_abs) == (90, 99, 9)
    assert (got[99].exact_val, got[99].est_val, got[99].err_abs) == (100, 120, 20)
    assert (sa.err_abs >= 0).all()

    db = mk("b", ["only"])
    sb = QUERIES[name](spark, db).toPandas()
    assert sorted(map(tuple, sb.values.tolist())) == sorted(
        map(tuple, sa.values.tolist())
    )


def test_q187_label_drift_hand_computed(spark, tmp_path):
    """8 vectors, global halves split at vec_id 4. Label 0 flips from
    (1,0) to (0,1) -> drift cosine exactly 0. Label 1 keeps
    direction (3,4) -> cosine exactly 1."""
    rows = [
        (0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),
        (2, [3.0, 4.0], 1), (3, [3.0, 4.0], 1),
        (4, [0.0, 1.0], 0), (5, [0.0, 1.0], 0),
        (6, [3.0, 4.0], 1), (7, [3.0, 4.0], 1),
    ]
    d = _write_embeddings(tmp_path, rows)
    name = "q187_label_drift"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {int(r.label): r for r in sdf.itertuples()}
    assert (got[0].n_first, got[0].n_second) == (2, 2)
    assert got[0].drift_cos == 0.0
    assert got[1].drift_cos == 1.0


def test_q188_bot_bursts_hand_computed(spark, tmp_path):
    """user 1: 13 events in one second -> bot. user 2: exactly
    BOT_BURST_MAX=12 in one second -> NOT bot (strict >). user 3: 13
    events spread 5s apart over 60s -> the rolling [t-59, t] window
    peaks at 12 (the first event falls out) -> NOT bot."""
    rows, eid = [], 0
    for _ in range(13):
        rows.append((eid, "2024-01-01 10:00:00", 1, "click", 1.0)); eid += 1
    for _ in range(12):
        rows.append((eid, "2024-01-01 10:00:00", 2, "click", 1.0)); eid += 1
    for k in range(13):
        t = 5 * k
        rows.append(
            (eid, f"2024-01-01 10:{t // 60:02d}:{t % 60:02d}", 3, "click", 1.0)
        ); eid += 1
    d = _write_events(tmp_path, rows)
    name = "q188_bot_bursts"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {int(r.user_id): r for r in sdf.itertuples()}
    assert (got[1].n_events, got[1].max_60s, bool(got[1].is_bot)) == (13, 13, True)
    assert (got[2].max_60s, bool(got[2].is_bot)) == (12, False)
    assert (got[3].n_events, got[3].max_60s, bool(got[3].is_bot)) == (13, 12, False)


def test_q189_threshold_sweep_hand_computed(spark, tmp_path):
    """Doc A scores ~7254 e4 (all-German stopwords, 627 chars), doc B
    ~6020 (English), doc C repeats B's text with a mismatched lang so
    it never survives. Keeps: both A and B at thresholds <= B's
    score, only A above it; kept_tokens tracks 157+3 vs 157; the
    whole curve is monotone non-increasing."""
    from german_ocr_spark.queries import QT_GRID_E4

    text_a = "der " * 156 + "das"
    text_b = "the and is"
    qa, qb = _qe4_replica(text_a), _qe4_replica(text_b)
    assert qa >= max(QT_GRID_E4) and min(QT_GRID_E4) <= qb < qa
    d = _write_docs(
        tmp_path,
        [
            (0, text_a, "de", "web"),
            (1, text_b, "en", "web"),
            (2, text_b, "de", "web"),
        ],
    )
    name = "q189_threshold_sweep"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {int(r.t_e4): r for r in sdf.itertuples()}
    for t in QT_GRID_E4:
        exp_keep = 1 + (1 if qb >= t else 0)
        assert got[t].n_docs == 3
        assert got[t].n_keep == exp_keep
        assert got[t].kept_tokens == 157 + (3 if qb >= t else 0)
        assert got[t].keep_ppm == exp_keep * 1000000 // 3
    curve = [got[t].n_keep for t in sorted(QT_GRID_E4)]
    assert curve == sorted(curve, reverse=True)


def test_q190_reciprocal_nn_hand_computed(spark, tmp_path):
    """Cell 0 holds A=(10,1), B=(10,1.25), C=(10,5) (dim 8, float32-
    exact values). A and B are mutually nearest (1.4 deg apart); C's
    1-NN is B but B's is A, so C reciprocates nothing. Exactly one
    RNN pair (A,B) with the replicated floor6 cosine."""
    import math

    dim = 8
    rows = []
    for c in range(16):  # IVF_N_CELLS centroids
        v = [0.0] * dim
        v[c % dim] = 100.0 * (1 + c // dim)
        rows.append((c, v, 0))
    for vid, y in ((16, 1.0), (17, 1.25), (18, 5.0)):
        v = [0.0] * dim
        v[0], v[1] = 10.0, y
        rows.append((vid, v, 0))
    d = _write_embeddings(tmp_path, rows)
    name = "q190_reciprocal_nn"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert len(sdf) == 1
    r = sdf.iloc[0]
    assert (r.vec_a, r.vec_b) == (16, 17)
    exp = math.floor(
        101.25 / (math.sqrt(101.0) * math.sqrt(101.5625)) * 1e6
    ) / 1e6
    assert r.cos_sim == exp


def test_q191_journey_fingerprints_hand_computed(spark, tmp_path):
    """Users 1 and 2 share the opening click>view>click>buy>view
    (user 1 has a differing 6th event — tails must not matter).
    Users 3 and 4 share a full 3-event journey. User 5's different
    order matches nobody. Two groups exactly."""
    seq = ["click", "view", "click", "buy", "view"]
    rows, eid = [], 0

    def add(user, types):
        nonlocal eid
        for k, t in enumerate(types):
            rows.append(
                (eid, f"2024-01-01 10:{k:02d}:00", user, t, 1.0)
            )
            eid += 1

    add(1, seq + ["click"])
    add(2, seq)
    add(3, ["click", "view", "click"])
    add(4, ["click", "view", "click"])
    add(5, ["view", "click", "view"])
    d = _write_events(tmp_path, rows)
    name = "q191_journey_fingerprints"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert len(sdf) == 2
    got = {int(r.opening_len): r for r in sdf.itertuples()}
    assert (got[5].n_users, got[5].example_user) == (2, 1)
    assert (got[3].n_users, got[3].example_user) == (2, 3)


def test_q192_trending_hand_computed(spark, tmp_path):
    """Second half (docs 2, 3) plants 6 occurrences of 'surge surge'
    never seen in the first half -> the only bigram clearing the
    support floor, lift (6+1)*1e6/(0+1) = 7e6 ppm. 'alpha beta'
    appears in both halves but misses the support floor (f1=1)."""
    d = _write_docs(
        tmp_path,
        [
            (0, "alpha beta alpha beta", "de", "web"),
            (1, "alpha beta gamma", "de", "web"),
            (2, "surge surge surge surge surge surge", "de", "web"),
            (3, "surge surge alpha beta", "de", "web"),
        ],
    )
    name = "q192_trending_phrases"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert len(sdf) == 1
    r = sdf.iloc[0]
    assert (r.gram, r.f0, r.f1, r.lift_ppm) == ("surge surge", 0, 6, 7000000)


def test_q193_vocab_overlap_hand_computed(spark, tmp_path):
    """Source A vocab {a,b,c} (duplicates within docs collapse),
    source B {b,c,d}, source C {x}. A-B share {b,c}: Jaccard
    2/4 = 500000 ppm; pairs with C share nothing and emit no row
    (inner intersection join)."""
    d = _write_docs(
        tmp_path,
        [
            (0, "a b c a", "de", "A"),
            (1, "b c", "de", "A"),
            (2, "b c d", "de", "B"),
            (3, "x", "de", "C"),
        ],
    )
    name = "q193_vocab_overlap"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert len(sdf) == 1
    r = sdf.iloc[0]
    assert (r.src_a, r.src_b) == ("A", "B")
    assert (r.vocab_a, r.vocab_b, r.n_common) == (3, 3, 2)
    assert r.jaccard_ppm == 500000


def test_q194_source_oov_hand_computed(spark, tmp_path):
    """Global vocab keeps the top 50 types: 3 doubled types from
    source A plus the alphabetically-first 47 of source B's 57
    singletons (ties at n=1 break by token text). B's last 10
    singletons are OOV: 10 of 57 tokens -> floor(1e7/57)... =
    175438 ppm; A reads fully in-vocab."""
    b_text = " ".join(f"r{i:02d}" for i in range(57))
    d = _write_docs(
        tmp_path,
        [
            (0, "c0 c0 c1 c1 c2 c2", "de", "A"),
            (1, b_text, "de", "B"),
        ],
    )
    name = "q194_source_oov"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {r.source: r for r in sdf.itertuples()}
    assert (got["A"].n_tokens, got["A"].n_oov, got["A"].oov_ppm) == (6, 0, 0)
    assert (got["B"].n_tokens, got["B"].n_oov) == (57, 10)
    assert got["B"].oov_ppm == 10 * 1000000 // 57


def test_q195_interleave_profile_hand_computed(spark, tmp_path):
    """Docs 0..4 land one per span-count cohort (k = 2 + id % 5);
    media/transition counts derived by hand from the (id + i) % 3
    rule — e.g. doc 3 has spans i-t-t-i-t: 2 media, 3 transitions,
    opens with media."""
    d = _write_docs(
        tmp_path, [(i, "x", "de", "web") for i in range(5)]
    )
    name = "q195_interleave_profile"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {int(r.n_spans): r for r in sdf.itertuples()}
    exp = {
        2: (1, 500000, 1000000, 1),
        3: (1, 333333, 500000, 0),
        4: (1, 250000, 666666, 0),
        5: (1, 400000, 750000, 1),
        6: (1, 333333, 600000, 0),
    }
    for k, (nd, mp, ap, mf) in exp.items():
        r = got[k]
        assert (r.n_docs, r.media_ppm, r.alternation_ppm, r.n_media_first) \
            == (nd, mp, ap, mf), k


def test_q196_caption_coverage_hand_computed(spark, tmp_path):
    """Docs 0..4 (one per span-count cohort) hand-derived from the
    residue rules: 7 images total, 4 captioned (docs 1 and 3 fully,
    doc 4 partially), orphan docs = {0, 2, 4}. Doc 10 (k=2, both
    spans text) has no media and its source must not appear."""
    d = _write_docs(
        tmp_path,
        [(i, "x", "de", "web") for i in range(5)]
        + [(10, "x", "de", "nomedia")],
    )
    name = "q196_caption_coverage"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert set(sdf["source"]) == {"web"}
    r = sdf.iloc[0]
    assert (
        r.n_images, r.n_captioned, r.caption_ppm,
        r.n_docs_media, r.n_docs_orphan,
    ) == (7, 4, 571428, 5, 3)


def test_q197_watermark_audit_hand_computed(spark, tmp_path):
    """Type 'a' (ids 1..10): delays (id*37)%120 -> five events beyond
    60 s -> 500000 ppm late, max 111, p99.9 = max = 111. Type 'b' is
    the single straggler id 97: 109 + 3600 = 3709 everywhere."""
    rows = [
        (i, "2024-01-01T00:00:00", 1, "a", 0.0) for i in range(1, 11)
    ] + [(97, "2024-01-01T00:00:00", 2, "b", 0.0)]
    d = _write_events(tmp_path, rows)
    name = "q197_watermark_audit"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("event_type")
    assert tuple(by.loc["a"]) == (10, 111, 500000, 111)
    assert tuple(by.loc["b"]) == (1, 3709, 1000000, 3709)


def test_q198_join_preflight_hand_computed(spark, tmp_path):
    """User 1: 3 clicks x 2 purchases = 6 pairs; user 2: 1 x 1 = 1;
    user 3 clicks only -> excluded. Total 7 pairs -> shares
    857142 / 142857 ppm; hot key ranked first."""
    rows = []
    eid = 0
    for _ in range(3):
        rows.append((eid, "2024-01-01T00:00:00", 1, "click", 0.0)); eid += 1
    for _ in range(2):
        rows.append((eid, "2024-01-01T00:00:00", 1, "purchase", 0.0)); eid += 1
    rows += [
        (eid, "2024-01-01T00:00:00", 2, "click", 0.0),
        (eid + 1, "2024-01-01T00:00:00", 2, "purchase", 0.0),
        (eid + 2, "2024-01-01T00:00:00", 3, "click", 0.0),
    ]
    d = _write_events(tmp_path, rows)
    name = "q198_join_preflight"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert [tuple(r) for r in sdf.itertuples(index=False)] == [
        (1, 3, 2, 6, 857142),
        (2, 1, 1, 1, 142857),
    ]


def test_q199_rendezvous_minimal_movement(spark, tmp_path):
    """Against a pure-Python md5 replica on 60 docs: per-shard before
    counts match exactly; removing shard 5 moves ONLY its docs
    (n_after = n_before + n_moved_in on survivors, n_after = 0 on the
    removed shard, total moved = shard 5's population)."""
    from german_ocr_spark.queries import RDV_DOWN, RDV_SHARDS

    d = _write_docs(tmp_path, [(i, "x", "de", "web") for i in range(60)])
    name = "q199_rendezvous_rebalance"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None

    def score(doc, s):
        h = hashlib.md5(f"{doc}:{s}".encode()).hexdigest()
        return int(h[:12], 16) * RDV_SHARDS + s

    before, after = {}, {}
    for doc in range(60):
        b = max(range(RDV_SHARDS), key=lambda s: score(doc, s))
        a = max(
            (s for s in range(RDV_SHARDS) if s != RDV_DOWN),
            key=lambda s: score(doc, s),
        )
        before[b] = before.get(b, 0) + 1
        after[a] = after.get(a, 0) + 1
        assert b == RDV_DOWN or a == b  # survivors never move
    by = sdf.set_index("shard")
    assert int(by["n_before"].sum()) == 60
    assert int(by.loc[RDV_DOWN, "n_after"]) == 0
    assert int(by["n_moved_in"].sum()) == before.get(RDV_DOWN, 0)
    for s in range(RDV_SHARDS):
        assert int(by.loc[s, "n_before"]) == before.get(s, 0)
        if s != RDV_DOWN:
            assert int(by.loc[s, "n_after"]) == after.get(s, 0)
            assert (
                by.loc[s, "n_after"]
                == by.loc[s, "n_before"] + by.loc[s, "n_moved_in"]
            )


def test_q200_code_switching_hand_computed(spark, tmp_path):
    """Doc 0 is half German / half English with the char midpoint on
    the seam -> switched; doc 1 is German throughout; doc 2 has no
    stopwords at all -> both halves unknown."""
    g = "der die das und ist."   # 20 chars, langid 'de'
    e = "the and is not that "   # 20 chars, langid 'en'
    x = "xyz qwe rty uio zxc "   # 20 chars, langid 'unknown'
    d = _write_docs(
        tmp_path,
        [(0, g + e, "de", "web"), (1, g + g, "de", "web"),
         (2, x + x, "de", "web")],
    )
    name = "q200_code_switching"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    r = sdf.iloc[0]
    assert (r.n_docs, r.n_switched, r.switched_ppm, r.n_half_unknown) \
        == (3, 1, 333333, 1)


def _simhash_py(text):
    toks = sorted(set(text.strip().split()))
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:12], 16) for t in toks]
    sig = 0
    for b in range(48):
        ones = sum(1 for h in hs if (h >> b) & 1)
        if ones * 2 >= len(hs):
            sig |= 1 << b
    return sig


def test_q201_near_decontaminate_planted(spark, tmp_path):
    """Doc 12 is in the eval slice (md5('eval:12') < '10'); train doc 0
    copies it verbatim -> flagged at hamming 0; train doc 2 is a light
    paraphrase -> presence and min_hamming must match the pure-Python
    SimHash replica; train doc 1 shares nothing -> absent."""
    from german_ocr_spark.queries import (
        SH_BAND_BITS, SH_HAM_MAX, SH_N_BANDS,
    )

    base = " ".join(f"w{i}" for i in range(40))
    para = " ".join(
        ("swapped" + str(i)) if i in (3, 17) else f"w{i}" for i in range(40)
    )
    other = " ".join(f"z{i}" for i in range(40))
    d = _write_docs(
        tmp_path,
        [(12, base, "de", "web"), (0, base, "de", "web"),
         (1, other, "de", "web"), (2, para, "de", "web")],
    )
    name = "q201_near_decontaminate"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("doc_id")  # string-typed in the simhash family
    assert by.loc["0", "min_hamming"] == 0
    assert by.loc["0", "n_eval_near"] == 1
    assert "1" not in by.index
    s_eval, s_para = _simhash_py(base), _simhash_py(para)
    hd = bin(s_eval ^ s_para).count("1")
    mask = (1 << SH_BAND_BITS) - 1
    collides = any(
        ((s_eval >> (SH_BAND_BITS * i)) & mask)
        == ((s_para >> (SH_BAND_BITS * i)) & mask)
        for i in range(SH_N_BANDS)
    )
    if collides and hd <= SH_HAM_MAX:
        assert by.loc["2", "min_hamming"] == hd
    else:
        assert "2" not in by.index


def test_q202_cluster_chaining_planted(spark, tmp_path):
    """Chain A-B-C: hamming(A,B)=2 and hamming(B,C)=3 are edges, but
    C sits 5 bits from keeper A (no direct edge) -> exactly one
    chained member with max distance 5. The identical pair 3/4 forms
    a clean cluster (0 chained); word choices pre-searched against
    the python SimHash replica so the topology is guaranteed."""
    A = " ".join(f"w{i}" for i in range(40))
    B = " ".join(("x0" if i == 5 else f"w{i}") for i in range(40))
    C = " ".join(
        ("x0" if i == 5 else ("y1" if i == 25 else f"w{i}"))
        for i in range(40)
    )
    Z = " ".join(f"zz{i}" for i in range(40))
    d = _write_docs(
        tmp_path,
        [(0, A, "de", "web"), (1, B, "de", "web"), (2, C, "de", "web"),
         (3, Z, "de", "web"), (4, Z, "de", "web")],
    )
    name = "q202_cluster_chaining"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("component")
    assert tuple(by.loc["0"]) == (3, 1, 5)
    assert tuple(by.loc["3"]) == (2, 0, 0)
    assert len(sdf) == 2


def test_q203_mad_outliers_hand_computed(spark, tmp_path):
    """de: values 10,12,12,14,100 -> median 12, deviations {0:2,2:2,
    88:1} -> MAD 2, one 3-MAD outlier (the 100). en: 50,50,50,51 ->
    MAD 0, so ANY deviation flags -> the 51 is an outlier (the
    documented MAD=0 degeneracy on near-constant data)."""
    d = _write_docs(
        tmp_path,
        [(0, "x", "de", "s", 10), (1, "x", "de", "s", 12),
         (2, "x", "de", "s", 12), (3, "x", "de", "s", 14),
         (4, "x", "de", "s", 100),
         (5, "x", "en", "s", 50), (6, "x", "en", "s", 50),
         (7, "x", "en", "s", 50), (8, "x", "en", "s", 51)],
    )
    name = "q203_mad_outliers"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("lang")
    assert tuple(by.loc["de"]) == (5, 12, 2, 1, 200000)
    assert tuple(by.loc["en"]) == (4, 50, 0, 1, 250000)


def test_q204_fk_orphans_planted(spark, tmp_path):
    """Mini star schema with two planted violations: one order points
    at customer 999 (absent) and one lineitem at part 999 — every
    other edge reports zero orphans with exact child counts."""
    star = {
        "region": {"r_regionkey": [0], "r_name": ["EU"]},
        "nation": {"n_nationkey": [0, 1], "n_name": ["DE", "FR"],
                   "n_regionkey": [0, 0]},
        "customer": {"c_custkey": [10, 11], "c_name": ["a", "b"],
                     "c_nationkey": [0, 1], "c_acctbal": [0.0, 0.0],
                     "c_mktsegment": ["x", "x"]},
        "supplier": {"s_suppkey": [20], "s_name": ["s"],
                     "s_nationkey": [1], "s_acctbal": [0.0]},
        "part": {"p_partkey": [30], "p_name": ["p"], "p_brand": ["b"],
                 "p_type": ["t"], "p_size": [1], "p_retailprice": [1.0]},
        "orders": {"o_orderkey": [40, 41, 42],
                   "o_custkey": [10, 11, 999],
                   "o_orderstatus": ["F"] * 3,
                   "o_totalprice": [1.0] * 3,
                   "o_orderdate": ["1995-01-01"] * 3,
                   "o_orderpriority": ["1-URGENT"] * 3},
        "lineitem": {"l_orderkey": [40, 41], "l_partkey": [30, 999],
                     "l_suppkey": [20, 20], "l_linenumber": [1, 1],
                     "l_quantity": [1.0, 1.0],
                     "l_extendedprice": [1.0, 1.0],
                     "l_discount": [0.0, 0.0], "l_tax": [0.0, 0.0],
                     "l_returnflag": ["N", "N"],
                     "l_linestatus": ["O", "O"],
                     "l_shipdate": ["1995-02-01", "1995-02-01"]},
    }
    for t, cols in star.items():
        pd.DataFrame(cols).to_parquet(f"{tmp_path}/{t}.parquet", index=False)
    name = "q204_fk_orphans"
    sdf = QUERIES[name](spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    for t in star:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    assert compare(sdf, con.sql(ORACLES[name]).fetchdf()) is None
    by = sdf.set_index("relationship")
    assert tuple(by.loc["orders.o_custkey->customer.c_custkey"]) == (3, 1)
    assert tuple(by.loc["lineitem.l_partkey->part.p_partkey"]) == (2, 1)
    assert int(by["n_orphans"].sum()) == 2


def test_q205_embedding_integrity_planted(spark, tmp_path):
    """One clean vector, one empty, one 3-dim, one NaN-poisoned, one
    all-zero — each lands in exactly its own counter. The NaN element
    arrives as a NULL list element through pandas->parquet (the exact
    production failure shape), caught by the null-or-nan probe."""
    clean = [0.1] * 64
    nanv = [0.1] * 63 + [float("nan")]
    d = _write_embeddings(
        tmp_path,
        [(0, clean, 1), (1, [], 1), (2, [0.1, 0.2, 0.3], 1),
         (3, nanv, 1), (4, [0.0] * 64, 1), (5, clean, 2)],
    )
    name = "q205_embedding_integrity"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("label")
    assert tuple(by.loc[1]) == (5, 1, 1, 1, 1)
    assert tuple(by.loc[2]) == (1, 0, 0, 0, 0)


def test_q206_address_extract_hand_computed(spark, tmp_path):
    """Doc 5 hits the leading-zero PLZ ('01185') AND the multi-word
    city; doc 0 is the malformed cohort (no PLZ -> empty fields,
    plz_ok 0); doc 7 carries the 8a-style house-letter suffix."""
    d = _write_docs(tmp_path, [(i, "x", "de", "s") for i in (0, 5, 7)])
    name = "q206_address_extract"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("doc_id")
    assert tuple(by.loc[0]) == ("Hauptstraße", "1a", "", "", 0)
    assert tuple(by.loc[5]) == (
        "Berliner Allee", "6", "01185", "Frankfurt am Main", 1)
    assert tuple(by.loc[7]) == ("Mozartweg", "8a", "01259", "Hamburg", 1)


def test_q207_rbo_integer_identity_vs_fractions():
    """The integer suffix-weight formula IS truncated RBO: for random
    rank-pair sets, sum(SUFFIX[max(ra,rb)]) * 1e6 // DEN equals
    floor(1e6 * (1-p) Σ p^(d-1)·ov_d/d) computed in exact Fractions
    (identical rankings -> 1 - p^10 = 651321 e6 exactly, the
    truncated-RBO ceiling; disjoint top-10 -> 0)."""
    import random
    from fractions import Fraction

    from german_ocr_spark.queries import RBO_DEPTH, _RBO_DEN, _RBO_SUFFIX

    def brute(pairs):
        p = Fraction(9, 10)
        total = Fraction(0)
        for dep in range(1, RBO_DEPTH + 1):
            ov = sum(1 for ra, rb in pairs if max(ra, rb) <= dep)
            total += (1 - p) * p ** (dep - 1) * Fraction(ov, dep)
        return (total * 10**6).__floor__()

    def integer(pairs):
        num = sum(
            _RBO_SUFFIX[max(ra, rb) - 1]
            for ra, rb in pairs
            if max(ra, rb) <= RBO_DEPTH
        )
        return num * 10**6 // _RBO_DEN

    ident = [(i, i) for i in range(1, 31)]
    # truncated RBO@10 ceiling: (1-p)·Σ p^(d-1) = 1 - (9/10)^10
    assert integer(ident) == brute(ident) == 651321
    rng = random.Random(7)
    for _ in range(50):
        n = rng.randint(1, 30)
        perm_a = rng.sample(range(1, n + 1), n)
        perm_b = rng.sample(range(1, n + 1), n)
        pairs = list(zip(perm_a, perm_b))
        assert integer(pairs) == brute(pairs)
    disjoint = [(i, i + 10) for i in range(1, 11)]
    assert integer(disjoint) == brute(disjoint)


def test_q208_ols_slope_matches_fraction_replica(spark, tmp_path):
    """Algebra check: y comes from the shared quality_e4 formula (via
    DuckDB on the same fixture), then slope/r² are re-derived in
    exact Fractions with truncation-toward-zero — the query must
    match digit for digit, including a NEGATIVE slope source where
    longer docs carry more punctuation garbage."""
    from fractions import Fraction

    from german_ocr_spark.functions.textstats import quality_score_e4_sql

    rows = [
        (0, "der " * 10, "de", "up"),          # short, stopwordy
        (1, "der " * 120, "de", "up"),         # long, stopwordy
        (2, "kurz gut", "de", "down"),
        (3, "wort " * 50 + "!!!!!!!!!!!!!!!!!!!!", "de", "down"),
        (4, "wort " * 150 + "!" * 60, "de", "down"),
    ]
    d = _write_docs(tmp_path, rows)
    name = "q208_ols_length_quality"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    ys = duckdb.sql(
        f"SELECT source, n_chars, {quality_score_e4_sql('text')} AS y "
        f"FROM '{tmp_path}/documents.parquet'"
    ).fetchall()

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    by = sdf.set_index("source")
    for src in ("up", "down"):
        pts = [(x, y) for s, x, y in ys if s == src]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
        cxy, cxx, cyy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        assert by.loc[src, "n_docs"] == n
        assert by.loc[src, "slope_e9"] == trunc_div(cxy * 10**9, cxx)
        assert by.loc[src, "r2_e6"] == trunc_div(cxy * cxy * 10**6, cxx * cyy)
    assert by.loc["up", "slope_e9"] > 0


def test_q209_quality_keeper_policy(spark, tmp_path):
    """Doc 0 re-enters padded (id 100000) with a higher quality score
    (longer raw text) -> the quality policy keeps the PADDED copy
    while min-id keeps doc 0, and gain_e4 = exactly the score
    difference computed by the shared formula; identical-text group
    ties break to the smaller id with zero gain."""
    from german_ocr_spark.functions.textstats import quality_score_e4_sql

    base = "wort " * 30 + "ende"
    d = _write_docs(
        tmp_path,
        [(0, base, "de", "s"),          # re-crawled (0 % 7 == 0)
         (3, "anders " * 25, "de", "s")],
    )
    name = "q209_quality_keeper"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert len(sdf) == 1  # only doc 0's group is a dup group
    r = sdf.iloc[0]
    qs = duckdb.sql(
        f"SELECT {quality_score_e4_sql('t')} FROM (VALUES "
        f"('{base}'), ('  {base}  ')) v(t)"
    ).fetchall()
    q_orig, q_pad = qs[0][0], qs[1][0]
    assert q_pad > q_orig
    assert (r.n_dups, r.keeper_doc, r.keeper_qe4, r.minid_doc, r.gain_e4) \
        == (2, 100000, q_pad, 0, q_pad - q_orig)


def test_q210_media_reuse_hand_computed(spark, tmp_path):
    """Docs 0..4 produce 7 image spans (q195/q196's counts) whose
    refs are hand-derived from (doc_id*31 + i*17) % 40; media/0.png
    is hit by doc 0 (i=0) — shares are exact sevenths."""
    d = _write_docs(tmp_path, [(i, "x", "de", "web") for i in range(5)])
    name = "q210_media_reuse"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    # image positions per doc: d0:{0}, d1:{2}, d2:{1}, d3:{0,3}, d4:{2,5}
    exp = {}
    for doc, i in [(0, 0), (1, 2), (2, 1), (3, 0), (3, 3), (4, 2), (4, 5)]:
        ref = f"media/{(doc * 31 + i * 17) % 40}.png"
        exp[ref] = exp.get(ref, 0) + 1
    got = dict(zip(sdf["media_ref"], sdf["n_docs"]))
    assert got == exp
    assert int(sdf["n_docs"].sum()) == 7
    assert all(
        sp == nd * 1000000 // 7
        for nd, sp in zip(sdf["n_docs"], sdf["share_ppm"])
    )


def test_q211_multimodal_packing_hand_computed(spark, tmp_path):
    """Docs 0..4 single-lane? No — lanes are salted; instead assert
    per-doc costs exactly (text tokens + images*64 from the q195/q196
    image counts 1,1,1,2,2), lane-local cumulative packing (offsets
    advance by cost in doc_id order within each lane), and that
    media_cost_ppm is the exact scaled share."""
    from german_ocr_spark.queries import IMG_TOKEN_COST, PACK_CAP

    d = _write_docs(
        tmp_path,
        [(i, "w " * 10 + "x", "de", "s") for i in range(5)],  # 11 tokens
    )
    name = "q211_multimodal_packing"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    imgs = {0: 1, 1: 1, 2: 1, 3: 2, 4: 2}
    by = sdf.set_index("doc_id")
    for doc, m in imgs.items():
        cost = 11 + m * IMG_TOKEN_COST
        assert by.loc[doc, "cost"] == cost
        assert by.loc[doc, "n_media"] == m
        assert by.loc[doc, "media_cost_ppm"] == \
            m * IMG_TOKEN_COST * 1000000 // cost
    for lane, grp in sdf.sort_values("doc_id").groupby("lane"):
        cum = 0
        for r in grp.itertuples():
            assert (r.seq_id, r.seq_offset) == (cum // PACK_CAP,
                                                cum % PACK_CAP)
            cum += r.cost


def test_q212_lm_backtest_hand_computed(spark, tmp_path):
    """Train half = doc 0 'aaab' (counts aa:2 ab:1, t=3 -> bits aa=0,
    ab=1, OOV=2). Eval doc 1 'aabz': bigrams aa/ab/bz -> 1 OOV of 3
    (333333 ppm), total 3 bits -> 1000 e3/bigram. Eval doc 3 'aaaa':
    all aa -> zero cost, zero OOV."""
    d = _write_docs(
        tmp_path,
        [(0, "aaab", "de", "s"), (1, "aabz", "de", "s"),
         (3, "aaaa", "en", "s")],
    )
    name = "q212_lm_backtest"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("lang")
    assert tuple(by.loc["de"]) == (1, 3, 333333, 1000)
    assert tuple(by.loc["en"]) == (1, 3, 0, 0)


def test_q213_funnel_latency_hand_computed(spark, tmp_path):
    """User 1 converts twice: 5.5 min after a view (bucket 5) and 30
    min after the LATEST of two views (not the first). User 2's
    viewless purchase is excluded. p50=5, p90=30 by the integer rank
    rules."""
    rows = [
        (0, "2024-01-01T10:00:00", 1, "view", 0.0),
        (1, "2024-01-01T10:05:30", 1, "purchase", 1.0),
        (2, "2024-01-01T11:00:00", 1, "view", 0.0),
        (3, "2024-01-01T11:30:00", 1, "view", 0.0),
        (4, "2024-01-01T12:00:00", 1, "purchase", 1.0),
        (5, "2024-01-01T09:00:00", 2, "purchase", 1.0),
        (6, "2024-01-01T09:30:00", 2, "click", 0.0),
    ]
    d = _write_events(tmp_path, rows)
    name = "q213_funnel_latency"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert tuple(sdf.iloc[0]) == (2, 5, 30, 30)


def test_q214_license_bom_planted(spark, tmp_path):
    """Four sources map to the four license classes by suffix % 4;
    within-shard shares are exact and restricted cells carry the
    flag. Doc ids chosen so placement is irrelevant to the asserts
    (we roll the report up over shards)."""
    d = _write_docs(
        tmp_path,
        [(i, "x" * (i + 1), "de", f"src{i % 8}") for i in range(16)],
    )
    name = "q214_license_bom"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by_lic = sdf.groupby("license")[["n_docs", "n_chars"]].sum()
    # src0/src4 -> permissive, src1/src5 -> attribution, etc.: 4 docs each
    for lic in ("permissive", "attribution", "research-only", "restricted"):
        assert by_lic.loc[lic, "n_docs"] == 4
    assert set(sdf[sdf.license == "restricted"]["flag_restricted"]) == {1}
    assert set(sdf[sdf.license != "restricted"]["flag_restricted"]) == {0}
    for _, grp in sdf.groupby("shard"):
        t = grp["n_docs"].sum()
        for r in grp.itertuples():
            assert r.share_ppm == r.n_docs * 1000000 // t


def test_q215_maxcover_greedy_hand_computed(spark, tmp_path):
    """Docs 0 and 2 both cover 5 words — the tie breaks to doc 0;
    doc 2 then adds {d, e} beating doc 1's single f; doc 1's f is
    pick 3; pick 4 takes the zero-gain straggler (still eligible
    after saturation). Gains are non-increasing (submodularity)."""
    d = _write_docs(
        tmp_path,
        [(0, "a b c x y", "de", "s"),      # 5 words, 3 new after doc2
         (1, "a b f", "de", "s"),          # f is its only unique word
         (2, "a b c d e", "de", "s"),      # 5 distinct -> seed
         (3, "a b", "de", "s")],           # fully covered -> zero gain
    )
    name = "q215_maxcover_selection"
    sdf = QUERIES[name](spark, d).toPandas().sort_values("pick_order")
    assert compare(sdf, _oracle(d, name)) is None
    rows = [tuple(r) for r in sdf.itertuples(index=False)]
    assert rows == [
        (1, 0, 5, 5),   # {a b c x y} — tie with doc 2, smaller id wins
        (2, 2, 2, 7),   # d, e new
        (3, 1, 1, 8),   # f new
        (4, 3, 0, 8),   # saturated
    ]
    gains = [r[2] for r in rows]
    assert gains == sorted(gains, reverse=True)


def test_q215_maxcover_small_corpus_stops_early(spark, tmp_path):
    """Corpus smaller than MAXCOV_PICKS: the greedy loop must stop
    when candidates run out instead of raising IndexError on an empty
    collect (round-3 ADVICE), emitting one row per available doc — and
    the ORACLE must agree (its unrolled arms drop NULL-pick rows), so
    the early-stop keeps the parity contract, not just the engine
    alive."""
    d = _write_docs(
        tmp_path,
        [(0, "a b c", "de", "s"), (1, "a d", "de", "s")],
    )
    name = "q215_maxcover_selection"
    sdf = QUERIES[name](spark, d).toPandas().sort_values("pick_order")
    rows = [tuple(r) for r in sdf.itertuples(index=False)]
    assert rows == [(1, 0, 3, 3), (2, 1, 1, 4)]
    assert compare(sdf, _oracle(d, name)) is None


def test_q216_retrieval_mrr_hand_computed(spark, tmp_path):
    """Queries 0/1 each have exactly one same-label twin (cosine 1.0)
    -> first_rel_rank 1, MRR 1e6, P@5 = 200000 ppm; query 2's label
    appears nowhere else -> all three metrics zero."""
    def vec(axis, scale=1.0):
        v = [0.0] * 64
        v[axis] = scale
        return v

    d = _write_embeddings(
        tmp_path,
        [(0, vec(0), 1), (1, vec(1), 2), (2, vec(2), 3),
         (5, vec(0, 0.9), 1), (6, vec(1, 0.9), 2), (7, vec(3), 4)],
    )
    name = "q216_retrieval_mrr"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("query_id")
    assert tuple(by.loc[0]) == (1, 1000000, 200000)
    assert tuple(by.loc[1]) == (1, 1000000, 200000)
    assert tuple(by.loc[2]) == (0, 0, 0)


def test_q217_dataset_datasheet_hand_computed(spark, tmp_path):
    """Four docs: one exact-dup pair (whitespace variant -> 1
    redundant), one PII doc (email), two langs, quality split by
    length; every datasheet cell hand-derived."""
    long_good = "der die das und ist " * 60  # long + stopwords -> high q
    d = _write_docs(
        tmp_path,
        [(0, "kurz text", "de", "a"),
         (1, "kurz  text", "de", "a"),             # same fingerprint as 0
         (2, "mail me at max@firma.de ok", "en", "b"),
         (3, long_good, "de", "b")],
    )
    name = "q217_dataset_datasheet"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    r = sdf.iloc[0]
    assert r.n_docs == 4
    # tokens: 2 + 2 + 5 + 300
    assert r.n_tokens == 309
    assert (r.n_langs, r.n_sources) == (2, 2)
    assert r.de_share_ppm == 750000
    assert r.n_redundant == 1
    assert r.n_pii_docs == 1
    assert 0 < r.quality_keep_ppm < 1000000  # doc 3 clears, shorts don't


def test_q218_batch_padding_gain_hand_computed(spark, tmp_path):
    """Single lane (forced by one doc per lane bucket is NOT needed —
    use 16 docs, whatever lanes they land in): with B=8 and lengths
    alternating 1 and 100 in doc_id order, arrival batches mix
    lengths while sorted batches separate them, so sorted waste is
    strictly lower; totals re-derived with a python replica of the
    exact lane/batch rule."""
    import hashlib as _h

    from german_ocr_spark.queries import BATCH_B, PACK_LANES

    docs = [(i, ("w " * (100 if i % 2 else 1)).strip(), "de", "s")
            for i in range(256)]  # ~32 docs/lane -> 4 batches/lane
    d = _write_docs(tmp_path, docs)
    name = "q218_batch_padding_gain"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None

    def lane(doc):
        return int(_h.md5(f"pack:{doc}".encode()).hexdigest()[:4], 16) \
            % PACK_LANES

    nts = {i: (100 if i % 2 else 1) for i in range(256)}

    def waste(order_key):
        total = 0
        by_lane = {}
        for i in sorted(nts, key=order_key):
            by_lane.setdefault(lane(i), []).append(nts[i])
        for seq in by_lane.values():
            for j in range(0, len(seq), BATCH_B):
                b = seq[j:j + BATCH_B]
                total += max(b) * len(b) - sum(b)
        return total

    r = sdf.iloc[0]
    assert r.n_tokens == sum(nts.values())
    assert r.arrival_waste == waste(lambda i: i)
    assert r.sorted_waste == waste(lambda i: (nts[i], i))
    assert r.sorted_waste < r.arrival_waste


def test_q219_lexical_richness_hand_computed(spark, tmp_path):
    """Source 'tmpl' repeats one 3-word template 4x -> 12 tokens, 3
    types (TTR 250000), zero hapax; source 'rich' is 6 distinct words
    with one repeat -> 7 tokens, 6 types, 5 hapaxes."""
    d = _write_docs(
        tmp_path,
        [(0, "a b c", "de", "tmpl"), (1, "a b c", "de", "tmpl"),
         (2, "a b c a b c", "de", "tmpl"),
         (3, "u v w x y z u", "de", "rich")],
    )
    name = "q219_lexical_richness"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("source")
    assert tuple(by.loc["tmpl"]) == (12, 3, 250000, 0, 0)
    assert tuple(by.loc["rich"]) == (
        7, 6, 6 * 1000000 // 7, 5, 5 * 1000000 // 6)


def test_q220_cluster_separation_hand_computed(spark, tmp_path):
    """Label 1: two points at ±0.5 on axis 0 -> centroid origin,
    intra = 0.25 exactly (250000 f6). Label 2: two coincident points
    at 2.0 on axis 1 -> intra 0. Centroid d2 = 4 + 0 = wait —
    d2(c1, c2) = 0² + 2² = 4.0 -> 4000000 f6 for both labels;
    separation label1 = 4/0.25 = 16000 e3, label2 intra 0 -> guard 0."""
    def vec(axis, val):
        v = [0.0] * 64
        v[axis] = val
        return v

    d = _write_embeddings(
        tmp_path,
        [(0, vec(0, 0.5), 1), (1, vec(0, -0.5), 1),
         (2, vec(1, 2.0), 2), (3, vec(1, 2.0), 2)],
    )
    name = "q220_cluster_separation"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("label")
    assert tuple(by.loc[1]) == (2, 250000, 2, 4000000, 16000)
    assert tuple(by.loc[2]) == (2, 0, 1, 4000000, 0)


def test_q221_cross_span_healing_hand_computed(spark, tmp_path):
    """Doc 0 (split cohort): 'versicherung nummer kunde' cuts at the
    middle word with 'num-'/'mer' across the boundary and heals back
    exactly. Doc 1 (clean cohort): space-join path round-trips too.
    Doc 2 has < 3 words -> excluded."""
    d = _write_docs(
        tmp_path,
        [(0, "versicherung nummer kunde", "de", "s"),
         (1, "alpha beta gamma delta", "de", "s"),
         (2, "zu kurz", "de", "s")],
    )
    name = "q221_cross_span_healing"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    r = sdf.iloc[0]
    assert (r.n_docs, r.n_hyphen_boundaries, r.n_round_trip_ok) == (2, 1, 2)


def test_q222_burst_collapse_hand_computed(spark, tmp_path):
    """User 1 clicks at 0/3/6/20 s: the 3 s and 6 s events chain-
    collapse onto the 0 s head (each within 5 s of its predecessor),
    20 s starts a new island -> 2 kept / 2 dropped. Other keys
    (purchase, user 2) are independent heads."""
    rows = [
        (0, "2024-01-01T10:00:00", 1, "click", 0.0),
        (1, "2024-01-01T10:00:03", 1, "click", 0.0),
        (2, "2024-01-01T10:00:06", 1, "click", 0.0),
        (3, "2024-01-01T10:00:20", 1, "click", 0.0),
        (4, "2024-01-01T10:00:01", 1, "purchase", 1.0),
        (5, "2024-01-01T10:00:02", 2, "click", 0.0),
    ]
    d = _write_events(tmp_path, rows)
    name = "q222_burst_collapse"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("event_type")
    assert tuple(by.loc["click"]) == (5, 3, 2, 400000)
    assert tuple(by.loc["purchase"]) == (1, 1, 0, 0)


def test_q223_diurnal_profile_hand_computed(spark, tmp_path):
    """Three days; hour 9 sees counts 2/5/100 -> p50 5, p95 100;
    hour 3 is silent on two of three days -> counts {0,0,4}: the
    gap-fill makes p50 = 0 (without it the silent hours would
    vanish and p50 would read 4)."""
    rows = []
    eid = 0
    for day, n in (("01", 2), ("02", 5), ("03", 100)):
        for i in range(n):
            rows.append((eid, f"2024-01-{day}T09:30:00", 1, "view", 0.0))
            eid += 1
    for i in range(4):
        rows.append((eid, "2024-01-02T03:10:00", 1, "view", 0.0))
        eid += 1
    d = _write_events(tmp_path, rows)
    name = "q223_diurnal_profile"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("hour_of_day")
    assert len(sdf) == 24
    assert tuple(by.loc[9]) == (3, 5, 100, 100)
    assert tuple(by.loc[3]) == (3, 0, 4, 4)
    assert tuple(by.loc[0]) == (3, 0, 0, 0)  # fully silent hour


def test_q224_media_evidence_dedup_planted(spark, tmp_path):
    """Doc 14's re-crawl shares its 2 image refs -> the one reported
    pair; doc 0's re-crawl shares only 1 ref (below MEDIA_MATCH_MIN)
    and docs 3/5 have no re-crawl — all excluded."""
    d = _write_docs(
        tmp_path,
        [(i, "text egal", "de", "s") for i in (0, 3, 5, 14)],
    )
    name = "q224_media_evidence_dedup"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert [tuple(r) for r in sdf.itertuples(index=False)] == [
        (14, 100014, 2)
    ]


def test_q225_hotlink_audit_hand_computed(spark, tmp_path):
    """Of the 7 image spans on docs 0..4, only (doc 0, i 0) satisfies
    the CDN residue rule -> 1 hotlink, 142857 ppm, one hotlinking
    doc; mixed-case source exercises the host lowering."""
    d = _write_docs(tmp_path, [(i, "x", "de", "Web") for i in range(5)])
    name = "q225_hotlink_audit"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    r = sdf.iloc[0]
    assert (r.n_images, r.n_hotlinked, r.hotlink_ppm,
            r.n_docs_hotlinking) == (7, 1, 142857, 1)


def test_q226_user_concentration_hand_computed(spark, tmp_path):
    """5 users, one bot with 96 of 104 events: k = max(5//100,1) = 1,
    top share = 96/104 -> 923076 ppm exactly."""
    rows = []
    eid = 0
    for u, n in ((1, 96), (2, 2), (3, 2), (4, 2), (5, 2)):
        for _ in range(n):
            rows.append((eid, "2024-01-01T00:00:00", u, "view", 0.0))
            eid += 1
    d = _write_events(tmp_path, rows)
    name = "q226_user_concentration"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert tuple(sdf.iloc[0]) == (5, 1, 96, 104, 923076)


def test_q227_ocr_artifact_density_planted(spark, tmp_path):
    """Doc 0 (damage cohort) gets 'schnell schon' -> two fch
    artifacts and ' und ' -> ' nnd '; the normalizer repairs it so
    clean != raw. Doc 1 is already clean ASCII with no rule hits ->
    untouched. One dirty of two -> 500000 ppm."""
    d = _write_docs(
        tmp_path,
        [(0, "schnell und schon da", "de", "s"),
         (1, "alles bestens hier", "de", "s")],
    )
    name = "q227_ocr_artifact_density"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    r = sdf.iloc[0]
    assert (r.n_docs, r.n_dirty_docs, r.n_fch_artifacts, r.dirty_ppm) \
        == (2, 1, 2, 500000)


def test_q228_posting_cap_regimes(spark, tmp_path):
    """(a) Below the cap nothing truncates: capped == full, overlap
    1e6, top-1 agrees. (b) The WAND failure mode, planted: 20
    single-term specialists per term out-rank a 3-term generalist in
    EVERY per-term posting list, so the generalist — the FULL
    ranking's #1 by summed score — scores 0 in the capped index and
    vanishes: overlap 900000, top-1 disagrees."""
    from german_ocr_spark.queries import PCAP_N

    name = "q228_posting_cap_audit"
    # (a) small corpus, cap inactive
    d = _write_docs(
        tmp_path / "a" if False else tmp_path,
        [(i, f"vector join customer filler{i}", "de", "s")
         for i in range(5)],
    )
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    assert tuple(sdf.iloc[0]) == (10, 5, 1000000, 1)

    # (b) specialists swamp every posting list
    import pathlib
    b = pathlib.Path(str(tmp_path)) / "b"
    b.mkdir()
    rows = []
    did = 0
    for term in ("vector", "join", "customer"):
        for _ in range(PCAP_N):
            rows.append((did, (term + " ") * 5 + "x y z w v", "de", "s"))
            did += 1
    rows.append((did, "vector join customer a b c d e f", "de", "s"))
    d2 = _write_docs(b, rows)
    sdf2 = QUERIES[name](spark, d2).toPandas()
    assert compare(sdf2, _oracle(d2, name)) is None
    r = sdf2.iloc[0]
    assert r.n_candidates == 3 * PCAP_N + 1
    assert r.overlap_ppm == 900000
    assert r.top1_match == 0


def test_q229_langid_confusion_hand_computed(spark, tmp_path):
    """Declared 'de': 2 correctly German, 1 English-content mislabel,
    1 stopword-free unknown -> row shares 500000/250000/250000;
    declared 'en' doc detected as en -> diagonal."""
    g = "der die das und ist hier"
    e = "the and is not with that"
    x = "qqq www rrr ttt"
    d = _write_docs(
        tmp_path,
        [(0, g, "de", "s"), (1, g, "de", "s"), (2, e, "de", "s"),
         (3, x, "de", "s"), (4, e, "en", "s")],
    )
    name = "q229_langid_confusion"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index(["declared", "predicted"])
    assert tuple(by.loc[("de", "de")]) == (2, 500000, 1)
    assert tuple(by.loc[("de", "en")]) == (1, 250000, 0)
    assert tuple(by.loc[("de", "unknown")]) == (1, 250000, 0)
    assert tuple(by.loc[("en", "en")]) == (1, 1000000, 1)


def test_q230_offset_rebase_hand_computed(spark, tmp_path):
    """Doc 0 (plant cohort): span 1's offset collides into span 0 ->
    one violation; rebase yields 0/5 and doc_len 21. Doc 1 is clean
    with doc_len 8+19+10 = 37. rebased_ok everywhere."""
    d = _write_docs(tmp_path, [(0, "x", "de", "s"), (1, "x", "de", "s")])
    name = "q230_offset_rebase"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("doc_id")
    assert tuple(by.loc[0]) == (2, 1, 21, 1)
    assert tuple(by.loc[1]) == (3, 0, 37, 1)


def test_q231_content_checksum_properties(spark, tmp_path):
    """Partitioning-invariance and sensitivity: identical content in
    a different row order gives identical fingerprints; one flipped
    character changes both combiners; a DOUBLED row leaves xor_fp
    unchanged (the documented XOR blind spot) but moves sum_fp."""
    import hashlib as _h

    rows = [(i, f"text nummer {i}", "de", "s") for i in range(6)]
    d1 = _write_docs(tmp_path / "a" if False else tmp_path, rows)
    name = "q231_content_checksum"
    r1 = QUERIES[name](spark, d1).toPandas()
    assert compare(r1, _oracle(d1, name)) is None

    def fp(rows):
        hs = [int(_h.md5(f"{i}:{t}".encode()).hexdigest()[:12], 16)
              for i, t, _, _ in rows]
        x = 0
        for h in hs:
            x ^= h
        return x, sum(hs) % 9007199254740881

    x, sm = fp(rows)
    assert int(r1.iloc[0].xor_fp) == x
    assert int(r1.iloc[0].sum_fp) == sm

    import pathlib
    b = pathlib.Path(str(tmp_path)) / "b"
    b.mkdir()
    d2 = _write_docs(b, list(reversed(rows)))  # same content, new order
    r2 = QUERIES[name](spark, d2).toPandas()
    assert int(r2.iloc[0].xor_fp) == x and int(r2.iloc[0].sum_fp) == sm

    c = pathlib.Path(str(tmp_path)) / "c"
    c.mkdir()
    # duplicate doc 5's (id, text) under a new row: xor of equal
    # hashes cancels pairwise only if BOTH id and text repeat — here
    # we re-add the same (5, text) content with id 5 twice is not
    # possible in one parquet; emulate via two rows with same id+text
    dup_rows = rows + [rows[-1]]
    d3 = _write_docs(c, dup_rows)
    r3 = QUERIES[name](spark, d3).toPandas()
    assert int(r3.iloc[0].xor_fp) != x or int(r3.iloc[0].sum_fp) != sm
    assert int(r3.iloc[0].sum_fp) != sm  # sum catches the doubled row


def test_q232_source_scorecard_gates(spark, tmp_path):
    """Source 'good' (long stopword-rich unique docs) passes all four
    gates; 'dupy' fails ONLY the dup gate (its docs are one repeated
    text: dup 500000 ppm > cap, TTR low too); 'pii' fails the PII
    gate (every doc has an email)."""
    good = [
        (i, "der die das und ist nicht ein mit von zu "
            + " ".join(f"wort{i}n{j}" for j in range(60)), "de", "good")
        for i in range(4)
    ]
    dupy = [(10 + i, "gleich gleich text", "de", "dupy") for i in range(4)]
    piis = [
        (20 + i, "der die das und ist kontakt "
            + " ".join(f"p{i}w{j}" for j in range(60))
            + f" mail{i}@firma.de", "de", "pii")
        for i in range(4)
    ]
    d = _write_docs(tmp_path, good + dupy + piis)
    name = "q232_source_scorecard"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    by = sdf.set_index("source")
    assert by.loc["good", "admitted"] == 1
    assert by.loc["dupy", "admitted"] == 0
    assert by.loc["dupy", "dup_ppm"] == 750000  # 4 copies -> 3 dropped
    assert by.loc["pii", "admitted"] == 0
    assert by.loc["pii", "pii_ppm"] == 1000000


def test_q236_boilerplate_rule_hand_computed(spark, tmp_path):
    """Every arm of the block rule against hand-computed expectations:
    doc 0 (id%3==0) keeps its article text PLUS the inline link node
    ('Mehr dazu hier' joined with ' ' — density 14/(len+14) < 1/3);
    doc 1 keeps the bare article (and the pipeline's German normalize
    runs on it: 'enthaelt' -> 'enthält'); doc 2's article is SHORTER
    than MIN_TEXT_LEN=30 so nothing survives (planted nav/short/
    link-farm/footer blocks must never appear in any output)."""
    long_a = "Der Vertrag regelt die Lieferung der Waren im Januar."
    long_b = "Die Rechnung enthaelt alle Positionen des Auftrags."
    d = _write_docs(
        tmp_path,
        [
            (0, long_a, "de", "web"),
            (1, long_b, "de", "web"),
            (2, "Zu kurz.", "de", "web"),
        ],
    )
    name = "q236_boilerplate_rule_audit"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = dict(zip(sdf.doc_id, sdf.main_text))
    assert got["0"] == long_a + " Mehr dazu hier"
    assert got["1"] == "Die Rechnung enthält alle Positionen des Auftrags."
    assert got["2"] == ""
    for leak in ("Kurz.", "Relevante", "Katalog", "Start", "Impressum",
                 "AGB", "Fußzeile"):
        assert not any(leak in t for t in got.values()), leak


def test_q178_waterfill_istar_zero_tie_banding(spark, tmp_path):
    """The istar=0 arm with a MAXIMAL tie group: 20 hosts x 5 docs,
    budget 50. S(5) = 5*20 = 100 > 50 so no staircase step fits:
    c = 50//20 = 2, leftover = 10, every host capped — the 10 bumps
    go to the lexicographically first hosts of the all-equal tie
    group, crossing the 2-char prefix-band boundary (h00..h09 in
    band 'h0', h10..h19 in 'h1'), which exercises the banded tie
    rank's cross-band offsets. sum(alloc) = B exactly."""
    rows, i = [], 0
    for s in range(20):
        for _ in range(5):
            rows.append((i, f"text {i} der", "de", f"h{s:02d}"))
            i += 1
    d = _write_docs(tmp_path, rows)
    name = "q178_host_waterfill"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {r.host: r for r in sdf.itertuples()}
    assert all(r.cap == 2 and r.capped for r in sdf.itertuples())
    for s in range(20):
        assert got[f"h{s:02d}.de"].alloc == (3 if s < 10 else 2)
    assert int(sdf.alloc.sum()) == 50


def test_q178_waterfill_minimal_budget(spark, tmp_path):
    """Degenerate minimum: counts (1, 1), total 2, B = 1.
    S(1) = 1*2 = 2 > 1 so no staircase step fits (istar=0, c=0,
    leftover=1) and the single budget unit goes to the
    lexicographically first host of the all-capped tie group. (The
    istar=m uncapped arm is unreachable under B = total//2 — it is
    defensive for future budget rules — so the reachable arms are
    istar=0, pinned here and by the banding test above, and
    0 < istar < m, pinned by the original hand-computed tests.)"""
    d = _write_docs(
        tmp_path,
        [(0, "text null der", "de", "aaa"), (1, "text eins der", "de", "bbb")],
    )
    name = "q178_host_waterfill"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {r.host: r for r in sdf.itertuples()}
    assert got["aaa.de"].alloc == 1 and got["bbb.de"].alloc == 0
    assert int(sdf.alloc.sum()) == 1


def test_q116_vocab_smaller_than_kmax(spark, tmp_path):
    """A corpus with fewer distinct types (3) than max(K)=31: the heap
    returns the whole vocabulary and every K >= vocab size reports
    n_types = 3 with coverage 1.0 — the rnk <= k join must not drop
    or duplicate rows when the ladder overshoots the relation."""
    d = _write_docs(
        tmp_path,
        [
            (0, "alpha beta alpha", "de", "web"),
            (1, "beta gamma beta beta", "de", "web"),
        ],
    )
    name = "q116_vocab_coverage"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = {int(r.k): r for r in sdf.itertuples()}
    # counts: beta=4, alpha=2, gamma=1 (7 tokens total)
    assert got[1].n_types == 1 and abs(got[1].coverage - 0.571428) < 1e-9
    assert got[2].n_types == 2 and abs(got[2].coverage - 0.857142) < 1e-9
    for k in (4, 8, 16, 31):
        assert got[k].n_types == 3 and got[k].coverage == 1.0


def test_q237_layout_rule_hand_computed(spark, tmp_path):
    """XY-cut ground truth on the planted two-column page: the wire is
    scrambled (R2, footer, L1, header, R1, L2) so only geometry can
    order the blocks; correct output is header, left column, right
    column, footer — with the 'Liefer-'/'ung' joint de-hyphenated to
    'Lieferung' by the normalize pass. The naive (y, x) sort would
    emit 'Liefer- R1TEXT ung am Montag R2TEXT' instead; its absence
    is asserted explicitly."""
    t = "Erste Spalte rechts oben steht hier fest"  # 40 chars exactly
    u = "und die zweite Haelfte folgt darunter ab"  # next 40
    d = _write_docs(tmp_path, [(0, t + u, "de", "web")])
    name = "q237_layout_rule_audit"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    got = sdf.main_text[0]
    assert got == (
        "Seite 1 Lieferung am Montag "
        "Erste Spalte rechts oben steht hier fest "
        "und die zweite Hälfte folgt darunter ab Fußzeile"
    )
    # the interleaved naive-sort order must NOT appear
    assert "Liefer- Erste" not in got and "Montag und die" not in got


def test_q236_q237_separator_injection(spark, tmp_path):
    """Corpus text containing the wire's record/field separators
    (\\x1e/\\x1f — plausible in raw OCR output) must not corrupt the
    planted node/block tables: both engines strip them identically
    before planting, so the audits still hash-match instead of
    reporting a phantom kernel bug."""
    t = "Ver\x1etrag regelt die Lie\x1fferung der Waren im Januar heute"
    d = _write_docs(tmp_path, [(0, t, "de", "web")])
    for name in ("q236_boilerplate_rule_audit", "q237_layout_rule_audit"):
        sdf = QUERIES[name](spark, d).toPandas()
        assert compare(sdf, _oracle(d, name)) is None, name
        # the separators themselves never reach the output
        assert not sdf.main_text.str.contains("\x1e|\x1f").any(), name


def test_q238_media_decode_hand_computed(spark, tmp_path):
    """The three decode kernels against hand-computed expectations on
    the smallest doc ids: doc 0 is a 3x2 FIMG whose six pixels are
    (31j mod 256) = 0,31,..,155 (mean 77.5, n_bytes 12+6); doc 1 a
    9000 Hz FAUD with 51 samples (duration 51000//9000 = 5 ms),
    RMS re-derived in plain Python; doc 2 a 3-frame
    4x4 FVID sampled at every_k=2 (frames 0 and 2 only), per-frame
    means re-derived from the global pixel index arithmetic."""
    d = _write_docs(
        tmp_path,
        [(0, "Bild", "de", "web"), (1, "Ton", "de", "web"),
         (2, "Film", "de", "web")],
    )
    name = "q238_media_decode_audit"
    sdf = QUERIES[name](spark, d).toPandas()
    assert compare(sdf, _oracle(d, name)) is None
    img = sdf[sdf.media_type == "image"].iloc[0]
    assert (img.width, img.height, img.n_bytes) == (3, 2, 18)
    assert img.mean_px == sum(31 * j % 256 for j in range(6)) / 6.0
    aud = sdf[sdf.media_type == "audio"].iloc[0]
    assert (aud.sample_rate, aud.duration_ms) == (9000, 5)
    exp_ss = sum((((j * 97 + 13) % 65536) - 32768) ** 2 for j in range(51))
    assert aud.rms == float(np.sqrt(exp_ss / 51))
    vid = sdf[sdf.media_type == "video"].sort_values("frame_idx")
    assert list(vid.frame_idx) == [0, 2]  # every_k=2 over nf=3 frames
    assert set(zip(vid.width, vid.height)) == {(4, 4)}
    assert list(vid.mean_px) == [
        sum((31 * i + 34) % 256 for i in range(16)) / 16.0,
        sum((31 * i + 34) % 256 for i in range(32, 48)) / 16.0,
    ]
