"""Plan-shape regression pins: the queries whose scale story IS their
shuffle count must keep that count. PLANS.md documents the audited
shapes; these tests freeze the invariant ones so a refactor that
quietly introduces an Exchange (e.g. replacing an in-row computation
with a window or a groupBy) fails CI instead of surviving until the
next manual `.explain` audit. Only shuffle-count-stable queries are
pinned — join-strategy choices that legitimately vary with AQE/stats
(broadcast vs shuffled hash) are NOT asserted here."""

from __future__ import annotations

import re

from german_ocr_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# query -> exact number of Exchange nodes in the static physical plan
# (ReusedExchange excluded; counts from the PLANS.md audit)
PINNED = {
    # map-only: zero shuffles, the 100 TB hot-path property
    "q00_extract_pipeline": 0,
    "q28_simhash_signatures": 0,
    "q33_ivf_assign": 0,
    "q35_bpe_token_count": 0,
    "q36_winnow_fingerprint": 0,
    "q45_hash_sample": 0,
    "q47_repetition_metrics": 0,
    "q56_quality_classifier": 0,
    "q65_unpivot_metrics": 0,
    "q76_train_chunks": 0,
    "q89_zorder_key": 0,
    "q91_invoice_fields": 0,
    "q92_lm_quality": 0,
    "q93_url_canonical": 0,
    "q94_sentence_segment": 0,
    "q96_decompound": 0,
    "q109_nfc_normalize": 0,  # one Arrow stage, map-only
    # exactly one shuffle, by design
    "q17_exact_dedup": 1,  # the partial->final hash-agg fingerprint shuffle
    "q72_importance_sample": 1,
    "q74_sequence_packing": 1,  # the lane window sort
    "q84_heavy_hitters": 1,  # exact rescore of sketch-selected survivors
    "q95_tokenizer_fertility": 1,  # the languages-sized hash agg
    "q97_host_curation": 1,  # the hosts-sized hash agg
    "q87_systematic_sample": 1,  # the lane window prefix sum
    # two/three shuffles, by design (joins that legitimately flip
    # broadcast<->shuffled with stats — q110/q111 — are NOT pinned)
    "q107_dupspan_removal": 2,  # in-row-distinct df count + per-doc regroup
    "q108_language_mix": 3,  # lang agg + 1-row totals agg chain
    "q140_kanon_report": 2,  # cell agg + suppression re-agg (both dim-sized)
    "q145_blocklist_filter": 1,  # hosts-sized agg; blocklist is an isin literal
    "q149_filter_kappa": 1,  # two in-row verdicts, ONE single-row confusion agg
    "q120_pq_adc_topk": 1,  # per-query ADC ranking window (queries broadcast)
    "q121_bpe_pair_merge": 2,  # corpus wordcount + vocab-sized pair agg
    "q122_bm25_search": 1,  # the single-row stats agg (top-k is TakeOrdered)
    "q123_script_mix_audit": 1,  # sources-sized hash agg
    "q124_ivfpq_search": 1,  # per-query ADC window (probes broadcast)
    "q125_flesch_readability": 0,  # map-only codegen pass
    "q127_date_normalize": 0,  # map-only codegen pass
    "q138_c4_line_filter": 0,  # in-row construct/filter/reassemble
    "q141_vat_checksum": 0,  # map-only integer fold
    "q126_event_transitions": 3,  # user window + types^2 agg + totals window
    "q136_embedding_standardize": 2,  # dims-sized stats agg + audit agg
    # (the standardizing join itself is an explicit broadcast: 0)
    "q150_spearman_length_quality": 5,  # 2 histogram aggs + 2 histogram
    # windows + 1 per-lang sums agg (rank joins are explicit broadcasts)
    "q151_length_auc": 3,  # 1 histogram agg + its window + per-lang agg
    "q152_event_acf": 4,  # hourly agg + bounds agg + grid row_number
    # window + per-lag sums agg (lag self-join is an explicit broadcast)
    "q153_benford_audit": 4,  # digit agg + 1-row total agg + output sort
    # (everything after the first agg is 9-row relations)
    "q154_length_gini": 2,  # histogram agg + lang window; final lang agg
    # reuses the window's hash partitioning — no third exchange
    "q155_trailing_24h": 1,  # the single user_id RANGE-frame window
    "q156_assoc_rules": 4,  # ONE corpus collect_set shuffle; item/pair/
    # total aggs run on user- or types-sized relations (joins broadcast)
    "q157_scd2_intervals": 1,  # lag + island sum + collapse + lead all
    # reuse the single user_id partitioning
    "q158_curation_waterfall": 3,  # fingerprint keeper agg + its join-back
    # + the single-row waterfall agg (stage dim is a broadcast)
    "q159_grouping_sets": 1,  # one Expand feeding ONE hash agg — the
    # four grains share a single scan and shuffle
    "q160_percentile_rank": 2,  # histogram agg + its lang window; the
    # rank map joins back as an explicit broadcast
    # (q161 is a multi-join pipeline whose join strategies legitimately
    # flip with stats — not pinned, audited in PLANS.md)
    "q163_random_projection": 0,  # pure in-row integer folds + posexplode
    "q164_charmass_percentiles": 2,  # histogram agg + its lang window;
    # the quartile pick joins a broadcast 3-row dim
    # (q162's band join legitimately flips broadcast<->SMJ — not pinned)
    "q165_user_snapshot": 2,  # the user hash agg; count(distinct date)
    # adds the standard two-phase expand — still user-keyed
    "q166_zipf_audit": 1,  # token agg; global top-30 is TakeOrdered
    # (a heap, not a sort — asserted below)
    "q167_cross_lang_leak": 2,  # fp agg + the count(distinct lang) expand
    "q168_pareto_frontier": 2,  # histogram agg + the per-lang running-max
    # window over histogram rows — the corpus is never sorted
    # (q169's edge-relation joins legitimately flip broadcast<->SMJ with
    # stats — not pinned; the checkpointed-once edge staging is audited
    # in PLANS.md)
    "q170_session_window": 1,  # ONE user_id shuffle into the native
    # merging session-window agg — no window-function pass, no self-join
    "q172_pps_sample": 1,  # one source shuffle shared by both windows;
    # the ticket filter is in-row
    "q173_koelner_blocking": 2,  # vocab hash agg + code hash agg; the
    # phonetic fold runs on VOCAB rows only, pure codegen
    "q175_decay_activity": 2,  # user x hour hash agg + the user_id
    # window exchange; the final groupBy(user_id) reuses the window's
    # partitioning (no third shuffle)
    "q195_interleave_profile": 1,  # spans analyzed in-row; one 5-row
    # cohort agg
    "q196_caption_coverage": 1,  # in-row neighbor inspection; one
    # sources-sized agg
    "q197_watermark_audit": 2,  # (type, delay) histogram agg + the
    # event_type window over histogram cells
    "q199_rendezvous_rebalance": 2,  # in-row double argmax; 64-row
    # (before, after) grid agg + the 8-row report agg
    "q200_code_switching": 1,  # two langid passes in one codegen map;
    # one (lang, source) agg
    "q203_mad_outliers": 6,  # post-localCheckpoint count: the ONE
    # corpus histogram agg happens at checkpoint time; these six are
    # all histogram-sized (CDF windows, deviation agg, report agg)
    "q205_embedding_integrity": 1,  # in-row array predicates; one
    # label-sized agg
    "q206_address_extract": 0,  # map-only codegen regex pass
    "q208_ols_length_quality": 1,  # one sources-sized agg of five
    # DECIMAL sufficient sums; slope algebra on the sources relation
    "q209_quality_keeper": 1,  # the q17 fingerprint shuffle — packed
    # keys fold argmax + min-id into the same aggregate
}


def _static_exchanges(df) -> int:
    # \bExchange\b matches only the bare shuffle-Exchange node — the
    # word boundary already excludes ReusedExchange and
    # BroadcastExchange, so no subtraction (subtracting the Reused
    # count here would UNDERCOUNT plans that contain one)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def test_pinned_shuffle_counts(spark):
    got = {
        name: _static_exchanges(QUERIES[name](spark, SF_DIR))
        for name in PINNED
    }
    assert got == PINNED


def test_global_topk_is_heap_not_sort(spark):
    # q166's global top-30 and q116's top-max(K) vocab head must
    # compile to TakeOrderedAndProject (a per-partition heap + driver
    # merge), never a full Sort of the token-frequency relation.
    # q116 additionally must carry ZERO Window nodes (round-5
    # restatement: rank + cumsum over the <=31 surviving rows are a
    # triangular broadcast self-join, not a window).
    import re

    for name in ("q166_zipf_audit", "q116_vocab_coverage"):
        plan = (
            QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan, name
        if name == "q116_vocab_coverage":
            assert not re.search(r"\bWindow \[", plan)  # window-free


# ---------------------------------------------------------------------
# Unpartitioned (single-partition) Window census — round-3 VERDICT item.
# A Window with no partition spec moves ALL rows to one partition, so it
# is legal ONLY over a domain-bounded relation. Every nonzero count is
# pinned here with its boundedness justification; a regression that
# slips a corpus-sized relation under a global window changes a count
# (or adds a query to the census) and fails CI instead of surviving to
# a cluster. Counts from tools/plan_audit.py:count_global_windows.
GLOBAL_WINDOWS = {
    "q69_shard_assignment": 1,    # share denominator over the SHARD_N(=16)-row agg
    # q116 restated round 5: TakeOrdered heap + triangular self-join — 0 windows
    "q122_bm25_search": 1,        # rank column over the already-limited BM25_TOP_K rows
    "q129_lm_train_bigrams": 2,   # perplexity totals over the few-thousand-row bigram-head relation
    "q130_dsir_selection": 1,     # global totals over the bucket/source relation (q129's tiny-relation pattern)
    "q131_temperature_mix": 1,    # totals over the sources-sized relation
    "q132_curriculum_deciles": 2, # cumulative cuts + total over the ≤12001-row cost histogram
    "q137_rrf_hybrid": 3,         # two system rankings + fused rank, all over the candidate relation (≤candidate rows; production caps per term first)
    "q152_event_acf": 2,          # row_number + totals over the generated hourly grid (~10^5 rows/decade)
    "q166_zipf_audit": 1,         # rank over the TakeOrdered top-30 rows
    "q171_ks_drift": 1,           # global CDF over the (x) histogram grid (bounded value domain)
    # q178 restated round 5: banded histogram staircase + prefix-banded tie pick — 0 global windows
    "q183_wilson_source_rank": 1, # ranking over the sources-sized relation
    "q186_histogram_quantiles": 2,# cumulative cuts + quantile probe over the merged histogram
    "q207_rbo_rankings": 2,       # two rankings over the candidate relation
    "q213_funnel_latency": 2,     # percentile windows over the bounded minute histogram
    "q228_posting_cap_audit": 4,  # per-term impact ranks + both top-k picks over the 3-term candidate relation (index-build work)
}


def test_pinned_global_window_counts(spark):
    from tools.plan_audit import count_global_windows

    got = {
        name: count_global_windows(
            QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for name in GLOBAL_WINDOWS
    }
    assert got == GLOBAL_WINDOWS


def test_global_window_census_membership():
    """Queries NOT pinned above must show zero global windows in the
    committed census (PLAN_AUDIT.json is regenerated per milestone via
    tools/plan_audit.py) — so ADDING an unpartitioned window anywhere
    in the registry requires adding a justified pin here."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "PLAN_AUDIT.json")
    census = json.load(open(path))
    assert set(census["global_window_queries"]) == set(GLOBAL_WINDOWS)
