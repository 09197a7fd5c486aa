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


# ---------------------------------------------------------------------
# Stateful streaming sessionizer: batch-split invariance
# ---------------------------------------------------------------------

class _FakeGroupState:
    """Minimal stand-in for pyspark's GroupState exposing exactly the
    surface _sessionize_with_state uses."""

    def __init__(self) -> None:
        self._value = None
        self.hasTimedOut = False
        self.timeout_ms = None
        self.watermark_ms = 0

    @property
    def exists(self) -> bool:
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v) -> None:
        self._value = tuple(v)

    def remove(self) -> None:
        self._value = None

    def setTimeoutTimestamp(self, ms: int) -> None:
        assert ms > self.watermark_ms, "Spark rejects timeouts <= watermark"
        self.timeout_ms = ms

    def getCurrentWatermarkMs(self) -> int:
        return self.watermark_ms


def _drive_sessionizer(batches: list[list[int]], gap: int, wm_delay_s: int | None):
    """Feed the per-group stateful fn the given micro-batches, modelling
    Spark's watermark: after each batch the watermark advances to
    (max event time seen) - delay (None = watermark never advances until
    the final flush). Returns the emitted (start, end, n) rows sorted.

    Mirrors Spark's contract: a batch's events are never older than the
    watermark in force when the batch starts (enforced by assert)."""
    import pandas as pd

    from german_ocr_spark.streaming.incremental import _sessionize_with_state

    fn = _sessionize_with_state(gap)
    state = _FakeGroupState()
    out: list[tuple[int, int, int]] = []

    def feed(batch_epochs):
        pdf = pd.DataFrame({"ts": pd.to_datetime(batch_epochs, unit="s")})
        for res in fn((7,), iter([pdf] if len(batch_epochs) else []), state):
            for r in res.itertuples():
                out.append(
                    (
                        int(r.session_start.timestamp()),
                        int(r.session_end.timestamp()),
                        int(r.n_events),
                    )
                )

    max_seen = None
    for batch in batches:
        assert all(t * 1000 >= state.watermark_ms for t in batch)
        feed(batch)
        if batch:
            max_seen = max(max_seen or batch[0], *batch)
        if wm_delay_s is not None and max_seen is not None:
            state.watermark_ms = max(
                state.watermark_ms, (max_seen - wm_delay_s) * 1000
            )
    # final flush: watermark passes everything (end of stream)
    while state.exists:
        state.watermark_ms = max(state.watermark_ms + 1, 2**40)
        state.hasTimedOut = True
        feed([])
    return sorted(out)


def _sessions_reference(epochs: list[int], gap: int):
    if not epochs:
        return []
    ts = sorted(epochs)
    out = []
    start = last = ts[0]
    n = 1
    for t in ts[1:]:
        if t - last > gap:
            out.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    out.append((start, last, n))
    return out


def _split(events: list[int], cuts: list[int]) -> list[list[int]]:
    bounds = [0, *sorted(c for c in cuts if c <= len(events)), len(events)]
    return [events[a:b] for a, b in zip(bounds[:-1], bounds[1:])]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50_000), min_size=0, max_size=60),
    st.lists(st.integers(min_value=0, max_value=60), max_size=6),
    st.integers(min_value=1, max_value=3600),
    st.randoms(use_true_random=False),
)
def test_sessionizer_invariant_under_arbitrary_reordered_batches(
    epochs, cuts, gap, rnd
):
    """For ANY event set, ANY micro-batch slicing of an ARBITRARY
    permutation of the stream (events may arrive out of order across
    batches), and ANY gap: with the watermark held back (delay = ∞, so
    every arrival is admissible), the emitted sessions after the final
    flush equal a single-pass global sessionization. This is the exact
    contract Spark gives a stateful operator — events arrive in any
    order but never older than the watermark — so interval-merging
    state must reproduce batch q09 semantics under all of it."""
    shuffled = list(epochs)
    rnd.shuffle(shuffled)
    got = _drive_sessionizer(_split(shuffled, cuts), gap, wm_delay_s=None)
    assert got == sorted(_sessions_reference(epochs, gap))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50_000), min_size=0, max_size=60),
    st.lists(st.integers(min_value=0, max_value=60), max_size=6),
    st.integers(min_value=1, max_value=3600),
    st.integers(min_value=0, max_value=5000),
)
def test_sessionizer_invariant_under_moving_watermark(epochs, cuts, gap, delay):
    """Time-sorted consecutive batches with a REAL moving watermark
    (advances to max-seen − delay after each batch, closing sessions
    mid-stream via data batches and timeouts): the union of mid-stream
    and flush emissions still equals the global sessionization."""
    ordered = sorted(epochs)
    got = _drive_sessionizer(_split(ordered, cuts), gap, wm_delay_s=delay)
    assert got == sorted(_sessions_reference(epochs, gap))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50_000), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=3600),
)
def test_sessionizer_single_batch_equals_split_free_run(epochs, gap):
    """Within one micro-batch events may arrive in ANY order; the
    emitted sessions must match the reference regardless."""
    got = _drive_sessionizer([list(epochs)], gap, wm_delay_s=None)
    assert got == sorted(_sessions_reference(epochs, gap))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**12))
def test_q238_plant_decode_arithmetic_symmetry(k):
    """The q238 contract as a pure-kernel property over ARBITRARY doc
    ids (the hand-computed fixture pins k=0,1,2; the validator pins
    the corpus id range): planting the arithmetically-defined payload
    and decoding it through the real kernels must reproduce exactly
    the quantities q238's DuckDB oracle computes from the arithmetic
    — same single-division IEEE forms, so equality is exact, not
    approximate."""
    import numpy as np
    import pandas as pd

    from german_ocr_spark.operators.multimodal import (
        _audio_kernel,
        _frame_kernel,
        _image_meta_kernel,
        encode_fake_audio,
        encode_fake_image,
        encode_fake_video,
    )

    def one(kernel, buf):
        pdf = pd.DataFrame(
            {"doc_id": [str(k)], "media_ref": ["m"], "content": [buf]}
        )
        out = pd.concat(list(kernel(iter([pdf]))), ignore_index=True)
        assert out["error"].isna().all(), out["error"].tolist()
        return out

    if k % 3 == 0:
        w, h = 3 + k % 13, 2 + k % 7
        px = ((np.arange(w * h, dtype=np.int64) * 31 + 17 * k) % 256).astype(
            np.uint8
        )
        row = one(_image_meta_kernel, encode_fake_image(w, h, pixels=px)).iloc[0]
        assert (row.width, row.height, row.n_bytes) == (w, h, 12 + w * h)
        # oracle form: CAST(SUM(...) AS DOUBLE) / CAST(w*h AS DOUBLE)
        assert row.mean_px == float(int(px.sum(dtype=np.int64))) / float(w * h)
    elif k % 3 == 1:
        rate, n = 8000 + 1000 * (k % 5), 50 + k % 100
        s = (
            (np.arange(n, dtype=np.int64) * 97 + 13 * k) % 65536 - 32768
        ).astype(np.int16)
        row = one(_audio_kernel, encode_fake_audio(rate, n, samples=s)).iloc[0]
        assert (row.sample_rate, row.duration_ms) == (rate, (n * 1000) // rate)
        ss = int((s.astype(np.int64) ** 2).sum())
        assert row.rms == float(np.sqrt(float(ss) / float(n)))
    else:
        nf, w, h = 1 + k % 6, 2 + k % 5, 2 + k % 3
        px = (
            (np.arange(nf * w * h, dtype=np.int64) * 31 + 17 * k) % 256
        ).astype(np.uint8)
        out = one(_frame_kernel(2), encode_fake_video(nf, w, h, pixels=px))
        assert list(out["frame_idx"]) == list(range(0, nf, 2))
        for _, row in out.iterrows():
            f = int(row.frame_idx)
            seg = px[f * w * h : (f + 1) * w * h]
            assert (row.width, row.height) == (w, h)
            assert row.mean_px == float(int(seg.sum(dtype=np.int64))) / float(
                w * h
            )
