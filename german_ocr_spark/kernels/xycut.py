"""PDF layout parsing (SURVEY B6): recursive XY-cut block segmentation
with (page, y, x) reading-order fallback.

Generalizes the reference's per-page PDF handling (page progress at
``german_ocr/cloud_client.py:100-102``) into a deterministic layout
sort: within each page, blocks are recursively split at horizontal
whitespace gaps (top→bottom), then vertical gaps (left→right) — the
classic XY-cut — which orders two-column layouts correctly where a
naive (y, x) sort interleaves the columns.

The recursion is per *page group* (bounded depth, numpy interval
arithmetic), not per row; block-level work stays vectorized. Ties are
broken by integer block index → bitwise-stable output across partition
counts (BASELINE.json determinism requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MAX_DEPTH = 16
MIN_GAP = 1.0  # minimum whitespace gap (page units) to cut at


def _widest_gap(lo: np.ndarray, hi: np.ndarray) -> tuple[float, float]:
    """(width, midpoint) of the widest uncovered interval between merged
    [lo, hi) spans; (0, nan) if none."""
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    best_w, best_mid = 0.0, float("nan")
    cur_hi = hi[0]
    for i in range(1, len(lo)):
        w = float(lo[i] - cur_hi)
        if w >= MIN_GAP and w > best_w:
            best_w, best_mid = w, float((cur_hi + lo[i]) / 2.0)
        cur_hi = max(cur_hi, hi[i])
    return best_w, best_mid


def _xycut(idx: np.ndarray, x0, y0, x1, y1, depth: int) -> list[int]:
    if len(idx) <= 1 or depth >= MAX_DEPTH:
        # fallback order: (y0, x0, original index) — deterministic
        order = np.lexsort((idx, x0[idx], y0[idx]))
        return [int(i) for i in idx[order]]
    # Cut at the WIDEST whitespace gap in either direction (ties →
    # horizontal, i.e. top-to-bottom wins). A two-column body has a wide
    # vertical inter-column gap that must beat narrow horizontal
    # inter-paragraph gaps, else columns interleave.
    yw, ycut = _widest_gap(y0[idx], y1[idx])
    xw, xcut = _widest_gap(x0[idx], x1[idx])
    if yw >= xw and yw > 0:
        top = idx[y0[idx] < ycut]
        bot = idx[y0[idx] >= ycut]
        if len(top) and len(bot):
            return _xycut(top, x0, y0, x1, y1, depth + 1) + _xycut(
                bot, x0, y0, x1, y1, depth + 1
            )
    if xw > 0:
        left = idx[x0[idx] < xcut]
        right = idx[x0[idx] >= xcut]
        if len(left) and len(right):
            return _xycut(left, x0, y0, x1, y1, depth + 1) + _xycut(
                right, x0, y0, x1, y1, depth + 1
            )
    order = np.lexsort((idx, x0[idx], y0[idx]))
    return [int(i) for i in idx[order]]


def reading_order(blocks: pd.DataFrame) -> pd.DataFrame:
    """Block frame (span_idx, page, x0, y0, x1, y1, text) → same frame
    with an ``rank`` column: 0-based reading order within span
    (pages in ascending order; XY-cut within page).

    Implementation is one global lexsort + numpy group slicing. Pages
    whose blocks are vertically disjoint (the overwhelmingly common
    single-column case) take a pure-array fast path that is provably
    identical to the XY-cut result: with disjoint y-intervals every
    horizontal cut preserves y-order and the terminal fallback is the
    same (y0, x0, idx) lexsort, so the sorted order IS the cut order.
    Only genuinely overlapping layouts (multi-column) recurse."""
    if blocks.empty:
        out = blocks.copy()
        out["rank"] = pd.Series([], dtype="int64")
        return out
    df = blocks.reset_index(drop=True)
    x0 = df["x0"].to_numpy(float)
    y0 = df["y0"].to_numpy(float)
    x1 = df["x1"].to_numpy(float)
    y1 = df["y1"].to_numpy(float)
    span = df["span_idx"].to_numpy()
    page = df["page"].to_numpy()
    n = len(df)

    idx0 = np.arange(n)
    order0 = np.lexsort((idx0, x0, y0, page, span))
    s_span, s_page = span[order0], page[order0]
    s_y0, s_y1 = y0[order0], y1[order0]
    change = (
        np.flatnonzero((s_span[1:] != s_span[:-1]) | (s_page[1:] != s_page[:-1]))
        + 1
    )
    bounds = np.concatenate(([0], change, [n]))

    out_positions = np.empty(n, dtype=np.int64)
    pos = 0
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        m = b1 - b0
        seg = order0[b0:b1]
        if m > 1:
            gy0, gy1 = s_y0[b0:b1], s_y1[b0:b1]
            if not np.all(gy0[1:] >= np.maximum.accumulate(gy1)[:-1]):
                seg = np.asarray(_xycut(seg, x0, y0, x1, y1, 0), dtype=np.int64)
        out_positions[pos : pos + m] = seg
        pos += m

    # per-span 0-based rank over the global (span, page, in-page) order
    ospan = span[out_positions]
    starts = np.flatnonzero(np.r_[True, ospan[1:] != ospan[:-1]])
    counts = np.diff(np.r_[starts, n])
    within = np.arange(n) - np.repeat(starts, counts)
    out = df.take(out_positions)
    out["rank"] = within
    return out


def extract_pdf_text(blocks: pd.DataFrame) -> pd.Series:
    """Block frame → Series indexed by span_idx: block texts joined by
    '\\n' in reading order (hyphenation '-\\n' joints survive for the
    German de-hyphenation pass, SURVEY B7)."""
    if blocks.empty:
        return pd.Series([], dtype=object)
    ordered = reading_order(blocks)
    ordered["text"] = ordered["text"].fillna("")
    return ordered.groupby("span_idx", sort=True)["text"].agg("\n".join)
