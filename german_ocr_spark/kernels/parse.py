"""Vectorized parsers for serialized node/block tables carried in span text.

An 'html' span's text is a serialized DOM-node table (FIXTURES F2); a
'pdf' span's text is a serialized layout-block table (F3). Both use a
flat record format — records separated by RS (``\\x1e``), fields by US
(``\\x1f``) — so payload text may contain newlines (the PDF kernel needs
``-\\n`` hyphenation to survive, SURVEY B6/B7 interplay).

Parsing is pure pandas: ``Series.str.split`` + ``explode`` +
``str.split(expand=True)`` — no per-row Python. Malformed records mark
the owning span with an error (reference per-row isolation semantics,
``german_ocr/ollama_backend.py:167-172``).
"""

from __future__ import annotations

import pandas as pd

RS = "\x1e"  # record separator
US = "\x1f"  # unit (field) separator

HTML_FIELDS = ["node_id", "tag", "block_id", "text"]
PDF_FIELDS = ["page", "x0", "y0", "x1", "y1", "text"]


def serialize_records(rows: list[list], n_text_fields: int = 1) -> str:
    """Inverse of the parsers; used by the synthesizer and tests."""
    return RS.join(US.join(str(v) for v in r) for r in rows)


def _explode_records(span_text: pd.Series) -> pd.DataFrame:
    """Series[str] (one serialized table per span) → long frame with
    columns (span_idx, record). span_idx indexes the input Series."""
    recs = span_text.fillna("").str.split(RS)
    long = recs.explode()
    out = pd.DataFrame({"span_idx": long.index, "record": long.to_numpy()})
    return out[out["record"].astype(str).str.len() > 0].reset_index(drop=True)


def parse_table(
    span_text: pd.Series, fields: list[str], numeric: dict[str, str]
) -> tuple[pd.DataFrame, pd.Series]:
    """Parse serialized tables for a batch of spans.

    Returns ``(rows, bad_span_idx)``: the long node/block frame with a
    ``span_idx`` column pointing back at the input Series index, and the
    distinct span indices that contained malformed records (those spans
    are excluded from ``rows`` entirely — error isolation is per-span).
    """
    long = _explode_records(span_text)
    if long.empty:
        empty = pd.DataFrame(columns=["span_idx", *fields])
        return empty, pd.Series([], dtype=span_text.index.dtype)

    parts = long["record"].str.split(US, n=len(fields) - 1, expand=True)
    if parts.shape[1] < len(fields):
        for i in range(parts.shape[1], len(fields)):
            parts[i] = None
    parts.columns = fields
    parts.insert(0, "span_idx", long["span_idx"].to_numpy())

    bad_mask = parts[fields[-1]].isna()
    for col, dtype in numeric.items():
        conv = pd.to_numeric(parts[col], errors="coerce")
        bad_mask |= conv.isna()
        parts[col] = conv
    bad_spans = parts.loc[bad_mask, "span_idx"].drop_duplicates()

    rows = parts[~parts["span_idx"].isin(set(bad_spans))].copy()
    for col, dtype in numeric.items():
        rows[col] = rows[col].astype(dtype)
    return rows.reset_index(drop=True), bad_spans.reset_index(drop=True)


def parse_html_nodes(span_text: pd.Series) -> tuple[pd.DataFrame, pd.Series]:
    return parse_table(
        span_text, HTML_FIELDS, {"node_id": "int64", "block_id": "int64"}
    )


def parse_pdf_blocks(span_text: pd.Series) -> tuple[pd.DataFrame, pd.Series]:
    return parse_table(
        span_text,
        PDF_FIELDS,
        {"page": "int64", "x0": "float64", "y0": "float64", "x1": "float64", "y1": "float64"},
    )
