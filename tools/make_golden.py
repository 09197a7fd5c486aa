"""Regenerate the committed golden parquets backing the q30/q32/q38
oracles.

The goldens are SINGLE-NODE oracles: the same pure pandas/numpy kernels
the Spark pipeline dispatches to, run with none of the Spark plumbing
(golden_extract's plain-pandas explode/order path; the multimodal
kernel iterators fed one plain batch). The driver's value checks then
verify that the distributed executions — Arrow batching, salted
repartition, shuffle-free ordering, streaming exactly-once — reproduce
these byte-for-byte.

Run after changing any kernel or the synthesizer:

    python tools/make_golden.py

(tests/test_golden_file.py fails if the committed files drift.)
"""

from __future__ import annotations

import hashlib
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from german_ocr_spark.golden import golden_extract  # noqa: E402
from german_ocr_spark.synth import synth_docs, synth_media  # noqa: E402

Q32_N_DOCS = 400
Q32_SEED = 42
Q38_N_DOCS = 300
Q38_SEED = 11
Q30_N_MEDIA = 120
Q30_SEED = 42
Q110_N_IMAGES = 90
Q110_SEED = 7
GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)


def q32_golden() -> pd.DataFrame:
    pdf = golden_extract(synth_docs(Q32_N_DOCS, seed=Q32_SEED))
    return pdf[pdf["kind"].isin(["html", "pdf"])].reset_index(drop=True)


def q38_golden() -> pd.DataFrame:
    """Per-kind summary of the q38 streaming corpus, with the same md5
    content hash the Spark query computes (sorted doc_id|order|text
    lines joined by US)."""
    pdf = golden_extract(synth_docs(Q38_N_DOCS, seed=Q38_SEED))
    rows = []
    for kind, g in pdf.groupby("kind", sort=True):
        lines = sorted(
            f"{d}|{o}|{t}"
            for d, o, t in zip(g["doc_id"], g["order"], g["text"])
        )
        rows.append(
            {
                "kind": kind,
                "n_spans": len(g),
                "total_chars": int(g["text"].str.len().sum()),
                "error_rows": int(g["error"].notna().sum()),
                "content_hash": hashlib.md5(
                    "\x1f".join(lines).encode("utf-8")
                ).hexdigest(),
            }
        )
    return pd.DataFrame(rows)


def q30_golden() -> pd.DataFrame:
    """Per-media_type summary via the SAME kernel iterators the Spark
    mapInPandas stages run, fed one plain pandas batch each."""
    from german_ocr_spark.operators import multimodal as mm

    media = pd.DataFrame(
        synth_media(Q30_N_MEDIA, seed=Q30_SEED),
        columns=["doc_id", "media_ref", "media_type", "content"],
    )

    def agg(media_type: str, out: pd.DataFrame, units) -> dict:
        ok = out["error"].isna()
        return {
            "media_type": media_type,
            "n_rows": len(out),
            "error_rows": int((~ok).sum()),
            "total_units": int(units(out[ok])),
        }

    img = next(
        mm._image_meta_kernel(
            iter([media[media["media_type"] == "image"].reset_index(drop=True)])
        )
    )
    aud = next(
        mm._audio_kernel(
            iter([media[media["media_type"] == "audio"].reset_index(drop=True)])
        )
    )
    vid = next(
        mm._frame_kernel(5)(
            iter([media[media["media_type"] == "video"].reset_index(drop=True)])
        )
    )
    return pd.DataFrame(
        [
            agg("audio", aud, lambda g: g["duration_ms"].sum()),
            agg("image", img, lambda g: (g["width"] * g["height"]).sum()),
            agg("video", vid, lambda g: len(g)),
        ]
    )


def q110_golden() -> pd.DataFrame:
    """Banded-aHash near-dup pairs over the planted image corpus via
    the SAME resize kernel + the same signature/band/hamming math the
    Spark query runs, all single-node numpy."""
    import itertools

    import numpy as np

    from german_ocr_spark.operators.multimodal import (
        AHASH_BAND_BITS,
        AHASH_BANDS,
        AHASH_GRID,
        AHASH_HAM_MAX,
        _resize_kernel,
    )
    from german_ocr_spark.synth import synth_image_corpus

    media = pd.DataFrame(
        synth_image_corpus(Q110_N_IMAGES, seed=Q110_SEED),
        columns=["doc_id", "media_ref", "media_type", "content"],
    )
    out = next(_resize_kernel(AHASH_GRID, AHASH_GRID)(iter([media])))

    def ahash(grid) -> int:
        g = [float(v) for v in grid]
        # sequential left fold, NOT np.sum: numpy's pairwise summation
        # is bit-different from Spark's aggregate() fold in the last
        # ulp, and the v > m threshold must see the IDENTICAL mean
        acc = 0.0
        for v in g:
            acc += v
        m = acc / len(g)
        return sum((1 << i) for i, v in enumerate(g) if v > m)

    sig = {
        r.doc_id: ahash(r.grid)
        for r in out.itertuples()
        # same domain as image_ahash: decode errors and NaN grids
        # (tiny thumbnails) carry NULL signatures
        if r.error is None and not np.isnan(np.asarray(r.grid)).any()
    }
    mask = (1 << AHASH_BAND_BITS) - 1
    buckets: dict[tuple[int, int], list[str]] = {}
    for d, s in sig.items():
        for b in range(AHASH_BANDS):
            buckets.setdefault(
                (b, (s >> (b * AHASH_BAND_BITS)) & mask), []
            ).append(d)
    cands = set()
    for docs in buckets.values():
        for a, b in itertools.combinations(sorted(docs), 2):
            cands.add((a, b))
    rows = [
        {"doc_a": a, "doc_b": b, "hamming": bin(sig[a] ^ sig[b]).count("1")}
        for a, b in sorted(cands)
        if bin(sig[a] ^ sig[b]).count("1") <= AHASH_HAM_MAX
    ]
    pdf = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
    pdf["hamming"] = pdf["hamming"].astype("int64")
    return pdf


def q234_golden() -> pd.DataFrame:
    """Per-block bounding boxes (v2 document-intelligence template) over
    the q32 corpus via the SAME parse + XY-cut kernels, single-node."""
    from german_ocr_spark.operators.docintel import golden_docintel

    return golden_docintel(synth_docs(Q32_N_DOCS, seed=Q32_SEED))


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, pdf in (
        ("q32_spans.parquet", q32_golden()),
        ("q38_summary.parquet", q38_golden()),
        ("q30_summary.parquet", q30_golden()),
        ("q110_pairs.parquet", q110_golden()),
        ("q234_blocks.parquet", q234_golden()),
    ):
        out = os.path.join(GOLDEN_DIR, name)
        pdf.to_parquet(out, index=False, compression="zstd")
        print(f"wrote {len(pdf)} golden rows to {out}")


if __name__ == "__main__":
    main()
