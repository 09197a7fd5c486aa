"""Regenerate the committed golden parquet that backs q32's oracle.

The golden is the SINGLE-NODE oracle: the same pure pandas kernels the
Spark pipeline dispatches to, run through golden_extract (plain-pandas
explode/order/reassemble, none of the Spark plumbing) over the
deterministic synthetic corpus. The driver's q32 value check then
verifies that the distributed execution — Arrow batching, salted
repartition, shuffle-free ordering — reproduces this byte-for-byte.

Run after changing any extraction kernel or the synthesizer:

    python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from german_ocr_spark.golden import golden_extract  # noqa: E402
from german_ocr_spark.synth import synth_docs  # noqa: E402

Q32_N_DOCS = 400
Q32_SEED = 42
GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)


def main() -> None:
    docs = synth_docs(Q32_N_DOCS, seed=Q32_SEED)
    pdf = golden_extract(docs)
    pdf = pdf[pdf["kind"].isin(["html", "pdf"])].reset_index(drop=True)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    out = os.path.join(GOLDEN_DIR, "q32_spans.parquet")
    pdf.to_parquet(out, index=False, compression="zstd")
    print(f"wrote {len(pdf)} golden span rows to {out}")


if __name__ == "__main__":
    main()
