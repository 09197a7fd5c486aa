"""Guard: the committed q32 golden parquet must stay in sync with the
pure-pandas kernels. If a kernel or the synthesizer changes, this fails
before the driver's hash gate does — fix by rerunning
``python tools/make_golden.py``."""

from __future__ import annotations

import os

import pandas as pd

from german_ocr_spark.golden import golden_extract
from german_ocr_spark.synth import synth_docs

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
    "q32_spans.parquet",
)


def test_committed_golden_matches_kernels():
    want = golden_extract(synth_docs(400, seed=42))
    want = want[want["kind"].isin(["html", "pdf"])].reset_index(drop=True)
    got = pd.read_parquet(GOLDEN)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
