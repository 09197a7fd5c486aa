"""Guard: the committed golden parquets must stay in sync with the
pure-pandas kernels. If a kernel or the synthesizer changes, this fails
before the driver's hash gate does — fix by rerunning
``python tools/make_golden.py``."""

from __future__ import annotations

import importlib.util
import os

import pandas as pd
import pytest

_spec = importlib.util.spec_from_file_location(
    "german_ocr_make_golden",
    os.path.join(
        os.path.dirname(__file__), "..", "tools", "make_golden.py"
    ),
)
make_golden = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(make_golden)


@pytest.mark.parametrize(
    "name,builder",
    [
        ("q32_spans.parquet", "q32_golden"),
        ("q38_summary.parquet", "q38_golden"),
        ("q30_summary.parquet", "q30_golden"),
        ("q110_pairs.parquet", "q110_golden"),
        ("q234_blocks.parquet", "q234_golden"),
    ],
)
def test_committed_golden_matches_kernels(name, builder):
    want = getattr(make_golden, builder)()
    got = pd.read_parquet(os.path.join(make_golden.GOLDEN_DIR, name))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
