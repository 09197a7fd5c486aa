"""A19 typed error taxonomy: every failure row carries a code from the
closed ERROR_CODES domain (reference exception ladder,
german_ocr/cloud_client.py:34-65, tests/test_cloud_client.py:177-208)."""

from __future__ import annotations

import pandas as pd

from german_ocr_spark.operators.extract import ERROR_CODES, extract_pandas
from german_ocr_spark.operators.multimodal import encode_fake_image


def test_extract_kernel_codes():
    pdf = pd.DataFrame(
        {
            "doc_id": ["d1", "d2", "d3", "d4"],
            "order": [0, 0, 0, 0],
            "kind": ["html", "pdf", "n8n", "text"],
            "text": ["plain not a node table", "plain not blocks", "x", "ok"],
            "media_ref": ["", "", "", ""],
        }
    )
    out = extract_pandas(pdf)
    codes = dict(zip(out["doc_id"], out["error_code"]))
    assert codes == {
        "d1": "PARSE_HTML",
        "d2": "PARSE_PDF",
        "d3": "UNKNOWN_KIND",
        "d4": None,
    }
    assert set(c for c in out["error_code"] if c is not None) <= set(ERROR_CODES)
    # error message and code are set/null together
    assert ((out["error"].isna()) == (out["error_code"].isna())).all()


def test_multimodal_codes(spark):
    rows = [
        ("m1", "ref1", bytes(encode_fake_image(4, 4, seed=1))),  # ok
        ("m2", "ref2", b"\x89PNG....real"),  # stubbed codec
        ("m3", "ref3", b"garbage"),  # undecodable
    ]
    from german_ocr_spark.operators.multimodal import image_meta

    media = spark.createDataFrame(
        rows, "doc_id string, media_ref string, content binary"
    )
    got = {r.doc_id: r.error_code for r in image_meta(media).collect()}
    assert got == {"m1": None, "m2": "UNSUPPORTED_FORMAT", "m3": "DECODE"}
