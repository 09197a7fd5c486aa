"""Deterministic synthetic corpus generator (FIXTURES.md F1-F4).

Seed-fixed, no wall-clock, no unseeded randomness: the same (n_docs,
seed) always produces byte-identical corpora on any machine — the
foundation of the bitwise-reproducibility tests. Content exercises every
kernel: Fraktur/umlaut/hyphenation corruptions (B7), boilerplate vs
article DOM blocks (B5), 1- and 2-column PDF layouts (B6), media spans,
and the edge rows FIXTURES F1 mandates (empty span arrays, empty text,
malformed tables, unsorted offsets).

Skew: every ``heavy_every``-th doc is a 'multi-page PDF' with
``heavy_spans`` spans — the skew the salted repartition (B14) exists for.
"""

from __future__ import annotations

import random

from .kernels.parse import RS, US

_WORDS = (
    "Versicherung Rechnung Betrag Kunde Straße München Händler Bäume "
    "Äpfel über schön Zahlung Datum Nummer Firma Quelle Deutschland "
    "Österreich Gebühren Vertrag Unterlagen Prüfung Anschrift Lieferung"
).split()
_FILLER = "der die das und ist nicht ein mit von zu auf für im den".split()
_UMLAUT_DIGRAPH = {"ä": "ae", "ö": "oe", "ü": "ue", "Ä": "Ae", "Ö": "Oe", "Ü": "Ue"}


def _sentence(rng: random.Random) -> str:
    n = rng.randint(5, 12)
    words = [rng.choice(_WORDS if rng.random() < 0.4 else _FILLER) for _ in range(n)]
    return " ".join(words) + "."


def _corrupt(s: str, rng: random.Random) -> str:
    """Apply seeded OCR-style corruptions (the inputs B7 repairs)."""
    out = []
    for ch in s:
        r = rng.random()
        if ch == "s" and r < 0.15:
            out.append("ſ")
        elif ch in _UMLAUT_DIGRAPH and r < 0.4:
            out.append(_UMLAUT_DIGRAPH[ch])
        else:
            out.append(ch)
    s = "".join(out)
    if rng.random() < 0.3:
        s = s.replace("sch", "fch", 1)
    if rng.random() < 0.2:
        s = s.replace(" und ", " nnd ", 1)
    # line-break hyphenation inside a long word
    if rng.random() < 0.4:
        toks = s.split(" ")
        longs = [i for i, t in enumerate(toks) if len(t) >= 8 and t.isalpha()]
        if longs:
            i = rng.choice(longs)
            t = toks[i]
            cut = rng.randint(3, len(t) - 3)
            toks[i] = t[:cut] + "-\n" + t[cut:].lower()
            s = " ".join(toks)
    return s


def _ocr_span_text(rng: random.Random) -> str:
    return "\n".join(_corrupt(_sentence(rng), rng) for _ in range(rng.randint(2, 6)))


def _text_span_text(rng: random.Random) -> str:
    return "  ".join(_sentence(rng) for _ in range(rng.randint(1, 4)))


def _html_span_text(rng: random.Random, malformed: bool = False) -> str:
    """Serialized DOM-node table: article <p> blocks interleaved with
    link-dense nav/footer boilerplate (FIXTURES F2)."""
    records: list[str] = []
    node_id = 0

    def add(tag: str, block_id: int, text: str):
        nonlocal node_id
        records.append(US.join([str(node_id), tag, str(block_id), text]))
        node_id += 1

    block_id = 0
    add("nav", block_id, "")
    for _ in range(rng.randint(2, 5)):
        add("a", block_id, rng.choice(["Start", "Impressum", "Kontakt", "Hilfe"]))
    block_id += 1
    for _ in range(rng.randint(1, 4)):
        add("p", block_id, " ".join(_sentence(rng) for _ in range(rng.randint(2, 4))))
        if rng.random() < 0.3:
            add("a", block_id, rng.choice(_WORDS))
        block_id += 1
    add("footer", block_id, "")
    add("a", block_id, "Datenschutz")
    add("a", block_id, "AGB")
    if malformed:
        records.append("999")  # too few fields → span-level error
    return RS.join(records)


def _pdf_span_text(rng: random.Random, two_col: bool | None = None) -> str:
    """Serialized layout-block table (FIXTURES F3): header/footer plus a
    1- or 2-column body; some block texts end hyphenated."""
    if two_col is None:
        two_col = rng.random() < 0.5
    records: list[str] = []
    page = 1

    def add(x0, y0, x1, y1, text):
        records.append(
            US.join([str(page), f"{x0:.1f}", f"{y0:.1f}", f"{x1:.1f}", f"{y1:.1f}", text])
        )

    add(50.0, 20.0, 550.0, 35.0, "Seite 1")  # header
    if two_col:
        y = 60.0
        for _ in range(rng.randint(2, 4)):
            t = _corrupt(_sentence(rng), rng)
            add(50.0, y, 290.0, y + 40.0, t)
            y += 50.0
        y = 60.0
        for _ in range(rng.randint(2, 4)):
            t = _corrupt(_sentence(rng), rng)
            add(310.0, y, 550.0, y + 40.0, t)
            y += 50.0
    else:
        y = 60.0
        for _ in range(rng.randint(3, 6)):
            t = _corrupt(_sentence(rng), rng)
            if rng.random() < 0.3 and " " in t:
                t = t.rstrip(".") + "-"  # hyphenated continuation across blocks
            add(50.0, y, 550.0, y + 30.0, t)
            y += 40.0
    add(50.0, 780.0, 550.0, 795.0, "Fußzeile")
    return RS.join(records)


def _heavy_pdf_spans(rng: random.Random, n_spans: int, doc_id: str) -> list[tuple]:
    spans = []
    for j in range(n_spans):
        spans.append(("pdf", _pdf_span_text(rng, two_col=(j % 3 == 0)), "", j * 10))
    return spans


def _one_doc(
    i: int,
    seed: int,
    heavy_every: int,
    heavy_spans: tuple[int, int],
    edge_cases: bool,
) -> tuple[str, list[tuple[str, str, str, int]]]:
    """One document's spans, a pure function of (i, seed, params) — the
    property that makes distributed generation deterministic regardless
    of partitioning."""
    rng = random.Random(seed * 1_000_003 + i)
    doc_id = f"doc-{i:08d}"
    if edge_cases and i == 1:
        return (doc_id, [])  # empty spans array
    if edge_cases and i == 2:
        return (doc_id, [("text", "", "", 0), ("ocr", "Verſicherung", "", 10)])
    if edge_cases and i == 3:
        return (doc_id, [("html", _html_span_text(rng, malformed=True), "", 0)])
    if edge_cases and i == 4:  # unsorted offsets — pipeline must re-sort
        return (
            doc_id,
            [
                ("text", "zweiter Teil", "", 20),
                ("ocr", "erſter Teil", "", 0),
                ("text", "dritter Teil", "", 40),
            ],
        )
    if heavy_every and i % heavy_every == 0 and i > 0:
        n = rng.randint(*heavy_spans)
        return (doc_id, _heavy_pdf_spans(rng, n, doc_id))

    spans: list[tuple[str, str, str, int]] = []
    n_spans = rng.randint(2, 8)
    offset = 0
    for j in range(n_spans):
        kind = rng.choice(["text", "ocr", "html", "pdf", "image"])
        if kind == "text":
            spans.append((kind, _text_span_text(rng), "", offset))
        elif kind == "ocr":
            spans.append((kind, _ocr_span_text(rng), "", offset))
        elif kind == "html":
            spans.append((kind, _html_span_text(rng), "", offset))
        elif kind == "pdf":
            spans.append((kind, _pdf_span_text(rng), "", offset))
        else:
            spans.append((kind, "", f"ref://{doc_id}/{j}", offset))
        offset += 10
    return (doc_id, spans)


def synth_docs(
    n_docs: int,
    seed: int = 42,
    heavy_every: int = 100,
    heavy_spans: tuple[int, int] = (60, 200),
    edge_cases: bool = True,
) -> list[tuple[str, list[tuple[str, str, str, int]]]]:
    """Returns [(doc_id, [(kind, text, media_ref, offset), ...]), ...].

    Span tuple order matches schema.SPAN_STRUCT.
    """
    return [
        _one_doc(i, seed, heavy_every, heavy_spans, edge_cases)
        for i in range(n_docs)
    ]


def synth_docs_distributed(
    spark,
    n_docs: int,
    seed: int = 42,
    heavy_every: int = 100,
    heavy_spans: tuple[int, int] = (60, 200),
    edge_cases: bool = True,
    n_partitions: int | None = None,
):
    """Executor-side corpus generation: ``spark.range(n_docs)`` →
    mapInPandas building each doc from its id. Byte-identical to
    ``synth_docs`` (same per-doc seeded rng, independent of which
    partition a doc id lands in) but the generation cost is distributed —
    the driver loop would be the bottleneck at any real corpus size."""
    from .schema import DOCUMENTS_SPANS_SCHEMA

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            recs = [
                _one_doc(int(i), seed, heavy_every, heavy_spans, edge_cases)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": [d for d, _ in recs],
                    "spans": [
                        [
                            {"kind": k, "text": t, "media_ref": m, "offset": o}
                            for (k, t, m, o) in spans
                        ]
                        for _, spans in recs
                    ],
                }
            )

    if n_partitions is None:
        n_partitions = max(int(spark.sparkContext.defaultParallelism) * 2, 2)
    rng_df = spark.range(0, n_docs).repartition(n_partitions)
    return rng_df.mapInPandas(gen, schema=DOCUMENTS_SPANS_SCHEMA)


def docs_to_spark(spark, docs):
    from .schema import DOCUMENTS_SPANS_SCHEMA

    return spark.createDataFrame(docs, schema=DOCUMENTS_SPANS_SCHEMA)


def synth_media(n_rows: int, seed: int = 42, edge_cases: bool = True):
    """Deterministic multimodal fixture rows [(doc_id, media_ref,
    media_type, content)] cycling through the fake image/audio/video
    codecs (operators.multimodal), plus stub-boundary edge rows: a real
    PNG magic (must raise the documented NotImplementedError into the
    error column) and a truncated payload."""
    from .operators.multimodal import (
        encode_fake_audio,
        encode_fake_image,
        encode_fake_video,
    )

    rows = []
    for i in range(n_rows):
        rng = random.Random(seed * 7_000_003 + i)
        doc_id = f"doc-{i:08d}"
        ref = f"ref://{doc_id}/m"
        if edge_cases and i == 1:
            rows.append((doc_id, ref, "image", b"\x89PNG\r\n\x1a\nrest"))
            continue
        if edge_cases and i == 2:
            rows.append((doc_id, ref, "image", b"FIMG\x05"))  # truncated
            continue
        kind = i % 3
        if kind == 0:
            w, h = rng.randint(8, 64), rng.randint(8, 64)
            rows.append((doc_id, ref, "image", encode_fake_image(w, h, seed + i)))
        elif kind == 1:
            rows.append(
                (doc_id, ref, "audio",
                 encode_fake_audio(16000, rng.randint(100, 5000), seed + i))
            )
        else:
            rows.append(
                (doc_id, ref, "video",
                 encode_fake_video(rng.randint(3, 30), 16, 16, seed + i))
            )
    return rows


def media_to_spark(spark, media):
    from .schema import MEDIA_SCHEMA

    return spark.createDataFrame(media, schema=MEDIA_SCHEMA)


def synth_image_corpus(n_base: int, seed: int = 7, variant_every: int = 4):
    """Deterministic image-only fixture with PLANTED NEAR-DUPLICATES:
    every ``variant_every``-th base image gets a companion row with a
    mild brightness bump (+10 clamped) over a contiguous ~6% pixel run
    — the re-encoded/re-crawled-asset case a perceptual hash must
    catch (measured aHash hamming 0–3 across the planted pairs). One
    truncated payload exercises per-row error isolation. Rows:
    [(doc_id, media_ref, media_type, content)]."""
    import struct as _struct

    from .operators.multimodal import MAGIC_IMG, encode_fake_image

    rows = []
    for i in range(n_base):
        rng = random.Random(seed * 9_000_011 + i)
        doc_id = f"img-{i:08d}"
        buf = encode_fake_image(
            rng.randint(8, 48), rng.randint(8, 48), seed * 31 + i
        )
        rows.append((doc_id, f"ref://{doc_id}/m", "image", buf))
        if i % variant_every == 0:
            w, h = _struct.unpack("<II", buf[4:12])
            px = bytearray(buf[12:])
            run = max(1, (w * h) // 16)
            j = rng.randrange(w * h - run)
            for k in range(j, j + run):
                px[k] = min(px[k] + 10, 255)
            rows.append(
                (
                    f"{doc_id}-v",
                    f"ref://{doc_id}-v/m",
                    "image",
                    MAGIC_IMG + buf[4:12] + bytes(px),
                )
            )
    rows.append(("img-truncated", "ref://img-truncated/m", "image", b"FIMG\x05"))
    return rows
