"""JSONL source/sink: one-pass explicit-schema reads, corrupt-line
quarantine (the bulk-ingest analog of the extract kernels' per-row
error isolation), and sharded parallel-friendly export."""

from __future__ import annotations

import glob
import gzip
import json

from german_ocr_spark.sources import (
    DOCUMENTS_JSONL_SCHEMA,
    read_jsonl,
    split_corrupt,
    write_jsonl_sharded,
)

GOOD = [
    {"doc_id": 1, "text": "hallo welt", "lang": "de", "source": "s0", "n_chars": 10},
    {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1", "n_chars": 7},
    {"doc_id": 3, "text": "", "lang": "de", "source": "s0", "n_chars": 0},
]


def _stage(tmp_path, lines):
    p = tmp_path / "dump"
    p.mkdir()
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    return str(p)


def test_roundtrip_and_quarantine(spark, tmp_path):
    lines = [json.dumps(r) for r in GOOD]
    lines.insert(1, '{"doc_id": 4, "text": "truncated')  # malformed JSON
    lines.append('{"doc_id": "not-a-number", "text": "x"}')  # type drift
    path = _stage(tmp_path, lines)

    df = read_jsonl(spark, path, DOCUMENTS_JSONL_SCHEMA)
    good, bad = split_corrupt(df)

    got = {r["doc_id"]: r.asDict() for r in good.collect()}
    assert sorted(got) == [1, 2, 3]
    assert got[1]["text"] == "hallo welt"
    assert got[3]["text"] == ""  # empty string survives, not nulled
    assert good.columns == [f.name for f in DOCUMENTS_JSONL_SCHEMA.fields]

    # both failure classes land in quarantine with the raw line intact
    raws = sorted(r["raw_line"] for r in bad.collect())
    assert len(raws) == 2
    assert any("truncated" in r for r in raws)
    assert any("not-a-number" in r for r in raws)


def test_gzip_member_reads(spark, tmp_path):
    p = tmp_path / "gz"
    p.mkdir()
    with gzip.open(p / "d.jsonl.gz", "wt") as f:
        for r in GOOD:
            f.write(json.dumps(r) + "\n")
    df = read_jsonl(spark, str(p), DOCUMENTS_JSONL_SCHEMA)
    good, bad = split_corrupt(df)
    assert good.count() == 3 and bad.count() == 0


def test_sharded_export_parallel_layout(spark, tmp_path):
    rows = [
        (i, f"text {i}", "de", f"s{i % 3}", 7) for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "export")
    write_jsonl_sharded(df, out, rows_per_shard=10)

    # ceil(25/10) = 3 shards -> three separate gzip members, so a
    # downstream reader gets >= 3 splits even through gzip
    parts = glob.glob(f"{out}/part-*.json.gz")
    assert len(parts) == 3

    back, bad = split_corrupt(
        read_jsonl(spark, out, DOCUMENTS_JSONL_SCHEMA)
    )
    assert bad.count() == 0
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(25))


def test_csv_quarantine_classes(spark, tmp_path):
    """CSV twin of the JSONL quarantine contract: over-arity,
    type-drift, and under-arity lines ALL set the corrupt column
    (payload may be partially populated — quarantine is the signal,
    not the nulls); header and blank lines are dropped."""
    from pyspark.sql import types as T

    from german_ocr_spark.sources import read_csv_quarantined

    p = tmp_path / "csv"
    p.mkdir()
    (p / "a.csv").write_text(
        "doc_id,text,lang\n"
        "1,hello,de\n"
        "2,too,many,fields,here\n"
        "x,bad-type,fr\n"
        "3,short\n"
        "\n"
    )
    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    df = read_csv_quarantined(spark, str(p), sch, header=True)
    good, bad = split_corrupt(df)
    assert [(r.doc_id, r.text, r.lang) for r in good.collect()] == [
        (1, "hello", "de")
    ]
    raws = sorted(r["raw_line"] for r in bad.collect())
    assert raws == ["2,too,many,fields,here", "3,short", "x,bad-type,fr"]
