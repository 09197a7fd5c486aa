"""Source (A1-A3) and sink (A12-A14) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from german_ocr_spark.operators.extract import extract_pipeline
from german_ocr_spark.sinks import markdown_blocks, result_json
from german_ocr_spark.sources import read_media_dir, route_mime
from german_ocr_spark.synth import docs_to_spark, synth_docs


def test_read_media_dir_filters_sorts_and_routes(spark, tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "b.PNG").write_bytes(b"\x89PNG....")
    (d / "a.jpg").write_bytes(b"\xff\xd8\xff..")
    (d / "c.pdf").write_bytes(b"%PDF-1.4")
    (d / "note.txt").write_bytes(b"not media")  # filtered out
    (d / "empty.bmp").write_bytes(b"")  # dropped by the source listing

    out = read_media_dir(spark, str(d)).toPandas()
    names = [p.rsplit("/", 1)[-1] for p in out["path"]]
    assert names == sorted(names)  # cli.py:29 sorted order
    assert "note.txt" not in " ".join(names)
    assert "empty.bmp" not in " ".join(names)  # binaryFile drops 0-byte files
    by_name = out.set_index(out["path"].str.rsplit("/", n=1).str[-1])
    assert by_name.loc["b.PNG", "mime"] == "image/png"  # case-insensitive ext
    assert by_name.loc["a.jpg", "mime"] == "image/jpeg"
    assert by_name.loc["c.pdf", "mime"] == "application/pdf"
    assert by_name["valid"].all()


def test_route_mime_unknown_is_null(spark):
    df = spark.createDataFrame([("x/a.png",), ("x/b.exe",)], "path string")
    got = df.select(route_mime(F.col("path")).alias("m")).collect()
    assert got[0].m == "image/png" and got[1].m is None


def test_markdown_blocks_order(spark):
    docs = docs_to_spark(spark, synth_docs(30, seed=42))
    blocks = markdown_blocks(extract_pipeline(docs)).toPandas()
    # doc 4 has deliberately unsorted offsets; block must follow offset order
    b4 = blocks.set_index("doc_id").loc["doc-00000004", "block"]
    assert b4.startswith("=== doc-00000004 ===\n")
    body = b4.split("===\n", 1)[1]
    assert body.index("erster Teil") < body.index("zweiter Teil") < body.index(
        "dritter Teil"
    )


def test_result_json_roundtrip(spark):
    docs = docs_to_spark(spark, synth_docs(10, seed=42))
    out = result_json(extract_pipeline(docs).limit(5))
    import json

    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        payload = json.loads(r.result_json)
        assert {"order", "kind"} <= set(payload)


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_read_span_table_iceberg_branch(spark, tmp_path):
    """B1 Iceberg branch: exercised for real when the runtime jar is on
    the classpath; otherwise explicitly SKIPPED (this sandbox ships no
    Iceberg jar) rather than silently untested. The parquet branch and
    the iceberg: prefix routing are asserted either way."""
    import pytest as _pytest

    from german_ocr_spark.sources import read_span_table

    # parquet branch (always available)
    p = str(tmp_path / "spans.parquet")
    docs_to_spark(spark, synth_docs(5, seed=1)).write.parquet(p)
    assert read_span_table(spark, p).count() == 5

    if not _iceberg_available(spark):
        # prefix must still route to the table API (and fail there,
        # not fall through to a parquet read of a bogus path)
        with _pytest.raises(Exception):
            read_span_table(spark, "iceberg:nosuch.catalog.table").count()
        _pytest.skip("iceberg runtime jar not on classpath in this sandbox")

    spark.sql("CREATE TABLE IF NOT EXISTS local.db.spans_t (doc_id string)")
    assert read_span_table(spark, "iceberg:local.db.spans_t") is not None


def test_write_partitioned_dynamic_overwrite(spark, tmp_path):
    """Dynamic partition overwrite: rewriting ONE lang partition leaves
    the others byte-identical (the idempotent-refresh contract), and a
    lang-filtered read prunes to that partition's files."""
    from german_ocr_spark.sinks import write_partitioned

    out = str(tmp_path / "corpus")
    base = spark.createDataFrame(
        [(1, "alt de", "de"), (2, "old en", "en"), (3, "old fr", "fr")],
        "doc_id long, text string, lang string",
    )
    write_partitioned(base, out, ["lang"])

    refresh = spark.createDataFrame(
        [(1, "neu de", "de"), (9, "neu de 2", "de")],
        "doc_id long, text string, lang string",
    )
    write_partitioned(refresh, out, ["lang"])

    got = {
        (r.doc_id, r.text, r.lang)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (1, "neu de", "de"),
        (9, "neu de 2", "de"),
        (2, "old en", "en"),   # untouched by the de refresh
        (3, "old fr", "fr"),
    }

    # partition pruning: a lang= filter appears as a PartitionFilter,
    # never a data filter over all files
    plan = (
        spark.read.parquet(out)
        .filter(F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    assert "lang" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_orc_interchange_roundtrip_with_pushdown(spark, tmp_path):
    """ORC as the interchange format next to parquet/JSONL/CSV:
    write_sink('orc') roundtrips the nested interleaved-span schema
    (array<struct>) byte-for-byte, and a doc_id predicate reaches the
    ORC scan as a pushed filter — the same scan-pruning contract the
    parquet path relies on."""
    from german_ocr_spark.sinks import write_sink

    docs = docs_to_spark(spark, synth_docs(50, seed=7))
    path = str(tmp_path / "docs_orc")
    write_sink(docs, path, fmt="orc")
    back = spark.read.orc(path)
    # ORC loosens nullability flags; the logical shape must survive
    assert back.schema.simpleString() == docs.schema.simpleString()
    assert back.exceptAll(docs).isEmpty() and docs.exceptAll(back).isEmpty()
    plan = (
        back.filter(F.col("doc_id") == "doc-00000007")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "doc_id" in plan


def test_schema_evolution_merge_read(spark, tmp_path):
    """A corpus written across code generations: old files lack the
    `quality` column, new files carry it. mergeSchema reads both
    generations into one frame — old rows surface NULL quality — and
    a filter on the evolved column still prunes via pushdown. This is
    the add-a-column evolution path a long-lived span table needs
    without Iceberg."""
    import pandas as pd

    old = pd.DataFrame(
        {"doc_id": ["a", "b"], "text": ["t1", "t2"]}
    )
    new = pd.DataFrame(
        {"doc_id": ["c", "d"], "text": ["t3", "t4"],
         "quality": [0.9, 0.2]}
    )
    path = tmp_path / "evolved"
    path.mkdir()
    old.to_parquet(str(path / "part-gen1.parquet"), index=False)
    new.to_parquet(str(path / "part-gen2.parquet"), index=False)

    df = spark.read.option("mergeSchema", "true").parquet(str(path))
    assert set(df.columns) == {"doc_id", "text", "quality"}
    rows = {r.doc_id: r.quality for r in df.collect()}
    assert rows["a"] is None and rows["b"] is None
    assert abs(rows["c"] - 0.9) < 1e-12
    good = df.filter("quality > 0.5")
    assert [r.doc_id for r in good.collect()] == ["c"]
