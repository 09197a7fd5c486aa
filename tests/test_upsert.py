"""Document upsert (plans/upsert.py): refreshed docs replace their
stale spans exactly, brand-new docs append, untouched docs survive
byte for byte, and the result composes with vacuum/compaction."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from german_ocr_spark import pipeline
from german_ocr_spark.plans import lineage as lin
from german_ocr_spark.plans import upsert as up
from german_ocr_spark.synth import docs_to_spark, synth_docs


@pytest.fixture(scope="module")
def docs():
    return synth_docs(80, seed=21)


def _sorted_pdf(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
        .astype({"order": "int64"})
    )


def test_upsert_replaces_and_inserts(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=8,
        bucket_group_size=1,
    )
    before = _sorted_pdf(pipeline.read_output(spark, out))
    victim = before["doc_id"].iloc[0]

    # fresh batch: one REFRESHED version of an existing doc (single
    # replacement span) + one brand-new doc
    fresh = spark.createDataFrame(
        [
            (victim, 0, "text", "refreshed content", "", None, None),
            ("doc-new-001", 0, "text", "new doc", "", None, None),
        ],
        schema=pipeline.read_output(spark, out).schema,
    )
    stats = up.upsert_docs(spark, out, fresh, snapshot_id="up-1")
    assert stats["docs_upserted"] == 2
    assert stats["rows_deleted"] == int((before["doc_id"] == victim).sum())

    after = _sorted_pdf(pipeline.read_output(spark, out))
    # refreshed doc: exactly the new single span
    got_victim = after[after["doc_id"] == victim]
    assert list(got_victim["text"]) == ["refreshed content"]
    # new doc present
    assert (after["doc_id"] == "doc-new-001").sum() == 1
    # everything else untouched
    rest = after[~after["doc_id"].isin([victim, "doc-new-001"])]
    expected_rest = before[before["doc_id"] != victim]
    pd.testing.assert_frame_equal(
        rest.reset_index(drop=True),
        expected_rest.reset_index(drop=True),
        check_dtype=False,
    )
    # never two versions of a doc
    assert after.groupby("doc_id")["order"].apply(
        lambda s: s.is_unique
    ).all()


def test_upsert_insert_only_batch_rewrites_nothing(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(spark, docs_to_spark(spark, docs), out, n_buckets=4)
    before = _sorted_pdf(pipeline.read_output(spark, out))
    fresh = spark.createDataFrame(
        [("doc-only-new", 0, "text", "hello", "", None, None)],
        schema=pipeline.read_output(spark, out).schema,
    )
    stats = up.upsert_docs(spark, out, fresh, snapshot_id="up-2")
    assert stats["files_rewritten"] == 0 and stats["rows_deleted"] == 0
    after = _sorted_pdf(pipeline.read_output(spark, out))
    assert len(after) == len(before) + 1


def test_upsert_composes_with_vacuum(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        bucket_group_size=1,
    )
    victim = _sorted_pdf(pipeline.read_output(spark, out))["doc_id"].iloc[0]
    fresh = spark.createDataFrame(
        [(victim, 0, "text", "v2", "", None, None)],
        schema=pipeline.read_output(spark, out).schema,
    )
    up.upsert_docs(spark, out, fresh, snapshot_id="up-3")
    expected = _sorted_pdf(pipeline.read_output(spark, out))
    removed = lin.vacuum(spark, out)
    assert removed  # the rewritten file's old version went away
    pd.testing.assert_frame_equal(
        _sorted_pdf(pipeline.read_output(spark, out)), expected,
        check_dtype=False,
    )


def test_snapshot_diff_reports_exact_changes(spark, docs, tmp_path):
    from german_ocr_spark.plans import delete as dl
    from german_ocr_spark.plans import upsert as up2

    T0, T1 = "2026-01-01T00:00:00Z", "2026-01-02T00:00:00Z"
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        committed_at=T0,
    )
    base = _sorted_pdf(pipeline.read_output(spark, out))
    doc_ids = sorted(base["doc_id"].unique())
    victim_del, victim_mod = doc_ids[0], doc_ids[1]

    dl.delete_docs(
        spark, out, [victim_del], snapshot_id="del-1", committed_at=T1
    )
    fresh = spark.createDataFrame(
        [
            (victim_mod, 0, "text", "v2", "", None, None),
            ("doc-added", 0, "text", "brand new", "", None, None),
        ],
        schema=pipeline.read_output(spark, out).schema,
    )
    up2.upsert_docs(spark, out, fresh, snapshot_id="up-1", committed_at=T1)

    diff = (
        up2.snapshot_diff(spark, out, as_of_a=T0)
        .toPandas()
        .set_index("doc_id")["change"]
        .to_dict()
    )
    assert diff == {
        victim_del: "removed",
        victim_mod: "modified",
        "doc-added": "added",
    }
    # identical snapshots diff to empty
    assert up2.snapshot_diff(spark, out, as_of_a=T1).count() == 0


def test_snapshot_diff_detects_null_field_swap(spark, tmp_path):
    """A doc whose span swaps which field is NULL ((text=NULL,
    media_ref='r') -> (text='r', media_ref=NULL)) MUST be reported
    modified: a null-dropping serialization (concat_ws) collapses the
    two shapes to one string and silently reports 'unchanged'. The
    digest is to_json with nulls kept, so the shapes stay distinct."""
    from german_ocr_spark.plans import upsert as up2

    T0, T1 = "2026-01-01T00:00:00Z", "2026-01-02T00:00:00Z"
    out = str(tmp_path / "out")
    schema = (
        "doc_id string, order int, kind string, text string, "
        "media_ref string, error string, error_code string"
    )
    base = spark.createDataFrame(
        [("doc-x", 0, "image", None, "ref://a", None, None)], schema
    )
    # upsert onto an empty dir is not supported; commit the base row as
    # a normal lineage group instead
    from german_ocr_spark.plans import lineage as lin2

    data_dir = str(tmp_path / "out/data/base-g00000")
    base.coalesce(1).write.parquet(data_dir)
    files = sorted(
        f"base-g00000/{n}" for n in lin2._list_dir_files(spark, data_dir)
    )
    lin2.append_lineage(
        spark, out, [("base", 0, 1, 1, 0, "committed", T0, files)]
    )
    swapped = spark.createDataFrame(
        [("doc-x", 0, "image", "ref://a", None, None, None)], schema
    )
    up2.upsert_docs(spark, out, swapped, snapshot_id="up-swap",
                    committed_at=T1)
    diff = (
        up2.snapshot_diff(spark, out, as_of_a=T0)
        .toPandas()
        .set_index("doc_id")["change"]
        .to_dict()
    )
    assert diff == {"doc-x": "modified"}
