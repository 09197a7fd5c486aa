"""Copy-on-write deletion (plans/delete.py): only files containing a
victim are rewritten, every other row survives bit for bit, the
manifest swap is atomic (rewritten + replaced in one append), a no-op
batch appends nothing, and vacuum reclaims the shadowed files."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from german_ocr_spark import pipeline
from german_ocr_spark.plans import delete as dl
from german_ocr_spark.plans import lineage as lin
from german_ocr_spark.synth import docs_to_spark, synth_docs


@pytest.fixture(scope="module")
def docs():
    return synth_docs(100, seed=11)


def _sorted_pdf(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
        .astype({"order": "int64"})
    )


def test_delete_removes_only_victims(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=8,
        bucket_group_size=1,
    )
    before = _sorted_pdf(pipeline.read_output(spark, out))
    victims = sorted(before["doc_id"].unique())[:3]
    files_before = {
        os.path.relpath(f, lin.data_path(out))
        for f in lin.committed_files(spark, out)
    }

    stats = dl.delete_docs(spark, out, victims, snapshot_id="del-1")
    assert stats["rows_deleted"] == int(
        before["doc_id"].isin(victims).sum()
    )
    # only the files holding victims were swapped out of the manifest
    files_after = {
        os.path.relpath(f, lin.data_path(out))
        for f in lin.committed_files(spark, out)
    }
    untouched = files_before & files_after
    assert stats["files_rewritten"] == len(files_before - files_after)
    assert len(untouched) >= 1  # 8 single-bucket files, 3 victims

    after = _sorted_pdf(pipeline.read_output(spark, out))
    assert set(after["doc_id"]).isdisjoint(victims)
    expected = (
        before[~before["doc_id"].isin(victims)].reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(after, expected, check_dtype=False)

    # shadowed files stay on disk for in-flight readers, then vacuum
    removed = set(lin.vacuum(spark, out))
    assert removed == files_before - files_after
    pd.testing.assert_frame_equal(
        _sorted_pdf(pipeline.read_output(spark, out)), expected,
        check_dtype=False,
    )


def test_delete_missing_doc_is_noop(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(spark, docs_to_spark(spark, docs), out, n_buckets=4)
    before = _sorted_pdf(pipeline.read_output(spark, out))
    n_lineage = lin.read_lineage(spark, out).count()
    stats = dl.delete_docs(spark, out, ["doc-does-not-exist"])
    assert stats == {"files_rewritten": 0, "rows_deleted": 0}
    assert lin.read_lineage(spark, out).count() == n_lineage
    pd.testing.assert_frame_equal(
        _sorted_pdf(pipeline.read_output(spark, out)), before,
        check_dtype=False,
    )


def test_delete_then_redelete_is_noop(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(spark, docs_to_spark(spark, docs), out, n_buckets=4)
    victim = _sorted_pdf(pipeline.read_output(spark, out))["doc_id"].iloc[0]
    s1 = dl.delete_docs(spark, out, [victim], snapshot_id="del-a")
    assert s1["rows_deleted"] > 0
    s2 = dl.delete_docs(spark, out, [victim], snapshot_id="del-b")
    assert s2 == {"files_rewritten": 0, "rows_deleted": 0}


def test_delete_composes_with_compaction(spark, docs, tmp_path):
    from german_ocr_spark.plans import compact as cp

    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=8,
        bucket_group_size=1,
    )
    before = _sorted_pdf(pipeline.read_output(spark, out))
    victim = before["doc_id"].iloc[0]
    dl.delete_docs(spark, out, [victim], snapshot_id="del-1")
    cp.compact(spark, out, target_bytes=1 << 30, snapshot_id="c-1")
    got = _sorted_pdf(pipeline.read_output(spark, out))
    expected = before[before["doc_id"] != victim].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
    assert pipeline.status(spark, out, n_buckets=8).status == "completed"


def test_delete_snapshot_id_reuse_refused(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        bucket_group_size=1,
    )
    ids = sorted(
        _sorted_pdf(pipeline.read_output(spark, out))["doc_id"].unique()
    )
    dl.delete_docs(spark, out, [ids[0]], snapshot_id="del-reuse")
    before = _sorted_pdf(pipeline.read_output(spark, out))
    with pytest.raises(ValueError, match="single-use"):
        dl.delete_docs(spark, out, [ids[1]], snapshot_id="del-reuse")
    pd.testing.assert_frame_equal(
        _sorted_pdf(pipeline.read_output(spark, out)), before,
        check_dtype=False,
    )
