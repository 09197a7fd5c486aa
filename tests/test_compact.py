"""Small-file compaction (plans/compact.py): bin-pack planning is
deterministic, the rewrite changes the file layout and NOTHING else,
the commit is atomic from a reader's point of view (manifest shadows
old files in the same append that introduces the new ones), and
vacuum reclaims exactly the replaced + orphaned files."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from german_ocr_spark import pipeline
from german_ocr_spark.plans import compact as cp
from german_ocr_spark.plans import lineage as lin
from german_ocr_spark.synth import docs_to_spark, synth_docs


@pytest.fixture(scope="module")
def docs():
    return synth_docs(120, seed=7)


def _sorted_pdf(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
        .astype({"order": "int64"})
    )


# ------------------------------------------------------ pure planner
def test_plan_first_fit_name_order():
    sizes = [("b", 40), ("a", 50), ("c", 30), ("d", 60)]
    # name order a(50) b(40) -> bin closes at c (50+40+30 > 100);
    # c(30) d(60) -> second bin
    assert cp.plan_compaction(sizes, target_bytes=100) == [
        ["a", "b"],
        ["c", "d"],
    ]


def test_plan_skips_files_already_at_target():
    sizes = [("a", 100), ("b", 10), ("c", 10)]
    assert cp.plan_compaction(sizes, target_bytes=100) == [["b", "c"]]


def test_plan_min_input_files():
    # a lone small file is not worth a rewrite
    assert cp.plan_compaction([("a", 10)], target_bytes=100) == []
    assert cp.plan_compaction(
        [("a", 10)], target_bytes=100, min_input_files=1
    ) == [["a"]]


def test_plan_deterministic_under_input_order():
    s1 = [("a", 10), ("b", 20), ("c", 30)]
    s2 = list(reversed(s1))
    assert cp.plan_compaction(s1, 100) == cp.plan_compaction(s2, 100)


# ------------------------------------------------------ end to end
def test_compact_preserves_rows_and_shrinks_files(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    # one commit group per bucket -> many small files
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=8,
        bucket_group_size=1,
    )
    before_files = lin.committed_files(spark, out)
    before = _sorted_pdf(pipeline.read_output(spark, out))
    assert len(before_files) >= 8

    stats = cp.compact(spark, out, target_bytes=1 << 30)
    assert stats["bins"] >= 1
    assert stats["files_out"] < stats["files_in"]

    after_files = lin.committed_files(spark, out)
    assert len(after_files) < len(before_files)
    # not a single row changed
    after = _sorted_pdf(pipeline.read_output(spark, out))
    pd.testing.assert_frame_equal(after, before, check_dtype=False)
    # job status is untouched by compaction control rows
    assert pipeline.status(spark, out, n_buckets=8).status == "completed"

    # replaced files are still on disk (old-manifest readers keep
    # working) until vacuum reclaims exactly them
    data_dir = lin.data_path(out)
    replaced = {os.path.relpath(f, data_dir) for f in before_files}
    on_disk = lin._list_data_files(spark, out)
    assert replaced <= on_disk
    removed = set(lin.vacuum(spark, out))
    assert removed == replaced
    final = _sorted_pdf(pipeline.read_output(spark, out))
    pd.testing.assert_frame_equal(final, before, check_dtype=False)


def test_compact_noop_when_nothing_qualifies(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(spark, docs_to_spark(spark, docs), out, n_buckets=4)
    lineage_before = lin.read_lineage(spark, out).count()
    # every committed file is above a 1-byte target -> nothing to do
    stats = cp.compact(spark, out, target_bytes=1)
    assert stats == {"bins": 0, "files_in": 0, "files_out": 0}
    assert lin.read_lineage(spark, out).count() == lineage_before


def test_compact_is_idempotent_under_new_snapshot(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        bucket_group_size=1,
    )
    before = _sorted_pdf(pipeline.read_output(spark, out))
    cp.compact(spark, out, target_bytes=1 << 30, snapshot_id="c-1")
    n_files = len(lin.committed_files(spark, out))
    # a second pass has a single (already-compacted) file left -> no-op
    stats = cp.compact(spark, out, target_bytes=1 << 30, snapshot_id="c-2")
    assert stats["bins"] == 0
    assert len(lin.committed_files(spark, out)) == n_files
    pd.testing.assert_frame_equal(
        _sorted_pdf(pipeline.read_output(spark, out)), before,
        check_dtype=False,
    )


def test_snapshot_id_is_single_use(spark, docs, tmp_path):
    """Re-running a mutation under an already-committed snapshot_id
    must refuse loudly — its deterministic overwrite subdirs would
    clobber manifest-live files."""
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        bucket_group_size=1,
    )
    # compact twice under one id: second must raise, table intact
    cp.compact(spark, out, target_bytes=1 << 30, snapshot_id="c-reuse")
    before = _sorted_pdf(pipeline.read_output(spark, out))
    with pytest.raises(ValueError, match="single-use"):
        cp.compact(
            spark, out, target_bytes=1 << 30, snapshot_id="c-reuse",
            min_input_files=1,
        )
    pd.testing.assert_frame_equal(
        _sorted_pdf(pipeline.read_output(spark, out)), before,
        check_dtype=False,
    )


def test_compact_raises_on_manifest_disk_divergence(spark, docs, tmp_path):
    """A manifest-referenced data file missing from the directory
    listing means the manifest and disk diverged (external deletion,
    partial restore). Compaction planning must surface that loudly —
    silently planning over the survivors would bless the divergence."""
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        bucket_group_size=1,
    )
    victim = sorted(lin.committed_files(spark, out))[0]
    os.remove(victim)
    with pytest.raises(FileNotFoundError, match="missing on disk"):
        cp.compact(spark, out, target_bytes=1 << 30)
