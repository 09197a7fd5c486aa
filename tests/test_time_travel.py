"""Time-travel reads (as_of on committed_files/read_output): a reader
can resolve the table exactly as it stood at any committed_at — before
a later delete, upsert, or compaction — until vacuum expires the old
files."""

from __future__ import annotations

import pandas as pd
import pytest

from german_ocr_spark import pipeline
from german_ocr_spark.plans import compact as cp
from german_ocr_spark.plans import delete as dl
from german_ocr_spark.plans import lineage as lin
from german_ocr_spark.synth import docs_to_spark, synth_docs

T0 = "2026-01-01T00:00:00Z"
T1 = "2026-01-02T00:00:00Z"
T2 = "2026-01-03T00:00:00Z"


@pytest.fixture(scope="module")
def docs():
    return synth_docs(60, seed=31)


def _sorted_pdf(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
        .astype({"order": "int64"})
    )


def test_as_of_sees_pre_delete_state(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        bucket_group_size=1, committed_at=T0,
    )
    v0 = _sorted_pdf(pipeline.read_output(spark, out))
    victim = v0["doc_id"].iloc[0]
    dl.delete_docs(spark, out, [victim], snapshot_id="del-1", committed_at=T1)

    # current view: victim gone
    now = _sorted_pdf(pipeline.read_output(spark, out))
    assert victim not in set(now["doc_id"])
    # as-of T0: the full pre-delete table, byte for byte
    past = _sorted_pdf(pipeline.read_output(spark, out, as_of=T0))
    pd.testing.assert_frame_equal(past, v0, check_dtype=False)
    # as-of T1 and later: the post-delete table
    at_t1 = _sorted_pdf(pipeline.read_output(spark, out, as_of=T1))
    pd.testing.assert_frame_equal(at_t1, now, check_dtype=False)


def test_as_of_spans_compaction(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        bucket_group_size=1, committed_at=T0,
    )
    v0 = _sorted_pdf(pipeline.read_output(spark, out))
    cp.compact(
        spark, out, target_bytes=1 << 30, snapshot_id="c-1",
        committed_at=T1,
    )
    # rows identical either way; the as-of T0 read resolves the OLD
    # (pre-compaction) file layout
    old_files = lin.committed_files(spark, out, as_of=T0)
    new_files = lin.committed_files(spark, out)
    assert set(old_files) != set(new_files)
    pd.testing.assert_frame_equal(
        _sorted_pdf(pipeline.read_output(spark, out, as_of=T0)), v0,
        check_dtype=False,
    )
    pd.testing.assert_frame_equal(
        _sorted_pdf(pipeline.read_output(spark, out)), v0,
        check_dtype=False,
    )


def test_vacuum_is_the_expiry_boundary(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        committed_at=T0,
    )
    victim = _sorted_pdf(pipeline.read_output(spark, out))["doc_id"].iloc[0]
    dl.delete_docs(spark, out, [victim], snapshot_id="del-1", committed_at=T1)
    assert lin.vacuum(spark, out)  # expire old snapshot files
    # the as-of manifest now references reclaimed files: reading it
    # must fail loudly, not silently return partial data
    with pytest.raises(Exception):
        pipeline.read_output(spark, out, as_of=T0).collect()


def test_default_mutation_stamp_preserves_history(spark, docs, tmp_path):
    """A delete WITHOUT an explicit committed_at must derive a stamp
    sorting after every existing commit — never the epoch default that
    would make it retroactively visible to all as_of reads."""
    out = str(tmp_path / "out")
    pipeline.run(
        spark, docs_to_spark(spark, docs), out, n_buckets=4,
        committed_at=T0,
    )
    v0 = _sorted_pdf(pipeline.read_output(spark, out))
    victim = v0["doc_id"].iloc[0]
    dl.delete_docs(spark, out, [victim], snapshot_id="del-default")
    # current view reflects the delete; as-of the ORIGINAL stamp does not
    assert victim not in set(
        _sorted_pdf(pipeline.read_output(spark, out))["doc_id"]
    )
    pd.testing.assert_frame_equal(
        _sorted_pdf(pipeline.read_output(spark, out, as_of=T0)), v0,
        check_dtype=False,
    )
