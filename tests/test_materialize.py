"""The reliable-materialization seam (materialize.py).

Pins the round-3 contract: every multi-round query goes through
``materialize()``, which uses fault-tolerant ``checkpoint()`` when a
checkpoint dir is configured and ``localCheckpoint()`` otherwise —
and BOTH modes produce identical rows. Exercised end-to-end on the two
heaviest iterative queries: q42 (contraction connected components)
and q161 (shared-postings PPJoin)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from german_ocr_spark.materialize import has_reliable_checkpoint, materialize
from german_ocr_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def reliable_ckpt(spark, tmp_path):
    """Temporarily configure a reliable checkpoint dir on the shared
    session; always clear it afterwards so other tests keep the
    localCheckpoint fast path."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        yield spark
    finally:
        # Option(null) clears the Scala-side checkpointDir.
        sc.setCheckpointDir(None)
        assert sc.getCheckpointDir() is None


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy(*df.columns).collect()]


def test_mode_switch(spark, reliable_ckpt, tmp_path):
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    assert has_reliable_checkpoint(spark)
    out = materialize(df)
    # reliable checkpoint() materializes to the configured dir and is
    # collectable with identical rows
    assert _sorted_rows(out) == _sorted_rows(df)
    # ... and the reliable path was actually TAKEN: checkpoint files
    # exist under the configured dir (a regression that silently
    # always localCheckpoints would still pass the row equality above)
    import os

    ckpt_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(str(tmp_path / "ckpt"))
        for f in fs
    ]
    assert ckpt_files, "no checkpoint files written under the reliable dir"


def test_local_fallback(spark):
    assert not has_reliable_checkpoint(spark)
    df = spark.range(5)
    out = materialize(df)
    assert _sorted_rows(out) == _sorted_rows(df)


@pytest.mark.parametrize("qname", ["q42_dedup_components", "q161_ppjoin"])
def test_query_identical_under_both_modes(spark, tmp_path, qname):
    # resolve the registered name (registry keys carry suffixes)
    matches = [k for k in QUERIES if k.startswith(qname.split("_")[0] + "_")]
    assert matches, f"no registry entry for {qname}"
    name = matches[0]
    local_rows = _sorted_rows(QUERIES[name](spark, SF_DIR))
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        reliable_rows = _sorted_rows(QUERIES[name](spark, SF_DIR))
    finally:
        sc.setCheckpointDir(None)
    assert local_rows == reliable_rows


def test_reliable_checkpoint_computes_lineage_once(spark, reliable_ckpt):
    """Reliable mode must persist around checkpoint(): an eager
    Dataset.checkpoint runs its materialization action AND a separate
    checkpoint-file write job, so without the persist the input
    lineage executes twice per seam (the round-3 review finding). The
    accumulator counts UDF evaluations: exactly one pass over the
    rows, not two."""
    from pyspark.sql import functions as F

    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def tick(x):
        acc.add(1)
        return x

    df = spark.range(100).select(tick("id").alias("v"))
    out = materialize(df)
    assert out.count() == 100
    assert acc.value == 100, (
        f"lineage evaluated {acc.value} times; expected one pass"
    )
