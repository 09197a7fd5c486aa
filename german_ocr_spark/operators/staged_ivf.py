"""Staged IVF inverted lists — the 100 TB execution path for the IVF
top-k search (q44), the vector-index twin of `staged_dedup.py`.

The inline q44 recomputes the corpus→cell assignment on every search;
that is the right call for one ad-hoc query, but an IVF index exists
precisely so that repeated searches do NOT rescan the corpus. At scale
the assignment is materialized ONCE, bucketed by the cell id — the
bucketed table IS the inverted-list layout: vectors of one cell sit in
known files. Two properties follow, both asserted in
tests/test_staged_ivf.py:

1. **Parity** — searching the staged table through the same
   `_ivf_search` downstream yields q44's rows exactly (shared helpers
   `_ivf_assign_probes` / `_ivf_search` in queries.py, so assignment
   and search can never drift between the two paths).
2. **Bucket pruning** — the probed cell ids are collected driver-side
   (the probe relation is queries x NPROBE rows, tiny by construction)
   and pushed as a LITERAL `cell IN (...)` filter on the staged scan
   BEFORE the join: Spark prunes buckets only for literal predicates
   on the bucket column, never through a join key, so without this
   filter the staged search would silently read every bucket. With it
   the scan shows `SelectedBucketsCount: k out of n` and search I/O is
   ~NPROBE/N_CELLS of the index, not a full scan — the property that
   makes IVF an *index* rather than a partitioned brute force. (One
   planner caveat, pinned in the test: a bare filter has no operator
   that "requires" bucketing, so `DisableUnnecessaryBucketedScan` must
   be off — `spark.sql.sources.bucketing.autoBucketedScan.enabled=
   false` — for the bucketed read, and therefore the pruning, to
   engage.)

Reference lineage: generalizes the reference's model/metadata catalog
lookup pattern (german_ocr/cloud_client.py:313-318 — resolve once,
reuse per request) to the vector-search domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import write_bucketed


def stage_inverted_lists(
    spark: SparkSession,
    sf_dir: str,
    table: str = "staged_ivf",
    n_buckets: int = 8,
) -> DataFrame:
    """Compute the corpus→cell assignment once (q44's map-only literal-
    centroid arithmetic) and persist it bucketed+sorted by cell;
    returns the staged inverted-list table."""
    from ..queries import _ivf_assign_probes

    assign, _ = _ivf_assign_probes(spark, sf_dir)
    write_bucketed(assign, table, n_buckets=n_buckets, key="cell")
    return spark.table(table)


def ivf_search_staged(
    spark: SparkSession, sf_dir: str, staged: DataFrame
) -> DataFrame:
    """q44's top-k search executed against a staged inverted-list
    table: probes are rebuilt from the same centroid literals, the
    corpus-side assignment is READ, never recomputed — and read
    bucket-pruned: the probed cell ids (a tiny driver-side collect)
    become a literal IN filter on the bucket column, the only form of
    predicate Spark's bucket pruning understands."""
    from pyspark.sql import functions as F

    from ..queries import _ivf_assign_probes, _ivf_search

    _, probes = _ivf_assign_probes(spark, sf_dir)
    cells = sorted(
        {int(r.cell) for r in probes.select("cell").distinct().collect()}
    )
    return _ivf_search(staged.filter(F.col("cell").isin(cells)), probes)
