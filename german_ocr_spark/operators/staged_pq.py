"""Staged IVF-PQ index — the 100 TB execution path for the composed
IVF-PQ search (q124), extending `staged_ivf.py`'s inverted-list layout
with the PQ codes as an index column.

The inline q124 recomputes cell assignment AND PQ codes per search; an
IVF-PQ index materializes both ONCE: the staged table is bucketed by
the IVF cell (the inverted-list layout) and each row carries the
vector's PQ codes — NOT the vector. Searches then read only the probed
cells' buckets, and ranking runs on codes alone (ADC), so search I/O is
~NPROBE/N_CELLS of a table that is itself ~64x smaller than the
vectors. Two properties asserted in tests/test_staged_pq.py:

1. **Parity** — searching the staged table through the shared
   `_ivfpq_search` yields q124's rows exactly (shared
   `_ivfpq_assign_probes` / `_ivfpq_search` in queries.py — assignment,
   codes, and ranking can never drift between the paths).
2. **Bucket pruning** — probed cell ids become a LITERAL `cell IN`
   filter on the bucket column before the join (staged_ivf.py's rule:
   Spark prunes buckets only for literal predicates, and
   `autoBucketedScan` must be off for a bare filter to keep the
   bucketed read), so the scan shows `SelectedBucketsCount: k out of n`.

Reference lineage: the resolve-once-reuse-per-request catalog pattern
(german_ocr/cloud_client.py:313-318), applied to the vector index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import write_bucketed


def stage_pq_index(
    spark: SparkSession,
    sf_dir: str,
    table: str = "staged_pq",
    n_buckets: int = 8,
) -> DataFrame:
    """Compute (cell, codes) per corpus vector once — q124's map-only
    literal-codebook arithmetic — and persist bucketed+sorted by cell;
    returns the staged IVF-PQ index table."""
    from ..queries import _ivfpq_assign_probes

    assign, _, _ = _ivfpq_assign_probes(spark, sf_dir)
    write_bucketed(assign, table, n_buckets=n_buckets, key="cell")
    return spark.table(table)


def ivfpq_search_staged(
    spark: SparkSession, sf_dir: str, staged: DataFrame
) -> DataFrame:
    """q124's ADC top-k executed against a staged IVF-PQ index: probes
    and the codebook literal are rebuilt from the same seed collects,
    the corpus-side (cell, codes) relation is READ bucket-pruned,
    never recomputed — and no full-precision corpus vector is ever
    touched."""
    from pyspark.sql import functions as F

    from ..queries import _ivfpq_assign_probes, _ivfpq_search

    _, probes, pqc = _ivfpq_assign_probes(spark, sf_dir)
    cells = sorted(
        {int(r.cell) for r in probes.select("cell").distinct().collect()}
    )
    return _ivfpq_search(
        staged.filter(F.col("cell").isin(cells)), probes, pqc
    )
