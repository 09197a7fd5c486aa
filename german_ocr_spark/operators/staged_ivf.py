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
2. **Bucket pruning** — a probe that touches NPROBE of N_CELLS cells
   reads only those cells' buckets (`SelectedBucketsCount: k out of n`
   in the scan node), i.e. search I/O is ~NPROBE/N_CELLS of the index,
   not a full scan. This is the property that makes IVF an *index*
   rather than a partitioned brute force; at 10^12 vectors it is the
   difference between reading terabytes and reading the whole corpus.

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
    corpus-side assignment is READ (bucket-pruned), never recomputed."""
    from ..queries import _ivf_assign_probes, _ivf_search

    _, probes = _ivf_assign_probes(spark, sf_dir)
    return _ivf_search(staged, probes)
