"""Staged-postings dedup — the 100 TB execution path for the shingle
inverted index (q18), as named in PLANS.md.

The inline q18 plan has a multi-consumer DAG: the capped posting
relation feeds the pair groups, the per-doc sizes, and (operationally)
df diagnostics, so Spark re-evaluates the shingle subtree once per
consumer. At report scale that re-evaluation is ~0.6 s and staging was
measured at par, so the inline form stays the default; at 10^12
documents each re-evaluation is a full corpus scan, and the correct
plan materializes the capped postings ONCE and points every consumer
at the staged table.

`stage_postings` writes the capped relation bucketed by the 8-byte
shingle hash (`write_bucketed`, the same layout the pipeline uses for
doc-keyed joins). Bucketing by `shh` additionally makes the pair
stage's groupBy(shh) shuffle-free — each task aggregates its own
buckets (asserted in tests/test_staged_dedup.py) — so the only
exchanges left in the whole staged dedup are the per-doc size agg and
the final pair agg.

Result parity with the inline q18 is exact (same downstream code,
tests assert row-for-row equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import write_bucketed


def stage_postings(
    spark: SparkSession,
    sf_dir: str,
    table: str = "staged_postings",
    n_buckets: int = 8,
) -> DataFrame:
    """Compute the df-capped shingle postings once and persist them
    bucketed+sorted by shh; returns the staged table."""
    from ..queries import _shingles, capped_postings

    capped = capped_postings(_shingles(spark, sf_dir))
    write_bucketed(capped, table, n_buckets=n_buckets, key="shh")
    return spark.table(table)


def jaccard_pairs_staged(staged: DataFrame) -> DataFrame:
    """q18's near-dup pairs computed off a staged posting table. The
    postings are already capped — no survivor join, no shingle-subtree
    re-evaluation per consumer."""
    from ..queries import jaccard_pairs_from_capped

    return jaccard_pairs_from_capped(staged)
