"""As-of (point-in-time) join — a relational operator Spark's DataFrame
API lacks natively, expressed as the scalable union+window formulation
instead of the naive join-filter-groupBy (which materializes every
(left, earlier-right) pair before reducing — quadratic per key on
active keys, unusable at scale).

Semantics: for each left row, attach the payload of the single right
row with the greatest ``right_ts <= left_ts`` for the same key (LEFT
join flavor: unmatched left rows keep a null payload). Identical to
DuckDB's ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``, which is
the oracle used by the driver gate.

Plan shape: both inputs are tagged and unioned, then ONE window pass
per key ordered by (ts, tag) carries the latest right payload forward
(``last(..., ignorenulls=True)`` over an unbounded-preceding frame) —
exactly one shuffle of the combined input on the join key, no
pair-explosion, no re-join. At 100 TB this is the formulation that
survives: the shuffle moves each row once, skewed keys are AQE-split,
and the window state per partition is a single struct (the running
latest payload), not a buffer.

Determinism contract: rows must be unique per (key, ts) on the right
side — ties at the same timestamp have no defined winner in either
engine (callers dedup first, e.g. ``groupBy(key, ts).agg(max(...))``).
A right row at exactly ``left_ts`` DOES match (``>=``), which the
(ts asc, tag asc) sort encodes by placing right rows before left rows
at equal timestamps.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Mapping[str, str],
) -> DataFrame:
    """Left as-of join: every ``left`` row plus, for each output name in
    ``payload`` (out_name -> right column), the value from the latest
    ``right`` row with ``right_ts <= left_ts`` on the same ``on`` key;
    nulls where no such row exists. ``left``'s columns all pass through
    unchanged; ``on`` / ``left_ts`` name ``left`` columns and
    ``right_ts`` / payload values name ``right`` columns."""
    key = [on] if isinstance(on, str) else list(on)
    lp = F.struct(*[F.col(c) for c in left.columns]).alias("_lp")
    rp = F.struct(
        *[F.col(src).alias(out) for out, src in payload.items()]
    ).alias("_rp")
    rp_type = right.select(rp).schema[0].dataType
    lp_type = left.select(lp).schema[0].dataType

    l = left.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(key)],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        lp,
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    r = right.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(key)],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(lp_type).alias("_lp"),
        rp,
    )
    w = (
        Window.partitionBy(*[f"_k{i}" for i in range(len(key))])
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    return matched.select(
        "_lp.*", *[F.col("_m").getField(out).alias(out) for out in payload]
    )
