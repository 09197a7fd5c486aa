"""Keyless range (interval-containment) join — the second classic
operator Spark's DataFrame API lacks: joining points to intervals with
no equi-key. Expressing it directly (`ON p.ts >= i.start AND p.ts <
i.end`) gives Catalyst nothing to hash on, so Spark falls back to
BroadcastNestedLoopJoin — O(|points|·|intervals|) compares, the classic
scale cliff.

The scalable formulation MANUFACTURES the equi-key: time is cut into
fixed-width buckets, each interval is exploded to every bucket it
overlaps, each point gets its single bucket, and the join becomes a
hash equi-join on the bucket id followed by the exact containment
filter. With ``bucket_seconds`` chosen near the typical interval
length, each interval lands in ~2 buckets, so the exploded side is ~2×
its input — the join cost is linear in rows + true matches instead of
the cross product. Hot buckets (bursts) are ordinary join skew, handled
by AQE skew-split.

A point matches each interval at most once with no dedup step: the
point carries exactly ONE bucket id, so of the interval's exploded
copies only the copy in that bucket can pair with it.

Semantics: half-open containment ``start <= point_ts < end``, inner
join (unmatched points drop out; wrap with a left join on the output if
outer semantics are needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """All (point, interval) pairs with ``start_col <= point_ts <
    end_col``, carrying every column of both inputs (caller renames to
    avoid collisions). ``bucket_seconds`` is the scale knob: set it to
    the typical interval length so intervals explode to ~2 buckets.

    Bucketing uses second-truncated epochs, which is safe for the exact
    microsecond filter: truncation only ever widens the candidate
    bucket range (a superset), never drops a true match."""
    b = F.lit(bucket_seconds)
    p = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(point_ts)) / b).cast("long")
    )
    i = (
        intervals.withColumn(
            "_bs", F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long")
        )
        .withColumn(
            "_be", F.floor(F.unix_timestamp(F.col(end_col)) / b).cast("long")
        )
        .withColumn("_b", F.explode(F.sequence("_bs", "_be")))
        .drop("_bs", "_be")
    )
    return (
        p.join(i, "_b")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_b")
    )
