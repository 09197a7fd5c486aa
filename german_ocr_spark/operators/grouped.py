"""Grouped-map (``applyInPandas``) surface — the fourth Arrow UDF shape
(B16) next to scalar ``pandas_udf`` (q109), ``mapInPandas`` (the
extraction stage), and ``applyInPandasWithState`` (streaming
sessionization).

``mapInPandas`` sees arbitrary Arrow batches — a document's spans can
straddle two batches — so kernels that need a WHOLE group in memory at
once (XY-cut over all of a page's blocks, global renumbering of a
document's reading order) belong in ``applyInPandas``: Spark shuffles
on the group key and hands each group to the kernel complete. That
shuffle is the price; prefer the relational/window form whenever the
semantics allow (the parity test pins both forms to identical output),
and reach for grouped-map only when the kernel is genuinely
whole-group-at-a-time.

Reference analogue: the per-document loop body of ``extract_batch``
(``german_ocr/ocr.py:234-267``) — one document fully in hand per step.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RENUMBER_DDL = (
    "doc_id string, `order` int, kind string, text string, "
    "media_ref string, offset int"
)


def _renumber_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Whole-document reading-order repair: sort by (offset, kind,
    media_ref) with a stable mergesort and assign dense 0-based
    `order` — deterministic for any input permutation of the group."""
    pdf = pdf.sort_values(
        ["offset", "kind", "media_ref"], kind="mergesort"
    ).reset_index(drop=True)
    pdf["order"] = pd.Series(range(len(pdf)), dtype="int32")
    return pdf[["doc_id", "order", "kind", "text", "media_ref", "offset"]]


def renumber_grouped(spans: DataFrame) -> DataFrame:
    """Reading-order renumber via ``applyInPandas`` — each doc's spans
    arrive complete in one pandas frame (Spark groups on doc_id)."""
    return spans.groupBy("doc_id").applyInPandas(
        _renumber_kernel, schema=RENUMBER_DDL
    )


def renumber_relational(spans: DataFrame) -> DataFrame:
    """The same semantics as a window — the formulation to PREFER: no
    Python worker, and at 10^12 rows the window shuffle equals the
    grouped-map shuffle without the Arrow transfer."""
    w = Window.partitionBy("doc_id").orderBy("offset", "kind", "media_ref")
    return spans.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("int").alias("order"),
        "kind",
        "text",
        "media_ref",
        "offset",
    )


def trimmed_mean_udaf():
    """Grouped-aggregate ``pandas_udf`` — the fifth Arrow surface
    (scalar, grouped-map, map-iter, stateful, and THIS): a whole
    group's column arrives as one pandas Series and returns one
    scalar. Example aggregate: the 20%-trimmed mean (drop the lowest
    and highest decile COUNT, floor-rounded) — order-insensitive and
    deterministic, so it is a legal Spark aggregate.

    NULL and NaN values are EXCLUDED from the aggregate (dropna before
    trimming) — both forms apply the same rule, and both drop groups
    whose values are all null/NaN (the relational filter removes those
    rows before the groupBy, and `trimmed_mean_grouped` applies the
    identical pre-filter so the two forms stay row-for-row equal;
    without it pandas' NaN-last sort vs Spark's nulls-first window
    would trim DIFFERENT rows and len() vs count(*) would disagree on
    the denominator).

    Like every Python surface here it is the slow path: the parity
    test pins it row-for-row against the pure-relational window
    formulation (`trimmed_mean_relational`), which is what production
    uses; the UDAF exists for aggregates with no relational spelling."""
    import pandas as pd  # noqa: F401

    @F.pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = v.dropna().sort_values(kind="mergesort").reset_index(drop=True)
        if len(s) == 0:
            return None
        k = len(s) // 10
        kept = s.iloc[k: len(s) - k] if len(s) > 2 * k else s
        return float(kept.sum()) / len(kept)

    return trimmed_mean


def _drop_null_nan(df: DataFrame, col: str) -> DataFrame:
    """Shared null/NaN pre-filter so UDAF and relational trimmed-mean
    see the identical row set (and all-null groups vanish in both)."""
    c = F.col(col).cast("double")
    return df.filter(c.isNotNull() & ~F.isnan(c))


def trimmed_mean_grouped(df: DataFrame, key: str, col: str) -> DataFrame:
    """groupBy(key).agg(UDAF) — Arrow grouped aggregation."""
    return _drop_null_nan(df, col).groupBy(key).agg(
        trimmed_mean_udaf()(F.col(col)).alias("trimmed_mean")
    )


def trimmed_mean_relational(df: DataFrame, key: str, col: str) -> DataFrame:
    """The same aggregate in pure relational form: rank within the
    group from both ends, drop the bottom/top n//10 rows, average the
    rest. One window shuffle + the group aggregate — the formulation
    to PREFER (no Python workers). Null/NaN rows are dropped first
    (same rule as the UDAF form)."""
    df = _drop_null_nan(df, col)
    w = Window.partitionBy(key).orderBy(F.col(col).asc())
    wn = Window.partitionBy(key)
    ranked = df.select(
        key,
        F.col(col).alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    kept = ranked.filter(
        (F.col("n") <= 2 * (F.col("n") / 10).cast("int"))
        | (
            (F.col("rn") > (F.col("n") / 10).cast("int"))
            & (F.col("rn") <= F.col("n") - (F.col("n") / 10).cast("int"))
        )
    )
    return kept.groupBy(key).agg(
        (F.sum("v") / F.count("*")).alias("trimmed_mean")
    )
