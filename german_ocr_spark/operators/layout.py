"""Z-order (Morton) data layout: multi-dimensional clustering for
file-stat pruning.

A table laid out by ONE key prunes scans filtered on that key and
nothing else; a 100 TB corpus is queried along several axes at once
(source, length band, language, time). Interleaving the bit
representations of two bucketed dimensions into one Morton key and
range-writing by it places rows so that a predicate on EITHER
dimension touches only ~sqrt-fraction of the files — the standard
multi-dimensional clustering technique (Iceberg's `zorder` sort
transform, Delta's `OPTIMIZE ZORDER BY`), re-expressed here with plain
DataFrame ops: exact int64 bit interleave + `repartitionByRange` +
within-partition sort, so parquet min/max footer stats become tight on
both dimensions and stats-based row-group pruning works for both.

The key computation is oracle-checked (q89); the locality payoff —
rows matching a one-dimension predicate concentrate in few files —
is asserted by tests/test_layout.py against a one-dimensional layout
of the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Bits per dimension in the interleaved key. 8 bits x 2 dims = 16-bit
# Morton keys (65536 distinct cells) — enough to order any practical
# file count; production sizing matches total file count (cells ~ a
# few x files so each file spans a handful of cells).
Z_BITS = 8


def _bucket_expr(col: str, n_buckets: int) -> str:
    """Stable hash bucket in [0, n_buckets) from a column's string
    form via the md5-prefix rule used across the engine (q45/q69):
    engine-independent, layout-reproducible."""
    return (
        f"cast(conv(substring(md5(concat('z:', cast({col} as string))),"
        f" 1, 8), 16, 10) as bigint) % {n_buckets}"
    )


def morton_key(a: str, b: str, bits: int = Z_BITS):
    """Interleave the low ``bits`` bits of two int64 columns (a even
    positions, b odd) into one int64 Morton key — pure integer
    arithmetic, exact on any engine."""
    terms = " + ".join(
        f"((({a}) div {1 << i}) % 2) * {1 << (2 * i)}"
        f" + ((({b}) div {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(bits)
    )
    return F.expr(f"cast({terms} as bigint)")


def morton_key_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of morton_key (// for integral division)."""
    terms = " + ".join(
        f"((({a}) // {1 << i}) % 2) * {1 << (2 * i)}"
        f" + ((({b}) // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(bits)
    )
    return f"CAST({terms} AS BIGINT)"


def write_zordered(
    df: DataFrame,
    path: str,
    dim_a: str,
    dim_b: str,
    n_files: int = 16,
    bucket_a: int | None = None,
    bucket_b: int | None = None,
) -> None:
    """Write ``df`` clustered on the Z-order curve over (dim_a, dim_b).

    Numeric dims with a meaningful order (lengths, timestamps) should
    be pre-bucketed by VALUE by the caller; ``bucket_a``/``bucket_b``
    apply the engine's md5 hash-bucket rule instead (right for
    categorical dims like source, where only equality predicates
    occur). ``repartitionByRange`` on the key gives each output file a
    compact Morton range — i.e. a small rectangle in (a, b) space — so
    parquet footer min/max stats are tight on BOTH columns and a
    predicate on either prunes to ~sqrt(files).
    """
    a = F.expr(_bucket_expr(dim_a, bucket_a)) if bucket_a else F.col(dim_a)
    b = F.expr(_bucket_expr(dim_b, bucket_b)) if bucket_b else F.col(dim_b)
    keyed = (
        df.withColumn("_za", a.cast("bigint"))
        .withColumn("_zb", b.cast("bigint"))
        .withColumn("_zkey", morton_key("_za", "_zb"))
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_za", "_zb", "_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
