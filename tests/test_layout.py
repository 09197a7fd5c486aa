"""Z-order layout: exact Morton-key arithmetic and the locality payoff
(a one-dimension predicate touches ~sqrt(files) under Z-order vs every
file under a one-dimensional layout of the same rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from german_ocr_spark.operators.layout import (
    Z_BITS,
    morton_key,
    write_zordered,
)


def _interleave(a: int, b: int, bits: int = Z_BITS) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 96, 255)]
    df = spark.createDataFrame(rows, "va long, vb long").withColumn(
        "zkey", morton_key("va", "vb")
    )
    for r in df.collect():
        assert int(r.zkey) == _interleave(int(r.va), int(r.vb)), (
            r.va,
            r.vb,
        )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """4096 rows on a 16x16 (va, vb) grid, 16 output files. Under
    Z-order each file is a compact Morton rectangle, so vb = const
    lives in ~4 files; under a va-major layout the same predicate
    touches every file."""
    n = 4096
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") / 16).cast("long") % 16).alias("va"),
        (F.col("id") % 16).alias("vb"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(base, zpath, "va", "vb", n_files=16)
    (
        base.repartitionByRange(16, "va", "vb")
        .sortWithinPartitions("va", "vb")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(F.col("vb") == 3)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    zfiles, lfiles = files_touched(zpath), files_touched(lpath)
    # content identical either way
    zcnt = spark.read.parquet(zpath).filter("vb = 3").count()
    lcnt = spark.read.parquet(lpath).filter("vb = 3").count()
    assert zcnt == lcnt == n // 16
    assert zfiles <= 6, zfiles  # ~sqrt locality (ideal: 4 of 16)
    assert lfiles >= 12, lfiles  # va-major layout spreads vb everywhere
    # the va dimension still prunes too (compact rectangles both ways)
    zva = (
        spark.read.parquet(zpath)
        .filter(F.col("va") == 7)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert zva <= 6, zva
