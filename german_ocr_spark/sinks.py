"""Output sinks and result serialization (SURVEY A12-A14).

The reference's CLI either dumps a JSON array of ``{image, result}``
objects or concatenates ``=== name ===\\n{text}`` blocks to a file or
stdout (``german_ocr/cli.py:83-99``); ``to_json`` serializes structured
results (``extractor.py:261-269``). At scale both become projections +
distributed writes — no driver-side collect ever."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def result_json(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One JSON object per row (cli.py:85-88 ``{"image": ..., "result":
    ...}`` generalized): every non-id column is folded into a JSON
    payload column via ``to_json(struct(...))``."""
    payload = [c for c in df.columns if c != id_col]
    return df.select(
        F.col(id_col),
        F.to_json(F.struct(*payload)).alias("result_json"),
    )


def markdown_blocks(extracted: DataFrame) -> DataFrame:
    """Per-document ``=== name ===\\n{text}`` concatenation
    (cli.py:90-93), built from ordered spans with an ordered
    collect_list — order comes from the explicit ``order`` column,
    never from partition iteration order."""
    texts = F.transform(
        F.sort_array(F.collect_list(F.struct("order", "text"))),
        lambda s: s.text,
    )
    return extracted.groupBy("doc_id").agg(
        F.concat(
            F.lit("=== "),
            F.col("doc_id"),
            F.lit(" ===\n"),
            F.array_join(texts, "\n"),
        ).alias("block")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
) -> None:
    """Hive-style partitioned write with DYNAMIC overwrite: only the
    partitions present in ``df`` are replaced; every other partition
    under ``path`` survives untouched. This is the idempotent-refresh
    primitive a 100 TB corpus layout needs — re-running one language's
    (or one day's) curation job must not truncate the other 10^3
    partitions, which is exactly what the default STATIC overwrite
    would do. Spark resolves this per-write via
    ``partitionOverwriteMode=dynamic`` (set here on the writer, not
    globally, so callers who WANT truncate-all semantics still get the
    default). Downstream scans prune on the partition columns
    (PartitionFilters, not data filters)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


def write_sink(df: DataFrame, path: str, fmt: str = "parquet",
               mode: str = "overwrite") -> None:
    """A14: file sinks. parquet for tables, json for the reference's
    JSON-array output, text for concatenated blocks."""
    writer = df.write.mode(mode)
    if fmt == "text":
        # text sink needs exactly one string column
        col = df.columns[-1]
        writer.text(path) if len(df.columns) == 1 else df.select(
            F.col(col).cast("string")
        ).write.mode(mode).text(path)
        return
    getattr(writer, fmt)(path)
