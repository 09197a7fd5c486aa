"""File/table sources (SURVEY A1-A3): Spark-native re-expression of the
reference's ingest layer.

- ``load_image`` path/bytes/verify (``german_ocr/utils.py:12-40``) →
  ``binaryFile`` scan with validity as a column, not an exception;
- ``find_images_in_directory`` sorted glob + extension allow-list
  (``german_ocr/cli.py:13-29``) → pushed-down path filters + orderBy;
- ``_prepare_file`` extension→MIME map + allow-list rejection
  (``german_ocr/cloud_client.py:269-311``) → a literal map lookup
  expression; rejected rows route to an error side-channel via filter,
  they never abort the scan.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# cloud_client.py:281-291 allow-list and MIME map, verbatim semantics.
MIME_BY_EXT = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "pdf": "application/pdf",
    "webp": "image/webp",
    "tiff": "image/tiff",
    "bmp": "image/bmp",
}

def file_ext(path_col: Column) -> Column:
    """Lower-cased extension (cli.py:24 case-insensitive match)."""
    return F.lower(F.element_at(F.split(path_col, r"\."), -1))


def route_mime(path_col: Column) -> Column:
    """extension → MIME type; unknown extensions → null (the caller
    filters those to the reject sink, mirroring the ValueError at
    cloud_client.py:292-297)."""
    mime_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(MIME_BY_EXT.items())]
    )
    return mime_map[file_ext(path_col)]


def read_media_dir(
    spark: SparkSession,
    directory: str,
    allowed_exts: tuple[str, ...] = tuple(MIME_BY_EXT),
) -> DataFrame:
    """Directory of media files → (path, media_ref, ext, mime, length,
    content, valid) rows, sorted by path (cli.py:29 ``sorted(paths)``).

    The extension filter is applied as a DataFrame filter so Catalyst
    can still prune on partition paths; validity (known extension,
    non-empty) is a column — invalid files become rejectable rows, not
    scan failures. Note: the binaryFile source drops zero-length files
    at listing time (they never appear as rows), which matches the
    reference's load_image raising on unreadable images before any
    processing (utils.py:29-36)."""
    df = spark.read.format("binaryFile").load(directory)
    ext = file_ext(F.col("path"))
    return (
        df.select(
            "path",
            F.col("path").alias("media_ref"),
            ext.alias("ext"),
            route_mime(F.col("path")).alias("mime"),
            "length",
            "content",
        )
        .filter(F.col("ext").isin(*allowed_exts))
        .withColumn(
            "valid", F.col("mime").isNotNull() & (F.col("length") > 0)
        )
        .orderBy("path")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 32,
    key: str = "doc_id",
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and optionally sorted) by ``key`` —
    the co-located-join layout. Two tables bucketed the same way join
    on ``key`` with ZERO Exchange nodes (each task reads matching
    buckets from both sides), which at 10^12 rows deletes the largest
    shuffle of any doc-keyed join: extracted spans ⋈ golden fixtures,
    spans ⋈ lineage, corpus ⋈ dedup verdicts. The Iceberg equivalent
    is a `bucket(N, doc_id)` partition transform; this is the
    plain-warehouse form (asserted shuffle-free in
    tests/test_bucketed_join.py)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_span_table(spark: SparkSession, path: str) -> DataFrame:
    """The primary corpus source: parquet (or, where the runtime jar is
    deployed, Iceberg) table of (doc_id, spans) — BASELINE.json
    input_hint shape. Kept behind one function so table-format branches
    live in exactly one place."""
    if path.startswith("iceberg:"):
        return spark.read.table(path.removeprefix("iceberg:"))
    return spark.read.parquet(path)
