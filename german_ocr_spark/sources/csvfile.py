"""CSV source with the same quarantine contract as sources/jsonl.py:
explicit schema, one pass, malformed lines kept verbatim. CSV is the
other wire format bulk corpora arrive in (metadata sidecars, label
exports, crawl indexes like Common Crawl's cdx); the reference's
multi-format ingest (cloud_client.py format map) generalizes here the
same way.

Same engineering rules as JSONL — explicit schema (no inference pass),
PERMISSIVE parse via text+from_csv rather than the CSV datasource so
the quarantine split can't trip the corrupt-column-only pruning
restriction, raw line preserved byte-exact for replay."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .jsonl import CORRUPT_COL


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """One-pass PERMISSIVE CSV scan; bad lines land in
    ``_corrupt_record`` verbatim. With ``header=True`` the header line
    is dropped by VALUE match (the text source has no file-scoped
    header notion — at scale a directory holds thousands of files,
    each with its own header line, and all of them must go).

    A wrong-arity or wrong-type line quarantines; a line that is pure
    whitespace is dropped (trailing newlines at file ends)."""
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    if header:
        header_line = sep.join(f.name for f in schema.fields)
        raw = raw.filter(F.col("value") != header_line)
    parsed = raw.select(
        F.from_csv(
            F.col("value"),
            ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in with_corrupt.fields
            ),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
                "sep": sep,
            },
        ).alias("r"),
        F.col("value"),
    )
    payload = [F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    return parsed.select(
        *payload,
        F.when(F.col(f"r.{CORRUPT_COL}").isNotNull(), F.col("value")).alias(
            CORRUPT_COL
        ),
    )
