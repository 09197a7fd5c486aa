"""Reference-CLI-parity spark job: the ``german-ocr`` argument surface
(``german_ocr/cli.py:106-244``) re-expressed as a distributed batch job.

Mapping (reference → here):
  ``german-ocr --batch images/``         → ``--batch`` + binaryFile scan of a
                                           media directory (sources.read_media_dir,
                                           sorted, extension allow-list)
  ``german-ocr corpus`` (span table)     → read_span_table (parquet / iceberg:)
  ``--format markdown|md|json|text|n8n|html`` → the full reference format
                                           domain (cloud_client.py:165, md→
                                           markdown alias :359-362, html route
                                           ollama_backend.py:113-120):
                                           markdown blocks / result_json /
                                           plain text / n8n workflow items /
                                           per-doc <article> blocks
  ``--structured``                       → operators.structured.structured_extract
                                           (typed ExtractionResult rows,
                                           extractor.py:163-223)
  ``--output``                           → distributed write (A14); never a
                                           driver-side collect
  ``--list-kernels``                     → analogue of ``--list-models`` (A21):
                                           prints the span-kind kernel registry

The model backends themselves are the stubbed boundary (no model server
in this environment): media-dir rows flow through the pipeline as
``image``/``pdf`` spans with empty text, exactly the plumbing a
production deployment points at its OCR kernel.

Usage:
    python jobs/cli.py --batch /data/images --format markdown --output /out
    python jobs/cli.py /data/spans.parquet --format json --structured --output /out
    spark-submit --py-files german_ocr_spark.zip jobs/cli.py ...
"""

from __future__ import annotations

import argparse
import os
import sys

# running as `python jobs/cli.py` puts jobs/ (not the repo root) on
# sys.path; under spark-submit --py-files the zip provides the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reference format domain (cloud_client.py:165 OUTPUT_FORMATS =
# {json, markdown, md, text, n8n}; lowercased + md→markdown alias at
# :359-362) plus the local backend's html prompt route
# (ollama_backend.py:113-120).
FORMATS = ("markdown", "md", "json", "text", "n8n", "html")


def normalize_format(fmt: str) -> str:
    """A4 enum normalization: lowercase, ``md`` → ``markdown``
    (cloud_client.py:359-362). Raises ValueError outside the domain —
    the reference's exact contract."""
    fmt = fmt.lower()
    if fmt == "md":
        fmt = "markdown"
    if fmt not in FORMATS:
        raise ValueError(
            f"Ungültiges Output-Format: {fmt}. Erlaubt: {', '.join(FORMATS)}"
        )
    return fmt


def build_docs_from_media_dir(spark, directory: str):
    """Media directory → (doc_id, spans) docs: one single-span document
    per file, span kind routed by MIME family (pdf → 'pdf', images →
    'image'), matching the reference's one-image-one-result unit
    (ocr.py:196-232)."""
    from pyspark.sql import functions as F

    from german_ocr_spark.sources import read_media_dir

    media = read_media_dir(spark, directory)
    kind = F.when(F.col("mime") == "application/pdf", F.lit("pdf")).otherwise(
        F.lit("image")
    )
    return media.filter(F.col("valid")).select(
        F.col("path").alias("doc_id"),
        F.array(
            F.struct(
                kind.alias("kind"),
                F.lit("").alias("text"),
                F.col("media_ref").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def main(argv: list[str] | None = None, stop: bool = True) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", nargs="?", help="span table path, or media dir with --batch")
    p.add_argument("--batch", action="store_true",
                   help="treat input as a directory of media files (cli.py --batch)")
    p.add_argument("--format", type=str.lower, choices=FORMATS,
                   default=None,
                   help="output shape (default: markdown blocks; json "
                        "when --structured); 'md' is an alias for markdown")
    p.add_argument("--structured", action="store_true",
                   help="parse span text as typed ExtractionResult rows")
    p.add_argument("--output", help="output directory (distributed write)")
    p.add_argument("--cores", default=None, help="local[N] (ignored under spark-submit)")
    p.add_argument("--list-kernels", action="store_true",
                   help="list span-kind kernels and exit (--list-models analogue)")
    args = p.parse_args(argv)

    if args.list_kernels:
        from german_ocr_spark.schema import SPAN_KINDS

        for k in SPAN_KINDS:
            print(k)
        return 0
    if not args.input or not args.output:
        p.error("input and --output are required unless --list-kernels")
    if args.format is None:
        # bare --structured defaults to its only sensible shape instead
        # of erroring on the markdown default
        args.format = "json" if args.structured else "markdown"
    fmt = normalize_format(args.format)
    if args.structured and fmt not in ("json", "n8n"):
        # typed rows only have JSON-shaped outputs; the old behavior
        # (markdown silently writing parquet, text dropping result_json)
        # was surprising — reject like the reference's ValueError on a
        # bad format (cloud_client.py:363-367)
        p.error("--structured supports --format json or n8n only")

    from pyspark.sql import functions as F

    from german_ocr_spark.operators.extract import extract_pipeline, reassemble
    from german_ocr_spark.operators.structured import structured_extract
    from german_ocr_spark.session import get_spark
    from german_ocr_spark.sinks import markdown_blocks, result_json, write_sink
    from german_ocr_spark.sources import read_span_table

    spark = get_spark(cores=args.cores, app_name="german-ocr-cli")
    docs = (
        build_docs_from_media_dir(spark, args.input)
        if args.batch
        else read_span_table(spark, args.input)
    )
    extracted = extract_pipeline(docs)

    from pyspark.sql import Observation

    obs = Observation()

    def observed(df):
        # row count rides on the write action itself — no read-back
        # scan, and for markdown the count is BLOCKS (documents), not
        # the lines a text re-read would count
        return df.observe(obs, F.count(F.lit(1)).alias("n"))

    def n8n_items(df):
        """n8n output shape: one workflow item per row, the payload
        nested under a ``json`` key (the n8n item contract the
        reference's n8n format feeds, cloud_client.py:165)."""
        payload = [c for c in df.columns]
        return df.select(
            F.to_json(F.struct(F.struct(*payload).alias("json"))).alias("item")
        )

    if args.structured:
        # per-document text (ordered spans joined) → typed parse; the
        # reference's DocumentExtractor path (extractor.py:163-223).
        # All structured output is JSON-shaped: plain result_json rows
        # for --format json, n8n items for --format n8n.
        per_doc = reassemble(extracted).select(
            "doc_id",
            F.array_join(
                F.transform(F.col("spans"), lambda s: s.text), "\n"
            ).alias("raw_response"),
            "span_count",
            "error_count",
        )
        out = result_json(structured_extract(per_doc))
        if fmt == "n8n":
            write_sink(observed(n8n_items(out)), args.output, "text")
        else:
            write_sink(observed(out), args.output, "json")
    elif fmt == "markdown":
        write_sink(
            observed(markdown_blocks(extracted).select("block")), args.output, "text"
        )
    elif fmt == "json":
        write_sink(observed(result_json(extracted)), args.output, "json")
    elif fmt == "n8n":
        write_sink(
            observed(n8n_items(result_json(extracted))), args.output, "text"
        )
    elif fmt == "html":
        # html route (ollama_backend.py:118): per-document <article>
        # with one <p> per ordered span; doc ids and span text are
        # HTML-escaped (& first, then < > ") so corpus text containing
        # markup can't break or inject into the output structure
        def esc(col):
            out = F.regexp_replace(col, "&", "&amp;")
            out = F.regexp_replace(out, "<", "&lt;")
            out = F.regexp_replace(out, ">", "&gt;")
            return F.regexp_replace(out, '"', "&quot;")

        paras = F.transform(
            F.sort_array(
                F.collect_list(F.struct("order", esc(F.col("text")).alias("text")))
            ),
            lambda s: F.concat(F.lit("<p>"), s.text, F.lit("</p>")),
        )
        blocks = extracted.groupBy("doc_id").agg(
            F.concat(
                F.lit('<article data-doc="'),
                esc(F.col("doc_id")),
                F.lit('">'),
                F.array_join(paras, ""),
                F.lit("</article>"),
            ).alias("block")
        )
        write_sink(observed(blocks.select("block")), args.output, "text")
    else:  # text: one line per span, document/order prefixed for dedup-safe cat
        write_sink(
            observed(
                extracted.select(
                    F.concat_ws("\t", "doc_id", F.col("order").cast("string"), "text")
                    .alias("line")
                )
            ),
            args.output,
            "text",
        )
    n = int(obs.get["n"] or 0)
    print(f"wrote {n} rows to {args.output}")
    if stop:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
