"""Skew evidence: one pathological multi-page document must not stall
the job (north rule: "partitioning / shuffle / skew handled
explicitly", BASELINE.json).

Corpus: ``--docs`` ordinary documents (~6 spans each) plus ONE document
with ``--heavy-spans`` spans (the 10^5-span PDF of the north star). In
the shuffle-free plan all of the heavy doc's spans explode inside a
single input split, so exactly one task carries ``heavy/total`` of the
kernel work while every other core goes idle — the classic straggler.
``salt_partitions`` inserts ONE repartition on
``(doc_id, pmod(offset, 64))`` between explode and kernels, spreading
the heavy doc across up to 64 tasks; span order is already assigned
in-row, so correctness is unaffected (verified here by comparing
order-insensitive output hashes).

The decision rule this measures (documented in operators/extract.py):
salting pays one shuffle to break stragglers — use it when
max-spans-per-doc is a meaningful fraction of spans-per-task;
skip it when documents are uniformly small.

Usage:
    python tools/skew_bench.py [--docs 20000] [--heavy-spans 50000]
                               [--cores 32] [--trials 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(spark, n_docs: int, heavy_spans: int, seed: int):
    from pyspark.sql import functions as F

    from german_ocr_spark.synth import synth_docs_distributed

    base = synth_docs_distributed(
        spark, n_docs, seed=seed, heavy_every=10**9, n_partitions=64
    )
    # the one pathological doc: heavy_spans ocr pages, built executor-side
    heavy = (
        spark.range(1)
        .select(
            F.lit("doc-heavy").alias("doc_id"),
            F.expr(
                f"transform(sequence(0, {heavy_spans - 1}), i -> "
                "named_struct('kind', 'ocr', "
                "'text', concat('Seite ', CAST(i AS STRING), "
                "' Grüße aus Köln, Straße Nr. ', CAST(i % 97 AS STRING)), "
                "'media_ref', '', 'offset', CAST(i AS INT)))"
            ).alias("spans"),
        )
    )
    return base.unionByName(heavy)


def out_hash(df) -> str:
    from pyspark.sql import functions as F

    row = df.select(
        F.md5(
            F.concat_ws(
                "\x1f",
                F.sort_array(
                    F.collect_list(
                        F.concat_ws("|", "doc_id", "order", "kind", "text")
                    )
                ),
            )
        ).alias("h")
    ).collect()
    return row[0]["h"]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", type=int, default=20000)
    p.add_argument("--heavy-spans", type=int, default=50000)
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args()

    from german_ocr_spark.operators.extract import extract_pipeline
    from german_ocr_spark.session import get_spark

    spark = get_spark(cores=args.cores, app_name="skew-bench")
    src = "/tmp/skew_bench_src"
    build_corpus(spark, args.docs, args.heavy_spans, seed=42).write.mode(
        "overwrite"
    ).parquet(src)
    docs = spark.read.parquet(src)

    # warm workers + JIT
    extract_pipeline(docs.sample(0.05, seed=1)).write.format("noop").mode(
        "overwrite"
    ).save()

    results = {}
    for label, salt in (("unsalted", None), ("salted", 256)):
        trials = []
        for _ in range(args.trials):
            t0 = time.time()
            extract_pipeline(docs, salt_partitions=salt).write.format(
                "noop"
            ).mode("overwrite").save()
            trials.append(round(time.time() - t0, 3))
        results[label] = {"trials_sec": trials, "best_sec": min(trials)}

    h_un = out_hash(extract_pipeline(docs, salt_partitions=None))
    h_sa = out_hash(extract_pipeline(docs, salt_partitions=256))
    summary = {
        "docs": args.docs,
        "heavy_spans": args.heavy_spans,
        "cores": args.cores,
        **results,
        "speedup_salted": round(
            results["unsalted"]["best_sec"] / results["salted"]["best_sec"], 3
        ),
        "output_identical": h_un == h_sa,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
