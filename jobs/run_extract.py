"""spark-submit entry point for the extraction pipeline.

Cluster:
    zip -r german_ocr_spark.zip german_ocr_spark
    spark-submit --py-files german_ocr_spark.zip jobs/run_extract.py \\
        --input s3://corpus/docs --output s3://corpus/extracted \\
        --buckets 4096 --bucket-group-size 256 --salt-partitions 8192

Local (same code path):
    python jobs/run_extract.py --input /tmp/in --output /tmp/out --cores 8

Re-running with the same --output resumes: committed buckets are
skipped (manifest lineage, plans/lineage.py). The reference analogue is
CloudClient.analyze = submit + wait + resume (cloud_client.py:320-462).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running as `python jobs/run_extract.py` puts jobs/ (not the repo
# root) on sys.path; under spark-submit --py-files the zip provides it
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="(doc_id, spans) table path")
    p.add_argument("--output", required=True, help="output dir (data + lineage)")
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--bucket-group-size", type=int, default=None,
                   help="buckets per commit (finer = cheaper resume)")
    p.add_argument("--salt-partitions", type=int, default=None,
                   help="spread heavy multi-page docs over N partitions")
    p.add_argument("--snapshot-id", default="snap-0001")
    p.add_argument("--stage-dir", default=None,
                   help="bucket-partitioned staging dir for multi-group"
                   " runs (the 10^12-doc path: per-group reads"
                   " partition-prune instead of persist())")
    p.add_argument("--cores", default=None,
                   help="local[N] threads (ignored under spark-submit)")
    args = p.parse_args(argv)

    from german_ocr_spark import pipeline
    from german_ocr_spark.session import get_spark
    from german_ocr_spark.sources import read_span_table

    spark = get_spark(cores=args.cores, app_name="extract-job")
    docs = read_span_table(spark, args.input)
    res = pipeline.run(
        spark,
        docs,
        args.output,
        n_buckets=args.buckets,
        bucket_group_size=args.bucket_group_size,
        salt_partitions=args.salt_partitions,
        snapshot_id=args.snapshot_id,
        stage_dir=args.stage_dir,
    )
    print(json.dumps(res.__dict__))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
