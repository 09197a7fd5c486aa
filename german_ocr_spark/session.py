"""SparkSession builder tuned for the extraction workload.

Local-mode stand-in for a multi-executor cluster: parallelism is the
``local[N]`` thread count; all scale-sensitive knobs (AQE, shuffle
partitions, Arrow batch size) are set the way they would be on a
1000-executor deployment reading 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str | None = None,
    app_name: str = "german-ocr-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Parameters
    ----------
    cores: thread count for local mode ("*" for all). Defaults to
        ``$SPARK_GRAFT_CPUS`` or "*".
    shuffle_partitions: defaults to 2x cores locally. On a real
        cluster this would be sized so post-shuffle partitions land
        near ``advisoryPartitionSizeInBytes`` (AQE coalesces down).
    """
    # Allocator stability for the Python UDF workers (inherited via the
    # JVM -> daemon -> worker fork chain, so must be set before the JVM
    # starts): keep freed pages resident instead of returning them to
    # the OS. On hosts with lazily-backed VM memory (this sandbox:
    # first-touch page faults run at ~0.1-0.5 GB/s vs 20 GB/s for
    # resident pages), re-faulting freed arenas dominates wall time and
    # destroys scaling; on normal hosts these are harmless.
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("PYTHONMALLOC", "malloc")

    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = 2 * (n if cores == "*" else int(cores))

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime re-plan, skew-join splitting, partition coalescing.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow everywhere: pandas UDF / mapInPandas transfer is the
        # engine's Python boundary; batch size bounds UDF memory.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet scans: 128m splits — matches large-cluster defaults.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Task-side file commits (no serial driver-side rename pass).
        # Safe here because the engine's durability marker is the
        # lineage manifest row, written strictly after the data job
        # (plans/lineage.py), not the committer's atomicity.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # Deterministic timestamps in oracle comparisons.
        .config("spark.sql.session.timeZone", "UTC")
        # Reliable checkpoints (materialize.py) are reclaimed by the
        # ContextCleaner when their RDD is GC'd — without this a
        # long-running iterative job accumulates one checkpoint dir
        # per round until the job ends.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # zstd: ~33% smaller span parquet than snappy AND faster to
        # write (measured 6.9s vs 8.0s for 1.25M spans at 32 cores) —
        # at object-storage scale the byte reduction also cuts every
        # downstream scan
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # progress bar writes \r-terminated lines that interleave with
        # job output and confuse log capture
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Reliable-materialization seam (materialize.py): when set, every
    # df.transform(materialize) in the engine uses fault-tolerant
    # checkpoint() against this directory (HDFS/S3 on a cluster)
    # instead of executor-pinned localCheckpoint(). One knob flips the
    # whole engine.
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt and spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
