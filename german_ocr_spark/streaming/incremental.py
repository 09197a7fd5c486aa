"""Structured Streaming surface: incremental extraction, late-data
windowed rates, and stateful streaming dedup.

Re-expresses the reference's async-job model (submit → poll → resume,
``german_ocr/cloud_client.py:320-462``) as Spark's native incremental
execution: new corpus files landing in a directory ARE the job queue,
the streaming checkpoint IS the job state, and `trigger(availableNow)`
gives the reference's "drain everything then return" batch semantics
while a continuous trigger gives its long-poll semantics. The
extraction plan is the SAME map-only plan as batch
(``operators.extract.extract_pipeline``) — one definition, two
execution modes; batch/stream parity is asserted by tests.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery, StreamingQueryListener

from ..operators.extract import extract_pipeline
from ..schema import DOCUMENTS_SPANS_SCHEMA


@dataclass
class StreamProgress:
    """One micro-batch's progress (A16 streaming analog of the
    reference's ``on_progress`` callback payload,
    ``cloud_client.py:436-462``)."""

    query_id: str
    batch_id: int
    num_input_rows: int
    total_input_rows: int


class ProgressRecorder(StreamingQueryListener):
    """StreamingQueryListener that exposes the micro-batch progress
    stream as data: each batch appends a ``StreamProgress`` with a
    cumulative row count, so any observer sees monotone progress while
    a long drain runs — the streaming counterpart of
    ``pipeline.run(on_progress=...)``.

    Attach/detach::

        rec = ProgressRecorder.attach(spark)
        try:  ... run streaming query ...
        finally: rec.detach(spark)
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.events: list[StreamProgress] = []
        self._totals: dict[str, int] = {}

    @classmethod
    def attach(cls, spark: SparkSession) -> "ProgressRecorder":
        rec = cls()
        spark.streams.addListener(rec)
        return rec

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    # listener callbacks run on Spark's listener-bus thread
    def onQueryStarted(self, event) -> None:  # noqa: D102
        pass

    def onQueryProgress(self, event) -> None:  # noqa: D102
        p = event.progress
        with self._lock:
            qid = str(p.id)
            total = self._totals.get(qid, 0) + int(p.numInputRows)
            self._totals[qid] = total
            self.events.append(
                StreamProgress(
                    query_id=qid,
                    batch_id=int(p.batchId),
                    num_input_rows=int(p.numInputRows),
                    total_input_rows=total,
                )
            )

    def onQueryIdle(self, event) -> None:  # noqa: D102
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: D102
        pass

    def snapshot(self) -> list[StreamProgress]:
        with self._lock:
            return list(self.events)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Incrementally extract every (doc_id, spans) parquet file that
    lands in ``input_dir``; exactly-once per file via the checkpoint
    (a re-run after a crash or with new files processes only the
    un-checkpointed remainder — the streaming twin of the batch
    lineage/bucket resume in plans.lineage)."""
    reader = spark.readStream.schema(DOCUMENTS_SPANS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    extracted = extract_pipeline(docs)  # map-only ⇒ append-mode safe
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_rates(events: DataFrame, watermark: str = "30 minutes",
                   window: str = "1 hour") -> DataFrame:
    """Event-time windowed counts with a watermark for late data —
    works identically on a batch or streaming DataFrame (on streaming,
    the watermark lets Spark finalize + emit windows in append mode)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_windowed_rates(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "event_id long, user_id long, event_type string, "
    "ts timestamp, value double, props string",
    watermark: str = "30 minutes",
    window: str = "1 hour",
) -> StreamingQuery:
    """Streaming per-window event rates into parquet (append mode: a
    window is emitted once its watermark passes; availableNow drains
    the backlog and finalizes all windows)."""
    events = spark.readStream.schema(schema).parquet(input_dir)
    return (
        windowed_rates(events, watermark, window)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> StreamingQuery:
    """Stateful streaming dedup on doc_id: the first arrival of each
    doc_id within the watermark horizon passes through, replays and
    re-deliveries are dropped from state — the streaming form of the
    exact-dedup operator (q17), with state bounded by the watermark so
    it runs forever at 10^12 scale."""
    docs = (
        spark.readStream.schema(
            "doc_id string, ingest_ts timestamp, payload string"
        ).parquet(input_dir)
    )
    deduped = docs.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["doc_id"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
