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


SESSION_GAP_SECONDS = 1800  # same gap as the batch sessionizer (q09)

_SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
# state = (session_start_epoch, last_event_epoch, n_events) for the one
# open session per user — O(1) per key, independent of session length
_SESSION_STATE_SCHEMA = "start long, last long, n long"


def _sessionize_with_state(gap_seconds: int):
    """Build the per-group stateful function for
    ``applyInPandasWithState``: custom session windows (gap-based, like
    the batch q09 sessionizer) maintained across micro-batches.

    Why not ``F.session_window``: this is the engine's demonstration of
    a CUSTOM stateful streaming operator — arbitrary per-key state with
    event-time timeouts — the escape hatch for semantics Spark's
    built-in stateful ops don't cover (the reference's long-poll job
    state machine, ``cloud_client.py:415-462``, is exactly such a
    shape). The state is a 3-tuple per user; a session closes when a
    later event arrives past the gap, or when the event-time watermark
    passes ``last_event + gap`` (timeout), so state stays bounded
    forever on an unbounded stream."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        user_id = int(key[0])
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            closed.append((start, last, n))
        else:
            ts: list[int] = []
            for pdf in pdf_iter:
                # normalize to ns first: Arrow may hand the batch over
                # as datetime64[us], where a bare int64 view would be
                # microseconds and silently shift every session
                epoch = (
                    pdf["ts"].astype("datetime64[ns]").astype("int64")
                    // 1_000_000_000
                )
                ts.extend(epoch.tolist())
            ts.sort()
            start = last = n = None
            if state.exists:
                start, last, n = state.get
            for t in ts:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_seconds:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = max(last, t), n + 1
            if start is not None:
                state.update((start, last, n))
                # event-time timeout: fires once the watermark passes
                # the open session's gap horizon (milliseconds epoch)
                state.setTimeoutTimestamp((last + gap_seconds) * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="s"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="s"
                    ),
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "30 minutes",
    schema: str = "event_id long, user_id long, event_type string, "
    "ts timestamp, value double, props string",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    gap-based sessionization of the event stream, the streaming twin of
    the batch q09 sessionizer. Emits one row per CLOSED session (closed
    by a later event past the gap, or by event-time timeout when the
    watermark passes the gap horizon). Scale shape: state is O(1) per
    active user, partitioned by the groupBy key across executors;
    late events inside the watermark still extend their session."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_dir)
    sessions = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_with_state(gap_seconds),
            _SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.format("parquet")
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
