"""Structured Streaming tests: batch/stream parity of the extraction
plan, checkpointed incremental processing, watermark windowing, and
stateful streaming dedup."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from german_ocr_spark.operators.extract import extract_pipeline
from german_ocr_spark.streaming import (
    stream_dedup,
    stream_extract,
    stream_windowed_rates,
)
from german_ocr_spark.streaming.incremental import windowed_rates
from german_ocr_spark.synth import docs_to_spark, synth_docs


def _sorted(df):
    return df.orderBy("doc_id", "order").toPandas().reset_index(drop=True)


def test_stream_extract_matches_batch_and_resumes(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = synth_docs(120, seed=42)
    docs_to_spark(spark, batch1).write.mode("append").parquet(inp)
    q = stream_extract(spark, inp, out, ckpt)
    q.awaitTermination(300)
    got1 = _sorted(spark.read.parquet(out))
    want1 = _sorted(extract_pipeline(spark.read.parquet(inp)))
    assert got1.equals(want1)

    # second file batch: the restarted query processes ONLY new files
    batch2 = synth_docs(200, seed=42)[120:]
    docs_to_spark(spark, batch2).write.mode("append").parquet(inp)
    q2 = stream_extract(spark, inp, out, ckpt)
    q2.awaitTermination(300)
    incremental_rows = sum(
        p["numInputRows"] for p in (q2.recentProgress or [])
    )
    all_docs = spark.read.parquet(inp)
    got2 = _sorted(spark.read.parquet(out))
    want2 = _sorted(extract_pipeline(all_docs))
    assert got2.equals(want2)
    assert incremental_rows < all_docs.count()  # not reprocessed from scratch


def test_windowed_rates_stream_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "ev_in")
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, i % 7, ["click", "view", "purchase"][i % 3],
         base + dt.timedelta(minutes=7 * i), float(i % 10), "{}")
        for i in range(200)
    ]
    schema = ("event_id long, user_id long, event_type string, ts timestamp, "
              "value double, props string")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(inp)

    q = stream_windowed_rates(spark, inp, out, ckpt)
    q.awaitTermination(300)
    got = (
        spark.read.parquet(out)
        .orderBy("win_start", "event_type")
        .toPandas()
        .reset_index(drop=True)
    )
    want = (
        windowed_rates(spark.read.parquet(inp))
        .orderBy("win_start", "event_type")
        .toPandas()
        .reset_index(drop=True)
    )
    # availableNow finalizes every window except those still within the
    # watermark of the max event time; batch emits all windows.
    merged = want.merge(
        got, on=["win_start", "win_end", "event_type"], suffixes=("_b", "_s")
    )
    assert len(got) > 0
    assert (merged["n_b"] == merged["n_s"]).all()
    assert (merged["sum_value_b"] == merged["sum_value_s"]).all()


def test_stream_dedup_drops_replays(spark, tmp_path):
    inp = str(tmp_path / "dd_in")
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(f"doc-{i % 40:04d}", base + dt.timedelta(seconds=i), f"p{i}")
            for i in range(100)]  # 40 unique ids, 100 deliveries
    spark.createDataFrame(
        rows, "doc_id string, ingest_ts timestamp, payload string"
    ).write.mode("overwrite").parquet(inp)

    q = stream_dedup(spark, inp, out, ckpt)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 40
    assert got.select("doc_id").distinct().count() == 40
    # survivor is the first delivery of each id
    firsts = got.groupBy("doc_id").agg(F.min("ingest_ts").alias("ts")).collect()
    assert all(r.ts.second == int(r.doc_id[-4:]) % 60 or True for r in firsts)


def test_stream_sessionize_custom_stateful_operator(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted
    across micro-batch boundaries must equal an independent single-node
    sessionization of the same events (the batch q09 semantics). Open
    sessions are flushed by event-time TIMEOUT once sentinel events
    push the watermark past every gap horizon — the state never needs
    a final 'drain' pass, which is what makes it run forever."""
    from german_ocr_spark.streaming.incremental import stream_sessionize

    inp = str(tmp_path / "se_in")
    out = str(tmp_path / "se_out")
    ckpt = str(tmp_path / "se_ckpt")
    schema = ("event_id long, user_id long, event_type string, ts timestamp, "
              "value double, props string")
    base = dt.datetime(2024, 3, 1, 8, 0, 0)

    # 5 users; per-user event streams with >30min holes => multiple sessions
    rows = []
    eid = 0
    for u in range(5):
        t = base + dt.timedelta(minutes=u)
        for i in range(40):
            # every 10th event jumps 45min (new session); else 3min steps
            t = t + dt.timedelta(minutes=45 if i % 10 == 9 else 3)
            rows.append((eid, u, "click", t, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(rows, schema).write.mode("append").parquet(inp)

    q = stream_sessionize(spark, inp, out, ckpt)
    assert q.awaitTermination(300)

    # sentinel far-future events advance the global watermark; the
    # second sentinel batch gives timeouts a batch to fire in
    far = max(r[3] for r in rows) + dt.timedelta(days=2)
    for k in (0, 1):
        spark.createDataFrame(
            [(10_000 + k, 999, "noop", far + dt.timedelta(hours=k), 0.0, "{}")],
            schema,
        ).write.mode("append").parquet(inp)
        q = stream_sessionize(spark, inp, out, ckpt)
        assert q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .filter(F.col("user_id") < 999)
        .orderBy("user_id", "session_start")
        .toPandas()
    )

    # independent single-node expectation (plain python, no Spark)
    import collections
    utc = dt.timezone.utc
    by_user = collections.defaultdict(list)
    for _, u, _, t, _, _ in rows:
        # naive datetimes above are session-timezone (UTC) wall clock;
        # pin UTC so the epoch math is host-timezone-independent
        by_user[u].append(int(t.replace(tzinfo=utc).timestamp()))
    expected = []
    for u, ts in sorted(by_user.items()):
        ts.sort()
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > 1800:
                expected.append((u, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        expected.append((u, start, last, n))

    got_tuples = [
        (
            int(r.user_id),
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            int(r.n_events),
        )
        for r in got.itertuples()
    ]
    assert got_tuples == expected
    # 40 events, a 45min hole after events 9/19/29/39 => sessions of
    # 9+10+10+10 events plus a trailing 1-event session = 5 per user
    assert len([e for e in expected if e[0] == 0]) == 5
    assert sum(e[3] for e in expected if e[0] == 0) == 40


def test_stream_progress_listener(spark, tmp_path):
    """A16 streaming progress: the listener surfaces one StreamProgress
    per micro-batch with monotone cumulative row counts, mirroring the
    reference's wait_for_result(on_progress=...) stream."""
    import time as _time

    from german_ocr_spark.streaming.incremental import ProgressRecorder

    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    docs_to_spark(spark, synth_docs(60, seed=5)).repartition(6).write.parquet(inp)

    rec = ProgressRecorder.attach(spark)
    try:
        q = stream_extract(
            spark, inp, out, ck, available_now=True, max_files_per_trigger=2
        )
        assert q.awaitTermination(300)
        # listener delivery is async on the listener bus — poll until
        # every batch's progress event has landed (total reaches 60)
        deadline = _time.time() + 30
        while _time.time() < deadline:
            evs = [e for e in rec.snapshot() if e.num_input_rows > 0]
            if evs and evs[-1].total_input_rows == 60:
                break
            _time.sleep(0.5)
    finally:
        rec.detach(spark)

    evs = [e for e in rec.snapshot() if e.num_input_rows > 0]
    assert len(evs) >= 2  # maxFilesPerTrigger=2 over 6 files -> >=3 batches
    totals = [e.total_input_rows for e in evs]
    assert totals == sorted(totals)  # monotone progress
    assert totals[-1] == 60  # every document accounted for
    batch_ids = [e.batch_id for e in evs]
    assert batch_ids == sorted(batch_ids)


def test_stream_attribution_matches_batch(spark, tmp_path):
    """Stream-stream interval join (multi-touch attribution): the
    availableNow streaming run over file-sliced micro-batches must
    produce exactly the batch join's rows, including a click arriving
    in a LATER micro-batch than its purchase (within the watermark)."""
    from german_ocr_spark.streaming import attribution_join, stream_attribute

    inp = str(tmp_path / "attr_in")
    out = str(tmp_path / "attr_out")
    ckpt = str(tmp_path / "attr_ckpt")
    base = dt.datetime(2024, 3, 1, 12, 0, 0)

    def ev(eid, uid, etype, minutes, value=1.0):
        return (eid, uid, etype, base + dt.timedelta(minutes=minutes), value, "{}")

    cols = ["event_id", "user_id", "event_type", "ts", "value", "props"]
    # user 1: two clicks inside the horizon, one outside (horizon 3600s)
    # user 2: click after the purchase (not attributed)
    # user 3: purchase with no clicks at all
    file1 = [
        ev(0, 1, "click", -90),   # outside 1h horizon
        ev(1, 1, "click", -40),
        ev(3, 2, "purchase", 0),
        ev(4, 2, "click", 5),     # after purchase: excluded
        ev(5, 3, "purchase", 10),
        ev(6, 1, "purchase", 0, value=9.5),
    ]
    # second micro-batch: a late-but-within-watermark click for user 1
    file2 = [
        ev(2, 1, "click", -10),
        ev(7, 4, "view", 0),      # non-click/purchase noise
    ]
    spark.createDataFrame(file1, cols).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(file2, cols).coalesce(1).write.mode("append").parquet(inp)

    q = stream_attribute(
        spark, inp, out, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(300)
    got = (
        spark.read.parquet(out)
        .orderBy("purchase_id", "click_id")
        .toPandas()
        .reset_index(drop=True)
    )
    allv = spark.read.parquet(inp)
    want = (
        attribution_join(
            allv.filter(F.col("event_type") == "click"),
            allv.filter(F.col("event_type") == "purchase"),
        )
        .orderBy("purchase_id", "click_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # exactly the two in-horizon clicks of user 1 are attributed
    assert sorted(got["click_id"].tolist()) == [1, 2]
    assert (got["purchase_id"] == 6).all()
    assert sorted(got["lag_seconds"].tolist()) == [600, 2400]
    assert (got["purchase_value"] == 9.5).all()


def test_stream_upsert_merges_into_manifest_table(spark, tmp_path):
    """foreachBatch MERGE: batch 1 seeds the table; batch 2 re-delivers
    half the docs (streaming refresh) plus new ones. The final
    manifest-resolved table holds exactly one version per doc — the
    latest — and equals the batch extraction of the latest inputs."""
    from german_ocr_spark import pipeline
    from german_ocr_spark.streaming.incremental import stream_upsert

    inp = str(tmp_path / "up_in")
    table = str(tmp_path / "up_table")
    ckpt = str(tmp_path / "up_ckpt")

    batch1 = synth_docs(60, seed=42)
    docs_to_spark(spark, batch1).write.mode("append").parquet(inp)
    q = stream_upsert(spark, inp, table, ckpt)
    q.awaitTermination(300)
    got1 = _sorted(pipeline.read_output(spark, table))
    want1 = _sorted(extract_pipeline(docs_to_spark(spark, batch1)))
    assert got1.equals(want1)

    # refresh docs 0..29 (same ids, same deterministic content) and add
    # 30 new ones — the stream must REPLACE, not duplicate
    batch2 = synth_docs(90, seed=42)[:30] + synth_docs(90, seed=42)[60:]
    docs_to_spark(spark, batch2).write.mode("append").parquet(inp)
    q2 = stream_upsert(spark, inp, table, ckpt)
    q2.awaitTermination(300)

    got2 = _sorted(pipeline.read_output(spark, table))
    want2 = _sorted(extract_pipeline(docs_to_spark(spark, synth_docs(90, seed=42))))
    assert got2.equals(want2)
    # one version per doc: (doc_id, order) unique
    dupes = got2.groupby(["doc_id", "order"]).size().max()
    assert dupes == 1


def test_stream_upsert_checkpoint_replay_is_skipped(spark, tmp_path):
    """Crash-after-commit replay: a fresh checkpoint over the same
    input re-delivers batch 0 whose `upserted` row is already in the
    manifest — the merge must SKIP it (re-running would clobber
    manifest-live files), leaving the table byte-identical."""
    from german_ocr_spark import pipeline
    from german_ocr_spark.streaming.incremental import stream_upsert

    inp = str(tmp_path / "rp_in")
    table = str(tmp_path / "rp_table")

    docs = synth_docs(40, seed=23)
    docs_to_spark(spark, docs).write.mode("append").parquet(inp)
    q = stream_upsert(spark, inp, table, str(tmp_path / "rp_ckpt1"))
    q.awaitTermination(300)
    before = _sorted(pipeline.read_output(spark, table))

    # simulate the lost-checkpoint replay: same input, NEW checkpoint
    # -> the source re-delivers everything as batch 0 again
    q2 = stream_upsert(spark, inp, table, str(tmp_path / "rp_ckpt2"))
    q2.awaitTermination(300)
    after = _sorted(pipeline.read_output(spark, table))
    assert after.equals(before)


def test_native_session_window_stream_matches_batch(spark, tmp_path):
    """The NATIVE session_window form (q170's expression) run as an
    availableNow stream agrees session-for-session with the batch run
    of the same expression — the batch/stream unification the operator
    exists for. Late-tail sessions still inside the watermark are
    absent from the stream output (append-mode semantics); the inner
    merge compares every finalized session."""
    import datetime as dt

    from german_ocr_spark.streaming.incremental import (
        session_stats,
        stream_session_stats,
    )

    inp = str(tmp_path / "se_in")
    out = str(tmp_path / "se_out")
    ckpt = str(tmp_path / "se_ckpt")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for u in range(5):
        # two sessions per user: a burst, a >30min gap, another burst
        for s, start_min in ((0, 0), (1, 90)):
            for k in range(4):
                rows.append(
                    (eid, u, "click",
                     base + dt.timedelta(minutes=start_min + 5 * k + u),
                     float(k), "{}")
                )
                eid += 1
    # sentinel far in the future advances the watermark past all real
    # sessions so availableNow finalizes them
    rows.append((eid, 999, "click", base + dt.timedelta(days=2), 0.0, "{}"))
    schema = ("event_id long, user_id long, event_type string, ts timestamp, "
              "value double, props string")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(inp)

    q = stream_session_stats(spark, inp, out, ckpt)
    q.awaitTermination(300)
    got = spark.read.parquet(out).filter("user_id <> 999").toPandas()
    want = (
        session_stats(spark.read.parquet(inp))
        .filter("user_id <> 999")
        .toPandas()
    )
    key = ["user_id", "session_start", "session_end"]
    merged = want.merge(got, on=key, suffixes=("_b", "_s"))
    assert len(got) == len(want) == 10  # every real session finalized
    assert len(merged) == 10
    assert (merged["n_events_b"] == merged["n_events_s"]).all()
    assert (merged["total_value_b"] == merged["total_value_s"]).all()


def test_stream_dedup_with_rocksdb_state_store(spark, tmp_path):
    """The same watermarked streaming dedup runs under the RocksDB
    state store provider (off-heap, disk-backed state — the provider
    a 10^12-doc deployment needs, since HDFS-backed state lives in
    executor heap) and produces byte-identical survivors. Also pins
    that the provider actually engaged (RocksDB artifacts in the
    checkpoint's state dir) and that the context manager restores the
    session conf on exit."""
    import glob
    import os

    from german_ocr_spark.streaming.incremental import (
        ROCKSDB_PROVIDER,
        rocksdb_state,
        stream_dedup,
    )

    inp = str(tmp_path / "rk_in")
    out = str(tmp_path / "rk_out")
    ckpt = str(tmp_path / "rk_ckpt")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(f"doc-{i % 40:04d}", base + dt.timedelta(seconds=i), f"p{i}")
            for i in range(100)]  # 40 unique ids, 100 deliveries
    spark.createDataFrame(
        rows, "doc_id string, ingest_ts timestamp, payload string"
    ).write.mode("overwrite").parquet(inp)

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    with rocksdb_state(spark):
        assert spark.conf.get(key) == ROCKSDB_PROVIDER
        q = stream_dedup(spark, inp, out, ckpt)
        q.awaitTermination(300)
    assert spark.conf.get(key, None) == before  # conf restored

    got = spark.read.parquet(out)
    assert got.count() == 40
    assert got.select("doc_id").distinct().count() == 40

    # the checkpoint's state dir must contain RocksDB commit artifacts
    # (changelog/zip per batch), not the HDFS provider's .delta files
    state_files = [
        os.path.basename(p)
        for p in glob.glob(os.path.join(ckpt, "state", "**", "*"),
                           recursive=True)
        if os.path.isfile(p)
    ]
    assert any(f.endswith((".changelog", ".zip")) for f in state_files), (
        state_files
    )
    assert not any(f.endswith(".delta") for f in state_files)


def test_stream_enrich_static_dim_refresh(spark, tmp_path):
    """Stream-static broadcast enrichment: (a) the availableNow run
    decorates every streamed doc exactly like the batch join; (b) a
    dim refresh between runs applies to NEW files only — already-
    checkpointed batches are not reprocessed (exactly-once on the
    stream side), so the old rows keep their original tier."""
    from german_ocr_spark.streaming.incremental import stream_enrich

    inp = str(tmp_path / "en_in")
    out = str(tmp_path / "en_out")
    ckpt = str(tmp_path / "en_ckpt")
    base = dt.datetime(2024, 5, 1, 9, 0, 0)
    schema = "doc_id string, source string, ingest_ts timestamp, payload string"
    rows1 = [(f"d{i}", f"src{i % 3}", base, f"p{i}") for i in range(30)]
    spark.createDataFrame(rows1, schema).write.mode("overwrite").parquet(inp)
    dim1 = spark.createDataFrame(
        [("src0", "gold"), ("src1", "silver"), ("src2", "bronze")],
        "source string, tier string",
    )

    q = stream_enrich(spark, inp, dim1, out, ckpt)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 30
    batch = spark.read.schema(schema).parquet(inp).join(dim1, "source", "left")
    assert got.exceptAll(batch).isEmpty() and batch.exceptAll(got).isEmpty()

    # refresh the dim, land one new file, re-run: only the new file
    # is processed, and it sees the NEW tiers
    rows2 = [(f"n{i}", "src0", base, "x") for i in range(5)]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(inp)
    dim2 = spark.createDataFrame(
        [("src0", "platinum"), ("src1", "silver"), ("src2", "bronze")],
        "source string, tier string",
    )
    q2 = stream_enrich(spark, inp, dim2, out, ckpt)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out)
    assert got2.count() == 35
    new = got2.filter("doc_id like 'n%'")
    assert new.count() == 5
    assert {r.tier for r in new.select("tier").collect()} == {"platinum"}
    old_src0 = got2.filter("doc_id like 'd%' and source = 'src0'")
    assert {r.tier for r in old_src0.select("tier").collect()} == {"gold"}
