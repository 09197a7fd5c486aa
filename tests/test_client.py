"""Reference-API parity facade (client.py): the german-ocr method
surface — extract / extract_batch / submit / get_job /
wait_for_result / cancel_job / analyze / get_usage / get_balance /
analyze_v2 / list_v2_templates / context manager — behaves like the
reference over the Spark engine (order preservation, error isolation,
poll-loop semantics, swallow-to-False cancel, lineage-rollup usage,
synchronous per-template structured extraction)."""

from __future__ import annotations

import pytest

from german_ocr_spark.client import GermanOCRSpark
from german_ocr_spark.golden import golden_extract
from german_ocr_spark.synth import docs_to_spark, synth_docs


@pytest.fixture()
def client(spark, tmp_path):
    return GermanOCRSpark(spark, str(tmp_path / "jobs"))


def test_extract_single_doc(client):
    docs = synth_docs(3, seed=42)
    res = client.extract(docs[0])
    assert res.doc_id == docs[0][0]
    golden = golden_extract(docs[:1])
    want = "\n".join(golden.sort_values("order")["text"])
    assert res.text == want


def test_extract_batch_preserves_order_and_isolates_errors(client):
    docs = synth_docs(40, seed=7)
    results = client.extract_batch(docs)
    # list position == input position (the reference zip contract)
    assert [r.doc_id for r in results] == [d[0] for d in docs]
    golden = golden_extract(docs)
    err_docs = set(golden.loc[golden["error"].notna(), "doc_id"])
    assert err_docs  # the synth corpus plants malformed spans
    for r in results:
        assert r.success == (r.doc_id not in err_docs)
        if not r.success:
            assert r.errors  # message surfaced, batch not aborted


def test_submit_wait_analyze_roundtrip(client, spark):
    docs = docs_to_spark(spark, synth_docs(50, seed=9))
    st = client.submit(docs, n_buckets=4)
    assert st.status in ("pending", "processing", "completed")
    seen = []
    out = client.wait_for_result(
        st.job_id, poll_interval=0.2, max_wait=300,
        on_progress=lambda s: seen.append(s.buckets_done),
    )
    assert out.count() > 0
    assert seen and seen == sorted(seen)  # monotone progress stream
    # final status is completed and countable via get_job
    done = client.get_job(st.job_id)
    assert done.status == "completed"
    assert done.span_count == out.count()


def test_analyze_composite(client, spark):
    docs = docs_to_spark(spark, synth_docs(30, seed=13))
    out = client.analyze(docs, n_buckets=4, poll_interval=0.2)
    assert out.count() > 0


def test_cancel_job_swallow_contract(client):
    # unknown job id -> False, never a raise (cloud_client.py:399-413)
    assert client.cancel_job("job-does-not-exist") is False


def test_context_manager(spark, tmp_path):
    with GermanOCRSpark(spark, str(tmp_path / "jobs")) as c:
        res = c.extract(synth_docs(1, seed=5)[0])
        assert res.doc_id


def test_job_ids_are_durable_across_instances(client, spark, tmp_path):
    """A NEW client over the same workdir must continue the job-id
    sequence (reusing a finished id would silently return the old
    job's output) and must be able to poll the old job via the
    persisted config."""
    docs = docs_to_spark(spark, synth_docs(20, seed=17))
    st1 = client.submit(docs, n_buckets=4)
    client.wait_for_result(st1.job_id, poll_interval=0.2, max_wait=300)

    fresh = GermanOCRSpark(spark, client._workdir)
    # cross-instance status poll through the durable store
    assert fresh.get_job(st1.job_id).status == "completed"
    st2 = fresh.submit(docs_to_spark(spark, synth_docs(5, seed=18)),
                       n_buckets=4)
    assert st2.job_id != st1.job_id
    out = fresh.wait_for_result(st2.job_id, poll_interval=0.2, max_wait=300)
    # the new job's output is the NEW input's extraction (5 docs), not
    # a replay of the old job's 20-doc result
    assert out.select("doc_id").distinct().count() <= 5


def test_failed_job_raises_not_timeout(client, spark):
    # wrong schema -> pipeline.run raises inside the worker; the poll
    # loop must surface 'failed' quickly instead of burning max_wait
    bad = spark.createDataFrame([(1, "x")], "a long, b string")
    st = client.submit(bad, n_buckets=4)
    with pytest.raises(RuntimeError, match="failed"):
        client.wait_for_result(st.job_id, poll_interval=0.2, max_wait=60)


def test_model_catalog_parity(client):
    """list_available_models / get_model_name parity with the
    reference's model registry (ollama_backend.py:13-59): copy
    semantics, short-key resolution, unknown-key passthrough — and
    the Spark-shaped list_models() dimension DataFrame."""
    from german_ocr_spark.client import (
        AVAILABLE_KERNELS,
        get_model_name,
        list_available_models,
    )

    cat = list_available_models()
    assert set(cat) == set(AVAILABLE_KERNELS)
    cat["text"]["name"] = "mutated"  # a copy, like the reference's .copy()
    assert AVAILABLE_KERNELS["text"]["name"] == "kernel/text-passthrough"
    assert get_model_name("ocr") == "kernel/german-ocr-post"
    assert get_model_name("not-a-kernel") == "not-a-kernel"

    df = client.list_models()
    assert df.count() == len(AVAILABLE_KERNELS)
    assert df.columns == ["key", "name", "display", "stage", "description"]
    by_key = {r.key: r.name for r in df.collect()}
    assert by_key["html"] == "kernel/html-boilerplate"


def test_get_usage_rollup(client, spark):
    """get_usage parity (reference cloud_client.py:531-534): one row
    per job with committed totals that MATCH the jobs' own results,
    and a terminal status derived from the lineage alone."""
    # empty workdir → empty report with the full schema
    empty = client.get_usage()
    assert empty.count() == 0
    assert empty.columns == [
        "job_id", "status", "buckets_done", "buckets_total",
        "doc_count", "span_count", "error_count", "n_files",
        "first_commit_at", "last_commit_at",
    ]

    raw_a, raw_b = synth_docs(30, seed=3), synth_docs(12, seed=4)
    # lineage doc_count meters documents that produced extracted spans;
    # zero-span docs (the synth corpus plants some) contribute nothing
    n_a = sum(1 for _, spans in raw_a if spans)
    n_b = sum(1 for _, spans in raw_b if spans)
    out_a = client.analyze(docs_to_spark(spark, raw_a), n_buckets=4,
                           max_wait=300)
    out_b = client.analyze(docs_to_spark(spark, raw_b), n_buckets=2,
                           max_wait=300)

    rows = {r.job_id: r for r in client.get_usage().collect()}
    assert len(rows) == 2
    a, b = sorted(rows)
    assert rows[a].status == "completed" and rows[b].status == "completed"
    assert rows[a].buckets_done == rows[a].buckets_total == 4
    assert rows[b].buckets_done == rows[b].buckets_total == 2
    assert rows[a].doc_count == n_a and rows[b].doc_count == n_b
    assert rows[a].span_count == out_a.count()
    assert rows[b].span_count == out_b.count()
    assert rows[a].n_files > 0
    assert rows[a].first_commit_at <= rows[a].last_commit_at


def test_get_balance_stand_in(client, spark):
    """get_balance parity (cloud_client.py:527-529): the method exists
    with the reference dict shape, reports an EXPLICIT null balance
    (no invented credit), and meters real processed totals."""
    bal0 = client.get_balance()
    assert bal0["balance"] is None and bal0["currency"] == "EUR"
    assert bal0["jobs"] == 0 and bal0["documents_processed"] == 0

    raw = synth_docs(8, seed=5)
    client.analyze(docs_to_spark(spark, raw), n_buckets=2, max_wait=300)
    bal = client.get_balance()
    assert bal["jobs"] == 1
    assert bal["documents_processed"] == sum(1 for _, s in raw if s)
    assert bal["spans_processed"] > 0


def test_analyze_v2_templates(client, spark):
    """/v2/analyze parity (reference README.md:241-274): synchronous
    per-template structured extraction over real documents, using the
    SAME field builders the oracle-checked q91/q233/q235 validate."""
    from pyspark.sql import functions as F

    from german_ocr_spark.schema import DOCUMENTS_SPANS_SCHEMA

    inv_txt = (
        "Rechnung Nr. RE-2024-77 vom 05.03.2024 Kundennr. 9 "
        "Gesamtbetrag: 1.234,56 EUR"
    )
    dn_txt = (
        "Lieferschein Nr. LS-2024-8 vom 12.01.2024 Empfaenger: Firma "
        "Müller GmbH Positionen: 3x Artikel A-101; 5x Artikel A-102"
    )
    lt_txt = (
        "Schreiben von Absender: Firma Weber KG vom 01.02.2024 IBAN: "
        "DE44123456781234567890 Betreff: Vertragsunterlagen"
    )
    docs = spark.createDataFrame(
        [
            ("inv", [("text", inv_txt, "", 0)]),
            ("dn", [("text", dn_txt, "", 0)]),
            ("lt", [("text", lt_txt, "", 0)]),
        ],
        schema=DOCUMENTS_SPANS_SCHEMA,
    )

    inv = client.analyze_v2(docs, template="invoice").filter(
        F.col("doc_id") == "inv"
    ).first()
    assert inv.invoice_no == "RE-2024-77"
    assert inv.invoice_date == "2024-03-05"
    assert inv.amount_cents == 123456

    dn = client.analyze_v2(docs, template="delivery-notes").filter(
        F.col("doc_id") == "dn"
    ).first()
    assert dn.beleg_no == "LS-2024-8"
    assert dn.beleg_date == "2024-01-12"
    assert dn.empfaenger == "Firma Müller GmbH"
    assert dn.n_positionen == 2 and dn.qty_total == 8

    gen = {r.doc_id: r for r in client.analyze_v2(docs).collect()}
    assert gen["inv"].document_type == "invoice"
    assert gen["dn"].document_type == "delivery-notes"
    assert gen["lt"].document_type == "general"
    assert gen["lt"].iban == "DE44123456781234567890"
    assert gen["lt"].sender == "Firma Weber KG"
    assert gen["inv"].amount_cents == 123456
    assert gen["dn"].amount_cents is None

    with pytest.raises(ValueError, match="unknown v2 template"):
        client.analyze_v2(docs, template="not-a-template")

    cat = {r.template for r in client.list_v2_templates().collect()}
    assert cat == {
        "general", "invoice", "delivery-notes", "document-intelligence"
    }


def test_analyze_v2_document_intelligence_route(client, spark):
    from german_ocr_spark.kernels.parse import serialize_records
    from german_ocr_spark.schema import DOCUMENTS_SPANS_SCHEMA

    blocks = serialize_records(
        [[1, 50.0, 20.0, 550.0, 35.0, "kopf"],
         [1, 50.0, 60.0, 550.0, 90.0, "rumpf"]]
    )
    docs = spark.createDataFrame(
        [("d", [("pdf", blocks, "", 0)])], schema=DOCUMENTS_SPANS_SCHEMA
    )
    out = client.analyze_v2(docs, template="document-intelligence")
    rows = sorted(out.collect(), key=lambda r: r.block_rank)
    assert [r.text for r in rows] == ["kopf", "rumpf"]
    assert rows[0].x1 == 550.0 and rows[0].page == 1


def test_get_usage_status_parity_with_get_job(client, spark, tmp_path):
    """get_usage must derive status with EXACTLY pipeline.status()'s
    arithmetic (round-4 ADVICE): completed takes precedence, and
    cancelled counts only when cancel rows OUTNUMBER resume rows — a
    job cancelled mid-run then resumed to completion reports
    'completed' through BOTH get_job and get_usage."""
    import os

    from german_ocr_spark.plans import lineage as lin

    raw = synth_docs(10, seed=7)
    client.analyze(docs_to_spark(spark, raw), n_buckets=2, max_wait=300)
    job_id = sorted(
        n for n in os.listdir(client._workdir)
        if os.path.isfile(os.path.join(client._workdir, n, "_job.json"))
    )[0]
    out = os.path.join(client._workdir, job_id)
    # cancel intent recorded, then a resume durably cleared it
    lin.mark_cancelled(spark, out, "snap-x", "2026-01-01T00:00:00Z")
    lin.mark_resumed(spark, out, "snap-x", "2026-01-01T00:01:00Z")
    assert client.get_job(job_id).status == "completed"
    row = client.get_usage().collect()[0]
    assert row.status == "completed"
    # an OUTSTANDING cancel on an incomplete job still reports cancelled
    lin.mark_cancelled(spark, out, "snap-y", "2026-01-02T00:00:00Z")
    assert client.get_usage().collect()[0].status == "completed"  # done wins


def test_get_usage_tolerates_job_without_lineage(client, spark):
    """A job submitted but not yet through record_bucketing has a
    _job.json and no _lineage dir; the workdir-wide report must list
    it as 'pending' with zero counts instead of raising (round-4
    ADVICE)."""
    import json
    import os

    raw = synth_docs(6, seed=8)
    client.analyze(docs_to_spark(spark, raw), n_buckets=2, max_wait=300)
    ghost = os.path.join(client._workdir, "job-ghost")
    os.makedirs(ghost, exist_ok=True)
    with open(os.path.join(ghost, "_job.json"), "w") as fh:
        json.dump({"job_id": "job-ghost", "n_buckets": 8}, fh)
    # ...and a job whose _lineage dir EXISTS but is empty (a crash
    # between makedirs and the first atomic rename) must also appear
    # as pending instead of silently vanishing from the report
    husk = os.path.join(client._workdir, "job-husk")
    os.makedirs(os.path.join(husk, "_lineage"), exist_ok=True)
    with open(os.path.join(husk, "_job.json"), "w") as fh:
        json.dump({"job_id": "job-husk", "n_buckets": 4}, fh)
    rows = {r.job_id: r for r in client.get_usage().collect()}
    assert len(rows) == 3
    g = rows["job-ghost"]
    assert g.status == "pending" and g.buckets_total == 8
    assert g.doc_count == 0 and g.n_files == 0
    assert g.first_commit_at is None
    h = rows["job-husk"]
    assert h.status == "pending" and h.buckets_total == 4
    # the completed job still reports normally alongside the husks
    other = [r for j, r in rows.items() if j not in ("job-ghost", "job-husk")][0]
    assert other.status == "completed"
    # balance rolls the mixed report up without failing
    assert client.get_balance()["jobs"] == 3
