"""Reference-CLI-parity job (jobs/cli.py): the german-ocr argument
surface (cli.py:106-244) driven end to end over both input modes."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

from german_ocr_spark.operators.multimodal import encode_fake_image
from german_ocr_spark.synth import docs_to_spark, synth_docs

# load jobs/cli.py by explicit path — no sys.path insertion, no risk of
# shadowing some other module named "cli" for the rest of the session
_spec = importlib.util.spec_from_file_location(
    "german_ocr_cli_job",
    os.path.join(os.path.dirname(__file__), "..", "jobs", "cli.py"),
)
cli_job = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cli_job)


@pytest.fixture(scope="module")
def span_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "spans.parquet")
    docs_to_spark(spark, synth_docs(40, seed=7)).write.parquet(path)
    return path


def _run_cli(argv):
    return cli_job.main(argv, stop=False)


def test_list_kernels(capsys):
    assert _run_cli(["--list-kernels"]) == 0
    out = capsys.readouterr().out.split()
    assert set(out) == {"text", "html", "pdf", "ocr", "image"}


def test_markdown_output(spark, span_table, tmp_path):
    out = str(tmp_path / "md")
    assert _run_cli([span_table, "--format", "markdown", "--output", out]) == 0
    lines = [r.value for r in spark.read.text(out).collect()]
    # one '=== doc ===' header per document with >=1 span (empty-span
    # docs contribute no output rows; they are tracked by lineage)
    n_nonempty = sum(1 for _, spans in synth_docs(40, seed=7) if spans)
    assert sum(1 for ln in lines if ln.startswith("=== ")) == n_nonempty


def test_json_output(spark, span_table, tmp_path):
    out = str(tmp_path / "js")
    assert _run_cli([span_table, "--format", "json", "--output", out]) == 0
    rows = spark.read.json(out)
    assert set(rows.columns) == {"doc_id", "result_json"}
    payload = json.loads(rows.limit(1).collect()[0]["result_json"])
    assert {"order", "kind", "text"} <= set(payload)


def test_structured_output(spark, tmp_path):
    # span text that parses as a typed invoice payload (extractor.py:19-29)
    inv = json.dumps(
        {"type": "invoice", "invoice_number": "R-1001",
         "totals": {"gross": 119.0}}
    )
    docs = docs_to_spark(
        spark, [("doc-json", [("ocr", inv, "", 0)]), ("doc-bad", [("ocr", "not json", "", 0)])]
    )
    src = str(tmp_path / "src.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "structured")
    assert _run_cli([src, "--structured", "--format", "json", "--output", out]) == 0
    rows = spark.read.json(out)
    got = {
        r["doc_id"]: json.loads(r["result_json"]) for r in rows.collect()
    }
    assert got["doc-json"]["success"] is True
    assert got["doc-json"]["doc_type"] == "invoice"
    assert got["doc-bad"]["success"] is False
    assert got["doc-bad"]["error"] == "failed to parse JSON"


def test_md_alias_matches_markdown(spark, span_table, tmp_path):
    """A4 enum normalization parity: md → markdown (cloud_client.py:
    359-362) produces byte-identical output."""
    out_md = str(tmp_path / "md_alias")
    out_full = str(tmp_path / "md_full")
    assert _run_cli([span_table, "--format", "md", "--output", out_md]) == 0
    assert _run_cli([span_table, "--format", "MarkDown", "--output", out_full]) == 0
    a = sorted(r.value for r in spark.read.text(out_md).collect())
    b = sorted(r.value for r in spark.read.text(out_full).collect())
    assert a == b and len(a) > 0


def test_n8n_output(spark, span_table, tmp_path):
    out = str(tmp_path / "n8n")
    assert _run_cli([span_table, "--format", "n8n", "--output", out]) == 0
    lines = [r.value for r in spark.read.text(out).collect()]
    item = json.loads(lines[0])
    # n8n workflow items nest the payload under a "json" key
    assert set(item) == {"json"}
    assert {"doc_id", "result_json"} <= set(item["json"])


def test_html_output(spark, span_table, tmp_path):
    out = str(tmp_path / "html")
    assert _run_cli([span_table, "--format", "html", "--output", out]) == 0
    lines = [r.value for r in spark.read.text(out).collect()]
    n_nonempty = sum(1 for _, spans in synth_docs(40, seed=7) if spans)
    assert len(lines) == n_nonempty
    assert all(
        ln.startswith('<article data-doc="') and ln.endswith("</article>")
        for ln in lines
    )


def test_structured_n8n_output(spark, tmp_path):
    inv = json.dumps({"type": "invoice", "invoice_number": "R-2002"})
    docs = docs_to_spark(spark, [("doc-json", [("ocr", inv, "", 0)])])
    src = str(tmp_path / "src.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "sn8n")
    assert _run_cli([src, "--structured", "--format", "n8n", "--output", out]) == 0
    lines = [r.value for r in spark.read.text(out).collect()]
    payload = json.loads(lines[0])["json"]
    assert json.loads(payload["result_json"])["success"] is True


def test_bare_structured_defaults_to_json(spark, tmp_path):
    inv = json.dumps({"type": "invoice", "invoice_number": "R-3003"})
    docs = docs_to_spark(spark, [("doc-json", [("ocr", inv, "", 0)])])
    src = str(tmp_path / "src.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "bare")
    # no --format: --structured must default to json, not error on the
    # markdown default
    assert _run_cli([src, "--structured", "--output", out]) == 0
    rows = spark.read.json(out)
    assert {"doc_id", "result_json"} <= set(rows.columns)


def test_html_output_escapes_markup(spark, tmp_path):
    docs = docs_to_spark(
        spark, [('doc"x', [("text", 'a <b>&amp;</b> "q"', "", 0)])]
    )
    src = str(tmp_path / "src.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "esc")
    assert _run_cli([src, "--format", "html", "--output", out]) == 0
    line = [r.value for r in spark.read.text(out).collect()][0]
    assert 'data-doc="doc&quot;x"' in line
    assert "<p>a &lt;b&gt;&amp;amp;&lt;/b&gt; &quot;q&quot;</p>" in line


def test_structured_rejects_non_json_formats(span_table, tmp_path):
    with pytest.raises(SystemExit):
        _run_cli(
            [span_table, "--structured", "--format", "text",
             "--output", str(tmp_path / "x")]
        )


def test_normalize_format_domain():
    assert cli_job.normalize_format("MD") == "markdown"
    assert cli_job.normalize_format("N8N") == "n8n"
    with pytest.raises(ValueError):
        cli_job.normalize_format("xml")


def test_batch_media_dir(spark, tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "b.png").write_bytes(encode_fake_image(4, 4, seed=1))
    (d / "a.jpg").write_bytes(encode_fake_image(4, 4, seed=2))
    (d / "skip.txt").write_bytes(b"not media")
    out = str(tmp_path / "batch")
    assert _run_cli(["--batch", str(d), "--format", "text", "--output", out]) == 0
    lines = [r.value for r in spark.read.text(out).collect()]
    # 2 allowed media files -> one image span each; .txt rejected by
    # the extension allow-list (cloud_client.py:281-297 semantics)
    assert len(lines) == 2
    assert all("\t0\t" in ln for ln in lines)
