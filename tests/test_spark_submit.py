"""End-to-end ``spark-submit --py-files`` deployment test.

The north rule's deploy clause is "run via spark-submit --py-files on a
multi-executor cluster". This test executes that deployment verbatim at
local scale: build ``german_ocr_spark.zip`` exactly as the deploy doc
says (``jobs/run_extract.py`` docstring), launch the real
``spark-submit`` binary from a scratch cwd with the repo root scrubbed
from ``PYTHONPATH`` — so the package can ONLY come from the zip, proving
the artifact is self-contained — and compare the job's span output
row-for-row against an in-process ``pipeline.run`` on the same input.

Reference analogue: ``CloudClient.analyze`` submit+wait
(``cloud_client.py:320-462``), here as a cluster batch job.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from german_ocr_spark import pipeline
from german_ocr_spark.synth import docs_to_spark, synth_docs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def build_pyfiles_zip(dest: str) -> str:
    """``zip -r german_ocr_spark.zip german_ocr_spark`` (sans caches)."""
    zip_path = os.path.join(dest, "german_ocr_spark.zip")
    pkg_root = os.path.join(REPO, "german_ocr_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    return zip_path


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not on host"
)
def test_spark_submit_pyfiles_job_matches_inprocess(spark, tmp_path):
    docs = synth_docs(150, seed=7)
    in_path = str(tmp_path / "input")
    docs_to_spark(spark, docs).repartition(4).write.parquet(in_path)

    # in-process reference run on the same input
    ref_out = str(tmp_path / "out_inprocess")
    ref_res = pipeline.run(
        spark,
        spark.read.parquet(in_path),
        ref_out,
        n_buckets=4,
        snapshot_id="snap-submit",
    )
    expected = sorted(
        (r.doc_id, r.order, r.kind, r.text, r.media_ref, r.error_code)
        for r in pipeline.read_output(spark, ref_out).collect()
    )
    assert expected, "reference run produced no spans"

    # deployed run: scratch cwd, package available only via the zip
    work = tmp_path / "deploy"
    work.mkdir()
    zip_path = build_pyfiles_zip(str(work))
    shutil.copy(os.path.join(REPO, "jobs", "run_extract.py"), work)
    sub_out = str(tmp_path / "out_submitted")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            "run_extract.py",
            "--input", in_path,
            "--output", sub_out,
            "--buckets", "4",
            "--snapshot-id", "snap-submit",
        ],
        cwd=str(work),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"

    # the entry point prints RunResult as its final JSON line
    res_line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(res_line)
    assert res["buckets_processed"] == 4
    assert res["doc_count"] == ref_res.doc_count
    assert res["span_count"] == ref_res.span_count

    got = sorted(
        (r.doc_id, r.order, r.kind, r.text, r.media_ref, r.error_code)
        for r in pipeline.read_output(spark, sub_out).collect()
    )
    assert got == expected


def test_pyfiles_zip_is_self_contained(tmp_path):
    """The deploy artifact imports and exposes the driver API with the
    repo root absent from sys.path (what executors see under
    ``--py-files``)."""
    zip_path = build_pyfiles_zip(str(tmp_path))
    code = (
        f"import sys; sys.path.insert(0, {zip_path!r}); "
        "from german_ocr_spark import pipeline, queries, synth; "
        "from german_ocr_spark.kernels import boilerplate, xycut; "
        "print(len(queries.QUERIES))"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert int(proc.stdout.strip()) >= 42
