"""A19 infra-failure half: Spark task retry. Per-row error isolation
covers DATA failures; a TRANSIENT task crash (executor OOM-kill, node
loss) must be retried by the scheduler and — because every kernel is a
pure deterministic function — reproduce its partition exactly, losing
and duplicating nothing. Runs in a subprocess because local mode only
retries with a ``local[N,F]`` master, which must be set at JVM start.
Mirrors the reference's transport retry policy
(``cloud_client.py:210-218``) at the task layer."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, "@REPO@")
from german_ocr_spark.session import get_spark
from german_ocr_spark.synth import synth_docs, docs_to_spark
from german_ocr_spark.operators.extract import ordered_span_rows, run_extract
from german_ocr_spark.golden import golden_extract
import pandas as pd

spark = get_spark(cores="4,2", app_name="retry-test", shuffle_partitions=4)
docs = synth_docs(100, seed=9)
rows = ordered_span_rows(docs_to_spark(spark, docs)).repartition(4)

def flaky(batches):
    from pyspark import TaskContext
    tc = TaskContext.get()
    if tc.partitionId() == 0 and tc.attemptNumber() == 0:
        print("INJECTED_TRANSIENT_FAILURE", file=sys.stderr)
        raise RuntimeError("injected transient failure (attempt 0)")
    for b in batches:
        yield b

ddl = ("doc_id string, `order` int, offset int, kind string, "
       "text string, media_ref string")
flaked = rows.mapInPandas(flaky, schema=ddl)
out = (run_extract(flaked).toPandas()
       .sort_values(["doc_id", "order"]).reset_index(drop=True))
want = golden_extract(docs).reset_index(drop=True)
pd.testing.assert_frame_equal(
    out.astype({"order": "int64"}), want.astype({"order": "int64"}),
    check_dtype=False)
print("RETRY_OK rows=", len(out))
spark.stop()
"""


def test_transient_task_failure_is_retried_exactly_once():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@REPO@", REPO)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # the failure really fired (the test is not vacuous) ...
    assert "INJECTED_TRANSIENT_FAILURE" in r.stderr
    # ... and the job still produced the exact golden output
    assert "RETRY_OK" in r.stdout
