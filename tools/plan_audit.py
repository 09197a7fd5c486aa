"""Automated physical-plan census over the whole query registry.

For every registered query, compile the plan at the given sf_dir and
count the operators that define its scale shape:

- ``exchanges``      bare shuffle Exchange nodes (word-boundary match —
                     excludes Broadcast/ReusedExchange)
- ``broadcasts``     BroadcastExchange nodes (cheap by design)
- ``python_stages``  ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
                     nodes — the Python boundary; ~0 everywhere except the
                     extraction/multimodal kernels is the design claim
- ``take_ordered``   TakeOrderedAndProject present (top-k compiled to a
                     heap, not a global sort)
- ``sorts``          global Sort nodes outside window/join internals is a
                     smell the per-query PLANS.md rows explain
- ``global_windows`` Window nodes with NO partition spec (all rows move
                     to a single partition). Legal ONLY over
                     domain-bounded relations (histogram cells,
                     candidate sets, per-source reports) — a corpus-
                     sized relation under a global window is a scale
                     bug; test_plan_shapes.py pins every nonzero count
                     with a boundedness justification

Output: one JSON object to stdout and PLAN_AUDIT.json — machine-readable
evidence backing PLANS.md / tests/test_plan_shapes.py (which pin only the
shuffle-stable subset; this audit records everything).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def count_global_windows(plan: str) -> int:
    """Window nodes with no partition spec. WindowExec prints
    ``Window [exprs], [partitionSpec?], [orderSpec?]`` with EMPTY specs
    omitted, so bracket-group count alone is ambiguous: partitioned-
    unordered (``count(*) over (partition by k)``) and unpartitioned-
    ordered both print two groups. The discriminator (verified
    empirically): order-spec entries always carry a sort direction
    (``ASC NULLS FIRST`` / ``DESC NULLS LAST``), partition columns
    never do. A node is GLOBAL iff its LAST top-level bracket group is
    either the expr list itself (one group: no partition, no order) or
    an order spec (two groups whose second contains a sort direction).
    Bracket depth is tracked so commas/brackets nested inside window
    expressions don't miscount."""
    n = 0
    for line in plan.splitlines():
        m = re.search(r"\bWindow \[", line)
        if m is None:
            continue
        depth = 0
        groups: list[str] = []
        buf: list[str] = []
        for ch in line[m.start() + len("Window ") :]:
            if ch == "[":
                if depth == 0:
                    buf = []
                else:
                    buf.append(ch)
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(buf))
                else:
                    buf.append(ch)
            elif depth > 0:
                buf.append(ch)
        if len(groups) == 1:
            n += 1
        elif len(groups) == 2 and re.search(
            r"\b(ASC|DESC) NULLS", groups[1]
        ):
            n += 1
    return n


def audit(sf_dir: str) -> dict:
    from german_ocr_spark.queries import QUERIES
    from german_ocr_spark.session import get_spark

    spark = get_spark(cores=8, app_name="plan-audit")
    out = {}
    for name in sorted(QUERIES):
        try:
            plan = (
                QUERIES[name](spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # drivers-side iterative queries may collect
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
            continue
        out[name] = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
            "python_stages": len(
                re.findall(
                    r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
                    plan,
                )
            ),
            "take_ordered": "TakeOrderedAndProject" in plan,
            "sorts": len(re.findall(r"\bSort\b", plan)),
            "global_windows": count_global_windows(plan),
        }
    spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    res = audit(sf_dir)
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(res),
        "zero_shuffle": sorted(
            n for n, v in res.items() if v.get("exchanges") == 0
        ),
        "python_stage_queries": sorted(
            n for n, v in res.items() if v.get("python_stages", 0) > 0
        ),
        "global_window_queries": sorted(
            n for n, v in res.items() if v.get("global_windows", 0) > 0
        ),
        "queries": res,
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLAN_AUDIT.json"),
        "w",
    ) as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({
        "n_queries": summary["n_queries"],
        "zero_shuffle": len(summary["zero_shuffle"]),
        "python_stage_queries": summary["python_stage_queries"],
        "global_window_queries": len(summary["global_window_queries"]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
