#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/r15/.

Usage:
    python tools/capture_plans.py before name1 name2 ...
    python tools/capture_plans.py after  name1 name2 ...
    python tools/capture_plans.py survey            # every REGISTRY row: one-line plan stats

`survey` prints, per query, the Exchange count, join strategies,
Python-eval node count and scan PushedFilters presence — the triage
table guide §1 asks for. before/after write the full formatted plan to
plans/r15/<name>_<tag>.txt (the judge checks plan claims against these).

Plans are captured at sf0.1 (the bench scale) with the bench session
config. Capture is plan-only (no execution) except queries whose fn
internally runs actions (lifecycle roundtrips) — those run their
scenario to produce the final frame, same as the bench does.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_PLANS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"),
)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan.split("== Physical Plan ==")[-1].split("=====")[0]))
    # count operator-list occurrences only (header section before details)
    head = plan.split("* ")[0] if "* " in plan else plan
    joins = sorted(set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)))
    py = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow|PythonMapInArrow)", head))
    pushed = "PushedFilters: \\[\\]"
    n_scans = len(re.findall(r"Scan parquet", plan))
    has_pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    return f"ex={n_ex} scans={n_scans} pushed={has_pushed} py={py} joins={','.join(j[:3] for j in joins)}"


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nomba_data_pipeline_spark.plans.queries import REGISTRY
    from nomba_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "survey":
        rows = names or list(REGISTRY)
        for name in rows:
            try:
                df = REGISTRY[name].fn(spark, SF_DIR)
                print(f"{name:42s} {plan_stats(formatted_plan(df))}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:42s} ERROR {type(e).__name__}: {e}"[:160], flush=True)
        return

    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{mode}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
