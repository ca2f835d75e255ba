#!/usr/bin/env python
"""Interleaved process-level A/B of SparkSession config sets.

Each arm runs in its own subprocess (fresh JVM, fresh session) so a conf
set actually takes effect; arms alternate A,B,B,A,A,B,... per round so
slow box drift cancels instead of biasing one arm. Per-query timing uses
the bench methodology (fn().count(), warm rep after one cold rep).

Usage:
    python tools/ab_conf.py run  <rounds> <out.jsonl>   # orchestrator
    python tools/ab_conf.py arm  <conf_json> <rows_json> <out_json>  # child

Edit CONF_A / CONF_B / ROWS below for the experiment at hand; the
orchestrator records both conf sets in the output so the log is
self-describing.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# ---- experiment definition -------------------------------------------------
CONF_A: dict[str, str] = {  # baseline = session.py defaults at r15 close
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.io.compression.codec": "lz4",
}
CONF_B: dict[str, str] = {  # candidate = guide §9 baseline (combined flags)
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.io.compression.codec": "zstd",
}
ROWS = [
    "flagship_revenue_by_region",
    "fact_enriched",
    "supplier_part_volume",
    "asof_join",
    "range_join_count",
    "waiting_suppliers",
    "monthly_customer_churn",
    "neardup_clusters",
    "cohort_retention",
    "fuzzy_name_blocked",
    "source_precedence_dedup",
    "snapshot_table_diff",
    "graph_pagerank",
    "containment_pairs",
    "basket_part_pairs",
    "semi_anti_cohorts",
]
# -----------------------------------------------------------------------------


def arm(conf_json: str, rows_json: str, out_json: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nomba_data_pipeline_spark.plans.queries import REGISTRY
    from nomba_data_pipeline_spark.session import get_spark

    conf = json.loads(conf_json)
    rows = [r for r in json.loads(rows_json) if r in REGISTRY]
    spark = get_spark(app_name="ab-conf", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup row bench.py uses
    REGISTRY["flagship_revenue_by_region"].fn(spark, SF_DIR).count()
    out: dict[str, float] = {}
    for name in rows:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        REGISTRY[name].fn(spark, SF_DIR).count()  # cold rep, discarded
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, SF_DIR).count()
        out[name] = round(time.perf_counter() - t0, 4)
    with open(out_json, "w") as f:
        json.dump(out, f)
    spark.stop()


def run(rounds: int, out_path: str) -> None:
    me = os.path.abspath(__file__)
    rows_json = json.dumps(ROWS)
    samples: dict[str, dict[str, list[float]]] = {"A": {}, "B": {}}
    log = open(out_path, "a")
    log.write(json.dumps({"conf_A": CONF_A, "conf_B": CONF_B, "rows": ROWS}) + "\n")
    for rnd in range(rounds):
        order = ["A", "B"] if rnd % 2 == 0 else ["B", "A"]
        for armname in order:
            conf = CONF_A if armname == "A" else CONF_B
            tmp = f"/tmp/ab_conf_{armname}_{rnd}.json"
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, me, "arm", json.dumps(conf), rows_json, tmp],
                capture_output=True,
                text=True,
            )
            if r.returncode != 0:
                print(r.stdout[-2000:], r.stderr[-2000:])
                raise SystemExit(f"arm {armname} round {rnd} failed")
            res = json.load(open(tmp))
            for k, v in res.items():
                samples[armname].setdefault(k, []).append(v)
            log.write(json.dumps({"round": rnd, "arm": armname, "wall": round(time.time() - t0, 1), "res": res}) + "\n")
            log.flush()
            print(f"round {rnd} arm {armname}: total {sum(res.values()):.2f}s", flush=True)
    # summary: per-query medians
    tot_a = tot_b = 0.0
    print(f"\n{'query':42s} {'A med':>8s} {'B med':>8s}  B/A")
    summary = {}
    for name in ROWS:
        if name not in samples["A"]:
            continue
        ma = statistics.median(samples["A"][name])
        mb = statistics.median(samples["B"][name])
        tot_a += ma
        tot_b += mb
        summary[name] = {"A": round(ma, 3), "B": round(mb, 3)}
        print(f"{name:42s} {ma:8.3f} {mb:8.3f}  {mb / ma:5.2f}")
    print(f"{'TOTAL (median-of-rounds per query)':42s} {tot_a:8.2f} {tot_b:8.2f}  {tot_b / tot_a:5.2f}")
    log.write(json.dumps({"summary": summary, "total_A": round(tot_a, 2), "total_B": round(tot_b, 2)}) + "\n")
    log.close()


if __name__ == "__main__":
    if sys.argv[1] == "arm":
        arm(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        run(int(sys.argv[2]), sys.argv[3])
