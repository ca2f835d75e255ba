#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The per-query action is count() (forces full execution of every
operator without driver-side collect of wide results).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "flagship_revenue_by_region",
    "fact_enriched",
    "pricing_summary",
    "keep_latest_per_key",
    "sessionize",
    "minute_rollup",
    "scd2_intervals",
    "doc_stats",
    "exact_dedup_groups",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "cosine_topk",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "embedding_near_dup",
    "simhash_near_dup",
    "winnow_fingerprints",
    "corpus_prep",
    "supplier_part_volume",
    "asof_join",
    "range_join_count",
    "revenue_rollup",
    "percentiles_by_flag",
]


def main() -> None:
    import shutil
    import tempfile

    from nomba_data_pipeline_spark.plans import models as M
    from nomba_data_pipeline_spark.plans.cdc_sim import simulate_plan_updates
    from nomba_data_pipeline_spark.plans.pipeline import build_pipeline
    from nomba_data_pipeline_spark.plans.queries import REGISTRY
    from nomba_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="nomba-bench")
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # one warmup pass of the flagship to absorb JVM/codegen startup
    try:
        REGISTRY["flagship_revenue_by_region"].fn(spark, SF_DIR).count()
    except Exception as e:  # noqa: BLE001 - warmup failure must not kill the run
        errors["_warmup"] = f"{type(e).__name__}: {e}"[:500]

    # best-of-2 per query: local[32] timings vary ~30% run-to-run (GC,
    # first-listing effects); the minimum is the stable signal.
    # Per-query try/except: one broken query must never cost the whole
    # bench (BENCH_r02/r03 were rc=1 with zero numbers for exactly this).
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                REGISTRY[name].fn(spark, SF_DIR).count()
            except Exception as e:  # noqa: BLE001 - record and move on
                errors[name] = f"{type(e).__name__}: {e}"[:500]
                best = float("inf")
                break
            best = min(best, time.perf_counter() - t0)
        if best < float("inf"):
            timings[name] = round(best, 3)

    # end-to-end medallion pipeline (BASELINE.md "full pipeline ~5 min"
    # comparable) + incremental CDC rerun (BASELINE "delta load ~5 sec")
    wh = tempfile.mkdtemp(prefix="bench-wh-")
    try:
        t0 = time.perf_counter()
        build_pipeline(spark, wh, SF_DIR).run()
        timings["pipeline_e2e_medallion"] = round(time.perf_counter() - t0, 3)
        override = {
            "stg_plans": lambda s, sfd: simulate_plan_updates(M.stg_plans(s, sfd), 0.01)
        }
        t0 = time.perf_counter()
        cdc = build_pipeline(spark, wh, SF_DIR, source_override=override)
        cdc.run()
        timings["pipeline_cdc_rerun"] = round(time.perf_counter() - t0, 3)
        # per-model split: the reference's "~5 s delta load" is ONE
        # table's incremental merge; cdc_model:stg_plans (+ its fact
        # merge) is the honest comparison, the rest is whole-DAG rerun
        # cost the reference number never included
        for mname, msec in cdc.last_timings.items():
            timings[f"cdc_model:{mname}"] = msec
    except Exception as e:  # noqa: BLE001 - keep the per-query numbers
        errors["pipeline"] = f"{type(e).__name__}: {e}"[:500]
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    # cdc_model:* entries are a breakdown OF pipeline_cdc_rerun — summing
    # them too would double-count the rerun in the headline total
    total = round(
        sum(v for k, v in timings.items() if not k.startswith("cdc_model:")), 3
    )
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    # exit 0 even if individual queries errored — the JSON carries the
    # per-query error detail; rc!=0 would discard every timing
    main()
    sys.exit(0)
