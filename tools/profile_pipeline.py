#!/usr/bin/env python
"""Phase profiler for the medallion pipeline (guide §1): runs the e2e
build + unchanged rerun + CDC rerun with per-model wall times, Spark
JOB counts per model (exact even on a contended box), and a gate-vs-
write split from timing wrappers around QualitySpec.violations and the
ParquetTable writers.

Usage: python tools/profile_pipeline.py [workers]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if len(sys.argv) > 1:
        os.environ["SPARK_GRAFT_PIPELINE_WORKERS"] = sys.argv[1]

    from nomba_data_pipeline_spark.operators.merge import ParquetTable
    from nomba_data_pipeline_spark.plans import models as M
    from nomba_data_pipeline_spark.plans.cdc_sim import simulate_plan_updates
    from nomba_data_pipeline_spark.plans.pipeline import build_pipeline
    from nomba_data_pipeline_spark.plans.quality import QualitySpec
    from nomba_data_pipeline_spark.session import get_spark

    # timing wrappers: accumulate per-phase seconds keyed by phase name
    acc: dict[str, float] = {}
    ncalls: dict[str, int] = {}

    def wrap(cls, name, label):
        orig = getattr(cls, name)

        def timed(self, *a, **kw):
            t0 = time.perf_counter()
            try:
                return orig(self, *a, **kw)
            finally:
                dt = time.perf_counter() - t0
                acc[label] = acc.get(label, 0.0) + dt
                ncalls[label] = ncalls.get(label, 0) + 1

        setattr(cls, name, timed)

    wrap(QualitySpec, "violations", "gate")
    for m in ("overwrite", "merge_upsert", "merge_upsert_dedup",
              "_merge_scoped_partitions", "high_water_mark_stats",
              "row_count_stats"):
        wrap(ParquetTable, m, m)

    spark = get_spark(app_name="pipeline-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # warmup
    from nomba_data_pipeline_spark.plans.queries import REGISTRY

    REGISTRY["flagship_revenue_by_region"].fn(spark, SF_DIR).count()

    def snap():
        out = {k: round(v, 3) for k, v in acc.items()}
        acc.clear()
        ncl = dict(ncalls)
        ncalls.clear()
        return out, ncl

    wh = tempfile.mkdtemp(prefix="prof-wh-")
    try:
        for phase in ("e2e_cold", "e2e_fresh_warm", "rerun_unchanged", "cdc_rerun"):
            if phase == "e2e_fresh_warm":
                shutil.rmtree(wh, ignore_errors=True)
                wh = tempfile.mkdtemp(prefix="prof-wh-")
            override = None
            if phase == "cdc_rerun":
                override = {
                    "stg_plans": lambda s, sfd: simulate_plan_updates(
                        M.stg_plans(s, sfd), 0.01
                    )
                }
            runner = build_pipeline(spark, wh, SF_DIR, source_override=override)
            group = f"prof-{phase}"
            sc.setJobGroup(group, phase)
            t0 = time.perf_counter()
            runner.run()
            wall = time.perf_counter() - t0
            njobs = len(sc.statusTracker().getJobIdsForGroup(group))
            phases, calls = snap()
            print(f"\n== {phase}: wall={wall:.2f}s jobs={njobs}")
            print("  per-model:", {k: v for k, v in runner.last_timings.items()})
            print("  per-phase:", phases)
            print("  calls:    ", calls)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
