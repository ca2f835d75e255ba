#!/usr/bin/env python
"""Per-query profiler: times each registry row like bench.py does
(fn().count(), two reps) and records how many Spark JOBS the second rep
launched (via a per-query job group). High job counts flag queries that
run driver-side actions / eager checkpoints inside their fn — the
§1-measure step for deciding where per-query fixed costs go.

Usage:
    python tools/profile_queries.py [name ...]     # default: bench HEADLINE order
Writes /tmp/query_profile.tsv: name, rep1_s, rep2_s, n_jobs_rep2.
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from nomba_data_pipeline_spark.plans.queries import REGISTRY
    from nomba_data_pipeline_spark.session import get_spark

    names = sys.argv[1:] or [n for n in bench.HEADLINE if n in REGISTRY]
    spark = get_spark(app_name="query-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warmup, mirroring bench.py
    REGISTRY["flagship_revenue_by_region"].fn(spark, SF_DIR).count()

    rows = []
    for name in names:
        reps = []
        n_jobs = -1
        for rep in range(2):
            group = f"prof-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                REGISTRY[name].fn(spark, SF_DIR).count()
            except Exception as e:  # noqa: BLE001
                print(f"{name}: ERROR {type(e).__name__}: {e}"[:200], flush=True)
                reps = None
                break
            reps.append(time.perf_counter() - t0)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup("idle", "idle")
        if reps is None:
            continue
        rows.append((name, round(reps[0], 3), round(reps[1], 3), n_jobs))
        print(f"{name:42s} rep1={reps[0]:7.3f} rep2={reps[1]:7.3f} jobs={n_jobs}", flush=True)

    out = "/tmp/query_profile.tsv"
    with open(out, "w") as f:
        f.write("name\trep1_s\trep2_s\tjobs\n")
        for r in rows:
            f.write("\t".join(map(str, r)) + "\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
