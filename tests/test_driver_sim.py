"""Bare-session regression guard: the grading driver passes its OWN
SparkSession built without our factory confs. In-process tests can't
simulate that (getOrCreate returns the already-configured session), so
this opt-in test shells out to a fresh interpreter, builds a plain
session, and runs the conf-sensitive queries (events-table reads depend
on confs catalog.load_table must set at runtime).

Run with SPARK_GRAFT_SOAK=1 (same gate as the soak: ~60s)."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SOAK"), reason="set SPARK_GRAFT_SOAK=1 to run"
)

SCRIPT = textwrap.dedent(
    """
    from pyspark.sql import SparkSession
    import __spark_entry__ as mod

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    assert len(mod.entry(spark).collect()) > 0
    qs = mod.queries()
    # conf-sensitive set: events nano-ts reads, streaming stage+drain,
    # window frames over ts, stateful streaming; plus the round-10
    # lifecycle rows that WRITE under the bare session (its default
    # INT96 timestamps carry no footer stats, so the runner's HWM must
    # take the exact-scan fallback — regression here would silently
    # turn the delta filter off and duplicate keys)
    for name in ("mongo_extract_events", "sessionize", "minute_rollup",
                 "running_revenue", "trailing_revenue_7d",
                 "streaming_minute_rollup", "streaming_dedup",
                 "streaming_enriched", "delete_insert_roundtrip",
                 "erasure_roundtrip", "join_view_dim_update"):
        n = qs[name](spark, "/root/testdata/sf0.001").count()
        assert n > 0, name
    print("BARE-SESSION-OK")
    """
)


def test_bare_session_runs_conf_sensitive_queries():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=env["PYTHONPATH"],
    )
    assert "BARE-SESSION-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


FOREIGN_CWD_SCRIPT = textwrap.dedent(
    """
    import sys, tempfile
    sys.path.insert(0, {repo!r})  # driver-side only — workers can't see this
    from pyspark.sql import SparkSession
    import __spark_entry__ as mod

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()
    # Pandas-UDF rows cloudpickle module references: worker imports must
    # come from the addPyFile-shipped zip, not cwd or PYTHONPATH
    for name in ("user_zscores", "media_features", "cosine_topk_lsh"):
        n = qs[name](spark, "/root/testdata/sf0.001").count()
        assert n > 0, name
    print("FOREIGN-CWD-OK")
    """
)


def test_foreign_cwd_ships_package_to_workers(tmp_path):
    """A harness running from an arbitrary cwd with no repo PYTHONPATH
    must still execute the Arrow-UDF rows: entry()/queries() ship the
    package zip via addPyFile. Regression: before the shim, exactly the
    five Python-worker rows failed with worker ImportError while every
    JVM-expression row passed."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", FOREIGN_CWD_SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),
    )
    assert "FOREIGN-CWD-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
