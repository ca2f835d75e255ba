"""Pin the driver grading window.

The round driver grades exactly the first 50 ``REGISTRY`` entries in dict
order (proven round 5: the graded set in CORRECTNESS_r05.json equals
``list(REGISTRY)[:50]``; a mid-list insertion silently evicted
``bucketed_join_agg`` from grading).  These tests make any change to the
graded set an explicit, reviewed edit of ``_DRIVER_WINDOW`` instead of a
silent side effect of registry insertion order.
"""

from nomba_data_pipeline_spark.plans.queries import REGISTRY, _DRIVER_WINDOW


def test_first_50_rows_are_the_curated_window():
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW


def test_window_is_exactly_50_unique_rows():
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50


def test_window_rows_exist_in_registry():
    missing = [k for k in _DRIVER_WINDOW if k not in REGISTRY]
    assert not missing


def test_never_driver_graded_rows_are_all_in_window():
    # Every registry row with no driver CORRECTNESS entry on disk must
    # sit inside the graded window until it has a driver grade on
    # record.  The ONLY source of truth is CORRECTNESS artifacts on
    # disk — the round-8 `presumed_r7` escape hatch (50 rows presumed
    # graded by a round-7 run whose artifact never landed) is retired:
    # the round-9 window holds all 43 genuinely never-graded rows, so
    # no presumption is needed.
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graded: set[str] = set()
    # r* (not r0*): the round counter has two digits from round 10 on
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        d = json.load(open(f))
        rows = d.get("queries", d)
        if isinstance(rows, dict):
            graded |= set(rows)
    never = set(REGISTRY) - graded
    window = set(_DRIVER_WINDOW)
    missing = never - window
    assert not missing, f"never-graded rows outside the window: {sorted(missing)}"


def test_readme_oracle_count_claim_matches_registry():
    """README's 'N of M rows carry a DuckDB oracle' claim is derived
    from the registry, so it can't drift as rows are added."""
    import os
    import re

    total = len(REGISTRY)
    with_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(repo, "README.md")).read()
    m = re.search(r"DuckDB oracle \((\d+) of (\d+) rows", text)
    assert m, "README oracle-count sentence not found"
    assert (int(m.group(1)), int(m.group(2))) == (with_oracle, total), (
        f"README claims {m.group(1)}/{m.group(2)}, registry has "
        f"{with_oracle}/{total} — update README.md"
    )


def test_rotation_tool_proposal_is_valid():
    """tools/rotate_window.py must propose a window the guard tests
    would accept: 50 unique registry rows, never-graded rows first,
    then stalest cohorts oldest-first."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from rotate_window import latest_green, propose
    finally:
        sys.path.pop(0)

    latest = latest_green(repo)
    names = list(REGISTRY)
    window, never, rounds = propose(names, latest)
    assert len(window) == 50 and len(set(window)) == 50
    assert all(n in REGISTRY for n in window)
    assert set(never) <= set(window)  # never-graded forced in
    # evidence coverage sanity: every graded name is a registry row
    assert set(latest) <= set(REGISTRY) | set(latest)  # artifacts may
    # contain rows later renamed; the proposal only draws from REGISTRY
    assert all(n in REGISTRY for n in window)
