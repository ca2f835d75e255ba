#!/usr/bin/env python
"""Propose the next driver grading window from on-disk evidence.

The per-round driver grades exactly ``list(REGISTRY)[:50]``
(`_DRIVER_WINDOW`), so rotating the window is a grading decision. This
tool mechanizes the procedure the round verdicts prescribe:

  1. re-derive per-row latest-green from the union of every
     ``CORRECTNESS_r*.json`` on disk (two-digit rounds included — a
     ``r0*`` glob silently drops round 10+);
  2. slot NEVER-GRADED rows first (the window guard in
     tests/test_registry_window.py forces them in-window anyway);
  3. fill the remaining slots with the stalest-evidence cohorts,
     oldest round first, each cohort in REGISTRY (insertion) order.

Prints the proposed window as a Python list literal to paste into
``_DRIVER_WINDOW`` (plans/queries.py), plus the evidence histogram.
The proposal is a starting point — a human still reviews cohort
boundaries and writes the window comment."""

from __future__ import annotations

import glob
import json
import os
import re


def latest_green(repo: str) -> dict[str, int]:
    """Newest round with a green driver entry, per row. Green = rows
    matched, hash matched (or no-oracle rows-only row), no error."""
    latest: dict[str, int] = {}
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ) or (
                # by-design no-oracle rows get a rows-only driver check
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if ok and rnd > latest.get(name, -1):
                latest[name] = rnd
    return latest


def propose(registry_names: list[str], latest: dict[str, int], size: int = 50):
    never = [n for n in registry_names if n not in latest]
    if len(never) > size:
        # silently truncating would propose a window the
        # test_never_driver_graded_rows_are_all_in_window guard rejects
        # with no hint why — refuse with the overflow spelled out
        raise ValueError(
            f"{len(never)} never-graded rows exceed the {size}-slot window; "
            f"overflow: {never[size:]} — grade across two rounds or raise size"
        )
    window = list(never[:size])
    rounds = sorted({r for r in latest.values()})
    for rnd in rounds:
        if len(window) >= size:
            break
        cohort = [
            n for n in registry_names
            if latest.get(n) == rnd and n not in window
        ]
        window.extend(cohort[: size - len(window)])
    return window, never, rounds


def main() -> int:
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)  # runnable from anywhere, no install step
    from nomba_data_pipeline_spark.plans.queries import REGISTRY
    latest = latest_green(repo)
    names = list(REGISTRY)
    window, never, rounds = propose(names, latest)
    hist: dict[int, int] = {}
    for r in latest.values():
        hist[r] = hist.get(r, 0) + 1
    print(json.dumps({
        "histogram_latest_green": {str(k): hist[k] for k in sorted(hist)},
        "never_graded": never,
        "proposed_window": window,
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
