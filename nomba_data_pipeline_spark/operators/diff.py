"""Snapshot diff — CDC-style table comparison.

The reference pipeline reloads warehouse tables wholesale or upserts
incrementally (reference base_loader.py load modes, covered by
operators/merge.py); what it cannot answer is *what changed* between
two loads. ``snapshot_diff`` computes the added / removed / changed
row sets between two snapshots of the same table — the audit primitive
behind CDC backfills, replication verification, and "why did
yesterday's aggregate move" investigations.

Design for 100 TB:
  * One full outer join hash-partitioned on the key columns — the
    minimum possible work for an unordered diff. If both snapshots are
    written bucketed on the key (operators/layout.py), the join is
    shuffle-free.
  * Column comparison is a null-safe equality (`<=>` / IS NOT DISTINCT
    FROM) folded into a single codegen stage — no per-column shuffles,
    no UDFs.
  * The output is keys + change metadata only (change_type,
    n_changed_cols) — the diff of a 100 TB table is shipped as a key
    list, not a second copy of the table. Join back to either snapshot
    to materialize payloads for just the changed keys.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots on `keys`.

    Returns one row per key present in either snapshot with
    ``change_type`` in {'added', 'removed', 'changed', 'unchanged'}
    and ``n_changed_cols`` (0 for added/removed/unchanged). Key rows
    are assumed unique per snapshot (enforce upstream with
    keep-latest; a duplicated key would fan out the join) and key
    columns non-null (presence on each side is probed via the key's
    nullness after the full outer join — a genuinely NULL key would
    misreport as added/removed).
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys and c in new.columns]
    o = old.select(*keys, *compare_cols).alias("o")
    n = new.select(*keys, *compare_cols).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    j = o.join(n, cond, "full_outer")

    # presence probes: key columns of the missing side are NULL
    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    diffs = [
        (~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))).cast("int")
        for c in compare_cols
    ]
    n_changed = sum(diffs[1:], diffs[0]) if diffs else F.lit(0)
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(n_changed > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys],
        change.alias(CHANGE_COL),
        F.when(change == "changed", n_changed)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col(CHANGE_COL) != "unchanged")
    return out


def snapshot_diff_sql(
    old_cte: str,
    new_cte: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> str:
    """DuckDB oracle twin: `old_cte` / `new_cte` are full CTE bodies
    (SELECT ...) defining the two snapshots."""
    key0 = keys[0]
    on = " AND ".join(f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in keys)
    nch = " + ".join(
        f"CAST(o.{c} IS DISTINCT FROM n.{c} AS INT)" for c in compare_cols
    ) or "0"
    key_sel = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in keys)
    where = "" if include_unchanged else f"WHERE {CHANGE_COL} <> 'unchanged'"
    return f"""
    WITH old_snap AS ({old_cte}),
    new_snap AS ({new_cte}),
    j AS (
        SELECT {key_sel},
               CASE WHEN o.{key0} IS NULL THEN 'added'
                    WHEN n.{key0} IS NULL THEN 'removed'
                    WHEN {nch} > 0 THEN 'changed'
                    ELSE 'unchanged' END AS {CHANGE_COL},
               CASE WHEN o.{key0} IS NOT NULL AND n.{key0} IS NOT NULL
                    THEN {nch} ELSE 0 END AS nch
        FROM old_snap o FULL OUTER JOIN new_snap n ON {on}
    )
    SELECT {", ".join(keys)}, {CHANGE_COL},
           CAST(CASE WHEN {CHANGE_COL} = 'changed' THEN nch ELSE 0 END AS BIGINT)
               AS n_changed_cols
    FROM j {where}
    """
