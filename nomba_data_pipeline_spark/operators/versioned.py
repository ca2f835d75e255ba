"""Manifest-based table VERSIONING: time travel, rollback, vacuum.

The reference has no recovery story below a full reload: a bad delta
merged into a warehouse table (base_loader.py's upsert/delete+insert
modes) can only be undone by re-extracting and rebuilding the model
(dbt --full-refresh), and yesterday's state is simply gone once the
merge lands. At 100 TB both are unacceptable — an erroneous CDC batch
must be revertible in O(metadata), and an auditor must be able to read
the table AS OF a prior load. This module adds both on plain parquet,
following the published lakehouse design (Delta Lake: VLDB 2020
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores"; Apache Iceberg's manifest/snapshot model):

    path/_gen/g-<hex>/part-*.parquet   immutable data files
    path/_manifests/v<N>               one manifest per version: the
                                       FILE LIST + schema + per-file
                                       column stats (JSON in a 1-row
                                       parquet, atomic-swapped)
    path/_latest                       pointer to the current version
                                       (1-row parquet, atomic-swapped)

Every write makes a NEW version out of mostly OLD files (copy-on-write
at file granularity):

  * overwrite(df)            all-new file list (one new generation).
  * merge_upsert(delta,keys) only files that HOLD a delta key are
                             rewritten; untouched files are carried by
                             reference into the new manifest. A 100-row
                             CDC delta into a 100 TB table costs
                             O(touched files), never O(table).
  * delete_where(cond)       same CoW bound: files with no matching row
                             are carried by reference.
  * rollback(v)              a NEW version whose file list is v's — an
                             O(metadata) revert that preserves history
                             (Delta's RESTORE semantics), no data moved.
  * read(version=...)        time travel: plan over that manifest's
                             file list with the manifest's pinned
                             schema. No directory listing at all — at
                             object-store scale the manifest IS the
                             listing.
  * read_range(col, lo, hi)  manifest-level file skipping on per-file
                             min/max stats (Iceberg-style scan
                             planning) + the residual predicate pushed
                             into the parquet scan, so pruning is a
                             pure I/O saving and never a semantics
                             change.
  * checkpoint()             rewrite the current file list into one
                             fresh generation — bounds manifest size
                             and scan fan-out after many small deltas
                             (the compaction every LSM-shaped layout
                             needs).
  * vacuum(retain_last=k)    delete generations unreferenced by the
                             retained manifests + off-chain orphans
                             from crashed writers.

Crash safety (one writer per table, the repo-wide contract stated in
operators/merge.py): data generations are written FIRST, the manifest
SECOND, and the latest-pointer swap LAST. A crash at any point leaves
the previous version fully readable; the orphan generation/manifest is
invisible (history() walks the parent chain from the pointer) and is
reclaimed by vacuum(). Version numbers are allocated as
max(pointer, max manifest on disk) + 1, so a crashed writer's orphan
manifest can never collide with the next successful write.

Partition-pruning stance: versioned tables keep would-be partition
columns AS DATA (no hive directories) and rely on manifest stats +
parquet row-group stats for skipping — reading an explicit file list
is incompatible with directory-derived partition values, and
clustering (`cluster_by=` on overwrite/checkpoint uses a range
repartition) gives the same skip behavior with file-count control.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from nomba_data_pipeline_spark.operators.merge import (
    ParquetTable,
    _align_to_target,
    _semi_anti_null_safe,
    fs_and_path,
)

# per-file stats are only recorded for types whose parquet footer
# min/max are exact (string bounds may be writer-truncated — same
# exactness guard as ParquetTable.high_water_mark_stats)
_STATS_SAFE_PREFIXES = (
    "int", "bigint", "smallint", "tinyint", "float", "double",
    "date", "timestamp", "decimal",
)


def _stats_safe(dtype: str) -> bool:
    return dtype.startswith(_STATS_SAFE_PREFIXES)


def _local_dir(p: str) -> str | None:
    """OS path when `p` is handled on the driver's LOCAL filesystem,
    else None (caller falls back to the Hadoop/Spark path). `file:`
    URIs are local by definition; a scheme-qualified anything else
    (hdfs://, s3a://) never is; a scheme-less path counts only when
    its PARENT directory exists locally — on a cluster whose default
    FS is HDFS that probe fails and the Hadoop path is used, so this
    fast path can never misroute metadata to the wrong filesystem."""
    if p.startswith("file:"):
        q = p[len("file:"):]
        while q.startswith("//"):  # file:/// form
            q = q[1:]
        return q
    if "://" in p:
        return None
    return p if os.path.isdir(os.path.dirname(p)) else None


def _write_json_dir_local(d: str, payload, col: str = "j") -> None:
    """Driver-side twin of the Spark 1-row-parquet JSON write: same
    directory shape (one `*.parquet` part file + `_SUCCESS`), same
    single string column (`j` for versioned metadata; the IVM sidecars
    use `meta`), so Spark and pyarrow readers mix freely with the
    Spark-written form. makedirs without exist_ok: the tmp name is
    uuid-fresh, and failing on an impossible collision is safer than
    writing into someone else's directory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(d)
    pq.write_table(
        pa.table({col: [json.dumps(payload)]}),
        os.path.join(d, f"part-00000-{uuid.uuid4().hex}.parquet"),
    )
    with open(os.path.join(d, "_SUCCESS"), "w"):
        pass


def read_json_sidecar(spark: SparkSession, p: str, col: str = "j"):
    """Read a 1-row JSON parquet sidecar, pyarrow-fast on local
    filesystems (microseconds, zero Spark jobs), Spark reader
    otherwise — the r15 metadata fast path (OPTIMIZATION_r15 §2),
    shared by the versioned table and the IVM sidecars
    (JoinViewTable/AggJoinView `._view_meta`/`._agg_meta`/intents)."""
    local = _local_dir(p)
    if local is not None and os.path.isdir(local):
        try:
            import pyarrow as _pa
            import pyarrow.parquet as _pq
        except ImportError:
            _pa = None
        if _pa is not None:
            import glob as _glob

            files = _glob.glob(os.path.join(local, "*.parquet"))
            # require the _SUCCESS commit marker: a hand-copied partial
            # directory (one part file, no marker) goes to the Spark
            # reader rather than being silently accepted here
            if len(files) == 1 and os.path.exists(
                os.path.join(local, "_SUCCESS")
            ):
                # narrow except (ADVICE r15): only storage/format errors
                # fall back to Spark — a genuinely corrupt JSON payload
                # (json.loads below) raises the same way on either path,
                # so retrying it through Spark would just re-fail slower
                # with a vaguer error
                try:
                    payload = (
                        _pq.read_table(files[0], columns=[col])
                        .column(col)[0]
                        .as_py()
                    )
                except (OSError, KeyError, IndexError, _pa.lib.ArrowInvalid):
                    payload = None
                if payload is not None:
                    return json.loads(payload)
    return json.loads(spark.read.parquet(p).first()[col])


def write_json_sidecar(spark: SparkSession, p: str, payload, col: str = "j") -> None:
    """Write a 1-row JSON parquet sidecar with the same temp+atomic-swap
    crash contract as ParquetTable.overwrite, pyarrow-fast on local
    filesystems, Spark writer otherwise. Bytes on disk are identical
    either way, so the two paths mix freely across writers/readers."""
    local = _local_dir(p)
    if local is not None:
        tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
        try:
            _write_json_dir_local(_local_dir(tmp), payload, col=col)
        except Exception:
            _rm_local_dir(_local_dir(tmp))
        else:
            ParquetTable(spark, p)._swap_in(tmp)
            return
    ParquetTable(spark, p).overwrite(
        spark.createDataFrame([(json.dumps(payload),)], f"{col} string").coalesce(1)
    )


def read_table_sidecar_local(p: str):
    """pyarrow fast path for a small TYPED sidecar table (ANN index
    params/centroids and friends): the whole table when `p` is a local
    single-part parquet dir, None otherwise — the caller falls back to
    the Spark reader. Zero Spark jobs on the fast path."""
    local = _local_dir(p)
    if local is None or not os.path.isdir(local):
        return None
    try:
        import glob as _glob

        import pyarrow.parquet as _pq

        files = _glob.glob(os.path.join(local, "*.parquet"))
        if len(files) != 1:
            return None
        return _pq.read_table(files[0])
    except Exception:
        return None


def write_table_sidecar(spark: SparkSession, p: str, make_arrow, make_spark_df) -> None:
    """Write a small typed sidecar table with the same temp+atomic-swap
    contract as the JSON sidecars: pyarrow on local filesystems (zero
    Spark jobs), the Spark writer otherwise. `make_arrow` returns a
    pyarrow Table and `make_spark_df` the equivalent 1-partition
    DataFrame — the two must carry IDENTICAL schemas (arrow int32 for a
    Spark int, list_(float64) for array<double>) so readers mix freely
    across the two written forms."""
    local = _local_dir(p)
    if local is not None:
        tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
        try:
            import pyarrow.parquet as _pq

            d = _local_dir(tmp)
            os.makedirs(d)
            _pq.write_table(
                make_arrow(),
                os.path.join(d, f"part-00000-{uuid.uuid4().hex}.parquet"),
            )
            with open(os.path.join(d, "_SUCCESS"), "w"):
                pass
        except Exception:
            _rm_local_dir(_local_dir(tmp))
        else:
            ParquetTable(spark, p)._swap_in(tmp)
            return
    # non-local fallback honors the same temp+atomic-swap contract as
    # the fast path (ADVICE r15): a crash mid-write must leave the
    # previous sidecar readable, never a deleted/partial directory
    ParquetTable(spark, p).overwrite(make_spark_df().coalesce(1))


def _rm_local_dir(d: str | None) -> None:
    if d:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def _stat_str(v) -> str:
    """Canonical string rendering for a manifest stat value.

    pyarrow decodes Spark timestamp footer stats as TZ-AWARE datetimes
    (str() renders '...+00:00'), while callers of read_range /
    high_water_mark_str pass session-naive renderings — the lexical
    comparison in _ranges_intersect and the HWM round-trip would only
    line up under the repo's pinned-UTC session. Normalize to UTC-naive
    before rendering (mirroring merge.high_water_mark_stats) so the
    comparison is correct by construction, not by session config."""
    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return str(v)


# simple-comparison conjunct for _predicate_bounds: col OP literal,
# with an optional timestamp'/date' literal prefix
_CMP_RE = re.compile(
    r"^\s*(\w+)\s*(>=|<=|==|=|>|<)\s*"
    r"(?:timestamp|date)?\s*'?([^'<>=!]+?)'?\s*$",
    re.IGNORECASE,
)


def _norm_ts_literal(lit: str, dtype: str, session_tz: str) -> str | None:
    """Re-render a SQL timestamp/date literal in the manifest's
    CANONICAL stat form so the lexical range test compares like with
    like. The raw literal text is NOT comparable against stats: an
    explicit zero fraction ('...00:00:00.000000'), a TZ offset
    ('...+00:00'), or a 'T' separator all sort lexically wrong against
    the UTC-naive `str(datetime)` rendering stats use (e.g. file fmax
    '... 00:00:00' < literal '... 00:00:00.000000' would prune a file
    that HOLDS matching rows — rows silently surviving delete_where /
    purge_where). Parse the literal (offset-aware), convert to UTC the
    way Spark evaluates the predicate (a naive `timestamp` literal is
    session wall time; `timestamp_ntz` and `date` shift nothing), and
    render via _stat_str. Returns None when the literal does not parse
    or the session zone cannot be resolved — contributing no bound is
    always safe, a wrong bound never is."""
    s = lit.strip().replace("T", " ")
    if dtype == "date" or dtype.startswith("date"):
        try:
            return str(_dt.date.fromisoformat(s))
        except ValueError:
            return None
    try:
        v = _dt.datetime.fromisoformat(s)
    except ValueError:
        return None
    if v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    elif dtype == "timestamp":
        # naive literal = session wall time; stats are UTC-naive
        try:
            from zoneinfo import ZoneInfo

            v = (v.replace(tzinfo=ZoneInfo(session_tz))
                 .astimezone(_dt.timezone.utc).replace(tzinfo=None))
        except Exception:
            return None
    return _stat_str(v)


class ConstraintViolation(ValueError):
    """An incoming batch (or, for add_constraint, the existing data)
    violates a table CHECK constraint. Nothing was committed — the
    refusal happens BEFORE any generation is written, so the table and
    its history are untouched and the caller can fix the batch and
    retry. Write-time enforcement is the Delta Lake CHECK-constraint
    contract: at 100 TB a bad batch that LANDS costs a rollback and an
    incident; one O(batch) validation aggregate per write is noise."""


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this write's snapshot and its
    commit. The table is NOT corrupted — this write simply refused to
    publish a manifest derived from a stale parent (its orphan
    generation is reclaimed by vacuum). The repo-wide contract is one
    writer per table; this check turns a second writer from silent
    history corruption (lost update: the later pointer swap wins and
    the other commit's rows vanish) into a loud, retryable error —
    the detection half of Delta-style optimistic concurrency. Two
    writers that both pass the check race to the same version number,
    where the CREATE-EXCLUSIVE manifest rename (_publish_manifest) is
    the CAS: exactly one wins, the loser gets this error and retries
    against the winner's now-visible commit."""


class VersionedTable:
    """A versioned parquet table: every write is a new manifest over
    mostly-shared immutable files; any retained version stays readable."""

    def __init__(self, spark: SparkSession, path: str,
                 stats_cols: list[str] | None = None,
                 write_cdf: bool = False):
        self.spark = spark
        self.path = path.rstrip("/")
        # columns to record per-file min/max for in the manifest
        # (None = every stats-safe top-level column)
        self.stats_cols = list(stats_cols) if stats_cols is not None else None
        # write_cdf=True persists a ROW-LEVEL change feed at commit time
        # (`_cdf/v<N>` per version — Delta Lake's _change_data design):
        # merge/delete verbs already have the changed rows in hand, so
        # the feed costs O(changed rows) extra write, and downstream
        # consumers (the `versioned_cdf` streaming source, replicas)
        # read plain parquet instead of re-deriving the diff with joins
        # (diff_versions remains the feed-less fallback).
        self.write_cdf = bool(write_cdf)
        self._pt = ParquetTable(spark, self.path)  # reuse FS plumbing

    # -- layout --------------------------------------------------------
    def _gen_root(self) -> str:
        return f"{self.path}/_gen"

    def _manifest_dir(self, version: int) -> str:
        return f"{self.path}/_manifests/v{version:08d}"

    def _cdf_dir(self, version: int) -> str:
        return f"{self.path}/_cdf/v{version:08d}"

    def _latest_path(self) -> str:
        return f"{self.path}/_latest"

    def _fs(self, p: str):
        return fs_and_path(self.spark, p)

    # -- pointer / manifest IO (1-row parquet, atomic swap — the same
    # sidecar pattern JoinViewTable._write_meta documents: a crash
    # mid-write must leave the previous bytes readable). On LOCAL
    # layouts both directions go through pyarrow on the driver —
    # the same footer-walk precedent as high_water_mark_stats and the
    # versioned_cdf stream source (which already reads these dirs with
    # pq.read_table) — so pointer/manifest metadata costs microseconds
    # instead of one Spark job per access; non-local schemes and any
    # surprise fall back to the Spark reader/writer unchanged. The
    # bytes on disk are identical either way (1-row parquet, column
    # `j`), so readers and writers mix freely across the two paths. --
    def _read_json(self, p: str) -> dict:
        return read_json_sidecar(self.spark, p)

    def _write_json(self, p: str, d: dict) -> None:
        write_json_sidecar(self.spark, p, d)

    def _recover_pointer(self) -> bool:
        """Self-heal an interrupted pointer swap: ParquetTable._swap_in
        renames the old pointer to a `.old-<hex>` backup before moving
        the new one in, so a crash between the two renames leaves no
        `_latest` but exactly that backup. Restoring it keeps the
        module contract ('a crash at any point leaves the previous
        version fully readable') — the commit whose swap was
        interrupted becomes an ordinary invisible orphan (vacuum
        reclaims it) instead of the table reading as empty, which
        would let the next write fork history with parent=None and a
        reset txn map."""
        fs, jp = self._fs(self._latest_path())
        if fs.exists(jp):
            return True
        parent_dir, base = self.path, "_latest.old-"
        fs2, pdir = self._fs(parent_dir)
        if not fs2.exists(pdir):
            return False
        backups = [
            st.getPath() for st in fs2.listStatus(pdir)
            if st.getPath().getName().startswith(base)
        ]
        if not backups:
            return False
        # More than one backup can exist: a crash in _swap_in AFTER
        # rename(tmp->target) but before delete(old) leaves a STALE
        # backup while _latest is valid, and a LATER interrupted swap
        # adds a second. Restoring an arbitrary one could silently
        # revert the table several versions — after which vacuum would
        # reclaim the newer committed manifests as "orphans". Read each
        # backup's pointer version and restore the MAX; the rest are
        # residue and are deleted (committed-chain manifests/files are
        # untouched — only pointer copies die here).
        def _backup_version(p) -> int:
            try:
                return int(json.loads(
                    self.spark.read.parquet(p.toString()).first()["j"]
                )["version"])
            except Exception:
                return -1

        best = max(backups, key=_backup_version)
        for b in backups:
            if b is not best:
                fs2.delete(b, True)
        fs2.rename(best, jp)
        self.spark.catalog.refreshByPath(self._latest_path())
        return True

    def _sweep_pointer_backups(self) -> None:
        """Delete `_latest.old-*` residue (a crash between _swap_in's
        rename-in and backup-delete leaves one while `_latest` is
        valid) so at most one backup can ever accumulate. Called after
        every successful pointer swap — one listStatus per commit."""
        fs, pdir = self._fs(self.path)
        if not fs.exists(pdir):
            return
        for st in fs.listStatus(pdir):
            if st.getPath().getName().startswith("_latest.old-"):
                fs.delete(st.getPath(), True)

    def exists(self) -> bool:
        return self._recover_pointer()

    def latest_version(self) -> int | None:
        if not self.exists():
            return None
        return int(self._read_json(self._latest_path())["version"])

    def _manifest(self, version: int) -> dict:
        fs, jp = self._fs(self._manifest_dir(version))
        if not fs.exists(jp):
            raise ValueError(
                f"version {version} of {self.path} does not exist "
                "(never written, or reclaimed by vacuum)"
            )
        return self._read_json(self._manifest_dir(version))

    def _versions_on_disk(self) -> list[int]:
        fs, jp = self._fs(f"{self.path}/_manifests")
        if not fs.exists(jp):
            return []
        out = []
        for st in fs.listStatus(jp):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                out.append(int(name[1:]))
        return sorted(out)

    def _next_version(self) -> int:
        # max(pointer, max manifest on disk) + 1: a crashed writer may
        # have left a manifest ABOVE the pointer; reusing its number
        # would make the orphan spring to life as someone else's commit
        latest = self.latest_version() or 0
        on_disk = self._versions_on_disk()
        return max([latest] + on_disk) + 1

    # -- data-generation write + stats ---------------------------------
    def _write_gen(self, df: DataFrame,
                   cluster_by: list[str] | None = None,
                   target_files: int | None = None) -> list[dict]:
        """Write one immutable generation; return its manifest file
        entries. Range-repartitioning by cluster_by gives each file a
        narrow value range, which is what makes the manifest min/max
        stats selective (a hash layout would spread every value over
        every file and no read_range could skip anything).
        target_files sizes the layout explicitly (files should land
        near spark.sql.files.maxPartitionBytes so one scan task reads
        one file); without it AQE picks the count from data size.

        Stats cost model (VERDICT r14 #7): footer stats are free
        (pyarrow, local FS). Where footers are unreachable (object
        stores), UNCLUSTERED generations take their bounds from an
        Observation riding the write scan itself — zero extra jobs
        (an unclustered generation's files share the value spread
        anyway, so per-file tightness buys nothing; generation-wide
        bounds prune exactly as well across generations, which is
        where CDC pruning happens). CLUSTERED generations keep the
        exact per-file readback — there per-file tightness IS the
        point, and the one page-warm aggregate amortizes over the big
        clustered rewrite it accompanies."""
        from pyspark.sql import Observation

        gen = f"{self._gen_root()}/g-{uuid.uuid4().hex[:12]}"
        if cluster_by and target_files:
            df = df.repartitionByRange(target_files, *cluster_by)
        elif cluster_by:
            df = df.repartitionByRange(*cluster_by)
        elif target_files:
            df = df.repartition(target_files)
        want = self._stats_targets(df.schema)
        obs = None
        if want and not cluster_by and not self._footers_reachable():
            # only where the footer fast path CANNOT work — on local
            # filesystems the observation would be per-row aggregate
            # work in the hot CDC write path whose result is discarded
            obs = Observation()
            exprs = []
            for c in want:
                exprs += [F.min(c).alias(f"lo_{c}"),
                          F.max(c).alias(f"hi_{c}")]
            df = df.observe(obs, *exprs)
        df.write.mode("error").parquet(gen)
        fs, jp = self._fs(gen)
        # path + size captured from the ONE post-write listing: the
        # byte size drives optimize_small_files' small/large split with
        # zero extra metadata calls at optimize time
        sized = sorted(
            (f"{gen[len(self.path) + 1:]}/{st.getPath().getName()}",
             int(st.getLen()))
            for st in fs.listStatus(jp)
            if st.getPath().getName().endswith(".parquet")
        )
        rels = [r for r, _ in sized]
        stats = {r: self._file_stats(f"{self.path}/{r}", want) for r in rels}
        # per-file ROW COUNTS (Delta's numRecords): footer metadata on
        # local schemes — row_count() then answers COUNT(*) from the
        # manifest alone, zero scan
        nrows = {r: self._file_rows(f"{self.path}/{r}") for r in rels}
        if want and any(v is None for v in stats.values()):
            if obs is not None:
                # generation-wide bounds from the write's own
                # Observation — NO second scan. Valid for every file
                # (each file's range is a subset); empty files keep
                # them too (conservative: pruning keeps the file)
                gbounds = self._observed_bounds(obs, want, df.schema)
                if gbounds:
                    stats = {
                        r: (stats[r] if stats[r] is not None else gbounds)
                        for r in rels
                    }
            else:
                # clustered generation (per-file tightness is the
                # point), or a local-FS footer miss (pyarrow absent /
                # a file without usable min-max): ONE read-back
                # aggregation over the generation just written
                # (page-cache warm, O(generation) — never O(table))
                rb_stats, rb_rows = self._stats_readback(gen, want, df.schema)
                stats = rb_stats or stats
                if rb_rows:
                    nrows = {r: nrows.get(r) if nrows.get(r) is not None
                             else rb_rows.get(r, 0)
                             for r in rels}
        return [{"path": r, "bytes": b, "rows": nrows.get(r),
                 "stats": stats.get(r)}
                for r, b in sized]

    def _observed_bounds(self, obs, cols: list[str],
                         schema: StructType) -> dict | None:
        """Generation-wide [lo, hi] per column from a write-scan
        Observation, rendered like footer stats (UTC-naive via
        _delta_stat_str — observed timestamps arrive session-naive,
        same as collect())."""
        dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
        try:
            vals = obs.get
            out = {}
            for c in cols:
                lo, hi = vals.get(f"lo_{c}"), vals.get(f"hi_{c}")
                if lo is None:
                    continue
                lo_s = self._delta_stat_str(lo, dtypes.get(c, ""))
                hi_s = self._delta_stat_str(hi, dtypes.get(c, ""))
                if lo_s is not None and hi_s is not None:
                    out[c] = [lo_s, hi_s]
            return out or None
        except Exception:
            return None  # stats stay an optimization, never a dependency

    def _file_rows(self, abs_path: str) -> int | None:
        """A file's row count from the parquet FOOTER (no data scan)
        — local filesystems only, same reachability rule as
        _file_stats; None elsewhere (the readback pass fills it on
        footer-less schemes)."""
        local = abs_path
        if local.startswith("file:"):
            local = local[len("file:"):]
        if "://" in local or not os.path.isfile(local):
            return None
        try:
            import pyarrow.parquet as _pq

            return int(_pq.ParquetFile(local).metadata.num_rows)
        except Exception:
            return None

    def row_count(self, version: int | None = None) -> int:
        """COUNT(*) from the MANIFEST alone (Delta's numRecords): the
        sum of per-file row counts recorded at write time — zero scan,
        zero tasks, any retained version. Falls back to one exact
        count() scan when any entry lacks a recorded count (manifests
        written before r14, or object-store unclustered generations
        whose stats rode the write Observation). At 100 TB the
        difference is a metadata read vs a full-table scan for the
        most common sanity query there is."""
        man = self._resolve(version)
        counts = [f.get("rows") for f in man["files"]]
        if all(c is not None for c in counts):
            return int(sum(counts))
        return self._read_files(
            man, [f["path"] for f in man["files"]]
        ).count()

    def _footers_reachable(self) -> bool:
        """Whether _file_stats' pyarrow footer fast path can work for
        this table: local paths only (plain or file:-scheme) — the
        same reachability rule _file_stats itself applies."""
        p = self.path
        if p.startswith("file:"):
            return True
        return "://" not in p

    def _stats_readback(
        self, gen: str, cols: list[str], schema: StructType,
    ) -> tuple[dict | None, dict[str, int] | None]:
        """Per-file min/max computed FROM THE DATA of one generation —
        the scheme-agnostic fallback when pyarrow cannot reach the
        footers locally. Exact (tighter than footer stats, which may
        be row-group unions); one grouped aggregate per generation
        write, grouped by input_file_name so every file gets its own
        bounds. All-NULL columns contribute no stat (same as footers
        without min/max). Collected TIMESTAMP values arrive
        SESSION-naive (the collect() contract) — they go through
        _delta_stat_str so readback stats render UTC-naive exactly like
        footer stats; a session-local rendering under a non-UTC session
        would be offset from the UTC-normalized delta bounds and
        _key_candidate_files could wrongly prune a file that holds a
        delta key (silent duplicate keys). Returns (stats, row counts)
        — the same grouped pass yields both, so COUNT(*)-from-metadata
        stays available off local filesystems too."""
        dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
        try:
            aggs = [F.count(F.lit(1)).alias("__n")]
            for c in cols:
                aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
            rows = (
                self.spark.read.schema(schema).parquet(gen)
                .groupBy(F.input_file_name().alias("__f"))
                .agg(*aggs)
                .collect()
            )
            out: dict[str, dict | None] = {}
            counts: dict[str, int] = {}
            for r in rows:
                st = {}
                for c in cols:
                    lo, hi = r[f"__lo_{c}"], r[f"__hi_{c}"]
                    if lo is not None:
                        lo_s = self._delta_stat_str(lo, dtypes.get(c, ""))
                        hi_s = self._delta_stat_str(hi, dtypes.get(c, ""))
                        if lo_s is not None and hi_s is not None:
                            st[c] = [lo_s, hi_s]
                rel = self._rel(r["__f"])
                out[rel] = st or None
                counts[rel] = int(r["__n"])
            return out, counts
        except Exception:
            # stats stay an optimization, never a dependency
            return None, None

    def _stats_targets(self, schema: StructType) -> list[str]:
        cols = [f.name for f in schema.fields
                if _stats_safe(f.dataType.simpleString())]
        if self.stats_cols is not None:
            cols = [c for c in cols if c in self.stats_cols]
        return cols

    def _file_stats(self, abs_path: str, cols: list[str]):
        """Per-file min/max from the parquet FOOTER — no data scan.
        Local filesystems only (pyarrow path), like
        high_water_mark_stats: elsewhere stats are simply omitted and
        read_range keeps the file (pruning is an optimization, never a
        correctness dependency)."""
        if not cols:
            return None
        local = abs_path
        if local.startswith("file:"):
            local = local[len("file:"):]
        if "://" in local or not os.path.isfile(local):
            return None
        try:
            import pyarrow.parquet as _pq

            md = _pq.ParquetFile(local).metadata
            out = {}
            for c in cols:
                try:
                    idx = md.schema.names.index(c)
                except ValueError:
                    continue
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is not None:
                    # JSON-portable; compared against str(value) bounds
                    # in read_range, exact for the stats-safe types
                    out[c] = [_stat_str(lo), _stat_str(hi)]
            return out or None
        except Exception:
            return None

    # sentinel: "caller took no snapshot" (first-write overwrite) vs a
    # genuine expected parent of None
    _NO_SNAPSHOT = object()

    def _commit(self, files: list[dict], op: str, schema_ddl: str,
                extra: dict | None = None,
                txn: tuple[str, int] | None = None,
                expected_parent=_NO_SNAPSHOT,
                cdf=None, rebase_guard=None) -> int:
        """Publish one manifest. expected_parent arms lost-update
        protection; rebase_guard (a zero-arg callable returning this
        write's key/predicate bounds) additionally allows DISJOINT
        concurrent commits to land by re-pointing this manifest at the
        new parent — Delta-style optimistic concurrency: conflict
        detection stays (overlapping writers refuse), but two CDC
        writers on disjoint key ranges no longer serialize through
        manual retries. Bounded attempts; each rebase is O(intervening
        manifests) metadata, no data I/O."""
        rebased = 0
        while True:
            v = self._next_version()
            parent = self.latest_version()
            if (expected_parent is self._NO_SNAPSHOT
                    or parent == expected_parent):
                break
            rebased += 1
            if rebase_guard is None or rebased > 3:
                raise ConcurrentWriteError(
                    f"{self.path}: another writer advanced the table to "
                    f"version {parent} after this {op} snapshotted version "
                    f"{expected_parent} — refusing to commit a manifest "
                    "derived from a stale parent (lost-update protection; "
                    "re-read and retry the write)"
                )
            files = self._rebase_onto(files, expected_parent, parent, op,
                                      rebase_guard)
            expected_parent = parent
        parent_man = self._manifest(parent) if parent else {}
        # write_cdf is a TABLE PROPERTY once enabled (manifest-carried,
        # like the txn map and constraints): a handle constructed
        # without the flag must keep writing feeds, or its commits
        # would punch permanent holes that kill every downstream
        # versioned_cdf stream with 'no change feed for version N'
        cdf_on = self.write_cdf or bool(parent_man.get("write_cdf"))
        # change feed STAGED first (hidden `_cdf/.tmp-*`), manifest
        # CAS second, feed finalized third, pointer last. Staging —
        # rather than writing `_cdf/v<N>` directly — matters under the
        # create-exclusive commit CAS: a loser that had already
        # written the final feed directory would clobber the WINNER's
        # committed feed before its own manifest rename failed. After
        # the CAS succeeds the version number is exclusively ours, so
        # the finalize rename cannot race anyone; a crash between CAS
        # and finalize leaves an orphan manifest the pointer never
        # reaches (vacuum reclaims manifest and tmp together), so
        # every POINTER-REACHABLE manifest still has its feed.
        cdf_tmp = self._stage_cdf(cdf) if cdf_on else None
        # writer-transaction map (Delta's txn appId/version design):
        # carried forward whole on every commit — one entry per writer
        # app, so it stays O(writers), never O(history) — and read from
        # the LATEST manifest only, so the idempotency check is O(1)
        txns = dict(parent_man.get("txns") or {})
        if txn is not None:
            txns[txn[0]] = int(txn[1])
        import time as _time

        man = {
            "version": v,
            "parent": parent,
            "op": op,
            # commit wall-clock (unix seconds): what time-based
            # retention (vacuum retain_hours=) ages out on. Advisory
            # metadata only — ordering authority stays with the parent
            # chain, never the clock
            "ts": _time.time(),
            "schema": schema_ddl,
            "files": files,
            "txns": txns,
            # CHECK constraints carried whole on every commit —
            # O(constraints), never O(history); read from the LATEST
            # manifest only (same design as the txn map)
            "constraints": dict(parent_man.get("constraints") or {}),
            "write_cdf": cdf_on,
            # feed-format marker: this commit's feed FOLDS EXACTLY —
            # row-level with update pre-images (r14+) or an EMPTY
            # marker. A _CDF_FULL commit (overwrite/rollback/promote/
            # purge) must NOT carry it: diff_versions would route the
            # span into _diff_via_feed, which refuses on FULL, where
            # the manifest scan-and-compare still answers correctly
            "cdf_pre": cdf_on and cdf != "full",
        }
        if extra:
            man.update(extra)
        if rebased:
            man["rebased_commits"] = rebased
            # the pre-rebase rewrote/carried split no longer describes
            # the committed (rebased) file list — drop the counts
            # rather than record stale history metadata
            for k in ("rewrote_files", "carried_files"):
                man.pop(k, None)
        try:
            self._publish_manifest(v, man)
        except ConcurrentWriteError:
            if cdf_tmp is not None:
                fs, tp = self._fs(cdf_tmp)
                fs.delete(tp, True)
            raise
        if cdf_tmp is not None:
            self._finalize_cdf(v, cdf_tmp)
        # the pointer swap IS the commit: a crash before this line
        # leaves an invisible orphan manifest (vacuum reclaims it)
        self._write_json(self._latest_path(), {"version": v})
        self._sweep_pointer_backups()
        return v

    def _publish_manifest(self, v: int, man: dict) -> None:
        """CREATE-EXCLUSIVE manifest publication: write the manifest to
        a hidden temp directory, then rename it to `_manifests/v<N>` —
        and treat a FAILED rename (or a pre-existing target) as a lost
        compare-and-swap, raising ConcurrentWriteError instead of
        clobbering the other writer's manifest. Version allocation is
        thereby the CAS: two wall-clock-concurrent writers that both
        pass the stale-parent check race to the SAME version number,
        and exactly one rename wins (rename onto an existing non-empty
        directory fails atomically on local/HDFS filesystems); the
        loser's generation becomes an ordinary vacuum-reclaimable
        orphan and its caller retries the write, at which point the
        winner's commit is visible and the rebase/refuse logic engages.
        Residual window, stated honestly: the loser's retry can still
        observe the OLD pointer if the winner crashed between manifest
        rename and pointer swap — the winner's commit then never
        happened (its manifest is an orphan above the pointer), and the
        retry correctly proceeds from the surviving parent."""
        tmp = f"{self.path}/_manifests/.tmp-{uuid.uuid4().hex[:8]}"
        (self.spark.createDataFrame([(json.dumps(man),)], "j string")
         .coalesce(1).write.mode("error").parquet(tmp))
        fs, tgt = self._fs(self._manifest_dir(v))
        _, tp = self._fs(tmp)
        ok = False
        try:
            # exists() is the fast path; the rename RESULT is the
            # authoritative CAS (atomic on local/HDFS: renaming onto a
            # non-empty directory fails without touching it)
            ok = (not fs.exists(tgt)) and fs.rename(tp, tgt)
        finally:
            if not ok:
                fs.delete(tp, True)
        if not ok:
            raise ConcurrentWriteError(
                f"{self.path}: version {v}'s manifest already exists — "
                "another writer allocated this version concurrently "
                "(the create-exclusive manifest rename is the commit "
                "CAS); re-read and retry the write"
            )

    def _rebase_onto(self, files: list[dict], old_parent: int | None,
                     new_parent: int, op: str, guard) -> list[dict]:
        """Re-point a prepared commit at `new_parent` when every
        intervening commit is provably DISJOINT from this write —
        otherwise raise ConcurrentWriteError naming the overlap. The
        safety argument, spelled out:

          * this write's decisions (which files to rewrite, which rows
            to anti-join away) were made against `old_parent`; they
            stay valid iff no intervening commit (a) rewrote/removed a
            file this write also rewrites/removes, or (b) ADDED a file
            that could hold one of this write's keys / predicate-range
            rows (it would dodge the merge's dedup anti-join or the
            delete's predicate scan). (a) is checked on exact path
            sets; (b) on manifest stats against `guard()`'s bounds —
            an added file missing stats for a bound column, or a write
            whose bounds cannot be established at all, REFUSES
            (conservative: a refusal costs a retry, a wrong rebase
            costs silent duplicate keys or surviving rows).
          * content-replacing intervening ops (overwrite / rollback /
            promote_types) and whole-table re-clustering (checkpoint)
            invalidate file-identity reasoning wholesale — refuse. An
            intervening OPTIMIZE is content-preserving with a
            computable file mapping (merged small set -> merged
            generation, everything else carried by identity), so it
            TRANSLATES instead (VERDICT r14 #7): allowed iff this
            write's removed set does not intersect the merged set —
            every merged row then comes from a file this write already
            proved holds no matching row, so the merged generation
            cannot hold one either and is carried through without the
            stats test; an intersection means this write's rewritten
            rows moved into the merged output — refuse.
          * a schema, constraint-set, or write_cdf change between the
            parents would make this commit publish stale metadata (or
            skip a required feed) — refuse.

        The rebased file list is rebuilt FROM THE NEW PARENT (its
        files minus this write's removals, plus this write's new
        generation), so intervening inserts/deletes on other keys are
        carried through untouched. Cost: O(intervening manifests)
        metadata reads; the already-written data generation is reused
        as-is — no data I/O."""
        def _refuse(why: str):
            raise ConcurrentWriteError(
                f"{self.path}: cannot rebase this {op} (snapshotted "
                f"version {old_parent}) onto concurrent version "
                f"{new_parent}: {why} — re-read and retry the write"
            )

        # walk new_parent -> old_parent, collecting intervening commits
        chain: list[dict] = []
        v: int | None = new_parent
        while v is not None and v != old_parent:
            fs, jp = self._fs(self._manifest_dir(v))
            if not fs.exists(jp):
                _refuse(f"version {v}'s manifest was reclaimed by vacuum")
            chain.append(self._manifest(v))
            v = chain[-1]["parent"]
        if v != old_parent:
            _refuse("the snapshotted version is not an ancestor of the "
                    "current version")
        base_man = self._manifest(old_parent) if old_parent else {"files": []}
        new_man = chain[0]
        if new_man["schema"] != base_man.get("schema"):
            _refuse("the schema changed concurrently")
        if (new_man.get("constraints") or {}) != (
            base_man.get("constraints") or {}
        ):
            _refuse("the constraint set changed concurrently (this "
                    "write's rows were not validated against it)")
        if (self.write_cdf or bool(new_man.get("write_cdf"))) != (
            self.write_cdf or bool(base_man.get("write_cdf"))
        ):
            _refuse("the change-feed property flipped concurrently")
        base_paths = {f["path"] for f in base_man["files"]}
        our_paths = {f["path"] for f in files}
        our_removed = base_paths - our_paths
        our_added = [f for f in files if f["path"] not in base_paths]
        inter_removed: set[str] = set()
        inter_added: list[dict] = []
        prev = base_man
        for m in reversed(chain):  # oldest intervening first
            if m["op"] in ("overwrite", "rollback", "promote_types",
                           "checkpoint"):
                _refuse(f"version {m['version']} is a {m['op']} — file "
                        "identity cannot be reasoned across it")
            pp = {f["path"] for f in prev["files"]}
            mp = {f["path"] for f in m["files"]}
            if m["op"] == "optimize":
                # content-preserving translation: merged files' rows
                # moved verbatim into the merged generation. Safe iff
                # none of the files THIS write rewrites/removes got
                # merged — then every merged row comes from a file
                # this write already proved match-free (CoW carries
                # exactly the unmatched files), so the merged
                # generation is match-free too and carries through
                # without the stats could-hold test.
                hit = (pp - mp) & our_removed
                if hit:
                    _refuse(
                        f"version {m['version']}'s optimize merged "
                        f"files this write also rewrites "
                        f"({sorted(hit)[:3]})"
                    )
                prev = m
                continue
            inter_removed |= pp - mp
            inter_added += [f for f in m["files"] if f["path"] not in pp]
            prev = m
        overlap = inter_removed & our_removed
        if overlap:
            _refuse(f"both writers rewrote {sorted(overlap)[:3]}")
        if inter_added:
            # bounds are only consulted against concurrently ADDED
            # files; a chain of deletes/optimizes needs none
            bounds = guard() or {}
            if not bounds:
                _refuse("this write's key/predicate range cannot be "
                        "bounded from stats, so disjointness is "
                        "unprovable")
            for f in inter_added:
                st = f.get("stats") or {}
                could_hold = True
                for col, (lo, hi) in bounds.items():
                    fst = st.get(col)
                    if fst is None:
                        continue  # unknown range: assume it could hold
                    if not self._ranges_intersect(fst[0], fst[1], lo, hi):
                        could_hold = False
                        break
                if could_hold:
                    _refuse(
                        f"concurrently added file {f['path']} may hold "
                        "rows in this write's key/predicate range"
                    )
        return [
            f for f in new_man["files"] if f["path"] not in our_removed
        ] + our_added

    def _stage_cdf(self, cdf) -> str:
        """Write the per-commit change feed's CONTENT to a hidden
        `_cdf/.tmp-*` staging directory (finalized to `_cdf/v<N>` only
        after the manifest CAS — see _commit's ordering comment):

          * a DataFrame → real row-level changes (`change_type` +
            post-images for insert/update, old images for delete) as
            plain parquet — O(changed rows);
          * "empty" → a `_CDF_EMPTY` marker: the commit moved no row
            values (checkpoint compaction, pure-metadata column add);
          * "full" → a `_CDF_FULL` marker: the commit replaced content
            wholesale (overwrite / rollback / promote_types) and a
            row-level feed would be O(2 x table) — consumers crossing
            one must re-sync from a snapshot (the same refusal Delta's
            streaming source gives non-append commits).
        """
        tmp = f"{self.path}/_cdf/.tmp-{uuid.uuid4().hex[:8]}"
        if cdf is None or isinstance(cdf, str):
            marker = "_CDF_FULL" if cdf == "full" else "_CDF_EMPTY"
            fs, jp = self._fs(tmp)
            fs.mkdirs(jp)
            mfs, mp = self._fs(f"{tmp}/{marker}")
            mfs.create(mp, True).close()
            return tmp
        cdf.write.mode("overwrite").parquet(tmp)
        return tmp

    def _finalize_cdf(self, version: int, tmp: str) -> None:
        """Rename the staged feed into `_cdf/v<N>`. Called only AFTER
        the manifest CAS succeeded, so the version number is
        exclusively ours: anything already at the target is residue
        from a crashed writer that never published a manifest (its
        version number got re-allocated) — safe to delete."""
        fs, jp = self._fs(self._cdf_dir(version))
        if fs.exists(jp):
            fs.delete(jp, True)
        _, tp = self._fs(tmp)
        if not fs.rename(tp, jp):
            raise IOError(
                f"rename {tmp} -> {self._cdf_dir(version)} failed"
            )

    def txn_version(self, app: str) -> int | None:
        """Last committed transaction version for a writer app, or None
        — the replay guard a foreachBatch sink checks (Structured
        Streaming re-delivers the in-flight batch on restart; a batch
        id at or below this value has already been committed)."""
        latest = self.latest_version()
        if latest is None:
            return None
        t = self._manifest(latest).get("txns") or {}
        return int(t[app]) if app in t else None

    def _cdf_enabled(self) -> bool:
        """The table-level feed flag: this handle's write_cdf OR the
        property carried in the latest manifest (one metadata read)."""
        if self.write_cdf:
            return True
        latest = self.latest_version()
        if latest is None:
            return False
        return bool(self._manifest(latest).get("write_cdf"))

    def _txn_applied(self, txn: tuple[str, int] | None) -> bool:
        if txn is None:
            return False
        last = self.txn_version(txn[0])
        return last is not None and int(txn[1]) <= last

    # -- write verbs ----------------------------------------------------
    def overwrite(self, df: DataFrame,
                  cluster_by: list[str] | None = None,
                  target_files: int | None = None,
                  txn: tuple[str, int] | None = None) -> int:
        """Full load as a NEW version — the previous version's files
        are untouched and stay readable until vacuumed."""
        if self._txn_applied(txn):
            return self.latest_version()
        snap = self.latest_version()
        self._enforce_constraints(df, self.constraints(), "overwrite")
        files = self._write_gen(df, cluster_by=cluster_by,
                                target_files=target_files)
        return self._commit(files, "overwrite", df.schema.json(), txn=txn,
                            expected_parent=snap, cdf="full")

    def _resolve(self, version: int | None) -> dict:
        if version is None:
            latest = self.latest_version()
            if latest is None:
                raise ValueError(f"versioned table {self.path} has no versions")
            version = latest
        return self._manifest(version)

    def _read_files(self, man: dict, rel_files: list[str]) -> DataFrame:
        # schema.json() round-trips every Spark type exactly (DDL and
        # simpleString forms drop nullability / struct field metadata)
        schema = StructType.fromJson(json.loads(man["schema"]))
        if not rel_files:
            return self.spark.createDataFrame([], schema)
        # schema pinned from the manifest: an explicit file list must
        # not re-infer (order-dependent) or silently union-widen
        return self.spark.read.schema(schema).parquet(
            *[self._abs(r) for r in rel_files]
        )

    def read(self, version: int | None = None) -> DataFrame:
        """Time travel: the table AS OF `version` (default: latest).

        Explicit-version reads verify the manifest's files still exist
        FIRST and refuse loudly when vacuum reclaimed them — a handle
        that raced a vacuum would otherwise die with an opaque
        FileNotFoundException halfway through the scan. (Latest-version
        reads skip the check: vacuum always retains the current
        version, so the hot path pays zero extra metadata calls.
        Exception: ABSOLUTE entries — a shallow clone's references into
        its SOURCE's files — are presence-checked on EVERY read,
        because the source's own vacuum can reclaim them at any time
        (the documented clone hazard); the check is O(referenced
        files) metadata and disappears once divergence/compaction has
        rewritten the references into clone-local files.)"""
        man = self._resolve(version)
        if version is not None:
            self._assert_files_present(man, f"read(version={version})")
        else:
            refs = [f for f in man["files"]
                    if self._abs(f["path"]) == f["path"]]
            if refs:
                self._assert_files_present(
                    man, "read() through this shallow clone's source "
                    "references", entries=refs,
                )
        return self._read_files(man, [f["path"] for f in man["files"]])

    def _assert_files_present(self, man: dict, op: str,
                              entries: list[dict] | None = None) -> None:
        missing = []
        for f in (man["files"] if entries is None else entries):
            fs, jp = self._fs(self._abs(f["path"]))
            if not fs.exists(jp):
                missing.append(f["path"])
                if len(missing) >= 3:
                    break
        if missing:
            raise ValueError(
                f"cannot {op} on {self.path}: version "
                f"{man['version']}'s data files were reclaimed by "
                f"vacuum (missing e.g. {missing}); only versions within "
                "the vacuum retention window stay readable"
            )

    def read_range(self, col: str, lo=None, hi=None,
                   version: int | None = None) -> DataFrame:
        """Manifest-level file skipping + the exact residual filter.

        Files whose recorded [min, max] for `col` cannot intersect
        [lo, hi] are dropped from the PLAN (never opened, never listed
        — the Iceberg scan-planning move); files without stats are
        kept. The same bounds are then applied as a real predicate, so
        the result is byte-identical to an unpruned filter."""
        man = self._resolve(version)
        if version is not None:
            self._assert_files_present(man, f"read_range(version={version})")
        lo_s = None if lo is None else str(lo)
        hi_s = None if hi is None else str(hi)
        keep = []
        for f in man["files"]:
            st = (f.get("stats") or {}).get(col)
            if st is not None:
                fmin, fmax = st
                # str() ordering is exact for the stats-safe types'
                # canonical renderings ONLY when widths align (ints of
                # different magnitudes don't compare lexically) — so
                # only prune when both sides render comparably, i.e.
                # same-width or non-numeric (ISO dates/timestamps).
                # Numeric safety: compare as floats when both parse.
                if not self._ranges_intersect(fmin, fmax, lo_s, hi_s):
                    continue
            keep.append(f["path"])
        df = self._read_files(man, keep)
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df

    @staticmethod
    def _ranges_intersect(fmin: str, fmax: str, lo: str | None,
                          hi: str | None) -> bool:
        def _cmp_pair(a: str, b: str):
            try:
                return float(a), float(b)  # numeric types
            except ValueError:
                # ISO dates/timestamps compare lexically — but only
                # after normalizing the date/time separator: footer
                # stats render as '1996-06-30 23:59:59' while a caller
                # may pass isoformat()'s '1996-06-30T23:59:59', and
                # ' ' < 'T' would wrongly prune intersecting files
                return a.replace("T", " "), b.replace("T", " ")

        if lo is not None:
            fmax_c, lo_c = _cmp_pair(fmax, lo)
            if fmax_c < lo_c:
                return False
        if hi is not None:
            fmin_c, hi_c = _cmp_pair(fmin, hi)
            if fmin_c > hi_c:
                return False
        return True

    def _schema_dtypes(self, man: dict) -> dict[str, str]:
        return {
            f.name: f.dataType.simpleString()
            for f in StructType.fromJson(json.loads(man["schema"])).fields
        }

    def _delta_key_bounds(self, man: dict, delta: DataFrame,
                          keys: list[str]) -> dict[str, tuple[str, str]]:
        """Per-key [lo, hi] bounds of a delta frame, rendered in the
        manifest-stat canonical form — ONE aggregate over the
        CDC-sized delta, zero table I/O. A key contributes no bound
        when it is not stats-safe, absent, all-NULL, carries any NULL
        (key matching is null-safe; footer stats say nothing about
        null presence), or renders un-normalizably — fewer bounds only
        means less pruning / a refused rebase, never a wrong one."""
        dtypes = self._schema_dtypes(man)
        targets = [
            k for k in keys
            if k in delta.columns and _stats_safe(dtypes.get(k, ""))
        ]
        if not targets:
            return {}
        aggs = []
        for k in targets:
            aggs += [
                F.min(k).alias(f"__lo_{k}"),
                F.max(k).alias(f"__hi_{k}"),
                F.sum(F.col(k).isNull().cast("long")).alias(f"__null_{k}"),
            ]
        row = delta.agg(*aggs).first()
        bounds: dict[str, tuple[str, str]] = {}
        for k in targets:
            if row is None or row[f"__lo_{k}"] is None:
                continue  # empty delta or all-NULL key: no bound
            if (row[f"__null_{k}"] or 0) > 0:
                continue  # NULL keys match null-safely; stats can't see them
            lo = self._delta_stat_str(row[f"__lo_{k}"], dtypes.get(k, ""))
            hi = self._delta_stat_str(row[f"__hi_{k}"], dtypes.get(k, ""))
            if lo is None or hi is None:
                continue  # un-normalizable rendering: no bound, never wrong
            bounds[k] = (lo, hi)
        return bounds

    def _key_candidate_files(
        self, man: dict, delta: DataFrame, keys: list[str]
    ) -> tuple[list[str], dict[str, tuple[str, str]] | None]:
        """Stat-pruned key location: relative paths of the files that
        COULD hold one of the delta's keys, from the manifest's
        per-file min/max — the same intersection the read_range scan
        planner does, driven by the delta's own key bounds
        (_delta_key_bounds). A clustered 100 TB table takes a small
        merge at O(intersecting files), not O(table). Conservative by
        construction: a file without stats for a bound column is kept,
        so pruning can only shrink I/O, never change which keys match.
        Returns (paths, bounds) — bounds is None when the pruning
        aggregate was SKIPPED: on a manifest of only a handful of
        files the delta-bound aggregate (one Spark job) costs more
        than the scan it could save, so tiny tables scan everything
        (the overhead showed up at toy scale in BENCH_r13's
        time_travel_roundtrip; at 100 TB the manifest is never this
        small). Callers that need the bounds anyway (the rebase guard)
        recompute them lazily via _delta_key_bounds."""
        if len(man["files"]) <= 4:
            return [f["path"] for f in man["files"]], None
        bounds = self._delta_key_bounds(man, delta, keys)
        if not bounds:
            return [f["path"] for f in man["files"]], bounds
        keep = []
        for f in man["files"]:
            st = f.get("stats") or {}
            ok = True
            for k, (lo, hi) in bounds.items():
                fst = st.get(k)
                if fst is None:
                    continue  # no stats recorded: must keep
                if not self._ranges_intersect(fst[0], fst[1], lo, hi):
                    ok = False
                    break
            if ok:
                keep.append(f["path"])
        return keep, bounds

    @staticmethod
    def _predicate_bounds(condition: str, dtypes: dict[str, str],
                          session_tz: str = "UTC") -> dict[str, tuple]:
        """Extract per-column [lo, hi] bounds implied by a SQL-string
        predicate, for manifest-stat file pruning in delete_where.
        Only an AND-conjunction of `col OP literal` comparisons on
        stats-safe columns yields bounds; any disjunction / negation /
        parenthesized or unrecognized fragment (functions, BETWEEN)
        disables extraction or contributes no bound — always safe,
        since fewer bounds only means fewer files pruned (the
        candidate set must stay a superset of the files holding
        matching rows)."""
        # mask quoted literals FIRST: an 'and'/'or' INSIDE a string
        # literal must neither split a conjunct (phantom bounds from
        # fragments of the literal would prune files that hold matching
        # rows) nor disable extraction
        literals: list[str] = []

        def _mask(m):
            literals.append(m.group(0))
            return f"\x00{len(literals) - 1}\x00"

        masked = re.sub(r"'[^']*'", _mask, condition)
        if masked.count("'"):
            return {}  # unbalanced quotes: refuse to guess
        if re.search(r"\bor\b|\bnot\b|[()]", masked, re.IGNORECASE):
            return {}
        out: dict[str, list] = {}
        for part in re.split(r"\band\b", masked, flags=re.IGNORECASE):
            for i, q in enumerate(literals):  # restore literals
                part = part.replace(f"\x00{i}\x00", q)
            m = _CMP_RE.match(part)
            if not m:
                continue  # unparsed conjunct: narrows rows, no bound
            col, op, lit = m.group(1), m.group(2), m.group(3).strip()
            dtype = dtypes.get(col, "")
            if not _stats_safe(dtype):
                continue
            if dtype.startswith(("timestamp", "date")):
                # re-render the literal in the stats' canonical UTC-naive
                # form (date-grained literal promotes to midnight, an
                # explicit offset / zero fraction / 'T' separator all
                # normalize away); an unparseable literal contributes no
                # bound — never a wrong one
                lit = _norm_ts_literal(lit, dtype, session_tz)
                if lit is None:
                    continue
            lo, hi = out.get(col, [None, None])
            if op in (">", ">="):
                lo = lit if lo is None else max(lo, lit)
            elif op in ("<", "<="):
                hi = lit if hi is None else min(hi, lit)
            else:  # = / ==
                lo, hi = lit, lit
            out[col] = [lo, hi]
        return {k: tuple(v) for k, v in out.items()}

    def _delta_stat_str(self, v, dtype: str) -> str | None:
        """Render a DRIVER-COLLECTED delta bound comparably to the
        manifest's UTC-naive stat strings. collect() returns TIMESTAMP
        values as naive datetimes in the SESSION time zone — under a
        non-UTC session they would be offset from the UTC-normalized
        file stats and could prune files that genuinely hold the
        delta's keys (a silent duplicate-key merge). timestamp_ntz is
        wall time on both sides and needs no shift. Returns None when
        the session zone cannot be resolved — no bound beats a wrong
        one."""
        if isinstance(v, _dt.datetime) and v.tzinfo is None and dtype == "timestamp":
            tz = self.spark.conf.get("spark.sql.session.timeZone")
            try:
                from zoneinfo import ZoneInfo

                v = (v.replace(tzinfo=ZoneInfo(tz))
                     .astimezone(_dt.timezone.utc).replace(tzinfo=None))
            except Exception:
                return None
        return _stat_str(v)

    def _bounded_candidate_files(self, man: dict,
                                 bounds: dict[str, tuple]) -> list[str]:
        """Files whose stats can intersect every extracted bound."""
        if not bounds:
            return [f["path"] for f in man["files"]]
        keep = []
        for f in man["files"]:
            st = f.get("stats") or {}
            ok = True
            for col, (lo, hi) in bounds.items():
                fst = st.get(col)
                if fst is None:
                    continue
                if not self._ranges_intersect(fst[0], fst[1], lo, hi):
                    ok = False
                    break
            if ok:
                keep.append(f["path"])
        return keep

    def evolve_schema_to(self, sample: DataFrame) -> list[str]:
        """Schema evolution with ZERO data movement — the versioning
        superpower plain tables don't have: because every read plans
        with the MANIFEST's pinned schema and Spark's parquet reader
        NULL-fills columns missing from a file, adding a column is one
        metadata commit — the widened schema over the UNCHANGED file
        list. ParquetTable.widen_to pays one O(table) NULL-filled
        rewrite for the same contract; here old files are never
        touched, and time travel keeps each version's own schema.

        Shared-column TYPE drift follows ParquetTable.promote_types'
        lattice (_is_widening): an exactly-representable widening
        (int->bigint, float->double, decimal growth) promotes via ONE
        O(table) cast-rewrite (reading an int32 file under a bigint
        schema is reader-dependent, so carried files must be rewritten
        for promotions — only column ADDS are free); anything else
        raises rather than narrow stored values. VOID-typed (all-NULL)
        sample columns are skipped until a batch materializes a type.
        Returns the added column names."""
        from pyspark.sql.types import NullType

        from nomba_data_pipeline_spark.operators.merge import _is_widening

        man = self._resolve(None)
        schema = StructType.fromJson(json.loads(man["schema"]))
        existing = {f.name: f.dataType for f in schema.fields}
        added, promoted = [], {}
        for f in sample.schema.fields:
            if isinstance(f.dataType, NullType):
                continue
            if f.name not in existing:
                schema = schema.add(f.name, f.dataType, True)
                added.append(f.name)
            elif existing[f.name] != f.dataType:
                if not _is_widening(existing[f.name], f.dataType):
                    raise ValueError(
                        f"column {f.name!r} changed type "
                        f"{existing[f.name].simpleString()} -> "
                        f"{f.dataType.simpleString()}, which is not an "
                        "exactly-representable widening — refusing to "
                        "narrow stored values"
                    )
                promoted[f.name] = f.dataType
        if promoted:
            # one cast-rewrite of the whole table (the promote_types
            # cost contract) committed FIRST, so the add below stays a
            # pure metadata commit over the promoted files
            cur = self.read()
            casted = cur.select(
                *[
                    F.col(c).cast(promoted[c]).alias(c) if c in promoted
                    else F.col(c)
                    for c in cur.columns
                ]
            )
            files = self._write_gen(casted)
            self._commit(
                files, "promote_types", casted.schema.json(),
                {"promoted_columns": sorted(promoted)},
                expected_parent=man["version"], cdf="full",
            )
            man = self._resolve(None)
            base = StructType.fromJson(json.loads(man["schema"]))
            for name in added:  # re-apply the adds onto the promoted base
                fld = sample.schema[name]
                base = base.add(fld.name, fld.dataType, True)
            schema = base
        if not added:
            return []  # promotions are recorded in history(), not returned
        self._commit(list(man["files"]), "evolve_schema", schema.json(),
                     {"added_columns": added},
                     expected_parent=man["version"], cdf="empty")
        return added

    def merge_upsert(self, delta: DataFrame, keys: list[str],
                     txn: tuple[str, int] | None = None,
                     evolve_schema: bool = False) -> int:
        """Keyed upsert with FILE-level copy-on-write: only files that
        currently hold one of the delta's keys are rewritten (anti-join
        out the old rows, union the delta); every other file is carried
        into the new manifest by reference. NULL keys match null-safely
        — the same contract as ParquetTable.merge_upsert. Finding the
        holding files is itself STAT-PRUNED (_key_candidate_files): the
        delta's key min/max intersect the manifest's per-file stats, so
        on a key-clustered table the location scan reads O(intersecting
        files), not O(table) — the full CoW cost bound is metadata +
        candidate-file I/O.

        txn=(app, batch_version) makes the commit REPLAY-IDEMPOTENT
        (Delta's transactional-writer design): a batch id at or below
        the app's recorded high-water is skipped, so a Structured
        Streaming foreachBatch sink that crashes between commit and
        checkpoint converges to exactly-once on redelivery.

        Schema drift: by default source-only columns are DROPPED and
        shared columns cast to the target's type (_align_to_target —
        the same reference-parity contract as ParquetTable).
        evolve_schema=True instead widens the table first via
        evolve_schema_to — a pure METADATA commit, no rewrite — so this
        and every later delta carries the new columns."""
        if not self.exists():
            return self.overwrite(delta, txn=txn)
        if self._txn_applied(txn):
            return self.latest_version()
        if evolve_schema:
            self.evolve_schema_to(delta)
        man = self._resolve(None)
        # alignment needs only the manifest's pinned schema — never
        # plan a full-table read for it
        delta = _align_to_target(delta, self._read_files(man, []))
        # CHECK enforcement on the DELTA only: carried files and the
        # anti-join survivors already satisfied every constraint when
        # they landed (constraints only ever tighten via add_constraint,
        # which validates the whole table)
        self._enforce_constraints(
            delta, man.get("constraints") or {}, "merge_upsert"
        )
        # which files hold a delta key? Manifest stats first shrink the
        # scan to the files whose key range can intersect the delta's
        # (O(candidate files) on a key-clustered table, never O(table));
        # then input_file_name() tags each candidate row with its source
        # file; the collect is bounded by |touched files| — the same
        # bounded-driver-list shape as the partition scans in
        # ParquetTable._merge_scoped_partitions
        candidates, key_bounds = self._key_candidate_files(man, delta, keys)
        tagged = self._read_files(man, sorted(candidates)).withColumn(
            "__vfile", F.input_file_name()
        )
        touched_abs = [
            r["__vfile"]
            for r in _semi_anti_null_safe(
                tagged, delta.select(*keys), keys, "left_semi"
            ).select("__vfile").distinct().collect()
        ]
        touched = {self._rel(p) for p in touched_abs}
        kept = [f for f in man["files"] if f["path"] not in touched]
        if touched:
            old_rows = self._read_files(man, sorted(touched))
            rewritten = _semi_anti_null_safe(
                old_rows, delta.select(*keys), keys, "left_anti"
            ).unionByName(delta)
        else:
            rewritten = delta
        cdf = None
        cdf_on = self.write_cdf or bool(man.get("write_cdf"))
        if cdf_on:
            # a key existing ANYWHERE in the table is by construction in
            # a touched file, so update-vs-insert splits against the
            # touched rows only — O(changed rows), no table read. A
            # same-values upsert still emits an update (post-image
            # semantics; replay converges) — diff_versions is the
            # variant that drops no-op rows. Updates ALSO emit their
            # PRE-IMAGE rows (change_type 'update_preimage' — Delta
            # CDF's update_preimage design): with the pre-span image in
            # the feed, a span of commits folds to an EXACT
            # diff_versions result (no-op reverts dropped, deletes
            # carrying the span-start values) without reading any table
            # version — what lets diff_versions cross a compaction at
            # O(changes). Default feed readers filter preimages out.
            if touched:
                old_keys = old_rows.select(*keys)
                cdf = _semi_anti_null_safe(
                    delta, old_keys, keys, "left_semi"
                ).select(F.lit("update").alias("change_type"), "*").unionByName(
                    _semi_anti_null_safe(
                        old_rows, delta.select(*keys), keys, "left_semi"
                    ).select(
                        F.lit("update_preimage").alias("change_type"), "*"
                    )
                ).unionByName(
                    _semi_anti_null_safe(
                        delta, old_keys, keys, "left_anti"
                    ).select(F.lit("insert").alias("change_type"), "*")
                )
            else:
                cdf = delta.select(F.lit("insert").alias("change_type"), "*")
        new_files = self._write_gen(rewritten)
        return self._commit(
            kept + new_files, "merge_upsert", man["schema"],
            {"rewrote_files": len(touched), "carried_files": len(kept)},
            txn=txn, expected_parent=man["version"], cdf=cdf,
            # disjoint concurrent commits rebase instead of refusing;
            # bounds recomputed lazily when pruning was short-circuited
            rebase_guard=(
                (lambda: key_bounds) if key_bounds is not None
                else (lambda: self._delta_key_bounds(man, delta, keys))
            ),
        )

    def delete_where(self, condition,
                     txn: tuple[str, int] | None = None,
                     _purge: bool = False) -> int:
        """CoW delete: files with no matching row are carried by
        reference; matching files are rewritten with the kept rows
        (NULL-valued conditions keep the row — DELETE only removes rows
        where the predicate is TRUE, per SQL). txn as in merge_upsert.
        _purge (set by purge_where/purge_keys only): write the commit's
        change feed as a _CDF_FULL marker INSTEAD of the deleted rows'
        old images — an erasure's subject bytes must never reach the
        feed directory, even transiently (a crash between a plain
        delete commit and a later redaction would retain them)."""
        if self._txn_applied(txn):
            return self.latest_version()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        man = self._resolve(None)
        # manifest-stat pruning for the matching-file scan: a string
        # predicate that is a conjunction of simple comparisons on
        # stats columns only scans the files whose ranges can satisfy
        # it (Column conditions and complex predicates scan all files
        # — pruning is an optimization, never a semantics change)
        bounds = (
            self._predicate_bounds(
                condition, self._schema_dtypes(man),
                self.spark.conf.get("spark.sql.session.timeZone"),
            )
            if isinstance(condition, str) else {}
        )
        candidates = self._bounded_candidate_files(man, bounds)
        tagged = self._read_files(man, sorted(candidates)).withColumn(
            "__vfile", F.input_file_name()
        )
        touched_abs = [
            r["__vfile"]
            for r in tagged.filter(cond).select("__vfile").distinct().collect()
        ]
        touched = {self._rel(p) for p in touched_abs}
        kept = [f for f in man["files"] if f["path"] not in touched]
        new_files = []
        cdf = None
        cdf_on = self.write_cdf or bool(man.get("write_cdf"))
        if touched:
            touched_rows = self._read_files(man, sorted(touched))
            survivors = touched_rows.filter(~F.coalesce(cond, F.lit(False)))
            new_files = self._write_gen(survivors)
            if cdf_on:
                cdf = "full" if _purge else touched_rows.filter(
                    F.coalesce(cond, F.lit(False))
                ).select(F.lit("delete").alias("change_type"), "*")
        elif cdf_on:
            cdf = "empty"  # no matching rows anywhere: a no-op commit
        return self._commit(
            kept + new_files, "delete_where", man["schema"],
            {"rewrote_files": len(touched), "carried_files": len(kept)},
            txn=txn, expected_parent=man["version"], cdf=cdf,
            # a Column condition / complex predicate yields no bounds ->
            # the rebase refuses (conservative), plain conjunctions rebase
            rebase_guard=lambda: bounds,
        )

    def high_water_mark_str(self, tracking_col: str) -> str | None:
        """MAX(tracking_col) as its string rendering — from MANIFEST
        stats when every file carries them (pure metadata, zero scan:
        the versioned analogue of ParquetTable.high_water_mark_stats),
        falling back to an exact scan otherwise. String form because
        the runner's delta predicate re-parses it with a cast to the
        column's own dtype — the same pinned round-trip the join-view
        HWM sidecar uses."""
        if not self.exists():
            return None
        man = self._resolve(None)
        best: str | None = None
        stats_ok = len(man["files"]) > 0
        dtype = next(
            (f.dataType.simpleString()
             for f in StructType.fromJson(json.loads(man["schema"])).fields
             if f.name == tracking_col),
            "",
        )
        numeric = dtype.startswith(("int", "bigint", "smallint", "tinyint",
                                    "float", "double", "decimal"))
        try:
            for f in man["files"]:
                st = (f.get("stats") or {}).get(tracking_col)
                if st is None:
                    stats_ok = False
                    break
                hi = st[1]
                if best is None:
                    best = hi
                elif numeric:
                    best = hi if float(hi) > float(best) else best
                else:  # ISO timestamps/dates compare lexically
                    best = max(best, hi)
            if stats_ok and best is not None:
                return best
        except Exception:
            # e.g. a decimal column whose footer stats an older pyarrow
            # left as undecoded bytes — float() would raise. Stats are
            # an optimization, never a correctness dependency: any
            # parse surprise falls back to the exact scan below.
            pass
        row = self.read().agg(F.max(tracking_col).alias("m")).first()
        return None if row is None or row["m"] is None else str(row["m"])

    def delete_keys(self, keys: DataFrame, cols: list[str],
                    txn: tuple[str, int] | None = None,
                    _purge: bool = False) -> int:
        """CoW delete BY KEY FRAME (null-safe) — the bulk form of
        delete_where: a predicate cannot express 'rows whose key is in
        this million-row frame', but an anti-join can. Same file-level
        bound: files holding no matching key are carried by
        reference. _purge as in delete_where: the erasure path writes
        a _CDF_FULL marker at commit time so the erased rows' old
        images never reach the feed directory, even transiently."""
        if self._txn_applied(txn):
            return self.latest_version()
        man = self._resolve(None)
        keys = keys.select(*cols)
        # same stat-pruned key location as merge_upsert: only files
        # whose recorded key range can intersect the key frame's are
        # scanned for matches
        candidates, key_bounds = self._key_candidate_files(man, keys, cols)
        tagged = self._read_files(man, sorted(candidates)).withColumn(
            "__vfile", F.input_file_name()
        )
        touched_abs = [
            r["__vfile"]
            for r in _semi_anti_null_safe(tagged, keys, cols, "left_semi")
            .select("__vfile").distinct().collect()
        ]
        touched = {self._rel(p) for p in touched_abs}
        kept = [f for f in man["files"] if f["path"] not in touched]
        new_files = []
        cdf = None
        cdf_on = self.write_cdf or bool(man.get("write_cdf"))
        if touched:
            touched_rows = self._read_files(man, sorted(touched))
            survivors = _semi_anti_null_safe(
                touched_rows, keys, cols, "left_anti"
            )
            new_files = self._write_gen(survivors)
            if cdf_on:
                cdf = "full" if _purge else _semi_anti_null_safe(
                    touched_rows, keys, cols, "left_semi"
                ).select(F.lit("delete").alias("change_type"), "*")
        elif cdf_on:
            cdf = "empty"
        return self._commit(
            kept + new_files, "delete_keys", man["schema"],
            {"rewrote_files": len(touched), "carried_files": len(kept)},
            txn=txn, expected_parent=man["version"], cdf=cdf,
            rebase_guard=(
                (lambda: key_bounds) if key_bounds is not None
                else (lambda: self._delta_key_bounds(man, keys, cols))
            ),
        )

    def purge_keys(self, keys: DataFrame, cols: list[str]) -> dict:
        """GDPR erasure by key frame: delete_keys + vacuum-to-one, the
        same contract as purge_where (no retained version or on-disk
        file still holds the subject; history across the purge is
        deliberately gone). Under write_cdf the delete commit writes
        its feed AS a _CDF_FULL marker directly (_purge flag) — the
        erased rows' old images never reach the feed directory even
        transiently, so no crash window between commit and vacuum can
        retain subject bytes (a replayable erasure is not an erasure;
        consumers crossing the marker re-sync from a snapshot). A live
        SHALLOW CLONE blocks the purge loudly BEFORE anything is
        deleted — an erasure is not complete while a clone still
        references the subject's files; erase or drop the clones
        first."""
        self._assert_no_live_clones("purge_keys")
        v = self.delete_keys(keys, cols, _purge=True)
        res = self.vacuum(retain_last=1)
        return {"purged_version": v, **res}

    def purge_where(self, condition, txn: tuple[str, int] | None = None) -> dict:
        """GDPR-grade deletion under time travel: a plain delete_where
        removes rows from the NEW version only — every retained older
        version (and rollback) still reads the subject, which is
        exactly what an erasure regulator forbids. purge_where composes
        the honest sequence (the same remedy Delta Lake documents:
        DELETE then VACUUM): CoW-delete the matching rows, then vacuum
        down to ONLY the delete version. Its file list already contains
        no subject bytes anywhere — carried files never held a match
        and the rewritten generation holds only survivors — so the
        vacuum physically deletes every file that ever held a purged
        row at O(touched files + metadata), never an O(table) rewrite.
        The deliberate cost is history: time travel across the purge is
        gone (that is the point), so this is the erasure verb, not the
        everyday delete. Under write_cdf the delete commit writes its
        feed AS a _CDF_FULL marker directly (_purge flag) — old images
        never reach the feed directory, closing the crash window a
        commit-then-redact sequence would leave. A live SHALLOW CLONE
        blocks the purge loudly BEFORE anything is deleted — an
        erasure is not complete while a clone still references the
        subject's files; erase or drop the clones first."""
        self._assert_no_live_clones("purge_where")
        v = self.delete_where(condition, txn=txn, _purge=True)
        res = self.vacuum(retain_last=1)
        return {"purged_version": v, **res}

    @staticmethod
    def _strip_scheme(p: str) -> str:
        if p.startswith("file:"):
            p = p[len("file:"):]
            while p.startswith("//"):  # file:/// form
                p = p[1:]
        return p

    def _abs(self, entry_path: str) -> str:
        """A manifest entry's readable location. Ordinary entries are
        TABLE-RELATIVE (`_gen/g-*/part-*.parquet`); a SHALLOW CLONE's
        manifest carries ABSOLUTE entries referencing the clone
        SOURCE's files (leading `/` or scheme) — zero bytes copied at
        clone time, diverged writes land table-relative as usual."""
        if entry_path.startswith("/") or "://" in entry_path \
                or entry_path.startswith("file:"):
            return entry_path
        return f"{self.path}/{entry_path}"

    def _rel(self, abs_uri: str) -> str:
        """input_file_name() URI -> the manifest-entry form of that
        file: table-relative for files under THIS table's `_gen`, the
        absolute path for a shallow clone's referenced source files
        (so touched-set membership tests line up with the manifest's
        own entry strings either way)."""
        p = self._strip_scheme(abs_uri)
        i = p.find("/_gen/")
        if i < 0:
            raise ValueError(f"file {abs_uri} is not under a _gen root")
        if p[:i] == self._strip_scheme(self.path):
            return p[i + 1:]
        return p  # a clone's referenced source file: absolute entry

    def rollback(self, version: int) -> int:
        """Revert to `version` as a NEW version referencing its files —
        O(metadata), nothing rewritten, history preserved (Delta
        RESTORE semantics: the bad versions stay inspectable until
        vacuum). Refuses if the target's files were already vacuumed."""
        # snapshot BEFORE the manifest read + per-file existence loop:
        # evaluating expected_parent at the _commit call would make the
        # concurrent-writer check a zero-width no-op
        snap = self.latest_version()
        man = self._manifest(version)
        # a rollback target may PREDATE an active CHECK constraint (the
        # constraint validated the then-current table, not history) —
        # reinstating violating rows would silently break the invariant
        # merge_upsert's delta-only enforcement rests on. One scan of
        # the target's files; rollback is the rare verb.
        cons = self.constraints()
        if cons:
            self._enforce_constraints(
                self._read_files(man, [f["path"] for f in man["files"]]),
                cons, f"rollback to version {version}",
            )
        for f in man["files"]:
            fs, jp = self._fs(self._abs(f["path"]))
            if not fs.exists(jp):
                raise ValueError(
                    f"cannot roll back {self.path} to version {version}: "
                    f"data file {f['path']} was reclaimed by vacuum"
                )
        return self._commit(
            list(man["files"]), "rollback", man["schema"],
            {"rolled_back_to": version},
            expected_parent=snap,
            cdf="full",
        )

    def clone(self, dest_path: str,
              version: int | None = None) -> "VersionedTable":
        """SHALLOW CLONE (Delta Lake SHALLOW CLONE semantics): create a
        NEW versioned table at `dest_path` whose v1 manifest REFERENCES
        this table's files by absolute path — zero data copied, one
        manifest write, O(metadata) regardless of table size. At 100 TB
        this is the dev-snapshot / branch verb: the reference re-runs
        its CDC experiments against full COPIES of the warehouse
        (setup/simulate_cdc.py re-load), an O(table) copy per
        experiment; a shallow clone gives the same isolated, writable
        table for the cost of a manifest.

        Divergence is CoW-LOCAL: post-clone writes land in the CLONE's
        own generations (merge_upsert rewrites a touched source
        reference into a clone-local file and carries the rest), so
        neither side's writes are ever visible to the other — the
        source stays byte-untouched.

        The vacuum-hazard contract, stated: the clone does NOT pin the
        source's files. Cloning records (dest, source_version) in the
        source's `_clones/` registry; a source `vacuum` whose retained
        chain no longer includes a registered clone's source version
        REFUSES loudly (override with ignore_clones=True — e.g. after
        dropping the clone), and clone reads presence-check their
        source references on every read, refusing loudly when the
        source reclaimed them, never dying mid-scan. Schema, CHECK
        constraints, and the write_cdf property carry over; the
        writer-transaction map does NOT (the clone is a new table — a
        streaming writer against it must not have its first batches
        skipped by the source's replay ledger). The clone commit is a
        wholesale-content v1 (`_CDF_FULL` under write_cdf): feed
        consumers start from a snapshot of it, exactly like overwrite.

        `version` clones the table AS OF that version (default:
        latest). Returns the clone's handle."""
        man = self._resolve(version)
        src_v = man["version"]
        self._assert_files_present(man, f"clone version {src_v}")
        dest = VersionedTable(
            self.spark, dest_path, stats_cols=self.stats_cols,
            write_cdf=self.write_cdf or bool(man.get("write_cdf")),
        )
        if dest.exists():
            raise ValueError(
                f"clone destination {dest.path} already exists — "
                "shallow clone creates a NEW table; vacuum/remove the "
                "destination first"
            )
        # registry entry FIRST: a crash after the dest commit without
        # the entry would leave an unprotected clone; the reverse order
        # leaves only a stale entry, which vacuum prunes when the dest
        # does not exist
        self._write_json(
            f"{self.path}/_clones/c-{uuid.uuid4().hex[:10]}",
            {"dest": dest.path, "source_version": src_v},
        )
        dest._commit(
            [{**f, "path": self._abs(f["path"])} for f in man["files"]],
            "clone", man["schema"],
            {
                "cloned_from": self.path,
                "cloned_version": src_v,
                "constraints": dict(man.get("constraints") or {}),
            },
            expected_parent=None, cdf="full",
        )
        return dest

    def _assert_no_live_clones(self, op: str) -> None:
        """Refuse an erasure verb while a live shallow clone can still
        read this table's files — BEFORE any delete commits, so a
        refused purge leaves no partial state (the purge's delete has
        GDPR semantics only if the vacuum leg can follow it)."""
        live = [c for _, c in self._clone_registry()
                if VersionedTable(self.spark, c["dest"]).exists()]
        if live:
            raise ValueError(
                f"{op} on {self.path} refused: live shallow clones "
                f"still reference this table's files "
                f"({[c['dest'] for c in live]}) — an erasure is "
                "incomplete while a clone can read the subject; erase "
                "or drop the clones first"
            )

    def _clone_registry(self) -> list[tuple[str, dict]]:
        """Registered shallow clones of THIS table: (entry name,
        {dest, source_version}) pairs — one listing plus one tiny read
        per clone; unreadable residue is skipped."""
        fs, p = self._fs(f"{self.path}/_clones")
        if not fs.exists(p):
            return []
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            try:
                out.append(
                    (name, self._read_json(f"{self.path}/_clones/{name}"))
                )
            except Exception:
                continue
        return out

    def checkpoint(self, cluster_by: list[str] | None = None,
                   target_files: int | None = None,
                   zorder_by: list[str] | None = None,
                   bits: int = 8) -> int:
        """Rewrite the CURRENT version into one fresh generation: after
        many small CoW deltas the file list (and scan fan-out) grows —
        this is the bounded-compaction step, same role as
        ParquetTable.compact for flat tables. The everyday compaction
        verb is optimize_small_files (O(small bytes)); checkpoint is
        the explicit RE-CLUSTERING rewrite.

        zorder_by=[a, b] (VERDICT r14 #9) lays the rewrite out along
        the Morton interleave of the two columns' normalized codes
        instead of a linear sort — each file's MANIFEST stats then
        carry a narrow min/max on BOTH columns, so read_range /
        _key_candidate_files prune for predicates on either dimension
        alone (a linear cluster_by=[a, b] is selective for `a` only).
        Same one-shuffle repartitionByRange cost as cluster_by; the
        z-key is computed, ranged on, and dropped (content-preserving,
        schema unchanged). Mutually exclusive with cluster_by."""
        if zorder_by and cluster_by:
            raise ValueError("pass cluster_by or zorder_by, not both")
        man = self._resolve(None)
        df = self.read()
        if zorder_by:
            df = self._zorder_arrange(df, zorder_by, bits, target_files)
            files = self._write_gen(df)  # layout already arranged
        else:
            files = self._write_gen(df, cluster_by=cluster_by,
                                    target_files=target_files)
        return self._commit(
            files, "checkpoint", man["schema"],
            {"compacted_files": len(man["files"])},
            expected_parent=man["version"], cdf="empty",
        )

    def _zorder_arrange(self, df: DataFrame, zorder_by: list[str],
                        bits: int, target_files: int | None) -> DataFrame:
        """Range-partition `df` by the Morton key of the two zorder_by
        columns (functions/zorder.py — the same interleave
        ParquetTable.zorder uses): one tiny bounds agg, one shuffle,
        key dropped before write."""
        from nomba_data_pipeline_spark.functions.zorder import (
            bounded_code,
            zorder_key,
        )

        if len(zorder_by) != 2:
            raise ValueError(
                f"zorder_by takes exactly two columns, got {zorder_by}"
            )
        col_a, col_b = zorder_by
        bounds = df.agg(
            F.min(col_a).alias("alo"), F.max(col_a).alias("ahi"),
            F.min(col_b).alias("blo"), F.max(col_b).alias("bhi"),
        ).first()
        if bounds is None or bounds["alo"] is None or bounds["blo"] is None:
            return df  # empty / all-NULL dimension: nothing to order

        def code(col, lo, hi):
            if lo == hi:  # constant column carries no ordering signal
                return F.lit(0).cast("bigint")
            return bounded_code(col, lo, hi, bits)

        keyed = (
            df.withColumn("__za", code(col_a, bounds["alo"], bounds["ahi"]))
            .withColumn("__zb", code(col_b, bounds["blo"], bounds["bhi"]))
            .withColumn("__zkey", zorder_key("__za", "__zb", bits))
        )
        rng = (keyed.repartitionByRange(target_files, "__zkey")
               if target_files else keyed.repartitionByRange("__zkey"))
        return (rng.sortWithinPartitions("__zkey")
                .drop("__za", "__zb", "__zkey"))

    # -- CHECK constraints (write-time enforcement, Delta parity) --------
    def constraints(self) -> dict[str, str]:
        """The table's CHECK constraints ({name: sql_expr}) from the
        latest manifest — one metadata read."""
        latest = self.latest_version()
        if latest is None:
            return {}
        return dict(self._manifest(latest).get("constraints") or {})

    def add_constraint(self, name: str, expr: str) -> int:
        """Add `CHECK (expr)`: validates the EXISTING data once (one
        scan counting violations — a constraint the table already
        breaks must refuse, not lie), then commits METADATA ONLY (the
        unchanged file list with the constraint recorded). Every later
        overwrite/merge validates its incoming rows against all
        constraints BEFORE writing anything. SQL CHECK semantics: NULL
        passes; only rows where the expression is FALSE violate."""
        man = self._resolve(None)
        cons = dict(man.get("constraints") or {})
        if name in cons:
            raise ValueError(
                f"constraint {name!r} already exists on {self.path} "
                f"(CHECK ({cons[name]})); drop it first to redefine"
            )
        bad = self._violation_counts(
            self.read(), {name: expr}, f"add_constraint {name!r}"
        )
        if bad:
            raise ConstraintViolation(
                f"cannot add constraint {name!r} to {self.path}: "
                f"{bad[name]} existing rows violate CHECK ({expr})"
            )
        cons[name] = expr
        return self._commit(
            list(man["files"]), "add_constraint", man["schema"],
            {"constraints": cons, "added_constraint": name},
            expected_parent=man["version"], cdf="empty",
        )

    def drop_constraint(self, name: str) -> int:
        """Remove a CHECK constraint — one metadata commit."""
        man = self._resolve(None)
        cons = dict(man.get("constraints") or {})
        if name not in cons:
            raise ValueError(f"no constraint {name!r} on {self.path}")
        del cons[name]
        return self._commit(
            list(man["files"]), "drop_constraint", man["schema"],
            {"constraints": cons, "dropped_constraint": name},
            expected_parent=man["version"], cdf="empty",
        )

    def _violation_counts(self, df: DataFrame,
                          cons: dict[str, str], op: str) -> dict[str, int]:
        """Violations per constraint in ONE aggregate over `df` — the
        single definition of SQL CHECK semantics (NULL passes; only
        FALSE violates). A constraint expression the frame's schema
        cannot resolve (e.g. an overwrite that drops a constrained
        column) raises a governed ConstraintViolation naming the
        constraint, never an opaque unresolved-column error from deep
        inside the aggregate — Delta refuses dropping a constrained
        column for the same reason."""
        from pyspark.errors import AnalysisException

        names = sorted(cons)
        try:
            row = df.agg(*[
                F.sum(
                    (~F.coalesce(F.expr(cons[n]), F.lit(True))).cast("long")
                ).alias(f"__viol_{i}")
                for i, n in enumerate(names)
            ]).first()
        except AnalysisException as e:
            raise ConstraintViolation(
                f"{op} into {self.path} refused — the incoming schema "
                f"cannot evaluate the table's CHECK constraints "
                f"{ {n: cons[n] for n in names} } ({e.getErrorClass() or e}); "
                "drop the constraint first if the column is going away"
            ) from e
        return {
            n: int(row[f"__viol_{i}"] or 0)
            for i, n in enumerate(names)
            if row is not None and (row[f"__viol_{i}"] or 0) > 0
        }

    def _enforce_constraints(self, incoming: DataFrame,
                             cons: dict[str, str], op: str) -> None:
        """Refuse the write if any incoming row violates a CHECK — ONE
        aggregate over the batch counting violations per constraint
        (O(batch), before any generation is written, so a refusal
        leaves no orphan bytes). Deletes never run this: removing rows
        cannot break a CHECK."""
        if not cons:
            return
        bad = self._violation_counts(incoming, cons, op)
        if bad:
            detail = "; ".join(
                f"{n}: {c} rows violate CHECK ({cons[n]})"
                for n, c in bad.items()
            )
            raise ConstraintViolation(
                f"{op} into {self.path} refused — {detail}. Nothing was "
                "committed; fix the batch and retry."
            )

    def _entry_bytes(self, f: dict) -> int:
        """A manifest entry's file size. Recorded at write time since
        r14 ("bytes"); entries from older manifests fall back to one
        getFileStatus call each — metadata-only either way."""
        b = f.get("bytes")
        if b is not None:
            return int(b)
        fs, jp = self._fs(self._abs(f["path"]))
        return int(fs.getFileStatus(jp).getLen())

    def optimize_small_files(self, target_bytes: int = 128 << 20,
                             cluster_by: list[str] | None = None,
                             target_files: int | None = None,
                             zorder_by: list[str] | None = None,
                             bits: int = 8) -> int | None:
        """INCREMENTAL compaction (Delta OPTIMIZE / MergeTree
        part-merge semantics — the reference's engine runs exactly this
        in the background, init-clickhouse.sql MergeTree tables):
        merge ONLY the files under `target_bytes` into one fresh
        generation and carry every file at or above the threshold BY
        REFERENCE — their bytes are never read or moved. This is what
        keeps compaction affordable under steady CDC at 100 TB: a year
        of hourly deltas is ~9k small files but the same few thousand
        large ones; each optimize trip costs O(small-file bytes), while
        `checkpoint` (the explicit re-clustering verb) rewrites the
        whole table. The merged generation is sized to land near
        `target_bytes` per file (one coalesce, no shuffle — row order
        inside the small files is preserved; pass cluster_by to
        range-cluster the merged rows instead, a shuffle of small-file
        rows only, so manifest stats stay selective on the merge
        output). Commits with an EMPTY change feed — no row values
        moved, feed consumers and the versioned_cdf stream pass over
        it. Returns the new version, or None when fewer than two files
        are under the threshold (nothing worth merging — the call cost
        is one manifest read, so a scheduler can fire it every tick).

        Convergence: outputs are sized with FLOOR division so merged
        files land AT OR ABOVE target_bytes (and graduate to carried-
        by-reference) — at most one sub-target remainder file persists
        per table, so a trip's rewrite is bounded by target_bytes plus
        the new deltas, never the accumulated history (ceil sizing
        would leave every output under target and re-merge everything
        forever).

        zorder_by=[a, b] (VERDICT r14 #6 ask for r15) lays the MERGED
        generation out along the Morton interleave of the two columns
        (the same _zorder_arrange the O(table) checkpoint uses), so
        manifest stats on the merge output stay narrow on BOTH
        dimensions under steady CDC — without ever paying a full
        rewrite. Only the small-file rows shuffle; carried files are
        untouched either way. Mutually exclusive with cluster_by."""
        if zorder_by and cluster_by:
            raise ValueError("pass cluster_by or zorder_by, not both")
        man = self._resolve(None)
        sizes = {f["path"]: self._entry_bytes(f) for f in man["files"]}
        small = [f for f in man["files"]
                 if sizes[f["path"]] < target_bytes]
        if len(small) < 2:
            return None
        return self._merge_entries(man, small, sizes, cluster_by,
                                   target_files, target_bytes,
                                   zorder_by=zorder_by, bits=bits)

    def _merge_entries(self, man: dict, to_merge: list[dict],
                       sizes: dict[str, int],
                       cluster_by: list[str] | None,
                       target_files: int | None,
                       target_bytes: int,
                       zorder_by: list[str] | None = None,
                       bits: int = 8) -> int:
        """Merge exactly `to_merge`'s files into one fresh generation
        and carry every other manifest entry by reference — the shared
        core of optimize_small_files and maybe_checkpoint's bound
        escalation. Output count: `target_files` when pinned (the
        escalation's remaining-slots case), else FLOOR(total bytes /
        target_bytes) so outputs land at/above target and graduate out
        of future merges; always strictly fewer files than inputs."""
        merge_paths = {f["path"] for f in to_merge}
        large = [f for f in man["files"] if f["path"] not in merge_paths]
        merged = self._read_files(man, sorted(merge_paths))
        total = sum(sizes[p] for p in merge_paths)
        n_out = max(1, min(
            len(to_merge) - 1,
            target_files if target_files else int(total // target_bytes),
        ))
        if zorder_by:
            new_files = self._write_gen(
                self._zorder_arrange(merged, zorder_by, bits, n_out)
            )
        elif cluster_by:
            new_files = self._write_gen(merged, cluster_by=cluster_by,
                                        target_files=n_out)
        else:
            new_files = self._write_gen(merged.coalesce(n_out))
        return self._commit(
            large + new_files, "optimize", man["schema"],
            {"merged_files": len(to_merge), "carried_files": len(large)},
            expected_parent=man["version"], cdf="empty",
        )

    def maybe_checkpoint(self, max_files: int,
                         cluster_by: list[str] | None = None,
                         target_files: int | None = None,
                         target_bytes: int = 128 << 20,
                         full: bool = False,
                         zorder_by: list[str] | None = None,
                         bits: int = 8) -> int | None:
        """Bounded auto-compaction: compact ONLY when the current file
        list exceeds `max_files`. Every small CoW delta adds a
        generation; unbounded, a year of hourly CDC is ~9k file-list
        entries per scan plan and a widening manifest — this is the
        policy knob a pipeline sets once (ModelSpec.versioned_max_files)
        instead of scheduling compaction out-of-band. What fires is the
        INCREMENTAL optimize_small_files by default — O(small-file
        bytes) per trip, large files carried by reference — because an
        O(table) rewrite per trip is exactly what steady CDC at 100 TB
        cannot afford; pass full=True (or call checkpoint directly) for
        explicit whole-table re-clustering. Cost when it doesn't fire:
        one manifest read, no scan. Returns the new version, or None
        if under the bound or nothing was mergeable. The compaction
        commit carries an EMPTY change feed, so feed consumers and the
        versioned_cdf stream pass over it."""
        if max_files < 1:
            raise ValueError("max_files must be >= 1")
        if zorder_by and cluster_by:
            raise ValueError("pass cluster_by or zorder_by, not both")
        man = self._resolve(None)
        n = len(man["files"])
        if n <= max_files:
            return None
        if full:
            return self.checkpoint(cluster_by=cluster_by,
                                   target_files=target_files,
                                   zorder_by=zorder_by, bits=bits)
        # decide the merge set from METADATA before any data I/O: the
        # ordinary sub-target merge when it restores the bound, else
        # the escalation — never both (a two-pass would rewrite the
        # merged output a second time in the same call)
        sizes = {f["path"]: self._entry_bytes(f) for f in man["files"]}
        small = [f for f in man["files"]
                 if sizes[f["path"]] < target_bytes]
        if len(small) >= 2:
            total = sum(sizes[f["path"]] for f in small)
            n_out = max(1, min(len(small) - 1,
                               int(total // target_bytes)))
            if n - len(small) + n_out <= max_files:
                return self._merge_entries(man, small, sizes, cluster_by,
                                           None, target_bytes,
                                           zorder_by=zorder_by, bits=bits)
        # the sub-target merge alone can't restore the bound (the list
        # is dominated by files at/above target_bytes): the bound is a
        # hard policy (unchecked it means unbounded scan fan-out), so
        # carry the max_files-1 LARGEST files by identity (ties can't
        # collapse the carried set) and merge everything else in ONE
        # rewrite into the remaining slot. Honest cost statement: on a
        # table that has genuinely outgrown max_files x target_bytes,
        # each escalation trip rewrites ~(total / max_files) bytes —
        # the unavoidable price of a hard count bound; size max_files
        # to the table (scan fan-out tolerance), or rely on
        # target_bytes alone via optimize_small_files.
        ordered = sorted(man["files"],
                         key=lambda f: (-sizes[f["path"]], f["path"]))
        return self._merge_entries(man, ordered[max_files - 1:], sizes,
                                   cluster_by, 1, target_bytes,
                                   zorder_by=zorder_by, bits=bits)

    def diff_versions(self, v_old: int, v_new: int | None,
                      keys: list[str]) -> DataFrame:
        """Change-data-feed BETWEEN two versions, derived from the
        manifests: a file carried by reference into both versions holds
        byte-identical rows, so only files present in exactly ONE
        manifest are scanned — the diff costs O(changed files), never
        O(2 x table), no change log was ever written. Returns one row
        per changed key with `change_type` in (insert, update, delete):
        insert/update rows carry the NEW version's values, delete rows
        the old version's. Rows that merely MOVED files without
        changing (checkpoint, rollback) compare equal and are dropped
        (null-safe, column-by-column — no hash-collision escape hatch).
        Schema evolution between the versions NULL-fills the old side,
        so a backfilled column reads as an update only where a real
        value arrived.

        Contract: `keys` must be unique per version — the invariant
        merge_upsert maintains. A table loaded with duplicate keys
        (overwrite never dedupes) can misreport a surviving duplicate
        as a delete when only one copy's file was rewritten.

        Cost routing (VERDICT r14 #5): when the two endpoint manifests
        share NO files (a checkpoint or full replacement sits in the
        span — an optimize carries large files by reference, so it
        does not trip this), the manifest diff degrades to O(2 x
        table) scan-and-compare. The shared-files test is FREE (both
        file sets are already in hand — no span walk on the common
        path); only when it trips do we read the span's manifests
        once, and if every span commit carries a pre-image-capable
        feed (write_cdf tables written r14+) the diff is served by
        FOLDING the stored feeds instead (_diff_via_feed): exact —
        including dropped no-op reverts and span-start delete images,
        courtesy of the update_preimage rows — at O(changed rows), no
        table version read at all. Without feeds the manifest diff
        still runs but warns, naming the cost."""
        import warnings

        man_o = self._manifest(v_old)
        man_n = self._resolve(v_new)
        po_paths = {f["path"] for f in man_o["files"]}
        pn_paths = {f["path"] for f in man_n["files"]}
        # both endpoints non-empty: an empty side means the manifest
        # diff scans only the OTHER side's changed files (already
        # O(changes)) — not the no-shared-files expensive case
        if po_paths and pn_paths and not (po_paths & pn_paths):
            span: list[dict] = []
            v: int | None = man_n["version"]
            while v is not None and v > v_old:
                span.append(man_n if v == man_n["version"]
                            else self._manifest(v))
                v = span[-1]["parent"]
            if span and all(m.get("cdf_pre") for m in span):
                try:
                    return self._diff_via_feed(v_old, man_n, keys)
                except ValueError:
                    # defense for manifests written by the brief r14
                    # pre-fix build that stamped cdf_pre on FULL
                    # commits: the manifest scan below always answers
                    pass
            warnings.warn(
                f"diff_versions({v_old}, {man_n['version']}) on "
                f"{self.path}: the two versions share no files (a "
                "compaction or full replacement sits in the span), so "
                "this diff scans BOTH versions (O(2 x table)) and "
                "compares rows — enable write_cdf=True to serve it "
                "from stored feeds at O(changed rows)",
                RuntimeWarning,
                stacklevel=2,
            )
        po, pn = po_paths, pn_paths
        schema_n = StructType.fromJson(json.loads(man_n["schema"]))
        cols = [f.name for f in schema_n.fields]
        value_cols = [c for c in cols if c not in keys]

        def _aligned(man, rel: list[str]) -> DataFrame:
            df = self._read_files(man, sorted(rel))
            have = set(df.columns)
            return df.select(*[
                F.col(c) if c in have
                else F.lit(None).cast(schema_n[c].dataType).alias(c)
                for c in cols
            ])

        old_side = _aligned(man_o, list(po - pn))
        new_side = _aligned(man_n, list(pn - po))
        inserts = _semi_anti_null_safe(
            new_side, old_side.select(*keys), keys, "left_anti"
        ).select(F.lit("insert").alias("change_type"), *cols)
        deletes = _semi_anti_null_safe(
            old_side, new_side.select(*keys), keys, "left_anti"
        ).select(F.lit("delete").alias("change_type"), *cols)
        o = old_side.select(
            *[F.col(c).alias(f"__old_{c}") for c in cols]
        )
        cond = None
        for k in keys:
            e = new_side[k].eqNullSafe(o[f"__old_{k}"])
            cond = e if cond is None else (cond & e)
        changed = None
        for c in value_cols:
            e = ~new_side[c].eqNullSafe(o[f"__old_{c}"])
            changed = e if changed is None else (changed | e)
        updates = (
            new_side.join(o, on=cond, how="inner")
            .filter(changed if changed is not None else F.lit(False))
            .select(F.lit("update").alias("change_type"), *cols)
        )
        return inserts.unionByName(updates).unionByName(deletes)

    def _diff_via_feed(self, v_old: int, man_n: dict,
                       keys: list[str]) -> DataFrame:
        """diff_versions served from the persisted change feeds: fold
        the span's per-commit events per key into (first, last) by
        (_commit_version, preimage-first) order — ONE group-by over
        O(changed rows), no table read. The first event fixes the
        key's pre-span state (an 'insert' means absent; an
        'update_preimage' or 'delete' row CARRIES the span-start
        values); the last fixes the post-span state. From those two,
        exact diff_versions semantics fall out: inserts take final
        values, deletes take span-start values, updates only when the
        two states actually differ (null-safe, column-by-column — a
        key updated and reverted inside the span is dropped, exactly
        like the manifest diff). Requires every span commit to carry a
        pre-image-capable feed (manifest flag cdf_pre — the caller
        checks)."""
        schema_n = StructType.fromJson(json.loads(man_n["schema"]))
        cols = [f.name for f in schema_n.fields]
        value_cols = [c for c in cols if c not in keys]
        ch = self.changes_between(v_old, man_n["version"],
                                  include_preimages=True)
        have = set(ch.columns)
        ch = ch.select(
            "change_type", "_commit_version",
            *[F.col(c) if c in have
              else F.lit(None).cast(schema_n[c].dataType).alias(c)
              for c in cols],
        )
        # within one commit an update's preimage sorts BEFORE its
        # post-image, so min_by lands on the pre-span representation
        prio = F.when(
            F.col("change_type") == "update_preimage", F.lit(0)
        ).otherwise(F.lit(1))
        ev = F.struct(F.col("_commit_version").alias("cv"), prio.alias("p"))
        payload = F.struct(
            F.col("change_type").alias("ct"),
            *[F.col(c).alias(c) for c in cols],
        )
        g = ch.groupBy(*keys).agg(
            F.min_by(payload, ev).alias("__first"),
            F.max_by(payload, ev).alias("__last"),
        )
        existed = F.col("__first.ct") != F.lit("insert")
        present = F.col("__last.ct") != F.lit("delete")
        inserts = g.filter(~existed & present).select(
            F.lit("insert").alias("change_type"),
            *[F.col(f"__last.{c}").alias(c) for c in cols],
        )
        deletes = g.filter(existed & ~present).select(
            F.lit("delete").alias("change_type"),
            *[F.col(f"__first.{c}").alias(c) for c in cols],
        )
        changed = None
        for c in value_cols:
            e = ~F.col(f"__last.{c}").eqNullSafe(F.col(f"__first.{c}"))
            changed = e if changed is None else (changed | e)
        updates = g.filter(
            existed & present
            & (changed if changed is not None else F.lit(False))
        ).select(
            F.lit("update").alias("change_type"),
            *[F.col(f"__last.{c}").alias(c) for c in cols],
        )
        return inserts.unionByName(updates).unionByName(deletes)

    def changes_between(self, v_after: int,
                        v_to: int | None = None,
                        include_preimages: bool = False) -> DataFrame:
        """The PERSISTED change feed for versions in (v_after, v_to]
        (default: latest) — one row per changed row per commit, with
        `change_type` and `_commit_version`. Requires the table to have
        been written with write_cdf=True: the feed is plain parquet
        written at commit time, so reading it costs file I/O only — no
        joins, unlike diff_versions (which remains the feed-less
        fallback and also collapses a key's intermediate states).
        Differences from diff_versions, stated: per-commit granularity
        (a key updated at v2 and deleted at v3 appears TWICE), and
        same-values upserts appear as updates (post-image semantics).
        Refuses loudly on a _CDF_FULL marker (overwrite / rollback /
        promote_types replaced content wholesale — re-sync from a
        snapshot) and on a missing feed (not written with write_cdf,
        or reclaimed by vacuum). include_preimages=True additionally
        returns the stored 'update_preimage' rows (an update's OLD
        image — what makes exact span folding possible); the default
        filters them so replica-apply consumers see only
        insert/update/delete post-semantics."""
        latest = self.latest_version()
        if latest is None:
            raise ValueError(
                f"versioned table {self.path} has no committed versions "
                "— nothing to read a change feed from"
            )
        if v_to is None:
            v_to = latest
        frames: list[DataFrame] = []
        for v in self._committed_versions(v_after, v_to):
            fs, jp = self._fs(self._cdf_dir(v))
            if not fs.exists(jp):
                raise ValueError(
                    f"{self.path} has no change feed for version {v} — "
                    "the table was not written with write_cdf=True, or "
                    "vacuum reclaimed it; use diff_versions() to derive "
                    "the changes from the manifests instead"
                )
            names = {st.getPath().getName() for st in fs.listStatus(jp)}
            if "_CDF_FULL" in names:
                raise ValueError(
                    f"version {v} of {self.path} replaced table content "
                    "wholesale (overwrite/rollback/promote_types) — the "
                    "change feed does not span it; re-sync consumers "
                    "from a snapshot read at that version"
                )
            if "_CDF_EMPTY" in names or not any(
                n.endswith(".parquet") for n in names
            ):
                continue
            frames.append(
                self.spark.read.parquet(self._cdf_dir(v)).withColumn(
                    "_commit_version", F.lit(v).cast("bigint")
                )
            )
        if not frames:
            # v_to=0 is a legitimate (empty-range) cursor — `or` would
            # silently replace it with latest and read a possibly
            # evolved schema; pick explicitly
            schema = StructType.fromJson(
                json.loads(self._resolve(
                    v_to if v_to is not None else latest
                )["schema"])
            )
            empty = self.spark.createDataFrame([], schema)
            return empty.select(
                F.lit("insert").alias("change_type"), "*",
                F.lit(0).cast("bigint").alias("_commit_version"),
            ).limit(0)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        if not include_preimages:
            out = out.filter(F.col("change_type") != "update_preimage")
        return out

    def _committed_versions(self, v_after: int, v_to: int | None) -> list[int]:
        """Versions in (v_after, v_to] ON THE COMMITTED CHAIN, ascending
        — walked via manifest parent pointers from the latest, NOT the
        integer range: a crashed commit leaves an orphan manifest/feed
        at a version number the next successful commit skips past, and
        replaying its feed would apply changes that never happened
        (e.g. an abandoned delete's old-image rows)."""
        out: list[int] = []
        v = self.latest_version()
        while v is not None and v > v_after:
            if v_to is None or v <= v_to:
                out.append(v)
            fs, jp = self._fs(self._manifest_dir(v))
            if not fs.exists(jp):
                raise ValueError(
                    f"version {v}'s manifest on {self.path} was reclaimed "
                    f"by vacuum — cannot enumerate commits after {v_after}"
                )
            v = self._manifest(v)["parent"]
        return sorted(out)

    # -- SQL surface ------------------------------------------------------
    def register_sql_views(self, name: str,
                           versions: list[int] | None = None) -> list[str]:
        """SQL TIME TRAVEL (VERDICT r14 #4): register `name` as a temp
        view over the LATEST version plus `name__v<N>` per retained
        version, so `spark.sql(f"... FROM {name}__v3")` reads the
        table AS OF version 3 — the SQL twin of read(version=3)
        (Delta's `VERSION AS OF`). A temp view is just a NAMED LOGICAL
        PLAN: each view wraps exactly the read()'s explicit-file-list
        scan with the manifest's pinned schema, so DataFrame/SQL plan
        parity holds by construction (pinned in test_plan_shapes) and
        nothing is materialized — registration costs one manifest read
        per version, O(retained versions) metadata, zero data I/O.
        `versions` limits which historical versions get views (default:
        every version still on the committed chain); versions whose
        files were vacuumed are skipped (their view would refuse at
        read time anyway). Returns the registered view names."""
        out = [name]
        self.read().createOrReplaceTempView(name)
        if versions is None:
            versions = [h["version"] for h in self.history()]
        for v in versions:
            try:
                df = self.read(version=v)
            except ValueError:
                continue  # vacuumed: no view rather than a dead one
            vname = f"{name}__v{v}"
            df.createOrReplaceTempView(vname)
            out.append(vname)
        return out

    # -- history / retention --------------------------------------------
    def history(self) -> list[dict]:
        """Committed versions only (newest first): walks the parent
        chain from the pointer, so a crashed writer's orphan manifest
        never appears."""
        out = []
        v = self.latest_version()
        while v is not None:
            fs, jp = self._fs(self._manifest_dir(v))
            if not fs.exists(jp):
                break  # retention horizon: the parent was vacuumed
            man = self._manifest(v)
            out.append({
                "version": man["version"], "op": man["op"],
                "n_files": len(man["files"]),
                **{k: man[k] for k in ("rolled_back_to",) if k in man},
            })
            v = man["parent"]
        return out

    def vacuum(self, retain_last: int = 2,
               retain_hours: float | None = None,
               ignore_clones: bool = False) -> dict:
        """Reclaim storage: keep the newest `retain_last` versions ON
        THE COMMITTED CHAIN; delete every other manifest (including
        off-chain orphans from crashed writers), every generation file
        no retained manifest references, and each reclaimed version's
        change feed WITH it (manifest, files, and feed leave disk
        together — a feed outliving its version would replay changes
        into nowhere; a version outliving its feed would strand
        streams). Returns counts. After vacuum, rollback / time travel
        to a reclaimed version refuses loudly, naming the retention.

        retain_hours=N additionally keeps every version whose COMMIT
        TIMESTAMP (recorded in the manifest at commit time) is within
        the last N hours, even beyond `retain_last` — the Delta-style
        time-based retention contract: in-retention time travel and
        change-feed streams keep working, expired history ages out.
        Versions from manifests that predate commit timestamps age out
        by count only (no clock to judge them by).

        SHALLOW-CLONE hazard (the documented contract): when the
        source's `_clones/` registry holds a live clone whose pinned
        source version falls OUTSIDE the retained chain, vacuum
        REFUSES loudly — reclaiming those files would break the
        clone's reads. Pass ignore_clones=True to proceed knowingly
        (clone reads then refuse loudly at the presence check);
        registry entries whose destination table no longer exists are
        pruned automatically."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        cutoff = None
        if retain_hours is not None:
            if retain_hours < 0:
                raise ValueError("retain_hours must be >= 0")
            import time as _time

            cutoff = _time.time() - float(retain_hours) * 3600.0
        chain = []
        v = self.latest_version()
        while v is not None:
            fs, jp = self._fs(self._manifest_dir(v))
            if not fs.exists(jp):
                break  # a prior vacuum already trimmed past here
            man = self._manifest(v)
            in_window = (
                cutoff is not None
                and man.get("ts") is not None
                and float(man["ts"]) >= cutoff
            )
            # commit timestamps are monotone down the parent chain, so
            # the first version that is both past the count floor and
            # out of the time window ends the retained prefix
            if len(chain) >= retain_last and not in_window:
                break
            chain.append(v)
            v = man["parent"]
        # shallow-clone protection BEFORE anything is deleted
        stale_clones: list[str] = []
        unsafe_clones: list[dict] = []
        for cname, c in self._clone_registry():
            if not VersionedTable(self.spark, c["dest"]).exists():
                stale_clones.append(cname)
            elif int(c["source_version"]) not in chain:
                unsafe_clones.append(c)
        if unsafe_clones and not ignore_clones:
            raise ValueError(
                f"vacuum on {self.path} refused: shallow clones pin "
                "source versions outside the retained chain "
                f"{sorted(chain)}: "
                f"{[(c['dest'], c['source_version']) for c in unsafe_clones]}"
                " — reclaiming those files would break the clones' "
                "reads (and an erasure is incomplete while a clone "
                "still references the bytes); drop or compact the "
                "clones first, or pass ignore_clones=True to break "
                "them knowingly (their reads then refuse loudly)"
            )
        for cname in stale_clones:
            fs, cp = self._fs(f"{self.path}/_clones/{cname}")
            fs.delete(cp, True)
        retained_files: set[str] = set()
        for rv in chain:
            retained_files.update(f["path"] for f in self._manifest(rv)["files"])
        dropped_manifests = 0
        for mv in self._versions_on_disk():
            if mv in chain:
                continue
            fs, jp = self._fs(self._manifest_dir(mv))
            fs.delete(jp, True)
            dropped_manifests += 1
        # create-exclusive publication residue: a writer that crashed
        # between its tmp write and the CAS rename (_publish_manifest)
        # leaves a hidden `.tmp-*` directory no reader can reach
        fs, mroot = self._fs(f"{self.path}/_manifests")
        if fs.exists(mroot):
            for st in fs.listStatus(mroot):
                if st.getPath().getName().startswith(".tmp-"):
                    fs.delete(st.getPath(), True)
        # change-feed retention follows manifest retention: a feed for
        # a reclaimed version can no longer be reached by any committed
        # offset walk (and purge semantics require the erased rows'
        # old images to leave disk with the version that held them)
        fs, cdf_root = self._fs(f"{self.path}/_cdf")
        if fs.exists(cdf_root):
            for st in fs.listStatus(cdf_root):
                name = st.getPath().getName()
                if (name.startswith("v") and name[1:].isdigit()
                        and int(name[1:]) not in chain):
                    fs.delete(st.getPath(), True)
                elif name.startswith(".tmp-"):
                    # staging residue from a writer that crashed
                    # between feed staging and manifest CAS
                    fs.delete(st.getPath(), True)
        # delete unreferenced data files, then empty generations
        dropped_files = 0
        fs, groot = self._fs(self._gen_root())
        if fs.exists(groot):
            for gst in fs.listStatus(groot):
                gname = gst.getPath().getName()
                live = 0
                for fst in fs.listStatus(gst.getPath()):
                    fname = fst.getPath().getName()
                    rel = f"_gen/{gname}/{fname}"
                    if fname.endswith(".parquet") and rel not in retained_files:
                        fs.delete(fst.getPath(), False)
                        dropped_files += 1
                    elif fname.endswith(".parquet"):
                        live += 1
                if live == 0:
                    fs.delete(gst.getPath(), True)
        # stale plans may cache the deleted files' listing
        self.spark.catalog.refreshByPath(self.path)
        return {
            "retained_versions": chain,
            "dropped_manifests": dropped_manifests,
            "dropped_files": dropped_files,
        }
