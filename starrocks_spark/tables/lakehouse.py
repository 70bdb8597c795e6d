"""Snapshot-log ("lakehouse-format") managed table: versioned parquet
with an atomic commit log and time travel.

Reference surface: the external lakehouse sinks/scans
(be/src/data_sink/external/iceberg_table_sink.cpp, hudi/paimon
readers, fe IcebergTable.java) — tables whose source of truth is a
*file list in a commit log*, not a directory listing. Delta/Iceberg
jars are not in this container, so the format here is a minimal but
honest implementation of the same contract:

- ``<path>/_log/<8-digit-version>.json`` — one immutable JSON entry
  per commit: the complete data-file list for that snapshot, the
  operation, and row/byte stats. Readers NEVER list data directories.
- Data files are immutable parquet written to a per-commit directory;
  an overwrite commit just publishes a log entry that references only
  the new files (the old snapshot stays readable — time travel).
- Commits are atomic + optimistically concurrent: the log entry is
  staged then published with ``os.link`` (fails if the version
  already exists → loser re-reads and retries with the next number).
  This is exactly Delta's protocol shape, scaled down: on a cluster
  the log would live on the shared store and the link/rename be the
  store's atomic-put-if-absent.

At 100 TB this layout is what makes O(1)-metadata reads possible: a
snapshot read opens one JSON file and hands Spark an explicit file
list — no S3 LIST storms, no eventual-consistency hazards — while
compaction/vacuum work on superseded files without blocking readers.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    version: int
    operation: str
    files: list[str]
    n_rows: int
    #: JSON-serialized StructType of this snapshot (None in pre-
    #: evolution log entries)
    schema_json: str | None = None
    #: per-file column min/max from parquet footers (zone maps)
    zonemaps: dict | None = None


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_log")

    # ------------------------------------------------------------ log I/O

    def _entry_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:08d}.json")

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f[:-5]) for f in os.listdir(self.log_dir)
            if f.endswith(".json")
        )

    def snapshot(self, version: int | None = None) -> Snapshot | None:
        versions = self._versions()
        if not versions:
            return None
        v = versions[-1] if version is None else version
        with open(self._entry_path(v)) as f:
            e = json.load(f)
        return Snapshot(e["version"], e["operation"], e["files"],
                        e["n_rows"], e.get("schema"), e.get("zonemaps"))

    def history(self) -> list[Snapshot]:
        return [self.snapshot(v) for v in self._versions()]

    def _publish(self, operation: str, build_entry) -> int:
        """Atomic optimistic commit. ``build_entry(current_snapshot)``
        returns (files, n_rows) and is re-evaluated on every attempt
        so a retry merges against the snapshot that beat it (no lost
        updates — the Delta/Iceberg conflict-resolution shape). The
        entry is staged then published with link() = put-if-absent."""
        os.makedirs(self.log_dir, exist_ok=True)
        while True:
            cur = self.snapshot()
            version = (cur.version + 1) if cur else 0
            built = build_entry(cur)
            files, n_rows = built[0], built[1]
            schema_json = built[2] if len(built) > 2 else None
            # zone maps: new files come from the just-written footers;
            # carried-over files (append) keep the PREVIOUS snapshot's
            # stats — rebuilding only from _last_zonemaps would blank
            # them and silently disable pruning for old files
            prev_zm = (cur.zonemaps or {}) if cur else {}
            new_zm = getattr(self, "_last_zonemaps", {})
            entry = {"version": version, "operation": operation,
                     "files": files, "n_rows": n_rows,
                     "schema": schema_json,
                     "zonemaps": {
                         f: new_zm.get(f, prev_zm.get(f, {}))
                         for f in files
                     }}
            fd, staged = tempfile.mkstemp(dir=self.log_dir, suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(entry, f)
            try:
                os.link(staged, self._entry_path(version))
                return version
            except FileExistsError:
                continue  # concurrent writer won this version; re-merge
            finally:
                os.unlink(staged)

    # ------------------------------------------------------------- writes

    def _write_files(self, df: DataFrame) -> tuple[list[str], int]:
        commit_dir = os.path.join(self.path, f"data_{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(commit_dir)
        files = sorted(
            os.path.join(commit_dir, f) for f in os.listdir(commit_dir)
            if f.endswith(".parquet")
        )
        # row counts AND per-file column min/max (zone maps) come from
        # the parquet FOOTERS (driver-side pyarrow metadata reads, no
        # Spark job) — re-scanning what was just written would double
        # the write cost at scale
        import pyarrow.parquet as pq

        n_rows = 0
        self._last_zonemaps: dict[str, dict] = {}
        for f in files:
            md = pq.ParquetFile(f).metadata
            n_rows += md.num_rows
            zm: dict[str, list] = {}
            covered: dict[str, int] = {}
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo, hi = st.min, st.max
                    if not isinstance(lo, (int, float, str)):
                        # keep the log JSON-serializable; dates etc.
                        # serialize via isoformat
                        lo, hi = str(lo), str(hi)
                    name = col.path_in_schema
                    covered[name] = covered.get(name, 0) + 1
                    if name in zm:
                        zm[name] = [min(zm[name][0], lo),
                                    max(zm[name][1], hi)]
                    else:
                        zm[name] = [lo, hi]
            # SOUNDNESS: a bound is recorded only when EVERY row group
            # contributed stats for the column — a writer may omit
            # stats (oversized strings, foreign writers), and a bound
            # built from a subset could prune a file that still holds
            # matching rows in the uncovered group
            zm = {
                name: bound for name, bound in zm.items()
                if covered.get(name, 0) == md.num_row_groups
            }
            self._last_zonemaps[f] = zm
        return files, n_rows

    def _merged_schema(self, cur: "Snapshot | None",
                       new_schema) -> str:
        """Schema evolution (ADD COLUMN): the committed schema is the
        union of the current snapshot's schema and the batch's — new
        columns append; existing columns must keep their exact type
        (widening/renames are a table-rewrite operation, like the
        reference's heavyweight schema change). Readers apply the LOG
        schema explicitly, so old files surface the new columns as
        NULL without any mergeSchema inference scan — O(1) metadata,
        consistent with the file-list contract."""
        from pyspark.sql.types import StructType

        if cur is None or cur.schema_json is None:
            return new_schema.json()
        merged = StructType.fromJson(json.loads(cur.schema_json))
        have = {f.name: f for f in merged.fields}
        for f in new_schema.fields:
            if f.name in have:
                if have[f.name].dataType != f.dataType:
                    raise ValueError(
                        f"schema evolution: column '{f.name}' type "
                        f"{f.dataType} != committed {have[f.name].dataType}"
                        " (type changes need a rewrite)"
                    )
            else:
                merged = merged.add(f)
        return merged.json()

    def append(self, df: DataFrame) -> int:
        files, n = self._write_files(df)
        return self._publish(
            "append",
            lambda cur: ((cur.files if cur else []) + files,
                         (cur.n_rows if cur else 0) + n,
                         self._merged_schema(cur, df.schema)),
        )

    def overwrite(self, df: DataFrame) -> int:
        files, n = self._write_files(df)
        return self._publish(
            "overwrite", lambda cur: (files, n, df.schema.json())
        )

    # -------------------------------------------------------------- reads

    def read(self, version: int | None = None,
             zone_filter: tuple | None = None) -> DataFrame:
        """Snapshot read; ``zone_filter=(col, lo, hi)`` prunes the FILE
        LIST with the log's zone maps before Spark ever sees it (the
        reference's zone-map segment pruning / Delta data skipping —
        O(files) metadata, zero data I/O for pruned files), then
        applies the same predicate exactly for correctness."""
        snap = self.snapshot(version)
        if snap is None or not snap.files:
            raise ValueError(f"no snapshot at version {version}")
        files = snap.files
        self.last_files_scanned = len(files)
        if zone_filter is not None:
            col, lo, hi = zone_filter
            kept = []
            for f in files:
                zm = (snap.zonemaps or {}).get(f, {}).get(col)
                try:
                    prunable = zm is not None and (zm[1] < lo or zm[0] > hi)
                except TypeError:
                    # stats serialized to a different type than the
                    # filter bounds — cannot prune, keep the file
                    prunable = False
                if not prunable:
                    kept.append(f)
            files = kept
            self.last_files_scanned = len(files)
        reader = self.spark.read
        if snap.schema_json:
            from pyspark.sql.types import StructType

            reader = reader.schema(
                StructType.fromJson(json.loads(snap.schema_json))
            )
        if not files:
            from pyspark.sql import functions as Fn

            df = reader.parquet(*snap.files).limit(0)
        else:
            df = reader.parquet(*files)
        if zone_filter is not None:
            col, lo, hi = zone_filter
            from pyspark.sql import functions as Fn

            df = df.filter(
                (Fn.col(col) >= Fn.lit(lo)) & (Fn.col(col) <= Fn.lit(hi))
            )
        return df

    # ------------------------------------------------------------ row DML

    # Above this many data files the zone-map interval list is shipped
    # as a broadcast DataFrame instead of a literal array — Catalyst
    # analysis is super-linear in literal-tree size, so at millions of
    # files the literal plan itself would become the bottleneck.
    MERGE_LITERAL_INTERVALS_MAX = 64

    def merge(self, source: DataFrame, key_col: str,
              validate_source_unique: bool = True) -> int:
        """Copy-on-write MERGE (upsert) by ``key_col``: matched rows
        are replaced by the source row, unmatched source rows append.
        The Delta/Iceberg row-level-operation shape (reference:
        primary-key merge-on-write, be/src/storage/rowset/ delete-
        vector path; iceberg_table_sink.cpp upserts):

        1. **Prune with zone maps** — only data files whose
           [min, max] range of ``key_col`` contains at least one
           source key are rewritten. The overlap test runs as one
           aggregate over the source keyed by a broadcast interval
           list (never a collect of source keys); untouched files
           carry over into the new snapshot by reference.
        2. **Rewrite** — touched files ⟕ source on the key: source
           row wins for matches; source keys not present anywhere
           append. One shuffle of (touched rows ∪ source).
        3. **Commit** — one atomic log entry: carried files +
           rewritten files. Readers of older versions see the
           pre-merge snapshot (time travel is preserved).

        Returns the number of files rewritten. At 100 TB the zone-map
        pruning is the difference between rewriting a handful of
        clustered files and the whole table."""
        from pyspark.sql import functions as Fn

        snap = self.snapshot()
        if snap is None:
            raise ValueError("merge into empty table: use append()")
        if validate_source_unique:
            # A PK upsert target must get ONE row per key — appending
            # every duplicate would silently multiply rows (Delta MERGE
            # raises on multiple source matches for the same reason).
            # Callers that pre-reduce (the streaming latest-per-key
            # path) pass validate_source_unique=False to skip the pass.
            dup = (
                source.groupBy(key_col).count()
                .filter(Fn.col("count") > 1).limit(1).collect()
            )
            if dup:
                raise ValueError(
                    f"merge source has multiple rows for key "
                    f"{dup[0][key_col]!r}; reduce to one row per "
                    f"{key_col} first (or pass "
                    "validate_source_unique=False after pre-reducing)"
                )
        intervals = []  # (file_idx, lo, hi) from the commit log
        unprunable = []
        for i, f in enumerate(snap.files):
            zm = (snap.zonemaps or {}).get(f, {}).get(key_col)
            if zm is None:
                unprunable.append(i)
            else:
                intervals.append((i, zm[0], zm[1]))
        if intervals:
            # one pass over source keys: which intervals does any key
            # fall into? (metadata-scale result)
            keys = source.select(Fn.col(key_col).alias("_k")).distinct()
            if len(intervals) <= self.MERGE_LITERAL_INTERVALS_MAX:
                ivl = Fn.array(*[
                    Fn.struct(Fn.lit(i).alias("i"),
                              Fn.lit(lo).alias("lo"),
                              Fn.lit(hi).alias("hi"))
                    for i, lo, hi in intervals
                ])
                touched_rows = (
                    keys.select(Fn.explode(Fn.filter(
                        ivl,
                        lambda s: (Fn.col("_k") >= s["lo"])
                        & (Fn.col("_k") <= s["hi"]),
                    )).alias("_s"))
                    .select(Fn.col("_s.i").alias("i"))
                    .distinct().collect()
                )
            else:
                # many files: ship the intervals as a small broadcast
                # DataFrame and range-join — the plan stays O(1) in the
                # file count instead of embedding one literal struct
                # per file.
                ivl_df = self.spark.createDataFrame(
                    [(i, lo, hi) for i, lo, hi in intervals],
                    ["i", "lo", "hi"],
                )
                touched_rows = (
                    keys.join(
                        Fn.broadcast(ivl_df),
                        (Fn.col("_k") >= Fn.col("lo"))
                        & (Fn.col("_k") <= Fn.col("hi")),
                    )
                    .select("i").distinct().collect()
                )
            touched = sorted({int(r["i"]) for r in touched_rows}
                             | set(unprunable))
        else:
            touched = list(range(len(snap.files)))
        touched_files = [snap.files[i] for i in touched]
        self.last_files_rewritten = len(touched_files)

        reader = self.spark.read
        if snap.schema_json:
            from pyspark.sql.types import StructType

            reader = reader.schema(
                StructType.fromJson(json.loads(snap.schema_json))
            )
        if touched_files:
            current = reader.parquet(*touched_files)
            # source wins on key match; everything else survives
            merged = current.join(
                source.select(Fn.col(key_col).alias("_sk")).distinct(),
                current[key_col] == Fn.col("_sk"), "left_anti",
            ).unionByName(source)
        else:
            merged = source
        files, n = self._write_files(merged)

        def entry(cur):
            # carry everything EXCEPT the files this merge rewrote —
            # phrased as an exclusion so a retry against a snapshot
            # that a concurrent APPEND won keeps the appender's files
            # (an inclusion list from our stale snapshot would silently
            # drop them). Like Delta, a concurrent writer that touched
            # the SAME files would need conflict detection — the
            # rewritten set is validated against the current snapshot.
            gone = set(touched_files) - set(cur.files)
            if gone:
                raise RuntimeError(
                    f"merge conflict: {len(gone)} source files were "
                    "replaced by a concurrent commit; re-run the merge"
                )
            base = [f for f in cur.files if f not in set(touched_files)]
            # rows in carried files from footers (metadata read)
            import pyarrow.parquet as pq

            carried_n = sum(
                pq.ParquetFile(f).metadata.num_rows for f in base
            )
            return (base + files, carried_n + n, cur.schema_json)

        self._publish("merge", entry)
        return len(touched_files)

    def delete(self, condition, prune: tuple | None = None) -> int:
        """Copy-on-write DELETE: rewrite (filtered) only the files that
        can hold matching rows. ``condition``: a Column predicate over
        the table's rows. ``prune=(col, lo, hi)``: the predicate's
        bounding range on one column — files whose zone-map range for
        ``col`` misses [lo, hi] are carried over untouched (the same
        data-skipping contract as read()'s zone_filter; Delta DELETE
        prunes with its log stats identically). Without ``prune``
        every file is rewritten. Returns files rewritten."""
        snap = self.snapshot()
        if snap is None:
            raise ValueError("delete from empty table")
        touched, carried = [], []
        for f in snap.files:
            zm = (snap.zonemaps or {}).get(f, {}).get(
                prune[0]) if prune else None
            try:
                prunable = (prune is not None and zm is not None
                            and (zm[1] < prune[1] or zm[0] > prune[2]))
            except TypeError:
                prunable = False  # incomparable stats: must rewrite
            (carried if prunable else touched).append(f)
        self.last_files_rewritten = len(touched)
        reader = self.spark.read
        if snap.schema_json:
            from pyspark.sql.types import StructType

            reader = reader.schema(
                StructType.fromJson(json.loads(snap.schema_json))
            )
        if not touched:
            return 0
        # SQL DELETE semantics: remove only rows where the condition is
        # TRUE — rows where it evaluates NULL (unknown) are KEPT, so
        # ~condition alone is wrong (~NULL is NULL and would drop them).
        kept = reader.parquet(*touched).filter(
            condition.isNull() | ~condition
        )
        files, n = self._write_files(kept)

        def entry(cur):
            import pyarrow.parquet as pq

            # exclusion carry + conflict check — see merge()
            gone = set(touched) - set(cur.files)
            if gone:
                raise RuntimeError(
                    f"delete conflict: {len(gone)} source files were "
                    "replaced by a concurrent commit; re-run the delete"
                )
            base = [f for f in cur.files if f not in set(touched)]
            carried_n = sum(
                pq.ParquetFile(f).metadata.num_rows for f in base
            )
            return (base + files, carried_n + n, cur.schema_json)

        self._publish("delete", entry)
        return len(touched)

    # -------------------------------------------------------- maintenance

    def compact(self, target_files: int = 1) -> int:
        """Rewrite the CURRENT snapshot's data into ``target_files``
        files and publish it as a new version — the small-file
        compaction every log-structured table needs under streaming
        ingest (reference: compaction of rowsets / Iceberg rewrite).
        Readers of older versions are untouched; vacuum after
        retention reclaims the superseded files."""
        df = self.read().coalesce(target_files)
        files, n = self._write_files(df)
        return self._publish(
            "compact", lambda cur: (files, n, df.schema.json())
        )

    def maybe_compact(self, commit_threshold: int = 8,
                      target_files: int = 4,
                      cluster_by: str | None = None) -> bool:
        """Commit-count-triggered compaction — the maintenance policy
        continuous ingest needs (reference: cumulative compaction
        picks rowsets by count/size, be/src/storage/compaction*.cpp;
        Delta auto-optimize). When ``commit_threshold`` or more
        commits have landed since the last compact/overwrite, rewrite
        into ``target_files`` files; ``cluster_by`` range-partitions
        the rewrite on that column so zone maps keep pruning merges
        afterwards (a plain coalesce would slowly erode key
        clustering). Older versions stay readable (time travel is a
        log property, not a file-layout one); expire_versions+vacuum
        reclaim space separately, under an explicit retention call.
        Returns True when a compaction ran."""
        since = 0
        for s in reversed(self.history()):
            if s.operation in ("compact", "overwrite"):
                break
            since += 1
        if since < commit_threshold:
            return False
        if cluster_by is not None:
            df = self.read().repartitionByRange(target_files, cluster_by)
            files, n = self._write_files(df)
            self._publish(
                "compact", lambda cur: (files, n, df.schema.json())
            )
        else:
            self.compact(target_files)
        return True

    def expire_versions(self, keep_last: int = 1) -> list[int]:
        """Drop log entries older than the last ``keep_last`` (the
        retention step that makes vacuum() reclaim their files)."""
        versions = self._versions()
        expired = versions[:-keep_last] if keep_last else versions
        for v in expired:
            os.unlink(self._entry_path(v))
        return expired

    def vacuum(self) -> int:
        """Delete data files no snapshot references (after retention,
        history rewrite, etc.). Returns the number removed."""
        live: set[str] = set()
        for s in self.history():
            live.update(s.files)
        removed = 0
        for d in os.listdir(self.path):
            full = os.path.join(self.path, d)
            if d.startswith("data_") and os.path.isdir(full):
                for f in os.listdir(full):
                    p = os.path.join(full, f)
                    if f.endswith(".parquet") and p not in live:
                        os.unlink(p)
                        removed += 1
                if not any(x.endswith(".parquet") for x in os.listdir(full)):
                    shutil.rmtree(full, ignore_errors=True)
        return removed
