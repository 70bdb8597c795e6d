"""Async materialized views with partition-incremental (PCT) refresh.

Reference: async MVs with Partition Change Tracking
(fe/fe-core/.../catalog/MaterializedView.java:140,
scheduler/mv/MVRefreshExecutor.java, mv/refresh/pct/) — an MV over a
partitioned base table re-computes only the partitions whose source
data changed since the last refresh.

Spark realization:
- The MV is a partitioned parquet table produced by an arbitrary
  DataFrame-producing ``definition`` (the MV query), partitioned on a
  column of its output.
- Change tracking: at refresh time a per-partition fingerprint
  (count + order-independent hash-sum) of the *source* rows is
  computed with one aggregate scan; partitions whose fingerprint
  differs from the stored snapshot are recomputed with a partition
  filter (pushed to the source scan) and written with dynamic
  partition overwrite. Unchanged partitions are never read or
  written — at 100 TB this is the difference between an hourly
  refresh touching one day and one touching three years.
- Full refresh = rebuild everything (the reference's FORCE refresh).

The fingerprint (xor-sum of per-row hashes) is order- and
partitioning-independent, so it is stable across cluster layouts.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MaterializedView:
    """A partition-change-tracked materialized view.

    ``definition(source) -> DataFrame``: the MV query over the source;
    its output must contain ``partition_col``, and rows for one output
    partition must depend only on source rows in the matching source
    partition (the same constraint the reference's PCT refresh
    imposes: partition-aligned MVs, mv/refresh/pct/).
    ``source_partition_expr``: expression string over source rows that
    yields the partition value (e.g. ``date_trunc('month', ts)``).
    """

    def __init__(self, spark: SparkSession,
                 definition: Callable[[DataFrame], DataFrame],
                 partition_col: str, source_partition_expr: str,
                 path: str | None = None) -> None:
        self.spark = spark
        self.definition = definition
        self.partition_col = partition_col
        self.source_partition_expr = source_partition_expr
        from starrocks_spark.scratch import scratch_root

        self.path = path or os.path.join(
            scratch_root(), f"sr_mv_{uuid.uuid4().hex[:12]}"
        )
        self._meta_path = self.path + ".meta"

    # -------------------------------------------------------------- internal

    def _fingerprints(self, source: DataFrame) -> DataFrame:
        """One aggregate scan → (partition value, count, xor-hash)."""
        part = F.expr(self.source_partition_expr).alias("__part")
        row_hash = F.xxhash64(*[F.col(c) for c in source.columns])
        # xor-sum: order/partitioning independent, no overflow concerns
        return (
            source.select(part, row_hash.alias("__h"))
            .groupBy("__part")
            .agg(
                F.count("*").alias("__n"),
                F.expr("cast(bit_xor(__h) as long)").alias("__sig"),
            )
        )

    def _read_meta(self) -> list[dict] | None:
        """Snapshot rows, read DRIVER-side via pyarrow (symmetric with
        ``_write_meta``): the snapshot is catalog metadata — one row per
        partition — and a Spark read of it costs one scheduling-floor
        job; the old form paid that job TWICE per incremental refresh
        (changed + removed checks). None = no snapshot yet."""
        if not os.path.isdir(self._meta_path):
            return None
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(self._meta_path, "part-00000.parquet")
        )
        return tbl.to_pylist()

    def _changed_vs_snapshot(
        self, fp_rows: list, meta_rows: list[dict] | None
    ) -> list | None:
        """Partitions whose fingerprint differs from the snapshot.
        None = no snapshot yet (first refresh → full). Pure driver-side
        dict compare — the fingerprint table is metadata-scale (one row
        per partition)."""
        if meta_rows is None:
            return None
        prev = {
            r["__part"]: (r["__n"], r["__sig"]) for r in meta_rows
        }
        cur = {r["__part"]: (r["__n"], r["__sig"]) for r in fp_rows}
        return [
            p for p in cur.keys() | prev.keys()
            if cur.get(p) != prev.get(p)
        ]

    def _removed_vs_snapshot(
        self, fp_rows: list, meta_rows: list[dict] | None
    ) -> set:
        """Partition values present in the snapshot but gone from the
        current source — PCT must DELETE their directories: the pruned
        recompute yields no rows for them, so dynamic overwrite alone
        would leave the stale directory in place forever (and the meta
        write would then mark the MV fresh while it still serves the
        vanished partition)."""
        if meta_rows is None:
            return set()
        prev = {str(r["__part"]) for r in meta_rows}
        return prev - {str(r["__part"]) for r in fp_rows}

    def _delete_partitions(self, values: set) -> None:
        from urllib.parse import unquote

        prefix = f"{self.partition_col}="
        for d in os.listdir(self.path):
            if d.startswith(prefix) and unquote(d[len(prefix):]) in values:
                shutil.rmtree(os.path.join(self.path, d),
                              ignore_errors=True)

    def _write_meta(self, fp_rows: list, schema) -> None:
        """Driver-side pyarrow write: the snapshot is one row per
        partition (catalog metadata, like the reference FE's MV state),
        and a Spark job for 100-odd local rows costs seconds of
        scheduling (a LocalRelation + coalesce(1) write measured ~4 s)
        vs milliseconds here. Spark reads the file back normally."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        out = self._meta_path + ".staging"
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        arrow_schema = to_arrow_schema(schema)
        cols = [
            pa.array([r[f.name] for r in fp_rows], type=f.type)
            for f in arrow_schema
        ]
        pq.write_table(
            pa.Table.from_arrays(cols, schema=arrow_schema),
            os.path.join(out, "part-00000.parquet"),
        )
        shutil.rmtree(self._meta_path, ignore_errors=True)
        os.rename(out, self._meta_path)

    # ---------------------------------------------------------------- public

    def refresh(self, source: DataFrame, force_full: bool = False) -> int:
        """Refresh from the current source; returns the number of
        partitions rewritten (-1 for a full rebuild).

        ONE fingerprint scan per refresh: the per-partition rows are
        collected (metadata-scale) and reused for both change detection
        and the snapshot write — the earlier revision fingerprinted the
        source twice per refresh, doubling the dominant scan cost."""
        fp = self._fingerprints(source)
        fp_schema = fp.schema
        fp_rows = fp.collect()
        meta_rows = self._read_meta()
        changed = (None if force_full
                   else self._changed_vs_snapshot(fp_rows, meta_rows))
        # one write task per ~partition: each partition directory gets
        # ONE file (not #tasks fragments), while writes still run in
        # parallel. An explicit count matters: a bare repartition(col)
        # lets AQE coalesce the tiny aggregated MV to a single task,
        # which then opens the partition files sequentially.
        par = self.spark.sparkContext.defaultParallelism

        def _layout(df: DataFrame, n_parts: int) -> DataFrame:
            return df.repartition(
                max(1, min(n_parts, par)), F.col(self.partition_col)
            )

        if changed is None:
            result = _layout(self.definition(source), len(fp_rows))
            result.write.mode("overwrite") \
                .partitionBy(self.partition_col).parquet(self.path)
            self._write_meta(fp_rows, fp_schema)
            return -1
        if not changed:
            return 0
        # recompute ONLY changed partitions: the source filter prunes
        # the scan; dynamic overwrite rewrites only those directories.
        # partitionOverwriteMode is set per-writer, NOT assumed from the
        # session: under the default ``static`` mode this overwrite
        # would delete every untouched partition directory.
        pruned = source.filter(
            F.expr(self.source_partition_expr).isin(changed)
        )
        result = _layout(
            self.definition(pruned).filter(
                F.col(self.partition_col).isin(changed)
            ),
            len(changed),
        )
        result.write.mode("overwrite") \
            .option("partitionOverwriteMode", "dynamic") \
            .partitionBy(self.partition_col).parquet(self.path)
        removed = self._removed_vs_snapshot(fp_rows, meta_rows)
        if removed:
            self._delete_partitions(removed)
        self._write_meta(fp_rows, fp_schema)
        return len(changed)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
        shutil.rmtree(self._meta_path, ignore_errors=True)
