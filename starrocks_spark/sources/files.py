"""File sources & sinks — the FILES() table function, format readers,
export writers, and catalog/metadata scans.

Reference coverage (SURVEY.md §2.1/§2.2):
- FileScanNode + FILES() table function: ad-hoc reads of CSV / JSON /
  Parquet / ORC with schema inference
  (be/src/exec/file_scan_node.h:34, formats in be/src/formats/{csv,
  json,parquet,orc}, FE catalog/TableFunctionTable.java:92).
- Export/file sink: write query results as CSV/Parquet/ORC/JSON,
  optionally partitioned (be/src/data_sink/result/
  file_result_writer.cpp, parquet_builder.cpp; INSERT INTO FILES()).
- SchemaScanNode: information_schema virtual tables
  (be/src/exec/schema_scan_node.h:31, be/src/schema_scanner/).
- MetaScanNode: min/max/count answered from metadata without reading
  data pages (be/src/exec/meta_scan_node.cpp) — on Spark this is
  Parquet aggregate pushdown (spark.sql.parquet.aggregatePushdown),
  verified by the plan test.

Everything is Spark's native DataSource machinery: schema inference,
predicate/column pushdown, partition discovery and parallel reads all
come from the DSv2 readers — at 100 TB the scan parallelism is one
task per file split, no driver bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession

_FORMATS = {"csv", "json", "parquet", "orc", "avro"}


def read_files(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: str | None = None, **options) -> DataFrame:
    """FILES(path, format=...) — ad-hoc file read with inference.

    CSV defaults to header+inferSchema like the reference's CSV scan
    with column mapping; JSON infers by sampling. Pass an explicit
    ``schema`` string in production — inference reads data twice.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if not schema:
            options.setdefault("inferSchema", "true")
    return reader.format(fmt).options(**options).load(path)


def write_files(df: DataFrame, path: str, fmt: str = "parquet",
                partition_by: list[str] | None = None,
                mode: str = "overwrite", **options) -> None:
    """INSERT INTO FILES(...) / EXPORT — write a result set to files.
    Partitioned layout writes one directory per value, the layout
    partition pruning needs on read-back."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.options(**options).save(path)


# coarse type categories shared with the DuckDB oracle so the two
# catalogs' spellings (bigint vs BIGINT, string vs VARCHAR) compare
_TYPE_CATEGORY = [
    ("array", "array"),
    ("struct", "struct"),
    ("map", "map"),
    ("bigint", "int"),
    ("int", "int"),
    ("smallint", "int"),
    ("tinyint", "int"),
    ("double", "float"),
    ("float", "float"),
    ("decimal", "decimal"),
    ("string", "text"),
    ("varchar", "text"),
    ("char", "text"),
    ("timestamp", "time"),
    ("date", "time"),
    ("boolean", "bool"),
    ("binary", "binary"),
]


def _categorize(type_name: str) -> str:
    t = type_name.lower()
    for prefix, cat in _TYPE_CATEGORY:
        if t.startswith(prefix):
            return cat
    return "other"


def meta_scan(spark: SparkSession, path: str) -> DataFrame:
    """Metadata-only scan: read through DataSource V2 so count/min/max
    aggregates push down to parquet footer statistics — no data pages
    are decoded (MetaScanNode, be/src/exec/meta_scan_node.cpp).
    The DSv2 relation is resolved eagerly at load(), so the conf flip
    is scoped to this call."""
    prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        return spark.read.format("parquet").load(path)
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", prev)


def schema_columns(spark: SparkSession,
                   tables: dict[str, DataFrame]) -> DataFrame:
    """information_schema.columns as a DataFrame (SchemaScanNode /
    schema_scanner analog): one row per column of each registered
    table, with a coarse type category."""
    rows = []
    for tname in sorted(tables):
        for pos, f in enumerate(tables[tname].schema.fields, start=1):
            rows.append(
                Row(
                    table_name=tname,
                    column_name=f.name,
                    ordinal_position=pos,
                    type_category=_categorize(f.dataType.simpleString()),
                    is_nullable=bool(f.nullable),
                )
            )
    return spark.createDataFrame(rows)
