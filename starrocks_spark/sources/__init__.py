"""Sources & sinks: FILES()-style ad-hoc file reads, export writes,
information_schema scans, metadata-only scans (SURVEY.md §2.1, §2.2)."""

from starrocks_spark.sources.files import (
    meta_scan,
    read_files,
    schema_columns,
    write_files,
)

__all__ = ["read_files", "write_files", "schema_columns", "meta_scan"]
