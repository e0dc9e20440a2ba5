"""Sources: deterministic synthetic web-page tables and CDC binlog streams,
plus typed CSV ingestion matching the reference's loader semantics."""

from data_migration_validation_spark.sources.pages import synth_pages
from data_migration_validation_spark.sources.binlog import synth_binlog

__all__ = ["synth_pages", "synth_binlog"]
