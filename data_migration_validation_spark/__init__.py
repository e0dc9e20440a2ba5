"""data_migration_validation_spark — a PySpark-native CDC / incremental-ingest
and data-validation engine.

A from-scratch re-expression of the capabilities of the reference repo
``mohanreddy6/Data-Migration-Validation`` (a pandas/JS data-migration
validation tool) as a distributed, Spark-first engine:

* the OLD→NEW snapshot diff becomes a binlog/WAL change stream applied to a
  lake table via key-partitioned MERGE-style upserts (``plans.apply``),
* the validation suite (row counts, PK dups, nulls, membership deltas,
  cell-level diffs, rekeys, format checks — reference ``src/validate.py`` and
  ``docs/script.js``) becomes a library of declarative DataFrame operators
  (``operators.validation``) plus a distributed cogroup reconciliation
  operator (``operators.reconcile``),
* exactly-once is achieved with idempotent, epoch-keyed atomic snapshot
  commits (``plans.lake``), resumable from checkpoint with per-partition
  lineage and metrics (``plans.checkpoint``, ``plans.lineage``).

Everything is built on public PySpark 4.x APIs only.
"""

__version__ = "0.1.0"
