"""Checkpoint store + per-partition lineage + metrics tables.

Checkpoint = last applied epoch, written atomically AFTER the lake commit.
Crash between commit and checkpoint is the classic exactly-once hazard;
recovery is: trust the lake's epoch set (plans/lake.py idempotency guard),
use the checkpoint only as a fast resume hint. Re-running an epoch that
committed but didn't checkpoint is a no-op.

Lineage rows (FIXTURES.md F5):
    (epoch, partition, source_offset_start, source_offset_end,
     applied_events, commit_ts)
Metrics rows: (epoch, stage, metric, value).

Both are append-only parquet subdirectories (one file per epoch, written
by the driver — they are tiny control-plane tables, not data-plane)."""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from data_migration_validation_spark.plans.lake import _atomic_write

LINEAGE_COLS = [
    "epoch",
    "partition",
    "source_offset_start",
    "source_offset_end",
    "applied_events",
    "commit_ts",
]
METRICS_COLS = ["epoch", "stage", "metric", "value"]


class CheckpointStore:
    def __init__(self, path: str):
        self.path = path
        self.lineage_dir = os.path.join(path, "lineage")
        self.metrics_dir = os.path.join(path, "metrics")
        os.makedirs(self.lineage_dir, exist_ok=True)
        os.makedirs(self.metrics_dir, exist_ok=True)

    # -- epoch checkpoint ------------------------------------------------------

    def last_epoch(self) -> int | None:
        p = os.path.join(self.path, "EPOCH")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.loads(f.read())["epoch"]

    def write_epoch(self, epoch: int) -> None:
        _atomic_write(
            os.path.join(self.path, "EPOCH"),
            json.dumps({"epoch": epoch, "ts": time.time()}),
        )

    # -- lineage / metrics -----------------------------------------------------

    def append_lineage(self, rows: list[dict]) -> None:
        if not rows:
            return
        pdf = pd.DataFrame(rows, columns=LINEAGE_COLS)
        epoch = rows[0]["epoch"]
        pdf.to_parquet(os.path.join(self.lineage_dir, f"epoch-{epoch}.parquet"), index=False)

    def append_metrics(self, rows: list[dict]) -> None:
        if not rows:
            return
        pdf = pd.DataFrame(rows, columns=METRICS_COLS)
        epoch = rows[0]["epoch"]
        # stage-qualified name: an epoch can emit several metric batches
        # (apply, then compact) — a bare epoch-N name would overwrite
        stage = rows[0].get("stage", "apply")
        pdf.to_parquet(
            os.path.join(self.metrics_dir, f"epoch-{epoch}-{stage}.parquet"),
            index=False,
        )

    def lineage(self) -> pd.DataFrame:
        files = sorted(
            os.path.join(self.lineage_dir, f)
            for f in os.listdir(self.lineage_dir)
            if f.endswith(".parquet")
        )
        if not files:
            return pd.DataFrame(columns=LINEAGE_COLS)
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

    def metrics(self) -> pd.DataFrame:
        files = sorted(
            os.path.join(self.metrics_dir, f)
            for f in os.listdir(self.metrics_dir)
            if f.endswith(".parquet")
        )
        if not files:
            return pd.DataFrame(columns=METRICS_COLS)
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
