"""Incremental reconciliation: after a passing reconcile at epoch E, only
the buckets touched by later epoch commits need re-verification. The
operator must find corruption inside the changed buckets, stay empty when
state matches, scope OUT corruption in untouched buckets (that is the
contract — the prior reconcile vouches for them), and fall back to a full
reconcile when the changed-bucket set is unknowable."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_validation_spark.operators.reconcile import (
    cogroup_reconcile,
    incremental_reconcile,
)
from tests.test_time_travel import _replay


def _corrupt(reference, url, new_text):
    return reference.withColumn(
        "text",
        F.when(F.col("url") == url, F.lit(new_text)).otherwise(F.col("text")),
    )


def test_incremental_empty_when_state_matches(spark, tmp_path):
    eng = _replay(spark, tmp_path, "ir0", [0, 1, 2, 3])
    ref = eng.read_final()
    assert incremental_reconcile(eng, ref, since_epoch=2).count() == 0


def test_incremental_finds_changed_bucket_corruption(spark, tmp_path):
    eng = _replay(spark, tmp_path, "ir1", [0, 1, 2, 3])
    # epoch 3 touched a/1 and c/5 → their buckets are in scope since e2
    ref = _corrupt(eng.read_final(), "https://a/1", "tampered")
    diff = incremental_reconcile(eng, ref, since_epoch=2)
    rows = [(r["key"], r["column"], r["kind"]) for r in diff.collect()]
    assert ("https://a/1", "text", "mismatch") in rows


def test_incremental_scopes_out_untouched_buckets(spark, tmp_path):
    eng = _replay(spark, tmp_path, "ir2", [0, 1, 2, 3], num_buckets=64)
    # b/3 last changed at epoch 2 — sits in a bucket untouched since e2
    ref = _corrupt(eng.read_final(), "https://b/3", "tampered")
    inc = incremental_reconcile(eng, ref, since_epoch=2)
    assert inc.count() == 0  # out of scope by contract: delta-check, not audit
    full = cogroup_reconcile(eng.read_final(), ref, "url")
    assert full.where(F.col("key") == "https://b/3").count() == 1


def test_cogroup_handles_array_columns(spark):
    """Embedding-style array<float> columns must reconcile, not crash:
    Arrow hands array cells to pandas as np.ndarray, where pd.isna is
    elementwise (truth-testing raises) and == is elementwise too. Equal
    vectors pass, a differing vector is a mismatch, a NaN-poisoned
    vector never equals anything (IEEE), and a NULL array on one side
    only is a mismatch."""
    old = spark.createDataFrame(
        [
            ("a", [1.0, 2.0]),
            ("b", [1.0, 2.0]),
            ("c", [float("nan"), 2.0]),
            ("d", [1.0, 2.0]),
        ],
        "url string, emb array<double>",
    )
    new = spark.createDataFrame(
        [
            ("a", [1.0, 2.0]),
            ("b", [1.0, 9.0]),
            ("c", [float("nan"), 2.0]),
            ("d", None),
        ],
        "url string, emb array<double>",
    )
    rows = {
        r["key"]: (r["column"], r["kind"])
        for r in cogroup_reconcile(old, new, key="url").collect()
    }
    assert "a" not in rows
    assert rows["b"] == ("emb", "mismatch")
    assert rows["c"] == ("emb", "mismatch")  # NaN != NaN by design
    assert rows["d"] == ("emb", "mismatch")


def test_incremental_falls_back_to_full_after_rebucket(spark, tmp_path):
    eng = _replay(spark, tmp_path, "ir3", [0, 1, 2])
    eng.lake.rebucket(spark, 16)
    from tests.test_time_travel import _EPOCHS, _events

    eng.apply_epoch(_events(spark, _EPOCHS[3], 3), 3)
    # rebucket in range → changed set unknowable → FULL reconcile: the
    # untouched-bucket corruption IS found
    ref = _corrupt(eng.read_final(), "https://b/3", "tampered")
    diff = incremental_reconcile(eng, ref, since_epoch=1)
    rows = [(r["key"], r["column"], r["kind"]) for r in diff.collect()]
    assert ("https://b/3", "text", "mismatch") in rows
