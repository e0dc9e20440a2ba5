"""Chunked table checksums + aggregate fingerprints (operators/checksum.py):
identical tables prove clean, a single mutated cell flags exactly its
chunk, and NULL never collides with empty string in the row digest."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_validation_spark.operators.checksum import (
    aggregate_compare,
    checksum_diff,
    chunk_checksums,
)

COLS = ["k", "name", "val"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, name string, val long")


def test_identical_tables_no_diff(spark):
    rows = [(i, f"n{i}", i * 10) for i in range(200)]
    assert checksum_diff(_df(spark, rows), _df(spark, rows), "k", COLS).count() == 0


def test_single_cell_edit_flags_exactly_its_chunk(spark):
    rows = [(i, f"n{i}", i * 10) for i in range(200)]
    edited = [(k, n, 999 if k == 137 else v) for k, n, v in rows]
    diff = checksum_diff(_df(spark, rows), _df(spark, edited), "k", COLS, n_chunks=16)
    got = diff.collect()
    assert len(got) == 1 and got[0]["chunk"] == 137 % 16
    # same rows per side, different content checksum → content diff, not cardinality
    assert got[0]["old_rows"] == got[0]["new_rows"]
    assert got[0]["old_checksum"] != got[0]["new_checksum"]


def test_deleted_row_flags_chunk_via_row_count(spark):
    rows = [(i, f"n{i}", i * 10) for i in range(100)]
    dropped = [r for r in rows if r[0] != 42]
    got = checksum_diff(_df(spark, rows), _df(spark, dropped), "k", COLS, n_chunks=8).collect()
    assert len(got) == 1 and got[0]["chunk"] == 42 % 8
    assert got[0]["old_rows"] == got[0]["new_rows"] + 1


def test_null_and_empty_string_digest_differently(spark):
    a = spark.createDataFrame([(1, None)], "k long, name string")
    b = spark.createDataFrame([(1, "")], "k long, name string")
    ca = chunk_checksums(a, "k", ["k", "name"]).collect()[0]["checksum"]
    cb = chunk_checksums(b, "k", ["k", "name"]).collect()[0]["checksum"]
    assert ca != cb  # concat_ws alone would silently merge these


def test_separator_in_values_does_not_cross_column_boundaries(spark):
    """('a|b','c') vs ('a','b|c') — a raw '|' join of the rendered values
    would digest these identically; the per-column md5 rendering must
    not."""
    a = spark.createDataFrame([(1, "a|b", "c")], "k long, x string, y string")
    b = spark.createDataFrame([(1, "a", "b|c")], "k long, x string, y string")
    ca = chunk_checksums(a, "k", ["x", "y"]).collect()[0]["checksum"]
    cb = chunk_checksums(b, "k", ["x", "y"]).collect()[0]["checksum"]
    assert ca != cb


def test_literal_null_sentinel_does_not_collide_with_null(spark):
    from data_migration_validation_spark.operators.checksum import NULL_SENTINEL

    a = spark.createDataFrame([(1, None)], "k long, name string")
    b = spark.createDataFrame([(1, NULL_SENTINEL)], "k long, name string")
    ca = chunk_checksums(a, "k", ["k", "name"]).collect()[0]["checksum"]
    cb = chunk_checksums(b, "k", ["k", "name"]).collect()[0]["checksum"]
    assert ca != cb


def test_string_key_refused_loudly(spark):
    """pmod on a string key silently casts to NULL, folding every row
    into one null chunk — which "proves" any two tables identical. The
    operator must refuse instead and point at the hash-derived fix."""
    import pytest

    df = spark.createDataFrame([("u1", "x")], "url string, name string")
    with pytest.raises(ValueError, match="not\\s+numeric"):
        chunk_checksums(df, "url", ["name"])
    # and the documented fix works: hash-derived numeric chunk key
    keyed = df.withColumn("k", F.pmod(F.xxhash64("url"), F.lit(8)))
    assert chunk_checksums(keyed, "k", ["name"]).count() == 1


def test_checksum_order_independent(spark):
    rows = [(i, f"n{i}", i) for i in range(50)]
    fwd = chunk_checksums(_df(spark, rows), "k", COLS, n_chunks=1).collect()[0]
    rev = chunk_checksums(_df(spark, list(reversed(rows))), "k", COLS, n_chunks=1).collect()[0]
    assert (fwd["n_rows"], fwd["checksum"]) == (rev["n_rows"], rev["checksum"])


def test_aggregate_compare_flags_only_touched_metrics(spark):
    old = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    new = spark.createDataFrame([(1, 10), (2, 20), (3, 31)], "k long, v long")
    out = {(r["col_name"], r["metric"]): r for r in aggregate_compare(old, new, ["v"]).collect()}
    assert out[("*", "rows")]["equal"] is True
    assert out[("v", "min")]["equal"] is True
    assert out[("v", "max")]["equal"] is False  # 30 → 31
    assert out[("v", "sum")]["equal"] is False  # 60 → 61
    assert out[("v", "nulls")]["equal"] is True


def test_aggregate_compare_single_job_per_side(spark):
    """Both summaries are ONE aggregate each — the melt must not fan out
    into per-metric scans."""
    old = spark.createDataFrame([(1, 10)], "k long, v long")
    new = spark.createDataFrame([(1, 10)], "k long, v long")
    plan = aggregate_compare(old, new, ["v"])._jdf.queryExecution().executedPlan().toString()
    # one scan per side (LocalTableScan here); a per-metric union would show 10
    assert plan.count("LocalTableScan") <= 2
