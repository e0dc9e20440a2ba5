"""Patch-merge semantics (sparse CDC events): per-column LWW bounded by
full-image barriers. Null in a U event means "unchanged"; I resets the
row; D blocks leaks from before the tombstone; a U after a D re-creates
by patching. The fold must be a single-shuffle, expression-only plan."""

from __future__ import annotations

from datetime import datetime

from data_migration_validation_spark.operators.patch import patch_fold

SCHEMA = "op string, url string, warc_ts timestamp, seq long, lang string, text string"


def _fold(spark, rows):
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    df = spark.createDataFrame(
        [(op, u, ts(t), q, lang, text) for op, u, t, q, lang, text in rows], SCHEMA
    )
    return {
        r["url"]: (r["lang"], r["text"], r["seq"])
        for r in patch_fold(df).collect()
    }


def test_null_means_unchanged(spark):
    got = _fold(spark, [
        ("I", "u1", "2024-01-01 00:00:00", 0, "en", "hello"),
        ("U", "u1", "2024-01-01 01:00:00", 1, None, "hello v1"),   # patches text only
        ("U", "u1", "2024-01-01 02:00:00", 2, "de", None),          # patches lang only
    ])
    assert got == {"u1": ("de", "hello v1", 2)}


def test_insert_resets_row(spark):
    got = _fold(spark, [
        ("I", "u1", "2024-01-01 00:00:00", 0, "en", "old text"),
        ("U", "u1", "2024-01-01 01:00:00", 1, "fr", None),
        ("I", "u1", "2024-01-01 02:00:00", 2, None, "fresh"),  # full image: lang resets to null
    ])
    assert got == {"u1": (None, "fresh", 2)}


def test_delete_blocks_leaks_and_patch_recreates(spark):
    got = _fold(spark, [
        ("I", "u1", "2024-01-01 00:00:00", 0, "en", "hello"),
        ("D", "u1", "2024-01-01 01:00:00", 1, None, None),
        ("U", "u1", "2024-01-01 02:00:00", 2, None, "reborn"),  # upsert-by-patch
        # u2: delete is the latest event → not live at all
        ("I", "u2", "2024-01-01 00:00:00", 10, "de", "bye"),
        ("D", "u2", "2024-01-01 01:00:00", 11, None, None),
    ])
    # pre-delete lang 'en' must NOT leak through the tombstone
    assert got == {"u1": (None, "reborn", 2)}


def test_patch_only_stream_is_live(spark):
    got = _fold(spark, [
        ("U", "u1", "2024-01-01 00:00:00", 0, "en", None),
        ("U", "u1", "2024-01-01 01:00:00", 1, None, "txt"),
    ])
    assert got == {"u1": ("en", "txt", 1)}


def test_out_of_order_arrival_is_irrelevant(spark):
    rows = [
        ("I", "u1", "2024-01-01 00:00:00", 0, "en", "a"),
        ("U", "u1", "2024-01-01 02:00:00", 2, "de", None),
        ("U", "u1", "2024-01-01 01:00:00", 1, "fr", "b"),  # older patch, arrives last
    ]
    assert _fold(spark, rows) == _fold(spark, sorted(rows, key=lambda r: r[3]))
    assert _fold(spark, rows)["u1"] == ("de", "b", 2)


def test_single_shuffle_expression_only_plan(spark):
    df = spark.createDataFrame(
        [("I", "u1", datetime(2024, 1, 1), 0, "en", "t")], SCHEMA
    )
    plan = patch_fold(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
