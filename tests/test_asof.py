"""as-of join unit tests: tie rule, missing-version handling, version
atomicity under null payloads, and the single-shuffle plan contract."""

from __future__ import annotations

import os
import sys
from datetime import datetime

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_migration_validation_spark.operators.asof import asof_join  # noqa: E402


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def _frames(spark):
    dim = spark.createDataFrame(
        [
            ("a", _ts(10), "v1", 1.0),
            ("a", _ts(20), None, 2.0),  # null payload col in a real version
            ("a", _ts(30), "v3", 3.0),
            ("b", _ts(50), "b1", 9.0),
        ],
        "k string, ts timestamp, name string, score double",
    )
    facts = spark.createDataFrame(
        [
            ("a", _ts(5), 100),   # before any version
            ("a", _ts(20), 101),  # exactly AT a version ts -> matches it
            ("a", _ts(25), 102),  # between v2 and v3
            ("a", _ts(40), 103),  # after v3
            ("b", _ts(49), 104),  # before b's only version
            ("c", _ts(10), 105),  # key with no dim at all
        ],
        "k string, ts timestamp, fid long",
    )
    return facts, dim


def test_asof_inner_matches_latest_leq(spark):
    facts, dim = _frames(spark)
    out = asof_join(facts, dim, key="k", ts="ts").orderBy("fid")
    rows = [(r["fid"], r["ts_dim"].minute, r["name"], r["score"]) for r in out.collect()]
    assert rows == [
        (101, 20, None, 2.0),  # tie: version AT fact ts matches; its null
        (102, 20, None, 2.0),  # name is NOT backfilled from v1 (atomicity)
        (103, 30, "v3", 3.0),
    ]


def test_asof_left_keeps_unmatched_facts(spark):
    facts, dim = _frames(spark)
    out = asof_join(facts, dim, key="k", ts="ts", how="left")
    assert out.count() == facts.count()
    unmatched = {r["fid"] for r in out.where(F.col("ts_dim").isNull()).collect()}
    assert unmatched == {100, 104, 105}


def test_asof_suffixes_colliding_columns(spark):
    facts, dim = _frames(spark)
    facts2 = facts.withColumn("name", F.concat(F.lit("f"), F.col("fid").cast("string")))
    out = asof_join(facts2, dim, key="k", ts="ts")
    assert "name" in out.columns and "name_dim" in out.columns
    r = {row["fid"]: row for row in out.collect()}
    assert r[103]["name"] == "f103" and r[103]["name_dim"] == "v3"


def test_asof_plan_is_single_shuffle(spark):
    """The union-merge shape must cost exactly one exchange (hash on the
    key for the window) — no range join, no second shuffle."""
    facts, dim = _frames(spark)
    plan = (
        asof_join(facts, dim, key="k", ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
