"""column_profile: exact vs approximate (sketch) modes — same schema,
agreeing values within sketch error, and the approximate plan must avoid
the Expand pass that exact multi-column count(DISTINCT) costs."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_migration_validation_spark.operators.validation import (  # noqa: E402
    column_profile,
)


def _df(spark):
    return spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 97).alias("bucketed"),
        F.when(F.col("id") % 10 == 0, None).otherwise(
            F.concat(F.lit("u"), (F.col("id") % 400).cast("string"))
        ).alias("cat"),
    )


def test_exact_profile_values(spark):
    prof = {r["column"]: r for r in column_profile(_df(spark)).collect()}
    assert prof["id"]["n_rows"] == 5000
    assert prof["id"]["n_distinct"] == 5000
    assert prof["id"]["n_nulls"] == 0
    assert prof["id"]["median"] == 2499.5
    assert prof["bucketed"]["n_distinct"] == 97
    assert prof["cat"]["n_nulls"] == 500
    # residues of id%400 that are themselves %10==0 are ALWAYS nulled
    # (id ≡ r mod 400, r%10==0 ⇒ id%10==0), so 400 - 40 distinct survive
    assert prof["cat"]["n_distinct"] == 360
    assert prof["cat"]["mean"] is None and prof["cat"]["median"] is None


def test_approx_profile_agrees_within_sketch_error(spark):
    df = _df(spark)
    exact = {r["column"]: r for r in column_profile(df).collect()}
    approx = {r["column"]: r for r in column_profile(df, approximate=True).collect()}
    assert set(exact) == set(approx)
    for c in exact:
        e, a = exact[c], approx[c]
        # counts/nulls/min/max/mean are exact in both modes
        assert (e["n_rows"], e["n_nulls"], e["min_value"], e["max_value"], e["mean"]) == (
            a["n_rows"], a["n_nulls"], a["min_value"], a["max_value"], a["mean"]
        )
        # HLL++ default rsd ~= 5%; allow 10%
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(2, 0.1 * e["n_distinct"]), c
        if e["median"] is not None:
            assert abs(a["median"] - e["median"]) <= max(1.0, 0.02 * abs(e["median"])), c


def test_approx_profile_plan_has_no_expand(spark):
    df = _df(spark)
    exact_plan = column_profile(df)._jdf.queryExecution().executedPlan().toString()
    approx_plan = (
        column_profile(df, approximate=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exact multi-distinct needs Expand (the documented cost); the sketch
    # path must be a plain partial/final hash aggregate
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan, approx_plan


# -- distribution drift ------------------------------------------------------

from data_migration_validation_spark.operators.validation import (  # noqa: E402
    distribution_drift,
)


def test_drift_psi_shifted_vs_stable(spark):
    old = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("stable"),
        (F.col("id") % 100).cast("double").alias("shifted"),
    )
    # shifted: +50 unit change (half the old range); stable: identical
    new = old.select("stable", (F.col("shifted") + 50.0).alias("shifted"))
    out = distribution_drift(old, new, ["stable", "shifted"], n_bins=10)
    rows = out.collect()
    psi = {}
    for r in rows:
        psi[r["column"]] = psi.get(r["column"], 0.0) + r["psi_term"]
        assert -1 <= r["bin"] <= 9
    assert psi["stable"] < 0.01  # identical distribution → ~0
    assert psi["shifted"] > 0.25  # unit-change shift → "broken" band
    # clamping: new values above the OLD max all land in the top bin
    top = {(r["column"], r["bin"]): r for r in rows}
    assert top[("shifted", 9)]["new_count"] > top[("shifted", 9)]["old_count"]


def test_drift_null_bin_and_constant_column(spark):
    old = spark.range(0, 100).select(
        F.lit(7.0).alias("const"),
        F.col("id").cast("double").alias("x"),
    )
    new = old.select(
        "const",
        F.when(F.col("x") < 50, None).otherwise(F.col("x")).alias("x"),
    )
    rows = distribution_drift(old, new, ["const", "x"], n_bins=10).collect()
    by = {(r["column"], r["bin"]): r for r in rows}
    assert by[("const", 0)]["old_count"] == 100  # hi==lo → single bin
    assert by[("x", -1)]["new_count"] == 50  # nulls get their own bin
    assert by[("x", -1)]["old_count"] == 0  # OLD had no nulls
