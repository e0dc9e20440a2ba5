"""Negative-path validation tests: seeded defects the reference goldens
don't exercise (FIXTURES.md F1 'negative-path variants') — duplicate PKs,
nulls / empty-string nulls, schema drift, invalid formats, true rekeys,
unexpected deltas, and the sign-off overlay."""

from __future__ import annotations

import pytest

from data_migration_validation_spark.operators.validation import (
    ValidationConfig,
    apply_signoff,
    cell_mismatches,
    check_summary,
    duplicate_key_count,
    duplicate_rows,
    format_violations,
    null_summary,
    only_in_new,
    only_in_old,
    possible_rekeys,
    schema_comparison,
)

CFG = ValidationConfig(
    primary_key="id",
    required_fields=["email", "phone"],
    compare_columns=["email", "balance"],
)

OLD_ROWS = [
    ("1", "a@x.com", "100.5", "111"),
    ("2", "b@x.com", "-3", "222"),
    ("2", "b2@x.com", "0", "222"),  # dup key
    ("3", None, "7", ""),           # null email, empty phone
    ("4", "d@x.com", "8", "444"),   # deleted in NEW (not allowlisted)
    ("5", "e@x.com", "9", "555"),   # rekeyed to 50 in NEW
]
NEW_ROWS = [
    ("1", "a@x.com", "100.5", "111"),
    ("2", "not-an-email", "abc", "222"),   # mismatch + bad formats
    ("3", "", "7", ""),                     # empty-string email
    ("50", "e@x.com", "9", "555"),          # rekey of 5
    ("6", "f@x.com", "10", "666"),          # unexpected addition
]
SCHEMA = "id string, email string, balance string, phone string"


@pytest.fixture(scope="module")
def tables(spark):
    old = spark.createDataFrame(OLD_ROWS, SCHEMA)
    new = spark.createDataFrame(NEW_ROWS, SCHEMA)
    return old.cache(), new.cache()


def test_duplicate_detection(tables):
    old, new = tables
    assert duplicate_key_count(old, "id") == 1  # pandas duplicated().sum()
    assert duplicate_rows(old, "id").count() == 2  # keep=False materializes both
    assert duplicate_key_count(new, "id") == 0


def test_null_semantics_sql_vs_js(spark, tables):
    old, new = tables
    # SQL semantics: only true NULL counts
    rows = {r["field"]: r for r in null_summary(old, new, CFG).collect()}
    assert rows["email"]["old_nulls"] == "1"
    assert rows["email"]["new_nulls"] == "0"
    # JS semantics (docs/script.js:234): empty string is null too
    js_cfg = ValidationConfig(primary_key="id", required_fields=["email", "phone"], empty_string_is_null=True)
    rows = {r["field"]: r for r in null_summary(old, new, js_cfg).collect()}
    assert rows["email"]["new_nulls"] == "1"
    assert rows["phone"]["old_nulls"] == "1"


def test_missing_column_reports_col_missing(spark, tables):
    old, new = tables
    cfg = ValidationConfig(primary_key="id", required_fields=["email", "ghost"])
    rows = {r["field"]: r for r in null_summary(old, new, cfg).collect()}
    assert rows["ghost"]["old_nulls"] == "col-missing"
    assert rows["ghost"]["new_nulls"] == "col-missing"


def test_schema_drift(spark, tables):
    old, _ = tables
    drifted = old.drop("phone").withColumn("extra", old["id"].cast("int"))
    got = {r["column"]: r for r in schema_comparison(old, drifted).collect()}
    assert got["phone"]["present_in_old"] and not got["phone"]["present_in_new"]
    assert not got["extra"]["present_in_old"] and got["extra"]["present_in_new"]
    assert got["extra"]["dtype_new"] == "int"


def test_membership_and_allowlists(spark, tables):
    old, new = tables
    assert {r["id"] for r in only_in_old(old, new, CFG).select("id").collect()} == {"4", "5"}
    assert {r["id"] for r in only_in_new(old, new, CFG).select("id").collect()} == {"50", "6"}
    allow_cfg = ValidationConfig(
        primary_key="id",
        allowed_deletions=frozenset({"4"}),
        allowed_additions=frozenset({"6"}),
    )
    assert {r["id"] for r in only_in_old(old, new, allow_cfg).select("id").collect()} == {"5"}
    assert {r["id"] for r in only_in_new(old, new, allow_cfg).select("id").collect()} == {"50"}


def test_cell_mismatches_and_signoff(spark, tables):
    old, new = tables
    mm = cell_mismatches(old, new, CFG)
    rows = {(r["id"], r["column"]) for r in mm.collect()}
    # key 2 appears twice in OLD (dup) — both compared against NEW's single row
    assert ("2", "email") in rows and ("2", "balance") in rows
    assert ("1", "email") not in rows

    annotated = apply_signoff(mm, [("2", "EMAIL")], pk="id")
    ver = {(r["id"], r["column"]): r["verified"] for r in annotated.collect()}
    assert ver[("2", "email")] is True
    assert ver[("2", "balance")] is False


def test_rekey_detection(tables):
    old, new = tables
    rk = possible_rekeys(old, new, ValidationConfig(primary_key="id"), attr="email")
    pairs = {(r["old_pk"], r["new_pk"]) for r in rk.collect()}
    assert ("5", "50") in pairs


def test_format_violations(tables):
    _, new = tables
    v = format_violations(
        new, "id", {"email": "email_format", "balance": "non_negative_number"}
    )
    got = {(r["id"], r["column"], r["rule"]) for r in v.collect()}
    assert ("2", "email", "email_format") in got
    assert ("2", "balance", "non_negative_number") in got
    assert ("3", "email", "email_format") in got  # empty string fails regex
    # negative balance violates non_negative in OLD
    old, _ = tables
    v_old = format_violations(old, "id", {"balance": "non_negative_number"})
    assert ("2", "balance") in {(r["id"], r["column"]) for r in v_old.collect()}


def test_check_summary_failures(spark, tables):
    old, new = tables
    got = {r["check"]: r for r in check_summary(old, new, CFG).collect()}
    rows = {k: r["status"] for k, r in got.items()}
    assert rows["Row count match"] == "FAIL"
    assert rows["Primary key duplicates"] == "FAIL"
    assert rows["Nulls in required fields"] == "WARN"
    assert rows["Missing/extra keys"] == "FAIL"
    # pinned notes: duplicate surplus from count-distinct, null counts per
    # field, membership deltas, and the dup-key cross-product mismatch count
    # (key 2's two OLD rows each diff on email+balance, key 3 nulls-vs-empty
    # on email = 5 cells) — same values the per-operator jobs produced
    assert got["Primary key duplicates"]["notes"] == "Old dupes=1, New dupes=0"
    assert got["Row count match"]["notes"] == "Old=6 (adj 6), New=5 (adj 5)"
    assert got["Nulls in required fields"]["notes"] == "email: Old=1, New=0; phone: Old=0, New=0"
    assert got["Missing/extra keys"]["notes"] == "Only in old=2, only in new=2"
    assert got["Value mismatches"]["notes"] == "count=5"


def test_check_summary_two_actions(spark, tables, monkeypatch):
    """The summary must cost exactly 2 Spark actions no matter how many
    checks are configured (VERDICT r2 #7: it used to run ~8 scans)."""
    old, new = tables
    # patch the CONCRETE DataFrame class (pyspark 4 routes the public
    # pyspark.sql.DataFrame API through classic/connect subclasses)
    df_cls = type(old)
    calls = {"n": 0}
    real_collect = df_cls.collect

    def counting_collect(self):
        calls["n"] += 1
        return real_collect(self)

    monkeypatch.setattr(df_cls, "collect", counting_collect)
    cfg = ValidationConfig(
        primary_key="id",
        required_fields=["email", "phone", "ghost"],
        compare_columns=["email", "balance"],
        allowed_deletions=frozenset({"4"}),
        allowed_additions=frozenset({"6"}),
    )
    summary = check_summary(
        old, new, cfg,
        format_rules={"email": "email_format", "balance": "non_negative_number"},
    )
    assert calls["n"] == 2  # one per-dataset agg + one membership/mismatch join
    got = {r["check"]: r for r in real_collect(summary)}
    # allowlists fold into the same two jobs: 4 allowlisted away on each side
    assert got["Row count match"]["notes"] == "Old=6 (adj 5), New=5 (adj 4)"
    assert got["Missing/extra keys"]["notes"] == "Only in old=1, only in new=1"
    assert got["Nulls in required fields"]["notes"].endswith("ghost: Old=col-missing, New=col-missing")
    assert got["Format: email (email_format)"]["status"] == "WARN"   # not-an-email + empty
    assert got["Format: email (email_format)"]["notes"] == "violations=2"
    assert got["Format: balance (non_negative_number)"]["notes"] == "violations=1"  # 'abc'
