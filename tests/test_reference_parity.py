"""Golden-output parity: run the validation operator library over the
reference's own sample data and assert the exact findings its committed
proof artifacts record (SURVEY.md §5 — the reference's test strategy is
golden artifacts; this makes it executable).

Reference inputs:  /root/reference/sample_data/{old,new}_customers.csv
Golden outputs:    /root/reference/output/*.csv
Expected findings: 48 cell mismatches (name 14, email 12, balance 15,
status 7), 5 allowlisted deletions, 3 allowlisted additions, 0 dups,
0 nulls, 0 unexpected membership deltas, 0 rekeys."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from data_migration_validation_spark.operators.validation import (
    ValidationConfig,
    cell_mismatches,
    check_summary,
    duplicate_key_count,
    duplicate_rows,
    format_violations,
    normalize_key,
    null_summary,
    only_in_new,
    only_in_old,
    possible_rekeys,
    proof,
    row_counts,
    schema_comparison,
)
from data_migration_validation_spark.sources.csv_source import read_csv_all_string

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/sample_data/old_customers.csv"),
    reason="reference sample data not present",
)

CFG = ValidationConfig(
    primary_key="customer_id",
    required_fields=["email"],
    compare_columns=["name", "email", "dob", "balance", "status"],
    allowed_deletions=frozenset({"C100105", "C100521", "C100683", "C100690", "C100717"}),
    allowed_additions=frozenset({"NEW0", "NEW1", "NEW2"}),
)


@pytest.fixture(scope="module")
def tables(spark):
    old = normalize_key(read_csv_all_string(spark, f"{REF}/sample_data/old_customers.csv"), CFG.primary_key)
    new = normalize_key(read_csv_all_string(spark, f"{REF}/sample_data/new_customers.csv"), CFG.primary_key)
    return old.cache(), new.cache()


def test_row_counts_golden(spark, tables):
    old, new = tables
    got = {r["dataset"]: r for r in row_counts(old, new, CFG).collect()}
    golden = pd.read_csv(f"{REF}/output/row_counts.csv")
    for _, g in golden.iterrows():
        r = got[g["dataset"]]
        assert r["raw_count"] == g["raw_count"]
        assert r["allowlisted_ids"] == g["allowlisted_ids"]
        assert r["adjusted_count"] == g["adjusted_count"]


def test_duplicates_golden(tables):
    old, new = tables
    assert duplicate_key_count(old, CFG.primary_key) == 0
    assert duplicate_key_count(new, CFG.primary_key) == 0
    assert duplicate_rows(old, CFG.primary_key).count() == 0
    assert duplicate_rows(new, CFG.primary_key).count() == 0


def test_nulls_golden(spark, tables):
    old, new = tables
    rows = {r["field"]: r for r in null_summary(old, new, CFG).collect()}
    assert rows["email"]["old_nulls"] == "0"
    assert rows["email"]["new_nulls"] == "0"


def test_membership_deltas_golden(tables):
    old, new = tables
    assert only_in_old(old, new, CFG).count() == 0  # 5 deletions all allowlisted
    assert only_in_new(old, new, CFG).count() == 0  # 3 additions all allowlisted
    # without allowlists the deltas reappear
    bare = ValidationConfig(primary_key="customer_id")
    assert only_in_old(old, new, bare).count() == 5
    assert only_in_new(old, new, bare).count() == 3


def test_cell_mismatches_golden(tables):
    old, new = tables
    got = cell_mismatches(old, new, CFG).toPandas()
    golden = pd.read_csv(f"{REF}/output/mismatches.csv", dtype=str)
    assert len(got) == 48
    per_col = got["column"].value_counts().to_dict()
    assert per_col == {"balance": 15, "name": 14, "email": 12, "status": 7}
    key = ["customer_id", "column", "old_value", "new_value"]
    got_set = set(map(tuple, got[key].astype(str).values))
    golden_set = set(map(tuple, golden[key].astype(str).values))
    assert got_set == golden_set


def test_schema_comparison_golden(tables):
    old, new = tables
    got = schema_comparison(old, new).toPandas()
    golden = pd.read_csv(f"{REF}/output/schema_comparison.csv")
    assert list(got["column"]) == sorted(golden["column"])
    assert got["present_in_old"].all() and got["present_in_new"].all()


def test_rekeys_golden(tables):
    old, new = tables
    assert possible_rekeys(old, new, CFG, attr="email").count() == 0


def test_format_validators_on_golden_data(tables):
    old, _ = tables
    v = format_violations(
        old,
        CFG.primary_key,
        {"email": "email_format", "dob": "date_format", "balance": "non_negative_number"},
    )
    assert v.count() == 0  # sample data is format-clean


def test_check_summary_golden(tables):
    old, new = tables
    got = {r["check"]: r for r in check_summary(
        old, new, CFG,
        format_rules={"email": "email_format", "dob": "date_format",
                      "balance": "non_negative_number"},
    ).collect()}
    rows = {k: r["status"] for k, r in got.items()}
    assert rows == {
        "Row count match": "PASS",
        "Primary key duplicates": "PASS",
        "Nulls in required fields": "PASS",
        "Missing/extra keys": "PASS",
        "Value mismatches": "WARN",  # the 48 seeded mismatches
        "Format: email (email_format)": "PASS",
        "Format: dob (date_format)": "PASS",
        "Format: balance (non_negative_number)": "PASS",
    }
    assert got["Value mismatches"]["notes"] == "count=48"


def test_signoff_overlay_reproduces_verification_json(spark, tables):
    """The acceptance workflow end-to-end: load the reference's own
    verification.json, annotate findings and checks with it
    (src/validate.py:21-32 semantics)."""
    from data_migration_validation_spark.operators.validation import (
        annotate_check_signoff,
        apply_signoff,
        load_verification,
    )

    old, new = tables
    pairs, checks = load_verification(spark, f"{REF}/verification.json", CFG.primary_key)
    # the json signs off (C100123,email) and (C100456,name)
    assert pairs is not None and sorted(tuple(r) for r in pairs.collect()) == [
        ("C100123", "email"), ("C100456", "name"),
    ]
    findings = apply_signoff(cell_mismatches(old, new, CFG), pairs, CFG.primary_key)
    # neither signed-off pair is among the 48 actual findings on the
    # sample data, so the overlay marks nothing verified here...
    assert findings.where("verified").count() == 0
    assert findings.count() == 48
    # ...but a sign-off naming a real finding flips exactly that row
    live = spark.createDataFrame([("C100033", "name")], "customer_id string, _ver_col string")
    annotated = apply_signoff(cell_mismatches(old, new, CFG), live, CFG.primary_key)
    ver = annotated.where("verified").collect()
    assert [(r["customer_id"], r["column"]) for r in ver] == [("C100033", "name")]

    summary = annotate_check_signoff(check_summary(old, new, CFG), checks)
    by_check = {r["check"]: r for r in summary.collect()}
    for name in ["Row count match", "Primary key duplicates", "Nulls in required fields"]:
        assert by_check[name]["verified"] is True
        assert by_check[name]["verified_by"] == "Mohan"
    assert by_check["Missing/extra keys"]["verified"] is False


def test_proof_cap(tables):
    old, _ = tables
    assert proof(old, "customer_id", limit=10).count() == 10
