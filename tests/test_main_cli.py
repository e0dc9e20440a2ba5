"""End-to-end tests of the spark-submit CLI (main.py): the reference's
batch-validation entry point (src/validate.py E1) and the engine's
generate → apply → reconcile lifecycle, both driven through the same
argument surface a cluster user invokes."""

from __future__ import annotations

import glob
import json
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import main as cli  # noqa: E402

REF = "/root/reference"


def _run(argv: list[str]) -> int:
    args = cli.build_parser().parse_args(argv)
    return args.fn(args)


def _read_csv_dir(path: str) -> pd.DataFrame:
    files = glob.glob(os.path.join(path, "*.csv"))
    assert files, f"no csv output in {path}"
    return pd.concat([pd.read_csv(f, dtype=str) for f in files], ignore_index=True)


@pytest.mark.skipif(
    not os.path.exists(f"{REF}/sample_data/old_customers.csv"),
    reason="reference sample data not present",
)
def test_validate_cli_reference_goldens(spark, tmp_path):
    """main.py validate over the reference's own sample data reproduces its
    committed proof artifacts (output/mismatches.csv: 48 rows; counts
    1000/5/995 vs 998/3/995; empty membership/dup artifacts)."""
    out = str(tmp_path / "proofs")
    rc = _run(
        [
            "validate",
            "--old", f"{REF}/sample_data/old_customers.csv",
            "--new", f"{REF}/sample_data/new_customers.csv",
            "--pk", "customer_id",
            "--out", out,
            "--required", "email",
            "--compare", "name", "email", "dob", "balance", "status",
            "--allow-deleted", "C100105", "C100521", "C100683", "C100690", "C100717",
            "--allow-added", "NEW0", "NEW1", "NEW2",
            "--rekey-attr", "email",
            "--verification", f"{REF}/verification.json",
            "--format-rules", "email=email_format", "dob=date_format",
            "balance=non_negative_number",
            "--html",
            "--profile",
        ]
    )
    # row-count check FAILs in the reference report? No: adjusted counts
    # match (995 == 995), all checks pass on the golden sample.
    assert rc == 0

    counts = _read_csv_dir(os.path.join(out, "row_counts"))
    by_ds = {r["dataset"]: r for _, r in counts.iterrows()}
    assert (by_ds["OLD"]["raw_count"], by_ds["OLD"]["adjusted_count"]) == ("1000", "995")
    assert (by_ds["NEW"]["raw_count"], by_ds["NEW"]["adjusted_count"]) == ("998", "995")

    mism = _read_csv_dir(os.path.join(out, "mismatches"))
    assert len(mism) == 48
    golden = pd.read_csv(f"{REF}/output/mismatches.csv", dtype=str)
    got = set(map(tuple, mism[["customer_id", "column", "old_value", "new_value"]].values))
    want = set(map(tuple, golden[["customer_id", "column", "old_value", "new_value"]].values))
    assert got == want

    # sign-off overlay annotates the artifact (no golden finding is among
    # the verification.json pairs, so all rows stay unverified)
    assert "verified" in mism.columns
    assert (mism["verified"] == "false").all()

    # --profile: one row per column per side, raw row counts
    prof = _read_csv_dir(os.path.join(out, "profile_new"))
    assert set(prof["column"]) == {
        "customer_id", "name", "email", "dob", "balance", "status",
    }
    assert (prof["n_rows"] == "998").all()
    assert (_read_csv_dir(os.path.join(out, "profile_old"))["n_rows"] == "1000").all()

    for empty in [
        "only_in_old", "only_in_new", "duplicates_old", "duplicates_new",
        "missing_in_new", "extra_in_new", "format_violations",
    ]:
        assert len(_read_csv_dir(os.path.join(out, empty))) == 0

    checks = _read_csv_dir(os.path.join(out, "checks"))
    by_check = {r["check"]: r for _, r in checks.iterrows()}
    assert by_check["Value mismatches"]["status"] == "WARN"
    assert by_check["Format: email (email_format)"]["status"] == "PASS"
    assert by_check["Row count match"]["verified"] == "true"
    assert by_check["Row count match"]["verified_by"] == "Mohan"

    # --html writes the reference-shaped static report over the same run
    # (sample-report.html pills + check table + mismatch slice)
    page = open(os.path.join(out, "report.html")).read()
    assert "<h1>Data Migration Validation Report</h1>" in page
    assert 'Primary key: <strong>customer_id</strong>' in page
    assert "OLD total: <strong>1000</strong>" in page
    assert "NEW total: <strong>998</strong>" in page
    assert "Mismatches: <strong>48</strong>" in page
    assert "Mismatched Cells (48 of 48)" in page
    assert '<span class="warn">WARN</span>' in page  # Value mismatches pill
    assert page.count('<span class="fail">') == 0     # golden run has no FAILs
    # a golden mismatch row renders, sign-off column present (verification
    # overlay was supplied)
    golden_row = golden.iloc[0]
    assert f"<td>{golden_row['customer_id']}</td>" in page
    assert "<th>Sign-off</th>" in page
    assert "&#10003; Mohan" in page  # signed-off check renders its reviewer


def test_generate_apply_reconcile_roundtrip(spark, tmp_path):
    """generate → apply → reconcile: the applied table's final state is
    identical to the closed-form LWW oracle (exit 0 from reconcile)."""
    from data_migration_validation_spark.sources.binlog import (
        BinlogConfig,
        expected_final_state,
    )

    log = str(tmp_path / "log")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    exp = str(tmp_path / "expected")

    assert _run(["generate", "--out", log, "--keys", "400", "--events-per-epoch", "600"]) == 0

    cfg = BinlogConfig(n_keys=400, max_versions=4, events_per_epoch=600, seed=42)
    spark.read.parquet(log)  # exists
    expected_final_state(spark, cfg, log=spark.read.parquet(log)).select(
        "url", "warc_ts", "seq", "html", "lang", "fetch_status"
    ).write.mode("overwrite").parquet(exp)

    assert _run(["apply", "--log", log, "--table", table, "--checkpoint", ckpt, "--buckets", "8"]) == 0

    # reconcile compares url/warc_ts/seq/lang/fetch_status/html/text —
    # expected lacks `text`; restrict via the engine's column intersection
    # (expected's columns drive the comparison).
    rc = _run(
        ["reconcile", "--table", table, "--checkpoint", ckpt, "--expected", exp, "--key", "url"]
    )
    assert rc == 0

    # resume: re-applying the same log is a pure no-op (idempotent epochs)
    assert _run(["apply", "--log", log, "--table", table, "--checkpoint", ckpt, "--buckets", "8"]) == 0
    rc2 = _run(
        ["reconcile", "--table", table, "--checkpoint", ckpt, "--expected", exp, "--key", "url"]
    )
    assert rc2 == 0


def test_apply_cli_group_size(spark, tmp_path):
    """apply --group-size: the grouped replay reconciles against the same
    closed-form oracle as the sequential one, and a sequential resume on
    top of the grouped table is a pure no-op (the group's epochs are all
    recorded in the lake's epoch line)."""
    from data_migration_validation_spark.sources.binlog import (
        BinlogConfig,
        expected_final_state,
    )

    log = str(tmp_path / "log")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    exp = str(tmp_path / "expected")

    assert _run(["generate", "--out", log, "--keys", "400", "--events-per-epoch", "400"]) == 0
    cfg = BinlogConfig(n_keys=400, max_versions=4, events_per_epoch=400, seed=42)
    expected_final_state(spark, cfg, log=spark.read.parquet(log)).select(
        "url", "warc_ts", "seq", "html", "lang", "fetch_status"
    ).write.mode("overwrite").parquet(exp)

    assert _run(
        ["apply", "--log", log, "--table", table, "--checkpoint", ckpt,
         "--buckets", "8", "--group-size", "2"]
    ) == 0
    assert _run(
        ["reconcile", "--table", table, "--checkpoint", ckpt, "--expected", exp, "--key", "url"]
    ) == 0
    # sequential re-apply: every epoch skips against the grouped commits
    assert _run(["apply", "--log", log, "--table", table, "--checkpoint", ckpt]) == 0
    assert _run(
        ["reconcile", "--table", table, "--checkpoint", ckpt, "--expected", exp, "--key", "url"]
    ) == 0


def test_expire_cli(spark, tmp_path):
    """generate → apply → expire: old snapshots removed, table still reads."""
    from data_migration_validation_spark.plans.lake import LakeTable

    log = str(tmp_path / "log")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    assert _run(["generate", "--out", log, "--keys", "200", "--events-per-epoch", "300"]) == 0
    assert _run(["apply", "--log", log, "--table", table, "--checkpoint", ckpt, "--buckets", "8"]) == 0
    lake = LakeTable(table)
    assert len(lake.versions()) > 1
    assert _run(["expire", "--table", table, "--keep-last", "1"]) == 0
    lake2 = LakeTable(table)
    assert lake2.versions() == [lake2.current_version()]
    assert lake2.read(spark).count() > 0


def test_lookup_changes_quarantine_cli(spark, tmp_path, capsys):
    """generate → apply, then the incremental-consumption surface: point
    lookup (file-skipped), change-data-feed since an epoch, dead-letter
    summary, and incremental reconcile — all through the CLI."""
    log = str(tmp_path / "clog")
    table = str(tmp_path / "ctable")
    ckpt = str(tmp_path / "cckpt")

    assert _run(["generate", "--out", log, "--keys", "300", "--events-per-epoch", "400"]) == 0
    assert _run(["apply", "--log", log, "--table", table, "--checkpoint", ckpt, "--buckets", "8"]) == 0
    capsys.readouterr()

    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    eng = CDCApplyEngine(spark, table_path=table, checkpoint_path=ckpt)
    url = eng.read_final().limit(1).collect()[0]["url"]

    assert _run(["lookup", "--table", table, "--key-value", url]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["found"] == 1 and out["rows"][0]["url"] == url
    assert out["files_read"] >= 1

    feed_out = str(tmp_path / "feed")
    assert _run(["changes", "--table", table, "--since-epoch", "0", "--out", feed_out]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sum(out["counts"].values()) > 0
    assert os.path.isdir(feed_out)

    # no malformed events were generated → empty quarantine
    assert _run(["quarantine", "--table", table]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["quarantined"] == 0

    # incremental reconcile against the table's own final state: clean
    exp = str(tmp_path / "cexpected")
    eng.read_final().write.mode("overwrite").parquet(exp)
    rc = _run(
        ["reconcile", "--table", table, "--checkpoint", ckpt, "--expected", exp,
         "--since-epoch", "0"]
    )
    assert rc == 0


def test_apply_audit_cli(spark, tmp_path, capsys):
    """apply --audit: the write-audit-publish gate through the CLI — a
    clean epoch publishes; an epoch with a malformed url is rejected
    (exit 2), leaves the table at the pre-epoch state, and a re-run
    without the bad row completes."""
    from datetime import datetime

    log = str(tmp_path / "alog")
    table = str(tmp_path / "atable")
    ckpt = str(tmp_path / "ackpt")
    schema = (
        "op string, url string, warc_ts timestamp, seq long, "
        "payload struct<html:binary,lang:string>, batch_epoch int"
    )
    rows = [
        ("I", "https://a.example.com/1", datetime(2024, 1, 1), 0, (b"<html><p>a</p></html>", "en"), 0),
        ("I", "https://a.example.com/2", datetime(2024, 1, 1, 1), 1, (b"<html><p>b</p></html>", "de"), 0),
        ("U", "bogus url", datetime(2024, 1, 2), 2, (b"<html><p>c</p></html>", "en"), 1),
    ]
    spark.createDataFrame(rows, schema).write.partitionBy("batch_epoch").parquet(log)

    rc = _run(["apply", "--log", log, "--table", table, "--checkpoint", ckpt,
               "--buckets", "4", "--audit"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 2
    rejected = json.loads(out[-1])
    assert rejected["rejected_epoch"] == 1
    assert rejected["final_rows"] == 2  # epoch 0 published, epoch 1 blocked
    epoch1 = json.loads(out[-2])
    assert epoch1["audit_violations"] == {"bad_url_format": 1}

    # fix the feed (drop the bad row), re-run: resumes and publishes epoch 1
    fixed = [r for r in rows if r[1].startswith("https://")] + [
        ("U", "https://a.example.com/2", datetime(2024, 1, 2, 1), 3, (b"<html><p>d</p></html>", "de"), 1),
    ]
    import shutil

    shutil.rmtree(log)
    spark.createDataFrame(fixed, schema).write.partitionBy("batch_epoch").parquet(log)
    rc = _run(["apply", "--log", log, "--table", table, "--checkpoint", ckpt, "--audit"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert json.loads(out[-1])["final_rows"] == 2


def test_status_cli_is_sparkless(spark, tmp_path, capsys):
    """status: one driver-side JSON covering snapshot, maintenance debt,
    quarantine, and checkpoint totals — and it must NOT start a Spark
    job (it is the command an operator runs against a 100-TB table)."""
    log = str(tmp_path / "stlog")
    table = str(tmp_path / "sttable")
    ckpt = str(tmp_path / "stckpt")
    assert _run(["generate", "--out", log, "--keys", "200", "--events-per-epoch", "300"]) == 0
    assert _run(["apply", "--log", log, "--table", table, "--checkpoint", ckpt, "--buckets", "8"]) == 0
    capsys.readouterr()

    import main as cli_mod

    def _boom(*a, **kw):  # status must never open a SparkSession
        raise AssertionError("status started a SparkSession")

    orig = cli_mod._spark
    cli_mod._spark = _boom
    try:
        assert _run(["status", "--table", table, "--checkpoint", ckpt]) == 0
    finally:
        cli_mod._spark = orig
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    snap = out["snapshot"]
    assert snap["epochs_applied"] >= 1
    assert snap["base_files"] + snap["delta_files"] > 0
    assert snap["bytes"] > 0
    assert snap["staged_versions"] == []
    assert snap["table"]["num_buckets"] == 8
    assert snap["origin_epochs"] == {}  # plain ingest: no tagged commits
    assert out["quarantined_events"] == 0
    ck = out["checkpoint"]
    assert ck["events_applied"] > 0 and ck["lineage_epochs"] >= 1
    assert out["metrics_totals"]["applied_events"] == ck["events_applied"]


def test_redrive_cli_adopts_pinned_novelty(spark, tmp_path, capsys):
    """redrive on a novelty-pinned table must run admission: the CLI
    reads the table's pinned mode and configures the engine to match.
    A filterless redrive would commit content that bypasses the index
    (never fingerprinted), and later admits would re-accept identical
    content forever — so the engine refuses it, and the CLI must
    therefore adopt, not crash."""
    from pyspark.sql import functions as F

    from data_migration_validation_spark.plans.apply import CDCApplyEngine
    from tests.test_novelty import SCHEMA as NSCHEMA, _ev

    path, ckpt = str(tmp_path / "nvrd"), str(tmp_path / "nvrd-ckpt")
    eng = CDCApplyEngine(
        spark, table_path=path, checkpoint_path=ckpt, num_buckets=4,
        compact_every=None, novelty_filter=True, novelty_buckets=2,
        novelty_bloom_bits=1 << 12,
    )
    eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/a", 1, "alpha text")], NSCHEMA), 0
    )
    # dead-letter one event (mangled op), then redrive it via the CLI
    bad = spark.createDataFrame(
        [_ev("I", "u/b", 10, "beta text", 1)], NSCHEMA
    ).withColumn("op", F.lit("IX"))
    assert eng.apply_epoch(bad, 1).quarantined == 1
    rc = _run(
        ["redrive", "--table", path, "--checkpoint", ckpt,
         "--epoch", "5", "--set", "op=regexp_replace(op, 'X$', '')"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["redriven_events"] == 1 and out["still_quarantined"] == 0
    # the redriven content WAS fingerprinted: identical content in a
    # later epoch drops (this also exercises the committed-set bloom
    # refresh — eng's cache predates the CLI engine's fold)
    st6 = eng.apply_epoch(
        spark.createDataFrame([_ev("I", "u/c", 20, "beta text", 6)], NSCHEMA), 6
    )
    assert st6.novelty_dropped == 1

    # status surfaces the novelty-index health sparklessly: the pinned
    # mode, bloom coverage heads, and unfolded index partitions
    assert _run(["status", "--table", path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    nov = out["novelty"]
    assert nov["mode"]["mode"] == "exact"
    assert nov["bloom_buckets"] == 2
    assert nov["bloom_head_max"] >= 5  # the CLI redrive's fold advanced it
    assert nov["index_epoch_partitions"] >= 3


def test_rebuild_blooms_cli(spark, tmp_path, capsys):
    """Bloom-store loss recovery via the CLI, in both pinned modes: the
    command adopts the table's pinned mode/bucket count, and the rebuilt
    blooms claim the committed head (trusted again, per the status
    view). Lost blooms were never a correctness hole (uncovered buckets
    exact-check) — the rebuild restores the cheap pre-pass."""
    import re

    from data_migration_validation_spark.plans.apply import CDCApplyEngine
    from tests.test_novelty import SCHEMA as NSCHEMA, _ev

    for mode, flt in (("exact", True), ("minhash", "minhash")):
        path = str(tmp_path / f"rb-{mode}")
        eng = CDCApplyEngine(
            spark, table_path=path,
            checkpoint_path=str(tmp_path / f"rb-{mode}-c"),
            num_buckets=4, compact_every=None, novelty_filter=flt,
            novelty_buckets=2, novelty_bloom_bits=1 << 12,
        )
        eng.apply_epoch(
            spark.createDataFrame([_ev("I", "u/a", 1, "alpha text")], NSCHEMA), 0
        )
        eng.apply_epoch(
            spark.createDataFrame([_ev("I", "u/b", 10, "beta text", 1)], NSCHEMA), 1
        )
        bdir = os.path.join(path, "_novelty", "blooms")
        for fn in os.listdir(bdir):  # lose the bloom store, keep the pin
            if re.fullmatch(r"fpb\d+", fn):
                os.unlink(os.path.join(bdir, fn))
        rc = _run(["rebuild-blooms", "--table", path,
                   "--bloom-bits", str(1 << 12)])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["mode"] == mode
        assert out["buckets_rebuilt"] == 2 and out["head"] == 1
        assert _run(["status", "--table", path]) == 0
        sout = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert sout["novelty"]["bloom_head_min"] == 1
        # admission still drops known content after the rebuild
        st = eng.apply_epoch(
            spark.createDataFrame([_ev("I", "u/c", 20, "beta text", 2)], NSCHEMA), 2
        )
        assert st.novelty_dropped == 1

    # no novelty index → a clean usage error, not a stack trace
    with pytest.raises(SystemExit, match="no novelty index"):
        _run(["rebuild-blooms", "--table", str(tmp_path / "nope")])


def test_redrive_cli(spark, tmp_path, capsys):
    """redrive CLI: dead-letter a deterministically op-mangled feed, then
    re-admit it with a declarative --set fix as a new epoch; the final
    state must equal the never-corrupted replay and the pending
    quarantine must drain."""
    from tests.test_redrive import _replay_corrupted, _final_rows
    from tests.test_time_travel import _replay

    clean = _replay(spark, tmp_path, "clicleanrd", [0, 1, 2, 3])
    eng = _replay_corrupted(spark, tmp_path, "clird")
    assert eng.read_quarantine(pending_only=True).count() == 3

    # quarantine summary distinguishes total lineage from pending work
    assert _run(["quarantine", "--table", eng.lake.path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["quarantined"] == 3 and out["pending"] == 3

    rc = _run(
        ["redrive", "--table", eng.lake.path, "--checkpoint", eng.ckpt.path,
         "--epoch", "9", "--set", "op=regexp_replace(op, 'X$', '')",
         "--audit", "--audit-inline"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["redriven_events"] == 3 and out["still_quarantined"] == 0
    assert not out["skipped"] and "rejected" not in out
    assert out["source_epochs"] == [0, 1, 2]  # which partitions it covered

    assert eng.read_quarantine(pending_only=True) is None
    assert _final_rows(eng) == _final_rows(clean)

    # lineage kept, pending drained
    assert _run(["quarantine", "--table", eng.lake.path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["quarantined"] == 3 and out["pending"] == 0

    # status surfaces the origin-tagged (redrive) epoch ranges — the
    # numbers a replayer must never reuse for a source slice
    assert _run(["status", "--table", eng.lake.path,
                 "--checkpoint", eng.ckpt.path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["snapshot"]["origin_epochs"] == {"redrive": [[9, 9]]}

    # nothing pending → a second redrive is a skip, not an error
    rc = _run(
        ["redrive", "--table", eng.lake.path, "--checkpoint", eng.ckpt.path,
         "--epoch", "10"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"]

    # malformed --set is a usage error, not a stack trace — and it must
    # fail BEFORE any intent is published
    for bad in ("no-equals-sign", "op=", "=expr"):
        with pytest.raises(SystemExit):
            _run(["redrive", "--table", eng.lake.path, "--checkpoint",
                  eng.ckpt.path, "--epoch", "11", "--set", bad])
    assert eng.redrive_intent(11) is None

    # same for a malformed --source-epochs (trailing comma, semicolons,
    # blanks): a clean usage error, and no intent published
    for bad in ("3,4,", "3;4", "3, "):
        with pytest.raises(SystemExit, match="source-epochs"):
            _run(["redrive", "--table", eng.lake.path, "--checkpoint",
                  eng.ckpt.path, "--epoch", "11", "--source-epochs", bad])
    assert eng.redrive_intent(11) is None

    # a pre-existing intent overrides --source-epochs, and the output
    # says so instead of letting the operator assume their list ran
    eng2 = _replay_corrupted(spark, tmp_path, "clird2")
    with open(eng2._redrive_intent_path(20), "w") as f:
        json.dump({"redrive_epoch": 20, "source_epochs": [0, 1]}, f)
    rc = _run(
        ["redrive", "--table", eng2.lake.path, "--checkpoint", eng2.ckpt.path,
         "--epoch", "20", "--set", "op=regexp_replace(op, 'X$', '')",
         "--source-epochs", "2"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["source_epochs"] == [0, 1]
    assert out["source_epochs_overridden_by_intent"] is True
    # epoch 2's quarantine is still pending — the intent never named it
    pend = eng2.read_quarantine(pending_only=True)
    assert set(r["epoch"] for r in pend.collect()) == {2}
