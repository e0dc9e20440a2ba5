"""Debezium envelope connector: JSON change envelopes must normalize to
the engine envelope (op map, before/after key fallback, ts_ms/lsn →
warc_ts/seq, base64 → binary payload), feed the apply engine end-to-end,
and never throw on poison pills — malformed JSON parses to a null key
that the quarantine dead-letters."""

from __future__ import annotations

import base64
import json

from pyspark.sql import functions as F

from data_migration_validation_spark.plans.apply import CDCApplyEngine
from data_migration_validation_spark.sources.debezium import parse_debezium


def _env(op, url, ts_ms, lsn, lang=None, html=None, text=None):
    img = None
    if url is not None:
        img = {"url": url, "lang": lang, "text": text}
        if html is not None:
            img["html_b64"] = base64.b64encode(html).decode()
    payload = {
        "before": img if op == "d" else None,
        "after": None if op == "d" else img,
        "source": {"ts_ms": ts_ms, "lsn": lsn, "table": "pages"},
        "op": op,
        "ts_ms": ts_ms,
    }
    return json.dumps({"payload": payload})


FIELDS = "lang STRING, text STRING, html_b64 STRING"


def test_parse_normalizes_envelope(spark):
    html = b"<html><body><p>hello page</p></body></html>"
    rows = [
        (_env("c", "https://a/1", 1_700_000_000_000, 10, "en", html, "hello page"),),
        (_env("u", "https://a/1", 1_700_000_001_000, 11, "en", html, "hello page"),),
        (_env("r", "https://a/2", 1_700_000_002_000, 12, "de", html, "snapshot read"),),
        (_env("d", "https://a/2", 1_700_000_003_000, 13),),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_debezium(df, fields=FIELDS, events_per_epoch=12).orderBy("seq")
    got = out.collect()
    assert [r["op"] for r in got] == ["I", "U", "I", "D"]
    assert got[3]["url"] == "https://a/2"  # delete key from before-image
    assert got[0]["payload"]["html"] == html  # base64 → binary, suffix dropped
    assert got[3]["payload"] is None
    assert [r["seq"] for r in got] == [10, 11, 12, 13]
    assert str(got[0]["warc_ts"]) == "2023-11-14 22:13:20"
    assert [r["batch_epoch"] for r in got] == [0, 0, 1, 1]


def test_poison_pills_quarantine_not_crash(spark, tmp_path):
    html = b"<html><body><p>x y z</p></body></html>"
    rows = [
        (_env("c", "https://p/1", 1_700_000_000_000, 1, "en", html, "x y z"),),
        ("{not json at all",),
        ('{"payload": {"op": "u"}}',),  # no images → null key
        (_env("c", "https://p/2", 1_700_000_000_500, 2, "en", html, "x y z"),),
    ]
    events = parse_debezium(
        spark.createDataFrame(rows, "value string"), fields=FIELDS
    ).withColumn("batch_epoch", F.lit(0))
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "dbz-t"),
        checkpoint_path=str(tmp_path / "dbz-c"),
        num_buckets=4,
    )
    st = eng.apply_epoch(events, 0)
    assert st.events_seen == 2 and st.quarantined == 2
    final = eng.read_final()
    assert sorted(r["url"] for r in final.collect()) == ["https://p/1", "https://p/2"]
    # extracted text on the applied rows came through the binary payload
    assert {r["text"] for r in final.collect()} == {"x y z"}
    assert eng.read_quarantine().count() == 2


def test_envelope_parse_is_expression_only(spark):
    df = spark.createDataFrame([(_env("c", "https://a/1", 1, 1, "en"),)], "value string")
    plan = parse_debezium(df, fields=FIELDS)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_batch_epoch_exact_above_2_53_and_negative(spark):
    """Epoch assignment must be exact long floor-division. Double
    division is inexact above 2^53 (an LSN at an epoch boundary can land
    in the neighbouring epoch) and cast('long') truncates toward zero for
    negative seq instead of flooring."""
    from data_migration_validation_spark.sources.debezium import _floor_div_long

    n = 1000
    # 2^60 + 1: as a double this rounds to 2^60 exactly, so double
    # division assigns the boundary event to the WRONG epoch
    big_boundary = (1 << 60) + 1
    cases = [
        (big_boundary, (big_boundary - ((big_boundary % n))) // n),
        ((1 << 60), (1 << 60) // n),
        ((1 << 53) + 111, ((1 << 53) + 111) // n),
        (-1, -1),        # floor(-1/1000) = -1, NOT 0 (truncation)
        (-1000, -1),
        (-1001, -2),
        (0, 0),
        (999, 0),
        (1000, 1),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "seq long")
    got = [
        r["e"]
        for r in df.select(_floor_div_long(F.col("seq"), n).alias("e"))
        .orderBy("seq")
        .collect()
    ]
    want = [e for _, e in sorted(cases)]
    assert got == want
