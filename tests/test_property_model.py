"""Model-based property test of the CDC apply engine.

Hypothesis generates arbitrary small change streams — random key reuse,
timestamp ties broken by seq, out-of-order and cross-epoch disorder,
tombstones, malformed envelopes, empty epochs — plus a random engine
configuration (merge mode, LWW path, bucket count, extraction path).
The stream is replayed through :class:`CDCApplyEngine` and the final
table is compared row-for-row against an INDEPENDENT ~15-line in-memory
last-writer-wins model (max (warc_ts, seq) per key; winner op='D' means
absent; malformed events excluded). This is the reference's final-state
equality contract (`/root/reference/src/validate.py` pk match + field
diff, reborn per SURVEY.md §5) checked over the whole input space
instead of one seeded golden stream.

Deterministic on purpose: ``derandomize=True`` — the suite must stay
green run-to-run; widen ``max_examples`` locally to explore.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pyspark.sql import types as T  # noqa: E402

from data_migration_validation_spark.plans.apply import CDCApplyEngine  # noqa: E402

T0 = datetime(2024, 1, 1)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("html", T.BinaryType()),
                    T.StructField("lang", T.StringType()),
                ]
            ),
        ),
        T.StructField("batch_epoch", T.LongType()),
    ]
)

# One generated event: (key index, timestamp step, op) where op is a CDC
# op or one of three malformed-envelope kinds the quarantine must catch.
event_st = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["I", "U", "U", "D", "null_key", "null_ts", "bad_op"]),
)

stream_st = st.lists(event_st, min_size=4, max_size=24)

config_st = st.fixed_dictionaries(
    {
        "merge_mode": st.sampled_from(["mor", "cow"]),
        "use_pandas_lww": st.booleans(),
        "num_buckets": st.sampled_from([1, 4]),
        "text_extract": st.sampled_from(["arrow", "expr"]),
    }
)


def _rows(stream, n_epochs):
    """Materialize the generated stream as engine envelope rows.

    seq is the list index (globally unique, so (warc_ts, seq) is a total
    order); epochs round-robin so disorder crosses epoch boundaries."""
    rows = []
    for seq, (k, ts_step, op) in enumerate(stream):
        url = f"u{k}"
        ts = T0 + timedelta(hours=ts_step)
        if op == "null_key":
            rows.append(("I", None, ts, seq, (b"<p>x</p>", "en"), seq % n_epochs))
        elif op == "null_ts":
            rows.append(("I", url, None, seq, (b"<p>x</p>", "en"), seq % n_epochs))
        elif op == "bad_op":
            rows.append(("Z", url, ts, seq, (b"<p>x</p>", "en"), seq % n_epochs))
        elif op == "D":
            rows.append(("D", url, ts, seq, (None, None), seq % n_epochs))
        else:
            body = f"doc {url} v{seq} t{ts_step}"
            html = f"<html><body><p>{body}</p></body></html>".encode()
            rows.append((op, url, ts, seq, (html, f"l{seq % 3}"), seq % n_epochs))
    return rows


def _model_final(rows):
    """The independent oracle: pure-Python LWW over valid events.

    Expected text is re-derived from what the generator embedded (the
    single <p> body), not by calling the engine's extractor."""
    winners: dict[str, tuple] = {}
    for op, url, ts, seq, payload, _ in rows:
        if op not in ("I", "U", "D") or url is None or ts is None:
            continue  # malformed: the engine must quarantine these
        cur = winners.get(url)
        if cur is None or (ts, seq) > (cur[0], cur[1]):
            winners[url] = (ts, seq, op, payload)
    out = set()
    for url, (ts, seq, op, (html, lang)) in winners.items():
        if op == "D":
            continue
        text = html.decode().split("<p>", 1)[1].split("</p>", 1)[0]
        out.add((url, ts, seq, html, lang, text))
    return out


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=stream_st,
    n_epochs=st.integers(min_value=1, max_value=3),
    cfg=config_st,
    crash=st.booleans(),
)
def test_engine_matches_lww_model(spark, stream, n_epochs, cfg, crash):
    rows = _rows(stream, n_epochs)
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    tmp = tempfile.mkdtemp(prefix="prop-model-")
    try:
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            **cfg,
        )
        for epoch in range(n_epochs):
            sl = events.where(f"batch_epoch = {epoch}")
            if crash and epoch == 0:
                # crash between commit and checkpoint; the re-offer below
                # must hit the lake's idempotency guard, not double-apply
                with pytest.raises(RuntimeError, match="injected crash"):
                    engine.apply_epoch(sl, 0, crash_after_commit=True)
            engine.apply_epoch(sl, epoch)

        n_malformed = sum(
            1 for op, url, ts, *_ in rows if op not in ("I", "U", "D") or url is None or ts is None
        )
        q = engine.read_quarantine()
        assert (0 if q is None else q.count()) == n_malformed

        final = engine.read_final()
        got = (
            set()
            if final is None
            else {
                (r["url"], r["warc_ts"], r["seq"], bytes(r["html"]) if r["html"] is not None else None, r["lang"], r["text"])
                for r in final.select("url", "warc_ts", "seq", "html", "lang", "text").collect()
            }
        )
        assert got == _model_final(rows)

        # exactly-once: re-offering an applied epoch is a metadata no-op
        again = engine.apply_epoch(events.where("batch_epoch = 0"), 0)
        assert again.skipped
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Novelty-filter property: engine with novelty_filter="exact" vs a
# sequential seen-set model.
# --------------------------------------------------------------------------

# (key index, ts step, op, content id): a tiny content alphabet makes
# cross-key and cross-epoch text collisions — the cases novelty gates —
# the common path, not the rare one.
nov_event_st = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["I", "U", "U", "D"]),
    st.integers(min_value=0, max_value=3),
)


def _nov_rows(stream, n_epochs):
    rows = []
    for seq, (k, ts_step, op, cid) in enumerate(stream):
        url = f"u{k}"
        ts = T0 + timedelta(hours=ts_step)
        if op == "D":
            rows.append(("D", url, ts, seq, (None, None), seq % n_epochs))
        else:
            html = f"<html><body><p>content {cid}</p></body></html>".encode()
            rows.append((op, url, ts, seq, (html, f"l{seq % 3}"), seq % n_epochs))
    return rows


def _novelty_model_final(rows, n_epochs):
    """Sequential oracle for plans/novelty.py admit() semantics: per
    epoch, LWW winners; upsert winners in (warc_ts, seq, key) order are
    admitted iff their TEXT was never admitted before (seen-ever, in-epoch
    dups collapse to the first); deletes always pass through. The final
    table is LWW over the admitted rows."""
    seen: set[str] = set()
    admitted: list[tuple] = []
    for epoch in range(n_epochs):
        winners: dict[str, tuple] = {}
        for op, url, ts, seq, payload, ep in rows:
            if ep != epoch:
                continue
            cur = winners.get(url)
            if cur is None or (ts, seq) > (cur[2], cur[3]):
                winners[url] = (op, url, ts, seq, payload)
        ups = sorted(
            (w for w in winners.values() if w[0] != "D"),
            key=lambda w: (w[2], w[3], w[1]),
        )
        for op, url, ts, seq, (html, lang) in ups:
            text = html.decode().split("<p>", 1)[1].split("</p>", 1)[0]
            if text not in seen:
                seen.add(text)
                admitted.append((op, url, ts, seq, html, lang, text))
        admitted.extend(
            (op, url, ts, seq, None, None, None)
            for op, url, ts, seq, _ in winners.values()
            if op == "D"
        )
    final: dict[str, tuple] = {}
    for row in admitted:
        cur = final.get(row[1])
        if cur is None or (row[2], row[3]) > (cur[2], cur[3]):
            final[row[1]] = row
    return {
        (url, ts, seq, html, lang, text)
        for op, url, ts, seq, html, lang, text in final.values()
        if op != "D"
    }


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=st.lists(nov_event_st, min_size=4, max_size=20),
    n_epochs=st.integers(min_value=1, max_value=3),
    text_extract=st.sampled_from(["arrow", "expr"]),
)
def test_novelty_filter_matches_seen_set_model(spark, stream, n_epochs, text_extract):
    rows = _nov_rows(stream, n_epochs)
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    tmp = tempfile.mkdtemp(prefix="prop-novelty-")
    try:
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            num_buckets=4,
            novelty_filter="exact",
            novelty_buckets=4,
            text_extract=text_extract,
        )
        for epoch in range(n_epochs):
            engine.apply_epoch(events.where(f"batch_epoch = {epoch}"), epoch)
        final = engine.read_final()
        got = (
            set()
            if final is None
            else {
                (
                    r["url"],
                    r["warc_ts"],
                    r["seq"],
                    bytes(r["html"]) if r["html"] is not None else None,
                    r["lang"],
                    r["text"],
                )
                for r in final.select("url", "warc_ts", "seq", "html", "lang", "text").collect()
            }
        )
        assert got == _novelty_model_final(rows, n_epochs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
