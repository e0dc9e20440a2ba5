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
        # compact_every=1 folds deltas after nearly every epoch — MAINTENANCE
        # MUST BE INVISIBLE: the model never sees compaction, so any drift it
        # introduces fails the final-state comparison
        "compact_every": st.sampled_from([None, 1]),
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
    rebucket_to=st.sampled_from([None, 2, 8]),
)
def test_engine_matches_lww_model(spark, stream, n_epochs, cfg, crash, rebucket_to):
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
            if rebucket_to is not None and epoch == 0:
                # resize the table mid-replay — another maintenance op the
                # model never sees; later epochs write under the new count
                engine.lake.rebucket(spark, rebucket_to)

        # dead-letter content, not just count: each malformed event lands
        # exactly once with its generation-order reason
        expected_q = set()
        for op, url, ts, seq, *_ in rows:
            if url is None:
                expected_q.add((seq, "null_key"))
            elif ts is None:
                expected_q.add((seq, "null_warc_ts"))
            elif op not in ("I", "U", "D"):
                expected_q.add((seq, "bad_op"))
        q = engine.read_quarantine()
        got_q = (
            set()
            if q is None
            else {(r["seq"], r["_reason"]) for r in q.select("seq", "_reason").collect()}
        )
        assert got_q == expected_q

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
# Group-commit property: the grouped replay (k epochs per shuffle, one
# atomic snapshot per group) against the SAME in-memory LWW model — the
# sequential path's contract must survive commit coalescing over the
# whole input space, including malformed-envelope quarantining and
# idempotent grouped re-runs.


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=stream_st,
    n_epochs=st.integers(min_value=1, max_value=4),
    group_size=st.integers(min_value=2, max_value=4),
    use_pandas_lww=st.booleans(),
    num_buckets=st.sampled_from([1, 4]),
)
def test_grouped_replay_matches_lww_model(
    spark, stream, n_epochs, group_size, use_pandas_lww, num_buckets
):
    rows = _rows(stream, n_epochs)
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    tmp = tempfile.mkdtemp(prefix="prop-group-")
    try:
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            merge_mode="mor",
            use_pandas_lww=use_pandas_lww,
            num_buckets=num_buckets,
        )
        slices = {e: events.where(f"batch_epoch = {e}") for e in range(n_epochs)}
        engine.replay(slices, group_size=group_size)

        # per-epoch quarantine attribution is identical to the sequential
        # contract: each malformed event exactly once, with its reason
        expected_q = set()
        for op, url, ts, seq, *_ in rows:
            if url is None:
                expected_q.add((seq, "null_key"))
            elif ts is None:
                expected_q.add((seq, "null_warc_ts"))
            elif op not in ("I", "U", "D"):
                expected_q.add((seq, "bad_op"))
        q = engine.read_quarantine()
        got_q = (
            set()
            if q is None
            else {(r["seq"], r["_reason"]) for r in q.select("seq", "_reason").collect()}
        )
        assert got_q == expected_q

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

        # grouped re-run of the whole log: pure metadata no-op
        again = engine.replay(slices, group_size=group_size)
        assert all(s.skipped for s in again)
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


# --------------------------------------------------------------------------
# Reconciliation property: cogroup_reconcile (and, absent dup keys,
# snapshot_diff) vs a pure-Python keyed-diff model.
# --------------------------------------------------------------------------

import base64  # noqa: E402

from data_migration_validation_spark.operators.reconcile import (  # noqa: E402
    cogroup_reconcile,
    snapshot_diff,
)

REC_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.LongType(), nullable=False),
        T.StructField("c", T.BinaryType()),
    ]
)

# (key idx, nullable short string incl. "", non-null long, nullable bytes):
# nulls, empty-string-vs-null, and byte-level diffs are all common draws.
rec_row_st = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.one_of(st.none(), st.sampled_from(["x", "y", ""])),
    st.integers(min_value=-2, max_value=2),
    st.one_of(st.none(), st.binary(max_size=3)),
)
rec_table_st = st.lists(rec_row_st, max_size=10)


def _rec_rows(t):
    return [(f"k{k}", a, b, bytes(c) if c is not None else None) for k, a, b, c in t]


def _rec_render(v):
    if v is None:
        return None
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    return str(v)


def _rec_model(old_rows, new_rows):
    """The reference's keyed diff (docs/script.js:318-340 semantics, as
    reborn in operators/reconcile.py): dup keys short-circuit, membership
    deltas, per-column mismatches with both-null treated as equal."""
    out = set()
    for k in {r[0] for r in old_rows} | {r[0] for r in new_rows}:
        o = [r for r in old_rows if r[0] == k]
        n = [r for r in new_rows if r[0] == k]
        if len(o) > 1 or len(n) > 1:
            out.add((k, "", str(len(o)), str(len(n)), "dup_key"))
        elif not o:
            out.add((k, "", None, None, "only_in_new"))
        elif not n:
            out.add((k, "", None, None, "only_in_old"))
        else:
            for i, c in enumerate(("a", "b", "c"), start=1):
                ov, nv = o[0][i], n[0][i]
                if ov is None and nv is None:
                    continue
                if ov is not None and nv is not None and ov == nv:
                    continue
                out.add((k, c, _rec_render(ov), _rec_render(nv), "mismatch"))
    return out


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(old_t=rec_table_st, new_t=rec_table_st)
def test_reconcile_matches_keyed_diff_model(spark, old_t, new_t):
    old_rows, new_rows = _rec_rows(old_t), _rec_rows(new_t)
    old = spark.createDataFrame(old_rows, REC_SCHEMA)
    new = spark.createDataFrame(new_rows, REC_SCHEMA)
    expected = _rec_model(old_rows, new_rows)

    got = {tuple(r) for r in cogroup_reconcile(old, new, key="k").collect()}
    assert got == expected

    # the declarative twin agrees wherever it is defined (it cannot
    # distinguish dup keys from mismatches, so only dup-free examples)
    if not any(kind == "dup_key" for *_, kind in expected):
        got_join = {tuple(r) for r in snapshot_diff(old, new, key="k").collect()}
        assert got_join == expected


# --------------------------------------------------------------------------
# Schema-evolution property: the payload gains a column and widens a type
# at an arbitrary epoch; the final state must equal the model with nulls
# for pre-evolution winners and upcast numerics, in BOTH merge modes.
# --------------------------------------------------------------------------


def _evo_schema(evolved: bool) -> T.StructType:
    payload = [
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
        T.StructField(
            "views", T.LongType() if evolved else T.IntegerType()
        ),
    ]
    if evolved:
        payload.append(T.StructField("author", T.StringType()))
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("seq", T.LongType()),
            T.StructField("payload", T.StructType(payload)),
            T.StructField("batch_epoch", T.LongType()),
        ]
    )


evo_event_st = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["I", "U", "U", "D"]),
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=st.lists(evo_event_st, min_size=4, max_size=20),
    n_epochs=st.integers(min_value=2, max_value=3),
    evolve_at=st.integers(min_value=0, max_value=3),
    merge_mode=st.sampled_from(["mor", "cow"]),
)
def test_schema_evolution_matches_model(spark, stream, n_epochs, evolve_at, merge_mode):
    evolve_at = min(evolve_at, n_epochs)  # n_epochs = never evolves
    rows = []
    for seq, (k, ts_step, op) in enumerate(stream):
        url, ts, epoch = f"u{k}", T0 + timedelta(hours=ts_step), seq % n_epochs
        evolved = epoch >= evolve_at
        if op == "D":
            payload = (None, None, None, None) if evolved else (None, None, None)
            rows.append(("D", url, ts, seq, payload, epoch))
        else:
            html = f"<html><body><p>doc {url} v{seq}</p></body></html>".encode()
            base = (html, f"l{seq % 3}", seq % 5)
            payload = base + (f"A{seq % 2}",) if evolved else base
            rows.append((op, url, ts, seq, payload, epoch))

    tmp = tempfile.mkdtemp(prefix="prop-evo-")
    try:
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            num_buckets=4,
            merge_mode=merge_mode,
            text_extract="expr",
        )
        for epoch in range(n_epochs):
            schema = _evo_schema(epoch >= evolve_at)
            sl = spark.createDataFrame(
                [r for r in rows if r[5] == epoch], schema
            )
            engine.apply_epoch(sl, epoch)

        # model: LWW winner per key; author only exists on post-evolution
        # winners; the registry carries the column once ANY evolved epoch
        # merged (even an empty one — the schema rides the DataFrame)
        winners: dict[str, tuple] = {}
        for op, url, ts, seq, payload, epoch in rows:
            cur = winners.get(url)
            if cur is None or (ts, seq) > (cur[2], cur[3]):
                winners[url] = (op, url, ts, seq, payload, epoch)
        has_author = evolve_at < n_epochs
        expected = set()
        for op, url, ts, seq, payload, epoch in winners.values():
            if op == "D":
                continue
            html, lang, views = payload[0], payload[1], payload[2]
            text = html.decode().split("<p>", 1)[1].split("</p>", 1)[0]
            row = (url, ts, seq, html, lang, views, text)
            if has_author:
                row += (payload[3] if epoch >= evolve_at else None,)
            expected.add(row)

        final = engine.read_final()
        cols = ["url", "warc_ts", "seq", "html", "lang", "views", "text"]
        if has_author:
            cols.append("author")
            assert "author" in final.columns
        else:
            assert final is None or "author" not in final.columns
        got = (
            set()
            if final is None
            else {
                tuple(
                    bytes(v) if isinstance(v, (bytes, bytearray)) else v
                    for v in (r[c] for c in cols)
                )
                for r in final.select(*cols).collect()
            }
        )
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Time-travel + CDF property: read_asof at every epoch equals the model's
# prefix state; read_changes between epoch pairs equals the model diff.
# --------------------------------------------------------------------------


def _prefix_state(rows, upto_epoch):
    """Model live state after replaying epochs <= upto_epoch."""
    winners: dict[str, tuple] = {}
    for op, url, ts, seq, payload, epoch in rows:
        if epoch > upto_epoch:
            continue
        cur = winners.get(url)
        if cur is None or (ts, seq) > (cur[2], cur[3]):
            winners[url] = (op, url, ts, seq, payload)
    out = {}
    for op, url, ts, seq, (html, lang) in winners.values():
        if op == "D":
            continue
        text = html.decode().split("<p>", 1)[1].split("</p>", 1)[0]
        out[url] = (ts, seq, html, lang, text)
    return out


def _model_cdf(rows, from_epoch, to_epoch):
    """Expected read_changes rows: state diff old→new, updates emitting
    both images."""
    old = {} if from_epoch is None else _prefix_state(rows, from_epoch)
    new = _prefix_state(rows, to_epoch)
    out = set()
    for url in old.keys() | new.keys():
        o, n = old.get(url), new.get(url)
        if o is None:
            out.add((url, *n, "insert"))
        elif n is None:
            out.add((url, *o, "delete"))
        elif o != n:
            out.add((url, *o, "update_preimage"))
            out.add((url, *n, "update_postimage"))
    return out


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["I", "U", "U", "D"]),
        ),
        min_size=4,
        max_size=20,
    ),
    n_epochs=st.integers(min_value=2, max_value=3),
    merge_mode=st.sampled_from(["mor", "cow"]),
)
def test_time_travel_and_cdf_match_model(spark, stream, n_epochs, merge_mode):
    rows = []
    for seq, (k, ts_step, op) in enumerate(stream):
        url, ts, epoch = f"u{k}", T0 + timedelta(hours=ts_step), seq % n_epochs
        if op == "D":
            rows.append(("D", url, ts, seq, (None, None), epoch))
        else:
            html = f"<html><body><p>doc {url} v{seq}</p></body></html>".encode()
            rows.append((op, url, ts, seq, (html, f"l{seq % 3}"), epoch))
    events = spark.createDataFrame(rows, EVENT_SCHEMA)

    tmp = tempfile.mkdtemp(prefix="prop-cdf-")
    try:
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            num_buckets=4,
            merge_mode=merge_mode,
            text_extract="expr",
        )
        for epoch in range(n_epochs):
            engine.apply_epoch(events.where(f"batch_epoch = {epoch}"), epoch)

        cols = ["url", "warc_ts", "seq", "html", "lang", "text"]

        def norm(df):
            return {
                tuple(
                    bytes(v) if isinstance(v, (bytes, bytearray)) else v
                    for v in (r[c] for c in df.columns)
                )
                for r in df.collect()
            }

        # time travel: every epoch's as-of state equals the model prefix
        for e in range(n_epochs):
            asof = engine.read_asof(e)
            assert asof is not None
            got = norm(asof.select(*cols))
            expected = {
                (url, *vals) for url, vals in _prefix_state(rows, e).items()
            }
            assert got == expected, f"as-of epoch {e} diverged"

        # CDF: empty range, from-genesis, and an interior range
        last = n_epochs - 1
        for frm in (None, 0, last):
            cdf = engine.read_changes(frm, last)
            assert cdf is not None
            got = norm(cdf.select(*cols, "_change_type"))
            assert got == _model_cdf(rows, frm, last), f"CDF {frm}->{last} diverged"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Debezium round-trip property: render envelopes as the JSON Debezium
# publishes, parse with parse_debezium, compare field-for-field — ops,
# before/after key fallback, base64 binary, millis timestamps, and the
# exact floor-div epoch assignment at LSNs far beyond 2^53.
# --------------------------------------------------------------------------

import json  # noqa: E402

from data_migration_validation_spark.sources.debezium import parse_debezium  # noqa: E402

dbz_event_st = st.tuples(
    st.sampled_from(["c", "u", "r", "d", "x"]),  # x = unmapped op
    st.integers(min_value=0, max_value=3),  # key idx
    st.integers(min_value=-(2**45), max_value=2**45),  # ts_ms
    st.integers(min_value=-(2**62), max_value=2**62),  # lsn beyond 2^53
    st.one_of(st.none(), st.sampled_from(["en", "de"])),  # lang
    st.one_of(st.none(), st.binary(max_size=4)),  # html bytes
    st.booleans(),  # include a before image
)


def _dbz_json(op, key, ts_ms, lsn, lang, html, with_before):
    image = {
        "url": key,
        "lang": lang,
        "html_b64": base64.b64encode(html).decode() if html is not None else None,
    }
    return json.dumps(
        {
            "payload": {
                "before": image if (with_before or op == "d") else None,
                "after": None if op == "d" else image,
                "source": {"ts_ms": ts_ms, "lsn": lsn, "table": "pages"},
                "op": op,
                "ts_ms": ts_ms,
            }
        }
    )


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    events=st.lists(dbz_event_st, min_size=1, max_size=10),
    epoch_size=st.sampled_from([1, 3, 1000]),
    garbage=st.booleans(),
)
def test_debezium_parse_round_trip(spark, events, epoch_size, garbage):
    events = [(op, f"u{k}", ts, lsn, lang, html, wb) for op, k, ts, lsn, lang, html, wb in events]
    values = [(_dbz_json(*e),) for e in events]
    if garbage:
        values.append(("{not json",))  # poison pill: must parse to nulls
    df = spark.createDataFrame(values, "value string")
    parsed = parse_debezium(
        df,
        fields="lang STRING, html_b64 STRING",
        events_per_epoch=epoch_size,
    )
    from pyspark.sql import functions as F

    got = [
        (
            r["op"],
            r["url"],
            r["ts_ms"],
            r["seq"],
            r["lang"],
            bytes(r["html"]) if r["html"] is not None else None,
            r["batch_epoch"],
        )
        for r in parsed.select(
            "op",
            "url",
            F.unix_millis("warc_ts").alias("ts_ms"),
            "seq",
            "payload.lang",
            "payload.html",
            "batch_epoch",
        ).collect()
    ]

    op_map = {"c": "I", "r": "I", "u": "U", "d": "D"}
    expected = []
    for op, key, ts_ms, lsn, lang, html, _wb in events:
        mapped = op_map.get(op)
        # delete envelopes carry a null payload struct; unmapped ops fall
        # through to the after-image (the engine quarantines them on op)
        p_lang, p_html = (None, None) if op == "d" else (lang, html)
        expected.append((mapped, key, ts_ms, lsn, p_lang, p_html, lsn // epoch_size))
    if garbage:
        expected.append((None, None, None, None, None, None, None))

    # order-insensitive: compare as multisets
    assert sorted(got, key=repr) == sorted(expected, key=repr)


# --------------------------------------------------------------------------
# Two-replayer interleaving property: two engines replay the SAME log into
# the SAME table under an arbitrary deterministic interleaving — every
# epoch commits exactly once, and the converged state equals the model.
# (tests/test_concurrency.py covers the true-thread race; this sweeps the
# schedule space deterministically.)
# --------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["I", "U", "U", "D"]),
        ),
        min_size=4,
        max_size=16,
    ),
    n_epochs=st.integers(min_value=1, max_value=3),
    schedule=st.lists(st.sampled_from([0, 1]), min_size=0, max_size=8),
)
def test_two_replayers_interleaved_converge(spark, stream, n_epochs, schedule):
    rows = []
    for seq, (k, ts_step, op) in enumerate(stream):
        url, ts, epoch = f"u{k}", T0 + timedelta(hours=ts_step), seq % n_epochs
        if op == "D":
            rows.append(("D", url, ts, seq, (None, None), epoch))
        else:
            html = f"<html><body><p>doc {url} v{seq}</p></body></html>".encode()
            rows.append((op, url, ts, seq, (html, f"l{seq % 3}"), epoch))
    events = spark.createDataFrame(rows, EVENT_SCHEMA)

    tmp = tempfile.mkdtemp(prefix="prop-twor-")
    try:
        engines = [
            CDCApplyEngine(
                spark,
                table_path=f"{tmp}/table",
                checkpoint_path=f"{tmp}/ckpt-{i}",
                num_buckets=4,
                text_extract="expr",
            )
            for i in (0, 1)
        ]
        # each replayer applies epochs in order; the drawn schedule decides
        # who moves next (exhausted draws round-robin the rest)
        cursors = [0, 0]
        committed_by: dict[int, list[int]] = {e: [] for e in range(n_epochs)}
        turn = list(schedule) + [0, 1] * n_epochs
        for who in turn:
            e = cursors[who]
            if e >= n_epochs:
                who = 1 - who
                e = cursors[who]
                if e >= n_epochs:
                    break
            st_ = engines[who].apply_epoch(events.where(f"batch_epoch = {e}"), e)
            if not st_.skipped:
                committed_by[e].append(who)
            cursors[who] += 1

        assert all(cursors[i] >= n_epochs for i in (0, 1))
        # exactly-once: each epoch committed by exactly one replayer
        assert all(len(v) == 1 for v in committed_by.values()), committed_by

        expected = {
            (url, *vals) for url, vals in _prefix_state(rows, n_epochs - 1).items()
        }
        for eng in engines:
            final = eng.read_final()
            got = (
                set()
                if final is None
                else {
                    tuple(
                        bytes(v) if isinstance(v, (bytes, bytearray)) else v
                        for v in (r[c] for c in ("url", "warc_ts", "seq", "html", "lang", "text"))
                    )
                    for r in final.select("url", "warc_ts", "seq", "html", "lang", "text").collect()
                }
            )
            assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Tombstone-GC property: after a GC at horizon H between two epochs,
# later events at or before H are refused (no resurrection), later events
# after H apply normally — final state equals the model with that
# admission rule.
# --------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["I", "U", "D", "D"]),  # delete-heavy: GC's food
        ),
        min_size=4,
        max_size=20,
    ),
    n_epochs=st.integers(min_value=2, max_value=3),
    gc_after=st.integers(min_value=1, max_value=2),
    horizon_h=st.integers(min_value=0, max_value=5),
)
def test_gc_horizon_matches_admission_model(spark, stream, n_epochs, gc_after, horizon_h):
    gc_after = min(gc_after, n_epochs - 1)  # GC runs after epoch gc_after-1
    horizon = T0 + timedelta(hours=horizon_h)
    rows = []
    for seq, (k, ts_step, op) in enumerate(stream):
        url, ts, epoch = f"u{k}", T0 + timedelta(hours=ts_step), seq % n_epochs
        if op == "D":
            rows.append(("D", url, ts, seq, (None, None), epoch))
        else:
            html = f"<html><body><p>doc {url} v{seq}</p></body></html>".encode()
            rows.append((op, url, ts, seq, (html, f"l{seq % 3}"), epoch))
    events = spark.createDataFrame(rows, EVENT_SCHEMA)

    tmp = tempfile.mkdtemp(prefix="prop-gc-")
    try:
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            num_buckets=4,
            text_extract="expr",
        )
        for epoch in range(n_epochs):
            engine.apply_epoch(events.where(f"batch_epoch = {epoch}"), epoch)
            if epoch == gc_after - 1:
                engine.lake.compact(
                    spark, gc_horizon_ts=horizon.strftime("%Y-%m-%d %H:%M:%S")
                )
                assert engine.lake.gc_horizon() is not None

        # model: pre-GC epochs admit everything; post-GC epochs admit only
        # events strictly after the horizon (at-or-before could resurrect
        # a GC'd deleted key, so the engine contractually refuses them)
        admitted = [
            r
            for r in rows
            if r[5] < gc_after or r[2] > horizon
        ]
        expected = {
            (url, *vals) for url, vals in _prefix_state(admitted, n_epochs - 1).items()
        }
        final = engine.read_final()
        got = (
            set()
            if final is None
            else {
                tuple(
                    bytes(v) if isinstance(v, (bytes, bytearray)) else v
                    for v in (r[c] for c in ("url", "warc_ts", "seq", "html", "lang", "text"))
                )
                for r in final.select("url", "warc_ts", "seq", "html", "lang", "text").collect()
            }
        )
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Write-audit-publish property: a rule audit (classic AND inline modes)
# rejects exactly the epochs the model says it should; the replay stops
# at the first rejection and the table holds exactly the published prefix.
# --------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from data_migration_validation_spark.operators.audit import standard_audit  # noqa: E402


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["I", "U", "U", "D"]),
        ),
        min_size=4,
        max_size=20,
    ),
    n_epochs=st.integers(min_value=1, max_value=3),
    inline=st.booleans(),
)
def test_wap_gate_matches_model(spark, stream, n_epochs, inline):
    # lang cycles l0/l1/l2; the audit only accepts l0/l1, so violations
    # arrive naturally with the draw (seq % 3 == 2 upsert winners)
    rows = []
    for seq, (k, ts_step, op) in enumerate(stream):
        url, ts, epoch = f"u{k}", T0 + timedelta(hours=ts_step), seq % n_epochs
        if op == "D":
            rows.append(("D", url, ts, seq, (None, None), epoch))
        else:
            html = f"<html><body><p>doc {url} v{seq}</p></body></html>".encode()
            rows.append((op, url, ts, seq, (html, f"l{seq % 3}"), epoch))
    events = spark.createDataFrame(rows, EVENT_SCHEMA)

    # model: per-epoch LWW winners; live winners with lang=l2 violate;
    # the first violating epoch is rejected and stops the replay
    rejected_at, violations, published_rows = None, 0, []
    for epoch in range(n_epochs):
        winners: dict[str, tuple] = {}
        for r in rows:
            if r[5] != epoch:
                continue
            cur = winners.get(r[1])
            if cur is None or (r[2], r[3]) > (cur[2], cur[3]):
                winners[r[1]] = r
        bad = sum(
            1 for w in winners.values() if w[0] != "D" and w[4][1] == "l2"
        )
        if bad:
            rejected_at, violations = epoch, bad
            break
        published_rows.extend(r for r in rows if r[5] == epoch)

    tmp = tempfile.mkdtemp(prefix="prop-wap-")
    try:
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            num_buckets=4,
            text_extract="expr",
        )
        audit = standard_audit(
            rules=[("lang_known", F.col("lang").isin("l0", "l1"))],
            inline=inline,
        )
        slices = {
            e: events.where(f"batch_epoch = {e}") for e in range(n_epochs)
        }
        stats = engine.replay(slices, audit=audit)

        if rejected_at is None:
            assert all(not s.rejected for s in stats) and len(stats) == n_epochs
        else:
            assert len(stats) == rejected_at + 1
            last = stats[-1]
            assert last.rejected
            assert last.audit_violations == {"lang_known": violations}

        expected = {
            (url, *vals)
            for url, vals in _prefix_state(published_rows, n_epochs).items()
        }
        final = engine.read_final()
        got = (
            set()
            if final is None
            else {
                tuple(
                    bytes(v) if isinstance(v, (bytes, bytearray)) else v
                    for v in (r[c] for c in ("url", "warc_ts", "seq", "html", "lang", "text"))
                )
                for r in final.select("url", "warc_ts", "seq", "html", "lang", "text").collect()
            }
        )
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Quarantine-redrive property: replay a stream where an arbitrary subset
# of events is op-mangled by a "bad producer" (op -> op||'X', the classic
# unmapped-enum feed bug) alongside genuinely incurable null-key events.
# Mangled events dead-letter; a redrive with the de-mangling fix must
# restore EXACTLY the clean replay's LWW state (late re-admission never
# beats newer state, because LWW orders by (warc_ts, seq), not arrival),
# requeue only the incurables under the redrive epoch, and keep the
# dead-letter table as append-only lineage.
# --------------------------------------------------------------------------

# (key index, ts step, op, mangled-by-producer?)
red_event_st = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["I", "U", "U", "D", "null_key"]),
    st.booleans(),
)


def _red_rows(stream, n_epochs):
    """Returns (corrupted rows, clean rows): identical streams except the
    producer mangle; clean rows still carry the incurable null-key events
    (the model skips them on both sides)."""
    corrupted, clean = [], []
    for seq, (k, ts_step, op, mangled) in enumerate(stream):
        url, ts, epoch = f"u{k}", T0 + timedelta(hours=ts_step), seq % n_epochs
        if op == "null_key":
            row = ("I", None, ts, seq, (b"<p>x</p>", "en"), epoch)
            corrupted.append(row)
            clean.append(row)
            continue
        if op == "D":
            payload = (None, None)
        else:
            body = f"doc {url} v{seq} t{ts_step}"
            payload = (f"<html><body><p>{body}</p></body></html>".encode(),
                       f"l{seq % 3}")
        clean.append((op, url, ts, seq, payload, epoch))
        corrupted.append((op + "X" if mangled else op, url, ts, seq, payload, epoch))
    return corrupted, clean


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    stream=st.lists(red_event_st, min_size=4, max_size=20),
    n_epochs=st.integers(min_value=1, max_value=3),
)
def test_redrive_matches_clean_replay_model(spark, stream, n_epochs):
    corrupted, clean = _red_rows(stream, n_epochs)
    n_mangled = sum(1 for r in corrupted if r[0].endswith("X"))
    incurable_seqs = {r[3] for r in corrupted if r[1] is None}

    tmp = tempfile.mkdtemp(prefix="prop-redrive-")
    try:
        engine = CDCApplyEngine(
            spark,
            table_path=f"{tmp}/table",
            checkpoint_path=f"{tmp}/ckpt",
            num_buckets=4,
        )
        events = spark.createDataFrame(corrupted, EVENT_SCHEMA)
        for epoch in range(n_epochs):
            engine.apply_epoch(events.where(f"batch_epoch = {epoch}"), epoch)

        from pyspark.sql import functions as F

        st_rd = engine.redrive_quarantine(
            n_epochs,
            fix=lambda df: df.withColumn("op", F.regexp_replace("op", "X$", "")),
        )
        if n_mangled == 0 and not incurable_seqs:
            assert st_rd.skipped
        else:
            assert not st_rd.skipped and not st_rd.rejected
            assert st_rd.events_seen == n_mangled
            assert st_rd.quarantined == len(incurable_seqs)

        final = engine.read_final()
        got = (
            set()
            if final is None
            else {
                (r["url"], r["warc_ts"], r["seq"], r["lang"], r["text"])
                for r in final.select("url", "warc_ts", "seq", "lang", "text").collect()
            }
        )
        expect = {
            (url, ts, seq, lang, text)
            for (url, ts, seq, html, lang, text) in _model_final(clean)
        }
        assert got == expect

        # only the incurables stay pending, requeued under the redrive epoch
        pend = engine.read_quarantine(pending_only=True)
        if incurable_seqs:
            rows = pend.select("seq", "epoch", "_reason").collect()
            assert {r["seq"] for r in rows} == incurable_seqs
            assert {r["epoch"] for r in rows} == {n_epochs}
            assert {r["_reason"] for r in rows} == {"null_key"}
        else:
            assert pend is None

        # append-only lineage: one row per mangle + two per incurable
        q = engine.read_quarantine()
        total = 0 if q is None else q.count()
        assert total == n_mangled + 2 * len(incurable_seqs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
