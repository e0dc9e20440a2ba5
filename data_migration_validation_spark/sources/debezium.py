"""Debezium-style CDC envelope parser — the connector half of a real
binlog tail: Kafka (or file) rows carrying JSON change envelopes in the
shape Debezium publishes for MySQL/Postgres WAL events

    {"payload": {"before": {..}|null, "after": {..}|null,
                 "source": {"ts_ms": .., "lsn": .., "table": ".."},
                 "op": "c"|"u"|"r"|"d", "ts_ms": ..}}

normalized to this engine's event envelope (op I/U/D, key, warc_ts, seq,
payload struct, batch_epoch) so ``CDCApplyEngine.apply_epoch`` /
``stream_apply`` consume the feed directly.

Design:

* **expression-only** — one ``from_json`` with an explicit DDL schema
  (never schema inference, which would scan the stream twice and race
  evolution), then pure Column maps. Whole-stage codegen end to end; no
  Python in the path.
* op map: ``c``/``r`` (create / snapshot-read) → I, ``u`` → U, ``d`` → D.
* key comes from ``after`` with a ``before`` fallback — delete envelopes
  carry only the before-image.
* event time = ``source.ts_ms`` (millis), sequence = ``source.lsn`` —
  the (warc_ts, seq) LWW ordering downstream is exactly Debezium's
  (commit time, log position).
* fields named ``*_b64`` are base64-encoded binary (JSON cannot carry
  raw bytes); they decode to ``binary`` columns with the suffix dropped
  — e.g. ``html_b64`` → ``payload.html``.
* malformed JSON / missing key parse to a null key, which the apply
  engine's quarantine routes to the dead-letter table with a reason —
  the connector never throws on bad input (poison-pill safety).

Reference parity: the reference validates OLD/NEW table snapshots
(/root/reference/src/validate.py:58-66 reads two CSVs); this source is
the engine's generalization of "NEW arrives as a change stream".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def envelope_ddl(fields: str, key: str = "url") -> str:
    """DDL schema for ``from_json`` given the row-image fields (a DDL
    fragment like ``"lang STRING, text STRING, html_b64 STRING"``)."""
    row = f"{key}: STRING, " + ", ".join(
        f"`{f.strip().split()[0]}`: {' '.join(f.strip().split()[1:])}"
        for f in fields.split(",")
        if f.strip()
    )
    return (
        f"payload STRUCT<before: STRUCT<{row}>, after: STRUCT<{row}>, "
        "source: STRUCT<ts_ms: BIGINT, lsn: BIGINT, `table`: STRING>, "
        "op: STRING, ts_ms: BIGINT>"
    )


def _floor_div_long(col: Column, divisor: int) -> Column:
    """Floor division in pure LONG arithmetic — ``(col - pmod(col, d)) / d``
    computed without ever touching a double. Spark's ``/`` is double
    division (inexact above 2^53) and ``DIV``/cast truncate toward zero;
    pmod is always non-negative, so subtracting it then dividing by the
    (positive) divisor is an exact multiple and a true floor."""
    d = F.lit(int(divisor)).cast("long")
    # exact multiple of d (pmod is non-negative), then EXACT division in
    # decimal(38,0) — a 64-bit value is 19 digits, far inside decimal
    # range, whereas a double mangles the dividend itself above 2^53
    exact = (col - F.pmod(col, d)).cast("decimal(38,0)")
    return (exact / F.lit(int(divisor))).cast("long")


def _image_payload(img: Column, fields: str) -> Column:
    """Build the engine payload struct from a row image, decoding
    ``*_b64`` fields to binary and dropping the suffix."""
    cols = []
    for f in fields.split(","):
        if not f.strip():
            continue
        name = f.strip().split()[0]
        if name.endswith("_b64"):
            cols.append(F.unbase64(img.getField(name)).alias(name[: -len("_b64")]))
        else:
            cols.append(img.getField(name).alias(name))
    return F.struct(*cols)


def parse_debezium(
    df: DataFrame,
    value_col: str = "value",
    fields: str = "lang STRING, text STRING",
    key: str = "url",
    events_per_epoch: int | None = None,
) -> DataFrame:
    """Parse a DataFrame of Debezium JSON strings into the engine's event
    envelope. ``fields`` lists the row-image columns beside the key.
    ``events_per_epoch`` assigns ``batch_epoch = seq div N`` (contiguous
    offset ranges per epoch — lineage-friendly); None leaves the caller
    to slice epochs (e.g. streaming batch ids)."""
    p = F.from_json(F.col(value_col), envelope_ddl(fields, key)).getField("payload")
    op_raw = p.getField("op")
    op = (
        F.when(op_raw.isin("c", "r"), F.lit("I"))
        .when(op_raw == "u", F.lit("U"))
        .when(op_raw == "d", F.lit("D"))
    )
    key_col = F.coalesce(
        p.getField("after").getField(key), p.getField("before").getField(key)
    )
    seq = p.getField("source").getField("lsn")
    payload = F.when(
        op == "D",
        F.lit(None).cast(
            "struct<"
            + ",".join(
                (
                    f"{f.strip().split()[0][:-4]}:binary"
                    if f.strip().split()[0].endswith("_b64")
                    else f"{f.strip().split()[0]}:{' '.join(f.strip().split()[1:])}"
                )
                for f in fields.split(",")
                if f.strip()
            )
            + ">"
        ),
    ).otherwise(_image_payload(p.getField("after"), fields))
    out = df.select(
        op.alias("op"),
        key_col.alias(key),
        F.timestamp_millis(p.getField("source").getField("ts_ms")).alias("warc_ts"),
        seq.alias("seq"),
        payload.alias("payload"),
        (
            # long DIV, not double /: float division loses exactness for
            # LSNs above 2^53 (an epoch-boundary event can land in the
            # wrong epoch) and cast('long') truncates toward zero instead
            # of flooring for negative seq
            _floor_div_long(seq.cast("long"), int(events_per_epoch))
            if events_per_epoch
            else F.lit(None).cast("long")
        ).alias("batch_epoch"),
    )
    return out
