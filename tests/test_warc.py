"""WARC source (sources/warc.py): byte-level record framing, the
envelope bridge into the apply engine, and loud failure on truncation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.sources.warc import (
    _parse_records,
    read_warc,
    synth_warc,
    warc_to_envelope,
)


def _docs(spark, n=30):
    return spark.createDataFrame(
        [(i, f"body of document {i} with words") for i in range(n)],
        "doc_id long, text string",
    )


def test_roundtrip_records(spark, tmp_path):
    out = str(tmp_path / "segs")
    synth_warc(_docs(spark), out, n_files=3)
    recs = read_warc(spark, out)
    rows = {r["url"]: r for r in recs.collect()}
    assert len(rows) == 30
    r7 = rows["https://warc.example.com/doc/7"]
    assert r7["warc_type"] == "response"
    assert r7["warc_date"] == "2024-01-01T00:00:07Z"
    assert bytes(r7["payload"]).decode() == "body of document 7 with words"
    # three segment files → three scan tasks
    assert recs.select("warc_file").distinct().count() == 3


def test_warc_to_apply_engine(spark, tmp_path):
    """A crawl segment drops straight into the CDC engine: parse →
    envelope → apply_epoch → final state has every page live."""
    from data_migration_validation_spark.plans.apply import CDCApplyEngine

    out = str(tmp_path / "segs")
    synth_warc(_docs(spark), out)
    env = warc_to_envelope(read_warc(spark, out), epoch=0)
    eng = CDCApplyEngine(
        spark,
        table_path=str(tmp_path / "t"),
        checkpoint_path=str(tmp_path / "c"),
        num_buckets=4,
        compact_every=None,
    )
    st = eng.apply_epoch(env, 0)
    assert st.events_seen == 30
    final = eng.read_final()
    assert final.count() == 30
    assert final.where(F.col("text").contains("document 7")).count() == 1


def test_truncated_payload_fails_loudly():
    data = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/1\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 100\r\n\r\nonly twenty bytes!!"
    )
    with pytest.raises(ValueError, match="truncated payload"):
        _parse_records("seg", data)


def test_missing_magic_fails_loudly():
    with pytest.raises(ValueError, match="WARC/ magic"):
        _parse_records("seg", b"HTTP/1.1 200 OK\r\n\r\n")


def test_crlf_in_payload_does_not_split_records():
    body = b"line1\r\n\r\nline2"  # payload containing the header terminator
    data = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/1\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    recs = _parse_records("seg", data)
    assert len(recs) == 1
    assert recs[0][3] == body  # Content-Length framing, not delimiter search


def test_oversized_segment_fails_with_clear_error(spark, tmp_path):
    """A segment over the size bound must fail in read_warc with the
    offending path — binaryFile hard-caps a row at 2 GB, and the whole
    segment transits Arrow to Python, so the bound is enforced up front
    (with a tiny max_segment_bytes standing in for the real 1.5 GB)."""
    out = str(tmp_path / "segs")
    synth_warc(_docs(spark), out, n_files=2)
    with pytest.raises(ValueError, match="max_segment_bytes.*split"):
        read_warc(spark, out, max_segment_bytes=64)
    # at the real default the same segments are fine
    assert read_warc(spark, out).count() == 30
