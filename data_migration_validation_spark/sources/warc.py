"""WARC (ISO 28500) source: the format web crawls actually arrive in.

A Common-Crawl-style pipeline ingests ``.warc`` segment files —
concatenated records, each a ``WARC/1.0`` header block (CRLF-separated,
``Content-Length`` framing) followed by that many payload bytes and a
blank line. This module reads them into the engine's envelope:

* ``read_warc(spark, path)`` → one row per record
  (``warc_file, url, warc_type, warc_date, payload``). The scan is
  ``binaryFile`` + ``mapInPandas``: one task per segment file, records
  parsed incrementally from the bytes — the task's memory is one
  segment, the parallelism is the segment count, which is exactly how
  crawl dumps shard (CC publishes ~1 GB segments, tens of thousands per
  crawl). No Python per-row: one Arrow batch per file's records.
* ``warc_to_envelope(df, epoch)`` → the CDC apply envelope (op='I',
  url, warc_ts, seq, payload.html) so a crawl segment drops straight
  into ``CDCApplyEngine.apply_epoch`` / the novelty filter.
* ``synth_warc`` — deterministic synthetic segments derived from a
  DataFrame (a pure function of its rows), used by tests and the
  ``warc_parse`` oracle query: the oracle reconstructs the expected
  parse output relationally while Spark parses the actual bytes, so a
  framing bug (off-by-one on Content-Length, CRLF handling) breaks the
  value hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA = (
    "warc_file string, url string, warc_type string, warc_date string, "
    "payload binary"
)


def _parse_records(name: str, data: bytes):
    """Yield (url, type, date, payload) from one segment's bytes.
    Malformed tails stop the scan rather than guessing — a truncated
    record means a truncated upload, and silently skipping bytes could
    resynchronize onto garbage."""
    out = []
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record blank lines
        while i < n and data[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        end = data.find(b"\r\n\r\n", i)
        if end < 0:
            raise ValueError(f"{name}: unterminated WARC header block at byte {i}")
        head = data[i:end].decode("utf-8", errors="replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"{name}: expected WARC/ magic at byte {i}, got {head[0]!r}")
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"{name}: missing/invalid Content-Length at byte {i}")
        body_start = end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError(f"{name}: truncated payload at byte {body_start}")
        out.append(
            (
                fields.get("warc-target-uri", ""),
                fields.get("warc-type", ""),
                fields.get("warc-date", ""),
                payload,
            )
        )
        i = body_start + length
    return out


MAX_SEGMENT_BYTES = 1_500_000_000  # ~1.5 GB, headroom under binaryFile's 2 GB cap


def read_warc(
    spark: SparkSession, path: str, max_segment_bytes: int = MAX_SEGMENT_BYTES
) -> DataFrame:
    """Parse every ``*.warc`` under ``path`` into records.

    Segment size bound: one whole segment is one ``binaryFile`` row, so a
    segment must fit Spark's 2 GB binary-column hard cap AND transit
    Arrow to Python in one piece. Common-Crawl-style ~1 GB segments are
    fine; anything over ``max_segment_bytes`` fails HERE with the
    offending paths — split those segments upstream — instead of deep
    inside Spark with an opaque negative-length error. The check is a
    metadata-only pass (column pruning keeps ``content`` out of the
    scan)."""
    import pandas as pd

    glob = os.path.join(path, "*.warc")
    oversized = [
        (r["path"], int(r["length"]))
        for r in spark.read.format("binaryFile")
        .load(glob)
        .select("path", "length")
        .where(F.col("length") > int(max_segment_bytes))
        .collect()
    ]
    if oversized:
        listing = ", ".join(f"{p} ({n} bytes)" for p, n in oversized[:5])
        raise ValueError(
            f"{len(oversized)} WARC segment(s) exceed max_segment_bytes="
            f"{max_segment_bytes} (binaryFile holds a whole segment per row, "
            f"hard-capped at 2 GB): {listing} — split these segments before "
            f"ingest"
        )

    files = spark.read.format("binaryFile").load(glob).select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(p)
                for url, rtype, rdate, payload in _parse_records(name, bytes(content)):
                    rows.append((name, url, rtype, rdate, payload))
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "url", "warc_type", "warc_date", "payload"],
            )

    return files.mapInPandas(parse, RECORD_SCHEMA)


def warc_to_envelope(records: DataFrame, epoch: int) -> DataFrame:
    """Records → the engine envelope. ``seq`` orders records by
    (warc_date, url) within the epoch — crawls don't carry a global
    LSN, and the LWW order column is warc_ts anyway."""
    from pyspark.sql import functions as F

    resp = records.where(F.col("warc_type") == "response")
    return resp.select(
        F.lit("I").alias("op"),
        F.col("url"),
        F.to_timestamp(F.col("warc_date")).alias("warc_ts"),
        F.xxhash64("url", "warc_date").alias("seq"),
        F.struct(
            F.col("payload").alias("html"), F.lit(None).cast("string").alias("lang")
        ).alias("payload"),
        F.lit(int(epoch)).cast("int").alias("batch_epoch"),
    )


def synth_warc(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_files: int = 2,
) -> None:
    """Write deterministic ``.warc`` segments derived from ``df``: doc i
    becomes a ``response`` record for ``https://warc.example.com/doc/i``
    whose payload is the text. Records are grouped by ``id % n_files``
    and sorted by id inside each segment, so the bytes are a pure
    function of the input — both engines can derive the expected parse.
    Segments are written BY THE EXECUTORS (one applyInPandas group =
    one file), the same move a distributed exporter makes."""
    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(pdf[id_col].iloc[0]) % n_files
        pdf = pdf.sort_values(id_col)
        chunks = []
        for _, row in pdf.iterrows():
            body = str(row[text_col]).encode()
            sec = int(row[id_col]) % 60
            head = (
                f"WARC/1.0\r\n"
                f"WARC-Type: response\r\n"
                f"WARC-Target-URI: https://warc.example.com/doc/{int(row[id_col])}\r\n"
                f"WARC-Date: 2024-01-01T00:00:{sec:02d}Z\r\n"
                f"Content-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            chunks.append(head + body + b"\r\n\r\n")
        tmp = os.path.join(out_dir, f".tmp-seg-{g:05d}.warc")
        with open(tmp, "wb") as f:
            f.write(b"".join(chunks))
        os.replace(tmp, os.path.join(out_dir, f"seg-{g:05d}.warc"))
        return pd.DataFrame({"g": [g], "n": [len(pdf)]})

    (
        df.select(id_col, text_col)
        .withColumn("_g", F.pmod(F.col(id_col), F.lit(n_files)))
        .groupBy("_g")
        .applyInPandas(lambda pdf: write_group(pdf.drop(columns=["_g"])), "g int, n long")
        .collect()  # two tiny status rows; the DATA was written by executors
    )
