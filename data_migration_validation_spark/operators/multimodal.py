"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed in Arrow-batched ``mapInPandas`` pipelines.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
iteration — is real and tested, with two codec paths:

* ``codec="real"``: images decode through Pillow when it is importable
  (decode stats over decoded pixels, resize via PIL + PNG re-encode);
  without Pillow — as in this container — the call raises
  NotImplementedError at plan time. Audio/video additionally need
  ffmpeg/soundfile and keep the NotImplementedError seam.
* ``codec="fake"`` (default) is a deterministic byte-level "decode"
  (header parse + byte statistics) so tests and oracles have exact
  expected values.

Media envelope schema::

    media_id: long, kind: string(image|audio|video), content: binary,
    meta: struct<width:int, height:int, sample_rate:int,
                 duration_ms:int, codec:string>

Scale notes: mapInPandas streams Arrow batches — content bytes never
materialize on the driver; decode parallelism == partition count, so
``df.repartition(n)`` before a decode stage is the knob. Keep batches
bounded with spark.sql.execution.arrow.maxRecordsPerBatch when payloads
are MBs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = "struct<width:int,height:int,sample_rate:int,duration_ms:int,codec:string>"

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)


def _real_image_codec():
    """The production seam: return PIL's Image module when the library is
    importable (it's public and commonly installed), else raise. Images
    are the only kind with a wired real codec; audio/video additionally
    need ffmpeg/soundfile and stay behind the NotImplementedError."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not present in "
            "this environment; use codec='fake' (deterministic byte-level "
            "stand-in) or install Pillow"
        )


def _require_real_codec(kind: str) -> None:
    if kind == "image":
        _real_image_codec()
        return
    raise NotImplementedError(
        f"real {kind} decode requires codec libraries (ffmpeg/soundfile) "
        "not present in this environment; use codec='fake' (deterministic "
        "byte-level stand-in) or install the libraries"
    )


def synth_media(spark: SparkSession, n: int, kind: str = "image", num_partitions: int | None = None) -> DataFrame:
    """Deterministic media table: content = a parseable fake payload whose
    bytes derive from media_id (JVM-side generation, no Python)."""
    base = spark.range(0, n, numPartitions=num_partitions)
    i = F.col("id")
    width = (i % 64 + 8).cast("int")
    height = (i % 48 + 6).cast("int")
    body = F.repeat(F.chr(i % 64 + 32), width.cast("int") * 4)
    content = F.encode(F.concat(F.lit("FAKE:"), F.col("id").cast("string"), F.lit(":"), body), "UTF-8")
    return base.select(
        i.alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            ((i % 30 + 1) * 1000).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


# -- decode / feature extraction ------------------------------------------------

DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
    ]
)


def decode_stats(df: DataFrame, id_col: str = "media_id", content_col: str = "content", codec: str = "fake") -> DataFrame:
    """Decode statistics via mapInPandas: (id, n_bytes, mean_byte).

    codec='fake' (default, deterministic oracle path): stats over the raw
    payload bytes. codec='real': Pillow-decoded pixel stats — n_bytes =
    decoded pixel-buffer size, mean_byte = mean pixel byte. Same batch
    shape, schema, and partitioning either way; the import happens inside
    the task so executors fail as loudly as the driver if Pillow is
    missing."""
    if codec == "real":
        _require_real_codec("image")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "real":
            import io

            Image = _real_image_codec()

            def stats(b):
                if b is None:
                    return 0, None
                px = Image.open(io.BytesIO(bytes(b))).tobytes()
                # numpy mean, not sum(px)/len(px): a 4k image is ~50M
                # pixels — Python-int iteration per image would dwarf the
                # decode itself. float64 accumulation is exact here
                # (byte sums << 2^53), so the value is identical.
                arr = np.frombuffer(px, dtype=np.uint8)
                return len(px), float(arr.mean()) if len(px) else None

        else:

            def stats(b):
                if b is None:
                    return 0, None
                b = bytes(b)
                arr = np.frombuffer(b, dtype=np.uint8)
                return len(b), float(arr.mean()) if b else None

        for pdf in it:
            pairs = [stats(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": [p[0] for p in pairs],
                    "mean_byte": [p[1] for p in pairs],
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, DECODE_STATS_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    codec: str = "fake",
) -> DataFrame:
    """Image resize stage. fake codec (default, deterministic): truncate/
    pad the payload to target_w*target_h bytes — exercises the binary-out
    mapInPandas path. real codec: Pillow decode → resize → PNG re-encode,
    same schema and batch shape."""
    if codec == "real":
        _require_real_codec("image")
    size = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "real":
            import io

            Image = _real_image_codec()

            def rz(b):
                if b is None:
                    return None
                img = Image.open(io.BytesIO(bytes(b)))
                buf = io.BytesIO()
                img.resize((target_w, target_h)).save(buf, format="PNG")
                return buf.getvalue()

        else:

            def rz(b):
                return (
                    bytes(b)[:size].ljust(size, b"\0") if b is not None else None
                )

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "content": pdf["content"].map(rz),
                }
            )

    return df.select("media_id", "content").mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, codec: str = "fake") -> DataFrame:
    """Video frame sampling: one row per sampled timestamp. The timestamp
    grid is pure Column math (JVM); only frame extraction runs in Python.
    fake codec: frame bytes = payload slice at the timestamp offset."""
    if codec == "real":
        _require_real_codec("video")
    with_ts = df.select(
        "media_id",
        "content",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = [
                bytes(c)[(ts // 100) % max(len(c), 1):][:16] if c is not None else None
                for c, ts in zip(pdf["content"], pdf["frame_ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"].astype("int32"),
                    "frame": frames,
                }
            )

    return with_ts.mapInPandas(batches, FRAME_SCHEMA)
