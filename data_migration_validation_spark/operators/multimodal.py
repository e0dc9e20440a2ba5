"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed in Arrow-batched ``mapInPandas`` pipelines.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
iteration — is real and tested; the actual codecs (PIL/ffmpeg/soundfile)
are NOT in this container, so decode is stubbed two ways:

* ``codec="real"`` raises NotImplementedError behind an import-try — the
  clearly-marked seam where a production deployment plugs the library in;
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


def _require_real_codec(kind: str) -> None:
    try:  # the production seam: real codec libs are absent in this image
        import PIL  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"real {kind} decode requires codec libraries (PIL/ffmpeg/soundfile) "
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
    """Byte-level "decode" statistics via mapInPandas: (id, n_bytes,
    mean_byte). With codec='fake' this is the deterministic stand-in for
    image decode + pixel stats; the batch/schema plumbing is identical to
    a real decoder's."""
    if codec == "real":
        _require_real_codec("image")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf[content_col]
            n = content.map(lambda b: len(b) if b is not None else 0)
            mean = content.map(
                lambda b: (sum(b) / len(b)) if b else None
            )
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "n_bytes": n, "mean_byte": mean}
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
    """Image resize stage. fake codec: truncate/pad the payload to
    target_w*target_h bytes — exercises the binary-out mapInPandas path."""
    if codec == "real":
        _require_real_codec("image")
    size = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf["content"].map(
                lambda b: bytes(b)[:size].ljust(size, b"\0") if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "content": out,
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
