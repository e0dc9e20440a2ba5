"""Multimodal plumbing tests: binary columns + typed metadata through
mapInPandas stages (decode stubbed deterministically — codec libs absent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_migration_validation_spark.operators.multimodal import (
    DECODE_STATS_SCHEMA,
    decode_stats,
    resize_images,
    sample_frames,
    synth_media,
)


def test_synth_media_schema_and_determinism(spark):
    a = synth_media(spark, 50).orderBy("media_id").collect()
    b = synth_media(spark, 50, num_partitions=7).orderBy("media_id").collect()
    assert [r["content"] for r in a] == [r["content"] for r in b]  # partition-invariant
    assert a[0]["meta"]["codec"] == "fake"
    assert isinstance(a[0]["content"], (bytes, bytearray))


def test_decode_stats_matches_python(spark):
    media = synth_media(spark, 40)
    got = {r["media_id"]: r for r in decode_stats(media).collect()}
    for row in media.collect():
        b = bytes(row["content"])
        g = got[row["media_id"]]
        assert g["n_bytes"] == len(b)
        assert abs(g["mean_byte"] - sum(b) / len(b)) < 1e-12
    assert decode_stats(media).schema == DECODE_STATS_SCHEMA


def test_decode_real_codec_is_cleanly_stubbed(spark):
    """Without Pillow the real image path fails at PLAN time with a clear
    message (skipped when Pillow is present — then the path is live and
    test_real_codec_decodes_png covers it); audio/video always need
    ffmpeg/soundfile."""
    media = synth_media(spark, 5)
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_stats(media, codec="real")
    from data_migration_validation_spark.operators.multimodal import sample_frames

    with pytest.raises(NotImplementedError, match="codec libraries"):
        sample_frames(media, codec="real")


def test_real_codec_decodes_png(spark):
    """codec='real' decodes an actual PNG through Pillow: pixel-level
    stats and a true resize. Runs wherever Pillow is installed; the fake
    codec remains the deterministic oracle path."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import pandas as pd

    def png_bytes(w, h, val):
        img = PIL_Image.new("L", (w, h), color=val)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(0, png_bytes(4, 3, 7)), (1, png_bytes(8, 2, 200))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in decode_stats(df, codec="real").collect()}
    assert got[0]["n_bytes"] == 4 * 3 and got[0]["mean_byte"] == 7.0
    assert got[1]["n_bytes"] == 8 * 2 and got[1]["mean_byte"] == 200.0

    rz = {r["media_id"]: r for r in resize_images(df, 2, 2, codec="real").collect()}
    out = PIL_Image.open(io.BytesIO(bytes(rz[0]["content"])))
    assert out.size == (2, 2)


def test_resize_binary_roundtrip(spark):
    media = synth_media(spark, 20)
    out = resize_images(media, 8, 4).collect()
    for r in out:
        assert len(r["content"]) == 32
        assert r["width"] == 8 and r["height"] == 4


def test_frame_sampling_grid(spark):
    media = synth_media(spark, 10, kind="video")
    frames = sample_frames(media, every_ms=1000)
    counts = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    metas = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect()}
    for mid, dur in metas.items():
        assert counts[mid] == (dur - 1) // 1000 + 1
