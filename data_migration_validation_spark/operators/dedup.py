"""Near-duplicate detection suite for training-data pipelines.

The operations a web-scale corpus pipeline runs between crawl and
training: exact dedup, MinHash+LSH, SimHash, exact n-gram Jaccard, and
embedding-cosine near-dup. All are declarative DataFrame plans (no Python
in the hot path); the hash family is the cross-engine char-fold from
functions/hashing.py so every operator has a DuckDB oracle.

Scale notes (100 TB):
* exact_dedup is one hash-aggregate — Spark's map-side partial
  aggregation makes the shuffle carry (hash, min_id) pairs, not text.
* minhash_lsh_pairs shuffles (band_id, band_key) — band buckets are the
  classic skew risk (boilerplate pages collapse into one bucket); cap
  bucket size with ``max_bucket`` (drops super-buckets, the standard
  production mitigation, logged not silent).
* pair joins emit a<b only, so each candidate pair appears exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_migration_validation_spark.functions.hashing import (
    minhash_signature,
    shingle_hashes,
    simhash32,
    str_fold,
)
from data_migration_validation_spark.functions.text import tokens


# -- exact dedup -----------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(canonical_id, dup_id) for every row whose text also appears under a
    smaller id: group by the text hash (not the text — the shuffle carries
    8 bytes/row), take min id as canonical, re-join to list members."""
    hashed = df.select(F.col(id_col), str_fold(F.col(text_col)).alias("_h"), F.col(text_col))
    w = Window.partitionBy("_h", text_col)
    return (
        hashed.withColumn("canonical_id", F.min(id_col).over(w))
        .where(F.col(id_col) != F.col("canonical_id"))
        .select(F.col("canonical_id"), F.col(id_col).alias("dup_id"))
    )


# -- MinHash + LSH ------------------------------------------------------------------

def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (a, b), a < b: shingle → minhash → band →
    bucket self-join. rows_per_band = num_perm // bands."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(shingle_hashes(tokens(F.col(text_col)), k=shingle_k), num_perm).alias("_sig"),
    )
    band_rows = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws("-", *[F.element_at("_sig", b * r + j + 1).cast("string") for j in range(r)]).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "band.band_id", "band.band_key")
    if max_bucket is not None:
        w = Window.partitionBy("band_id", "band_key")
        band_rows = band_rows.withColumn("_n", F.count("*").over(w)).where(
            F.col("_n") <= max_bucket
        ).drop("_n")
    a = band_rows.select(F.col("band_id"), F.col("band_key"), F.col("_id").alias("a"))
    b = band_rows.select(F.col("band_id"), F.col("band_key"), F.col("_id").alias("b"))
    return (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# -- SimHash -----------------------------------------------------------------------------

def simhash_values(df: DataFrame, id_col: str, text_col: str, shingle_k: int = 3) -> DataFrame:
    """(id, simhash) — 32-bit SimHash over shingle hashes."""
    return df.select(
        F.col(id_col),
        simhash32(shingle_hashes(tokens(F.col(text_col)), k=shingle_k)).alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the 4 bytes of the signature
    (two hashes within hamming≤4 of a 32-bit signature *usually* share a
    byte — probabilistic recall, standard simhash blocking), then filter
    exact hamming distance."""
    sv = simhash_values(df, id_col, text_col, shingle_k).select(
        F.col(id_col).alias("_id"), F.col("simhash")
    )
    blocked = sv.select(
        "_id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("byte_id"), (F.floor(F.col("simhash") / F.lit(2 ** (8 * i))).cast("long") % 256).alias("byte_val")) for i in range(4)])
        ).alias("blk"),
    ).select("_id", "simhash", "blk.byte_id", "blk.byte_val")
    a = blocked.select("byte_id", "byte_val", F.col("_id").alias("a"), F.col("simhash").alias("sh_a"))
    b = blocked.select("byte_id", "byte_val", F.col("_id").alias("b"), F.col("simhash").alias("sh_b"))
    pairs = (
        a.join(b, ["byte_id", "byte_val"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.where(hamming <= max_hamming).select(
        "a", "b", hamming.cast("int").alias("hamming")
    )


# -- exact n-gram Jaccard -------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    shingle_k: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct k-token shingle hash sets for pairs
    within a blocking column (e.g. lang) — the quadratic baseline the LSH
    path approximates. Output (a, b, jaccard) rounded to 6 dp."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        shingle_hashes(tokens(F.col(text_col)), k=shingle_k).alias("_sh"),
        *( [F.col(block_col).alias("_blk")] if block_col else [F.lit(0).alias("_blk")] ),
    )
    a = sh.select(F.col("_blk"), F.col("_id").alias("a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("_blk"), F.col("_id").alias("b"), F.col("_sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.round(inter.cast("double") / union, 6)
    return (
        a.join(b, "_blk")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# -- embedding cosine near-dup ------------------------------------------------------------------

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed in
    double, left-to-right (cross-engine reproducible)."""
    def dbl(v):
        return F.transform(v, lambda x: x.cast("double"))

    dot = F.aggregate(F.zip_with(dbl(a), dbl(b), lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(dbl(a), lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(dbl(b), lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """(a, b, cos) pairs with cosine ≥ threshold, blocked (e.g. on label)
    to keep the quadratic term bounded; the scale path is LSH bucketing
    (operators/similarity.py)."""
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        *( [F.col(block_col).alias("_blk")] if block_col else [F.lit(0).alias("_blk")] ),
    )
    a = base.select("_blk", F.col("_id").alias("a"), F.col("_v").alias("va"))
    b = base.select("_blk", F.col("_id").alias("b"), F.col("_v").alias("vb"))
    cos = F.round(cosine_sim(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, "_blk")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
    )
