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
    P,
    SIMHASH_SEG_BITS,
    SIMHASH_SEGS,
    minhash_signature,
    shingle_hashes,
    simhash32,
    simhash_seg_params,
    str_fold,
)
from data_migration_validation_spark.functions.text import tokens


# -- exact dedup -----------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(canonical_id, dup_id) for every row whose text also appears under a
    smaller id. Two-phase hash aggregate on a 128-bit content hash: the
    map side computes md5 and a partial min(id) per hash BEFORE the
    exchange, so the shuffle carries (16-byte hash, id) pairs — never the
    text; the member join back is hash-keyed too. md5 collisions are
    negligible at corpus scale (~2^-64 at 1e10 docs); a collision-paranoid
    deployment swaps in sha2(256) on the same plan.

    Null text is excluded explicitly: null join keys never match, so the
    inner join would silently drop null-text rows anyway — filtering both
    sides makes 'nulls are not duplicates of each other' the defined
    semantics (and keeps the SQL oracle aligned by construction)."""
    hashed = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_h")
    )
    canon = hashed.groupBy("_h").agg(F.min(id_col).alias("canonical_id"))
    return (
        hashed.join(canon, "_h")
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
    # TWO projections, deliberately: the shingle-hash array is aliased in
    # its own select so the num_perm permutations reference ONE computed
    # array. Inlining shingle_hashes directly into minhash_signature
    # replicates the whole char-fold pipeline once per permutation —
    # higher-order functions are interpreted (no codegen, no common-
    # subexpression elimination), measured 7x slower at sf0.1. Spark's
    # CollapseProject keeps the split because the alias is expensive and
    # multiply-referenced.
    hashed = df.select(
        F.col(id_col).alias("_id"),
        shingle_hashes(tokens(F.col(text_col)), k=shingle_k).alias("_hashes"),
    )
    sig = hashed.select(
        "_id", minhash_signature(F.col("_hashes"), num_perm).alias("_sig")
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
    # ONE pass per bucket instead of a bucket self-join: the self-join
    # evaluates the whole shingle→minhash pipeline once per side, and its
    # max_bucket guard needs a window (a third shuffle). collect_list per
    # bucket costs one shuffle, the size() filter IS the skew cap, and the
    # a<b pairs expand in-array — safe because max_bucket bounds the
    # per-group explosion (and LSH buckets are tiny by construction: a big
    # bucket means near-identical docs, which the cap routes to the
    # cheaper exact-dedup path).
    buckets = band_rows.groupBy("band_id", "band_key").agg(
        F.collect_list("_id").alias("_ids")
    )
    if max_bucket is not None:
        buckets = buckets.where(F.size("_ids") <= max_bucket)
    ids = F.col("_ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x: F.transform(
                F.filter(ids, lambda y: y > x),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        buckets.where(F.size("_ids") >= 2)
        .select(F.explode(pair_structs).alias("_p"))
        .select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .distinct()
    )


# -- SimHash -----------------------------------------------------------------------------

def simhash_values(df: DataFrame, id_col: str, text_col: str, shingle_k: int = 3) -> DataFrame:
    """(id, simhash) — 32-bit SimHash over shingle hashes (kept as the
    compact single-value signature; the pair operator below blocks on the
    segmented 64-bit form)."""
    return df.select(
        F.col(id_col),
        simhash32(shingle_hashes(tokens(F.col(text_col)), k=shingle_k)).alias("simhash"),
    )


def simhash_segment_values(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int = 3
) -> DataFrame:
    """(_id, _segs): the segmented 64-bit SimHash, computed as an
    explode + hash-aggregate plan: one row per (doc, shingle hash), 64
    plain ``sum()`` vote columns (whole-stage codegen, map-side partial
    aggregation — the shuffle carries one 64-int row per doc per map
    partition), then bit reassembly from the vote signs. Equivalent to
    the naive per-row loop but stays in codegen instead of the
    higher-order-function interpreter (measured ~10x faster)."""
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingle_hashes(tokens(F.col(text_col)), k=shingle_k)).alias("_h"),
    )
    aggs = []
    for s, (a, c) in enumerate(simhash_seg_params(SIMHASH_SEGS)):
        perm = (F.lit(a) * F.col("_h") + F.lit(c)) % F.lit(P)
        for b in range(SIMHASH_SEG_BITS):
            vote = F.shiftright(perm, b).bitwiseAND(F.lit(1)) * 2 - 1
            aggs.append(F.sum(vote).alias(f"_v_{s}_{b}"))
    votes = exploded.groupBy("_id").agg(*aggs)
    segs = [
        sum(
            (
                F.when(F.col(f"_v_{s}_{b}") > 0, F.lit(2**b).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
                for b in range(SIMHASH_SEG_BITS)
            ),
            start=F.lit(0).cast("long"),
        )
        for s in range(SIMHASH_SEGS)
    ]
    return votes.select("_id", F.array(*segs).alias("_segs"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 4,
    shingle_k: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by segmented 64-bit SimHash: the signature is 4
    independent 16-bit segments; candidates are pairs sharing ANY
    (segment_id, segment_value) block — 4 x 65,536 = 262,144 blocks, vs
    the 1,024 a byte-blocked 32-bit scheme gives (which at 1e9 docs puts
    ~1e6 rows in every bucket and the self-join explodes). Pigeonhole
    over 4 segments guarantees recall for hamming <= 3; hamming 4 pairs
    are found unless all four differing bits land in distinct segments.
    ``max_bucket`` caps pathological blocks (boilerplate corpora) like the
    MinHash-LSH path. Exact segment-wise hamming filters candidates."""
    sv = simhash_segment_values(df, id_col, text_col, shingle_k)
    blocked = sv.select(
        "_id",
        "_segs",
        F.posexplode("_segs").alias("seg_id", "seg_val"),
    )
    if max_bucket is not None:
        w = Window.partitionBy("seg_id", "seg_val")
        blocked = (
            blocked.withColumn("_n", F.count("*").over(w))
            .where(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a = blocked.select("seg_id", "seg_val", F.col("_id").alias("a"), F.col("_segs").alias("segs_a"))
    b = blocked.select("seg_id", "seg_val", F.col("_id").alias("b"), F.col("_segs").alias("segs_b"))
    pairs = (
        a.join(b, ["seg_id", "seg_val"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "segs_a", "segs_b")
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("segs_a"),
            F.col("segs_b"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return pairs.where(hamming <= max_hamming).select(
        "a", "b", hamming.cast("int").alias("hamming")
    )


# -- duplicate-cluster resolution (connected components) ------------------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 50,
    algorithm: str = "label",
) -> DataFrame:
    """Resolve duplicate PAIRS into duplicate CLUSTERS: (member_id,
    cluster_id) where cluster_id is the minimum id in the member's
    connected component. This is the step every production dedup pipeline
    runs after pair-finding — transitive closure turns "A~B, B~C" into one
    keep-one-drop-two decision instead of two independent ones.

    Min-label propagation as iterative DataFrame joins: labels start as
    the vertex id; each round every vertex takes the min of its own label
    and its neighbors' (edges join + union + min-aggregate), until a round
    changes nothing. Rounds needed = graph diameter — for near-dup
    clusters (LSH buckets emit near-cliques) that is 1-3, so the loop is
    short by construction; ``algorithm="star"`` switches to the
    large-star/small-star variant (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14) whose round count is logarithmic
    in component size — the right choice for genuinely long chains,
    where label propagation needs diameter rounds.

    Scale notes: the edge list is localCheckpoint'd once so the (possibly
    expensive) pair-producing plan is not re-executed every round, and
    each round's labels are localCheckpoint'd to truncate the iterative
    lineage (on a cluster, use a reliable checkpoint dir instead — same
    call shape). Each round is one shuffle on the vertex id; the
    convergence probe reuses the just-materialized label sets.
    """
    if algorithm == "star":
        return _connected_components_star(pairs, a_col, b_col, max_iters)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r} (label|star)")
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    # both directions are present, so src alone covers every vertex
    labels = (
        edges.select(F.col("src").alias("v")).distinct().withColumn("lbl", F.col("v"))
    ).localCheckpoint()
    for _ in range(max_iters):
        prop = edges.join(labels, edges["src"] == labels["v"]).select(
            F.col("dst").alias("v"), F.col("lbl")
        )
        new_labels = (
            labels.select("v", "lbl")
            .union(prop)
            .groupBy("v")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "v")
            .where(F.col("o.lbl") != F.col("n.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds — "
            "component diameter exceeds the bound; raise max_iters or use "
            "the large-star/small-star variant"
        )
    return labels.select(F.col("v").alias("member_id"), F.col("lbl").alias("cluster_id"))


def _connected_components_star(
    pairs: DataFrame, a_col: str, b_col: str, max_iters: int
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    SoCC'14 "Connected Components in MapReduce and Beyond", alg. 2):
    alternate two edge-rewriting rounds until the edge set is a fixed
    point, at which stage every component is a star rooted at its
    minimum id.

    * **large-star**: per vertex u, attach every STRICTLY LARGER
      neighbor to m = min(neighbors ∪ {u});
    * **small-star**: orient every edge large→small, then per vertex u
      attach u and its (smaller) neighbors to their minimum.

    Both rounds strictly decrease a potential function of the edge set
    and converge in O(log n) rounds even on pathological chains —
    exactly where min-label propagation needs diameter rounds. Each
    round is one groupBy(u) min + one join back: two shuffles, same
    shape at any scale; edges are localCheckpoint'd per round to
    truncate lineage."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )

    def large_star(e: DataFrame) -> DataFrame:
        both = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = both.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            both.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        oriented = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = oriented.join(m, "u")
        return (
            nbrs.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(max_iters):
        new_edges = small_star(large_star(edges)).localCheckpoint()
        unchanged = (
            new_edges.exceptAll(edges).limit(1).count() == 0
            and edges.exceptAll(new_edges).limit(1).count() == 0
        )
        edges = new_edges
        if unchanged:
            break
    else:
        raise RuntimeError(
            f"star connected-components did not converge in {max_iters} rounds"
        )
    # fixed point = stars: every edge is (member, root); roots map to
    # themselves
    members = edges.select(F.col("u").alias("member_id"), F.col("v").alias("cluster_id"))
    roots = edges.select(F.col("v").alias("member_id"), F.col("v").alias("cluster_id")).distinct()
    return members.union(roots).distinct()


# -- exact n-gram Jaccard -------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    shingle_k: int = 3,
    block_col: str | None = None,
    max_block: int | None = None,
    allow_unblocked: bool = False,
) -> DataFrame:
    """Exact Jaccard over distinct k-token shingle hash sets for pairs
    within a blocking column (e.g. lang) — the quadratic baseline the LSH
    path approximates. Output (a, b, jaccard) rounded to 6 dp.

    Prefer :func:`ngram_jaccard_prefix_pairs` for anything beyond oracle
    baselines: identical output (t > 0), subquadratic, no blocking
    required.

    This is O(n²) WITHIN each block by construction. Guard rails:

    * ``block_col=None`` means ONE global block — a full cross join. That
      is only sane as an oracle baseline on tiny inputs, so it now
      requires ``allow_unblocked=True``; without it the call fails
      loudly instead of silently planning an O(n²) job on a big table.
    * ``max_block`` caps the rows per block (same idea as the LSH path's
      ``max_bucket``): oversized blocks are DROPPED from pair expansion —
      at web scale a hot block (one dominant language) would otherwise
      quadratically swamp the job. Dropped blocks are exactly the ones
      whose pairs the LSH/SimHash operators should handle instead."""
    if block_col is None and not allow_unblocked:
        raise ValueError(
            "ngram_jaccard_pairs with block_col=None is a full O(n^2) cross "
            "join; pass block_col (e.g. lang) or opt in explicitly with "
            "allow_unblocked=True for small oracle baselines"
        )
    sh = df.select(
        F.col(id_col).alias("_id"),
        shingle_hashes(tokens(F.col(text_col)), k=shingle_k).alias("_sh"),
        *( [F.col(block_col).alias("_blk")] if block_col else [F.lit(0).alias("_blk")] ),
    )
    if max_block is not None:
        # riding the same shuffle key as the join: per-block size via a
        # window over _blk, then a codegen filter — no extra join
        w = Window.partitionBy("_blk")
        sh = sh.withColumn("_blk_n", F.count(F.lit(1)).over(w)).where(
            F.col("_blk_n") <= F.lit(max_block)
        ).drop("_blk_n")
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


def ngram_jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    shingle_k: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard ≥ ``threshold`` pairs via PREFIX FILTERING — the
    AllPairs/PPJoin family (Bayardo et al., WWW'07; Xiao et al.,
    WWW'08) — with output identical to :func:`ngram_jaccard_pairs`
    but SUBQUADRATIC cost: no per-block cross join anywhere.

    Why it is exact: order every document's distinct shingle set under
    one global total order (document frequency asc, then shingle value
    — frequency is a pure performance heuristic, ANY fixed total order
    is correct). If jaccard(x, y) ≥ t then |x∩y| ≥ t·|x∪y| ≥ t·|x|,
    and the intersection is an integer, so |x∩y| ≥ ceil(t·|x|). Let w
    be the SMALLEST common shingle under the order: every intersection
    member sits at w's position or later in x's sorted set, so w's
    position ≤ |x| − ceil(t·|x|) + 1 — i.e. w lies inside x's length-
    (|x| − ceil(t·|x|) + 1) prefix, and symmetrically inside y's. The
    equi-join on prefix shingles therefore surfaces every qualifying
    pair as a candidate; the exact jaccard filter then removes false
    candidates. (The ceil is computed as ``ceil(t·n − 1e-9)`` so a
    floating-point overshoot can only LENGTHEN the prefix — extra
    candidates, never a missed pair.)

    Cost model at 100 TB: three linear passes (shingle, global df
    aggregate, frequency-sort) plus an equi-join whose left/right are
    the EXPLODED PREFIXES — about (1−t)·Σ|doc shingles| rows — keyed on
    (block, shingle). Frequency ordering pushes prefixes toward RARE
    shingles, so join groups stay small even when a stop-shingle
    saturates the corpus (the hot-block quadratic blow-up that forces
    ``max_block`` drops in the baseline simply does not arise; this
    variant needs no ``allow_unblocked`` opt-in and ``block_col=None``
    is safe). The AllPairs length filter rides the candidate join
    (jac ≥ t bounds the partner's set size to [t·n, n/t] — sizes outside
    it cannot qualify, so they never reach the verify), and candidate
    pairs are distinct-ed BEFORE the verify join so the fat shingle
    arrays travel once per pair.

    ``threshold`` must be > 0: at t = 0 a qualifying pair may share no
    shingle at all, which no token join can surface (the quadratic
    baseline is the only exact plan there).

    Null-text rows are excluded up front — "nulls are not duplicates of
    each other", the same defined stance as :func:`exact_dedup` (the
    quadratic baseline instead degenerates a null text to a singleton
    null-shingle set, an artifact of ``shingle_hashes`` rather than a
    semantics anyone wants)."""
    if threshold <= 0.0:
        raise ValueError(
            "ngram_jaccard_prefix_pairs requires threshold > 0: at 0 a "
            "qualifying pair can share zero shingles, which prefix "
            "filtering cannot surface — use ngram_jaccard_pairs"
        )
    sets = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            (F.col(block_col) if block_col else F.lit(0)).alias("_blk"),
            shingle_hashes(tokens(F.col(text_col)), k=shingle_k).alias("_sh"),
        )
        .where(F.size("_sh") > 0)
    )
    tok = sets.select("_id", "_blk", F.explode("_sh").alias("_t"))
    dfreq = tok.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    # one row per doc again: shingle sets are distinct by construction,
    # so sorting (df, shingle) structs restores a per-doc array ordered
    # under the global total order
    ordered = (
        tok.join(dfreq, "_t")
        .groupBy("_id", "_blk")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_df", "_t"))),
                lambda s: s["_t"],
            ).alias("_sh")
        )
        .withColumn("_n", F.size("_sh"))
    )
    plen = (
        F.col("_n")
        - F.ceil(F.lit(float(threshold)) * F.col("_n") - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    pref = ordered.select(
        "_blk", "_id", "_n", F.explode(F.slice("_sh", F.lit(1), plen)).alias("_t")
    )
    # length filter (AllPairs): jac ≥ t ⟹ |x∩y| ≥ ceil(t·|x|) ≤ |y|, both
    # directions — prunes size-mismatched candidates before the distinct
    # and the fat verify join. Same ε slack as the prefix ceil: a float
    # overshoot may only ADMIT extra candidates, never drop a true pair.
    t_lit = F.lit(float(threshold))
    cand = (
        pref.alias("l")
        .join(
            pref.alias("r"),
            (F.col("l._t") == F.col("r._t"))
            & (F.col("l._blk") == F.col("r._blk"))
            & (F.col("r._n") >= t_lit * F.col("l._n") - F.lit(1e-9))
            & (F.col("l._n") >= t_lit * F.col("r._n") - F.lit(1e-9)),
        )
        .where(F.col("l._id") < F.col("r._id"))
        .select(F.col("l._id").alias("a"), F.col("r._id").alias("b"))
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.round(inter.cast("double") / union, 6)
    return (
        cand.join(ordered.select(F.col("_id").alias("a"), F.col("_sh").alias("sh_a")), "a")
        .join(ordered.select(F.col("_id").alias("b"), F.col("_sh").alias("sh_b")), "b")
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
    max_block: int | None = None,
    allow_unblocked: bool = False,
) -> DataFrame:
    """(a, b, cos) pairs with cosine ≥ threshold, blocked (e.g. on label)
    to keep the quadratic term bounded; the scale path is LSH bucketing
    (operators/similarity.py).

    Same guard rails as ``ngram_jaccard_pairs``: ``block_col=None`` is a
    full O(n²) cross join, only sane as a tiny oracle baseline, so it
    requires an explicit ``allow_unblocked=True``; ``max_block`` DROPS
    blocks larger than the cap from pair expansion (a hot block — one
    dominant label — would otherwise quadratically swamp the job; those
    pairs belong to the LSH path)."""
    if block_col is None and not allow_unblocked:
        raise ValueError(
            "embedding_neardup_pairs with block_col=None is a full O(n^2) "
            "cross join; pass block_col (e.g. label) or opt in explicitly "
            "with allow_unblocked=True for small oracle baselines"
        )
    # per-ROW norm, hoisted: the pair expression then costs one dot
    # product instead of three aggregates. Same operations in the same
    # order as cosine_sim (dot / (sqrt(ssq_a) * sqrt(ssq_b))), so the
    # rounded values — and the oracle hash — are bit-identical.
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(dv, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        dv.alias("_v"),
        norm.alias("_n"),
        *( [F.col(block_col).alias("_blk")] if block_col else [F.lit(0).alias("_blk")] ),
    )
    if max_block is not None:
        w = Window.partitionBy("_blk")
        base = base.withColumn("_blk_n", F.count(F.lit(1)).over(w)).where(
            F.col("_blk_n") <= F.lit(max_block)
        ).drop("_blk_n")
    a = base.select("_blk", F.col("_id").alias("a"), F.col("_v").alias("va"), F.col("_n").alias("na"))
    b = base.select("_blk", F.col("_id").alias("b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    cos = F.round(dot / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, "_blk")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
    )
