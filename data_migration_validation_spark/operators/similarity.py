"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_topk`` — exact cosine top-k: one scan, vectorized JVM
  expressions (zip_with/aggregate), TopK via orderBy+limit
  (TakeOrderedAndProject — per-partition heaps, no global shuffle). The
  baseline and the oracle.
* ``lsh_topk`` — the scale path: random-hyperplane LSH (deterministic,
  seed-derived hyperplanes) buckets vectors by sign bits; candidates are
  the query's bucket in each of ``n_tables`` hash tables — plus, with
  ``probe_radius`` > 0 and the query's raw values supplied, every bucket
  within that Hamming radius of the query bucket (multi-probe LSH: near
  neighbors that miss the exact bucket land one or two sign-flips away,
  so probing adjacent buckets recovers most of the recall lost to bit
  noise). The probe set is enumerated driver-side as LITERAL bucket keys
  (sum of C(n_bits, 0..r) per table) and matched by equality — still a
  bucket lookup, still partition-prunable at 1e9 vectors; only the
  candidate union is exactly reranked.

Hyperplane h_t,j[i] is a deterministic pseudo-random value in [-0.5, 0.5)
derived from (table, bit, dim) — reproducible in SQL, so even the ANN
path has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_migration_validation_spark.operators.dedup import cosine_sim

_HP_MIX = 48271
_HP_MOD = 2**31 - 1

_IVF_MULT = 48271
_IVF_ADD = 17


def _hp_val(t: int, j: int, i: int) -> float:
    """Deterministic hyperplane coefficient in [-0.5, 0.5).

    The seed is squared mod M before the final mix: a purely linear map
    (seed * k % M) leaves the coefficients an arithmetic progression in
    the dimension index, which makes every hyperplane nearly orthogonal
    to real data (dot products pile up at 0) and the sign bits noise —
    measured recall collapsed to 0.1 before the nonlinearity. All
    intermediates stay < 2^63, so DuckDB BIGINT reproduces this exactly."""
    z1 = (t * 131071 + j * 8191 + i * 127 + 17) % _HP_MOD
    z = ((z1 * z1) % _HP_MOD * _HP_MIX + z1) % _HP_MOD
    return z / _HP_MOD - 0.5


def hyperplane_sql(t: int, j: int, i: str | int) -> str:
    """DuckDB expression for _hp_val with i possibly a column expr."""
    z1 = f"(CAST(({t}*131071 + {j}*8191 + ({i})*127 + 17) AS BIGINT) % {_HP_MOD})"
    return (
        f"(CAST((({z1} * {z1}) % {_HP_MOD} * {_HP_MIX} + {z1}) % {_HP_MOD} AS DOUBLE)"
        f" / {_HP_MOD} - 0.5)"
    )


def _topk_ranked(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """Top-k of (id, cos) with a dense ``rank`` column, planned as
    TakeOrderedAndProject: ``orderBy().limit(k)`` runs a per-partition
    top-k + driver merge (no global single-partition shuffle), then the
    rank window only ever sees the <=k survivors."""
    topk = scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(id_col, "cos", F.col("rank").cast("int").alias("rank"))
    )


def brute_topk(
    df: DataFrame,
    query_vec: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine to ``query_vec`` (a Column, e.g. from a
    broadcast one-row subquery). Deterministic tiebreak on id."""
    scored = df.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), query_vec), 6).alias("cos"),
    )
    return _topk_ranked(scored, id_col, k)


def lsh_bucket_bits(vec_col: Column, table: int, n_bits: int, dim: int) -> Column:
    """Sign-bit bucket key of a vector under table ``table``'s
    hyperplanes: bit j = (dot(h_j, v) > 0)."""
    def dot_hp(j: int) -> Column:
        coeffs = F.array(*[F.lit(_hp_val(table, j, i)) for i in range(dim)])
        return F.aggregate(
            F.zip_with(coeffs, F.transform(vec_col, lambda x: x.cast("double")), lambda h, x: h * x),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    return F.concat_ws(
        "", *[F.when(dot_hp(j) > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(n_bits)]
    )


def query_bucket_key(values, table: int, n_bits: int) -> str:
    """Driver-side twin of :func:`lsh_bucket_bits` for a known query
    vector: same hyperplanes, same sign rule, plain Python floats (IEEE
    double, identical to the JVM's)."""
    bits = []
    for j in range(n_bits):
        s = 0.0
        for i, x in enumerate(values):
            s += _hp_val(table, j, i) * float(x)
        bits.append("1" if s > 0 else "0")
    return "".join(bits)


def probe_keys(base_key: str, radius: int) -> list[str]:
    """All bucket keys within Hamming distance ``radius`` of ``base_key``
    (multi-probe set), enumerated smallest-distance first."""
    from itertools import combinations

    n = len(base_key)
    out = [base_key]
    for r in range(1, radius + 1):
        for idxs in combinations(range(n), r):
            flipped = list(base_key)
            for i in idxs:
                flipped[i] = "1" if flipped[i] == "0" else "0"
            out.append("".join(flipped))
    return out


def lsh_topk(
    df: DataFrame,
    query_vec: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_tables: int = 4,
    n_bits: int = 8,
    dim: int = 64,
    query_values=None,
    probe_radius: int = 0,
) -> DataFrame:
    """ANN top-k: candidates = vectors sharing (a bucket near) the
    query's bucket in ANY table; exact cosine rerank of candidates only.
    Returns (id, cos, rank) — rank within the candidate set.

    ``probe_radius`` > 0 requires ``query_values`` (the query vector as a
    Python sequence): the probe buckets are enumerated driver-side and
    matched with literal IN-lists, so the plan stays equality-on-bucket-
    key — the shape that prunes at scale."""
    with_buckets = df.select(
        F.col(id_col),
        F.col(vec_col),
        *[lsh_bucket_bits(F.col(vec_col), t, n_bits, dim).alias(f"_bkt{t}") for t in range(n_tables)],
    )
    if probe_radius > 0:
        if query_values is None:
            raise ValueError("probe_radius > 0 needs query_values to enumerate probe buckets")
        cand_pred = None
        for t in range(n_tables):
            keys = probe_keys(query_bucket_key(query_values, t, n_bits), probe_radius)
            p = F.col(f"_bkt{t}").isin(keys)
            cand_pred = p if cand_pred is None else (cand_pred | p)
    else:
        q_buckets = [lsh_bucket_bits(query_vec, t, n_bits, dim) for t in range(n_tables)]
        cand_pred = None
        for t in range(n_tables):
            p = F.col(f"_bkt{t}") == q_buckets[t]
            cand_pred = p if cand_pred is None else (cand_pred | p)
    candidates = with_buckets.where(cand_pred)
    scored = candidates.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), query_vec), 6).alias("cos"),
    )
    return _topk_ranked(scored, id_col, k)


# -- IVF-flat --------------------------------------------------------------


def _cos_py(a, b) -> float:
    """Driver-side cosine with the SAME left-to-right fold order as
    ``cosine_sim``'s F.aggregate (and the oracle's list_reduce): identical
    IEEE-double result, so a round-6 comparison agrees across all three."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    import math

    return dot / (math.sqrt(na) * math.sqrt(nb))


def _round6(v: float) -> float:
    """HALF_UP rounding to 6 places — Spark's round() and DuckDB's round()
    both round half away from zero; Python's built-in round() is
    banker's, which would disagree on exact .5 ulps."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def ivf_centroids(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", n_list: int = 16
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse centroids: the ``n_list`` dataset vectors with
    the smallest ``(id * 48271 + 17) % (2^31-1)`` — a reproducible uniform
    sample (the same LCG mix the LSH hyperplanes use), expressible in SQL
    so the whole IVF path has a DuckDB oracle. Returns [(cid, vector)]
    with cid = rank order.

    Sampled seeds ARE the centroids — no Lloyd iterations. k-means
    refinement only moves centroids to reduce list imbalance; it is a
    recall/balance knob, never a correctness knob (the rerank is exact
    either way), and skipping it keeps centroid derivation a pure
    function of the data. The collect is metadata-sized (n_list × dim
    floats), the same scale as broadcasting a centroid codebook in any
    production IVF index."""
    rank = (F.col(id_col) * _IVF_MULT + _IVF_ADD) % F.lit(_HP_MOD)
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(rank.asc(), F.col(id_col).asc())
        .limit(n_list)
        .collect()
    )
    return [(cid, [float(x) for x in r[vec_col]]) for cid, r in enumerate(rows)]


def ivf_assign_expr(vec_col: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Per-row nearest-centroid id as a pure Column expression: an
    array_max over (round-6 cosine, -cid) structs — highest cosine, ties
    to the smallest cid. No join, no shuffle: assignment rides the scan
    (in a real index build it is computed once and used as the write
    partitioning, exactly like the lake's bucket column)."""
    entries = [
        F.struct(
            F.round(cosine_sim(vec_col, F.array(*[F.lit(x) for x in cv])), 6).alias("cos"),
            F.lit(-cid).alias("ncid"),
        )
        for cid, cv in centroids
    ]
    return (-F.array_max(F.array(*entries))["ncid"]).cast("int")


def ivf_probe_cids(
    query_values, centroids: list[tuple[int, list[float]]], n_probe: int
) -> list[int]:
    """The ``n_probe`` centroid ids nearest the query (round-6 cosine,
    ties to smaller cid) — driver-side twin of the oracle's probe CTE."""
    scored = sorted(
        ((-_round6(_cos_py(query_values, cv)), cid) for cid, cv in centroids),
    )
    return [cid for _negcos, cid in scored[:n_probe]]


def ivf_topk(
    df: DataFrame,
    query_values,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-flat ANN top-k: vectors partition into ``n_list`` inverted
    lists by nearest coarse centroid; the query searches only its
    ``n_probe`` nearest lists, exact-reranked. The complementary scale
    path to ``lsh_topk``: LSH prunes by hash-bucket equality (good when
    neighbors share sign patterns), IVF prunes by region (good when the
    data is clustered) — candidate fraction ≈ n_probe / n_list of the
    table instead of all of it.

    Scale shape: centroid codebook is driver/broadcast-sized; assignment
    is a per-row expression on the scan (no shuffle); the probe filter is
    a literal IN-list (partition-prunable if the table is written
    partitioned by list id); only ~n_probe/n_list of rows reach the
    exact rerank, which remains TakeOrderedAndProject."""
    cents = ivf_centroids(df, id_col, vec_col, n_list)
    probes = ivf_probe_cids(query_values, cents, n_probe)
    qv = F.array(*[F.lit(float(x)) for x in query_values])
    candidates = df.where(ivf_assign_expr(F.col(vec_col), cents).isin(probes))
    scored = candidates.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), qv), 6).alias("cos"),
    )
    return _topk_ranked(scored, id_col, k)


# -- persisted ANN indexes ----------------------------------------------------


class IvfIndex:
    """A PERSISTED IVF-flat index: the production shape of ``ivf_topk``,
    which recomputes centroids and re-assigns every vector per query.
    ``build`` runs assignment ONCE and writes the table partitioned by
    inverted-list id (the same move as the lake's bucket partitioning);
    the codebook (n_list × dim floats — metadata-sized) is stored next to
    the data. A query then reads only its ``n_probe`` lists via a
    partition filter the scan planner resolves to directories — at 1e9
    vectors the query plans ~n_probe/n_list of the files and never
    touches the rest (assert-able in the plan's PartitionFilters).

    Layout::

        index/
          codebook.json           # centroids + build params
          lists/_list_id=<cid>/*.parquet
    """

    _CODEBOOK = "codebook.json"
    _LISTS = "lists"

    def __init__(self, path: str):
        import json
        import os

        with open(os.path.join(path, self._CODEBOOK)) as f:
            cb = json.load(f)
        self.path = path
        self.id_col: str = cb["id_col"]
        self.vec_col: str = cb["vec_col"]
        self.n_list: int = cb["n_list"]
        self.centroids: list[tuple[int, list[float]]] = [
            (int(cid), [float(x) for x in vec]) for cid, vec in cb["centroids"]
        ]

    @classmethod
    def build(
        cls,
        df: DataFrame,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_list: int = 16,
    ) -> "IvfIndex":
        """One pass: derive the deterministic centroid codebook, assign
        each vector on the scan (pure expression, no shuffle), and write
        partitioned by list id. The codebook goes LAST — a crashed build
        leaves data without a codebook, which ``__init__`` refuses, so a
        partial index is never queryable."""
        import json
        import os

        cents = ivf_centroids(df, id_col, vec_col, n_list)
        (
            df.select(id_col, vec_col)
            .withColumn("_list_id", ivf_assign_expr(F.col(vec_col), cents))
            .write.partitionBy("_list_id")
            .mode("overwrite")
            .parquet(os.path.join(path, cls._LISTS))
        )
        with open(os.path.join(path, cls._CODEBOOK), "w") as f:
            json.dump(
                {
                    "id_col": id_col,
                    "vec_col": vec_col,
                    "n_list": n_list,
                    "centroids": cents,
                },
                f,
            )
        return cls(path)

    def candidates(self, spark, query_values, n_probe: int = 4) -> DataFrame:
        """The probe lists' rows — filtered on the PARTITION column, so
        the scan prunes whole ``_list_id=`` directories at planning."""
        import os

        probes = ivf_probe_cids(query_values, self.centroids, n_probe)
        lists = spark.read.parquet(os.path.join(self.path, self._LISTS))
        return lists.where(F.col("_list_id").isin([int(p) for p in probes]))

    def topk(self, spark, query_values, k: int = 10, n_probe: int = 4) -> DataFrame:
        """Partition-pruned exact rerank: identical results to
        ``ivf_topk`` with the same codebook, at a fraction of the scan."""
        qv = F.array(*[F.lit(float(x)) for x in query_values])
        scored = self.candidates(spark, query_values, n_probe).select(
            F.col(self.id_col),
            F.round(cosine_sim(F.col(self.vec_col), qv), 6).alias("cos"),
        )
        return _topk_ranked(scored, self.id_col, k)


class LshIndex:
    """A persisted random-hyperplane LSH index: ``n_tables`` hash tables,
    each a copy of (id, vector) partitioned by that table's bucket key —
    the classic LSH trade of ``n_tables``× storage for bucket-lookup
    reads. Queries union the probe buckets of every table via partition
    filters (multi-probe enumeration unchanged from ``lsh_topk``) and
    exact-rerank the candidate union.

    Layout::

        index/
          meta.json
          t=<table>/_bucket=<key>/*.parquet
    """

    _META = "meta.json"

    def __init__(self, path: str):
        import json
        import os

        with open(os.path.join(path, self._META)) as f:
            m = json.load(f)
        self.path = path
        self.id_col: str = m["id_col"]
        self.vec_col: str = m["vec_col"]
        self.n_tables: int = m["n_tables"]
        self.n_bits: int = m["n_bits"]
        self.dim: int = m["dim"]

    @classmethod
    def build(
        cls,
        df: DataFrame,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_tables: int = 4,
        n_bits: int = 8,
        dim: int = 16,
    ) -> "LshIndex":
        import json
        import os

        # ONE pass over the input: every table's bucket key is computed
        # in a single projection and exploded to (t, _bucket) rows, then
        # one write partitioned by (t, _bucket) lays out the exact same
        # t=<table>/_bucket=<key> directories n_tables sequential scans
        # used to. "b"-prefixed: a raw bit-string like 0101 would be
        # type-inferred back from the directory name as the INTEGER 101,
        # corrupting every bucket equality.
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    F.concat(
                        F.lit("b"), lsh_bucket_bits(F.col(vec_col), t, n_bits, dim)
                    ).alias("_bucket"),
                )
                for t in range(n_tables)
            ]
        )
        (
            df.select(id_col, vec_col, F.explode(tables).alias("_tb"))
            .select(
                id_col,
                vec_col,
                F.col("_tb.t").alias("t"),
                F.col("_tb._bucket").alias("_bucket"),
            )
            .write.partitionBy("t", "_bucket")
            .mode("overwrite")
            .parquet(path)
        )
        with open(os.path.join(path, cls._META), "w") as f:
            json.dump(
                {
                    "id_col": id_col,
                    "vec_col": vec_col,
                    "n_tables": n_tables,
                    "n_bits": n_bits,
                    "dim": dim,
                },
                f,
            )
        return cls(path)

    def topk(
        self, spark, query_values, k: int = 10, probe_radius: int = 1
    ) -> DataFrame:
        """Multi-probe bucket lookups across all tables, partition-pruned
        per table, then one exact rerank over the de-duplicated union."""
        import os

        qv = F.array(*[F.lit(float(x)) for x in query_values])
        cands = None
        for t in range(self.n_tables):
            base = query_bucket_key(query_values, t, self.n_bits)
            keys = ["b" + k for k in probe_keys(base, probe_radius)]
            tbl = spark.read.parquet(os.path.join(self.path, f"t={t}"))
            part = tbl.where(F.col("_bucket").isin(keys)).select(
                self.id_col, self.vec_col
            )
            cands = part if cands is None else cands.unionByName(part)
        scored = (
            cands.dropDuplicates([self.id_col])
            .select(
                F.col(self.id_col),
                F.round(cosine_sim(F.col(self.vec_col), qv), 6).alias("cos"),
            )
        )
        return _topk_ranked(scored, self.id_col, k)
