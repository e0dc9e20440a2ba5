"""Cross-engine deterministic hashing primitives for dedup operators.

MinHash/SimHash/fingerprinting need a hash function that an *external
oracle* (DuckDB) can reproduce exactly — Spark's xxhash64 and DuckDB's
hash() don't match — so the base primitive is a polynomial character fold
mod the Mersenne prime 2^31-1:

    h(s) = fold over chars c of s: (acc*31 + ascii(c)) mod P

Each helper here returns BOTH the Spark Column expression and (via the
``*_sql`` twins) the equivalent DuckDB SQL string generated from the same
constants, so the two engines stay in lockstep by construction.

All arithmetic stays < 2^63 (ANSI-safe): acc < P ≈ 2.1e9, so
acc*31 + 255 < 2^36, and MinHash's a*h + b < P² ≈ 4.6e18.

These are the *oracle-checkable* hashes. At 100 TB you'd swap the char
fold for ``xxhash64`` (one JVM intrinsic vs a per-char loop) via the
``fast=`` flag on the operators — semantics identical, hash family
different, no oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 2**31 - 1  # Mersenne prime modulus
CHAR_B = 31

# MinHash permutation parameters a_j, b_j (a_j odd, non-zero mod P)
_A_MULT = 2654435761
_B_MULT = 40503


def minhash_params(num_perm: int) -> list[tuple[int, int]]:
    return [
        ((2 * j + 1) * _A_MULT % P or 1, (j * _B_MULT + 17) % P)
        for j in range(num_perm)
    ]


# -- char-fold string hash ----------------------------------------------------

def str_fold(col: Column) -> Column:
    """Polynomial char fold of a string column → long in [0, P)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.ascii(col.substr(i, F.lit(1))).cast("long"),
    )
    folded = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * CHAR_B + c) % P
    )
    # sequence(1, 0) would DESCEND in Spark; guard empty strings explicitly
    return F.when(F.length(col) == 0, F.lit(0).cast("long")).otherwise(folded)


def str_fold_sql(expr: str) -> str:
    """DuckDB equivalent of str_fold over the SQL expression ``expr``."""
    return (
        f"CASE WHEN len({expr}) = 0 THEN 0 ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(ascii(substr({expr}, i, 1)) AS BIGINT) for i in range(1, len({expr})+1)]), "
        f"(a, c) -> (a*{CHAR_B} + c) % {P}) END"
    )


# -- tokenization (shared semantics with functions/text.tokens) -----------------

def tokens_sql(expr: str) -> str:
    return f"[t for t in string_split_regex(trim({expr}), '\\s+') if t <> '']"


# -- k-token shingles -----------------------------------------------------------

def shingle_hashes(tokens_col: Column, k: int = 3) -> Column:
    """Distinct hashes of k-token shingles (tokens joined by a single
    space, then char-folded). Short docs (< k tokens) hash the whole
    token string as one shingle."""
    n = F.size(tokens_col)
    joined = F.array_join(tokens_col, " ")
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(tokens_col, i + 1, k), " "),
        ),
    ).otherwise(F.array(joined))
    return F.array_distinct(F.transform(shingles, str_fold))


def shingles_from_tokens_sql(toks_expr: str, k: int = 3) -> str:
    """DuckDB shingle-array expression over a token-array expression
    (use inside a CTE pipeline: tokens → shingles → hashes)."""
    return (
        f"CASE WHEN len({toks_expr}) >= {k} "
        f"THEN [array_to_string(({toks_expr})[i:i+{k-1}], ' ') "
        f"for i in range(1, len({toks_expr})-{k-1}+1)] "
        f"ELSE [array_to_string({toks_expr}, ' ')] END"
    )


def hashes_from_shingles_sql(shingles_expr: str) -> str:
    return f"list_distinct([{str_fold_sql('s')} for s in ({shingles_expr})])"


# -- MinHash signature ------------------------------------------------------------

def _perm_fn(a: int, b: int):
    # closure factory: PySpark introspects lambda arity, so default-arg
    # tricks (lambda h, a=a: ...) read as multi-arg lambdas and fail
    return lambda h: (F.lit(a) * h + F.lit(b)) % P


def minhash_signature(hashes_col: Column, num_perm: int) -> Column:
    parts = [
        F.array_min(F.transform(hashes_col, _perm_fn(a, b)))
        for a, b in minhash_params(num_perm)
    ]
    return F.array(*parts)


def minhash_signature_sql(hashes_expr: str, num_perm: int) -> str:
    parts = [
        f"list_min([({a}*h + {b}) % {P} for h in ({hashes_expr})])"
        for a, b in minhash_params(num_perm)
    ]
    return "[" + ", ".join(parts) + "]"


# -- SimHash (32-bit) ----------------------------------------------------------------

def simhash32(hashes_col: Column) -> Column:
    """32-bit SimHash over a token/shingle hash array: per bit, majority
    vote of +-1; vote > 0 sets the bit."""
    def _vote_fn(b: int):
        # h >> b as arithmetic (F.shiftright rejects lambda variables);
        # floor division by 2^b is exact for h < 2^31 < 2^53
        div = 2**b
        return lambda acc, h: acc + (F.floor(h / F.lit(div)).cast("long") % 2) * 2 - 1

    def bit(b):
        vote = F.aggregate(hashes_col, F.lit(0).cast("long"), _vote_fn(b))
        return F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))

    return F.aggregate(
        F.array(*[bit(b) for b in range(32)]),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash32_sql(hashes_expr: str) -> str:
    bits = ", ".join(
        f"CASE WHEN list_sum([((h >> {b}) & 1)*2 - 1 for h in ({hashes_expr})]) > 0 "
        f"THEN CAST({2**b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(32)
    )
    return f"CAST(list_sum([{bits}]) AS BIGINT)"


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


# -- SimHash (64-bit, segmented) ------------------------------------------------------
#
# Scale-grade blocking needs a bucket space far larger than the 4x256
# buckets 1-byte blocks of a 32-bit signature give (at 1e9 docs a 1,024-
# bucket scheme puts ~1e6 rows in every bucket and the pair join
# explodes). The 64-bit signature is held as 4 independent 16-bit
# SEGMENTS — segment s is a 16-bit simhash over the s-th universal-hash
# permutation of the shingle hashes — giving 4 x 65,536 = 262,144 blocks,
# and exact-match-on-a-segment recall is guaranteed for hamming <= 3
# (pigeonhole over 4 segments) and probabilistic at 4. Segments avoid
# signed-64-bit overflow entirely (each value < 2^16), and the permuted
# products stay < P^2 < 2^63 on both engines.

SIMHASH_SEGS = 4
SIMHASH_SEG_BITS = 16


def simhash_seg_params(n_segs: int = SIMHASH_SEGS) -> list[tuple[int, int]]:
    """Per-segment universal-hash permutation constants (a_s odd, mod P)."""
    return [
        ((2 * s + 3) * _A_MULT % P or 1, (s * _B_MULT + 101) % P)
        for s in range(n_segs)
    ]


def simhash_segments_sql(
    hashes_expr: str,
    n_segs: int = SIMHASH_SEGS,
    seg_bits: int = SIMHASH_SEG_BITS,
) -> str:
    """DuckDB twin of simhash_segments (a list of n_segs BIGINTs)."""
    segs = []
    for a, c in simhash_seg_params(n_segs):
        bits = ", ".join(
            f"CASE WHEN list_sum([(((({a}*h + {c}) % {P}) >> {b}) & 1)*2 - 1 "
            f"for h in ({hashes_expr})]) > 0 "
            f"THEN CAST({2**b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            for b in range(seg_bits)
        )
        segs.append(f"CAST(list_sum([{bits}]) AS BIGINT)")
    return "[" + ", ".join(segs) + "]"


# -- driver-side xxHash64 (Spark-compatible) ----------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """Pure-Python XXH64 (public xxHash spec) over raw bytes, default
    seed 42 = Spark's ``F.xxhash64`` on a string column's UTF-8 bytes.
    Lets the driver compute a key's lake bucket (``bucket_expr`` =
    pmod(xxhash64(key), B)) without launching a one-row Spark job — the
    point-lookup planner's hash. Returns the UNSIGNED 64-bit value;
    callers emulating Spark's signed long must reinterpret."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = (h * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = ((_rotl(h ^ k, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XXP1) & _M64
        h = ((_rotl(h, 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h
