"""Deterministic, engine-portable string hashing for dedup operators.

Spark's native hashes (murmur3 `hash()`, `xxhash64`) have no DuckDB
counterpart, so every hash-based operator here (MinHash-LSH, SimHash,
fingerprinting) is built on a 48-bit integer derived from md5 — a function
both Spark and DuckDB can compute bit-identically, which is what makes the
DuckDB oracle checks of those operators exact rather than approximate.

    h48(s) = int(md5(s)[:12 hex chars], 16)        # in [0, 2^48)

48 bits: every positional term of the hex expansion stays exact in a double
(DuckDB's `16**k` path), while collision probability stays negligible at the
shingle cardinalities involved.

MinHash permutations are the standard universal-hash family
    perm_k(h) = (a_k * (h mod P) + b_k) mod P,   P = 2^31 - 1 (prime)
with (a_k, b_k) drawn from a fixed LCG so Spark expression and oracle SQL are
generated from the same constants.  All arithmetic stays below 2^62, exact in
int64 for both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: hex chars of md5 used for the base hash (48 bits)
H48_HEX_CHARS = 12

#: Mersenne prime for the universal-hash family
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1


def _lcg(seed: int):
    """Tiny deterministic LCG (MMIX constants) — NOT for crypto, only to fix
    the minhash permutation constants identically across engines/rounds."""
    state = seed & 0xFFFFFFFFFFFFFFFF
    while True:
        state = (6364136223846793005 * state + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        yield state


def minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """(a_k, b_k) pairs for `num_perm` permutations; a_k in [1, P), b_k in [0, P)."""
    gen = _lcg(seed)
    params = []
    for _ in range(num_perm):
        a = next(gen) % (MINHASH_PRIME - 1) + 1
        b = next(gen) % MINHASH_PRIME
        params.append((a, b))
    return params


def py_h48(s: str) -> int:
    """Driver-side h48 — the third mirror of the same function (Spark
    expression / DuckDB SQL / Python), used where a DRIVER must agree
    with the engines on a hash route (e.g. which index shard a query
    term's postings live in)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:H48_HEX_CHARS], 16)


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def h48(c: Column | str) -> Column:
    """48-bit md5-derived hash of a string column (long)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col), 1, H48_HEX_CHARS), 16, 10).cast("long")


def h48_mod_p(c: Column | str) -> Column:
    """h48 reduced into the universal-hash domain [0, P)."""
    return h48(c) % F.lit(MINHASH_PRIME)


def minhash_signature(shingles: Column | str, num_perm: int, seed: int = 42) -> Column:
    """MinHash signature (array<long>, length `num_perm`) of a shingle array.

    Row-local expression form (no shuffle) — NOTE: the md5s run in the
    interpreted HOF evaluator here; for the hot path prefer the
    explode+groupBy codegen pipeline in operators.dedup.minhash_signatures,
    which is ~5x faster per core.  Kept for array-level callers.
    """
    sh = F.col(shingles) if isinstance(shingles, str) else shingles
    hashed = F.transform(sh, lambda s: h48_mod_p(s))  # one h48 per shingle
    params = minhash_params(num_perm, seed)
    # ONE pass over the hashed array maintaining all num_perm running mins.
    # (num_perm separate array_min(transform(...)) expressions would make
    # Spark's interpreted higher-order-function evaluator re-walk the array
    # — and recompute the md5s, since HOF lambdas sit outside codegen CSE —
    # num_perm times per row: measured ~12x slower.)
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_perm)

    def step(acc: Column, h: Column) -> Column:
        cands = F.array(
            *[(F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME) for a, b in params]
        )
        return F.zip_with(acc, cands, lambda m, c: F.least(m, c))

    return F.aggregate(hashed, init, step)


# ---------------------------------------------------------------------------
# DuckDB-SQL side (oracle generators) — must mirror the Spark expressions
# bit-for-bit.
# ---------------------------------------------------------------------------


def sql_h48(expr: str) -> str:
    """DuckDB SQL computing h48 of string expression `expr`.

    DuckDB 1.0 lacks hex->int casting, so expand the hex positionally:
    sum over the first 12 hex chars of digit * 16^(11-i) (each term exact
    in the BIGINT domain).
    """
    n = H48_HEX_CHARS
    # outer CAST: DuckDB's list_sum widens to HUGEINT; bring it back to
    # BIGINT so oracle output dtypes match Spark's long.
    return (
        "CAST(list_sum(list_transform(range(1, {n1}), i -> "
        "(strpos('0123456789abcdef', substr(md5({e}), i, 1)) - 1) "
        "* CAST(16**({n} - i) AS BIGINT))) AS BIGINT)"
    ).format(e=expr, n=n, n1=n + 1)


def sql_h48_mod_p(expr: str) -> str:
    return f"({sql_h48(expr)} % {MINHASH_PRIME})"


def sql_minhash_signature(shingles_expr: str, num_perm: int, seed: int = 42) -> str:
    """DuckDB SQL computing the same array<long> signature as
    `minhash_signature` over a DuckDB list expression `shingles_expr`.

    Assumes the surrounding query has already materialized
    `hashed` = list_transform(shingles, s -> h48_mod_p(s)) under the name
    given in `shingles_expr` (pass e.g. 'hashed') to avoid recomputing md5
    per permutation.
    """
    # coalesce to the prime: Spark's F.aggregate returns its INIT array
    # [P, P, ...] for an empty shingle set, while DuckDB's list_min over
    # an empty list is NULL — the sentinel keeps the mirrors bit-identical
    # on degenerate docs (code-review r6)
    parts = [
        f"coalesce(list_min(list_transform({shingles_expr}, "
        f"h -> ({a} * h + {b}) % {MINHASH_PRIME})), {MINHASH_PRIME})"
        for a, b in minhash_params(num_perm, seed)
    ]
    return "[" + ", ".join(parts) + "]"


def sql_hashed_shingles(shingles_expr: str) -> str:
    """DuckDB SQL: list of h48-mod-P values for a list-of-strings expression."""
    return f"list_transform({shingles_expr}, s -> {sql_h48_mod_p('s')})"
