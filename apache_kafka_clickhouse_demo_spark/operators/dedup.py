"""Document deduplication operators (SURVEY.md §2.7 beyond-parity layer).

Five dedup families, each DataFrame-native and shuffle-frugal:

- exact          : hash-groupBy on normalized text (one shuffle on a 16-byte
                   key; at 100 TB this is the cheapest possible dedup).
- minhash_lsh    : shingle -> MinHash signature (row-local, inside the scan
                   stage) -> band -> bucket self-join (shuffle on band keys
                   only) -> exact-Jaccard verify of the candidate pairs.
- simhash        : 48-bit SimHash + pigeonhole chunk-join: for Hamming
                   distance <= d, split the fingerprint into d+1 chunks —
                   any near-dup pair shares at least one identical chunk, so
                   the join on (chunk_idx, chunk_value) is EXACT, not
                   approximate, and never compares all pairs.
- ngram_jaccard  : exact word-set Jaccard over candidate pairs (all-pairs at
                   test scale; compose with minhash_lsh candidates at 100 TB).
- embedding      : cosine >= t near-dup pairs over embedding vectors
                   (brute pairs at test scale; random-hyperplane LSH is the
                   scale path, see similarity.py).

All hash arithmetic uses the engine-portable h48 family
(functions/hashing.py) so every operator here has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions import hashing as H
from apache_kafka_clickhouse_demo_spark.functions import text as TX
from apache_kafka_clickhouse_demo_spark.functions import vectors as V

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical (normalized) texts; keep the smallest id as canonical.

    One shuffle on md5(normalized text) — constant-width key regardless of
    document size, so the shuffle volume is rows x ~50B even at 100 TB.
    """
    key = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        docs.groupBy(key.alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 12,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, shingles, sig): row-local — runs inside the scan stage."""
    toks = TX.tokens(text_col)
    sh = F.array_distinct(TX.word_shingles(toks, shingle_n))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        sh.alias("shingles"),
    ).withColumn("sig", H.minhash_signature(F.col("shingles"), num_perm))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified by exact Jaccard.

    Plan shape at scale: scan -> (row-local signatures) -> posexplode bands
    -> self-join on (band, band_key) [the ONLY data-sized shuffle, and its
    keys are 8-byte band hashes] -> distinct candidate pairs -> join back for
    shingle sets -> exact Jaccard filter.  Identical-document clusters make
    the band key skewed; AQE skew-join handles it (enabled in session.py).
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands

    sigs = minhash_signatures(docs, text_col, id_col, num_perm, shingle_n)

    band_keys = F.array(
        *[
            F.concat_ws("-", F.slice("sig", j * rows_per_band + 1, rows_per_band))
            for j in range(bands)
        ]
    )
    banded = sigs.select("doc_id", F.posexplode(band_keys).alias("band", "band_key"))

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )

    sh = sigs.select("doc_id", "shingles")
    verified = (
        cand.join(sh.alias("sa"), cand.id_a == F.col("sa.doc_id"))
        .join(sh.alias("sb"), cand.id_b == F.col("sb.doc_id"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sa.shingles", "sb.shingles")).cast("double")
                / F.size(F.array_distinct(F.concat("sa.shingles", "sb.shingles")))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 48  # matches the h48 domain


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash): 48-bit SimHash over token h48 hashes.

    bit_i(doc) = 1 iff more than half the tokens have bit_i set
    (strict majority; ties -> 0).  Row-local, builtins only.
    """
    hashed = F.transform(TX.tokens(text_col), lambda t: H.h48(t))
    base = docs.select(F.col(id_col).alias("doc_id"), hashed.alias("hashed"))

    def _bit_counter(i: int):
        # i must be bound via closure: a defaulted lambda param would be
        # counted as a third higher-order-function argument by PySpark.
        return lambda acc, h: acc + F.shiftright(h, i).bitwiseAND(F.lit(1))

    ones = [
        F.aggregate("hashed", F.lit(0).cast("long"), _bit_counter(i))
        for i in range(SIMHASH_BITS)
    ]
    sim = None
    for i, o in enumerate(ones):
        term = F.when(o * 2 > F.size("hashed"), F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return base.select("doc_id", sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole chunking: split 48 bits into (max_hamming + 1) chunks; any
    pair within distance d shares >= 1 identical chunk, so joining on
    (chunk_idx, chunk_value) finds ALL qualifying pairs without an all-pairs
    comparison — this is what makes the operator viable at 100 TB.
    """
    n_chunks = max_hamming + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    sims = simhash(docs, text_col, id_col)

    chunks = F.array(
        *[
            F.shiftright("simhash", j * chunk_bits).bitwiseAND(F.lit((1 << chunk_bits) - 1))
            for j in range(n_chunks)
        ]
    )
    chunked = sims.select("doc_id", "simhash", F.posexplode(chunks).alias("chunk_idx", "chunk_val"))

    pairs = (
        chunked.alias("a")
        .join(
            chunked.alias("b"),
            on=[
                F.col("a.chunk_idx") == F.col("b.chunk_idx"),
                F.col("a.chunk_val") == F.col("b.chunk_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )
    return pairs


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact Jaccard over distinct word n-gram sets, all qualifying pairs.

    Test-scale form is a self-join (broadcast one side); the 100 TB form is
    minhash_lsh_pairs (same verify expression, LSH candidate generation).
    """
    toks = TX.tokens(text_col)
    sets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(TX.word_shingles(toks, shingle_n)).alias("grams"),
    )
    return (
        sets.alias("a")
        .join(F.broadcast(sets.alias("b")), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                F.size(F.array_intersect("a.grams", "b.grams")).cast("double")
                / F.size(F.array_distinct(F.concat("a.grams", "b.grams")))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Pairs of vectors with cosine >= threshold.

    Brute pairs at test scale (broadcast self-join).  The 100 TB path
    bucketizes with random-hyperplane LSH first (similarity.rp_lsh_buckets)
    and runs this verify within buckets.
    """
    vecs = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    return (
        vecs.alias("a")
        .join(F.broadcast(vecs.alias("b")), F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            V.cosine("a.v", "b.v").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )
