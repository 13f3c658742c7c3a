"""Deduplication operators for LLM-data pipelines (north-star surface).

Five strategies, each with a distinct scale profile:

- **exact** — hash-groupBy on the raw or fingerprinted text. One shuffle
  of (hash, id); at 100 TB you shuffle 16-byte digests, never documents.
- **MinHash + LSH** — shingle → K minhash signatures → b bands × r rows →
  bucket join. Candidate generation shuffles (band_id, band_hash) keys
  only; verification joins shingle sets for candidates, a tiny fraction
  of n². All JVM built-ins (transform/xxhash64/array_min) — no Python in
  the row path.
- **SimHash** — 64-bit signature via per-token hashes majority-voted per
  bit; near-dups = signatures within Hamming distance d, found by the
  standard band-rotation trick (split 64 bits into d+1 blocks; equal
  pairs must share one block exactly).
- **n-gram Jaccard** — exact verification metric on shingle sets
  (array_intersect/array_union), used standalone for small candidate
  sets or as the verify stage after LSH.
- **embedding cosine** — near-dup over vectors; delegated to
  operators/similarity.py's LSH machinery with a threshold.

Registered queries: ``dedup_exact_hash`` [oracle], ``dedup_minhash_pairs``,
``dedup_simhash_pairs``, ``dedup_ngram_jaccard`` (rows-only; recall
against brute-force asserted in tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_pipeline_spark.operators.text import normalized_fingerprint, tokens

QUERIES = {}
ORACLES = {}


def _register(name: str, fn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return read_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplicate groups keyed by md5 of the text. Shuffles digests, not
    documents — the 100 TB-safe form of Q27."""
    return (
        df.select(F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("dupes"))
        .where(F.col("dupes") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact text; returns survivors.
    Implemented as a window-free min-id aggregate + semi join so the wide
    document rows are shuffled once at most."""
    keep = (
        df.select(F.md5(F.col(text_col)).alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep.select(id_col), id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingling + MinHash LSH
# ---------------------------------------------------------------------------


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles as a distinct array. Built-ins only: slide a
    position sequence over the token array."""
    toks = F.transform(tokens(col), F.lower)
    n = F.size(toks)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """K minhash values: min over shingles of xxhash64(seed, shingle).
    One projection; K=64 keeps the signature 512 bytes/doc."""
    def hasher(seed: int):
        # NB: a closure, not a default arg — pyspark binds every lambda
        # parameter (including defaulted ones) to a higher-order-function
        # variable, so `lambda s, seed=seed:` would make seed a Column.
        return lambda s: F.xxhash64(F.lit(seed), s)

    return F.array(
        *[
            F.array_min(F.transform(shingle_col, hasher(seed)))
            for seed in range(num_hashes)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def minhash_candidate_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """LSH banding: docs sharing any (band_id, band_hash) bucket become
    candidate pairs. Returns (id_a, id_b, shingles_a, shingles_b).

    Scale shape: explode emits ``bands`` rows per doc of (band_id,
    64-bit hash, id) — the self-join shuffles those narrow rows, never
    text. Bucket skew (boilerplate docs) is AQE's skew-join case; for
    pathological buckets cap with a per-bucket limit upstream.
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), k_shingle).alias("_sh"),
    ).withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))

    banded = sig.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("_sig")[b * rows + r] for r in range(rows)]).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bucket"),
    ).select("_id", "_sh", "_bucket.band", "_bucket.bh")

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._sh").alias("sh_a"),
            F.col("r._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def minhash_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    k_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate pairs verified by exact Jaccard >= threshold."""
    pairs = minhash_candidate_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        k_shingle=k_shingle,
        num_hashes=num_hashes,
        bands=bands,
    )
    return (
        pairs.withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(col: Column) -> Column:
    """64-bit SimHash from whitespace tokens, entirely in built-ins:
    per-token xxhash64, then per-bit majority vote via aggregate over
    bit tests. 64 shiftright/bitwise ops stay inside codegen."""
    toks = F.transform(tokens(col), F.lower)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(hashes)

    def bit_counter(bit: int):
        # closure, not default arg (see minhash_signature note)
        return lambda acc, h: acc + F.shiftright(h, bit).bitwiseAND(
            F.lit(1)
        ).cast("int")

    out = F.lit(0).cast("long")
    for bit in range(63):  # bit 63 (sign) left 0: keeps ids positive longs
        ones = F.aggregate(hashes, F.lit(0), bit_counter(bit))
        out = out + F.when(
            ones * 2 >= n, F.lit(1 << bit).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within Hamming distance d via block rotation: split the
    64-bit signature into d+1 blocks; any pair within distance d agrees
    exactly on >= 1 block (pigeonhole), so the join key is (block_idx,
    block_value) — narrow rows, one shuffle, no n²."""
    blocks = max_hamming + 1
    width = 64 // blocks
    sigs = df.select(
        F.col(id_col).alias("_id"), simhash64(F.col(text_col)).alias("_sig")
    )
    exploded = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("_sig"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bv"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_sig", "_b.blk", "_b.bv")

    left, right = exploded.alias("l"), exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            hamming64(F.col("l._sig"), F.col("r._sig")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(_docs(spark, sf_dir)).orderBy(F.desc("dupes"), "h")


_register(
    "dedup_exact_hash",
    q_dedup_exact_hash,
    """SELECT md5(text) AS h, COUNT(*) AS dupes FROM documents
       GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY dupes DESC, h""",
)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_near_duplicates(_docs(spark, sf_dir)).orderBy("id_a", "id_b")


_register("dedup_minhash_pairs", q_dedup_minhash)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_duplicates(_docs(spark, sf_dir)).orderBy("id_a", "id_b")


_register("dedup_simhash_pairs", q_dedup_simhash)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over fingerprint-distinct docs of one source —
    the standalone verification form (bounded candidate set)."""
    docs = _docs(spark, sf_dir)
    small = docs.select(
        "doc_id", shingles(F.col("text")).alias("sh"), "source"
    )
    left, right = small.alias("l"), small.alias("r")
    return (
        left.join(
            right,
            (F.col("l.source") == F.col("r.source"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.round(jaccard(F.col("l.sh"), F.col("r.sh")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    )


_register("dedup_ngram_jaccard", q_dedup_ngram_jaccard)
