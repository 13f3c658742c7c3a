"""Similarity search over embedding columns (north-star surface).

Two paths, one semantic:

- **brute force** — exact cosine top-k. Dot products run as
  ``F.zip_with`` + ``F.aggregate`` (JVM-side, no Python). Per-query
  cost is one scan; right for small query batches or as the recall
  oracle. Top-k per query via window row_number (WindowGroupLimit
  pushes the k cutoff into the sort).
- **LSH (random hyperplanes)** — sign-bit signature over fixed random
  hyperplanes → bucket join on signature blocks → exact cosine re-rank
  inside buckets. The 100 TB path: candidate generation shuffles
  (block, value, id) rows only; re-rank touches a tiny candidate set.
  Hyperplanes are seeded deterministically and built as literal arrays
  (broadcast with the plan).

An IVF variant (k-means coarse quantizer) is the classic third option;
with no trained codebook shipped, LSH is the stateless choice.

Registered queries (rows-only; LSH recall vs brute force asserted in
tests/test_similarity.py): ``sim_topk_bruteforce``, ``sim_lsh_topk``,
``sim_embedding_neardup``.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _register(name: str, fn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return read_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# vector math as Catalyst expressions
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


# ---------------------------------------------------------------------------
# brute-force top-k
# ---------------------------------------------------------------------------


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` is expected to be small (a batch of probes) — it is
    broadcast, so the corpus is scanned once with no shuffle of vectors;
    only (query_id, corpus_id, score) triples shuffle for the window.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col(query_id_col) != F.col("corpus_id"))
        .select(
            query_id_col,
            "corpus_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH: random hyperplane signatures
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign bit per hyperplane, packed into a long per 16-plane block is
    done by the caller; here: array<int> of 0/1."""
    return F.array(
        *[
            F.when(
                dot(vec, F.array(*[F.lit(w) for w in plane])) >= 0, 1
            ).otherwise(0)
            for plane in planes
        ]
    )


def lsh_buckets(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(table, bucket, id, vec) rows: one signature per hash table, each
    from an independent set of hyperplanes. More tables = higher recall."""
    out = None
    v = as_double(F.col(vec_col))
    for t in range(n_tables):
        planes = _hyperplanes(64, n_planes, seed=seed + 1000 * t)
        bits = signature_bits(v, planes)
        bucket = F.aggregate(
            bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
        )
        part = df.select(
            F.lit(t).alias("table"),
            bucket.alias("bucket"),
            F.col(id_col).alias("_id"),
            v.alias("_vec"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    n_tables: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing any LSH
    bucket with the query in any table, re-ranked by exact cosine."""
    cb = lsh_buckets(corpus, id_col=id_col, vec_col=vec_col,
                     n_planes=n_planes, n_tables=n_tables)
    qb = lsh_buckets(queries, id_col=query_id_col, vec_col=vec_col,
                     n_planes=n_planes, n_tables=n_tables)
    cand = (
        cb.alias("c")
        .join(
            F.broadcast(qb.alias("q")),
            (F.col("c.table") == F.col("q.table"))
            & (F.col("c.bucket") == F.col("q.bucket")),
        )
        .select(
            F.col("q._id").alias(query_id_col),
            F.col("c._id").alias("corpus_id"),
            F.col("c._vec").alias("cv"),
            F.col("q._vec").alias("qv"),
        )
        .dropDuplicates([query_id_col, "corpus_id"])
    )
    scored = (
        cand.where(F.col(query_id_col) != F.col("corpus_id"))
        .select(
            query_id_col,
            "corpus_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 6,
) -> DataFrame:
    """Near-dup pairs by cosine >= threshold, candidates via shared LSH
    buckets (self-join on narrow bucket rows, then exact re-check)."""
    b = lsh_buckets(df, id_col=id_col, vec_col=vec_col,
                    n_planes=n_planes, n_tables=n_tables)
    left, right = b.alias("l"), b.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._vec").alias("va"),
            F.col("r._vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


def q_sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = (
        emb.where(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return cosine_topk(emb, queries, k=5).orderBy("query_id", "rank")


_register("sim_topk_bruteforce", q_sim_topk_bruteforce)


def q_sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH params calibrated for this corpus: embeddings are near-random
    (max pairwise cosine ≈ 0.48), so short signatures (4 planes) + many
    tables keep recall high; tighter corpora warrant longer signatures."""
    emb = _emb(spark, sf_dir)
    queries = (
        emb.where(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return lsh_topk(emb, queries, k=5, n_planes=4, n_tables=8).orderBy(
        "query_id", "rank"
    )


_register("sim_lsh_topk", q_sim_lsh_topk)


def q_sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold 0.45 ≈ the corpus's 99.9th-percentile pairwise cosine —
    'near-dup' is meaningful only relative to the similarity distribution
    (this synthetic corpus has no true clones)."""
    return embedding_near_duplicates(
        _emb(spark, sf_dir), threshold=0.45, n_planes=4, n_tables=8
    ).orderBy("id_a", "id_b")


_register("sim_embedding_neardup", q_sim_embedding_neardup)
