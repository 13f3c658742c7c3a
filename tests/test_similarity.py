"""Similarity search: brute-force exactness vs numpy, LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.similarity import (
    cosine_topk,
    embedding_near_duplicates,
    lsh_topk,
)
from event_pipeline_spark.session import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def numpy_topk(emb_rows, query_ids, k):
    ids = np.array([r["vec_id"] for r in emb_rows])
    mat = np.array([r["embedding"] for r in emb_rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for qid in query_ids:
        qv = mat_n[ids == qid][0]
        scores = mat_n @ qv
        order = sorted(
            [(s, i) for s, i in zip(scores, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )
        out[qid] = [i for _, i in order[:k]]
    return out


def test_bruteforce_matches_numpy(emb, queries):
    rows = emb.collect()
    expected = numpy_topk(rows, [0, 1, 2, 3, 4], 5)
    got = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["corpus_id"])
    assert by_q == expected


def test_lsh_recall(emb, queries):
    exact = {
        (r["query_id"], r["corpus_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["corpus_id"])
        for r in lsh_topk(emb, queries, k=5, n_planes=4, n_tables=8).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"LSH recall@5 = {recall}"


def test_neardup_pairs_verified(emb):
    rows = embedding_near_duplicates(
        emb, threshold=0.45, n_planes=4, n_tables=8
    ).collect()
    assert all(r["cosine"] >= 0.45 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_ivf_recall(emb, queries):
    from event_pipeline_spark.operators.similarity import ivf_topk, train_ivf_centroids

    exact = {
        (r["query_id"], r["corpus_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    centroids = train_ivf_centroids(emb, n_clusters=8)
    assert centroids.shape == (8, 64)
    approx = {
        (r["query_id"], r["corpus_id"])
        for r in ivf_topk(emb, queries, centroids, k=5, n_probe=3).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 = {recall}"


def test_kmeans_quality_and_determinism(spark, sf_dir):
    """The fixture's `label` column is NOT geometric (vectors are random;
    a label/cluster cross-tab is uniform), so the check is intrinsic:
    k-means cost (within-cluster SSE) clearly beats random assignment on
    the same data, and a fixed seed reproduces the assignment."""
    from event_pipeline_spark.operators.similarity import cluster_embeddings
    from event_pipeline_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = cluster_embeddings(emb, "embedding", k=8)
    rows = out.select("vec_id", "embedding", "cluster").collect()

    vecs = np.array([r["embedding"] for r in rows])
    assign = np.array([r["cluster"] for r in rows])

    def sse(labels):
        total = 0.0
        for c in np.unique(labels):
            pts = vecs[labels == c]
            total += ((pts - pts.mean(axis=0)) ** 2).sum()
        return total

    rng = np.random.default_rng(0)
    random_sse = sse(rng.integers(0, 8, len(vecs)))
    assert sse(assign) < 0.97 * random_sse

    again = {
        r["vec_id"]: r["cluster"]
        for r in cluster_embeddings(emb, "embedding", k=8).collect()
    }
    assert again == {r["vec_id"]: r["cluster"] for r in rows}
