"""Label-centroid cosine matrix (operators/centroids.py).

Closed-form oracle: centroids and cosine resolved by hand on 2-d
vectors.
"""

from __future__ import annotations


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_closed_form_cosine(spark):
    from event_pipeline_spark.operators.centroids import (
        centroid_cosine_matrix,
    )

    # label 0 -> centroid (1, 0); label 1 -> centroid (0, 1);
    # label 2 -> centroid (1, 1)/sqrt-free units
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 1),
        (4, [1.0, 1.0], 2),
    ]
    out = {
        (r["label_a"], r["label_b"]): r
        for r in centroid_cosine_matrix(_emb(spark, rows)).collect()
    }
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    assert out[(0, 1)]["cosine"] == 0.0
    assert out[(0, 2)]["cosine"] == round(1 / 2**0.5, 7)
    r01 = out[(0, 1)]
    assert (r01["n_a"], r01["n_b"]) == (2, 1)
    # units: 1.0 -> 1e7; norms exact
    assert r01["norm_a_units"] == 10**14
    assert r01["dot_units"] == 0


def test_centroid_is_integer_mean(spark):
    from event_pipeline_spark.operators.centroids import (
        label_centroid_units,
    )

    # mean of 0.1 and 0.2 = 0.15 -> floor-div units (1e6+2e6)//2
    rows = [(1, [0.1], 0), (2, [0.2], 0)]
    got = label_centroid_units(_emb(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    # float32(0.1)*1e7 rounds to 1000000, float32(0.2)*1e7 to 2000000
    assert r["cu"] == (1_000_000 + 2_000_000) // 2
    assert r["n"] == 2


def test_no_vector_pair_join(spark):
    """The plan joins centroid tables (labels x dims), never vector
    rows against vector rows — no cartesian/BNLJ."""
    from event_pipeline_spark.operators.centroids import (
        centroid_cosine_matrix,
    )

    rows = [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)]
    plan = (
        centroid_cosine_matrix(_emb(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
