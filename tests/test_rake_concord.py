"""RAKE keyphrases (operators/rake.py) and KWIC concordance
(operators/concord.py).

Closed-form oracles: word degree/frequency and phrase scores resolved
by hand on a tiny constructed corpus (the worked example style of
Rose et al. 2010); KWIC windows checked at both document edges.
"""

from __future__ import annotations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_rake_hand_worked(spark):
    from event_pipeline_spark.operators.rake import rake_keyphrases

    # stopwords {the, a}: doc0 -> phrases "red fox" / "lazy dog";
    # doc1 -> "red fox" again and singleton "dog".
    docs = _docs(
        spark,
        ["the red fox a lazy dog", "a red fox the dog"],
    )
    out = {r["phrase"]: r for r in rake_keyphrases(docs).collect()}
    assert set(out) == {"red fox", "lazy dog", "dog"}
    # word stats: red f=2 deg=4, fox f=2 deg=4, lazy f=1 deg=2,
    # dog f=2 deg=3 -> scores red 2, fox 2, lazy 2, dog 1.5
    assert out["red fox"]["score"] == 4.0
    assert out["red fox"]["n_occ"] == 2
    assert out["red fox"]["n_words"] == 2
    assert out["lazy dog"]["score"] == 3.5
    assert out["dog"]["score"] == 1.5
    assert out["dog"]["n_occ"] == 1


def test_rake_multiword_beats_frequent_singleton(spark):
    """RAKE's defining behavior: degree rewards phrase membership, so
    a multi-word phrase outranks an equally frequent single word."""
    from event_pipeline_spark.operators.rake import rake_keyphrases

    docs = _docs(spark, ["deep neural net the net a net"])
    out = {r["phrase"]: r for r in rake_keyphrases(docs).collect()}
    assert out["deep neural net"]["score_units"] > out["net"]["score_units"]


def test_kwic_edges_and_order(spark):
    from event_pipeline_spark.operators.concord import kwic

    docs = _docs(
        spark,
        ["x b c x e", "no hits here", "x tail"],
    )
    rows = kwic(docs, "x", window=2).orderBy("doc_id", "i").collect()
    assert [(r["doc_id"], r["i"]) for r in rows] == [(0, 1), (0, 4), (2, 1)]
    first = rows[0]
    assert (first["left_ctx"], first["right_ctx"]) == ("", "b c")
    mid = rows[1]
    assert (mid["left_ctx"], mid["right_ctx"]) == ("b c", "e")
    tail = rows[2]
    assert (tail["left_ctx"], tail["right_ctx"]) == ("", "tail")


def test_kwic_filter_pushed_to_scan(spark, sf_dir, tmp_path):
    """The contains() pre-filter must reach the parquet scan."""
    from event_pipeline_spark.operators.concord import kwic

    p = str(tmp_path / "docs.parquet")
    _docs(spark, ["a dup b", "plain"]).write.parquet(p)
    plan = (
        kwic(spark.read.parquet(p), "dup")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "StringContains" in plan
