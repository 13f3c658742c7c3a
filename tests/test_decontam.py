"""Decontamination extensions: n-gram novelty (the converse
readout of contamination scanning)."""

from __future__ import annotations


def test_ngram_novelty_hand_case(spark):
    """3-gram novelty by hand: a doc fully covered by the reference
    scores 0; a half-covered doc scores its exact share; short docs
    are absent."""
    from event_pipeline_spark.operators.decontam import ngram_novelty

    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),      # grams both in ref -> 0
            (2, "the quick brown cat naps"), # 1 of 3 grams in ref
            (3, "too short"),                # < 3 tokens: no row
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(docs, ref, n=3).collect()
    }
    assert got[1] == (2, 0, 0.0)
    assert got[2] == (3, 2, 0.6666667)
    assert 3 not in got
