

def test_readability_closed_form(spark):
    """Hand check: 'the cat sat. it ran!' -> 5 words, 2 sentences,
    vowel groups e/a/a/i/a = 5, no silent e -> 5 syllables;
    'make code' -> 2 words, 1 sentence, groups a/e/o/e = 4 minus
    silent-e 'ke ' and 'de$' = 2 spoken syllables."""
    from event_pipeline_spark.operators.filtering import readability_scores

    docs = spark.createDataFrame(
        [(1, "the cat sat. it ran!"), (2, "make code"), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    r1 = rows[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 5)
    assert r1["flesch"] == round(206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5), 4)
    assert r1["fk_grade"] == round(0.39 * (5 / 2) + 11.8 * (5 / 5) - 15.59, 4)
    r2 = rows[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (2, 1, 2)
    assert 3 not in rows  # whitespace-only doc drops (no words)
