"""WordPiece segmentation (operators/wordpiece.py).

Pins the three defining behaviors: longest-match-first, no
backtracking (greedy dead ends -> [UNK]), and ## continuation
prefixing.
"""

from __future__ import annotations


def _seg(spark, words, vocab=None, **kw):
    from event_pipeline_spark.operators.wordpiece import (
        FROZEN_VOCAB,
        wordpiece_segment,
    )

    df = spark.createDataFrame([(w,) for w in words], "word string")
    out = wordpiece_segment(
        df, vocab=vocab or FROZEN_VOCAB, **kw
    ).collect()
    return {r["word"]: list(r["pieces"]) for r in out}


def test_frozen_vocab_hand_splits(spark):
    got = _seg(
        spark,
        ["customer", "spark", "join", "agg", "a", "query"],
    )
    assert got["customer"] == ["cust", "##om", "##er"]
    assert got["spark"] == ["sp", "##ark"]
    assert got["join"] == ["join"]
    assert got["agg"] == ["ag", "##g"]
    assert got["a"] == ["a"]
    assert got["query"] == ["qu", "##ery"]


def test_longest_match_beats_shorter_decomposition(spark):
    """'hash' and 'filt' are whole/4-char pieces even though
    'ha'/'##sh' and 'fil'/'##ter' could also spell the words —
    greedy must take the longest."""
    got = _seg(spark, ["hash", "filter"])
    assert got["hash"] == ["hash"]
    assert got["filter"] == ["filt", "##er"]


def test_greedy_dead_end_is_unk(spark):
    """Wu et al. greedy does not backtrack: vocab {ab, abc, ##cd}
    sends 'abcd' to [UNK] even though ab + ##cd would work."""
    got = _seg(spark, ["abcd"], vocab=("ab", "abc", "##cd"))
    assert got["abcd"] == ["[UNK]"]


def test_unknown_word_and_piece_budget(spark):
    got = _seg(spark, ["zzz"])
    assert got["zzz"] == ["[UNK]"]
    # a word needing more pieces than max_pieces dies too
    got = _seg(
        spark, ["aaaa"], vocab=("a", "##a"), max_pieces=3
    )
    assert got["aaaa"] == ["[UNK]"]
    got = _seg(spark, ["aaaa"], vocab=("a", "##a"), max_pieces=4)
    assert got["aaaa"] == ["a", "##a", "##a", "##a"]


def test_full_corpus_vocabulary_covered(spark, sf_dir):
    """Every corpus word segments without [UNK] under FROZEN_VOCAB
    (the vocabulary-completeness contract the registered query
    relies on)."""
    from event_pipeline_spark.operators.wordpiece import (
        q_wordpiece_tokens,
    )

    rows = q_wordpiece_tokens(spark, sf_dir).collect()
    assert len(rows) >= 30
    assert all("[UNK]" not in r["pieces"] for r in rows)
    # reassembling pieces (minus ##) reproduces the word
    for r in rows:
        joined = "".join(
            p.removeprefix("##") for p in r["pieces"].split(" ")
        )
        assert joined == r["word"]


def test_oov_rate_hand_case(spark):
    from event_pipeline_spark.operators.wordpiece import oov_rate_by_lang

    # 'the big hash' all segment; 'zzz' and 'qqq' cannot (no z/q##
    # continuations); 'zzz' appears twice in de so occurrences weigh
    docs = spark.createDataFrame(
        [
            (1, "the big hash", "en"),
            (2, "zzz the zzz", "de"),
            (3, "qqq", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = {r["lang"]: r for r in oov_rate_by_lang(docs).collect()}
    en, de = rows["en"], rows["de"]
    assert (en["n_types"], en["n_occ"], en["unk_occ"]) == (3, 3, 0)
    assert en["oov_rate"] == 0.0
    # de: types {zzz, the, qqq}; occ = 4; unk occ = 2 (zzz) + 1 (qqq)
    assert (de["n_types"], de["n_occ"]) == (3, 4)
    assert (de["unk_types"], de["unk_occ"]) == (2, 3)
    assert de["oov_rate"] == 0.75
