"""BPE trainer/applier: the classic textbook merge sequence, tie-break
determinism, word-boundary safety, and round-trip consistency between
training segmentation and inference segmentation."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_pipeline_spark.operators.bpe import (
    EOW,
    apply_bpe,
    segment_word,
    train_bpe,
    train_bpe_distributed,
    word_vocab,
)


def test_textbook_merge_sequence():
    """The canonical low/lower/newest/widest example: with these counts
    the first merges must assemble 'es'+'t'+EOW (the shared suffix of
    the 9 newest + widest) before anything else."""
    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(vocab, 4)
    assert merges[0] == ("e", "s")      # 9 occurrences
    assert merges[1] == ("es", "t")     # 9
    assert merges[2] == ("est", EOW)    # 9
    assert merges[3] == ("l", "o")      # 7
    # greedy inference reproduces the training segmentation
    ranks = {p: i for i, p in enumerate(merges)}
    assert segment_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    assert segment_word("low", ranks) == ["lo", "w", EOW]


def test_tie_break_is_lexical_and_deterministic():
    vocab = [("ab", 3), ("cd", 3)]  # (a,b) and (c,d) tie at 3
    assert train_bpe(vocab, 1)[0] == ("a", "b")
    assert train_bpe(list(reversed(vocab)), 1)[0] == ("a", "b")


def test_merges_never_cross_word_boundaries():
    """EOW terminates every word, so no merge can join two words even
    in a pathological corpus of repeated identical bigrams."""
    merges = train_bpe([("aa", 100)], 10)
    for a, b in merges:
        assert EOW not in a  # EOW can only ever be a right element
    ranks = {p: i for i, p in enumerate(merges)}
    assert "".join(segment_word("aa", ranks)) == "aa" + EOW


def test_distributed_vocab_matches_local_count(spark):
    df = spark.createDataFrame(
        [(1, "b a a"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    got = {(r["word"], r["count"]) for r in word_vocab(df, "text").collect()}
    assert got == {("a", 3), ("b", 2), ("c", 1)}


def test_apply_bpe_over_corpus(spark):
    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest")], "doc_id long, text string"
    )
    merges = train_bpe_distributed(df, "text", num_merges=6)
    out = {r["id"]: r for r in apply_bpe(df, "text", merges).collect()}
    # every word reassembles exactly from its tokens
    assert "".join(out[2]["tokens"]) == "newest" + EOW
    assert "".join(out[1]["tokens"]) == "low" + EOW + "low" + EOW + "lower" + EOW
    assert out[1]["n_tokens"] == len(out[1]["tokens"])
    # 'low' appears 3 times in the tiny corpus -> merged to one symbol
    assert "low" + EOW in out[1]["tokens"]
