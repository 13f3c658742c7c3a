"""Unigram-LM (SentencePiece) tokenizer: Viterbi optimality vs a
brute-force reference, greedy divergence, the tie rule, and UNK paths.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.unigram import (
    FROZEN_UNIGRAM,
    MAX_LEN,
    UNK,
    q_unigram_tokens,
    unigram_segment,
)


def _viterbi_ref(word: str, vocab: dict[str, int]) -> tuple[list[str], int]:
    """Brute-force max-score segmentation (enumerates ALL
    segmentations; tie -> the one the engine's rule picks is checked
    separately, here we only need the max score)."""
    n = len(word)
    best_score = None
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        pieces = [word[a:b] for a, b in zip(pos, pos[1:])]
        if any(p not in vocab for p in pieces):
            continue
        s = sum(vocab[p] for p in pieces)
        if best_score is None or s > best_score:
            best_score, best = s, pieces
    return best, best_score


def _greedy_ref(word: str, vocab: dict[str, int]) -> list[str] | None:
    """WordPiece-style greedy longest-match over the same vocabulary."""
    out, pos = [], 0
    lmax = max(len(p) for p in vocab)
    while pos < len(word):
        for length in range(min(lmax, len(word) - pos), 0, -1):
            p = word[pos:pos + length]
            if p in vocab:
                out.append(p)
                pos += length
                break
        else:
            return None
    return out


@pytest.fixture(scope="module")
def segmented(spark, sf_dir):
    return {
        r["word"]: r
        for r in q_unigram_tokens(spark, sf_dir).collect()
    }


def test_viterbi_is_optimal_on_every_corpus_word(segmented):
    for word, row in segmented.items():
        _, ref_score = _viterbi_ref(word, FROZEN_UNIGRAM)
        assert ref_score is not None, word
        assert row["logp_units"] == ref_score, word
        pieces = row["pieces"].split(" ")
        assert "".join(pieces) == word
        assert sum(FROZEN_UNIGRAM[p] for p in pieces) == ref_score
        assert row["n_pieces"] == len(pieces)


def test_viterbi_diverges_from_greedy_where_probabilities_say_so(
    segmented,
):
    """The cases greedy longest-match gets WRONG: a longer piece exists
    but the factored segmentation scores higher."""
    expect_diverge = {
        "table": ("ta ble", ["table"]),
        "customer": ("cust omer", ["custom", "er"]),
        "filter": ("fil ter", ["filt", "er"]),
        "scan": ("sc an", ["sca", "n"]),
    }
    for word, (viterbi, greedy) in expect_diverge.items():
        assert segmented[word]["pieces"] == viterbi
        assert _greedy_ref(word, FROZEN_UNIGRAM) == greedy
    # ...and the case where the whole word justly wins on probability
    assert segmented["window"]["pieces"] == "window"
    # greedy agrees with Viterbi only when probabilities happen to align
    n_diverge = sum(
        1
        for w, r in segmented.items()
        if _greedy_ref(w, FROZEN_UNIGRAM) != r["pieces"].split(" ")
    )
    assert n_diverge == len(expect_diverge)


def test_tie_breaks_to_longest_last_piece(spark):
    """Equal-score segmentations resolve to the longest last piece:
    'abab' under lp(a)=lp(b)=-10, lp(ab)=-20, lp(abab)=-40 scores -40
    every way; the engine must pick the whole word."""
    vocab = {"a": -10, "b": -10, "ab": -20, "abab": -40}
    words = spark.createDataFrame([("abab",), ("aba",)], ["word"])
    rows = {
        r["word"]: r
        for r in unigram_segment(words, vocab=vocab, max_len=4).collect()
    }
    assert rows["abab"]["pieces"] == ["abab"]
    assert rows["abab"]["logp_units"] == -40
    # 'aba': a+b+a = ab+a = -30; last piece 'a' forced (no 'ba'),
    # previous step ties a+b vs ab -> longest wins
    assert rows["aba"]["pieces"] == ["ab", "a"]


def test_unk_paths(spark):
    """Uncovered character or over-length word -> single [UNK], NULL
    score."""
    words = spark.createDataFrame(
        [("zebra",), ("a" * (MAX_LEN + 1),), ("batch",)], ["word"]
    )
    rows = {r["word"]: r for r in unigram_segment(words).collect()}
    assert rows["zebra"]["pieces"] == [UNK]  # 'z' uncovered
    assert rows["zebra"]["logp_units"] is None
    assert rows["a" * (MAX_LEN + 1)]["pieces"] == [UNK]
    assert rows["batch"]["pieces"] == ["batch"]


def test_character_coverage_no_unk_on_corpus(segmented):
    assert all(r["pieces"] != UNK for r in segmented.values())


def test_segmentation_plan_is_one_arrow_udf(spark, sf_dir):
    """Round-11 regression guard: the DP must reach the engine as ONE
    Arrow-batched UDF over the distinct-word table — the former
    unrolled-projection form fused into a whole-stage-codegen method
    beyond janino's 64 KB limit, silently dropping the corpus-side
    aggregate to interpreted execution."""
    plan = (
        q_unigram_tokens(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
