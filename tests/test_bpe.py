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


def test_frozen_merge_replace_chain_equals_greedy_segmentation():
    """The oracle's in-rank-order replace-chain model (boundary-safe
    double-comma encoding) must equal greedy lowest-rank-first
    segment_word for the frozen TRAINED merge table — the equivalence
    q_pack_sequences_bpe's DuckDB oracle relies on."""
    import random

    from event_pipeline_spark.operators.bpe import (
        FROZEN_MERGES,
        segment_word,
    )

    ranks = {p: i for i, p in enumerate(FROZEN_MERGES)}

    def inorder(word: str) -> list[str]:
        s = ",," + ",,".join(list(word) + ["</w>"]) + ",,"
        for x, y in FROZEN_MERGES:
            s = s.replace(f",{x},,{y},", f",{x}{y},")
        toks = s.split(",,")
        assert toks[0] == "" and toks[-1] == ""
        return toks[1:-1]

    rng = random.Random(0)
    words = {"filter", "customer", "column", "join", "hash", "aaa", "spark"}
    for _ in range(500):
        words.add(
            "".join(
                rng.choices("abcdefghijklmnopqrstuvwxyz", k=rng.randint(1, 10))
            )
        )
    for w in sorted(words):
        assert inorder(w) == segment_word(w, ranks), w


def test_bpe_counts_feed_packing_conservation(spark):
    """Composed path: sum of packed segment lengths == total BPE token
    count, and every sequence except the last is exactly full."""
    from event_pipeline_spark.operators.bpe import FROZEN_MERGES, apply_bpe
    from event_pipeline_spark.operators.packing import pack_sequences
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "customer filter join hash scan column " * (i + 1))
         for i in range(6)],
        "doc_id long, text string",
    )
    toks = apply_bpe(df, "text", FROZEN_MERGES).select(
        F.col("id").alias("doc_id"), "n_tokens"
    )
    total = toks.agg(F.sum("n_tokens")).first()[0]
    segs = pack_sequences(toks, seq_len=32).collect()
    assert sum(r["n"] for r in segs) == total
    per_seq = {}
    for r in segs:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n"]
    last = max(per_seq)
    assert all(v == 32 for s, v in per_seq.items() if s != last)
    assert 0 < per_seq[last] <= 32


def test_materialize_sequences_round_trips_tokens(spark):
    """Materialized id sequences decode back (via the derived vocab) to
    exactly the concatenated token stream in doc order, cut at seq_len."""
    from event_pipeline_spark.operators.bpe import (
        FROZEN_MERGES,
        apply_bpe,
        materialize_sequences,
        token_vocab,
    )

    df = spark.createDataFrame(
        [
            (1, "customer filter join"),
            (2, "hash scan column customer"),
            (3, "join join filter"),
        ],
        "doc_id long, text string",
    )
    toks = apply_bpe(df, "text", FROZEN_MERGES)
    vocab = token_vocab(toks)
    stream: list[str] = []
    for r in sorted(toks.collect(), key=lambda r: r["id"]):
        stream.extend(r["tokens"])

    out = sorted(
        materialize_sequences(df, FROZEN_MERGES, seq_len=7).collect(),
        key=lambda r: r["seq_id"],
    )
    decoded: list[str] = []
    for i, r in enumerate(out):
        ids = [int(x) for x in r["ids"].split(" ")]
        assert r["n"] == len(ids)
        if i < len(out) - 1:
            assert len(ids) == 7  # every sequence but the last is full
        decoded.extend(vocab[j] for j in ids)
    assert decoded == stream


def test_materialize_sequences_empty_docs_skipped(spark):
    from event_pipeline_spark.operators.bpe import (
        FROZEN_MERGES,
        materialize_sequences,
    )

    df = spark.createDataFrame(
        [(1, "join filter"), (2, "   "), (3, "scan")],
        "doc_id long, text string",
    )
    out = materialize_sequences(df, FROZEN_MERGES, seq_len=1000).collect()
    assert len(out) == 1  # one partial sequence; doc 2 contributes nothing


def test_tokenizer_fertility_closed_form(spark):
    """Two langs, hand-computable under an empty merge table: a word
    of L chars segments to its chars plus the </w> end symbol, so
    "ab" -> 3 tokens and "c" -> 2."""
    from event_pipeline_spark.operators.bpe import (
        segment_word,
        tokenizer_fertility,
    )

    assert segment_word("ab", {}) == ["a", "b", "</w>"]
    n_ab, n_c = 3, 2
    docs = spark.createDataFrame(
        [(0, "en", "ab c"), (1, "de", "ab")],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in tokenizer_fertility(docs, []).collect()}
    en, de = rows["en"], rows["de"]
    assert (en["n_docs"], en["n_words"], en["n_bytes"]) == (1, 2, 4)
    assert en["n_tokens"] == n_ab + n_c
    assert en["fertility"] == round((n_ab + n_c) / 2, 6)
    assert de["n_tokens"] == n_ab
    assert de["bytes_per_token"] == round(2 / n_ab, 6)
