"""Substring-window dedup (operators/substrings.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_pipeline_spark.operators.substrings import dedup_substring_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive(docs: list[tuple[int, list[str]]], w: int) -> dict:
    """Sequential reference model: first occurrence of a w-token window
    survives; later occurrences cover their tokens for removal."""
    seen: set[str] = set()
    dup_starts: dict[int, list[int]] = {}
    for doc_id, toks in sorted(docs):
        starts = []
        for s in range(0, len(toks) - w + 1):
            key = " ".join(toks[s : s + w])
            if key in seen:
                starts.append(s)
            else:
                seen.add(key)
        dup_starts[doc_id] = starts
    out = {}
    for doc_id, toks in docs:
        covered: set[int] = set()
        for s in dup_starts[doc_id]:
            covered.update(range(s, s + w))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        if kept:
            out[doc_id] = (" ".join(kept), len(toks), len(kept))
    return out


def test_cross_document_span_removed_from_later_doc(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e unique1 tail1"),
            (2, "head2 a b c d e tail2"),  # the 5-token span recurs
        ],
    )
    out = {r["doc_id"]: r for r in dedup_substring_spans(df, window=5).collect()}
    assert out[1]["text"] == "a b c d e unique1 tail1"  # first keeps all
    assert out[2]["text"] == "head2 tail2"
    assert (out[2]["n_tokens"], out[2]["n_kept"]) == (7, 2)


def test_short_docs_kept_whole_and_total_loss_drops(spark):
    df = _docs(
        spark,
        [
            (1, "p q r s t"),
            (2, "p q r s t"),  # exact repeat of an entire 5-token doc
            (3, "tiny doc"),  # shorter than the window: no windows
        ],
    )
    out = {r["doc_id"]: r for r in dedup_substring_spans(df, window=5).collect()}
    assert out[1]["text"] == "p q r s t"
    assert 2 not in out  # lost every token
    assert out[3]["text"] == "tiny doc"


def test_overlapping_duplicate_windows_merge_into_one_span(spark):
    # doc 2 repeats a 6-token span -> two overlapping duplicate
    # 5-windows that must merge (not double-drop or leave gaps)
    df = _docs(
        spark,
        [
            (1, "a b c d e f x"),
            (2, "y a b c d e f z"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_substring_spans(df, window=5).collect()}
    assert out[2]["text"] == "y z"
    assert out[2]["n_kept"] == 2


def test_within_document_repetition_also_dedups(spark):
    df = _docs(spark, [(1, "m n o m n o m n o")])
    out = dedup_substring_spans(df, window=3).collect()[0]
    # windows: positions 0..6; pos 3 and 6 repeat pos 0's "m n o"
    # -> tokens 3..8 covered, tokens 0..2 survive
    assert out["text"] == "m n o"
    assert (out["n_tokens"], out["n_kept"]) == (9, 3)


def test_matches_naive_model(spark):
    """Hypothesis differential vs the sequential reference model over
    small random corpora with forced span collisions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = st.sampled_from(["a", "b", "c", "d"])

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.lists(tok, min_size=1, max_size=12),
            min_size=1,
            max_size=6,
        )
    )
    def run(corpora):
        docs = [(i, toks) for i, toks in enumerate(corpora)]
        df = _docs(spark, [(i, " ".join(t)) for i, t in docs])
        got = {
            r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
            for r in dedup_substring_spans(df, window=3).collect()
        }
        assert got == _naive(docs, 3)

    run()
