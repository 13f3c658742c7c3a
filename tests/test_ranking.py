"""Ranking operators: document frequency, inverted index, TF-IDF, BM25,
corpus n-grams — semantics on closed-form fixtures plus plan-shape
guards for the scale claims (bounded postings in one exchange, top-k
without a full sort)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from event_pipeline_spark.operators.ranking import (
    bm25_topk,
    corpus_top_ngrams,
    document_frequency,
    inverted_index,
    tfidf_top_terms,
)


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, "a b a c"),
            (2, "a b b"),
            (3, "c d"),
            (4, "a a a a"),
        ],
        schema="doc_id int, text string",
    )


def test_document_frequency_counts_docs_not_occurrences(spark):
    got = {
        r["token"]: r["df"]
        for r in document_frequency(_fixture(spark)).collect()
    }
    assert got == {"a": 3, "b": 2, "c": 2, "d": 1}


def test_inverted_index_bounds_postings_and_keeps_full_df(spark):
    idx = {
        r["token"]: r
        for r in inverted_index(_fixture(spark), max_postings=2).collect()
    }
    # df counts every doc even when the posting list is truncated
    assert idx["a"]["df"] == 3
    assert idx["a"]["postings_csv"] == "1,2"  # first 2 ids ascending
    assert idx["d"]["postings_csv"] == "3"


def test_inverted_index_single_exchange(spark):
    plan = (
        inverted_index(_fixture(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the window rank and the groupBy share the token partitioning
    assert plan.count("Exchange") == 1


def test_tfidf_prefers_rare_terms(spark):
    rows = tfidf_top_terms(_fixture(spark), top_n=1).collect()
    top = {r["doc_id"]: r["token"] for r in rows}
    # doc 3: c appears in 2 docs, d in 1 -> d has higher idf, same tf
    assert top[3] == "d"
    # doc 4 has only 'a'
    assert top[4] == "a"
    # scores are the rounded tf * ln(N/df)
    r3 = [r for r in rows if r["doc_id"] == 3][0]
    assert r3["score"] == round(1 * math.log(4 / 1), 6)


def test_bm25_ranks_matching_docs_only(spark):
    scored = bm25_topk(_fixture(spark), ["d"]).collect()
    assert [r["doc_id"] for r in scored] == [3]  # only doc 3 contains d
    assert scored[0]["rank"] == 1 and scored[0]["score"] > 0


def test_bm25_tf_saturation(spark):
    # doc 4 has tf=4 of 'a', doc 1 tf=2 — higher tf ranks first, but
    # saturation keeps the score sublinear in tf
    rows = bm25_topk(_fixture(spark), ["a"]).collect()
    by_rank = [r["doc_id"] for r in rows]
    assert by_rank[0] == 4
    s = {r["doc_id"]: r["score"] for r in rows}
    assert s[4] < 2 * s[1]


def test_corpus_top_ngrams_counts_occurrences(spark):
    got = {r["gram"]: r["cnt"] for r in corpus_top_ngrams(_fixture(spark)).collect()}
    assert got["a a"] == 3  # doc 4 contributes 3 overlapping bigrams
    assert got["a b"] == 2


def test_corpus_top_ngrams_no_global_sort(spark):
    plan = (
        corpus_top_ngrams(_fixture(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bm25_explode_filters_before_aggregation(spark):
    # the non-query-term tokens must be filtered out before any shuffle
    plan = (
        bm25_topk(_fixture(spark), ["a"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Filter" in plan


def test_phrase_search_positions_and_overlaps(spark):
    import pytest

    from event_pipeline_spark.operators.ranking import phrase_search

    df = spark.createDataFrame(
        [
            (1, "a b c x a b c"),        # two matches of "a b c"
            (2, "A B C only once"),      # case-insensitive, at start
            (3, "x y a b"),              # prefix only: no match
            (4, "b a a b a a b"),        # overlapping repeated-term hits
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in phrase_search(df, "a b c").collect()}
    assert (out[1]["n_matches"], out[1]["first_pos"]) == (2, 1)
    assert (out[2]["n_matches"], out[2]["first_pos"]) == (1, 1)
    assert 3 not in out and 4 not in out

    # phrase with a REPEATED term: "a b a" matches doc 4 only at pos 3
    # (a@3, b@4, a@5) — per-offset votes keep the duplicate term honest
    rep = {r["doc_id"]: r for r in phrase_search(df, "a b a").collect()}
    assert (rep[4]["n_matches"], rep[4]["first_pos"]) == (1, 3)

    # single-token phrase degenerates to term lookup with positions
    one = {r["doc_id"]: r for r in phrase_search(df, "x").collect()}
    assert one[1]["first_pos"] == 4 and one[3]["first_pos"] == 1

    with pytest.raises(ValueError):
        phrase_search(df, "   ")


def test_ql_dirichlet_closed_form_and_exclusion(spark):
    import math

    from event_pipeline_spark.operators.ranking import ql_dirichlet_topk

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "d e")],
        "doc_id long, text string",
    )
    out = ql_dirichlet_topk(df, ["a"], mu=2.0).collect()
    assert [r["doc_id"] for r in out] == [1, 2]  # doc 3 has no term
    assert [r["rank"] for r in out] == [1, 2]
    # closed form: |C|=7 (doc 3's tokens count toward the corpus
    # total even though it matches no term), cf(a)=3
    s1 = math.log(1 + (2 * 7) / (2 * 3)) + math.log(2 / (3 + 2))
    s2 = math.log(1 + (1 * 7) / (2 * 3)) + math.log(2 / (2 + 2))
    assert abs(out[0]["score"] - round(s1, 4)) <= 1e-4
    assert abs(out[1]["score"] - round(s2, 4)) <= 1e-4


def test_hypothesis_phrase_search_matches_python_scan(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from event_pipeline_spark.operators.ranking import phrase_search

    tok = st.sampled_from(["a", "b", "c"])

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.lists(tok, min_size=1, max_size=12),
            min_size=1,
            max_size=4,
        ),
        st.lists(tok, min_size=1, max_size=3),
    )
    def run(corpora, phrase):
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in enumerate(corpora)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(df, " ".join(phrase)).collect()
        }
        want = {}
        m = len(phrase)
        for i, toks in enumerate(corpora):
            hits = [
                p + 1
                for p in range(len(toks) - m + 1)
                if toks[p : p + m] == phrase
            ]
            if hits:
                want[i] = (len(hits), hits[0])
        assert got == want

    run()


def test_tfidf_docsim_blocking_and_exact_cosine(spark):
    from event_pipeline_spark.operators.ranking import tfidf_cosine_pairs

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),     # identical twin of 1
        # three docs sharing ONLY the ubiquitous "x y" bigram (df=3 >
        # max_df=2): blocked out, no candidates among them
        (3, "x y one"),
        (4, "x y two"),
        (5, "x y three"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_cosine_pairs(df, threshold=0.0, max_df=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in out}
    assert pairs[(1, 2)] == 1.0  # identical docs: exact cosine 1
    assert not any(a >= 3 for a, _ in pairs), "common-bigram docs blocked"


def test_rrf_hand_case(spark):
    """Cormack et al. fusion on two hand lists: a doc in both lists
    at middling ranks beats a doc topping only one list."""
    from event_pipeline_spark.operators.ranking import rrf_fuse

    r1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(20, 1), (30, 2), (40, 3)], "doc_id long, rank int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([r1, r2], k=60).collect()}
    # doc 20: 1/62 + 1/61 ; doc 10: 1/61 alone ; doc 30: 1/63 + 1/62
    assert out[20]["rrf_units"] == round(1e7 / 62) + round(1e7 / 61)
    assert out[10]["rrf_units"] == round(1e7 / 61)
    assert out[20]["rank"] == 1 and out[30]["rank"] == 2
    assert out[10]["rank"] == 3 and out[40]["rank"] == 4
    assert out[20]["n_lists"] == 2 and out[10]["n_lists"] == 1
    assert out[20]["rrf_score"] == out[20]["rrf_units"] / 1e7


def test_rrf_tie_breaks_on_id(spark):
    from event_pipeline_spark.operators.ranking import rrf_fuse

    r1 = spark.createDataFrame(
        [(5, 1), (3, 2)], "doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(3, 1), (5, 2)], "doc_id long, rank int"
    )
    rows = rrf_fuse([r1, r2]).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [3, 5]  # equal units -> id asc


def test_rrf_top_k_cut(spark):
    from event_pipeline_spark.operators.ranking import rrf_fuse

    r1 = spark.createDataFrame(
        [(i, i) for i in range(1, 31)], "doc_id long, rank int"
    )
    assert rrf_fuse([r1], top_k=5).count() == 5


def test_query_expansion_excludes_query_terms_and_ranks_by_tfidf(spark):
    from event_pipeline_spark.operators.ranking import expand_query_prf

    docs = spark.createDataFrame(
        [
            (1, "apple banana banana cherry"),
            (2, "apple banana dates"),
            (3, "cherry dates elder"),   # not in feedback (no query term)
            (4, "apple elder elder"),
        ],
        "doc_id long, text string",
    )
    out = expand_query_prf(
        docs, ["apple"], fb_k=2, top_terms=3
    ).collect()
    tokens = [r["token"] for r in out]
    assert "apple" not in tokens
    # feedback set = top-2 BM25 docs for 'apple' (1, 2 or 4); banana
    # appears 3x in docs 1+2 with df 2 -> must rank above singletons
    assert out[0]["rank"] == 1
    assert all(
        out[i]["score"] >= out[i + 1]["score"] for i in range(len(out) - 1)
    )
