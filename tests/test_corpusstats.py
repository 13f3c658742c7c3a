"""Corpus statistics: closed-form hand checks on a tiny corpus."""

from __future__ import annotations

import math

from event_pipeline_spark.operators.corpusstats import (
    heaps_curve,
    type_token_stats,
    zipf_fit,
)


def _docs(spark):
    # freqs: a->4, b->2, c->1, d->1  (tokens=8, types=4)
    return spark.createDataFrame(
        [
            (0, "a a b"),
            (1, "a b c"),
            (2, "a d"),
        ],
        "doc_id long, text string",
    )


def test_type_token_closed_form(spark):
    row = type_token_stats(_docs(spark)).collect()[0]
    assert row["n_tokens"] == 8
    assert row["n_types"] == 4
    assert row["ttr"] == round(4 / 8, 6)
    assert row["hapax"] == 2  # c, d
    assert row["dis"] == 1  # b
    assert row["top1_share"] == round(4 / 8, 6)


def test_zipf_fit_closed_form(spark):
    """Least squares over (ln rank, ln freq) with rank ties broken by
    token: ranks a=1(f4), b=2(f2), c=3(f1), d=4(f1)."""
    xs = [round(math.log(r), 7) for r in (1, 2, 3, 4)]
    ys = [round(math.log(f), 7) for f in (4, 2, 1, 1)]
    mx = sum(xs) / 4
    my = sum(ys) / 4
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / 4
    vx = sum((x - mx) ** 2 for x in xs) / 4
    vy = sum((y - my) ** 2 for y in ys) / 4
    row = zipf_fit(_docs(spark), top_k=4).collect()[0]
    assert row["slope"] == round(cov / vx, 4)
    assert row["intercept"] == round(my - cov / vx * mx, 4)
    assert row["r2"] == round(cov * cov / (vx * vy), 4)


def test_heaps_curve_closed_form(spark):
    """bucket=2: checkpoint 1 = docs 0-1 (6 tokens; first-seen a,b,c),
    checkpoint 2 = doc 2 (2 tokens; first-seen d)."""
    rows = {
        r["checkpoint"]: (r["cum_tokens"], r["cum_types"])
        for r in heaps_curve(_docs(spark), bucket=2).collect()
    }
    assert rows == {1: (6, 3), 2: (8, 4)}


def test_heaps_curve_empty_checkpoint_gap(spark):
    """A checkpoint whose docs add no new types still reports the
    carried-forward cumulative type count."""
    docs = spark.createDataFrame(
        [(0, "x y"), (1, "x y"), (2, "x z")],
        "doc_id long, text string",
    )
    rows = {
        r["checkpoint"]: (r["cum_tokens"], r["cum_types"])
        for r in heaps_curve(docs, bucket=1).collect()
    }
    assert rows == {1: (2, 2), 2: (4, 2), 3: (6, 3)}


def test_lang_divergence_closed_form(spark):
    """Two langs: en = {a:2, b:1}, de = {a:1, c:2}. Corpus: a:3, b:1,
    c:2, total 6. KL computed with Python ints in the same 1e-7-unit
    quantization; identical-distribution slices give exactly 0."""
    import math

    from event_pipeline_spark.operators.corpusstats import (
        lang_unigram_divergence,
    )

    docs = spark.createDataFrame(
        [(0, "en", "a a b"), (1, "de", "a c c")],
        "doc_id long, lang string, text string",
    )
    units = lambda v: int(round(v * 1e7))  # noqa: E731

    def kl(slice_counts, corpus_counts, ct):
        nt = sum(slice_counts.values())
        s = sum(
            units((c / nt) * math.log((c / nt) / (corpus_counts[t] / ct)))
            for t, c in slice_counts.items()
        )
        return nt, round(s / 1e7, 4)

    corpus = {"a": 3, "b": 1, "c": 2}
    rows = {
        r["lang"]: (r["n_tokens"], r["kl_nats"])
        for r in lang_unigram_divergence(docs).collect()
    }
    assert rows["en"] == kl({"a": 2, "b": 1}, corpus, 6)
    assert rows["de"] == kl({"a": 1, "c": 2}, corpus, 6)

    same = spark.createDataFrame(
        [(0, "en", "a b"), (1, "de", "a b")],
        "doc_id long, lang string, text string",
    )
    for r in lang_unigram_divergence(same).collect():
        assert r["kl_nats"] == 0.0


def test_ngram_novelty_closed_form(spark):
    """Hand case: doc 1 and doc 2 share one 3-gram exactly; doc 3 is a
    verbatim copy of doc 1 (novelty 0 for both copies)."""
    from event_pipeline_spark.operators.corpusstats import ngram_novelty

    a = "alpha beta gamma delta"       # grams: abg, bgd
    b = "alpha beta gamma epsilon"     # grams: abg, bge
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, a)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    # every gram of docs 1/3 recurs (shared abg + the copy); doc 2's
    # bge gram is unique to it
    assert out[1]["novelty"] == 0.0 and out[3]["novelty"] == 0.0
    assert out[2]["n_grams"] == 2 and out[2]["n_novel"] == 1
    assert out[2]["novelty"] == 0.5


def test_source_overlap_counts_shared_units_once(spark):
    from event_pipeline_spark.operators.corpusstats import source_overlap

    df = spark.createDataFrame(
        [
            (1, "a", "shared line\nonly in a"),
            (2, "a", "shared line\nstill only a"),  # dup within a: once
            (3, "b", "shared line\nonly in b"),
            (4, "c", "nothing in common here"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in source_overlap(df).collect()
    }
    assert out == {("a", "b"): 1}


def test_doc_lexical_stats_hand_case(spark):
    from event_pipeline_spark.operators.corpusstats import (
        doc_lexical_stats,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c"), (3, "a a  a a")],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in doc_lexical_stats(docs).collect()}
    # doc 1: p = (2/3, 1/3) -> H = ln3 - (2 ln2)/3
    assert got[1]["n_tokens"] == 3 and got[1]["n_types"] == 2
    assert got[1]["ttr"] == 0.6666667 and got[1]["hapax_share"] == 0.5
    assert abs(got[1]["entropy"] - 0.6365142) < 1e-6
    # doc 2: uniform -> H = ln 3, all hapax
    assert got[2]["entropy"] == round(__import__("math").log(3), 7)
    assert got[2]["ttr"] == 1.0 and got[2]["hapax_share"] == 1.0
    # doc 3: constant (double space collapses) -> H = 0, TTR 1/4
    assert got[3]["n_tokens"] == 4 and got[3]["entropy"] == 0.0
    assert got[3]["hapax_share"] == 0.0


def test_token_concentration_hand_case(spark):
    """Gini by hand: a uniform 2-type slice scores (2*(1*1+2*1) -
    3*2)/(2*2) = 0; an all-one-type slice scores (2*1*4 - 2*4)/(1*4)
    = 0 (m=1 degenerate); a skewed slice matches the formula."""
    from event_pipeline_spark.operators.corpusstats import (
        token_concentration,
    )

    docs = spark.createDataFrame(
        [
            ("u", "a b"),          # uniform: gini 0
            ("s", "a a a b"),      # c=(1,3): (2*(1+6)-3*4)/(2*4)=0.25
            ("m", "a a a"),        # single type: 0
        ],
        "source string, text string",
    )
    got = {r["source"]: r for r in token_concentration(docs).collect()}
    assert got["u"]["gini"] == 0.0 and got["u"]["top_share"] == 1.0
    assert got["s"]["gini"] == 0.25
    assert got["m"]["gini"] == 0.0 and got["m"]["n_types"] == 1


def test_brier_decomposition_hand_case(spark):
    """Constant-within-bin forecasts: the Murphy identity holds
    EXACTLY (within_bin_var = 0) and each term matches the hand
    arithmetic."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.evaluation import (
        brier_decomposition,
    )

    # bin 0.1: p=0.15, 4 rows, 1 positive; bin 0.8: p=0.85, 4 rows,
    # 3 positive
    rows = [(1_500_000, y) for y in (1, 0, 0, 0)] + [
        (8_500_000, y) for y in (1, 1, 1, 0)
    ]
    df = spark.createDataFrame(rows, "p_units long, label int")
    r = brier_decomposition(
        df, p_units_col="p_units", label_col="label"
    ).collect()[0]
    # hand: ybar=0.5 -> UNC=0.25; REL=(4*(.15-.25)^2+4*(.85-.75)^2)/8
    # = 0.01; RES=(4*(.25-.5)^2+4*(.75-.5)^2)/8 = 0.0625
    # brier = REL - RES + UNC = 0.1975
    assert r["n"] == 8
    assert r["uncertainty"] == 0.25
    assert r["reliability"] == 0.01
    assert r["resolution"] == 0.0625
    assert r["brier"] == 0.1975
    assert r["within_bin_var"] == 0.0
