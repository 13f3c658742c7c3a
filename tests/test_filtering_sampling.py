"""Quality filtering, PII, deterministic sampling, decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.decontam import (
    decontaminate,
    ngram_decontaminate,
)
from event_pipeline_spark.operators.filtering import (
    MIN_WORDS,
    gopher_quality,
    pii_detect,
    pii_redact,
)
from event_pipeline_spark.operators.sampling import (
    mix_sources,
    sample_fraction,
    stratified_take,
)


# ---------------------------------------------------------------------------
# gopher quality
# ---------------------------------------------------------------------------


GOOD_DOC = (
    "the quick brown fox jumps over the lazy dog and runs to be far away "
    "with many plain words that have normal shape and reasonable length "
    "of sentences to pass every single quality rule easily and cleanly"
)


def test_gopher_rules_flag_each_failure_mode(spark):
    rows = [
        (1, GOOD_DOC),
        (2, "too short to pass"),                       # word count
        (3, "### " * 40 + "the be to of and that"),     # symbol ratio
        (4, ("zz " * MIN_WORDS).strip()),               # no stopwords
        (5, "a " * 60 + "the be"),                      # mean word len < 3
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["passes_quality"]
    assert not out[2]["word_count_ok"] and not out[2]["passes_quality"]
    assert not out[3]["symbol_ratio_ok"]
    assert not out[4]["stopwords_ok"]
    assert not out[5]["mean_word_len_ok"]


def test_bullet_ratio_rule(spark):
    bullets = "\n".join(f"- item {i} of the list to be" for i in range(10))
    out = gopher_quality(
        spark.createDataFrame([(1, bullets)], "doc_id long, text string")
    ).first()
    assert out["bullet_line_ratio"] == 1.0
    assert not out["bullet_ratio_ok"]


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_detect_counts_each_kind(spark):
    text = (
        "mail a@b.com and c.d+x@e.org, server 10.1.2.3, ssn 123-45-6789, "
        "call +1 555-123-4567 twice: +1 555-123-4567"
    )
    row = pii_detect(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).first()
    assert row["pii_email"] == 2
    assert row["pii_ipv4"] == 1
    assert row["pii_ssn"] == 1
    assert row["pii_phone"] == 2
    assert row["pii_total"] == 6


def test_pii_redact_replaces_with_placeholders(spark):
    text = "a@b.com lives at 10.1.2.3 ssn 123-45-6789"
    row = pii_redact(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).first()
    assert row["redacted"] == "[EMAIL] lives at [IPV4] ssn [SSN]"
    # no raw PII survives
    assert "a@b.com" not in row["redacted"]
    assert "123-45-6789" not in row["redacted"]


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "key")


def test_sample_fraction_deterministic_and_calibrated(ids):
    a = sorted(r["key"] for r in sample_fraction(ids, "key", 0.3, "x").collect())
    b = sorted(r["key"] for r in sample_fraction(ids, "key", 0.3, "x").collect())
    assert a == b  # same rows every run
    assert 0.25 < len(a) / 2000 < 0.35  # calibrated
    c = sorted(r["key"] for r in sample_fraction(ids, "key", 0.3, "y").collect())
    assert a != c  # independent draw per salt


def test_sample_fraction_monotone_in_p(ids):
    small = {r["key"] for r in sample_fraction(ids, "key", 0.1, "x").collect()}
    large = {r["key"] for r in sample_fraction(ids, "key", 0.5, "x").collect()}
    assert small <= large  # threshold semantics: growing p only adds rows


def test_mix_sources_weights(spark):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(3000)],
        "key long, src string",
    )
    kept = (
        mix_sources(df, "src", {"a": 1.0, "b": 0.2}, "key")
        .groupBy("src")
        .count()
        .collect()
    )
    counts = {r["src"]: r["count"] for r in kept}
    assert counts["a"] == 1000  # weight 1.0 keeps all
    assert 120 < counts["b"] < 280  # ~0.2
    assert "c" not in counts  # unlisted source dropped


def test_stratified_take_exact_k(spark):
    df = spark.createDataFrame(
        [(i, "s" if i < 1000 else "t") for i in range(1005)],
        "key long, g string",
    )
    out = stratified_take(df, "g", 10, "key")
    counts = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert counts == {"s": 10, "t": 5}  # min(k, |stratum|)
    again = stratified_take(df, "g", 10, "key")
    assert sorted(r["key"] for r in out.collect()) == sorted(
        r["key"] for r in again.collect()
    )


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [("which of the following is the best answer to question one",)],
        "text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 8-gram verbatim (case-insensitive)
            (1, "intro text Which Of The Following Is The Best Answer trailing"),
            # shares only 7 consecutive tokens — below n=8, clean
            (2, "of the following is the best answer maybe"),
            (3, "completely unrelated document about sparks and engines"),
        ],
        "doc_id long, text string",
    )
    report = {
        r["doc_id"]: r["n_contaminated"]
        for r in ngram_decontaminate(corpus, bench).collect()
    }
    assert 1 in report and report[1] >= 1
    assert 2 not in report and 3 not in report

    clean = sorted(r["doc_id"] for r in decontaminate(corpus, bench).collect())
    assert clean == [2, 3]


def test_short_docs_produce_no_grams(spark):
    bench = spark.createDataFrame([("one two three",)], "text string")
    corpus = spark.createDataFrame(
        [(1, "one two three")], "doc_id long, text string"
    )
    # both sides shorter than n=8 tokens: no grams, no contamination
    assert ngram_decontaminate(corpus, bench).count() == 0


# ---------------------------------------------------------------------------
# repetition rules + text cleaning
# ---------------------------------------------------------------------------


def test_repetition_stats_known_values(spark):
    from event_pipeline_spark.operators.filtering import repetition_stats

    rows = [
        (1, "a b\na b\nc d"),          # 1 dup line of 3; bigrams of the soup
        (2, "x y x y x y"),            # "x y" dominates
        (3, "unique words only here"),
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["dup_line_fraction"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[3]["dup_line_fraction"] == 0.0
    # doc 2 tokens: x y x y x y -> bigrams: xy yx xy yx xy -> top 'x y' = 3/5
    assert out[2]["top_bigram_fraction"] == pytest.approx(0.6)
    # doc 3: 3 bigrams all distinct -> 1/3
    assert out[3]["top_bigram_fraction"] == pytest.approx(1 / 3, abs=1e-6)


def test_clean_text_semantics(spark):
    from event_pipeline_spark.operators.filtering import clean_text

    dirty = "  a\tb   c\x07 \n\n  d  \n\ne "
    row = spark.createDataFrame([(dirty,)], "text string").select(
        clean_text(F.col("text")).alias("c")
    ).first()
    assert row["c"] == "a b c\nd\ne"


# ---------------------------------------------------------------------------
# bloom-gated decontamination
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_exact_report(spark):
    """With a DELIBERATELY undersized bitmap (64 bits for ~40 grams →
    false positives all over), the gated report must still equal the
    plain broadcast-join report — the exact join removes every Bloom
    false positive, and a false negative (which would LOSE a
    contamination) is impossible by construction."""
    from event_pipeline_spark.operators.decontam import (
        _gram_hashes,
        bloom_build,
        bloom_might_contain,
        ngram_decontaminate,
        ngram_decontaminate_bloom,
    )

    words_pool = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = [
        (i, " ".join(words_pool[(i + j) % 8] for j in range(12)))
        for i in range(30)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(rows[:3], "doc_id long, text string")

    plain = {
        (r["doc_id"], r["n_contaminated"])
        for r in ngram_decontaminate(corpus, bench, n=4).collect()
    }
    gated = {
        (r["doc_id"], r["n_contaminated"])
        for r in ngram_decontaminate_bloom(
            corpus, bench, n=4, bits_per_gram=2, n_hashes=4
        ).collect()
    }
    assert gated == plain and plain  # identical, and non-trivial

    # every benchmark gram must probe positive (no false negatives)
    bg = _gram_hashes(
        bench.select(F.lit(0).alias("i"), "text"), "text", "i", 4
    ).select("gram_hash").distinct()
    bits = bloom_build(bg, n_bits=64, n_hashes=4)
    assert (
        bg.where(
            bloom_might_contain(
                F.col("gram_hash"), bits, n_bits=64, n_hashes=4
            )
        ).count()
        == bg.count()
    )


def test_bloom_prefilter_is_selective_and_jvm_only(spark):
    """At the default sizing the probe rejects the vast majority of
    clean corpus grams before the join, and the probing plan contains
    no Python eval node."""
    from event_pipeline_spark.operators.decontam import (
        _gram_hashes,
        bloom_build,
        bloom_might_contain,
    )

    clean = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(50)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9")], "doc_id long, text string"
    )
    bg = _gram_hashes(bench, "text", "doc_id", 8).select("gram_hash").distinct()
    bits = bloom_build(bg, n_bits=1024, n_hashes=4)
    cg = _gram_hashes(clean, "text", "doc_id", 8)
    pre = cg.where(
        bloom_might_contain(F.col("gram_hash"), bits, n_bits=1024, n_hashes=4)
    )
    total, passed = cg.count(), pre.count()
    assert total >= 600
    assert passed <= total * 0.05  # ~ (k*n/m)^k << 5% here
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_decontaminate_flags_close_vectors(spark):
    from event_pipeline_spark.operators.decontam import semantic_decontaminate

    dim = 64
    e0 = [1.0] + [0.0] * (dim - 1)
    e0_tilt = [1.0, 0.05] + [0.0] * (dim - 2)  # cosine vs e0 ~ 0.9988
    e1 = [0.0, 1.0] + [0.0] * (dim - 2)  # orthogonal to e0
    bench = spark.createDataFrame(
        [(100, e0), (101, e0_tilt)], "bench_id long, embedding array<float>"
    )
    corpus = spark.createDataFrame(
        [(1, e0), (2, e1)], "vec_id long, embedding array<float>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            corpus, bench, threshold=0.9
        ).collect()
    }
    # vec 1 sits on top of BOTH benchmark vectors (same literal-plane
    # buckets, cosine 1.0 / ~0.9988); vec 2 is orthogonal -> clean.
    assert out[1]["n_contaminated"] == 2
    assert out[1]["max_cosine"] == 1.0
    assert 2 not in out


def test_temperature_token_budget_upweights_small_source(spark):
    import pytest

    from event_pipeline_spark.operators.sampling import (
        temperature_token_budget,
    )

    rows = []
    # big source: 90 docs x 10 tokens = 900; small: 10 docs x 10 = 100
    for i in range(90):
        rows.append((i, "big", "t " * 10))
    for i in range(90, 100):
        rows.append((i, "small", "t " * 10))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    with pytest.raises(ValueError):
        temperature_token_budget(df, "source", "doc_id", "text")
    with pytest.raises(ValueError):
        temperature_token_budget(
            df, "source", "doc_id", "text", budget_tokens=10, budget_denom=10
        )

    out = temperature_token_budget(
        df, "source", "doc_id", "text", budget_tokens=500
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
        assert r["cum_tokens"] <= r["src_budget"]
    kept = {s: sum(r["n_tokens"] for r in v) for s, v in by_src.items()}
    # sqrt temperature: weights prop. to sqrt(0.9)/sqrt(0.1) = 3:1,
    # not the raw 9:1 — the small source gets ~25% of the budget
    # (capped by fill granularity), far above its 10% mass share.
    assert kept["small"] / (kept["small"] + kept["big"]) > 0.2
    # greedy fill respects the per-source budget exactly
    assert kept["big"] <= 500 and kept["small"] <= 500


def test_split_assign_exact_quotas_and_determinism(spark):
    import pytest

    from event_pipeline_spark.operators.sampling import split_assign

    df = spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(57)],
        "doc_id long, source string",
    )
    out = split_assign(df, "source", "doc_id").collect()
    by = {}
    for r in out:
        by.setdefault((r["source"], r["split"]), set()).add(r["doc_id"])
    # exact floor quotas: a (n=50) -> 5/5/40; b (n=7) -> 0/0/7
    assert len(by[("a", "val")]) == 5 and len(by[("a", "test")]) == 5
    assert len(by[("a", "train")]) == 40
    assert ("b", "val") not in by and ("b", "test") not in by
    assert len(by[("b", "train")]) == 7
    # deterministic: a second run assigns identically
    out2 = split_assign(df, "source", "doc_id").collect()
    assert {(r["doc_id"], r["split"]) for r in out2} == {
        (r["doc_id"], r["split"]) for r in out
    }
    # a different salt moves at least one row between splits
    out3 = split_assign(df, "source", "doc_id", salt="s2").collect()
    assert {(r["doc_id"], r["split"]) for r in out3} != {
        (r["doc_id"], r["split"]) for r in out
    }
    with pytest.raises(ValueError):
        split_assign(df, "source", "doc_id", val_pct=60, test_pct=40)


def test_temperature_token_budget_tokens_col_variant(spark):
    import pytest

    from event_pipeline_spark.operators.sampling import (
        temperature_token_budget,
    )

    df = spark.createDataFrame(
        [(1, "a", 30), (2, "a", 30), (3, "b", 40)],
        "doc_id long, source string, n_bpe long",
    )
    out = temperature_token_budget(
        df, "source", "doc_id", tokens_col="n_bpe", budget_tokens=100
    ).collect()
    assert all(r["cum_tokens"] <= r["src_budget"] for r in out)
    assert {r["n_tokens"] for r in out} <= {30, 40}
    # exactly one token source must be given
    with pytest.raises(ValueError):
        temperature_token_budget(
            df, "source", "doc_id", "text", tokens_col="n_bpe",
            budget_tokens=100,
        )
    with pytest.raises(ValueError):
        temperature_token_budget(
            df, "source", "doc_id", budget_tokens=100
        )
