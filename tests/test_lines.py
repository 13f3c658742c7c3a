"""Line-level C4 dedup + URL canonicalization (operators/lines.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_pipeline_spark.operators.lines import canonicalize_url, dedup_lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_wins_and_reassembly_preserves_order(spark):
    df = _docs(
        spark,
        [
            (1, "alpha line\ncookie banner\nbeta line"),
            (2, "cookie banner\ngamma line"),
            (3, "cookie banner"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["text"] == "alpha line\ncookie banner\nbeta line"
    assert out[2]["text"] == "gamma line"  # banner removed, order kept
    assert 3 not in out  # lost every line -> dropped
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 1)


def test_short_lines_are_structure_not_content(spark):
    df = _docs(spark, [(1, "x\nlong enough line"), (2, "x\nother line")])
    out = {r["doc_id"]: r["text"] for r in dedup_lines(
        df, min_line_chars=5
    ).collect()}
    # the 1-char line survives in BOTH docs (below min_line_chars)
    assert out[1].startswith("x\n") and out[2].startswith("x\n")


def test_dedup_is_on_trimmed_content(spark):
    df = _docs(spark, [(1, "  padded banner  \nkeep a"), (2, "padded banner\nkeep b")])
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df).collect()}
    assert "banner" in out[1] and "banner" not in out[2]


def test_url_canonicalization_cases(spark):
    cases = [
        ("HTTP://WWW.Ex.COM:80/A/b/?utm_campaign=x", "http://www.ex.com/A/b/?"),
        ("https://ex.com/", "https://ex.com"),
        ("https://ex.com/p?z=1&a=2&fbclid=f#top", "https://ex.com/p?a=2&z=1"),
        ("https://ex.com:443/p", "https://ex.com/p"),
        ("https://ex.com/p?ref=nav", "https://ex.com/p"),
        # port stripping is authority-only + scheme-conditioned:
        ("https://ex.com/a:80/b", "https://ex.com/a:80/b"),
        ("https://ex.com/p?a=x:443", "https://ex.com/p?a=x:443"),
        ("http://ex.com:443/p", "http://ex.com:443/p"),
        ("https://ex.com:80/p", "https://ex.com:80/p"),
        ("ftp://ex.com:80/p", "ftp://ex.com:80/p"),
        ("http://ex.com:80", "http://ex.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("u"))).collect()]
    want = [w for _, w in cases]
    # case 0: path keeps its trailing slash (only a BARE path is
    # stripped); empty query drops entirely
    want[0] = "http://www.ex.com/A/b/"
    assert got == want


def test_dedup_lines_matches_naive_model(spark):
    """Hypothesis differential vs a sequential first-occurrence model
    over small random corpora with forced collisions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line_pool = ["cookie banner here", "alpha content line", "beta line",
                 "x", "  padded banner  ", "gamma content text", ""]

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(line_pool), min_size=1, max_size=5),
            min_size=1,
            max_size=6,
        )
    )
    def run(docs):
        df = spark.createDataFrame(
            [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
            for r in dedup_lines(df, min_line_chars=2).collect()
        }
        seen: set[str] = set()
        want = {}
        for i, lines in enumerate(docs):
            kept = []
            for ln in lines:
                t = ln.strip()
                if len(t) < 2:
                    kept.append(ln)  # structure: always kept
                elif t not in seen:
                    seen.add(t)
                    kept.append(ln)
            if kept:
                want[i] = ("\n".join(kept), len(lines), len(kept))
        assert got == want

    run()


def test_url_canonicalization_is_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over the FULL
    grid of schemes × hosts × ports × paths × param combos × fragments
    (1728 URLs), checked in two vectorized passes."""
    import itertools

    urls = []
    for sch, h, po, pa, ps, fr in itertools.product(
        ["http", "HTTPS", "ftp"],
        ["Ex.COM", "www.ex.com", "A.b.C.de"],
        ["", ":80", ":443", ":8080"],
        ["", "/", "/a/B", "/a/b/"],
        ["", "a=1", "utm_source=x&b=2", "z=9&gclid=g&a=1"],
        ["", "#x", "#frag"],
    ):
        u = f"{sch}://{h}{po}{pa}" + (f"?{ps}" if ps else "") + fr
        urls.append(u)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    both = once.select(
        "c", canonicalize_url(F.col("c")).alias("c2")
    ).where(F.col("c") != F.col("c2"))
    assert both.count() == 0, both.limit(5).collect()
