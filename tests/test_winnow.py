"""Winnowing fingerprints (operators/winnow.py)."""

from __future__ import annotations

from event_pipeline_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fps(spark, rows, **kw):
    out = {}
    for r in winnow_fingerprints(_docs(spark, rows), **kw).collect():
        out.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return out


def test_winnowing_guarantee_shared_run(spark):
    """Any shared token run of length >= w + k - 1 yields at least one
    shared fingerprint hash (Schleimer et al. 2003, Theorem in §3)."""
    k, w = 4, 4
    run = "q w e r t y u"  # w + k - 1 = 7 tokens
    fps = _fps(
        spark,
        [(1, f"alpha beta {run} gamma"), (2, f"{run} delta epsilon zeta")],
        k=k,
        w=w,
    )
    shared = {h for _, h in fps[1]} & {h for _, h in fps[2]}
    assert shared, "shared 7-token run must yield a shared fingerprint"


def test_short_document_gets_one_global_min(spark):
    # 5 tokens, k=4 -> 2 k-grams < w=4 -> one clamped window: global min.
    fps = _fps(spark, [(1, "a b c d e")])
    assert len(fps[1]) == 1


def test_repeated_gram_ties_pick_rightmost(spark):
    # All k-grams identical -> every window's min is the same hash and
    # the rightmost position in each window wins; distinct keeps one
    # entry per selected position, the last being at the final k-gram.
    toks = " ".join(["x"] * 10)  # 7 k-grams (k=4), windows at 1..4
    fps = _fps(spark, [(1, toks)])
    positions = sorted(p for p, _ in fps[1])
    # window j selects pos j+w-1 (rightmost): windows 1..4 -> pos 4..7
    assert positions == [4, 5, 6, 7]


def test_pairs_share_count_and_order(spark):
    run = "m n o p q r s t u v"
    df = _docs(
        spark,
        [
            (1, f"one unique opening {run}"),
            (2, f"{run} two unique closing"),
            (3, "totally different content here now ok fine"),
        ],
    )
    rows = winnow_pairs(df).collect()
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in rows}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(a < b for a, b in pairs)
    assert not any(3 in p for p in pairs)


def test_pairs_max_df_drops_boilerplate(spark):
    # Six identical documents: every fingerprint has df=6, so with
    # max_df=5 all are boilerplate and no pairs survive.
    run = "b o i l e r p l a t e x"
    df = _docs(spark, [(i, run) for i in range(6)])
    assert winnow_pairs(df, max_df=5).count() == 0
    assert winnow_pairs(df, max_df=6).count() == 15  # all C(6,2) pairs


def test_hypothesis_winnow_matches_python_model(spark):
    """Selection (positions AND hashes, incl. the rightmost-tie rule)
    must equal a sequential Python winnow on random small corpora."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def py_winnow(toks, k=4, w=4):
        n_grams = max(len(toks) - (k - 1), 1)
        hs = [
            hashlib.md5(" ".join(toks[i - 1 : i - 1 + k]).encode()).hexdigest()
            for i in range(1, n_grams + 1)
        ]
        out = set()
        for j in range(1, max(n_grams - (w - 1), 1) + 1):
            window = hs[j - 1 : j - 1 + w]
            m = min(window)
            # rightmost position among equal minimal hashes
            pos = j + max(i for i, h in enumerate(window) if h == m)
            out.add((pos, m))
        return out

    tok = st.sampled_from(["a", "b", "c"])

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.lists(tok, min_size=1, max_size=14),
            min_size=1,
            max_size=4,
        )
    )
    def run(corpora):
        df = _docs(
            spark,
            [(i, " ".join(t).lower()) for i, t in enumerate(corpora)],
        )
        got = {}
        for r in winnow_fingerprints(df).collect():
            got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
        want = {i: py_winnow(t) for i, t in enumerate(corpora)}
        assert got == want

    run()


def test_span_report_exact_longest_shared_run(spark):
    from event_pipeline_spark.operators.winnow import winnow_span_report

    run9 = "r1 r2 r3 r4 r5 r6 r7 r8 r9"      # 9 shared tokens
    run5 = "s1 s2 s3 s4 s5"                   # 5 shared tokens
    df = _docs(
        spark,
        [
            (1, f"{run9} fillA {run5} tailA one"),
            (2, f"headB {run5} fillB {run9} tailB"),
            (3, "entirely different words without overlap here ok"),
        ],
    )
    out = {
        (r["id_a"], r["id_b"]): r for r in winnow_span_report(df).collect()
    }
    r = out[(1, 2)]
    # exact extents: the 9-token run has 6 consecutive 4-gram hashes
    assert r["longest_run"] == 6
    assert r["longest_span_tokens"] == 9
    assert not any(3 in p for p in out)
