"""NFC normalization: hypothesis differential vs Python's unicodedata,
idempotence, and the digest-unification property that motivates
normalizing before any hash-based dedup."""

from __future__ import annotations

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from event_pipeline_spark.operators.unicodenorm import nfc_normalize


def _run(spark, texts: list[str]) -> list[str]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = df.select("i", nfc_normalize(F.col("t")).alias("n")).collect()
    return [r["n"] for r in sorted(rows, key=lambda r: r["i"])]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
                max_codepoint=0x2FFFF,
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_hypothesis_matches_unicodedata(spark, texts):
    got = _run(spark, texts)
    want = [unicodedata.normalize("NFC", t) for t in texts]
    assert got == want


def test_idempotent_and_digest_unifying(spark):
    """nfc(nfc(x)) == nfc(x); and the composed/decomposed encodings of
    the same visual string hash identically after normalization (the
    property dedup relies on)."""
    composed = "café mañana Å"
    decomposed = unicodedata.normalize("NFD", composed)
    assert composed != decomposed
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed)], "i long, t string"
    )
    out = df.select(
        "i",
        nfc_normalize(F.col("t")).alias("n"),
        nfc_normalize(nfc_normalize(F.col("t"))).alias("nn"),
        F.md5(nfc_normalize(F.col("t"))).alias("h"),
    ).collect()
    by_i = {r["i"]: r for r in out}
    assert by_i[1]["n"] == by_i[2]["n"] == composed
    assert all(r["n"] == r["nn"] for r in out)
    assert by_i[1]["h"] == by_i[2]["h"]
