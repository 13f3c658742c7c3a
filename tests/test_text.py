"""Text operators: token counts, fingerprints, quality, language ID."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.text import (
    bpe_ish_token_count,
    normalized_fingerprint,
    predict_language,
    quality_score,
    rolling_hash_fingerprint,
    token_count,
)
from event_pipeline_spark.session import read_table


def test_token_count_matches_python(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    rows = docs.select("text", token_count(F.col("text")).alias("n")).collect()
    for r in rows:
        assert r["n"] == len(r["text"].strip().split())


def test_bpe_ish_counts(spark):
    df = spark.createDataFrame(
        [("Hello, world! It's 42.",), ("nopunct",)], schema="t string"
    )
    rows = df.select(bpe_ish_token_count(F.col("t")).alias("n")).collect()
    # Hello , world ! It ' s 42 .  -> 5 word pieces + 4 punct = 9
    assert rows[0]["n"] == 9
    assert rows[1]["n"] == 1


def test_fingerprint_normalizes_case_and_space(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("HELLO\tWORLD ",), ("other",)],
        schema="t string",
    )
    fps = [
        r["fp"]
        for r in df.select(normalized_fingerprint(F.col("t")).alias("fp")).collect()
    ]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]


def test_rolling_hash_stable_prefix_change(spark):
    # winnowing fingerprint survives an appended suffix when the min-gram
    # stays; at minimum it is deterministic
    df = spark.createDataFrame([("abcdefghij",)], schema="t string")
    a = df.select(rolling_hash_fingerprint(F.col("t")).alias("h")).collect()
    b = df.select(rolling_hash_fingerprint(F.col("t")).alias("h")).collect()
    assert a == b


def test_quality_score_bounds(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    rows = docs.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_language_id_on_real_sentences(spark):
    samples = [
        ("en", "the cat sat on the mat and it was happy with the sun"),
        ("es", "el perro corre por la calle y se esconde en un rincón"),
        ("fr", "le chien mange une pomme et les enfants jouent dans le parc"),
        ("de", "der Hund ist groß und die Katze spielt mit einem Ball"),
        ("zh", "我不知道这是什么，但是我觉得很有意思"),
    ]
    df = spark.createDataFrame(samples, schema="lang string, text string")
    rows = df.select(
        "lang", predict_language(F.col("text")).alias("pred")
    ).collect()
    for r in rows:
        assert r["pred"] == r["lang"], f"{r['lang']} predicted as {r['pred']}"


def test_language_id_unknown_for_gibberish(spark):
    df = spark.createDataFrame([("zzz qqq xxx",)], schema="text string")
    assert df.select(predict_language(F.col("text")).alias("p")).collect()[0][
        "p"
    ] == "unknown"


def test_chunk_text_covers_document_with_overlap(spark):
    from event_pipeline_spark.operators.text import chunk_text

    text = "".join(chr(ord("a") + (i % 26)) for i in range(1000))
    df = spark.createDataFrame([(1, text), (2, "tiny"), (3, "x" * 512)],
                               schema="doc_id int, text string")
    out = chunk_text(df, chunk_chars=512, overlap=128)
    rows = {(r.doc_id, r.chunk_idx): r.chunk for r in out.collect()}

    # doc 1: len 1000 → ceil((1000-128)/384)=3 chunks at strides 0/384/768
    assert {i for d, i in rows if d == 1} == {0, 1, 2}
    assert rows[(1, 0)] == text[0:512]
    assert rows[(1, 1)] == text[384:896]
    assert rows[(1, 2)] == text[768:1000]  # final chunk shorter
    # consecutive chunks share exactly `overlap` characters
    assert rows[(1, 0)][-128:] == rows[(1, 1)][:128]
    # reassembly: chunk 0 + non-overlapping tails reconstructs the doc
    assert rows[(1, 0)] + rows[(1, 1)][128:] + rows[(1, 2)][128:] == text

    # short docs and exact-width docs produce exactly one chunk
    assert {i for d, i in rows if d == 2} == {0}
    assert rows[(2, 0)] == "tiny"
    assert {i for d, i in rows if d == 3} == {0}

    with pytest.raises(ValueError):
        chunk_text(df, chunk_chars=100, overlap=100)


def test_bind_preserves_semantics(spark):
    from event_pipeline_spark.operators.text import bind

    df = spark.createDataFrame(
        [("a b c d e",), ("x",), ("",)], "text string"
    )
    toks_expr = F.split(F.trim(F.col("text")), r"\s+")
    plain = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks_expr) - 1, F.lit(1))),
        lambda i: F.array_join(F.slice(toks_expr, i, 2), " "),
    )
    bound = bind(
        toks_expr,
        lambda a: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(a) - 1, F.lit(1))),
            lambda i: F.array_join(F.slice(a, i, 2), " "),
        ),
    )
    rows = df.select(plain.alias("p"), bound.alias("b")).collect()
    assert all(r["p"] == r["b"] for r in rows)
