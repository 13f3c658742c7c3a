"""Mojibake repair: fixture pins, clean-text refusal, idempotence,
and the Spark-4 strict-codec guard behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_pipeline_spark.operators.mojibake import (
    FIXTURE_PATH,
    fix_mojibake,
    mojibake_score,
    repair_documents,
)


def _fix(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    return [
        r["f"]
        for r in df.select(F.col("i"), fix_mojibake(F.col("t")).alias("f"))
        .orderBy("i")
        .collect()
    ]


def test_fixture_pins(spark):
    """Every pinned case: repaired == expected (computed independently
    with Python's codecs), changed flag exact."""
    rows = spark.read.parquet(FIXTURE_PATH)
    got = rows.select(
        "case_id",
        "expected",
        "expect_changed",
        fix_mojibake(F.col("corrupted")).alias("repaired"),
    ).collect()
    assert len(got) == 14
    for r in got:
        assert r["repaired"] == r["expected"], r["case_id"]
        assert (r["repaired"] != r["expected"]) is False
    changed = {r["case_id"]: r for r in got}
    for r in rows.collect():
        assert (
            changed[r["case_id"]]["repaired"] != r["corrupted"]
        ) == r["expect_changed"], r["case_id"]


def test_clean_text_never_touched_and_no_codec_errors(spark):
    """Clean ASCII, Latin-1 accents, CJK, emoji, and empty strings all
    pass through unchanged — and none of them make the strict Spark 4
    codecs throw (the guards run first)."""
    texts = [
        "hello world",
        "café au lait",  # lone 0xE9: invalid UTF-8 image
        "São Paulo",
        "你好，世界",  # ineligible: chars > 0xFF
        "emoji 😀 direct",
        "",
    ]
    assert _fix(spark, texts) == texts


def test_repair_is_idempotent_on_repaired_output(spark):
    """fix(fix(x)) == fix(x): repaired text is real UTF-8 whose
    accented chars no longer form a valid UTF-8 byte image."""
    rows = spark.read.parquet(FIXTURE_PATH).where("expect_changed")
    once = rows.select(
        "case_id", fix_mojibake(F.col("corrupted")).alias("t")
    )
    twice = once.select(
        "case_id", "t", fix_mojibake(F.col("t")).alias("t2")
    ).collect()
    # exception: the double-corrupted case repairs one level per pass,
    # so its second pass changes it again (to the fully clean text)
    for r in twice:
        if r["case_id"] == 9:
            assert r["t2"] != r["t"]
        else:
            assert r["t2"] == r["t"], r["case_id"]


def test_score_ranks_corrupted_above_clean(spark):
    rows = spark.read.parquet(FIXTURE_PATH).select(
        "expect_changed", mojibake_score(F.col("corrupted")).alias("s")
    ).collect()
    corrupted = [r["s"] for r in rows if r["expect_changed"]]
    clean = [r["s"] for r in rows if not r["expect_changed"]]
    assert min(corrupted) > 0
    assert all(s == 0 for s in clean)


def test_repair_documents_flags(spark):
    df = spark.createDataFrame(
        [(1, "plain"), (2, "cafÃ©")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repair_documents(df).collect()}
    assert rows[1]["text"] == "plain" and not rows[1]["was_corrupted"]
    assert rows[2]["text"] == "café" and rows[2]["was_corrupted"]
    assert rows[2]["score_before"] > 0


def test_hypothesis_corrupt_repair_roundtrip(spark):
    """Deep differential: corrupt arbitrary unicode text with an
    INDEPENDENT Python-codec implementation of the sloppy-cp1252
    mangle, then require the Spark JVM repair chain to invert it
    exactly — including text that was already mojibake-shaped, pure
    ASCII (corrupt == identity), C1 controls, CJK, and emoji."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sloppy_undefined = {0x81, 0x8D, 0x8F, 0x90, 0x9D}

    def corrupt(text: str) -> str:
        out = []
        for b in text.encode("utf-8"):
            if b in sloppy_undefined or b < 0x80:
                out.append(chr(b))
            else:
                out.append(bytes([b]).decode("cp1252"))
        return "".join(out)

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.text(max_size=40),
            min_size=1,
            max_size=25,
        )
    )
    def run(texts):
        df = spark.createDataFrame(
            [(i, corrupt(t)) for i, t in enumerate(texts)],
            "i long, t string",
        )
        got = {
            r["i"]: r["f"]
            for r in df.select(
                "i", fix_mojibake(F.col("t")).alias("f")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == t, (i, t, got[i])

    run()
