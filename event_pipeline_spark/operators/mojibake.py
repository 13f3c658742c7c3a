"""Mojibake repair: undo UTF-8-read-as-Latin-1/cp1252 double encoding.

The most common text corruption in web corpora: a UTF-8 byte sequence
was decoded as Latin-1/Windows-1252 somewhere upstream, turning "é"
into "Ã©", the right double quote into "â€", the em dash into
"â€”"-style trigraphs. The public reference recipe (the ftfy
project's core "sloppy-windows-1252 → utf-8" pass) is:

1. map the 27 printable cp1252-only characters (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹
   Œ Ž ' ' " " • – — ˜ ™ š › œ ž Ÿ) back to the C1 code points
   U+0080–U+009F their bytes occupy — after this the corrupted string
   is pure Latin-1, where char == byte;
2. re-encode Latin-1 (1:1 char→byte) and re-decode as UTF-8;
3. accept the repair only if the round trip is CLEAN (no replacement
   character — i.e. the bytes really were valid UTF-8) and actually
   changed something; otherwise keep the original text.

All three steps are pure JVM expressions — ``translate`` for the
cp1252 table, ``encode(_, 'ISO-8859-1')`` / ``decode(_, 'UTF-8')``
for the round trip, so repair runs inside whole-stage codegen with no
Python in the loop. Spark 4's codecs THROW on malformed input
(``MALFORMED_CHARACTER_CODING``), so both failure modes are excluded
up front by regex guards instead of caught after the fact:

- eligibility — every char must be Latin-1-representable (or a cp1252
  special the translate step maps down); text with real non-Latin
  content (e.g. clean CJK) is ineligible and passes through untouched,
  which also prevents the encoder from ever seeing a char > 0xFF;
- validity — the translated string, viewed char-as-byte, must match
  the standard UTF-8 structure regex (RFC 3629 table) before the
  decode runs; ``when`` evaluates the decode branch only on rows that
  passed, so the strict decoder can never throw. A clean Latin-1
  ``café`` fails this check (a lone 0xE9 is not valid UTF-8) and is
  correctly left alone.

Detection (``mojibake_score``) counts the signature lead bytes Ã Â â
Ã¢ per 1000 chars — the standard cheap heuristic for ranking corpus
shards by corruption before running repair.

Oracle story: the synthetic corpus is pure ASCII (mojibake-free by
construction — the identity contract over it IS oracle-checked), so
the discriminative fixture pins hand-corrupted real multilingual
sentences whose expected repairs were computed at build time by
Python's own codecs (``text.encode('utf-8').decode('cp1252')`` to
corrupt, the reverse to verify) — an implementation fully independent
of the Spark translate/encode/decode chain.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

FIXTURE_PATH = str(
    Path(__file__).resolve().parents[2] / "tests/fixtures/mojibake.parquet"
)

#: printable cp1252-only characters and the C1 control chars their
#: bytes 0x80-0x9F decode to in Latin-1 (0x81/0x8D/0x8F/0x90/0x9D are
#: undefined in cp1252; decoders emit the C1 char already, so they
#: need no mapping)
_CP1252 = "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ"
_C1 = "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97\x98\x99\x9a\x9b\x9c\x9e\x9f"

#: every char Latin-1-representable or a cp1252 special — the
#: precondition for the text to have come out of a latin1/cp1252
#: decode at all (escapes are interpreted by the JVM regex engine)
_ELIGIBLE_RE = r"^[\x00-\xFF" + _CP1252 + r"]*$"

#: RFC 3629 UTF-8 structure over the char-as-byte domain of a
#: translated (pure Latin-1) string
_VALID_UTF8_RE = (
    r"^(?:[\x00-\x7F]"
    r"|[\xC2-\xDF][\x80-\xBF]"
    r"|\xE0[\xA0-\xBF][\x80-\xBF]"
    r"|[\xE1-\xEC][\x80-\xBF]{2}"
    r"|\xED[\x80-\x9F][\x80-\xBF]"
    r"|[\xEE-\xEF][\x80-\xBF]{2}"
    r"|\xF0[\x90-\xBF][\x80-\xBF]{2}"
    r"|[\xF1-\xF3][\x80-\xBF]{3}"
    r"|\xF4[\x80-\x8F][\x80-\xBF]{2}"
    r")*$"
)


def fix_mojibake(col: Column) -> Column:
    """Repaired text, or the original unchanged when the text is not
    Latin-1/cp1252-shaped or its byte image is not valid UTF-8 (see
    module doc — both checks also keep the strict Spark 4 codecs from
    throwing).

    One repair pass undoes one level of double encoding; doubly-
    corrupted text repairs one level per application (same contract as
    the public recipe)."""
    t = F.translate(col, _CP1252, _C1)
    fixed = F.decode(F.encode(t, "ISO-8859-1"), "UTF-8")
    return F.when(
        col.rlike(_ELIGIBLE_RE) & t.rlike(_VALID_UTF8_RE), fixed
    ).otherwise(col)


#: a UTF-8 lead byte's Latin-1 image followed by a continuation
#: byte's image (raw C1/high char or its cp1252 special) — the
#: signature PAIR; a lone accented char in clean Latin-1 text never
#: matches, so clean French/Portuguese scores 0
_SIGNATURE_RE = r"[\xC2-\xF4][\x80-\xBF" + _CP1252 + r"]"


def mojibake_score(col: Column) -> Column:
    """Signature lead+continuation pairs per 1000 chars — the cheap
    corruption-ranking heuristic (rounded to 6)."""
    pairs = F.regexp_count(col, F.lit(_SIGNATURE_RE))
    return F.round(pairs * 1000 / F.greatest(F.length(col), F.lit(1)), 6)


def repair_documents(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, was_corrupted, score_before): repaired corpus with
    per-document corruption diagnostics."""
    fixed = fix_mojibake(F.col(text_col))
    return df.select(
        F.col(id_col),
        fixed.alias(text_col),
        (fixed != F.col(text_col)).alias("was_corrupted"),
        mojibake_score(F.col(text_col)).alias("score_before"),
    )


# -- registered queries ------------------------------------------------------


def q_mojibake_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repair must be the identity on clean text: the ASCII synthetic
    corpus passes through byte-identical with score 0 (the oracle
    recomputes the contract, not the mechanism)."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repair_documents(docs).orderBy("doc_id")


QUERIES["mojibake_identity"] = q_mojibake_identity
ORACLES["mojibake_identity"] = """
    SELECT doc_id, text, false AS was_corrupted,
           0.0 AS score_before
    FROM documents
    ORDER BY doc_id
"""


def q_mojibake_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-corrupted multilingual sentences: the repair must
    reproduce the pinned expected text (computed independently with
    Python's cp1252/utf-8 codecs at fixture-build time) and flag
    exactly the corrupted rows."""
    rows = spark.read.parquet(FIXTURE_PATH)
    return (
        rows.select(
            "case_id",
            fix_mojibake(F.col("corrupted")).alias("repaired"),
            (fix_mojibake(F.col("corrupted")) != F.col("corrupted")).alias(
                "changed"
            ),
        )
        .orderBy("case_id")
    )


QUERIES["mojibake_fixture"] = q_mojibake_fixture
ORACLES["mojibake_fixture"] = f"""
    SELECT case_id, expected AS repaired, expect_changed AS changed
    FROM read_parquet('{FIXTURE_PATH}')
    ORDER BY case_id
"""
