"""Unicode NFC normalization — the text-cleaning step every public
curation pipeline runs before hashing or tokenizing (C4 and CCNet both
normalize before dedup: visually identical strings with different
combining-mark encodings must hash identically, or every downstream
digest operator silently under-deduplicates).

Spark has no built-in Unicode normalizer, so this is an honest
pandas-UDF map stage (one Arrow crossing, no shuffle — the
operators/extract.py shape). The oracle is DuckDB's ``nfc_normalize``
(utf8proc) — a genuinely INDEPENDENT second implementation, making
this one of the repo's strongest differentials: Python's unicodedata
(UCD tables) vs utf8proc must agree character-for-character, and the
fixture's ``expected`` column was pinned by unicodedata at build time
with the construction asserted (tests/fixtures/make_unicode_fixture.py).

Scale shape: pure map; at 100 TB this pipelines into whatever scan
feeds it (normalization-then-md5 costs one pass, no extra shuffle).
ASCII fast path: the UDF skips re-encoding for pure-ASCII batches,
which is most web text by volume.
"""

from __future__ import annotations

import functools as _functools
import unicodedata
from pathlib import Path

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

FIXTURE_PATH = str(
    Path(__file__).resolve().parents[2]
    / "tests/fixtures/unicode_nfc.parquet"
)


@_functools.lru_cache(maxsize=1)
def _nfc_udf():
    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            # ASCII fast path: NFC is the identity on ASCII
            if x.isascii():
                return x
            return unicodedata.normalize("NFC", x)

        return s.map(one)

    return nfc


def nfc_normalize(col: Column) -> Column:
    """NFC-normalized text (canonical composition; NFKC's
    compatibility mappings are deliberately NOT applied)."""
    return _nfc_udf()(col)


def q_text_nfc_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constructed denormalized inputs (combining marks, Hangul jamo,
    NFC singletons, NFKC-only decoys): Spark's unicodedata UDF vs
    DuckDB's utf8proc recomputation."""
    rows = spark.read.parquet(FIXTURE_PATH)
    return (
        rows.withColumn("nfc", nfc_normalize(F.col("denorm")))
        .select(
            "case_id",
            "nfc",
            (F.col("nfc") != F.col("denorm")).alias("changed"),
        )
        .orderBy("case_id")
    )


def q_text_nfc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide normalization (the sf-scaling entry): the synthetic
    corpus is ASCII so NFC is the identity — but the oracle RUNS
    nfc_normalize, so any non-identity drift on either engine fails
    the hash, not just a pinned expectation."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        nfc_normalize(F.col("text")).alias("nfc"),
        (nfc_normalize(F.col("text")) != F.col("text")).alias("changed"),
    ).orderBy("doc_id")


QUERIES["text_nfc_fixture"] = q_text_nfc_fixture
ORACLES["text_nfc_fixture"] = f"""
    SELECT case_id, nfc_normalize(denorm) AS nfc,
           nfc_normalize(denorm) != denorm AS changed
    FROM read_parquet('{FIXTURE_PATH}')
    ORDER BY case_id
"""
QUERIES["text_nfc_corpus"] = q_text_nfc_corpus
ORACLES["text_nfc_corpus"] = """
    SELECT doc_id, nfc_normalize(text) AS nfc,
           nfc_normalize(text) != text AS changed
    FROM documents
    ORDER BY doc_id
"""
