"""Exact substring-level deduplication (token-window family).

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") remove repeated >=50-token spans ACROSS otherwise-distinct
documents — the duplication family that doc-level (exact hash,
MinHash) and line-level (C4) dedup all miss. The paper builds a
corpus-wide suffix array; the Spark-native equivalent implemented here
is the standard hash-window approximation of the same relation:

1. every document emits one digest per token position — the md5 of its
   ``window``-token sliding window (a duplicated span of length
   L >= window duplicates exactly L - window + 1 windows, so span-level
   duplication and window-level duplication coincide);
2. a window is a DUPLICATE iff the same digest occurred earlier in
   (doc_id, position) order — first occurrence survives, the classic
   keep-one rule;
3. per document, duplicate windows are merged into maximal covered
   intervals [s, s+window) (equal-length spans sorted by start merge
   with a lag + running-sum group id — no self-join), and every token
   inside a covered interval is dropped;
4. documents are reassembled from surviving tokens; documents that
   lose every token drop out.

Scale shape: the only corpus-wide shuffle carries ``(digest, doc_id,
pos)`` rows — ~40 bytes per token position regardless of ``window``
size, never the text itself. The per-digest window function does
linear work per key (a span repeated a million times is a million
2-integer rows under one key, not a pair join). Interval merge and
reassembly are per-document JVM array expressions. The md5 collision
probability at 100 TB (~10^13 windows) is ~10^-12 — the documented
trade against the paper's suffix array, which cannot be built
distributively without a terasort per round.

Reference behavior derived from the public recipe only (the reference
repo has no substring dedup; SURVEY §2 lists this as the remaining
public dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def window_fps(toks_col: str, window: int):
    """array<long> of sliding-window fingerprints over a materialized
    token-array column — index s (0-based via posexplode) is the gram
    at tokens s+1..s+window. The dual-31-bit Horner kernel
    (`text.gram_fp`): one md5 per TOKEN plus ``window`` integer
    multiply-adds per position, replacing the md5-of-joined-slice form
    that re-hashed ~window·|token| bytes per position (the top
    profiled cost of this operator family). Shared by the batch
    operator and the streaming form so their digests — and therefore
    their state — stay interchangeable."""
    from event_pipeline_spark.operators.text import window_fp_array

    return window_fp_array(F.col(toks_col), window)


def dedup_substring_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
) -> DataFrame:
    """Remove every token covered by a duplicated ``window``-token
    sliding window whose digest occurred earlier in (doc, pos) order.

    Returns (id, text, n_tokens, n_kept) with ``text`` rebuilt from the
    surviving tokens; documents shorter than ``window`` tokens emit no
    windows and are kept whole; documents losing every token drop out.
    """
    docs = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
    )
    n = F.size("_toks")
    wins = docs.where(n >= window).select(
        "_id",
        F.posexplode(window_fps("_toks", window)).alias("_s", "_h"),
    )
    dup = (
        wins.withColumn(
            "_rk",
            F.row_number().over(Window.partitionBy("_h").orderBy("_id", "_s")),
        )
        .where(F.col("_rk") > 1)
        .select("_id", "_s")
    )
    return excise_duplicate_spans(docs, dup, window=window, id_col=id_col)


def excise_duplicate_spans(
    docs: DataFrame,
    dup: DataFrame,
    *,
    window: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every token of ``docs`` (``_id``, ``_toks``) covered by a
    duplicate ``window``-token span starting at ``dup`` (``_id``,
    ``_s``); rebuild text from survivors. Shared by the batch operator
    above and the streaming foreachBatch reassembly
    (``streaming/substringdedup.py``)."""
    # merge covered intervals: equal-length spans sorted by start — a
    # new group starts when the gap to the previous start exceeds the
    # window (touching spans merge too; the dropped-token union is
    # identical either way)
    wd = Window.partitionBy("_id").orderBy("_s")
    prev = F.lag("_s").over(wd)
    grouped = dup.withColumn(
        "_g",
        F.sum(
            F.when(prev.isNull() | (F.col("_s") > prev + window), 1).otherwise(0)
        ).over(wd),
    )
    merged = grouped.groupBy("_id", "_g").agg(
        F.min("_s").alias("lo"), (F.max("_s") + window).alias("hi")
    )
    spans = merged.groupBy("_id").agg(
        F.collect_list(F.struct("lo", "hi")).alias("_spans")
    )
    joined = docs.join(spans, "_id", "left").withColumn(
        "_spans", F.coalesce("_spans", F.array())
    )
    kept = F.filter(
        F.sequence(F.lit(0), F.size("_toks") - 1),
        lambda j: ~F.exists(
            F.col("_spans"), lambda iv: (j >= iv["lo"]) & (j < iv["hi"])
        ),
    )
    return (
        joined.select(
            F.col("_id").alias(id_col),
            F.array_join(
                F.transform(kept, lambda j: F.element_at("_toks", j + 1)), " "
            ).alias("text"),
            F.size("_toks").cast("int").alias("n_tokens"),
            F.size(kept).cast("int").alias("n_kept"),
        )
        .where(F.col("n_kept") > 0)
    )


# -- registered query --------------------------------------------------------

_W = 8  # documents.text averages ~54 tokens; 8 gives both dups and survivors


def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-window dedup over the documents table (window=8 — the
    tiny synthetic vocabulary reproduces the cross-document repeated
    spans the operator exists for)."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_substring_spans(docs, window=_W).orderBy("doc_id")


QUERIES["dedup_substring_spans"] = q_dedup_substring_spans
def _wins_cte() -> str:
    from event_pipeline_spark.operators.text import gram_fp_sql, residues_sql

    return rf"""docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents),
res AS (
  SELECT doc_id, toks,
         list_transform(toks, t -> {residues_sql('t')}) AS th
  FROM docs),
wins AS (
  SELECT doc_id, i - 1 AS s, {gram_fp_sql('th', 'i', _W)} AS h
  FROM res, LATERAL unnest(generate_series(1, len(toks) - {_W} + 1)) AS t(i)
  WHERE len(toks) >= {_W})"""


ORACLES["dedup_substring_spans"] = rf"""
WITH {_wins_cte()},
dups AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rk
    FROM wins)
  WHERE rk > 1),
grp AS (
  SELECT doc_id, s,
         sum(CASE WHEN prev IS NULL OR s > prev + {_W} THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY s) AS g
  FROM (SELECT doc_id, s,
               lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
        FROM dups)),
merged AS (
  SELECT doc_id, min(s) AS lo, max(s) + {_W} AS hi
  FROM grp GROUP BY doc_id, g),
toks AS (
  SELECT doc_id, i - 1 AS j, toks[i] AS tok
  FROM docs, LATERAL unnest(generate_series(1, len(toks))) AS t(i)),
keptt AS (
  SELECT t.doc_id, t.j, t.tok
  FROM toks t
  WHERE NOT EXISTS (
    SELECT 1 FROM merged m
    WHERE m.doc_id = t.doc_id AND t.j >= m.lo AND t.j < m.hi)),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS text,
         count(*)::INT AS n_kept
  FROM keptt GROUP BY doc_id)
SELECT d.doc_id, a.text, len(d.toks)::INT AS n_tokens, a.n_kept
FROM docs d JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""
