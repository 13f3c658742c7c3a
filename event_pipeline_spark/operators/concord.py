"""KWIC concordance (keyword-in-context).

The corpus linguist's primary tool (Luhn 1960's keyword-in-context
index): every occurrence of a query term with its surrounding
context window, one row per hit. Also the debugging surface for
every text operator in this repo — "show me where the corpus says X".

Spark-first: one pass — the token array is bound once per row
(``text.bind``; the raw expression would re-split per position), hit
positions are found inside the array (``filter(sequence(...))``), and
the context windows are array slices of the SAME bound array, so a
document is never tokenized twice. The hit filter pushes the
``contains`` predicate to the scan; the output is a narrow projection
(no shuffle at all — ``explode`` is pipeline-local).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def kwic(
    docs: DataFrame,
    term: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
) -> DataFrame:
    """(id, i, left_ctx, term, right_ctx) per occurrence of ``term``."""
    from event_pipeline_spark.operators.lm import whitespace_tokens
    from event_pipeline_spark.operators.text import bind

    def build(a: Column) -> Column:
        hits = F.filter(
            F.sequence(F.lit(1), F.size(a)),
            lambda i: F.element_at(a, i) == F.lit(term),
        )
        return F.transform(
            hits,
            lambda i: F.struct(
                i.alias("i"),
                F.array_join(
                    F.slice(
                        a,
                        F.greatest(F.lit(1), i - window),
                        i - F.greatest(F.lit(1), i - window),
                    ),
                    " ",
                ).alias("left_ctx"),
                F.array_join(F.slice(a, i + 1, window), " ").alias(
                    "right_ctx"
                ),
            ),
        )

    hits = bind(whitespace_tokens(F.col(text_col)), build)
    return (
        docs.where(F.col(text_col).contains(term))
        .select(F.col(id_col), F.inline(hits))
        .select(
            id_col,
            F.col("i").cast("int").alias("i"),
            "left_ctx",
            F.lit(term).alias("term"),
            "right_ctx",
        )
    )


def q_text_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concordance of 'dup' — the corpus's rare marker token."""
    from event_pipeline_spark.session import read_table

    return kwic(read_table(spark, sf_dir, "documents"), "dup").orderBy(
        "doc_id", "i"
    )


QUERIES["text_kwic"] = q_text_kwic
ORACLES["text_kwic"] = """
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a
  FROM documents WHERE contains(text, 'dup')),
hits AS (
  SELECT doc_id, i::INT AS i, a
  FROM base, LATERAL unnest(generate_series(1, len(a))) AS t(i)
  WHERE a[i] = 'dup')
SELECT doc_id, i,
       coalesce(array_to_string(a[greatest(1, i - 3):i - 1], ' '), '')
         AS left_ctx,
       'dup' AS term,
       coalesce(array_to_string(a[i + 1:least(len(a), i + 3)], ' '), '')
         AS right_ctx
FROM hits ORDER BY doc_id, i
"""
