"""Within-source repeated-line removal (boilerplate stripping).

The RefinedWeb / CCNet line-wise rule: a line that recurs across
documents of the SAME source is boilerplate (headers, footers, nav,
cookie banners) and every copy is dropped — distinct from C4-style
line dedup (``operators/lines.py``), which keeps the FIRST occurrence
of each line corpus-wide. The two compose: strip boilerplate first
(prevalence-based, all copies go), dedup what's left
(occurrence-based, one copy survives).

Scale shape: the only corpus-sized stages are a distinct over
(source, doc, line-digest) and the line-count groupBy — both
map-side-combinable digest shuffles; the strip is a left-anti join of
exploded lines against the (small) boilerplate set, then a per-doc
JVM reassembly ordered by line index. At 100 TB the boilerplate set
per source is bounded by distinct repeated lines (tiny vs the corpus).

Registered query derives 6-word lines from documents.text with the
same regexp the ``dedup_lines_docs`` pair uses, grouped by ``source``
(the corpus has no natural newlines; the tiny vocabulary guarantees
cross-document repetition — the boilerplate scenario).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

#: a line is boilerplate when it appears in at least this many distinct
#: documents of one source (RefinedWeb's "more than once" rule)
MIN_DOCS = 2


def repeated_lines(
    docs: DataFrame,
    *,
    min_docs: int = MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(group, line, n_docs): lines appearing in >= min_docs distinct
    documents of one group — the boilerplate report."""
    dl = docs.select(
        F.col(group_col).alias("_grp"),
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).distinct()
    return (
        dl.groupBy("_grp", "line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select(F.col("_grp").alias(group_col), "line", "n_docs")
    )


def strip_repeated_lines(
    docs: DataFrame,
    *,
    min_docs: int = MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Documents with every within-group repeated line removed (ALL
    copies — the prevalence rule, not first-occurrence). Returns
    (id, text, n_lines, n_kept); documents losing every line drop out
    (the ``excise_duplicate_spans`` contract)."""
    boiler = repeated_lines(
        docs,
        min_docs=min_docs,
        id_col=id_col,
        text_col=text_col,
        group_col=group_col,
    ).select(F.col(group_col).alias("_bgrp"), F.col("line").alias("_bline"))
    lines = docs.select(
        F.col(group_col).alias("_grp"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_idx", "_line"),
    )
    kept = lines.join(
        boiler,
        (lines["_grp"] == boiler["_bgrp"]) & (lines["_line"] == boiler["_bline"]),
        "left_anti",
    )
    n_lines = docs.select(
        F.col(id_col).alias("_id"),
        F.size(F.split(F.col(text_col), "\n")).cast("int").alias("n_lines"),
    )
    rebuilt = (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_idx", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("text"),
            F.count(F.lit(1)).cast("int").alias("n_kept"),
        )
    )
    return rebuilt.join(n_lines, "_id").select(
        F.col("_id").alias(id_col), "text", "n_lines", "n_kept"
    )


def _prepared_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.regexp_replace(
            F.trim(F.col("text")), r"((?:\S+ ){5}\S+) ", "$1\n"
        ).alias("text"),
    )


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return strip_repeated_lines(_prepared_docs(spark, sf_dir)).orderBy(
        "doc_id"
    )


_PREP_CTE = r"""prepared AS (
  SELECT doc_id, source,
         regexp_replace(trim(text), '((?:\S+ ){5}\S+) ', '\1' || chr(10),
                        'g') AS text
  FROM documents)"""

QUERIES["boilerplate_strip"] = q_boilerplate_strip
ORACLES["boilerplate_strip"] = f"""
WITH {_PREP_CTE},
lines AS (
  SELECT source, doc_id, i::INT - 1 AS idx, a[i] AS line
  FROM (SELECT source, doc_id, string_split(text, chr(10)) AS a
        FROM prepared),
       LATERAL unnest(generate_series(1, len(a))) AS t(i)),
boiler AS (
  SELECT source, line
  FROM (SELECT DISTINCT source, doc_id, line FROM lines)
  GROUP BY source, line HAVING count(*) >= {MIN_DOCS}),
kept AS (
  SELECT l.doc_id, l.idx, l.line FROM lines l
  WHERE NOT EXISTS (
    SELECT 1 FROM boiler b
    WHERE b.source = l.source AND b.line = l.line)),
nl AS (
  SELECT doc_id, len(string_split(text, chr(10)))::INT AS n_lines
  FROM prepared)
SELECT k.doc_id,
       string_agg(k.line, chr(10) ORDER BY k.idx) AS text,
       any_value(nl.n_lines) AS n_lines,
       count(*)::INT AS n_kept
FROM kept k JOIN nl USING (doc_id)
GROUP BY k.doc_id
ORDER BY k.doc_id
"""
