"""Line-level exact deduplication (C4-style) + URL canonicalization.

Two standard web-curation stages:

**dedup_lines** — C4 (Raffel et al. 2020) removes repeated lines
across the whole corpus (navigation crumbs, cookie banners, license
footers recur on thousands of pages and survive per-document dedup
untouched). Public simplified rule implemented here: among all exact
occurrences of a (trimmed) line of at least ``min_line_chars``, keep
only the FIRST in (doc_id, line_idx) order; shorter lines are
structure, not content, and are always kept. Documents are reassembled
from their surviving lines in order; docs that lose every line drop
out.

Scale shape: one explode to narrow ``(line, doc_id, idx)`` rows, a
window over the line key (the shuffle carries each line ONCE per
occurrence — no pair space, no self-join), then one re-group to
reassemble. Two shuffles total, both on keys whose cardinality grows
with the corpus; skew only if one exact line dominates the corpus, in
which case the window's per-key work is still linear in its count.

**canonicalize_url** — pure JVM expression (no UDF): lowercase scheme
and host, strip the fragment, drop well-known tracking parameters
(utm_*, gclid, fbclid, ref), sort surviving query parameters, strip
trailing slash and default ports. The standard key for URL-level
dedup of a crawl.

Registered queries (both oracle-backed):
- ``dedup_lines_docs`` — six-word lines derived from documents.text;
  DuckDB recomputes first-occurrence survival + reassembly with its
  own window.
- ``url_canonical`` — canonicalization over synthetic URLs built from
  events.props; DuckDB mirrors the transform in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def dedup_lines(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """Corpus-wide exact line dedup, first occurrence wins.

    Returns (id, text, n_lines, n_kept) with ``text`` rebuilt from the
    surviving lines in original order; documents with no surviving
    line are dropped.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_idx", "_line"),
    )
    trimmed = F.trim(F.col("_line"))
    eligible = F.length(trimmed) >= min_line_chars
    w = Window.partitionBy(trimmed).orderBy("_id", "_idx")
    kept = lines.withColumn(
        "_keep",
        (~eligible) | (F.row_number().over(w) == 1),
    )
    return (
        kept.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("_keep").cast("int")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct("_idx", "_line"),
                            )
                        )
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("text"),
        )
        .where(F.col("n_kept") > 0)
        .select(
            F.col("_id").alias(id_col),
            "text",
            F.col("n_lines").cast("int").alias("n_lines"),
            F.col("n_kept").cast("int").alias("n_kept"),
        )
    )


_TRACKING = ("utm_[a-z]+", "gclid", "fbclid", "ref")


def canonicalize_url(col) -> "F.Column":
    """Canonical dedup key for a URL — one JVM expression chain.

    lowercase scheme+host, strip fragment, drop tracking params
    (utm_*, gclid, fbclid, ref), sort remaining query params, strip
    default ports and the trailing slash of a bare path.
    """
    c = F.trim(col)
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    # lowercase scheme://host[:port] (the part before the first /)
    head = F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(c, F.length(head) + 1, F.lit(1 << 30))
    head = F.lower(head)
    # Default-port stripping applies to the AUTHORITY only, and only
    # when the port is the default for that scheme — ":80"/":443" text
    # inside a path or query value is untouched, and http://h:443 stays
    # a distinct non-default-port URL.
    head = (
        F.when(head.rlike("^http://"), F.regexp_replace(head, ":80$", ""))
        .when(head.rlike("^https://"), F.regexp_replace(head, ":443$", ""))
        .otherwise(head)
    )
    c = F.concat(head, rest)
    # split query off, filter + sort params, rejoin
    base = F.regexp_extract(c, r"^([^?]*)", 1)
    query = F.regexp_extract(c, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike("^(" + "|".join(_TRACKING) + ")="),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    c = F.when(sorted_q != "", F.concat(base, F.lit("?"), sorted_q)).otherwise(
        base
    )
    # trailing slash on a bare path (scheme://host/ -> scheme://host)
    return F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")


# -- registered queries ------------------------------------------------------


def q_dedup_lines_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup over six-word lines derived from
    documents.text (the tiny synthetic vocabulary guarantees massive
    cross-document line repetition — the C4 scenario)."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(
            F.trim(F.col("text")), r"((?:\S+ ){5}\S+) ", "$1\n"
        ).alias("text"),
    )
    return dedup_lines(docs).orderBy("doc_id")


QUERIES["dedup_lines_docs"] = q_dedup_lines_docs
ORACLES["dedup_lines_docs"] = r"""
WITH prepared AS (
  SELECT doc_id,
         regexp_replace(trim(text), '((?:\S+ ){5}\S+) ', '\1' || chr(10), 'g')
             AS text
  FROM documents),
lines AS (
  SELECT doc_id, i::INT - 1 AS idx, a[i] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS a FROM prepared),
       LATERAL unnest(generate_series(1, len(a))) AS t(i)),
flagged AS (
  SELECT doc_id, idx, line,
         (length(trim(line)) < 1)
         OR (ROW_NUMBER() OVER (PARTITION BY trim(line)
                                ORDER BY doc_id, idx) = 1) AS keep
  FROM lines),
rebuilt AS (
  SELECT doc_id,
         count(*)::INT AS n_lines,
         sum(CASE WHEN keep THEN 1 ELSE 0 END)::INT AS n_kept,
         string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY idx)
             AS text
  FROM flagged GROUP BY doc_id)
SELECT doc_id, text, n_lines, n_kept
FROM rebuilt WHERE n_kept > 0
ORDER BY doc_id
"""


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization over synthetic URLs derived from event rows —
    covers tracking params, fragments, ports, case, param order."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    url = F.concat(
        F.lit("HTTPS://Example.COM:443/u/"),
        F.col("user_id").cast("string"),
        F.lit("/page?utm_source=x&b="),
        (F.col("event_id") % 7).cast("string"),
        F.lit("&a=1&gclid=zzz#frag"),
    )
    return ev.select(
        "event_id", canonicalize_url(url).alias("url")
    ).orderBy("event_id")


QUERIES["url_canonical"] = q_url_canonical
ORACLES["url_canonical"] = """
    SELECT event_id,
           'https://example.com/u/' || CAST(user_id AS VARCHAR)
           || '/page?a=1&b=' || CAST(event_id % 7 AS VARCHAR) AS url
    FROM events
    ORDER BY event_id
"""
