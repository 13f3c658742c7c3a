"""Contrastive training-pair assembly: deterministic negative sampling.

Embedding / recommendation training needs, for every (anchor,
positive) ground-truth pair, k negatives the anchor did NOT interact
with — drawn uniformly-ish from a corpus that can be 100 TB. The
naive draw ("per anchor, sample k of the corpus and reject
positives") is an anchors×corpus cross product; this module's draw is
ONE equi-join:

- every corpus candidate lands in a hash bucket (a 1-hex-char md5
  prefix by default) and gets a dense per-bucket position from a
  hash-ordered ``row_number`` — computed once, corpus-wide;
- each (anchor, probe j) derives a bucket and a start position from
  md5(anchor, j) and OPEN-ADDRESSES ``probe_window`` consecutive
  positions (mod bucket size), so rejecting a positive just means
  taking the next slot;
- the join key is the exact (bucket, position) pair — k·probe_window
  rows per anchor move, never the bucket's contents.

Everything is md5 arithmetic on strings plus one hex→int conversion,
so the DuckDB oracle replays the draw bit-for-bit (the
``sampling.py`` hash_hex contract). A probe whose whole window is
positives emits nothing (deterministic, observable — probability
(pos_rate)^probe_window); two probes of one anchor can collide on the
same candidate, so the result dedupes to the FIRST probe per (anchor,
candidate) and may hold fewer than k rows — the standard
sample-without-replacement caveat, documented rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _md5(*parts: Column) -> Column:
    return F.md5(F.concat(*parts))


def negative_samples(
    anchors: DataFrame,
    corpus: DataFrame,
    positives: DataFrame,
    *,
    anchor_col: str,
    cand_col: str,
    k: int = 3,
    probe_window: int = 4,
    bucket_chars: int = 1,
    salt: str = "",
) -> DataFrame:
    """(anchor, probe, neg_id): up to ``k`` deterministic negatives per
    anchor (see module doc). ``anchors`` holds distinct anchor ids;
    ``positives`` holds the (anchor, candidate) interactions to
    exclude; ``corpus`` holds candidate ids. Raise ``bucket_chars``
    (16^n buckets) as the corpus grows so per-bucket position stays
    dense under the int range."""
    c = F.col(cand_col).cast("string")
    slit = F.lit(salt)

    bucketed = corpus.select(
        F.col(cand_col).alias("cand"),
        F.substring(_md5(c, slit), 1, bucket_chars).alias("b"),
        _md5(c, F.lit("~"), slit).alias("_ord"),
    )
    placed = bucketed.select(
        "cand",
        "b",
        (
            F.row_number().over(
                Window.partitionBy("b").orderBy("_ord", "cand")
            )
            - 1
        ).alias("pos"),
    )
    sizes = placed.groupBy("b").agg(F.count(F.lit(1)).alias("n_b"))

    probe_hex = _md5(
        F.col("anchor").cast("string"),
        F.lit("#"),
        F.col("j").cast("string"),
        slit,
    )
    probes = (
        anchors.select(F.col(anchor_col).alias("anchor"))
        .withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(k))))
        .select(
            "anchor",
            "j",
            F.substring(probe_hex, 1, bucket_chars).alias("b"),
            F.conv(F.substring(probe_hex, 9, 8), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .join(F.broadcast(sizes), "b")
        .withColumn(
            "i", F.explode(F.sequence(F.lit(0), F.lit(probe_window - 1)))
        )
        .select(
            "anchor",
            "j",
            "b",
            "i",
            F.pmod(F.col("h") + F.col("i"), F.col("n_b")).alias("pos"),
        )
    )
    cands = probes.join(placed, ["b", "pos"]).select(
        "anchor", "j", "i", "cand"
    )
    surviving = cands.join(
        positives.select(
            F.col(anchor_col).alias("anchor"), F.col(cand_col).alias("cand")
        ).dropDuplicates(["anchor", "cand"]),
        ["anchor", "cand"],
        "left_anti",
    )
    first_per_probe = (
        surviving.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("anchor", "j").orderBy("i")
            ),
        )
        .where(F.col("_rk") == 1)
        .drop("_rk", "i")
    )
    return first_per_probe.groupBy("anchor", "cand").agg(
        F.min("j").alias("probe")
    ).select(
        F.col("anchor").alias(anchor_col),
        "probe",
        F.col("cand").alias("neg_id"),
    )


NEG_K = 3
NEG_WINDOW = 4
NEG_SALT = "neg8"


def q_ml_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommendation-shaped draw: for every customer (anchor), k
    deterministic part negatives excluding everything the customer
    actually ordered (orders ⋈ lineitem positives)."""
    from event_pipeline_spark.session import read_table

    customers = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("anchor_id")
    )
    parts = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("cand_id")
    )
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    positives = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .select(
            F.col("o_custkey").alias("anchor_id"),
            F.col("l_partkey").alias("cand_id"),
        )
    )
    return negative_samples(
        customers,
        parts,
        positives,
        anchor_col="anchor_id",
        cand_col="cand_id",
        k=NEG_K,
        probe_window=NEG_WINDOW,
        salt=NEG_SALT,
    ).orderBy("anchor_id", "probe", "neg_id")


QUERIES["ml_negative_samples"] = q_ml_negative_samples
ORACLES["ml_negative_samples"] = f"""
WITH corpus AS (
  SELECT p_partkey AS cand,
         substr(md5(p_partkey::VARCHAR || '{NEG_SALT}'), 1, 1) AS b,
         md5(p_partkey::VARCHAR || '~' || '{NEG_SALT}') AS ord
  FROM part),
placed AS (
  SELECT cand, b,
         row_number() OVER (PARTITION BY b ORDER BY ord, cand) - 1 AS pos
  FROM corpus),
sizes AS (SELECT b, count(*)::BIGINT AS n_b FROM placed GROUP BY b),
pos_pairs AS (
  SELECT DISTINCT o_custkey AS anchor, l_partkey AS cand
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
probes AS (
  SELECT c.c_custkey AS anchor, j.j,
         substr(md5(c.c_custkey::VARCHAR || '#' || j.j::VARCHAR
                    || '{NEG_SALT}'), 1, 1) AS b,
         ('0x' || substr(md5(c.c_custkey::VARCHAR || '#' || j.j::VARCHAR
                             || '{NEG_SALT}'), 9, 8))::BIGINT AS h
  FROM customer c,
       (SELECT unnest(generate_series(1, {NEG_K})) AS j) j),
windows AS (
  SELECT p.anchor, p.j, p.b, i.i, (p.h + i.i) % s.n_b AS pos
  FROM probes p JOIN sizes s USING (b),
       (SELECT unnest(generate_series(0, {NEG_WINDOW - 1})) AS i) i),
cands AS (
  SELECT w.anchor, w.j, w.i, pl.cand
  FROM windows w JOIN placed pl ON pl.b = w.b AND pl.pos = w.pos),
surviving AS (
  SELECT c.anchor, c.j, c.i, c.cand
  FROM cands c LEFT JOIN pos_pairs pp
    ON pp.anchor = c.anchor AND pp.cand = c.cand
  WHERE pp.anchor IS NULL),
first_per_probe AS (
  SELECT anchor, j, cand FROM surviving
  QUALIFY row_number() OVER (PARTITION BY anchor, j ORDER BY i) = 1)
SELECT anchor AS anchor_id, min(j)::INT AS probe, cand AS neg_id
FROM first_per_probe GROUP BY anchor, cand
ORDER BY anchor_id, probe, neg_id
"""
