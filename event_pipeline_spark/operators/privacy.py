"""Right-to-erasure cascade purge (GDPR Art. 17 / CCPA delete).

The compliance operator every data platform must run: given a set of
data subjects, delete their rows from the root table AND every table
reachable through foreign keys — here the two-hop chain
``customer → orders → lineitem`` (lineitem carries no customer key;
its membership is derived through the orders hop, which is the part
naive per-table deletes get wrong).

Spark-first, scale-first:

- the subject set is TINY relative to the corpus (deletion requests),
  so every hop is a broadcast-able semi/anti join — ``LEFT ANTI`` for
  the retained remainder, ``LEFT SEMI`` to derive the next hop's key
  set; nothing ever collects to the driver;
- hop keys propagate as DataFrames (orders' purged keys feed
  lineitem's semi join), so the cascade is a join DAG Catalyst can
  broadcast per AQE stats, not a driver loop;
- the audit report (one row per table: rows before / purged / after)
  is what a deletion-compliance log must retain; ``n_purged + n_after
  == n_before`` is asserted by tests as the conservation identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def purge_cascade(
    subjects: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> tuple[dict[str, DataFrame], DataFrame]:
    """(cleaned tables by name, audit report). ``subjects`` holds one
    ``c_custkey`` column of subjects to forget."""
    subj = subjects.select("c_custkey").distinct()
    cust_clean = customer.join(subj, "c_custkey", "left_anti")
    purged_orders = orders.join(
        subj, orders.o_custkey == subj.c_custkey, "left_semi"
    )
    orders_clean = orders.join(
        subj, orders.o_custkey == subj.c_custkey, "left_anti"
    )
    li_clean = lineitem.join(
        purged_orders.select("o_orderkey"),
        lineitem.l_orderkey == purged_orders.o_orderkey,
        "left_anti",
    )

    def report(name: str, before: DataFrame, after: DataFrame) -> DataFrame:
        nb = before.agg(F.count(F.lit(1)).alias("n_before"))
        na = after.agg(F.count(F.lit(1)).alias("n_after"))
        return nb.crossJoin(na).select(
            F.lit(name).alias("table_name"),
            F.col("n_before").cast("bigint"),
            (F.col("n_before") - F.col("n_after"))
            .cast("bigint")
            .alias("n_purged"),
            F.col("n_after").cast("bigint"),
        )

    rep = (
        report("customer", customer, cust_clean)
        .unionByName(report("orders", orders, orders_clean))
        .unionByName(report("lineitem", lineitem, li_clean))
    )
    return (
        {
            "customer": cust_clean,
            "orders": orders_clean,
            "lineitem": li_clean,
        },
        rep,
    )


def q_privacy_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forget every customer with custkey % 101 == 0 (a deterministic
    stand-in for a deletion-request batch); report the cascade."""
    from event_pipeline_spark.session import read_table

    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    subjects = customer.where(F.col("c_custkey") % 101 == 0).select(
        "c_custkey"
    )
    _, rep = purge_cascade(subjects, customer, orders, lineitem)
    return rep.orderBy("table_name")


QUERIES["privacy_purge_cascade"] = q_privacy_purge
ORACLES["privacy_purge_cascade"] = """
WITH subj AS (SELECT c_custkey FROM customer WHERE c_custkey % 101 = 0),
purged_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM subj))
SELECT * FROM (
  SELECT 'customer' AS table_name,
         (SELECT count(*) FROM customer)::BIGINT AS n_before,
         (SELECT count(*) FROM customer
          WHERE c_custkey IN (SELECT c_custkey FROM subj))::BIGINT
           AS n_purged,
         (SELECT count(*) FROM customer
          WHERE c_custkey NOT IN (SELECT c_custkey FROM subj))::BIGINT
           AS n_after
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM orders)::BIGINT,
         (SELECT count(*) FROM purged_orders)::BIGINT,
         (SELECT count(*) FROM orders
          WHERE o_custkey NOT IN (SELECT c_custkey FROM subj))::BIGINT
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem)::BIGINT,
         (SELECT count(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM purged_orders))
           ::BIGINT,
         (SELECT count(*) FROM lineitem
          WHERE l_orderkey NOT IN
                (SELECT o_orderkey FROM purged_orders))::BIGINT)
ORDER BY table_name
"""


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit
# ---------------------------------------------------------------------------


def k_anonymity_report(
    df: DataFrame,
    *,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """(group_size, n_groups, n_rows, n_below_k, min_l): the
    re-identification audit a dataset release runs before publishing —
    how many quasi-identifier equivalence classes exist at each size,
    how many rows sit in classes smaller than ``k`` (k-anonymity
    violations: those individuals are re-identifiable by joining the
    quasi-identifiers against any public record), and the worst
    l-diversity (min distinct sensitive values) among classes of that
    size (a class can be k-anonymous yet leak the sensitive attribute
    outright when everyone in it shares one value).

    Output is a SIZE HISTOGRAM — one row per distinct class size, at
    most O(√n) rows by a standard counting argument — never the
    classes themselves (which would re-publish the quasi-identifiers
    the audit is about). All counts are exact BIGINTs.

    Scale shape: one groupBy on the quasi-identifier tuple (the only
    corpus shuffle; count-distinct of the sensitive value rides the
    same aggregate), then a histogram aggregate over |classes| rows."""
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct(sensitive_col).cast("bigint").alias("n_sens"),
    )
    return (
        classes.groupBy(F.col("n").alias("group_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("n_below_k"),
            F.min("n_sens").cast("bigint").alias("min_l"),
            F.sum((F.col("n_sens") < l).cast("long"))
            .cast("bigint")
            .alias("n_low_diversity"),
        )
    )


def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit customer quasi-identifiers (nation, market segment, name
    length) with account-balance sign as the sensitive attribute."""
    from event_pipeline_spark.session import read_table

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.length("c_name").alias("name_len"),
        (F.col("c_acctbal") >= 0).cast("int").alias("bal_sign"),
    )
    return k_anonymity_report(
        cust,
        quasi_cols=["nation", "segment", "name_len"],
        sensitive_col="bal_sign",
        k=5,
        l=2,
    ).orderBy("group_size")


QUERIES["privacy_k_anonymity"] = q_privacy_k_anonymity
ORACLES["privacy_k_anonymity"] = """
WITH base AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         length(c_name) AS name_len,
         CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS bal_sign
  FROM customer),
classes AS (
  SELECT nation, segment, name_len, count(*)::BIGINT AS n,
         count(DISTINCT bal_sign)::BIGINT AS n_sens
  FROM base GROUP BY nation, segment, name_len)
SELECT n AS group_size, count(*)::BIGINT AS n_groups,
       sum(n)::BIGINT AS n_rows,
       sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS n_below_k,
       min(n_sens)::BIGINT AS min_l,
       sum(CASE WHEN n_sens < 2 THEN 1 ELSE 0 END)::BIGINT
         AS n_low_diversity
FROM classes GROUP BY n ORDER BY group_size
"""


# ---------------------------------------------------------------------------
# differentially-private counts (seeded Laplace mechanism)
# ---------------------------------------------------------------------------


def dp_counts(
    df: DataFrame,
    *,
    key_col: str,
    epsilon: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """(key, noisy_count): per-key counts released through the Laplace
    mechanism — noise ~ Laplace(1/ε) for the count query's sensitivity
    of 1, the standard ε-DP release for histograms. The inverse-CDF
    draw −b·sgn(u−½)·ln(1−2|u−½|) runs on a DETERMINISTIC uniform
    u = (md5_low(key‖salt) mod 2⁵² + ½)/2⁵² (the ``dsir.py`` Gumbel
    recipe), so the whole release replays in the oracle and in reruns.

    Seeding caveat, stated rather than hidden: ε-DP accounting
    requires FRESH randomness per release — the seeded draw makes a
    single release exactly reproducible (the evaluation/audit mode),
    and production must rotate ``salt`` per release and account the ε
    budget across releases. True counts are intentionally NOT in the
    output (releasing them beside the noise would defeat the point);
    tests reconstruct them separately to verify the mechanism.

    Exactness: one map-side-combinable count per key; u is exact
    integer arithmetic; the noise is one ln (round-7, the repo log
    contract) and the release rounds to 4dp."""
    from event_pipeline_spark.operators.sampling import hash_hex

    b = 1.0 / float(epsilon)
    h8 = hash_hex(F.col("key"), salt)  # 32 uniform bits, engine-portable
    h13 = F.conv(
        F.concat(
            h8,
            F.substring(F.md5(F.concat(F.col("key").cast("string"),
                                        F.lit(salt))), 9, 5),
        ),
        16,
        10,
    ).cast("decimal(20,0)")
    m = F.lit(1 << 52).cast("decimal(20,0)")
    u = (F.pmod(h13, m).cast("double") + 0.5) / F.lit(float(1 << 52))
    mag = F.round(
        F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))), 7
    )
    noise = F.when(u < 0.5, F.lit(b) * mag).otherwise(-F.lit(b) * mag)
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return per.select(
        F.col("key").alias(key_col),
        F.round(F.col("c") + noise, 4).alias("noisy_count"),
    )


DP_EPS = 0.5
DP_SALT = "dp-r8"


def q_privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=0.5 DP release of per-event-type counts."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    return dp_counts(
        ev, key_col="event_type", epsilon=DP_EPS, salt=DP_SALT
    ).orderBy("event_type")


QUERIES["privacy_dp_counts"] = q_privacy_dp_counts
ORACLES["privacy_dp_counts"] = f"""
WITH per AS (
  SELECT event_type AS key, count(*)::BIGINT AS c
  FROM events GROUP BY event_type),
drawn AS (
  SELECT key, c,
         ((('0x' || substr(md5(key || '{DP_SALT}'), 1, 8)
            || substr(md5(key || '{DP_SALT}'), 9, 5))::BIGINT
           % {1 << 52})::DOUBLE + 0.5) / {float(1 << 52)} AS u
  FROM per),
noised AS (
  SELECT key, c, u,
         round(ln(1.0 - 2.0 * abs(u - 0.5)), 7) AS mag
  FROM drawn)
SELECT key AS event_type,
       round(c + CASE WHEN u < 0.5 THEN {1.0 / DP_EPS} * mag
                      ELSE -{1.0 / DP_EPS} * mag END, 4) AS noisy_count
FROM noised ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# DP top-k (exponential mechanism via Gumbel noise)
# ---------------------------------------------------------------------------

DP_TOPK = 3
DP_TOPK_SALT = "dp-topk-r9"


def dp_topk(
    df: DataFrame,
    *,
    key_col: str,
    k: int = DP_TOPK,
    epsilon: float = 1.0,
    salt: str = DP_TOPK_SALT,
) -> DataFrame:
    """(rank, key): the ε-DP top-k most frequent keys via the
    exponential mechanism in its Gumbel-noise form (Durfee & Rogers
    2019): rank keys by ε·count/2 + Gumbel(0,1) and release the top k
    — equivalent to k rounds of the exponential mechanism peeling
    (count utility, sensitivity 1). Only the RANKING is released;
    counts and scores stay inside the mechanism (the ``dp_counts``
    release discipline — publishing the noisy score beside the rank
    would spend extra budget).

    The Gumbel draw is the deterministic md5 recipe every sampling
    operator here uses (u from low-53 bits of md5(key‖salt), g =
    −ln(−ln(u)) rounded 6dp), so the release replays exactly in the
    oracle and in reruns — with the same stated seeding caveat as
    ``dp_counts``: production rotates the salt per release and
    accounts ε.

    Scale shape: one map-side-combinable count per key, then
    TakeOrdered over |keys| scored rows — no full sort."""
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    from event_pipeline_spark.operators.dsir import _md5_low64

    u = (
        (
            _md5_low64(F.concat(F.col("key").cast("string"), F.lit(salt)))
            % F.lit(1 << 53)
        ).cast("double")
        + 0.5
    ) / F.lit(float(1 << 53))
    g = -F.log(-F.log(u))
    scored = per.select(
        "key",
        F.round(
            F.lit(float(epsilon) / 2.0) * F.col("c").cast("double") + g, 6
        ).alias("_score"),
    )
    ranked = (
        scored.orderBy(F.desc("_score"), F.col("key")).limit(k)
    )
    from pyspark.sql import Window

    return ranked.select(
        F.row_number()
        .over(Window.orderBy(F.desc("_score"), F.col("key")))
        .cast("int")
        .alias("rank"),
        F.col("key").alias(key_col),
    )


def q_privacy_dp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return dp_topk(
        read_table(spark, sf_dir, "events"), key_col="event_type"
    ).orderBy("rank")


QUERIES["privacy_dp_topk"] = q_privacy_dp_topk
ORACLES["privacy_dp_topk"] = f"""
WITH per AS (
  SELECT event_type AS key, count(*)::BIGINT AS c
  FROM events GROUP BY event_type),
scored AS (
  SELECT key,
         round(0.5 * c::DOUBLE
               + (-ln(-ln(((md5_number_lower(key || '{DP_TOPK_SALT}')
                            ::HUGEINT % {1 << 53})::DOUBLE + 0.5)
                          / {float(1 << 53)}))), 6) AS s
  FROM per)
SELECT row_number() OVER (ORDER BY s DESC, key)::INT AS rank, key
  AS event_type
FROM scored ORDER BY s DESC, key LIMIT {DP_TOPK}
"""
