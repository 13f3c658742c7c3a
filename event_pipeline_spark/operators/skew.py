"""Skew-handling helpers: salting for hot keys (SURVEY "Optimize for
scale": skewed keys → salting or AQE skew-join).

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``, on in our
session factory) only rescues *sort-merge joins* after a shuffle has
already materialized oversized partitions. These helpers restructure the
plan instead, for the cases AQE does not cover:

- ``salted_agg``: a skewed ``groupBy`` — one hot key lands on one reducer
  no matter what AQE does; two-phase (salt, partial, merge) spreads it
  over ``n_salts`` reducers. Spark's map-side partial aggregation already
  smooths moderate skew, so reach for this only when a handful of keys
  dominate *within many input partitions*.
- ``salted_join``: a skewed equi-join where the build side is too big to
  broadcast; the probe side gets a per-row salt, the build side is
  replicated ``n_salts`` ways, and the join key becomes (key, salt).

Both are pure DataFrame rewrites — Catalyst still picks the physical
join/agg; correctness does not depend on *which* salt a row gets, so a
nondeterministic salt (``rand``) is safe under task retries.

``key_skew`` is the diagnostic: top-k key frequencies + skew ratio, used
to decide whether salting is worth the replication cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

#: partial/merge function pairs for algebraic aggregates: phase 1 runs
#: ``partial`` per (keys, salt), phase 2 ``merge``s per keys.
_DECOMPOSABLE = {
    "count": ("count", "sum"),
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def _with_salt(df: DataFrame, n_salts: int, seed: int | None) -> DataFrame:
    rand = F.rand(seed) if seed is not None else F.rand()
    return df.withColumn(SALT_COL, (rand * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
    seed: int | None = 42,
) -> DataFrame:
    """Two-phase aggregation over skewed group keys.

    ``aggs`` is a list of ``(column, fn, alias)`` with ``fn`` in
    ``count | sum | min | max | avg`` (the algebraic aggregates — the ones
    with a partial/merge decomposition; ``avg`` decomposes into sum+count
    and divides at merge). Output schema: ``keys + [alias, ...]``.
    """
    partial_cols: list = []
    merge_cols: list = []
    for col, fn, alias in aggs:
        if fn == "avg":
            partial_cols.append(F.sum(col).alias(f"__s_{alias}"))
            partial_cols.append(F.count(col).alias(f"__c_{alias}"))
            merge_cols.append(
                (F.sum(f"__s_{alias}") / F.sum(f"__c_{alias}")).alias(alias)
            )
            continue
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"{fn!r} is not algebraic; salting cannot decompose it "
                f"(supported: {sorted(_DECOMPOSABLE)} + avg)"
            )
        pfn, mfn = _DECOMPOSABLE[fn]
        partial_cols.append(getattr(F, pfn)(col).alias(f"__p_{alias}"))
        merge_cols.append(getattr(F, mfn)(f"__p_{alias}").alias(alias))

    salted = _with_salt(df, n_salts, seed)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_cols)
    return partial.groupBy(*keys).agg(*merge_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int | None = 42,
) -> DataFrame:
    """Equi-join with a skewed ``left`` (probe) side and a ``right``
    (build) side too large to broadcast.

    The left side gets one salt per row; the right side is replicated
    once per salt value, so every (key, salt) shuffle partition holds the
    full set of matching right rows. Replication factor = ``n_salts`` on
    the right side only — size accordingly. ``how`` must be ``inner`` or
    ``left``: under replication an unmatched *right* row would surface
    ``n_salts`` times, so right/full/anti joins are refused.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, not {how!r} (an unmatched "
            "right row would appear once per salt)"
        )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    lhs = _with_salt(left, n_salts, seed)
    rhs = right.withColumn(SALT_COL, F.explode(salts))
    return lhs.join(rhs, on + [SALT_COL], how).drop(SALT_COL)


def key_skew(df: DataFrame, keys: list[str], top: int = 10) -> DataFrame:
    """Diagnostic: the ``top`` heaviest key groups with their share of all
    rows and the skew ratio vs a perfectly uniform key (>~10 means a
    shuffle on these keys will hot-spot; consider salting).
    One aggregation pass + a tiny second pass over group counts.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("groups")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *keys,
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            # ROUND(x, 6), not 2: coarse rounding of a raw double lands on
            # .5 boundaries where engines disagree (SURVEY §2.10 convention)
            F.round(F.col("n") * F.col("groups") / F.col("total"), 6).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.desc("n"), *keys)
        .limit(top)
    )


# -- oracle-checked query surface (driver correctness gate) ----------------
#
# Salting must be *invisible* in results: each entry's oracle is the plain
# unsalted SQL, so the differential check proves the rewrite is exact.

QUERIES = {}
ORACLES = {}

_DEC = "decimal(18,2)"


def _skew_salted_agg(spark, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    events = read_table(spark, sf_dir, "events").withColumn(
        "v", F.col("value").cast(_DEC)
    )
    out = salted_agg(
        events,
        ["event_type"],
        [("v", "count", "n"), ("v", "sum", "sum_v"),
         ("v", "min", "min_v"), ("v", "max", "max_v")],
        n_salts=8,
    )
    # Final DOUBLE cast on every decimal measure: DuckDB's fetchdf()
    # renders DECIMAL as float64, and the driver value-hash compares
    # rendered values — decimal pre-cast keeps the SUM exact, the cast
    # aligns the representation.
    return out.select(
        "event_type", "n", F.col("sum_v").cast("double").alias("sum_v"),
        F.col("min_v").cast("double").alias("min_v"),
        F.col("max_v").cast("double").alias("max_v"),
    ).orderBy("event_type")


QUERIES["skew_salted_agg"] = _skew_salted_agg
ORACLES["skew_salted_agg"] = """
SELECT event_type,
       COUNT(value) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
       CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
       CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v
FROM events GROUP BY event_type ORDER BY event_type"""


def _skew_salted_join(spark, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    return salted_join(orders, dim, ["o_custkey"], n_salts=4).orderBy("o_orderkey")


QUERIES["skew_salted_join"] = _skew_salted_join
ORACLES["skew_salted_join"] = """
SELECT o_orderkey, o_custkey, c_mktsegment AS segment
FROM orders JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey"""


def _skew_key_diag(spark, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return key_skew(read_table(spark, sf_dir, "events"), ["user_id"], top=10)


QUERIES["skew_key_diag"] = _skew_key_diag
ORACLES["skew_key_diag"] = """
WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
     s AS (SELECT SUM(n) AS total, COUNT(*) AS n_groups FROM c)
SELECT user_id, n,
       ROUND(n / total, 6) AS share,
       ROUND(n * n_groups / total, 6) AS skew_ratio
FROM c, s ORDER BY n DESC, user_id LIMIT 10"""
