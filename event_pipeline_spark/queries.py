"""Core query library: the SURVEY.md §2.10 oracle queries Q1–Q27.

Each query exists twice, by design:

- a **Spark DataFrame implementation** ``(spark, sf_dir) -> DataFrame`` —
  declarative, Catalyst-optimizable (pushdown/pruning/broadcast come free);
- an **ANSI-SQL oracle** string that DuckDB runs over the same parquet —
  the driver hash-compares both at sf0.01 (CORRECTNESS_r{N}.json).

Column names are aliased identically on both sides (the driver sorts
columns by name before hashing). Determinism conventions (SURVEY §2.10):
every query ends its ORDER BY in a unique key; DOUBLE measures are cast
to DECIMAL(18,2) before SUM; ratios are ROUND(x, 6) of one double division.

Each query docstring cites the reference behavior it re-expresses
(paths relative to /root/reference/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

DEC = T.DecimalType(18, 2)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return read_table(spark, sf_dir, name)


def query(name: str, oracle: str | None = None):
    """Register a query implementation and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Q1–Q16: the reference's own semantics re-expressed relationally
# ---------------------------------------------------------------------------


@query(
    "q1",
    """SELECT event_type, COUNT(*) AS n FROM events
       GROUP BY event_type ORDER BY event_type""",
)
def q1_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + group-count.

    Re-expresses ResultSet ``__len__``/store ``count()`` (reference
    nexus/result.py:196-197, backends/stores/sqlite_store.py:233-243) and
    the user_posts_etl group-count example (examples/user_posts_etl/
    events.py:66-92). Map-side partial aggregation makes this one shuffle
    of |distinct event_type| rows per partition at any scale.
    """
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "q2",
    """SELECT user_id, COUNT(*) AS total,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
       FROM events GROUP BY user_id HAVING COUNT(*) > 5 ORDER BY user_id""",
)
def q2_retry_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts + HAVING — the retry-stats shape of the
    reference's telemetry reporter (nexus/telemetry/reporter.py:70-94)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("total"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("errors"),
        )
        .where(F.col("total") > 5)
        .orderBy("user_id")
    )


@query(
    "q3",
    """SELECT event_id, user_id, value FROM events
       WHERE event_type = 'click' AND value > 50 ORDER BY event_id""",
)
def q3_filter_exact_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup DSL ``__exact`` + ``__gt`` + AND-conjunction
    (nexus/result.py:327-334,432-442,314-336). Both predicates push down
    to the parquet scan (PushedFilters in the physical plan)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.where((F.col("event_type") == "click") & (F.col("value") > 50))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )


@query(
    "q4",
    """SELECT o_orderkey, o_orderpriority FROM orders
       WHERE o_orderpriority LIKE '%URGENT%' ORDER BY o_orderkey""",
)
def q4_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup DSL ``__contains`` (nexus/result.py:414-417), which the
    reference's SQLite store pushes down as LIKE (sqlite_store.py:252-254)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderpriority").contains("URGENT"))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@query(
    "q5",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_name LIKE 'Customer%' AND lower(c_mktsegment) LIKE '%build%'
       ORDER BY c_custkey""",
)
def q5_startswith_icontains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``__startswith`` + ``__icontains`` (nexus/result.py:419-430;
    pushdown sqlite_store.py:255-263); also the case-insensitive
    ``filter_by_event`` (task.py:590-603)."""
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.where(
            F.col("c_name").startswith("Customer")
            & F.lower(F.col("c_mktsegment")).contains("build")
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q6",
    """SELECT n_nationkey, n_name FROM nation
       WHERE n_regionkey IN (0, 2) AND n_name IS NOT NULL ORDER BY n_nationkey""",
)
def q6_in_isnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``__in`` + ``__isnull`` (nexus/result.py:444-451; pushdown
    sqlite_store.py:268-273)."""
    nation = _t(spark, sf_dir, "nation")
    return (
        nation.where(
            F.col("n_regionkey").isin(0, 2) & F.col("n_name").isNotNull()
        )
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


@query(
    "q7",
    """SELECT DISTINCT user_id, event_type FROM events
       ORDER BY user_id, event_type""",
)
def q7_identity_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ResultSet's dict-on-id identity dedup (nexus/result.py:180-186)
    as DISTINCT — a partial-aggregate shuffle, skew-safe under AQE."""
    events = _t(spark, sf_dir, "events")
    return (
        events.select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
    )


@query(
    "q8",
    """SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'click'
       UNION SELECT user_id FROM events WHERE event_type = 'purchase') u
       ORDER BY user_id""",
)
def q8_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ResultSet.add`` set-union with dedup (nexus/result.py:210-221)."""
    events = _t(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select("user_id")
    buys = events.where(F.col("event_type") == "purchase").select("user_id")
    return clicks.union(buys).distinct().orderBy("user_id")


@query(
    "q9",
    """SELECT c_custkey FROM customer WHERE NOT EXISTS
       (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""",
)
def q9_discard_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ResultSet.discard`` (nexus/result.py:228-238) as a left-anti
    join — Catalyst picks broadcast-anti when the probe side fits."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q10",
    """SELECT c_custkey FROM customer WHERE EXISTS
       (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
       ORDER BY c_custkey""",
)
def q10_contains_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ResultSet.__contains__`` (nexus/result.py:188-191) as a
    left-semi join; the totalprice filter is applied pre-join so it
    pushes to the orders scan."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_semi"
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q11",
    """SELECT event_id, user_id, event_type FROM events
       ORDER BY ts, event_id LIMIT 1""",
)
def q11_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ResultSet.first()`` (nexus/result.py:456-461). The reference
    relies on insertion order; Spark has none, so order is explicit
    (ts, event_id) — a documented divergence (SURVEY §7 hard parts).
    ORDER BY + LIMIT 1 compiles to TakeOrderedAndProject (no full sort).
    """
    events = _t(spark, sf_dir, "events")
    return (
        events.orderBy("ts", "event_id")
        .select("event_id", "user_id", "event_type")
        .limit(1)
    )


@query(
    "q12",
    """SELECT user_id,
              SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) / 100.0
                  AS total_value,
              COUNT(*) AS n
       FROM events GROUP BY user_id ORDER BY user_id""",
)
def q12_duration_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PipelineExecutionMetrics duration aggregates
    (nexus/pipeline.py:603-617) as exact fixed-point SUM + COUNT:
    values snapped to 2dp (DECIMAL(18,2) cast — same rounding both
    engines), scaled to BIGINT for a cheap exact order-independent sum,
    descaled once per group. The /100.0 divides bit-identical integers
    on both sides, so the float64 rendering matches DuckDB's fetchdf()
    exactly (a decimal-typed output would repr-split the value hash)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            (F.sum((F.col("value").cast(DEC) * 100).cast("bigint")) / 100.0)
            .alias("total_value"),
            F.count("*").alias("n"),
        )
        .orderBy("user_id")
    )


@query(
    "q13",
    """SELECT user_id,
              MIN(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS all_success,
              MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS any_error
       FROM events GROUP BY user_id ORDER BY user_id""",
)
def q13_evaluation_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four EventExecutionEvaluationState outcomes (nexus/base.py:
    276-308) derived from two aggregates: all_success = bool_and(NOT
    error), any_error = bool_or(error), encoded as MIN/MAX over 0/1."""
    events = _t(spark, sf_dir, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return (
        events.groupBy("user_id")
        .agg(
            F.min(1 - is_err).alias("all_success"),
            F.max(is_err).alias("any_error"),
        )
        .orderBy("user_id")
    )


@query(
    "q14",
    """SELECT event_type,
              ROUND(CAST(SUM(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS DOUBLE)
                    / COUNT(*), 6) AS rate
       FROM events GROUP BY event_type ORDER BY event_type""",
)
def q14_success_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """success_rate / completion_rate (nexus/pipeline.py:595-625):
    one double division of two exact counts, rounded to 6 places."""
    events = _t(spark, sf_dir, "events")
    ok = F.sum(F.when(F.col("value") >= 50, 1).otherwise(0))
    return (
        events.groupBy("event_type")
        .agg(F.round(ok.cast("double") / F.count("*"), 6).alias("rate"))
        .orderBy("event_type")
    )


@query(
    "q15",
    """SELECT event_id, value FROM events WHERE value > 99.0 ORDER BY event_id""",
)
def q15_slow_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slow-event threshold filter (nexus/telemetry/reporter.py:54-68,
    network.py:119-137)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.where(F.col("value") > 99.0)
        .select("event_id", "value")
        .orderBy("event_id")
    )


@query(
    "q16",
    """SELECT event_id,
              CASE WHEN event_type = 'error' THEN 'on_failure'
                   WHEN value > 90 THEN 'descriptor_3'
                   ELSE 'on_success' END AS branch
       FROM events ORDER BY event_id""",
)
def q16_conditional_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level analogue of Pointy conditional/descriptor routing
    (nexus/task.py:1133-1147; descriptors task.py:606-632) as CASE WHEN."""
    events = _t(spark, sf_dir, "events")
    branch = (
        F.when(F.col("event_type") == "error", "on_failure")
        .when(F.col("value") > 90, "descriptor_3")
        .otherwise("on_success")
    )
    return events.select("event_id", branch.alias("branch")).orderBy("event_id")


# ---------------------------------------------------------------------------
# Q17–Q25: relational/streaming-analogue extensions [ext]
# ---------------------------------------------------------------------------


@query(
    "q17",
    """SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
       FROM events GROUP BY date_trunc('hour', ts), event_type
       ORDER BY h, event_type""",
)
def q17_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch analogue (SURVEY §2.8): hour truncation +
    group-count. The streaming twin uses F.window(ts, '1 hour')."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("h", "event_type")
    )


@query(
    "q18",
    """SELECT event_id, user_id,
              CASE WHEN ts > prev_ts + INTERVAL 30 MINUTE OR prev_ts IS NULL
                   THEN 1 ELSE 0 END AS new_session
       FROM (SELECT event_id, user_id, ts,
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             FROM events) t
       ORDER BY user_id, event_id""",
)
def q18_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization scaffold (SURVEY §2.8): lag + 30-minute gap flag.
    One shuffle on user_id; the streaming twin is session_window."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES"))
        | prev_ts.isNull(),
        1,
    ).otherwise(0)
    return (
        events.select(
            "event_id", "user_id", new_session.alias("new_session")
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q19",
    """SELECT n_name, COUNT(*) AS suppliers FROM supplier
       JOIN nation ON s_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name""",
)
def q19_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregate. nation is a 25-row dim at every SF:
    broadcast it explicitly so the join never shuffles the fact side."""
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("suppliers"))
        .orderBy("n_name")
    )


@query(
    "q20",
    """SELECT l_returnflag, l_linestatus,
              SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) / 100.0
                  AS sum_qty,
              SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) / 100.0
                  AS sum_price,
              COUNT(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
)
def q20_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: filter pushes to the scan, then
    one partial+final aggregate over a handful of groups — the flagship
    shape for 100 TB (shuffle carries only |groups| x partials).

    Sums are exact fixed-point: each value is snapped to 2 decimal
    places (the DECIMAL(18,2) cast, same rounding both engines), scaled
    to an integer, summed as BIGINT — ~5x cheaper per row than a
    decimal-typed SUM buffer — and descaled once per group. The final
    /100.0 divides a bit-identical integer on both sides, so the double
    output is bit-identical too."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum((F.col("l_quantity").cast(DEC) * 100).cast("bigint")) / 100.0)
            .alias("sum_qty"),
            (F.sum((F.col("l_extendedprice").cast(DEC) * 100).cast("bigint")) / 100.0)
            .alias("sum_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q21",
    """SELECT c_custkey, COALESCE(o.cnt, 0) AS order_cnt
       FROM customer LEFT JOIN
            (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
       ON c_custkey = o_custkey ORDER BY c_custkey""",
)
def q21_left_join_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + COALESCE null handling. Aggregating orders BEFORE the
    join shrinks the shuffled build side to |customers with orders|."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return (
        customer.join(
            per_cust, customer.c_custkey == per_cust.o_custkey, "left"
        )
        .select(
            "c_custkey", F.coalesce(F.col("cnt"), F.lit(0)).alias("order_cnt")
        )
        .orderBy("c_custkey")
    )


@query(
    "q22",
    """SELECT event_id, upper(event_type) AS et, substr(event_type, 1, 3) AS et3,
              abs(value - 50.0) AS dist, round(value, 1) AS v1,
              strftime(ts, '%Y-%m-%d') AS d, CAST(EXTRACT(YEAR FROM ts) AS INT) AS y
       FROM events ORDER BY event_id""",
)
def q22_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function layer (string/math/date) — all JVM-side builtins,
    whole-stage-codegen'd; no Python in the row path."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.upper("event_type").alias("et"),
        F.substring("event_type", 1, 3).alias("et3"),
        F.abs(F.col("value") - 50.0).alias("dist"),
        F.round(F.col("value"), 1).alias("v1"),
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.year("ts").alias("y"),
    ).orderBy("event_id")


@query(
    "q23",
    """SELECT user_id, event_id, rnk FROM (
         SELECT user_id, event_id,
                ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
         FROM events) t WHERE rnk <= 3 ORDER BY user_id, rnk, event_id""",
)
def q23_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ROW_NUMBER. Spark's WindowGroupLimit pushes
    the rnk<=3 limit into the window sort (no full materialization)."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.select(
            "user_id", "event_id", F.row_number().over(w).alias("rnk")
        )
        .where(F.col("rnk") <= 3)
        .orderBy("user_id", "rnk", "event_id")
    )


@query(
    "q24",
    """SELECT user_id FROM events WHERE event_type = 'click'
       INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
       ORDER BY user_id""",
)
def q24_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics)."""
    events = _t(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select("user_id")
    buys = events.where(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys).orderBy("user_id")


@query(
    "q25",
    """SELECT COALESCE(event_type, 'ALL') AS et, COUNT(*) AS n
       FROM events GROUP BY ROLLUP(event_type) ORDER BY et""",
)
def q25_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with a grand-total row."""
    events = _t(spark, sf_dir, "events")
    return (
        events.rollup("event_type")
        .agg(F.count("*").alias("n"))
        .select(F.coalesce("event_type", F.lit("ALL")).alias("et"), "n")
        .orderBy("et")
    )


# ---------------------------------------------------------------------------
# Q26–Q27: north-star document operators (more in operators/)
# ---------------------------------------------------------------------------


@query(
    "q26",
    """SELECT lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
       FROM documents WHERE n_chars > 100 GROUP BY lang ORDER BY lang""",
)
def q26_text_scaffold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis scaffold: length filter + per-language stats."""
    documents = _t(spark, sf_dir, "documents")
    return (
        documents.where(F.col("n_chars") > 100)
        .groupBy("lang")
        .agg(F.count("*").alias("docs"), F.sum("n_chars").alias("chars"))
        .orderBy("lang")
    )


@query(
    "q27",
    """SELECT text, COUNT(*) AS dupes FROM documents GROUP BY text
       HAVING COUNT(*) > 1 ORDER BY dupes DESC, text""",
)
def q27_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by full text, in the 100 TB-safe shape: count per
    16-byte md5 digest (the only thing shuffled — never the documents,
    see operators/dedup.py exact_duplicates), then broadcast the tiny
    duplicate-digest set back over a second pruned scan to recover the
    display text. Two column-pruned scans + one narrow shuffle beats one
    scan that shuffles every document body."""
    documents = _t(spark, sf_dir, "documents")
    hashed = documents.select(F.md5("text").alias("digest"), "text")
    dup_counts = (
        hashed.groupBy("digest")
        .agg(F.count("*").alias("dupes"))
        .where(F.col("dupes") > 1)
    )
    return (
        hashed.join(F.broadcast(dup_counts), "digest")
        .select("text", "dupes")
        .distinct()
        .orderBy(F.desc("dupes"), "text")
    )


@query(
    "q28",
    """SELECT event_id, user_id,
              CAST(SUM(CASE WHEN prev_ts IS NULL
                            OR ts > prev_ts + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
       FROM (SELECT event_id, user_id, ts,
                    LAG(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_ts
             FROM events) t
       ORDER BY user_id, event_id""",
)
def q28_full_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sessionization: per-user session ids from 30-minute gaps
    (streaming/windows.py sessionize — the batch twin of
    ``session_window``). Q18's flag made cumulative; one shuffle on
    user_id shared by both window functions."""
    from event_pipeline_spark.streaming.windows import sessionize

    events = _t(spark, sf_dir, "events")
    return (
        sessionize(
            events.select("event_id", "user_id", "ts"),
            "ts", 30 * 60, "user_id", tiebreakers=("event_id",),
        )
        .select("event_id", "user_id", F.col("session_id").cast("long").alias("session_id"))
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Q29–Q34: extended relational surface (JSON, cube, pivot, subqueries,
# trend windows, percentiles)
# ---------------------------------------------------------------------------


@query(
    "q29",
    """SELECT event_type,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS BIGINT) AS k_sum,
              COUNT(*) AS n
       FROM events GROUP BY event_type ORDER BY event_type""",
)
def q29_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the Any-typed ``props`` column —
    the reference's nested a__b__c lookups on dict content
    (nexus/result.py:338-370) when content is serialized JSON
    (hdfs_store.py:62-64). get_json_object stays JVM-side."""
    events = _t(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").cast("long").alias("k_sum"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "q30",
    """SELECT COALESCE(event_type, 'ALL') AS et,
              COALESCE(CAST(user_id % 2 AS VARCHAR), 'ALL') AS parity,
              COUNT(*) AS n
       FROM events GROUP BY CUBE(event_type, user_id % 2)
       ORDER BY et, parity""",
)
def q30_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one pass (rollup Q25's
    big sibling). One shuffle; Spark expands grouping sets map-side."""
    events = _t(spark, sf_dir, "events")
    return (
        events.withColumn("par", (F.col("user_id") % 2).cast("string"))
        .cube("event_type", "par")
        .count()
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("et"),
            F.coalesce("par", F.lit("ALL")).alias("parity"),
            F.col("count").alias("n"),
        )
        .orderBy("et", "parity")
    )


@query(
    "q31",
    """SELECT user_id,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
              CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
       FROM events GROUP BY user_id ORDER BY user_id""",
)
def q31_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation — the portable (and shuffle-
    minimal) form: one pass, partial aggregation map-side, vs
    ``groupBy().pivot()`` which needs a distinct-values pass first."""
    events = _t(spark, sf_dir, "events")
    agg = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(name)
        for t, name in [("click", "clicks"), ("view", "views"),
                        ("purchase", "purchases")]
    ]
    return events.groupBy("user_id").agg(*agg).orderBy("user_id")


@query(
    "q32",
    """SELECT c_custkey, c_acctbal
       FROM customer c
       WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                          WHERE c2.c_nationkey = c.c_nationkey)
       ORDER BY c_custkey""",
)
def q32_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's mean
    balance. Catalyst de-correlates this into an aggregate + join —
    written as such so the plan is explicit (one small agg broadcast)."""
    customer = _t(spark, sf_dir, "customer")
    nation_avg = customer.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("nav")
    )
    return (
        customer.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("nav"))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


@query(
    "q33",
    """SELECT user_id, m, n,
              n - LAG(n) OVER (PARTITION BY user_id ORDER BY m) AS delta
       FROM (SELECT user_id, strftime(date_trunc('month', ts), '%Y-%m') AS m,
                    COUNT(*) AS n
             FROM events GROUP BY user_id, strftime(date_trunc('month', ts), '%Y-%m')) t
       ORDER BY user_id, m""",
)
def q33_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend query: per-user monthly activity + month-over-month delta.
    The window re-uses the groupBy's hash partitioning on user_id (one
    exchange feeds both)."""
    events = _t(spark, sf_dir, "events")
    monthly = (
        events.select(
            "user_id", F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("m")
        )
        .groupBy("user_id", "m")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy("m")
    return (
        monthly.withColumn("delta", F.col("n") - F.lag("n").over(w))
        .orderBy("user_id", "m")
    )


@query(
    "q34",
    """SELECT event_type,
              ROUND(quantile_cont(value, 0.5), 6) AS p50,
              ROUND(quantile_cont(value, 0.95), 6) AS p95
       FROM events GROUP BY event_type ORDER BY event_type""",
)
def q34_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (reference's slow-event
    thresholding, reporter.py:54-68, generalized to distribution
    analysis). Spark ``percentile`` and DuckDB ``quantile_cont`` share
    linear-interpolation semantics; approx_percentile is the sketch
    alternative at extreme cardinalities."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        )
        .orderBy("event_type")
    )


@query(
    "q35",
    """SELECT vec_id,
              ROUND(sqrt(list_sum(list_transform(embedding,
                                                 x -> CAST(x AS DOUBLE) *
                                                      CAST(x AS DOUBLE)))), 6)
                    AS l2
       FROM embeddings ORDER BY vec_id""",
)
def q35_array_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array math over the embedding column: per-vector L2 norm via
    aggregate/transform. Element order is fixed in both engines, so the
    float sum is deterministic; ROUND(,6) absorbs the last ulp."""
    emb = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return emb.select(
        "vec_id", F.round(F.sqrt(sq_sum), 6).alias("l2")
    ).orderBy("vec_id")


@query(
    "q36",
    """SELECT event_type,
              COUNT(DISTINCT user_id) AS users,
              COUNT(*) AS n
       FROM events GROUP BY event_type ORDER BY event_type""",
)
def q36_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct cardinality per group (the oracle-checkable twin
    of approx_count_distinct — the HLL sketch is the 100 TB form but
    differs across engines by design, SURVEY §2.10 note)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@query("q37")
def q37_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the sketches that replace their exact
    twins at 100 TB: HyperLogLog++ cardinality (fixed-size sketch vs a
    distinct shuffle, q36's exact twin) and t-digest-style quantiles
    (approx_percentile vs q34's exact percentiles). No DuckDB oracle by
    design (sketch layouts are engine-specific, SURVEY §2.10 note) —
    rows-only driver check; error bounds are unit-tested against the
    exact values (tests/test_oracles.py)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95], 10_000).alias("value_q"),
        )
        .select(
            "event_type",
            "approx_users",
            F.round(F.col("value_q")[0], 4).alias("p50"),
            F.round(F.col("value_q")[1], 4).alias("p95"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Q38–Q40: TPC-H-shaped deep multi-join analytics [ext]
#
# The reference never joins more than two logical collections (sink-merge,
# SURVEY §2.1); these exercise the 3–6 table join shapes a real analytics
# user runs daily, in the plan shape that survives 100 TB: selective
# filters pushed into every scan, dimension sides broadcast, fact-fact
# joins shuffled on narrow keys only, aggregation before ordering.
#
# Revenue = extendedprice * (1 - discount) is made order-independent-exact
# by all-integer arithmetic: price snapped to cents (DECIMAL(18,2), same
# rounding both engines) and discount to hundredths, multiplied as BIGINTs
# (units of 1e-4 dollars), summed as BIGINT, descaled once per group.
# Grouped sums stay far below 2^63 at any SF; the division of a
# bit-identical integer yields a bit-identical double on both engines.
# ---------------------------------------------------------------------------

_REV_ORACLE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))"
)


def _rev_units() -> F.Column:
    """Per-row revenue in integer units of 1e-4 dollars (exact)."""
    cents = (F.col("l_extendedprice").cast(DEC) * 100).cast("bigint")
    disc = (F.col("l_discount").cast(DEC) * 100).cast("bigint")
    return cents * (F.lit(100).cast("bigint") - disc)


@query(
    "q38",
    f"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
               SUM({_REV_ORACLE}) / 10000.0 AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10""",
)
def q38_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped shipping-priority query: two selective fact scans
    (orders by date, lineitem by shipdate — both pushed into parquet) and
    a filtered dimension (customer by segment), joined on narrow int
    keys, aggregated to |orderkey| partials, then TakeOrderedAndProject
    top-10 (no global sort materialization). At 100 TB the only wide
    shuffles carry pre-filtered fact rows projected to 3-4 columns."""
    cutoff = F.lit("1998-07-01 00:00:00").cast("timestamp")
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg((F.sum(_rev_units()) / 10000.0).alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q39",
    f"""SELECT n_name, SUM({_REV_ORACLE}) / 10000.0 AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name ORDER BY revenue DESC, n_name""",
)
def q39_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-table join: region→nation (broadcast, prunes
    suppliers/customers to one region before any wide join), orders
    date-filtered at the scan, lineitem joined on (orderkey, suppkey),
    plus the local-supplier condition c_nationkey = s_nationkey. Output
    is |nations in region| rows — the shuffle narrows monotonically
    down the join tree, the shape that holds at 1000 executors."""
    nr = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg((F.sum(_rev_units()) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q40",
    f"""SELECT c_custkey, c_name, n_name, SUM({_REV_ORACLE}) / 10000.0 AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def q40_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: one-quarter order window +
    returnflag filter (both scan-pushed), customer dimension joined
    after fact-side aggregation keys are fixed, nation broadcast, top-20
    via TakeOrderedAndProject. Maps the reference's failed-event
    reporting shape (nexus/telemetry/reporter.py:38-52) onto a revenue
    ranking."""
    orders = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_rev_units()) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q41–Q45: relational-surface extensions (outer-join distributions, exact
# scalar-stat anti joins, grouping sets, rank-family windows, time-range
# frames) — round-3 widening of SURVEY §2.10
# ---------------------------------------------------------------------------


@query(
    "q41",
    """SELECT c_count, COUNT(*) AS custdist FROM (
         SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
         FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
         GROUP BY c.c_custkey) t
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
)
def q41_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join preserving order-less customers,
    then a two-level aggregate (per-customer count -> distribution).
    Scale: the first aggregate shuffles on c_custkey (high cardinality,
    well-spread); the second groups a few dozen distinct counts — AQE
    coalesces it to a handful of partitions. The outer join is the
    operator q9's NOT EXISTS cannot express (it keeps the zero rows)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q42",
    """WITH pos AS (
         SELECT c_custkey, c_nationkey,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM customer WHERE c_acctbal > 0.0),
       stats AS (SELECT SUM(cents) AS tot, COUNT(*) AS cnt FROM pos)
       SELECT c_nationkey, COUNT(*) AS numcust,
              SUM(cents) / 100.0 AS totacctbal
       FROM pos c, stats s
       WHERE c.cents * s.cnt > s.tot
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 400000.0)
       GROUP BY c_nationkey ORDER BY c_nationkey""",
)
def q42_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the mean balance with no
    high-value order, grouped by nation. The mean-balance threshold is
    evaluated in exact integer arithmetic (cents * count > total-cents)
    so the boundary set is bit-identical across engines — an IEEE AVG()
    threshold can flip rows in the last ulp. Scale: the 16-byte stats
    row is broadcast; the price predicate pushes into the anti side's
    scan before the shuffle, so the anti join moves only the surviving
    (custkey) values; no floating-point until the final descale."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000.0)
        .select("o_custkey")
    )
    pos = cust.where(F.col("c_acctbal") > 0.0).select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal").cast(DEC) * 100).cast("bigint").alias("cents"),
    )
    stats = pos.agg(
        F.sum("cents").alias("tot"), F.count("*").alias("cnt")
    )
    return (
        pos.crossJoin(F.broadcast(stats))
        .where(F.col("cents") * F.col("cnt") > F.col("tot"))
        .join(orders, pos.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("cents") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q43",
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
              COALESCE(l_linestatus, 'ALL') AS ls,
              COUNT(*) AS n,
              SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) / 100.0
                  AS sum_qty
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                               (l_returnflag, l_linestatus))
       ORDER BY rf, ls""",
)
def q43_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of q25's ROLLUP / q30's
    CUBE): three chosen aggregation granularities in one pass. Spark
    expands the sets map-side, so the fact table is scanned once and the
    shuffle carries one partial row per (set, group) — the 100 TB way to
    build several summary tables in a single job."""
    li = _t(spark, sf_dir, "lineitem")
    cents = (F.col("l_quantity").cast(DEC) * 100).cast("bigint")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents) / 100.0).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
        .orderBy("rf", "ls")
    )


@query(
    "q44",
    """SELECT event_id, event_type,
              NTILE(4) OVER w AS quartile,
              ROUND(CUME_DIST() OVER w, 6) AS cd,
              LEAD(event_id, 1, -1) OVER w AS next_id
       FROM events
       WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
       ORDER BY event_id""",
)
def q44_rank_family_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family analytics (NTILE quartiles, CUME_DIST, LEAD with
    default) over a total order — ties broken by event_id so every
    engine assigns identical ranks. One shuffle on event_type shared by
    all three window functions (same spec -> one Exchange + one Sort)."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.select(
            "event_id",
            "event_type",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.lead("event_id", 1, -1).over(w).alias("next_id"),
        )
        .orderBy("event_id")
    )


@query(
    "q45",
    """SELECT event_id, user_id,
              SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                  / 100.0 AS hour_sum
       FROM events ORDER BY event_id""",
)
def q45_trailing_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour running sum per user: a RANGE (value-based) window
    frame — the batch analogue of a sliding stream aggregate, and robust
    to timestamp ties (peers share a frame, so the result is
    deterministic without a tiebreaker). Implemented over exact integer
    cents; the frame bound is expressed in microseconds on a zoned cast
    of the NTZ event time (both engines see identical wall-clock micros).
    One shuffle on user_id; the frame is computed in a single sorted
    pass per partition."""
    events = _t(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    cents = (F.col("value").cast(DEC) * 100).cast("bigint")
    return (
        events.select(
            "event_id",
            "user_id",
            (F.sum(cents).over(w) / 100.0).alias("hour_sum"),
        )
        .orderBy("event_id")
    )


@query(
    "q46",
    """SELECT event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS BIGINT) AS sum_k,
              CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS BIGINT) AS min_k,
              CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS BIGINT) AS max_k
       FROM events
       WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0
       GROUP BY event_type ORDER BY event_type""",
)
def q46_variant_typed_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data through Spark's VARIANT type: ``parse_json``
    once, then typed path extraction (``variant_get(..., 'bigint')``)
    feeding both the predicate and the aggregates. VARIANT stores a
    parsed binary form, so repeated path access avoids q29's repeated
    JSON string parsing — at 100 TB the parse happens once per row, not
    once per extraction. DuckDB's oracle uses its JSON path functions on
    the same column."""
    events = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .where(F.col("k") % 3 == 0)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_Q47_BODY = """
    WITH RECURSIVE member AS (
           SELECT c_nationkey AS grp,
                  CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                                 ORDER BY c_custkey) - 1)
                             / 20.0) AS BIGINT) AS bucket,
                  ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_custkey) AS rn,
                  c_custkey
           FROM {customer}),
         edges AS (
           SELECT m1.c_custkey AS a, m2.c_custkey AS b
           FROM member m1 JOIN member m2
             ON m1.grp = m2.grp AND m1.bucket = m2.bucket
            AND m2.rn = m1.rn + 1),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION ALL
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
    SELECT m.c_custkey AS id,
           LEAST(m.c_custkey, COALESCE(MIN(r.a), m.c_custkey)) AS cluster_id
    FROM member m LEFT JOIN reach r ON r.b = m.c_custkey
    GROUP BY m.c_custkey ORDER BY id
"""


@query("q47", _Q47_BODY.format(customer="customer"))
def q47_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE transitive closure, executed BY SPARK (recursive
    CTEs landed in Spark 4): chain edges link consecutive customers
    within 20-member buckets per nation, and the recursion walks each
    chain forward (acyclic edges — Spark's recursive CTEs require
    UNION ALL, so the closure must terminate structurally); each node's
    cluster id is its least reachable ancestor — the declarative twin
    of ``operators/dedup.py::duplicate_clusters``'s label propagation.
    The IDENTICAL SQL text is the DuckDB oracle, so this pins Spark's
    recursive-CTE semantics (not just a reimplementation) against a
    second engine. Bucketing bounds recursion depth at 20 (well under
    ``spark.sql.cteRecursionLevelLimit``) and keeps the edge count
    linear in rows — the scalable chain form, not the quadratic
    all-pairs form."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_q47_customer")
    return spark.sql(_Q47_BODY.format(customer="_q47_customer"))


_Q48_BODY = """
    WITH pool AS (
      SELECT CASE WHEN c_acctbal < 100 THEN NULL ELSE c_custkey END AS k
      FROM {customer} WHERE c_mktsegment = 'BUILDING')
    SELECT variant, n FROM (
      SELECT 'not_in_with_nulls' AS variant, COUNT(*) AS n
      FROM {orders} WHERE o_custkey NOT IN (SELECT k FROM pool)
      UNION ALL
      SELECT 'not_in_null_filtered' AS variant, COUNT(*) AS n
      FROM {orders}
      WHERE o_custkey NOT IN (SELECT k FROM pool WHERE k IS NOT NULL)
    ) ORDER BY variant
"""


@query("q48", _Q48_BODY.format(customer="customer", orders="orders"))
def q48_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic contract: ``NOT IN`` against a set containing
    NULL can never be TRUE (every row filters out — the classic trap a
    left-anti-join rewrite gets wrong), while the IS NOT NULL-guarded
    variant returns the anti-join answer. Both engines must agree on
    both counts; the identical SQL text is the oracle. The reference's
    ``__isnull`` lookups (nexus/result.py:450-451) motivate pinning
    NULL-handling parity explicitly."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_q48_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_q48_orders")
    return spark.sql(
        _Q48_BODY.format(customer="_q48_customer", orders="_q48_orders")
    )
