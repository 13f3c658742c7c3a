"""Deterministic sampling & source mixing for training-data pipelines.

Complements ``operators/packing.py`` (whose xxhash64 splits are fast but
engine-specific, so their oracle can only check count contracts): every
operator here keys on an **md5-hex prefix**, which any engine computes
identically — the DuckDB oracle verifies not just how many rows were
sampled but exactly *which* rows. That is the property a reproducible
data pipeline needs: re-running the job, on any engine, selects the same
documents.

The primitive: ``substr(md5(key || salt), 1, 8)`` is 32 uniform bits
rendered as lowercase hex; comparing it lexicographically against the
8-char hex encoding of ``floor(p * 2^32)`` keeps an exact ``p`` fraction
in expectation, deterministically per key. No RNG state, no
partitioning sensitivity, no shuffle — a narrow projection + filter that
composes with any scan (predicate stays JVM-side, whole-stage codegen).

Scale: at 100 TB all three operators are one scan. ``stratified_take``
adds one shuffle on the (narrow) stratum key for its per-stratum
row_number — the same cost as any per-group top-k; use it for bounded
eval/calibration draws, not 90% splits (those use the filter form).

Registered queries (driver-checkable, exact-value oracles):
- ``sample_fraction``   [oracle] which docs an exact-p draw keeps
- ``sample_mix``        [oracle] per-language weighted source mixing
- ``sample_stratified`` [oracle] deterministic k-per-stratum draw
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _register(name: str, fn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return read_table(spark, sf_dir, "documents")


def hash_hex(key: Column, salt: str = "") -> Column:
    """First 8 hex chars of md5(key || salt): 32 deterministic uniform
    bits, identical in any engine with md5."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)


def _threshold_hex(p: float) -> str:
    """Lexicographic cutoff: hex(floor(p * 2^32)), zero-padded to 8."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {p}")
    return format(min(int(p * 2**32), 2**32 - 1), "08x")


def sample_fraction(
    df: DataFrame, key: str, p: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~p fraction keyed on ``key``. Same rows on
    every run and every engine; change ``salt`` for an independent draw."""
    return df.where(hash_hex(F.col(key), salt) < F.lit(_threshold_hex(p)))


def mix_sources(
    df: DataFrame, source_col: str, weights: dict[str, float],
    key: str, salt: str = "",
) -> DataFrame:
    """Weighted source mixing: per-source keep fractions (the data-mixture
    step of corpus assembly — e.g. upweight books, downweight crawl).
    Sources absent from ``weights`` are dropped; weight 1.0 keeps all."""
    cutoff = None
    for name, w in weights.items():
        branch = F.when(
            F.col(source_col) == name, F.lit(_threshold_hex(w))
        )
        cutoff = branch if cutoff is None else cutoff.when(
            F.col(source_col) == name, F.lit(_threshold_hex(w))
        )
    cutoff = cutoff.otherwise(F.lit(_threshold_hex(0.0)))
    return df.where(hash_hex(F.col(key), salt) < cutoff)


def stratified_take(
    df: DataFrame, stratum_col: str, k: int, key: str, salt: str = ""
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order —
    a deterministic reservoir draw. One narrow shuffle on the stratum
    key; Spark's WindowGroupLimit pushes the k-cut before the shuffle."""
    w = Window.partitionBy(stratum_col).orderBy(hash_hex(F.col(key), salt), key)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

_P = 0.25
_SALT = "s1"
_MIX_WEIGHTS = {"en": 1.0, "es": 0.5, "fr": 0.25, "de": 0.1}
_K = 20


def q_sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        sample_fraction(docs, "doc_id", _P, _SALT)
        .select("doc_id", hash_hex(F.col("doc_id"), _SALT).alias("bucket"))
        .orderBy("doc_id")
    )


_register(
    "sample_fraction",
    q_sample_fraction,
    f"""SELECT doc_id,
               substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8) AS bucket
        FROM documents
        WHERE substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8)
              < '{_threshold_hex(_P)}'
        ORDER BY doc_id""",
)


def q_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    mixed = mix_sources(docs, "lang", _MIX_WEIGHTS, "doc_id", _SALT)
    return (
        mixed.groupBy("lang")
        .agg(F.count("*").alias("kept"))
        .orderBy("lang")
    )


_mix_cases = " ".join(
    f"WHEN '{name}' THEN '{_threshold_hex(w)}'"
    for name, w in _MIX_WEIGHTS.items()
)

_register(
    "sample_mix",
    q_sample_mix,
    f"""SELECT lang, COUNT(*) AS kept FROM documents
        WHERE substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8)
              < CASE lang {_mix_cases} ELSE '{_threshold_hex(0.0)}' END
        GROUP BY lang ORDER BY lang""",
)


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        stratified_take(docs, "lang", _K, "doc_id", _SALT)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )


_register(
    "sample_stratified",
    q_sample_stratified,
    f"""WITH ranked AS (
          SELECT doc_id, lang,
                 row_number() OVER (
                     PARTITION BY lang
                     ORDER BY substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8),
                              doc_id) AS rk
          FROM documents)
        SELECT doc_id, lang FROM ranked WHERE rk <= {_K}
        ORDER BY lang, doc_id""",
)


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (round 4)
# ---------------------------------------------------------------------------


def shuffle_epoch(
    df: DataFrame,
    key_col: str,
    *,
    epoch: int = 0,
    seed: str = "",
    global_sort: bool = False,
    buckets: int = 256,
) -> DataFrame:
    """A reproducible per-epoch permutation of a training corpus: every
    engine, every re-run, every resume sees the same order for the same
    ``(seed, epoch)``, and different epochs are statistically unrelated
    orders — the property epoch shuffling needs without any RNG state.

    Order key = ``md5(key || '|' || seed || '|' || epoch)`` (engine-
    portable like every operator in this module). ``key_col`` must be
    unique per row — duplicate keys make the relative order of their
    rows tie-broken arbitrarily. Two materialization
    modes:

    - ``global_sort=False`` (default, the 100 TB path): shuffle rows to
      ``buckets`` partitions by the hash prefix and sort WITHIN each —
      a deterministic permutation when partitions are consumed in
      order, at the cost of one hash exchange + local sorts, never a
      global range sort.
    - ``global_sort=True``: total order with a ``pos`` column (range
      partition + merge) — for bounded eval sets and the exact-order
      oracle below.
    """
    h = F.md5(
        F.concat(
            F.col(key_col).cast("string"), F.lit(f"|{seed}|{epoch}")
        )
    ).alias("__ord")
    with_key = df.select("*", h)
    if global_sort:
        w = Window.orderBy(F.col("__ord"), F.col(key_col))
        return (
            with_key.withColumn("pos", F.row_number().over(w))
            .drop("__ord")
        )
    bucket = F.conv(F.substring("__ord", 1, 4), 16, 10).cast("int") % buckets
    return (
        with_key.repartition(buckets, bucket)
        .sortWithinPartitions("__ord", key_col)
        .drop("__ord")
    )


def q_shuffle_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-order oracle for the epoch-3 shuffle of a 500-doc slice:
    the position of every document must match DuckDB's computation of
    the same md5 order."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 500)
    return (
        shuffle_epoch(docs, "doc_id", epoch=3, seed="ep", global_sort=True)
        .select("doc_id", "pos")
        .orderBy("pos")
    )


_register(
    "shuffle_epoch",
    q_shuffle_epoch,
    """SELECT doc_id,
              row_number() OVER (
                  ORDER BY md5(doc_id::VARCHAR || '|ep|3'), doc_id
              ) AS pos
       FROM documents WHERE doc_id < 500
       ORDER BY pos""",
)


# ---------------------------------------------------------------------------
# Bottom-k uniform sample + temperature mixing (round 4)
# ---------------------------------------------------------------------------


def sample_k(
    df: DataFrame, k: int, key_col: str, salt: str = ""
) -> DataFrame:
    """Exactly-``k`` uniform sample via the bottom-k trick: the k
    smallest ``md5(key||salt)`` values are a uniform k-subset (every
    key's hash rank is exchangeable), deterministic per salt and
    identical on any engine — the fixed-size sibling of
    ``sample_fraction`` for unknown-n inputs.

    Scale shape: a global smallest-k is ``TakeOrderedAndProject`` —
    per-partition top-k heaps merged on the driver, never a full sort.
    """
    h = hash_hex(F.col(key_col), salt)
    return (
        df.withColumn("__h", h)
        .orderBy("__h", key_col)
        .limit(k)
        .drop("__h")
    )


def q_sample_topk_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return sample_k(docs, 40, "doc_id", _SALT).select(
        "doc_id", "lang"
    ).orderBy("doc_id")


_register(
    "sample_topk_uniform",
    q_sample_topk_uniform,
    f"""SELECT doc_id, lang FROM (
          SELECT doc_id, lang
          FROM documents
          ORDER BY substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8), doc_id
          LIMIT 40)
        ORDER BY doc_id""",
)


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    *,
    alpha: float = 0.5,
    target_rows: int,
    salt: str = "",
) -> DataFrame:
    """Temperature-weighted source mixing: sample sources in proportion
    to ``count^alpha`` (alpha<1 upweights small sources — the standard
    multilingual/multi-domain rebalancing knob), deterministically via
    the md5 filter.

    Two tiny actions compute per-source counts and thresholds driver-
    side (|sources| rows); the data pass is one scan with a per-source
    hash cutoff — no shuffle of the sampled rows themselves. Sources
    whose quota exceeds their size keep every row (fraction capped at
    1). Expected output size ≈ ``target_rows`` (hash-exact per source,
    binomial at the margins).
    """
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    total_w = sum(c**alpha for c in counts.values())
    cutoffs = {}
    for src, c in counts.items():
        quota = target_rows * (c**alpha) / total_w
        cutoffs[src] = _threshold_hex(min(quota / c, 1.0))
    h = hash_hex(F.col(key_col), salt)
    cutoff_col = F.coalesce(
        F.element_at(
            F.create_map(
                *[x for s_, t in cutoffs.items() for x in (F.lit(s_), F.lit(t))]
            ),
            F.col(source_col),
        ),
        F.lit(_threshold_hex(0.0)),
    )
    return df.where(h < cutoff_col)


# ---------------------------------------------------------------------------
# temperature mixture under an exact token budget
# ---------------------------------------------------------------------------
#
# ``temperature_mix`` above allocates EXPECTED ROWS via per-source hash
# fractions. Production loaders allocate exact TOKEN budgets per domain
# (the mT5/XLM-R count^alpha rule applied to token mass, then a greedy
# deterministic fill per source). This variant is fully exact and
# externally recomputable: per-source token masses aggregate JVM-side;
# alpha-weights quantize to integer 1e-7 units (one sqrt + one multiply
# per source — single correctly-rounded double ops, never a double
# SUM); per-source budgets come from integer `div`; selection is a
# per-source window over (md5(id), id) keeping docs while the running
# token count fits. Plan: one scan, one 20-row agg, two one-row
# broadcasts (the rank_bm25 one-row-stats shape), one window shuffle
# partitioned BY SOURCE — at 100 TB each source sorts independently;
# no global ordering anywhere.


def temperature_token_budget(
    df: DataFrame,
    source_col: str,
    key_col: str,
    text_col: str | None = None,
    *,
    tokens_col: str | None = None,
    budget_tokens: int | None = None,
    budget_denom: int | None = None,
    salt: str = "",
) -> DataFrame:
    """(key, source, n_tokens, cum_tokens, src_budget): the documents a
    sqrt-temperature mixture keeps under a global token budget. Source
    ``i`` gets ``floor(budget * wu_i / sum(wu))`` tokens where
    ``wu_i = floor(sqrt(tok_i / total) * 1e7 + 0.5)`` (integer units —
    the lm.py cross-engine recipe); within a source, docs fill the
    budget in deterministic ``(md5(key), key)`` order. Pass either an
    absolute ``budget_tokens`` or ``budget_denom`` (budget = corpus
    total ``div`` denom — a scale-relative share). Tokens come from
    whitespace-counting ``text_col`` or, for tokenizer-aware mixing, a
    precomputed ``tokens_col`` (e.g. BPE counts)."""
    if (budget_tokens is None) == (budget_denom is None):
        raise ValueError("pass exactly one of budget_tokens/budget_denom")
    if (text_col is None) == (tokens_col is None):
        raise ValueError("pass exactly one of text_col/tokens_col")
    from event_pipeline_spark.operators.text import token_count

    n_tokens = (
        token_count(F.col(text_col))
        if tokens_col is None
        else F.col(tokens_col)
    )
    toks = df.select(
        F.col(key_col),
        F.col(source_col),
        n_tokens.cast("long").alias("n_tokens"),
    )
    src = toks.groupBy(source_col).agg(
        F.sum("n_tokens").cast("long").alias("_tok")
    )
    tot = src.agg(F.sum("_tok").cast("long").alias("_t"))
    w = src.join(F.broadcast(tot)).withColumn(
        "_wu",
        F.floor(
            F.sqrt(F.col("_tok").cast("double") / F.col("_t").cast("double"))
            * F.lit(1e7)
            + F.lit(0.5)
        ).cast("long"),
    )
    nrm = w.agg(F.sum("_wu").cast("long").alias("_nrm"))
    budget_expr = (
        f"CAST({int(budget_tokens)} AS BIGINT)"
        if budget_tokens is not None
        else f"(_t div {int(budget_denom)})"
    )
    budgets = w.join(F.broadcast(nrm)).select(
        source_col,
        F.expr(f"{budget_expr} * _wu div _nrm").alias("src_budget"),
    )
    order = Window.partitionBy(source_col).orderBy(
        hash_hex(F.col(key_col), salt), F.col(key_col)
    )
    ranked = toks.withColumn(
        "cum_tokens",
        F.sum("n_tokens").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return ranked.join(F.broadcast(budgets), source_col).where(
        F.col("cum_tokens") <= F.col("src_budget")
    )


_TEMP_DENOM = 10  # keep 10% of the corpus token mass


def q_sample_temperature_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = temperature_token_budget(
        _docs(spark, sf_dir), "source", "doc_id", "text",
        budget_denom=_TEMP_DENOM,
    )
    return out.select(
        "doc_id", "source", "n_tokens", "cum_tokens", "src_budget"
    ).orderBy("doc_id")


_register(
    "sample_temperature_budget",
    q_sample_temperature_budget,
    f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
             AS n_tokens
  FROM documents),
src AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tok
  FROM toks GROUP BY source),
tot AS (SELECT CAST(sum(tok) AS BIGINT) AS t FROM src),
w AS (
  SELECT source, tok, t,
         CAST(floor(sqrt(tok::DOUBLE / t::DOUBLE) * 1e7 + 0.5) AS BIGINT)
             AS wu
  FROM src, tot),
nrm AS (SELECT CAST(sum(wu) AS BIGINT) AS n FROM w),
b AS (
  SELECT source, ((t // {_TEMP_DENOM}) * wu) // n AS src_budget
  FROM w, nrm),
ranked AS (
  SELECT t.doc_id, t.source, t.n_tokens,
         CAST(sum(t.n_tokens) OVER (
             PARTITION BY t.source
             ORDER BY substring(md5(CAST(t.doc_id AS VARCHAR)), 1, 8),
                      t.doc_id) AS BIGINT) AS cum_tokens
  FROM toks t)
SELECT r.doc_id, r.source, r.n_tokens, r.cum_tokens, b.src_budget
FROM ranked r JOIN b USING (source)
WHERE r.cum_tokens <= b.src_budget
ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# stratified train/val/test split
# ---------------------------------------------------------------------------


def split_assign(
    df: DataFrame,
    source_col: str,
    key_col: str,
    *,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Input columns + ``split`` ('train'|'val'|'test'): a deterministic
    per-source stratified split with EXACT quotas — within each source,
    rows rank by (md5(key), key); the first ``val_pct``% become val,
    the next ``test_pct``% test, the rest train (floor quotas, so small
    sources lose at most one row per eval split, never a whole split).
    Hash-threshold splits (``sample_fraction``) only hit quotas in
    expectation — an eval set wants them exact per stratum.

    One window shuffle partitioned by source; the rank comparison is a
    pure map against per-source counts broadcast from a |sources|-row
    aggregate."""
    if val_pct < 0 or test_pct < 0 or val_pct + test_pct >= 100:
        raise ValueError("val/test percentages must be >=0 and sum < 100")
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("_src_n")
    )
    w = Window.partitionBy(source_col).orderBy(
        hash_hex(F.col(key_col), salt), F.col(key_col)
    )
    ranked = df.withColumn("_rk", F.row_number().over(w)).join(
        F.broadcast(counts), source_col
    )
    n_val = F.expr(f"_src_n * {int(val_pct)} div 100")
    n_test = F.expr(f"_src_n * {int(test_pct)} div 100")
    split = (
        F.when(F.col("_rk") <= n_val, F.lit("val"))
        .when(F.col("_rk") <= n_val + n_test, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return ranked.withColumn("split", split).drop("_rk", "_src_n")


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = split_assign(
        _docs(spark, sf_dir).select("doc_id", "source"),
        "source",
        "doc_id",
    )
    return out.select("doc_id", "source", "split").orderBy("doc_id")


_register(
    "sample_split",
    q_sample_split,
    """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
             PARTITION BY source
             ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                      doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT doc_id, source,
       CASE WHEN rk <= (n * 10) // 100 THEN 'val'
            WHEN rk <= (n * 10) // 100 + (n * 10) // 100 THEN 'test'
            ELSE 'train' END AS split
FROM ranked ORDER BY doc_id
""",
)


def group_split_assign(
    df: DataFrame,
    source_col: str,
    group_col: str,
    *,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Input columns + ``split``: like :func:`split_assign` but quotas
    cut over GROUPS, and every row follows its group — the
    leakage-safe split when rows within a group are correlated
    (near-duplicate documents of one domain, events of one user): a
    row-quota split can straddle a group across the train/eval
    boundary, which is exactly the contamination eval sets exist to
    prevent. Exact floor quotas in #groups per source; group rank by
    (md5(group), group), so the assignment is a pure function of the
    data.

    Scale shape: one aggregate to |groups| rows, a |sources|-window
    over THAT (never the corpus), then one equi-join back — the corpus
    shuffles once on the group key."""
    if val_pct < 0 or test_pct < 0 or val_pct + test_pct >= 100:
        raise ValueError("val/test percentages must be >=0 and sum < 100")
    groups = df.select(
        F.col(source_col).alias("_src"), F.col(group_col).alias("_grp")
    ).dropDuplicates(["_src", "_grp"])
    w = Window.partitionBy("_src").orderBy(
        hash_hex(F.col("_grp"), salt), F.col("_grp")
    )
    n_w = Window.partitionBy("_src")
    n_val = F.expr(f"_grp_n * {int(val_pct)} div 100")
    n_test = F.expr(f"_grp_n * {int(test_pct)} div 100")
    assigned = groups.select(
        "_src",
        "_grp",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(n_w).alias("_grp_n"),
    ).select(
        "_src",
        "_grp",
        F.when(F.col("_rk") <= n_val, F.lit("val"))
        .when(F.col("_rk") <= n_val + n_test, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    return df.join(
        assigned,
        (df[source_col] == assigned["_src"])
        & (df[group_col] == assigned["_grp"]),
    ).select(*[df[c] for c in df.columns], "split")


def q_sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents with LANGUAGE as the correlation group inside
    each source — whole languages land on one side of every boundary."""
    out = group_split_assign(
        _docs(spark, sf_dir).select("doc_id", "source", "lang"),
        "source",
        "lang",
    )
    return out.select("doc_id", "source", "lang", "split").orderBy("doc_id")


_register(
    "sample_group_split",
    q_sample_group_split,
    """
WITH groups AS (
  SELECT DISTINCT source AS src, lang AS grp FROM documents),
assigned AS (
  SELECT src, grp,
         row_number() OVER (
             PARTITION BY src
             ORDER BY substring(md5(grp), 1, 8), grp) AS rk,
         count(*) OVER (PARTITION BY src) AS n
  FROM groups)
SELECT d.doc_id, d.source, d.lang,
       CASE WHEN a.rk <= (a.n * 10) // 100 THEN 'val'
            WHEN a.rk <= (a.n * 10) // 100 + (a.n * 10) // 100
              THEN 'test'
            ELSE 'train' END AS split
FROM documents d
JOIN assigned a ON a.src = d.source AND a.grp = d.lang
ORDER BY d.doc_id
""",
)


def weighted_sample_k(
    df: DataFrame,
    k: int,
    key_col: str,
    weight_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly-``k`` WEIGHTED sample without replacement (Efraimidis &
    Spirakis 2006): rank by the exponential race key −ln(u)/w and keep
    the k smallest — each item's inclusion probability is proportional
    to weight at every prefix, the property quality-weighted corpus
    subsampling needs (plain bottom-k ignores weights; independent
    per-row coin flips can't hit k exactly). u is the deterministic
    md5 uniform of (key‖salt) — the ``dsir.py`` Gumbel recipe — so the
    draw replays across engines and reruns; change ``salt`` for an
    independent draw.

    Exactness: u = (md5-52-bits + ½)/2⁵²; the race key is ONE ln
    (round-7, the repo log contract) over one exact division; ties
    break on ``key_col``. Zero/negative weights are excluded (their
    race key is undefined — the algorithm's own rule).

    Scale shape: global smallest-k = ``TakeOrderedAndProject`` —
    per-partition heaps merged on the driver, never a full sort."""
    h8 = hash_hex(F.col(key_col), salt)
    h13 = F.conv(
        F.concat(
            h8,
            F.substring(
                F.md5(
                    F.concat(F.col(key_col).cast("string"), F.lit(salt))
                ),
                9,
                5,
            ),
        ),
        16,
        10,
    ).cast("decimal(20,0)")
    m = F.lit(1 << 52).cast("decimal(20,0)")
    u = (F.pmod(h13, m).cast("double") + 0.5) / F.lit(float(1 << 52))
    race = -F.round(F.log(u), 7) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__r", race)
        .orderBy("__r", key_col)
        .limit(k)
        .drop("__r")
    )


_WK = 40


def q_sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document draw: longer documents proportionally
    likelier, exactly 40 kept, deterministic."""
    out = weighted_sample_k(
        _docs(spark, sf_dir).select("doc_id", "n_chars"),
        _WK,
        "doc_id",
        "n_chars",
        salt="w8",
    )
    return out.select("doc_id", "n_chars").orderBy("doc_id")


_register(
    "sample_weighted_topk",
    q_sample_weighted_topk,
    f"""
WITH drawn AS (
  SELECT doc_id, n_chars,
         -round(ln(((('0x' || substr(md5(doc_id::VARCHAR || 'w8'), 1, 8)
                      || substr(md5(doc_id::VARCHAR || 'w8'), 9, 5))::BIGINT
                     % {1 << 52})::DOUBLE + 0.5) / {float(1 << 52)}), 7)
           / n_chars::DOUBLE AS r
  FROM documents WHERE n_chars > 0),
kept AS (SELECT doc_id, n_chars FROM drawn ORDER BY r, doc_id LIMIT {_WK})
SELECT doc_id, n_chars FROM kept ORDER BY doc_id
""",
)


def leakage_report(
    docs: DataFrame,
    pairs: DataFrame,
    splits: DataFrame,
) -> DataFrame:
    """(split_a, split_b, n_pairs, leak, share): where near-duplicate
    pairs land relative to a train/val/test assignment — THE eval-set
    contamination audit (Dodge et al. 2021 shape): a near-dup pair
    straddling train and test means the model is graded on training
    data. ``pairs`` is any verified candidate list (id_a, id_b);
    ``splits`` maps doc_id -> split. Split names are canonicalized so
    the pair (train, test) counts once regardless of member order;
    ``share`` is the cell's exact fraction of all pairs (one division
    over a ≤9-cell window — bounded domain, documented below).

    Scale shape: two narrow id->split joins on the bounded pair list,
    then counting; the share window runs over at most |splits|² = 9
    cells (the ``dedup_source_matrix`` bounded-domain allowance)."""
    sa = splits.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
    )
    sb = splits.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
    )
    cells = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    tot = Window.partitionBy()
    return cells.select(
        "split_a",
        "split_b",
        "n_pairs",
        (F.col("split_a") != F.col("split_b")).alias("leak"),
        F.round(
            F.col("n_pairs").cast("double")
            / F.sum("n_pairs").over(tot).cast("double"),
            7,
        ).alias("share"),
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup leakage across the deterministic train/val/test split —
    chains THREE verified components (exact Jaccard pairs, split
    assignment, the matrix fold) under one oracle."""
    from event_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, threshold=0.5, group_col="source"
    ).select("id_a", "id_b")
    splits = split_assign(
        docs.select("doc_id", "source"), "source", "doc_id"
    ).select("doc_id", "split")
    return leakage_report(docs, pairs, splits).orderBy(
        "split_a", "split_b"
    )


_register(
    "split_leakage_report",
    q_split_leakage,
    """
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 2, 0)),
             i -> array_to_string(toks[i:i+2], ' '))) AS grams
  FROM (SELECT doc_id, source,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents)),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) + len(b.grams)
             - len(list_intersect(a.grams, b.grams)) AS uni
  FROM sh a JOIN sh b
    ON a.source = b.source AND a.doc_id < b.doc_id),
pairs AS (
  SELECT id_a, id_b FROM cand
  WHERE inter > 0 AND ROUND(inter::DOUBLE / uni, 6) >= 0.5),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
             PARTITION BY source
             ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                      doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents),
splits AS (
  SELECT doc_id,
         CASE WHEN rk <= (n * 10) // 100 THEN 'val'
              WHEN rk <= (n * 10) // 100 + (n * 10) // 100 THEN 'test'
              ELSE 'train' END AS split
  FROM ranked),
cells AS (
  SELECT least(a.split, b.split) AS split_a,
         greatest(a.split, b.split) AS split_b,
         count(*)::BIGINT AS n_pairs
  FROM pairs p
  JOIN splits a ON a.doc_id = p.id_a
  JOIN splits b ON b.doc_id = p.id_b
  GROUP BY 1, 2)
SELECT split_a, split_b, n_pairs, split_a <> split_b AS leak,
       round(n_pairs::DOUBLE / sum(n_pairs) OVER ()::DOUBLE, 7) AS share
FROM cells ORDER BY split_a, split_b
""",
)
