"""Benchmark decontamination: n-gram overlap between corpus and eval set.

The standard training-data hygiene step (GPT-3 appendix C / PaLM-style):
a training document is *contaminated* if it shares any length-``n``
token n-gram with a benchmark/eval document; contaminated docs are
flagged (and usually dropped) before training.

Spark-first shape:
- tokenize with built-ins (lower/trim/split — JVM, codegen),
- n-grams via ``pyspark.ml.feature.NGram`` (a JVM transformer — no
  Python, no interpreted higher-order lambdas in the row path),
- hash each gram to a 16-byte md5 so the join key is narrow,
- benchmark grams are ``distinct().broadcast()`` — an eval suite is
  KBs-to-MBs against a 100 TB corpus, so the corpus-side explode
  streams through a broadcast hash join with **zero shuffle of corpus
  data**; only matched (doc_id, gram-hash) pairs reach the aggregation.

The md5 gram key is also what makes the DuckDB oracle exact: both
engines derive identical gram strings (lowercase, single-space joined)
and identical hashes, so the oracle checks *which* documents are
contaminated and by how many distinct grams — not just totals.

Registered queries (driver-checkable):
- ``decontam_scan`` [oracle] per-doc distinct contaminated-gram counts
  against the derived benchmark fixture (every 50th doc's first 12
  tokens — the corpus is synthetic, so the derivation IS the fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


DEFAULT_N = 8


def _gram_hashes(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram_hash) pairs — one row per token n-gram occurrence.
    Documents shorter than ``n`` tokens produce no grams (standard)."""
    from pyspark.ml.feature import NGram

    toks = df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__toks"),
    )
    grams = NGram(n=n, inputCol="__toks", outputCol="__grams").transform(toks)
    return grams.select(
        F.col(id_col), F.explode("__grams").alias("__gram")
    ).select(F.col(id_col), F.md5("__gram").alias("gram_hash"))


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = DEFAULT_N,
) -> DataFrame:
    """Per-corpus-doc contamination report: ``(id_col, n_contaminated)``
    where ``n_contaminated`` counts the *distinct* benchmark n-grams the
    document contains. Docs with zero overlap are absent — anti-join the
    result to drop contaminated docs:

        clean = corpus.join(report, id_col, "left_anti")
    """
    bench_grams = (
        _gram_hashes(
            benchmark.select(
                F.lit(0).alias("__bid"),
                F.col(bench_text_col or text_col).alias("__btext"),
            ),
            "__btext",
            "__bid",
            n,
        )
        .select("gram_hash")
        .distinct()
    )
    corpus_grams = _gram_hashes(corpus, text_col, id_col, n)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram_hash")
        .groupBy(id_col)
        .agg(F.count_distinct("gram_hash").alias("n_contaminated"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
) -> DataFrame:
    """The filtering form: corpus minus contaminated docs (left_anti —
    no corpus shuffle; the report side is small by construction)."""
    report = ngram_decontaminate(
        corpus, benchmark, text_col=text_col, id_col=id_col, n=n
    )
    return corpus.join(report.select(id_col), id_col, "left_anti")


# ---------------------------------------------------------------------------
# registered query (derived benchmark fixture)
# ---------------------------------------------------------------------------

_BENCH_EVERY = 50
_BENCH_TOKENS = 12


def benchmark_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 50th doc's first 12 tokens as the 'eval set'."""
    docs = _docs(spark, sf_dir)
    return docs.where(F.col("doc_id") % _BENCH_EVERY == 0).select(
        F.concat_ws(
            " ",
            F.slice(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                1,
                _BENCH_TOKENS,
            ),
        ).alias("text")
    )


def q_decontam_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    report = ngram_decontaminate(
        _docs(spark, sf_dir), benchmark_fixture(spark, sf_dir)
    )
    return report.orderBy("doc_id")


_register(
    "decontam_scan",
    q_decontam_scan,
    f"""WITH bench_toks AS (
          SELECT list_slice(string_split_regex(lower(trim(text)), '\\s+'),
                            1, {_BENCH_TOKENS}) AS toks
          FROM documents WHERE doc_id % {_BENCH_EVERY} = 0),
        bench_grams AS (
          SELECT DISTINCT md5(gram) AS gram_hash FROM (
            SELECT unnest(list_transform(
                generate_series(1, greatest(len(toks) - {DEFAULT_N - 1}, 0)),
                i -> array_to_string(toks[i:i+{DEFAULT_N - 1}], ' '))) AS gram
            FROM bench_toks)),
        corpus_grams AS (
          SELECT doc_id, md5(gram) AS gram_hash FROM (
            SELECT doc_id, unnest(list_transform(
                generate_series(1, greatest(len(toks) - {DEFAULT_N - 1}, 0)),
                i -> array_to_string(toks[i:i+{DEFAULT_N - 1}], ' '))) AS gram
            FROM (SELECT doc_id,
                         string_split_regex(lower(trim(text)), '\\s+') AS toks
                  FROM documents)))
        SELECT doc_id, COUNT(DISTINCT gram_hash) AS n_contaminated
        FROM corpus_grams JOIN bench_grams USING (gram_hash)
        GROUP BY doc_id ORDER BY doc_id""",
)


# ---------------------------------------------------------------------------
# Bloom pre-filter (round 6): the 100 TB form of the broadcast gate.
#
# ``ngram_decontaminate`` broadcasts the benchmark's md5 gram strings —
# fine for eval suites (MBs), but a *blocklist-scale* clean set (say
# 10^8 grams) is multi-GB as strings. The standard fix is a Bloom
# filter: ~10-16 bits per element (~200 MB for 10^8) broadcast as a
# long[] bitmap, probed corpus-side with k salted hashes; only probable
# hits proceed to the exact broadcast join, which removes the false
# positives — so the RESULT is exactly ``ngram_decontaminate``'s (same
# oracle), while the expensive join sees a tiny fraction of corpus
# grams. Probing is pure JVM codegen: ``xxhash64(salt, gram) pmod m``
# → ``getbit(word, pos)`` — no UDF, no Python crossing.
#
# The bitmap is built with one bounded Spark job over the benchmark
# grams (collects distinct BIT POSITIONS, <= k·|bench| ints, not the
# grams), then inlined as an array<long> literal. Spark's own
# ``df.stat.bloomFilter`` returns a JVM-side sketch that can only be
# probed from Python via py4j per row — the literal-bitmap form keeps
# the probe inside whole-stage codegen instead.
# ---------------------------------------------------------------------------


def bloom_build(
    grams: DataFrame,
    *,
    gram_col: str = "gram_hash",
    n_bits: int,
    n_hashes: int = 4,
) -> list[int]:
    """Signed-64 words of a Bloom bitmap over ``grams[gram_col]``.

    One Spark job: k salted ``xxhash64`` positions per gram, distinct,
    collected (bounded by k·|grams| ints — the benchmark side, never
    the corpus). ``n_bits`` must be a multiple of 64."""
    assert n_bits % 64 == 0, "n_bits must fill whole 64-bit words"
    pos_cols = F.array(
        *[
            F.pmod(
                F.xxhash64(F.lit(s), F.col(gram_col)), F.lit(n_bits)
            ).cast("int")
            for s in range(n_hashes)
        ]
    )
    rows = grams.select(F.explode(pos_cols).alias("b")).distinct().collect()
    words = [0] * (n_bits // 64)
    for r in rows:
        words[r["b"] // 64] |= 1 << (r["b"] % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    gram: Column, words: list[int], *, n_bits: int, n_hashes: int = 4
) -> Column:
    """True iff every salted hash's bit is set — the JVM probe
    (false positives possible, false negatives impossible).

    The bitmap ships as ONE array literal (``F.lit(words)``), not one
    expression node per word — a 10^6-word (8 MB) bitmap is a single
    py4j transfer. Practical ceiling: tens of MB of literal (~10^7
    grams at 16 bits/gram); past that the plan-embedded-literal form
    stops being the right tool — use ``bloom_filter_agg`` +
    ``might_contain`` (Spark's JVM-side sketch pair) so the bitmap
    never crosses the driver, at the cost of the probe being an opaque
    expression instead of codegen-visible bit math."""
    arr = F.lit(words).cast("array<long>")
    cond = F.lit(True)
    for s in range(n_hashes):
        bitpos = F.pmod(F.xxhash64(F.lit(s), gram), F.lit(n_bits))
        word = F.element_at(arr, (bitpos / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, F.pmod(bitpos, F.lit(64))) == 1)
    return cond


def ngram_decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = DEFAULT_N,
    bits_per_gram: int = 16,
    n_hashes: int = 4,
) -> DataFrame:
    """``ngram_decontaminate`` behind a Bloom pre-filter — identical
    output (the exact join removes Bloom false positives), corpus gram
    rows that fail the probe never reach the join."""
    bench_grams = (
        _gram_hashes(
            benchmark.select(
                F.lit(0).alias("__bid"),
                F.col(bench_text_col or text_col).alias("__btext"),
            ),
            "__btext",
            "__bid",
            n,
        )
        .select("gram_hash")
        .distinct()
    )
    n_bench = bench_grams.count()  # scalar job; bench side is bounded
    n_bits = max(64, -(-(n_bench * bits_per_gram) // 64) * 64)
    words = bloom_build(bench_grams, n_bits=n_bits, n_hashes=n_hashes)
    corpus_grams = _gram_hashes(corpus, text_col, id_col, n)
    pre = corpus_grams.where(
        bloom_might_contain(
            F.col("gram_hash"), words, n_bits=n_bits, n_hashes=n_hashes
        )
    )
    return (
        pre.join(F.broadcast(bench_grams), "gram_hash")
        .groupBy(id_col)
        .agg(F.count_distinct("gram_hash").alias("n_contaminated"))
    )


def q_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom-gated scan — same report as ``decontam_scan`` by
    construction, so it shares that oracle verbatim."""
    report = ngram_decontaminate_bloom(
        _docs(spark, sf_dir), benchmark_fixture(spark, sf_dir)
    )
    return report.orderBy("doc_id")


_register("decontam_bloom", q_decontam_bloom, ORACLES["decontam_scan"])


# ---------------------------------------------------------------------------
# semantic decontamination (embedding-space)
# ---------------------------------------------------------------------------
#
# N-gram decontamination misses paraphrased benchmark leakage — the
# published complement (e.g. the phi / OpenLLM-leaderboard analyses)
# screens in EMBEDDING space: a corpus item whose vector sits close to
# any benchmark vector is flagged. Exhaustive corpus x benchmark
# scoring is the sim_topk_bruteforce shape (fine for a tiny eval set,
# quadratic in general); the scale path here mirrors
# ``embedding_neardup_exact``: literal-plane LSH buckets on BOTH sides,
# candidates from an equi-join on (table, bucket) — corpus vectors
# never shuffle against each other, only against same-bucket benchmark
# rows — then one exact round-6 cosine per candidate and a per-corpus-id
# aggregate. Deterministic planes make the whole screen (buckets,
# candidates, scores, flags) recomputable by the DuckDB oracle.


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    n_planes: int = 4,
) -> DataFrame:
    """(id, n_contaminated, max_cosine): corpus vectors whose cosine to
    at least one same-bucket benchmark vector reaches ``threshold``.
    ``n_contaminated`` counts distinct offending benchmark vectors (the
    ``ngram_decontaminate`` report contract, lifted to embedding space).
    """
    from event_pipeline_spark.operators.similarity import (
        as_double,
        cosine,
        lsh_buckets_exact,
    )

    cb = lsh_buckets_exact(
        corpus, id_col=id_col, vec_col=vec_col, planes=planes,
        n_planes=n_planes,
    )
    bb = lsh_buckets_exact(
        benchmark, id_col=bench_id_col, vec_col=vec_col, planes=planes,
        n_planes=n_planes,
    ).withColumnRenamed("_id", "_bid")
    cand = (
        cb.join(bb, ["table", "bucket"])
        .select(F.col("_id"), F.col("_bid"))
        .distinct()
    )
    cv = corpus.select(
        F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_cv")
    )
    bv = benchmark.select(
        F.col(bench_id_col).alias("_bid"),
        as_double(F.col(vec_col)).alias("_bv"),
    )
    scored = (
        cand.join(cv, "_id")
        .join(F.broadcast(bv), "_bid")
        .select(
            "_id",
            "_bid",
            F.round(cosine(F.col("_cv"), F.col("_bv")), 6).alias("_cos"),
        )
        .where(F.col("_cos") >= threshold)
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.count_distinct("_bid").alias("n_contaminated"),
        F.max("_cos").alias("max_cosine"),
    )


_SEM_BENCH_EVERY = 50
_SEM_THRESHOLD = 0.30


def q_decontam_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived benchmark fixture: every 50th embedding plays the eval
    set; the rest are the corpus. Threshold 0.30 sits near this
    corpus's 99th-percentile pairwise cosine, so a realistic small
    fraction of rows flags."""
    from event_pipeline_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % _SEM_BENCH_EVERY == 0).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") % _SEM_BENCH_EVERY != 0)
    return semantic_decontaminate(
        corpus, bench, threshold=_SEM_THRESHOLD
    ).orderBy("vec_id")


def _sem_oracle() -> str:
    from event_pipeline_spark.operators.similarity import (
        LSH_EXACT_PLANES,
        _planes_values,
    )

    return f"""
WITH corpus AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id % {_SEM_BENCH_EVERY} <> 0),
bench AS (
  SELECT vec_id AS bid, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id % {_SEM_BENCH_EVERY} = 0),
planes(t, w, pv) AS (
  VALUES {_planes_values(LSH_EXACT_PLANES, 4)}
),
cbk AS (
  SELECT c.id, pl.t,
         CAST(sum(CASE WHEN round(list_inner_product(c.v, pl.pv), 7) >= 0
                       THEN pl.w ELSE 0 END) AS BIGINT) AS bucket
  FROM corpus c CROSS JOIN planes pl GROUP BY c.id, pl.t),
bbk AS (
  SELECT b.bid, pl.t,
         CAST(sum(CASE WHEN round(list_inner_product(b.v, pl.pv), 7) >= 0
                       THEN pl.w ELSE 0 END) AS BIGINT) AS bucket
  FROM bench b CROSS JOIN planes pl GROUP BY b.bid, pl.t),
cand AS (
  SELECT DISTINCT c.id, b.bid
  FROM cbk c JOIN bbk b ON c.t = b.t AND c.bucket = b.bucket),
scored AS (
  SELECT cand.id, cand.bid,
         ROUND(list_cosine_similarity(cv.v, bv.v), 6) AS cos
  FROM cand
  JOIN corpus cv ON cv.id = cand.id
  JOIN bench bv ON bv.bid = cand.bid)
SELECT id AS vec_id,
       CAST(count(DISTINCT bid) AS BIGINT) AS n_contaminated,
       CAST(max(cos) AS DOUBLE) AS max_cosine
FROM scored WHERE cos >= {_SEM_THRESHOLD}
GROUP BY id ORDER BY vec_id
"""


_register("decontam_semantic", q_decontam_semantic, _sem_oracle())


# ---------------------------------------------------------------------------
# n-gram novelty: the converse of contamination
# ---------------------------------------------------------------------------


def ngram_novelty(
    docs: DataFrame,
    reference: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, n_novel, novelty): per-doc share of DISTINCT token
    n-grams absent from a reference corpus — the memorization/novelty
    readout dual to ``ngram_decontaminate`` (that flags eval docs the
    train set CONTAINS; this scores how much of a doc the reference
    has never seen — near-zero novelty means the doc is effectively a
    recombination of reference text). Docs shorter than ``n`` tokens
    produce no grams and are absent (the decontam convention).

    Scale shape: digest-only frames; the reference gram set stays
    DISTRIBUTED (plain equi-join on the gram hash — the reference is a
    train corpus, never broadcast-sized); counting is
    map-side-combinable; novelty is one exact division, rounded 7 dp."""
    # one exchange on the join key serves BOTH the per-doc dedup and
    # the reference join: hash-partitioning by gram_hash alone satisfies
    # the (id, gram_hash) dedup's clustering (subset partitioning), and
    # the aggregate preserves it, so the left join below adds no doc-side
    # exchange — one full shuffle of the gram table instead of two.
    # (Map-side partial dedup is lost; within-doc repeat grams are a
    # small fraction, a full extra shuffle is not.)
    doc_g = (
        _gram_hashes(docs, text_col, id_col, n)
        .repartition("gram_hash")
        .dropDuplicates([id_col, "gram_hash"])
    )
    ref_g = (
        _gram_hashes(
            reference.select(
                F.lit(0).alias("__rid"),
                F.col(ref_text_col or text_col).alias("__rtext"),
            ),
            "__rtext",
            "__rid",
            n,
        )
        .select("gram_hash")
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    return (
        doc_g.join(ref_g, "gram_hash", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_grams").cast("double"),
                7,
            ).alias("novelty"),
        )
    )


def q_decontam_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram novelty of every val/test doc against the train split —
    chains the deterministic split with the novelty readout: a
    low-novelty eval doc is train text in disguise even when no single
    8-gram matches (the decontam_scan trigger)."""
    from event_pipeline_spark.operators.sampling import split_assign

    docs = _docs(spark, sf_dir)
    # The (doc_id, split) table is consumed three times (the ev-side
    # filter, the train-side filter, and the final split re-attach) —
    # but NO pin is needed for exchange sharing (r12, recovering the
    # r11 pin's measured regression: driver shelf 1.35 -> 2.72s): the
    # split filters reference the window-derived ``split`` column, so
    # they CANNOT push below the ranking Window — every consumer's
    # subtree below the window's hashpartitioning(source) exchange is
    # identical, and ReusedExchange folds them. The documents scan and
    # the shuffle of (doc_id, source) run ONCE per execution; only the
    # narrow sort+window+CASE above the reused exchange re-evaluates
    # per consumer (16-byte rows, already partitioned — noise at any
    # scale next to the gram pipeline below). No InMemoryRelation, no
    # per-sample re-cache cost, any scale.
    splits = split_assign(
        docs.select("doc_id", "source"), "source", "doc_id"
    ).select("doc_id", "split")
    ev_ids = splits.where(F.col("split") != "train")
    ev = docs.join(ev_ids.select("doc_id"), "doc_id")
    train = docs.join(
        splits.where(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    rep = ngram_novelty(ev.select("doc_id", "text"), train, n=3)
    # re-attach split from the shared split table, not from a rebuilt
    # ev subtree (rep's ids are ev ids by construction, so the inner
    # join against all eval ids is the same row set); this third
    # consumer reads the same reused window exchange as the filters
    # above
    return (
        rep.join(ev_ids, "doc_id")
        .select("doc_id", "split", "n_grams", "n_novel", "novelty")
        .orderBy("doc_id")
    )


_register(
    "decontam_novelty",
    q_decontam_novelty,
    """
WITH ranked AS (
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
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 2, 0)),
             i -> array_to_string(toks[i:i+2], ' ')))) AS g
  FROM (SELECT doc_id,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents)),
ref AS (
  SELECT DISTINCT g FROM grams JOIN splits USING (doc_id)
  WHERE split = 'train'),
ev AS (
  SELECT gr.doc_id, s.split, gr.g
  FROM grams gr JOIN splits s USING (doc_id)
  WHERE s.split <> 'train')
SELECT e.doc_id, e.split, count(*)::BIGINT AS n_grams,
       sum(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_novel,
       round(sum(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 7) AS novelty
FROM ev e LEFT JOIN ref r ON r.g = e.g
GROUP BY e.doc_id, e.split
ORDER BY e.doc_id
""",
)
