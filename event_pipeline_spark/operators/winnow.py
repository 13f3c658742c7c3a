"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003
— the MOSS algorithm): from the rolling sequence of word k-gram
hashes, select the minimum of every w-hash window (rightmost position
on ties). The winnowing guarantee: any shared token run of length
>= w + k - 1 between two documents yields at least one SHARED selected
fingerprint — detection is deterministic, not probabilistic (the
position-aware complement of MinHash, which trades determinism for a
fixed-size sketch).

Scale shape: fingerprint selection is a pure per-document JVM
expression (no shuffle); downstream matching joins on the 32-byte
fingerprint digest only. The pair report caps fingerprint document
frequency (``max_df``) before joining — ultra-common fingerprints are
boilerplate by definition and would otherwise force a quadratic join
(the standard MOSS noise rule).

Registered query ``fp_winnow`` is the selection itself (linear rows,
fully oracle-recomputed: hashes, window argmin, tie rule);
``fp_winnow_pairs`` is the capped pair report, whose oracle reuses the
selection CTEs and recomputes the df cap, digest self-join, and shared
counts. The guarantee and tie-rule contracts are pytest-gated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

#: k-gram length (tokens per hash) and window size (hashes per window)
K_GRAM = 4
WINDOW = 4


def _gram_hash_structs(text_col: Column, k: int) -> Column:
    """array<struct(h: md5-hex of k-gram at pos, negpos: -pos)> —
    negpos makes struct-min pick the RIGHTMOST among equal hashes.
    ``bind`` keeps the split single-evaluation (see text.bind).

    Deliberately NOT the rolling polynomial kernel
    (`text.window_fp_array`): measured at sf0.1, the md5-slice form is
    ~3 interpreted-expression dispatches per position (slice+join+md5)
    while the dual-lane Horner form is ~60 (residues, doubling levels,
    packing), and HOF lambdas evaluate interpreted — the swap REGRESSED
    winnow_fingerprints 0.96s -> 1.4-1.6s despite hashing fewer bytes.
    At k=4 the byte redundancy is only 4x, so dispatch count dominates;
    the rolling kernel wins where the window is large (substring dedup
    at window=50 uses it — 50x byte redundancy AND an expression tree
    the naive form cannot even build).

    r12 micro-form: ``concat_ws`` over k ``try_element_at`` lookups
    replaces ``array_join(slice(...))`` — no per-position array
    allocation; ``try_element_at`` past the end yields NULL, which
    ``concat_ws`` skips, reproducing the slice's clamp on docs shorter
    than k EXACTLY (identity checked on the corpus and on 1..8-token
    hand docs; selection stage measured 0.875 -> 0.764s at sf0.1
    together with the ``least`` window-min below)."""
    from event_pipeline_spark.operators.text import bind

    return bind(
        F.split(F.lower(F.trim(text_col)), r"\s+"),
        lambda toks: F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))
            ),
            lambda i: F.struct(
                F.md5(
                    F.concat_ws(
                        " ",
                        *[F.try_element_at(toks, i + d) for d in range(k)],
                    )
                ).alias("h"),
                (-i).alias("negpos"),
            ),
        ),
    )


def winnow_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
    w: int = WINDOW,
) -> DataFrame:
    """(id, pos, fp): the distinct selected fingerprints per document
    (pos is the 1-based k-gram position). Documents with fewer than w
    k-grams form one clamped window (their global minimum is selected),
    so every non-empty document carries at least one fingerprint."""
    # Materialize the gram-hash array as a REAL column before windowing:
    # referencing the expression inside the window lambda would make
    # Catalyst re-evaluate the whole O(n·k) md5 array per window slice
    # (no CSE across lambda scopes) — measured 170s -> 3s at sf0.1.
    hashed = docs.select(
        F.col(id_col),
        _gram_hash_structs(F.col(text_col), k).alias("_hs"),
    )
    hs = F.col("_hs")
    n_windows = F.greatest(F.size(hs) - (w - 1), F.lit(1))
    # r12: unrolled ``least`` over w ``try_element_at`` lookups instead
    # of ``array_min(slice(...))`` — no per-window array allocation;
    # least skips the NULLs a past-the-end lookup yields, reproducing
    # the slice's clamp on docs with fewer than w k-grams exactly (the
    # struct comparison — hash asc, negpos asc = rightmost-on-ties —
    # is the same total order either way; identity checked on corpus +
    # short-doc hand cases)
    selected = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.least(
                *[F.try_element_at(hs, j + d) for d in range(w)]
            ),
        )
    )
    return hashed.select(
        F.col(id_col), F.explode(selected).alias("_s")
    ).select(
        id_col,
        (-F.col("_s.negpos")).cast("int").alias("pos"),
        F.col("_s.h").alias("fp"),
    )


def winnow_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
    w: int = WINDOW,
    max_df: int = 5,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing selected
    fingerprints, after dropping fingerprints appearing in more than
    ``max_df`` documents (the MOSS noise rule — ultra-common
    fingerprints are boilerplate and would force a quadratic join)."""
    # ONE hash exchange on ``fp`` carries the whole pipeline: the
    # repartition satisfies the (_id, fp) dedup's clustering (subset
    # partitioning), the df-cap window's, and both self-join sides' —
    # so the expensive per-doc selection is shuffled exactly once and
    # nothing downstream re-exchanges until the final pair aggregate.
    # (Map-side partial dedup is lost, but per-doc fingerprints are
    # already array_distinct'd, so cross-position duplicates are few.)
    fps = (
        winnow_fingerprints(
            docs, id_col=id_col, text_col=text_col, k=k, w=w
        )
        .select(F.col(id_col).alias("_id"), "fp")
        .repartition("fp")
        .distinct()
    )
    # df cap as a COUNT WINDOW over the join key (the ``_cap_buckets``
    # discipline), not a separate aggregate + join: a groupBy("fp")
    # subtree gets column-pruned to fp-only, which makes its exchange
    # differ from the self-join sides' (_id, fp) exchange and defeats
    # exchange reuse — the expensive per-doc gram-hash/window-select
    # compute then re-runs per consumer (r10 bench: 2.5s for ~0.8s of
    # fingerprinting). The window needs clustering on fp, exactly what
    # both self-join sides need, and ``fr`` is the SAME subtree on both
    # sides — so the whole plan holds ONE exchange over the fingerprint
    # selection (ReusedExchange on the other side), and the selection
    # runs once per execution with no cache involved, at any scale.
    fr = (
        fps.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .where(F.col("_df") <= max_df)
        .drop("_df")
    )
    a, b = fr.alias("a"), fr.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def q_fp_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return winnow_fingerprints(
        read_table(spark, sf_dir, "documents")
    ).orderBy("doc_id", "pos", "fp")


def q_fp_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return winnow_pairs(
        read_table(spark, sf_dir, "documents")
    ).orderBy("id_a", "id_b")


QUERIES["fp_winnow"] = q_fp_winnow
QUERIES["fp_winnow_pairs"] = q_fp_winnow_pairs
ORACLES["fp_winnow"] = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS a
  FROM documents),
hs AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(a[i : i + {K_GRAM - 1}], ' ')) AS h,
         greatest(len(a) - {K_GRAM - 1}, 1) AS n_grams
  FROM toks,
       LATERAL unnest(generate_series(1, greatest(len(a) - {K_GRAM - 1}, 1)))
           AS t(i)),
sel AS (
  SELECT DISTINCT doc_id, pos, h FROM (
    SELECT hs.doc_id, hs.pos, hs.h,
           row_number() OVER (
               PARTITION BY hs.doc_id, wj.j
               ORDER BY hs.h ASC, hs.pos DESC) AS rk
    FROM hs,
         LATERAL unnest(generate_series(
             1, greatest(hs.n_grams - {WINDOW - 1}, 1))) AS wj(j)
    WHERE hs.pos >= wj.j AND hs.pos < wj.j + {WINDOW})
  WHERE rk = 1)
SELECT doc_id, pos::INT AS pos, h AS fp
FROM sel ORDER BY doc_id, pos, fp
"""

_SEL_CTES = ORACLES["fp_winnow"].split("SELECT doc_id, pos::INT")[0]

ORACLES["fp_winnow_pairs"] = (
    _SEL_CTES
    + f""",
fps AS (SELECT DISTINCT doc_id AS id, h AS fp FROM sel),
rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 5)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fps a JOIN rare USING (fp) JOIN fps b USING (fp)
WHERE a.id < b.id
GROUP BY a.id, b.id ORDER BY id_a, id_b
"""
)


def winnow_span_report(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
    w: int = WINDOW,
    max_df: int = 5,
) -> DataFrame:
    """(id_a, id_b, n_shared, longest_run, longest_span_tokens): the
    MOSS-style extent report. Candidates come from the winnowing pair
    join; the extent then uses ALL k-gram hashes of just those pairs —
    a shared gram at positions (pa, pb) lies on diagonal pa−pb, and a
    maximal run of consecutive positions on one diagonal is a shared
    substring of run+k−1 tokens (exact, not a fingerprint sample,
    because every gram of a shared run shares its hash).

    Scale shape: the quadratic-looking part is confined to candidate
    pairs (bounded by the max_df cap); the islands detection is one
    window per (pair, diagonal) over gram POSITIONS — integers only,
    no text movement."""
    pairs = winnow_pairs(
        docs, id_col=id_col, text_col=text_col, k=k, w=w, max_df=max_df
    )
    grams = docs.select(
        F.col(id_col).alias("_gid"),
        F.explode(_gram_hash_structs(F.col(text_col), k)).alias("_s"),
    ).select("_gid", (-F.col("_s.negpos")).alias("p"), F.col("_s.h").alias("h"))
    ga = grams.select(
        F.col("_gid").alias("id_a"), F.col("p").alias("pa"), "h"
    )
    gb = grams.select(
        F.col("_gid").alias("id_b"), F.col("p").alias("pb"), "h"
    )
    occ = (
        pairs.join(ga, "id_a")
        .join(gb, ["id_b", "h"])
        .select(
            "id_a", "id_b", "n_shared",
            (F.col("pa") - F.col("pb")).alias("diag"), "pa",
        )
        .distinct()
    )
    iw = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = (
        occ.withColumn("_grp", F.col("pa") - F.row_number().over(iw))
        .groupBy("id_a", "id_b", "n_shared", "diag", "_grp")
        .agg(F.count(F.lit(1)).alias("_run"))
    )
    return runs.groupBy("id_a", "id_b", "n_shared").agg(
        F.max("_run").cast("long").alias("longest_run"),
        (F.max("_run") + F.lit(k - 1)).cast("long").alias(
            "longest_span_tokens"
        ),
    )


def q_fp_winnow_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return winnow_span_report(
        read_table(spark, sf_dir, "documents")
    ).orderBy("id_a", "id_b")


QUERIES["fp_winnow_spans"] = q_fp_winnow_spans
ORACLES["fp_winnow_spans"] = (
    _SEL_CTES
    + f""",
fps AS (SELECT DISTINCT doc_id AS id, h AS fp FROM sel),
rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 5),
pairs AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM fps a JOIN rare USING (fp) JOIN fps b USING (fp)
  WHERE a.id < b.id
  GROUP BY a.id, b.id),
grams AS MATERIALIZED (
  SELECT doc_id AS id, pos AS p, h FROM hs),
occ AS (
  SELECT DISTINCT pr.id_a, pr.id_b, pr.n_shared,
         ga.p - gb.p AS diag, ga.p AS pa
  FROM pairs pr
  JOIN grams ga ON ga.id = pr.id_a
  JOIN grams gb ON gb.id = pr.id_b AND gb.h = ga.h),
runs AS (
  SELECT id_a, id_b, n_shared, diag,
         pa - row_number() OVER (
             PARTITION BY id_a, id_b, diag ORDER BY pa) AS grp
  FROM occ)
SELECT id_a, id_b, n_shared,
       CAST(max(run) AS BIGINT) AS longest_run,
       CAST(max(run) + {K_GRAM - 1} AS BIGINT) AS longest_span_tokens
FROM (SELECT id_a, id_b, n_shared, diag, grp,
             count(*) AS run
      FROM runs GROUP BY id_a, id_b, n_shared, diag, grp)
GROUP BY id_a, id_b, n_shared ORDER BY id_a, id_b
"""
)
