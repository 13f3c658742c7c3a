"""WordPiece tokenization (BERT-style greedy longest-match-first).

The second production tokenizer family beside BPE (`operators/
bpe.py`): a FROZEN vocabulary of word-initial pieces and ``##``-
prefixed continuations; each word is consumed left to right, always
taking the LONGEST vocabulary piece that matches at the cursor
(Wu et al. 2016 §4.1; the tokenizers library's WordPiece model). A
word that ever reaches a cursor with no matching piece is ``[UNK]``
as a whole — greedy matching does NOT backtrack, which is observable
behavior (a vocab containing ``ab / abc / ##cd`` maps ``abcd`` to
``[UNK]``: greedy takes ``abc`` and dies, though ``ab + ##cd``
exists) and is pinned by a test.

Spark-first, exactness-first (the `bpe.py` architecture):

- segmentation runs once per DISTINCT word (words table ≪ corpus),
  then joins back — the memoization that makes tokenizer cost
  vocabulary-sized, not corpus-sized;
- the greedy loop is data-independent in TRIP COUNT (bounded by
  ``max_pieces``), so it unrolls into pure JVM string expressions:
  per iteration one projection computes the longest match (a
  fixed-shape CASE over piece lengths ``LMAX..1`` with literal
  vocabulary membership) and one advances (cursor, tokens, dead)
  — each level materialized as real projection columns so the
  expression tree stays linear (the `layout.hilbert_value` rule);
- everything is integer/string — no doubles anywhere, so the DuckDB
  oracle replays the identical unrolled loop bit-for-bit.

The frozen vocabulary is pinned like ``bpe.FROZEN_MERGES`` (the
production contract is a trained-once artifact shipped to the
cluster, never retrained mid-pipeline). It covers the corpus's 31
words with deliberate greedy traps: ``hash`` and ``filt`` are pieces
even though ``ha/##sh`` and ``fil/##ter`` exist, so longest-match is
what the oracle actually verifies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

#: frozen WordPiece vocabulary (word-initial and ##-continuation)
FROZEN_VOCAB = (
    # whole words
    "a", "big", "hash", "join", "key", "row", "the",
    # word-initial pieces
    "ag", "bat", "col", "cust", "da", "du", "fa", "fil", "filt",
    "gro", "ha", "li", "mer", "or", "par", "qu", "sc", "slo", "sm",
    "so", "sp", "str", "ta", "val", "vec", "win",
    # continuations
    "##all", "##an", "##ark", "##ble", "##ch", "##der", "##dow",
    "##eam", "##er", "##ery", "##g", "##ge", "##ne", "##om", "##p",
    "##rt", "##sh", "##st", "##t", "##ta", "##ter", "##tor", "##ue",
    "##umn", "##up", "##w",
)

UNK = "[UNK]"


def _raw_lmax(vocab) -> int:
    """Longest RAW piece length in a vocab (##-continuations count
    without their prefix) — bounds the match ladder; derived from the
    vocab so LOADED artifacts (longer pieces than the frozen table's 5)
    segment correctly."""
    return max(
        len(p) - 2 if p.startswith("##") else len(p) for p in vocab
    )


def _longest_match(word: Column, pos: Column, vocab) -> Column:
    """struct(p, l) of the longest vocab piece matching at pos
    (0-based consumed chars), or NULL."""
    m = F.lit(None).cast("struct<p:string,l:int>")
    for length in range(1, _raw_lmax(vocab) + 1):  # shortest->longest
        raw = F.substring(word, pos + 1, length)
        piece = F.when(pos == 0, raw).otherwise(
            F.concat(F.lit("##"), raw)
        )
        cond = ((F.length(word) - pos) >= length) & piece.isin(
            list(vocab)
        )
        m = F.when(
            cond, F.struct(piece.alias("p"), F.lit(length).alias("l"))
        ).otherwise(m)
    return m


def wordpiece_segment(
    words: DataFrame,
    *,
    word_col: str = "word",
    vocab: tuple[str, ...] = FROZEN_VOCAB,
    max_pieces: int = 6,
) -> DataFrame:
    """Input plus (pieces array<string>, n_pieces int) per word;
    unmatchable words become the single piece ``[UNK]``."""
    df = words.withColumns(
        {
            "_pos": F.lit(0),
            "_toks": F.array().cast("array<string>"),
            "_bad": F.lit(False),
        }
    )
    for _ in range(max_pieces):
        df = df.withColumn(
            "_m",
            _longest_match(F.col(word_col), F.col("_pos"), vocab),
        )
        active = (~F.col("_bad")) & (
            F.col("_pos") < F.length(F.col(word_col))
        )
        df = df.withColumns(
            {
                "_bad": F.when(
                    active & F.col("_m").isNull(), F.lit(True)
                ).otherwise(F.col("_bad")),
                "_toks": F.when(
                    active & F.col("_m").isNotNull(),
                    F.concat(F.col("_toks"), F.array(F.col("_m.p"))),
                ).otherwise(F.col("_toks")),
                "_pos": F.when(
                    active & F.col("_m").isNotNull(),
                    F.col("_pos") + F.col("_m.l"),
                ).otherwise(F.col("_pos")),
            }
        ).drop("_m")
    # unconsumed after the piece budget == dead end
    bad = F.col("_bad") | (F.col("_pos") < F.length(F.col(word_col)))
    return (
        df.withColumn(
            "pieces",
            F.when(bad, F.array(F.lit(UNK))).otherwise(F.col("_toks")),
        )
        .withColumn("n_pieces", F.size("pieces"))
        .drop("_pos", "_toks", "_bad")
    )


def q_wordpiece_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per distinct corpus word: occurrences and its WordPiece split."""
    from event_pipeline_spark.operators.lm import whitespace_tokens
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(whitespace_tokens(F.col("text"))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    )
    seg = wordpiece_segment(words)
    return seg.select(
        "word",
        "n_occ",
        F.array_join("pieces", " ").alias("pieces"),
        F.col("n_pieces").cast("int").alias("n_pieces"),
    ).orderBy("word")


def _ctes(
    vocab: tuple[str, ...], max_pieces: int, prefix: str = ""
) -> tuple[str, str]:
    """(cte_fragment, final_cte_name) replaying the greedy loop, every
    CTE name ``prefix``-ed so the chain composes into multi-tokenizer
    oracles (the fertility triad) without name collisions. The final
    CTE exposes (word, n_occ, pos, toks, bad)."""
    in_list = ", ".join(f"'{v}'" for v in vocab)

    def match_expr(col: str) -> str:
        # longest-first CASE chain; piece = raw or '##'||raw by pos
        whens = []
        for length in range(_raw_lmax(vocab), 0, -1):
            piece = (
                f"(CASE WHEN pos = 0 THEN substr({col}, pos + 1, {length})"
                f" ELSE '##' || substr({col}, pos + 1, {length}) END)"
            )
            whens.append(
                f"WHEN length({col}) - pos >= {length}"
                f" AND {piece} IN ({in_list})"
                f" THEN struct_pack(p := {piece}, l := {length})"
            )
        return "CASE " + " ".join(whens) + " ELSE NULL END"

    p = prefix
    sql = f"""{p}words AS MATERIALIZED (
  SELECT w AS word, count(*)::BIGINT AS n_occ
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents)
  GROUP BY w),
{p}it0 AS (
  SELECT word, n_occ, 0 AS pos, []::VARCHAR[] AS toks, FALSE AS bad
  FROM {p}words)"""
    prev = f"{p}it0"
    for i in range(max_pieces):
        sql += f""",
{p}m{i} AS MATERIALIZED (
  SELECT word, n_occ, pos, toks, bad,
         {match_expr('word')} AS m,
         (NOT bad AND pos < length(word)) AS act
  FROM {prev}),
{p}it{i + 1} AS MATERIALIZED (
  SELECT word, n_occ,
         CASE WHEN act AND m IS NOT NULL THEN pos + m.l ELSE pos END
           AS pos,
         CASE WHEN act AND m IS NOT NULL THEN toks || [m.p]
              ELSE toks END AS toks,
         CASE WHEN act AND m IS NULL THEN TRUE ELSE bad END AS bad
  FROM {p}m{i})"""
        prev = f"{p}it{i + 1}"
    return sql, prev


def _oracle_sql(vocab: tuple[str, ...], max_pieces: int) -> str:
    ctes, final = _ctes(vocab, max_pieces)
    return f"""
WITH {ctes}
SELECT word, n_occ,
       CASE WHEN bad OR pos < length(word) THEN '{UNK}'
            ELSE array_to_string(toks, ' ') END AS pieces,
       CASE WHEN bad OR pos < length(word) THEN 1
            ELSE len(toks) END::INT AS n_pieces
FROM {final} ORDER BY word"""


QUERIES["wordpiece_tokens"] = q_wordpiece_tokens
ORACLES["wordpiece_tokens"] = _oracle_sql(FROZEN_VOCAB, 6)


def oov_rate_by_lang(docs: DataFrame) -> DataFrame:
    """(lang, n_types, n_occ, unk_types, unk_occ, oov_rate): per
    language, the share of word occurrences the frozen WordPiece vocab
    cannot segment (the ``[UNK]`` rate) — the vocabulary-coverage
    readout a tokenizer choice is actually judged by before a training
    run (high OOV on a language means its text degrades to UNK soup).

    Scale shape: segmentation runs once per DISTINCT corpus word (the
    memoization discipline of ``q_wordpiece_tokens``) and joins back to
    per-(lang, word) counts; everything else is map-side-combinable
    counting, and oov_rate is ONE division of exact BIGINTs."""
    from event_pipeline_spark.operators.lm import whitespace_tokens
    lang_words = (
        docs.select(
            "lang",
            F.explode(whitespace_tokens(F.col("text"))).alias("word"),
        )
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    seg = wordpiece_segment(
        lang_words.select("word").distinct()
    ).select(
        "word",
        (F.col("pieces") == F.array(F.lit(UNK))).alias("is_unk"),
    )
    j = lang_words.join(seg, "word")
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum("c").cast("bigint").alias("n_occ"),
            F.sum(F.col("is_unk").cast("long"))
            .cast("bigint")
            .alias("unk_types"),
            F.sum(F.when(F.col("is_unk"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("unk_occ"),
        )
        .select(
            "lang",
            "n_types",
            "n_occ",
            "unk_types",
            "unk_occ",
            F.round(
                F.col("unk_occ").cast("double")
                / F.col("n_occ").cast("double"),
                7,
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )


def q_tok_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return oov_rate_by_lang(read_table(spark, sf_dir, "documents"))


def _oov_oracle_sql(vocab: tuple[str, ...], max_pieces: int) -> str:
    ctes, final = _ctes(vocab, max_pieces, prefix="ov")
    return f"""
WITH {ctes},
lang_words AS (
  SELECT lang, w AS word, count(*)::BIGINT AS c
  FROM (SELECT lang,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents)
  GROUP BY lang, w),
seg AS (
  SELECT word, (bad OR pos < length(word)) AS is_unk FROM {final})
SELECT lang, count(*)::BIGINT AS n_types, sum(c)::BIGINT AS n_occ,
       sum(CASE WHEN is_unk THEN 1 ELSE 0 END)::BIGINT AS unk_types,
       sum(CASE WHEN is_unk THEN c ELSE 0 END)::BIGINT AS unk_occ,
       round(sum(CASE WHEN is_unk THEN c ELSE 0 END)::DOUBLE
             / sum(c)::DOUBLE, 7) AS oov_rate
FROM lang_words JOIN seg USING (word)
GROUP BY lang ORDER BY lang"""


QUERIES["tok_oov_rate"] = q_tok_oov_rate
ORACLES["tok_oov_rate"] = _oov_oracle_sql(FROZEN_VOCAB, 6)
