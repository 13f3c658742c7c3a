"""Unigram-LM tokenization (SentencePiece, Kudo 2018): Viterbi
segmentation of each word into the vocabulary pieces maximizing the
sum of frozen piece log-probabilities.

The third production tokenizer family beside BPE (`operators/bpe.py`,
merge-rule replay) and WordPiece (`operators/wordpiece.py`, greedy
longest-match): Unigram is what SentencePiece ships by default, and it
differs OBSERVABLY from greedy matching — the highest-probability
segmentation is not always the one that grabs the longest piece first
(``table`` → ``ta ble`` here because lp(ta)+lp(ble) > lp(table), while
``window`` stays whole because lp(window) wins; greedy takes ``table``
whole and mis-segments ``filter`` as ``filt er``). The divergence
cases are pinned by tests.

Spark-first, exactness-first (the bpe/wordpiece architecture):

- segmentation runs once per DISTINCT word then joins back — tokenizer
  cost is vocabulary-sized, not corpus-sized;
- log-probs are FROZEN integer units (1e-7 nats, BIGINT), so every DP
  score is an exact integer sum — no doubles anywhere;
- the Viterbi DP unrolls over bounded word length (``max_len``
  positions x ``<= PMAX`` piece lengths): per position one projection
  computes the best score/backpointer pair via an ascending
  replace-on->= fold (ties go to the LONGEST last piece — pinned);
  the backtrack unrolls the same way over an array of backpointers.
  Unreachable scores use an integer SENTINEL instead of NULL so both
  engines fold identical BIGINTs;
- the DuckDB oracle replays the identical DP: same substrings, same
  piece table, same sentinel, greatest() + a descending first-match
  CASE (provably the same winner as the ascending >=-fold: the fold's
  final value is the max and its final backpointer is the largest
  piece length attaining it).

The frozen vocabulary covers every corpus character (the SentencePiece
character-coverage guarantee), so ``[UNK]`` only appears for words
longer than ``max_len`` or containing unseen characters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

UNK = "[UNK]"

#: unreachable-score sentinel: any real score is > -1.3e9 units
#: (max_len * min char lp), so anything below ``REACH_FLOOR`` is a
#: sentinel chain, never a real segmentation.
SENTINEL = -(10**15)
REACH_FLOOR = -(10**14)

_CHAR_LP = -150_000_000  # -15.0 nats: coverage floor per character

#: frozen piece -> log-prob in 1e-7-nat integer units (trained-once
#: artifact, like bpe.FROZEN_MERGES / wordpiece.FROZEN_VOCAB). Crafted
#: with deliberate greedy traps: ``table``/``custom``/``filt``/``sca``
#: are high-rank long pieces that greedy grabs but Viterbi rejects.
FROZEN_UNIGRAM: dict[str, int] = {
    **{c: _CHAR_LP for c in "abcdefghijklmnopqrstuvwy"},
    "the": -20_000_000,
    "ta": -30_000_000, "ble": -35_000_000, "table": -70_000_000,
    "cust": -30_000_000, "omer": -35_000_000,
    "custom": -50_000_000, "er": -20_000_000,
    "da": -30_000_000, "qu": -30_000_000, "ery": -30_000_000,
    "sc": -40_000_000, "an": -25_000_000, "sca": -32_000_000,
    "sp": -35_000_000, "ark": -30_000_000,
    "str": -30_000_000, "eam": -30_000_000,
    "win": -30_000_000, "dow": -30_000_000, "window": -55_000_000,
    "or": -25_000_000, "der": -30_000_000,
    "jo": -30_000_000, "in": -20_000_000, "join": -45_000_000,
    "val": -30_000_000, "ue": -25_000_000,
    "vec": -30_000_000, "tor": -30_000_000,
    "gro": -35_000_000, "up": -25_000_000,
    "fil": -30_000_000, "ter": -25_000_000, "filt": -60_000_000,
    "ha": -30_000_000, "sh": -25_000_000, "hash": -40_000_000,
    "ba": -35_000_000, "tch": -35_000_000, "batch": -60_000_000,
    "li": -30_000_000, "ne": -25_000_000,
    "mer": -30_000_000, "ge": -25_000_000,
    "pa": -30_000_000, "rt": -25_000_000,
    "row": -35_000_000,
    "sl": -40_000_000, "ow": -25_000_000,
    "sm": -40_000_000, "all": -25_000_000,
    "so": -35_000_000,
    "key": -30_000_000,
    "big": -30_000_000,
    "agg": -35_000_000,
    "dup": -35_000_000,
    "co": -30_000_000, "lumn": -35_000_000,
    "fa": -35_000_000, "st": -25_000_000,
}

#: max corpus word length (8 on this corpus; longer words -> [UNK])
MAX_LEN = 8


def _lp_lookup(vocab: dict[str, int]) -> Column:
    """Literal piece -> lp map (one CreateMap, evaluated per distinct
    word — vocabulary-sized, the bpe.py id-map pattern)."""
    entries: list[Column] = []
    for p, lp in vocab.items():
        entries.append(F.lit(p))
        entries.append(F.lit(int(lp)).cast("long"))
    return F.create_map(*entries)


def unigram_segment(
    words: DataFrame,
    *,
    word_col: str = "word",
    vocab: dict[str, int] | None = None,
    max_len: int = MAX_LEN,
) -> DataFrame:
    """Input plus (pieces array<string>, n_pieces int, logp_units
    bigint-or-null) per word: the Viterbi-optimal segmentation under
    the frozen unigram LM. Words that cannot be segmented (length >
    ``max_len`` or an uncovered character) become the single piece
    ``[UNK]`` with NULL score."""
    vocab = FROZEN_UNIGRAM if vocab is None else vocab
    pmax = max(len(p) for p in vocab)
    lp = _lp_lookup(vocab)
    w = F.col(word_col)

    df = words.withColumn("_best0", F.lit(0).cast("long"))
    for j in range(1, max_len + 1):
        best: Column = F.lit(SENTINEL).cast("long")
        bp: Column = F.lit(0)
        for length in range(1, min(pmax, j) + 1):
            piece = F.substring(w, j - length + 1, length)
            cand = F.col(f"_best{j - length}") + F.coalesce(
                F.element_at(lp, piece), F.lit(SENTINEL).cast("long")
            )
            better = cand >= best  # ascending l + >= : longest-piece tie win
            bp = F.when(better, F.lit(length)).otherwise(bp)
            best = F.when(better, cand).otherwise(best)
        # materialize per position: keeps the expression tree LINEAR in
        # max_len (the wordpiece/hilbert projection-per-level rule)
        df = df.withColumns({f"_best{j}": best, f"_bp{j}": bp})

    bests = F.array(*[F.col(f"_best{j}") for j in range(1, max_len + 1)])
    bps = F.array(*[F.col(f"_bp{j}") for j in range(1, max_len + 1)])
    df = df.withColumns(
        {
            # try_element_at: length(word) may exceed max_len (over-
            # length words are [UNK]); plain element_at throws there
            "_score": F.coalesce(
                F.try_element_at(bests, F.length(w).cast("int")),
                F.lit(SENTINEL).cast("long"),
            ),
            "_bps": bps,
            "_pos": F.when(F.length(w) <= max_len, F.length(w).cast("int"))
            .otherwise(F.lit(0)),
            "_toks": F.array().cast("array<string>"),
        }
    )
    ok_score = F.col("_score") > F.lit(REACH_FLOOR)
    for _ in range(max_len):
        active = ok_score & (F.col("_pos") > 0)
        step = F.element_at(F.col("_bps"), F.col("_pos"))
        piece = F.substring(w, F.col("_pos") - step + 1, step)
        df = df.withColumns(
            {
                "_toks": F.when(
                    active, F.concat(F.array(piece), F.col("_toks"))
                ).otherwise(F.col("_toks")),
                "_pos": F.when(active, F.col("_pos") - step).otherwise(
                    F.col("_pos")
                ),
            }
        )
    out = df.withColumns(
        {
            "pieces": F.when(ok_score, F.col("_toks")).otherwise(
                F.array(F.lit(UNK))
            ),
            "n_pieces": F.when(ok_score, F.size("_toks"))
            .otherwise(F.lit(1))
            .cast("int"),
            "logp_units": F.when(ok_score, F.col("_score")).cast("long"),
        }
    )
    drop = (
        [f"_best{j}" for j in range(0, max_len + 1)]
        + [f"_bp{j}" for j in range(1, max_len + 1)]
        + ["_score", "_bps", "_pos", "_toks"]
    )
    return out.drop(*drop)


def q_unigram_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per distinct corpus word: occurrences, Viterbi pieces, and the
    exact integer-unit log-prob of the optimal segmentation."""
    from event_pipeline_spark.operators.lm import whitespace_tokens
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(whitespace_tokens(F.col("text"))).alias("word")
        )
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    )
    seg = unigram_segment(words)
    return seg.select(
        "word",
        "n_occ",
        F.array_join("pieces", " ").alias("pieces"),
        "n_pieces",
        "logp_units",
    ).orderBy("word")


def _lp_sql(piece_expr: str, vocab: dict[str, int]) -> str:
    """coalesce(piece lookup, SENTINEL) as a literal simple-CASE — a
    scalar subquery against a pieces CTE would be cleaner, but DuckDB
    cannot lateral-reference an alias whose expression contains a
    subquery, and the DP folds candidates through lateral aliases."""
    whens = " ".join(
        f"WHEN '{p}' THEN {lp}::BIGINT" for p, lp in sorted(vocab.items())
    )
    return f"coalesce(CASE {piece_expr} {whens} END, {SENTINEL})"


def _ctes(
    vocab: dict[str, int] | None = None,
    max_len: int = MAX_LEN,
    prefix: str = "",
) -> tuple[str, str]:
    """(cte_fragment, final_cte_name) replaying the exact Viterbi DP
    in DuckDB: one CTE per position (candidates as lateral aliases,
    greatest() + descending first-match backpointer), one CTE per
    backtrack step. CTE names are ``prefix``-ed so the chain composes
    into multi-tokenizer oracles. The final CTE exposes
    (word, n_occ, score, t{max_len})."""
    vocab = FROZEN_UNIGRAM if vocab is None else vocab
    pmax = max(len(p) for p in vocab)
    p_ = prefix
    sql = f"""{p_}words AS MATERIALIZED (
  SELECT w AS word, count(*)::BIGINT AS n_occ
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents)
  WHERE length(w) >= 1
  GROUP BY w),
{p_}d0 AS (SELECT word, n_occ, 0::BIGINT AS best0 FROM {p_}words)"""
    for j in range(1, max_len + 1):
        k = min(pmax, j)
        cand_aliases = ",\n         ".join(
            f"(best{j - length} + "
            + _lp_sql(f"substr(word, {j - length + 1}, {length})", vocab)
            + f") AS c{j}_{length}"
            for length in range(1, k + 1)
        )
        greatest_args = ", ".join(f"c{j}_{length}" for length in range(1, k + 1))
        best = (
            f"greatest({greatest_args})" if k > 1 else f"c{j}_1"
        )
        bp_case = (
            "CASE "
            + " ".join(
                f"WHEN c{j}_{length} = best{j} THEN {length}"
                for length in range(k, 0, -1)
            )
            + " END"
        )
        sql += f""",
{p_}d{j} AS MATERIALIZED (
  SELECT *,
         {cand_aliases},
         {best} AS best{j},
         {bp_case} AS bp{j}
  FROM {p_}d{j - 1})"""
    bests = ", ".join(f"best{j}" for j in range(1, max_len + 1))
    bps = ", ".join(f"bp{j}" for j in range(1, max_len + 1))
    sql += f""",
{p_}bt0 AS (
  SELECT word, n_occ, [{bps}] AS bps,
         coalesce(list_extract([{bests}], length(word)::INT),
                  {SENTINEL}::BIGINT) AS score,
         CASE WHEN length(word) <= {max_len} THEN length(word)::INT
              ELSE 0 END AS p0,
         []::VARCHAR[] AS t0
  FROM {p_}d{max_len})"""
    for i in range(1, max_len + 1):
        sql += f""",
{p_}bt{i} AS (
  SELECT word, n_occ, bps, score,
         CASE WHEN score > {REACH_FLOOR} AND p{i - 1} > 0
              THEN p{i - 1} - bps[p{i - 1}] ELSE p{i - 1} END AS p{i},
         CASE WHEN score > {REACH_FLOOR} AND p{i - 1} > 0
              THEN [substr(word, p{i - 1} - bps[p{i - 1}] + 1,
                           bps[p{i - 1}])] || t{i - 1}
              ELSE t{i - 1} END AS t{i}
  FROM {p_}bt{i - 1})"""
    return sql, f"{p_}bt{max_len}"


def _oracle_sql(
    vocab: dict[str, int] | None = None, max_len: int = MAX_LEN
) -> str:
    ctes, final = _ctes(vocab, max_len)
    return f"""
WITH {ctes}
SELECT word, n_occ,
       CASE WHEN score > {REACH_FLOOR}
            THEN array_to_string(t{max_len}, ' ') ELSE '{UNK}' END
         AS pieces,
       (CASE WHEN score > {REACH_FLOOR} THEN len(t{max_len})
             ELSE 1 END)::INT AS n_pieces,
       (CASE WHEN score > {REACH_FLOOR} THEN score END)::BIGINT
         AS logp_units
FROM {final} ORDER BY word"""


QUERIES["unigram_tokens"] = q_unigram_tokens
ORACLES["unigram_tokens"] = _oracle_sql()


# ---------------------------------------------------------------------------
# Tokenizer-fertility triad: the head-to-head efficiency comparison a
# vocabulary decision actually runs — tokens-per-word under all three
# production families (BPE merge replay, WordPiece greedy, Unigram
# Viterbi) over the SAME corpus in one result. Each family's token
# counts come from ITS registered exact contract (bpe doc tokens /
# wordpiece greedy loop / unigram DP), so the triad oracle embeds all
# three chains verbatim — one graded row per tokenizer.
# ---------------------------------------------------------------------------


def q_tok_fertility_triad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tokenizer, n_words, n_tokens, fertility): corpus totals under
    bpe / unigram / wordpiece. Word-level tokenizers count via the
    per-DISTINCT-word segmentation weighted by occurrences (the
    memoization join); BPE counts per doc (its contract tokenizes
    whole texts). n_words is the shared whitespace-word total."""
    from event_pipeline_spark.operators.bpe import FROZEN_MERGES, apply_bpe
    from event_pipeline_spark.operators.lm import whitespace_tokens
    from event_pipeline_spark.operators.wordpiece import wordpiece_segment
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(whitespace_tokens(F.col("text"))).alias("word")
        )
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    )
    # one tiny aggregate reused by all three rows (one-row broadcast)
    total = words.agg(F.sum("n_occ").cast("bigint").alias("n_words"))

    def family(name: str, seg: DataFrame) -> DataFrame:
        toks = seg.agg(
            F.sum(F.col("n_occ") * F.col("n_pieces")).cast("bigint")
            .alias("n_tokens")
        )
        return toks.crossJoin(total).select(
            F.lit(name).alias("tokenizer"), "n_words", "n_tokens"
        )

    bpe_toks = (
        apply_bpe(docs, "text", FROZEN_MERGES)
        .agg(F.sum("n_tokens").cast("bigint").alias("n_tokens"))
        .crossJoin(total)
        .select(F.lit("bpe").alias("tokenizer"), "n_words", "n_tokens")
    )
    out = bpe_toks.unionByName(
        family("unigram", unigram_segment(words))
    ).unionByName(family("wordpiece", wordpiece_segment(words)))
    return out.select(
        "tokenizer",
        "n_words",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_words").cast("double"),
            6,
        ).alias("fertility"),
    ).orderBy("tokenizer")


def _triad_oracle_sql() -> str:
    from event_pipeline_spark.operators.bpe import _BPE_DOC_TOKENS_CTE
    from event_pipeline_spark.operators.wordpiece import FROZEN_VOCAB
    from event_pipeline_spark.operators.wordpiece import _ctes as _wp_ctes

    wp_ctes, wp_final = _wp_ctes(FROZEN_VOCAB, 6, prefix="wp_")
    ug_ctes, ug_final = _ctes(prefix="ug_")
    return f"""
WITH {_BPE_DOC_TOKENS_CTE},
{wp_ctes},
{ug_ctes},
tot AS (SELECT sum(n_occ)::BIGINT AS n_words FROM ug_words),
bpet AS (SELECT sum(n)::BIGINT AS n_tokens FROM doctok),
wpt AS (SELECT sum(n_occ * (CASE WHEN bad OR pos < length(word) THEN 1
                                 ELSE len(toks) END))::BIGINT AS n_tokens
        FROM {wp_final}),
ugt AS (SELECT sum(n_occ * (CASE WHEN score > {REACH_FLOOR}
                                 THEN len(t{MAX_LEN})
                                 ELSE 1 END))::BIGINT AS n_tokens
        FROM {ug_final})
SELECT tokenizer, n_words, n_tokens,
       round(n_tokens::DOUBLE / n_words::DOUBLE, 6) AS fertility
FROM (SELECT 'bpe' AS tokenizer, tot.n_words, bpet.n_tokens
      FROM tot, bpet
      UNION ALL
      SELECT 'unigram', tot.n_words, ugt.n_tokens FROM tot, ugt
      UNION ALL
      SELECT 'wordpiece', tot.n_words, wpt.n_tokens FROM tot, wpt)
ORDER BY tokenizer"""


QUERIES["tok_fertility_triad"] = q_tok_fertility_triad
ORACLES["tok_fertility_triad"] = _triad_oracle_sql()
