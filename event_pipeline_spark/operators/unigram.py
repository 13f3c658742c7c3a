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
  score is an exact integer sum — no doubles anywhere (Python ints are
  exact, so the Arrow path below folds the same BIGINTs);
- the Viterbi DP runs in ONE Arrow-batched pandas UDF over the
  distinct-word table (the ``dedup.shingles``/``minhash`` house
  pattern): per position an ascending replace-on->= fold over piece
  lengths (ties go to the LONGEST last piece — pinned), then a
  backtrack over the backpointer array. Unreachable scores use an
  integer SENTINEL instead of NULL so both engines fold identical
  BIGINTs. Round-11 note: the previous all-built-ins form unrolled the
  DP into 16 chained projections whose whole-stage-codegen fusion
  generated a 3.6 MB Java source with one 27k-line method — janino's
  64 KB method limit failed the compile and the WHOLE fused stage
  (including the corpus-sized word count aggregate) ran interpreted.
  The Arrow form keeps the corpus aggregate compiled and does the
  vocabulary-sized DP in vectorized-batched Python (~µs/word);
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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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


def _viterbi_one(
    word: str, vocab: dict[str, int], max_len: int, pmax: int
) -> tuple[list[str], int, int | None]:
    """The exact integer Viterbi the unrolled-projection form computed:
    ascending piece length with a ``>=`` fold (longest last piece wins
    ties), SENTINEL for unreachable prefixes, backtrack from
    ``len(word)``. Returns (pieces, n_pieces, logp_units-or-None)."""
    if word is None:
        # preserve the replaced column-based form's null semantics
        # (F.length(NULL) -> NULL routed to the [UNK] branch); corpus
        # words come from split/explode and are never null, but a null
        # here must degrade, not TypeError the whole Arrow batch
        return [UNK], 1, None
    n = len(word)
    if n == 0 or n > max_len:
        return [UNK], 1, None
    best = [SENTINEL] * (n + 1)
    best[0] = 0
    bp = [0] * (n + 1)
    for j in range(1, n + 1):
        b = SENTINEL
        p = 0
        for length in range(1, min(pmax, j) + 1):
            lp = vocab.get(word[j - length : j], SENTINEL)
            cand = best[j - length] + lp
            if cand >= b:  # ascending l + >= : longest-piece tie win
                b, p = cand, length
        best[j], bp[j] = b, p
    score = best[n]
    if score <= REACH_FLOOR:
        return [UNK], 1, None
    toks: list[str] = []
    pos = n
    while pos > 0:
        step = bp[pos]
        toks.append(word[pos - step : pos])
        pos -= step
    toks.reverse()
    return toks, len(toks), score


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
    ``[UNK]`` with NULL score.

    One Arrow-batched pandas UDF over the distinct-word table (see the
    module docstring for why this beats the unrolled-projection form:
    the latter's whole-stage-codegen output blew janino's 64 KB method
    limit and dragged the corpus-side aggregate into interpreted
    mode). The DP is exact integer arithmetic either way."""

    vocab = dict(FROZEN_UNIGRAM if vocab is None else vocab)
    pmax = max(len(p) for p in vocab)
    ml = int(max_len)

    @F.pandas_udf("struct<pieces:array<string>,n_pieces:int,logp_units:bigint>")
    def seg(ws: pd.Series) -> pd.DataFrame:
        out_pieces: list[list[str]] = []
        out_n: list[int] = []
        out_lp: list[int | None] = []
        for w in ws:
            toks, n_toks, score = _viterbi_one(w, vocab, ml, pmax)
            out_pieces.append(toks)
            out_n.append(n_toks)
            out_lp.append(score)
        return pd.DataFrame(
            {
                "pieces": out_pieces,
                "n_pieces": pd.array(out_n, dtype="int32"),
                "logp_units": pd.array(out_lp, dtype="Int64"),
            }
        )

    out = words.withColumn("_seg", seg(F.col(word_col)))
    return out.select(
        "*",
        F.col("_seg.pieces").alias("pieces"),
        F.col("_seg.n_pieces").alias("n_pieces"),
        F.col("_seg.logp_units").alias("logp_units"),
    ).drop("_seg")


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
