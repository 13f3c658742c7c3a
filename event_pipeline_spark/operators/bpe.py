"""BPE tokenizer induction over a corpus: distributed vocabulary
counting + classic byte-pair-merge training.

The shape mirrors how production tokenizer trainers work at scale: the
only corpus-sized work is ONE distributed pass building the
word-frequency table (split → explode → groupBy — map-side partials,
shuffle carries (word, count)); the merge loop then runs on that
bounded vocabulary (a frequency floor and/or top-k cap keeps it
driver-sized — classic BPE operates on the word-freq dict, not the raw
corpus, so a 100 TB corpus trains from the same few-million-row vocab a
100 GB one does). Applying the merges back over the corpus is an
Arrow-batched pandas UDF with a per-word cache and the merge table
broadcast.

Determinism: merge ties (equal pair counts) break on the pair's lexical
order, so the same corpus always yields the same merge sequence — the
property the tests pin.

Registered queries:
- ``bpe_word_vocab`` [oracle] — the distributed word-frequency pass
  (top words by count, exact).
- ``bpe_merges`` — rows-only (iterative driver-side algorithm; DuckDB
  has no analogue); the merge semantics are pytest-pinned instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

#: end-of-word sentinel (classic BPE: lets merges learn suffixes
#: without crossing word boundaries)
EOW = "</w>"


def word_vocab(
    df: DataFrame, text_col: str, *, min_count: int = 1, top_k: int | None = None
) -> DataFrame:
    """The one corpus-sized pass: whitespace word frequencies.
    Returns ``word, count`` with a deterministic total order."""
    words = df.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    counts = (
        words.groupBy("word")
        .agg(F.count("*").alias("count"))
        .where(F.col("count") >= min_count)
        .orderBy(F.desc("count"), "word")
    )
    return counts.limit(top_k) if top_k else counts


def train_bpe(
    vocab: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE on a word-frequency vocabulary: repeatedly merge the
    most frequent adjacent symbol pair (ties → lexically smallest pair).
    ``vocab`` is [(word, count)]; returns the ordered merge list."""
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in vocab
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for symbols, cnt in seqs:
            for a, b in zip(symbols, symbols[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for i, (symbols, cnt) in enumerate(seqs):
            out, j = [], 0
            while j < len(symbols):
                if (
                    j + 1 < len(symbols)
                    and symbols[j] == best[0]
                    and symbols[j + 1] == best[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(symbols[j])
                    j += 1
            seqs[i] = (out, cnt)
    return merges


def train_bpe_distributed(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    *,
    min_count: int = 1,
    top_k: int | None = 50_000,
) -> list[tuple[str, str]]:
    """End-to-end: distributed vocab pass + driver-side merge loop."""
    vocab = [
        (r["word"], r["count"])
        for r in word_vocab(
            df, text_col, min_count=min_count, top_k=top_k
        ).collect()
    ]
    return train_bpe(vocab, num_merges)


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply ranked merges to one word (greedy lowest-rank-first — the
    standard BPE inference)."""
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [
            symbols[best_i] + symbols[best_i + 1]
        ]
    return symbols


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained merge table: Arrow-batched
    pandas UDF, merge ranks broadcast once, per-word memo cache (word
    frequency follows Zipf, so the cache hit rate is high). Returns
    ``id, n_tokens, tokens``."""
    import pandas as pd

    spark = df.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    def run(batches):
        ranks = ranks_bc.value
        cache: dict[str, list[str]] = {}

        def tok(text: str) -> list[str]:
            out: list[str] = []
            for w in (text or "").split():
                if w not in cache:
                    cache[w] = segment_word(w, ranks)
                out.extend(cache[w])
            return out

        for pdf in batches:
            toks = [tok(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_tokens": [len(t) for t in toks],
                    "tokens": toks,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema="id long, n_tokens long, tokens array<string>"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return read_table(spark, sf_dir, "documents")


def q_bpe_word_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus words by frequency — the distributed half of BPE
    training, exact-oracled."""
    return word_vocab(_docs(spark, sf_dir), "text", top_k=100)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 40 BPE merges learned from the corpus vocabulary
    (deterministic: tie-break on lexical pair order). Rows-only — the
    merge loop is iterative driver-side logic with no SQL analogue."""
    merges = train_bpe_distributed(
        _docs(spark, sf_dir), "text", num_merges=40
    )
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).orderBy("rank")


QUERIES["bpe_word_vocab"] = q_bpe_word_vocab
ORACLES["bpe_word_vocab"] = """
    SELECT word, count FROM (
      SELECT u.word AS word, CAST(COUNT(*) AS BIGINT) AS count
      FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word
            FROM documents) u
      WHERE u.word != ''
      GROUP BY u.word
    ) ORDER BY count DESC, word LIMIT 100
"""
QUERIES["bpe_merges"] = q_bpe_merges
