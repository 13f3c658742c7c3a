"""Corpus quality filtering + PII handling for LLM-data pipelines.

Two first-class training-data operators (north-star surface, no
reference counterpart — the reference stops at generic event filtering,
``nexus/result.py`` lookup filters):

1. **Gopher-style quality rules** (Rae et al. 2021, table A1 subset):
   word-count bounds, mean word length, symbol-to-word ratio, bullet-line
   ratio, stopword presence. Each rule is one JVM built-in expression —
   a 100 TB corpus pays one scan, no Python, no shuffle (narrow
   projection; the filter composes with any downstream operator).

2. **PII detect / redact**: email, IPv4, SSN-style ids, international
   phone-ish numbers as count columns (audit) and a redaction pass that
   replaces matches with typed placeholders (``[EMAIL]``...). Patterns
   stay inside the Java/RE2 common regex subset so the same semantics
   run on Spark and the DuckDB oracle (no lookaround, no backrefs).

Registered queries (driver-checkable):
- ``quality_gopher`` [oracle] per-doc rule flags + pass verdict
- ``pii_scan``       [oracle] per-doc PII hit counts on the derived fixture
- ``pii_redact``     [oracle] md5 + length of redacted text (proves the
  rewrite without shipping full documents through the comparator)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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


# ---------------------------------------------------------------------------
# Gopher-style quality rules
# ---------------------------------------------------------------------------

#: thresholds (word bounds scaled to the synthetic corpus; the classic
#: paper uses 50..100k for web documents)
MIN_WORDS = 20
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_RATIO = 0.9
MIN_STOPWORD_HITS = 2

#: the classic "required stopwords" set
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def word_tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def quality_components(col: Column) -> dict[str, Column]:
    """The raw per-document quality measurements, each one expression."""
    toks = word_tokens(col)
    n_words = F.size(toks)
    # total word chars / word count (whitespace stripped, not collapsed)
    mean_word_len = F.length(F.regexp_replace(col, r"\s", "")).cast(
        "double"
    ) / n_words
    symbol_hits = F.regexp_count(col, F.lit(r"#|\.\.\."))
    lines = F.split(col, r"\n")
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    )
    stopword_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": symbol_hits.cast("double") / n_words,
        "bullet_line_ratio": bullet_lines.cast("double") / F.size(lines),
        "stopword_hits": stopword_hits,
    }


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_stopword_hits: int = MIN_STOPWORD_HITS,
) -> DataFrame:
    """Append rule flags + an overall ``passes_quality`` verdict.

    ``min_stopword_hits`` is the one threshold callers routinely
    calibrate per corpus (Gopher's own value assumes English web text;
    ``stopword_hits`` counts DISTINCT stopwords present, so a synthetic
    or non-English corpus may max out below the default)."""
    c = quality_components(F.col(text_col))
    flags = {
        "word_count_ok": (c["n_words"] >= MIN_WORDS)
        & (c["n_words"] <= MAX_WORDS),
        "mean_word_len_ok": (c["mean_word_len"] >= MIN_MEAN_WORD_LEN)
        & (c["mean_word_len"] <= MAX_MEAN_WORD_LEN),
        "symbol_ratio_ok": c["symbol_word_ratio"] <= MAX_SYMBOL_WORD_RATIO,
        "bullet_ratio_ok": c["bullet_line_ratio"] <= MAX_BULLET_LINE_RATIO,
        "stopwords_ok": c["stopword_hits"] >= min_stopword_hits,
    }
    out = df
    for name, col in {**c, **flags}.items():
        out = out.withColumn(name, col)
    verdict = F.lit(True)
    for col in flags.values():
        verdict = verdict & col
    return out.withColumn("passes_quality", verdict)


# ---------------------------------------------------------------------------
# repetition rules (the other half of the Gopher filter set)
# ---------------------------------------------------------------------------

MAX_DUP_LINE_FRACTION = 0.30
MAX_TOP_BIGRAM_FRACTION = 0.20


def dup_line_fraction(col: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line."""
    lines = F.split(col, r"\n")
    return (
        (F.size(lines) - F.size(F.array_distinct(lines))).cast("double")
        / F.size(lines)
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc repetition measurements: duplicate-line fraction and the
    share of all token bigrams taken by the most frequent one.

    The bigram share uses the explode→count→max shape (one shuffle on
    (doc, gram) — the scalable form; an in-array histogram would be an
    interpreted HOF over every token). Output keeps ``id_col`` plus the
    two fractions rounded to 6dp."""
    from pyspark.ml.feature import NGram

    toks = df.select(
        id_col, F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__t")
    )
    grams = NGram(n=2, inputCol="__t", outputCol="__g").transform(toks)
    exploded = grams.select(id_col, F.explode("__g").alias("g"))
    top_share = (
        exploded.groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.round(
                F.max("c").cast("double") / F.sum("c"), 6
            ).alias("top_bigram_fraction")
        )
    )
    dlf = df.select(
        id_col,
        F.round(dup_line_fraction(F.col(text_col)), 6).alias(
            "dup_line_fraction"
        ),
    )
    return dlf.join(top_share, id_col, "left").select(
        id_col,
        "dup_line_fraction",
        F.coalesce("top_bigram_fraction", F.lit(0.0)).alias(
            "top_bigram_fraction"
        ),
    )


# ---------------------------------------------------------------------------
# text cleaning (normalization pass before dedup/quality)
# ---------------------------------------------------------------------------


def clean_text(col: Column) -> Column:
    """Standard corpus normalization: strip control chars (keep \\n\\t),
    collapse horizontal whitespace runs, trim line edges, drop empty
    lines. Pure regexp chain — codegen-fused single pass."""
    c = F.regexp_replace(col, r"[\x00-\x08\x0b-\x1f\x7f]", "")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    return F.trim(c)


# ---------------------------------------------------------------------------
# PII detect / redact (Java ∩ RE2 regex subset)
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}",
}

#: redaction order matters: ssn before phone (overlapping digit shapes),
#: email before ipv4 (domains can contain dotted digits)
REDACTION_ORDER = ("email", "ssn", "phone", "ipv4")


def pii_counts(col: Column) -> dict[str, Column]:
    return {
        name: F.regexp_count(col, F.lit(pat))
        for name, pat in PII_PATTERNS.items()
    }


def pii_detect(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``pii_<kind>`` count columns + ``pii_total``."""
    counts = pii_counts(F.col(text_col))
    out = df
    total = F.lit(0)
    for name, col in counts.items():
        out = out.withColumn(f"pii_{name}", col)
        total = total + col
    return out.withColumn("pii_total", total)


def pii_redact(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Replace every PII match with its typed placeholder. One
    regexp_replace per kind, chained — still a single narrow projection
    (whole-stage codegen fuses the chain)."""
    col = F.col(text_col)
    for name in REDACTION_ORDER:
        col = F.regexp_replace(
            col, PII_PATTERNS[name], f"[{name.upper()}]"
        )
    return df.withColumn(out_col, col)


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    out = gopher_quality(docs)
    return out.select(
        "doc_id",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        "stopword_hits",
        "word_count_ok",
        "mean_word_len_ok",
        "stopwords_ok",
        "passes_quality",
    ).orderBy("doc_id")


_register(
    "quality_gopher",
    q_quality_gopher,
    f"""WITH q AS (
          SELECT doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS n_words,
                 length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE
                     / len(string_split_regex(trim(text), '\\s+')) AS mwl,
                 len(list_intersect(
                     list_transform(string_split_regex(trim(text), '\\s+'),
                                    t -> lower(t)),
                     {list(STOPWORDS)!r})) AS stopword_hits
          FROM documents)
        SELECT doc_id, n_words, ROUND(mwl, 6) AS mean_word_len, stopword_hits,
               n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS} AS word_count_ok,
               mwl BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}
                   AS mean_word_len_ok,
               stopword_hits >= {MIN_STOPWORD_HITS} AS stopwords_ok,
               (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS})
                   AND (mwl BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN})
                   AND stopword_hits >= {MIN_STOPWORD_HITS} AS passes_quality
        FROM q ORDER BY doc_id""",
)


def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition stats over a derived fixture (every 10th doc repeated
    as a second line — the corpus is single-line, so the derivation IS
    the duplicate-line fixture; bigram repetition is natural in the
    synthetic vocabulary)."""
    docs = _docs(spark, sf_dir)
    fixture = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit("\n"), F.col("text")),
        ).otherwise(F.col("text")),
    )
    return repetition_stats(fixture).orderBy("doc_id")


_register(
    "quality_repetition",
    q_quality_repetition,
    """WITH fixture AS (
         SELECT doc_id,
                CASE WHEN doc_id % 10 = 0 THEN text || chr(10) || text
                     ELSE text END AS text
         FROM documents),
       lines AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM fixture),
       dlf AS (
         SELECT doc_id,
                ROUND((len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls), 6)
                    AS dup_line_fraction
         FROM lines),
       toks AS (SELECT doc_id,
                       string_split_regex(lower(trim(text)), '\\s+') AS t
                FROM fixture),
       grams AS (
         SELECT doc_id, unnest(list_transform(
             generate_series(1, greatest(len(t) - 1, 0)),
             i -> array_to_string(t[i:i+1], ' '))) AS g
         FROM toks),
       counts AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g),
       tbf AS (SELECT doc_id, ROUND(MAX(c)::DOUBLE / SUM(c), 6)
                   AS top_bigram_fraction
               FROM counts GROUP BY doc_id)
       SELECT d.doc_id, d.dup_line_fraction,
              COALESCE(t.top_bigram_fraction, 0.0) AS top_bigram_fraction
       FROM dlf d LEFT JOIN tbf t USING (doc_id) ORDER BY doc_id""",
)


def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_text over a derived dirty fixture (doubled spaces, leading
    whitespace, a control char) — verified by md5+length of the cleaned
    output on both engines."""
    docs = _docs(spark, sf_dir)
    dirty = F.concat(
        F.lit("  "),
        F.regexp_replace(F.col("text"), " ", "  "),
        F.lit("\x07"),
    )
    return docs.select(
        "doc_id",
        F.md5(clean_text(dirty)).alias("cleaned_md5"),
        F.length(clean_text(dirty)).alias("cleaned_len"),
    ).orderBy("doc_id")


_CLEAN_SQL = (
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "'  ' || replace(text, ' ', '  ') || chr(7), "
    "'[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g'), "
    "'[ \\t]+', ' ', 'g'), "
    "' ?\\n ?', chr(10), 'g'), "
    "'\\n{2,}', chr(10), 'g'))"
)

_register(
    "text_clean",
    q_text_clean,
    f"""SELECT doc_id, md5({_CLEAN_SQL}) AS cleaned_md5,
               length({_CLEAN_SQL}) AS cleaned_len
        FROM documents ORDER BY doc_id""",
)


def docs_with_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII fixture: every 20th document gets a synthetic
    contact line appended (the corpus itself is synthetic word soup with
    no PII, so the derivation IS the fixture — mirrored in the oracle)."""
    docs = _docs(spark, sf_dir)
    contact = F.concat(
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".7"),
    )
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 20 == 0, F.concat(F.col("text"), contact))
        .otherwise(F.col("text")),
    )


_PII_FIXTURE_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 20 = 0
                THEN text || ' contact user' || doc_id
                     || '@example.com at 10.0.' || (doc_id % 250) || '.7'
                ELSE text END AS text
    FROM documents
"""


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = pii_detect(docs_with_pii(spark, sf_dir))
    return (
        out.where(F.col("pii_total") > 0)
        .select("doc_id", "pii_email", "pii_ipv4", "pii_total")
        .orderBy("doc_id")
    )


_register(
    "pii_scan",
    q_pii_scan,
    f"""WITH fixture AS ({_PII_FIXTURE_SQL}),
        c AS (
          SELECT doc_id,
                 len(regexp_extract_all(text,
                     '{PII_PATTERNS["email"]}')) AS pii_email,
                 len(regexp_extract_all(text,
                     '{PII_PATTERNS["ipv4"]}')) AS pii_ipv4,
                 len(regexp_extract_all(text,
                     '{PII_PATTERNS["ssn"]}')) AS pii_ssn,
                 len(regexp_extract_all(text,
                     '{PII_PATTERNS["phone"]}')) AS pii_phone
          FROM fixture)
        SELECT doc_id, pii_email, pii_ipv4,
               pii_email + pii_ipv4 + pii_ssn + pii_phone AS pii_total
        FROM c WHERE pii_email + pii_ipv4 + pii_ssn + pii_phone > 0
        ORDER BY doc_id""",
)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = pii_redact(docs_with_pii(spark, sf_dir))
    return out.select(
        "doc_id",
        F.md5("redacted").alias("redacted_md5"),
        F.length("redacted").alias("redacted_len"),
    ).orderBy("doc_id")


_redact_sql = "text"
for _name in REDACTION_ORDER:
    _redact_sql = (
        f"regexp_replace({_redact_sql}, "
        f"'{PII_PATTERNS[_name]}', '[{_name.upper()}]', 'g')"
    )

_register(
    "pii_redact",
    q_pii_redact,
    f"""WITH fixture AS ({_PII_FIXTURE_SQL})
        SELECT doc_id, md5({_redact_sql}) AS redacted_md5,
               length({_redact_sql}) AS redacted_len
        FROM fixture ORDER BY doc_id""",
)


# ---------------------------------------------------------------------------
# Readability scores (round 7): Flesch reading ease / Flesch-Kincaid
# grade — the classic closed-form readability pair, used by public
# corpus-quality reports as a cheap complexity prior (alongside the
# Gopher heuristics above). Syllables use the standard vowel-group
# approximation with the silent-e correction; words and sentences the
# usual regex splits. All counts are integers and the formulas close
# over three exact ratios, so the oracle recomputes everything.
# ---------------------------------------------------------------------------

_VOWEL_GROUP_RE = "[aeiouy]+"
#: silent final e: a lone trailing 'e' after a consonant ("make",
#: "whale") adds a vowel group that is not a spoken syllable
_SILENT_E_RE = "[b-df-hj-np-tv-xz]e( |$)"
_SENTENCE_RE = "[.!?]+"


def readability_components(col: Column) -> dict[str, Column]:
    """Exact integer counts: words, sentences (>= 1 so fragment rows
    divide cleanly), syllables (>= 1 per word)."""
    low = F.lower(col)
    words = F.size(
        F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != "")
    ).cast("long")
    sentences = F.greatest(
        F.regexp_count(col, F.lit(_SENTENCE_RE)), F.lit(1)
    ).cast("long")
    groups = F.regexp_count(low, F.lit(_VOWEL_GROUP_RE))
    silent = F.regexp_count(low, F.lit(_SILENT_E_RE))
    syllables = F.greatest(groups - silent, words).cast("long")
    return {"words": words, "sentences": sentences, "syllables": syllables}


def readability_scores(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, n_sentences, n_syllables, flesch, fk_grade):
    Flesch reading ease 206.835 - 1.015*(W/S) - 84.6*(Syl/W) and
    Flesch-Kincaid grade 0.39*(W/S) + 11.8*(Syl/W) - 15.59, rounded
    to 4; empty documents drop (no words -> no ratio)."""
    c = readability_components(F.col(text_col))
    wps = c["words"] / c["sentences"]
    spw = c["syllables"] / c["words"]
    return (
        df.select(
            F.col(id_col),
            c["words"].alias("n_words"),
            c["sentences"].alias("n_sentences"),
            c["syllables"].alias("n_syllables"),
            F.round(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("flesch"),
            F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
        )
        .where(F.col("n_words") > 0)
    )


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return readability_scores(
        _docs(spark, sf_dir).select("doc_id", "text")
    ).orderBy("doc_id")


_register(
    "text_readability",
    q_text_readability,
    r"""
WITH c AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x != '')) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))
           - len(regexp_extract_all(lower(text),
                                    '[b-df-hj-np-tv-xz]e( |$)')) AS g
  FROM documents)
SELECT doc_id,
       CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(greatest(g, w) AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * (w / CAST(s AS DOUBLE))
             - 84.6 * (greatest(g, w) / CAST(w AS DOUBLE)), 4) AS flesch,
       round(0.39 * (w / CAST(s AS DOUBLE))
             + 11.8 * (greatest(g, w) / CAST(w AS DOUBLE)) - 15.59, 4)
           AS fk_grade
FROM c WHERE w > 0
ORDER BY doc_id
""",
)
