"""Text-analysis operators for LLM-data pipelines (north-star surface).

All hot-path expressions are JVM built-ins (split/regexp/length/xxhash64)
— no Python in the row path, whole-stage codegen end to end, so a 100 TB
corpus is one scan + narrow projections. Language ID is the one
heuristic that profits from declarative scoring: stopword-hit counts per
language computed as array intersections against broadcast literals.

Registered queries (driver-checkable):
- ``text_tokens``       [oracle] token counts per doc
- ``text_punct_stats``  [oracle] per-language punctuation/char stats
- ``text_fingerprint``  [oracle] normalized-text fingerprint duplicates
- ``text_quality``      [oracle] length/word-ratio quality components
- ``text_lang_id``      rows-only (heuristic; accuracy asserted in tests)
- ``text_segments_udtf`` [oracle] word-window segmentation via a Python
  UDTF in a LATERAL join (the table-function member of the UDF surface)
"""

from __future__ import annotations

import functools as _functools

import pandas as pd
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
# building blocks
# ---------------------------------------------------------------------------


def bind(expr: Column, body) -> Column:
    """Evaluate ``expr`` ONCE per row and hand it to ``body`` as a bound
    lambda variable.

    Catalyst performs no common-subexpression elimination across
    higher-order-function lambda scopes: an array expression referenced
    inside ``F.transform(..., lambda i: F.slice(arr_expr, i, n))`` is
    RE-EVALUATED at every element, turning every windowed n-gram/
    fingerprint builder quadratic in document length (measured 27× on
    2000-token docs; 21× on the winnow selection at sf0.1). Wrapping the
    body as ``bind(arr_expr, lambda a: ...)`` routes all references
    through a NamedLambdaVariable, restoring the linear cost while
    keeping the helper a pure Column → Column expression (no DataFrame
    boundary needed)."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text (array<string>)."""
    return F.split(F.trim(col), r"\s+")


# ---------------------------------------------------------------------------
# Polynomial gram hashing (the winnow/substring-dedup kernel)
#
# The original gram builders re-materialized `md5(array_join(slice(
# toks, i, k), ' '))` at every position — one string join + full md5
# per position, O(n·k) BYTES hashed per document, and the single most
# expensive kernel in the bench. The replacement hashes each TOKEN once
# (md5-low-64, the md5_number_lower portability contract) and combines
# k token residues per position with a dual 31-bit modular Horner fold:
# O(n) md5 calls + O(n·k) bare integer multiply-adds, no per-position
# string materialization.
#
# Why dual 31-bit lanes instead of one mod-2^64 lane: Spark 4 runs ANSI
# mode by default (the driver grades with a vanilla session), where
# BIGINT overflow THROWS instead of wrapping, so Java-wrap mod-2^64
# arithmetic is unavailable. With M < 2^31 every intermediate
# (h*P + r < 2^31·2^20 + 2^31, residue products < 2^62) stays far below
# 2^63 in BOTH engines — no overflow, no HUGEINT needed in DuckDB; the
# two lanes pack into one 62-bit BIGINT fingerprint (collision odds
# ~2^-62 per pair, the same regime as the 64-bit digests it replaces).
# ---------------------------------------------------------------------------

HASH_M1, HASH_P1 = 2147483647, 1000003  # 2^31-1 (Mersenne prime)
HASH_M2, HASH_P2 = 2147483629, 1000033
_POW32_M1 = (1 << 32) % HASH_M1
_POW32_M2 = (1 << 32) % HASH_M2


def token_residues(tok: Column) -> Column:
    """struct(r1, r2): md5-low-64(token) mod (M1, M2), built from the
    two 32-bit halves of the digest's low quadword so no intermediate
    exceeds 2^62 (ANSI-safe). Bit-identical to DuckDB's
    ``md5_number_lower(tok) % M``.

    Both the hex digest and the (hi, lo) halves are ``bind``-ed: the
    digest feeds 8 substring reads and each half feeds both modulus
    lanes, and without the binds Catalyst re-evaluates md5 SIXTEEN
    times per token (no CSE inside lambda scopes — the text.bind rule,
    measured 2.6x on the winnow selection)."""

    def _halves(hx: Column) -> Column:
        # md5_number_lower = int.from_bytes(digest[8:], 'little'):
        # most-significant byte is digest[15] = hex chars 31..32
        hi = F.conv(
            F.concat(*[F.substring(hx, p, 2) for p in (31, 29, 27, 25)]),
            16, 10,
        ).cast("long")
        lo = F.conv(
            F.concat(*[F.substring(hx, p, 2) for p in (23, 21, 19, 17)]),
            16, 10,
        ).cast("long")
        return F.struct(hi.alias("hi"), lo.alias("lo"))

    def _residues(hl: Column) -> Column:
        def _mod(m: int, pow32: int) -> Column:
            return ((hl["hi"] % m) * pow32 + (hl["lo"] % m)) % m

        return F.struct(
            _mod(HASH_M1, _POW32_M1).alias("r1"),
            _mod(HASH_M2, _POW32_M2).alias("r2"),
        )

    return bind(F.md5(tok), lambda hx: bind(_halves(hx), _residues))


def gram_fp(th: Column, i: Column, k: int) -> Column:
    """Packed 62-bit fingerprint of the ``k``-token gram starting at
    1-based position ``i`` of the BOUND residue array ``th`` (bind it —
    an unbound expression re-evaluates per element, see :func:`bind`).
    Positions past the end contribute residue 0, so documents shorter
    than ``k`` tokens still emit one well-defined clamped gram."""
    h1: Column = F.lit(0).cast("long")
    h2: Column = F.lit(0).cast("long")
    for j in range(k):
        r = F.try_element_at(th, i + F.lit(j))
        h1 = (h1 * HASH_P1 + F.coalesce(r["r1"], F.lit(0).cast("long"))) % HASH_M1
        h2 = (h2 * HASH_P2 + F.coalesce(r["r2"], F.lit(0).cast("long"))) % HASH_M2
    return h1 * F.lit(2147483648).cast("long") + h2


def token_residue_array(toks: Column) -> Column:
    """array<struct(r1, r2)> of per-token residues — the production
    form of :func:`token_residues`: three FLAT transform levels (md5
    hexes -> (hi, lo) halves -> residues), each level bound, so there
    are zero per-token ``bind`` wrappers (a per-token bind costs an
    array allocation + interpreted lambda dispatch per token; at 3M
    tokens that overhead dominated the arithmetic)."""

    def _halves(hx: Column) -> Column:
        hi = F.conv(
            F.concat(*[F.substring(hx, p, 2) for p in (31, 29, 27, 25)]),
            16, 10,
        ).cast("long")
        lo = F.conv(
            F.concat(*[F.substring(hx, p, 2) for p in (23, 21, 19, 17)]),
            16, 10,
        ).cast("long")
        return F.struct(hi.alias("hi"), lo.alias("lo"))

    def _res(hl: Column) -> Column:
        def _mod(m: int, pow32: int) -> Column:
            return ((hl["hi"] % m) * pow32 + (hl["lo"] % m)) % m

        return F.struct(
            _mod(HASH_M1, _POW32_M1).alias("r1"),
            _mod(HASH_M2, _POW32_M2).alias("r2"),
        )

    return bind(
        F.transform(toks, F.md5),
        lambda hxs: bind(
            F.transform(hxs, _halves),
            lambda hls: F.transform(hls, _res),
        ),
    )


def _combine_residues(gram_len_b: int):
    """zip_with combiner H_{a+b}[i] = H_a[i]*P^b + H_b[i+a] (mod M per
    lane); a NULL right side (shift past the end) contributes residue
    0 — the zero-padding clamp that keeps short documents defined."""
    pw1 = pow(HASH_P1, gram_len_b, HASH_M1)
    pw2 = pow(HASH_P2, gram_len_b, HASH_M2)

    def f(a: Column, b: Column) -> Column:
        zero = F.lit(0).cast("long")
        r1 = (a["r1"] * pw1 + F.coalesce(b["r1"], zero)) % HASH_M1
        r2 = (a["r2"] * pw2 + F.coalesce(b["r2"], zero)) % HASH_M2
        return F.struct(r1.alias("r1"), r2.alias("r2"))

    return f


def gram_fp_array(th: Column, k: int) -> Column:
    """array<long>: the packed ``k``-gram fingerprint at EVERY start
    position of the BOUND residue array ``th`` (entry i = gram of
    tokens i..i+k-1, zero-padded past the end).

    Built by binary doubling: H_1 = th, H_{2j} = zip_with(H_j,
    shift-j(H_j)), then the set bits of ``k`` combine MSB-first — so a
    window-50 gram costs ~7 flat array passes instead of 50 nested
    per-position steps (the naive unroll is both O(n·k) interpreted
    ops AND an expression tree deep enough to break analysis at
    k=50). Each doubling level is bound because it is referenced
    twice (as the left side and as its own shifted right side).
    Association order does not matter for exact modular arithmetic, so
    the DuckDB oracle keeps the simple per-position Horner replay
    (:func:`gram_fp_sql`) and the values still match bit-for-bit."""
    m = k.bit_length() - 1
    set_bits = [j for j in range(m + 1) if (k >> j) & 1]

    def _shifted(src: Column, by: int) -> Column:
        return F.slice(src, by + 1, F.size(src))

    def finish(levels: dict) -> Column:
        bits = sorted(set_bits, reverse=True)
        expr = levels[bits[0]]
        cur_len = 1 << bits[0]
        for j in bits[1:]:
            expr = F.zip_with(
                expr,
                _shifted(levels[j], cur_len),
                _combine_residues(1 << j),
            )
            cur_len += 1 << j
        return F.transform(
            expr,
            lambda s: s["r1"] * F.lit(2147483648).cast("long") + s["r2"],
        )

    def build(j: int, h_j: Column, levels: dict) -> Column:
        levels = {**levels, j: h_j}
        if j == m:
            return finish(levels)
        nxt = F.zip_with(
            h_j, _shifted(h_j, 1 << j), _combine_residues(1 << j)
        )
        return bind(nxt, lambda c: build(j + 1, c, levels))

    return build(0, th, {})


def window_fp_array(toks: Column, k: int) -> Column:
    """array<long> of the ``k``-token sliding-window fingerprints of a
    token array (one entry per start position, ``max(n-k+1, 1)``
    entries — documents shorter than ``k`` emit one zero-padded
    clamped gram). End-to-end bound pipeline: residues -> doubling
    levels -> packed longs."""
    return bind(
        token_residue_array(toks),
        lambda th: bind(
            gram_fp_array(th, k),
            lambda fps: F.slice(
                fps, 1, F.greatest(F.size(fps) - (k - 1), F.lit(1))
            ),
        ),
    )


def residues_sql(tok: str) -> str:
    """DuckDB replay of :func:`token_residues` (md5_number_lower is
    UBIGINT; mod then cast keeps everything in BIGINT range)."""
    return (
        f"struct_pack(r1 := (md5_number_lower({tok}) % {HASH_M1})::BIGINT,"
        f" r2 := (md5_number_lower({tok}) % {HASH_M2})::BIGINT)"
    )


def gram_fp_sql(th: str, i: str, k: int) -> str:
    """DuckDB replay of the gram fingerprint over a residue list
    ``th`` and 1-based position expression ``i``.

    Small ``k`` unrolls the Horner fold inline; large ``k`` switches to
    ``list_reduce`` over the zero-padded k-slice (the inline nesting is
    ~4 levels per step and DuckDB's binder caps expression recursion at
    128, so k=50 cannot bind unrolled). Both compute the identical
    modular polynomial — exact integer arithmetic is association-free,
    so they also match the Spark side's doubling construction."""
    if k <= 16:
        h1, h2 = "0", "0"
        for j in range(k):
            r1 = f"coalesce({th}[{i}+{j}].r1, 0)"
            r2 = f"coalesce({th}[{i}+{j}].r2, 0)"
            h1 = f"(({h1} * {HASH_P1} + {r1}) % {HASH_M1})"
            h2 = f"(({h2} * {HASH_P2} + {r2}) % {HASH_M2})"
        return f"({h1} * 2147483648 + {h2})"
    zero = "struct_pack(r1 := 0::BIGINT, r2 := 0::BIGINT)"
    # zero-pad the k-slice (slice truncates at the end; Horner over
    # fewer steps is NOT the clamped k-step hash), seed the reduce
    # with a zero accumulator element
    padded = (
        f"list_concat([{zero}], list_concat("
        f"{th}[{i} : {i}+{k - 1}], "
        f"list_transform(generate_series(1, {k} - len({th}[{i} : {i}+{k - 1}])),"
        f" _ -> {zero})))"
    )
    step = (
        "(acc, x) -> struct_pack("
        f"r1 := (acc.r1 * {HASH_P1} + x.r1) % {HASH_M1}, "
        f"r2 := (acc.r2 * {HASH_P2} + x.r2) % {HASH_M2})"
    )
    return (
        f"((list_reduce({padded}, {step})).r1 * 2147483648"
        f" + (list_reduce({padded}, {step})).r2)"
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-ish proxy: count word pieces + punctuation marks separately,
    the standard cheap estimator when no tokenizer model ships with the
    engine. regexp_count is JVM-side."""
    return (
        F.regexp_count(col, F.lit(r"[A-Za-z0-9]+"))
        + F.regexp_count(col, F.lit(r"[^\sA-Za-z0-9]"))
    )


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(
        F.regexp_replace(col, r"[^a-zA-Z0-9 ]", "")
    )


def upper_ratio(col: Column) -> Column:
    return F.when(
        F.length(col) > 0,
        F.length(F.regexp_replace(col, r"[^A-Z]", "")).cast("double")
        / F.length(col),
    ).otherwise(F.lit(0.0))


def normalized_fingerprint(col: Column) -> Column:
    """Document fingerprint: lowercase, collapse whitespace, md5 — the
    canonical near-exact-dup key (case/spacing-insensitive)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def rolling_hash_fingerprint(col: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint: min xxhash64 over character n-grams.
    Robust to small edits at either end; built-ins only (substring via
    transform over a position sequence)."""
    n = F.greatest(F.length(col) - F.lit(window - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.xxhash64(col.substr(i, F.lit(window))),
    )
    return F.array_min(grams)


#: tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "por", "un"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "que"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "ein", "zu"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "为"],
}


def language_scores(col: Column) -> Column:
    """Struct of stopword-hit counts per language. Token-set intersection
    against broadcast literal arrays — one projection, no shuffle."""
    toks = F.transform(tokens(col), F.lower)
    fields = []
    for lang, words in LANG_PROFILES.items():
        hits = F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        # zh rarely whitespace-tokenizes: also count char hits
        if lang == "zh":
            char_hits = sum(
                (F.length(col) - F.length(F.regexp_replace(col, w, "")))
                for w in words
            )
            hits = hits + char_hits
        fields.append(hits.alias(lang))
    return F.struct(*fields)


@_functools.lru_cache(maxsize=1)
def _predict_language_udf():
    profiles = {lang: set(ws) for lang, ws in LANG_PROFILES.items()}

    @F.pandas_udf("string")
    def pred(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = set(t.lower().split())
            best_score, best_lang = 0, "unknown"
            for lang, words in profiles.items():
                score = len(toks & words)
                if lang == "zh":
                    score += sum(t.count(w) for w in words)
                # ties break toward the lexicographically larger lang,
                # matching struct-compare array_max semantics
                if score > best_score or (score == best_score and score > 0
                                          and lang > best_lang):
                    best_score, best_lang = score, lang
            out.append(best_lang)
        return pd.Series(out)

    return pred


def predict_language(col: Column) -> Column:
    """Argmax over the per-language stopword scores.

    Arrow-batched pandas UDF: the pure-Column form (array_max over
    structs referencing the ``language_scores`` struct) inlines the full
    score expression once per language — Catalyst duplicates it 6x and
    every copy re-runs the tokenizer, measured 65s for 5k docs vs ~1s
    here. ``language_scores`` remains the Column form for single-use
    contexts."""
    return _predict_language_udf()(col)


def quality_components(col: Column) -> Column:
    """Quality-score components: length, tokens, mean word length,
    punctuation ratio, uppercase ratio, stopword ratio (en)."""
    n_tok = token_count(col)
    return F.struct(
        F.length(col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        (F.length(col).cast("double") / F.greatest(n_tok, F.lit(1))).alias(
            "chars_per_token"
        ),
        (punct_count(col).cast("double") / F.greatest(F.length(col), F.lit(1))).alias(
            "punct_ratio"
        ),
        upper_ratio(col).alias("upper_ratio"),
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize extreme length, high
    punctuation, shouting. Weights are illustrative; the point is the
    vectorized shape."""
    q = quality_components(col)
    len_ok = F.when(
        (q.getField("n_chars") >= 50) & (q.getField("n_chars") <= 10000), 1.0
    ).otherwise(0.5)
    punct_ok = 1.0 - F.least(q.getField("punct_ratio") * 4, F.lit(1.0))
    upper_ok = 1.0 - F.least(q.getField("upper_ratio") * 5, F.lit(1.0))
    return F.round((len_ok * 0.4 + punct_ok * 0.4 + upper_ok * 0.2), 6)


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace) per document."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", token_count(F.col("text")).alias("n_tokens"))
        .orderBy("doc_id")
    )


_register(
    "text_tokens",
    q_text_tokens,
    """SELECT doc_id,
              CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens
       FROM documents ORDER BY doc_id""",
)


def q_text_punct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language punctuation totals — quality-scoring scaffold."""
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(punct_count(F.col("text"))).cast("long").alias("punct_chars"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


_register(
    "text_punct_stats",
    q_text_punct_stats,
    """SELECT lang,
              CAST(SUM(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS BIGINT) AS punct_chars,
              CAST(SUM(length(text)) AS BIGINT) AS total_chars
       FROM documents GROUP BY lang ORDER BY lang""",
)


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-level duplicate groups (case/whitespace-insensitive)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(normalized_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("docs"))
        .where(F.col("docs") > 1)
        .orderBy(F.desc("docs"), "fp")
    )


_register(
    "text_fingerprint",
    q_text_fingerprint,
    """SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
              COUNT(*) AS docs
       FROM documents GROUP BY fp HAVING COUNT(*) > 1 ORDER BY docs DESC, fp""",
)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality components + composite score per doc."""
    docs = _docs(spark, sf_dir)
    q = quality_components(F.col("text"))
    return docs.select(
        "doc_id",
        q.getField("n_tokens").alias("n_tokens"),
        F.round(q.getField("punct_ratio"), 6).alias("punct_ratio"),
        quality_score(F.col("text")).alias("quality"),
    ).orderBy("doc_id")


_register(
    "text_quality",
    q_text_quality,
    """SELECT doc_id,
              CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens,
              ROUND(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                    / GREATEST(length(text), 1), 6) AS punct_ratio,
              ROUND(
                (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.5 END) * 0.4
                + (1.0 - LEAST(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                               / GREATEST(length(text), 1) * 4, 1.0)) * 0.4
                + (1.0 - LEAST(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
                               / GREATEST(length(text), 1) * 5, 1.0)) * 0.2, 6) AS quality
       FROM documents ORDER BY doc_id""",
)


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID vs ground truth (rows-only check;
    accuracy is asserted in tests/test_text.py)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            "doc_id", "lang", predict_language(F.col("text")).alias("pred")
        )
        .orderBy("doc_id")
    )


def _lang_id_oracle() -> str:
    """Build the DuckDB mirror of ``predict_language`` from the same
    LANG_PROFILES table: per-language distinct-token intersections (plus
    zh per-character counts), argmax with ties to the lexicographically
    larger language, 'unknown' when every score is zero."""
    score_exprs = []
    for lang, words in LANG_PROFILES.items():
        expr = f"len(list_intersect(tk, {list(words)!r}))"
        if lang == "zh":
            char_hits = " + ".join(
                f"(length(text) - length(replace(text, '{w}', '')))"
                for w in words
            )
            expr = f"{expr} + {char_hits}"
        score_exprs.append(f"{expr} AS s_{lang}")
    # lexicographically larger language wins ties: test in DESC name order
    by_name_desc = sorted(LANG_PROFILES, reverse=True)
    cases = " ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in by_name_desc[:-1]
    )
    return f"""WITH toks AS (
         SELECT doc_id, lang, text,
                list_transform(string_split_regex(trim(text), '\\s+'),
                               t -> lower(t)) AS tk
         FROM documents),
       s AS (SELECT doc_id, lang, {", ".join(score_exprs)} FROM toks)
       SELECT doc_id, lang,
              CASE WHEN m = 0 THEN 'unknown' {cases}
                   ELSE '{by_name_desc[-1]}' END AS pred
       FROM (SELECT *, greatest(s_{', s_'.join(LANG_PROFILES)}) AS m FROM s)
       ORDER BY doc_id"""


_register("text_lang_id", q_text_lang_id, _lang_id_oracle())


# ---------------------------------------------------------------------------
# context-window chunking
# ---------------------------------------------------------------------------


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 128,
) -> DataFrame:
    """Split each document into overlapping fixed-width character chunks
    (the pre-tokenization pass that fits documents to a model's context
    window). Adds ``chunk_idx`` and ``chunk`` columns; all other columns
    pass through.

    Chunk *i* covers ``[i*stride, i*stride + chunk_chars)`` with
    ``stride = chunk_chars - overlap``; the final chunk may be shorter,
    and every character belongs to at least one chunk. Entirely JVM
    built-ins (``sequence`` → ``explode`` → ``substring``), so chunking
    a 100 TB corpus is one codegen'd scan with no Python in the row path
    and no shuffle at all — the explode fans out within the input
    partition. Maps the reference's fixed-size chunk iteration
    (nexus/default_batch_processors.py:28-54) from bytes-per-batch onto
    per-document character windows.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    n = F.ceil(
        F.greatest(F.length(text_col) - overlap, F.lit(1)) / float(stride)
    ).cast("int")
    return (
        df.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n - 1)))
        .withColumn(
            "chunk",
            F.expr(
                f"substring({text_col}, chunk_idx * {stride} + 1, {chunk_chars})"
            ),
        )
    )


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk the corpus into 512-char windows with 128 overlap."""
    return (
        chunk_text(_docs(spark, sf_dir))
        .select(
            "doc_id",
            "chunk_idx",
            F.length("chunk").alias("chunk_len"),
            "chunk",
        )
        .orderBy("doc_id", "chunk_idx")
    )


_register(
    "text_chunks",
    q_text_chunks,
    """WITH idx AS (
         SELECT doc_id, text,
                unnest(range(0, CAST(ceil(greatest(length(text) - 128, 1)
                                          / 384.0) AS BIGINT))) AS chunk_idx
         FROM documents)
       SELECT doc_id, chunk_idx,
              length(substring(text, CAST(chunk_idx AS INT) * 384 + 1, 512))
                  AS chunk_len,
              substring(text, CAST(chunk_idx AS INT) * 384 + 1, 512) AS chunk
       FROM idx ORDER BY doc_id, chunk_idx""",
)

# ---------------------------------------------------------------------------
# Python UDTF: word-window segmentation (SURVEY §2.7 — the table-function
# member of the UDF surface; pandas_udf / applyInPandas / mapInPandas are
# exercised elsewhere in operators/)
# ---------------------------------------------------------------------------


@_functools.cache
def _segment_udtf_registered(spark: SparkSession) -> str:
    """Define + register the word-window segmentation UDTF once per
    session.

    A Python UDTF is the one-row→many-rows member of the UDF surface
    (the reference's closest construct: events yielding ResultSets of
    several records, /root/reference/nexus/base.py:553-608). Registered
    with ``useArrow=True`` (r4): rows cross to Python in Arrow batches
    (ArrowEvalPythonUDTF) instead of pickled one at a time; for bulk
    segmentation the codegen split+explode used by ``text_chunks`` is
    still the fast path — this operator exists for API parity and for
    expansions that genuinely need imperative per-row logic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="seg_idx int, segment string", useArrow=True)
    class WordWindowSegment:
        def eval(self, text: str, width: int):
            if text is None:
                return
            words = text.split(" ")
            for i in range(0, len(words), width):
                yield (i // width + 1, " ".join(words[i : i + width]))

    name = "ep_word_window_segment"
    spark.udtf.register(name, WordWindowSegment)
    return name


def q_text_segments_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-word segmentation of a deterministic document subset via a
    LATERAL-joined Python UDTF; DuckDB recomputes with str_split + list
    slices, so the oracle pins both the window arithmetic and the join
    ordinals."""
    fn = _segment_udtf_registered(spark)
    _docs(spark, sf_dir).where(F.col("doc_id") % 4 == 0).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"""SELECT d.doc_id, s.seg_idx, s.segment
            FROM _udtf_docs d, LATERAL {fn}(d.text, 10) s
            ORDER BY d.doc_id, s.seg_idx"""
    )


_register(
    "text_segments_udtf",
    q_text_segments_udtf,
    """WITH parts AS (
         SELECT doc_id, str_split(text, ' ') AS p
         FROM documents WHERE doc_id % 4 = 0),
       segs AS (
         SELECT doc_id, p,
                unnest(generate_series(1, CAST(ceil(len(p) / 10.0) AS BIGINT)))
                    AS seg_idx
         FROM parts)
       SELECT doc_id, CAST(seg_idx AS INT) AS seg_idx,
              array_to_string(list_slice(p, (seg_idx - 1) * 10 + 1,
                                         seg_idx * 10), ' ') AS segment
       FROM segs ORDER BY doc_id, seg_idx""",
)
