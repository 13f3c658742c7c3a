"""Streaming corpus curation: the 24/7-ingest sibling of
``operators/curate.py`` — quality gate → benchmark decontamination →
cross-batch exact dedup, composed over a micro-batch stream.

Stage placement follows what each stage NEEDS:

- the quality gate is stateless (pure expressions — the same
  ``gopher_quality`` flags the batch pipeline applies), so it runs
  first and cheapest;
- decontamination is stateless too: the benchmark gram-hash set is a
  bounded literal (benchmark-side-only, the ``decontam.py`` bloom
  precedent — it is the EVAL set that is small, never the corpus), so
  membership is one ``arrays_overlap`` against the doc's own gram
  array — no join, no state;
- exact dedup is the only stateful stage (one boolean per md5 digest,
  ``streaming/exactdedup.py``) and runs LAST so state is only charged
  for documents that already passed the filters.

The batch pipeline's budget-selection stage has no streaming analogue
by design: "keep the best documents under a global token budget" is a
corpus-level decision — on a stream it degenerates to a single-key
running counter (a throughput bottleneck AND wrong semantics, since
early junk would exhaust the budget before better documents arrive).
Budgeting belongs to the periodic batch compaction over the curated
store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from event_pipeline_spark.operators.decontam import DEFAULT_N
from event_pipeline_spark.operators.filtering import gopher_quality
from event_pipeline_spark.streaming.exactdedup import streaming_dedup_exact


def _gram_hashes_expr(text_col: Column, n: int) -> Column:
    """Array of md5 hashes of the doc's space-joined lowercase word
    n-grams — the expression form of ``decontam._gram_hashes`` (same
    gram strings, same hashes), usable on a stream without a join."""
    from event_pipeline_spark.operators.text import bind

    # bind(): evaluate the split once, not once per gram (text.bind)
    return bind(
        F.split(F.lower(F.trim(text_col)), r"\s+"),
        lambda toks: F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.md5(F.array_join(F.slice(toks, i, n), " ")),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def streaming_curate(
    stream: DataFrame,
    *,
    bench_gram_hashes: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    min_stopword_hits: int = 1,
    n: int = DEFAULT_N,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Curated survivors ``(docid, text)`` of a document stream: passes
    the quality gate, shares no ``n``-gram with the benchmark set, and
    is the first-ever occurrence of its exact text."""
    gated = (
        gopher_quality(
            stream, text_col=text_col, min_stopword_hits=min_stopword_hits
        )
        .filter("passes_quality")
        .select(id_col, text_col)
    )
    clean = gated.filter(
        ~F.arrays_overlap(
            _gram_hashes_expr(F.col(text_col), n),
            F.lit(bench_gram_hashes).cast("array<string>"),
        )
    )
    return streaming_dedup_exact(
        clean, id_col=id_col, text_col=text_col, state_ttl_ms=state_ttl_ms
    )
