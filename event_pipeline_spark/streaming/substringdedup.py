"""Streaming substring-window dedup: first-seen span EVER wins.

The batch operator (``operators/substrings.py::dedup_substring_spans``)
excises repeated >=``window``-token spans within one corpus snapshot;
on a 24/7 ingest the "have I seen this window" memory must persist
across micro-batches. This closes the last cell of the granularity ×
mode dedup matrix — document / line / substring-span / near-dup each
now have both batch and streaming forms (``exactdedup.py``,
``linededup.py``, here, ``neardedup.py``).

Design: every document emits one row per token position, keyed on the
md5 of its ``window``-token sliding window — state is ONE boolean per
distinct digest, the exact ``exactdedup.py`` ValueState shape, so the
state store holds 16-byte keys + a flag no matter how long the spans
are. A position row whose digest was seen in an earlier batch (or
earlier in this batch under the same key) is emitted as a DUPLICATE
span start; the document's text rides its position-0 row only (one
copy per doc, the ``exactdedup`` posture), re-emitted as a ``doc``
row so the foreachBatch side has everything it needs.

Reassembly is split out of the stateful part (the slim near-dedup /
line-dedup posture): ``excise_batch`` merges each batch's duplicate
starts into maximal intervals and rebuilds texts with the SAME shared
JVM-expression path the batch operator uses
(``operators/substrings.py::excise_duplicate_spans``).

Within a micro-batch the surviving copy of a new span is the batch's
first-delivered one (micro-batch arrival carries no total order —
same contract as every streaming dedup here); across batches, state
guarantees earlier batches always win. ``state_ttl_ms`` bounds
retention when "seen" should expire (a span then recurs once per TTL
window, the standard trade).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ``kind`` is 'doc' (text rides along, once per document) or 'dup'
#: (a duplicate window start to excise)
OUT_SCHEMA = "kind string, docid long, s int, text string"


def _make_window_processor(state_ttl_ms: int | None):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SeenWindows(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "v boolean", ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            first_here = not self._seen.exists()
            kinds, ids, starts, texts = [], [], [], []
            for pdf in rows:
                for d, s, t in zip(pdf["docid"], pdf["s"], pdf["text"]):
                    if t is not None:  # position-0 carrier row
                        kinds.append("doc")
                        ids.append(int(d))
                        starts.append(-1)
                        texts.append(t)
                    if first_here:
                        first_here = False  # this copy survives
                    else:
                        kinds.append("dup")
                        ids.append(int(d))
                        starts.append(int(s))
                        texts.append(None)
            self._seen.update((True,))
            if kinds:
                yield pd.DataFrame(
                    {
                        "kind": kinds,
                        "docid": ids,
                        "s": starts,
                        "text": texts,
                    }
                )

        def close(self) -> None:
            pass

    return SeenWindows()


def streaming_dedup_substrings(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Mixed ``doc``/``dup`` rows of a document stream (see module
    doc): feed each micro-batch to ``excise_batch`` to materialize the
    surviving texts. Documents shorter than ``window`` tokens emit no
    windows and bypass state entirely (kept whole, like the batch
    operator)."""
    from event_pipeline_spark.streaming.stateful import transform_with_state

    docs = stream.select(
        F.col(id_col).alias("docid"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
        F.col(text_col).alias("text"),
    )
    from event_pipeline_spark.operators.substrings import window_fps

    n = F.size("_toks")
    wins = docs.where(n >= window).select(
        "docid",
        F.posexplode(window_fps("_toks", window)).alias("s", "_h"),
        "text",
    )
    keyed = wins.select(
        "docid",
        "s",
        "_h",
        F.when(F.col("s") == 0, F.col("text")).alias("text"),
    )
    deduped = transform_with_state(
        keyed,
        ["_h"],
        _make_window_processor(state_ttl_ms),
        OUT_SCHEMA,
        output_mode="Append",
        time_mode="ProcessingTime" if state_ttl_ms else "None",
    )
    short = docs.where(n < window).select(
        F.lit("doc").alias("kind"),
        "docid",
        F.lit(-1).alias("s"),
        "text",
    )
    return deduped.unionByName(short)


def excise_batch(
    batch_df: DataFrame,
    *,
    window: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """foreachBatch helper: (id, text, n_tokens, n_kept) per document
    with every token inside a duplicate interval removed — the shared
    batch excise path over this batch's ``doc``/``dup`` rows.
    Documents losing every token vanish (n_kept would be 0)."""
    from event_pipeline_spark.operators.substrings import (
        excise_duplicate_spans,
    )

    docs = batch_df.where(F.col("kind") == "doc").select(
        F.col("docid").alias("_id"),
        F.split(F.trim("text"), r"\s+").alias("_toks"),
    )
    dup = batch_df.where(F.col("kind") == "dup").select(
        F.col("docid").alias("_id"), F.col("s").alias("_s")
    )
    return excise_duplicate_spans(docs, dup, window=window, id_col=id_col)
