"""Streaming exact document dedup: first occurrence EVER wins.

The batch operator (``operators/dedup.py::dedup_exact``) keeps one
representative per exact text within a corpus snapshot; on a 24/7
ingest the "have I seen this document" memory must persist across
micro-batches. This completes the batch↔streaming dedup matrix —
exact / line-level / near-dup each now have both forms
(``dedup_exact`` ↔ here, ``dedup_lines`` ↔ ``linededup.py``,
``minhash_near_duplicates`` ↔ ``neardedup.py``).

Design: key the stateful operator on ``md5(text)`` so only a 32-char
digest is shuffled and stored — the document body rides along in the
same row (one row per doc, no re-join needed to emit survivors), and
state is ONE boolean per distinct digest, the exact-doc analogue of
the line dedup's seen-set. ``state_ttl_ms`` bounds retention when
"seen" should expire (a duplicate then recurs once per TTL window,
the standard trade).

Within a micro-batch the winner among equal texts is the batch's
first-delivered copy (micro-batch arrival carries no total order
across documents — same contract as the other streaming dedups);
across batches, state guarantees earlier batches always win.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SURVIVOR_SCHEMA = "docid long, text string"


def _make_doc_processor(state_ttl_ms: int | None):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SeenDocs(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "v boolean", ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._seen.exists():
                return
            first = None
            for pdf in rows:
                if len(pdf) and first is None:
                    first = (int(pdf["docid"].iloc[0]), pdf["text"].iloc[0])
            if first is not None:
                self._seen.update((True,))
                yield pd.DataFrame(
                    {"docid": [first[0]], "text": [first[1]]}
                )

        def close(self) -> None:
            pass

    return SeenDocs()


def streaming_dedup_exact(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Surviving documents of a stream (see module doc): one row
    ``(docid, text)`` per first-ever-seen exact text."""
    from event_pipeline_spark.streaming.stateful import transform_with_state

    keyed = stream.select(
        F.col(id_col).alias("docid"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("_h"),
    )
    return transform_with_state(
        keyed,
        ["_h"],
        _make_doc_processor(state_ttl_ms),
        SURVIVOR_SCHEMA,
        output_mode="Append",
        time_mode="ProcessingTime" if state_ttl_ms else "None",
    )
