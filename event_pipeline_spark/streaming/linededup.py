"""Streaming C4-style line dedup: first occurrence EVER wins.

The batch operator (``operators/lines.py::dedup_lines``) dedups within
one corpus snapshot; on a 24/7 ingest the "have I seen this line"
memory must persist across micro-batches — exactly a
``transformWithStateInPandas`` ValueState keyed by the trimmed line.
A recurring cookie banner survives its first batch and is dropped
from every later batch without re-reading anything.

State cost: ONE boolean-bearing entry per distinct eligible line —
narrower than any dedup index here (no signatures, no shingles);
``state_ttl_ms`` bounds retention when "seen" should expire (then a
line recurs once per TTL window, the standard trade).

Output rows are the SURVIVING ``(docid, idx, line)`` fragments;
reassembly is a per-batch groupBy in ``foreachBatch``
(``reassemble_batch``) — the same split-the-stateful-part posture as
the slim near-dedup verifier.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SURVIVOR_SCHEMA = "docid long, idx int, line string"


def _make_line_processor(state_ttl_ms: int | None):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SeenLines(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "v boolean", ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            first_here = not self._seen.exists()
            out_d, out_i, out_l = [], [], []
            for pdf in rows:
                for d, i, ln in zip(pdf["docid"], pdf["idx"], pdf["line"]):
                    if first_here:
                        out_d.append(int(d))
                        out_i.append(int(i))
                        out_l.append(ln)
                        first_here = False  # only the batch's first copy
            if out_d:
                self._seen.update((True,))
                yield pd.DataFrame(
                    {"docid": out_d, "idx": out_i, "line": out_l}
                )

        def close(self) -> None:
            pass

    return SeenLines()


def streaming_dedup_lines(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Surviving line fragments of a document stream (see module doc).

    Within a micro-batch the winner among equal lines is one of that
    batch's copies (micro-batch arrival order carries no total order
    across documents — same contract as any streaming dedup);
    across batches, state guarantees earlier batches always win.
    Sub-threshold lines bypass dedup entirely (structure, not content)
    and are emitted as-is.
    """
    from event_pipeline_spark.streaming.stateful import transform_with_state

    lines = stream.select(
        F.col(id_col).alias("docid"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    eligible = lines.where(F.length(F.trim("line")) >= min_line_chars)
    structural = lines.where(F.length(F.trim("line")) < min_line_chars)
    deduped = transform_with_state(
        eligible.withColumn("_k", F.trim("line")),
        ["_k"],
        _make_line_processor(state_ttl_ms),
        SURVIVOR_SCHEMA,
        output_mode="Append",
        time_mode="ProcessingTime" if state_ttl_ms else "None",
    )
    return deduped.unionByName(
        structural.select("docid", "idx", "line")
    )


def reassemble_batch(batch_df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """foreachBatch helper: (id, text, n_kept) from surviving
    fragments, lines back in original order; fully-deduped docs vanish
    (no surviving rows)."""
    return (
        batch_df.groupBy("docid")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "line"))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text"),
        )
        .select(
            F.col("docid").alias(id_col),
            "text",
            F.col("n_kept").cast("int").alias("n_kept"),
        )
    )
