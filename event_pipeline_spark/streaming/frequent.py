"""Streaming Misra–Gries heavy hitters: bounded state on a live stream.

The 24/7 form of ``operators/frequent.py`` — an exact streaming
``GROUP BY item`` keeps state per DISTINCT item (unbounded on n-gram
/ URL domains); weighted Misra–Gries keeps at most ``capacity``
counters per shard with the same deterministic guarantee as the batch
operator: a counter undercounts its item's true in-shard count by at
most ``n_shard / (capacity + 1)``.

Sharding: items hash-route to a fixed shard grid (the stream's
groupBy key), each shard owning a DISJOINT item set — so per-shard
guarantees compose into the global one without any cross-shard merge,
and state is ``shards × capacity`` counters TOTAL regardless of
stream length (the `streaming/cusum.py` bounded-state discipline,
here as one MapState per shard plus one processed-count scalar).

Each micro-batch emits the shard's full current summary stamped with
``n`` (rows processed so far) — the changelog a monitoring sink
overwrites per shard; the latest emission per shard IS the summary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUMMARY_SCHEMA = "shard int, item string, est long, n long"


def _make_mg_processor(capacity: int):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MisraGries(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._m = handle.getMapState(
                "m", "item string", "c long"
            )
            self._n = handle.getValueState("n", "n long")

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            incoming = (
                pd.concat(batches)["item"].value_counts().sort_index()
            )
            d: dict[str, int] = {
                k[0]: int(v[0]) for k, v in self._m.iterator()
            }
            n = int(self._n.get()[0]) if self._n.exists() else 0
            n += int(incoming.sum())
            # weighted Misra-Gries: add, then decrement-all by the
            # minimum counter whenever the table overflows
            for item, c in incoming.items():
                d[item] = d.get(item, 0) + int(c)
                if len(d) > capacity:
                    m = min(d.values())
                    d = {i: v - m for i, v in d.items() if v > m}
            for k_ in list(self._m.keys()):
                if k_[0] not in d:
                    self._m.removeKey(k_)
            for item, v in d.items():
                self._m.updateValue((item,), (int(v),))
            self._n.update((int(n),))
            yield pd.DataFrame(
                sorted((int(key[0]), i, v, n) for i, v in d.items()),
                columns=["shard", "item", "est", "n"],
            )

        def close(self) -> None:
            pass

    return MisraGries()


def streaming_frequent(
    stream: DataFrame,
    item_col: str,
    *,
    shards: int = 8,
    capacity: int = 32,
) -> DataFrame:
    """Per-shard Misra-Gries summaries of ``item_col`` (see module
    doc). Guarantee per item: ``true_shard_count - est <=
    n_shard // (capacity + 1)`` and est never exceeds the true count.
    """
    from event_pipeline_spark.streaming.stateful import (
        transform_with_state,
    )

    keyed = stream.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(shards))
        .cast("int")
        .alias("shard"),
        F.col(item_col).cast("string").alias("item"),
    )
    return transform_with_state(
        keyed,
        ["shard"],
        _make_mg_processor(capacity),
        SUMMARY_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
