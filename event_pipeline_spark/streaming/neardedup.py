"""Streaming near-duplicate detection: the MinHash-LSH banded index
lives IN the state store, so every micro-batch is checked against the
entire corpus seen so far without re-reading or re-shingling it.

This composes the repo's two scale pillars: the batch incremental flow
(``operators/dedup.py::minhash_cross_near_duplicates``) re-bands or
re-loads the standing corpus per ingest; here the index is Spark
state — ``transformWithStateInPandas`` keyed on the LSH bucket
``(band, bh)``, each bucket holding a ``ListState`` of the documents
that ever hashed into it. A new document shuffles only its own
``bands`` narrow rows to the buckets it lands in; candidate
verification (exact Jaccard) happens inside the bucket against only
that bucket's residents. State is RocksDB-backed — a billion-document
index never touches the driver.

Cost contract: each document's shingle set is stored once per band
(``bands``× duplication) so verification is bucket-local. For corpora
where that is too fat, the SLIM variant below
(``streaming_near_dedup_slim`` + ``make_slim_verifier``) keeps only
bare resident ids in state — ``bands`` longs per document instead of
``bands`` shingle sets — emits CANDIDATE pairs plus one registration
row (id, shingles) per document from its band-0 bucket, and verifies
exact Jaccard in ``foreachBatch`` against a persisted shingle store
that the same ``foreachBatch`` maintains. Same topology, one extra
join; at a 24/7 100 TB stream, state size is the binding constraint
and shingles become a disk-resident table instead of state.

Output rows are VERIFIED pairs ``(id_a, id_b, jaccard)`` with
``id_a < id_b``; a pair sharing several bands is emitted by each, so
downstream consumers de-duplicate (streaming ``dropDuplicates`` on the
pair key, or per-batch distinct in ``foreachBatch``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEAR_DEDUP_SCHEMA = "id_a long, id_b long, jaccard double"


def _make_bucket_processor(threshold: float, state_ttl_ms: int | None):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class BucketIndex(StatefulProcessor):
        """Per-LSH-bucket resident list + exact verification."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._residents = handle.getListState(
                "residents", "id long, sh array<string>",
                ttlDurationMs=state_ttl_ms,
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            existing = [
                (int(rid), set(sh)) for rid, sh in self._residents.get()
            ]
            out_a, out_b, out_j = [], [], []
            fresh: list[tuple[int, list[str]]] = []
            seen_ids = {rid for rid, _ in existing}
            for pdf in rows:
                for rid, sh in zip(pdf["docid"], pdf["sh"]):
                    rid = int(rid)
                    if rid in seen_ids:
                        continue  # replays/duplicate band rows are no-ops
                    sh_set = set(sh)
                    for oid, osh in existing:
                        inter = len(sh_set & osh)
                        if not inter:
                            continue
                        j = inter / (len(sh_set) + len(osh) - inter)
                        if j >= threshold:
                            out_a.append(min(rid, oid))
                            out_b.append(max(rid, oid))
                            out_j.append(round(j, 6))
                    existing.append((rid, sh_set))
                    seen_ids.add(rid)
                    fresh.append((rid, list(sh)))
            for rid, sh in fresh:
                self._residents.appendValue((rid, sh))
            if out_a:
                yield pd.DataFrame(
                    {"id_a": out_a, "id_b": out_b, "jaccard": out_j}
                )

        def close(self) -> None:
            pass

    return BucketIndex()


def _banded_with_shingles(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """``(band, bh, docid, sh)`` rows: the LSH bucket key per band plus
    the shingle payload for in-bucket verification. Same signature and
    banding math as the batch index (dedup.py::_banded_signatures),
    inlined so the shingle column survives the explode — a stream-stream
    self-join would need watermark bookkeeping for no gain. Payload
    columns use bare names: the state-v2 Arrow serializer positionally
    renames leading-underscore non-key columns (observed: _id -> _0)."""
    from event_pipeline_spark.operators.dedup import (
        minhash_signature,
        shingles,
    )

    rows = num_hashes // bands
    sig = docs.select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), k_shingle).alias("_sh"),
        minhash_signature(F.col(text_col), num_hashes, k_shingle).alias(
            "_sig"
        ),
    )
    return sig.select(
        F.col("_id").alias("docid"),
        F.col("_sh").alias("sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.slice("_sig", b * rows + 1, rows).cast(
                                    "array<string>"
                                ),
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bucket"),
    ).select("docid", "sh", "_bucket.band", "_bucket.bh")


def streaming_near_dedup(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    k_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Verified near-duplicate pairs of a streaming document source
    against everything previously streamed (and within each batch).

    Pipeline: Arrow-batched MinHash signatures → explode to narrow
    ``(band, bh, id, shingles)`` rows → ``transformWithStateInPandas``
    keyed on the bucket. Requires the RocksDB state store provider and
    an update/append output mode on the writer.

    ``state_ttl_ms`` bounds retention: bucket residents expire after
    the window, so documents only dedupe against the last N
    hours/days of the stream — the production posture when the index
    must not grow forever (requires ``timeMode=ProcessingTime``; the
    writer then keeps scheduling timer batches, so pair output should
    be consumed continuously rather than via availableNow).
    """
    from event_pipeline_spark.streaming.stateful import transform_with_state

    rows = _banded_with_shingles(
        stream.select(
            F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
        ),
        "__id",
        "__text",
        k_shingle,
        num_hashes,
        bands,
    )
    return transform_with_state(
        rows,
        ["band", "bh"],
        _make_bucket_processor(threshold, state_ttl_ms),
        NEAR_DEDUP_SCHEMA,
        output_mode="Update",
        time_mode="ProcessingTime" if state_ttl_ms else "None",
    )


# -- slim-state variant ------------------------------------------------------

#: kind 0 = registration (id_b = doc id, sh = shingles; one per doc,
#: emitted by its band-0 bucket); kind 1 = candidate (id_a < id_b)
SLIM_SCHEMA = "kind int, id_a long, id_b long, sh array<string>"


def _make_slim_processor(state_ttl_ms: int | None):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SlimBucketIndex(StatefulProcessor):
        """Bucket state = bare resident ids; candidates out, no
        verification here (that needs shingles, which live in the
        corpus store, not in state)."""

        #: asserted by tests: the whole per-resident state row is one long
        STATE_SCHEMA = "id long"

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._residents = handle.getListState(
                "resident_ids", self.STATE_SCHEMA, ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            band = int(key_tuple[0])
            existing = [int(r[0]) for r in self._residents.get()]
            seen = set(existing)
            kind, out_a, out_b, out_sh = [], [], [], []
            fresh: list[int] = []
            for pdf in rows:
                for rid, sh in zip(pdf["docid"], pdf["sh"]):
                    rid = int(rid)
                    if rid in seen:
                        continue  # replayed band row
                    for oid in existing:
                        kind.append(1)
                        out_a.append(min(rid, oid))
                        out_b.append(max(rid, oid))
                        out_sh.append(None)
                    if band == 0:
                        # exactly one registration per doc: every doc
                        # has exactly one band-0 bucket row
                        kind.append(0)
                        out_a.append(None)
                        out_b.append(rid)
                        out_sh.append(list(sh))
                    existing.append(rid)
                    seen.add(rid)
                    fresh.append(rid)
            for rid in fresh:
                self._residents.appendValue((rid,))
            if kind:
                yield pd.DataFrame(
                    {"kind": kind, "id_a": out_a, "id_b": out_b,
                     "sh": out_sh}
                )

        def close(self) -> None:
            pass

    return SlimBucketIndex()


def streaming_near_dedup_slim(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Candidate/registration stream of the slim-state near-dedup.

    Pair it with ``make_slim_verifier(store_path, threshold)`` as the
    ``foreachBatch`` body; that closure verifies candidates by exact
    Jaccard against the persisted shingle store and keeps the store
    up to date. Output rows follow ``SLIM_SCHEMA``.
    """
    rows = _banded_with_shingles(
        stream.select(
            F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
        ),
        "__id",
        "__text",
        k_shingle,
        num_hashes,
        bands,
    )
    from event_pipeline_spark.streaming.stateful import transform_with_state

    return transform_with_state(
        rows,
        ["band", "bh"],
        _make_slim_processor(state_ttl_ms),
        SLIM_SCHEMA,
        output_mode="Update",
        time_mode="ProcessingTime" if state_ttl_ms else "None",
    )


def slim_verify_batch(
    batch_df: DataFrame, store_path: str, threshold: float
) -> DataFrame:
    """One micro-batch of the slim flow: verify candidate pairs by
    exact Jaccard against the shingle store ∪ this batch's
    registrations, then append the registrations to the store.

    Returns the verified ``(id_a, id_b, jaccard)`` rows, materialized
    executor-side (persist + count — the store read must happen before
    the append, and pairs must never round-trip the driver).
    Replay-safe: the store is read through ``dropDuplicates(id)``, so
    a re-run batch re-appending its registrations cannot double-count;
    route the returned pairs to an idempotent sink (e.g.
    ``streaming/sinks.py``'s batch_id-partitioned exactly-once sink).
    """
    from event_pipeline_spark.operators.dedup import jaccard

    spark = batch_df.sparkSession
    regs = batch_df.where(F.col("kind") == 0).select(
        F.col("id_b").alias("id"), "sh"
    )
    cands = (
        batch_df.where(F.col("kind") == 1)
        .select("id_a", "id_b")
        .distinct()  # a pair sharing several bands is emitted per band
    )
    from pyspark.errors import AnalysisException

    try:
        store = spark.read.parquet(store_path).select("id", "sh")
    except AnalysisException as exc:
        # Only the missing-path case means "first batch, empty store";
        # corrupt files / IO / permission errors must propagate, or
        # candidate pairs whose partner lives only in the store would
        # be silently dropped by the join below.
        if "PATH_NOT_FOUND" not in str(exc):
            raise
        store = spark.createDataFrame([], "id long, sh array<string>")
    lookup = store.unionByName(regs).dropDuplicates(["id"])
    verified = (
        cands.join(
            lookup.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            lookup.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .persist()
    )
    verified.count()  # pin BEFORE the store append mutates the input
    regs.write.mode("append").parquet(store_path)
    return verified


def make_slim_verifier(
    store_path: str, threshold: float, sink
) -> "callable":
    """``foreachBatch`` closure: ``sink(verified_df, batch_id)``."""

    def _verify(batch_df: DataFrame, batch_id: int) -> None:
        out = slim_verify_batch(batch_df, store_path, threshold)
        try:
            sink(out, batch_id)
        finally:
            out.unpersist(blocking=False)

    return _verify
