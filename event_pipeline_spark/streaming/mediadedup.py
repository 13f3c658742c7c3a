"""Streaming perceptual media dedup: first-seen SIGNATURE ever wins.

The streaming member of the multimodal dedup family: a 24/7 media
ingest sees the same image or clip again and again as re-encoded,
brightness-shifted, or bit-depth-converted copies whose BYTES differ —
so the exact-payload streaming dedup (``exactdedup.py``) never fires.
Keying state on the perceptual signature (image dHash/pHash —
``operators/imagededup.py``; audio band-energy fingerprint —
``operators/audiodedup.py``) suppresses every later copy whose
signature collides with one already seen.

This is signature-EQUALITY suppression (Hamming distance 0): the
invariances the signatures were built for (brightness, gain,
bit-depth, high-quality JPEG re-encode of continuous-tone content —
all measured hash-identical in the batch tests) are exactly the
replay transforms an ingest pipeline sees. Within-threshold-but-
nonzero pairs remain the batch block-join's job
(``image_near_duplicates`` / ``audio_near_duplicates``) — streaming
state cannot do a pigeonhole join, and a per-key boolean is the only
state shape that stays O(distinct signatures) forever.

State: ONE boolean per 8-byte signature (the ``exactdedup.py``
ValueState shape); each row carries only (media_id, sig) through the
stateful operator — payloads never enter state or the shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SURVIVOR_SCHEMA = "media_id long, sig long"


def _make_sig_processor(state_ttl_ms: int | None):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SeenSignatures(StatefulProcessor):
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
                    first = int(pdf["media_id"].iloc[0])
            if first is not None:
                self._seen.update((True,))
                yield pd.DataFrame(
                    {"media_id": [first], "sig": [int(key[0])]}
                )

        def close(self) -> None:
            pass

    return SeenSignatures()


def streaming_dedup_media(
    stream: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fmt_col: str | None = "fmt",
    method: str = "dhash",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Surviving ``(media_id, sig)`` rows of a media stream (module
    doc): the first item EVER seen per perceptual signature.

    ``method``: 'dhash' / 'phash' (images; ``fmt_col`` required) or
    'afp' (WAV audio; ``fmt_col`` ignored)."""
    from event_pipeline_spark.streaming.stateful import transform_with_state

    if method in ("dhash", "phash"):
        from event_pipeline_spark.operators.imagededup import _HASHERS

        hasher = _HASHERS[method]

        @pandas_udf("long")
        def _sig(payload: pd.Series, fmt: pd.Series) -> pd.Series:
            return pd.Series(
                [hasher(p, f) for p, f in zip(payload, fmt)], dtype="int64"
            )

        sig = _sig(F.col(payload_col), F.col(fmt_col))
    elif method == "afp":
        from event_pipeline_spark.operators.audiodedup import afp64

        @pandas_udf("long")
        def _sig_a(payload: pd.Series) -> pd.Series:
            return pd.Series([afp64(p) for p in payload], dtype="int64")

        sig = _sig_a(F.col(payload_col))
    else:
        raise ValueError(f"unknown method {method!r}")

    keyed = stream.select(
        F.col(id_col).alias("media_id"), sig.alias("sig")
    )
    return transform_with_state(
        keyed,
        ["sig"],
        _make_sig_processor(state_ttl_ms),
        SURVIVOR_SCHEMA,
        output_mode="Append",
        time_mode="ProcessingTime" if state_ttl_ms else "None",
    )
