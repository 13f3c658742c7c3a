"""Loaded-tokenizer pipeline end-to-end: a received artifact drives the
engine's existing counting/packing surfaces.

Run: python examples/tokenizer_artifacts_pipeline.py [sf_dir]

A real training-data pipeline does not train its own tokenizer — it
RECEIVES one (a HuggingFace ``tokenizer.json`` or a SentencePiece
``.model``) and must count, select, and pack with exactly that
tokenizer's segmentation. This example writes tiny fixture artifacts
(so it is self-contained), loads them with
``operators/tokenizer_artifacts.py``, and runs the already-verified
execution paths on the loaded tables:

1. ``load_hf_tokenizer``        — classic BPE with end_of_word_suffix
2. ``apply_bpe(fused_suffix=)`` — Arrow-batched corpus tokenization
3. ``load_sentencepiece_model`` — ModelProto wire decode
4. ``unigram_segment``          — Viterbi under the loaded scores

The loaders are round-trip-tested against hand-applied reference
vectors in ``tests/test_tokenizer_artifacts.py``; this example shows
the composition.
"""

from __future__ import annotations

import json
import os
import struct
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from event_pipeline_spark.operators.bpe import apply_bpe  # noqa: E402
from event_pipeline_spark.operators.tokenizer_artifacts import (  # noqa: E402
    load_hf_tokenizer,
    load_sentencepiece_model,
)
from event_pipeline_spark.operators.unigram import unigram_segment  # noqa: E402
from event_pipeline_spark.session import get_session, read_table  # noqa: E402


def _write_fixture_artifacts(tmp: str) -> tuple[str, str]:
    """A tiny BPE tokenizer.json + SentencePiece .model, as a real
    deployment would receive them."""
    hf = {
        "model": {
            "type": "BPE",
            "vocab": {},
            "merges": ["t h", "th e</w>", "e r</w>"],
            "end_of_word_suffix": "</w>",
        },
        "pre_tokenizer": {"type": "Whitespace"},
    }
    hf_path = os.path.join(tmp, "tokenizer.json")
    with open(hf_path, "w", encoding="utf-8") as f:
        json.dump(hf, f)

    def spm_piece(piece: str, score: float, ptype: int) -> bytes:
        raw = piece.encode("utf-8")
        msg = bytes([0x0A, len(raw)]) + raw
        msg += bytes([0x15]) + struct.pack("<f", score)
        msg += bytes([0x18, ptype])
        return msg

    pieces = [
        ("<unk>", 0.0, 2),
        ("▁the", -2.0, 1),
        ("▁t", -4.0, 1),
        ("he", -3.0, 1),
        ("▁a", -3.0, 1),
        ("a", -5.0, 1),
        ("n", -5.0, 1),
        ("d", -5.0, 1),
        ("an", -4.5, 1),
        ("and", -3.5, 1),
    ]
    blob = b""
    for p, s, t in pieces:
        body = spm_piece(p, s, t)
        blob += bytes([0x0A, len(body)]) + body
    spm_path = os.path.join(tmp, "toy.model")
    with open(spm_path, "wb") as f:
        f.write(blob)
    return hf_path, spm_path


def main(sf_dir: str) -> None:
    spark = get_session("tokenizer_artifacts_example")
    with tempfile.TemporaryDirectory() as tmp:
        hf_path, spm_path = _write_fixture_artifacts(tmp)

        art = load_hf_tokenizer(hf_path)
        print(
            f"loaded tokenizer.json: {art.model_type}, "
            f"{len(art.merges)} merges, suffix={art.end_of_word_suffix!r}"
        )
        docs = read_table(spark, sf_dir, "documents").limit(50)
        toks = apply_bpe(
            docs, "text", art.merges, fused_suffix=art.end_of_word_suffix
        )
        stats = toks.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
        ).collect()[0]
        print(
            f"BPE-tokenized {stats['docs']} docs -> "
            f"{stats['tokens']} tokens under the LOADED merge table"
        )

        vocab = load_sentencepiece_model(spm_path)
        print(f"loaded .model: {len(vocab)} NORMAL pieces")
        words = spark.createDataFrame(
            [("the",), ("and",), ("than",)], "word string"
        )
        for r in unigram_segment(words, vocab=vocab).collect():
            print(
                f"  {r['word']!r} -> {r['pieces']} "
                f"(logp_units={r['logp_units']})"
            )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
