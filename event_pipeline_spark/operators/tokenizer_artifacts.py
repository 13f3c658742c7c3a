"""Production tokenizer ARTIFACT loaders: HuggingFace ``tokenizer.json``
and SentencePiece ``.model`` files, mapped onto the frozen-table forms
this engine already executes (``bpe.apply_bpe`` merge lists,
``wordpiece.wordpiece_segment`` vocab tuples,
``unigram.unigram_segment`` integer-unit log-prob dicts).

Why this module exists: the engine trains and freezes its own tables
(``operators/bpe.py`` / ``wordpiece.py`` / ``unigram.py``), but a real
pipeline RECEIVES a tokenizer artifact — a ``tokenizer.json`` exported
by the HuggingFace ``tokenizers`` library, or a SentencePiece
``.model`` protobuf — and must count/pack/select with exactly that
tokenizer's segmentation. These loaders parse the public file formats
(tokenizer.json's documented JSON schema; sentencepiece's public
``ModelProto`` wire format) into plain Python tables; the Spark-side
execution paths are unchanged and already scale-shaped (broadcast
tables, per-distinct-word memoization).

Supported families: classic BPE (``end_of_word_suffix`` convention,
e.g. CLIP), byte-level BPE (GPT-2/RoBERTa ``ByteLevel``
pre-tokenization — words segment over the public ``bytes_to_unicode``
alphabet with the Ġ space marker on non-initial words; see
``bpe.apply_bpe(byte_level=True)``), WordPiece, and Unigram. Honest
gates remain for ``byte_fallback`` artifacts (<0xNN> decomposition of
unknown pieces) and ByteLevel paired with a non-BPE model — both
refuse with a clear error instead of silently mis-tokenizing.

Reference parity: the reference pipeline (nexus/) has no tokenizer
surface at all — this is part of the [ext] LLM-data-pipeline mandate.
Formats per the public docs: huggingface/tokenizers' serialization
schema and google/sentencepiece's ``sentencepiece_model.proto``.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

__all__ = [
    "HFTokenizerArtifact",
    "load_hf_tokenizer",
    "load_sentencepiece_model",
    "unigram_units",
]

SPM_SPACE = "▁"  # SentencePiece word-boundary marker "▁"


@dataclass
class HFTokenizerArtifact:
    """Parsed ``tokenizer.json`` in engine-ready form.

    - ``model_type``: "BPE" | "WordPiece" | "Unigram".
    - ``merges`` (BPE): ordered (a, b) pairs for ``apply_bpe`` /
      ``segment_word`` — pass ``fused_suffix=end_of_word_suffix``.
    - ``wordpiece_vocab`` (WordPiece): pieces with continuations
      normalized to the engine's ``##`` prefix, ready for
      ``wordpiece_segment(vocab=...)``.
    - ``unigram_scores`` (Unigram): piece -> float log-prob; feed
      through ``unigram_units`` for ``unigram_segment(vocab=...)``.
    """

    model_type: str
    vocab: dict[str, int] = field(default_factory=dict)
    merges: list[tuple[str, str]] = field(default_factory=list)
    wordpiece_vocab: tuple[str, ...] = ()
    unigram_scores: dict[str, float] = field(default_factory=dict)
    unk_token: str | None = None
    continuing_subword_prefix: str | None = None
    end_of_word_suffix: str | None = None
    #: GPT-2 family: merges/vocab live over the bytes_to_unicode
    #: alphabet — pass ``byte_level=True`` to apply_bpe/segment_word
    byte_level: bool = False


def _pretokenizer_types(pre) -> list[str]:
    """Flatten a (possibly Sequence-nested) pre_tokenizer spec to its
    component type names."""
    if not pre:
        return []
    if pre.get("type") == "Sequence":
        out = []
        for p in pre.get("pretokenizers", []):
            out.extend(_pretokenizer_types(p))
        return out
    return [pre.get("type", "")]


def load_hf_tokenizer(path: str) -> HFTokenizerArtifact:
    """Parse a HuggingFace ``tokenizer.json`` into the frozen-table
    forms the engine executes. Raises ``NotImplementedError`` for
    byte-level BPE artifacts (see module doc) and ``ValueError`` for
    unknown model types."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    model = doc.get("model") or {}
    mtype = model.get("type", "")
    pre_types = _pretokenizer_types(doc.get("pre_tokenizer"))
    byte_level = "ByteLevel" in pre_types
    if model.get("byte_fallback"):
        raise NotImplementedError(
            "byte_fallback artifacts decompose UNKNOWN pieces to <0xNN> "
            "byte tokens at segmentation time; that fallback path is "
            "not implemented — load a BPE (char- or byte-level), "
            "WordPiece, or plain Unigram artifact"
        )
    if byte_level and mtype != "BPE":
        raise NotImplementedError(
            f"ByteLevel pre-tokenization with a {mtype or 'missing'} "
            "model is not implemented (the GPT-2 family is ByteLevel "
            "+ BPE, which loads fully)"
        )
    if mtype == "BPE":
        merges = []
        for m in model.get("merges", []):
            if isinstance(m, str):  # pre-0.20 format: "a b"
                a, _, b = m.partition(" ")
            else:  # >=0.20 format: ["a", "b"]
                a, b = m[0], m[1]
            merges.append((a, b))
        if byte_level and model.get("end_of_word_suffix"):
            raise ValueError(
                "artifact declares both ByteLevel pre-tokenization and "
                "an end_of_word_suffix — no published tokenizer does; "
                "refusing a format guess"
            )
        return HFTokenizerArtifact(
            model_type="BPE",
            vocab=dict(model.get("vocab", {})),
            merges=merges,
            unk_token=model.get("unk_token"),
            end_of_word_suffix=model.get("end_of_word_suffix") or None,
            byte_level=byte_level,
        )
    if mtype == "WordPiece":
        prefix = model.get("continuing_subword_prefix", "##")
        vocab = dict(model.get("vocab", {}))
        unk = model.get("unk_token", "[UNK]")
        # only the artifact's DECLARED specials are unsegmentable: the
        # unk token plus added_tokens entries marked special. The old
        # startswith('[')/endswith(']') heuristic silently dropped
        # legitimate vocab pieces like '[laughs]' (round-10 ADVICE).
        specials = {unk} | {
            t.get("content")
            for t in doc.get("added_tokens", [])
            if t.get("special")
        }
        pieces = []
        for p in sorted(vocab, key=vocab.get):
            if p in specials:
                continue  # declared specials never match inside a word
            if prefix and p.startswith(prefix) and prefix != "##":
                p = "##" + p[len(prefix):]
            pieces.append(p)
        return HFTokenizerArtifact(
            model_type="WordPiece",
            vocab=vocab,
            wordpiece_vocab=tuple(pieces),
            unk_token=unk,
            continuing_subword_prefix="##",
        )
    if mtype == "Unigram":
        scores = {p: float(s) for p, s in model.get("vocab", [])}
        unk_id = model.get("unk_id")
        unk = None
        if unk_id is not None and 0 <= unk_id < len(model.get("vocab", [])):
            unk = model["vocab"][unk_id][0]
            scores.pop(unk, None)  # the UNK piece never segments
        return HFTokenizerArtifact(
            model_type="Unigram", unigram_scores=scores, unk_token=unk
        )
    raise ValueError(f"unsupported tokenizer.json model type: {mtype!r}")


def unigram_units(
    scores: dict[str, float],
    *,
    unit: int = 10_000_000,
    strip_space_marker: bool = True,
) -> dict[str, int]:
    """Float log-probs -> the engine's integer 1e-7-nat units
    (``unigram.FROZEN_UNIGRAM``'s representation: units =
    round(lp * 1e7); both the Spark plan and any oracle consume the
    same integer literals). ``strip_space_marker`` drops the
    SentencePiece ``▁`` word-boundary prefix so pieces align with the
    engine's plain whitespace-word segmentation; a piece and its
    ▁-form collapse to the HIGHER log-prob (deterministic)."""
    out: dict[str, int] = {}
    for p, s in scores.items():
        if strip_space_marker:
            p = p[1:] if p.startswith(SPM_SPACE) else p
        if not p or SPM_SPACE in p:
            continue
        u = round(float(s) * unit)
        if p not in out or u > out[p]:
            out[p] = u
    return out


# -- SentencePiece .model: minimal ModelProto wire decode -------------------
#
# The file is a serialized ``sentencepiece.ModelProto`` (public schema,
# sentencepiece_model.proto). Only the repeated ``pieces`` field is
# needed:
#   ModelProto:    field 1 (length-delimited) = SentencePiece
#   SentencePiece: field 1 (length-delimited) = piece  (utf-8)
#                  field 2 (32-bit)           = score  (float)
#                  field 3 (varint)           = type   (1=NORMAL,
#                    2=UNKNOWN, 3=CONTROL, 4=USER_DEFINED, 5=UNUSED,
#                    6=BYTE; default NORMAL)
# A 40-line wire-format reader avoids a protobuf runtime dependency.


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift, val = 0, 0
    while True:
        if i >= len(buf):
            raise ValueError(
                "truncated protobuf: varint runs past end of buffer"
            )
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message; value
    is bytes for length-delimited, int for varint/32/64-bit."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        fnum, wtype = tag >> 3, tag & 0x7
        if wtype == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wtype == 1:  # 64-bit
            val = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wtype == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wtype == 5:  # 32-bit
            val = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wtype}")
        yield fnum, wtype, val


def load_sentencepiece_model(
    path: str,
    *,
    unit: int = 10_000_000,
    strip_space_marker: bool = True,
    include_user_defined: bool = True,
) -> dict[str, int]:
    """Parse a SentencePiece ``.model`` protobuf into the engine's
    piece -> integer-unit log-prob dict for
    ``unigram_segment(vocab=...)``. NORMAL (and, by default,
    USER_DEFINED) pieces load; UNKNOWN/CONTROL/UNUSED/BYTE pieces are
    tokenizer plumbing, not segmentable vocabulary, and are skipped.
    See ``unigram_units`` for the ▁-marker and unit conventions."""
    with open(path, "rb") as f:
        buf = f.read()
    scores: dict[str, float] = {}
    kept_types = {1} | ({4} if include_user_defined else set())
    try:
        for fnum, wtype, val in _iter_fields(buf):
            if fnum != 1 or wtype != 2:
                continue  # not a SentencePiece submessage
            piece, score, ptype = None, None, 1
            for sf, swt, sval in _iter_fields(val):
                if sf == 1 and swt == 2:
                    piece = sval.decode("utf-8")
                elif sf == 2 and swt == 5:
                    score = struct.unpack(
                        "<f", sval.to_bytes(4, "little")
                    )[0]
                elif sf == 3 and swt == 0:
                    ptype = sval
            if piece is None or score is None or ptype not in kept_types:
                continue
            scores[piece] = score
    except ValueError as e:
        raise ValueError(
            f"corrupt or truncated SentencePiece model {path!r}: {e}"
        ) from e
    return unigram_units(
        scores, unit=unit, strip_space_marker=strip_space_marker
    )
