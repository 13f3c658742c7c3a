"""Polynomial gram-hash kernel (text.window_fp_array): three-way
parity Spark == DuckDB replay == Python slice-form Horner, for every
window size class the doubling construction exercises (single bit,
two bits, k=50's 32+16+2 decomposition), plus the short-document
clamp."""

from __future__ import annotations

import hashlib
import re

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.text import (
    HASH_M1,
    HASH_M2,
    HASH_P1,
    HASH_P2,
    gram_fp_sql,
    residues_sql,
    window_fp_array,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog and more words here",
    "a b",
    "",
    "single",
    " ".join(f"t{i % 7}" for i in range(60)),
    "x " * 49 + "y",
]


def _low64(t: str) -> int:
    return int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")


def ref_fps(text: str, k: int) -> list[int]:
    """Slice-form Horner: each gram hashed directly from its token
    list — the association-free definition both engines must match."""
    toks = re.split(r"\s+", text.strip())
    out = []
    for i in range(max(len(toks) - (k - 1), 1)):
        h1 = h2 = 0
        for j in range(k):
            if i + j < len(toks):
                u = _low64(toks[i + j])
                r1, r2 = u % HASH_M1, u % HASH_M2
            else:
                r1 = r2 = 0  # zero-padding clamp
            h1 = (h1 * HASH_P1 + r1) % HASH_M1
            h2 = (h2 * HASH_P2 + r2) % HASH_M2
        out.append(h1 * 2147483648 + h2)
    return out


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 8, 50])
def test_spark_matches_slice_form_reference(spark, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["id", "text"]
    )
    got = {
        r["id"]: r["fps"]
        for r in df.select(
            "id",
            window_fp_array(
                F.split(F.trim(F.col("text")), r"\s+"), k
            ).alias("fps"),
        ).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == ref_fps(t, k), f"k={k} text#{i}"


@pytest.mark.parametrize("k", [1, 4, 8, 50])
def test_duckdb_replay_matches_reference(k):
    con = duckdb.connect()
    con.register("df", pd.DataFrame({"id": range(len(TEXTS)), "text": TEXTS}))
    q = f"""
    SELECT id, list_transform(
      generate_series(1, greatest(len(th) - {k - 1}, 1)),
      i -> {gram_fp_sql('th', 'i', k)}) AS fps
    FROM (SELECT id, list_transform(
              string_split_regex(trim(text), '\\s+'),
              t -> {residues_sql('t')}) AS th
          FROM df) ORDER BY id"""
    got = {r[0]: list(r[1]) for r in con.execute(q).fetchall()}
    for i, t in enumerate(TEXTS):
        assert got[i] == ref_fps(t, k), f"k={k} text#{i}"


def test_all_intermediates_ansi_safe():
    """Every intermediate stays below 2^63 (the ANSI-mode requirement
    the kernel is designed around): worst-case residue product and
    Horner step by construction."""
    assert (HASH_M1 - 1) * HASH_P1 + (HASH_M1 - 1) < 2**63
    assert (HASH_M2 - 1) * HASH_P2 + (HASH_M2 - 1) < 2**63
    # doubling-level multipliers are P^s mod M < M, same bound
    assert ((1 << 32) - 1) % HASH_M1 * ((1 << 32) % HASH_M1) < 2**63
    # packed fingerprint fits a signed 64-bit value
    assert (HASH_M1 - 1) * 2147483648 + (HASH_M2 - 1) < 2**63
