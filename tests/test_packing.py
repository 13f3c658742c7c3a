"""Sharding / splitting / packing: determinism, disjointness, and the
bin-packing invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.packing import (
    assign_shards,
    pack_greedy,
    sample_stratified,
    train_val_test_split,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 131) % 700 + 1).alias("tokens"),
    )


class TestShardsAndSplits:
    def test_shards_stable_in_range_balanced(self, docs):
        a = {r["doc_id"]: r["shard"] for r in assign_shards(docs, "doc_id", 16).collect()}
        b = {r["doc_id"]: r["shard"] for r in assign_shards(docs, "doc_id", 16).collect()}
        assert a == b
        assert set(a.values()) <= set(range(16))
        counts = [list(a.values()).count(s) for s in range(16)]
        assert min(counts) > 2000 / 16 * 0.6  # roughly balanced

    def test_split_disjoint_stable_proportional(self, docs):
        s1 = {r["doc_id"]: r["split"] for r in
              train_val_test_split(docs, "doc_id", WEIGHTS).collect()}
        s2 = {r["doc_id"]: r["split"] for r in
              train_val_test_split(docs, "doc_id", WEIGHTS).collect()}
        assert s1 == s2  # deterministic
        assert len(s1) == 2000  # every doc exactly one split
        frac_train = sum(1 for v in s1.values() if v == "train") / 2000
        assert abs(frac_train - 0.8) < 0.05

    def test_salt_rerolls_membership(self, docs):
        base = {r["doc_id"]: r["split"] for r in
                train_val_test_split(docs, "doc_id", WEIGHTS).collect()}
        other = {r["doc_id"]: r["split"] for r in
                 train_val_test_split(docs, "doc_id", WEIGHTS, salt="v2").collect()}
        assert base != other

    def test_weights_must_sum_to_one(self, docs):
        with pytest.raises(ValueError, match="sum to 1"):
            train_val_test_split(docs, "doc_id", {"a": 0.5, "b": 0.4})

    def test_stratified_sample_deterministic(self, spark):
        df = spark.range(1000).select(
            (F.col("id") % 4).cast("string").alias("s"), "id"
        )
        a = sample_stratified(df, "s", {"0": 0.5, "1": 0.1}).count()
        b = sample_stratified(df, "s", {"0": 0.5, "1": 0.1}).count()
        assert a == b > 0


class TestPackGreedy:
    BUDGET = 1000

    def test_invariants(self, docs):
        out = pack_greedy(docs, "doc_id", "tokens", self.BUDGET, partitions=1)
        rows = out.collect()
        assert len(rows) == 2000  # every doc packed exactly once
        assert len({r["doc_id"] for r in rows}) == 2000

        packs: dict[str, int] = {}
        for r in rows:
            packs[r["pack_id"]] = packs.get(r["pack_id"], 0) + r["tokens"]
        for r in rows:
            assert r["pack_tokens"] == packs[r["pack_id"]]
        # no pack over budget (no single doc exceeds it in this fixture)
        assert max(packs.values()) <= self.BUDGET

        # FFD quality: within 11/9·OPT + 1 of the token lower bound
        total = sum(r["tokens"] for r in rows)
        lower = math.ceil(total / self.BUDGET)
        assert len(packs) <= math.ceil(11 / 9 * lower) + 1

    def test_oversized_doc_gets_own_pack(self, spark):
        df = spark.createDataFrame(
            [(1, 5000), (2, 10), (3, 20)], "doc_id long, tokens long"
        )
        rows = pack_greedy(df, "doc_id", "tokens", 100, partitions=1).collect()
        by_doc = {r["doc_id"]: r for r in rows}
        assert by_doc[1]["pack_tokens"] == 5000  # alone in its pack
        assert by_doc[2]["pack_id"] == by_doc[3]["pack_id"]  # small ones share


def test_pack_greedy_survives_empty_partitions(spark):
    """An over-partitioned input (more partitions than rows) delivers
    empty batch iterators to mapInPandas — packing must skip them, not
    crash on an empty concat."""
    from event_pipeline_spark.operators.packing import pack_greedy

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "doc_id long, tokens long"
    ).repartition(16)
    out = pack_greedy(df, "doc_id", "tokens", budget=100).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3}


# -- packing invariants (hypothesis) ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    toks=st.lists(st.integers(1, 300), min_size=1, max_size=50),
    budget=st.sampled_from([64, 200, 1000]),
    parts=st.sampled_from([1, 4]),
)
@settings(max_examples=15, deadline=None)
def test_pack_greedy_invariants(spark, toks, budget, parts):
    """Every doc lands in exactly one pack; no pack exceeds the budget
    unless it holds a single over-budget doc; reported pack_tokens
    equal the member sum."""
    from event_pipeline_spark.operators.packing import pack_greedy

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, tokens long"
    ).repartition(parts)
    rows = pack_greedy(df, "doc_id", "tokens", budget=budget).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(toks)))
    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for members in by_pack.values():
        total = sum(m["tokens"] for m in members)
        assert all(m["pack_tokens"] == total for m in members)
        assert total <= budget or len(members) == 1


@given(
    n=st.sampled_from([500, 2000]),
    salt=st.sampled_from(["", "r1", "r2"]),
)
@settings(max_examples=6, deadline=None)
def test_split_is_disjoint_exhaustive_and_proportional(spark, n, salt):
    """Every key gets exactly one split; empirical shares track the
    weights; re-salting re-rolls membership deterministically."""
    from event_pipeline_spark.operators.packing import train_val_test_split

    df = spark.range(n).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = train_val_test_split(df, "doc_id", w, salt)
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive, one split per key
    assert set(counts) <= set(w)
    assert abs(counts.get("train", 0) / n - 0.8) < 0.06
    b = train_val_test_split(df, "doc_id", w, salt)
    assert (
        a.orderBy("doc_id").collect() == b.orderBy("doc_id").collect()
    )  # deterministic


def test_pack_sequences_exact_partition_of_token_stream(spark):
    """Closed-form: docs of 5, 3, 9 tokens at seq_len=8 concat to a
    17-token stream -> sequences [0..7], [8..15], [16]. Hand-resolved
    segment map, plus the invariants: segments tile each sequence with
    no gaps/overlap, per-doc segments tile the doc."""
    from event_pipeline_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 9)], "doc_id long, n_tokens long"
    )
    rows = sorted(
        tuple(r) for r in pack_sequences(docs, seq_len=8).collect()
    )
    assert rows == sorted([
        (0, 1, 0, 0, 5),   # doc1 fills [0,5)
        (0, 2, 0, 5, 3),   # doc2 fills [5,8)
        (1, 3, 0, 0, 8),   # doc3 first 8 tokens fill seq 1
        (2, 3, 8, 0, 1),   # doc3 last token starts seq 2
    ])


def test_pack_sequences_invariants_on_corpus(spark, sf_dir):
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.packing import pack_sequences
    from event_pipeline_spark.operators.text import token_count
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    L = 128
    segs = pack_sequences(docs, seq_len=L).cache()
    total = docs.agg(F.sum("n_tokens")).first()[0]
    # segments sum to the token stream, and every sequence except the
    # last is exactly full
    per_seq = segs.groupBy("seq_id").agg(F.sum("n").alias("n")).collect()
    assert sum(r["n"] for r in per_seq) == total
    last = max(r["seq_id"] for r in per_seq)
    assert all(r["n"] == L for r in per_seq if r["seq_id"] != last)
    # per-doc segments tile the doc: offsets are a prefix-exact chain
    bad = (
        segs.groupBy("doc_id")
        .agg(
            F.sum("n").alias("tot"),
            F.min("doc_off").alias("first"),
            F.max(F.col("doc_off") + F.col("n")).alias("end"),
        )
        .join(docs, "doc_id")
        .where(
            (F.col("first") != 0)
            | (F.col("tot") != F.col("n_tokens"))
            | (F.col("end") != F.col("n_tokens"))
        )
        .count()
    )
    assert bad == 0
    segs.unpersist()


def test_pack_sequences_matches_naive_model(spark):
    """Hypothesis differential: the distributed segment map equals a
    20-line sequential Python model for arbitrary token counts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from event_pipeline_spark.operators.packing import pack_sequences

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(st.integers(0, 40), min_size=1, max_size=25),
        st.integers(1, 16),
    )
    def run(sizes, L):
        docs = spark.createDataFrame(
            [(i, n) for i, n in enumerate(sizes)],
            "doc_id long, n_tokens long",
        )
        got = sorted(
            tuple(r) for r in pack_sequences(docs, seq_len=L).collect()
        )
        # naive: walk the concatenated stream
        want, off = [], 0
        for i, n in enumerate(sizes):
            if n <= 0:
                continue
            start, end = off, off + n
            s = start
            while s < end:
                seq = s // L
                e = min(end, (seq + 1) * L)
                want.append((seq, i, s - start, s - seq * L, e - s))
                s = e
            off = end
        assert got == sorted(want)

    run()


def test_chunk_documents_closed_form(spark):
    """10 tokens, chunk=4, overlap=1 (stride 3): starts 0,3,6 —
    start 9 would only re-cover token 9 (9+1 >= 10)... ceil((10-1)/3)
    = 3 chunks; the last is [6,10) with 4 tokens. A 2-token doc yields
    one whole chunk; an empty doc yields none."""
    from event_pipeline_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
            (2, "a b"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start"], r["n_tokens"], r["text"])
        for r in rows
    }
    assert got == {
        (1, 0): (0, 4, "t0 t1 t2 t3"),
        (1, 1): (3, 4, "t3 t4 t5 t6"),
        (1, 2): (6, 4, "t6 t7 t8 t9"),
        (2, 0): (0, 2, "a b"),
    }


def test_chunk_documents_coverage_and_overlap_properties(spark):
    """For a spread of doc lengths: every token is covered, neighbor
    chunks share exactly `overlap` tokens (except a short tail), and
    no chunk is a subset of its predecessor."""
    from event_pipeline_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(n, " ".join(f"w{i}" for i in range(n))) for n in range(1, 40)],
        "doc_id long, text string",
    )
    chunk, overlap = 8, 3
    rows = sorted(
        chunk_documents(docs, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(1, 40))
    for n, rs in by_doc.items():
        covered = set()
        prev_end = None
        for r in rs:
            s, ln = r["start"], r["n_tokens"]
            assert ln >= 1
            assert r["text"] == " ".join(f"w{i}" for i in range(s, s + ln))
            if prev_end is not None:
                assert s < prev_end  # overlapping
                assert prev_end - s == overlap  # exact shared tokens
                assert s + ln > prev_end  # adds new tokens
            covered |= set(range(s, s + ln))
            prev_end = s + ln
        assert covered == set(range(n))


def test_shard_assignment_balance_and_coverage(spark, sf_dir):
    """Serpentine LPT: every shard used, every doc assigned exactly
    once, and the max-min shard token gap is bounded by the largest
    document (the deal-order guarantee)."""
    from event_pipeline_spark.operators.packing import (
        N_SHARDS,
        assign_shards_balanced,
    )
    from event_pipeline_spark.operators.text import token_count
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    out = assign_shards_balanced(
        docs, tokens_col="n_tokens", id_col="doc_id", n_shards=N_SHARDS
    ).collect()
    assert len(out) == docs.count()
    totals = {}
    for r in out:
        totals[r["shard"]] = totals.get(r["shard"], 0) + r["n_tokens"]
    assert set(totals) == set(range(N_SHARDS))
    biggest = max(r["n_tokens"] for r in out)
    assert max(totals.values()) - min(totals.values()) <= biggest


def test_curriculum_order_buckets_and_shuffle(spark):
    from event_pipeline_spark.operators.packing import curriculum_order

    # 20 docs with strictly increasing difficulty 1..20
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 21)], "doc_id long, score long"
    )
    out = curriculum_order(
        df, score_col="score", id_col="doc_id", n_buckets=4
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # equal rank buckets: docs 1-5 -> bucket 0, ..., 16-20 -> bucket 3
    for i in range(1, 21):
        assert by_id[i]["bucket"] == (i - 1) * 4 // 20
    # seq is a permutation of 1..20 and bucket-monotone: every seq in
    # bucket b precedes every seq in bucket b+1
    seqs = sorted(r["seq"] for r in out)
    assert seqs == list(range(1, 21))
    max_prev = 0
    for b in range(4):
        bucket_seqs = [r["seq"] for r in out if r["bucket"] == b]
        assert min(bucket_seqs) > max_prev
        max_prev = max(bucket_seqs)
    # within a bucket the order is NOT the id order (md5 shuffle) for
    # at least one bucket of this fixture
    shuffled = any(
        [r["seq"] for r in sorted(out, key=lambda r: r["doc_id"])
         if r["bucket"] == b]
        != sorted(
            r["seq"] for r in out if r["bucket"] == b
        )
        for b in range(4)
    )
    assert shuffled
