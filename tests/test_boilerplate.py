"""Within-source repeated-line removal: the grouping boundary (same
line in another source survives), all-copies removal (vs line-dedup's
keep-first), and the full-boilerplate drop contract."""

from __future__ import annotations

from event_pipeline_spark.operators.boilerplate import (
    repeated_lines,
    strip_repeated_lines,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_strip_is_per_source_and_removes_all_copies(spark):
    header = "COOKIE BANNER accept all cookies"
    docs = _mk(
        spark,
        [
            (1, "a", f"{header}\nunique first body line"),
            (2, "a", f"{header}\nunique second body line"),
            (3, "b", f"{header}\nanother site body line"),
        ],
    )
    rep = repeated_lines(docs).collect()
    assert [(r["source"], r["line"], r["n_docs"]) for r in rep] == [
        ("a", header, 2)
    ]
    out = {r["doc_id"]: r for r in strip_repeated_lines(docs).collect()}
    # both source-a copies removed; source-b copy untouched
    assert out[1]["text"] == "unique first body line"
    assert out[2]["text"] == "unique second body line"
    assert out[3]["text"] == f"{header}\nanother site body line"
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1


def test_fully_boilerplate_doc_drops_out(spark):
    docs = _mk(
        spark,
        [
            (1, "a", "nav bar\nfooter"),
            (2, "a", "nav bar\nfooter"),
            (3, "a", "nav bar\nreal content survives here"),
        ],
    )
    out = {r["doc_id"]: r for r in strip_repeated_lines(docs).collect()}
    assert set(out) == {3}
    assert out[3]["text"] == "real content survives here"


def test_contrast_with_first_occurrence_line_dedup(spark):
    """dedup_lines keeps ONE copy of a repeated line; the prevalence
    rule removes them all — the composition rationale."""
    from event_pipeline_spark.operators.lines import dedup_lines

    docs = _mk(
        spark,
        [(1, "a", "shared line\nbody one"), (2, "a", "shared line\nbody two")],
    )
    deduped = {
        r["doc_id"]: r["text"]
        for r in dedup_lines(docs.select("doc_id", "text")).collect()
    }
    assert "shared line" in deduped[1]  # first occurrence survives
    assert "shared line" not in deduped[2]
    stripped = {
        r["doc_id"]: r["text"]
        for r in strip_repeated_lines(docs).collect()
    }
    assert stripped == {1: "body one", 2: "body two"}  # all copies gone
