"""DSL → DAG shape tests, mirroring reference tests/unittests/test_task.py:39-116."""

from __future__ import annotations

import pytest

from event_pipeline_spark.plans.dag import PipeType, build_dag


def test_line_execution():
    p = build_dag("A->B->C")
    assert p.event == "A"
    assert p.on_success.event == "B"
    assert p.on_success.on_success.event == "C"
    assert p.on_success_pipe is PipeType.POINTER
    assert p.on_success.on_success_pipe is PipeType.POINTER
    assert p.on_success.on_success.on_success_pipe is None


def test_result_piping_and_parallel():
    p = build_dag("A||B|->C")
    assert p.on_success_pipe is PipeType.PARALLELISM
    assert p.on_success.on_success_pipe is PipeType.PIPE_POINTER
    assert p.on_success.on_success.event == "C"


def test_conditional_branching_with_sink():
    p = build_dag("A(0->B,1->C)->S")
    assert p.is_conditional
    assert p.on_failure.event == "B"
    assert p.on_success.event == "C"
    assert p.sink.event == "S"
    assert p.sink_pipe is PipeType.POINTER
    assert len(p.children()) == 3


def test_extra_descriptors():
    p = build_dag("A(0->B,1->C,3->D)")
    assert 3 in p.descriptors
    pipe, node = p.descriptors[3]
    assert node.event == "D" and pipe is PipeType.POINTER


def test_descriptor_pipe_pointer():
    p = build_dag("LoadData (1 |-> P, 0 |-> E, 2 |-> M)")
    assert p.on_success_pipe is PipeType.PIPE_POINTER
    assert p.descriptors[2][0] is PipeType.PIPE_POINTER


def test_count_nodes_and_root():
    p = build_dag("A->B->C")
    assert p.count_nodes() == 3
    assert p.on_success.on_success.get_root().event == "A"


def test_retry_syntax():
    p = build_dag("2 * A -> B * 4 ->C")
    assert p.retries == 2
    assert p.on_success.retries == 4
    assert p.on_success.on_success.retries is None


def test_syntax_error_wrong_descriptor():
    with pytest.raises(SyntaxError):
        build_dag("A(10->C,40->B)")


def test_syntax_error_wrong_retry_factor():
    with pytest.raises(SyntaxError):
        build_dag("1 * A -> B * 0")
    with pytest.raises(SyntaxError):
        build_dag("-1 * A")


def test_comments_and_directives_ignored():
    p = build_dag("# a comment\n@recursive-depth:200\nA->B")
    assert p.event == "A" and p.on_success.event == "B"


def test_empty_source_raises():
    with pytest.raises(IndexError):
        build_dag("   ")


def test_explain_and_dot():
    p = build_dag("A(0->B,1->C)->S")
    text = p.explain()
    dot = p.to_dot()
    assert "A" in text and "sink" in text
    assert dot.startswith("digraph") and 'label="S"' in dot


def test_nested_conditional():
    p = build_dag("A(0->B(0->D,1->E),1->C)")
    assert p.on_failure.event == "B"
    assert p.on_failure.is_conditional
    assert p.on_failure.on_failure.event == "D"
    assert p.on_failure.on_success.event == "E"
