"""DAG IR: AST → pipeline-task graph.

Mirrors the reference's PipelineTask graph semantics (nexus/task.py:664-1048,
AST fold :829-967) with the same edge kinds: on_success / on_failure /
sink / extra descriptors, each with a pipe type. The graph is the logical
plan our driver executor walks; per-stage dataflow is Catalyst's problem.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from event_pipeline_spark.dsl import ast as A
from event_pipeline_spark.dsl.parser import parse


class PipeType(Enum):
    POINTER = "->"         # sequencing, no data dependency
    PIPE_POINTER = "|->"   # pipe: downstream sees upstream's result
    PARALLELISM = "||"     # concurrent branches, gathered into one context


@dataclass
class PipelineNode:
    event: str
    on_success: "PipelineNode | None" = None
    on_failure: "PipelineNode | None" = None
    on_success_pipe: PipeType | None = None
    on_failure_pipe: PipeType | None = None
    sink: "PipelineNode | None" = None
    sink_pipe: PipeType | None = None
    descriptors: dict[int, tuple[PipeType, "PipelineNode"]] = field(default_factory=dict)
    retries: int | None = None
    parent: "PipelineNode | None" = None
    is_conditional: bool = False
    # transient build state: branch descriptor at the root of a branch expr
    _descriptor: int | None = None
    _descriptor_pipe: PipeType | None = None

    def get_root(self) -> "PipelineNode":
        node = self
        while node.parent is not None:
            node = node.parent
        return node

    def children(self) -> list["PipelineNode"]:
        out = []
        if self.on_failure:
            out.append(self.on_failure)
        if self.sink:
            out.append(self.sink)
        if self.on_success:
            out.append(self.on_success)
        out.extend(node for _, node in self.descriptors.values())
        return out

    # -- introspection (SURVEY §2.9) -----------------------------------

    def count_nodes(self) -> int:
        return len(self.bfs())

    def bfs(self) -> list["PipelineNode"]:
        seen: list[PipelineNode] = []
        queue = [self]
        while queue:
            node = queue.pop(0)
            if any(node is s for s in seen):
                continue
            seen.append(node)
            queue.extend(node.children())
        return seen

    def explain(self, indent: int = 0) -> str:
        """ASCII rendering of the DAG (reference pipeline.py:414-468)."""
        pad = "  " * indent
        label = self.event
        if self.retries:
            label += f" *{self.retries}"
        lines = [f"{pad}{label}"]
        if self.on_failure:
            lines.append(f"{pad}  [0 {self.on_failure_pipe.value}]")
            lines.append(self.on_failure.explain(indent + 2))
        if self.on_success:
            tag = "1 " if self.is_conditional else ""
            lines.append(f"{pad}  [{tag}{self.on_success_pipe.value}]")
            lines.append(self.on_success.explain(indent + 2))
        for d, (pipe, node) in sorted(self.descriptors.items()):
            lines.append(f"{pad}  [{d} {pipe.value}]")
            lines.append(node.explain(indent + 2))
        if self.sink:
            lines.append(f"{pad}  [sink {self.sink_pipe.value}]")
            lines.append(self.sink.explain(indent + 2))
        return "\n".join(lines)

    def to_dot(self) -> str:
        """Graphviz DOT export (reference translator/dot.py:27-114)."""
        lines = ["digraph pipeline {"]
        for node in self.bfs():
            nid = f"n{id(node)}"
            shape = "diamond" if node.is_conditional else "box"
            lines.append(f'  {nid} [label="{node.event}", shape={shape}];')
            edges = []
            if node.on_failure:
                edges.append((node.on_failure, f"0 {node.on_failure_pipe.value}"))
            if node.on_success:
                edges.append((node.on_success, node.on_success_pipe.value))
            for d, (pipe, child) in node.descriptors.items():
                edges.append((child, f"{d} {pipe.value}"))
            if node.sink:
                edges.append((node.sink, f"sink {node.sink_pipe.value}"))
            for child, label in edges:
                lines.append(f'  {nid} -> n{id(child)} [label="{label}"];')
        lines.append("}")
        return "\n".join(lines)


def build_dag(code: str) -> PipelineNode:
    """Parse Pointy source and fold the AST into the task graph; returns
    the root. Same fold rules as the reference's _parse_ast
    (task.py:857-967)."""
    tail = _fold(parse(code))
    if not isinstance(tail, PipelineNode):
        raise SyntaxError(f"pointy expression does not define a task graph: {code!r}")
    return tail.get_root()


def _fold(node: A.Node) -> "PipelineNode | int":
    if isinstance(node, A.TaskRef):
        return PipelineNode(event=node.name)

    if isinstance(node, A.Descriptor):
        return node.value

    if isinstance(node, A.BinOp):
        if node.op == "*":
            child = _fold(node.right)
            count = _fold(node.left)
            assert isinstance(child, PipelineNode) and isinstance(count, int)
            child.retries = count
            return child

        left = _fold(node.left)
        right = _fold(node.right)
        pipe = PipeType(node.op)

        if isinstance(left, PipelineNode) and isinstance(right, PipelineNode):
            if left.is_conditional:
                left.sink = right
                left.sink_pipe = pipe
            else:
                left.on_success = right
                left.on_success_pipe = pipe
            right.parent = left
            return right  # chain tail; callers use get_root()

        # descriptor-rooted branch inside a conditional group
        desc = left if isinstance(left, int) else right
        branch = right if isinstance(left, int) else left
        if not isinstance(branch, PipelineNode):
            raise SyntaxError(f"malformed branch expression near descriptor {desc}")
        if not (0 <= desc <= 9):
            raise SyntaxError(
                f"Descriptors cannot be either greater 9 or less than 0. Offending token: {desc}"
            )
        root = branch.get_root()
        root._descriptor = desc
        root._descriptor_pipe = pipe
        return branch

    if isinstance(node, A.Conditional):
        parent = PipelineNode(event=node.parent.name, is_conditional=True)
        for branch_expr in node.group.branches:
            tail = _fold(branch_expr)
            if not isinstance(tail, PipelineNode):
                raise SyntaxError(
                    f"conditional branch must contain a task: {branch_expr!r}"
                )
            root = tail.get_root()
            desc, pipe = root._descriptor, root._descriptor_pipe
            if desc is None or pipe is None:
                raise SyntaxError(
                    f"conditional branch missing descriptor: {branch_expr!r}"
                )
            root.parent = parent
            if desc == 0:
                parent.on_failure, parent.on_failure_pipe = root, pipe
            elif desc == 1:
                parent.on_success, parent.on_success_pipe = root, pipe
            else:
                parent.descriptors[desc] = (pipe, root)
        return parent

    raise SyntaxError(f"unexpected AST node {node!r}")  # pragma: no cover
