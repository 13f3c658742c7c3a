"""AST for the Pointy dataflow DSL.

Same shapes as the reference grammar produces (nexus/parser/ast.py:4-117):
binary ops over task names/descriptors, conditional groups attached to a
parent task. Ours is produced by a hand-rolled recursive-descent parser
(the grammar has 7 token kinds; PLY would be overkill and we don't copy).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TaskRef:
    """A named event/task: ``Fetch``."""

    name: str


@dataclass
class Descriptor:
    """A branch descriptor 0–9 inside a conditional group."""

    value: int


@dataclass
class BinOp:
    """``left <op> right`` where op is ``->`` | ``|->`` | ``||`` | ``*``."""

    op: str
    left: "Node"
    right: "Node"


@dataclass
class Group:
    """Comma-separated branch expressions inside ``( ... )``."""

    branches: list["Node"] = field(default_factory=list)


@dataclass
class Conditional:
    """``Parent (0 -> Fail, 1 -> Ok, 3 -> Extra)``."""

    parent: TaskRef
    group: Group


Node = TaskRef | Descriptor | BinOp | Group | Conditional
