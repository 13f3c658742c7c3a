"""Pointy-Lang lexer + recursive-descent parser.

Grammar (mirrors the reference's PLY grammar, nexus/parser/grammar.py:14-118,
lexer nexus/parser/lexer.py:9-64 — re-implemented from the language spec,
not translated):

    expression  := operand (OP operand)*          # one precedence level,
    OP          := '->' | '|->' | '||' | '*'      # left-associative
    operand     := NUMBER | task
    task        := TASKNAME [ '(' group ')' ]
    group       := expression (',' expression)*

Comments (``# ...``) and ``@directive:value`` lines are skipped; the
reference's ``@recursive-depth`` directive raises Python's recursion limit
for its recursive interpreter — our executor is iterative, so the
directive parses and is ignored.

Validation (same rules, same error type ``SyntaxError``):
- retry factors must be >= 2 (grammar.py:57-69);
- branch descriptors must be 0..9 (grammar.py:41-54).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from event_pipeline_spark.dsl.ast import (
    BinOp,
    Conditional,
    Descriptor,
    Group,
    Node,
    TaskRef,
)

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+)
    | (?P<COMMENT>\#[^\n]*)
    | (?P<DIRECTIVE>@[a-zA-Z0-9-]+:[a-zA-Z0-9]+)
    | (?P<PPOINTER>\|->)
    | (?P<POINTER>->)
    | (?P<PARALLEL>\|\|)
    | (?P<RETRY>\*)
    | (?P<LPAREN>\()
    | (?P<RPAREN>\))
    | (?P<SEP>,)
    | (?P<NUMBER>\d+)
    | (?P<TASKNAME>[a-zA-Z_][a-zA-Z0-9_]*)
    """,
    re.VERBOSE,
)

_OPS = {"POINTER": "->", "PPOINTER": "|->", "PARALLEL": "||", "RETRY": "*"}


@dataclass
class _Token:
    kind: str
    text: str
    pos: int


def tokenize(code: str) -> list[_Token]:
    tokens: list[_Token] = []
    pos = 0
    while pos < len(code):
        m = _TOKEN_RE.match(code, pos)
        if m is None:
            raise SyntaxError(
                f"Illegal character {code[pos]!r} at offset {pos}"
            )
        kind = m.lastgroup or ""
        if kind not in ("WS", "COMMENT", "DIRECTIVE"):
            tokens.append(_Token(kind, m.group(), pos))
        pos = m.end()
    return tokens


class _Parser:
    def __init__(self, tokens: list[_Token]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> _Token | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> _Token:
        tok = self.peek()
        if tok is None:
            raise SyntaxError("Syntax error at the end of the input!")
        self.i += 1
        return tok

    def expect(self, kind: str) -> _Token:
        tok = self.next()
        if tok.kind != kind:
            raise SyntaxError(
                f"Expected {kind}, got {tok.text!r} at offset {tok.pos}"
            )
        return tok

    # expression := operand (OP operand)*   — left-associative fold
    def expression(self) -> Node:
        node = self.operand()
        while (tok := self.peek()) is not None and tok.kind in _OPS:
            self.next()
            right = self.operand()
            node = self._fold(_OPS[tok.kind], node, right, tok.pos)
        return node

    def _fold(self, op: str, left: Node, right: Node, pos: int) -> Node:
        if op == "*":
            # retry: NUMBER * task  or  task * NUMBER (grammar.py:21-22)
            number = left if isinstance(left, Descriptor) else right
            task = right if isinstance(left, Descriptor) else left
            if not isinstance(number, Descriptor) or isinstance(task, Descriptor):
                raise SyntaxError(
                    f"Retry requires a number and a task at offset {pos}"
                )
            if number.value < 2:
                raise SyntaxError(
                    f"Task cannot be retried less than 2 times. Offending token: {number.value}"
                )
            return BinOp("*", Descriptor(number.value), task)
        return BinOp(op, left, right)

    def operand(self) -> Node:
        tok = self.peek()
        if tok is None:
            raise SyntaxError("Syntax error at the end of the input!")
        if tok.kind == "NUMBER":
            self.next()
            return Descriptor(int(tok.text))
        if tok.kind == "TASKNAME":
            return self.task()
        raise SyntaxError(
            f"Unexpected token {tok.text!r} at offset {tok.pos}"
        )

    def task(self) -> Node:
        name = self.expect("TASKNAME")
        node: Node = TaskRef(name.text)
        if (tok := self.peek()) is not None and tok.kind == "LPAREN":
            self.next()
            group = self.group()
            self.expect("RPAREN")
            node = Conditional(TaskRef(name.text), group)
        return node

    def group(self) -> Group:
        branches = [self.expression()]
        while (tok := self.peek()) is not None and tok.kind == "SEP":
            self.next()
            branches.append(self.expression())
        return Group(branches)


def parse(code: str) -> Node:
    """Parse Pointy source into an AST. Raises SyntaxError (as the
    reference does) on malformed input, including empty source."""
    if not code or not code.strip():
        raise IndexError("No pointy code provided")
    tokens = tokenize(code)
    p = _Parser(tokens)
    node = p.expression()
    if p.peek() is not None:
        tok = p.peek()
        raise SyntaxError(
            f"Unexpected trailing token {tok.text!r} at offset {tok.pos}"
        )
    return node
