"""CompositeInputFormat join-expression DSL.

Reference: ``mapreduce/lib/join/CompositeInputFormat.java:85-179`` — the
user-facing surface of the map-side join framework is a *string* expression

    inner(tbl(<input-format>,"<path>"), tbl(...), ...)
    outer(...)                      # emit if ANY source has the key
    override(...)                   # rightmost source with the key wins

parsed by ``Parser.java:78,151,235-281`` (lexer → recursive descent → node
tree), with arbitrary nesting of composites. This module reproduces that
surface over DataFrames: ``tbl`` leaves name a Spark datasource format and a
path; composite verbs lower onto :mod:`.joins` (sort-merge / broadcast
chosen by Catalyst). A reference user's job spec therefore ports
mechanically: swap the InputFormat class for the Spark format name.

Differences, stated: the reference joins on each source's record *key*; here
the key is a named column (``key=`` argument). TupleWritable's positional
value slots are the sources' non-key columns, so those must be uniquely
named across sources (rename before composing, as q24 does).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import joins

_VERBS = ("inner", "outer", "override")

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<ident>[A-Za-z_][A-Za-z0-9_]*) |
        (?P<quoted>"[^"]*") |
        (?P<punct>[(),]) |
        (?P<bare>[^\s(),"]+)
    )""",
    re.VERBOSE,
)


@dataclass(frozen=True)
class Tbl:
    fmt: str
    path: str


@dataclass(frozen=True)
class Composite:
    verb: str  # inner | outer | override
    children: tuple


def _tokenize(expr: str) -> list[str]:
    tokens, pos = [], 0
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m or m.end() == m.start():
            raise ValueError(f"join expression: bad token at {expr[pos:pos + 20]!r}")
        tok = m.group("ident") or m.group("quoted") or m.group("punct") or m.group("bare")
        tokens.append(tok)
        pos = m.end()
    return tokens


def parse_join_expr(expr: str) -> Tbl | Composite:
    """Parse a CompositeInputFormat expression string into a node tree
    (Parser.java:235-281's TType.CIF/IDENT grammar)."""
    tokens = _tokenize(expr)
    pos = 0

    def peek() -> str | None:
        return tokens[pos] if pos < len(tokens) else None

    def eat(expected: str | None = None) -> str:
        nonlocal pos
        if pos >= len(tokens):
            raise ValueError(f"join expression: unexpected end after {tokens[-1]!r}")
        tok = tokens[pos]
        if expected is not None and tok != expected:
            raise ValueError(f"join expression: expected {expected!r}, got {tok!r}")
        pos += 1
        return tok

    def node() -> Tbl | Composite:
        head = eat()
        if head == "tbl":
            eat("(")
            fmt = eat()
            eat(",")
            path = eat().strip('"')
            eat(")")
            return Tbl(fmt, path)
        if head in _VERBS:
            eat("(")
            children = [node()]
            while peek() == ",":
                eat(",")
                children.append(node())
            eat(")")
            if len(children) < 2:
                raise ValueError(f"{head}() needs at least 2 sources")
            return Composite(head, tuple(children))
        raise ValueError(f"join expression: unknown operator {head!r}")

    tree = node()
    if pos != len(tokens):
        raise ValueError(f"join expression: trailing input {tokens[pos:]!r}")
    return tree


def compose(
    spark: SparkSession,
    expr: str,
    key: str,
    value_col: str | None = None,
) -> DataFrame:
    """Evaluate a join-expression string (CompositeInputFormat.compose +
    job run, in one call).

    ``key`` names the join column in every source (the reference's record
    key). ``value_col`` is required when the expression uses ``override`` —
    the column whose rightmost non-null value survives
    (OverrideRecordReader.java:36).
    """
    return _eval(spark, parse_join_expr(expr), key, value_col)


def _eval(spark, n, key: str, value_col: str | None) -> DataFrame:
    if isinstance(n, Tbl):
        return spark.read.format(n.fmt).load(n.path)
    dfs = [_eval(spark, c, key, value_col) for c in n.children]
    if n.verb == "inner":
        return joins.inner_join(dfs, key)
    if n.verb == "outer":
        return joins.full_outer_join(dfs, key)
    if value_col is None:
        raise ValueError("override(...) requires value_col")
    return joins.override_join(dfs, key, value_col, out_col=value_col)
