"""Django-style lookup DSL → Spark ``Column`` compiler.

Re-expresses the reference's ResultSet filter DSL (nexus/result.py:162-467:
operator registry :166-178, dispatch :389-454, nested traversal :338-387)
as a pure function from kwargs to a Catalyst predicate. Because the output
is a ``Column``, every lookup participates in predicate pushdown and
whole-stage codegen for free — the reference's hand-written SQL pushdown
(nexus/backends/stores/sqlite_store.py:245-282) is subsumed by Catalyst.

Semantics preserved from the reference:

- ``field=value`` / ``field__exact=value`` — equality
- ``a__b__c=value`` — nested traversal (structs via dotted access, maps via
  ``element_at``), equality at the leaf
- trailing ``__<op>`` for: contains, icontains, startswith, endswith,
  gt, gte, lt, lte, in, isnull
- multiple kwargs AND together (result.py:314-336)
- NULL never matches any operator except ``isnull`` (result.py:400-404) —
  which is exactly SQL three-valued logic, so no special casing is needed
  beyond ``isnull`` itself.

Divergence (documented): the reference's ``contains`` on a dict checks
*keys*; for MapType columns we use ``map_contains_key`` to match.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILTER_OPERATORS = frozenset(
    {
        "contains",
        "startswith",
        "endswith",
        "icontains",
        "gt",
        "gte",
        "lt",
        "lte",
        "in",
        "exact",
        "isnull",
    }
)


class LookupError_(ValueError):
    """Raised for unresolvable fields or malformed lookups."""


def _resolve_path(
    schema: T.StructType | None, parts: list[str]
) -> tuple[Column, T.DataType | None]:
    """Walk a ``a__b__c`` path: structs via getField, maps via element_at.

    Returns the column plus its resolved type when the schema is known
    (type drives operator compilation, e.g. contains on array vs string).
    """
    col = F.col(parts[0])
    dtype: T.DataType | None = None
    if schema is not None:
        match = next((f for f in schema.fields if f.name == parts[0]), None)
        if match is None:
            raise LookupError_(
                f"unknown field {parts[0]!r}; available: {[f.name for f in schema.fields]}"
            )
        dtype = match.dataType

    for part in parts[1:]:
        if dtype is None:
            col = col.getField(part)
        elif isinstance(dtype, T.StructType):
            sub = next((f for f in dtype.fields if f.name == part), None)
            if sub is None:
                raise LookupError_(f"struct has no field {part!r} in path {parts}")
            col, dtype = col.getField(part), sub.dataType
        elif isinstance(dtype, T.MapType):
            col, dtype = F.element_at(col, F.lit(part)), dtype.valueType
        else:
            raise LookupError_(
                f"cannot traverse into {dtype.simpleString() if dtype else '?'} at"
                f" {part!r} in path {parts}"
            )
    return col, dtype


def _compile_one(
    schema: T.StructType | None, key: str, value: Any
) -> Column:
    parts = key.split("__")
    op = "exact"
    if len(parts) > 1 and parts[-1] in FILTER_OPERATORS:
        op = parts[-1]
        parts = parts[:-1]
    col, dtype = _resolve_path(schema, parts)

    if op == "exact":
        return col == F.lit(value)
    if op == "contains":
        if isinstance(dtype, T.ArrayType):
            return F.array_contains(col, value)
        if isinstance(dtype, T.MapType):
            # reference: `x in dict` checks keys (result.py:406-409)
            return F.map_contains_key(col, F.lit(value))
        return col.contains(value)
    if op == "icontains":
        return F.lower(col).contains(str(value).lower())
    if op == "startswith":
        return col.startswith(value)
    if op == "endswith":
        return col.endswith(value)
    if op == "gt":
        return col > F.lit(value)
    if op == "gte":
        return col >= F.lit(value)
    if op == "lt":
        return col < F.lit(value)
    if op == "lte":
        return col <= F.lit(value)
    if op == "in":
        if not isinstance(value, Iterable) or isinstance(value, (str, bytes)):
            raise LookupError_(f"__in requires an iterable, got {type(value).__name__}")
        return col.isin(*list(value))
    if op == "isnull":
        return col.isNull() if value else col.isNotNull()
    raise LookupError_(f"unknown operator {op!r}")  # pragma: no cover


def compile_filters(
    schema: T.StructType | None = None, /, **filters: Any
) -> Column:
    """Compile lookup kwargs into one AND-ed Catalyst predicate."""
    if not filters:
        return F.lit(True)
    preds = [_compile_one(schema, k, v) for k, v in filters.items()]
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def where(df: DataFrame, **filters: Any) -> DataFrame:
    """``df`` filtered by the lookup DSL (schema-aware)."""
    return df.where(compile_filters(df.schema, **filters))
