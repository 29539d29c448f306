"""Operator-tree queries — the reference's Sequelize find API.

The reference decodes "flattened path" JSON requests into a Sequelize
``Op`` tree and runs ``findAll``/``findOne``/``findByPk``
(sqlproxy.mjs:121-133, 197-395; SURVEY §2.3 Q4-Q6). Here the same tree
compiles to a ``pyspark.sql.Column`` predicate, so Catalyst sees a plain
filter it can push down to the scan.

Supported operators: the reference's explicit set ``and or not eq ne gt
lt is like notLike startsWith`` (sqlproxy.mjs:321-395) plus ``gte lte in
between endsWith substring`` which the reference left as a TODO
("TODO ADD all operators", sqlproxy.mjs:334).

Literal typing mirrors sqlproxy.mjs:325-333: ``'null'`` → NULL,
all-digits → int, float-looking → float; everything else stays a string.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INT_RE = re.compile(r"^-?[0-9]+$")
_FLOAT_RE = re.compile(r"^-?[0-9]*\.[0-9]+$")

LOGICAL_OPS = {"and", "or", "not"}
COMPARISON_OPS = {
    "eq",
    "ne",
    "gt",
    "lt",
    "gte",
    "lte",
    "is",
    "like",
    "notLike",
    "startsWith",
    "endsWith",
    "substring",
    "in",
    "notIn",
    "between",
    "notBetween",
}


def type_literal(value: Any) -> Any:
    """Auto-cast string operands the way the reference does (Q6)."""
    if isinstance(value, str):
        if value == "null":
            return None
        if _INT_RE.match(value):
            return int(value)
        if _FLOAT_RE.match(value):
            return float(value)
    return value


#: Pattern operators take their operand VERBATIM — auto-casting would turn
#: `like "404"` into `like(404)` (a py4j signature error) and `like "null"`
#: into like(None).
_PATTERN_OPS = {"like", "notLike", "startsWith", "endsWith", "substring"}


def _compare(col: Column, op: str, value: Any) -> Column:
    if op not in _PATTERN_OPS:
        value = type_literal(value)
    elif value is not None:
        value = str(value)
    if op == "eq":
        return col.isNull() if value is None else col == F.lit(value)
    if op == "ne":
        return col.isNotNull() if value is None else col != F.lit(value)
    if op == "is":
        return col.isNull() if value is None else col == F.lit(value)
    if op == "gt":
        return col > F.lit(value)
    if op == "lt":
        return col < F.lit(value)
    if op == "gte":
        return col >= F.lit(value)
    if op == "lte":
        return col <= F.lit(value)
    if op == "like":
        return col.like(value)
    if op == "notLike":
        return ~col.like(value)
    if op == "startsWith":
        return col.startswith(value)
    if op == "endsWith":
        return col.endswith(value)
    if op == "substring":
        return col.contains(value)
    if op == "in":
        return col.isin(*[type_literal(v) for v in value])
    if op == "notIn":
        return ~col.isin(*[type_literal(v) for v in value])
    if op == "between":
        lo, hi = (type_literal(v) for v in value)
        return col.between(F.lit(lo), F.lit(hi))
    if op == "notBetween":
        lo, hi = (type_literal(v) for v in value)
        return ~col.between(F.lit(lo), F.lit(hi))
    raise ValueError(f"unsupported operator: <{op}>")


def compile_where(tree: Any) -> Column:
    """Compile an operator tree (dict/list nesting) to a Column predicate.

    Shapes accepted (mirroring the decoded Sequelize tree):
      {"and": [subtree, ...]}            logical conjunction
      {"or":  [subtree, ...]}            logical disjunction
      {"not": subtree}                   negation
      {"col": {"op": operand}}           comparison
      {"col": literal}                   shorthand for eq
      {"colA": ..., "colB": ...}         implicit AND across keys
    """
    if isinstance(tree, dict):
        parts: list[Column] = []
        for key, value in tree.items():
            key_name = key.strip("<>")  # accept the reference's '<or>' spelling
            if key_name in ("and", "or"):
                if not isinstance(value, (list, tuple)):
                    value = [value]
                sub = [compile_where(v) for v in value]
                combined = reduce((lambda a, b: a & b) if key_name == "and" else (lambda a, b: a | b), sub)
                parts.append(combined)
            elif key_name == "not":
                parts.append(~compile_where(value))
            elif isinstance(value, dict):
                col = F.col(f"`{key_name}`")
                comp = [
                    _compare(col, op.strip("<>"), operand)
                    for op, operand in value.items()
                ]
                parts.append(reduce(lambda a, b: a & b, comp))
            else:
                lit = type_literal(value)
                col = F.col(f"`{key_name}`")
                parts.append(col.isNull() if lit is None else col == F.lit(lit))
        if not parts:
            return F.lit(True)
        return reduce(lambda a, b: a & b, parts)
    raise ValueError(f"cannot compile where tree: {tree!r}")


def find_all(
    df: DataFrame,
    where: Any = None,
    attributes: list[str] | None = None,
    order: list[tuple[str, str]] | None = None,
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """findAll (sqlproxy.mjs:121-133): filter → project → sort → limit."""
    out = df
    if where is not None:
        out = out.where(compile_where(where))
    if attributes:
        out = out.select(*[F.col(f"`{a}`") for a in attributes])
    if order:
        cols = [
            F.col(f"`{name}`").desc() if str(direction).upper().startswith("DESC") else F.col(f"`{name}`").asc()
            for name, direction in order
        ]
        out = out.orderBy(*cols)
    if offset:
        # Spark has no OFFSET on DataFrames pre-collect; emulate with a
        # window-free row_number only when requested (rare path).
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def find_one(df: DataFrame, where: Any = None, attributes: list[str] | None = None) -> DataFrame:
    return find_all(df, where=where, attributes=attributes, limit=1)


def find_by_pk(df: DataFrame, pk_column: str, pk_value: Any) -> DataFrame:
    return df.where(F.col(f"`{pk_column}`") == F.lit(type_literal(pk_value))).limit(1)
