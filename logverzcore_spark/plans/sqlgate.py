"""SQL validation gate + legacy ingest-dialect shim.

The reference gates interactive SQL by asking the target RDBMS for a plan
and rejecting anything that is not a single SELECT, while also extracting
the referenced tables for per-table ACL checks
(p2pconnection.js:353-488, SURVEY §2.3 Q2). We do the same with Spark's
own parser: ``sessionState().sqlParser().parsePlan`` gives us the
unresolved logical plan without executing anything; we reject
command/DML/DDL node types and walk the tree (including subquery
expressions) for ``UnresolvedRelation`` table references.

The ingest-filter dialect shim (SURVEY §2.2 P2, §7 "what's hard" #1)
rewrites the reference's S3-Select-descended query strings —
``SELECT s.* FROM S3Object[*].Records[*] s WHERE …`` — onto a staged
temp view, and maps ``IS [NOT] MISSING`` to ``IS [NOT] NULL``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

#: Structural ancestors that mark a parsed plan as a statement with side
#: effects / catalog access rather than a query. ``Command`` covers all
#: DDL/utility nodes (DropTable, DropView, TruncateTable, ShowTables,
#: DescribeRelation, SetCommand, …) — a class-NAME fragment list cannot,
#: because e.g. ``DropView`` and ``ShowTables`` contain no common
#: fragment. ``ParsedStatement`` is the legacy pre-resolution DDL parent
#: kept for older Spark lineages.
_COMMAND_BASES = (
    "org.apache.spark.sql.catalyst.plans.logical.Command",
    "org.apache.spark.sql.catalyst.plans.logical.ParsedStatement",
)

#: DML statements parse to plain logical plans (not Command subclasses);
#: they are rejected by exact class name. ``UnresolvedExecuteImmediate``
#: (Spark 4's EXECUTE IMMEDIATE) is dynamic SQL — the embedded string
#: (possibly a session variable) would be parsed and RUN at execution,
#: completely dodging this gate, so it is rejected even when the payload
#: happens to be a SELECT. ``Call`` invokes catalog stored procedures
#: (side effects by definition).
_FORBIDDEN_EXACT = {
    "InsertIntoStatement",
    "InsertIntoDir",
    "DeleteFromTable",
    "UpdateTable",
    "MergeIntoTable",
    "UnresolvedExecuteImmediate",
    "Call",
}

#: Expression-level deny list: functions that invoke arbitrary JVM code
#: from inside an otherwise-pure SELECT. ``reflect``/``java_method``/
#: ``try_reflect`` all lower to the same CallMethodViaReflection escape
#: hatch (any accessible static method: ``System.exit``, property
#: reads, …) — the reference's RDS target has no such hole, so a
#: SELECT-only gate that forwards them to a shared Spark driver would be
#: STRICTLY weaker than the semantics it reproduces.
_DENIED_FUNCTIONS = {"reflect", "java_method", "try_reflect"}

#: Allowed exceptions (the reference lets users run EXPLAIN —
#: Samplesqlqueries.txt:65).
_ALLOWED_EXACT = {"ExplainCommand"}


def _is_command_plan(spark: SparkSession, plan) -> bool:
    """True when the plan structurally IS-A Command/ParsedStatement."""
    jvm = spark._jvm
    plan_cls = plan.getClass()
    for base in _COMMAND_BASES:
        try:
            if jvm.java.lang.Class.forName(base).isAssignableFrom(plan_cls):
                return True
        except Exception:
            continue  # base class absent in this Spark version
    return False

_LEGACY_FROM_RE = re.compile(
    r"\bFROM\s+S3Object(?:\[\*\])?(?:\.\w+(?:\[\*\])?)*", re.IGNORECASE
)
_IS_MISSING_RE = re.compile(r"\bIS\s+MISSING\b", re.IGNORECASE)
_IS_NOT_MISSING_RE = re.compile(r"\bIS\s+NOT\s+MISSING\b", re.IGNORECASE)


class SqlValidationError(ValueError):
    """Raised when a statement fails the SELECT-only gate."""


@dataclass
class ValidationResult:
    statement_type: str
    tables: list[str] = field(default_factory=list)


def rewrite_legacy_query(query: str, view_name: str) -> str:
    """Rewrite the reference's legacy ingest dialect onto ``view_name``.

    ``FROM S3Object[*].Records[*] s`` → ``FROM view_name s`` (alias kept);
    ``IS MISSING`` → ``IS NULL``. Standard SQL passes through untouched.
    """
    out = _LEGACY_FROM_RE.sub(f"FROM {view_name}", query)
    out = _IS_NOT_MISSING_RE.sub("IS NOT NULL", out)
    out = _IS_MISSING_RE.sub("IS NULL", out)
    return out


def _walk_expr(expr, seen: dict) -> None:
    """Reject denied function invocations anywhere in an expression tree
    (including inside lambdas, CASE arms, and nested calls). Names are
    checked on their LAST part, so ``builtin.reflect`` and bare
    ``reflect`` both trip.

    ``seen`` maps id -> the visited py4j proxy, NOT a bare id set: each
    accessor call returns a FRESH transient proxy, so a bare-id guard
    never legitimately fires on a tree walk — but once a freed proxy's
    address is reused by a later node, ``id(new) in seen`` false-
    positives and SILENTLY SKIPS the subtree (observed as a GC-layout-
    dependent flake: an IN-subquery's table vanished from extraction
    mid-suite; the same skip could bypass the denied-function check).
    Holding the proxy in the dict pins its address for the walk, so a
    hit can only be a genuine revisit."""
    if expr is None or id(expr) in seen:
        return
    seen[id(expr)] = expr
    if expr.getClass().getSimpleName() == "UnresolvedFunction":
        parts = expr.nameParts()
        fname = parts.apply(parts.size() - 1).lower()
        if fname in _DENIED_FUNCTIONS:
            raise SqlValidationError(
                f"function {fname!r} is not permitted (arbitrary JVM invocation)"
            )
    children = expr.children()
    for i in range(children.size()):
        _walk_expr(children.apply(i), seen)


def _walk_plan(node, tables: list[str], seen: dict, scope: frozenset[str]) -> None:
    """Collect table references, resolving CTE names LEXICALLY.

    ``scope`` holds the CTE names visible at this point. Scoping matters
    for security: in ``WITH t AS (SELECT * FROM t) SELECT * FROM t`` the
    inner ``FROM t`` reads the REAL table (Spark CTEs are non-recursive),
    so a flat "drop every name that matches a CTE" filter would strip a
    genuine reference and bypass the per-table ACL check. Here each CTE
    body is walked with only the PREVIOUSLY defined CTEs in scope (a
    self-reference therefore counts as a real table), and only the main
    query sees the full CTE set."""
    if node is None or id(node) in seen:
        return
    seen[id(node)] = node  # pin the proxy: see _walk_expr's seen note
    expr_seen: dict = {}
    exprs = node.expressions()
    for i in range(exprs.size()):
        _walk_expr(exprs.apply(i), expr_seen)
    name = node.getClass().getSimpleName()
    if name == "UnresolvedRelation":
        parts = node.multipartIdentifier()
        ref = ".".join(parts.apply(i) for i in range(parts.size()))
        if ref not in scope:
            tables.append(ref)
        return
    if name == "UnresolvedWith":
        ctes = node.cteRelations()
        body_scope = scope
        for i in range(ctes.size()):
            pair = ctes.apply(i)
            _walk_plan(pair._2(), tables, seen, body_scope)
            body_scope = body_scope | {pair._1()}
        children = node.children()
        for i in range(children.size()):
            _walk_plan(children.apply(i), tables, seen, body_scope)
        return
    children = node.children()
    for i in range(children.size()):
        _walk_plan(children.apply(i), tables, seen, scope)
    # The guard covers ONLY the subqueries() accessor (absent on some
    # node types) — the recursive walk must stay OUTSIDE it, or a
    # SqlValidationError raised inside a subquery (e.g. a denied
    # function under EXISTS) is silently swallowed and the statement
    # passes the gate.
    try:
        subqueries = node.subqueries()
    except Exception:
        return
    for i in range(subqueries.size()):
        _walk_plan(subqueries.apply(i), tables, seen, scope)


def validate_select(spark: SparkSession, query: str, allow_explain: bool = True) -> ValidationResult:
    """Assert ``query`` is a single SELECT (or EXPLAIN) statement; return
    its type and referenced table names. Raises SqlValidationError
    otherwise — this is the reference's Q2 gate on Spark's parser."""
    # No manual ';' scan: parsePlan parses exactly ONE statement and
    # raises on trailing input (`SELECT 1; DROP TABLE x` → ParseException),
    # while a naive substring check would reject legal queries whose
    # string literals contain semicolons (user agents, URLs, cookies).
    stripped = query.strip().rstrip(";").strip()
    parser = spark._jsparkSession.sessionState().sqlParser()
    try:
        plan = parser.parsePlan(stripped)
    except Exception as exc:  # ParseException via py4j
        raise SqlValidationError(f"statement failed to parse: {exc}") from exc
    cls = plan.getClass().getSimpleName()
    if cls in _ALLOWED_EXACT:
        if not allow_explain:
            raise SqlValidationError("EXPLAIN not permitted here")
        # EXPLAIN of a command (``EXPLAIN DROP TABLE t``) still plans the
        # command and leaks catalog state — gate the wrapped plan too.
        inner = plan.logicalPlan()
        if _is_command_plan(spark, inner) or inner.getClass().getSimpleName() in _FORBIDDEN_EXACT:
            raise SqlValidationError("EXPLAIN is only permitted on SELECT statements")
        stmt_type = "EXPLAIN"
        plan = inner  # extract tables from the explained query
    elif _is_command_plan(spark, plan) or cls in _FORBIDDEN_EXACT:
        raise SqlValidationError(f"only SELECT statements are permitted (got {cls})")
    else:
        stmt_type = "SELECT"
    tables: list[str] = []
    _walk_plan(plan, tables, {}, frozenset())
    # Dedup preserving order.
    unique = list(dict.fromkeys(tables))
    return ValidationResult(statement_type=stmt_type, tables=unique)


def validate_staged_query(spark: SparkSession, query: str, view_name: str) -> str:
    """Gate an ingest-time query (already legacy-rewritten) against the
    staged view: must be a single SELECT whose only table reference is
    ``view_name``. The reference ran the ingest WHERE in a throwaway
    per-file SQLite (worker.js:258-312), so it could touch nothing else;
    without this check a CollectJob query could read any session table
    (ACL bypass) or embed DDL. Returns the query for chaining."""
    result = validate_select(spark, query, allow_explain=False)
    extra = [t for t in result.tables if t != view_name]
    if extra or not result.tables:
        raise SqlValidationError(
            f"ingest query may reference only the staged data ({view_name}); got {result.tables}"
        )
    return query
