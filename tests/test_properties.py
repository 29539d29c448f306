"""Property-based tests (hypothesis): coercion and SQL-gate invariants
that example tests can't sweep — arbitrary strings through the coercion
semantics, and arbitrary identifier/literal content through the
SELECT-only gate's rewriter.

Spark jobs are expensive per example, so each property collects its
hypothesis-generated values into ONE DataFrame and runs ONE job.
"""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logverzcore_spark.operators.coerce import coerce
from logverzcore_spark.plans.sqlgate import rewrite_legacy_query

# Keep example counts small: the property work happens inside one Spark
# job per example batch; hypothesis shrinks on the Python side.
FAST = settings(max_examples=5, deadline=None)

# Strings the reference's ingest path can see in a CSV field: printable
# ASCII with the interesting markers mixed in.
field_text = st.one_of(
    st.sampled_from(["-", "", "null", "NULL", "Null", "[]", "true", "FALSE", " "]),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=20,
    ),
    st.integers(-10**12, 10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False).map(repr),
)


@FAST
@given(st.lists(field_text, min_size=1, max_size=50))
def test_coerce_int_total_and_marker_semantics(spark, values):
    """INTEGER coercion is total (never raises) and: null words and
    numeric markers → NULL; pure integer text → that integer; everything
    else → NULL (cast failure is NULL under non-ANSI coercion)."""
    schema = T.StructType([T.StructField("v", T.LongType())])
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = [r["v"] for r in coerce(df, schema).collect()]
    for raw, got in zip(values, out):
        if raw in ("-", "", "null", "NULL", "Null"):
            assert got is None, (raw, got)
        elif re.fullmatch(r"[+-]?\d+", raw) and -(2**63) <= int(raw) < 2**63:
            assert got == int(raw), (raw, got)


@FAST
@given(st.lists(field_text, min_size=1, max_size=50))
def test_coerce_string_idempotent(spark, values):
    """String coercion is idempotent: cleaning already-clean text changes
    nothing (re-ingesting an ingested table is a no-op)."""
    schema = T.StructType([T.StructField("v", T.StringType())])
    df = spark.createDataFrame([(v,) for v in values], "v string")
    once = coerce(df, schema)
    twice = coerce(once, schema)
    assert [r["v"] for r in once.collect()] == [r["v"] for r in twice.collect()]


@FAST
@given(st.lists(field_text, min_size=1, max_size=50))
def test_coerce_bool_never_guesses(spark, values):
    """BOOLEAN coercion yields True/False only for case-insensitive
    true/false text — anything else is NULL, never a truthy guess (the
    reference's indexOf bug made nearly every string true)."""
    schema = T.StructType([T.StructField("v", T.BooleanType())])
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = [r["v"] for r in coerce(df, schema).collect()]
    for raw, got in zip(values, out):
        low = raw.strip().lower()
        if low == "true":
            assert got is True
        elif low == "false":
            assert got is False
        else:
            assert got is None, (raw, got)


ident = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True)


@settings(max_examples=50, deadline=None)
@given(
    alias=ident,
    col=ident,
    value=st.integers(0, 10**6),
    depth=st.sampled_from(["S3Object", "S3Object[*]", "S3Object[*].Records[*]"]),
)
def test_legacy_rewrite_targets_view_and_is_idempotent(alias, col, value, depth):
    """Any legacy FROM-clause variant rewrites onto the staged view with
    alias preserved; rewriting standard SQL (including the rewritten
    output itself) is the identity."""
    q = f"SELECT {alias}.{col} FROM {depth} {alias} WHERE {col} > {value} AND {col} IS NOT MISSING"
    out = rewrite_legacy_query(q, "staged_view")
    assert "S3Object" not in out
    assert f"FROM staged_view {alias}" in out
    assert "MISSING" not in out and "IS NOT NULL" in out
    assert rewrite_legacy_query(out, "staged_view") == out


@settings(max_examples=50, deadline=None)
@given(lit=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30))
def test_legacy_rewrite_preserves_plain_sql(lit):
    """SQL without legacy markers passes through byte-identical — the shim
    must never corrupt user literals (only word-bounded S3Object/IS
    MISSING trigger it)."""
    safe = lit.replace("'", "")
    if re.search(r"\bS3Object\b|\bIS\s+(NOT\s+)?MISSING\b", safe, re.IGNORECASE):
        return
    q = f"SELECT * FROM t WHERE c = '{safe}'"
    assert rewrite_legacy_query(q, "staged_view") == q


# -- Operator-tree translator (Q4-Q6): random trees vs a Python oracle ------

op_leaf = st.sampled_from(["eq", "ne", "gt", "lt", "gte", "lte"])
num = st.integers(-5, 5)


@st.composite
def where_trees(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        col = draw(st.sampled_from(["a", "b"]))
        op = draw(op_leaf)
        return {col: {op: draw(num)}}
    kind = draw(st.sampled_from(["and", "or", "not"]))
    if kind == "not":
        return {"not": draw(where_trees(depth=depth - 1))}
    n = draw(st.integers(1, 3))
    return {kind: [draw(where_trees(depth=depth - 1)) for _ in range(n)]}


def _py_eval(tree, row):
    ops = {
        "eq": lambda x, v: x == v, "ne": lambda x, v: x != v,
        "gt": lambda x, v: x > v, "lt": lambda x, v: x < v,
        "gte": lambda x, v: x >= v, "lte": lambda x, v: x <= v,
    }
    (key, value), *rest = tree.items()
    assert not rest
    if key == "and":
        return all(_py_eval(t, row) for t in value)
    if key == "or":
        return any(_py_eval(t, row) for t in value)
    if key == "not":
        return not _py_eval(value, row)
    (op, operand), = value.items()
    return ops[op](row[key], operand)


@settings(max_examples=15, deadline=None)
@given(st.lists(where_trees(), min_size=1, max_size=4))
def test_optree_matches_python_oracle(spark, trees):
    """Any nesting of and/or/not over comparison leaves selects exactly
    the rows a direct Python evaluation selects (no NULLs involved —
    three-valued logic is covered by example tests)."""
    from logverzcore_spark.operators import optree

    rows = [(a, b) for a in range(-3, 4) for b in range(-3, 4)]
    df = spark.createDataFrame(rows, "a long, b long")
    for tree in trees:
        got = {(r["a"], r["b"]) for r in optree.find_all(df, where=tree).collect()}
        want = {(a, b) for a, b in rows if _py_eval(tree, {"a": a, "b": b})}
        assert got == want, tree


# ---------------------------------------------------------------------------
# Round-3 operator properties
# ---------------------------------------------------------------------------

ascii_doc = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=400
)


@FAST
@given(st.lists(ascii_doc, min_size=1, max_size=20))
def test_cdc_chunks_tile_exactly(spark, docs):
    """CDC chunk (start, len) pairs tile every payload exactly: starts
    begin at 1, are strictly increasing, and reconstructed coverage
    equals the byte length — for arbitrary ASCII payloads, including
    empty and shorter-than-window ones."""
    from logverzcore_spark.operators.multimodal import cdc_chunks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    rows = cdc_chunks(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_start"])
    for i, t in enumerate(docs):
        starts = sorted(by_doc.get(i, []))
        assert starts and starts[0] == 1  # every payload (even empty) chunks
        assert len(starts) == len(set(starts))


@FAST
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
def test_shard_assign_in_range_and_deterministic(spark, ids):
    """shard_assign: always lands in [0, n) and is a pure function of the
    id (same id → same shard within one run, across duplicates)."""
    from logverzcore_spark import export

    df = spark.createDataFrame([(i,) for i in ids + ids], "doc_id long")
    rows = df.select(
        "doc_id", export.shard_assign(F.col("doc_id"), 16).alias("s")
    ).collect()
    seen = {}
    for r in rows:
        assert 0 <= r["s"] < 16
        assert seen.setdefault(r["doc_id"], r["s"]) == r["s"]


@FAST
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("ab#0123456789"), min_size=4, max_size=24),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
def test_fuzzy_join_matches_bruteforce(spark, names):
    """Pigeonhole edit-distance pairs == brute force on arbitrary short
    identifier strings (same-length, distance ≤ 1)."""
    from logverzcore_spark.operators import fuzzyjoin

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "k long, name string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzyjoin.edit_distance_pairs(df, "name", "k", 1).collect()
    }
    a = df.selectExpr("k AS ka", "name AS na")
    b = df.selectExpr("k AS kb", "name AS nb")
    brute = {
        (r["ka"], r["kb"])
        for r in a.crossJoin(b)
        .where(
            (F.col("ka") < F.col("kb"))
            & (F.length("na") == F.length("nb"))
            & (F.levenshtein("na", "nb") <= 1)
        )
        .collect()
    }
    assert got == brute


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=8, max_size=60),
)
@FAST
def test_range_shard_assign_matches_bisect(spark, values):
    """range_shard_assign == bisect over the same bounds, for any data."""
    import bisect

    from logverzcore_spark import export as ex

    df = spark.createDataFrame([(v,) for v in values], "v long")
    bounds = ex.range_bounds(df, "v", n_shards=4)
    got = {
        r["v"]: r["shard"]
        for r in df.select("v", ex.range_shard_assign(F.col("v"), bounds))
        .distinct()
        .collect()
    }
    for v in set(values):
        assert got[v] == bisect.bisect_right(sorted(bounds), v) or (
            # equal-to-boundary: > excludes, bisect_right includes — both
            # sides agree because bounds are floats strictly compared
            got[v] == sum(1 for b in bounds if v > b)
        )


@given(
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=2, max_value=50),
    st.integers(min_value=1, max_value=49),
)
@FAST
def test_interpolation_lerp_is_exact_integer_math(spark, a, b, span, off):
    """The q103 integer lerp equals Python's floor-division linear
    interpolation for any endpoints/position."""
    off = min(off, span - 1)
    df = spark.createDataFrame(
        [(a, b, 0, span, off)], "a long, b long, ph long, nh long, h long"
    )
    got = df.select(
        F.expr("(a*(nh - h) + b*(h - ph)) div (nh - ph)").alias("v")
    ).first()["v"]
    assert got == (a * (span - off) + b * off) // span


@FAST
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=14,
    ),
    cuts=st.lists(st.integers(1, 13), max_size=3, unique=True),
)
def test_scd2_stream_fold_equals_batch(spark, obs, cuts):
    """ANY in-order batch split of an observation log folds to the same
    SCD2 history the batch build produces — versions, intervals, and
    collapse behavior are batch-boundary-invariant."""
    import uuid

    from logverzcore_spark.operators.eventops import scd2_history
    from logverzcore_spark.streaming.upsert import make_scd2_fold

    rows = [(i + 1, k, s) for i, (k, s) in enumerate(obs)]
    mk = lambda rs: spark.createDataFrame(
        rs, "eid long, k long, state string"
    ).withColumn("ts", F.col("eid").cast("timestamp"))
    expected = sorted(
        tuple(r) for r in scd2_history(
            mk(rows), key_col="k", ts_col="ts", attr_cols=["state"], tie_col="eid"
        ).collect()
    )
    table = f"t_scd2p_{uuid.uuid4().hex[:8]}"
    fold = make_scd2_fold(
        spark, table, key_col="k", ts_col="ts", attr_cols=["state"],
        tie_col="eid", n_buckets=4,
    )
    bounds = [0] + sorted(c for c in cuts if c < len(rows)) + [len(rows)]
    try:
        for bi in range(len(bounds) - 1):
            chunk = rows[bounds[bi]:bounds[bi + 1]]
            if chunk:
                fold(mk(chunk), bi)
        got = sorted(
            tuple(r) for r in spark.table(table)
            .select("k", "state", "valid_from", "valid_to", "is_current", "version")
            .collect()
        )
    finally:
        for t in (table, f"{table}_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    assert got == expected


@FAST
@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=200))
def test_isqrt_matches_python_exactly(spark, xs):
    """text.isqrt == math.isqrt for arbitrary non-negative longs — the
    ±1 correction must absorb every IEEE sqrt rounding direction
    (one batched Spark job per example list)."""
    import math

    from logverzcore_spark.operators.text import isqrt

    df = spark.createDataFrame([(int(x),) for x in xs], "x long")
    got = {r.x: r.s for r in df.select("x", isqrt(F.col("x")).alias("s")).collect()}
    for x in set(xs):
        assert got[x] == math.isqrt(x), x


@FAST
@given(
    st.dictionaries(
        st.sampled_from([f"s{i}" for i in range(8)]),
        st.integers(1, 10**6),
        min_size=1,
        max_size=8,
    ),
    st.integers(0, 10**9),
)
def test_largest_remainder_invariants(spark, weights, budget):
    """Hamilton allocation properties for ARBITRARY weights/budgets:
    allocations sum EXACTLY to the budget, each is within one unit of
    the exact proportional share, and every weighted source appears."""
    from logverzcore_spark.operators.text import mixture_allocation

    rows = [(i, src, "tok tok tok") for i, src in enumerate(sorted(weights))]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mixture_allocation(df, weights, total_tokens=budget).collect()
    assert sorted(r.source for r in out) == sorted(weights)
    assert sum(r.alloc_tokens for r in out) == budget
    wsum = sum(weights.values())
    for r in out:
        exact = budget * weights[r.source] / wsum
        assert abs(r.alloc_tokens - exact) < 1, (r.source, r.alloc_tokens, exact)


@settings(max_examples=40, deadline=None)
@given(
    recs=st.lists(
        st.fixed_dictionaries(
            {
                "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "s": st.one_of(st.none(), st.text(max_size=40)),
                "d": st.floats(allow_nan=False, allow_infinity=False,
                               width=64),
                "b": st.one_of(st.none(), st.binary(max_size=24)),
                "ok": st.booleans(),
            }
        ),
        max_size=60,
    ),
    codec=st.sampled_from(["null", "deflate"]),
    block=st.integers(min_value=1, max_value=17),
)
def test_avro_ocf_roundtrip_property(recs, codec, block):
    """encode_ocf∘decode_ocf is the identity for every supported value —
    including int64 edges, NaN-free doubles, empty strings/bytes, and
    arbitrary block boundaries (pure-python property; the Spark path is
    covered in test_ingest)."""
    from logverzcore_spark.sources.avro_ocf import decode_ocf, encode_ocf

    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
            {"name": "b", "type": ["bytes", "null"]},
            {"name": "ok", "type": "boolean"},
        ],
    }
    blob = encode_ocf(recs, schema, codec=codec, records_per_block=block)
    got_schema, got = decode_ocf(blob)
    assert got_schema == schema
    assert got == recs


# --- data-skipping interval evaluator: soundness under arbitrary data ---

from logverzcore_spark.snapshots import (  # noqa: E402
    _encode_stat,
    _file_can_match,
)

_int_or_none = st.one_of(st.none(), st.integers(-100, 100))
_str_or_none = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=8,
    ),
    # force the truncation path: strings beyond _STR_STAT_MAX
    st.text(alphabet=st.sampled_from("ab"), min_size=97, max_size=120),
    # the type_literal specials: 'null' compiles to IS NULL, numeric-
    # looking strings compile to numbers (Spark then casts the string
    # COLUMN for the comparison) — both must round-trip the pruner
    st.sampled_from(["null", "5", "05", "-3", "3.5", "0"]),
)
#: operands for the INT property get the same specials — {'eq': 'null'}
#: against an int column compiles to IS NULL and must never prune a
#: file whose null rows match
_int_operand = st.one_of(
    _int_or_none, st.sampled_from(["null", "5", "-3", "0"])
)

_ops = st.sampled_from(["eq", "ne", "gt", "gte", "lt", "lte"])


def _leaf(col, values):
    simple = st.builds(lambda op, v: {col: {op: v}}, _ops, values)
    inlist = st.builds(
        lambda vs: {col: {"in": vs}},
        st.lists(values.filter(lambda v: v is not None), min_size=1, max_size=4),
    )
    between = st.builds(
        lambda a, b: {col: {"between": [a, b]}},
        values.filter(lambda v: v is not None),
        values.filter(lambda v: v is not None),
    )
    isnull = st.just({col: None})
    return st.one_of(simple, inlist, between, isnull)


def _trees(leaf):
    return st.recursive(
        leaf,
        lambda sub: st.one_of(
            st.builds(lambda a, b: {"and": [a, b]}, sub, sub),
            st.builds(lambda a, b: {"or": [a, b]}, sub, sub),
            st.builds(lambda a: {"not": a}, sub),
        ),
        max_leaves=4,
    )


def _row_matches(tree, row):
    """Python mirror of compile_where over one row (SQL three-valued
    logic collapsed to 'matches or not', which is what a filter keeps).
    Models _compare's semantics: operands run through type_literal
    ('null' → IS NULL, numeric-looking strings → numbers), and a string
    COLUMN compared to a numeric literal is compared by casting the
    column (uncastable rows are NULL → no match) — the r9 divergence
    that hid the interval-pruning normalization bug."""
    from logverzcore_spark.operators.optree import type_literal

    def cmp(col, op, v):
        x = row[col]
        v = type_literal(v)
        if op in ("eq", "is") and v is None:
            return x is None
        if op == "ne" and v is None:
            return x is not None
        if x is None or v is None:
            return False
        if isinstance(x, str) and isinstance(v, (int, float)):
            try:
                x = float(x)  # Spark casts the string COLUMN to numeric
            except ValueError:
                return False  # uncastable row → NULL comparison
            v = float(v)
        elif isinstance(v, str) and isinstance(x, (int, float)):
            # a non-numeric-looking string literal vs a numeric column:
            # the literal casts to NULL — no row matches
            return False
        return {
            "eq": x == v, "is": x == v, "ne": x != v, "gt": x > v,
            "gte": x >= v, "lt": x < v, "lte": x <= v,
        }[op]

    for key, value in tree.items():
        if key == "and":
            if not all(_row_matches(v, row) for v in value):
                return False
        elif key == "or":
            if not any(_row_matches(v, row) for v in value):
                return False
        elif key == "not":
            if _row_matches(value, row):
                return False
        elif isinstance(value, dict):
            for op, operand in value.items():
                if op == "in":
                    # isin(NULL) never matches any row (3VL)
                    elems = [type_literal(v) for v in operand]
                    if not any(
                        v is not None and cmp(key, "eq", v) for v in elems
                    ):
                        return False
                elif op == "between":
                    lo, hi = (type_literal(v) for v in operand)
                    if lo is None or hi is None:
                        return False  # between(NULL, …) matches nothing
                    if not (cmp(key, "gte", lo) and cmp(key, "lte", hi)):
                        return False
                elif not cmp(key, op, operand):
                    return False
        else:
            if not cmp(key, "eq", value):
                return False
    return True


def _stats_for(values, dtype):
    nn = [v for v in values if v is not None]
    return {
        "rows": len(values),
        "cols": {
            "c": {
                "min": _encode_stat(min(nn), dtype, "min") if nn else None,
                "max": _encode_stat(max(nn), dtype, "max") if nn else None,
                "nulls": len(values) - len(nn),
            }
        },
    }


@settings(max_examples=300, deadline=None)
@given(
    st.lists(_int_or_none, min_size=0, max_size=12),
    _trees(_leaf("c", _int_operand)),
)
def test_interval_pruning_sound_for_ints(values, tree):
    """THE soundness property: if any row of the file matches the
    predicate, the file must never be pruned. (The converse — pruning
    everything prunable — is an optimization, not a contract.)"""
    fstats = _stats_for(values, "bigint")
    if any(_row_matches(tree, {"c": v}) for v in values):
        assert _file_can_match(tree, fstats, {"c": "bigint"}), (
            values, tree, fstats,
        )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(_str_or_none, min_size=0, max_size=12),
    _trees(_leaf("c", _str_or_none)),
)
def test_interval_pruning_sound_for_strings(values, tree):
    """Same property through the string path — truncation and prefix
    bumping included (long min/max bounds must still COVER every true
    value)."""
    fstats = _stats_for(values, "string")
    if any(_row_matches(tree, {"c": v}) for v in values):
        assert _file_can_match(tree, fstats, {"c": "string"}), (
            values, tree, fstats,
        )


# --- bounded tag history: replay-idempotence under arbitrary interleaving ---

from logverzcore_spark.snapshots import _fold_tags, _tag_seen  # noqa: E402

_prefixes = st.sampled_from(["a:batch-", "b:x:batch-", ":batch-"])
# One-offs deliberately include digit-ended names ISSUED OUT OF ORDER
# (report-2 may precede a NEW report-1) — the r10-ADVICE data-loss
# shape: only the ':batch-' streaming shape may get floor semantics,
# everything else must keep exact membership.
_oneoffs = st.sampled_from(
    ["manual", "backfill-q1", "backfill-2026q1", "fix",
     "x-2026-01-01-redo", "report-1", "report-2", "ck7", "b:5"]
)


@st.composite
def _tag_streams(draw):
    """An arbitrary interleaving of per-prefix MONOTONIC ':batch-'
    streaming tags and one-off tags (some digit-ended, in ANY order),
    with REPLAYS (re-delivery of an already-applied tag) mixed in."""
    n = draw(st.integers(1, 120))
    counters: dict[str, int] = {}
    applied: list[str] = []
    events: list[str] = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0 and applied:  # replay anything already applied
            events.append(draw(st.sampled_from(applied)))
        elif kind == 1:
            t = draw(_oneoffs)
            events.append(t)
            if t not in applied:
                applied.append(t)
        else:
            p = draw(_prefixes)
            # monotonic, possibly with gaps (skipped ids never arrive)
            counters[p] = counters.get(p, -1) + draw(st.integers(1, 3))
            t = f"{p}{counters[p]}"
            events.append(t)
            applied.append(t)
    return events, applied, counters


@settings(max_examples=400, deadline=None)
@given(_tag_streams())
def test_tag_history_replay_idempotence_property(stream):
    """THE tag-history contract under the r10 compression: after any
    interleaving of monotonic streaming tags, one-off tags, and
    replays, (a) every APPLIED tag is seen (a redelivery no-ops),
    (b) the never-applied NEXT id of every prefix is not seen (new
    work is never swallowed), (c) commits happened exactly once per
    distinct applied tag, and (d) a mid-stream legacy manifest (the
    pre-r10 cumulative list) folds without forgetting anything."""
    events, applied, counters = stream
    head: dict | None = None
    commits = 0
    so_far: list[str] = []
    for i, tag in enumerate(events):
        if _tag_seen(head, tag):
            continue
        all_tags, recent, floors = _fold_tags(head, tag)
        head = {
            "all_tags": all_tags,
            "recent_tags": recent,
            "tag_floors": floors,
        }
        commits += 1
        so_far.append(tag)
        if i == len(events) // 2:
            # simulate an upgrade mid-stream: collapse the history
            # APPLIED SO FAR into a legacy cumulative manifest and keep
            # going — the next fold must compress it losslessly
            head = {"all_tags": list(so_far)}
    assert commits == len(set(applied))
    for tag in applied:
        assert _tag_seen(head, tag), tag
    for p, c in counters.items():
        assert not _tag_seen(head, f"{p}{c + 1}"), p
    assert not _tag_seen(head, "never-applied-oneoff")
