"""SnapshotTable data skipping: commit-time file stats, interval
pruning, metadata-only counts, analyze backfill.

The invariant under test everywhere: ``read(where=...)`` returns
EXACTLY ``read().filter(compile_where(where))`` rows — pruning may only
remove files that provably cannot match (sound), never change results
(the residual filter runs regardless). Reference parity: the registry's
declared-but-empty "Indexes" facility (SURVEY §1.1) — file-interval
skipping is the scan engine's equivalent of that intent.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.operators.optree import compile_where
from logverzcore_spark.snapshots import (
    SnapshotTable,
    _bump_prefix,
    _file_can_match,
)


def _mkroot(tmpdir_path) -> str:
    return os.path.join(str(tmpdir_path), f"snap_{uuid.uuid4().hex[:8]}")


def _corpus(spark):
    return (
        spark.range(0, 1200)
        .withColumn("k", F.col("id").cast("int"))
        .withColumn(
            "s",
            F.concat(
                F.lit("doc-"), F.lpad(F.col("id").cast("string"), 6, "0")
            ),
        )
        .withColumn(
            "ts",
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=F.col("id")),
        )
        .withColumn(
            "d",
            F.date_add(F.to_date(F.lit("2026-01-01")), (F.col("k") / 100).cast("int")),
        )
        .withColumn("flag", F.col("id") % 2 == 0)
    )


def _ranged_table(spark, tmpdir_path, **kw) -> SnapshotTable:
    """Four appends with disjoint id ranges — the prunable layout."""
    t = SnapshotTable(_mkroot(tmpdir_path), **kw)
    df = _corpus(spark)
    for lo in (0, 300, 600, 900):
        t.append(
            df.where((F.col("id") >= lo) & (F.col("id") < lo + 300)).coalesce(2)
        )
    return t


def test_stats_collected_per_file_and_count_is_metadata_only(spark, tmpdir_path):
    t = _ranged_table(spark, tmpdir_path)
    m = t._read_manifest(spark, 4)
    assert set(m["stats"]) == set(m["files"])  # every file has stats
    assert m["stats_schema"]["k"] == "int"
    assert m["stats_schema"]["ts"] == "timestamp"
    # boolean + date + string all eligible
    assert {"s", "d", "flag"} <= set(m["stats_schema"])
    total = sum(e["rows"] for e in m["stats"].values())
    assert total == 1200
    assert t.count(spark) == 1200
    assert t.count(spark, version=1) == 300


def test_prune_is_selective_and_read_where_is_exact(spark, tmpdir_path):
    t = _ranged_table(spark, tmpdir_path)
    predicates = [
        {"k": {"between": [310, 340]}},
        {"k": {"gte": 1100}},
        {"k": 42},
        {"s": {"gte": "doc-000900"}},
        {"ts": {"lt": "2026-01-01 00:04:10"}},
        {"d": {"eq": "2026-01-03"}},
        {"and": [{"k": {"gte": 250}}, {"k": {"lt": 350}}]},
        {"or": [{"k": {"lt": 10}}, {"k": {"gte": 1190}}]},
        {"k": {"in": [5, 6, 7]}},
    ]
    for where in predicates:
        kept, total = t.prune_files(spark, where)
        assert 0 < len(kept) < total, (where, len(kept), total)
        got = sorted(r["id"] for r in t.read(spark, where=where).collect())
        want = sorted(
            r["id"]
            for r in t.read(spark).filter(compile_where(where)).collect()
        )
        assert got == want, where


def test_unprunable_shapes_keep_all_files_but_stay_exact(spark, tmpdir_path):
    t = _ranged_table(spark, tmpdir_path)
    # pattern ops, not, unknown column, notIn: interval algebra punts —
    # all files kept, result still exact via the residual filter.
    for where in (
        {"s": {"like": "doc-0003%"}},
        {"not": {"k": {"lt": 600}}},
        {"k": {"notIn": [1, 2]}},
    ):
        kept, total = t.prune_files(spark, where)
        assert len(kept) == total, where
        got = t.read(spark, where=where).count()
        want = t.read(spark).filter(compile_where(where)).count()
        assert got == want, where


def test_no_matching_file_returns_empty_with_schema(spark, tmpdir_path):
    t = _ranged_table(spark, tmpdir_path)
    kept, total = t.prune_files(spark, {"k": 999999})
    assert kept == []
    out = t.read(spark, where={"k": 999999})
    assert out.count() == 0
    assert set(out.columns) == {"id", "k", "s", "ts", "d", "flag"}


def test_string_truncation_bounds_are_sound(spark, tmpdir_path):
    # values are 200-char strings; stats store a 96-char truncation whose
    # max is prefix-bumped, so the interval still COVERS every true value.
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = (
        spark.range(0, 100)
        .withColumn(
            "pad",
            F.concat(
                F.lit("k"),
                F.lpad(F.col("id").cast("string"), 4, "0"),
                F.repeat(F.lit("z"), 195),
            ),
        )
    )
    t.append(df.where("id < 50").coalesce(1))
    t.append(df.where("id >= 50").coalesce(1))
    m = t._read_manifest(spark, 2)
    for ent in m["stats"].values():
        assert len(ent["cols"]["pad"]["min"]) <= 96
        assert len(ent["cols"]["pad"]["max"]) <= 96
    # a value inside file 1's true range must never prune file 1
    probe = "k0007" + "z" * 195
    kept, total = t.prune_files(spark, {"pad": probe})
    assert total == 2 and len(kept) >= 1
    assert t.read(spark, where={"pad": probe}).count() == 1
    # range predicate prunes the other file
    kept, _ = t.prune_files(spark, {"pad": {"gte": "k0099"}})
    assert len(kept) == 1


def test_bump_prefix_edge_cases():
    assert _bump_prefix("abc") == "abd"
    assert _bump_prefix("ab" + chr(0x10FFFF)) == "ac"
    assert _bump_prefix(chr(0x10FFFF) * 3) is None


def test_all_null_and_nan_files(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(
        spark.range(0, 10)
        .withColumn("v", F.lit(None).cast("double"))
        .coalesce(1)
    )
    t.append(
        spark.range(10, 20)
        .withColumn(
            "v",
            F.when(F.col("id") == 15, F.lit(float("nan"))).otherwise(
                F.col("id").cast("double")
            ),
        )
        .coalesce(1)
    )
    m = t._read_manifest(spark, 2)
    ents = [e["cols"]["v"] for e in m["stats"].values()]
    null_ent = next(e for e in ents if e["nulls"] == 10)
    nan_ent = next(e for e in ents if e["nulls"] == 0)
    # all-null file: bounds are None, nulls == rows
    assert null_ent["min"] is None and null_ent["max"] is None
    # NaN poisons max (Spark sorts NaN above everything): the bound is
    # dropped, never stored as a non-finite JSON value
    assert nan_ent["max"] is None
    assert nan_ent["min"] is not None
    # comparisons prune the all-null file, keep the NaN file (no max bound)
    kept, total = t.prune_files(spark, {"v": {"gte": 100.0}})
    assert total == 2 and len(kept) == 1
    # IS NULL keeps the all-null file, prunes the null-free one
    kept, _ = t.prune_files(spark, {"v": None})
    assert len(kept) == 1
    got = t.read(spark, where={"v": {"gte": 11.0}}).count()
    want = t.read(spark).filter("v >= 11.0").count()
    assert got == want


def test_empty_append_and_zero_row_files(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 10).withColumn("k", F.col("id").cast("int"))
    t.append(df.coalesce(1))
    t.append(df.limit(0).coalesce(1))  # zero-row commit
    assert t.count(spark) == 10
    kept, total = t.prune_files(spark, {"k": {"gte": 0}})
    # zero-row files are always prunable
    assert len(kept) < total or total == 1
    assert t.read(spark, where={"k": {"gte": 0}}).count() == 10


def test_analyze_backfills_pre_stats_manifests(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    plain = SnapshotTable(root, stats_columns=False)
    df = spark.range(0, 100).withColumn("k", F.col("id").cast("int"))
    plain.append(df.where("id < 50").coalesce(1))
    plain.append(df.where("id >= 50").coalesce(1))
    m = plain._read_manifest(spark, 2)
    assert m.get("stats", {}) == {}
    # count falls back to a distributed count without stats
    assert plain.count(spark) == 100
    t = SnapshotTable(root)
    v = t.analyze(spark)
    assert v == 3
    m = t._read_manifest(spark, v)
    assert set(m["stats"]) == set(m["files"])
    assert t.count(spark) == 100  # now metadata-only
    kept, total = t.prune_files(spark, {"k": {"lt": 10}})
    assert len(kept) == 1 and total == 2
    # analyze is idempotent: nothing missing -> no new commit
    assert t.analyze(spark) == v


def test_stats_columns_allowlist_and_overwrite_resets(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path), stats_columns=["k"])
    df = (
        spark.range(0, 100)
        .withColumn("k", F.col("id").cast("int"))
        .withColumn("other", F.col("id") * 2)
    )
    t.append(df.coalesce(1))
    m = t._read_manifest(spark, 1)
    assert set(m["stats_schema"]) == {"k"}
    # overwrite: stats describe ONLY the new files
    t.overwrite(df.where("id < 7").coalesce(1))
    m = t._read_manifest(spark, 2)
    assert set(m["stats"]) == set(m["files"])
    assert t.count(spark) == 7
    # old version's stats still resolvable
    assert t.count(spark, version=1) == 100


def test_append_carries_parent_stats_forward(spark, tmpdir_path):
    t = _ranged_table(spark, tmpdir_path)
    m4 = t._read_manifest(spark, 4)
    m1 = t._read_manifest(spark, 1)
    for f in m1["files"]:
        assert m4["stats"][f] == m1["stats"][f]


def test_file_can_match_missing_stats_is_conservative():
    assert _file_can_match({"k": 5}, None, {"k": "int"})
    assert _file_can_match({"k": 5}, {"rows": 3, "cols": {}}, {"k": "int"})
    # column present but not in schema: keep
    assert _file_can_match(
        {"k": 5}, {"rows": 3, "cols": {"k": {"min": 9, "max": 9, "nulls": 0}}}, {}
    )


def test_ne_prunes_only_constant_files(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 20).withColumn(
        "c", F.when(F.col("id") < 10, 7).otherwise(F.col("id")).cast("int")
    )
    t.append(df.where("id < 10").coalesce(1))  # c == 7 constant
    t.append(df.where("id >= 10").coalesce(1))
    kept, total = t.prune_files(spark, {"c": {"ne": 7}})
    assert total == 2 and len(kept) == 1
    got = t.read(spark, where={"c": {"ne": 7}}).count()
    assert got == 10


def test_q132_fixture_actually_prunes(spark, tmpdir_path):
    """The graded entry proves results; this proves the SKIP: the
    year-ranged commit layout must let the one-year predicate prune at
    least one whole commit's files before any scan."""
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    t = SnapshotTable(_mkroot(tmpdir_path))
    yr = F.year("o_orderdate")
    for lo, hi in ((1995, 1997), (1997, 1999), (1999, 2002)):
        t.append(orders.where((yr >= lo) & (yr < hi)))
    where = {"o_orderdate": {"gte": "1997-01-01", "lt": "1998-01-01"}}
    kept, total = t.prune_files(spark, where)
    assert len(kept) < total  # files outside 1997-1998 never scanned
    got = t.read(spark, where=where).count()
    want = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).count()
    assert got == want


def test_cross_type_literals_never_prune(spark, tmpdir_path):
    """Spark compares a numeric literal against a STRING column by
    casting the column ('05' == 5 matches); lexicographic intervals
    can't mirror that, so such predicates must keep every file — and
    still return the cast-correct result via the residual filter."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 20).selectExpr(
        "id", "lpad(cast(id AS string), 2, '0') AS z"
    )
    t.append(df.where("id < 10").coalesce(1))
    t.append(df.where("id >= 10").coalesce(1))
    # '05' is lexicographically far from 5 — a wrong prune would lose it
    kept, total = t.prune_files(spark, {"z": 5})
    assert len(kept) == total  # numeric-vs-string: no pruning allowed
    assert t.read(spark, where={"z": 5}).count() == 1  # Spark casts: '05'==5
    # int literal vs timestamp column likewise keeps all files
    t2 = SnapshotTable(_mkroot(tmpdir_path))
    t2.append(
        spark.range(0, 5).selectExpr(
            "id", "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts"
        ).coalesce(1)
    )
    kept, total = t2.prune_files(spark, {"ts": {"gte": 12345}})
    assert len(kept) == total


def test_schema_evolution_column_additive(spark, tmpdir_path):
    """The manifest records the column-additive union schema: an append
    that ADDS a column must not be silently dropped by Spark's
    sample-one-file parquet schema (the default behavior without
    mergeSchema); files that predate the column read it as null; old
    versions keep their own schema; a TYPE conflict refuses loudly."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(0, 5).withColumn("a", F.lit(1)))
    t.append(
        spark.range(5, 10).withColumn("a", F.lit(2)).withColumn("b", F.lit("new"))
    )
    df = t.read(spark)
    assert set(df.columns) == {"id", "a", "b"}
    rows = {r["id"]: r["b"] for r in df.collect()}
    assert rows[0] is None and rows[7] == "new"
    # time travel keeps the old shape
    assert set(t.read(spark, 1).columns) == {"id", "a"}
    # the increment reads through the union schema too
    inc = t.read_incremental(spark, 1, 2)
    assert set(inc.columns) == {"id", "a", "b"}
    # pruning on the new column keeps every PRE-COLUMN file (no stats
    # entry for b -> conservative); zero-row files may still prune
    kept, _total = t.prune_files(spark, {"b": "new"})
    v1_files = set(t._manifest(spark, 1))
    assert v1_files <= set(kept)
    assert t.read(spark, where={"b": "new"}).count() == 5
    # type conflict: refused loudly, not unioned
    with pytest.raises(ValueError, match="schema conflict"):
        t.append(spark.range(10, 12).withColumn("a", F.lit("oops")))
    # overwrite resets the schema to the new frame's alone
    t.overwrite(spark.range(0, 3).withColumn("c", F.lit(0.5)))
    assert set(t.read(spark).columns) == {"id", "c"}


def test_analyze_backfill_spans_heterogeneous_commits(spark, tmpdir_path):
    """analyze() over files from commits with DIFFERENT schemas must
    stat each commit dir under its own schema (a single cross-dir scan
    would sample one schema and miss columns)."""
    root = _mkroot(tmpdir_path)
    plain = SnapshotTable(root, stats_columns=False)
    plain.append(spark.range(0, 10).withColumn("a", F.lit(1)))
    plain.append(
        spark.range(10, 20).withColumn("a", F.lit(2)).withColumn("b", F.lit("x"))
    )
    t = SnapshotTable(root)
    v = t.analyze(spark)
    m = t._read_manifest(spark, v)
    assert set(m["stats"]) == set(m["files"])
    assert "b" in m["stats_schema"]
    # files from the first commit carry no 'b' entry; second commit's do
    with_b = [e for e in m["stats"].values() if "b" in e["cols"]]
    without_b = [e for e in m["stats"].values() if "b" not in e["cols"]]
    assert with_b and without_b
    assert t.count(spark) == 20


def test_compact_preserves_rows_and_improves_skipping(spark, tmpdir_path):
    """compact(sort_cols=) is the layout-maintenance move: a RANDOM
    append layout gives overlapping stat intervals (pruning dead);
    after a sorted compaction the same predicate prunes, rows are
    identical, old versions still time-travel, and read_incremental
    refuses to span the rewrite."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 2000).withColumn(
        "k", (F.col("id") * 2654435761 % 2000).cast("long")  # scrambled
    )
    # 4 commits, each spanning the FULL k range (worst-case layout)
    for i in range(4):
        t.append(df.where(F.col("id") % 4 == i).repartition(3))
    h0 = t.skipping_health(spark, "k")
    assert h0["avg_overlap"] > 3  # every file overlaps most others
    kept0, total0 = t.prune_files(spark, {"k": {"between": [100, 140]}})
    assert len(kept0) == total0  # nothing prunes

    v = t.compact(spark, sort_cols=["k"], target_files=8)
    h1 = t.skipping_health(spark, "k")
    assert h1["avg_overlap"] <= 1.0  # range-sorted: near-disjoint
    kept1, total1 = t.prune_files(spark, {"k": {"between": [100, 140]}})
    assert 0 < len(kept1) < total1
    # rows identical, order aside
    before = sorted(r["id"] for r in t.read(spark, v - 1).collect())
    after = sorted(r["id"] for r in t.read(spark, v).collect())
    assert before == after
    # metadata count survives the rewrite
    assert t.count(spark) == 2000
    # increments across the rewrite are refused (it's an overwrite)
    with pytest.raises(ValueError, match="overwrite"):
        t.read_incremental(spark, v - 1, v)


def test_compact_target_files_only(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 500).withColumn("k", F.col("id"))
    for i in range(3):
        t.append(df.where(F.col("id") % 3 == i).repartition(4))
    n_before = len(t._manifest(spark, 3))
    v = t.compact(spark, target_files=2)
    assert len(t._manifest(spark, v)) <= 2 < n_before
    assert t.count(spark) == 500


def test_skipping_health_coverage_with_pre_stats_files(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    plain = SnapshotTable(root, stats_columns=False)
    plain.append(spark.range(0, 100).withColumn("k", F.col("id")).coalesce(1))
    t = SnapshotTable(root)
    t.append(spark.range(100, 200).withColumn("k", F.col("id")).coalesce(1))
    h = t.skipping_health(spark, "k")
    assert h["files"] == 2 and h["with_bounds"] == 1
    assert h["coverage"] == 0.5


def test_read_incremental_where_prunes_added_files(spark, tmpdir_path):
    """A selective incremental consumer skips delta files whose stats
    can't match and still gets the exact filtered increment."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = _corpus(spark)
    t.append(df.where("id < 300").coalesce(1))
    # the increment: two range-disjoint commits
    t.append(df.where("id >= 300 and id < 600").coalesce(1))
    t.append(df.where("id >= 600 and id < 900").coalesce(1))
    inc = t.read_incremental(spark, 1, 3, where={"k": {"between": [700, 720]}})
    got = sorted(r["id"] for r in inc.collect())
    assert got == list(range(700, 721))
    norm = lambda p: p.replace("file:///", "file:/")  # noqa: E731
    scanned = {norm(f) for f in inc.inputFiles()}
    added = {
        norm(f)
        for f in set(t._manifest(spark, 3)) - set(t._manifest(spark, 1))
    }
    assert scanned < added  # at least one delta file skipped


def test_pruned_read_also_pushes_filters_into_scan(spark, tmpdir_path):
    """Two-level skipping: the manifest prunes whole FILES, and the
    residual compile_where filter must still reach the parquet scan as
    PushedFilters so row groups inside surviving files prune too."""
    t = _ranged_table(spark, tmpdir_path)
    df = t.read(spark, where={"k": {"between": [310, 340]}})
    fmt = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pushed = [ln for ln in fmt.splitlines() if "PushedFilters" in ln]
    assert pushed and "k" in pushed[0] and "[]" not in pushed[0].split(":")[1]


def test_estimate_prices_reads_from_manifest(spark, tmpdir_path):
    """estimate(where=) upper-bounds a selective read's rows/bytes from
    the manifest alone: the selective estimate is strictly below the
    full-table one, >= the true matching rows, and bytes track the
    surviving files."""
    t = _ranged_table(spark, tmpdir_path)
    full = t.estimate(spark)
    assert full["est_rows"] == 1200 and full["files_unstatted"] == 0
    assert full["est_bytes"] > 0
    sel = t.estimate(spark, where={"k": {"between": [310, 340]}})
    assert sel["files_scanned"] < sel["files_total"]
    true_rows = t.read(spark, where={"k": {"between": [310, 340]}}).count()
    assert true_rows <= sel["est_rows"] < full["est_rows"]
    assert 0 < sel["est_bytes"] < full["est_bytes"]


def test_engine_estimate_find_uses_manifest_for_snap(spark, tmpdir_path):
    from logverzcore_spark.api import Engine
    from logverzcore_spark.catalog import Catalog

    eng = Engine(spark, Catalog())
    t = _ranged_table(spark, tmpdir_path)
    eng.register_snapshot("est_snap", t.root)
    est = eng.estimate_find("est_snap", where={"k": {"between": [310, 340]}})
    assert est["files_scanned"] < est["files_total"]  # manifest path taken
    assert est["est_rows"] < 1200
    # non-SNAP fallback still answers (Catalyst stats shape)
    spark.range(100).write.mode("overwrite").saveAsTable("est_plain")
    est2 = eng.estimate_find("est_plain")
    assert est2["est_bytes"] > 0
    spark.sql("DROP TABLE IF EXISTS est_plain")


def test_analyze_preserves_recorded_schema(spark, tmpdir_path):
    """The backfill commit must carry the head's evolution schema
    forward — dropping it would resurrect the column-drop hazard."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(0, 5).withColumn("a", F.lit(1)))
    t.append(spark.range(5, 9).withColumn("a", F.lit(2)).withColumn("b", F.lit("x")))
    # force a stats gap, then backfill
    plain = SnapshotTable(t.root, stats_columns=False)
    plain.append(spark.range(9, 12).withColumn("a", F.lit(3)))
    v = t.analyze(spark)
    assert set(t.read(spark, v).columns) == {"id", "a", "b"}


def test_admission_prices_pruned_find(spark, tmpdir_path):
    """Data skipping buys ADMISSION: with a byte budget between the
    pruned and unpruned scan sizes, the selective find over a pinned
    snapshot admits while the unfiltered dump is refused — and an
    admin still bypasses."""
    from logverzcore_spark.api import AdmissionError, AdmissionPolicy, Engine
    from logverzcore_spark.catalog import Catalog, User

    t = _ranged_table(spark, tmpdir_path)
    full_bytes = t.estimate(spark)["est_bytes"]
    sel_bytes = t.estimate(spark, where={"k": {"between": [310, 340]}})[
        "est_bytes"
    ]
    assert sel_bytes < full_bytes
    pol = AdmissionPolicy()
    pol.max_est_bytes = (sel_bytes + full_bytes) // 2
    eng = Engine(spark, Catalog(), admission=pol)
    eng.register_snapshot("adm_snap", t.root, access=["a"])
    analyst = User(name="a", groups=[], is_admin=False, is_poweruser=False)
    # selective: pruned plan fits the budget
    assert (
        eng.find_all("adm_snap", user=analyst, where={"k": {"between": [310, 340]}})
        .count() == 31
    )
    # unfiltered dump: refused before any job
    with pytest.raises(AdmissionError):
        eng.find_all("adm_snap", user=analyst)
    # admins bypass (the reference's gate shape)
    assert eng.find_all("adm_snap").count() == 1200


def test_fractional_second_bounds_never_misprune(spark, tmpdir_path):
    """str(datetime) omits a zero fraction but prints '.500000' for a
    half second; canonical padding keeps equal instants equal under the
    lexicographic interval compare — the '…05' vs '…05.000000' hazard."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(
        spark.range(0, 5).selectExpr(
            "id",
            "timestamp'2026-01-01 00:00:05' + make_interval(0,0,0,0,0,0,id*0.5)"
            " AS ts",
        ).coalesce(1)
    )
    # equal-instant literal with explicit zero fraction: must keep + match
    for lit in ("2026-01-01 00:00:05", "2026-01-01 00:00:05.000000"):
        kept, total = t.prune_files(spark, {"ts": lit})
        assert len(kept) == 1, lit
        assert t.read(spark, where={"ts": lit}).count() == 1, lit
    # fractional boundary: gte .500000 keeps the file, matches 4 rows
    assert t.read(
        spark, where={"ts": {"gte": "2026-01-01 00:00:05.5"}}
    ).count() == 4
    # unparseable literal (tz suffix): refuses to prune, still exact
    kept, total = t.prune_files(spark, {"ts": {"gte": "2026-01-01T00:00:05+00:00"}})
    assert len(kept) == total


def test_explicit_op_literals_normalize_like_compile_where(spark, tmpdir_path):
    """r10 regression (ADVICE r9 high): the EXPLICIT-op pruner branch
    must run operands through type_literal exactly as compile_where's
    _compare does. Before the fix, {"eq": "null"} compiled to IS NULL
    but the pruner compared the 4-char string "null" against [min,max]
    and dropped files whose NULL rows matched; {"eq": "5"} pruned a
    file holding "05" that Spark's numeric-cast comparison matches."""
    # (a) 'null' literal vs a string column with NULL rows
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 10).selectExpr(
        "id", "CASE WHEN id < 5 THEN NULL ELSE concat('v', id) END AS s"
    )
    t.append(df.where("id < 5").coalesce(1))   # all-NULL s file
    t.append(df.where("id >= 5").coalesce(1))  # no-NULL s file
    for where, want_rows in (
        ({"s": {"eq": "null"}}, 5),   # IS NULL
        ({"s": {"is": "null"}}, 5),   # IS NULL
        ({"s": {"ne": "null"}}, 5),   # IS NOT NULL
    ):
        kept, total = t.prune_files(spark, where)
        assert t.read(spark, where=where).count() == want_rows, where
        # pruning may drop the provably-irrelevant file but must keep
        # every file whose rows match
        got = t._reader(spark, t._read_manifest(spark, 2)).parquet(
            *kept
        ).filter(compile_where(where)).count()
        assert got == want_rows, where

    # (b) numeric-looking string literal vs a string column: Spark casts
    # the COLUMN ('05' == 5 matches) — no pruning allowed
    t2 = SnapshotTable(_mkroot(tmpdir_path))
    d2 = spark.range(0, 20).selectExpr(
        "id", "lpad(cast(id AS string), 2, '0') AS z"
    )
    t2.append(d2.where("id < 10").coalesce(1))
    t2.append(d2.where("id >= 10").coalesce(1))
    for where in (
        {"z": {"eq": "5"}},
        {"z": {"in": ["5", "null"]}},
        {"z": {"between": ["5", "6"]}},
    ):
        kept, total = t2.prune_files(spark, where)
        assert len(kept) == total, where
    assert t2.read(spark, where={"z": {"eq": "5"}}).count() == 1

    # (c) 'null'-only in-list matches nothing (isin(NULL) is 3VL-false)
    kept, total = t2.prune_files(spark, {"z": {"in": ["null"]}})
    assert kept == []
    assert t2.read(spark, where={"z": {"in": ["null"]}}).count() == 0

    # (d) int column probed with string forms stays exact
    kept, total = t2.prune_files(spark, {"id": {"eq": "5"}})
    assert len(kept) == 1
    assert t2.read(spark, where={"id": {"eq": "5"}}).count() == 1
    kept, total = t2.prune_files(spark, {"id": {"eq": "null"}})
    assert kept == []  # nulls=0 everywhere: IS NULL provably empty
