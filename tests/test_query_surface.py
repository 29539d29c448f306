"""Query-surface tests: SELECT-only gate (Q2), ACL (Q3), operator-tree
(Q4/Q5/Q6), catalog ops (Q7-Q9), Views (P4), legacy dialect shim (P2)."""

import pytest

from logverzcore_spark.api import Engine
from logverzcore_spark.catalog import Catalog, CatalogEntry, User
from logverzcore_spark.operators import optree
from logverzcore_spark.plans.sqlgate import (
    SqlValidationError,
    rewrite_legacy_query,
    validate_select,
)

ALICE = User("alice")
BOB = User("bob", groups=["analysts"])
ADMIN = User("root", is_admin=True)


@pytest.fixture()
def engine(spark, tmpdir_path):
    cat = Catalog(path=f"{tmpdir_path}/catalog.jsonl")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.mode("overwrite").saveAsTable("qs_tab")
    cat.record_query(CatalogEntry(TableName="qs_tab", Owners=["alice"], Access=["analysts"]))
    yield Engine(spark, cat)
    spark.sql("DROP TABLE IF EXISTS qs_tab")


# -- Q2: SELECT-only gate ---------------------------------------------------

@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE qs_tab",
        "INSERT INTO qs_tab VALUES (1, 2)",
        "SELECT 1; DROP TABLE qs_tab",
        "UPDATE qs_tab SET v = 0",
        "DELETE FROM qs_tab",
        "CREATE TABLE x AS SELECT 1",
        "not sql at all",
        # Structural Command subclasses whose names share no fragment — a
        # name-fragment denylist let all of these through (ADVICE r1).
        "DROP VIEW qs_view",
        "TRUNCATE TABLE qs_tab",
        "SHOW TABLES",
        "DESCRIBE TABLE qs_tab",
        "DESC qs_tab",
        "SHOW CREATE TABLE qs_tab",
        "SET spark.sql.shuffle.partitions=1",
        "ANALYZE TABLE qs_tab COMPUTE STATISTICS",
        "MERGE INTO qs_tab USING qs_tab s ON 1=1 WHEN MATCHED THEN DELETE",
        "EXPLAIN DROP TABLE qs_tab",
        # Dynamic SQL dodges the gate entirely: the embedded string is
        # parsed and RUN at execution time — denied even when the
        # payload is a SELECT (r4).
        "EXECUTE IMMEDIATE 'DROP TABLE qs_tab'",
        "EXECUTE IMMEDIATE 'SELECT 1'",
        "CALL some_procedure()",
        # Arbitrary-JVM-invocation functions inside a pure SELECT —
        # including buried in subqueries (a swallowed-exception bug let
        # EXISTS bodies through), lambdas, and qualified names.
        "SELECT reflect('java.lang.System', 'exit', 0)",
        "SELECT try_reflect('java.lang.System', 'exit', 0)",
        "SELECT java_method('java.lang.System', 'getProperty', 'user.dir')",
        "SELECT BUILTIN.reflect('a', 'b')",
        "SELECT 1 WHERE EXISTS (SELECT reflect('a', 'b'))",
        "SELECT (SELECT java_method('x', 'y'))",
        "SELECT transform(array(1), x -> reflect('a', 'b', x))",
        "WITH c AS (SELECT reflect('a', 'b') AS r) SELECT * FROM c",
    ],
)
def test_gate_rejects(spark, bad):
    with pytest.raises(SqlValidationError):
        validate_select(spark, bad)


def test_gate_explain_select_allowed_and_extracts_tables(spark):
    r = validate_select(spark, "EXPLAIN SELECT * FROM qs_tab WHERE v > 1")
    assert r.statement_type == "EXPLAIN"
    assert r.tables == ["qs_tab"]


def test_gate_allows_and_extracts_tables(spark):
    r = validate_select(
        spark,
        "WITH c AS (SELECT 1 AS x) "
        "SELECT * FROM a JOIN b ON a.k = b.k WHERE a.v IN (SELECT v FROM d) "
        "UNION ALL SELECT * FROM c",
    )
    assert r.statement_type == "SELECT"
    assert sorted(r.tables) == ["a", "b", "d"]  # CTE name excluded


def test_gate_extraction_stable_under_allocator_churn(spark):
    """Regression (r12): the walkers' visited-set stored bare id()s of
    TRANSIENT py4j proxies — once a freed proxy's address was reused by
    a later node, the walk skipped that subtree, so an IN-subquery's
    table nondeterministically vanished from extraction (and the same
    skip could have bypassed the denied-function check). The fix pins
    each visited proxy in the dict. This loop makes address reuse
    likely (fresh proxies + interleaved garbage every iteration); the
    extraction must never lose a table."""
    q = (
        "WITH c AS (SELECT 1 AS x) "
        "SELECT * FROM a JOIN b ON a.k = b.k WHERE a.v IN (SELECT v FROM d) "
        "AND EXISTS (SELECT 1 FROM e WHERE e.k = a.k) "
        "UNION ALL SELECT * FROM c"
    )
    for i in range(50):
        _ = [object() for _ in range(64 * (i % 7))]  # churn the allocator
        r = validate_select(spark, q)
        assert sorted(r.tables) == ["a", "b", "d", "e"], (i, r.tables)


def test_legacy_rewrite():
    q = rewrite_legacy_query(
        "SELECT s.a FROM S3Object[*].Records[*] s WHERE s.b IS MISSING AND s.c IS NOT MISSING",
        "staged",
    )
    assert q == "SELECT s.a FROM staged s WHERE s.b IS NULL AND s.c IS NOT NULL"


# -- Q3/Q7/Q8/Q9: ACL + catalog ops ----------------------------------------

def test_sql_acl(engine):
    assert engine.sql("SELECT count(*) AS n FROM qs_tab", ALICE).first()["n"] == 10
    assert engine.sql("SELECT count(*) AS n FROM qs_tab", BOB).first()["n"] == 10
    with pytest.raises(PermissionError):
        engine.sql("SELECT * FROM qs_tab", User("mallory"))


def test_list_tables_acl(engine):
    assert "qs_tab" in engine.list_tables(user=ALICE)
    assert "qs_tab" in engine.list_tables(pattern="qs_*", user=ADMIN)
    assert engine.list_tables(user=User("mallory")) == []


def test_describe_admin_only(engine):
    assert engine.describe_table("qs_tab", ADMIN) == {"id": "bigint", "v": "bigint"}
    with pytest.raises(PermissionError):
        engine.describe_table("qs_tab", ALICE)


def test_delete_table_owner_gated(engine, spark):
    with pytest.raises(PermissionError):
        engine.delete_table("qs_tab", BOB)  # access ≠ ownership
    engine.delete_table("qs_tab", ALICE)
    assert engine.catalog.for_table("qs_tab") is None
    assert "qs_tab" not in [t.name for t in spark.catalog.listTables()]


def test_catalog_update_guards(engine):
    entry = engine.catalog.list(ADMIN)[0]
    with pytest.raises(ValueError):
        engine.catalog.update(entry.ID, ALICE, TableName="other")
    with pytest.raises(PermissionError):
        engine.catalog.update(entry.ID, BOB, Archive=True)
    engine.catalog.update(entry.ID, ALICE, Archive=True)
    assert engine.catalog.list(ALICE) == []  # archive filter
    assert len(engine.catalog.list(ALICE, include_archived=True)) == 1


# -- Q4/Q5/Q6: operator tree ------------------------------------------------

def test_optree_ops(spark):
    df = spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", None), (3, "gamma", 30.0), (4, "alphabet", 40.0)],
        "id int, name string, score double",
    )
    got = optree.find_all(df, where={"name": {"startsWith": "alpha"}})
    assert {r["id"] for r in got.collect()} == {1, 4}
    got = optree.find_all(df, where={"or": [{"score": {"is": None}}, {"id": {"gt": 3}}]})
    assert {r["id"] for r in got.collect()} == {2, 4}
    got = optree.find_all(
        df,
        where={"and": [{"name": {"like": "%a%"}}, {"not": {"id": {"eq": 1}}}]},
        order=[("id", "desc")],
        limit=2,
    )
    assert [r["id"] for r in got.collect()] == [4, 3]
    # Literal typing: numeric strings auto-cast (Q6).
    got = optree.find_all(df, where={"id": {"gt": "2"}})
    assert {r["id"] for r in got.collect()} == {3, 4}


def test_engine_find(engine):
    one = engine.find_one("qs_tab", ALICE, where={"v": {"gt": 10}}, order=[("id", "asc")])
    assert one == {"id": 6, "v": 12}
    assert engine.find_by_pk("qs_tab", "id", 3, ALICE) == {"id": 3, "v": 6}


# -- P4: Views --------------------------------------------------------------

def test_views(spark, tmpdir_path):
    cat = Catalog()
    eng = Engine(spark, cat)
    from rawfixtures import write_vpcflow_gz
    from logverzcore_spark.ingest import CollectJob, collect

    write_vpcflow_gz(tmpdir_path, n_files=1)
    collect(spark, CollectJob(path=tmpdir_path, datatype="VPCFlow", table_name="v_vpc"),
            catalog=cat, user=ALICE)
    v = eng.view("v_vpc", "VPCFlow", "Default", ADMIN)
    assert v.columns == ["srcaddr", "dstaddr", "srcport", "dstport",
                         "protocol", "packets", "bytes", "action"]
    spark.sql("DROP TABLE IF EXISTS v_vpc")


def test_sql_chunked_protocol(engine):
    chunks = list(engine.sql_chunked("SELECT id, v FROM qs_tab ORDER BY id", ALICE, max_chunk_bytes=60))
    assert chunks[-1] == "EOF"
    import json

    rows = [r for c in chunks[:-1] for r in json.loads(c)]
    assert len(rows) == 10 and rows[0] == {"id": 0, "v": 0}
    assert len(chunks) > 2  # actually chunked at 60 bytes


def test_cte_shadowing_does_not_bypass_acl(spark):
    """A CTE named after a real table must not strip the real reference
    from the ACL list (Spark CTEs are non-recursive, so the inner FROM
    reads the actual table)."""
    r = validate_select(
        spark, "WITH secret AS (SELECT * FROM secret) SELECT * FROM secret"
    )
    assert r.tables == ["secret"]
    # Later CTE referencing an earlier one: no real tables.
    r = validate_select(
        spark,
        "WITH a AS (SELECT 1 AS x), b AS (SELECT * FROM a) SELECT * FROM b",
    )
    assert r.tables == []


def test_semicolon_in_literal_allowed(spark):
    r = validate_select(spark, "SELECT * FROM events WHERE props = 'a;b'")
    assert r.tables == ["events"]
    with pytest.raises(SqlValidationError):
        validate_select(spark, "SELECT 1; DROP TABLE x")


def test_delete_uncataloged_requires_admin(engine, spark):
    spark.range(3).write.mode("overwrite").saveAsTable("sys_like_t")
    with pytest.raises(PermissionError):
        engine.delete_table("sys_like_t", ALICE)
    engine.delete_table("sys_like_t", ADMIN)
    assert "sys_like_t" not in [t.name for t in spark.catalog.listTables()]


def test_optree_pattern_ops_take_verbatim_strings(spark):
    df = spark.createDataFrame(
        [(1, "404"), (2, "null"), (3, "ok;fine")], "id int, msg string"
    )
    assert {r["id"] for r in optree.find_all(df, where={"msg": {"like": "404"}}).collect()} == {1}
    assert {r["id"] for r in optree.find_all(df, where={"msg": {"startsWith": "null"}}).collect()} == {2}
    assert {r["id"] for r in optree.find_all(df, where={"msg": {"substring": ";"}}).collect()} == {3}


# -- Saved analyses (catalog Type "A") --------------------------------------

def test_save_and_run_saved_query(spark, engine):
    engine.save_query("daily_v", "SELECT v FROM qs_tab WHERE v > 10", user=ALICE,
                      access=["analysts"])
    # Owner runs it; table ACL re-checked against the runner.
    assert engine.run_saved("daily_v", user=ALICE).count() > 0
    # bob sees it via the analysts group AND may read qs_tab (Access) →
    # allowed end to end.
    assert engine.run_saved("daily_v", user=BOB).count() > 0


def test_saved_query_gated_at_save_time(engine):
    with pytest.raises(SqlValidationError):
        engine.save_query("evil", "DROP TABLE qs_tab", user=ALICE)
    with pytest.raises(KeyError):
        engine.run_saved("never_saved", user=ALICE)


def test_saved_query_visibility_and_table_acl_are_independent(spark, engine):
    # eve can SEE the saved query (Access) but has no right to qs_tab →
    # running must fail on the table ACL, not silently succeed.
    eve = User("eve", groups=["viewers"])
    engine.save_query("shared_q", "SELECT * FROM qs_tab", user=ALICE, access=["viewers"])
    with pytest.raises(PermissionError):
        engine.run_saved("shared_q", user=eve)
    # An invisible saved query is a PermissionError for outsiders.
    mallory = User("mallory")
    with pytest.raises(PermissionError):
        engine.run_saved("shared_q", user=mallory)


def test_save_query_slot_owner_gated(engine):
    """Saving under a (database, name) whose ACTIVE catalog entry belongs
    to someone else is denied — otherwise any user could shadow another
    user's saved analysis (or a TABLE's entry), making it invisible to
    its owners (ADVICE r2). Owners and admins may overwrite."""
    engine.save_query("shared_q", "SELECT 1 AS one", ALICE)
    with pytest.raises(PermissionError):
        engine.save_query("shared_q", "SELECT 2 AS two", User("mallory"))
    # The denied attempt must not have superseded the original.
    assert engine.run_saved("shared_q", ALICE).first()["one"] == 1
    # Owner re-save and admin override both work.
    engine.save_query("shared_q", "SELECT 3 AS three", ALICE)
    engine.save_query("shared_q", "SELECT 4 AS four", ADMIN)
    # A TABLE's catalog entry is protected the same way.
    with pytest.raises(PermissionError):
        engine.save_query("qs_tab", "SELECT 1 AS one", User("mallory"))


def test_audit_log_records_interactive_queries(spark, tmpdir_path):
    """One Invocations-shaped audit row per interactive query — success,
    ACL denial, and gate rejection alike (reference
    p2pconnection.js:188-195) — persisted across reload."""
    from logverzcore_spark.audit import AuditLog

    cat = Catalog()
    spark.range(5).write.mode("overwrite").saveAsTable("aud_tab")
    cat.record_query(CatalogEntry(TableName="aud_tab", Owners=["alice"]))
    audit = AuditLog(path=f"{tmpdir_path}/audit.jsonl")
    eng = Engine(spark, cat, audit=audit)
    try:
        eng.sql("SELECT count(*) AS n FROM aud_tab", ALICE).collect()
        with pytest.raises(PermissionError):
            eng.sql("SELECT * FROM aud_tab", User("mallory"))
        with pytest.raises(SqlValidationError):
            eng.sql("DROP TABLE aud_tab", ALICE)
        eng.find_all("aud_tab", ALICE, where={"id": {"gte": 2}}).collect()
        with pytest.raises(PermissionError):
            eng.find_all("aud_tab", User("mallory"))
        eng.save_query("aud_saved", "SELECT 1 AS one", ALICE)
        eng.run_saved("aud_saved", ALICE).collect()
        with pytest.raises(PermissionError):
            eng.run_saved("aud_saved", User("mallory"))

        recs = audit.entries()
        assert len(recs) == 7
        assert [r.Status for r in audit.entries(user="mallory")] == [
            "denied", "denied", "denied",
        ]
        assert audit.entries(status="invalid")[0].Query.startswith("DROP TABLE")
        assert {r.Mode for r in audit.entries(user="alice", status="ok")} == {
            "sql", "find", "saved",
        }
        assert audit.entries(status="ok", mode="sql")[0].Tables == ["aud_tab"]
        # JSONL persistence: a fresh AuditLog sees the same records.
        assert len(AuditLog(path=f"{tmpdir_path}/audit.jsonl").entries()) == 7
        # enabled=False is a no-op recorder for tight loops.
        off = AuditLog(enabled=False)
        assert off.record("x", "sql", "SELECT 1") is None and off.entries() == []
    finally:
        spark.sql("DROP TABLE IF EXISTS aud_tab")


def test_catalog_contains_between_and_list_sources(spark, tmpdir_path):
    """nosql.js metadata-query parity: contains / between filters
    (nosql.js:394-490) and the info-surface source listing, both
    ACL-scoped."""
    cat = Catalog()
    cat.record_query(CatalogEntry(
        TableName="vpc_prod", Owners=["alice"], CreationUnixTime=100.0,
        QuerySettings={"StgFolders": ["s3a://logs/prod/vpc"]}))
    cat.record_query(CatalogEntry(
        TableName="vpc_dev", Owners=["alice"], CreationUnixTime=200.0,
        QuerySettings={"StgFolders": ["s3a://logs/dev/vpc"]}))
    cat.record_query(CatalogEntry(
        TableName="alb_prod", Owners=["bob"], CreationUnixTime=300.0,
        QuerySettings={"StgFolders": ["s3a://logs/prod/alb"]}))

    assert [e.TableName for e in cat.list(ALICE, table_contains="prod")] == ["vpc_prod"]
    assert [e.TableName for e in cat.list(ADMIN, table_contains="prod",
                                          sort_by="CreationUnixTime")] == [
        "vpc_prod", "alb_prod",
    ]
    assert [e.TableName for e in cat.list(ADMIN, created_between=(150.0, 250.0))] == [
        "vpc_dev",
    ]
    eng = Engine(spark, cat)
    assert eng.list_sources(ALICE) == ["s3a://logs/dev/vpc", "s3a://logs/prod/vpc"]
    assert eng.list_sources(ADMIN) == [
        "s3a://logs/dev/vpc", "s3a://logs/prod/alb", "s3a://logs/prod/vpc",
    ]
    assert eng.list_sources(User("mallory")) == []


def test_audit_df_sql_surface(spark, tmpdir_path):
    """Admins can run SQL over the audit log; non-admins cannot."""
    from logverzcore_spark.audit import AuditLog

    cat = Catalog()
    spark.range(3).write.mode("overwrite").saveAsTable("adf_tab")
    cat.record_query(CatalogEntry(TableName="adf_tab", Owners=["alice"]))
    eng = Engine(spark, cat, audit=AuditLog())
    try:
        eng.sql("SELECT count(*) AS n FROM adf_tab", ALICE).collect()
        with pytest.raises(PermissionError):
            eng.sql("SELECT * FROM adf_tab", User("mallory"))
        adf = eng.audit_df(ADMIN)
        assert adf.count() == 2
        assert adf.where("Status = 'denied'").first()["User"] == "mallory"
        with pytest.raises(PermissionError):
            eng.audit_df(ALICE)
    finally:
        spark.sql("DROP TABLE IF EXISTS adf_tab")


def test_estimate_gated_and_sized(engine):
    """Engine.estimate: optimizer stats without execution — gated like
    any interactive query, bytes always present, rows exact after
    ANALYZE (CBO stats)."""
    import pytest

    from logverzcore_spark.catalog import User
    from logverzcore_spark.plans.sqlgate import SqlValidationError

    engine.spark.sql("ANALYZE TABLE qs_tab COMPUTE STATISTICS")
    est = engine.estimate("SELECT * FROM qs_tab")
    assert est["est_bytes"] > 0
    assert est["est_rows"] == 10
    # A filtered plan estimates fewer rows than the full scan.
    filtered = engine.estimate("SELECT * FROM qs_tab WHERE id < 3")
    assert filtered["est_bytes"] <= est["est_bytes"]
    # The gate applies before any estimation.
    with pytest.raises(SqlValidationError):
        engine.estimate("DROP TABLE qs_tab")
    with pytest.raises(PermissionError):
        engine.estimate("SELECT * FROM qs_tab", user=User("mallory", groups=[]))


def test_sql_arrow_wire_roundtrip(engine):
    """Arrow IPC protocol: batches reassemble to the exact result, EOF
    terminates, and the gate still applies."""
    import io

    import pyarrow as pa
    import pytest

    from logverzcore_spark.plans.sqlgate import SqlValidationError

    for stream in (False, True):
        chunks = list(
            engine.sql_arrow(
                "SELECT id, v FROM qs_tab ORDER BY id",
                max_rows_per_batch=4,
                stream=stream,
            )
        )
        assert chunks[-1] == b"EOF"
        tables = [pa.ipc.open_stream(io.BytesIO(c)).read_all() for c in chunks[:-1]]
        assert len(tables) == 3  # 10 rows in batches of 4
        assert max(t.num_rows for t in tables) <= 4
        combined = pa.concat_tables(tables)
        assert combined.column("id").to_pylist() == list(range(10))
        assert combined.column("v").to_pylist() == [i * 2 for i in range(10)]
    with pytest.raises(SqlValidationError):
        list(engine.sql_arrow("DROP TABLE qs_tab"))


def test_parameterized_sql_binds_values_not_text(engine):
    """Parameter values are typed literals: filtering works, and a
    hostile value cannot change the statement's shape (classic
    injection payloads are inert strings)."""
    out = engine.sql(
        "SELECT id, v FROM qs_tab WHERE id >= :lo AND id < :hi",
        params={"lo": 3, "hi": 6},
    )
    assert sorted(r["id"] for r in out.collect()) == [3, 4, 5]
    # positional markers too
    out2 = engine.sql("SELECT COUNT(*) AS n FROM qs_tab WHERE id = ?", params=[4])
    assert out2.collect()[0]["n"] == 1
    hostile = engine.sql(
        "SELECT COUNT(*) AS n FROM qs_tab WHERE CAST(id AS STRING) = :x",
        params={"x": "1 OR 1=1"},
    )
    assert hostile.collect()[0]["n"] == 0


def test_parameterized_template_gated_and_audited(spark, engine):
    """The gate parses the template before values bind, ACLs still hold,
    and the audit row records the bound parameters."""
    from logverzcore_spark.audit import AuditLog

    engine.audit = AuditLog()
    bob = User(name="bob", groups=[])
    with pytest.raises(PermissionError):
        engine.sql("SELECT * FROM qs_tab WHERE id = :i", user=bob, params={"i": 1})
    engine.sql("SELECT v FROM qs_tab WHERE id = :i", params={"i": 2})
    recs = engine.audit.entries()
    assert any(r.Status == "denied" for r in recs)
    ok = [r for r in recs if r.Status == "ok"]
    assert ok and "params" in ok[-1].Query and '"i": 2' in ok[-1].Query


def test_saved_parameterized_template(engine):
    """A saved analysis may be a TEMPLATE; runners bind values at run
    time but cannot alter the saved statement."""
    engine.save_query("top_ids", "SELECT id FROM qs_tab WHERE id > :min_id")
    rows = engine.run_saved("top_ids", params={"min_id": 7}).collect()
    assert sorted(r["id"] for r in rows) == [8, 9]


def test_materialize_saved_analysis(spark, engine):
    """Materializing a saved analysis precomputes it into an ACL'd,
    cataloged table; non-owners cannot clobber the slot; audit-memory
    retention bounds the in-process window."""
    engine.save_query("evens", "SELECT id, v FROM qs_tab WHERE id % 2 = 0")
    entry = engine.materialize_saved("evens")
    try:
        assert entry.Type == "C"
        assert entry.QuerySettings["SourceAnalysis"] == "evens"
        rows = spark.table("evens_mat").collect()
        assert sorted(r["id"] for r in rows) == [0, 2, 4, 6, 8]
        # slot is owner-gated on refresh
        mallory = User(name="mallory", groups=[])
        with pytest.raises((PermissionError, KeyError)):
            engine.materialize_saved("evens", user=mallory)
        # refresh by the owner succeeds and updates provenance
        again = engine.materialize_saved("evens")
        assert again.QuerySettings["MaterializedAt"] >= entry.QuerySettings[
            "MaterializedAt"
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS evens_mat")


def test_materialize_access_does_not_leak_table_acl(spark, engine):
    """r3 ADVICE (medium): the materialized table's Access list must NOT
    inherit the saved query's Access — a user who can SEE the analysis
    but is denied on its tables (run_saved re-gates them) must not gain
    access to the derived data through the materialized copy. Sharing is
    an explicit ``access=`` grant by the materializer."""
    engine.save_query(
        "shared_evens", "SELECT id FROM qs_tab WHERE id % 2 = 0",
        access=["viewers"],
    )
    entry = engine.materialize_saved("shared_evens")
    try:
        # default: owner-only, regardless of the saved query's Access
        assert entry.Access == []
        # a viewer of the ANALYSIS (but not of qs_tab) cannot read the
        # materialized table through the engine
        eve = User(name="eve", groups=["viewers"])
        with pytest.raises(PermissionError):
            engine.sql("SELECT * FROM shared_evens_mat", user=eve)
        # explicit grant by the materializer works
        entry2 = engine.materialize_saved("shared_evens", access=["viewers"])
        assert entry2.Access == ["viewers"]
        assert engine.sql("SELECT * FROM shared_evens_mat", user=eve).count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS shared_evens_mat")


def test_materialize_records_distinct_audit_mode(spark, tmpdir_path):
    """r3 ADVICE: a persisted copy is a different event than an ad-hoc
    read — the audit trail gets a mode='materialize' row naming the
    target table, after the write succeeds."""
    from logverzcore_spark.audit import AuditLog

    cat = Catalog(path=f"{tmpdir_path}/cat.jsonl")
    spark.range(4).selectExpr("id").write.mode("overwrite").saveAsTable("aud_tab")
    cat.record_query(CatalogEntry(TableName="aud_tab", Owners=["alice"]))
    eng = Engine(spark, cat, audit=AuditLog(path=f"{tmpdir_path}/a.jsonl"))
    try:
        eng.save_query("aud_all", "SELECT id FROM aud_tab")
        eng.materialize_saved("aud_all")
        modes = [(r.Mode, r.Tables) for r in eng.audit.entries()]
        mat = [t for m, t in modes if m == "materialize"]
        assert mat and mat[0] == ["default.aud_all_mat"]
    finally:
        spark.sql("DROP TABLE IF EXISTS aud_all_mat")
        spark.sql("DROP TABLE IF EXISTS aud_tab")


def test_materialized_staleness_and_refresh_sweep(spark, engine):
    """A materialized analysis records its source tables' file snapshot;
    is_stale flips after a source append; refresh_materialized rebuilds
    only stale entries (preserving target/Access) and the rebuilt data
    reflects the new source rows."""
    spark.range(10).write.mode("overwrite").saveAsTable("stale_src")
    engine.catalog.record_query(CatalogEntry(TableName="stale_src"))
    try:
        engine.save_query("stale_q", "SELECT count(*) AS n FROM stale_src")
        engine.materialize_saved("stale_q", access=["analysts"])
        assert engine.is_stale("stale_q_mat") is False
        assert spark.table("stale_q_mat").first()["n"] == 10
        # source append → stale
        spark.range(5).write.mode("append").saveAsTable("stale_src")
        assert engine.is_stale("stale_q_mat") is True
        refreshed = engine.refresh_materialized()
        assert refreshed == ["stale_q_mat"]
        assert spark.table("stale_q_mat").first()["n"] == 15
        assert engine.is_stale("stale_q_mat") is False
        # second sweep is a no-op; Access preserved across refresh
        assert engine.refresh_materialized() == []
        entry = engine.catalog.for_table("stale_q_mat")
        assert entry.Access == ["analysts"]
        # non-materialized names are rejected
        with pytest.raises(KeyError, match="not a materialized analysis"):
            engine.is_stale("stale_src")
        # a sweeper who can SEE but not OWN the entry skips it (no
        # PermissionError mid-sweep); the stale entry stays stale
        spark.range(3).write.mode("append").saveAsTable("stale_src")
        viewer = User(name="vera", groups=["analysts"])  # Access, not Owners
        assert engine.refresh_materialized(viewer) == []
        assert engine.is_stale("stale_q_mat") is True
        # non-JSON params (datetime.date) are sanitized into the catalog
        # entry instead of poisoning every later flush
        import datetime as _dt

        engine.save_query(
            "stale_pq", "SELECT count(*) AS n FROM stale_src WHERE id >= :lo"
        )
        engine.materialize_saved("stale_pq", params={"lo": 0, "d": _dt.date(2024, 1, 2)})
        stored = engine.catalog.for_table("stale_pq_mat").QuerySettings["Params"]
        assert stored == {"lo": 0, "d": "2024-01-02"}
    finally:
        spark.sql("DROP TABLE IF EXISTS stale_q_mat")
        spark.sql("DROP TABLE IF EXISTS stale_pq_mat")
        spark.sql("DROP TABLE IF EXISTS stale_src")


def test_audit_memory_retention_bounds_window(tmpdir_path):
    from logverzcore_spark.audit import AuditLog

    log = AuditLog(path=f"{tmpdir_path}/a.jsonl", max_memory_records=5)
    for i in range(12):
        log.record("u", "sql", f"q{i}")
    assert len(log.entries()) == 5
    assert log.entries()[-1].Query == "q11"
    # the file keeps full history; a fresh load respects the bound
    assert sum(1 for _ in open(f"{tmpdir_path}/a.jsonl")) == 12
    log2 = AuditLog(path=f"{tmpdir_path}/a.jsonl", max_memory_records=5)
    assert len(log2.entries()) == 5


def test_materialize_saved_params_and_uncataloged_guard(spark, engine):
    """Templates materialize with bound params; an existing but
    UNCATALOGED physical table is admin-only to overwrite (writes no
    more permissive than deletes)."""
    alice = User(name="alice", groups=[])
    engine.save_query(
        "big_ids", "SELECT id FROM qs_tab WHERE id > :min_id", user=alice
    )
    entry = engine.materialize_saved(
        "big_ids", user=alice, table="big_ids_t", params={"min_id": 6}
    )
    try:
        assert sorted(r["id"] for r in spark.table("big_ids_t").collect()) == [
            7, 8, 9,
        ]
        assert entry.Owners == ["alice"]
        # uncataloged existing table: alice may not clobber it
        spark.range(3).write.mode("overwrite").saveAsTable("sys_private")
        with pytest.raises(PermissionError, match="without a catalog entry"):
            engine.materialize_saved("big_ids", user=alice, table="sys_private")
    finally:
        spark.sql("DROP TABLE IF EXISTS big_ids_t")
        spark.sql("DROP TABLE IF EXISTS sys_private")


def test_preferences_store_put_get_acl(tmpdir_path):
    """Logverz-Preferences parity: name-keyed opaque payloads, first put
    claims ownership, update/delete owner-gated (admin bypass), reads
    open, JSONL persistence across reloads."""
    from logverzcore_spark.catalog import Preferences

    path = f"{tmpdir_path}/prefs.jsonl"
    prefs = Preferences(path=path)
    alice = User(name="alice")
    mallory = User(name="mallory")
    prefs.put("alice.theme", {"dark": True, "fontsize": 13}, alice)
    assert prefs.get("alice.theme").Value["dark"] is True
    # reads are open; updates are not
    assert prefs.get("alice.theme").owned_by(alice)
    with pytest.raises(PermissionError):
        prefs.put("alice.theme", {"dark": False}, mallory)
    with pytest.raises(PermissionError):
        prefs.delete("alice.theme", mallory)
    # owner update keeps ownership; admin can always update
    prefs.put("alice.theme", {"dark": False}, alice)
    prefs.put("alice.theme", {"dark": True}, ADMIN)
    assert prefs.get("alice.theme").Owners == ["alice"]
    # persistence: a fresh load sees the same items
    again = Preferences(path=path)
    assert again.get("alice.theme").Value == {"dark": True}
    assert [i.Name for i in again.list("alice.")] == ["alice.theme"]
    # owner delete works
    again.delete("alice.theme", alice)
    assert again.get("alice.theme") is None
    # group-based ownership: an item owned by a GROUP is updatable by
    # any member (the reference resolves Owners against user+groups)
    team = User(name="tina", groups=["dashboards"])
    outsider = User(name="oscar", groups=["other"])
    prefs.put("team.layout", {"cols": 3}, team)
    prefs._items["team.layout"].Owners = ["dashboards"]
    prefs.put("team.layout", {"cols": 4}, team)
    with pytest.raises(PermissionError):
        prefs.put("team.layout", {"cols": 5}, outsider)
    assert prefs.get("team.layout").Value == {"cols": 4}


def test_admission_control_rejects_oversize_estimates(spark, tmpdir_path):
    """AdmissionPolicy: a non-admin query whose optimizer estimate
    exceeds the policy is rejected BEFORE execution with the estimate
    in the error, recorded as an admission_denied audit row; admins
    bypass; small queries pass; no policy = no gate."""
    from logverzcore_spark.api import AdmissionError, AdmissionPolicy
    from logverzcore_spark.audit import AuditLog

    cat = Catalog()
    spark.range(100_000).selectExpr("id", "repeat('x', 40) AS pad").write.mode(
        "overwrite"
    ).saveAsTable("adm_tab")
    cat.record_query(CatalogEntry(TableName="adm_tab", Owners=["alice"]))
    # ANALYZE so the row estimate is available (CBO stats)
    spark.sql("ANALYZE TABLE adm_tab COMPUTE STATISTICS")
    audit = AuditLog(path=f"{tmpdir_path}/adm_audit.jsonl")
    eng = Engine(
        spark, cat, audit=audit,
        admission=AdmissionPolicy(max_est_rows=10_000),
    )
    try:
        with pytest.raises(AdmissionError, match=r"est_rows \d+ > max 10000"):
            eng.sql("SELECT * FROM adm_tab", ALICE)
        denied = audit.entries(status="admission_denied")
        assert len(denied) == 1 and denied[0].User == "alice"
        assert "est_rows" in denied[0].Error
        # a filtered query under the threshold passes
        assert (
            eng.sql("SELECT count(*) AS n FROM adm_tab WHERE id < 5", ALICE)
            .first()["n"] == 5
        )
        # admin bypass
        eng.sql("SELECT * FROM adm_tab", ADMIN).limit(1).collect()
        # byte threshold breach (bytes are always estimable, stats or not)
        eng.admission = AdmissionPolicy(max_est_bytes=1024)
        with pytest.raises(AdmissionError, match=r"est_bytes \d+ > max 1024"):
            eng.sql("SELECT * FROM adm_tab", ALICE)
        # no policy → no gate
        eng.admission = None
        eng.sql("SELECT * FROM adm_tab", ALICE).limit(1).collect()
    finally:
        spark.sql("DROP TABLE IF EXISTS adm_tab")


def test_identities_store_put_resolve_escalation_guard(tmpdir_path):
    """Logverz-Identities parity: (Name, Type)-keyed records on the
    JSONL substrate, admin-only writes (the escalation guard — a
    non-admin can never grant themselves groups/policies), resolve_user
    deriving admin from an attached AdministratorAccess policy and
    poweruser from LogverzPowerUsers* membership, unknown names failing
    closed, persistence across reloads."""
    from logverzcore_spark.catalog import Identities

    path = f"{tmpdir_path}/identities.jsonl"
    ids = Identities(path=path)
    mallory = User(name="mallory")
    # escalation guard: a non-admin cannot write ANY identity record —
    # in particular not one granting themselves admin
    with pytest.raises(PermissionError, match="escalation"):
        ids.put(
            "mallory", mallory,
            policies={"UserAttached": [{"PolicyName": "AdministratorAccess"}]},
        )
    assert ids.get("mallory") is None
    ids.put(
        "root", ADMIN,
        iam_groups=["ops"],
        # reference stores policy entries as JSON strings — both accepted
        policies={"UserAttached": ['{"PolicyName": "AdministratorAccess"}']},
    )
    ids.put("petra", ADMIN, iam_groups=["LogverzPowerUsers-us-east-1", "dev"])
    ids.put("uri", ADMIN, iam_groups=["dev"])
    root = ids.resolve_user("root")
    assert root.is_admin and root.groups == ["ops"]
    petra = ids.resolve_user("petra")
    assert petra.is_poweruser and not petra.is_admin
    uri = ids.resolve_user("uri")
    assert uri.groups == ["dev"] and not (uri.is_admin or uri.is_poweruser)
    # unknown principal fails closed
    ghost = ids.resolve_user("ghost")
    assert ghost.groups == [] and not (ghost.is_admin or ghost.is_poweruser)
    # non-admin delete denied; persistence across reload; admin delete
    with pytest.raises(PermissionError):
        ids.delete("uri", mallory)
    again = Identities(path=path)
    assert [r.Name for r in again.list(type="User")] == ["petra", "root", "uri"]
    assert again.resolve_user("petra").is_poweruser
    again.delete("uri", ADMIN)
    assert again.get("uri") is None
    # serving seam: Engine.resolve_user delegates (and errors without a store)
    from logverzcore_spark.api import Engine

    eng = Engine.__new__(Engine)  # no SparkSession needed for this path
    eng.identities = again
    assert Engine.resolve_user(eng, "petra").is_poweruser
    eng.identities = None
    with pytest.raises(ValueError, match="identities store"):
        Engine.resolve_user(eng, "petra")


def test_range_bounds_rejects_empty_and_nulls(spark):
    from logverzcore_spark import export as ex

    empty = spark.range(0).selectExpr("id AS v")
    with pytest.raises(ValueError, match="empty"):
        ex.range_bounds(empty, "v", n_shards=4)
    withnulls = spark.sql(
        "SELECT CASE WHEN id % 3 = 0 THEN NULL ELSE id END AS v FROM range(10)"
    )
    with pytest.raises(ValueError, match="NULL"):
        ex.range_bounds(withnulls, "v", n_shards=4)


def test_export_query_gated_and_manifested(spark, engine, tmpdir_path):
    """Bulk export: gate + ACL apply, files land executor-parallel with
    a validating manifest; csv and parquet round-trip the row count."""
    man = engine.export_query(
        "SELECT id, v FROM qs_tab WHERE id >= :lo",
        f"{tmpdir_path}/exp_pq",
        params={"lo": 4},
    )
    assert man["rows"] == 6 and man["format"] == "parquet"
    assert spark.read.parquet(f"{tmpdir_path}/exp_pq").count() == 6

    man2 = engine.export_query(
        "SELECT id FROM qs_tab", f"{tmpdir_path}/exp_csv", fmt="csv"
    )
    assert man2["rows"] == 10

    # empty results export cleanly (no read-back schema inference crash)
    man3 = engine.export_query(
        "SELECT id FROM qs_tab WHERE id < 0", f"{tmpdir_path}/exp_empty", fmt="csv"
    )
    assert man3["rows"] == 0

    # a quoted embedded newline is ONE row, not two
    man4 = engine.export_query(
        "SELECT concat('a', chr(10), 'b') AS s FROM qs_tab WHERE id = 1",
        f"{tmpdir_path}/exp_nl",
        fmt="csv",
    )
    assert man4["rows"] == 1

    # jsonl: newline-delimited JSON, one object per row, round-trips —
    # and NULL columns serialize as explicit null (ignoreNullFields off),
    # so a consumer can distinguish NULL from column-absent.
    import glob
    import json as _json

    man5 = engine.export_query(
        "SELECT id, CASE WHEN id % 2 = 0 THEN v END AS v FROM qs_tab",
        f"{tmpdir_path}/exp_jsonl",
        fmt="jsonl",
    )
    assert man5["rows"] == 10 and man5["format"] == "jsonl"
    lines = []
    for f in glob.glob(f"{tmpdir_path}/exp_jsonl/part-*"):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == 10
    objs = [_json.loads(ln) for ln in lines]
    assert sorted(o["id"] for o in objs) == list(range(10))
    assert all("v" in o for o in objs)  # NULL rows keep the key
    assert sum(1 for o in objs if o["v"] is None) == 5

    bob = User(name="bob", groups=[])
    with pytest.raises(PermissionError):
        engine.export_query("SELECT * FROM qs_tab", f"{tmpdir_path}/nope", user=bob)
    with pytest.raises(ValueError):
        engine.export_query("SELECT 1", f"{tmpdir_path}/bad", fmt="xlsx")


def test_refresh_sweep_skips_failures_and_warns_on_coerced_params(spark, tmpdir_path):
    """r6 ADVICE: a per-entry failure (pre-fidelity parameterized entry
    with no recorded Params; a since-deleted SourceAnalysis) SKIPS with
    a refresh_failed audit row instead of aborting the sweep mid-list —
    a healthy stale entry later in the catalog still refreshes. And a
    refresh that re-binds JSON-coerced params (ParamsFidelity False)
    emits a UserWarning but still runs."""
    import datetime as _dt
    import warnings as _w

    from logverzcore_spark.audit import AuditLog

    cat = Catalog(path=f"{tmpdir_path}/rs_cat.jsonl")
    audit = AuditLog(path=f"{tmpdir_path}/rs_audit.jsonl")
    engine = Engine(spark, cat, audit=audit)
    spark.range(10).write.mode("overwrite").saveAsTable("rs_src")
    cat.record_query(CatalogEntry(TableName="rs_src"))
    try:
        # A: parameterized template; strip Params to mimic a pre-r5 entry
        engine.save_query(
            "rs_a", "SELECT count(*) AS n FROM rs_src WHERE id >= :lo"
        )
        engine.materialize_saved("rs_a", params={"lo": 0})
        entry_a = cat.for_table("rs_a_mat")
        del entry_a.QuerySettings["Params"]
        entry_a.QuerySettings.pop("ParamsFidelity", None)
        # B: SourceAnalysis deleted after materialization
        engine.save_query("rs_b", "SELECT sum(id) AS s FROM rs_src")
        engine.materialize_saved("rs_b")
        from logverzcore_spark.api import ADMIN
        cat.deactivate_table("rs_b", ADMIN)
        # C: coerced params (date → string) → fidelity False
        engine.save_query(
            "rs_c", "SELECT count(*) AS n FROM rs_src WHERE id >= :lo"
        )
        engine.materialize_saved("rs_c", params={"lo": 0, "d": _dt.date(2024, 1, 2)})
        assert cat.for_table("rs_c_mat").QuerySettings["ParamsFidelity"] is False
        # D: healthy typed params → fidelity True
        engine.save_query("rs_d", "SELECT sum(id) AS m FROM rs_src")
        engine.materialize_saved("rs_d")
        assert cat.for_table("rs_d_mat").QuerySettings["ParamsFidelity"] is True

        spark.range(5).write.mode("append").saveAsTable("rs_src")  # all stale
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            refreshed = engine.refresh_materialized()
        # failures skipped, healthy entries refreshed despite earlier failures
        assert "rs_a_mat" not in refreshed and "rs_b_mat" not in refreshed
        assert "rs_c_mat" in refreshed and "rs_d_mat" in refreshed
        assert spark.table("rs_d_mat").first()["m"] == 55  # 45 + append's 10
        # the coerced-params refresh warned (and only that one)
        warns = [w for w in caught if issubclass(w.category, UserWarning)
                 and "JSON-coerced" in str(w.message)]
        assert len(warns) == 1 and "rs_c_mat" in str(warns[0].message)
        # both failures left refresh_failed audit rows with the reason
        failed = [e for e in audit.entries() if e.Mode == "refresh_failed"]
        assert len(failed) == 2
        reasons = " | ".join(e.Error for e in failed)
        assert "no recorded Params" in reasons
        assert "rs_a_mat" in " ".join(t for e in failed for t in e.Tables)
        # skipped entries remain stale (sweep can be retried after repair)
        assert engine.is_stale("rs_a_mat") is True
    finally:
        for t in ["rs_a_mat", "rs_b_mat", "rs_c_mat", "rs_d_mat", "rs_src"]:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_table_snapshot_remote_paths_report_unreliable(tmpdir_path):
    """r6 ADVICE: input files that aren't stat-able local paths (s3://,
    hdfs://) make the whole table's snapshot None (always-stale) instead
    of a count-only fingerprint that reads same-count overwrites as
    fresh."""
    import os as _os

    local_file = f"{tmpdir_path}/x.parquet"
    with open(local_file, "wb") as fh:
        fh.write(b"x")

    class _Tbl:
        def __init__(self, files):
            self._files = files

        def inputFiles(self):
            return self._files

    class _Cat:
        def refreshTable(self, t):
            pass

    class _Spark:
        def __init__(self, files):
            self.catalog = _Cat()
            self._files = files

        def table(self, t):
            return _Tbl(self._files[t])

    eng = Engine.__new__(Engine)
    eng.spark = _Spark({
        "remote": ["s3://bucket/key.parquet"],
        "mixed": [f"file:{local_file}", "hdfs://nn/part.parquet"],
        "local": [f"file:{local_file}"],
    })
    snap = eng._table_snapshot(["remote", "mixed", "local"])
    assert snap["remote"] is None
    assert snap["mixed"] is None
    assert snap["local"] == {
        "n_files": 1, "max_mtime": _os.path.getmtime(local_file),
    }


def test_register_snapshot_pins_versions_for_sql(spark, tmpdir_path):
    """Engine.register_snapshot: a pinned version answers SQL by name
    and stays frozen while the table moves on; non-admins are refused;
    hostile names are rejected before touching the catalog."""
    import os

    import pytest as _pytest

    from logverzcore_spark.api import Engine
    from logverzcore_spark.catalog import Catalog, User
    from logverzcore_spark.snapshots import SnapshotTable

    eng = Engine(spark, Catalog())
    root = os.path.join(tmpdir_path, "snapv")
    t = SnapshotTable(root)
    t.append(spark.range(0, 10))
    t.append(spark.range(10, 30))

    assert eng.register_snapshot("corpus_v1", root, version=1) == 1
    assert eng.register_snapshot("corpus_latest", root) == 2
    r1 = eng.sql("SELECT COUNT(*) AS n FROM corpus_v1").first()["n"]
    r2 = eng.sql("SELECT COUNT(*) AS n FROM corpus_latest").first()["n"]
    assert (r1, r2) == (10, 30)
    t.append(spark.range(30, 35))  # the table moves on...
    assert eng.sql("SELECT COUNT(*) AS n FROM corpus_v1").first()["n"] == 10

    nobody = User(name="n", groups=[], is_admin=False, is_poweruser=False)
    with _pytest.raises(PermissionError):
        eng.register_snapshot("x", root, user=nobody)
    with _pytest.raises(ValueError):
        eng.register_snapshot("bad name; drop", root)


def test_register_snapshot_acl_grants_non_admin_reads(spark, tmpdir_path):
    """r7 VERDICT task 7: pinned-version views are CATALOGED (Type=
    'SNAP') and ACL'd like tables — a granted non-admin analyst queries
    the pin through the gated SQL surface AND exports from it
    (export_query routes through the same gate), an ungranted user is
    refused with the denial audited, and the pin metadata (root +
    version) is readable off the catalog entry."""
    import os

    import pytest as _pytest

    from logverzcore_spark.api import Engine
    from logverzcore_spark.audit import AuditLog
    from logverzcore_spark.catalog import Catalog, User
    from logverzcore_spark.snapshots import SnapshotTable

    eng = Engine(spark, Catalog(), audit=AuditLog())
    root = os.path.join(tmpdir_path, "snapacl")
    t = SnapshotTable(root)
    t.append(spark.range(0, 10))
    t.append(spark.range(10, 30))

    analyst = User(name="ana", groups=["research"])
    outsider = User(name="out", groups=[])
    assert eng.register_snapshot("pinned_v1", root, version=1,
                                 access=["research"]) == 1

    # granted non-admin: SQL surface works against the pinned version
    n = eng.sql("SELECT COUNT(*) AS n FROM pinned_v1", user=analyst).first()["n"]
    assert n == 10
    # ...and bulk export from the pin routes through the same gate
    out_dir = os.path.join(tmpdir_path, "snapacl_export")
    manifest = eng.export_query(
        "SELECT * FROM pinned_v1 WHERE id >= 5", out_dir, user=analyst
    )
    assert manifest["rows"] == 5
    assert spark.read.parquet(out_dir).count() == 5

    # ungranted user: refused, and the denial lands in the audit log
    with _pytest.raises(PermissionError):
        eng.sql("SELECT COUNT(*) AS n FROM pinned_v1", user=outsider)
    denied = eng.audit.entries(user="out", status="denied")
    assert denied and "pinned_v1" in denied[-1].Tables

    # the pin is first-class catalog metadata
    e = eng.catalog.for_table("pinned_v1", "default")
    assert e.Type == "SNAP"
    assert e.QuerySettings["Version"] == 1
    assert e.QuerySettings["SnapshotRoot"].endswith("snapacl")

    # a different user cannot shadow someone else's pinned view
    power = User(name="pw", groups=[], is_poweruser=True)
    with _pytest.raises(PermissionError):
        eng.register_snapshot("pinned_v1", root, version=2, user=power)


def test_find_all_on_snap_entry_prunes_files(spark, tmpdir_path):
    """Engine.find_all over a pinned snapshot routes its optree where
    through manifest-stats pruning: the scan touches only files whose
    intervals can match (observable via inputFiles), the result is
    identical to the temp-view path, and the ACL gate still applies."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from logverzcore_spark.api import Engine
    from logverzcore_spark.catalog import Catalog, User
    from logverzcore_spark.snapshots import SnapshotTable

    eng = Engine(spark, Catalog())
    root = os.path.join(tmpdir_path, "snapfa")
    t = SnapshotTable(root)
    df = spark.range(0, 1000).withColumn("k", F.col("id").cast("int"))
    for lo in (0, 250, 500, 750):
        t.append(df.where((F.col("id") >= lo) & (F.col("id") < lo + 250)).coalesce(2))
    eng.register_snapshot("pinned_fa", root)
    all_files = set(SnapshotTable(root)._manifest(spark, 4))

    out = eng.find_all("pinned_fa", where={"k": {"between": [260, 280]}})
    got = sorted(r["k"] for r in out.collect())
    assert got == list(range(260, 281))
    # inputFiles spells the scheme file:///, the manifest file:/ —
    # normalize before comparing
    norm = lambda p: p.replace("file:///", "file:/")  # noqa: E731
    scanned = {norm(f) for f in out.inputFiles()}
    assert scanned and scanned < {norm(f) for f in all_files}

    # temp-view path (no where) unchanged, and ACLs still gate
    assert eng.find_all("pinned_fa").count() == 1000
    nobody = User(name="n", groups=[], is_admin=False, is_poweruser=False)
    with _pytest.raises(PermissionError):
        eng.find_all("pinned_fa", user=nobody, where={"k": 1})


def test_engine_snapshot_dml_owner_gated_and_audited(spark, tmpdir_path):
    """r10: the snapshot DML surface (delete/update/merge on a
    cataloged SNAP view) is OWNER-gated — read grants never imply
    writes — audited on success AND refusal, and repin=True moves the
    pinned view without re-owning the catalog entry."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from logverzcore_spark.api import Engine
    from logverzcore_spark.audit import AuditLog
    from logverzcore_spark.catalog import Catalog, User
    from logverzcore_spark.snapshots import SnapshotTable

    audit = AuditLog()
    eng = Engine(spark, Catalog(), audit=audit)
    root = os.path.join(tmpdir_path, "snapdml")
    t = SnapshotTable(root)
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    t.append(df.where("id < 50").coalesce(1))
    t.append(df.where("id >= 50").coalesce(1))

    owner = User(name="own", groups=[], is_admin=False, is_poweruser=True)
    reader = User(name="rdr", groups=["research"])
    assert eng.register_snapshot(
        "corp", root, user=owner, access=["research"]
    ) == 2

    # a READ-granted non-owner may not write; the refusal is audited
    with _pytest.raises(PermissionError, match="read access does not"):
        eng.snapshot_delete_where("corp", {"id": 1}, user=reader)
    last = audit.entries()[-1]
    # r12: permission refusals audit as "denied" on every gated
    # surface, write gates included (reads already did)
    assert last.Status == "denied" and last.Mode == "snapshot_delete"

    # the owner deletes; the default keeps the pin byte-stable
    v = eng.snapshot_delete_where("corp", {"id": {"lt": 10}}, user=owner)
    assert v == 3
    assert eng.sql("SELECT COUNT(*) AS n FROM corp", user=reader).first()["n"] == 100
    assert t.count(spark) == 90  # the table head moved

    # update with repin: the view follows, owners/access preserved
    v = eng.snapshot_update_where(
        "corp", {"id": {"gte": 90}}, {"v": F.lit(-1)},
        user=owner, repin=True,
    )
    assert v == 4
    got = eng.sql(
        "SELECT COUNT(*) AS n FROM corp WHERE v = -1", user=reader
    ).first()["n"]
    assert got == 10
    entry = eng.catalog.for_table("corp", "default")
    assert entry.Owners == ["own"]
    assert entry.QuerySettings["Version"] == 4
    assert entry.Access == ["research"]

    # merge through the gate, repinned
    src = spark.createDataFrame([(5, 555), (2000, 1)], "id long, v long")
    v = eng.snapshot_merge_into("corp", src, on="id", user=owner, repin=True)
    assert v == 5
    n = eng.sql("SELECT COUNT(*) AS n FROM corp", user=reader).first()["n"]
    assert n == 92  # 90 + 2 inserts (id 5 was deleted above, so it re-inserts)
    assert eng.sql(
        "SELECT v FROM corp WHERE id = 5", user=reader
    ).first()["v"] == 555

    # non-SNAP names refuse; audit trail recorded the successes
    with _pytest.raises(ValueError, match="no cataloged snapshot"):
        eng.snapshot_update_where("nope", {"id": 1}, {"v": F.lit(0)}, user=owner)
    modes = [r.Mode for r in audit.entries()]
    assert modes.count("snapshot_delete") >= 2  # refusal + success
    assert "snapshot_update" in modes and "snapshot_merge" in modes


def test_engine_snapshot_history_and_restore_gated_and_audited(spark, tmpdir_path):
    """r11 (r10 VERDICT task 2): history/restore get the same Engine
    surface the DML triad has. history is READ-gated (a read grant
    sees the commit log, a stranger does not — denial audited);
    restore is OWNER-gated (rolling a table back is a write), audited
    on success AND refusal, with repin moving the pinned view without
    re-owning the entry — the end-to-end rollback of a bad
    snapshot_delete_where."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from logverzcore_spark.api import Engine
    from logverzcore_spark.audit import AuditLog
    from logverzcore_spark.catalog import Catalog, User
    from logverzcore_spark.snapshots import SnapshotTable

    audit = AuditLog()
    eng = Engine(spark, Catalog(), audit=audit)
    root = os.path.join(tmpdir_path, "snaphr")
    t = SnapshotTable(root)
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    t.append(df.where("id < 50").coalesce(1))
    t.append(df.where("id >= 50").coalesce(1))

    owner = User(name="own", groups=[], is_admin=False, is_poweruser=True)
    reader = User(name="rdr", groups=["research"])
    stranger = User(name="str", groups=[], is_admin=False, is_poweruser=False)
    assert eng.register_snapshot(
        "corph", root, user=owner, access=["research"]
    ) == 2

    # the bad write to roll back
    assert eng.snapshot_delete_where(
        "corph", {"id": {"lt": 90}}, user=owner
    ) == 3
    assert t.count(spark) == 10

    # history: a READ grant suffices; a stranger is refused + audited
    hist = eng.snapshot_history("corph", user=reader)
    assert [h["version"] for h in hist] == [3, 2, 1]
    assert hist[0]["op"] == "delete" and hist[0]["rows"] == 10
    with _pytest.raises(PermissionError, match="may not read"):
        eng.snapshot_history("corph", user=stranger)
    last = audit.entries()[-1]
    assert last.Status == "denied" and last.Mode == "snapshot_history"

    # restore: a read grant does NOT allow it; the refusal is audited
    with _pytest.raises(PermissionError, match="read access does not"):
        eng.snapshot_restore("corph", version=2, user=reader)
    last = audit.entries()[-1]
    assert last.Status == "denied" and last.Mode == "snapshot_restore"
    assert t.count(spark) == 10  # nothing moved

    # the owner rolls back, repinning the view to the restored version
    v = eng.snapshot_restore("corph", version=2, user=owner, repin=True)
    assert v == 4
    assert t.count(spark) == 100  # the bad delete is undone
    n = eng.sql("SELECT COUNT(*) AS n FROM corph", user=reader).first()["n"]
    assert n == 100
    entry = eng.catalog.for_table("corph", "default")
    assert entry.Owners == ["own"] and entry.Access == ["research"]
    assert entry.QuerySettings["Version"] == 4
    # the rollback itself is a first-class history row
    assert eng.snapshot_history("corph", user=owner)[0]["op"] == "restore"
    modes = [r.Mode for r in audit.entries()]
    assert modes.count("snapshot_restore") >= 2  # refusal + success


def test_engine_snapshot_compact_and_vacuum_gated_pin_protected(spark, tmpdir_path):
    """r11: the maintenance writes get the Engine surface too —
    compact behind the owner gate with repin; vacuum owner-gated,
    audited, and PIN-PROTECTED: a retention sweep can never delete
    the version a cataloged view's readers resolve."""
    import os
    import time

    import pytest as _pytest
    from pyspark.sql import functions as F

    from logverzcore_spark.api import Engine
    from logverzcore_spark.audit import AuditLog
    from logverzcore_spark.catalog import Catalog, User
    from logverzcore_spark.snapshots import SnapshotTable

    audit = AuditLog()
    eng = Engine(spark, Catalog(), audit=audit)
    root = os.path.join(tmpdir_path, "snapcv")
    t = SnapshotTable(root)
    df = spark.range(0, 200).withColumn("v", F.col("id") * 2)
    for lo in (0, 50, 100, 150):
        t.append(df.where(
            (F.col("id") >= lo) & (F.col("id") < lo + 50)
        ).coalesce(2))

    owner = User(name="own", groups=[], is_admin=False, is_poweruser=True)
    reader = User(name="rdr", groups=["research"])
    # pin an EARLY version: the vacuum below must not break it
    assert eng.register_snapshot(
        "corpcv", root, version=2, user=owner, access=["research"]
    ) == 2

    # read grants don't compact or vacuum; refusals audited
    with _pytest.raises(PermissionError, match="read access does not"):
        eng.snapshot_compact("corpcv", user=reader, target_files=1)
    with _pytest.raises(PermissionError, match="read access does not"):
        eng.snapshot_vacuum("corpcv", user=reader)
    assert [r.Mode for r in audit.entries()[-2:]] == [
        "snapshot_compact", "snapshot_vacuum"
    ]
    assert all(r.Status == "denied" for r in audit.entries()[-2:])

    # the owner compacts with repin: same rows, fewer files, view moves
    v = eng.snapshot_compact(
        "corpcv", user=owner, sort_cols=["id"], target_files=2, repin=True
    )
    assert v == 5
    assert len(t._manifest(spark, v)) <= 2
    entry = eng.catalog.for_table("corpcv", "default")
    assert entry.QuerySettings["Version"] == 5
    assert entry.Owners == ["own"] and entry.Access == ["research"]
    n = eng.sql("SELECT COUNT(*) AS n FROM corpcv", user=reader).first()["n"]
    assert n == 200

    # re-pin back to the early version, and a SECOND view pins v4 on
    # the same root; the aggressive retention sweep through the first
    # view must protect BOTH pins (every SNAP entry on the root rides
    # in keep_versions), while unpinned old versions age out
    eng.register_snapshot("corpcv", root, version=2, user=owner,
                          access=["research"])
    eng.register_snapshot("corpcv_b", root, version=4, user=owner)
    eng.snapshot_vacuum(
        "corpcv", user=owner, older_than=time.time() + 1,
        orphan_grace_s=0.0,
    )
    vs = t.versions(spark)
    assert 2 in vs and 4 in vs and 5 in vs  # both pins + head survive
    assert 1 not in vs and 3 not in vs
    assert eng.sql("SELECT COUNT(*) AS n FROM corpcv_b").first()["n"] == 200
    # the pinned view still reads every row it pinned
    n = eng.sql("SELECT COUNT(*) AS n FROM corpcv", user=reader).first()["n"]
    assert n == 100  # versions 1-2 = ids 0..99
    assert t.read(spark, 2).count() == 100
    modes = [r.Mode for r in audit.entries()]
    assert modes.count("snapshot_vacuum") >= 2  # refusal + success


def test_engine_materialized_view_surface_gated_and_audited(spark, tmpdir_path):
    """r12: IncrementalAggregate gets the Engine surface — a cataloged
    Type='MV' maintained analysis. Mirrors the snapshot owner-gate
    battery: a GRANTED non-admin reads result()/staleness but cannot
    refresh (denied + audited); the owner refreshes through DML with
    the report's mode/priced trail in the audit row; the spec
    round-trips through a fresh Engine from the catalog alone."""
    import os

    from pyspark.sql import functions as F

    from logverzcore_spark.audit import AuditLog
    from logverzcore_spark.snapshots import SnapshotTable

    audit = AuditLog()
    cat = Catalog(path=f"{tmpdir_path}/mvcat.jsonl")
    eng = Engine(spark, cat, audit=audit)
    root = os.path.join(str(tmpdir_path), "mvsrc")
    state = os.path.join(str(tmpdir_path), "mvstate")
    t = SnapshotTable(root)
    t.append(
        spark.range(0, 400).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("g"),
            (F.col("id") * 3).alias("v"),
        ).repartitionByRange(8, "k")
    )

    owner = User(name="own", groups=[], is_admin=False, is_poweruser=True)
    reader = User(name="rdr", groups=["research"])
    stranger = User(name="eve", groups=["elsewhere"])

    # plain users cannot bind filesystem roots into the catalog
    with pytest.raises(PermissionError, match="admin/poweruser"):
        eng.register_materialized(
            "mv_sales", root, state, ["g"], {"n": ("count", None)},
            user=reader,
        )
    # unsupported aggregates refuse at REGISTRATION, not first refresh
    with pytest.raises(ValueError, match="not incrementally mergeable"):
        eng.register_materialized(
            "mv_bad", root, state, ["g"], {"p": ("percentile", "v")},
            user=owner,
        )

    rep = eng.register_materialized(
        "mv_sales", root, state, ["g"],
        {"n": ("count", None), "s": ("sum", "v")},
        source_keys=["k"], user=owner, access=["research"],
    )
    assert rep["mode"] == "initial"

    # granted reader consumes the dashboard...
    got = {
        r["g"]: (r["n"], r["s"])
        for r in eng.materialized_result("mv_sales", user=reader).collect()
    }
    assert got[0][0] == 100
    stale = eng.materialized_staleness("mv_sales", user=reader)
    assert stale == {"reflects": 1, "source_head": 1, "stale": False}
    # ...a stranger does not (denied + audited)
    with pytest.raises(PermissionError, match="may not read"):
        eng.materialized_result("mv_sales", user=stranger)
    last = audit.entries()[-1]
    assert last.Status == "denied" and last.Mode == "materialized_result"

    # the reader cannot PAY the maintenance: refresh is a write
    t.delete_where(spark, {"k": {"between": [0, 49]}})
    assert eng.materialized_staleness("mv_sales", user=reader)["stale"]
    with pytest.raises(PermissionError, match="does not grant writes"):
        eng.materialized_refresh("mv_sales", user=reader)
    last = audit.entries()[-1]
    assert last.Status == "denied" and last.Mode == "materialized_refresh"

    # the owner refreshes; the audit row carries the priced decision
    rep = eng.materialized_refresh("mv_sales", user=owner)
    assert rep["mode"] == "fold" and rep["priced_span"] <= rep["priced_head"]
    last = audit.entries()[-1]
    assert last.Status == "ok" and "mode=fold" in last.Query
    assert "priced_span=" in last.Query

    # the refreshed MV is queryable through the GATED SQL surface —
    # the catalog entry's Owners/Access gate the view name exactly
    # like a snapshot pin, and the view reflects the folded state
    got = {
        r["g"]: r["n"]
        for r in eng.sql(
            "SELECT g, n FROM mv_sales", user=reader
        ).collect()
    }
    assert got == {
        r["g"]: r["n"]
        for r in t.read(spark).groupBy("g").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    with pytest.raises(PermissionError, match="may not query"):
        eng.sql("SELECT * FROM mv_sales", user=stranger)

    # a FRESH Engine reconstructs the maintained view from the catalog
    eng2 = Engine(spark, Catalog(path=f"{tmpdir_path}/mvcat.jsonl"),
                  audit=AuditLog())
    got = {
        r["g"]: (r["n"], r["s"])
        for r in eng2.materialized_result("mv_sales", user=reader).collect()
    }
    want = {
        r["g"]: (r["n"], r["s"])
        for r in t.read(spark).groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        ).collect()
    }
    assert got == want

    # the slot is owner-gated against shadowing
    other = User(name="usurper", groups=[], is_admin=False,
                 is_poweruser=True)
    with pytest.raises(PermissionError, match="cannot shadow"):
        eng.register_materialized(
            "mv_sales", root, state + "_2", ["g"],
            {"n": ("count", None)}, user=other,
        )


def test_refresh_sweep_covers_maintained_mvs(spark, tmpdir_path):
    """r12: refresh_materialized sweeps Type='MV' entries too — owned
    + stale gets one incremental refresh (never a re-materialize);
    entries merely visible skip; a broken entry records refresh_failed
    and the sweep continues."""
    import os

    from pyspark.sql import functions as F

    from logverzcore_spark.audit import AuditLog
    from logverzcore_spark.snapshots import SnapshotTable

    audit = AuditLog()
    eng = Engine(spark, Catalog(path=f"{tmpdir_path}/swcat.jsonl"),
                 audit=audit)
    owner = User(name="own", groups=[], is_admin=False, is_poweruser=True)
    other = User(name="oth", groups=[], is_admin=False, is_poweruser=True)

    root = os.path.join(str(tmpdir_path), "swsrc")
    t = SnapshotTable(root)
    t.append(spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("g"),
        F.col("id").alias("v"),
    ).coalesce(2))
    eng.register_materialized(
        "mv_sw", root, os.path.join(str(tmpdir_path), "swstate"),
        ["g"], {"n": ("count", None), "s": ("sum", "v")},
        source_keys=["k"], user=owner, access=["research"],
    )
    # another owner's MV: the sweep must not touch it
    root2 = os.path.join(str(tmpdir_path), "swsrc2")
    t2 = SnapshotTable(root2)
    t2.append(spark.range(0, 20).select(
        F.col("id").alias("k"), F.lit(0).alias("g"), F.col("id").alias("v"),
    ).coalesce(1))
    eng.register_materialized(
        "mv_other", root2, os.path.join(str(tmpdir_path), "swstate2"),
        ["g"], {"n": ("count", None)}, user=other,
    )

    # not stale: sweep refreshes nothing
    assert eng.refresh_materialized(user=owner) == []
    # stale after an append: sweep refreshes the OWNED one only
    t.append(spark.range(100, 160).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("g"),
        F.col("id").alias("v"),
    ).coalesce(1))
    t2.append(spark.range(20, 30).select(
        F.col("id").alias("k"), F.lit(0).alias("g"), F.col("id").alias("v"),
    ).coalesce(1))
    assert eng.refresh_materialized(user=owner) == ["mv_sw"]
    assert not eng.materialized_staleness("mv_sw", user=owner)["stale"]
    assert eng.materialized_staleness("mv_other", user=other)["stale"]
    # and the other owner's own sweep picks theirs up
    assert eng.refresh_materialized(user=other) == ["mv_other"]
