"""Multi-process metadata safety (the r8→r9 headline): the catalog /
Preferences / Identities stores must interleave writes from several
engine processes sharing one warehouse WITHOUT loss — item-level CAS
semantics (the reference's conditional DynamoDB PutItem,
nosql.js:309-354) — and the commit-backend seam must deliver the same
exclusive-commit contract on rename filesystems and conditional-put
object stores alike."""

import json
import multiprocessing
import os
import threading

import pytest

from logverzcore_spark.catalog import (
    Catalog,
    CatalogEntry,
    Identities,
    Preferences,
    User,
)
from logverzcore_spark.fsutil import (
    CommitConflict,
    InMemoryConditionalPut,
    LocalFSBackend,
)
from logverzcore_spark.metastore import GenerationStore

ADMIN = User("root", is_admin=True)


# ---------------------------------------------------------------- backends


def test_local_backend_put_if_absent_exclusive(tmpdir_path):
    b = LocalFSBackend()
    p = os.path.join(tmpdir_path, "one.json")
    b.put_if_absent(p, b'{"a": 1}')
    assert b.read_bytes(p) == b'{"a": 1}'
    with pytest.raises(CommitConflict):
        b.put_if_absent(p, b'{"a": 2}')
    assert b.read_bytes(p) == b'{"a": 1}'  # loser never replaces
    # lock-free: no .lock residue, and staging cleaned up
    assert os.listdir(tmpdir_path) == ["one.json"]


def test_local_backend_threaded_contention(tmpdir_path):
    """N threads race one path through os.link: exactly one winner, the
    committed content is one of the candidates, whole."""
    b = LocalFSBackend()
    p = os.path.join(tmpdir_path, "race.json")
    outcomes = []

    def attempt(i):
        try:
            b.put_if_absent(p, json.dumps({"writer": i}).encode())
            outcomes.append(("win", i))
        except CommitConflict:
            outcomes.append(("lose", i))

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    wins = [i for kind, i in outcomes if kind == "win"]
    assert len(wins) == 1 and len(outcomes) == 8
    assert json.loads(b.read_bytes(p)) == {"writer": wins[0]}


def test_inmemory_conditional_put_contract():
    b = InMemoryConditionalPut()
    b.put_if_absent("s3://bkt/x/gen-1.json", b"[1]")
    with pytest.raises(CommitConflict):
        b.put_if_absent("s3://bkt/x/gen-1.json", b"[2]")
    assert b.read_bytes("s3://bkt/x/gen-1.json") == b"[1]"
    assert b.list_dir("s3://bkt/x") == ["gen-1.json"]
    assert b.delete("s3://bkt/x/gen-1.json") and not b.exists("s3://bkt/x/gen-1.json")


def test_exclusive_commit_through_conditional_put_backend():
    """fsutil.write_small_json_exclusive routed through the object-store
    family: one winner, losers CommitConflict, no rename/lock machinery
    involved (the backend has none)."""
    from logverzcore_spark.fsutil import read_small_json, write_small_json_exclusive

    b = InMemoryConditionalPut()
    write_small_json_exclusive(None, "s3://bkt/m/v1.json", {"files": ["f1"]},
                               backend=b)
    with pytest.raises(CommitConflict):
        write_small_json_exclusive(None, "s3://bkt/m/v1.json", {"files": ["f2"]},
                                   backend=b)
    assert read_small_json(None, "s3://bkt/m/v1.json", backend=b) == {
        "files": ["f1"]
    }


# ------------------------------------------------------------ GenerationStore


def test_generation_store_cas_retry_merges(tmpdir_path):
    """The no-lost-update core: a writer that loses the CAS re-applies
    its mutation to the winner's outcome — both records land."""
    d = os.path.join(tmpdir_path, "gs")
    gs = GenerationStore(d)

    def add(name):
        def fn(records):
            return records + [{"name": name}], name
        return fn

    gs.mutate(add("a"))

    # Simulate a concurrent writer landing between our head-read and
    # commit: a conditional-put backend with an injection seam.
    b = InMemoryConditionalPut()
    gs2 = GenerationStore("mem://s", backend=b)
    fired = {"done": False}

    def interloper(path, data):
        if not fired["done"]:
            fired["done"] = True  # fire once, then let the retry through
            b._objects[path] = json.dumps([{"name": "other"}]).encode()

    b.before_put = interloper
    gs2.mutate(add("mine"))
    _, records = gs2.head()
    names = sorted(r["name"] for r in records)
    assert names == ["mine", "other"]  # NOT ["mine"] — the merge happened


def test_generation_store_prunes_but_head_stable(tmpdir_path):
    d = os.path.join(tmpdir_path, "gs2")
    gs = GenerationStore(d, keep_generations=3)
    for i in range(10):
        gs.mutate(lambda rs, i=i: (rs + [{"i": i}], None))
    gen, records = gs.head()
    assert gen == 10 and len(records) == 10
    kept = sorted(os.listdir(d))
    assert len(kept) <= 3 and kept[-1] == "gen-000000000010.json"


def test_generation_store_gives_up_loudly():
    """Pathological permanent contention surfaces as CommitConflict,
    never an infinite loop or silent drop."""
    b = InMemoryConditionalPut()
    gs = GenerationStore("mem://hot", backend=b)
    n = {"i": 0}

    def always_steal(path, data):
        n["i"] += 1
        b._objects[path] = b"[]"  # someone else always wins

    b.before_put = always_steal
    with pytest.raises(CommitConflict, match="CAS attempts"):
        gs.mutate(lambda rs: (rs + [{"x": 1}], None), max_retries=5)
    assert n["i"] == 5


# ----------------------------------------------------- shared metadata stores


def test_shared_catalog_two_processes_no_lost_entries(tmpdir_path):
    """The headline scenario: two Catalog instances (≈ two engine
    processes) share one warehouse directory; interleaved writes where
    each instance holds a stale in-memory view must ALL land."""
    d = os.path.join(tmpdir_path, "cat")
    a = Catalog(d, shared=True)
    b = Catalog(d, shared=True)
    a.record_query(CatalogEntry(TableName="from_a", Owners=["ua"]))
    # b's in-memory view predates a's write — the legacy flush would
    # now drop from_a; the CAS mutate must re-read and merge instead.
    b.record_query(CatalogEntry(TableName="from_b", Owners=["ub"]))
    a.record_query(CatalogEntry(TableName="from_a2", Owners=["ua"]))
    for inst in (a, b, Catalog(d, shared=True)):
        assert sorted(e.TableName for e in inst.list(ADMIN)) == [
            "from_a", "from_a2", "from_b"
        ]


def test_shared_catalog_semantics_preserved(tmpdir_path):
    """Supersede-on-record, immutable-identity guard, ownership gate and
    deactivation all hold in shared mode — including across instances."""
    d = os.path.join(tmpdir_path, "cat2")
    a = Catalog(d, shared=True)
    b = Catalog(d, shared=True)
    e1 = a.record_query(CatalogEntry(TableName="t", Owners=["alice"]))
    e2 = b.record_query(CatalogEntry(TableName="t", Owners=["alice"]))
    # the supersede ran against the FRESH head, not b's stale view
    assert a.for_table("t").ID == e2.ID
    assert not [e for e in a.list(ADMIN) if e.ID == e1.ID and e.Active]
    alice = User("alice")
    with pytest.raises(ValueError, match="immutable"):
        a.update(e2.ID, alice, TableName="other")
    with pytest.raises(PermissionError):
        b.update(e2.ID, User("mallory"), Archive=True)
    a.update(e2.ID, alice, QuerySettings={"k": 1})
    assert b.for_table("t").QuerySettings == {"k": 1}
    b.deactivate_table("t", alice)
    assert a.for_table("t") is None


def test_shared_preferences_and_identities_no_lost_entries(tmpdir_path):
    pd_ = os.path.join(tmpdir_path, "prefs")
    pa, pb = Preferences(pd_, shared=True), Preferences(pd_, shared=True)
    pa.put("theme.a", {"v": 1}, User("a"))
    pb.put("theme.b", {"v": 2}, User("b"))  # stale view; must not drop theme.a
    assert [i.Name for i in pa.list()] == ["theme.a", "theme.b"]
    with pytest.raises(PermissionError):
        pb.put("theme.a", {"v": 9}, User("b"))  # ownership still gated
    assert Preferences(pd_, shared=True).get("theme.a").Value == {"v": 1}

    id_ = os.path.join(tmpdir_path, "ids")
    ia, ib = Identities(id_, shared=True), Identities(id_, shared=True)
    ia.put("u1", ADMIN, iam_groups=["g1"])
    ib.put("u2", ADMIN, iam_groups=["LogverzPowerUsers-x"])
    assert [r.Name for r in ia.list()] == ["u1", "u2"]
    assert ib.resolve_user("u2").is_poweruser
    with pytest.raises(PermissionError):
        ib.put("mallory", User("mallory"))  # escalation guard intact


def _mp_write_prefs(args):
    d, worker, n = args
    store = Preferences(d, shared=True)
    me = User(f"w{worker}")
    for i in range(n):
        store.put(f"w{worker}.k{i}", {"i": i}, me)
    return worker


def test_shared_preferences_true_multiprocess(tmpdir_path):
    """Real OS processes (not threads) hammer one shared store — the
    scenario the JSONL last-writer-wins flush silently lost entries
    under. Every write from every process must be present."""
    d = os.path.join(tmpdir_path, "mp_prefs")
    n_procs, n_each = 4, 6
    ctx = multiprocessing.get_context("fork")
    with ctx.Pool(n_procs) as pool:
        pool.map(_mp_write_prefs, [(d, w, n_each) for w in range(n_procs)])
    names = [i.Name for i in Preferences(d, shared=True).list()]
    assert len(names) == n_procs * n_each
    assert sorted(names) == sorted(
        f"w{w}.k{i}" for w in range(n_procs) for i in range(n_each)
    )


def test_shared_catalog_threaded_contention(tmpdir_path):
    d = os.path.join(tmpdir_path, "cat_threads")
    n_threads, n_each = 6, 5
    errs = []

    def writer(w):
        try:
            cat = Catalog(d, shared=True)
            for i in range(n_each):
                cat.record_query(
                    CatalogEntry(TableName=f"t{w}_{i}", Owners=[f"u{w}"]),
                    deactivate_older=False,
                )
        except Exception as exc:  # pragma: no cover - surfaced by assert
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_threads)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs
    got = sorted(e.TableName for e in Catalog(d, shared=True).list(ADMIN))
    assert got == sorted(f"t{w}_{i}" for w in range(n_threads) for i in range(n_each))


def test_shared_mode_requires_directory_path():
    with pytest.raises(ValueError, match="directory"):
        Catalog(shared=True)


def test_snapshot_table_on_conditional_put_backend(spark, tmpdir_path):
    """The seam reaches the snapshot layer: manifests commit through a
    conditional-put backend (the object-store family) while data files
    stay ordinary immutable parquet — versions, time travel, exclusive
    commits, and tag-replay idempotence all hold with zero rename/lock
    machinery."""
    from logverzcore_spark.snapshots import SnapshotTable

    b = InMemoryConditionalPut()
    t = SnapshotTable(os.path.join(tmpdir_path, "snap"), backend=b)
    df = spark.range(5).withColumnRenamed("id", "v")
    assert t.append(df, tag="b1") == 1
    assert t.versions(spark) == [1]
    assert t.read(spark, 1).count() == 5
    assert t.append(df, tag="b1") == 1  # replay-idempotent through backend
    assert t.append(df.limit(2), tag="b2") == 2
    assert t.read(spark, 1).count() == 5 and t.read(spark).count() == 7
    # two committers who read the same head race version 3: exactly one
    # wins, the loser conflicts (no lock to break — the PUT is the commit)
    head_v, head = t._head(spark)
    f1, _, _, _ = t._write_data(df.limit(1))
    f2, _, _, _ = t._write_data(df.limit(1))
    assert t._commit(spark, f1, None, head, head_v) == 3
    with pytest.raises(CommitConflict):
        t._commit(spark, f2, None, head, head_v)
    assert t.versions(spark) == [1, 2, 3]  # history linear


def test_two_engines_share_one_warehouse(spark, tmpdir_path):
    """Engine.shared end-to-end: two Engine instances (≈ a pipeline
    process and an interactive server) on one warehouse directory —
    a catalog entry + grant recorded through engine A is immediately
    queryable through engine B by the granted user, identity records
    written via A resolve via B, denials still deny, and both engines'
    audit events land interleaved in the one audit file."""
    import json as _json

    from logverzcore_spark.api import Engine

    wh = os.path.join(tmpdir_path, "wh")
    a = Engine.shared(spark, wh)
    b = Engine.shared(spark, wh)

    # identity written via A resolves via B (admin flag from policy)
    a.identities.put("ops_admin", ADMIN,
                     policies={"UserAttached": [{"PolicyName": "AdministratorAccess"}]})
    a.identities.put("bob", ADMIN, iam_groups=["analysts"])
    assert b.resolve_user("ops_admin").is_admin
    bob = b.resolve_user("bob")
    assert not bob.is_admin and bob.groups == ["analysts"]

    # catalog entry + grant through A; query through B as bob
    spark.createDataFrame([(1, "x")], "id long, v string") \
        .createOrReplaceTempView("shared_tbl")
    a.catalog.record_query(CatalogEntry(
        TableName="shared_tbl", Owners=["ops_admin"], Access=["analysts"],
    ))
    assert b.sql("SELECT v FROM shared_tbl", user=bob).collect()[0]["v"] == "x"
    with pytest.raises(PermissionError):
        b.sql("SELECT v FROM shared_tbl", user=User("mallory"))

    # both engines' audit events interleave whole-line in one file
    assert a.audit is not None and a.audit.path == b.audit.path
    lines = [
        _json.loads(line) for line in open(a.audit.path) if line.strip()
    ]
    assert {(r["User"], r["Status"]) for r in lines} >= {
        ("bob", "ok"), ("mallory", "denied"),
    }
    spark.catalog.dropTempView("shared_tbl")


def test_legacy_jsonl_mode_unchanged(tmpdir_path):
    """The single-process file mode keeps its exact on-disk shape and
    reload behavior — existing warehouses keep working."""
    p = os.path.join(tmpdir_path, "cat.jsonl")
    cat = Catalog(p)
    cat.record_query(CatalogEntry(TableName="t", Owners=["u"]))
    with open(p) as fh:
        lines = [json.loads(line) for line in fh if line.strip()]
    assert len(lines) == 1 and lines[0]["TableName"] == "t"
    assert Catalog(p).for_table("t").Owners == ["u"]


def test_local_path_classification():
    """r13: the local-FS fast-path dispatcher — bare and file:-scheme
    paths short-circuit to Python I/O; remote schemes keep the
    Hadoop/backend route."""
    from logverzcore_spark.fsutil import _local_path

    assert _local_path("/a/b/c.json") == "/a/b/c.json"
    assert _local_path("file:/a/b.json") == "/a/b.json"
    assert _local_path("file:///a/b.json") == "/a/b.json"
    assert _local_path("rel/path.json") == "rel/path.json"
    assert _local_path("s3://bkt/k.json") is None
    assert _local_path("hdfs://nn/k.json") is None
    assert _local_path("s3a://bkt/k.json") is None


def test_write_small_json_commit_local_fastpath_atomic(tmpdir_path):
    """r13: write_small_json_commit's local fast-path keeps the
    atomic-existence contract without the JVM — whole-or-absent,
    refuses an existing target (IOError), no staging residue."""
    from logverzcore_spark.fsutil import read_small_json, write_small_json_commit

    path = os.path.join(str(tmpdir_path), "sub", "x.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_small_json_commit(None, path, {"k": [1, 2, 3]})
    assert read_small_json(None, path) == {"k": [1, 2, 3]}
    with pytest.raises(IOError, match="already exists"):
        write_small_json_commit(None, path, {"k": "other"})
    assert read_small_json(None, path) == {"k": [1, 2, 3]}  # winner intact
    residue = [n for n in os.listdir(os.path.dirname(path)) if ".part" in n]
    assert residue == []


def test_exclusive_commit_local_fastpath_lock_protocol(tmpdir_path):
    """r13: write_small_json_exclusive's local fast-path preserves the
    fail-stop lock protocol byte-for-byte — an orphan .lock blocks
    commits with CommitConflict until broken, a committed target
    conflicts, and the winner's content survives."""
    from logverzcore_spark.fsutil import (
        CommitConflict,
        read_small_json,
        write_small_json_exclusive,
    )

    path = os.path.join(str(tmpdir_path), "excl", "v1.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # orphan lock → fail-stop
    with open(path + ".lock", "w"):
        pass
    with pytest.raises(CommitConflict, match="holds the commit lock"):
        write_small_json_exclusive(None, path, {"v": 1})
    os.unlink(path + ".lock")
    write_small_json_exclusive(None, path, {"v": 1})
    with pytest.raises(CommitConflict, match="already exists"):
        write_small_json_exclusive(None, path, {"v": 2})
    assert read_small_json(None, path) == {"v": 1}
    assert not os.path.exists(path + ".lock")  # lock released


def test_exclusive_commit_local_fastpath_threaded(tmpdir_path):
    """r13: N threads race one local exclusive commit — exactly one
    wins, every loser raises CommitConflict, the file is whole."""
    import threading

    from logverzcore_spark.fsutil import (
        CommitConflict,
        read_small_json,
        write_small_json_exclusive,
    )

    path = os.path.join(str(tmpdir_path), "race", "v1.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    wins, losses, errs = [], [], []

    def worker(i):
        try:
            write_small_json_exclusive(None, path, {"w": i})
            wins.append(i)
        except CommitConflict:
            losses.append(i)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ths = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert not errs, errs
    assert len(wins) == 1 and len(losses) == 7
    assert read_small_json(None, path) == {"w": wins[0]}


def test_bare_path_fastpath_gated_on_default_fs(spark, tmpdir_path):
    """r14 (VERDICT task 1): the local metadata fast path must consult
    fs.defaultFS before treating a BARE path as local — on an HDFS/S3-
    default cluster Spark resolves bare paths against that store, and a
    driver-local shortcut would split manifests across filesystems.
    Explicit file: URIs stay fast-pathed regardless."""
    from logverzcore_spark import fsutil
    from logverzcore_spark.fsutil import (
        _DEFAULT_FS_LOCAL,
        _fastpath_local,
        read_small_json,
        write_small_json_commit,
    )

    hconf = spark._jsc.hadoopConfiguration()
    before = hconf.get("fs.defaultFS")
    _DEFAULT_FS_LOCAL.pop(spark, None)
    try:
        # Local defaultFS (this deployment): bare paths fast-path.
        assert _fastpath_local(spark, "/a/b.json") == "/a/b.json"
        # Flip defaultFS to a remote store: bare paths must now refuse
        # the shortcut (fall back to the Hadoop API)...
        hconf.set("fs.defaultFS", "hdfs://fake-namenode:9000")
        _DEFAULT_FS_LOCAL.pop(spark, None)
        assert _fastpath_local(spark, "/a/b.json") is None
        assert _fastpath_local(spark, "rel/p.json") is None
        # ...while explicit file: URIs keep the fast path (they name
        # the local FS unambiguously — no defaultFS resolution at all).
        assert _fastpath_local(spark, "file:///a/b.json") == "/a/b.json"
        path = os.path.join(str(tmpdir_path), "gated", "x.json")
        write_small_json_commit(spark, f"file://{path}", {"ok": 1})
        assert read_small_json(spark, f"file://{path}") == {"ok": 1}
        # End-to-end proof of the fallback routing: a bare path under a
        # remote defaultFS goes through hadoop_fs — with an unreachable
        # namenode that is an error, never a silent local write.
        bare = os.path.join(str(tmpdir_path), "gated", "y.json")
        with pytest.raises(Exception):
            write_small_json_commit(spark, bare, {"ok": 2})
        assert not os.path.exists(bare)  # nothing landed locally
    finally:
        if before is None:
            hconf.unset("fs.defaultFS")
        else:
            hconf.set("fs.defaultFS", before)
        _DEFAULT_FS_LOCAL.pop(spark, None)
    # Session-less callers (no defaultFS to consult, no Hadoop API to
    # fall back to) keep the bare-path fast path.
    assert _fastpath_local(None, "/a/b.json") == "/a/b.json"


def test_read_table_memo_replaces_and_bounds(spark, tmpdir_path, monkeypatch):
    """r14 (VERDICT task 6): the read_table plan memo must REPLACE a
    rewritten table's entry (not accumulate generations) and stay
    LRU-bounded per session."""
    from logverzcore_spark import engine

    sf_dir = str(tmpdir_path)
    p = os.path.join(sf_dir, "memo_t0.parquet")
    spark.range(3).write.mode("overwrite").parquet(p)
    engine.read_table(spark, sf_dir, "memo_t0")
    per_session = engine._READ_TABLE_MEMO[spark]
    n0 = len(per_session)
    # Rewrite the same table: the entry is replaced, never duplicated,
    # and the returned plan sees the new files.
    spark.range(7).write.mode("overwrite").parquet(p)
    df2 = engine.read_table(spark, sf_dir, "memo_t0")
    assert len(per_session) == n0
    assert df2.count() == 7
    # LRU bound: with the cap forced to 2, a third table evicts the
    # oldest — the memo never grows past the cap.
    monkeypatch.setattr(engine, "_READ_TABLE_MEMO_MAX", 2)
    for i in (1, 2, 3):
        q = os.path.join(sf_dir, f"memo_t{i}.parquet")
        spark.range(i).write.mode("overwrite").parquet(q)
        engine.read_table(spark, sf_dir, f"memo_t{i}")
    assert len(per_session) <= 2


def test_expr_caches_cleared_on_new_gateway(spark):
    """r14 (ADVICE): the memoized Column builders hold py4j references;
    a gateway change must clear every registered cache so no stale-JVM
    Column can be returned."""
    from logverzcore_spark import exprcache
    from logverzcore_spark.operators.similarity import _cosine_expr

    exprcache.reset_if_new_jvm(spark)
    _cosine_expr("a", "b")
    assert _cosine_expr.cache_info().currsize >= 1

    class _FakeSC:
        _gateway = object()

    class _FakeSpark:
        sparkContext = _FakeSC()

    try:
        exprcache.reset_if_new_jvm(_FakeSpark())
        assert _cosine_expr.cache_info().currsize == 0
    finally:
        exprcache.reset_if_new_jvm(spark)  # re-key to the live gateway
