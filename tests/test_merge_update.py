"""Snapshot-layer UPDATE and MERGE (r10): the DML triad completed —
update_where / merge_into as the same stats/bloom-pruned selective
rewrite as delete_where. Reference parity: the q114 MERGE / q115 SCD2
family one layer down, on the versioned table.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.snapshots import SnapshotTable


def _mkroot(tmpdir_path, name="mu") -> str:
    return os.path.join(str(tmpdir_path), f"{name}_{uuid.uuid4().hex[:8]}")


def _ranged(spark, tmpdir_path, **kw):
    t = SnapshotTable(_mkroot(tmpdir_path), **kw)
    df = spark.range(0, 1200).select(
        F.col("id"),
        F.concat(F.lit("user-"), F.col("id") % 100).alias("user"),
        (F.col("id") % 7).cast("int").alias("tier"),
        F.concat(F.lit("e"), F.col("id"), F.lit("@x.io")).alias("email"),
    )
    for lo in (0, 300, 600, 900):
        t.append(df.where((F.col("id") >= lo) & (F.col("id") < lo + 300)).coalesce(1))
    return t, df


# ---------------------------------------------------------------- update


def test_update_where_selective_and_correct(spark, tmpdir_path):
    t, df = _ranged(spark, tmpdir_path)
    before = t._read_manifest(spark, 4)
    v = t.update_where(
        spark,
        {"id": {"between": [350, 380]}},
        {"tier": F.lit(99), "email": "sha2(email, 256)"},
    )
    assert v == 5
    after = t._read_manifest(spark, v)
    carried = set(before["files"]) & set(after["files"])
    assert len(carried) == 3  # only the 300-599 file rewrote

    rows = {r["id"]: r for r in t.read(spark).collect()}
    assert len(rows) == 1200  # UPDATE never changes cardinality
    for i in range(1200):
        if 350 <= i <= 380:
            assert rows[i]["tier"] == 99
            assert len(rows[i]["email"]) == 64  # sha2 hex
        else:
            assert rows[i]["tier"] == i % 7
            assert rows[i]["email"] == f"e{i}@x.io"
        assert rows[i]["user"] == f"user-{i % 100}"  # untouched column

    # time travel reads the pre-update values
    old = t.read(spark, version=4, where={"id": 360}).first()
    assert old["tier"] == 360 % 7 and old["email"] == "e360@x.io"

    # provably-no-match predicate: no new version
    assert t.update_where(spark, {"id": 10_000}, {"tier": F.lit(0)}) == 5
    # tagged replay no-ops
    v6 = t.update_where(spark, {"id": 1}, {"tier": F.lit(1)}, tag="fix:run-1")
    assert v6 == 6
    assert t.update_where(spark, {"id": 1}, {"tier": F.lit(1)}, tag="fix:run-1") == 6


def test_update_where_null_semantics_and_errors(spark, tmpdir_path):
    """3VL: assignment applies only where the predicate is TRUE —
    NULL-predicate rows keep their values; unknown columns refuse."""
    t = SnapshotTable(_mkroot(tmpdir_path, "un"))
    df = spark.range(0, 12).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN NULL ELSE cast(id AS int) END AS g",
        "cast(id AS double) AS v",
    )
    t.append(df.coalesce(1))
    t.update_where(spark, {"g": {"gte": 6}}, {"v": F.lit(-1.0)})
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    for i in range(12):
        want = -1.0 if (i % 3 != 0 and i >= 6) else float(i)
        assert rows[i] == want, i  # NULL g rows (i%3==0) untouched
    with pytest.raises(ValueError, match="no such column"):
        t.update_where(spark, {"id": 1}, {"nope": F.lit(1)})


# ----------------------------------------------------------------- merge


def test_merge_upsert_selective(spark, tmpdir_path):
    t, df = _ranged(spark, tmpdir_path)
    before = t._read_manifest(spark, 4)
    # updates hit only the 300-599 range; inserts carry new ids
    source = spark.createDataFrame(
        [(350, 77), (399, 77), (5000, 11), (5001, 12)],
        "id long, tier int",
    )
    v = t.merge_into(spark, source, on="id")
    assert v == 5
    after = t._read_manifest(spark, v)
    carried = set(before["files"]) & set(after["files"])
    assert len(carried) == 3  # in-list prune: one file rewritten

    rows = {r["id"]: r for r in t.read(spark).collect()}
    assert len(rows) == 1202
    assert rows[350]["tier"] == 77 and rows[399]["tier"] == 77
    # updated rows keep their target-only columns
    assert rows[350]["email"] == "e350@x.io"
    assert rows[350]["user"] == "user-50"
    # a matched row NOT in the source keeps everything
    assert rows[351]["tier"] == 351 % 7
    # inserts fill target-only columns with NULL
    assert rows[5000]["tier"] == 11 and rows[5000]["email"] is None
    # time travel: pre-merge state intact
    assert t.count(spark, version=4) == 1200

    # replayed tagged merge no-ops
    v2 = t.merge_into(spark, source, on="id", tag="cdc:batch-9")
    assert v2 == 6
    assert t.merge_into(spark, source, on="id", tag="cdc:batch-9") == 6
    assert t.count(spark) == 1202  # merge is idempotent on same source


def test_merge_delete_and_ignore_modes(spark, tmpdir_path):
    t, df = _ranged(spark, tmpdir_path)
    src = spark.createDataFrame([(10,), (11,), (9999,)], "id long")
    # matched -> delete, unmatched source -> ignored
    v = t.merge_into(
        spark, src, on="id", when_matched="delete", when_not_matched="ignore"
    )
    assert t.count(spark) == 1198
    got = t.read(spark, where={"id": {"in": [10, 11, 9999]}}).count()
    assert got == 0
    # matched -> ignore, unmatched -> insert (insert-only merge)
    src2 = spark.createDataFrame([(12, 55), (7777, 55)], "id long, tier int")
    t.merge_into(spark, src2, on="id", when_matched="ignore")
    rows = {r["id"]: r["tier"] for r in t.read(
        spark, where={"id": {"in": [12, 7777]}}
    ).collect()}
    assert rows == {12: 12 % 7, 7777: 55}  # 12 untouched, 7777 inserted
    # nothing-to-do short-circuit: unmatched keys, inserts off
    head = t.versions(spark)[-1]
    assert t.merge_into(
        spark,
        spark.createDataFrame([(88888,)], "id long"),
        on="id",
        when_not_matched="ignore",
    ) == head


def test_merge_refusals_and_null_keys(spark, tmpdir_path):
    t, df = _ranged(spark, tmpdir_path)
    with pytest.raises(ValueError, match="duplicate source keys"):
        t.merge_into(
            spark,
            spark.createDataFrame([(1, 1), (1, 2)], "id long, tier int"),
            on="id",
        )
    with pytest.raises(ValueError, match="source carries columns"):
        t.merge_into(
            spark,
            spark.createDataFrame([(1, 9)], "id long, extra int"),
            on="id",
        )
    with pytest.raises(ValueError, match="source lacks key"):
        t.merge_into(
            spark, spark.createDataFrame([(1,)], "tier int"), on="id"
        )
    # NULL keys never match (SQL equality) and insert under 'insert'
    src = spark.createDataFrame([(None, 3), (None, 4)], "id long, tier int")
    n0 = t.count(spark)
    t.merge_into(spark, src, on="id")
    assert t.count(spark) == n0 + 2
    assert t.read(spark, where={"id": "null"}).count() == 2


def test_merge_string_keys_verbatim(spark, tmpdir_path):
    """String keys that optree's typed-literal reading would transform
    ('5', 'null') must still merge by CHARACTER equality — the in-list
    prune detects them and falls back to interval pruning."""
    t = SnapshotTable(_mkroot(tmpdir_path, "sk"))
    df = spark.createDataFrame(
        [("05", 1), ("5", 2), ("null", 3), ("plain", 4)], "k string, v int"
    )
    t.append(df.coalesce(1))
    src = spark.createDataFrame(
        [("5", 20), ("null", 30), ("new", 40)], "k string, v int"
    )
    t.merge_into(spark, src, on="k")
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {"05": 1, "5": 20, "null": 30, "plain": 4, "new": 40}


def test_merge_composite_keys_interval_prune(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path, "ck"))
    df = spark.range(0, 400).select(
        (F.col("id") % 20).alias("a"),
        (F.col("id") / 20).cast("long").alias("b"),
        F.col("id").alias("v"),
    )
    for lo in (0, 200):
        t.append(df.where((F.col("v") >= lo) & (F.col("v") < lo + 200)).coalesce(1))
    src = spark.createDataFrame(
        [(3, 0, -1), (3, 15, -2), (99, 99, -3)], "a long, b long, v long"
    )
    t.merge_into(spark, src, on=["a", "b"])
    rows = {(r["a"], r["b"]): r["v"] for r in t.read(spark).collect()}
    assert rows[(3, 0)] == -1 and rows[(3, 15)] == -2
    assert rows[(99, 99)] == -3  # composite-key insert
    assert len(rows) == 401


def test_merge_composite_tuple_prune_beats_bounding_box(spark, tmpdir_path):
    """r10 VERDICT task 5: two SCATTERED key columns where the
    per-column bounding box keeps every file but the zipped-tuple
    prune keeps the true subset. Four diagonal files (a≈b per file);
    source keys in files 0 and 3 only — the box [5,305]×[5,305]
    covers files 1 and 2 too, the tuples don't. Results must be
    hash-identical either way (pruning is a file-scoping optimization,
    never a semantics change)."""
    def _build(name):
        t = SnapshotTable(_mkroot(tmpdir_path, name))
        df = spark.range(0, 400).select(
            F.col("id").alias("a"),
            F.col("id").alias("b"),
            (F.col("id") * 2).alias("v"),
        )
        for lo in (0, 100, 200, 300):
            t.append(
                df.where((F.col("a") >= lo) & (F.col("a") < lo + 100))
                .coalesce(1)
            )
        return t

    src = spark.createDataFrame(
        [(5, 5, -1), (305, 305, -2)], "a long, b long, v long"
    )

    t = _build("tp")
    before = set(t._manifest(spark, 4))
    v = t.merge_into(spark, src, on=["a", "b"])
    carried = before & set(t._manifest(spark, v))
    assert len(carried) == 2  # exactly files 1 and 2 hold no tuple
    rows_tuple = sorted(
        (r["a"], r["b"], r["v"]) for r in t.read(spark).collect()
    )

    # interval-only fallback (cap forced to 0): the bounding box keeps
    # ALL files — everything is rewritten — but the rows are identical
    t2 = _build("bb")
    t2._MERGE_INLIST_MAX_KEYS = 0
    before2 = set(t2._manifest(spark, 4))
    v2 = t2.merge_into(spark, src, on=["a", "b"])
    carried2 = before2 & set(t2._manifest(spark, v2))
    assert len(carried2) == 0  # the box kept (hence rewrote) every file
    rows_box = sorted(
        (r["a"], r["b"], r["v"]) for r in t2.read(spark).collect()
    )
    assert rows_tuple == rows_box
    assert {(5, 5, -1), (305, 305, -2)} <= set(rows_tuple)
    assert len(rows_tuple) == 400


def test_cdc_merge_stream_empty_trigger_and_dup_refusal(spark, tmpdir_path):
    """cdc_merge_stream: an empty micro-batch commits nothing (no
    version burn, no tag burn), and a CDC batch with duplicate keys
    fails the stream loudly (merge's ambiguity refusal) instead of
    applying one of the two rows silently."""
    import os

    from logverzcore_spark.streaming.avro_stream import cdc_merge_stream

    root = _mkroot(tmpdir_path, "cdcs")
    t = SnapshotTable(root)
    t.append(spark.range(0, 50).withColumn("v", F.col("id")).coalesce(1))

    src = os.path.join(str(tmpdir_path), f"cdc_{uuid.uuid4().hex[:6]}")
    spark.createDataFrame([(3, 300), (99, 990)], "id long, v long") \
        .coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    ck = os.path.join(str(tmpdir_path), f"ck_{uuid.uuid4().hex[:6]}")
    stream = spark.readStream.schema(schema).parquet(src)
    cdc_merge_stream(
        spark, stream, root, on="id", checkpoint_dir=ck
    ).awaitTermination()
    assert t.count(spark) == 51
    assert t.read(spark, where={"id": 3}).first()["v"] == 300
    n_versions = len(t.versions(spark))

    # duplicate keys in one batch: the stream must FAIL, not guess
    spark.createDataFrame([(7, 1), (7, 2)], "id long, v long") \
        .coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    q = cdc_merge_stream(spark, stream2, root, on="id",
                         checkpoint_dir=ck)
    with pytest.raises(Exception, match="duplicate source keys"):
        q.awaitTermination()
    assert len(t.versions(spark)) == n_versions  # nothing committed


def test_cdc_merge_stream_bootstraps_empty_table(spark, tmpdir_path):
    """r10 ADVICE low #3: the first micro-batch against a brand-new
    table must not fail the stream — it lands as a tagged APPEND
    (semantically identical: nothing can match an empty table), and a
    replay of that batch still no-ops on the tag. With inserts off the
    bootstrap batch is a no-op instead."""
    import os

    from logverzcore_spark.streaming.avro_stream import cdc_merge_stream

    root = _mkroot(tmpdir_path, "cdcboot")
    t = SnapshotTable(root)  # never appended: no committed version

    src = os.path.join(str(tmpdir_path), f"cdcb_{uuid.uuid4().hex[:6]}")
    spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, v long"
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    ck = os.path.join(str(tmpdir_path), f"ckb_{uuid.uuid4().hex[:6]}")
    cdc_merge_stream(
        spark, spark.readStream.schema(schema).parquet(src), root,
        on="id", checkpoint_dir=ck,
    ).awaitTermination()
    assert t.count(spark) == 2
    assert t.history(spark)[0]["op"] == "append"  # the bootstrap

    # lost checkpoint, same path: the replayed batch no-ops on its tag
    ck2_replay = ck  # same checkpoint id namespace
    import shutil

    shutil.rmtree(ck2_replay)
    cdc_merge_stream(
        spark, spark.readStream.schema(schema).parquet(src), root,
        on="id", checkpoint_dir=ck2_replay,
    ).awaitTermination()
    assert t.count(spark) == 2  # no double-apply

    # a second batch MERGES normally now that the table is seeded
    spark.createDataFrame([(1, -1), (3, 30)], "id long, v long") \
        .coalesce(1).write.mode("append").parquet(src)
    cdc_merge_stream(
        spark, spark.readStream.schema(schema).parquet(src), root,
        on="id", checkpoint_dir=ck2_replay,
    ).awaitTermination()
    assert t.count(spark) == 3
    assert t.read(spark, where={"id": 1}).first()["v"] == -1
    assert t.history(spark)[0]["op"] == "merge"

    # inserts off + empty table: nothing lands, but the tag BURNS as
    # an empty commit (r11 ADVICE: a lost-checkpoint redelivery must
    # no-op on this batch, not re-apply it against later state)
    root2 = _mkroot(tmpdir_path, "cdcboot2")
    t2 = SnapshotTable(root2)
    ck3 = os.path.join(str(tmpdir_path), f"ckc_{uuid.uuid4().hex[:6]}")
    cdc_merge_stream(
        spark, spark.readStream.schema(schema).parquet(src), root2,
        on="id", when_not_matched="ignore", checkpoint_dir=ck3,
    ).awaitTermination()
    vs2 = t2.versions(spark)
    assert len(vs2) >= 1 and t2.count(spark) == 0
    # redelivery of the burned no-op batches: zero new versions
    shutil.rmtree(ck3)
    cdc_merge_stream(
        spark, spark.readStream.schema(schema).parquet(src), root2,
        on="id", when_not_matched="ignore", checkpoint_dir=ck3,
    ).awaitTermination()
    assert t2.versions(spark) == vs2


def test_cdc_merge_stream_tombstone_routing(spark, tmpdir_path):
    """delete_col (the Debezium __deleted shape): tombstoned rows apply
    as retractions, the rest as upserts — two tagged merges per batch
    with distinct tag prefixes, so a lost-checkpoint replay of the
    whole feed no-ops on both sides. A tombstone for an absent key is
    a no-op, not an error."""
    import os
    import shutil

    from logverzcore_spark.streaming.avro_stream import cdc_merge_stream

    root = _mkroot(tmpdir_path, "cdctomb")
    t = SnapshotTable(root)
    t.append(
        spark.range(0, 50).withColumn("v", F.col("id")).coalesce(1)
    )

    src = os.path.join(str(tmpdir_path), f"cdct_{uuid.uuid4().hex[:6]}")
    feed = spark.createDataFrame(
        [
            (3, 300, False),   # update
            (99, 990, False),  # insert
            (7, 0, True),      # delete
            (1234, 0, True),   # tombstone for an absent key: no-op
        ],
        "id long, v long, __deleted boolean",
    )
    feed.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    ck = os.path.join(str(tmpdir_path), f"ckt_{uuid.uuid4().hex[:6]}")
    cdc_merge_stream(
        spark, spark.readStream.schema(schema).parquet(src), root,
        on="id", delete_col="__deleted", checkpoint_dir=ck,
    ).awaitTermination()
    assert t.count(spark) == 50  # +1 insert, -1 delete
    assert t.read(spark, where={"id": 3}).first()["v"] == 300
    assert t.read(spark, where={"id": 99}).first()["v"] == 990
    assert t.read(spark, where={"id": 7}).count() == 0
    # __deleted is feed metadata, never data
    assert "__deleted" not in t.read(spark).columns
    n = len(t.versions(spark))

    # lost checkpoint replay: BOTH sides no-op on their tags
    shutil.rmtree(ck)
    cdc_merge_stream(
        spark, spark.readStream.schema(schema).parquet(src), root,
        on="id", delete_col="__deleted", checkpoint_dir=ck,
    ).awaitTermination()
    assert len(t.versions(spark)) == n
    assert t.count(spark) == 50


def test_cdc_tombstones_on_empty_table_burn_tag_before_later_inserts(
    spark, tmpdir_path
):
    """The r11-ADVICE redelivery hazard, end to end: batch 0 is pure
    tombstones against a still-empty table (a semantic no-op — but its
    tag must BURN), batch 1 inserts those very keys. After a lost
    checkpoint the full feed redelivers; without the burned tag the
    replayed batch-0 tombstones would delete the keys batch 1
    inserted (batch 1 itself no-ops on its own tag) — converging on a
    WRONG end state. With the burn, redelivery is a pure no-op."""
    import os
    import shutil
    import time as _time

    from logverzcore_spark.streaming.avro_stream import cdc_merge_stream

    root = _mkroot(tmpdir_path, "cdcburn")
    t = SnapshotTable(root)  # empty: no committed version yet

    src = os.path.join(str(tmpdir_path), f"cdcn_{uuid.uuid4().hex[:6]}")
    sch = "id long, v long, __deleted boolean"
    # file 1 (older mtime): tombstones only
    spark.createDataFrame([(5, 0, True), (6, 0, True)], sch) \
        .coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)  # distinct mtimes: stable file->batch order
    # file 2: inserts for the same keys
    spark.createDataFrame([(5, 50, False), (6, 60, False)], sch) \
        .coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    ck = os.path.join(str(tmpdir_path), f"ckn_{uuid.uuid4().hex[:6]}")

    def drain():
        cdc_merge_stream(
            spark,
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src),
            root, on="id", delete_col="__deleted", checkpoint_dir=ck,
        ).awaitTermination()

    drain()
    want = {(5, 50), (6, 60)}
    assert {(r["id"], r["v"]) for r in t.read(spark).collect()} == want
    n = len(t.versions(spark))
    # lost checkpoint: the whole feed redelivers file-by-file in the
    # same order; every side's tag is already burned, incl. the
    # empty-table tombstone batch
    shutil.rmtree(ck)
    drain()
    assert {(r["id"], r["v"]) for r in t.read(spark).collect()} == want
    assert len(t.versions(spark)) == n


def test_cdc_merge_stream_retries_survive_commit_conflict(
    spark, tmpdir_path, monkeypatch
):
    """retries= threads through every merge the stream lands: a
    deterministic injected CommitConflict on the first merge commit
    kills a retries=0 stream but converges a retries=1 stream (the
    batch re-runs against the freshly-read head — merge's documented
    conflict semantics; the tag keeps the retry replay-safe)."""
    import os

    from logverzcore_spark.snapshots import CommitConflict, SnapshotTable as ST
    from logverzcore_spark.streaming.avro_stream import cdc_merge_stream

    def seed(which):
        root = _mkroot(tmpdir_path, f"cdcrt_{which}")
        t = SnapshotTable(root)
        t.append(
            spark.range(0, 40).withColumn("v", F.col("id")).coalesce(2)
        )
        src = os.path.join(str(tmpdir_path), f"rtf_{uuid.uuid4().hex[:6]}")
        spark.createDataFrame(
            [(3, 300), (777, 7770)], "id long, v long"
        ).coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        ck = os.path.join(str(tmpdir_path), f"rtc_{uuid.uuid4().hex[:6]}")
        return root, t, src, schema, ck

    real_commit = ST._commit

    def arm():
        state = {"fired": False}

        def inject(self, spark_, files, tag, parent, parent_version,
                   *a, **kw):
            if not state["fired"] and kw.get("op") == "merge":
                state["fired"] = True
                raise CommitConflict("injected concurrent maintenance")
            return real_commit(
                self, spark_, files, tag, parent, parent_version, *a, **kw
            )

        monkeypatch.setattr(ST, "_commit", inject)
        return state

    # retries=0: the conflict kills the stream (the pre-r12 behavior)
    root, t, src, schema, ck = seed("a")
    arm()
    q = cdc_merge_stream(
        spark, spark.readStream.schema(schema).parquet(src), root,
        on="id", checkpoint_dir=ck,
    )
    with pytest.raises(Exception, match="injected"):
        q.awaitTermination()
    monkeypatch.setattr(ST, "_commit", real_commit)

    # retries=1: the batch re-runs and the stream completes
    root, t, src, schema, ck = seed("b")
    state = arm()
    cdc_merge_stream(
        spark, spark.readStream.schema(schema).parquet(src), root,
        on="id", checkpoint_dir=ck, retries=1,
    ).awaitTermination()
    assert state["fired"]  # the conflict really happened mid-commit
    monkeypatch.setattr(ST, "_commit", real_commit)
    got = {(r["id"], r["v"]) for r in t.read(spark).collect()}
    assert (3, 300) in got and (777, 7770) in got
    assert len(got) == 41


def test_cdc_stream_survives_real_concurrent_compaction(spark, tmpdir_path):
    """Threaded, non-injected: an owner compacts the table WHILE a
    retries=3 CDC stream drains many batches. Whatever interleaving
    the scheduler picks, the stream must complete and the end state
    must equal the no-compactor truth (compaction is row-preserving;
    merges re-run on conflict)."""
    import os
    import threading

    from logverzcore_spark.streaming.avro_stream import cdc_merge_stream

    root = _mkroot(tmpdir_path, "cdccc")
    t = SnapshotTable(root)
    t.append(spark.range(0, 200).withColumn("v", F.col("id")).coalesce(4))

    src = os.path.join(str(tmpdir_path), f"ccf_{uuid.uuid4().hex[:6]}")
    for i in range(6):  # 6 files -> 6 micro-batches
        spark.createDataFrame(
            [(i * 10 + j, 10_000 + i * 10 + j) for j in range(8)],
            "id long, v long",
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    ck = os.path.join(str(tmpdir_path), f"ccc_{uuid.uuid4().hex[:6]}")

    import time as _time

    stop = threading.Event()
    errors: list[Exception] = []

    def compactor():
        maint = SnapshotTable(root)
        for _ in range(3):
            if stop.is_set():
                return
            try:
                maint.compact(spark, target_files=2, retries=20)
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)
                return
            _time.sleep(0.3)

    th = threading.Thread(target=compactor, daemon=True)
    th.start()
    try:
        cdc_merge_stream(
            spark,
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src),
            root, on="id", checkpoint_dir=ck, retries=20,
        ).awaitTermination()
    finally:
        stop.set()
        th.join(timeout=120)
    assert not errors, errors
    got = {(r["id"], r["v"]) for r in t.read(spark).collect()}
    want = {(i, i) for i in range(200)} - {
        (i * 10 + j, i * 10 + j) for i in range(6) for j in range(8)
    } | {(i * 10 + j, 10_000 + i * 10 + j) for i in range(6) for j in range(8)}
    assert got == want
