"""Two-level manifest (r12): delta stats sidecars past a file-count
threshold.

The r12 manifest scale probe measured the single-JSON manifest's own
O(head files) terms (SCALE.md: 1-file commit wall 2.36x between 512
and 16k head files — linear, but over the bar the r11 verdict set).
This is the design the measurement fired: past
``stats_sidecar_min_files`` the file list + per-file stats move into
immutable uuid-named DELTA sidecars (the Iceberg manifest-list /
Delta checkpoint shape, reduced) and the manifest JSON keeps
tags/schema/pointers. An append re-references the parent's sidecars
and writes ONE delta for its own files — commit metadata cost
O(new files + sidecar count), not O(head files). Readers hydrate
behind _read_manifest, so every consumer sees the classic shape.

Reference parity note: the reference keeps per-table metadata in a
single registry row (Logverz-Logic.json); the two-level split is the
Spark-scale reduction of the same metadata-bounding concern its
RDS-size model enforces (scale.js).
"""

import glob
import json
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.snapshots import SnapshotTable


def _mkroot(tmpdir_path) -> str:
    return os.path.join(str(tmpdir_path), f"tl_{uuid.uuid4().hex[:8]}")


def _raw(root: str, v: int) -> dict:
    with open(os.path.join(root, "_snapshots", f"v{v}.json")) as fh:
        return json.load(fh)


def _df(spark, lo, hi, nparts=2):
    return (
        spark.range(lo, hi)
        .withColumn("g", F.col("id") % 5)
        .repartition(nparts)
    )


def test_threshold_crossing_and_delta_reuse(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=4)
    t.append(_df(spark, 0, 100))
    raw1 = _raw(root, 1)
    # below the threshold: byte-identical single-level format
    assert raw1["files"] and "stats_sidecars" not in raw1
    t.append(_df(spark, 100, 200))
    raw2 = _raw(root, 2)
    # crossed: files/stats keys are ABSENT (not empty) so a
    # pre-two-level reader fails loudly on m["files"] instead of
    # silently seeing a populated table as empty
    assert "files" not in raw2 and "stats" not in raw2
    assert raw2["n_files"] == 4 and len(raw2["stats_sidecars"]) >= 1
    t.append(_df(spark, 200, 300))
    raw3 = _raw(root, 3)
    # the O(new files) claim: parent's chain re-referenced verbatim,
    # exactly one new delta for the appended files
    assert set(raw2["stats_sidecars"]) <= set(raw3["stats_sidecars"])
    assert len(raw3["stats_sidecars"]) == len(raw2["stats_sidecars"]) + 1
    # hydrated surface unchanged: reads, travel, count, prune
    assert t.count(spark) == 300
    assert t.read(spark, version=2).count() == 200
    kept, total = t.prune_files(spark, {"id": {"lt": 50}})
    assert 0 < len(kept) < total


def test_consolidation_bounds_the_chain(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=2, stats_sidecar_max=3)
    for i in range(8):
        t.append(_df(spark, i * 100, (i + 1) * 100))
    vs = t.versions(spark)
    for v in vs[1:]:
        names = _raw(root, v).get("stats_sidecars") or []
        assert len(names) <= 3, (v, names)
    assert t.count(spark) == 800
    # consolidation actually happened at least once (chain would be
    # v-1 deltas otherwise)
    assert len(_raw(root, vs[-1])["stats_sidecars"]) < len(vs) - 1


def test_dml_and_change_feed_on_two_level(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=2)
    t.append(_df(spark, 0, 200, nparts=4))
    v_before = t.versions(spark)[-1]
    t.delete_where(spark, {"id": {"lt": 30}})
    assert t.count(spark) == 170
    assert t.read(spark).where("id < 30").count() == 0
    ch = t.read_changes(spark, v_before, v_before + 1)
    assert ch.where("_change_type = 'delete'").count() == 30
    t.update_where(
        spark, {"id": {"gte": 190}}, {"g": F.lit(99).cast("bigint")}
    )
    assert t.read(spark).where("g = 99").count() == 10


def test_restore_reuses_target_sidecars(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=2)
    t.append(_df(spark, 0, 100))
    t.append(_df(spark, 100, 200))
    target_v = t.versions(spark)[-1]
    t.delete_where(spark, {"id": {"lt": 50}})
    before = set(glob.glob(os.path.join(root, "_snapshots", "ss-*.json")))
    t.restore(spark, target_v)
    after = set(glob.glob(os.path.join(root, "_snapshots", "ss-*.json")))
    # a restore re-commits entries the target's sidecars already hold
    # verbatim — zero new sidecar bytes
    assert after == before
    assert t.count(spark) == 200


def test_vacuum_keeps_referenced_reclaims_orphans(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=2)
    for i in range(4):
        t.append(_df(spark, i * 100, (i + 1) * 100))
    # plant a crash orphan: sidecar written, no manifest references it
    orphan = os.path.join(
        root, "_snapshots", f"ss-{uuid.uuid4().hex[:12]}.json"
    )
    with open(orphan, "w") as fh:
        json.dump({"entries": {"bogus": None}}, fh)
    # in-grace: a young unreferenced sidecar survives (in-flight rule)
    t.vacuum(spark, keep_last=1)
    assert os.path.exists(orphan)
    # aged past grace: reclaimed; referenced chain untouched
    past = time.time() - 99999
    for p in glob.glob(os.path.join(root, "_snapshots", "ss-*.json")):
        os.utime(p, (past, past))
    t.vacuum(spark, keep_last=1, orphan_grace_s=0)
    assert not os.path.exists(orphan)
    head_v = t.versions(spark)[-1]
    left = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "_snapshots", "ss-*.json"))
    }
    assert left == set(_raw(root, head_v)["stats_sidecars"])
    assert t.count(spark) == 400  # hydration intact after the sweep


def test_vacuum_orders_manifests_before_sidecars(spark, tmpdir_path):
    """Regression (r12 review): vacuum must drop retired MANIFESTS
    before reclaiming their sidecars — the other order's crash window
    leaves a still-listed version whose authoritative chain is gone,
    and every metadata walk (including the re-vacuum that would heal
    it) then raises. Also proves the self-heal: a simulated legacy
    crash state (listed version, chain deleted) is swept clean by the
    next vacuum instead of crashing it."""
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=2)
    for i in range(3):
        t.append(_df(spark, i * 100, (i + 1) * 100))
    # a compact rewrites every file -> v4 gets a FRESH chain and every
    # pre-compact delta retires (pure appends would keep v1's delta
    # alive in the head chain by reuse)
    t.compact(spark, target_files=2)
    head_v = t.versions(spark)[-1]
    retired = set(_raw(root, 1)["stats_sidecars"]) - set(
        _raw(root, head_v)["stats_sidecars"]
    )
    assert retired, "compact must retire v1's chain"
    # simulate the pre-fix crash aftermath: v1 still listed, chain gone
    for name in retired:
        os.remove(os.path.join(root, "_snapshots", name))
    past = time.time() - 99999
    for p in glob.glob(os.path.join(root, "_snapshots", "ss-*.json")):
        os.utime(p, (past, past))
    # the scalar walks must not hydrate the broken version...
    assert t.version_asof(spark, time.time()) == head_v
    # ...and the sweep (whose older_than scan walks EVERY version's
    # committed_at, broken v1 included) heals instead of raising
    t.vacuum(spark, older_than=time.time(), orphan_grace_s=0)
    assert t.versions(spark) == [head_v]
    assert t.count(spark) == 300


def test_compact_under_threshold_returns_inline(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=3)
    t.append(_df(spark, 0, 100, nparts=4))
    assert "stats_sidecars" in _raw(root, 1)
    t.compact(spark, target_files=2)
    rawc = _raw(root, t.versions(spark)[-1])
    # hysteresis: the format follows the file count, so a compacted
    # table pays zero two-level overhead
    assert rawc["files"] and "stats_sidecars" not in rawc
    assert t.count(spark) == 100


def test_analyze_backfill_invalidates_stale_deltas(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_columns=False, stats_sidecar_min_files=2)
    t.append(_df(spark, 0, 100))
    raw1 = _raw(root, 1)
    assert raw1.get("stats_sidecars")  # file list still sidecar'd
    assert t._resolve(spark, 1).get("stats") == {}  # no stats yet
    t.stats_columns = None  # analyze backfills every eligible column
    t.analyze(spark)
    v = t.versions(spark)[-1]
    m = t._resolve(spark, v)
    assert m["stats"], "backfilled stats must hydrate"
    # the backfill restated every entry, so the old delta is NOT
    # re-referenced (reuse requires unchanged entries)
    assert set(_raw(root, v)["stats_sidecars"]).isdisjoint(
        set(raw1["stats_sidecars"])
    )
    kept, total = t.prune_files(spark, {"id": {"lt": 10}})
    assert 0 < len(kept) <= total


def test_schema_evolution_and_incremental_read(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=2)
    t.append(_df(spark, 0, 100))
    v1 = t.versions(spark)[-1]
    t.append(
        spark.range(100, 150)
        .withColumn("g", F.col("id") % 5)
        .withColumn("extra", F.lit("x"))
        .repartition(2)
    )
    v2 = t.versions(spark)[-1]
    df = t.read(spark)
    assert "extra" in df.columns
    assert df.where("extra IS NULL").count() == 100
    inc = t.read_incremental(spark, v1, v2)
    assert inc.count() == 50


def test_disabled_threshold_stays_single_level(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=None)
    t.append(_df(spark, 0, 100, nparts=8))
    raw1 = _raw(root, 1)
    assert raw1["files"] and "stats_sidecars" not in raw1


def test_bloom_point_lookup_on_two_level(spark, tmpdir_path):
    """Composition: the bloom sidecar plane rides unchanged on a
    two-level manifest — a point probe on a RANDOM layout (intervals
    prune nothing) still prunes to ~1 file, and an absent key proves
    out of every file."""
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(
        root, stats_sidecar_min_files=2, bloom_columns=["key"]
    )
    df = (
        spark.range(0, 4000)
        .withColumn(
            "key",
            F.concat(
                F.lit("user-"),
                F.substring(F.md5(F.col("id").cast("string")), 1, 12),
            ),
        )
    )
    for i in range(4):
        t.append(df.where(F.col("id") % 4 == i).repartition(2))
    assert _raw(root, 4).get("stats_sidecars"), "must be two-level"
    probe = df.where("id = 123").first()
    kept_range, total = t.prune_files(spark, {"key": {"gte": "user-0"}})
    assert len(kept_range) == total  # intervals useless on this layout
    kept, total = t.prune_files(spark, {"key": probe["key"]})
    assert 0 < len(kept) < total
    assert t.read(spark, where={"key": probe["key"]}).count() == 1
    kept, _ = t.prune_files(spark, {"key": "user-nope"})
    assert kept == []


def test_two_level_on_s3_backend(spark, tmpdir_path):
    """Composition: the delta sidecars commit through the same
    CommitBackend as the manifests (the Delta LogStore split), so the
    whole metadata plane — manifests AND chains — lives on the object
    store while data files stay put; vacuum reclaims retired ss- keys
    through the backend too."""
    from logverzcore_spark.fsutil import S3ConditionalPutBackend

    from test_s3_backend import FakeS3Client

    c = FakeS3Client()
    be = S3ConditionalPutBackend(bucket="bkt", client=c)
    root = os.path.join(str(tmpdir_path), f"s3tl_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(root, backend=be, stats_sidecar_min_files=2)
    for i in range(3):
        t.append(_df(spark, i * 100, (i + 1) * 100), tag=f"s:batch-{i}")
    assert t.append(_df(spark, 0, 1), tag="s:batch-1") == 3  # replay no-op
    snaps = be.list_dir(t.snaps)
    assert any(n.startswith("ss-") for n in snaps), snaps
    assert t.count(spark) == 300
    assert t.read(spark, version=2).count() == 200
    # retire every pre-compact delta, then vacuum them off the backend
    t.compact(spark, target_files=2)
    live = set(
        t._read_manifest(spark, t.versions(spark)[-1], hydrate=False)[
            "stats_sidecars"
        ]
    )
    # the stub's logical clock stamps objects near epoch 0, so retired
    # sidecars age out of the grace immediately at grace 0
    t.vacuum(spark, keep_last=1, orphan_grace_s=0)
    left = {n for n in be.list_dir(t.snaps) if n.startswith("ss-")}
    assert left == live, (left, live)
    assert t.count(spark) == 300


def test_concurrent_append_replans_against_new_head(spark, tmpdir_path):
    import threading

    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=2)
    t.append(_df(spark, 0, 100))
    errs: list[Exception] = []

    def worker(lo):
        try:
            t.append(_df(spark, lo, lo + 50), retries=8)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ths = [
        threading.Thread(target=worker, args=(200,)),
        threading.Thread(target=worker, args=(300,)),
    ]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errs, errs
    assert t.count(spark) == 200
    head = _raw(root, t.versions(spark)[-1])
    # the loser re-planned against the winner's head: its manifest
    # references a chain that hydrates to ALL files
    assert head["n_files"] == t._resolve(
        spark, t.versions(spark)[-1]
    )["files"].__len__()


def test_stats_sidecar_cache_is_lru_not_insertion_order(spark, tmpdir_path):
    """r12 ADVICE (perf): under cache pressure the eviction must drop
    the least-recently-USED sidecar, not the oldest-INSERTED — the
    oldest-inserted entry is typically the head chain's long-lived
    consolidated sidecar, the hottest entry, and evicting it forced a
    re-read of the largest sidecar on every commit/hydration once the
    cache filled."""
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root, stats_sidecar_min_files=2)
    t.append(_df(spark, 0, 40))  # crosses the threshold immediately
    cache = t._stats_sidecar_cache_for()
    hot = next(iter(cache))  # the head chain's first (oldest) sidecar

    # fill the cache well past the bound with synthetic cold entries,
    # TOUCHING the hot entry between insertions — LRU must keep it
    for i in range(t._STATS_CACHE_MAX + 8):
        t._stats_sidecar_get(spark, cache, hot)  # hit → moves to end
        cache[f"ss-synth-{i}.json"] = {}
        t._stats_sidecar_cache_for()  # applies the eviction bound
    cache = t._stats_sidecar_cache_for()
    assert hot in cache, "LRU evicted the hottest sidecar"
    assert len(cache) <= t._STATS_CACHE_MAX + 1

    # and a real hydration still works (reads through the cache)
    assert t.count(spark) == 40


def test_engine_snapshot_vacuum_returns_int_by_default(spark, tmpdir_path):
    """r12 ADVICE (API): Engine.snapshot_vacuum mirrors the table-level
    API again — int (dirs deleted) by default, the full report behind
    return_report=True."""
    import time as _time

    from logverzcore_spark.api import Engine

    eng = Engine(spark)
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root)
    t.append(_df(spark, 0, 50, nparts=1))
    t.append(_df(spark, 50, 100, nparts=1))
    t.compact(spark, target_files=1)
    eng.register_snapshot("vacint", root)
    n = eng.snapshot_vacuum(
        "vacint", keep_last=1, older_than=_time.time() + 1,
        orphan_grace_s=0.0,
    )
    assert isinstance(n, int) and n >= 1
    rep = eng.snapshot_vacuum(
        "vacint", keep_last=1, older_than=_time.time() + 1,
        orphan_grace_s=0.0, return_report=True,
    )
    assert isinstance(rep, dict)
    assert {"deleted", "kept_in_grace", "erasure_pending"} <= set(rep)
