"""Per-file Bloom filters in snapshot manifests: point-lookup skipping
on RANDOM layouts, where min/max intervals span everything and range
stats prune nothing. Soundness rests on Bloom no-false-negatives plus
byte-identical hashing on both sides (JVM F.md5 == Python hashlib.md5
over CAST(col AS STRING) == str(value) — the reason only string and
integer columns are eligible)."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.snapshots import SnapshotTable


def _mkroot(tmpdir_path):
    return os.path.join(str(tmpdir_path), f"bl_{uuid.uuid4().hex[:8]}")


def _df(spark, n=8000):
    return (
        spark.range(0, n)
        .withColumn(
            "key",
            F.concat(
                F.lit("user-"),
                F.substring(F.md5(F.col("id").cast("string")), 1, 12),
            ),
        )
        .withColumn("num", (F.col("id") * 2654435761 % 1000003).cast("long"))
    )


def _random_layout(spark, tmpdir_path, **kw):
    t = SnapshotTable(_mkroot(tmpdir_path), **kw)
    df = _df(spark)
    for i in range(4):
        t.append(df.where(F.col("id") % 4 == i).repartition(2))
    return t, df


def test_point_lookup_prunes_on_random_layout(spark, tmpdir_path):
    t, df = _random_layout(spark, tmpdir_path, bloom_columns=["key", "num"])
    probe = df.where("id = 1234").first()
    # intervals are useless here (every file spans the hash range)...
    kept_range, total = t.prune_files(spark, {"key": {"gte": "user-0"}})
    assert len(kept_range) == total
    # ...but the bloom prunes the eq probe to ~1 file, exactly
    for where, want_rows in (
        ({"key": probe["key"]}, 1),
        ({"num": {"eq": int(probe["num"])}}, 1),
        ({"key": {"in": [probe["key"], "user-nonexistent"]}}, 1),
    ):
        kept, total = t.prune_files(spark, where)
        assert 0 < len(kept) < total, where
        assert t.read(spark, where=where).count() == want_rows, where
    # absent key: every file proven not to contain it
    kept, _ = t.prune_files(spark, {"key": "user-nope"})
    assert kept == []
    assert t.read(spark, where={"key": "user-nope"}).count() == 0


def test_no_false_negatives_end_to_end(spark, tmpdir_path):
    """Every existing key's file survives pruning — a wrong prune here
    is data loss, so sweep a real sample, not one probe."""
    t, df = _random_layout(spark, tmpdir_path, bloom_columns=["key"])
    sample = df.where("id % 500 = 0").select("key").collect()
    assert len(sample) >= 10
    for r in sample:
        assert t.read(spark, where={"key": r["key"]}).count() == 1, r["key"]


def test_cross_type_probe_punts(spark, tmpdir_path):
    t, _ = _random_layout(spark, tmpdir_path, bloom_columns=["key"])
    # numeric literal vs string column: Spark casts the COLUMN, the
    # bloom hashed strings — must keep everything, not guess
    kept, total = t.prune_files(spark, {"key": 5})
    assert len(kept) == total


def test_bloom_only_column_outside_stats_allowlist(spark, tmpdir_path):
    t = SnapshotTable(
        _mkroot(tmpdir_path), stats_columns=["num"], bloom_columns=["key"]
    )
    df = _df(spark, 2000)
    t.append(df.where("id < 1000").coalesce(1))
    t.append(df.where("id >= 1000").coalesce(1))
    probe = df.where("id = 77").first()
    kept, total = t.prune_files(spark, {"key": probe["key"]})
    assert len(kept) == 1 and total == 2
    # unknown nulls on the bloom-only column must NOT let IS NULL prune
    kept, _ = t.prune_files(spark, {"key": None})
    assert len(kept) == total


def test_append_carries_blooms_and_analyze_backfills(spark, tmpdir_path):
    root = _mkroot(tmpdir_path)
    plain = SnapshotTable(root, stats_columns=False)
    df = _df(spark, 2000)
    plain.append(df.where("id < 1000").coalesce(1))
    t = SnapshotTable(root, bloom_columns=["key"])
    t.append(df.where("id >= 1000").coalesce(1))
    m = t._read_manifest(spark, 2)
    assert len(m["bloom_files"]) == 1  # the new commit's sidecar only
    bl = t._load_blooms(spark, m)
    assert len(bl) == 1 and all("key" in cols for cols in bl.values())
    v = t.analyze(spark)  # backfills stats AND blooms for commit 1
    m = t._read_manifest(spark, v)
    bl = t._load_blooms(spark, m)
    assert set(bl) == set(m["files"])
    probe = df.where("id = 5").first()  # lives in the backfilled commit
    kept, total = t.prune_files(spark, {"key": probe["key"]})
    assert len(kept) == 1 and total == 2


def test_bloom_autosizing_tracks_file_rows(spark, tmpdir_path):
    """Filters size at ~10 bits/row per FILE (pow2, floored by
    bloom_bits): a fixed size saturates on big files and silently stops
    pruning. Files beyond bloom_max_bits get NO filter (honest absence,
    never a saturated lie) and stay unprunable-but-correct."""
    import base64

    t, _ = _random_layout(
        spark, tmpdir_path, bloom_columns=["key"], bloom_bits=8192,
        bloom_hashes=4,
    )
    m = t._read_manifest(spark, 4)
    ent = next(iter(t._load_blooms(spark, m).values()))["key"]
    # ~1000 rows/file -> 10k bits -> next pow2 = 16384 (> the 8192 floor)
    assert (ent["m"], ent["k"]) == (16384, 4)
    assert len(base64.b64decode(ent["b64"])) == 16384 // 8
    # ceiling: a file too big for bloom_max_bits carries no filter at
    # all, and point probes keep (not wrongly prune) its file
    t2 = SnapshotTable(
        _mkroot(tmpdir_path), bloom_columns=["key"], bloom_max_bits=4096
    )
    df = _df(spark, 3000)
    t2.append(df.coalesce(1))  # 3000 rows -> needs 32768 > 4096 cap
    m2 = t2._read_manifest(spark, 1)
    assert t2._load_blooms(spark, m2) == {}
    probe = df.where("id = 7").first()
    kept, total = t2.prune_files(spark, {"key": probe["key"]})
    assert len(kept) == total
    assert t2.read(spark, where={"key": probe["key"]}).count() == 1


def test_sidecars_keep_manifests_light_and_load_lazily(spark, tmpdir_path):
    """The filters live in SIDECARS: the manifest itself stays a small
    JSON (inlining measurably turned every read into a multi-MB parse),
    and a read WITHOUT an equality predicate never loads them at all
    (poisoned loader proves it). Vacuum reclaims sidecars their
    manifests no longer reference."""
    import json
    import os as _os

    t, df = _random_layout(spark, tmpdir_path, bloom_columns=["key"])
    mpath = _os.path.join(t.snaps, "v4.json")
    manifest_bytes = _os.path.getsize(mpath)
    sidecars = [
        n for n in _os.listdir(t.snaps) if n.startswith("bs-")
    ]
    assert sidecars, "blooms must live in sidecar files"
    sidecar_bytes = sum(
        _os.path.getsize(_os.path.join(t.snaps, n)) for n in sidecars
    )
    assert manifest_bytes < sidecar_bytes / 4  # manifest stays light
    m = t._read_manifest(spark, 4)
    assert json.load(open(mpath)) == m and "bloom" not in json.dumps(m["stats"])

    # range-only predicates never touch the sidecars
    def _boom(*a, **kw):
        raise AssertionError("range predicate loaded bloom sidecars")

    t._load_blooms = _boom
    kept, total = t.prune_files(spark, {"key": {"gte": "user-0"}})
    assert len(kept) == total
    t.read(spark, where={"key": {"lt": "zzz"}}).count()

    # vacuum after an overwrite drops the old sidecars
    t2 = SnapshotTable(t.root, bloom_columns=["key"])
    t2.overwrite(df.limit(100).coalesce(1))
    t2.vacuum(spark, keep_last=1, orphan_grace_s=0.0)
    left = [n for n in _os.listdir(t2.snaps) if n.startswith("bs-")]
    m5 = t2._read_manifest(spark, 5)
    assert set(left) == set(m5["bloom_files"])
    probe = df.where("id = 7").first()
    assert t2.read(spark, where={"key": probe["key"]}).count() == 1
