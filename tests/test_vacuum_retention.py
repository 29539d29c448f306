"""Time-based vacuum retention (r10 VERDICT task 3) and the in-flight
data-dir grace (r10 ADVICE medium #2).

``vacuum(older_than=)`` turns delete_where's GDPR note ("erasure isn't
complete until vacuum") into an enforceable schedule: keep every
version committed at/after the cutoff plus the head, reclaim the rest.
Timestamp time travel inside the window survives; outside raises —
exactly the contract version travel already has with keep_last.

The grace: unreferenced data dirs / sidecars are reclaimed only when
older than BOTH the newest kept manifest and ``orphan_grace_s`` — a
concurrent committer writes data before the manifest that references
it, and deleting an in-flight dir lands that commit referencing
deleted files (silent corruption, the ADVICE scenario).
"""

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.snapshots import SnapshotTable


def _mkroot(tmpdir_path) -> str:
    return os.path.join(str(tmpdir_path), f"vr_{uuid.uuid4().hex[:8]}")


def _local(p: str) -> str:
    return p.replace("file:", "")


def test_vacuum_older_than_erasure_and_travel_window(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(0, 10).withColumn("b", F.lit(1)).coalesce(1))
    time.sleep(0.05)
    ts_after_v1 = time.time()
    time.sleep(0.05)
    t.append(spark.range(10, 20).withColumn("b", F.lit(2)).coalesce(1))
    time.sleep(0.05)
    v1_files = [_local(f) for f in t._manifest(spark, 1)]
    # the erasure under test: drop the b=1 rows (rewrites v1's file)
    t.delete_where(spark, {"b": {"eq": 1}})
    assert t.count(spark) == 10
    assert all(os.path.exists(f) for f in v1_files)  # still time-travelable

    # a 1-day window keeps everything (union with the implicit head)
    assert t.vacuum(
        spark, older_than=time.time() - 86400, orphan_grace_s=0.0
    ) == 0
    assert t.versions(spark) == [1, 2, 3]
    assert t.read(spark, as_of=ts_after_v1).count() == 10  # inside window

    # cutoff ahead of every commit: only the head survives, and the
    # pre-delete rows are PHYSICALLY gone — erasure is now complete
    deleted = t.vacuum(
        spark, older_than=time.time() + 1, orphan_grace_s=0.0
    )
    assert deleted >= 1
    assert t.versions(spark) == [3]
    assert not any(os.path.exists(f) for f in v1_files)
    assert t.count(spark) == 10  # the head is never age-vacuumed
    # travel outside the retained window now raises
    with pytest.raises(ValueError):
        t.version_asof(spark, ts_after_v1)
    # inside the window (the head's own stamp) still resolves
    head_ca = t._read_manifest(spark, 3)["committed_at"] / 1000.0
    assert t.version_asof(spark, head_ca) == 3


def test_vacuum_keep_last_and_older_than_union(spark, tmpdir_path):
    """Retention composes by UNION: keep_last=2 keeps the newest two
    even when the age cutoff would drop them; the age window keeps an
    OLD version keep_last alone would drop."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(0, 5).coalesce(1))          # v1
    time.sleep(0.05)
    cutoff = time.time()                              # v2+ are "recent"
    time.sleep(0.05)
    for i in range(3):                                # v2..v4
        t.append(spark.range(5 * (i + 2), 5 * (i + 3)).coalesce(1))
    # keep_last=1 alone would keep only v4; the age window keeps v2..v4
    t.vacuum(spark, keep_last=1, older_than=cutoff, orphan_grace_s=0.0)
    assert t.versions(spark) == [2, 3, 4]
    # now a pure age cutoff beyond everything, no keep_last: head only
    t.vacuum(spark, older_than=time.time() + 1, orphan_grace_s=0.0)
    assert t.versions(spark) == [4]
    assert t.count(spark) == 20


def test_vacuum_grace_protects_inflight_data_dir(spark, tmpdir_path):
    """The ADVICE race: a data dir written but not yet referenced by a
    manifest (a commit in flight, or a retries= loop spanning another
    writer's commit) must survive a default vacuum; only after aging
    past the grace is it reclaimed."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(0, 10).coalesce(1))
    t.append(spark.range(10, 20).coalesce(1))
    # the in-flight writer: data staged, manifest not yet committed
    staged, _stats, _sch, _bl = t._write_data(spark.range(100, 200))
    staged_dirs = {os.path.dirname(_local(f)) for f in staged}
    assert t.vacuum(spark) == 0  # default grace: everything protected
    assert all(os.path.exists(d) for d in staged_dirs)
    # the writer now lands its commit — files must all be readable
    head_v, head = t._head(spark)
    t._commit(spark, head["files"] + staged, None, head, head_v)
    assert t.count(spark) == 120
    # a crashed writer's dir (never referenced) ages out and is reclaimed
    orphan, _, _, _ = t._write_data(spark.range(500, 510))
    old = time.time() - 86400
    for d in {os.path.dirname(_local(f)) for f in orphan}:
        os.utime(d, (old, old))
    t.append(spark.range(20, 25).coalesce(1))  # newest manifest moves on
    assert t.vacuum(spark, keep_last=10) >= 1
    assert not any(os.path.exists(_local(f)) for f in orphan)
    assert t.count(spark) == 125  # committed data untouched


def test_vacuum_report_surfaces_grace_deferral(spark, tmpdir_path):
    """r11-ADVICE: vacuum(older_than=now) right after delete_where
    drops the manifests (time travel gone) while the grace keeps the
    pre-delete bytes on disk — erasure looks complete but is pending.
    The report must SAY so: kept_in_grace>0 / erasure_pending=True on
    the deferred sweep, and a post-grace re-vacuum reclaims with a
    clean report."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(0, 100).selectExpr("id", "id * 2 AS v").coalesce(1))
    t.delete_where(spark, {"id": {"lt": 50}})
    rep = t.vacuum(
        spark, keep_last=1, older_than=time.time() + 1, return_report=True
    )
    # the retired pre-delete dir is inside the grace: deferral reported
    assert rep["kept_in_grace"] >= 1 and rep["erasure_pending"] is True
    assert len(t.versions(spark)) == 1  # manifests DID drop
    # age the unreferenced dirs past the grace (the scheduled re-run)
    data_root = os.path.join(_localroot(t), "data")
    head_files = {os.path.dirname(_local(f)) for f in t._manifest(
        spark, t.versions(spark)[-1]
    )}
    old = time.time() - 86400
    for d in os.listdir(data_root):
        full = os.path.join(data_root, d)
        if full not in head_files:
            os.utime(full, (old, old))
    rep2 = t.vacuum(
        spark, keep_last=1, older_than=time.time() + 1, return_report=True
    )
    assert rep2["deleted"] >= 1 and rep2["erasure_pending"] is False
    assert t.count(spark) == 50  # head untouched


def _localroot(t):
    r = t.root
    return r[len("file:"):] if r.startswith("file:") else r
