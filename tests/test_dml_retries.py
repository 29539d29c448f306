"""DML concurrency convergence (r10 VERDICT task 4).

The selective-rewrite ops (delete_where / update_where / merge_into /
compact / restore) derive their output from the head's files, so a
CommitConflict must RE-EXECUTE the whole operation from the freshly
read head — never re-point already-written files (that is sound only
for append/overwrite, whose content is head-independent). ``retries=``
is that loop, shared via SnapshotTable._rerun_on_conflict; the default
0 keeps the loud raise so single-writer callers still hear races.
"""

import os
import threading
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.snapshots import CommitConflict, SnapshotTable


def _mkroot(tmpdir_path) -> str:
    return os.path.join(str(tmpdir_path), f"dr_{uuid.uuid4().hex[:8]}")


def test_concurrent_delete_and_append_both_land(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(
        spark.range(0, 1000).withColumn("b", F.lit(0)).repartition(4)
    )
    errs: list[Exception] = []

    def deleter():
        try:
            t.delete_where(spark, {"id": {"lt": 100}}, retries=8)
        except Exception as e:  # pragma: no cover - failure reporter
            errs.append(e)

    def appender():
        try:
            t.append(
                spark.range(5000, 5100).withColumn("b", F.lit(1)).coalesce(1),
                retries=8,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ths = [threading.Thread(target=deleter), threading.Thread(target=appender)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errs, errs
    # both landed regardless of who won the race: the delete removed
    # exactly ids < 100 and the append added exactly 100 rows
    assert t.count(spark) == 1000 - 100 + 100
    assert t.read(spark).where("id < 100 AND b = 0").count() == 0
    assert t.read(spark).where("b = 1").count() == 100
    ops = {h["op"] for h in t.history(spark)}
    assert {"append", "delete"} <= ops


def test_concurrent_merge_and_compact_converge(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    for lo in (0, 25, 50, 75):
        t.append(df.where(
            (F.col("id") >= lo) & (F.col("id") < lo + 25)
        ).coalesce(1))
    src = spark.createDataFrame(
        [(i, -99) for i in range(10)], "id long, v long"
    )
    errs: list[Exception] = []

    def merger():
        try:
            t.merge_into(spark, src, on="id", retries=8)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def compactor():
        try:
            t.compact(spark, target_files=1, retries=8)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ths = [threading.Thread(target=merger), threading.Thread(target=compactor)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errs, errs
    # whoever lost re-ran against the winner's head: the merge's
    # updates survive and the row set is intact either way
    assert t.count(spark) == 100
    assert t.read(spark).where("v = -99").count() == 10
    assert t.read(spark).where("id >= 10 AND v != id * 2").count() == 0
    ops = [h["op"] for h in t.history(spark)]
    assert "merge" in ops and "compact" in ops


def test_default_raises_and_retries_rerun_not_repoint(spark, tmpdir_path):
    """Deterministic conflict: a racer commits while the delete is
    mid-flight (between its head read and its commit). Default 0
    raises CommitConflict; retries=1 re-RUNS — the re-run sees the
    racer's rows, proving re-execution rather than a re-point of the
    stale attempt's files."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(0, 100).withColumn("b", F.lit(0)).coalesce(1))

    raced: list[int] = []
    orig = t._write_data

    def racing_write(df):
        out = orig(df)
        if not raced:  # fire the racer exactly once
            raced.append(1)
            SnapshotTable(t.root).append(
                spark.range(200, 300).withColumn("b", F.lit(0)).coalesce(1)
            )
        return out

    t._write_data = racing_write
    with pytest.raises(CommitConflict):
        t.delete_where(spark, {"b": {"eq": 0}})
    # nothing landed from the failed attempt; the racer's rows are in
    assert t.count(spark) == 200

    raced.clear()  # the racer fires once more, mid-retry-attempt-1
    v = t.delete_where(spark, {"id": {"lt": 50}}, retries=2)
    assert v == t.versions(spark)[-1]
    # the re-run was computed against the racer's head: the racer's
    # 100 rows (landed AFTER the stale attempt read its head) survive
    # alongside the delete — 300 - 50. A re-point of the stale
    # attempt's manifest would have dropped the racer's files (150).
    assert t.count(spark) == 250
    assert t.read(spark).where("id < 50").count() == 0
    t._write_data = orig
