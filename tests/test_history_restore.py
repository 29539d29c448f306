"""history() + restore() (r10): DESCRIBE HISTORY / RESTORE parity at
the snapshot layer — every commit stamps its operation, and a rollback
is a new metadata-only commit, never an erasure.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.snapshots import SnapshotTable


def _mkroot(tmpdir_path) -> str:
    return os.path.join(str(tmpdir_path), f"hr_{uuid.uuid4().hex[:8]}")


def test_history_records_every_operation(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    t.append(df.where("id < 50").coalesce(1), tag="q:batch-0")
    t.append(df.where("id >= 50").coalesce(1))
    t.update_where(spark, {"id": 3}, {"v": F.lit(-1)})
    t.delete_where(spark, {"id": {"lt": 2}})
    t.merge_into(
        spark, spark.createDataFrame([(999, 9)], "id long, v long"), on="id"
    )
    t.compact(spark, sort_cols=["id"], target_files=2)
    h = t.history(spark)
    assert [e["op"] for e in h] == [
        "compact", "merge", "delete", "update", "append", "append"
    ]
    assert [e["version"] for e in h] == [6, 5, 4, 3, 2, 1]
    assert h[-1]["tag"] == "q:batch-0"
    assert all(e["committed_at"] is not None for e in h)
    assert h[0]["rows"] == 99  # 100 - 2 deleted + 1 insert
    assert h[-1]["rows"] == 50 and h[-1]["n_files"] == 1


def test_restore_rolls_back_as_a_new_commit(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 60).withColumn("v", F.col("id"))
    t.append(df.where("id < 30").coalesce(1))
    t.append(df.where("id >= 30").coalesce(1))
    # a bad delete lands...
    t.delete_where(spark, {"id": {"gte": 10}})
    assert t.count(spark) == 10
    # ...and restore rolls it back as version 4, metadata-only
    v = t.restore(spark, version=2)
    assert v == 4
    assert t.count(spark) == 60
    m2 = t._read_manifest(spark, 2)
    m4 = t._read_manifest(spark, 4)
    assert m4["files"] == m2["files"]  # verbatim re-commit
    assert m4["op"] == "restore"
    # the bad commit stays auditable in history
    assert [e["op"] for e in t.history(spark)] == [
        "restore", "delete", "append", "append"
    ]
    assert t.count(spark, version=3) == 10  # still time-travelable
    # appending after a restore continues normally
    t.append(df.limit(5).coalesce(1))
    assert t.count(spark) == 65
    # restore to the head no-ops; bad args refuse
    assert t.restore(spark, version=5) == 5
    with pytest.raises(ValueError, match="version OR as_of"):
        t.restore(spark, version=1, as_of=0)
    with pytest.raises(ValueError, match="needs version"):
        t.restore(spark)


def test_restore_keeps_tag_idempotence_across_rollback(spark, tmpdir_path):
    """The tag history carries forward from the CURRENT head: a batch
    applied before the rollback still no-ops after it (a restore must
    not resurrect replay windows), and the restore itself can be
    tagged."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = spark.range(0, 10)
    t.append(df.coalesce(1), tag="s:batch-0")
    t.append(df.coalesce(1), tag="s:batch-1")
    v = t.restore(spark, version=1, tag="ops:restore-1")
    assert v == 3
    assert t.restore(spark, version=1, tag="ops:restore-1") == 3  # replay
    # batch-1 was rolled back CONTENT-wise, but its tag stays applied:
    # a redelivery must not double-commit
    assert t.append(df.coalesce(1), tag="s:batch-1") == 3
    assert t.count(spark) == 10
    # vacuum keeps the restored head's files (they're referenced)
    t.vacuum(spark, keep_last=1)
    assert t.count(spark) == 10
