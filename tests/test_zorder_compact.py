"""Z-order compaction: multi-column skipping restoration."""
import os
import uuid

import pytest
from pyspark.sql import functions as F
from logverzcore_spark.snapshots import SnapshotTable

def _mkroot(tmpdir_path):
    return os.path.join(str(tmpdir_path), f"zc_{uuid.uuid4().hex[:8]}")

def test_zorder_compact_prunes_on_both_columns(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    df = (spark.range(0, 4000)
          .withColumn("x", (F.col("id") * 2654435761 % 1000).cast("long"))
          .withColumn("y", (F.col("id") * 40503 % 1000).cast("long")))
    for i in range(4):
        t.append(df.where(F.col("id") % 4 == i).repartition(4))
    # worst case: nothing prunes on either column
    for c in ("x", "y"):
        kept, total = t.prune_files(spark, {c: {"between": [100, 120]}})
        assert len(kept) == total
    v = t.compact(spark, zorder_cols=["x", "y"], target_files=16)
    hx = t.skipping_health(spark, "x")
    hy = t.skipping_health(spark, "y")
    for c in ("x", "y"):
        kept, total = t.prune_files(spark, {c: {"between": [100, 120]}})
        assert len(kept) < total, (c, hx, hy)
    # rows identical
    assert t.count(spark) == 4000
    before = sorted(r["id"] for r in t.read(spark, v - 1).collect())
    after = sorted(r["id"] for r in t.read(spark, v).collect())
    assert before == after
    # 2-d predicate composes both prunings
    got = t.read(spark, where={"x": {"between": [100, 120]},
                               "y": {"between": [500, 540]}}).count()
    want = df.filter("x between 100 and 120 and y between 500 and 540").count()
    assert got == want

def test_zorder_compact_rejects_sort_cols_combo(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(10).withColumn("x", F.col("id")).withColumn("y", F.col("id")))
    with pytest.raises(ValueError, match="not both"):
        t.compact(spark, sort_cols=["x"], zorder_cols=["x", "y"])
