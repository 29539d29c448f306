"""Change Data Feed (read_changes — the Delta CDF read, r11).

The consumer half of CDC: per-commit row-level changes derived from
each commit's removed-vs-added file sets (the selective-rewrite slice;
carried files never opened). Keyed diffs emit SEMANTIC changes —
neighbor rows a rewrite carried along unchanged drop out — with
null-safe update detection; keyless spans fall back to multiset
delete+insert pairs.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.snapshots import SnapshotTable


def _mkroot(tmpdir_path) -> str:
    return os.path.join(str(tmpdir_path), f"cf_{uuid.uuid4().hex[:8]}")


def _rows(df):
    return sorted(
        tuple(r[c] for c in df.columns) for r in df.collect()
    )


def test_change_feed_append_merge_delete_span(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t.append(base.coalesce(2))                                   # v1
    t.append(
        spark.range(100, 150).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1)
    )                                                            # v2
    src = spark.createDataFrame(
        [(5, -5), (7, -7), (200, -200)], "k long, v long"
    )
    t.merge_into(spark, src, on="k")                             # v3
    t.delete_where(spark, {"k": {"between": [10, 12]}})          # v4

    cdf = t.read_changes(spark, 1, keys="k")
    got = {}
    for r in cdf.collect():
        got.setdefault((r["_commit_version"], r["_change_type"]), []).append(
            (r["k"], r["v"])
        )
    # v2: pure append -> inserts only, no diffing
    assert sorted(got[(2, "insert")]) == [(i, 2 * i) for i in range(100, 150)]
    # v3: the merge's semantic changes ONLY — the rewritten files'
    # carried-along neighbor rows must NOT appear
    assert sorted(got[(3, "update_preimage")]) == [(5, 10), (7, 14)]
    assert sorted(got[(3, "update_postimage")]) == [(5, -5), (7, -7)]
    assert got[(3, "insert")] == [(200, -200)]
    assert (3, "delete") not in got
    # v4: deletes only
    assert sorted(got[(4, "delete")]) == [(10, 20), (11, 22), (12, 24)]
    assert (4, "insert") not in got
    # sub-spans slice the same feed
    sub = t.read_changes(spark, 3, 4, keys="k")
    assert sub.where("_change_type = 'delete'").count() == 3
    assert sub.where("_commit_version = 3").count() == 0


def test_change_feed_keyless_compact_and_errors(spark, tmpdir_path):
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    ).coalesce(2))                                               # v1
    t.compact(spark, target_files=1)                             # v2
    t.update_where(spark, {"k": {"lt": 3}}, {"v": F.lit(9)})     # v3

    # compact emits nothing (row-preserving by contract)
    assert t.read_changes(spark, 1, 2, keys="k").count() == 0
    # keyless: updates surface as delete+insert pairs
    cdf = t.read_changes(spark, 2, 3)
    got = sorted(
        (r["_change_type"], r["k"], r["v"]) for r in cdf.collect()
    )
    assert got == [
        ("delete", 0, 1), ("delete", 1, 1), ("delete", 2, 1),
        ("insert", 0, 9), ("insert", 1, 9), ("insert", 2, 9),
    ]
    # empty span: schema-stable empty frame
    empty = t.read_changes(spark, 3, 3, keys="k")
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "v", "_change_type", "_commit_version"}
    with pytest.raises(ValueError, match="bad version range"):
        t.read_changes(spark, 3, 1)
    with pytest.raises(ValueError, match="bad version range"):
        t.read_changes(spark, 99)


def test_change_feed_restore_and_schema_evolution(spark, tmpdir_path):
    """A restore's CDF is the rollback's semantic diff; files written
    before a later-added column diff on nulls (the TO-version reader
    pins the merged schema)."""
    t = SnapshotTable(_mkroot(tmpdir_path))
    t.append(spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    ).coalesce(1))                                               # v1
    # schema evolution: a new column arrives
    t.append(spark.range(10, 15).select(
        F.col("id").alias("k"), F.lit(1).alias("v"),
        F.lit("x").alias("tag_col"),
    ).coalesce(1))                                               # v2
    t.delete_where(spark, {"k": {"lt": 2}})                      # v3
    t.restore(spark, version=2)                                  # v4

    cdf = t.read_changes(spark, 2, keys="k")
    got = {}
    for r in cdf.collect():
        got.setdefault((r["_commit_version"], r["_change_type"]), []).append(
            (r["k"], r["v"], r["tag_col"])
        )
    # v3 deleted k<2 (pre-evolution rows: tag_col nulls align)
    assert sorted(got[(3, "delete")]) == [(0, 1, None), (1, 1, None)]
    # v4 (restore) brings them BACK: inserts of the same rows
    assert sorted(got[(4, "insert")]) == [(0, 1, None), (1, 1, None)]
    assert (4, "update_preimage") not in got  # nothing else changed


def test_engine_snapshot_changes_read_gated(spark, tmpdir_path):
    """The Engine surface for the feed: a read grant suffices (pre/post
    images are rows a reader could already query), a stranger is
    refused with the denial audited."""
    from logverzcore_spark.api import Engine
    from logverzcore_spark.audit import AuditLog
    from logverzcore_spark.catalog import Catalog, User

    audit = AuditLog()
    eng = Engine(spark, Catalog(), audit=audit)
    root = _mkroot(tmpdir_path)
    t = SnapshotTable(root)
    t.append(spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    ).coalesce(1))
    t.update_where(spark, {"k": {"lt": 5}}, {"v": F.lit(2)})

    owner = User(name="own", groups=[], is_admin=False, is_poweruser=True)
    reader = User(name="rdr", groups=["research"])
    stranger = User(name="str", groups=[], is_admin=False,
                    is_poweruser=False)
    eng.register_snapshot("cfeed", root, user=owner, access=["research"])

    cdf = eng.snapshot_changes("cfeed", 1, keys="k", user=reader)
    got = sorted((r["_change_type"], r["k"]) for r in cdf.collect())
    assert got == sorted(
        [("update_preimage", i) for i in range(5)]
        + [("update_postimage", i) for i in range(5)]
    )
    with pytest.raises(PermissionError, match="may not read"):
        eng.snapshot_changes("cfeed", 1, user=stranger)
    last = audit.entries()[-1]
    assert last.Status == "denied" and last.Mode == "snapshot_changes"
