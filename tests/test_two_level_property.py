"""Machine-checked format-equivalence (hypothesis): the two-level
manifest is an ENCODING of the same table, never a semantic change.
Two tables driven through the SAME op sequence — one pinned inline
(stats_sidecar_min_files=None), one two-level from the first commit
(min_files=1, a tiny consolidation bound so the amortized path fires
inside the sequence) — must agree on every observable: read() rows,
count(), version history ops, stat pruning decisions, and the change
feed. Hypothesis shrinks over band-shaped delete/update/append/
compact/restore sequences.
"""

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from logverzcore_spark.snapshots import SnapshotTable

op_strategy = st.tuples(
    st.sampled_from(["delete", "update", "append", "compact", "restore"]),
    st.integers(min_value=0, max_value=180),  # band lo
    st.integers(min_value=1, max_value=60),   # band width
)


def _rows(spark, t):
    return sorted(
        (r["k"], r["v"]) for r in t.read(spark).collect()
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_strategy, min_size=1, max_size=2))
def test_two_level_equals_inline_under_dml(spark, ops):
    work = tempfile.mkdtemp(prefix="tlprop_")
    try:
        inline = SnapshotTable(
            os.path.join(work, "a"), stats_sidecar_min_files=None
        )
        twolvl = SnapshotTable(
            os.path.join(work, "b"),
            stats_sidecar_min_files=1,
            stats_sidecar_max=2,
        )
        base = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ).repartitionByRange(4, "k")
        for t in (inline, twolvl):
            t.append(base)
        next_key = 10_000
        for kind, lo, width in ops:
            for t in (inline, twolvl):
                if kind == "delete":
                    t.delete_where(spark, {"k": {"between": [lo, lo + width]}})
                elif kind == "update":
                    t.update_where(
                        spark, {"k": {"between": [lo, lo + width]}},
                        {"v": "v + 1"},
                    )
                elif kind == "append":
                    t.append(
                        spark.range(next_key, next_key + 8).select(
                            F.col("id").alias("k"),
                            (F.col("id") * 3).alias("v"),
                        ).coalesce(2)
                    )
                elif kind == "compact":
                    t.compact(spark, sort_cols=["k"], target_files=2)
                else:  # restore to v1
                    t.restore(spark, 1)
            if kind == "append":
                next_key += 8

        # every observable agrees
        assert _rows(spark, inline) == _rows(spark, twolvl)
        assert inline.count(spark) == twolvl.count(spark)
        h_a = [h["op"] for h in inline.history(spark)]
        h_b = [h["op"] for h in twolvl.history(spark)]
        assert h_a == h_b
        # pruning decides identically (same stats, different encoding)
        ka, ta = inline.prune_files(spark, {"k": {"between": [40, 90]}})
        kb, tb = twolvl.prune_files(spark, {"k": {"between": [40, 90]}})
        assert len(ka) == len(kb) and ta == tb
        # the change feed over the whole history agrees row-for-row
        va, vb = inline.versions(spark), twolvl.versions(spark)
        if len(va) > 1 and va == vb:
            ca = inline.read_changes(spark, va[0], keys="k")
            cb = twolvl.read_changes(spark, vb[0], keys="k")
            cols = ["k", "v", "_change_type", "_commit_version"]
            assert sorted(
                tuple(r[c] for c in cols) for r in ca.collect()
            ) == sorted(tuple(r[c] for c in cols) for r in cb.collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
