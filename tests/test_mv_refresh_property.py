"""Machine-checked refresh-ladder contract (hypothesis): whatever mode
the priced gate picks — delta / fold / repair / rebuild — after ANY
sequence of DML against the source, ``result()`` equals a from-scratch
recompute of the head. The ladder's mode choice is an OPTIMIZATION
decision; this property pins that it can never be a correctness one,
across aggregate subsets (retractable-only vs min/max-bearing), NULL
group keys (repair's in-list cannot address them), NULL values (sum/avg
NULL edges), gate settings (default vs ungated), and band-shaped
delete/update/merge/append sequences hypothesis shrinks over.
"""

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from logverzcore_spark.incremental import IncrementalAggregate
from logverzcore_spark.snapshots import SnapshotTable

#: aggregate subsets spanning the ladder's arms: all-retractable
#: (fold-eligible), max-bearing (repair/rebuild), mixed.
AGG_SETS = [
    {"n": ("count", None), "s": ("sum", "v"), "m": ("avg", "v")},
    {"n": ("count", None), "hi": ("max", "v")},
    {"n": ("count", None), "s": ("sum", "v"), "lo": ("min", "v")},
]

_MODES = {"noop", "initial", "delta", "fold", "repair", "rebuild"}


def _recompute(spark, t, aggs):
    exprs = []
    for alias, (kind, col) in aggs.items():
        if kind == "count":
            e = F.count(F.lit(1))
        elif kind == "sum":
            e = F.sum(F.col(col))
        elif kind == "avg":
            e = F.avg(F.col(col))
        elif kind == "min":
            e = F.min(F.col(col))
        else:
            e = F.max(F.col(col))
        exprs.append(e.alias(alias))
    return {
        r["g"]: tuple(r[a] for a in aggs)
        for r in t.read(spark).groupBy("g").agg(*exprs).collect()
    }


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


op_strategy = st.tuples(
    st.sampled_from(["delete", "update", "merge", "append"]),
    st.integers(min_value=0, max_value=180),  # band lo
    st.integers(min_value=1, max_value=80),   # band width
    st.integers(min_value=-50, max_value=50),  # update delta / merge salt
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    agg_i=st.integers(min_value=0, max_value=2),
    ungated=st.booleans(),
    null_g=st.booleans(),
    null_v=st.booleans(),
    ops=st.lists(op_strategy, min_size=1, max_size=2),
)
def test_refresh_ladder_always_equals_recompute(
    spark, agg_i, ungated, null_g, null_v, ops
):
    aggs = AGG_SETS[agg_i]
    work = tempfile.mkdtemp(prefix="mvprop_")
    try:
        t = SnapshotTable(os.path.join(work, "src"))
        g = (F.col("id") % 5).cast("int")
        if null_g:
            g = F.when(F.col("id") % 17 == 0, F.lit(None)).otherwise(g)
        v = F.col("id") * 3
        if null_v:
            v = F.when(F.col("id") % 13 == 0, F.lit(None)).otherwise(v)
        t.append(
            spark.range(0, 200).select(
                F.col("id").alias("k"), g.alias("g"), v.alias("v")
            ).repartitionByRange(4, "id")
        )
        mv = IncrementalAggregate(
            t, os.path.join(work, "state"), ["g"], aggs,
            source_keys=["k"],
            fold_cost_factor=None if ungated else 1.0,
        )
        assert mv.refresh(spark)["mode"] == "initial"

        next_key = 100_000
        for kind, lo, width, salt in ops:
            if kind == "delete":
                t.delete_where(spark, {"k": {"between": [lo, lo + width]}})
            elif kind == "update":
                t.update_where(
                    spark, {"k": {"between": [lo, lo + width]}},
                    {"v": f"v + {salt}"},
                )
            elif kind == "merge":
                src = spark.createDataFrame(
                    [(lo + i, (abs(salt) + i) % 5, salt * 7 + i)
                     for i in range(4)]
                    + [(next_key, abs(salt) % 5, salt),
                       (next_key + 1, None, None)],
                    "k long, g int, v long",
                )
                next_key += 2
                t.merge_into(spark, src, on="k")
            else:  # append
                t.append(
                    spark.range(next_key, next_key + width).select(
                        F.col("id").alias("k"),
                        (F.col("id") % 5).cast("int").alias("g"),
                        (F.col("id") % 91).alias("v"),
                    ).coalesce(1)
                )
                next_key += width
            rep = mv.refresh(spark)
            assert rep["mode"] in _MODES, rep
            got = {
                r["g"]: tuple(r[a] for a in aggs)
                for r in mv.result(spark).collect()
            }
            want = _recompute(spark, t, aggs)
            assert set(got) == set(want), (rep, got, want)
            for key, wv in want.items():
                gv = got[key]
                assert all(
                    _close(a, b) for a, b in zip(gv, wv)
                ), (rep, key, gv, wv)
    finally:
        shutil.rmtree(work, ignore_errors=True)
