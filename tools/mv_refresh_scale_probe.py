"""MV fold/repair refresh scale probe (r12).

Measures the r12 refresh ladder's two DML answers against table
growth, holding the DML slice FIXED:

- a count/sum MV refreshes in 'fold' mode (signed change-feed
  partials) — cost should track the DML slice, not the corpus;
- a min/max MV refreshes in 'repair' mode (affected groups recomputed
  from a group-clustered layout) — cost should track the slice + the
  affected groups' file subset;
- the REBUILD each replaces is measured alongside (one full
  recompute) — the baseline that grows with the table.

Table: rows 500k -> 5M -> 50M, range-partitioned into 64 files on the
key; group key = a 256-bucket key-range bucket (so groups cluster per
file and repair's in-list prunes). DML: delete a FIXED 20k-key band.
Correctness asserted in-probe at every scale: each refresh's state
equals a from-scratch recompute of the head (exact dict compare).

Usage: python tools/mv_refresh_scale_probe.py [base_rows]
Prints one JSON line per scale point.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logverzcore_spark.engine import get_session
from logverzcore_spark.incremental import IncrementalAggregate
from logverzcore_spark.snapshots import SnapshotTable

N_FILES = 64
N_BUCKETS = 256
SLICE_KEYS = 20_000


def _expect(spark, t, aggs):
    exprs = []
    for alias, (kind, col) in aggs.items():
        if kind == "count":
            e = F.count(F.lit(1))
        elif kind == "sum":
            e = F.sum(F.col(col))
        elif kind == "min":
            e = F.min(F.col(col))
        else:
            e = F.max(F.col(col))
        exprs.append(e.alias(alias))
    return {
        r["g"]: tuple(r[a] for a in aggs)
        for r in t.read(spark).groupBy("g").agg(*exprs).collect()
    }


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_session()
    for mult in (1, 10, 100):
        rows = base * mult
        work = tempfile.mkdtemp(prefix=f"mvrs_{mult}_")
        try:
            t = SnapshotTable(os.path.join(work, "src"))
            df = spark.range(0, rows).select(
                F.col("id").alias("k"),
                (F.col("id") * N_BUCKETS / rows).cast("long").alias("g"),
                (F.col("id") * 7 % 100_003).alias("v"),
            )
            t.append(df.repartitionByRange(N_FILES, "k"))

            fold_aggs = {"n": ("count", None), "s": ("sum", "v")}
            rep_aggs = {"lo": ("min", "v"), "hi": ("max", "v"),
                        "n": ("count", None)}
            mv_fold = IncrementalAggregate(
                t, os.path.join(work, "mf"), ["g"], fold_aggs,
                source_keys=["k"],
            )
            mv_rep = IncrementalAggregate(
                t, os.path.join(work, "mr"), ["g"], rep_aggs,
                source_keys=["k"],
            )
            mv_fold.refresh(spark)
            mv_rep.refresh(spark)

            # fixed DML slice: erase a 20k-key band in the middle
            lo = rows // 2
            t.delete_where(
                spark, {"k": {"between": [lo, lo + SLICE_KEYS - 1]}}
            )

            t0 = time.time()
            rf = mv_fold.refresh(spark)
            fold_wall = time.time() - t0
            assert rf["mode"] == "fold", rf
            got = {
                r["g"]: (r["n"], r["s"])
                for r in mv_fold.result(spark).collect()
            }
            assert got == _expect(spark, t, fold_aggs)

            t0 = time.time()
            rr = mv_rep.refresh(spark)
            repair_wall = time.time() - t0
            assert rr["mode"] == "repair", rr
            got = {
                r["g"]: (r["lo"], r["hi"], r["n"])
                for r in mv_rep.result(spark).collect()
            }
            assert got == _expect(spark, t, rep_aggs)

            # the baseline both modes replace: one full recompute
            t0 = time.time()
            merged = mv_rep._merge(mv_rep._partial(t.read(spark)))
            merged.localCheckpoint(eager=True)
            rebuild_wall = time.time() - t0

            print(json.dumps({
                "rows": rows,
                "files": N_FILES,
                "fold_wall_s": round(fold_wall, 3),
                "fold_priced_span": rf["priced_span"],
                "fold_priced_head": rf["priced_head"],
                "repair_wall_s": round(repair_wall, 3),
                "repaired_groups": rr["repaired_groups"],
                "repair_files_scanned": rr["files_scanned"],
                "repair_files_total": rr["files_total"],
                "rebuild_wall_s": round(rebuild_wall, 3),
            }), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
