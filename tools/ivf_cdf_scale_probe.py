"""IVF-index CDF-apply scale probe (r12, s26's operator).

Measures ``ivf_index_apply_changes`` against corpus growth, holding the
DML slice FIXED and sizing n_cells for BOUNDED-ROW cells (the IVF
discipline at scale: cells sized like files, n_cells grows with the
corpus — the same bounded-unit argument every compaction-discipline row
in SCALE.md leans on). The claim under test: per-span cost is
touched-cells × cell-rows — bounded by the span's image count × cell
size — never O(index). The rebuild each apply replaces is timed
alongside as the baseline that grows with the corpus.

Setup per scale point: deterministic dim-8 vectors keyed by vec_id in a
snapshot table (range layout, 32 files), IVF index with LCG centroids,
n_cells = 64 × mult (mean cell ≈ 780 rows at every scale). DML: delete
a fixed 10-id band, negate a fixed 10-id band (update_where — cell
moves), append 5 new ids. One read_changes span drives the index.

Correctness asserted in-probe at every scale: post-apply index equals a
from-scratch rebuild over the post-DML head (exceptAll both ways on
(nid, cell, nvec)).

Usage: python tools/ivf_cdf_scale_probe.py [base_rows] [mult ...]
Prints one JSON line per scale point.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logverzcore_spark.engine import get_session
from logverzcore_spark.operators.similarity import (
    ivf_index_apply_changes,
    ivf_index_build,
    lcg_centroids,
)
from logverzcore_spark.snapshots import SnapshotTable

DIM = 8
N_FILES = 32
CELLS_PER_MULT = 64
DEL_IDS = 10
UPD_IDS = 10
INS_IDS = 5


def _vec_expr():
    # deterministic pseudo-random unit-ish vector per id: 8 incommensurate
    # integer strides folded to [-0.5, 0.5) — pure codegen, no UDF
    strides = [7919, 104729, 1299709, 15485863, 32452843, 49979687,
               67867967, 86028121]
    return F.array(*[
        (F.pmod(F.col("vec_id") * F.lit(s), F.lit(10_007)) / 10_007.0 - 0.5)
        for s in strides
    ]).cast("array<double>")


def run_scale(spark, base: int, mult: int) -> None:
    rows = base * mult
    n_cells = CELLS_PER_MULT * mult
    work = tempfile.mkdtemp(prefix=f"ivfcdf_{mult}_")
    idx = f"ivfcdf_probe_{uuid.uuid4().hex[:8]}"
    full = f"{idx}_full"
    try:
        t = SnapshotTable(os.path.join(work, "src"))
        df = spark.range(0, rows).select(
            F.col("id").alias("vec_id")
        ).withColumn("embedding", _vec_expr())
        t.append(df.repartitionByRange(N_FILES, "vec_id"))
        v0 = t.versions(spark)[-1]

        cents = lcg_centroids(DIM, n_cells)
        t0 = time.time()
        ivf_index_build(t.read(spark), idx, n_cells=n_cells, centroids=cents)
        build_wall = time.time() - t0
        files_before = set(spark.table(idx).inputFiles())

        # fixed DML slice, corpus-size-independent
        d_lo, u_lo = rows // 3, (2 * rows) // 3
        t.delete_where(spark, {"vec_id": {"between": [d_lo, d_lo + DEL_IDS - 1]}})
        t.update_where(
            spark,
            {"vec_id": {"between": [u_lo, u_lo + UPD_IDS - 1]}},
            {"embedding": "transform(embedding, x -> -x)"},
        )
        t.append(
            spark.range(rows, rows + INS_IDS)
            .select(F.col("id").alias("vec_id"))
            .withColumn("embedding", _vec_expr())
            .coalesce(1)
        )

        changes = t.read_changes(spark, v0, keys="vec_id")
        t0 = time.time()
        rep = ivf_index_apply_changes(spark, changes, idx)
        apply_wall = time.time() - t0

        files_after = set(spark.table(idx).inputFiles())
        touched = rep["touched_cells"]
        rewritten_rows = (
            spark.table(idx).where(F.col("cell").isin(touched)).count()
        )

        # baseline: the rebuild this apply replaces
        t0 = time.time()
        ivf_index_build(t.read(spark), full, n_cells=n_cells, centroids=cents)
        rebuild_wall = time.time() - t0

        # correctness: apply == rebuild, exactly
        a = spark.table(idx).select("nid", "cell", "nvec")
        b = spark.table(full).select("nid", "cell", "nvec")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
            f"apply != rebuild at mult={mult}"
        )

        print(json.dumps({
            "rows": rows,
            "n_cells": n_cells,
            "index_files": len(files_after),
            "touched_cells": len(touched),
            "files_changed": len(files_before.symmetric_difference(files_after)),
            "rows_rewritten": rewritten_rows,
            "apply_wall_s": round(apply_wall, 3),
            "rebuild_wall_s": round(rebuild_wall, 3),
            "build_wall_s": round(build_wall, 3),
        }), flush=True)
    finally:
        for tb in (idx, full):
            spark.sql(f"DROP TABLE IF EXISTS {tb}")
            spark.sql(f"DROP TABLE IF EXISTS {tb}_centroids")
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    mults = [int(m) for m in sys.argv[2:]] or [1, 10, 100]
    spark = get_session()
    for mult in mults:
        run_scale(spark, base, mult)


if __name__ == "__main__":
    main()
