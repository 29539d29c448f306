"""s15 kNN-graph 100x probe UNDER THE DOCUMENTED SCALING POLICY.

The r6 SCALE row measured s15 at 10x with n_planes FIXED (4 planes /
16 cells): within-cell pair expansion grew 100x and wall grew 4.2x,
with the documented mitigation "n_planes grows with the corpus so cell
size — and the per-vector edge cost — stays constant". This probe
MEASURES that policy instead of arguing it: replicas at 1x/10x/100x are
timed with n_planes stepped so the expected cell occupancy stays near
the 1x baseline (~125 vectors/cell): 4 planes at 1x (2k vecs, 16
cells), 7 at 10x (20k, 128), 11 at 100x (200k, 2048). If the policy
holds, wall/vector stays ~flat while fixed-plane wall/vector grows
~linearly (the 10x fixed-plane row is re-measured for contrast).

Replication CANNOT be the id-offset copy scale_probe.py uses for
embeddings: identical vectors land in identical cells no matter how
many planes you add, so the policy would be unmeasurable. Each copy is
instead an ORTHOGONAL transform of the base corpus — a circular
coordinate shift (copy % dim) plus a first-component sign flip for
copies >= dim. Orthogonal maps preserve every within-copy dot product
and norm, so each copy's kNN structure is EXACTLY the base corpus's
(workload shape preserved), while cross-copy vectors differ and spread
across hyperplane cells like real data.

Usage: python tools/knn_scale_probe.py [--json OUT]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logverzcore_spark.engine import get_session, read_table
from logverzcore_spark.operators.similarity import knn_graph

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM = 64


def build_replica(spark, n: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS_PROBE")):
        return
    emb = read_table(spark, BASE, "embeddings")
    copies = []
    for i in range(n):
        shift = i % DIM
        vec = F.col("embedding").cast("array<double>")
        if shift:
            vec = F.concat(
                F.slice(vec, shift + 1, DIM - shift), F.slice(vec, 1, shift)
            )
        if i >= DIM:  # second orthogonal family: reflect component 0
            vec = F.concat(
                F.array(-F.element_at(vec, 1)), F.slice(vec, 2, DIM - 1)
            )
        copies.append(
            emb.select(
                (F.col("vec_id") + i * 1_000_000_000).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(path, "embeddings.parquet")
    )
    open(os.path.join(path, "_SUCCESS_PROBE"), "w").write(str(n))


def timed(spark, sf_dir: str, n_planes: int, runs: int = 3):
    emb = read_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    best, edges = float("inf"), None
    for _ in range(runs):
        t0 = time.time()
        out = knn_graph(emb, dim=DIM, k=3, n_planes=n_planes)
        edges = out.count()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return {
        "n_vecs": n_vecs,
        "n_planes": n_planes,
        "cells": 2**n_planes,
        "wall_s": round(best, 2),
        "per_kvec_s": round(best / (n_vecs / 1000), 4),
        "edges": edges,
        "edges_per_vec": round(edges / n_vecs, 3),
    }


def main() -> None:
    json_out = None
    args = sys.argv[1:]
    if "--json" in args:
        json_out = args[args.index("--json") + 1]
    spark = get_session("knn-scale-probe")
    results = {}
    results["1x_p4"] = timed(spark, BASE, 4)
    print("1x_p4", results["1x_p4"], flush=True)
    for n, planes in ((10, 7), (100, 11)):
        path = f"/tmp/knn_probe_{n}x"
        build_replica(spark, n, path)
        if n == 10:  # fixed-plane contrast (the r6 SCALE row's shape)
            results["10x_p4_fixed"] = timed(spark, path, 4)
            print("10x_p4_fixed", results["10x_p4_fixed"], flush=True)
        results[f"{n}x_p{planes}"] = timed(spark, path, planes, runs=2 if n == 100 else 3)
        print(f"{n}x_p{planes}", results[f"{n}x_p{planes}"], flush=True)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=1)
        print("wrote", json_out)


if __name__ == "__main__":
    main()
