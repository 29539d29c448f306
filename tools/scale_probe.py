"""Scale probe: replicate the sf0.1 documents/embeddings tables N× in
place and time suite queries on both, to separate fixed per-job overhead
from data-bound cost (feeds SCALE.md's measured-scaling table).

Replication preserves each operator's workload SHAPE instead of
degenerating it:
- documents: per-copy ``translate`` salt rewrites every byte window, so
  near-dup/chunk structure is preserved WITHIN a copy and no cross-copy
  collisions appear (otherwise every doc pairs with its 9 clones and the
  output — not the throughput — grows quadratically);
- embeddings: id offset only — vectors repeat, so every LSH/IVF cell and
  centroid simply gets N× the members.

Usage: python tools/scale_probe.py [N] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logverzcore_spark.engine import get_session, read_table
from logverzcore_spark.suite import SUITE

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SALT_CHARS = "0123456789abcdefghij"


def build_replica(spark, n: int, out_dir: str, tables=None) -> None:
    """``tables`` restricts which big tables are replicated (e.g.
    ['documents'] for a d03-only probe — a 100x lineitem build would
    dominate the probe's wall time for nothing). Small dims always
    copy. The _OK marker records the built set so a later probe
    needing MORE tables rebuilds instead of silently missing files."""
    wanted = set(tables) if tables else {
        "documents", "embeddings", "events", "orders", "lineitem",
    }
    marker = os.path.join(out_dir, "_OK")
    if os.path.exists(marker):
        built = set(open(marker).read().split())
        if wanted <= built:
            return
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs = read_table(spark, BASE, "documents")
    copies = [] if "documents" not in wanted else [
        docs.select(
            (F.col("doc_id") + i * 1_000_000_000).alias("doc_id"),
            # Two-char translate grid: 400 distinct salts, every byte
            # window rewritten per copy (no cross-copy chunk collisions).
            F.translate(
                F.col("text"), "et",
                SALT_CHARS[i // len(SALT_CHARS)] + SALT_CHARS[i % len(SALT_CHARS)],
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(n)
    ]
    if copies:
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents.parquet")
        )
    emb = read_table(spark, BASE, "embeddings")
    e_copies = [] if "embeddings" not in wanted else [
        emb.select(
            (F.col("vec_id") + i * 1_000_000_000).alias("vec_id"), "embedding", "label"
        )
        for i in range(n)
    ]
    if e_copies:
        e_out = e_copies[0]
        for c in e_copies[1:]:
            e_out = e_out.unionByName(c)
        e_out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "embeddings.parquet")
        )
    # Events / star tables: key-offset copies — per-copy structure
    # (days, join fan-out, group cardinalities per key) is preserved
    # while volume and key domains scale N×.
    ev = read_table(spark, BASE, "events")
    ev_copies = [] if "events" not in wanted else [
        ev.select(
            (F.col("event_id") + i * 1_000_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + i * 1_000_000).alias("user_id"),
            "event_type", "value", "props",
        )
        for i in range(n)
    ]
    if ev_copies:
        ev_out = ev_copies[0]
        for c in ev_copies[1:]:
            ev_out = ev_out.unionByName(c)
        ev_out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "events.parquet")
        )
    for tbl, keys in (
        ("orders", ["o_orderkey", "o_custkey"]),
        ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ):
        if tbl not in wanted:
            continue
        t = read_table(spark, BASE, tbl)
        t_copies = [
            t.select(
                *[
                    (F.col(c) + i * 1_000_000_000).alias(c) if c in keys else F.col(c)
                    for c in t.columns
                ]
            )
            for i in range(n)
        ]
        t_out = t_copies[0]
        for c in t_copies[1:]:
            t_out = t_out.unionByName(c)
        t_out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{tbl}.parquet")
        )
    # Small dims pass through unchanged (they'd broadcast at any N).
    import shutil as _sh

    for tbl in ("region", "nation", "customer", "supplier", "part"):
        src = os.path.join(BASE, f"{tbl}.parquet")
        if os.path.exists(src):
            _sh.copyfile(src, os.path.join(out_dir, f"{tbl}.parquet"))
    with open(marker, "w") as fh:
        fh.write(" ".join(sorted(wanted)))


def main() -> None:
    args = sys.argv[1:]
    tables = None
    if "--tables" in args:
        i = args.index("--tables")
        tables = args[i + 1].split(",")
        del args[i : i + 2]
    n = int(args[0]) if args else 10
    names = args[1:] or ["m06_cdc_neardup", "s07_cluster_sample", "t15_shard_manifest"]
    spark = get_session("scale-probe")
    replica = f"/tmp/scale_probe_{n}x"
    build_replica(spark, n, replica, tables=tables)

    def best_of_3(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            SUITE[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            best = min(best, time.time() - t0)
        return round(best, 3)

    for name in names:
        t1 = best_of_3(name, BASE)
        tn = best_of_3(name, replica)
        print(f"{name}: 1x={t1}s {n}x={tn}s ratio={round(tn / max(t1, 1e-9), 2)}")


if __name__ == "__main__":
    main()
