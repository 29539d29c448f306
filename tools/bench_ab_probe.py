"""One side of the interleaved bench A/B (the documented >±30% move
protocol — bench.py REPS note, BENCH_AB_r8/r10 artifacts).

Runs the bench headline (+extended) queries from an ARBITRARY checkout
— pass the repo path — in one fresh process, printing the RAW per-rep
samples as one JSON line. The caller alternates old-checkout and
new-HEAD processes in a single session window (≥3 per side) so machine
drift hits both sides equally, then compares per-process medians of
reps 2+ (rep 1 carries codegen/JIT and is excluded).

Usage: python tools/bench_ab_probe.py /path/to/checkout [reps]
Default 4 reps. The query list is pinned HERE (not imported) so both
sides measure the identical set even if a checkout renames constants.
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = [
    "q01_pricing_summary",
    "q03_top_orders",
    "q04_region_revenue",
    "q05_top3_orders_per_customer",
    "q07_distinct_segments",
    "q13_hourly_events",
    "q18_sessionize",
    "t01_text_profile",
    "d01_dedup_exact",
    "d03_minhash_lsh",
    "s01_cosine_topk",
    "st01_streaming_hourly",
    "m30_crawl_curate_e2e",
    "d29_threshold_sweep_ht",
    "s25_maxsim_rerank",
    "st22_streaming_curation_cascade",
]


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from logverzcore_spark.engine import SF_TABLES, get_session, read_table
    from logverzcore_spark.suite import SUITE

    spark = get_session("bench-ab-probe")
    for t in SF_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            read_table(spark, sf_dir, t).count()
    samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    for _rep in range(reps):
        for name in QUERIES:
            t0 = time.time()
            SUITE[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    warm = {n: sorted(s[1:])[len(s[1:]) // 2] for n, s in samples.items()}
    print(json.dumps({
        "repo": repo,
        "reps": reps,
        "raw": samples,
        "median_reps2plus": warm,
        "sum_median": round(sum(warm.values()), 3),
    }))


if __name__ == "__main__":
    main()
