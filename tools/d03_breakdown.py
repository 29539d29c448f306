"""Stage-time breakdown for d03_minhash_lsh (the MinHash+LSH pipeline).

The headline bench times d03 end-to-end; this tool attributes that wall
time to the pipeline's stages by timing CUMULATIVE PREFIXES of the plan
(each forced through a noop write, same as bench.py), then differencing
medians:

  P1  scan + tokenize + shingle-hash array  (``shingle_hash_array``)
  P2  P1 + k-wide min fold                  (``minhash_signature_sets``)
  P3  P2 + banding expansion                (``minhash_band_buckets``)
  P4  P3 + bucket groupBy + pair expansion + distinct   (candidates)
  P5  full ``minhash_lsh_pairs``            (+ verify join)

Prefix timing (not per-stage instrumentation) because Spark fuses these
narrow stages into one physical stage — there is no per-operator wall
time to read off the UI that isn't confounded by fusion. Differencing
medians of independent runs is noisy (±30% box noise, see bench.py) but
unbiased, and it's the attribution the r4 verdict asked to commit before
optimizing d03 blind.

Usage: python tools/d03_breakdown.py [sf_dir] [--reps N] [--json out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logverzcore_spark.engine import get_session, read_table  # noqa: E402
from logverzcore_spark.operators import dedup  # noqa: E402
from logverzcore_spark.operators.text import tokens  # noqa: E402
from logverzcore_spark.operators.util import fan_out  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_prefixes(spark, sf_dir: str) -> dict:
    """Return {name: thunk} — each thunk materializes one prefix."""
    num_hashes, bands, n = 32, 16, 3

    def docs():
        return read_table(spark, sf_dir, "documents")

    def p1_shingles():
        toked = fan_out(docs()).select(
            F.col("doc_id"), tokens(F.col("text")).alias("_tk")
        )
        staged = toked.select(
            "doc_id", dedup.shingle_hash_array(F.col("_tk"), n).alias("_hs")
        ).where(F.size("_hs") > 0)
        _noop(staged)

    def p2_signatures():
        _noop(
            dedup.minhash_signature_sets(
                docs(), num_hashes=num_hashes, n=n, with_sets=False, persist=False
            )
        )

    def p3_banding():
        sig = dedup.minhash_signature_sets(
            docs(), num_hashes=num_hashes, n=n, with_sets=False, persist=False
        )
        _noop(dedup.minhash_band_buckets(sig, num_hashes=num_hashes, bands=bands))

    def p4_candidates():
        sig = dedup.minhash_signature_sets(
            docs(), num_hashes=num_hashes, n=n, with_sets=False, persist=False
        )
        buckets = dedup.minhash_band_buckets(sig, num_hashes=num_hashes, bands=bands)
        grouped = (
            buckets.groupBy("band", "bucket")
            .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
            .where(F.size("ids") > 1)
        )
        cand = (
            grouped.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids)), "
                        "y -> struct(x AS id1, y AS id2))))"
                    )
                ).alias("p")
            )
            .select("p.id1", "p.id2")
            .distinct()
        )
        _noop(cand)

    def p5_full():
        _noop(dedup.minhash_lsh_pairs(docs(), threshold=0.7))

    return {
        "p1_shingle_hash": p1_shingles,
        "p2_signatures": p2_signatures,
        "p3_banding": p3_banding,
        "p4_candidates": p4_candidates,
        "p5_full_verify": p5_full,
    }


def main() -> None:
    argv = list(sys.argv[1:])
    reps = 3
    out = None
    # Consume options (and their VALUES) before reading positionals —
    # otherwise `--json out.json` leaves 'out.json' to become sf_dir.
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    if "--json" in argv:
        i = argv.index("--json")
        out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    spark = get_session("d03-breakdown")
    read_table(spark, sf_dir, "documents").count()  # warm footer/file index

    prefixes = build_prefixes(spark, sf_dir)
    samples: dict[str, list[float]] = {k: [] for k in prefixes}
    for _rep in range(reps):
        for name, thunk in prefixes.items():
            t0 = time.time()
            thunk()
            samples[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()

    med = {k: sorted(v)[len(v) // 2] for k, v in samples.items()}
    order = list(prefixes)
    stages = {}
    prev = 0.0
    for k in order:
        stages[k] = round(med[k] - prev, 3)
        prev = med[k]
    result = {
        "sf_dir": sf_dir,
        "reps": reps,
        "prefix_medians": med,
        "prefix_samples": samples,
        "stage_deltas": stages,
    }
    print(json.dumps(result, indent=1))
    if out:
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
