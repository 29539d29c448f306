"""Isolated noop-sink timing for one suite entry (r14 protocol: a
construction-side change is only closed after an isolated re-measure).

Usage: python tools/d29_isolate.py [entry ...]   (default: d29)
Prints per-rep construct/exec seconds (3 reps, fresh construction each).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logverzcore_spark.engine import get_session  # noqa: E402
from logverzcore_spark.suite import SUITE  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["d29_threshold_sweep_ht"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("isolate-probe")
    # Warm footers/file index like bench.py does.
    from logverzcore_spark.engine import SF_TABLES, read_table

    for t in SF_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            read_table(spark, sf_dir, t).count()
    for name in names:
        for rep in range(3):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = SUITE[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            spark.catalog.clearCache()
            print(
                f"{name} rep{rep}: construct={t1 - t0:.3f}s "
                f"exec={t2 - t1:.3f}s total={t2 - t0:.3f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
