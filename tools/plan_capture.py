"""Capture .explain("formatted") output for suite queries (r13 deliverable).

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default: the
bench headline + extended set). Streaming entries (st*) are driven to
completion by their suite functions and return a BATCH result frame, so
their captured plan is the final result-read plan; the streaming
computation itself is asserted in pytest/plan-quality tests instead.

Usage: python tools/plan_capture.py <tag> <suffix> [query ...]
e.g.   python tools/plan_capture.py r13 before
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logverzcore_spark.engine import get_session  # noqa: E402
from logverzcore_spark.suite import SUITE  # noqa: E402

DEFAULT = [
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
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("plan-capture")
    for name in names:
        df = SUITE[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
