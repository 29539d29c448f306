"""Stage-prefix noop-sink breakdown of m30_crawl_curate_e2e (r14,
VERDICT task 4): times each cumulative prefix of the crawl cascade so
the per-stage cost is the successive difference. min-of-3 per prefix.

Usage: python tools/m30_breakdown.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logverzcore_spark.engine import get_session, read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_session("m30-breakdown")
    from logverzcore_spark.operators import dedup
    from logverzcore_spark.operators.multimodal import extract_warc_http
    from logverzcore_spark.operators.text import (
        c4_line_filter,
        normalize_text,
        strip_html,
    )
    from logverzcore_spark.suite.multimodal import _m30_warc_payload

    docs = read_table(spark, sf_dir, "documents")
    docs.count()  # warm footer

    def stage(name):
        def deco(fn):
            return (name, fn)
        return deco

    def payload():
        return _m30_warc_payload(docs)

    def pages():
        return extract_warc_http(payload())

    def ok():
        return pages().where(F.col("status") == 200).select(
            "doc_id", F.col("body_text").alias("text")
        )

    def stripped():
        return strip_html(ok())

    def normed():
        return normalize_text(
            stripped().select("doc_id", F.col("clean").alias("text"))
        )

    def lined():
        return normed().select(
            "doc_id", F.regexp_replace("clean", r"([.!?]) ", "$1\n").alias("text")
        )

    def c4():
        return c4_line_filter(lined())

    def kept():
        return c4().where(F.col("keep")).select(
            "doc_id", F.col("clean_text").alias("text")
        )

    def full():
        final = dedup.dedup_keep_first(kept())
        return final.select(
            "doc_id",
            F.md5("text").alias("fp"),
            F.length("text").cast("long").alias("n_chars"),
        )

    prefixes = [
        ("1_payload", payload),
        ("2_warc_walk", pages),
        ("3_http_200", ok),
        ("4_strip_html", stripped),
        ("5_normalize", normed),
        ("6_reline", lined),
        ("7_c4_filter", c4),
        ("8_kept", kept),
        ("9_full_m30", full),
    ]
    out = {}
    for name, fn in prefixes:
        times = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"m30 breakdown: {name}")
            t0 = time.time()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(times), "all": times}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
