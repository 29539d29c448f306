"""Scale probe for the r9 streaming composites (r10 task 6):

st36 — streaming crawl ingestion: per-BATCH cost as the banked
fingerprint state grows 100×. One fixed 2k-doc WARC batch runs the
full curation cascade + cross-batch dedup against a state table
pre-banked at 10k / 100k / 1M fingerprints. Claim: the cascade term is
batch-sized; the only state-dependent term is the anti-join's
fingerprint-column shuffle (32-char md5 per banked doc, never the
documents), so per-batch wall grows far slower than the bank.

st37 / task 1 — streaming MV + tagged snapshot commits: a source
SnapshotTable drains H = 25 / 100 / 400 tagged micro-batch appends.
At each checkpoint: (a) the median wall of the last 5 tagged appends
(commit cost vs stream age), (b) the head manifest's byte size split
into its tag component vs file/stats component (task 1's bound: tags
FLAT, files grow until compaction), (c) one fixed-size delta refresh
of an IncrementalAggregate (per-trigger MV cost vs source history).
After the last checkpoint a compact() resets the file term and the
append wall is re-measured.

Every cell asserts correctness inside the probe (state row counts,
refresh == recompute) before timing is reported.

Usage: python tools/stream_scale_probe.py [st36|st37|all]
Prints one JSON line per cell.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logverzcore_spark.engine import get_session


def _probe_st36(spark, work: str) -> None:
    from logverzcore_spark.operators.text import fingerprint_md5
    from logverzcore_spark.pipeline import crawl_curate
    from logverzcore_spark.streaming.stream_dedup import crawl_curate_stream
    from logverzcore_spark.suite.multimodal import _m30_warc_payload

    batch_docs = 2_000

    def mkdocs():
        return spark.range(0, batch_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha beaver cedar dolphin ember falcon garnet "
                      "harbor iris juniper kestrel lumen page number "),
                F.col("id").cast("string"),
                F.lit(" closing marsh nectar opal prairie quill russet."),
            ).alias("text"),
        )

    # the batch cascade's own survivor count (404s, boilerplate dups and
    # C4 casualties removed) — what the stream must land, at any bank
    expected_new = (
        crawl_curate(_m30_warc_payload(mkdocs()))
        .select(fingerprint_md5(F.col("text")).alias("f"))
        .agg(F.countDistinct("f"))
        .first()[0]
    )
    for bank in (10_000, 100_000, 1_000_000):
        tag = f"p36_{uuid.uuid4().hex[:6]}"
        target, state = f"{tag}_tgt", f"{tag}_fp"
        # banked state: `bank` fingerprints (the committed-corpus stand-in)
        spark.range(0, bank).select(
            F.md5(F.concat(F.lit("seed-"), F.col("id"))).alias("fp")
        ).write.saveAsTable(state)
        # target table exists with the stream's schema (appends go here)
        spark.createDataFrame([], "doc_id long, text string").write.saveAsTable(
            target
        )
        watch = os.path.join(work, f"watch_{tag}")
        os.makedirs(watch)
        mkdocs().coalesce(1).write.json(os.path.join(watch, "drop1"))
        stream = (
            spark.readStream.format("json")
            .schema("doc_id long, text string")
            .load(os.path.join(watch, "*"))
        )
        ckpt = os.path.join(work, f"ckpt_{tag}")
        t0 = time.time()
        q = crawl_curate_stream(
            spark,
            _m30_warc_payload(stream),
            target,
            checkpoint_dir=ckpt,
            state_table=state,
        )
        q.awaitTermination()
        wall = time.time() - t0
        n_new = spark.table(target).count()
        n_state = spark.table(state).count()
        assert n_new == expected_new, (n_new, expected_new)
        assert n_state == bank + expected_new, (n_state, bank)
        print(json.dumps({
            "probe": "st36_per_batch_vs_banked_corpus",
            "banked_fps": bank,
            "batch_docs": batch_docs,
            "survivors_committed": n_new,
            "batch_wall_s": round(wall, 2),
        }))
        for tbl in (target, state):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def _probe_st37(spark, work: str) -> None:
    from logverzcore_spark.incremental import IncrementalAggregate
    from logverzcore_spark.snapshots import SnapshotTable

    rows_per_batch = 2_000
    src = SnapshotTable(os.path.join(work, "src"))
    mv = IncrementalAggregate(
        src,
        os.path.join(work, "mv"),
        ["g"],
        {"n": ("count", None), "total": ("sum", "v")},
    )

    def batch_df(i: int):
        return spark.range(
            i * rows_per_batch, (i + 1) * rows_per_batch
        ).select(
            F.col("id"),
            (F.col("id") % 100).cast("int").alias("g"),
            (F.col("id") * 7 % 1_000_003).cast("long").alias("v"),
        )

    checkpoints = (25, 100, 400)
    done = 0
    for h in checkpoints:
        walls = []
        while done < h:
            t0 = time.time()
            src.append(batch_df(done).coalesce(1), tag=f"q:batch-{done}")
            walls.append(time.time() - t0)
            done += 1
        m = src._read_manifest(spark, done)
        tag_bytes = len(json.dumps({
            "all_tags": m["all_tags"], "recent_tags": m.get("recent_tags", []),
            "tag_floors": m.get("tag_floors", {}),
        }))
        manifest_bytes = len(json.dumps(m))
        # make the MV current, then measure ONE fixed-delta refresh
        mv.refresh(spark)
        src.append(batch_df(done).coalesce(1), tag=f"q:batch-{done}")
        done += 1
        t0 = time.time()
        rep = mv.refresh(spark)
        refresh_wall = time.time() - t0
        assert rep["mode"] == "delta", rep
        got = {r["g"]: (r["n"], r["total"]) for r in mv.result(spark).collect()}
        want = {
            r["g"]: (r["n"], r["total"])
            for r in src.read(spark).groupBy("g").agg(
                F.count("*").alias("n"), F.sum("v").alias("total")
            ).collect()
        }
        assert got == want  # the fold equals the one-shot recompute
        print(json.dumps({
            "probe": "st37_commit_and_refresh_vs_stream_age",
            "history_commits": done,
            "source_rows": done * rows_per_batch,
            "append_wall_median_last5_s": round(
                statistics.median(walls[-5:]), 3),
            "manifest_bytes": manifest_bytes,
            "tag_component_bytes": tag_bytes,
            "files_in_manifest": len(m["files"]),
            "delta_refresh_wall_s": round(refresh_wall, 3),
        }))
    # compaction resets the file/stats term; the append wall after it
    # prices what maintenance buys back on a long stream
    t0 = time.time()
    src.compact(spark, sort_cols=["g"], target_files=8)
    compact_wall = time.time() - t0
    t0 = time.time()
    src.append(batch_df(done).coalesce(1), tag=f"q:batch-{done}")
    post_wall = time.time() - t0
    m = src._read_manifest(spark, src.versions(spark)[-1])
    print(json.dumps({
        "probe": "st37_post_compact",
        "compact_wall_s": round(compact_wall, 2),
        "append_wall_after_compact_s": round(post_wall, 3),
        "manifest_bytes_after_compact": len(json.dumps(m)),
        "files_in_manifest": len(m["files"]),
    }))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_session("stream-scale-probe")
    work = tempfile.mkdtemp(prefix="stream_probe_")
    try:
        if which in ("st36", "all"):
            _probe_st36(spark, work)
        if which in ("st37", "all"):
            _probe_st37(spark, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
