"""Streaming dedup (foreachBatch + fingerprint state), table compaction,
and job-metrics recording."""

import json
import os

from pyspark.sql import types as T

from logverzcore_spark.ingest import CollectJob, collect, optimize_table
from logverzcore_spark.streaming.stream_dedup import dedup_stream

from rawfixtures import write_vpcflow_gz

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _write_docs(path: str, name: str, docs: list[tuple[int, str]]) -> None:
    with open(os.path.join(path, name), "w") as fh:
        for i, txt in docs:
            fh.write(json.dumps({"doc_id": i, "text": txt}) + "\n")


def test_dedup_stream_drops_duplicates_across_batches(spark, tmpdir_path):
    watch = os.path.join(tmpdir_path, "docs")
    os.makedirs(watch)
    ckpt = os.path.join(tmpdir_path, "ckpt")
    for t in ("dd_docs", "dd_docs_fingerprints"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    # Batch 1: 3 docs, one in-batch duplicate pair (ids 1,2 same text).
    _write_docs(watch, "b1.json", [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")])
    q = dedup_stream(spark, watch, DOC_SCHEMA, "dd_docs", checkpoint_dir=ckpt)
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.table("dd_docs").collect()}
    assert got == {1, 3}  # in-batch dup dropped, lowest id kept

    # Batch 2: one cross-batch duplicate (same text as doc 3), one new.
    _write_docs(watch, "b2.json", [(10, "gamma"), (11, "delta")])
    q = dedup_stream(spark, watch, DOC_SCHEMA, "dd_docs", checkpoint_dir=ckpt)
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.table("dd_docs").collect()}
    assert got == {1, 3, 11}  # doc 10 rejected as cross-batch duplicate

    # Restart with nothing new: no re-ingest (idempotent foreachBatch).
    q = dedup_stream(spark, watch, DOC_SCHEMA, "dd_docs", checkpoint_dir=ckpt)
    q.awaitTermination()
    assert spark.table("dd_docs").count() == 3
    assert spark.table("dd_docs_fingerprints").count() == 3
    for t in ("dd_docs", "dd_docs_fingerprints"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_optimize_table_compacts_small_files(spark, tmpdir_path):
    spark.sql("DROP TABLE IF EXISTS frag_t")
    # Fragment: 20 tiny appends → ≥20 files.
    for i in range(20):
        spark.range(i * 10, (i + 1) * 10).write.mode("append").saveAsTable("frag_t")
    from pyspark.sql import functions as F

    before = spark.table("frag_t").select(F.input_file_name()).distinct().count()
    assert before >= 20
    n_after = optimize_table(spark, "frag_t", target_rows_per_file=1000)
    assert spark.table("frag_t").count() == 200  # no data change
    assert n_after == 1
    spark.sql("DROP TABLE IF EXISTS frag_t")


def test_collect_metrics_table(spark, tmpdir_path):
    write_vpcflow_gz(tmpdir_path, n_files=2)
    spark.sql("DROP TABLE IF EXISTS jobs_metrics")
    report = collect(
        spark,
        CollectJob(path=tmpdir_path, datatype="VPCFlow", table_name="mt_vpc"),
        metrics_table="jobs_metrics",
    )
    row = spark.table("jobs_metrics").first()
    assert row["jobid"] == report.job_id
    assert row["status"] == "completed"
    assert row["rows_written"] == report.rows_written == 10
    assert row["files_seen"] == 2
    for t in ("mt_vpc", "jobs_metrics"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_hourly_rollup_matches_batch(spark, tmpdir_path):
    """Rollup folded incrementally across two file drops (the second
    touching an EXISTING hour partition — late data) equals the batch
    answer; only touched partitions are rewritten."""
    import shutil

    from logverzcore_spark.streaming.rollup import (
        hourly_rollup_frame,
        incremental_hourly_rollup,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    watch = f"{tmpdir_path}/roll_in"
    os.makedirs(watch)
    spark.sql("DROP TABLE IF EXISTS roll_t")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    full = spark.read.parquet(src)
    if dict(full.dtypes)["ts"] == "bigint":
        from pyspark.sql import functions as F

        full = full.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Split one events file into two drops that SHARE hours (odd/even ids
    # interleave in time), so drop 2 merges into existing partitions.
    full.where("event_id % 2 = 0").write.parquet(f"{tmpdir_path}/d0")
    full.where("event_id % 2 = 1").write.parquet(f"{tmpdir_path}/d1")

    schema = full.schema
    ckpt = f"{tmpdir_path}/roll_ckpt"
    try:
        for drop in ("d0", "d1"):
            for f in os.listdir(f"{tmpdir_path}/{drop}"):
                if f.endswith(".parquet"):
                    shutil.copy(f"{tmpdir_path}/{drop}/{f}", f"{watch}/{drop}_{f}")
            stream = spark.readStream.schema(schema).parquet(watch)
            q = incremental_hourly_rollup(spark, stream, "roll_t", checkpoint_dir=ckpt)
            q.awaitTermination()
        got = {
            (str(r["hour_ts"]), r["event_type"]): (r["n"], float(r["total_value"]))
            for r in spark.table("roll_t").collect()
        }
        want = {
            (str(r["hour_ts"]), r["event_type"]): (r["n"], float(r["total_value"]))
            for r in hourly_rollup_frame(full).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS roll_t")
        spark.sql("DROP TABLE IF EXISTS roll_t_meta")


def test_optimize_table_repartition_layout_change(spark, tmpdir_path):
    """optimize_table(partition_by=…) recreates the table under a new
    partition layout with identical rows — the staged-copy path (not
    atomic, but data always exists somewhere; see docstring)."""
    from pyspark.sql import functions as F

    spark.range(0, 1000).select(
        "id", (F.col("id") % 4).alias("bucket"), (F.col("id") * 2).alias("v")
    ).repartition(16).write.mode("overwrite").saveAsTable("relayout_t")
    try:
        before = spark.table("relayout_t").agg(F.sum("v")).first()[0]
        optimize_table(spark, "relayout_t", target_rows_per_file=500, partition_by=["bucket"])
        after_df = spark.table("relayout_t")
        assert after_df.agg(F.sum("v")).first()[0] == before
        assert after_df.count() == 1000
        # The new layout actually partitions by bucket: partition pruning
        # appears in the scan of a bucket-filtered query.
        plan = after_df.where(F.col("bucket") == 2)._jdf.queryExecution().executedPlan().toString()
        assert "bucket=2" in plan or "PartitionFilters" in plan
        # No staged copy left behind.
        assert not spark.catalog.tableExists("relayout_t__compact")
    finally:
        spark.sql("DROP TABLE IF EXISTS relayout_t")
        spark.sql("DROP TABLE IF EXISTS relayout_t__compact")


def test_rollup_fold_replay_is_idempotent(spark, tmpdir_path):
    """foreachBatch is at-least-once: re-invoking fold with an
    already-applied batch id must be a no-op (no double-count), while a
    NEW batch id still folds in (ADVICE r2)."""
    from pyspark.sql import functions as F

    from logverzcore_spark.streaming.rollup import make_fold

    for t in ("replay_t", "replay_t_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    fold = make_fold(spark, "replay_t")
    b0 = spark.createDataFrame(
        [("2024-01-01 10:05:00", "click", 2.0), ("2024-01-01 10:40:00", "click", 3.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    try:
        fold(b0, 0)
        first = spark.table("replay_t").agg(F.sum("n")).first()[0]
        assert first == 2
        fold(b0, 0)  # replay of the same batch id: skipped
        assert spark.table("replay_t").agg(F.sum("n")).first()[0] == first
        b1 = spark.createDataFrame(
            [("2024-01-01 10:50:00", "click", 1.0)],
            "ts string, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        fold(b1, 1)  # a new batch id folds in
        assert spark.table("replay_t").agg(F.sum("n")).first()[0] == 3
        fold(b1, 1)  # and its replay is skipped too
        assert spark.table("replay_t").agg(F.sum("n")).first()[0] == 3
    finally:
        for t in ("replay_t", "replay_t_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_dedup_stream_crash_between_appends(spark, monkeypatch):
    """Inject a crash BETWEEN the data append and the fingerprint append
    (the documented non-atomic commit window, stream_dedup.py docstring):
    replaying the same batch must lose no document, and the duplicates
    must be bounded to exactly the failed batch's fresh rows."""
    import pytest
    from pyspark.sql import readwriter as rw

    from logverzcore_spark.streaming import stream_dedup

    for t in ("cw_docs", "cw_fp"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        b1 = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "doc_id long, text string"
        )
        stream_dedup._dedup_batch(b1, spark, "cw_docs", "cw_fp", "text", "doc_id")

        orig = rw.DataFrameWriter.saveAsTable

        def crashing(self, name, *a, **kw):
            if name == "cw_fp":
                raise RuntimeError("injected crash between appends")
            return orig(self, name, *a, **kw)

        monkeypatch.setattr(rw.DataFrameWriter, "saveAsTable", crashing)
        b2 = spark.createDataFrame(
            [(3, "gamma"), (4, "alpha")], "doc_id long, text string"
        )
        with pytest.raises(RuntimeError):
            stream_dedup._dedup_batch(b2, spark, "cw_docs", "cw_fp", "text", "doc_id")
        monkeypatch.undo()

        # Data-before-fingerprints ordering: gamma's row IS committed,
        # its fingerprint is NOT.
        spark.catalog.refreshTable("cw_docs")
        spark.catalog.refreshTable("cw_fp")
        assert sorted(r["doc_id"] for r in spark.table("cw_docs").collect()) == [1, 2, 3]
        assert spark.table("cw_fp").count() == 2

        # Replay of the SAME batch (what the checkpoint does on restart):
        # alpha's dup still anti-joins out; gamma re-appends (at-least-once
        # for the failed batch only) and its fingerprint commits.
        stream_dedup._dedup_batch(b2, spark, "cw_docs", "cw_fp", "text", "doc_id")
        assert sorted(r["doc_id"] for r in spark.table("cw_docs").collect()) == [1, 2, 3, 3]
        assert spark.table("cw_fp").count() == 3

        # Post-recovery batches dedup against the repaired state: a new
        # doc with gamma's text is dropped — duplicates never spread
        # beyond the crashed batch.
        b3 = spark.createDataFrame([(5, "gamma")], "doc_id long, text string")
        stream_dedup._dedup_batch(b3, spark, "cw_docs", "cw_fp", "text", "doc_id")
        assert sorted(r["doc_id"] for r in spark.table("cw_docs").collect()) == [1, 2, 3, 3]
    finally:
        for t in ("cw_docs", "cw_fp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_upsert_fold_merges_replays_and_touches_only_buckets(spark):
    """CDC upsert: latest-wins by (ts, tie), new beats old on full tie,
    untouched buckets' FILES survive a later batch (partition-scoped
    rewrite), and batch-id replays are no-ops."""
    from pyspark.sql import functions as F

    from logverzcore_spark.streaming.upsert import BUCKET_COL, make_upsert_fold

    for t in ("ups_t", "ups_t_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    fold = make_upsert_fold(
        spark, "ups_t", key_col="k", ts_col="ts", tie_cols=["rev"], n_buckets=8
    )
    b0 = spark.createDataFrame(
        [("a", 1, 1, "v1"), ("a", 2, 1, "v2"), ("b", 1, 1, "w1")],
        "k string, ts long, rev long, payload string",
    )
    try:
        fold(b0, 0)
        got = {r["k"]: r["payload"] for r in spark.table("ups_t").collect()}
        assert got == {"a": "v2", "b": "w1"}  # in-batch latest-wins

        files_before = {
            r[0]
            for r in spark.table("ups_t")
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        # Batch 1 only touches key 'a' (newer ts) and new key 'c'.
        b1 = spark.createDataFrame(
            [("a", 5, 1, "v3"), ("c", 1, 1, "x1")],
            "k string, ts long, rev long, payload string",
        )
        fold(b1, 1)
        got = {r["k"]: r["payload"] for r in spark.table("ups_t").collect()}
        assert got == {"a": "v3", "b": "w1", "c": "x1"}
        # b's bucket differs from a/c's buckets → its file must be intact.
        b_bucket = spark.table("ups_t").where("k = 'b'").select(BUCKET_COL).first()[0]
        a_bucket = spark.table("ups_t").where("k = 'a'").select(BUCKET_COL).first()[0]
        if b_bucket != a_bucket:
            files_after = {
                r[0]
                for r in spark.table("ups_t")
                .where("k = 'b'")
                .select(F.input_file_name())
                .distinct()
                .collect()
            }
            assert files_after <= files_before

        # Replay of batch 1: no-op.
        fold(b1, 1)
        assert spark.table("ups_t").count() == 3

        # Full tie (same ts, same rev): the NEW row wins.
        b2 = spark.createDataFrame(
            [("b", 1, 1, "w2")], "k string, ts long, rev long, payload string"
        )
        fold(b2, 2)
        assert {r["k"]: r["payload"] for r in spark.table("ups_t").collect()}["b"] == "w2"
        # Stale update (older ts) does NOT regress the row.
        b3 = spark.createDataFrame(
            [("a", 3, 1, "stale")], "k string, ts long, rev long, payload string"
        )
        fold(b3, 3)
        assert {r["k"]: r["payload"] for r in spark.table("ups_t").collect()}["a"] == "v3"
    finally:
        for t in ("ups_t", "ups_t_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_optimize_table_zorder_clusters_both_columns(spark):
    """Z-ordered compaction concentrates a narrow range of EITHER
    clustered column into a minority of files; a plain a-sorted layout
    serves only a. 16 files ≈ the top 4 z bits (two of each column), so
    a 1/8th range inside one top-level quadrant should touch ~4 files,
    not all 16 (the range must not straddle a high-bit boundary)."""
    from pyspark.sql import functions as F

    spark.sql("DROP TABLE IF EXISTS zorder_t")
    base = spark.range(40_000).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(200))).alias("a"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(200))).alias("b"),
    )
    base.coalesce(4).write.saveAsTable("zorder_t")

    n_files = optimize_table(
        spark, "zorder_t", target_rows_per_file=2_500, zorder_by=["a", "b"]
    )
    assert n_files == 16
    assert spark.table("zorder_t").count() == 40_000  # no data change

    def files_touched(pred):
        return (
            spark.table("zorder_t")
            .where(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    a_files = files_touched((F.col("a") >= 8) & (F.col("a") < 33))
    b_files = files_touched((F.col("b") >= 8) & (F.col("b") < 33))
    assert a_files <= 5, a_files
    assert b_files <= 5, b_files
    spark.sql("DROP TABLE IF EXISTS zorder_t")


def test_optimize_table_writes_bloom_filters(spark):
    """bloom_filter_cols must reach the parquet writer: the bloom-enabled
    rewrite of identical data is strictly larger on disk (the serialized
    filters), and the data itself is unchanged. Point-lookup row-group
    skipping can't be observed from results (it's a pure I/O saving), so
    the on-disk footprint is the behavioral witness that the filters
    exist."""
    import os
    from urllib.parse import urlparse

    from pyspark.sql import functions as F

    def table_bytes(table):
        files = [
            urlparse(r[0]).path
            for r in spark.table(table).select(F.input_file_name()).distinct().collect()
        ]
        return sum(os.path.getsize(f) for f in files)

    base = spark.range(50_000).select(F.col("id"), F.xxhash64("id").alias("req_id"))
    for t in ("bloom_t", "plain_t"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        base.coalesce(2).write.saveAsTable(t)
    optimize_table(spark, "plain_t", target_rows_per_file=25_000)
    optimize_table(
        spark,
        "bloom_t",
        target_rows_per_file=25_000,
        bloom_filter_cols=["req_id"],
        bloom_filter_ndv=25_000,
    )
    assert spark.table("bloom_t").count() == 50_000
    probe = spark.table("bloom_t").where(F.col("req_id") == base.first()["req_id"])
    assert probe.count() == 1  # filters never change results
    extra = table_bytes("bloom_t") - table_bytes("plain_t")
    assert extra > 10_000, extra  # serialized filters present in every file
    for t in ("bloom_t", "plain_t"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_collect_records_table_statistics(spark, tmpdir_path):
    """collect() leaves catalog statistics on the table (row count +
    size), the input the cost-based optimizer and broadcast threshold
    plan from."""
    write_vpcflow_gz(tmpdir_path, n_files=1)
    spark.sql("DROP TABLE IF EXISTS stats_vpc")
    collect(
        spark,
        CollectJob(path=tmpdir_path, datatype="VPCFlow", table_name="stats_vpc"),
    )
    rows = spark.sql("DESCRIBE TABLE EXTENDED stats_vpc").collect()
    stats = [r for r in rows if r["col_name"] == "Statistics"]
    assert stats, "no Statistics row in DESCRIBE EXTENDED"
    assert "rows" in stats[0]["data_type"]  # e.g. '1234 bytes, 5 rows'
    spark.sql("DROP TABLE IF EXISTS stats_vpc")


def test_rollup_fold_crash_between_write_and_meta(spark):
    """The narrowed crash window: batch N's partition overwrite completed
    but the meta record did NOT (crash between the two writes). On
    replay, the per-partition last_batch markers make the already-written
    partitions skip the merge — no double count — while the meta record
    catches up."""
    from pyspark.sql import functions as F

    from logverzcore_spark.streaming.rollup import _record_applied_batch, make_fold

    for t in ("crashw_t", "crashw_t_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    fold = make_fold(spark, "crashw_t")
    mk = lambda rows: spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    try:
        fold(mk([("2024-01-01 10:05:00", "click", 2.0)]), 0)
        b1 = mk(
            [
                ("2024-01-01 11:05:00", "click", 1.0),
                ("2024-01-02 09:00:00", "view", 4.0),
            ]
        )
        fold(b1, 1)
        after = spark.table("crashw_t").agg(F.sum("n"), F.sum("total_value")).first()
        # Simulate the crash: the data overwrite above survived, but the
        # meta record "never happened" — rewind it to batch 0.
        _record_applied_batch(spark, "crashw_t_meta", 0)
        fold(b1, 1)  # foreachBatch replays the same batch id
        replayed = spark.table("crashw_t").agg(F.sum("n"), F.sum("total_value")).first()
        assert tuple(replayed) == tuple(after)  # no double-count
        # And the meta caught back up: yet another replay is a fast no-op.
        fold(b1, 1)
        assert tuple(
            spark.table("crashw_t").agg(F.sum("n"), F.sum("total_value")).first()
        ) == tuple(after)
    finally:
        for t in ("crashw_t", "crashw_t_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_sketch_fold_crash_between_write_and_meta(spark):
    """Same narrowed window for the sketch rollup: replay after a
    committed table rewrite (meta lost) must not double n_events."""
    from pyspark.sql import functions as F

    from logverzcore_spark.streaming.rollup import (
        _record_applied_batch,
        make_sketch_fold,
    )

    for t in ("crashsk_t", "crashsk_t_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    fold = make_sketch_fold(spark, "crashsk_t")
    mk = lambda rows: spark.createDataFrame(
        rows, "ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    try:
        fold(mk([("2024-01-01 10:05:00", 1, 1.0)]), 0)
        b1 = mk([("2024-01-01 11:00:00", 2, 1.0), ("2024-01-02 09:00:00", 3, 1.0)])
        fold(b1, 1)
        after = spark.table("crashsk_t").agg(F.sum("n_events")).first()[0]
        assert after == 3
        _record_applied_batch(spark, "crashsk_t_meta", 0)  # meta "lost"
        fold(b1, 1)  # replay
        assert spark.table("crashsk_t").agg(F.sum("n_events")).first()[0] == after
    finally:
        for t in ("crashsk_t", "crashsk_t_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_upsert_replay_after_committed_write(spark):
    """Latest-wins upsert is idempotent under post-write/pre-meta crash
    replay: re-folding an already-reflected batch reproduces identical
    table contents (no markers needed, unlike the additive rollups)."""
    from pyspark.sql import functions as F

    from logverzcore_spark.streaming.rollup import _record_applied_batch
    from logverzcore_spark.streaming.upsert import make_upsert_fold

    for t in ("crashup_t", "crashup_t_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    fold = make_upsert_fold(spark, "crashup_t", "k", "ts", ["eid"])
    mk = lambda rows: spark.createDataFrame(
        rows, "k long, ts string, eid long, v string"
    ).withColumn("ts", F.to_timestamp("ts"))
    try:
        fold(mk([(1, "2024-01-01 10:00:00", 1, "a")]), 0)
        b1 = mk([(1, "2024-01-01 11:00:00", 2, "b"), (2, "2024-01-01 09:00:00", 3, "c")])
        fold(b1, 1)
        before = sorted(map(tuple, spark.table("crashup_t").drop("_bucket").collect()))
        _record_applied_batch(spark, "crashup_t_meta", 0)  # meta "lost"
        fold(b1, 1)  # replay re-merges — idempotent
        after = sorted(map(tuple, spark.table("crashup_t").drop("_bucket").collect()))
        assert after == before
    finally:
        for t in ("crashup_t", "crashup_t_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_topk_fold_merges_across_batches(spark):
    """Combining per-batch top-k summaries equals the whole-history
    answer (below sketch capacity), and the crash-replay guard holds."""
    from pyspark.sql import functions as F

    from logverzcore_spark.streaming.rollup import (
        _record_applied_batch,
        make_topk_fold,
    )

    for t in ("crashtk_t", "crashtk_t_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fold = make_topk_fold(spark, "crashtk_t", "user_id", max_items=1000)
    try:
        fold(ev.where(F.col("event_id") % 2 == 0), 0)
        fold(ev.where(F.col("event_id") % 2 == 1), 1)

        def top5():
            return sorted(
                (
                    (r["e"]["item"], r["e"]["count"])
                    for r in spark.table("crashtk_t")
                    .select(F.explode(F.expr("approx_top_k_estimate(topk_sk, 5)")).alias("e"))
                    .collect()
                ),
                key=lambda t: (-t[1], t[0]),
            )

        exact = sorted(
            ((r["user_id"], r["n"]) for r in
             ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()),
            key=lambda t: (-t[1], t[0]),
        )[:5]
        assert top5() == exact  # merged summaries == whole history
        _record_applied_batch(spark, "crashtk_t_meta", 0)  # meta "lost"
        fold(ev.where(F.col("event_id") % 2 == 1), 1)  # replay
        assert top5() == exact  # no double-count
    finally:
        for t in ("crashtk_t", "crashtk_t_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_quota_fold_incremental_equals_batch(spark):
    """Incremental per-source quota cap (streaming/rollup.make_quota_fold):
    folding batches must equal the batch source_quota_cap over everything
    seen (top-N-per-key is monotone), evict displaced docs, and converge
    under per-row replay (redelivered batch = no-op state)."""
    from pyspark.sql import functions as F

    from logverzcore_spark.operators.text import source_quota_cap
    from logverzcore_spark.streaming.rollup import make_quota_fold

    rows = [(i, f"s{i % 3}", 100 + (i * 37) % 90) for i in range(36)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    state = "quota_fold_state_t"
    spark.sql(f"DROP TABLE IF EXISTS {state}")
    fold = make_quota_fold(spark, state, quota=4)
    try:
        batches = [
            df.where(F.col("doc_id") < 12),
            df.where(F.col("doc_id").between(12, 23)),
            df.where(F.col("doc_id") >= 24),
        ]
        fold(batches[0], 0)
        # mid-stream: state equals the batch cap over batch 0 alone
        expect0 = {
            tuple(r) for r in source_quota_cap(batches[0], 4).collect()
        }
        assert {tuple(r) for r in spark.table(state).collect()} == expect0
        fold(batches[1], 1)
        fold(batches[2], 2)
        expect_all = {tuple(r) for r in source_quota_cap(df, 4).collect()}
        got = {tuple(r) for r in spark.table(state).collect()}
        assert got == expect_all  # merged + evicted correctly
        assert spark.table(state).count() == 12  # 3 sources x quota 4
        # per-row replay: redelivering batch 1 leaves the state unchanged
        fold(batches[1], 1)
        assert {tuple(r) for r in spark.table(state).collect()} == expect_all
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {state}")


def test_bloom_dedup_stream_three_tiers_across_batches(spark, tmpdir_path):
    """bloom_dedup_stream's three rejection tiers, across batches: (a) a
    doc matching the CORPUS (bloom-positive, exact-confirmed) never
    commits; (b) an in-batch duplicate keeps the lowest id; (c) a
    cross-batch duplicate of a committed doc is dropped by the stream
    state; and bloom-negative fresh docs commit without the corpus table
    existing being a requirement of their path. Restart is idempotent."""
    from pyspark.sql import functions as F

    from logverzcore_spark.operators import dedup
    from logverzcore_spark.streaming.stream_dedup import bloom_dedup_stream

    watch = os.path.join(tmpdir_path, "bd_docs")
    os.makedirs(watch)
    ckpt = os.path.join(tmpdir_path, "bd_ckpt")
    for t in ("bd_docs", "bd_docs_fingerprints", "bd_corpus"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    corpus = spark.createDataFrame(
        [("known one",), ("known two",)], ["text"]
    ).select(dedup.fingerprint_md5(F.col("text")).alias("fp"))
    corpus.write.saveAsTable("bd_corpus")
    bloom = dedup.build_fp_bloom(spark.table("bd_corpus"), fpp=0.01)

    def run():
        stream = (
            spark.readStream.format("json").schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", "1").load(watch)
        )
        q = bloom_dedup_stream(spark, stream, "bd_docs", "bd_corpus", bloom, ckpt)
        q.awaitTermination()

    _write_docs(watch, "b1.json", [(1, "known one"), (2, "fresh a"), (3, "fresh a")])
    run()
    assert {r["doc_id"] for r in spark.table("bd_docs").collect()} == {2}
    _write_docs(watch, "b2.json", [(10, "fresh a"), (11, "known two"), (12, "fresh b")])
    run()
    assert {r["doc_id"] for r in spark.table("bd_docs").collect()} == {2, 12}
    run()  # restart, nothing new
    assert spark.table("bd_docs").count() == 2
    assert spark.table("bd_docs_fingerprints").count() == 2
    for t in ("bd_docs", "bd_docs_fingerprints", "bd_corpus"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_frontier_fold_split_invariant_and_replay_safe(spark):
    """make_frontier_fold's two contracts: feeding the same points as
    ONE batch or THREE batches (any split) yields the identical state —
    frontier(A∪B) = frontier(frontier(A)∪B) — and re-delivering a batch
    (at-least-once replay) leaves the state unchanged (MIN id is
    idempotent, dominated points cannot re-enter)."""
    import random

    from pyspark.sql import functions as F

    from logverzcore_spark.operators.eventops import pareto_frontier_2d
    from logverzcore_spark.streaming.rollup import make_frontier_fold

    rng = random.Random(11)
    pts = [(i, rng.randint(0, 40) * 1.0, rng.randint(0, 40)) for i in range(200)]
    df = spark.createDataFrame(pts, "pid long, x double, y long")
    want = {
        (r["x"], r["y"], r["min_id"])
        for r in pareto_frontier_2d(df, "x", "y", id_col="pid")
        .select("x", "y", "min_id")
        .collect()
    }
    for n_batches in (1, 3):
        spark.sql("DROP TABLE IF EXISTS front_t")
        fold = make_frontier_fold(spark, "front_t", "x", "y", "pid")
        chunks = [pts[i::n_batches] for i in range(n_batches)]
        for bid, chunk in enumerate(chunks):
            fold(spark.createDataFrame(chunk, "pid long, x double, y long"), bid)
        got = {
            (r["x"], r["y"], r["min_id"]) for r in spark.table("front_t").collect()
        }
        assert got == want, f"n_batches={n_batches}"
        # replay the last chunk: state must not change
        fold(spark.createDataFrame(chunks[-1], "pid long, x double, y long"), 99)
        again = {
            (r["x"], r["y"], r["min_id"]) for r in spark.table("front_t").collect()
        }
        assert again == want
    spark.sql("DROP TABLE IF EXISTS front_t")


def test_apply_changes_merge_semantics_and_untouched_partitions(spark, tmpdir_path):
    """Batch MERGE contracts: update replaces, insert adds, delete
    removes, delete-of-absent-key is a no-op; and partitions whose
    buckets no change key hashes into are NOT rewritten (file mtimes
    unchanged) — the O(touched buckets) promise."""
    import glob
    import os

    from pyspark.sql import functions as F

    from logverzcore_spark.streaming.upsert import apply_changes

    spark.sql("DROP TABLE IF EXISTS mrg_t")
    rows = [(k, 10, float(k), 100 + k, "upsert") for k in range(40)]
    init = spark.createDataFrame(
        rows, "user_id long, ts long, value double, event_id long, op string"
    )
    apply_changes(spark, "mrg_t", init, "user_id", "ts", tie_cols=["event_id"])
    wh = spark.sql("DESCRIBE EXTENDED mrg_t").collect()
    loc = [r["data_type"] for r in wh if r["col_name"] == "Location"][0].replace(
        "file:", ""
    )
    before = {f: os.path.getmtime(f) for f in glob.glob(f"{loc}/_bucket=*/*.parquet")}
    ch = spark.createDataFrame(
        [
            (1, 20, 99.0, 200, "upsert"),    # update key 1
            (1000, 20, 7.0, 201, "upsert"),  # insert new key
            (2, 20, 0.0, 202, "delete"),     # delete key 2
            (5000, 20, 0.0, 203, "delete"),  # delete absent key: no-op
        ],
        "user_id long, ts long, value double, event_id long, op string",
    )
    stats = apply_changes(spark, "mrg_t", ch, "user_id", "ts", tie_cols=["event_id"])
    assert stats["deletes"] == 2 and stats["upserts"] == 2
    spark.catalog.refreshTable("mrg_t")
    got = {r["user_id"]: r for r in spark.table("mrg_t").collect()}
    assert got[1]["value"] == 99.0 and got[1]["ts"] == 20
    assert got[1000]["value"] == 7.0
    assert 2 not in got and 5000 not in got
    assert len(got) == 40 - 1 + 1  # one delete, one insert
    after = {f: os.path.getmtime(f) for f in glob.glob(f"{loc}/_bucket=*/*.parquet")}
    untouched = [f for f in before if f in after and before[f] == after[f]]
    assert untouched, "every partition was rewritten — touched-bucket pruning broken"
    spark.sql("DROP TABLE IF EXISTS mrg_t")


def test_countmin_fold_crash_between_write_and_meta(spark):
    """The CMS fold's replay guard: cell-wise addition is NOT
    idempotent, so a replay after a committed table rewrite (meta lost)
    must not double any cell; the folded sketch equals a one-shot batch
    build over the union of batches."""
    from pyspark.sql import functions as F

    from logverzcore_spark.operators.sketches import countmin_build
    from logverzcore_spark.streaming.rollup import (
        _record_applied_batch,
        make_countmin_fold,
    )

    for t in ("crashcms_t", "crashcms_t_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    fold = make_countmin_fold(spark, "crashcms_t", "k", depth=3, width=32)
    mk = lambda ks: spark.createDataFrame([(k,) for k in ks], "k long")
    try:
        fold(mk([1, 1, 2]), 0)
        fold(mk([2, 3]), 1)
        total = spark.table("crashcms_t").agg(F.sum("cnt")).first()[0]
        assert total == 3 * 5  # depth * n_rows
        _record_applied_batch(spark, "crashcms_t_meta", 0)  # meta "lost"
        fold(mk([2, 3]), 1)  # replay
        assert spark.table("crashcms_t").agg(F.sum("cnt")).first()[0] == total
        batch = countmin_build(mk([1, 1, 2, 2, 3]), "k", depth=3, width=32)
        folded = spark.table("crashcms_t").select("d", "w", "cnt")
        assert sorted(map(tuple, folded.collect())) == sorted(
            map(tuple, batch.collect())
        )
    finally:
        for t in ("crashcms_t", "crashcms_t_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_source_tokens_fold_crash_between_write_and_meta(spark):
    """The mixture-state fold's replay guard: token addition is NOT
    idempotent, so a replay after a committed state rewrite (meta lost)
    must not double any source; folded state equals a one-shot batch
    aggregate over the union."""
    from pyspark.sql import functions as F

    from logverzcore_spark.streaming.rollup import (
        _record_applied_batch,
        make_source_tokens_fold,
    )

    for t in ("crashmix_t", "crashmix_t_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    fold = make_source_tokens_fold(spark, "crashmix_t")
    mk = lambda rows: spark.createDataFrame(rows, "source string, text string")
    try:
        fold(mk([("a", "x y z"), ("b", "p q")]), 0)
        fold(mk([("a", "one two"), ("c", "solo")]), 1)
        state = {r.source: (r.avail_tokens, r.n_docs)
                 for r in spark.table("crashmix_t").collect()}
        assert state == {"a": (5, 2), "b": (2, 1), "c": (1, 1)}
        _record_applied_batch(spark, "crashmix_t_meta", 0)  # meta "lost"
        fold(mk([("a", "one two"), ("c", "solo")]), 1)  # replay
        state2 = {r.source: (r.avail_tokens, r.n_docs)
                  for r in spark.table("crashmix_t").collect()}
        assert state2 == state
        from logverzcore_spark.operators.text import temperature_mixture_from_state

        alloc = temperature_mixture_from_state(spark, "crashmix_t", 100).collect()
        assert sum(r.alloc_tokens for r in alloc) == 100
    finally:
        for t in ("crashmix_t", "crashmix_t_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_canary_stream_replay_idempotent(spark, tmpdir_path):
    """Re-running the REAL canary stream over the same source with a
    FRESH checkpoint (full redelivery of every file) appends no
    duplicate hit rows — per-row idempotence, not checkpoint luck."""
    import os

    from logverzcore_spark.operators.text import BIGBENCH_CANARY
    from logverzcore_spark.streaming.lexical_stream import canary_scan_stream

    tbl = "t_canary_state"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    rows = [
        (0, "a", f"leak {BIGBENCH_CANARY} here"),
        (1, "a", "clean"),
        (2, "b", f"another {BIGBENCH_CANARY}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    src_dir = os.path.join(tmpdir_path, "canary_src")
    df.coalesce(2).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    try:
        for attempt in range(2):  # second run = fresh checkpoint, full replay
            stream = spark.readStream.schema(schema).parquet(src_dir)
            q = canary_scan_stream(
                spark, stream, tbl,
                checkpoint_dir=os.path.join(tmpdir_path, f"ck{attempt}"),
            )
            q.awaitTermination()
            assert spark.table(tbl).count() == 2
        got = {(r.source, r.doc_id) for r in spark.table(tbl).collect()}
        assert got == {("a", 0), ("b", 2)}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_canary_stream_restart_mid_batch_no_duplicates(spark, tmpdir_path):
    """Kill/restart across st31's dangerous window: the state-table
    append COMMITTED but the streaming checkpoint did not (crash
    between the two) — on restart Spark redelivers the whole batch and
    the (canary, doc_id) anti-join must keep the hit stream
    duplicate-free, with the grouped state equal to the batch scan
    over everything seen (the st22 restart discipline applied to the
    canary gate)."""
    import os

    from pyspark.sql import functions as F

    from logverzcore_spark.operators.text import BIGBENCH_CANARY, canary_scan
    from logverzcore_spark.streaming.lexical_stream import canary_scan_stream

    tbl = "t_canary_restart"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    c = BIGBENCH_CANARY
    batch1 = [(0, "a", f"leak {c} one"), (1, "a", "clean"),
              (2, "b", f"leak {c} two")]
    batch2 = [(3, "a", f"late {c} three"), (4, "b", "clean"),
              (5, "b", f"late {c} four")]
    schema = "doc_id long, source string, text string"
    watch = os.path.join(tmpdir_path, "watch")
    os.makedirs(watch)
    ck = os.path.join(tmpdir_path, "ck")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(watch + "/*")
        )
        q = canary_scan_stream(spark, stream, tbl, checkpoint_dir=ck)
        q.awaitTermination()

    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        os.path.join(watch, "f1.parquet")
    )
    drain()
    assert spark.table(tbl).count() == 2

    # The crash window: batch 2's fold ran to completion (state rows
    # committed) but the checkpoint never recorded the batch. Simulate
    # by appending batch 2's hit rows exactly as the fold would...
    b2 = spark.createDataFrame(batch2, schema)
    b2.where(F.col("text").contains(c)).select(
        F.col("source"), F.lit(c).alias("canary"), F.col("doc_id")
    ).write.mode("append").saveAsTable(tbl)
    spark.catalog.refreshTable(tbl)
    assert spark.table(tbl).count() == 4

    # ...then restart: the same data arrives as a NEW batch (the
    # checkpoint never saw it) and must append nothing.
    b2.coalesce(1).write.parquet(os.path.join(watch, "f2.parquet"))
    drain()
    try:
        assert spark.table(tbl).count() == 4  # no duplicates
        got = {(r.source, r.doc_id) for r in spark.table(tbl).collect()}
        assert got == {("a", 0), ("b", 2), ("a", 3), ("b", 5)}
        # grouped state == batch scan over everything seen
        everything = spark.createDataFrame(batch1 + batch2, schema)
        batch_scan = {
            (r.source, r.n_docs_hit, r.doc_ids)
            for r in canary_scan(everything).collect()
        }
        streamed = {
            (r.source, r.n_docs_hit, r.doc_ids)
            for r in spark.table(tbl).groupBy("source", "canary").agg(
                F.count(F.lit(1)).cast("long").alias("n_docs_hit"),
                F.array_join(
                    F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20), ","
                ).alias("doc_ids"),
            ).collect()
        }
        assert streamed == batch_scan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_url_frontier_cross_batch_and_replay(spark):
    """st34's state discipline driven batch by batch: a later batch
    re-offering an already-admitted page (any transport variant) is a
    no-op, a genuinely new page is admitted, unparseable URLs never
    enter the frontier, and a REPLAYED batch (the crash-between-
    checkpoint-and-commit window) anti-joins its own committed keys and
    adds nothing."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from logverzcore_spark.streaming.stream_dedup import _frontier_batch

    run = _uuid.uuid4().hex[:8]
    target, state = f"uf_t_{run}", f"uf_s_{run}"
    b1 = spark.createDataFrame(
        [(1, "https://a.example/p?x=1&utm_source=z"),
         (2, "HTTPS://A.Example:443/p?x=1"),   # same page, variant
         (3, "garbage not a url")],
        "doc_id long, url string",
    )
    b2 = spark.createDataFrame(
        [(10, "https://a.example/p/?x=1"),      # already-admitted page
         (11, "https://b.example/new")],        # genuinely new
        "doc_id long, url string",
    )
    try:
        _frontier_batch(b1, spark, target, state, "url", "doc_id")
        got1 = {(r["doc_id"], r["canon_url"])
                for r in spark.table(target).collect()}
        assert got1 == {(1, "https://a.example/p?x=1")}
        _frontier_batch(b2, spark, target, state, "url", "doc_id")
        got2 = {(r["doc_id"], r["canon_url"])
                for r in spark.table(target).collect()}
        assert got2 == got1 | {(11, "https://b.example/new")}
        _frontier_batch(b2, spark, target, state, "url", "doc_id")  # replay
        assert spark.table(target).count() == 2
        assert spark.table(state).count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {target}")
        spark.sql(f"DROP TABLE IF EXISTS {state}")


def test_schema_drift_stream_per_batch_semantics(spark):
    """st35's monitor driven batch by batch: each batch diffs against
    the FIXED baseline (not the previous batch), drift rows carry the
    batch id, a clean batch emits nothing, and a sparse key missing
    from one batch surfaces as a per-batch 'removed' the consumer can
    require persistence on."""
    import os
    import tempfile
    import uuid as _uuid

    from pyspark.sql import functions as F

    from logverzcore_spark.operators.coerce import json_key_profile
    from logverzcore_spark.streaming.monitor import schema_drift_stream

    run = _uuid.uuid4().hex[:8]
    base_tbl, drift_tbl = f"sd_base_{run}", f"sd_drift_{run}"
    src_dir = os.path.join(tempfile.gettempdir(), f"sd_src_{run}")
    os.makedirs(src_dir)
    baseline = spark.createDataFrame(
        [('{"a": 1, "b": "x"}',)] * 4, "props string"
    )
    try:
        json_key_profile(baseline).write.saveAsTable(base_tbl)
        # batch 1: clean (same shape); batch 2: 'b' missing + 'c' added
        spark.createDataFrame([('{"a": 2, "b": "y"}',)], "props string") \
            .write.json(os.path.join(src_dir, "b1"))
        spark.createDataFrame([('{"a": 3, "c": true}',)], "props string") \
            .write.json(os.path.join(src_dir, "b2"))
        stream = (
            spark.readStream.schema("props string")
            .option("maxFilesPerTrigger", "1")
            .json(src_dir + "/*/")
        )
        q = schema_drift_stream(
            spark, stream, base_tbl, drift_tbl,
            checkpoint_dir=os.path.join(tempfile.gettempdir(), f"ck_{drift_tbl}"),
        )
        q.awaitTermination()
        rows = {(r["key"], r["status"]) for r in spark.table(drift_tbl).collect()}
        assert rows == {("b", "removed"), ("c", "added")}
        # drift rows came from exactly one (dirty) batch
        assert spark.table(drift_tbl).select("batch_id").distinct().count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {base_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {drift_tbl}")
