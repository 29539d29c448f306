"""Round-3 operators: CDC binary near-dup, cluster-balanced sampling,
and the export shard writer."""

import os

from pyspark.sql import functions as F

from logverzcore_spark import export
from logverzcore_spark.operators import multimodal, similarity

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_cdc_chunks_splice_invariant(spark):
    """The CDC property fixed-position banding lacks: splicing bytes into
    the middle of a payload leaves every chunk after the edit's chunk
    intact (boundaries re-synchronize), so the variant still collides
    with the original."""
    import hashlib

    # Varied (non-periodic) payload: periodic text has few distinct
    # 16-byte windows, so the boundary mask may never fire.
    base = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(120)
    )
    spliced = base[:2000] + "INSERTED BYTES " + base[2000:]
    df = spark.createDataFrame(
        [(1, base), (2, spliced)], "doc_id long, text string"
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    chunks = multimodal.cdc_chunks(df).collect()
    a = {r["chunk_md5"] for r in chunks if r["doc_id"] == 1}
    b = {r["chunk_md5"] for r in chunks if r["doc_id"] == 2}
    assert len(a) >= 2  # the payload actually chunked
    assert len(a & b) >= 1  # shared chunks survive the splice
    pairs = multimodal.cdc_neardup_pairs(df, min_shared_chunks=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_cdc_chunks_cover_payload(spark):
    """Chunk (start, len) tiling is exact: every payload byte belongs to
    exactly one chunk (starts are unique and the first is 1)."""
    df = _docs(spark).limit(50).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    rows = multimodal.cdc_chunks(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_start"])
    for starts in by_doc.values():
        assert min(starts) == 1
        assert len(starts) == len(set(starts))


def test_cluster_sample_balance_and_determinism(spark):
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    cents = similarity.lcg_centroids(64, 16)
    s1 = similarity.cluster_balanced_sample(emb, per_cell=3, centroids=cents).collect()
    s2 = similarity.cluster_balanced_sample(emb, per_cell=3, centroids=cents).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # run-stable
    per_cell = {}
    for r in s1:
        per_cell[r["cell"]] = per_cell.get(r["cell"], 0) + 1
    assert all(n <= 3 for n in per_cell.values())  # never over quota
    assert len(per_cell) >= 8  # spread across cells, not one dense mode


def test_export_shards_roundtrip(spark, tmpdir_path):
    docs = _docs(spark)
    out = os.path.join(tmpdir_path, "shards")
    manifest = export.export_shards(docs, out, n_shards=8).collect()
    assert sum(r["n_docs"] for r in manifest) == docs.count()
    # Written layout: one directory per non-empty shard, readable back.
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    shard_dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert shard_dirs == {f"shard={r['shard']}" for r in manifest}
    # Per-shard counts in the written data match the manifest.
    written = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert written == {r["shard"]: r["n_docs"] for r in manifest}
    # The manifest itself was persisted alongside the shards.
    mback = spark.read.parquet(os.path.join(out, "_manifest"))
    assert mback.count() == len(manifest)


def test_stream_export_restart_no_duplicates(spark, tmpdir_path):
    """The streaming shard exporter is exactly-once across restarts: a
    second availableNow run over the same checkpoint re-emits nothing,
    and newly arrived source files append without touching old rows."""
    src = os.path.join(tmpdir_path, "src")
    out = os.path.join(tmpdir_path, "out")
    ck = os.path.join(tmpdir_path, "ck")
    docs = _docs(spark)
    docs.where(F.col("doc_id") % 2 == 0).write.parquet(os.path.join(src, "a.parquet"))

    def drain():
        stream = spark.readStream.schema(docs.schema).parquet(src + "/*")
        return export.export_shards_stream(
            spark, stream, out_dir=out, checkpoint_dir=ck, n_shards=4
        )

    m1 = {r["shard"]: r["n_docs"] for r in drain().collect()}
    n_even = docs.where(F.col("doc_id") % 2 == 0).count()
    assert sum(m1.values()) == n_even
    # Restart with no new data: nothing re-emitted.
    m2 = {r["shard"]: r["n_docs"] for r in drain().collect()}
    assert m2 == m1
    # New file arrives: totals grow to the full corpus, no dup doc_ids.
    docs.where(F.col("doc_id") % 2 == 1).write.parquet(os.path.join(src, "b.parquet"))
    m3 = drain()
    assert sum(r["n_docs"] for r in m3.collect()) == docs.count()
    back = spark.read.parquet(out)
    assert back.select("doc_id").distinct().count() == docs.count()


def test_shard_assign_stable_under_subset(spark):
    """Adding/removing rows never moves surviving rows between shards
    (hash of id, not rand()/partition-index)."""
    docs = _docs(spark)
    full = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", export.shard_assign(F.col("doc_id"), 8).alias("s")
        ).collect()
    }
    half = {
        r["doc_id"]: r["s"]
        for r in docs.where(F.col("doc_id") % 2 == 0)
        .select("doc_id", export.shard_assign(F.col("doc_id"), 8).alias("s"))
        .collect()
    }
    assert all(full[k] == v for k, v in half.items())


def test_curate_pipeline_stages(spark):
    """pipeline.curate: output ⊆ input, is exactly-deduped, and the
    benchmark stage only ever removes docs."""
    from logverzcore_spark.pipeline import curate
    from logverzcore_spark.operators import dedup

    docs = _docs(spark)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    train = docs.where(F.col("doc_id") % 17 != 0)
    out = curate(train, benchmark=bench)
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    assert ids <= {r["doc_id"] for r in train.select("doc_id").collect()}
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # No two survivors share a normalized fingerprint.
    fps = (
        train.join(out.select("doc_id"), "doc_id", "left_semi")
        .select(dedup.fingerprint_md5(F.col("text")).alias("fp"))
        .groupBy("fp").count().where(F.col("count") > 1).count()
    )
    assert fps == 0
    # Decontamination is monotone: no-benchmark run is a superset.
    no_bench = {r["doc_id"] for r in curate(train).collect()}
    assert ids <= no_bench


def test_curate_report_matches_curate(spark):
    """The disposition report's 'kept' set IS curate()'s output — the
    attribution cannot drift from the pipeline it explains."""
    from logverzcore_spark.pipeline import curate, curate_report

    docs = _docs(spark)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    train = docs.where(F.col("doc_id") % 17 != 0)
    kept = {
        r["doc_id"]
        for r in curate_report(train, benchmark=bench)
        .where(F.col("disposition") == "kept")
        .collect()
    }
    out = {r["doc_id"] for r in curate(train, benchmark=bench).collect()}
    assert kept == out


def test_export_sorted_ranges_disjoint_and_sorted(spark, tmpdir_path):
    """Range export: shard value-ranges are disjoint and consecutive,
    every file is internally sorted, and nothing is lost."""
    import glob

    import pandas as pd  # noqa: F401  (pyarrow fastpath)

    from pyspark.sql import functions as F

    from logverzcore_spark import export as ex
    from logverzcore_spark.engine import read_table

    orders = read_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    out = f"{tmpdir_path}/ranges"
    manifest = ex.export_sorted_ranges(orders, out, "cents", n_shards=4)
    rows = {r["shard"]: r for r in manifest.collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in rows.values()) == orders.count()
    for k in range(1, 4):  # disjoint, ordered ranges
        assert rows[k - 1]["max_val"] <= rows[k]["min_val"]

    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    for f in glob.glob(f"{out}/shard=*/part-*.parquet"):
        vals = pd.read_parquet(f, columns=["cents"])["cents"].tolist()
        assert vals == sorted(vals), f"unsorted file {f}"
    # shard dirs bound the values the manifest claims
    for k, r in rows.items():
        got = back.where(F.col("shard") == k).agg(
            F.min("cents"), F.max("cents")
        ).first()
        assert (got[0], got[1]) == (r["min_val"], r["max_val"])


def test_zorder_key_bit_exact_and_validated(spark):
    """zorder_key equals a Python-reference Morton interleave on a grid
    of values (clamping included); NULL input -> NULL key; bad configs
    raise."""
    import pytest

    from logverzcore_spark.export import zorder_key

    bits = 8
    grid = (1 << bits) - 1
    bounds = [(0.0, 100.0), (0.0, 50.0)]
    rows = [(i, float(x), float(y))
            for i, (x, y) in enumerate(
                [(0, 0), (100, 50), (37, 12), (99.5, 0.1), (150, -3), (50, 25)]
            )]
    df = spark.createDataFrame(rows + [(99, None, 1.0)],
                               "i long, x double, y double")
    out = {r["i"]: r["k"] for r in df.select(
        "i", zorder_key([F.col("x"), F.col("y")], bounds, bits=bits).alias("k")
    ).collect()}

    def ref(x, y):
        def q(v, lo, hi):
            g = int((v - lo) * (grid / (hi - lo)) // 1)
            return max(0, min(grid, g))
        qx, qy = q(x, 0.0, 100.0), q(y, 0.0, 50.0)
        k = 0
        for b in range(bits):
            k |= ((qx >> b) & 1) << (2 * b)
            k |= ((qy >> b) & 1) << (2 * b + 1)
        return k

    for i, (x, y) in enumerate([(0, 0), (100, 50), (37, 12), (99.5, 0.1),
                                (150, -3), (50, 25)]):
        assert out[i] == ref(x, y), (i, x, y)
    assert out[99] is None
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key([F.col("x")], [bounds[0]])
    with pytest.raises(ValueError, match="62-bit"):
        zorder_key([F.col("x"), F.col("y")], bounds, bits=32)
    with pytest.raises(ValueError, match="degenerate"):
        zorder_key([F.col("x"), F.col("y")], [(0.0, 100.0), (5.0, 5.0)])


def test_export_zordered_narrows_file_envelopes(spark, tmpdir_path):
    """The layout claim: files written z-ordered on (partkey, suppkey)
    carry a NARROW min/max envelope on the secondary column too, where
    a partkey-only sort leaves the suppkey envelope at ~full range —
    the property that lets parquet row-group stats prune scans on
    either column."""
    import glob

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.export import export_sorted_ranges, export_zordered

    li = read_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    n = li.count()
    full_span = (
        li.agg(
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("s")
        ).first()["s"]
    )

    def file_spans(out_dir):
        spans = []
        for f in glob.glob(f"{out_dir}/shard=*/part-*.parquet"):
            r = spark.read.parquet(f).agg(
                F.min("l_suppkey").alias("lo"), F.max("l_suppkey").alias("hi")
            ).first()
            spans.append(r["hi"] - r["lo"])
        return spans

    zdir = f"{tmpdir_path}/zord"
    man = export_zordered(
        li, zdir, ["l_partkey", "l_suppkey"], bits=16,
        n_shards=4, max_records_per_file=max(50, n // 40),
    )
    assert man.agg(F.sum("n_rows")).first()[0] == n
    sdir = f"{tmpdir_path}/sorted"
    export_sorted_ranges(
        li, sdir, "l_partkey", n_shards=4,
        max_records_per_file=max(50, n // 40),
    )
    z_spans, s_spans = file_spans(zdir), file_spans(sdir)
    assert len(z_spans) >= 8 and len(s_spans) >= 8
    z_avg = sum(z_spans) / len(z_spans)
    s_avg = sum(s_spans) / len(s_spans)
    # single-column sort leaves suppkey unclustered (~full range per
    # file); z-order must cut the average envelope at least in half
    assert s_avg > 0.8 * full_span, (s_avg, full_span)
    assert z_avg < 0.5 * s_avg, (z_avg, s_avg)


def test_compact_files_reduces_files_and_preserves_rows(spark, tmpdir_path):
    """64 tiny part files compact to the measured-byte target count;
    row multiset identical; stats report the real before/after."""
    path = os.path.join(tmpdir_path, "frag")
    df = spark.range(0, 20_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    stats = export.compact_files(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] == 64
    assert stats["files_after"] == stats["n_target_files"] == 1
    assert stats["bytes_before"] > 0 and stats["bytes_after"] > 0
    back = spark.read.parquet(path)
    assert back.count() == 20_000
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(20_000))
    # no staging residue
    parent = os.listdir(tmpdir_path)
    assert not any(p.endswith((".compact-tmp", ".compact-old")) for p in parent)


def test_compact_files_sort_col_restores_clustering(spark, tmpdir_path):
    """With sort_col, the rewrite range-partitions + sorts, so per-file
    min/max envelopes become disjoint-ish (narrow) instead of each file
    spanning the whole key domain."""
    path = os.path.join(tmpdir_path, "frag_sorted")
    df = spark.range(0, 40_000).withColumn("k", (F.col("id") * 7919) % 40_000)
    df.repartition(32).write.parquet(path)
    # force multiple output files so envelopes are comparable
    export.compact_files(spark, path, target_file_bytes=64 * 1024, sort_col="k")
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    assert len(per_file) > 2
    spans = [r["hi"] - r["lo"] for r in per_file]
    # each file covers a narrow slice, not the full 40k domain
    assert max(spans) < 40_000 / 2


def test_delete_rows_touches_only_affected_files(spark, tmpdir_path):
    """Deletes rewrite ONLY files containing a doomed id: every other
    part file survives byte-identical (same path, size, mtime); counts
    are exact; absent ids are a clean no-op."""
    path = os.path.join(tmpdir_path, "corpus")
    # 8 files with disjoint id ranges -> doomed ids {5, 12} live in 2 files
    df = spark.range(0, 80).withColumn("grp", (F.col("id") / 10).cast("int"))
    df.repartitionByRange(8, "grp").write.parquet(path)

    def snap():
        return {
            f: (os.path.getsize(os.path.join(path, f)),
                os.path.getmtime(os.path.join(path, f)))
            for f in os.listdir(path) if f.startswith(("part-", "deleted-"))
        }

    before = snap()
    doomed = spark.createDataFrame([(5,), (12,)], "id long")
    stats = export.delete_rows(spark, path, doomed, "id")
    assert stats["rows_deleted"] == 2
    assert 1 <= stats["files_rewritten"] <= 2
    after = snap()
    untouched = set(before) & set(after)
    assert len(untouched) == len(before) - stats["files_rewritten"]
    for f in untouched:
        assert before[f] == after[f]  # byte-identical survivors
    back = spark.read.parquet(path)
    assert back.count() == 78
    assert back.where(F.col("id").isin(5, 12)).count() == 0
    # absent ids: no-op, nothing rewritten
    stats2 = export.delete_rows(
        spark, path, spark.createDataFrame([(9999,)], "id long"), "id"
    )
    assert stats2 == {"files_total": len(after), "files_rewritten": 0,
                      "rows_deleted": 0}


def test_compacted_sink_replay_and_crash_windows(spark, tmpdir_path):
    """Exactly-once from idempotent pieces, driven through process()
    directly: (a) replayed committed batch is a no-op; (b) a batch that
    crashed between inbox write and marker is invisible, and its replay
    commits exactly once; (c) a consumed batch replayed AFTER compaction
    is still skipped (markers outlive compaction); (d) the read view
    never double-counts across the compaction boundary."""
    out = os.path.join(tmpdir_path, "sink")
    sink = export.CompactedAppendSink(out, compact_every=100)  # manual compaction
    b = lambda lo, hi: spark.range(lo, hi).withColumn("v", F.col("id") * 10)

    sink.process(b(0, 10), 0)
    sink.process(b(0, 10), 0)  # (a) replay: no dupes
    assert sink.read_view(spark).count() == 10

    # (b) crash window: inbox written, marker missing
    b(10, 20).write.mode("overwrite").parquet(os.path.join(out, "inbox", "1"))
    assert sink.read_view(spark).count() == 10  # uncommitted -> invisible
    sink.process(b(10, 20), 1)  # replay commits it once
    assert sink.read_view(spark).count() == 20

    assert sink.compact(spark) == 2
    view = sink.read_view(spark)
    assert view.count() == 20  # (d) nothing double-counted post-fold
    assert view.agg(F.sum("v")).first()[0] == 10 * sum(range(20))

    sink.process(b(0, 10), 0)  # (c) consumed batch replayed post-compaction
    assert sink.read_view(spark).count() == 20

    sink.process(b(20, 25), 2)  # new batch after compaction: inbox + base
    assert sink.read_view(spark).count() == 25
    assert sink.compact(spark) == 1
    assert sink.read_view(spark).count() == 25
    # base is the only data dir left after cleanup
    assert sink._inbox_ids(spark) == []


def test_delete_rows_recovers_interrupted_swap(spark, tmpdir_path):
    """Crash recovery for delete_rows' worst window: staged replacements
    complete (manifest written), SOME originals already deleted, nothing
    renamed in. A naive re-run would recompute from survivors and
    clobber the staging dir — losing the deleted files' surviving rows.
    The entry recovery must FINISH the swap first, so the final state is
    exact. Also: a stage without a manifest (crash mid-write, originals
    all intact) is discarded, not consumed."""
    import shutil

    path = os.path.join(tmpdir_path, "corpus_rec")
    df = spark.range(0, 80).withColumn("grp", (F.col("id") / 10).cast("int"))
    df.repartitionByRange(8, "grp").write.parquet(path)

    # Reproduce the pre-crash state by hand: stage kept rows + manifest
    # for the two files holding ids {5, 12}, then delete ONE of them
    # (crash after the first fs.delete, before any rename).
    import json as _json

    src = spark.read.parquet(path)
    doomed = spark.createDataFrame([(5,), (12,)], "id long")
    touched = [
        r["f"]
        for r in src.select("id", F.input_file_name().alias("f"))
        .join(F.broadcast(doomed), "id", "semi")
        .select("f").distinct().collect()
    ]
    assert len(touched) == 2
    tmp = path + ".delete-tmp"
    kept = spark.read.parquet(*touched).join(F.broadcast(doomed), "id", "anti")
    kept.repartition(2).write.parquet(tmp)
    with open(os.path.join(tmp, "_touched.json"), "w") as fh:
        _json.dump(sorted(touched), fh)
    first = touched[0].replace("file://", "").replace("file:", "")
    os.remove(first)  # the crash: one original gone, replacements un-moved

    # Recovery path: a fresh delete_rows (even a no-op id set) must first
    # finish the swap — no rows lost, doomed ids gone.
    stats = export.delete_rows(
        spark, path, spark.createDataFrame([(9999,)], "id long"), "id"
    )
    assert stats["rows_deleted"] == 0 and stats["files_rewritten"] == 0
    back = spark.read.parquet(path)
    assert back.count() == 78
    assert back.where(F.col("id").isin(5, 12)).count() == 0
    assert not os.path.exists(tmp)

    # Manifest-less stage (crash before the write-ahead point): discarded.
    os.makedirs(tmp)
    spark.range(0, 5).write.mode("overwrite").parquet(os.path.join(tmp))
    stats2 = export.delete_rows(
        spark, path, spark.createDataFrame([(9999,)], "id long"), "id"
    )
    assert stats2["rows_deleted"] == 0
    assert spark.read.parquet(path).count() == 78
    assert not os.path.exists(tmp)
    shutil.rmtree(path)


def test_compacted_sink_recovers_interrupted_base_swap(spark, tmpdir_path):
    """Crash between rename(base, old) and rename(tmp, base): base.old
    holds the ONLY copy of every folded batch (markers exist, inbox dirs
    cleaned). Both compact() and read_view() must roll base.old back to
    base instead of deleting it — the pre-fix code destroyed compacted
    history in exactly this window."""
    out = os.path.join(tmpdir_path, "sink_rec")
    sink = export.CompactedAppendSink(out, compact_every=100)
    b = lambda lo, hi: spark.range(lo, hi).withColumn("v", F.col("id") * 10)
    sink.process(b(0, 10), 0)
    sink.process(b(10, 20), 1)
    assert sink.compact(spark) == 2
    assert sink.read_view(spark).count() == 20

    # Simulate the crash window: base staged aside, tmp never moved in.
    os.rename(sink.base, sink.base + ".old")
    assert not os.path.exists(sink.base)

    sink.process(b(20, 25), 2)  # lands in inbox; then compact recovers
    assert sink.compact(spark) == 1
    view = sink.read_view(spark)
    assert view.count() == 25  # nothing lost, nothing duplicated
    assert view.agg(F.sum("v")).first()[0] == 10 * sum(range(25))

    # read_view alone also recovers (no compact in between)
    os.rename(sink.base, sink.base + ".old")
    assert sink.read_view(spark).count() == 25
    assert os.path.exists(sink.base)


def test_zorder_degenerate_columns_and_wide_column_lists(spark, tmpdir_path):
    """export_zordered handles all-NULL and constant cluster columns
    (synthetic bounds + NULL coalesce instead of TypeError/ValueError),
    and ingest's compaction z-value accepts 4+ columns by shrinking
    per-column bits under the 62-bit key cap."""
    from logverzcore_spark.ingest import _zorder_value

    df = (
        spark.range(0, 100)
        .withColumn("a", F.col("id").cast("double"))
        .withColumn("allnull", F.lit(None).cast("double"))
        .withColumn("const", F.lit(7.0))
    )
    out = os.path.join(tmpdir_path, "zdeg")
    man = export.export_zordered(df, out, ["a", "allnull", "const"], n_shards=2)
    assert man.agg(F.sum("n_rows")).first()[0] == 100

    # 4+ columns: old hard cap (16*4=64 > 62) now auto-shrinks to 15 bits
    df4 = df.withColumn("b", (F.col("id") % 10).cast("double"))
    vals = df4.select(
        _zorder_value(df4, ["a", "b", "const", "allnull"]).alias("z")
    )
    assert vals.where(F.col("z").isNull()).count() == 0
    assert vals.distinct().count() > 1


def test_epoch_shuffle_determinism_and_disjointness(spark, tmpdir_path):
    """Epoch shuffle: same seed replays bit-exact; different seeds give
    a different order; every doc gets exactly one (shard, rank); ranks
    are contiguous 1..n per shard; the shard writer preserves epoch
    order on disk."""
    df = spark.range(0, 400).withColumnRenamed("id", "doc_id").withColumn(
        "n_chars", (F.col("doc_id") % 97).cast("long")
    )
    a = {r["doc_id"]: (r["shard"], r["epoch_rank"])
         for r in export.epoch_shuffle(df, seed=7).collect()}
    b = {r["doc_id"]: (r["shard"], r["epoch_rank"])
         for r in export.epoch_shuffle(df, seed=7).collect()}
    assert a == b  # deterministic replay
    c = {r["doc_id"]: (r["shard"], r["epoch_rank"])
         for r in export.epoch_shuffle(df, seed=8).collect()}
    assert a != c  # another epoch is another order
    assert len(a) == 400  # exactly one assignment per doc
    # per-shard ranks are exactly 1..n (no gaps, no dupes)
    per_shard: dict[int, list[int]] = {}
    for shard, rank in a.values():
        per_shard.setdefault(shard, []).append(rank)
    assert len(per_shard) > 4
    for ranks in per_shard.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))

    # two-level == naive per-shard window (the equivalence the suite
    # oracle checks at corpus scale, asserted here at unit scale)
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit("7:"), F.col("doc_id").cast("string")))
    naive = df.withColumn("_k", key).withColumn(
        "shard",
        F.pmod(F.conv(F.substring("_k", 1, 4), 16, 10).cast("long"), F.lit(16))
        .cast("int"),
    ).withColumn(
        "epoch_rank",
        F.row_number().over(Window.partitionBy("shard").orderBy("_k", "doc_id"))
        .cast("long"),
    )
    nv = {r["doc_id"]: (r["shard"], r["epoch_rank"]) for r in naive.collect()}
    assert a == nv

    # writer: shard dirs hold rows in epoch order, manifest is exact
    out = os.path.join(tmpdir_path, "epoch")
    man = {r["shard"]: (r["n_docs"], r["first_rank"], r["last_rank"])
           for r in export.export_epoch_shards(df, out, seed=7).collect()}
    for shard, ranks in per_shard.items():
        assert man[shard] == (len(ranks), 1, len(ranks))
    back = spark.read.parquet(out)
    for shard in list(per_shard)[:3]:
        got = [
            r["epoch_rank"]
            for r in back.where(F.col("shard") == shard)
            .sort("epoch_rank").collect()
        ]
        assert got == sorted(got) and len(got) == len(per_shard[shard])


def test_compacted_sink_sweeps_orphaned_inbox_dirs(spark, tmpdir_path):
    """A crash after the base swap but before inbox cleanup leaves
    consumed dirs on disk; the NEXT compaction must sweep them (the
    docstring's promised retry), not leak them forever."""
    out = os.path.join(tmpdir_path, "sink_sweep")
    sink = export.CompactedAppendSink(out, compact_every=100)
    b = lambda lo, hi: spark.range(lo, hi)
    sink.process(b(0, 10), 0)
    sink.process(b(10, 20), 1)
    assert sink.compact(spark) == 2
    # Simulate the pre-cleanup crash: restore a consumed inbox dir
    b(0, 10).write.parquet(os.path.join(out, "inbox", "0"))
    assert sink._inbox_ids(spark) == [0]
    sink.process(b(20, 25), 2)
    assert sink.compact(spark) == 1  # folds only batch 2...
    assert sink._inbox_ids(spark) == []  # ...but sweeps the orphan too
    assert sink.read_view(spark).count() == 25  # and counts nothing twice


def test_delete_rows_discards_uncommitted_manifest_stage(spark, tmpdir_path):
    """A crash mid-manifest-write leaves only _touched.json.part (the
    manifest commit is a rename); recovery must discard the stage and
    proceed — never wedge on an unreadable manifest."""
    path = os.path.join(tmpdir_path, "corpus_mf")
    spark.range(0, 40).write.parquet(path)
    tmp = path + ".delete-tmp"
    os.makedirs(tmp)
    spark.range(0, 5).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_touched.json.part"), "w") as fh:
        fh.write('["file:/trunca')  # mid-write crash artifact
    stats = export.delete_rows(
        spark, path, spark.createDataFrame([(3,)], "id long"), "id"
    )
    assert stats["rows_deleted"] == 1
    assert spark.read.parquet(path).count() == 39
    assert not os.path.exists(tmp)


def test_snapshot_table_versions_crash_windows_and_vacuum(spark, tmpdir_path):
    """SnapshotTable invariants: reads are manifest-driven (a rewrite
    never disturbs older versions), a crashed commit (orphan data dir /
    .part manifest) is invisible to every reader, and vacuum reclaims
    orphans + expired versions while kept versions stay byte-stable."""
    import pytest as _pytest

    from logverzcore_spark.snapshots import SnapshotTable

    root = os.path.join(tmpdir_path, "snap")
    t = SnapshotTable(root)
    with _pytest.raises(FileNotFoundError):
        t.read(spark)

    assert t.append(spark.range(0, 10)) == 1
    assert t.append(spark.range(10, 30)) == 2
    assert t.overwrite(spark.range(100, 105)) == 3  # rewrite
    assert t.versions(spark) == [1, 2, 3]
    assert t.read(spark, 1).count() == 10
    assert t.read(spark, 2).count() == 30  # untouched by the rewrite
    assert t.read(spark).count() == 5      # latest = v3
    with _pytest.raises(ValueError):
        t.read(spark, 7)

    # Crash window A: data written, manifest never renamed -> invisible
    orphan_files, _, _, _ = t._write_data(spark.range(1000, 2000))
    assert len(orphan_files) > 0
    assert t.read(spark).count() == 5
    assert t.versions(spark) == [1, 2, 3]
    # Crash window B: partial .part manifest -> not a version
    with open(os.path.join(root, "_snapshots", "v9.json.part"), "w") as fh:
        fh.write('["trunc')
    assert t.versions(spark) == [1, 2, 3]

    # Vacuum: keep v2/v3; orphans + v1's unshared files reclaimed.
    # A FRESH unreferenced dir is protected by the in-flight grace (it
    # may belong to a commit still in flight) — first prove it stays:
    before = t.read(spark, 2).agg(F.sum("id")).first()[0]
    assert t.vacuum(spark, keep_last=2) == 0  # everything in grace
    assert all(os.path.exists(f.replace("file:", "")) for f in orphan_files)
    # age the crash orphan past the grace (a real orphan is old by the
    # next scheduled vacuum)
    import time as _time

    old = _time.time() - 86400
    for d in {os.path.dirname(f.replace("file:", "")) for f in orphan_files}:
        os.utime(d, (old, old))
    deleted = t.vacuum(spark, keep_last=2, orphan_grace_s=0.0)
    assert deleted >= 1  # at least the orphan commit DIR reclaimed whole
    assert not any(os.path.exists(f.replace("file:", "")) for f in orphan_files)
    assert t.versions(spark) == [2, 3]
    assert t.read(spark, 2).agg(F.sum("id")).first()[0] == before
    assert t.read(spark, 3).count() == 5
    with _pytest.raises(ValueError):
        t.read(spark, 1)  # time travel to a vacuumed version is gone


def test_snapshot_stream_restart_mid_batch(spark, tmpdir_path):
    """st33's dangerous window driven directly: the snapshot commit
    landed but the streaming checkpoint did not — replaying the same
    batch id must be a manifest-level no-op (tag idempotence), and an
    untagged duplicate would double the data."""
    from logverzcore_spark.snapshots import SnapshotTable

    root = os.path.join(tmpdir_path, "snapstream")
    t = SnapshotTable(root)
    b = spark.range(0, 50)
    v1 = t.append(b, tag="batch-0")
    assert v1 == 1
    # the crash: checkpoint lost, Spark re-runs batch 0's fold
    v_again = t.append(b, tag="batch-0")
    assert v_again == 1 and t.versions(spark) == [1]
    assert t.read(spark).count() == 50  # no duplicates
    # a genuinely new batch commits normally
    assert t.append(spark.range(50, 60), tag="batch-1") == 2
    assert t.read(spark).count() == 60


def test_snapshot_incremental_refuses_overwrite_spans(spark, tmpdir_path):
    """read_incremental answers from the file-list diff, which is only
    the row diff across APPEND commits — a range spanning an overwrite
    must be refused loudly, and empty increments return zero rows with
    the table's schema."""
    import pytest as _pytest

    from logverzcore_spark.snapshots import SnapshotTable

    root = os.path.join(tmpdir_path, "snapinc")
    t = SnapshotTable(root)
    t.append(spark.range(0, 10))
    t.append(spark.range(10, 30))
    inc = t.read_incremental(spark, 1, 2)
    assert inc.count() == 20 and inc.agg(F.min("id")).first()[0] == 10
    assert t.read_incremental(spark, 2, 2).count() == 0  # empty range
    t.overwrite(spark.range(100, 105))  # v3 rewrites
    with _pytest.raises(ValueError, match="overwrite"):
        t.read_incremental(spark, 1, 3)
    with _pytest.raises(ValueError):
        t.read_incremental(spark, 3, 1)  # inverted range


def test_snapshot_tags_survive_vacuum_and_namespace_streams(spark, tmpdir_path):
    """Two guarantees from the r7 second-pass review: (a) vacuum keeps
    the cumulative tag history (a checkpoint rewind replaying an old
    batch after vacuum must STILL no-op — vacuum's price is time
    travel, never dedup state); (b) tags are cumulative per table, so a
    caller namespacing tags per stream (snapshot_append_stream's ckid
    prefix) lets a second stream commit while bare ids would collide."""
    from logverzcore_spark.snapshots import SnapshotTable

    root = os.path.join(tmpdir_path, "snaptags")
    t = SnapshotTable(root)
    for i in range(5):
        t.append(spark.range(i * 10, (i + 1) * 10), tag=f"A:batch-{i}")
    assert t.read(spark).count() == 50
    t.vacuum(spark, keep_last=1)
    assert t.versions(spark) == [5]
    # rewound checkpoint replays an OLD, vacuumed batch: still a no-op
    assert t.append(spark.range(0, 10), tag="A:batch-0") == 5
    assert t.read(spark).count() == 50
    # a second stream's namespaced batch-0 is NOT stream A's batch-0
    v = t.append(spark.range(100, 103), tag="B:batch-0")
    assert v == 6 and t.read(spark).count() == 53


def test_snapshot_concurrent_commit_one_wins_one_raises(spark, tmpdir_path):
    """The single-writer CONTRACT is now ENFORCED (r7 'What's missing'
    #1): two committers racing for the same next version — one commits,
    the other raises CommitConflict, history stays linear, and no
    committed file is ever lost or replaced. Driven by interleaving the
    exact danger sequence: both writers read head=v1, both stage data,
    both attempt the v2 manifest commit."""
    import pytest as _pytest

    from logverzcore_spark.snapshots import CommitConflict, SnapshotTable

    root = os.path.join(tmpdir_path, "snapconc")
    t = SnapshotTable(root)
    assert t.append(spark.range(0, 10)) == 1

    # Both writers observe the same head, then race the v2 commit.
    head_v, head = t._head(spark)
    files_a, stats_a, ssch_a, _bl_a = t._write_data(spark.range(100, 120))
    files_b, stats_b, ssch_b, _bl_b = t._write_data(spark.range(200, 250))
    assert t._commit(spark, head["files"] + files_a, "A", head, head_v) == 2
    with _pytest.raises(CommitConflict):
        t._commit(spark, head["files"] + files_b, "B", head, head_v)

    # History linear, winner's rows intact, loser invisible (orphan).
    assert t.versions(spark) == [1, 2]
    assert t.read(spark, 2).count() == 30
    assert t.read(spark, 2).agg(F.max("id")).first()[0] == 119
    # Loser retries from the NEW head — the optimistic-concurrency path.
    head_v2, head2 = t._head(spark)
    assert t._commit(spark, head2["files"] + files_b, "B", head2, head_v2) == 3
    assert t.read(spark, 3).count() == 80
    # v2 stayed byte-stable through the retry (no silent replace).
    assert sorted(t._manifest(spark, 2)) == sorted(head["files"] + files_a)


def test_snapshot_crashed_commit_lock_failstop_and_break(spark, tmpdir_path):
    """A committer that crashed between lock grab and rename leaves an
    orphan .lock: the failure mode is FAIL-STOP (future committers of
    that version raise CommitConflict; nothing is silently lost), and
    break_commit_lock restores progress after the operator confirms no
    writer is alive."""
    import pytest as _pytest

    from logverzcore_spark.snapshots import CommitConflict, SnapshotTable

    root = os.path.join(tmpdir_path, "snapwedge")
    t = SnapshotTable(root)
    t.append(spark.range(0, 5))
    # the crash artifact: lock exists, manifest never renamed in
    with open(os.path.join(root, "_snapshots", "v2.json.lock"), "w"):
        pass
    with _pytest.raises(CommitConflict):
        t.append(spark.range(5, 9))
    assert t.versions(spark) == [1]  # nothing half-committed
    assert t.break_commit_lock(spark, 2) is True
    assert t.break_commit_lock(spark, 2) is False  # idempotent
    assert t.append(spark.range(5, 9)) == 2
    assert t.read(spark).count() == 9
