"""Full streaming curation cascade (st22): quality + exact dedup +
near-dup suppression + finalize in one foreachBatch pipeline, equal to
the batch pipeline across micro-batch boundaries."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from logverzcore_spark.streaming.stream_dedup import full_curation_stream

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# 20 distinct tokens incl. one stopword ("the" → ratio 0.05, on the
# gate boundary); a one-token edit moves 3 of 18 3-gram shingles →
# Jaccard 15/21 ≈ 0.714 ≥ 0.7; a two-token edit → 12/24 = 0.5 < 0.7.
_A = (
    "the alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo tango"
)
_B = _A.replace("tango", "zulu")       # near-dup of A (1 edit)
_C = _B.replace("juliet", "yankee")    # near-dup of B; NOT of A (2 edits)
_NOVEL = (
    "a one crimson two amber three jade four cobalt five ivory six "
    "slate seven pearl eight onyx nine coral ten"
)
_SHORT = "too short to pass"  # fails the 10-token quality gate


def _write(path, name, docs):
    with open(os.path.join(path, name), "w") as fh:
        for i, txt in docs:
            fh.write(json.dumps(
                {"doc_id": i, "text": txt, "source": f"s{i % 2}",
                 "n_chars": len(txt)}) + "\n")


def _run(spark, watch, ckpt, table):
    stream = (
        spark.readStream.format("json").schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1").load(watch)
    )
    q = full_curation_stream(spark, stream, table, checkpoint_dir=ckpt)
    q.awaitTermination()


def test_full_curation_stream_chains_and_exact_state_across_batches(
    spark, tmpdir_path
):
    """The two cross-batch invariants that make the stream equal the
    batch cascade: (1) a near-dup-dropped doc still drops ITS later
    near-duplicates (A<B<C chain with batches splitting B from C), and
    (2) a near-dup-dropped doc's fingerprint still blocks later
    same-text copies."""
    watch = os.path.join(tmpdir_path, "fc_docs")
    os.makedirs(watch)
    ckpt = os.path.join(tmpdir_path, "fc_ckpt")
    table = "fc_docs"
    tables = (table, f"{table}_fingerprints",
              f"{table}_lsh_buckets", f"{table}_lsh_sets")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        # Batch 1: A admitted, B near-dup-dropped, short fails quality.
        _write(watch, "b1.json", [(1, _A), (2, _B), (3, _SHORT)])
        _run(spark, watch, ckpt, table)
        assert {r["doc_id"] for r in spark.table(table).collect()} == {1}
        # BOTH exact-stage survivors are in state (B included).
        assert spark.table(f"{table}_fingerprints").count() == 2
        assert spark.table(f"{table}_lsh_sets").count() == 2

        # Batch 2: C is a near-dup of dropped B only → must be dropped
        # (admitted-only LSH state would admit it); 11 repeats B's
        # exact text → dropped by the fingerprint of the DROPPED doc;
        # 12 is novel → admitted.
        _write(watch, "b2.json", [(10, _C), (11, _B), (12, _NOVEL)])
        _run(spark, watch, ckpt, table)
        assert {r["doc_id"] for r in spark.table(table).collect()} == {1, 12}

        # Equivalence with the batch cascade over the union input.
        from logverzcore_spark.pipeline import curate

        union = spark.createDataFrame(
            [(i, t, f"s{i % 2}", len(t)) for i, t in
             [(1, _A), (2, _B), (3, _SHORT), (10, _C), (11, _B), (12, _NOVEL)]],
            DOC_SCHEMA,
        )
        want = {r["doc_id"] for r in curate(union).collect()}
        assert {r["doc_id"] for r in spark.table(table).collect()} == want

        # Restart with nothing new: idempotent (no re-appends).
        _run(spark, watch, ckpt, table)
        assert spark.table(table).count() == 2
        assert spark.table(f"{table}_fingerprints").count() == 4
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_full_curation_stream_finalize_projection(spark, tmpdir_path):
    """finalize runs per batch on admitted docs only and defines the
    target schema (the st22 scrub hook)."""
    watch = os.path.join(tmpdir_path, "fz_docs")
    os.makedirs(watch)
    ckpt = os.path.join(tmpdir_path, "fz_ckpt")
    table = "fz_docs"
    tables = (table, f"{table}_fingerprints",
              f"{table}_lsh_buckets", f"{table}_lsh_sets")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        _write(watch, "b1.json", [(1, _A), (2, _B), (4, _NOVEL)])
        stream = (
            spark.readStream.format("json").schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", "1").load(watch)
        )
        q = full_curation_stream(
            spark, stream, table, checkpoint_dir=ckpt,
            finalize=lambda df: df.select(
                "doc_id", F.length("text").alias("text_len")
            ),
        )
        q.awaitTermination()
        rows = {r["doc_id"]: r["text_len"] for r in spark.table(table).collect()}
        assert rows == {1: len(_A), 4: len(_NOVEL)}
        assert spark.table(table).columns == ["doc_id", "text_len"]
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def _run_crawl(spark, watch, ckpt, table):
    from logverzcore_spark.streaming.stream_dedup import crawl_curate_stream
    from logverzcore_spark.suite.multimodal import _m30_warc_payload

    stream = (
        spark.readStream.format("json").schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1").load(watch)
    )
    q = crawl_curate_stream(
        spark, _m30_warc_payload(stream.select("doc_id", "text")), table,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination()


def test_crawl_curate_stream_cross_batch_dedup_and_restart(spark, tmpdir_path):
    """st36's pytest half: the streaming crawl cascade's cross-batch
    contract — (1) a page whose fingerprint committed in an earlier
    batch is dropped even when the later arrival has a LOWER id
    (first-committed wins: the documented deviation from batch min-id
    under out-of-order arrival), (2) in-batch keep-first stays
    id-ordered, (3) restart on the same checkpoint with no new files
    changes nothing, and a post-restart batch still dedups against the
    original state. Expected sets are SIMULATED from the batch cascade
    (pipeline.crawl_curate on the union) + the explicit arrival-order
    rule, so the test needs no hand-computed C4 survival."""
    from logverzcore_spark.operators.text import fingerprint_md5
    from logverzcore_spark.pipeline import crawl_curate
    from logverzcore_spark.suite.multimodal import _m30_warc_payload

    # ids with %6==5 share the fixed boilerplate page (the dup mass);
    # others carry unique sentence-grammar pages whose C4 survival the
    # batch cascade decides. %7==0 (404s) avoided except doc 21 — kept
    # deliberately to prove the extract stage drops it on-stream too.
    filler = "short crawl filler body page"
    uniq = ("one crimson two amber three jade four cobalt five ivory six "
            "slate seven pearl eight onyx nine coral ten quartz eleven "
            "maple twelve cedar thirteen birch fourteen aspen fifteen elm "
            "sixteen oak seventeen pine eighteen fir nineteen ash twenty")
    batches = [
        [(11, filler), (17, filler), (20, uniq)],
        [(5, filler), (23, filler), (24, uniq.replace("crimson", "violet")),
         (21, uniq)],
        [(29, filler), (26, uniq.replace("oak", "teak"))],
    ]
    all_docs = [d for b in batches for d in b]
    kept = crawl_curate(_m30_warc_payload(
        spark.createDataFrame(all_docs, "doc_id long, text string")
    ))
    fp = {
        r["doc_id"]: r["f"]
        for r in kept.select(
            "doc_id", fingerprint_md5(F.col("text")).alias("f")
        ).collect()
    }
    assert 21 not in fp          # the 404 died in extraction
    assert fp[11] == fp[5] == fp[17] == fp[23] == fp[29]  # boiler mass
    assert 20 in fp and 24 in fp  # unique pages survive C4

    def expected(n_batches):
        seen, out = set(), set()
        for ids in batches[:n_batches]:
            in_batch = {}
            for i, _ in sorted(ids):
                f = fp.get(i)
                if f is not None and f not in in_batch:
                    in_batch[f] = i
            for f, i in in_batch.items():
                if f not in seen:
                    seen.add(f)
                    out.add(i)
        return out

    watch = os.path.join(tmpdir_path, "cc_docs")
    os.makedirs(watch)
    ckpt = os.path.join(tmpdir_path, "cc_ckpt")
    table = "cc_crawl"
    for t in (table, f"{table}_fingerprints"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        _write(watch, "b1.json", batches[0])
        _write(watch, "b2.json", batches[1])
        _run_crawl(spark, watch, ckpt, table)
        got = {r["doc_id"] for r in spark.table(table).collect()}
        assert got == expected(2)
        assert 11 in got and 5 not in got  # first-committed beat the lower id
        # the committed text equals the batch cascade's, byte for byte
        batch_text = {r["doc_id"]: r["text"] for r in kept.collect()}
        for r in spark.table(table).collect():
            assert r["text"] == batch_text[r["doc_id"]]

        # restart, nothing new: no re-appends, no changes
        _run_crawl(spark, watch, ckpt, table)
        assert spark.table(table).count() == len(expected(2))

        # post-restart batch: dedups against the ORIGINAL state
        _write(watch, "b3.json", batches[2])
        _run_crawl(spark, watch, ckpt, table)
        got3 = {r["doc_id"] for r in spark.table(table).collect()}
        assert got3 == expected(3)
        assert 29 not in got3 and 26 in got3
    finally:
        for t in (table, f"{table}_fingerprints"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
