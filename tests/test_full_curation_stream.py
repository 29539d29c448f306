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
