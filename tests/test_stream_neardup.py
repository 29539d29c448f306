"""Streaming near-dup suppression (MinHash+LSH state + exact verify)."""

import json
import os

from pyspark.sql import types as T

from logverzcore_spark.streaming.stream_neardup import neardup_stream

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

# 20 tokens: one swapped token perturbs 3 of 18 3-gram shingles →
# Jaccard 15/21 ≈ 0.714 ≥ the 0.7 default threshold.
_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
_NEAR1 = _BASE.replace("tango", "zulu")  # near-dup via last token
_NEAR2 = _BASE.replace("juliet", "yankee")  # near-dup via middle token
_OTHER = "one two three four five six seven eight nine ten"
_NOVEL = "red orange yellow green blue indigo violet pink brown black"


def _write_docs(path: str, name: str, docs: list[tuple[int, str]]) -> None:
    with open(os.path.join(path, name), "w") as fh:
        for i, txt in docs:
            fh.write(json.dumps({"doc_id": i, "text": txt}) + "\n")


def test_neardup_stream_suppresses_across_batches(spark, tmpdir_path):
    watch = os.path.join(tmpdir_path, "nd_docs")
    os.makedirs(watch)
    ckpt = os.path.join(tmpdir_path, "nd_ckpt")
    tables = ("nd_docs", "nd_docs_lsh_buckets", "nd_docs_lsh_sets")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    # Batch 1: ids 1/2 are near-dups of each other (not exact — the
    # exact-fingerprint stream would keep both), id 3 unrelated.
    _write_docs(watch, "b1.json", [(1, _BASE), (2, _NEAR1), (3, _OTHER)])
    q = neardup_stream(spark, watch, DOC_SCHEMA, "nd_docs", checkpoint_dir=ckpt)
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.table("nd_docs").collect()}
    assert got == {1, 3}  # greedy keep-first drops the higher id

    # Batch 2: id 10 is a near-dup of COMMITTED doc 1 (different edit
    # than doc 2's), id 11 novel.
    _write_docs(watch, "b2.json", [(10, _NEAR2), (11, _NOVEL)])
    q = neardup_stream(spark, watch, DOC_SCHEMA, "nd_docs", checkpoint_dir=ckpt)
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.table("nd_docs").collect()}
    assert got == {1, 3, 11}

    # State: 16 bucket rows + 1 hash set per committed doc.
    assert spark.table("nd_docs_lsh_sets").count() == 3
    assert spark.table("nd_docs_lsh_buckets").count() == 3 * 16

    # Restart with nothing new: idempotent.
    q = neardup_stream(spark, watch, DOC_SCHEMA, "nd_docs", checkpoint_dir=ckpt)
    q.awaitTermination()
    assert spark.table("nd_docs").count() == 3
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_neardup_stream_crash_between_appends(spark, monkeypatch):
    """Crash injected between the data append and the LSH-state appends
    (the documented non-atomic window): replay loses no document and
    duplicates stay bounded to the failed batch; post-recovery batches
    suppress against the repaired state."""
    import pytest
    from pyspark.sql import readwriter as rw

    from logverzcore_spark.streaming import stream_neardup

    tables = ("cwn_docs", "cwn_b", "cwn_s")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    def run_batch(rows):
        b = spark.createDataFrame(rows, "doc_id long, text string")
        stream_neardup._neardup_batch(
            b, spark, "cwn_docs", "cwn_b", "cwn_s", 0.7, 32, 16, 3, "text", "doc_id"
        )

    try:
        run_batch([(1, _BASE), (2, _OTHER)])
        assert spark.table("cwn_docs").count() == 2

        orig = rw.DataFrameWriter.saveAsTable

        def crashing(self, name, *a, **kw):
            if name == "cwn_b":
                raise RuntimeError("injected crash between appends")
            return orig(self, name, *a, **kw)

        monkeypatch.setattr(rw.DataFrameWriter, "saveAsTable", crashing)
        with pytest.raises(RuntimeError):
            run_batch([(3, _NOVEL)])
        monkeypatch.undo()

        # Data committed, state not.
        for t in tables:
            spark.catalog.refreshTable(t)
        assert sorted(r["doc_id"] for r in spark.table("cwn_docs").collect()) == [1, 2, 3]
        assert spark.table("cwn_s").count() == 2

        # Replay: doc 3 re-appends (at-least-once, bounded to the failed
        # batch) and its state commits this time.
        run_batch([(3, _NOVEL)])
        assert sorted(r["doc_id"] for r in spark.table("cwn_docs").collect()) == [1, 2, 3, 3]
        assert spark.table("cwn_s").count() == 3

        # Post-recovery: a near-dup of doc 1 is suppressed by the
        # repaired state — duplicates never spread past the crashed batch.
        run_batch([(9, _NEAR2)])
        assert sorted(r["doc_id"] for r in spark.table("cwn_docs").collect()) == [1, 2, 3, 3]
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
