"""Streaming NEAR-duplicate suppression — MinHash+LSH composed with
continuous collection (the near-dup upgrade of stream_dedup's exact
fingerprints; reference analog: the continuous-collection path of
collection.js feeding the dedup stage a training pipeline would run).

``neardup_stream`` appends only documents that are near-duplicates of
nothing already written, tracking LSH state in two warehouse tables:

- ``<target>_lsh_buckets`` (band, bucket, doc_id): the LSH index rows of
  every committed document. New docs join this on (band, bucket) — the
  candidate probe is an equi-join against a corpus-sized but narrow
  index, never a scan of the documents.
- ``<target>_lsh_sets``    (doc_id, hset): distinct shingle-hash sets for
  exact-Jaccard verification of candidates, so band collisions (the LSH
  false-positive class) never drop a genuinely novel document. Only
  candidate ids' sets are ever joined — the array column stays out of
  every non-candidate path (and is hinted shuffle_hash, never broadcast).

Per micro-batch:
1. in-batch near-dup dedup: ``minhash_lsh_pairs`` on the batch alone,
   greedy keep-first (drop every pair's higher id — transitive chains
   collapse toward the lowest id, same contract as the batch suite's
   keep-one-per-cluster with greedy instead of full CC, which a
   micro-batch's size justifies).
2. signature/hset pass over the survivors (ONE shuffle —
   ``minhash_signature_sets``, same hashing as the batch operator, so
   stream and batch buckets are interoperable).
3. candidate probe against the bucket table, exact-Jaccard verify
   against the set table; verified matches drop the NEW doc.
4. append: fresh docs → target, their bucket rows + hash sets → state.
   Data-before-state ordering: a crash between the two appends degrades
   to at-least-once (replay re-verifies against committed state and the
   batch's own docs re-drop via their committed fingerprint rows ONLY if
   state landed — so the non-atomic window can admit a near-dup of the
   crashed batch, never lose a document). A transactional table format
   is the upgrade path, exactly as documented for stream_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from logverzcore_spark.operators.dedup import (
    minhash_band_buckets,
    minhash_lsh_pairs,
    minhash_signature_sets,
)


def _neardup_batch(
    batch: DataFrame,
    spark: SparkSession,
    target_table: str,
    bucket_table: str,
    set_table: str,
    threshold: float,
    num_hashes: int,
    bands: int,
    n: int,
    text_col: str,
    id_col: str,
) -> None:
    # 1. In-batch near-dups: drop the higher id of every verified pair.
    pairs = minhash_lsh_pairs(
        batch,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        n=n,
        text_col=text_col,
        id_col=id_col,
    )
    losers = pairs.select(F.col("id2").alias(id_col)).distinct()
    survivors = batch.join(losers, id_col, "left_anti")

    # 2. One signature+set pass over the survivors.
    sig = minhash_signature_sets(
        survivors, num_hashes=num_hashes, n=n, text_col=text_col, id_col=id_col
    )
    try:
        buckets = minhash_band_buckets(sig, num_hashes=num_hashes, bands=bands)

        # 3. Probe committed state: equi-join on (band, bucket), then
        # exact-Jaccard verify on the hash sets.
        if spark.catalog.tableExists(bucket_table):
            state_b = spark.table(bucket_table)
            cand = (
                buckets.join(
                    state_b.hint("shuffle_hash"),
                    (buckets["band"] == state_b["band"])
                    & (buckets["bucket"] == state_b["bucket"]),
                )
                .select(
                    buckets["doc_id"].alias("new_id"),
                    state_b["doc_id"].alias("old_id"),
                )
                .distinct()
            )
            new_sets = sig.select(F.col("doc_id").alias("new_id"), F.col("hset").alias("hs_new"))
            old_sets = spark.table(set_table).select(
                F.col("doc_id").alias("old_id"), F.col("hset").alias("hs_old")
            )
            inter = F.size(F.array_intersect("hs_new", "hs_old"))
            union = F.size(F.array_union("hs_new", "hs_old"))
            dup_new = (
                cand.join(new_sets.hint("shuffle_hash"), "new_id")
                .join(old_sets.hint("shuffle_hash"), "old_id")
                .where(F.round(inter / union, 4) >= threshold)
                .select(F.col("new_id").alias(id_col))
                .distinct()
            )
            fresh_ids = sig.select(F.col("doc_id").alias(id_col)).join(
                dup_new, id_col, "left_anti"
            )
        else:
            fresh_ids = sig.select(F.col("doc_id").alias(id_col))

        fresh_ids = fresh_ids.persist()
        fresh_ids.count()

        # 4. Commit: data first, then state (see module docstring).
        survivors.join(fresh_ids, id_col).write.mode("append").saveAsTable(target_table)
        buckets.join(
            fresh_ids.withColumnRenamed(id_col, "doc_id"), "doc_id"
        ).select("band", "bucket", "doc_id").write.mode("append").saveAsTable(bucket_table)
        sig.select("doc_id", "hset").join(
            fresh_ids.withColumnRenamed(id_col, "doc_id"), "doc_id"
        ).write.mode("append").saveAsTable(set_table)
        fresh_ids.unpersist()
    finally:
        sig.unpersist()
    # The appends ran on the cloned micro-batch session; refresh the outer
    # session's file listings or the next batch probes a stale snapshot.
    for t in (target_table, bucket_table, set_table):
        spark.catalog.refreshTable(t)


def neardup_stream(
    spark: SparkSession,
    path: str,
    schema,
    target_table: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "json",
    reader_options: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 10,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously ingest documents, suppressing near-duplicates of
    anything already committed (MinHash+LSH candidates, exact-Jaccard
    verified). State tables: ``<target>_lsh_buckets`` / ``<target>_lsh_sets``."""
    import os
    import tempfile
    import uuid

    bucket_table = f"{target_table}_lsh_buckets"
    set_table = f"{target_table}_lsh_sets"
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.option("maxFilesPerTrigger", str(max_files_per_trigger)).load(path)
    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_nd_{uuid.uuid4().hex[:8]}"
    )
    writer = stream.writeStream.option("checkpointLocation", checkpoint).foreachBatch(
        lambda b, _id: _neardup_batch(
            b,
            spark,
            target_table,
            bucket_table,
            set_table,
            threshold,
            num_hashes,
            bands,
            n,
            text_col,
            id_col,
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
