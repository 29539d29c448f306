"""Streaming deduplication — continuous collection + the dedup family
composed (the north-star combination: Structured Streaming ingest feeding
a training-data pipeline).

``dedup_stream`` ingests files continuously and appends only
never-seen-before documents to the target table, tracking content
fingerprints in a state table via ``foreachBatch``:

- per batch: fingerprint (md5 of normalized text) → drop in-batch dups
  (keep lowest id) → left-anti join against the persistent fingerprint
  state → append survivors to the data table AND their fingerprints to
  the state table.
- the state table is a plain warehouse table partition-pruned by
  fingerprint prefix, so the anti-join shuffles only the (tiny)
  fingerprint column, never the documents.
- delivery semantics: batch replay after a clean failure is idempotent —
  replayed rows anti-join against their own committed fingerprints and
  drop out. The data and fingerprint appends are two separate
  (non-atomic) commits, so a crash landing BETWEEN them degrades that
  batch to at-least-once (data committed, fingerprints not → replay
  re-appends). Data-before-fingerprints is the safe order: the reverse
  would silently LOSE documents on replay. A transactional table format
  (single multi-table commit) is the upgrade path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from logverzcore_spark.operators.text import fingerprint_md5


def _dedup_batch(
    batch: DataFrame,
    spark: SparkSession,
    target_table: str,
    state_table: str,
    text_col: str,
    id_col: str,
) -> None:
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    in_batch = (
        batch.withColumn("_fp", fingerprint_md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if spark.catalog.tableExists(state_table):
        seen = spark.table(state_table)
        fresh = in_batch.join(
            seen.hint("shuffle_hash"), in_batch["_fp"] == seen["fp"], "left_anti"
        )
    else:
        fresh = in_batch
    fresh.persist()
    try:
        fresh.drop("_fp").write.mode("append").saveAsTable(target_table)
        fresh.select(F.col("_fp").alias("fp")).write.mode("append").saveAsTable(state_table)
    finally:
        fresh.unpersist()
    # The appends ran on the cloned micro-batch session; the outer
    # session's cached file listings for both tables are now stale. Left
    # unrefreshed, the NEXT batch's anti-join reads an old fingerprint
    # snapshot and lets duplicates through (observed), and callers see
    # pre-batch row counts.
    spark.catalog.refreshTable(target_table)
    spark.catalog.refreshTable(state_table)


def dedup_stream(
    spark: SparkSession,
    path: str,
    schema,
    target_table: str,
    state_table: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "json",
    reader_options: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 10,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously ingest documents, writing only first-seen content."""
    import os
    import tempfile
    import uuid

    state_table = state_table or f"{target_table}_fingerprints"
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.option("maxFilesPerTrigger", str(max_files_per_trigger)).load(path)
    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lvz_dd_{uuid.uuid4().hex[:8]}"
    )
    writer = (
        stream.writeStream.option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda batch, _id: _dedup_batch(
                batch, spark, target_table, state_table, text_col, id_col
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curate_stream(
    spark: SparkSession,
    source_stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    state_table: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 1000,
    min_stopword_ratio: float = 0.05,
    max_repetition_ratio: float = 0.6,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming curation: the quality gate (pipeline.curate's rules —
    per-row projections, so they run ON the stream before any state) in
    front of the fingerprint-state dedup fold. A crawler feeding this
    continuously maintains a quality-filtered, exactly-deduped corpus —
    the streaming form of ``pipeline.curate``'s first two stages
    (fuzzy-dedup's streaming form is ``stream_neardup``; chain the two
    target tables to get all three).

    Committed results equal the batch pipeline over the same files
    (suite:st16 hash-verifies the equivalence), because the quality
    predicate is per-row (batch boundaries can't change it) and the
    dedup keep-first rule is id-ordered, not arrival-ordered, within a
    batch — across batches, first-committed wins, which equals min-id
    when ids arrive in order."""
    from logverzcore_spark.operators import text as textops

    state_table = state_table or f"{target_table}_fingerprints"
    c = F.col(text_col)
    # Same 4-dp-rounded thresholds as text_profile/t02 — the batch
    # pipeline and its SQL oracle gate on the rounded values.
    gated = source_stream.where(
        textops.token_count(c).between(min_tokens, max_tokens)
        & (F.round(textops.stopword_ratio(c), 4) >= min_stopword_ratio)
        & (F.round(textops.repetition_ratio(c), 4) <= max_repetition_ratio)
    )
    writer = gated.writeStream.option("checkpointLocation", checkpoint_dir).foreachBatch(
        lambda batch, _id: _dedup_batch(
            batch, spark, target_table, state_table, text_col, id_col
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _full_curation_batch(
    batch: DataFrame,
    spark: SparkSession,
    target_table: str,
    fp_table: str,
    bucket_table: str,
    set_table: str,
    threshold: float,
    num_hashes: int,
    bands: int,
    n: int,
    text_col: str,
    id_col: str,
    finalize,
) -> None:
    """One micro-batch of the FULL curation cascade (see
    ``full_curation_stream``). Stage order and state contents are
    chosen so the maintained corpus equals the batch
    ``pipeline.curate`` chain over everything seen:

    - exact dedup state (``fp_table``) records EVERY exact-stage
      survivor's fingerprint — including docs the near-dup stage then
      drops — because batch keep-first picks min-id per fingerprint
      among QUALITY survivors, so a later same-text doc must still
      lose to a near-dup-dropped predecessor.
    - LSH state (``bucket_table``/``set_table``) likewise records
      every exact-stage survivor, because the batch fuzzy rule drops
      the higher id of EVERY verified pair — a doc that was itself
      dropped still drops its later near-duplicates (the A<B<C chain:
      B loses to A, C loses to B). Admitted-only state (the
      ``stream_neardup`` greedy contract) would admit C.
    """
    from logverzcore_spark.operators.dedup import (
        _BROADCAST_VERIFY_MAX_PAIRS,
        minhash_band_buckets,
        minhash_pairs_from_sig,
        minhash_signature_sets,
    )

    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    in_batch = (
        batch.withColumn("_fp", fingerprint_md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if spark.catalog.tableExists(fp_table):
        seen = spark.table(fp_table)
        fresh = in_batch.join(
            seen.hint("shuffle_hash"), in_batch["_fp"] == seen["fp"], "left_anti"
        )
    else:
        fresh = in_batch
    fresh = fresh.persist()
    fresh_n = fresh.count()
    try:
        # ONE signature/set pass per trigger (r13): the persisted sig
        # frame feeds the LSH state tables AND the in-batch pair
        # pipeline (minhash_pairs_from_sig), so the batch text is
        # tokenized/shingled exactly once — it used to run three times
        # (state sig + the pair pipeline's own sig + its verify rebuild),
        # at one full pipeline's wall cost per micro-batch.
        sig = minhash_signature_sets(
            fresh, num_hashes=num_hashes, n=n, text_col=text_col, id_col=id_col
        )
        try:
            # in-batch near-dups: every verified pair's higher id loses.
            # Verify-broadcast guard (r14, VERDICT task 5) at zero
            # per-trigger cost: melt rows are at most
            # fresh_n*(fresh_n-1) (every unordered pair, twice), so
            # when that WORST CASE fits the broadcast ceiling the
            # strategy is decided from the already-paid batch count;
            # a batch too big for the proof takes the shuffle join
            # outright — its micro-batch-sized exchanges cost about
            # what the measuring count job would, without ever risking
            # the driver-collect abort an unconditional broadcast
            # carried here before r14.
            bounded = fresh_n * (fresh_n - 1) <= _BROADCAST_VERIFY_MAX_PAIRS
            pairs = minhash_pairs_from_sig(
                sig, threshold=threshold, num_hashes=num_hashes, bands=bands,
                broadcast_verify=bounded,
            )
            losers = pairs.select(F.col("id2").alias(id_col)).distinct()
            buckets = minhash_band_buckets(
                sig, num_hashes=num_hashes, bands=bands
            )
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
                new_sets = sig.select(
                    F.col("doc_id").alias("new_id"), F.col("hset").alias("hs_new")
                )
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
                losers = losers.unionByName(dup_new).distinct()
            admitted = fresh.join(losers, id_col, "left_anti").drop("_fp")
            out = finalize(admitted) if finalize is not None else admitted
            # Commit: data first, then state (module-docstring ordering —
            # a crash between the appends degrades to at-least-once,
            # never loses a document).
            out.write.mode("append").saveAsTable(target_table)
            # The three state appends are mutually independent (all
            # read the two persisted frames, none reads another's
            # table) and each is a small job with an idle tail —
            # overlap them from a thread pool (guide §2.6) so the
            # trigger pays max() instead of sum() of their walls
            # (measured r14: 0.63 s sequential → ~0.3 s). Crash
            # semantics are unchanged: they still all run AFTER the
            # data append, and the replay contract never depended on
            # an ordering among the three (state reads are
            # distinct-protected; a partial subset replays to
            # at-least-once exactly as a partial prefix did).
            from concurrent.futures import ThreadPoolExecutor

            def _save(args) -> None:
                frame, table = args
                frame.write.mode("append").saveAsTable(table)

            with ThreadPoolExecutor(max_workers=3) as pool:
                list(pool.map(_save, [
                    (fresh.select(F.col("_fp").alias("fp")), fp_table),
                    (buckets.select("band", "bucket", "doc_id"), bucket_table),
                    (sig.select("doc_id", "hset"), set_table),
                ]))
        finally:
            sig.unpersist()
    finally:
        fresh.unpersist()
    for t in (target_table, fp_table, bucket_table, set_table):
        spark.catalog.refreshTable(t)


def full_curation_stream(
    spark: SparkSession,
    source_stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 1000,
    min_stopword_ratio: float = 0.05,
    max_repetition_ratio: float = 0.6,
    neardup_threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    finalize=None,
    available_now: bool = True,
) -> StreamingQuery:
    """The FULL streaming curation cascade — quality gate + exact dedup
    + MinHash-LSH near-dup suppression (+ an optional ``finalize``
    projection, e.g. the PII scrub) in ONE ``foreachBatch`` pipeline:
    ``curate_stream``'s two stages composed with ``stream_neardup``'s
    LSH state, maintained continuously. The committed table equals the
    batch ``pipeline.curate`` chain (quality → exact keep-first →
    fuzzy drop-every-pair's-higher-id) over the same files, which
    suite st22 hash-verifies; the equivalence needs ids to arrive in
    order across batches (same contract as ``curate_stream``) and
    holds across batch boundaries because both state tables record
    every EXACT-stage survivor, not just admitted docs — see
    ``_full_curation_batch`` for why.

    ``finalize(df) -> df`` runs per batch on the admitted docs only
    (per-row projections — keep it stateless); its output schema is
    the target table's schema. State tables: ``{target}_fingerprints``,
    ``{target}_lsh_buckets``, ``{target}_lsh_sets``."""
    from logverzcore_spark.operators import text as textops

    c = F.col(text_col)
    gated = source_stream.where(
        textops.token_count(c).between(min_tokens, max_tokens)
        & (F.round(textops.stopword_ratio(c), 4) >= min_stopword_ratio)
        & (F.round(textops.repetition_ratio(c), 4) <= max_repetition_ratio)
    )
    writer = gated.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(
        lambda batch, _id: _full_curation_batch(
            batch, spark, target_table,
            f"{target_table}_fingerprints",
            f"{target_table}_lsh_buckets",
            f"{target_table}_lsh_sets",
            neardup_threshold, num_hashes, bands, shingle_n,
            text_col, id_col, finalize,
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def crawl_curate_stream(
    spark: SparkSession,
    warc_stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    state_table: str | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming crawl INGESTION end-to-end (r9: the m30 cascade with
    the container front-end ON-STREAM): WARC files arrive as a stream
    of (id, payload bytes) — e.g. ``collect_stream`` over a crawler's
    drop directory with ``binaryFile`` — and every micro-batch runs
    ``pipeline.crawl_curate`` (HTTP extract → HTML strip → NFC scrub →
    re-line → C4; all per-row, so batch boundaries cannot change any
    of it) before folding into the SAME cross-batch fingerprint-state
    exact dedup as ``dedup_stream`` (st16's state discipline:
    in-batch keep-first by id, anti-join against committed
    fingerprints, data-before-state commit order — replay after a
    clean failure is idempotent, a crash between the two appends
    degrades to at-least-once, never loses a page).

    The committed table therefore equals m30's BATCH cascade +
    ``dedup_keep_first`` over everything seen (suite st36
    hash-verifies against m30's own exhaustive oracle), under the
    family's arrival-order contract: first-committed wins across
    batches, which equals batch min-id when ids arrive in order
    (``curate_stream``'s documented contract; cross-batch dup drops
    and restart idempotence are pytest-covered with out-of-order
    fixtures in test_streaming.py).

    Target rows: (doc_id, text) — the curated corpus itself; suite
    st36 projects m30's report shape (fp = md5(text), n_chars) from it
    at read time."""
    from logverzcore_spark.pipeline import crawl_curate

    def one_batch(batch: DataFrame, _id: int) -> None:
        kept = crawl_curate(batch, id_col=id_col, payload_col=payload_col)
        _dedup_batch(
            kept, spark, target_table,
            state_table or f"{target_table}_fingerprints",
            "text", "doc_id",
        )

    writer = warc_stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(one_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _bloom_dedup_batch(
    batch: DataFrame,
    spark: SparkSession,
    target_table: str,
    state_table: str,
    corpus_fps_table: str,
    bloom: dict,
    text_col: str,
    id_col: str,
) -> None:
    from logverzcore_spark.operators.dedup import bloom_maybe_contains

    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    in_batch = (
        batch.withColumn("_fp", fingerprint_md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    maybe = bloom_maybe_contains(bloom, F.col("_fp"))
    definite = in_batch.where(~maybe)
    suspects = in_batch.where(maybe)
    if spark.catalog.tableExists(corpus_fps_table):
        corpus = spark.table(corpus_fps_table)
        suspects = suspects.join(
            corpus.hint("shuffle_hash"), suspects["_fp"] == corpus["fp"], "left_anti"
        )
    fresh = definite.unionByName(suspects)
    if spark.catalog.tableExists(state_table):
        seen = spark.table(state_table)
        fresh = fresh.join(
            seen.hint("shuffle_hash"), fresh["_fp"] == seen["fp"], "left_anti"
        )
    fresh.persist()
    try:
        fresh.drop("_fp").write.mode("append").saveAsTable(target_table)
        fresh.select(F.col("_fp").alias("fp")).write.mode("append").saveAsTable(
            state_table
        )
    finally:
        fresh.unpersist()
    # Same stale-listing hazard as _dedup_batch: the appends ran on the
    # cloned micro-batch session.
    spark.catalog.refreshTable(target_table)
    spark.catalog.refreshTable(state_table)


def bloom_dedup_stream(
    spark: SparkSession,
    source_stream: DataFrame,
    target_table: str,
    corpus_fps_table: str,
    bloom: dict,
    checkpoint_dir: str,
    state_table: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
) -> StreamingQuery:
    """``dedup_stream`` for the corpus size where the accumulated
    fingerprint set can't be the anti-join's build side every batch:
    the CORPUS tier is a persisted Bloom artifact (built once per epoch
    by ``dedup.build_fp_bloom``), so each micro-batch splits on a pure
    codegen probe — bloom-NEGATIVE rows (the overwhelming majority of a
    fresh crawl) never touch the corpus fingerprint table at all, and
    only the positive sliver pays the exact confirming anti-join. The
    small per-STREAM state table (fingerprints this stream admitted)
    still anti-joins every batch — it is bounded by what the stream
    itself wrote, not by the corpus.

    Correctness is d20's argument lifted to batches: the bloom has no
    false negatives, false positives are removed by the exact join, so
    the committed table equals batch ``incremental_dedup`` over the same
    files (suite:st26 hash-verifies). Replay idempotence and the
    data-before-fingerprints commit order are ``dedup_stream``'s."""
    state_table = state_table or f"{target_table}_fingerprints"
    writer = source_stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(
        lambda batch, _id: _bloom_dedup_batch(
            batch, spark, target_table, state_table,
            corpus_fps_table, bloom, text_col, id_col,
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _frontier_batch(
    batch: DataFrame,
    spark: SparkSession,
    target_table: str,
    state_table: str,
    url_col: str,
    id_col: str,
) -> None:
    from logverzcore_spark.operators.text import normalize_url

    canon = (
        batch.withColumn(
            "_canon", normalize_url(F.col(url_col)).getField("url_canon")
        )
        .where(F.col("_canon").isNotNull())  # unparseable never enters the frontier
    )
    w = Window.partitionBy("_canon").orderBy(F.col(id_col))
    in_batch = (
        canon.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if spark.catalog.tableExists(state_table):
        seen = spark.table(state_table)
        fresh = in_batch.join(
            seen.hint("shuffle_hash"),
            in_batch["_canon"] == seen["canon_url"],
            "left_anti",
        )
    else:
        fresh = in_batch
    fresh.persist()
    try:
        fresh.withColumnRenamed("_canon", "canon_url").write.mode(
            "append"
        ).saveAsTable(target_table)
        fresh.select(F.col("_canon").alias("canon_url")).write.mode(
            "append"
        ).saveAsTable(state_table)
    finally:
        fresh.unpersist()
    spark.catalog.refreshTable(target_table)
    spark.catalog.refreshTable(state_table)


def url_frontier_stream(
    spark: SparkSession,
    source_stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    state_table: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming crawl-frontier dedup on the CANONICAL URL
    (text.normalize_url's url_canon key): per micro-batch, canonicalize, drop
    unparseable, keep the lowest-id first sighting per canonical key
    within the batch, anti-join the persistent frontier state, append
    survivors — so the committed table is "one row per page ever
    enqueued", with utm/gclid variants, fragments, param re-orders and
    case noise collapsing BEFORE a fetch is spent on them (the t63 rule
    set, lifted to continuous collection). Same state/commit/replay
    discipline as ``dedup_stream``: canonical keys partition-prunable,
    data-before-state commit order, replayed batches anti-join their
    own committed keys and no-op."""
    state_table = state_table or f"{target_table}_frontier_keys"
    writer = source_stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(
        lambda batch, _id: _frontier_batch(
            batch, spark, target_table, state_table, url_col, id_col
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
