"""Incremental aggregate maintenance over snapshot tables (delta-cost
materialized views).

``Engine.materialize_saved`` + ``refresh_materialized`` give the repo
refresh-by-recompute: correct, but a 100 TB source makes every refresh a
100 TB scan even when the day's delta is 100 GB. This module maintains a
groupBy aggregate INCREMENTALLY against a :class:`SnapshotTable` source:

- refresh cost ∝ (delta files since the last refresh) + (current group
  count) — never the corpus. The delta comes from
  ``SnapshotTable.read_incremental`` (manifest file-list difference, no
  content diff), exactly the read an append-only ingest produces.
- the maintained state is PARTIAL aggregates (count / sum / min / max;
  avg as sum+count; approx-distinct as a mergeable HLL sketch via
  Spark's native ``hll_sketch_agg`` / ``hll_union_agg``), merged with
  each delta's partials in one shuffle of ``groups + delta`` rows.
  Partials compose under union — the same algebra Spark's own
  map-side combine uses, lifted one level to survive across jobs.
- the state is ITSELF a SnapshotTable, so refreshes are atomic,
  versioned, concurrency-safe commits tagged with the source version
  they reflect: a crashed refresh re-runs idempotently (same tag →
  no-op), concurrent refreshers collide on the commit lock instead of
  corrupting state, and ``result()`` always reads a consistent version.
- a source OVERWRITE (compaction, correction) is detected by
  ``read_incremental``'s span refusal and answered with a full rebuild
  — overwrites invalidate deltas by definition; silently merging one
  would double-count.

- a source OVERWRITE no longer always means a rebuild (r11): when every
  aggregate is RETRACTABLE (count / sum / avg — signed partials fold
  both ways) the refresh consumes the CHANGE DATA FEED instead
  (``SnapshotTable.read_changes``): deletes and update pre-images fold
  with sign −1, inserts and post-images with +1, and groups whose
  row-presence counter reaches zero drop out. Cost = the span's
  removed+added files (the DML slice), never the corpus — a GDPR
  delete against a 100 TB source costs the MV a few files, not a
  rescan.

- the fold is COST-GATED (r12): before consuming the feed, the span is
  priced from manifest stats alone (zero I/O) — the sum of every
  spanned commit's removed+added rows versus the head's total (bytes
  when row stats are absent; rows lead because parquet's per-file
  overhead distorts byte pricing exactly in the small-file regime DML
  rewrites produce).
  A full ``overwrite()`` commit makes the CDF diff read ~2× the corpus
  where a rebuild is one scan; the gate detects exactly that shape and
  picks the rebuild, reporting both priced numbers in the refresh row.

- non-retractable aggregates (min / max / approx_distinct — a deleted
  maximum needs the runner-up; an HLL cannot forget) no longer always
  rebuild either (r12): a DML span's affected GROUPS are exactly the
  change feed's groups, so the refresh RE-COMPUTES those groups only
  (``source.read(where=group-key in-list)`` — file-pruned by stats
  when the layout clusters groups) and carries every untouched group's
  state row unchanged: mode 'repair', cost = the DML slice + the
  affected groups' source rows. Corpus-sized spans, NULL group keys
  (an in-list cannot address them), affected-group counts past the
  bounded-metadata cap, and layouts that do NOT cluster the group key
  (the priced rescan ≈ the corpus — a rebuild reads the same bytes
  without the feed or the anti-join) fall back to the rebuild.

Non-goals, stated loudly: distinct-exact and order-dependent aggregates
(percentiles, first/last) are not incrementally mergeable from these
partials and are rejected at spec time — use the sketch family
(KLL/theta in suite/sketches.py) or a full recompute.

100 TB shape: state row count == group cardinality (dashboard-scale in
every real MV); the merge shuffle carries groups+delta, the delta scan
is the only data I/O, and nothing ever re-reads committed history.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logverzcore_spark.snapshots import SnapshotTable

__all__ = ["IncrementalAggregate"]

#: aggregate name -> (n partial columns) — the mergeable algebra.
_SUPPORTED = {"count", "sum", "min", "max", "avg", "approx_distinct"}

#: the sub-algebra that also RETRACTS: signed partials fold deletions.
#: min/max need the evicted value's runner-up; HLL cannot forget.
_RETRACTABLE = {"count", "sum", "avg"}

_TAG_PREFIX = "srcv:"

#: hidden per-group row-presence counter: lets a fold DROP a group
#: whose last row was deleted (a recompute would not emit it at all).
_NROWS = "__p__n"

#: driver-side cap on repair's affected-group key list — bounded
#: metadata, mirroring merge_into's 10k exact-key prune cap.
_REPAIR_MAX_GROUPS = 10_000


def _partial_cols(alias: str, kind: str) -> list[str]:
    if kind in ("avg", "sum"):
        # sum ALSO carries a non-null count: SUM over a group whose
        # every non-null value was retracted must finalize to NULL
        # (SQL), not the folded 0
        return [f"__p_{alias}__sum", f"__p_{alias}__cnt"]
    return [f"__p_{alias}"]


class IncrementalAggregate:
    """A maintained ``source.groupBy(keys).agg(...)``.

    ``aggregates`` maps output alias -> (kind, column), where kind is
    one of count / sum / min / max / avg / approx_distinct and column
    is the source column name (ignored for count; count counts rows).
    ``where`` (optree shape) filters source rows before aggregation —
    the delta read applies it too, so a selective MV only pays for
    matching rows.

    ``fold_cost_factor`` tunes the overwrite-span admission gate:
    fold/repair consume the change feed only while the span's
    removed+added rows (manifest-priced, zero I/O; bytes when row
    stats are absent) stay within ``factor × head`` — past that a
    rebuild reads strictly less.
    The default 1.0 is the break-even: the CDF diff reads both sides
    of every spanned rewrite, so a replace-the-corpus commit prices at
    ~2× head and correctly rebuilds. ``None`` disables the gate
    (always fold/repair when the algebra allows — the r11 behavior)."""

    def __init__(
        self,
        source: SnapshotTable,
        state_root: str,
        group_keys: list[str],
        aggregates: dict[str, tuple[str, str | None]],
        where: Any = None,
        source_keys: list[str] | None = None,
        fold_cost_factor: float | None = 1.0,
        state_keep_last: int | None = None,
    ):
        for alias, (kind, _col) in aggregates.items():
            if kind not in _SUPPORTED:
                raise ValueError(
                    f"aggregate {alias}={kind!r} is not incrementally "
                    f"mergeable; supported: {sorted(_SUPPORTED)}"
                )
        self.source = source
        self.state = SnapshotTable(state_root)
        self.group_keys = list(group_keys)
        self.aggregates = dict(aggregates)
        self.where = where
        #: the source table's logical key, if it has one — sharpens the
        #: fold path's change feed (keyed pre/post images instead of
        #: the keyless delete+insert multiset diff; same fold result,
        #: join instead of exceptAll)
        self.source_keys = list(source_keys) if source_keys else None
        self.fold_cost_factor = fold_cost_factor
        #: opt-in retention on the STATE table: an always-refreshing MV
        #: commits one state version per refresh forever (a year of
        #: hourly refreshes = 8760 manifests + tiny data dirs); with
        #: state_keep_last=N each successful refresh vacuums the state
        #: to its newest N versions (the head is never dropped; the
        #: srcv tag history lives in the head manifest, so replay
        #: idempotence survives — the same contract as stream vacuums).
        #: None (default) keeps full state history (MV time travel).
        self.state_keep_last = state_keep_last

    # -- partial/merge/final algebra -----------------------------------

    def _partial(self, df: DataFrame) -> DataFrame:
        """Source rows -> one partial row per group (map-side-combine
        semantics across jobs)."""
        if self.where is not None:
            from logverzcore_spark.operators.optree import compile_where

            df = df.filter(compile_where(self.where))
        aggs = []
        for alias, (kind, col) in self.aggregates.items():
            c = F.col(f"`{col}`") if col else None
            p = _partial_cols(alias, kind)
            if kind == "count":
                aggs.append(F.count(F.lit(1)).alias(p[0]))
            elif kind in ("sum", "avg"):
                aggs.append(F.sum(c).alias(p[0]))
                aggs.append(F.count(c).alias(p[1]))
            elif kind == "min":
                aggs.append(F.min(c).alias(p[0]))
            elif kind == "max":
                aggs.append(F.max(c).alias(p[0]))
            elif kind == "approx_distinct":
                aggs.append(F.hll_sketch_agg(c).alias(p[0]))
        aggs.append(F.count(F.lit(1)).alias(_NROWS))
        return df.groupBy(*[F.col(f"`{k}`") for k in self.group_keys]).agg(*aggs)

    def _partial_signed(self, df: DataFrame) -> DataFrame:
        """Change-feed rows (with a ``__sign`` column: +1 insert /
        update_postimage, −1 delete / update_preimage) -> one SIGNED
        partial row per group. Folding these into the state's partials
        with the ordinary sum-merge applies the retraction: a deleted
        row subtracts exactly what its insert once added. ``where``
        applies per image, so a row UPDATED into (out of) the MV's
        predicate folds as a pure add (remove) — only the surviving
        image passes the filter."""
        if self.where is not None:
            from logverzcore_spark.operators.optree import compile_where

            df = df.filter(compile_where(self.where))
        sign = F.col("__sign")
        aggs = []
        for alias, (kind, col) in self.aggregates.items():
            c = F.col(f"`{col}`") if col else None
            p = _partial_cols(alias, kind)
            if kind == "count":
                aggs.append(F.sum(sign).alias(p[0]))
            elif kind in ("sum", "avg"):
                aggs.append(F.sum(sign * c).alias(p[0]))
                aggs.append(
                    F.sum(
                        F.when(c.isNotNull(), sign).otherwise(F.lit(0))
                    ).alias(p[1])
                )
            else:  # non-retractable kinds never reach the fold path
                raise AssertionError(kind)
        aggs.append(F.sum(sign).alias(_NROWS))
        return df.groupBy(*[F.col(f"`{k}`") for k in self.group_keys]).agg(*aggs)

    def _merge(self, parts: DataFrame) -> DataFrame:
        """Union of partial rows -> one merged partial row per group."""
        aggs = []
        for alias, (kind, _col) in self.aggregates.items():
            p = _partial_cols(alias, kind)
            if kind == "count":
                aggs.append(F.sum(p[0]).alias(p[0]))
            elif kind == "min":
                aggs.append(F.min(p[0]).alias(p[0]))
            elif kind == "max":
                aggs.append(F.max(p[0]).alias(p[0]))
            elif kind in ("sum", "avg"):
                aggs.append(F.sum(p[0]).alias(p[0]))
                aggs.append(F.sum(p[1]).alias(p[1]))
            elif kind == "approx_distinct":
                aggs.append(F.hll_union_agg(p[0]).alias(p[0]))
        if _NROWS in parts.columns:
            aggs.append(F.sum(_NROWS).alias(_NROWS))
        return parts.groupBy(*[F.col(f"`{k}`") for k in self.group_keys]).agg(*aggs)

    def _finalize(self, state: DataFrame) -> DataFrame:
        cols = [F.col(f"`{k}`") for k in self.group_keys]
        for alias, (kind, _col) in self.aggregates.items():
            p = _partial_cols(alias, kind)
            if kind == "avg":
                # same guard as sum: a fold can retract every non-null
                # value while a NULL-valued row keeps the group alive
                # (_NROWS>0) — cnt==0 must finalize to NULL, not raise
                # DIVIDE_BY_ZERO under ANSI mode
                cols.append(
                    F.when(F.col(p[1]) > 0, F.col(p[0]) / F.col(p[1]))
                    .otherwise(F.lit(None))
                    .alias(alias)
                )
            elif kind == "sum":
                # SQL SUM of an all-null (or fully retracted) group is
                # NULL — the non-null count guards the folded 0
                cols.append(
                    F.when(F.col(p[1]) > 0, F.col(p[0]))
                    .otherwise(F.lit(None))
                    .alias(alias)
                )
            elif kind == "approx_distinct":
                cols.append(F.hll_sketch_estimate(p[0]).alias(alias))
            else:
                cols.append(F.col(p[0]).alias(alias))
        return state.select(*cols)

    # -- lifecycle ------------------------------------------------------


    def _commit_state(self, merged: DataFrame, tag: str) -> None:
        """One state commit + the opt-in retention sweep: with
        ``state_keep_last=N`` the state table never accumulates more
        than N versions (bounded manifests/dirs on an always-
        refreshing MV); default keeps full history (MV time travel)."""
        self.state.overwrite(merged, tag=tag)
        if self.state_keep_last is not None:
            self.state.vacuum(
                merged.sparkSession, keep_last=self.state_keep_last
            )

    def _last_source_version(self, spark: SparkSession) -> int | None:
        vs = self.state.versions(spark)
        if not vs:
            return None
        tag = self.state._read_manifest(spark, vs[-1]).get("tag") or ""
        if not tag.startswith(_TAG_PREFIX):
            return None
        return int(tag[len(_TAG_PREFIX):])

    def _span_cost(
        self, spark: SparkSession, last: int, src_head: int
    ) -> tuple[int | None, int | None, str | None]:
        """Price the change-feed span against a rebuild from manifest
        stats ALONE — zero data I/O, the same removed-vs-added file
        arithmetic ``read_changes`` performs, summed instead of read.
        Returns ``(span_cost, head_cost, unit)``: the ROWS (fallback:
        bytes, when any spanned file predates row stats) of every
        spanned commit's removed+added files vs the head's total;
        ``(None, None, None)`` when the span is unpriceable (stats
        disabled, or ``last`` no longer retained — the fold will refuse
        on retention anyway). Rows lead because they price the diff
        join's work scale-faithfully at EVERY table size — byte
        pricing is distorted by parquet's fixed per-file overhead
        exactly in the small-file regime where DML rewrites land (at
        large scale the two are proportional). Compact/analyze commits
        are skipped, matching the feed's row-preserving contract."""
        src = self.source
        vs = src.versions(spark)
        if last not in vs or src_head not in vs:
            return None, None, None
        span = [v for v in vs if last <= v <= src_head]
        prev_m = src._read_manifest(spark, span[0])
        prev_files = set(prev_m["files"])
        pairs: list[tuple[dict, str]] = []  # (manifest holding stats, path)
        for v in span[1:]:
            m = src._read_manifest(spark, v)
            cur = set(m["files"])
            if m.get("op") not in ("compact", "analyze"):
                pairs.extend((m, f) for f in cur - prev_files)
                pairs.extend((prev_m, f) for f in prev_files - cur)
            prev_files, prev_m = cur, m
        head_m = src._read_manifest(spark, src_head)

        def _total(ps):
            by = rows = 0
            ok_b = ok_r = True
            for m, f in ps:
                ent = (m.get("stats") or {}).get(f) or {}
                b, r = ent.get("bytes"), ent.get("rows")
                if b is None:
                    ok_b = False
                else:
                    by += b
                if r is None:
                    ok_r = False
                else:
                    rows += r
            return (by if ok_b else None), (rows if ok_r else None)

        span_b, span_r = _total(pairs)
        head_b, head_r = _total((head_m, f) for f in head_m["files"])
        if span_r is not None and head_r is not None:
            return span_r, head_r, "rows"
        if span_b is not None and head_b is not None:
            return span_b, head_b, "bytes"
        return None, None, None

    def _try_fold(self, spark: SparkSession, last: int, src_head: int,
                  tag: str) -> dict | None:
        """CDF-driven refresh across an overwrite (r11): consume
        ``read_changes`` and fold signed partials — deletes/update
        pre-images retract, inserts/post-images add, groups whose
        presence counter reaches zero drop. Cost = the span's
        removed+added files, never the corpus (the caller's cost gate
        guarantees that bound BEFORE any I/O). Returns None when not
        foldable — a non-retractable aggregate (min/max/HLL), a
        pre-r11 state schema, or a span no longer retained — and the
        caller repairs or rebuilds."""
        if any(
            kind not in _RETRACTABLE
            for kind, _col in self.aggregates.values()
        ):
            return None
        state = self.state.read(spark)
        if _NROWS not in state.columns:
            return None  # legacy state: one rebuild upgrades the schema
        try:
            changes = self.source.read_changes(
                spark, last, src_head, keys=self.source_keys
            )
        except ValueError:
            return None  # span not retained (vacuumed) — rebuild
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        delta = changes.withColumn("__sign", sign).drop(
            "_change_type", "_commit_version"
        )
        parts = state.unionByName(self._partial_signed(delta))
        merged = (
            self._merge(parts)
            .where(F.col(_NROWS) > 0)
            .localCheckpoint(eager=True)
        )
        self._commit_state(merged, tag)
        return {"mode": "fold", "source_version": src_head}

    def _try_repair(self, spark: SparkSession, last: int, src_head: int,
                    tag: str) -> dict | None:
        """Group-scoped repair for non-retractable aggregates (r12):
        after a DML span, the groups whose rows changed are exactly the
        change feed's groups — recompute THOSE groups' partials from
        the source head (the group-key in-list prunes files whose
        stats intervals exclude every affected key, so a layout that
        clusters groups rescans a file subset; a broadcast semi-join
        makes the recompute exact even when per-column in-lists
        over-select composite keys) and carry every untouched group's
        state row unchanged. A group whose last row died simply emits
        no partial and drops. Returns None — caller rebuilds — when
        the span is unretained, the state predates the presence
        counter, a feed group key is NULL (an in-list cannot address
        it), the affected-group count exceeds the bounded-metadata
        cap, or the PRICED RESCAN isn't worth it: when the layout does
        not cluster the group key the in-list prunes nothing and the
        repair would read ~the corpus plus the feed plus the state
        anti-join — at or past ``fold_cost_factor × head`` rows
        (manifest-priced, zero I/O) the rebuild is strictly simpler."""
        state = self.state.read(spark)
        if _NROWS not in state.columns:
            return None
        try:
            changes = self.source.read_changes(
                spark, last, src_head, keys=self.source_keys
            )
        except ValueError:
            return None
        keys = self.group_keys
        aff = (
            changes.select(*[F.col(f"`{k}`") for k in keys])
            .distinct()
            .limit(_REPAIR_MAX_GROUPS + 1)
            .collect()
        )
        if len(aff) > _REPAIR_MAX_GROUPS:
            return None
        if any(r[i] is None for r in aff for i in range(len(keys))):
            return None
        if not aff:
            # row-preserving span (the feed emitted nothing): state is
            # already correct — commit it under the tag so the source
            # version advances and replay stays idempotent
            merged = state.localCheckpoint(eager=True)
            self._commit_state(merged, tag)
            return {
                "mode": "repair", "source_version": src_head,
                "repaired_groups": 0,
            }
        where: Any = (
            {keys[0]: {"in": [r[0] for r in aff]}}
            if len(keys) == 1
            else {"and": [
                {k: {"in": sorted({r[i] for r in aff})}}
                for i, k in enumerate(keys)
            ]}
        )
        kept_files, total = self.source.prune_files(spark, where)
        if self.fold_cost_factor is not None:
            # price the RESCAN like the span: on a layout that does
            # not cluster the group key the in-list prunes nothing and
            # recomputing the affected groups reads ~the corpus — plus
            # the feed and the state anti-join the rebuild skips. At
            # or past factor × head the rebuild is strictly simpler.
            m = self.source._read_manifest(spark, src_head)
            stats = m.get("stats") or {}

            def _rows(fs):
                tot = 0
                for f in fs:
                    r = (stats.get(f) or {}).get("rows")
                    if r is None:
                        return None
                    tot += r
                return tot

            rescan, head_rows = _rows(kept_files), _rows(m["files"])
            if (
                rescan is not None
                and head_rows is not None
                and head_rows > 0
                and rescan >= self.fold_cost_factor * head_rows
            ):
                return None
        pruned = len(kept_files)
        aff_df = spark.createDataFrame(
            [tuple(r) for r in aff], schema=state.select(*keys).schema
        )
        rows = self.source.read(spark, where=where).join(
            F.broadcast(aff_df), on=keys, how="left_semi"
        )
        repaired = self._merge(self._partial(rows))
        kept = state.join(F.broadcast(aff_df), on=keys, how="left_anti")
        merged = kept.unionByName(repaired).localCheckpoint(eager=True)
        self._commit_state(merged, tag)
        return {
            "mode": "repair", "source_version": src_head,
            "repaired_groups": len(aff),
            "files_scanned": pruned, "files_total": total,
        }

    def refresh(self, spark: SparkSession) -> dict:
        """Bring the state up to the source head. Returns a report row:
        mode is 'noop' (already current), 'initial' (first build),
        'delta' (merged read_incremental's files only), 'fold' (the
        increment spanned an overwrite but every aggregate retracts —
        the change feed folded at DML-slice cost), 'repair' (a
        non-retractable aggregate met a DML — only the feed's affected
        groups recomputed from source, untouched state carried), or
        'rebuild' (full recompute: a corpus-sized span — the priced
        cost gate — or no cheaper mode applies). Overwrite-class
        refreshes carry the manifest-priced span-vs-head cost
        (``priced_span`` / ``priced_head`` / ``priced_unit``) that
        drove the decision. Commits are tagged with the source
        version, so a crashed refresh replays idempotently and a
        concurrent refresher loses the commit lock instead of
        double-applying."""
        src_head = self.source.versions(spark)[-1]
        last = self._last_source_version(spark)
        if last == src_head:
            return {"mode": "noop", "source_version": src_head}
        tag = f"{_TAG_PREFIX}{src_head}"
        if last is None:
            merged = self._merge(self._partial(self.source.read(spark)))
            self._commit_state(merged, tag)
            return {"mode": "initial", "source_version": src_head}
        try:
            # where pushes to the FILE level: the increment skips added
            # files whose stats intervals can't match (read_incremental
            # pruning); _partial re-applies the full predicate, so the
            # double filter is idempotent and the skip is sound-only.
            delta = self.source.read_incremental(
                spark, last, src_head, where=self.where
            )
        except ValueError:
            span_cost, head_cost, unit = self._span_cost(
                spark, last, src_head
            )
            priced = {
                "priced_span": span_cost, "priced_head": head_cost,
                "priced_unit": unit,
            }
            # fold/repair only while the span is provably cheaper than
            # the head it would replace (a full overwrite's CDF diff
            # reads ~2× the corpus; the rebuild reads it once) — an
            # unpriceable span (stats off) keeps the r11 fold behavior
            factor = self.fold_cost_factor
            affordable = (
                factor is None
                or span_cost is None
                or head_cost is None
                or span_cost <= factor * head_cost
            )
            if affordable:
                folded = self._try_fold(spark, last, src_head, tag)
                if folded is not None:
                    return {**folded, **priced}
                repaired = self._try_repair(spark, last, src_head, tag)
                if repaired is not None:
                    return {**repaired, **priced}
            merged = self._merge(self._partial(self.source.read(spark)))
            self._commit_state(merged, tag)
            return {"mode": "rebuild", "source_version": src_head, **priced}
        state = self.state.read(spark)
        new_parts = self._partial(delta)
        if set(state.columns) != set(new_parts.columns):
            # pre-r11 state schema: one rebuild upgrades it in place
            merged = self._merge(self._partial(self.source.read(spark)))
            self._commit_state(merged, tag)
            return {"mode": "rebuild", "source_version": src_head}
        parts = state.unionByName(new_parts)
        # localCheckpoint before overwrite: the merged plan READS the
        # state snapshot it is about to replace — materialize first so
        # the write never scans files its own commit retires.
        merged = self._merge(parts).localCheckpoint(eager=True)
        self._commit_state(merged, tag)
        return {"mode": "delta", "source_version": src_head}

    def result(self, spark: SparkSession) -> DataFrame:
        """The maintained aggregate, finalized (avg divided out, HLL
        estimated) — reads the state table only: group-cardinality
        rows, zero source I/O."""
        return self._finalize(self.state.read(spark))

    def source_version(self, spark: SparkSession) -> int | None:
        """Source version the state currently reflects (None = never
        refreshed) — the staleness probe: compare to
        ``source.versions(spark)[-1]``."""
        return self._last_source_version(spark)
