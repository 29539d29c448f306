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
  rescan. min/max and approx_distinct cannot retract (a deleted
  maximum needs the runner-up; an HLL cannot forget) — those MVs keep
  the rebuild answer, stated in the refresh report.

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
    matching rows."""

    def __init__(
        self,
        source: SnapshotTable,
        state_root: str,
        group_keys: list[str],
        aggregates: dict[str, tuple[str, str | None]],
        where: Any = None,
        source_keys: list[str] | None = None,
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
                cols.append((F.col(p[0]) / F.col(p[1])).alias(alias))
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

    def _last_source_version(self, spark: SparkSession) -> int | None:
        vs = self.state.versions(spark)
        if not vs:
            return None
        tag = self.state._read_manifest(spark, vs[-1]).get("tag") or ""
        if not tag.startswith(_TAG_PREFIX):
            return None
        return int(tag[len(_TAG_PREFIX):])

    def _try_fold(self, spark: SparkSession, last: int, src_head: int,
                  tag: str) -> dict | None:
        """CDF-driven refresh across an overwrite (r11): consume
        ``read_changes`` and fold signed partials — deletes/update
        pre-images retract, inserts/post-images add, groups whose
        presence counter reaches zero drop. Cost = the span's
        removed+added files, never the corpus. Returns None when not
        foldable — a non-retractable aggregate (min/max/HLL), a
        pre-r11 state schema, or a span no longer retained — and the
        caller rebuilds, exactly as before."""
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
        self.state.overwrite(merged, tag=tag)
        return {"mode": "fold", "source_version": src_head}

    def refresh(self, spark: SparkSession) -> dict:
        """Bring the state up to the source head. Returns a report row:
        mode is 'noop' (already current), 'initial' (first build),
        'delta' (merged read_incremental's files only), 'fold' (the
        increment spanned an overwrite but every aggregate retracts —
        the change feed folded at DML-slice cost), or 'rebuild' (a
        non-retractable aggregate met an overwrite — full recompute,
        the only sound answer). Commits are tagged with the source
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
            self.state.overwrite(merged, tag=tag)
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
            folded = self._try_fold(spark, last, src_head, tag)
            if folded is not None:
                return folded
            merged = self._merge(self._partial(self.source.read(spark)))
            self.state.overwrite(merged, tag=tag)
            return {"mode": "rebuild", "source_version": src_head}
        state = self.state.read(spark)
        new_parts = self._partial(delta)
        if set(state.columns) != set(new_parts.columns):
            # pre-r11 state schema: one rebuild upgrades it in place
            merged = self._merge(self._partial(self.source.read(spark)))
            self.state.overwrite(merged, tag=tag)
            return {"mode": "rebuild", "source_version": src_head}
        parts = state.unionByName(new_parts)
        # localCheckpoint before overwrite: the merged plan READS the
        # state snapshot it is about to replace — materialize first so
        # the write never scans files its own commit retires.
        merged = self._merge(parts).localCheckpoint(eager=True)
        self.state.overwrite(merged, tag=tag)
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
