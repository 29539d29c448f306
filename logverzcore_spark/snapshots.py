"""Versioned snapshot tables — reproducible dataset reads (time travel).

A training run must be able to pin "the corpus as of version N" and
re-read it byte-stable months later, regardless of appends, rewrites, or
compactions since — the property behind every data-lineage /
repro-of-a-run requirement, and the one piece of the table-format family
(MERGE q114, SCD2 q115, compaction q112, point-deletes q113, Z-order
q111) the repo didn't yet express. This is the manifest-pointer design
Iceberg/Delta use, reduced to its correctness core on plain parquet +
a filesystem with atomic rename:

- **data files are immutable**: every commit writes NEW part files under
  ``data/<uuid>/``; nothing ever rewrites a committed file in place.
- **a version is a manifest**: ``_snapshots/v<N>.json`` holds the exact
  file paths of version N (a full list, not a delta — O(files) metadata
  buys O(1)-step recovery and trivially correct reads) plus a BOUNDED
  tag history (per-prefix high-water floors + a fixed recent window for
  streaming tags; cumulative only for suffix-less one-off tags — see
  the tag-history note below), so replay idempotence survives vacuum,
  costs ONE manifest read per commit, and stays FLAT as an always-on
  stream ages.
- **commit = atomic-existence manifest write, concurrency ENFORCED**
  (fsutil.write_small_json_exclusive): content lands whole under a
  per-writer ``.part.<id>`` name, winner selection is an atomic
  create-if-absent lock (``FileSystem.createNewFile`` — O_EXCL locally,
  one namenode op on HDFS), and the rename + read-back happen under
  that lock. Of N concurrent committers of one version, exactly one
  wins; every loser raises :class:`fsutil.CommitConflict` (optimistic
  concurrency — re-read the head and retry with the next version),
  never silently replaces. A crashed winner fail-stops: either its
  manifest committed (losers conflict and move on) or an orphan
  ``.lock`` blocks that one version until the operator runs
  ``break_commit_lock``. The mechanism above is the DEFAULT
  (rename-family) backend, sound on local/HDFS; on object stores —
  where S3A rename is copy+delete and createNewFile is not atomic —
  construct ``SnapshotTable(root, backend=<ConditionalPutBackend>)``
  and the same exclusivity comes from one conditional PUT per manifest
  (fsutil's atomicity-scope note; the Delta-on-S3 LogStore reason,
  solved here by the seam). Concurrent READERS at any version
  are always safe because reads never list directories, only resolve
  committed manifests.
- **a crash before the rename** leaves orphan data files no manifest
  references — invisible to every reader, reclaimed by ``vacuum``.

- **a manifest carries per-file column statistics** (min / max / null
  count / row count for every eligible atomic column, collected at
  commit time from the just-written files in ONE distributed pass) —
  the Delta/Iceberg data-skipping design: a selective read first
  evaluates its predicate against the stats INTERVALS on the driver
  (manifest = bounded metadata) and scans only the files that can
  match, then re-applies the full predicate in Spark so pruning is an
  optimization, never a correctness input. ``count()`` is answered
  from manifest row counts alone — zero data I/O.

Capacity note for 100 TB: manifests hold file PATHS, tags, and per-file
column stats (metadata-scale — bounded by file count × stat columns;
compaction bounds file count); data-file I/O is the normal distributed
parquet scan over an explicit file list, identical in plan shape to any
other read here. At 100 TB the skipping stats are the difference between
"scan everything for a point lookup" and "scan the handful of files
whose [min,max] admit the key" — the same lever Delta's file-level stats
and Iceberg's manifest entries provide, with the same caveat: skipping
quality follows layout (Z-order/range-partitioned commits give tight
disjoint intervals; random layout gives overlapping ones and prunes
nothing — q111's Z-order export is the companion writer).
"""

from __future__ import annotations

import json
import math
import os
import re
import uuid
from datetime import date, datetime
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logverzcore_spark.fsutil import (
    CommitConflict,
    _fastpath_local,
    break_commit_lock,
    hadoop_fs,
    read_small_json,
    write_small_json_commit,
    write_small_json_exclusive,
)

__all__ = ["SnapshotTable", "CommitConflict"]

_VRE = re.compile(r"^v(\d+)\.json$")

# ---------------------------------------------------------------------------
# Bounded tag history (replay idempotence at O(1) manifest cost)
#
# The r9 design kept EVERY commit tag ever applied in the head manifest
# ("all_tags"), so an always-on tagged stream (st37: one
# "<ckid>:batch-<N>" tag per trigger) grew the manifest one tag per
# trigger FOREVER — a year of 1-minute triggers is ~500k tags serialized
# into every subsequent commit; commit cost rose linearly with stream
# age. Streaming tags are per-prefix MONOTONIC sequences (Structured
# Streaming batch ids are serial and consecutive per checkpoint), so the
# Kafka-producer-epoch compression applies: a numeric-suffixed tag
# "<prefix><n>" folds into a per-prefix HIGH-WATER FLOOR — any n ≤ floor
# is by construction already applied (a redelivery), any n > floor is
# new. The manifest then carries:
#
# - ``tag_floors``: {prefix: max n committed} — one entry per STREAM,
#   not per batch (bounded by writer count);
# - ``recent_tags``: the last _RECENT_TAGS_MAX numeric-suffixed tags
#   verbatim — belt-and-suspenders for mildly out-of-order redelivery
#   near the head (membership is checked before the floor);
# - ``all_tags``: every OTHER tag (human-issued one-offs like
#   "manual-backfill" or "backfill-2026q1") — still cumulative with
#   exact-membership semantics, because arbitrary strings admit no
#   floor, and they are O(operator actions), not O(triggers).
#
# Floor compression applies ONLY to tags of the literal streaming shape
# ``<prefix>:batch-<n>`` — the tag every streaming writer here emits
# (avro_stream/collect_stream: ``f"{ckid}:batch-{batch_id}"``). An
# earlier draft floored ANY tag ending in a digit, which silently
# swallowed human one-offs: a NEW "report-1" issued after "report-2"
# was judged already-applied and the append no-opped — data loss by
# tag shape (r10 ADVICE). Requiring the ":batch-" separator makes the
# monotonicity contract opt-in by construction: nothing but a
# Structured Streaming batch-id sequence produces that shape.
#
# CONTRACT (documented at append()): ":batch-"-suffixed tags must be
# per-prefix monotonic — a NEW (never-applied) tag below an already-
# committed one would wrongly no-op. Structured Streaming batch ids
# are serial per checkpoint, so every streaming writer satisfies that
# by construction; vacuum keeps the head manifest, so floors survive
# it exactly as the cumulative list did. Legacy manifests with
# ":batch-"-suffixed tags in all_tags are compressed into floors on
# their first post-upgrade commit.
# ---------------------------------------------------------------------------

_TAG_SUFFIX_RE = re.compile(r"^(.*:batch-)(\d+)$")
_RECENT_TAGS_MAX = 64

#: r10's floor split (ANY digit-suffixed tag) — consulted READ-ONLY:
#: manifests written under r10 compressed one-off tags like "report-2"
#: into tag_floors, and a pre-upgrade redelivery older than the recent
#: window must still no-op. New code never WRITES floors under these
#: prefixes (only ":batch-" compresses), so the legacy lookup can only
#: match entries r10 left behind; the r10 footgun (a NEW "report-1"
#: judged applied because "report-2" was) therefore stays confined to
#: prefixes r10 already poisoned, and shrinks to zero on fresh tables.
_LEGACY_TAG_SUFFIX_RE = re.compile(r"^(.*?)(\d+)$")


def _tag_seen(head: dict | None, tag: str) -> bool:
    """Replay-idempotence check against a head manifest's compressed
    tag history (and, for legacy manifests, the cumulative list)."""
    if not head:
        return False
    if tag in head.get("all_tags", []) or tag in head.get("recent_tags", []):
        return True
    m = _TAG_SUFFIX_RE.match(tag) or _LEGACY_TAG_SUFFIX_RE.match(tag)
    if m:
        floor = head.get("tag_floors", {}).get(m.group(1))
        if floor is not None and int(m.group(2)) <= floor:
            return True
    return False


def _fold_tags(
    parent: dict | None, tag: str | None
) -> tuple[list[str], list[str], dict[str, int]]:
    """(all_tags, recent_tags, tag_floors) for the child manifest:
    carry the parent's history, compress any legacy ":batch-"-shaped
    entries into floors (anything else stays cumulative — exact
    membership), then apply ``tag``."""
    all_tags = list(parent.get("all_tags", [])) if parent else []
    recent = list(parent.get("recent_tags", [])) if parent else []
    floors = dict(parent.get("tag_floors", {})) if parent else {}
    if any(_TAG_SUFFIX_RE.match(t) for t in all_tags):
        kept = []
        for t in all_tags:  # one-time legacy compression
            m = _TAG_SUFFIX_RE.match(t)
            if m:
                p, n = m.group(1), int(m.group(2))
                floors[p] = max(floors.get(p, -1), n)
            else:
                kept.append(t)
        all_tags = kept
    if tag is not None:
        m = _TAG_SUFFIX_RE.match(tag)
        if m:
            p, n = m.group(1), int(m.group(2))
            floors[p] = max(floors.get(p, -1), n)
            recent.append(tag)
            recent = recent[-_RECENT_TAGS_MAX:]
        else:
            all_tags.append(tag)
    return all_tags, recent, floors

# ---------------------------------------------------------------------------
# File-level column statistics (data skipping)
#
# Eligible types are the atomic ORDERED ones whose min/max round-trip
# losslessly through the JSON manifest: integers, floats (finite only),
# strings (bound-preserving truncation below), booleans, and date/
# timestamp (serialized as fixed-width ISO-style strings, whose
# lexicographic order equals temporal order). Deliberately excluded:
# decimal (string form doesn't sort numerically), binary, and nested
# types — a file simply carries no stats for those columns and is never
# pruned on them. Reference parity note: the reference's registry
# declares an "Indexes" facility but ships it empty everywhere
# (SURVEY §1.1, Logverz-Engine.json Indexes: []); file-interval skipping
# is the scan-architecture equivalent of that intent.
# ---------------------------------------------------------------------------

#: Longest string stored verbatim in a manifest stat. Longer values are
#: truncated BOUND-PRESERVINGLY: a prefix is a valid lower bound as-is,
#: and a valid upper bound after bumping its last bumpable code point
#: (exactly Iceberg's truncate-and-increment rule).
_STR_STAT_MAX = 96

_STAT_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
_STAT_TEMPORAL = {"date", "timestamp", "timestamp_ntz"}
_STAT_TYPES = _STAT_NUMERIC | _STAT_TEMPORAL | {"string", "boolean"}

#: Comparison ops the interval evaluator understands. Anything else
#: (pattern ops, notIn, notBetween, ...) conservatively keeps the file.
_INTERVAL_OPS = {"eq", "is", "ne", "gt", "gte", "lt", "lte", "in", "between"}

#: Column types eligible for per-file Bloom filters: exactly those whose
#: CAST(col AS STRING) is byte-reproducible driver-side via str() —
#: strings themselves and integers. Floats/timestamps are excluded
#: (representation drift between the JVM cast and Python str would make
#: the probe hash a DIFFERENT key than the build did: silent wrong
#: prunes).
_BLOOM_TYPES = {"string", "tinyint", "smallint", "int", "bigint"}


def _bloom_contains(bloom: dict, value: Any, dtype: str) -> bool:
    """Membership probe against a stored per-file Bloom filter. True =
    possibly present (keep); False = DEFINITELY absent (prune — Bloom
    filters have no false negatives, so this is sound). Literals whose
    Python type doesn't match the column domain punt to True — the
    same cross-type-cast rule as _encode_literal."""
    import base64
    import hashlib

    if dtype == "string":
        if not isinstance(value, str):
            return True
    elif isinstance(value, bool) or not isinstance(value, int):
        return True
    s = str(value)
    bits = base64.b64decode(bloom["b64"])
    m, k = bloom["m"], bloom["k"]
    for i in range(k):
        p = int(
            hashlib.md5((s + chr(i)).encode("utf-8")).hexdigest()[:15], 16
        ) % m
        if not (bits[p >> 3] >> (p & 7)) & 1:
            return False
    return True  # position algebra matches build: hash60 %% per-file m


def _bloom_can_match(bloom: dict | None, dtype: str, op: str, operand: Any) -> bool:
    """Bloom refinement for equality shapes (everything else keeps):
    after the interval check passes, an eq probe can still prove the
    key absent from this file."""
    if bloom is None:
        return True
    if op in ("eq", "is"):
        if operand is None:
            return True  # null-ness is the interval evaluator's job
        from logverzcore_spark.operators.optree import type_literal

        return _bloom_contains(bloom, type_literal(operand), dtype)
    if op == "in":
        from logverzcore_spark.operators.optree import type_literal

        return any(
            _bloom_contains(bloom, type_literal(v), dtype) for v in operand
        )
    return True


def _bump_prefix(s: str) -> str | None:
    """Smallest string > every string with prefix ``s``: bump the last
    bumpable code point, dropping anything after it. None if every code
    point is already chr(0x10FFFF) (no finite upper bound exists)."""
    chars = list(s)
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp < 0x10FFFF:
            return "".join(chars[:i]) + chr(cp + 1)
    return None


_TS_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2})(?:[ T](\d{2}:\d{2}:\d{2})(?:\.(\d{1,6}))?)?$"
)


def _canon_ts(s: str) -> str | None:
    """Canonical fixed-width timestamp text: 'YYYY-MM-DD HH:MM:SS.ffffff'
    (missing time → midnight, fraction zero-padded to 6). Needed because
    str(datetime) OMITS a zero fraction but prints '.500000' for a half
    second — under plain lexicographic comparison '…05' vs '…05.000000'
    mis-orders equal instants. None for anything unparseable (tz
    suffixes, garbage) — the caller then refuses to prune."""
    m = _TS_RE.match(s)
    if not m:
        return None
    d, t, f = m.groups()
    return f"{d} {t or '00:00:00'}.{(f or '').ljust(6, '0')}"


def _encode_stat(value: Any, dtype: str, bound: str) -> Any:
    """JSON-safe encoding of one min/max value; None means "no usable
    bound" (the file stays unprunable on this column in that direction)."""
    if value is None:
        return None
    if dtype in _STAT_NUMERIC:
        v = float(value) if dtype in ("float", "double") else int(value)
        if isinstance(v, float) and not math.isfinite(v):
            return None  # NaN/inf break interval ordering — drop the bound
        return v
    if dtype == "date":
        return str(value)  # fixed-width, orders lexicographically
    if dtype in _STAT_TEMPORAL:
        return _canon_ts(str(value))
    if dtype == "boolean":
        return bool(value)
    s = str(value)
    if len(s) <= _STR_STAT_MAX:
        return s
    prefix = s[:_STR_STAT_MAX]
    return prefix if bound == "min" else _bump_prefix(prefix)


def _encode_literal(value: Any, dtype: str) -> Any:
    """Bring a predicate literal into the stored-stat domain (same
    encoding as _encode_stat, minus truncation — literals are exact)."""
    if value is None:
        return None
    if dtype == "date":
        if isinstance(value, (datetime, date)):
            return str(value)[:10]
        if isinstance(value, str) and _TS_RE.match(value):
            return value[:10]
        return None
    if dtype in _STAT_TEMPORAL:
        if isinstance(value, (datetime, date)):
            return _canon_ts(str(value))
        # a non-string literal against a temporal column (e.g. an int)
        # has no lexicographic meaning here — don't prune on it
        return _canon_ts(value) if isinstance(value, str) else None
    if dtype in _STAT_NUMERIC:
        from logverzcore_spark.operators.optree import type_literal

        v = type_literal(value)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None  # non-numeric literal vs numeric column: no prune
        return v
    if dtype == "boolean":
        return value if isinstance(value, bool) else None
    # string column: Spark compares a NUMERIC literal by casting the
    # COLUMN to a number ('05' == 5 matches), which lexicographic
    # interval logic cannot mirror — only string literals may prune.
    return value if isinstance(value, str) else None


def _interval_can_match(op: str, value: Any, ent: dict, dtype: str) -> bool:
    """Can ANY row of a file with stats ``ent`` satisfy ``col op value``?
    True = keep the file (conservative); False = provably no match."""
    nulls = ent.get("nulls")
    rows = ent.get("rows")
    lo, hi = ent.get("min"), ent.get("max")
    all_null = rows is not None and nulls == rows
    if value is None:
        if op in ("eq", "is"):  # compile_where: IS NULL
            return nulls is None or nulls > 0
        if op == "ne":  # compile_where: IS NOT NULL
            return not all_null
        return True
    if all_null:
        # Every interval op compares col to a non-null literal; NULL rows
        # never satisfy any of them (SQL three-valued logic).
        return False
    if op == "in":
        vs = [_encode_literal(v, dtype) for v in value]
        return any(
            v is not None
            and (lo is None or v >= lo)
            and (hi is None or v <= hi)
            for v in vs
        ) or any(v is None for v in vs)
    if op == "between":
        blo, bhi = (_encode_literal(v, dtype) for v in value)
        if blo is None or bhi is None:
            return True
        return (hi is None or blo <= hi) and (lo is None or bhi >= lo)
    v = _encode_literal(value, dtype)
    if v is None:
        return True
    if op in ("eq", "is"):
        return (lo is None or v >= lo) and (hi is None or v <= hi)
    if op == "ne":
        # Only prunable when every non-null row equals v exactly.
        return not (lo == hi == v and (nulls or 0) == 0)
    if op == "gt":
        return hi is None or hi > v
    if op == "gte":
        return hi is None or hi >= v
    if op == "lt":
        return lo is None or lo < v
    if op == "lte":
        return lo is None or lo <= v
    return True


def _file_can_match(
    tree: Any, fstats: dict | None, schema: dict, fblooms: dict | None = None
) -> bool:
    """Driver-side interval evaluation of an optree predicate against one
    file's stats. Mirrors optree.compile_where's accepted shapes; every
    construct the interval algebra can't decide returns True (keep).
    ``not`` is conservatively True: can_match(¬P) is not ¬can_match(P)
    — deciding it needs must-match intervals, which min/max alone don't
    give for multi-row files."""
    if fstats is None:
        return True
    if not isinstance(tree, dict):
        return True
    for key, value in tree.items():
        key_name = key.strip("<>")
        if key_name == "and":
            subs = value if isinstance(value, (list, tuple)) else [value]
            if not all(
                _file_can_match(v, fstats, schema, fblooms) for v in subs
            ):
                return False
        elif key_name == "or":
            subs = value if isinstance(value, (list, tuple)) else [value]
            if subs and not any(
                _file_can_match(v, fstats, schema, fblooms) for v in subs
            ):
                return False
        elif key_name == "not":
            continue
        else:
            cols = fstats.get("cols", {})
            if key_name not in cols or key_name not in schema:
                continue
            ent = dict(cols[key_name])
            ent["rows"] = fstats.get("rows")
            dtype = schema[key_name]
            if isinstance(value, dict):
                from logverzcore_spark.operators.optree import type_literal

                for op, operand in value.items():
                    op = op.strip("<>")
                    if op in _INTERVAL_OPS:
                        # Normalize operands EXACTLY as compile_where's
                        # _compare does before evaluating intervals:
                        # 'null' → None (the IS NULL branch), numeric-
                        # looking strings → numbers (which
                        # _encode_literal then refuses to prune against
                        # a string column, because Spark compares those
                        # by casting the COLUMN). Skipping this step
                        # pruned files whose NULL rows matched
                        # {"eq": "null"} and files holding "05" that
                        # Spark's numeric cast matches against "5".
                        if op in ("in", "between") and isinstance(
                            operand, (list, tuple)
                        ):
                            operand = [type_literal(v) for v in operand]
                            if op == "in":
                                # isin(NULL) never matches any row (SQL
                                # three-valued logic) — drop the element;
                                # an all-NULL list matches nothing at all.
                                operand = [v for v in operand if v is not None]
                                if not operand:
                                    return False
                        else:
                            operand = type_literal(operand)
                        if not _interval_can_match(op, operand, ent, dtype):
                            return False
                    bloom = (fblooms or {}).get(key_name) or ent.get("bloom")
                    if not _bloom_can_match(bloom, dtype, op, operand):
                        return False
            else:
                from logverzcore_spark.operators.optree import type_literal

                lit = type_literal(value)
                if not _interval_can_match("eq", lit, ent, dtype):
                    return False
                bloom = (fblooms or {}).get(key_name) or ent.get("bloom")
                if not _bloom_can_match(bloom, dtype, "eq", lit):
                    return False
    return True


def _wants_equality(tree: Any) -> bool:
    """Does the predicate contain any eq/is/in shape? Decides whether a
    probe should pay the bloom-sidecar load at all."""
    if not isinstance(tree, dict):
        return False
    for key, value in tree.items():
        key_name = key.strip("<>")
        if key_name in ("and", "or"):
            subs = value if isinstance(value, (list, tuple)) else [value]
            if any(_wants_equality(v) for v in subs):
                return True
        elif key_name == "not":
            continue
        elif isinstance(value, dict):
            if any(op.strip("<>") in ("eq", "is", "in") for op in value):
                return True
        else:
            return True  # shorthand equality
    return False


def _merge_schema_json(parent_json: str | None, new_schema) -> str:
    """Column-additive schema evolution at commit time: the manifest
    records the UNION of columns ever appended (new columns appended in
    arrival order, every carried field nullable — parquet reads a
    missing column as null). A same-name column whose type CHANGED is
    refused loudly: silently unioning int-then-string is how a lake
    gets unreadable files, and the repo's coercion layer (operators/
    coerce.py) is the right place to reconcile types BEFORE commit."""
    from pyspark.sql.types import StructField, StructType

    if parent_json is None:
        return new_schema.json()
    merged = StructType.fromJson(json.loads(parent_json))
    have = {f.name: f for f in merged.fields}
    out = [StructField(f.name, f.dataType, True) for f in merged.fields]
    for f in new_schema.fields:
        if f.name in have:
            old = have[f.name].dataType.simpleString()
            new = f.dataType.simpleString()
            if old != new:
                raise ValueError(
                    f"schema conflict on column {f.name!r}: committed "
                    f"{old}, append carries {new} — cast upstream "
                    "(coerce.py) or overwrite()"
                )
        else:
            out.append(StructField(f.name, f.dataType, True))
    return StructType(out).json()


class SnapshotTable:
    def __init__(
        self,
        root: str,
        backend=None,
        stats_columns=None,
        bloom_columns=None,
        bloom_bits: int = 65536,
        bloom_hashes: int = 6,
        bloom_max_bits: int = 1 << 22,
        bloom_sidecar_max: int = 32,
        stats_sidecar_min_files: int | None = 4096,
        stats_sidecar_max: int = 32,
    ):
        """``backend`` routes every MANIFEST read/commit through a
        :class:`fsutil.CommitBackend` — pass a ConditionalPutBackend on
        object stores (fsutil's atomicity-scope note); default keeps
        the Hadoop rename family. Data files need no backend: they are
        immutable uuid-named parquet, never renamed or overwritten, and
        invisible until a manifest commit references them.

        ``stats_columns`` controls commit-time file statistics (data
        skipping): None (default) collects min/max/nulls for every
        eligible atomic column plus per-file row counts; a list
        restricts to those columns (a huge text column is pure manifest
        bloat — its min/max are megabyte strings truncated to 96 chars
        that no sane predicate ranges over); False disables collection
        entirely (``analyze`` can backfill later).

        ``bloom_columns`` (opt-in, string/integer columns) additionally
        stores a per-file Bloom filter in the manifest — the point-
        lookup complement of min/max skipping: on a RANDOM layout every
        interval spans everything and range stats prune nothing, but an
        eq/in probe still skips every file whose filter lacks the key
        (no false negatives, so skipping stays sound; false positives
        only cost a scan). Each FILE's filter is auto-sized at ~10 bits
        per row (power of two, floor ``bloom_bits`` = 64 Kbit, ceiling
        ``bloom_max_bits`` = 4 Mbit ≈ 700 KB base64) — a fixed size
        saturates on big files and silently stops pruning (measured:
        64 Kbit over 250k-row files kept 157/160 on a point probe); a
        file too big for the ceiling gets NO filter (honest absence)
        rather than a saturated one, which is the same compaction
        discipline every other skipping lever already leans on.
        ``bloom_hashes`` is k (default 6). Hashing is md5-based and
        byte-identical on the JVM (F.md5) and the driver (hashlib), so
        probes never touch Spark.

        ``bloom_sidecar_max`` bounds the per-commit sidecar count on
        always-on streams: once a manifest would reference more
        sidecars than this, append unions them into one (see
        _maybe_consolidate_sidecars), so cold-probe cost is
        O(bloom_sidecar_max), never O(commits).

        ``stats_sidecar_min_files`` arms the TWO-LEVEL manifest (the
        Iceberg manifest-list / Delta checkpoint shape, reduced): once
        a commit's file count reaches it, the file list and per-file
        stats move OUT of the manifest JSON into immutable, uuid-named
        DELTA sidecars, and the manifest keeps only tags / schema /
        pointers. An append then re-references the parent's sidecars
        (their entries are unchanged by construction) and writes ONE
        new sidecar for its own files — commit metadata cost becomes
        O(new files + sidecar count), not O(head files), which is the
        term the r12 manifest scale probe measured bending the 1-file
        commit wall to 2.36× between 512 and 16k head files (SCALE.md).
        Readers hydrate ``files``/``stats`` from the sidecars behind
        ``_read_manifest`` (cached per sidecar name — immutable), so
        every consumer above this layer sees the classic manifest
        shape. ``stats_sidecar_max`` bounds the chain: past it the
        commit consolidates all entries into ONE sidecar (the same
        amortized O(files/max) move as the bloom consolidation).
        ``None`` disables (always inline). Below the threshold —
        including a table that compacts back under it — commits stay
        byte-identical to the single-level format."""
        self.root = root.rstrip("/")
        self.data = os.path.join(self.root, "data")
        self.snaps = os.path.join(self.root, "_snapshots")
        self.backend = backend
        self.stats_columns = stats_columns
        self.bloom_columns = list(bloom_columns or [])
        self.bloom_bits = int(bloom_bits)
        self.bloom_hashes = int(bloom_hashes)
        self.bloom_max_bits = int(bloom_max_bits)
        self.bloom_sidecar_max = int(bloom_sidecar_max)
        self.stats_sidecar_min_files = (
            None if stats_sidecar_min_files is None
            else int(stats_sidecar_min_files)
        )
        self.stats_sidecar_max = int(stats_sidecar_max)

    def versions(self, spark: SparkSession) -> list[int]:
        if self.backend is not None:
            names = self.backend.list_dir(self.snaps)
        else:
            local = _fastpath_local(spark, self.snaps)
            if local is not None:
                # Local fast-path (r13): fs.listStatus costs one py4j
                # round-trip PER ENTRY for getPath().getName() — on a
                # long-lived stream's _snapshots dir (manifests +
                # sidecars, hundreds of entries) that is the dominant
                # term of every head resolve.
                try:
                    names = os.listdir(local)
                except FileNotFoundError:
                    return []
            else:
                jpath, fs = hadoop_fs(spark, self.root)
                if not fs.exists(jpath(self.snaps)):
                    return []
                names = [
                    st.getPath().getName()
                    for st in fs.listStatus(jpath(self.snaps))
                ]
        out = []
        for name in names:
            m = _VRE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _read_manifest(
        self, spark: SparkSession, version: int, hydrate: bool = True
    ) -> dict:
        m = read_small_json(
            spark, os.path.join(self.snaps, f"v{version}.json"),
            backend=self.backend,
        )
        names = m.get("stats_sidecars")
        if names is not None and hydrate:
            # Two-level manifest: hydrate files/stats from the delta
            # sidecars so every consumer above this call sees the
            # classic single-level shape. Sidecars are immutable and
            # cached per name, so a version walk (history, CDF spans)
            # parses each delta's bytes once per handle. Scalar-only
            # walks (version_asof's binary search, vacuum's
            # committed_at scan) pass hydrate=False and stay
            # tag-sized — the bytes the two-level design moved out of
            # the manifest must not creep back into the metadata path.
            entries = self._load_stats_sidecars(spark, names)
            m["files"] = sorted(entries)
            m["stats"] = {
                p: e for p, e in entries.items() if e is not None
            }
        return m

    def _manifest(self, spark: SparkSession, version: int) -> list[str]:
        return self._read_manifest(spark, version)["files"]

    def _commit(
        self,
        spark: SparkSession,
        files: list[str],
        tag: str | None,
        parent: dict | None,
        parent_version: int,
        stats: dict | None = None,
        stats_schema: dict | None = None,
        schema_json: str | None = None,
        bloom_files: list[str] | None = None,
        op: str = "append",
    ) -> int:
        import time as _time

        all_tags, recent_tags, tag_floors = _fold_tags(parent, tag)
        # hoisted: inside the comprehension below this set was rebuilt
        # PER STATS ENTRY — an accidental O(files^2) that bent the
        # 1-file commit wall from 1.3 s to 11.9 s between 4k and 16k
        # head files (r12 manifest_scale_probe finding)
        fileset = set(files)
        # Two-level manifest past the threshold: files+stats move to
        # delta sidecars (re-referencing the parent's unchanged ones),
        # the JSON manifest keeps tags/schema/pointers — commit
        # metadata cost O(new files), not O(head files). Re-evaluated
        # per commit: a table that compacts back under the threshold
        # returns to the inline single-level format byte-for-byte.
        two_level = (
            self.stats_sidecar_min_files is not None
            and len(files) >= self.stats_sidecar_min_files
        )
        if two_level:
            merged = {p: (stats or {}).get(p) for p in fileset}
            stats_sidecars = self._plan_stats_sidecars(
                spark, parent, merged
            )
            head_keys = {
                "stats_sidecars": stats_sidecars,
                "n_files": len(files),
            }
        else:
            head_keys = {"files": sorted(files)}
        payload = {
            **head_keys,
            "tag": tag,
            "all_tags": all_tags,
            "recent_tags": recent_tags,
            "tag_floors": tag_floors,
            # epoch millis (int: fixed JSON width) — what version_asof
            # resolves timestamp time travel against. Clamped to the
            # parent's stamp so the sequence is non-decreasing EVEN
            # when different hosts commit with skewed wall clocks
            # (multi-writer retries make that real): version_asof's
            # binary search is only sound over a monotone sequence.
            "committed_at": max(
                int(_time.time() * 1000),
                int((parent or {}).get("committed_at") or 0),
            ),
            "op": op,  # what produced this version (history())
            # Two-level manifests deliberately OMIT "files"/"stats"
            # rather than writing them empty: a pre-two-level reader
            # (deployment skew, an external tool parsing v{N}.json
            # raw) must fail LOUDLY on m["files"] (KeyError) rather
            # than silently read a populated table as empty — the
            # Iceberg/Delta format-version gate, reduced to a
            # required-key rename. New readers hydrate both keys
            # behind _read_manifest; below the threshold the payload
            # stays byte-identical to the single-level format.
            **({} if two_level else {"stats": {
                k: v for k, v in (stats or {}).items() if k in fileset
            }}),
            "stats_schema": stats_schema or {},
            "schema": schema_json,
            "bloom_files": bloom_files or [],
        }
        version = parent_version + 1
        # Exclusive commit: a concurrent committer who read the same
        # head raises CommitConflict here (its data files stay orphaned
        # and invisible; vacuum reclaims) — history stays linear.
        write_small_json_exclusive(
            spark, os.path.join(self.snaps, f"v{version}.json"), payload,
            backend=self.backend,
        )
        return version

    def break_commit_lock(self, spark: SparkSession, version: int) -> bool:
        """Operator escape hatch: remove the orphan commit lock a CRASHED
        committer of ``version`` left behind (see fsutil.
        write_small_json_exclusive's fail-stop note). Only after
        confirming no writer is alive. Returns whether a lock existed."""
        return break_commit_lock(
            spark, os.path.join(self.snaps, f"v{version}.json"),
            backend=self.backend,
        )

    def _head(self, spark: SparkSession) -> tuple[int, dict | None]:
        vs = self.versions(spark)
        if not vs:
            return 0, None
        return vs[-1], self._read_manifest(spark, vs[-1])

    def _write_data(self, df: DataFrame) -> tuple[list[str], dict, dict, dict]:
        """Write a commit's data files into a fresh immutable dir and
        return (paths, per-file stats, stats schema, per-file bloom
        filters destined for a sidecar). A crash after this
        but before the manifest commit leaves them orphaned and
        invisible (vacuum reclaims). Stats cost ONE extra distributed
        columnar scan of the just-written files only (never the whole
        table) — the price of every future read that skips them."""
        dirname = os.path.join(self.data, uuid.uuid4().hex[:12])
        df.write.parquet(dirname)
        spark = df.sparkSession
        jpath, fs = hadoop_fs(spark, self.root)
        files = []
        sizes = {}
        it = fs.listFiles(jpath(dirname), True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().startswith("part-"):
                p = st.getPath().toString()
                files.append(p)
                sizes[p] = int(st.getLen())
        if self.stats_columns is False:
            return files, {}, {}, {}
        stats, schema, blooms = self._collect_stats(spark, files)
        for p, ent in stats.items():
            # file bytes ride in the stats entry: they price reads
            # (estimate / admission) and compaction, at zero extra I/O
            # — the listing above already had them.
            ent["bytes"] = sizes.get(p)
        return files, stats, schema, blooms

    def _collect_stats(
        self, spark: SparkSession, files: list[str]
    ) -> tuple[dict, dict, dict]:
        """Distributed stats pass over ``files``: per-file row count
        and, per eligible column, min / max / null count, grouped by
        the hidden ``_metadata.file_path`` and re-keyed to the
        manifest's path strings by basename (globally unique — Spark
        part names embed a job uuid; the driver-side result is
        files × columns — bounded metadata, the repo's collect
        discipline). Files spanning several commit dirs (the analyze
        backfill path) are processed per dir, because each commit dir
        is schema-homogeneous while the set may not be."""
        if not files:
            return {}, {}, {}
        by_dir: dict[str, list[str]] = {}
        for f in files:
            by_dir.setdefault(os.path.dirname(f), []).append(f)
        if len(by_dir) > 1:
            stats: dict = {}
            schema: dict = {}
            blooms: dict = {}
            for group in by_dir.values():
                s, sch, bl = self._collect_stats(spark, group)
                stats.update(s)
                schema.update(sch)
                blooms.update(bl)
            return stats, schema, blooms
        src = spark.read.parquet(*files)
        eligible = [
            (f.name, f.dataType.simpleString())
            for f in src.schema.fields
            if f.dataType.simpleString() in _STAT_TYPES
            and (self.stats_columns is None or f.name in self.stats_columns)
        ]
        schema = dict(eligible)
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for name, _ in eligible:
            c = F.col(f"`{name}`")
            aggs.append(F.min(c).alias(f"__min__{name}"))
            aggs.append(F.max(c).alias(f"__max__{name}"))
            aggs.append(
                F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(
                    f"__nulls__{name}"
                )
            )
        rows = (
            src.groupBy(
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("__base")
            )
            .agg(*aggs)
            .collect()
        )
        by_base = {os.path.basename(f): f for f in files}
        stats: dict[str, dict] = {}
        for r in rows:
            path = by_base.get(r["__base"])
            if path is None:
                continue
            cols = {}
            for name, dtype in eligible:
                lo = _encode_stat(r[f"__min__{name}"], dtype, "min")
                hi = _encode_stat(r[f"__max__{name}"], dtype, "max")
                cols[name] = {
                    "min": lo,
                    "max": hi,
                    "nulls": int(r[f"__nulls__{name}"] or 0),
                }
            stats[path] = {"rows": int(r["__rows"]), "cols": cols}
        for base, path in by_base.items():
            if path not in stats:  # zero-row file: no group row came back
                stats[path] = {
                    "rows": 0,
                    "cols": {
                        name: {"min": None, "max": None, "nulls": 0}
                        for name, _ in eligible
                    },
                }
        blooms: dict = {}
        if self.bloom_columns:
            self._collect_blooms(src, by_base, stats, blooms, schema)
        return stats, schema, blooms

    def _collect_blooms(
        self, src: DataFrame, by_base: dict, stats: dict, blooms: dict,
        schema: dict,
    ):
        """Per-file Bloom filters for the opted-in columns, attached to
        the stats entries. Hash positions are computed JVM-side (md5 +
        conv — whole-stage codegen) and the bitset assembly is one
        Arrow-batched applyInPandas per file group, emitting ONE base64
        row per (file, column) — output is files × filter bytes,
        bounded metadata."""
        import base64

        import pandas as pd
        from pyspark.sql.types import StringType, StructField, StructType

        min_bits, max_bits = self.bloom_bits, self.bloom_max_bits
        k = self.bloom_hashes
        eligible = [
            f.name
            for f in src.schema.fields
            if f.name in self.bloom_columns
            and f.dataType.simpleString() in _BLOOM_TYPES
        ]
        for f in src.schema.fields:
            if f.name in eligible:
                # a bloom-only column (outside the min/max allowlist)
                # still needs its dtype in stats_schema for the probe
                schema.setdefault(f.name, f.dataType.simpleString())
        from pyspark.sql.types import LongType

        out_schema = StructType(
            [
                StructField("__base", StringType()),
                StructField("b64", StringType()),
                StructField("m", LongType()),
            ]
        )

        def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
            import numpy as np

            # auto-size from THIS file's rows: ~10 bits/row, pow2,
            # floored/ceilinged; too-big files get no filter (honest
            # absence beats a saturated filter that never prunes)
            n = len(pdf)
            need = max(min_bits, 1 << (10 * n - 1).bit_length())
            if need > max_bits:
                return pd.DataFrame(
                    {"__base": [pdf["__base"].iloc[0]], "b64": [None],
                     "m": [0]}
                )
            m = need
            bits = np.zeros(m // 8, dtype=np.uint8)
            arrs = [np.asarray(a, dtype=np.int64) for a in pdf["__pos"] if a is not None]
            if arrs:
                pos = np.concatenate(arrs) % m
                np.bitwise_or.at(
                    bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
                )
            return pd.DataFrame(
                {
                    "__base": [pdf["__base"].iloc[0]],
                    "b64": [base64.b64encode(bits.tobytes()).decode("ascii")],
                    "m": [m],
                }
            )

        for name in eligible:
            val = F.col(f"`{name}`").cast("string")
            pos = [
                F.conv(
                    F.substring(F.md5(F.concat(val, F.lit(chr(s)))), 1, 15),
                    16,
                    10,
                ).cast("long")
                for s in range(k)
            ]
            rows = (
                src.where(F.col(f"`{name}`").isNotNull())
                .select(
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ).alias("__base"),
                    F.array(*pos).alias("__pos"),
                )
                .groupBy("__base")
                .applyInPandas(build, out_schema)
                .collect()
            )
            for r in rows:
                path = by_base.get(r["__base"])
                fent = stats.get(path)
                if fent is None:
                    continue
                # a bloom column excluded from the min/max allowlist
                # still gets an entry (unknown bounds/nulls stay None —
                # claiming nulls=0 would let IS NULL prune wrongly)
                if r["b64"] is None:
                    continue  # file exceeded bloom_max_bits: no filter
                # sidecar payload, NOT the stats entry: filters are the
                # one skipping artifact too heavy for the manifest
                blooms.setdefault(path, {})[name] = {
                    "m": int(r["m"]), "k": k, "b64": r["b64"],
                }
                fent["cols"].setdefault(
                    name, {"min": None, "max": None, "nulls": None}
                )

    def append(
        self, df: DataFrame, tag: str | None = None, retries: int = 0
    ) -> int:
        """Commit current-version files + the new data as version N+1.

        ``tag`` makes the append REPLAY-IDEMPOTENT: a tag already in the
        head manifest's tag history is a no-op (returns the latest
        version) — the streaming foreachBatch contract, where a crash
        between the manifest commit and the checkpoint commit
        redelivers the same batch id. The history lives ENTIRELY in the
        head manifest (vacuum never forgets a tag; the check costs one
        manifest read) but is BOUNDED: tags of the literal streaming
        shape "<prefix>:batch-<N>" — what every streaming writer here
        emits per trigger — compress into a per-prefix high-water
        floor plus a fixed recent window, so an always-on stream's
        manifest stays flat instead of growing one tag per trigger
        forever. Contract: ":batch-"-shaped tags must be per-prefix
        monotonic (Structured Streaming batch ids are); every other
        tag — including human one-offs that happen to end in a digit,
        like "backfill-2026q1" — stays cumulative with exact
        membership, O(operator actions), not O(triggers).

        ``retries`` makes MULTI-WRITER appends practical (the Delta
        optimistic-concurrency loop): on :class:`CommitConflict` the
        head is re-read and the SAME already-written data files are
        re-pointed at the new head — appends commute, so no data is
        rewritten, only a fresh manifest committed; the re-read also
        re-checks the tag (another writer may have applied it — our
        files then stay orphaned for vacuum). Default 0 preserves the
        raise-and-let-the-caller-decide contract. This re-point is
        sound ONLY for append (and overwrite): the selective-rewrite
        DML ops derive their output from the head's files, so their
        ``retries`` deliberately re-RUN the whole operation instead
        (_rerun_on_conflict) — never re-point."""
        spark = df.sparkSession
        head_v, head = self._head(spark)
        if tag is not None and _tag_seen(head, tag):
            return head_v
        schema_json = _merge_schema_json(
            head.get("schema") if head else None, df.schema
        )
        new_files, new_stats, new_schema, new_blooms = self._write_data(df)
        sidecar = (
            self._write_bloom_sidecar(spark, new_blooms)
            if new_blooms
            else None
        )
        for attempt in range(int(retries) + 1):
            base = head["files"] if head else []
            stats = {**(head.get("stats", {}) if head else {}), **new_stats}
            schema = {
                **(head.get("stats_schema", {}) if head else {}),
                **new_schema,
            }
            bloom_files = list(head.get("bloom_files", [])) if head else []
            if sidecar is not None:
                bloom_files.append(sidecar)
            bloom_files = self._maybe_consolidate_sidecars(
                spark, bloom_files, set(base + new_files)
            )
            try:
                return self._commit(
                    spark, base + new_files, tag, head, head_v, stats,
                    schema, schema_json, bloom_files,
                )
            except CommitConflict:
                if attempt == int(retries):
                    raise
                head_v, head = self._head(spark)
                if tag is not None and _tag_seen(head, tag):
                    return head_v  # a racer applied our tag; files orphan
                # the winner may have appended new columns: re-merge
                schema_json = _merge_schema_json(
                    head.get("schema") if head else None, df.schema
                )
        raise AssertionError("unreachable")

    def overwrite(self, df: DataFrame, tag: str | None = None,
                  _op: str = "overwrite", retries: int = 0) -> int:
        """Commit the new data as the ENTIRE next version (a rewrite —
        e.g. a compaction or a corrected corpus). Prior versions keep
        reading their own files untouched. ``retries`` re-points the
        already-written files at a newer head on CommitConflict (sound
        here exactly as for append: an overwrite's content does not
        depend on what it replaces)."""
        spark = df.sparkSession
        head_v, head = self._head(spark)
        if tag is not None and _tag_seen(head, tag):
            return head_v
        new_files, new_stats, new_schema, new_blooms = self._write_data(df)
        bloom_files = (
            [self._write_bloom_sidecar(spark, new_blooms)]
            if new_blooms
            else []
        )
        for attempt in range(int(retries) + 1):
            try:
                return self._commit(
                    spark, new_files, tag, head, head_v, new_stats,
                    new_schema, df.schema.json(), bloom_files, op=_op,
                )
            except CommitConflict:
                if attempt == int(retries):
                    raise
                head_v, head = self._head(spark)
                if tag is not None and _tag_seen(head, tag):
                    return head_v
        raise AssertionError("unreachable")

    def _reader(self, spark: SparkSession, manifest: dict):
        """Parquet reader pinned to the manifest's recorded schema (the
        column-additive union of every append): files that predate a
        column read it as null instead of the DEFAULT sample-one-file
        behavior, which silently DROPS columns the sampled file lacks.
        Pre-schema manifests (r8 and earlier) keep the old behavior."""
        sj = manifest.get("schema")
        if sj:
            from pyspark.sql.types import StructType

            return spark.read.schema(StructType.fromJson(json.loads(sj)))
        return spark.read

    def _resolve(self, spark: SparkSession, version: int | None) -> dict:
        vs = self.versions(spark)
        if not vs:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} not in {vs}")
        return self._read_manifest(spark, v)

    @staticmethod
    def _to_millis(ts: Any) -> int:
        if isinstance(ts, (int, float)) and not isinstance(ts, bool):
            # epoch seconds (the Python convention); millis for > 1e11
            return int(ts if ts > 1e11 else ts * 1000)
        if isinstance(ts, str):
            ts = datetime.fromisoformat(ts)
        if isinstance(ts, datetime):
            return int(ts.timestamp() * 1000)
        if isinstance(ts, date):
            return int(
                datetime(ts.year, ts.month, ts.day).timestamp() * 1000
            )
        raise TypeError(f"cannot read a timestamp from {ts!r}")

    def version_asof(self, spark: SparkSession, ts: Any) -> int:
        """Timestamp time travel (Delta's TIMESTAMP AS OF / Iceberg's
        snapshot-at): the newest version whose commit landed at or
        before ``ts`` (epoch seconds, a datetime/date, or an ISO
        string; naive inputs read in local time, like the stored
        driver clock). Binary search over the manifests' committed_at
        — O(log versions) metadata reads; commit times are monotone
        BY CONSTRUCTION: _commit clamps each stamp to the parent's
        (history is linear — every commit CASes on its parent — so
        the clamp holds even when writers on different hosts carry
        skewed wall clocks).
        Versions from builds predating the field count as older than
        any stamped one (they are). Raises ValueError when ``ts``
        precedes the whole retained history — vacuum trims how far
        back this can reach, exactly as it trims version travel."""
        target = self._to_millis(ts)
        vs = self.versions(spark)
        if not vs:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")

        def at(v: int):
            # hydrate=False: the binary search reads one scalar per
            # probe — it must never pull a two-level version's whole
            # sidecar chain into the metadata path
            return self._read_manifest(
                spark, v, hydrate=False
            ).get("committed_at")

        lo, hi, best = 0, len(vs) - 1, None
        while lo <= hi:
            mid = (lo + hi) // 2
            c = at(vs[mid])
            if c is None or c <= target:
                best = vs[mid]
                lo = mid + 1
            else:
                hi = mid - 1
        if best is None:
            raise ValueError(
                f"no version as of {ts!r} — the retained history "
                f"starts later (vacuum trims timestamp travel too)"
            )
        return best

    def _write_bloom_sidecar(self, spark: SparkSession, blooms: dict) -> str:
        """Persist a commit's Bloom filters as a SIDECAR next to the
        manifests — the one skipping artifact too heavy to inline
        (~10 bits/row: inlining measurably turned every manifest read
        into a multi-MB JSON parse). uuid-named, written before the
        manifest commit that references it, so readers resolve it only
        through a committed manifest (same invisibility rule as data
        files); unreferenced sidecars are vacuum-reclaimed."""
        name = f"bs-{uuid.uuid4().hex[:12]}.json"
        write_small_json_commit(
            spark,
            os.path.join(self.snaps, name),
            {"blooms": blooms},
            backend=self.backend,
        )
        return name

    def _write_stats_sidecar(self, spark: SparkSession, entries: dict) -> str:
        """Persist ``{file path: stats entry | None}`` as an immutable
        delta sidecar of the two-level manifest (None = a file with
        stats collection disabled: the sidecar is AUTHORITATIVE for
        the file LIST, not just the skipping stats). Same invisibility
        rule as data files and bloom sidecars: written before the
        manifest commit that references it, vacuum-reclaimed when no
        kept manifest does. JSON-encoded like the manifest itself —
        the two-LEVEL structure (delta reuse, O(new) commits, cached
        hydration) is what changes the complexity class; the encoding
        is a constant factor a parquet sidecar could shrink later."""
        name = f"ss-{uuid.uuid4().hex[:12]}.json"
        write_small_json_commit(
            spark,
            os.path.join(self.snaps, name),
            {"entries": entries},
            backend=self.backend,
        )
        # seed the cache with EXACTLY what a reader will parse back
        # (JSON round-trip normalizes tuples->lists etc.), so the
        # reuse check in _plan_stats_sidecars compares like with like
        # AND the next commit/hydration skips one backend read
        self._stats_sidecar_cache_for()[name] = json.loads(
            json.dumps(entries)
        )
        return name

    #: bound on the per-handle sidecar cache: a long-lived handle on an
    #: always-on stream retires sidecars every commit, and an unbounded
    #: cache would pin every dead delta's O(files) entries forever —
    #: memory growing with COMMIT HISTORY, not table size. LRU
    #: eviction (r13: a hit moves to the end — pure insertion order
    #: evicted the OLDEST-inserted entry first, which under pressure is
    #: the head chain's long-lived consolidated sidecar, the hottest
    #: entry, forcing a re-read of the largest sidecar every
    #: commit/hydration once the cache filled); live chains are re-read
    #: on a miss (cheap, and the miss rate is bounded by the chain
    #: length, itself bounded by stats_sidecar_max).
    _STATS_CACHE_MAX = 128

    def _stats_sidecar_cache_for(self) -> dict:
        cache = getattr(self, "_stats_sidecar_cache", None)
        if cache is None:
            cache = self._stats_sidecar_cache = {}
        while len(cache) > self._STATS_CACHE_MAX:
            cache.pop(next(iter(cache)))
        return cache

    def _stats_sidecar_get(self, spark: SparkSession, cache: dict, name: str):
        """Cache lookup with LRU touch: a hit re-inserts at the end so
        size-based eviction (insertion order) drops the coldest entry,
        not the hottest."""
        if name in cache:
            cache[name] = cache.pop(name)
        else:
            cache[name] = read_small_json(
                spark, os.path.join(self.snaps, name),
                backend=self.backend,
            )["entries"]
        return cache[name]

    def _load_stats_sidecars(
        self, spark: SparkSession, names: list[str]
    ) -> dict:
        """Ordered union of the named delta sidecars' entries. Unlike
        bloom sidecars these are AUTHORITATIVE (they carry the file
        list), so a missing one raises instead of degrading."""
        out: dict = {}
        cache = self._stats_sidecar_cache_for()
        for name in names:
            out.update(self._stats_sidecar_get(spark, cache, name))
        return out

    def _plan_stats_sidecars(
        self, spark: SparkSession, parent: dict | None, merged: dict
    ) -> list[str]:
        """Choose this commit's sidecar list: re-reference every parent
        sidecar whose entries are ALL unchanged in ``merged`` (an
        append never touches carried entries, so its whole chain
        re-references — the O(new files) commit), write ONE delta for
        the leftover, and consolidate the chain into a single sidecar
        past ``stats_sidecar_max`` (amortized O(files/max) per commit).
        DML/compact/analyze naturally invalidate exactly the sidecars
        whose files they removed or restated."""
        reused: list[str] = []
        covered: set[str] = set()
        cache = self._stats_sidecar_cache_for()
        for name in (parent or {}).get("stats_sidecars") or []:
            ents = self._stats_sidecar_get(spark, cache, name)
            if ents and all(
                p not in covered and p in merged and merged[p] == e
                for p, e in ents.items()
            ):
                reused.append(name)
                covered.update(ents)
        leftover = {p: e for p, e in merged.items() if p not in covered}
        # consolidation check BEFORE writing the leftover delta — the
        # other order persists a delta the same commit immediately
        # orphans (a wasted write per consolidation cycle)
        if len(reused) + (1 if leftover else 0) > self.stats_sidecar_max:
            return [self._write_stats_sidecar(spark, merged)]
        if leftover:
            return reused + [self._write_stats_sidecar(spark, leftover)]
        return reused

    def _load_blooms(self, spark: SparkSession, manifest: dict) -> dict:
        """{file path: {column: bloom}} union over the manifest's
        sidecars, cached per sidecar name on this handle — an equality
        probe pays each sidecar's bytes once per process; reads without
        equality predicates never load them at all. Sidecar count is
        bounded by append-time consolidation (``bloom_sidecar_max``),
        so a long-lived stream's cold probe pays O(bloom_sidecar_max)
        reads, not O(commits)."""
        return self._load_bloom_files(spark, manifest.get("bloom_files", []))

    def _load_bloom_files(self, spark: SparkSession, names: list[str]) -> dict:
        out: dict = {}
        cache = getattr(self, "_bloom_cache", None)
        if cache is None:
            cache = self._bloom_cache = {}
        for name in names:
            if name not in cache:
                try:
                    cache[name] = read_small_json(
                        spark, os.path.join(self.snaps, name),
                        backend=self.backend,
                    )["blooms"]
                except Exception:
                    cache[name] = {}  # missing sidecar: probes just keep
            for path, cols in cache[name].items():
                out.setdefault(path, {}).update(cols)
        return out

    def _maybe_consolidate_sidecars(
        self, spark: SparkSession, bloom_files: list[str], live_files: set[str]
    ) -> list[str]:
        """Keep the sidecar count bounded on always-on streams: past
        ``bloom_sidecar_max`` per-commit sidecars, union them into ONE
        (dropping entries for files the next manifest no longer lists —
        compacted/overwritten files' filters are dead weight). Amortized
        cost: one read+rewrite of the live bloom set every
        ``bloom_sidecar_max`` commits — O(files/bloom_sidecar_max) per
        commit, the same order the manifest's own file list already
        costs; compaction bounds both. Correctness is untouched: the
        merged sidecar is written BEFORE the manifest that references
        it (same invisibility rule as data files), and a probe that
        cannot read a sidecar just keeps the file."""
        if len(bloom_files) <= self.bloom_sidecar_max:
            return bloom_files
        merged = {
            path: cols
            for path, cols in self._load_bloom_files(spark, bloom_files).items()
            if path in live_files
        }
        if not merged:
            return []
        return [self._write_bloom_sidecar(spark, merged)]

    def prune_files(
        self, spark: SparkSession, where: Any, version: int | None = None
    ) -> tuple[list[str], int]:
        """Evaluate an optree predicate (optree.compile_where shapes)
        against the manifest's per-file stats intervals — pure driver
        work over bounded metadata, zero data I/O. Returns (files that
        can match, total files). Files without stats always survive;
        the caller MUST still apply the real predicate to the scan
        (``read(where=)`` does) — pruning is sound, not exact."""
        m = self._resolve(spark, version)
        files = m["files"]
        stats = m.get("stats", {})
        schema = m.get("stats_schema", {})
        blooms = (
            self._load_blooms(spark, m)
            if _wants_equality(where) and m.get("bloom_files")
            else {}
        )
        kept = [
            f
            for f in files
            if _file_can_match(where, stats.get(f), schema, blooms.get(f))
        ]
        return kept, len(files)

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        where: Any = None,
        as_of: Any = None,
    ) -> DataFrame:
        """The table as of ``version`` (default: latest) — byte-stable
        forever, because the files a manifest names are immutable.
        ``as_of`` resolves a TIMESTAMP instead (version_asof) — "the
        corpus as the trainer saw it last Tuesday" without bookkeeping
        the version number.

        ``where`` (an optree predicate) turns the read selective: files
        whose stats intervals provably cannot match are never scanned
        (data skipping), and the FULL predicate is re-applied to the
        surviving files so the result is identical to
        ``read().filter(...)`` whether or not any file pruned."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass version OR as_of, not both")
            version = self.version_asof(spark, as_of)
        m = self._resolve(spark, version)
        files = m["files"]
        if not files:
            raise ValueError("version is empty")
        if where is None:
            return self._reader(spark, m).parquet(*files)
        from logverzcore_spark.operators.optree import compile_where

        stats = m.get("stats", {})
        schema = m.get("stats_schema", {})
        blooms = (
            self._load_blooms(spark, m)
            if _wants_equality(where) and m.get("bloom_files")
            else {}
        )
        kept = [
            f
            for f in files
            if _file_can_match(where, stats.get(f), schema, blooms.get(f))
        ]
        # All files pruned: keep one file for its schema; the residual
        # filter (provably unsatisfiable over it) returns zero rows.
        target = kept or files[:1]
        return self._reader(spark, m).parquet(*target).filter(
            compile_where(where)
        )

    def count(
        self, spark: SparkSession, version: int | None = None,
        as_of: Any = None,
    ) -> int:
        """Row count of a version from manifest row counts alone — zero
        data I/O when every file carries stats (every post-stats commit
        does); files from pre-stats manifests fall back to one
        distributed count over just those files. ``as_of`` resolves a
        timestamp like :meth:`read`."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass version OR as_of, not both")
            version = self.version_asof(spark, as_of)
        m = self._resolve(spark, version)
        stats = m.get("stats", {})
        total = 0
        missing = []
        for f in m["files"]:
            ent = stats.get(f)
            if ent is not None and ent.get("rows") is not None:
                total += ent["rows"]
            else:
                missing.append(f)
        if missing:
            total += spark.read.parquet(*missing).count()
        return total

    def analyze(
        self, spark: SparkSession, tag: str | None = None
    ) -> int:
        """Backfill stats for head files that lack them (pre-stats
        commits, or a table built with ``stats_columns=False``) and
        commit the SAME file list + completed stats as version N+1 —
        manifests are immutable, so enrichment is a new version. No-op
        (returns the head version, no commit) when nothing is missing."""
        head_v, head = self._head(spark)
        if head is None:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        files = head["files"]
        stats = dict(head.get("stats", {}))
        schema = dict(head.get("stats_schema", {}))
        missing = [f for f in files if f not in stats]
        if not missing:
            return head_v
        new_stats, new_schema, new_blooms = self._collect_stats(spark, missing)
        jpath, fs = hadoop_fs(spark, self.root)
        for p, ent in new_stats.items():
            try:
                ent["bytes"] = int(fs.getFileStatus(jpath(p)).getLen())
            except Exception:
                ent["bytes"] = None
        stats.update(new_stats)
        schema.update(new_schema)
        bloom_files = list(head.get("bloom_files", []))
        if new_blooms:
            bloom_files.append(self._write_bloom_sidecar(spark, new_blooms))
        # carry the head's recorded schema; backfill adds stats only
        return self._commit(
            spark, files, tag, head, head_v, stats, schema,
            head.get("schema"), bloom_files, op="analyze",
        )

    def read_incremental(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
        where: Any = None,
    ) -> DataFrame:
        """Exactly the rows added BETWEEN two versions — the "what's new
        since my last training run" read an incremental pipeline wants,
        at manifest cost: because data files are immutable and appends
        only add paths, the increment is the file-list difference, read
        directly (no corpus diff, no anti-join — q89's content diff is
        for when lineage is unknown; this is for when it's ours).
        ``where`` (optree) additionally SKIPS added files whose stats
        intervals cannot match before the scan and applies the full
        predicate after — a selective incremental consumer (a filtered
        MV, a topic-scoped trainer) reads only the delta files that
        matter.

        Only valid across APPEND commits: if any file of
        ``from_version`` is missing from ``to_version`` an overwrite
        happened in between and the file diff is not the row diff —
        refused loudly rather than answered wrong."""
        vs = self.versions(spark)
        if not vs:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        to = vs[-1] if to_version is None else to_version
        if from_version not in vs or to not in vs or from_version > to:
            raise ValueError(f"bad version range {from_version}..{to} of {vs}")
        old = set(self._manifest(spark, from_version))
        new = self._manifest(spark, to)
        if not old <= set(new):
            raise ValueError(
                f"versions {from_version}..{to} span an overwrite — the "
                "file diff is not the row diff; use read_changes (the "
                "CDF read: per-commit removed-vs-added diff) instead"
            )
        added = [f for f in new if f not in old]
        if not added:
            return self.read(spark, to).limit(0)
        m = self._read_manifest(spark, to)
        if where is not None:
            from logverzcore_spark.operators.optree import compile_where

            stats = m.get("stats", {})
            sschema = m.get("stats_schema", {})
            blooms = (
                self._load_blooms(spark, m)
                if _wants_equality(where) and m.get("bloom_files")
                else {}
            )
            kept = [
                f
                for f in added
                if _file_can_match(where, stats.get(f), sschema, blooms.get(f))
            ]
            target = kept or added[:1]
            return self._reader(spark, m).parquet(*target).filter(
                compile_where(where)
            )
        # the to-version's recorded schema covers every append in the
        # span (column-additive merge at commit), so a delta that
        # predates a later-added column reads it as null instead of
        # whatever single file the sampler picked
        return self._reader(spark, m).parquet(*added)

    @staticmethod
    def _diff_changes(old_df: DataFrame, new_df: DataFrame, keys):
        """Row-level diff of one commit's removed-vs-added files (the
        selective-rewrite set — never the carried files). Keyed: full
        outer join on ``keys`` — old-only → delete, new-only → insert,
        matched with any non-key column changed (null-safe) →
        update_preimage/update_postimage; carried-along neighbors the
        rewrite didn't touch compare equal and drop out, so the feed
        carries SEMANTIC changes, not physical rewrites. Keyless:
        full-row multiset diff (exceptAll) — updates surface as
        delete+insert pairs. Keys must be unique per side (they are
        for any table maintained through merge_into); NULL-key rows
        never join (SQL equality) and surface as delete+insert."""
        cols = old_df.columns
        if not keys:
            return old_df.exceptAll(new_df).select(
                "*", F.lit("delete").alias("_change_type")
            ).unionByName(
                new_df.exceptAll(old_df).select(
                    "*", F.lit("insert").alias("_change_type")
                )
            )
        non_keys = [c for c in cols if c not in keys]
        o = old_df.select(
            *[
                F.col(f"`{c}`").alias(c if c in keys else f"__o_{c}")
                for c in cols
            ],
            F.lit(True).alias("__in_o"),
        )
        n = new_df.select(
            *[
                F.col(f"`{c}`").alias(c if c in keys else f"__n_{c}")
                for c in cols
            ],
            F.lit(True).alias("__in_n"),
        )
        j = o.join(n, on=list(keys), how="full_outer")

        def _img(side: str, ct: str, cond):
            sel = [
                (
                    F.col(f"`{c}`")
                    if c in keys
                    else F.col(f"`__{side}_{c}`")
                ).alias(c)
                for c in cols
            ]
            return j.where(cond).select(
                *sel, F.lit(ct).alias("_change_type")
            )

        parts = [
            _img("o", "delete", F.col("__in_n").isNull()),
            _img("n", "insert", F.col("__in_o").isNull()),
        ]
        if non_keys:
            matched = F.col("__in_o").isNotNull() & F.col("__in_n").isNotNull()
            changed = F.lit(False)
            for c in non_keys:
                changed = changed | ~F.col(f"`__o_{c}`").eqNullSafe(
                    F.col(f"`__n_{c}`")
                )
            parts.append(_img("o", "update_preimage", matched & changed))
            parts.append(_img("n", "update_postimage", matched & changed))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
        keys: str | list[str] | None = None,
    ) -> DataFrame:
        """Change Data Feed (the Delta CDF read, reduced to manifest
        arithmetic): every row-level change AFTER ``from_version`` up
        to ``to_version`` (inclusive), as the table's columns plus
        ``_change_type`` ('insert' / 'delete' / 'update_preimage' /
        'update_postimage') and ``_commit_version``. The consumer half
        of CDC: merge_into / cdc_merge_stream APPLY changes, this
        EMITS them — a derived table, search index, or auditor
        subscribes to a table's mutations instead of diffing corpora
        (read_incremental's overwrite refusal points here).

        SELECTIVE by construction — the 100 TB property: each commit
        contributes only the files it REMOVED and ADDED (for DML
        commits exactly the selective-rewrite slice; the carried files
        are never opened). Append commits stream their added files as
        inserts with zero diffing; compact/analyze commits are
        row-preserving by contract and emit nothing; every other
        overwrite-class commit (delete/update/merge/overwrite/restore)
        gets the removed-vs-added diff of :meth:`_diff_changes`. Both
        sides of every diff read through the TO-version's recorded
        schema, so files predating a later-added column align on
        nulls. Requires the span's versions to still be retained —
        vacuum trims how far behind a subscriber can fall, exactly as
        it trims time travel.

        Plan shape: the result is a UNION of one sub-plan per spanned
        non-trivial commit, so a subscriber catching up over a very
        long span (hundreds of commits) pays O(commits) plan nodes and
        analysis time before any I/O. Page instead: consume N commits
        at a time via ``to_version`` (each page is independently
        correct — the feed is per-commit by construction), which also
        bounds any single job's lineage. Streaming consumers
        (cdc_mv_stream / the MV refresh ladder) never hit this: their
        spans are one trigger's commits."""
        vs = self.versions(spark)
        if not vs:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        to = vs[-1] if to_version is None else to_version
        if from_version not in vs or to not in vs or from_version > to:
            raise ValueError(f"bad version range {from_version}..{to} of {vs}")
        if keys is not None:
            keys = [keys] if isinstance(keys, str) else list(keys)
        m_to = self._read_manifest(spark, to)
        reader = self._reader(spark, m_to)
        span = [v for v in vs if from_version <= v <= to]
        out = None
        prev_files = set(self._manifest(spark, from_version))
        for v in span[1:]:
            m = self._read_manifest(spark, v)
            cur_files = set(m["files"])
            added = sorted(cur_files - prev_files)
            removed = sorted(prev_files - cur_files)
            prev_files = cur_files
            if m.get("op") in ("compact", "analyze"):
                continue  # row-preserving by contract (pytest-proved)
            if not added and not removed:
                continue  # metadata-only commit
            if not removed:
                changes = reader.parquet(*added).select(
                    "*", F.lit("insert").alias("_change_type")
                )
            elif not added:
                changes = reader.parquet(*removed).select(
                    "*", F.lit("delete").alias("_change_type")
                )
            else:
                changes = self._diff_changes(
                    reader.parquet(*removed), reader.parquet(*added), keys
                )
            changes = changes.withColumn(
                "_commit_version", F.lit(v).cast("int")
            )
            out = changes if out is None else out.unionByName(changes)
        if out is not None:
            return out
        anyf = self._manifest(spark, to) or self._manifest(
            spark, from_version
        )
        if not anyf:
            raise ValueError("change feed over empty versions")
        return (
            reader.parquet(anyf[0]).limit(0)
            .withColumn("_change_type", F.lit(""))
            .withColumn("_commit_version", F.lit(0).cast("int"))
        )

    def history(self, spark: SparkSession) -> list[dict]:
        """DESCRIBE HISTORY: one dict per retained version, newest
        first — version, op (what produced it: append / overwrite /
        compact / delete / update / merge / analyze / restore), tag,
        committed_at (epoch millis; None pre-r10), file count, and the
        manifest-summed row count (None when any file lacks stats).
        Pure manifest reads — O(retained versions) metadata, zero data
        I/O; vacuum bounds how far back it reaches."""
        out = []
        for v in reversed(self.versions(spark)):
            m = self._read_manifest(spark, v)
            stats = m.get("stats", {})
            rows: int | None = 0
            for f in m["files"]:
                ent = stats.get(f)
                if ent is None or ent.get("rows") is None:
                    rows = None
                    break
                rows += ent["rows"]
            out.append({
                "version": v,
                "op": m.get("op"),
                "tag": m.get("tag"),
                "committed_at": m.get("committed_at"),
                "n_files": len(m["files"]),
                "rows": rows,
            })
        return out

    def restore(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of: Any = None,
        tag: str | None = None,
        retries: int = 0,
    ) -> int:
        """Roll the head back to an earlier version AS A NEW COMMIT
        (Delta RESTORE): the target manifest's files/stats/schema/bloom
        sidecars are re-committed verbatim under the next version
        number — zero data I/O, because data files are immutable and a
        retained version's files are exactly the ones vacuum kept. The
        bad commit stays in history (auditable, still time-travelable
        until vacuum) instead of being erased; read_incremental refuses
        to span the rollback whenever it dropped files (the overwrite
        rule). ``version`` or ``as_of`` (timestamp) picks the target;
        the tag history carries FORWARD from the current head, not the
        restored manifest — replay idempotence must remember everything
        applied, including the commits being rolled back. ``retries``
        re-executes against the freshly-read head on CommitConflict
        (_rerun_on_conflict)."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass version OR as_of, not both")
            version = self.version_asof(spark, as_of)
        if version is None:
            raise ValueError("restore needs version= or as_of=")
        return self._rerun_on_conflict(
            retries, lambda: self._restore_once(spark, version, tag)
        )

    def _restore_once(
        self, spark: SparkSession, version: int, tag: str | None
    ) -> int:
        head_v, head = self._head(spark)
        if head is None:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        if tag is not None and _tag_seen(head, tag):
            return head_v
        if version == head_v:
            return head_v  # restoring the head is a no-op
        target = self._resolve(spark, version)
        # tag history continues from the CURRENT head; but let the
        # two-level commit re-reference the TARGET's delta sidecars
        # too (its entries are exactly what we re-commit, so a restore
        # writes zero new sidecar bytes instead of a full rewrite)
        parent = head
        if head.get("stats_sidecars") or target.get("stats_sidecars"):
            parent = {
                **head,
                "stats_sidecars": list(
                    dict.fromkeys(
                        (head.get("stats_sidecars") or [])
                        + (target.get("stats_sidecars") or [])
                    )
                ),
            }
        return self._commit(
            spark,
            list(target["files"]),
            tag,
            parent,
            head_v,
            dict(target.get("stats", {})),
            dict(target.get("stats_schema", {})),
            target.get("schema"),
            list(target.get("bloom_files", [])),
            op="restore",
        )

    def vacuum(
        self,
        spark: SparkSession,
        keep_last: int | None = None,
        older_than: Any = None,
        orphan_grace_s: float = 900.0,
        keep_versions: list[int] | None = None,
        return_report: bool = False,
    ) -> int | dict:
        """Drop manifests outside the retention set and delete every
        data COMMIT DIR none of the kept manifests reference (incl.
        orphans from crashed commits — whole dirs, so _SUCCESS markers
        and empty uuid dirs don't accumulate as inode/listing junk on
        a long stream). Returns dirs deleted — or, with
        ``return_report=True``, ``{"deleted", "kept_in_grace",
        "erasure_pending"}``: ``kept_in_grace`` counts unreferenced
        data dirs the in-flight grace kept THIS sweep, and
        ``erasure_pending`` flags that physical bytes therefore remain
        on disk until they age past ``orphan_grace_s`` and a later
        vacuum reclaims them — the number a compliance caller must
        watch (see the GDPR note below).

        Retention composes by UNION (Delta's retention shape):

        - ``keep_last`` keeps the newest N versions — the version-
          count policy (default 2 when ``older_than`` is absent;
          0 = explicit full teardown).
        - ``older_than`` keeps every version whose ``committed_at`` is
          at or after the cutoff (epoch seconds, datetime/date, or ISO
          string — _to_millis shapes), PLUS the head, which is never
          age-vacuumed. On an always-on tagged stream, N versions is
          minutes — "keep 7 days" (``older_than=now - 7*86400``) is
          the retention contract that composes with timestamp time
          travel: travel inside the window survives, outside raises.
          This is also the GDPR schedule hook: ``delete_where`` is
          complete erasure only after a vacuum whose cutoff passes the
          delete (the pre-delete rows live on in prior versions until
          their manifests drop) — AND, because of the in-flight grace
          below, a vacuum fired within ``orphan_grace_s`` of the
          delete DEFERS the physical reclaim of the just-retired dirs
          even after their manifests drop (time travel is gone, bytes
          are not — yet). Erasure-on-a-deadline callers must either
          schedule the vacuum past the grace, pass a smaller
          ``orphan_grace_s`` after quiescing writers, or watch
          ``return_report``'s ``erasure_pending`` and re-vacuum.
        - ``keep_versions`` pins EXPLICIT versions into the retained
          set regardless of count/age — what the Engine's cataloged
          snapshot pins need: a registered view's version must never
          be vacuumed out from under its readers.

        Time travel to vacuumed versions is gone; replay idempotence
        is NOT — the tag history lives in the head manifest, which
        vacuum always keeps.

        IN-FLIGHT-COMMIT GRACE: a concurrent committer writes its data
        dir and bloom sidecar BEFORE the manifest that references
        them, so an unreferenced artifact is not necessarily garbage —
        deleting an in-flight data dir would land that commit
        referencing deleted files (permanent corruption). Unreferenced
        dirs/sidecars are reclaimed only when BOTH (a) older than the
        newest kept manifest and (b) older than ``orphan_grace_s``
        wall-clock seconds (the Delta-style retention check — (a)
        alone misses a writer whose write→commit window spans another
        writer's commit, exactly what ``retries=`` loops do). True
        crash orphans age past the grace and are reclaimed by the next
        vacuum. The grace is a mitigation, not a proof: a writer
        stalled longer than ``orphan_grace_s`` mid-commit can still
        lose its dir — quiesce writers (or raise the grace) when that
        window is possible. ``keep_last=0`` full teardown skips the
        grace entirely."""
        import time as _time

        jpath, fs = hadoop_fs(spark, self.root)
        vs = self.versions(spark)
        if keep_last is None and older_than is None:
            keep_last = 2
        keep_set: set[int] = set(vs[-keep_last:]) if keep_last else set()
        if older_than is not None and vs:
            cutoff = self._to_millis(older_than)
            for v in vs:
                # hydrate=False: one scalar per version — and on the
                # self-heal path after a crashed sweep this walk must
                # not require every listed version's chain to resolve
                ca = self._read_manifest(
                    spark, v, hydrate=False
                ).get("committed_at")
                if ca is not None and ca >= cutoff:
                    keep_set.add(v)
            keep_set.add(vs[-1])  # the head is never age-vacuumed
        if keep_versions:
            keep_set.update(v for v in keep_versions if v in vs)
        keep = [v for v in vs if v in keep_set]
        referenced_dirs: set[str] = set()
        for v in keep:
            for f in self._manifest(spark, v):
                referenced_dirs.add(os.path.dirname(f))

        def _fs_mtime(path: str) -> float | None:
            if self.backend is not None:
                return self.backend.mtime(path)
            try:
                return fs.getFileStatus(jpath(path)).getModificationTime() / 1000.0
            except Exception:
                return None

        head_mt = (
            _fs_mtime(os.path.join(self.snaps, f"v{keep[-1]}.json"))
            if keep
            else math.inf  # keep_last=0: full teardown, no grace needed
        )
        now = _time.time()

        def _in_grace(mt: float | None) -> bool:
            """True = possibly in-flight, keep (see the grace note)."""
            if not keep:
                return False  # explicit teardown reclaims everything
            if head_mt is None or mt is None:
                return True  # unknown mtimes keep; a later vacuum reclaims
            return mt >= head_mt or mt >= now - orphan_grace_s

        deleted = 0
        kept_in_grace = 0
        if fs.exists(jpath(self.data)):
            for st in fs.listStatus(jpath(self.data)):
                p = st.getPath().toString()
                if st.isDirectory() and p not in referenced_dirs:
                    if _in_grace(st.getModificationTime() / 1000.0):
                        kept_in_grace += 1
                        continue
                    fs.delete(st.getPath(), True)
                    deleted += 1
        referenced_sidecars: set[str] = set()
        for v in keep:
            km = self._read_manifest(spark, v, hydrate=False)
            referenced_sidecars.update(km.get("bloom_files", []))
            # two-level manifests: their delta stats sidecars are
            # AUTHORITATIVE (they carry the file list) — shared across
            # versions by delta reuse, so the union over kept versions
            # is exactly the live set
            referenced_sidecars.update(km.get("stats_sidecars", []))
        # Dropped manifests go BEFORE their sidecars: stats sidecars
        # are authoritative (hydration raises on a missing one), so a
        # crash between the two sweeps must never leave a still-listed
        # version whose chain is gone — versions() would then blow up
        # every metadata walk (history, the older_than scan) including
        # the re-vacuum that would have healed it. This order's crash
        # window leaves only unreferenced sidecars, which the next
        # vacuum reclaims.
        for v in vs:
            if v not in keep:
                mpath = os.path.join(self.snaps, f"v{v}.json")
                if self.backend is not None:
                    self.backend.delete(mpath)
                else:
                    fs.delete(jpath(mpath), False)
        if self.backend is not None:
            snap_names = self.backend.list_dir(self.snaps)
        elif fs.exists(jpath(self.snaps)):
            snap_names = [
                st.getPath().getName() for st in fs.listStatus(jpath(self.snaps))
            ]
        else:
            snap_names = []

        # Same in-flight grace as the data dirs above — a bloom
        # sidecar loss is softer (sound via the _load_blooms fallback,
        # only Bloom pruning silently lost), a stats sidecar loss is
        # NOT (it carries the file list), but both reclaim only when
        # unreferenced by every kept manifest AND aged past the grace,
        # so a referenced one is never touched.
        for name in snap_names:
            if (
                name.startswith(("bs-", "ss-"))
                and name not in referenced_sidecars
            ):
                spath = os.path.join(self.snaps, name)
                if _in_grace(_fs_mtime(spath)):
                    continue
                if self.backend is not None:
                    self.backend.delete(spath)
                else:
                    fs.delete(jpath(spath), False)
        if return_report:
            return {
                "deleted": deleted,
                "kept_in_grace": kept_in_grace,
                "erasure_pending": kept_in_grace > 0,
            }
        return deleted

    def compact(
        self,
        spark: SparkSession,
        sort_cols: list[str] | None = None,
        target_files: int | None = None,
        tag: str | None = None,
        zorder_cols: list[str] | None = None,
        where: Any = None,
        retries: int = 0,
    ) -> int:
        """Rewrite the head (or just a SLICE of it — ``where``) as one
        fresh commit with fewer, optionally RANGE-SORTED files — the
        maintenance move that keeps both manifest size (file count
        bounds metadata) and SKIPPING QUALITY (sorted files have tight
        disjoint stat intervals; an append-only history accumulates
        overlap until predicates stop pruning) healthy. Rows are
        identical by construction (one read, one write, no filter);
        committed as a rewrite, so prior versions still time-travel but
        read_incremental refuses to span it — the same contract as any
        overwrite. ``skipping_health`` prices when this is worth
        running.

        ``where`` (an optree predicate) scopes the rewrite to the FILES
        the predicate cannot prune — the 100 TB move: compact a
        PARTITION's files when its overlap drifts instead of rewriting
        the whole table (a full compact of 100 TB is a 100 TB write; a
        day-partition compact is that day's). File-level, not row-
        level: every selected file is rewritten WHOLE (no residual
        filter — compaction must never change rows), every other file
        carries into the new manifest untouched, byte-identical, stats
        and bloom filters intact. Returns the head version unchanged
        when the predicate selects nothing.

        ``zorder_cols`` (2+ numeric columns) clusters on a Morton key
        instead of a lexicographic sort: files get tight envelopes on
        EVERY listed column at once, so predicates on ANY of them prune
        — the OPTIMIZE ZORDER move, reusing export.zorder_key. The
        grid bounds come from the MANIFEST stats when every file
        carries them (zero extra I/O — the stats pay for themselves
        twice; scoped to the selected files under ``where``) and fall
        back to one tiny agg otherwise; NULL cells coalesce to the
        column floor (export_zordered's contract).

        ``retries`` re-EXECUTES the whole compaction against the
        freshly-read head on CommitConflict (_rerun_on_conflict — a
        compaction's output derives from the head, so it must re-run,
        never re-point); default 0 keeps the loud raise."""
        if zorder_cols and sort_cols:
            raise ValueError("pass sort_cols OR zorder_cols, not both")
        return self._rerun_on_conflict(
            retries, lambda: self._compact_once(
                spark, sort_cols, target_files, tag, zorder_cols, where
            )
        )

    def _compact_once(
        self, spark: SparkSession, sort_cols, target_files,
        tag: str | None, zorder_cols, where: Any,
    ) -> int:
        if where is None:
            df = self._layout(
                spark, self.read(spark), sort_cols, target_files,
                zorder_cols, None,
            )
            return self.overwrite(df, tag=tag, _op="compact")
        head_v, head = self._head(spark)
        if head is None:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        if tag is not None and _tag_seen(head, tag):
            return head_v
        selected, _total = self.prune_files(spark, where)
        if not selected:
            return head_v
        sel = set(selected)
        carried = [f for f in head["files"] if f not in sel]
        df = self._layout(
            spark,
            self._reader(spark, head).parquet(*selected),
            sort_cols, target_files, zorder_cols, selected,
        )
        new_files, new_stats, new_schema, new_blooms = self._write_data(df)
        stats = {
            f: head.get("stats", {})[f]
            for f in carried
            if f in head.get("stats", {})
        }
        stats.update(new_stats)
        schema = {**(head.get("stats_schema", {}) or {}), **new_schema}
        bloom_files = list(head.get("bloom_files", []))
        if new_blooms:
            bloom_files.append(self._write_bloom_sidecar(spark, new_blooms))
        bloom_files = self._maybe_consolidate_sidecars(
            spark, bloom_files, set(carried) | set(new_files)
        )
        return self._commit(
            spark, carried + new_files, tag, head, head_v, stats, schema,
            head.get("schema"), bloom_files, op="compact",
        )

    def _rerun_on_conflict(self, retries: int, run):
        """Convergence loop for the selective-rewrite ops (delete /
        update / merge / compact / restore): their output DERIVES from
        the head's files, so a lost commit race must RE-EXECUTE the
        whole operation against the freshly-read head — never re-point
        already-written files, which is sound only for append/overwrite
        (the documented asymmetry at append()). Each re-run re-reads
        the head and re-checks the tag (a racer may have applied it);
        a lost attempt's data files stay orphaned and invisible until
        vacuum reclaims them."""
        for attempt in range(int(retries) + 1):
            try:
                return run()
            except CommitConflict:
                if attempt == int(retries):
                    raise
        raise AssertionError("unreachable")

    def delete_where(self, spark: SparkSession, where: Any,
                     tag: str | None = None, retries: int = 0) -> int:
        """Delete the rows matching an optree predicate — as a STATS-
        PRUNED selective rewrite: only the files whose intervals/bloom
        filters admit a match are rewritten (with matching rows
        removed); every other file carries into the new manifest
        untouched, byte-identical. The GDPR/right-to-erasure move on a
        pinned corpus (reference parity: q113's point-delete via
        export.delete_rows, one layer down at the snapshot table) —
        deleting one user from 100 TB rewrites the handful of files a
        point lookup would scan, not the table.

        SQL DELETE semantics: rows where the predicate is TRUE go;
        FALSE and NULL rows stay (three-valued logic — ``NOT p`` alone
        would silently drop NULL rows). Committed as an overwrite for
        lineage purposes: prior versions still time-travel to the
        pre-delete rows (run ``vacuum`` to physically reclaim them —
        erasure isn't complete until then), ``read_incremental``
        refuses to span it, and an incremental MV downstream answers
        with a rebuild (deletes invalidate deltas by definition).
        Returns the new version — or the head version unchanged when
        pruning proves nothing matches.

        ``retries`` is the multi-writer convergence loop: on
        CommitConflict the whole delete RE-EXECUTES against the
        freshly-read head (re-pointing would resurrect rows a racing
        writer just changed — see _rerun_on_conflict). Default 0
        keeps the loud raise."""
        return self._rerun_on_conflict(
            retries, lambda: self._delete_where_once(spark, where, tag)
        )

    def _delete_where_once(
        self, spark: SparkSession, where: Any, tag: str | None
    ) -> int:
        from logverzcore_spark.operators.optree import compile_where

        head_v, head = self._head(spark)
        if head is None:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        if tag is not None and _tag_seen(head, tag):
            return head_v
        selected, _total = self.prune_files(spark, where)
        if not selected:
            return head_v  # provably no matching row anywhere
        sel = set(selected)
        carried = [f for f in head["files"] if f not in sel]
        keep_pred = ~F.coalesce(compile_where(where), F.lit(False))
        df = self._reader(spark, head).parquet(*selected).filter(keep_pred)
        new_files, new_stats, new_schema, new_blooms = self._write_data(df)
        stats = {
            f: head.get("stats", {})[f]
            for f in carried
            if f in head.get("stats", {})
        }
        stats.update(new_stats)
        schema = {**(head.get("stats_schema", {}) or {}), **new_schema}
        bloom_files = list(head.get("bloom_files", []))
        if new_blooms:
            bloom_files.append(self._write_bloom_sidecar(spark, new_blooms))
        bloom_files = self._maybe_consolidate_sidecars(
            spark, bloom_files, set(carried) | set(new_files)
        )
        return self._commit(
            spark, carried + new_files, tag, head, head_v, stats, schema,
            head.get("schema"), bloom_files, op="delete",
        )

    def update_where(
        self,
        spark: SparkSession,
        where: Any,
        set: dict[str, Any],
        tag: str | None = None,
        retries: int = 0,
    ) -> int:
        """UPDATE ... SET at the snapshot layer — the same stats/bloom-
        pruned selective rewrite as :meth:`delete_where`: only files
        whose intervals admit a match are rewritten (matching rows get
        ``set`` applied, their neighbors ride along unchanged); every
        other file carries over path-identical. The redaction
        complement of erasure: masking one user's rows in 100 TB
        rewrites the files a point lookup would scan.

        ``set`` maps column name → new value (a Column, or a SQL
        expression string compiled with F.expr — it may reference other
        columns, e.g. ``{"email": "sha2(email, 256)"}``). SQL UPDATE
        semantics: the assignment applies where the predicate is TRUE;
        FALSE and NULL rows keep their values. Columns must already
        exist and keep their types (new values are cast to the current
        type; widening a type is schema evolution's job, not UPDATE's).
        Committed as an overwrite for lineage — time travel keeps the
        pre-update rows until vacuum, read_incremental refuses the
        span, a downstream MV rebuilds. ``retries`` re-EXECUTES the
        whole update against the freshly-read head on CommitConflict
        (_rerun_on_conflict); default 0 keeps the loud raise."""
        return self._rerun_on_conflict(
            retries, lambda: self._update_where_once(spark, where, set, tag)
        )

    def _update_where_once(
        self, spark: SparkSession, where: Any, set: dict[str, Any],
        tag: str | None,
    ) -> int:
        from logverzcore_spark.operators.optree import compile_where

        head_v, head = self._head(spark)
        if head is None:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        if tag is not None and _tag_seen(head, tag):
            return head_v
        selected, _total = self.prune_files(spark, where)
        if not selected:
            return head_v  # provably no matching row anywhere
        selected_set = frozenset(selected)
        carried = [f for f in head["files"] if f not in selected_set]
        src = self._reader(spark, head).parquet(*selected)
        missing = [c for c in set if c not in src.columns]
        if missing:
            raise ValueError(f"update_where: no such column(s): {missing}")
        pred = F.coalesce(compile_where(where), F.lit(False))
        types = {f.name: f.dataType for f in src.schema.fields}
        cols = []
        for name in src.columns:
            if name in set:
                new = set[name]
                new = F.expr(new) if isinstance(new, str) else new
                cols.append(
                    F.when(pred, new.cast(types[name]))
                    .otherwise(F.col(f"`{name}`"))
                    .alias(name)
                )
            else:
                cols.append(F.col(f"`{name}`"))
        df = src.select(*cols)
        new_files, new_stats, new_schema, new_blooms = self._write_data(df)
        stats = {
            f: head.get("stats", {})[f]
            for f in carried
            if f in head.get("stats", {})
        }
        stats.update(new_stats)
        schema = {**(head.get("stats_schema", {}) or {}), **new_schema}
        bloom_files = list(head.get("bloom_files", []))
        if new_blooms:
            bloom_files.append(self._write_bloom_sidecar(spark, new_blooms))
        bloom_files = self._maybe_consolidate_sidecars(
            spark, bloom_files, {*carried, *new_files}
        )
        return self._commit(
            spark, carried + new_files, tag, head, head_v, stats, schema,
            head.get("schema"), bloom_files, op="update",
        )

    #: merge_into collects source keys for an exact (bloom-capable)
    #: prune up to this many distinct keys — an in-list for single
    #: keys, zipped key TUPLES evaluated per file for composite keys;
    #: larger sources fall back to per-column [min,max] interval
    #: pruning (zero collect).
    _MERGE_INLIST_MAX_KEYS = 10_000

    def merge_into(
        self,
        spark: SparkSession,
        source: DataFrame,
        on: str | list[str],
        when_matched: str = "update",
        when_not_matched: str = "insert",
        tag: str | None = None,
        retries: int = 0,
    ) -> int:
        """MERGE INTO at the snapshot layer — the Delta/Iceberg upsert
        core, as the same SELECTIVE rewrite as delete_where/
        update_where: the only target files read or rewritten are the
        ones whose key stats admit ANY source key (small sources
        additionally collect their keys for an exact in-list prune,
        which the per-file Bloom filters then sharpen on random
        layouts); every other file carries over path-identical. The
        CDC-apply cost model at 100 TB: a daily upsert batch rewrites
        the files its keys live in, not the table.

        ``on`` names the key column(s). ``when_matched`` ∈ {'update',
        'delete', 'ignore'}: 'update' replaces the target's values of
        every NON-KEY column the source carries (UPDATE SET * for the
        shared columns; target-only columns keep their values);
        'delete' drops matched target rows. ``when_not_matched`` ∈
        {'insert', 'ignore'}: 'insert' appends source rows with no
        target match, filling target-only columns with NULL (source
        columns must be a subset of the target's — new columns are
        schema evolution's job, an append, not MERGE's). Duplicate
        source keys are REFUSED (a target row matching two source rows
        is ambiguous — the same refusal Delta raises); NULL source
        keys never match (SQL equality) and so insert under 'insert'.

        Soundness of the file scoping: pruning keeps every file that
        COULD hold a source key, so files left out provably contain no
        match — which is exactly why the not-matched (insert) side only
        needs the anti-join against the SELECTED files' rows, never the
        whole table. Committed as an overwrite (time travel to the
        pre-merge version; read_incremental refuses the span; a
        downstream MV rebuilds). Returns the new version, or the head
        version unchanged when there is provably nothing to do.
        Reference parity: q114's MERGE/SCD2 family one layer down, on
        the versioned table; q121's rank-movers CDC is the natural
        source producer. ``retries`` re-EXECUTES the whole merge
        against the freshly-read head on CommitConflict
        (_rerun_on_conflict) — what a CDC applier sharing the table
        with a nightly compactor wants; default 0 keeps the loud
        raise."""
        return self._rerun_on_conflict(
            retries, lambda: self._merge_into_once(
                spark, source, on, when_matched, when_not_matched, tag
            )
        )

    def _merge_into_once(
        self, spark: SparkSession, source: DataFrame, on,
        when_matched: str, when_not_matched: str, tag: str | None,
    ) -> int:
        keys = [on] if isinstance(on, str) else list(on)
        if when_matched not in ("update", "delete", "ignore"):
            raise ValueError(f"when_matched: {when_matched!r}")
        if when_not_matched not in ("insert", "ignore"):
            raise ValueError(f"when_not_matched: {when_not_matched!r}")
        head_v, head = self._head(spark)
        if head is None:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        if tag is not None and _tag_seen(head, tag):
            return head_v
        if not head["files"]:
            raise ValueError(
                "merge_into: the head version is empty — append() the "
                "source instead"
            )
        tgt_cols = list(
            self._reader(spark, head).parquet(head["files"][0]).columns
        )
        extra = [c for c in source.columns if c not in tgt_cols]
        if extra:
            raise ValueError(
                f"merge_into: source carries columns the target lacks "
                f"{extra} — append() with schema evolution first"
            )
        for k in keys:
            if k not in source.columns:
                raise ValueError(f"merge_into: source lacks key column {k!r}")
        # one small pass over the SOURCE (the small side by assumption):
        # key bounds for pruning + the duplicate-key refusal
        aggs = [
            F.count(F.lit(1)).alias("__n"),
            F.count_distinct(*[F.col(k) for k in keys]).alias("__nd"),
            F.sum(
                F.when(
                    F.greatest(*[F.col(k).isNull() for k in keys])
                    if len(keys) > 1
                    else F.col(keys[0]).isNull(),
                    1,
                ).otherwise(0)
            ).alias("__nulls"),
        ]
        for k in keys:
            aggs += [F.min(k).alias(f"__lo_{k}"), F.max(k).alias(f"__hi_{k}")]
        srow = source.agg(*aggs).first()
        n_src, n_keys = srow["__n"], srow["__nd"]
        if n_src == 0:
            return head_v
        if n_keys + srow["__nulls"] < n_src:
            raise ValueError(
                "merge_into: duplicate source keys — a matched target "
                "row would be updated ambiguously; dedupe the source "
                "(e.g. keep-latest per key) first"
            )
        where = None
        if 0 < n_keys <= self._MERGE_INLIST_MAX_KEYS:
            from logverzcore_spark.operators.optree import type_literal

            # NULL keys never match (SQL equality) — they insert, and
            # inserts need no target file, so they don't constrain the
            # prune
            krows = (
                source.select(*keys)
                .na.drop("any", subset=keys)
                .distinct()
                .collect()
            )
            # the exact prune is only sound for values the optree
            # layer would take VERBATIM — a string key like '5' or
            # 'null' means the characters here (join equality), not
            # optree's typed-literal reading, so such sources fall
            # back to interval pruning
            if krows and all(
                not isinstance(v, str) or type_literal(v) == v
                for r in krows
                for v in r
            ):
                if len(keys) == 1:
                    where = {keys[0]: {"in": [r[0] for r in krows]}}
                else:
                    # COMPOSITE keys: exact TUPLE prune — a file
                    # survives only if SOME source key tuple fits ALL
                    # its per-column intervals/blooms (any-tuple-can-
                    # match keeps). The per-column bounding box alone
                    # selects the cross-product BOX of the key set: on
                    # two scattered key columns that is every file.
                    # The box still leads the conjunction so off-box
                    # files reject in O(keys) and only in-box files
                    # pay the O(tuples) scan (early-exit on the first
                    # tuple that fits — _file_can_match's any()).
                    box = [
                        {k: {"between": [srow[f"__lo_{k}"], srow[f"__hi_{k}"]]}}
                        for k in keys
                        if srow[f"__lo_{k}"] is not None
                    ]
                    tuples = {
                        "or": [
                            {"and": [{k: {"eq": r[k]}} for k in keys]}
                            for r in krows
                        ]
                    }
                    where = {"and": box + [tuples]}
        if where is None:
            clauses = [
                {k: {"between": [srow[f"__lo_{k}"], srow[f"__hi_{k}"]]}}
                for k in keys
                if srow[f"__lo_{k}"] is not None
            ]
            where = {"and": clauses} if clauses else None
        selected, _total = (
            self.prune_files(spark, where) if where is not None else ([], 0)
        )
        if not selected and when_not_matched == "ignore":
            return head_v  # provably no match, and inserts are off
        selected_set = frozenset(selected)
        carried = [f for f in head["files"] if f not in selected_set]
        if selected:
            tgt = self._reader(spark, head).parquet(*selected)
        else:
            tgt = self._reader(spark, head).parquet(head["files"][0]).limit(0)
        types = {f.name: f.dataType for f in tgt.schema.fields}
        s_renamed = source.select(
            *[F.col(f"`{k}`") for k in keys],
            F.lit(True).alias("__s"),
            *[
                F.col(f"`{c}`").alias(f"__s_{c}")
                for c in source.columns
                if c not in keys
            ],
        )
        t_flagged = tgt.withColumn("__t", F.lit(True))
        j = t_flagged.join(s_renamed, on=keys, how="full_outer")
        matched = F.col("__t").isNotNull() & F.col("__s").isNotNull()
        s_only = F.col("__t").isNull()
        keep = F.lit(True)
        if when_matched == "delete":
            keep = keep & ~matched
        if when_not_matched == "ignore":
            keep = keep & ~s_only
        out_cols = []
        src_set = frozenset(source.columns)
        for c in tgt.columns:
            if c in keys:
                # USING-coalesced; cast back so a wider-typed source
                # can never change the committed physical schema
                out_cols.append(F.col(f"`{c}`").cast(types[c]).alias(c))
                continue
            t_val = F.col(f"`{c}`")
            s_val = (
                F.col(f"`__s_{c}`").cast(types[c])
                if c in src_set
                else F.lit(None).cast(types[c])
            )
            expr = F.when(s_only, s_val)
            if when_matched == "update" and c in src_set:
                expr = expr.when(matched, s_val)
            out_cols.append(expr.otherwise(t_val).alias(c))
        df = j.where(keep).select(*out_cols)
        new_files, new_stats, new_schema, new_blooms = self._write_data(df)
        stats = {
            f: head.get("stats", {})[f]
            for f in carried
            if f in head.get("stats", {})
        }
        stats.update(new_stats)
        schema = {**(head.get("stats_schema", {}) or {}), **new_schema}
        bloom_files = list(head.get("bloom_files", []))
        if new_blooms:
            bloom_files.append(self._write_bloom_sidecar(spark, new_blooms))
        bloom_files = self._maybe_consolidate_sidecars(
            spark, bloom_files, {*carried, *new_files}
        )
        return self._commit(
            spark, carried + new_files, tag, head, head_v, stats, schema,
            head.get("schema"), bloom_files, op="merge",
        )

    def _layout(
        self,
        spark: SparkSession,
        df: DataFrame,
        sort_cols,
        target_files,
        zorder_cols,
        bounds_files: list[str] | None,
    ) -> DataFrame:
        """Apply a compaction's physical layout: Z-order clustering,
        range sort, or plain coalesce. ``bounds_files`` scopes the
        manifest-stat Z-order bound fold to a file subset (partition-
        scoped compaction); None folds over the whole head."""
        if zorder_cols:
            from logverzcore_spark.export import zorder_key

            bounds, inputs = self._zorder_bounds(
                spark, df, zorder_cols, files=bounds_files
            )
            return (
                df.withColumn("__zk", zorder_key(inputs, bounds))
                .repartitionByRange(target_files or 16, "__zk")
                .sortWithinPartitions("__zk")
                .drop("__zk")
            )
        if sort_cols:
            return df.repartitionByRange(
                *(target_files,) if target_files else (),
                *[df[c] for c in sort_cols],
            ).sortWithinPartitions(*sort_cols)
        if target_files:
            return df.coalesce(target_files)
        return df

    def _zorder_bounds(
        self, spark: SparkSession, df: DataFrame, cols,
        files: list[str] | None = None,
    ):
        """(bounds, key inputs) for a Z-order compaction. Per-column
        min/max fold from the manifest stats when complete (driver
        arithmetic, zero data I/O; over ``files`` when given — the
        partition-scoped case — else the whole head); one small agg
        otherwise. Degenerate handling matches export_zordered:
        all-NULL column → synthetic (0,1), constant → widened, NULL
        cells → column floor."""
        m = self._resolve(spark, None)
        stats = m.get("stats", {})
        sschema = m.get("stats_schema", {})
        scope = m["files"] if files is None else files
        lo_hi: dict[str, tuple] = {}
        complete = bool(scope) and all(f in stats for f in scope)
        if complete:
            for c in cols:
                if sschema.get(c) not in _STAT_NUMERIC:
                    complete = False
                    break
                los = []
                his = []
                for f in scope:
                    ent = stats[f]["cols"].get(c)
                    if ent is None:
                        continue  # pre-column file: contributes no rows
                    if stats[f].get("rows") == 0 or (
                        ent["min"] is None and ent["nulls"] == stats[f]["rows"]
                    ):
                        continue  # empty / all-null file
                    if ent["min"] is None or ent["max"] is None:
                        complete = False  # dropped bound (NaN): fold unsafe
                        break
                    los.append(ent["min"])
                    his.append(ent["max"])
                if not complete:
                    break
                lo_hi[c] = (min(los), max(his)) if los else (None, None)
        if not complete:
            aggs = []
            for c in cols:
                aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
            row = df.agg(*aggs).first()
            lo_hi = {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}
        bounds, inputs = [], []
        for c in cols:
            lo, hi = lo_hi[c]
            lo = None if lo is None else float(lo)
            hi = None if hi is None else float(hi)
            if lo is None:
                lo, hi = 0.0, 1.0
            elif hi is None or not hi > lo:
                hi = lo + 1.0
            bounds.append((lo, hi))
            inputs.append(F.coalesce(F.col(c).cast("double"), F.lit(lo)))
        return bounds, inputs

    def skipping_health(
        self, spark: SparkSession, column: str, version: int | None = None,
        where: Any = None,
    ) -> dict:
        """How well would predicates on ``column`` prune this version?
        Pure driver arithmetic over the manifest stats (zero data I/O).
        ``where`` scopes the measurement to the files an optree
        predicate cannot prune — ask "has THIS partition's overlap
        drifted?" and feed the same predicate to ``compact(where=)``
        when it has, leaving the rest of a 100 TB table unread and
        unwritten:

        - ``avg_overlap``: mean number of OTHER files whose [min,max]
          interval intersects each file's — 0 means perfectly disjoint
          (a point predicate touches ~1 file), n_files-1 means every
          file overlaps every other (pruning is dead). The Delta
          OPTIMIZE / clustering-depth measurement.
        - ``coverage``: fraction of files carrying usable bounds on the
          column at all (pre-stats commits and dropped bounds erode it).

        The d30 ``rebuild_when`` pattern applied to layout: compact
        (with ``sort_cols=[column]``) when avg_overlap drifts above a
        few files — correctness never depends on it, reads just stop
        skipping."""
        m = self._resolve(spark, version)
        files = m["files"]
        stats = m.get("stats", {})
        if where is not None:
            sschema = m.get("stats_schema", {})
            files = [
                f
                for f in files
                if _file_can_match(where, stats.get(f), sschema)
            ]
            if not files:
                return {
                    "files": 0, "with_bounds": 0,
                    "coverage": 0.0, "avg_overlap": 0.0,
                }
        ivals = []
        for f in files:
            ent = stats.get(f, {}).get("cols", {}).get(column)
            if ent and ent.get("min") is not None and ent.get("max") is not None:
                ivals.append((ent["min"], ent["max"]))
        n = len(ivals)
        if n <= 1:
            return {
                "files": len(files), "with_bounds": n,
                "coverage": n / len(files) if files else 0.0,
                "avg_overlap": 0.0,
            }
        # Exact pairwise intersection count. O(n^2) driver arithmetic
        # over file COUNT (which compaction bounds): a 5k-file manifest
        # is 25M comparisons of floats — milliseconds; a sweep-line
        # upgrade only matters past ~100k files, i.e. after compaction
        # was already skipped too long.
        overlaps = []
        for lo, hi in ivals:
            c = sum(
                1 for lo2, hi2 in ivals if not (hi2 < lo or lo2 > hi)
            ) - 1
            overlaps.append(c)
        avg = sum(overlaps) / n
        return {
            "files": len(files),
            "with_bounds": n,
            "coverage": n / len(files),
            "avg_overlap": round(avg, 3),
        }

    def estimate(
        self,
        spark: SparkSession,
        where: Any = None,
        version: int | None = None,
    ) -> dict:
        """Price a (possibly selective) read from the MANIFEST alone —
        zero data I/O: rows and bytes summed over the files the
        predicate cannot prune (an UPPER bound on what the scan will
        touch; the residual filter can only shrink it). The admission-
        control half of data skipping: an interactive server rejects
        scan-the-world requests over a pinned corpus without burning a
        job (Engine.estimate_find wires it into the gated surface).
        Files without stats contribute unknown rows/bytes, reported in
        ``files_unstatted`` so the caller knows the bound is partial."""
        m = self._resolve(spark, version)
        files = m["files"]
        stats = m.get("stats", {})
        sschema = m.get("stats_schema", {})
        if where is None:
            kept = list(files)
        else:
            blooms = (
                self._load_blooms(spark, m)
                if _wants_equality(where) and m.get("bloom_files")
                else {}
            )
            kept = [
                f
                for f in files
                if _file_can_match(where, stats.get(f), sschema, blooms.get(f))
            ]
        rows = 0
        bts = 0
        unstatted = 0
        for f in kept:
            ent = stats.get(f)
            if ent is None or ent.get("rows") is None:
                unstatted += 1
                continue
            rows += ent["rows"]
            bts += ent.get("bytes") or 0
        return {
            "est_rows": rows,
            "est_bytes": bts,
            "files_scanned": len(kept),
            "files_total": len(files),
            "files_unstatted": unstatted,
        }
