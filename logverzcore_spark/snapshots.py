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
  buys O(1)-step recovery and trivially correct reads) plus the
  CUMULATIVE tag history (every commit tag ever applied), so replay
  idempotence survives vacuum and costs ONE manifest read per commit,
  not one per version.
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

Capacity note for 100 TB: manifests hold file PATHS and tags
(metadata-scale — bounded by file count, which compaction bounds, and
commit count); data-file I/O is the normal distributed parquet scan over
an explicit file list, identical in plan shape to any other read here.
"""

from __future__ import annotations

import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from logverzcore_spark.fsutil import (
    CommitConflict,
    break_commit_lock,
    hadoop_fs,
    read_small_json,
    write_small_json_exclusive,
)

__all__ = ["SnapshotTable", "CommitConflict"]

_VRE = re.compile(r"^v(\d+)\.json$")


class SnapshotTable:
    def __init__(self, root: str, backend=None):
        """``backend`` routes every MANIFEST read/commit through a
        :class:`fsutil.CommitBackend` — pass a ConditionalPutBackend on
        object stores (fsutil's atomicity-scope note); default keeps
        the Hadoop rename family. Data files need no backend: they are
        immutable uuid-named parquet, never renamed or overwritten, and
        invisible until a manifest commit references them."""
        self.root = root.rstrip("/")
        self.data = os.path.join(self.root, "data")
        self.snaps = os.path.join(self.root, "_snapshots")
        self.backend = backend

    def versions(self, spark: SparkSession) -> list[int]:
        if self.backend is not None:
            names = self.backend.list_dir(self.snaps)
        else:
            jpath, fs = hadoop_fs(spark, self.root)
            if not fs.exists(jpath(self.snaps)):
                return []
            names = [
                st.getPath().getName() for st in fs.listStatus(jpath(self.snaps))
            ]
        out = []
        for name in names:
            m = _VRE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _read_manifest(self, spark: SparkSession, version: int) -> dict:
        return read_small_json(
            spark, os.path.join(self.snaps, f"v{version}.json"),
            backend=self.backend,
        )

    def _manifest(self, spark: SparkSession, version: int) -> list[str]:
        return self._read_manifest(spark, version)["files"]

    def _commit(
        self,
        spark: SparkSession,
        files: list[str],
        tag: str | None,
        parent: dict | None,
        parent_version: int,
    ) -> int:
        all_tags = list(parent.get("all_tags", [])) if parent else []
        if tag is not None:
            all_tags.append(tag)
        payload = {"files": sorted(files), "tag": tag, "all_tags": all_tags}
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

    def _write_data(self, df: DataFrame) -> list[str]:
        """Write a commit's data files into a fresh immutable dir and
        return their paths. A crash after this but before the manifest
        commit leaves them orphaned and invisible (vacuum reclaims)."""
        dirname = os.path.join(self.data, uuid.uuid4().hex[:12])
        df.write.parquet(dirname)
        spark = df.sparkSession
        jpath, fs = hadoop_fs(spark, self.root)
        files = []
        it = fs.listFiles(jpath(dirname), True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().startswith("part-"):
                files.append(st.getPath().toString())
        return files

    def append(self, df: DataFrame, tag: str | None = None) -> int:
        """Commit current-version files + the new data as version N+1.

        ``tag`` makes the append REPLAY-IDEMPOTENT: a tag present in the
        head manifest's cumulative tag history is a no-op (returns the
        latest version) — the streaming foreachBatch contract, where a
        crash between the manifest commit and the checkpoint commit
        redelivers the same batch id. The history is CUMULATIVE in the
        head manifest, so vacuuming old versions never forgets a tag
        and the check costs one manifest read, not one per version."""
        spark = df.sparkSession
        head_v, head = self._head(spark)
        if tag is not None and head and tag in head.get("all_tags", []):
            return head_v
        base = head["files"] if head else []
        return self._commit(spark, base + self._write_data(df), tag, head, head_v)

    def overwrite(self, df: DataFrame, tag: str | None = None) -> int:
        """Commit the new data as the ENTIRE next version (a rewrite —
        e.g. a compaction or a corrected corpus). Prior versions keep
        reading their own files untouched."""
        spark = df.sparkSession
        head_v, head = self._head(spark)
        if tag is not None and head and tag in head.get("all_tags", []):
            return head_v
        return self._commit(spark, self._write_data(df), tag, head, head_v)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest) — byte-stable
        forever, because the files a manifest names are immutable."""
        vs = self.versions(spark)
        if not vs:
            raise FileNotFoundError(f"no committed snapshots under {self.root}")
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} not in {vs}")
        files = self._manifest(spark, v)
        if not files:
            raise ValueError(f"version {v} is empty")
        return spark.read.parquet(*files)

    def read_incremental(
        self, spark: SparkSession, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Exactly the rows added BETWEEN two versions — the "what's new
        since my last training run" read an incremental pipeline wants,
        at manifest cost: because data files are immutable and appends
        only add paths, the increment is the file-list difference, read
        directly (no corpus diff, no anti-join — q89's content diff is
        for when lineage is unknown; this is for when it's ours).

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
                "file diff is not the row diff; read both versions and "
                "diff content instead (q89 shape)"
            )
        added = [f for f in new if f not in old]
        if not added:
            return self.read(spark, to).limit(0)
        return spark.read.parquet(*added)

    def vacuum(self, spark: SparkSession, keep_last: int = 2) -> int:
        """Drop manifests older than the last ``keep_last`` and delete
        every data COMMIT DIR none of the kept manifests reference
        (incl. orphans from crashed commits — whole dirs, so _SUCCESS
        markers and empty uuid dirs don't accumulate as inode/listing
        junk on a long stream). Returns dirs deleted. Time travel to
        vacuumed versions is gone; replay idempotence is NOT — the tag
        history is cumulative in the head manifest, which vacuum always
        keeps."""
        jpath, fs = hadoop_fs(spark, self.root)
        vs = self.versions(spark)
        keep = vs[-keep_last:] if keep_last else []
        referenced_dirs: set[str] = set()
        for v in keep:
            for f in self._manifest(spark, v):
                referenced_dirs.add(os.path.dirname(f))
        deleted = 0
        if fs.exists(jpath(self.data)):
            for st in fs.listStatus(jpath(self.data)):
                p = st.getPath().toString()
                if st.isDirectory() and p not in referenced_dirs:
                    fs.delete(st.getPath(), True)
                    deleted += 1
        for v in vs:
            if v not in keep:
                mpath = os.path.join(self.snaps, f"v{v}.json")
                if self.backend is not None:
                    self.backend.delete(mpath)
                else:
                    fs.delete(jpath(mpath), False)
        return deleted
