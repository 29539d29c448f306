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
- **a version is a manifest**: ``_snapshots/v<N>.json`` lists the exact
  file paths that make up version N (a full list, not a delta — O(files)
  metadata buys O(1)-step recovery and trivially correct reads).
- **commit = manifest rename**: the manifest is written to a ``.part``
  name and renamed in; the rename IS the commit point (the delete_rows
  lesson: existence must be atomic). A crash before the rename leaves
  orphan data files that no manifest references — invisible to every
  reader, reclaimed by ``vacuum``.
- **reads never list data dirs**: ``read(version)`` loads the manifest's
  file list and hands it to the parquet reader — a concurrent in-flight
  commit can never tear a read.

Capacity note for 100 TB: the manifest holds file PATHS (metadata-scale
— bounded by file count, which compaction bounds); data-file I/O is the
normal distributed parquet scan over an explicit file list, identical in
plan shape to any other read in this repo.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

_VRE = re.compile(r"^v(\d+)\.json$")


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root.rstrip("/")
        self.data = os.path.join(self.root, "data")
        self.snaps = os.path.join(self.root, "_snapshots")

    # -- FS helpers (Hadoop FS API: same code on hdfs:// / s3a:// paths) --
    def _fs(self, spark: SparkSession):
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        return jpath, jpath(self.root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def versions(self, spark: SparkSession) -> list[int]:
        jpath, fs = self._fs(spark)
        if not fs.exists(jpath(self.snaps)):
            return []
        out = []
        for st in fs.listStatus(jpath(self.snaps)):
            m = _VRE.match(st.getPath().getName())
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _read_manifest(self, spark: SparkSession, version: int) -> dict:
        jpath, fs = self._fs(spark)
        mf = jpath(os.path.join(self.snaps, f"v{version}.json"))
        stream = fs.open(mf)
        try:
            raw = bytes(
                spark._jvm.org.apache.hadoop.io.IOUtils.readFullyToByteArray(
                    stream
                )
            )
        finally:
            stream.close()
        return json.loads(raw.decode("utf-8"))

    def _manifest(self, spark: SparkSession, version: int) -> list[str]:
        return self._read_manifest(spark, version)["files"]

    def _commit(
        self, spark: SparkSession, files: list[str], tag: str | None = None
    ) -> int:
        """Write the next version's manifest atomically (rename commit).
        Single-writer by contract (the reference's job model); two racing
        writers would contend on the same v<N> name and one rename loses
        loudly, never silently. ``tag`` labels the commit (streaming
        batch ids) for replay idempotence — see ``append``."""
        jpath, fs = self._fs(spark)
        fs.mkdirs(jpath(self.snaps))
        version = (self.versions(spark) or [0])[-1] + 1
        payload = {"files": sorted(files), "tag": tag}
        part = jpath(os.path.join(self.snaps, f"v{version}.json.part"))
        out = fs.create(part, True)
        try:
            out.write(bytearray(json.dumps(payload).encode("utf-8")))
        finally:
            out.close()
        if not fs.rename(
            part, jpath(os.path.join(self.snaps, f"v{version}.json"))
        ):
            raise IOError(f"snapshot commit lost the race for v{version}")
        return version

    def _tags(self, spark: SparkSession) -> set:
        return {
            t for v in self.versions(spark)
            if (t := self._read_manifest(spark, v).get("tag")) is not None
        }

    def _write_data(self, df: DataFrame) -> list[str]:
        """Write a commit's data files into a fresh immutable dir and
        return their paths. A crash after this but before the manifest
        rename leaves them orphaned and invisible (vacuum reclaims)."""
        dirname = os.path.join(self.data, uuid.uuid4().hex[:12])
        df.write.parquet(dirname)
        spark = df.sparkSession
        jpath, fs = self._fs(spark)
        files = []
        it = fs.listFiles(jpath(dirname), True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.startswith("part-"):
                files.append(st.getPath().toString())
        return files

    def append(self, df: DataFrame, tag: str | None = None) -> int:
        """Commit current-version files + the new data as version N+1.

        ``tag`` makes the append REPLAY-IDEMPOTENT: a tag already
        present in any committed manifest is a no-op (returns the
        latest version) — the streaming foreachBatch contract, where a
        crash between the manifest rename and the checkpoint commit
        redelivers the same batch id."""
        spark = df.sparkSession
        vs = self.versions(spark)
        if tag is not None and tag in self._tags(spark):
            return vs[-1]
        base = self._manifest(spark, vs[-1]) if vs else []
        return self._commit(spark, base + self._write_data(df), tag=tag)

    def overwrite(self, df: DataFrame, tag: str | None = None) -> int:
        """Commit the new data as the ENTIRE next version (a rewrite —
        e.g. a compaction or a corrected corpus). Prior versions keep
        reading their own files untouched."""
        spark = df.sparkSession
        if tag is not None and tag in self._tags(spark):
            return self.versions(spark)[-1]
        return self._commit(spark, self._write_data(df), tag=tag)

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
        every data file no kept manifest references (incl. orphans from
        crashed commits). Returns files deleted. Time travel to vacuumed
        versions is gone — that is vacuum's documented price."""
        jpath, fs = self._fs(spark)
        vs = self.versions(spark)
        keep = vs[-keep_last:] if keep_last else []
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._manifest(spark, v))
        deleted = 0
        if fs.exists(jpath(self.data)):
            it = fs.listFiles(jpath(self.data), True)
            doomed = []
            while it.hasNext():
                st = it.next()
                p = st.getPath().toString()
                if st.getPath().getName().startswith("part-") and p not in referenced:
                    doomed.append(p)
            for p in doomed:
                fs.delete(jpath(p), False)
                deleted += 1
        for v in vs:
            if v not in keep:
                fs.delete(jpath(os.path.join(self.snaps, f"v{v}.json")), False)
        return deleted
