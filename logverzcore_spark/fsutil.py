"""Small shared Hadoop-FS helpers (API-uniform across local/hdfs/s3a).

One copy of the open-read-close / atomic-write JSON logic that
snapshots.py and export.py (delete_rows recovery, CompactedAppendSink
manifests) all need — a fix to encoding/close/retry behavior lands once.
py4j passes byte[] ARGUMENTS by copy, so reads must return the JVM array
(IOUtils.readFullyToByteArray), never fill a Python bytearray.

ATOMICITY SCOPE: write_small_json_commit's whole-or-not-at-all guarantee
holds on filesystems with atomic rename — local and HDFS. S3A rename is
a non-atomic copy+delete, so on object stores a READER can observe a
partially copied manifest (independent of the documented two-writer
race); production object-store deployments need a conditional-put /
LogStore-style commit for both writers AND readers, exactly the reason
Delta on S3 requires a LogStore.
"""

from __future__ import annotations

import json
import os


class CommitConflict(IOError):
    """Another writer committed (or holds the commit lock for) the same
    target — the loser of an optimistic-concurrency race. Callers
    re-read the head and retry with the next version, or surface the
    conflict; they must never overwrite."""


def hadoop_fs(spark, path: str):
    """(Path-class, FileSystem) for ``path``'s scheme."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    return jpath, jpath(path).getFileSystem(spark._jsc.hadoopConfiguration())


def read_small_json(spark, path: str):
    """Read and parse a small JSON file via the Hadoop FS API."""
    jpath, fs = hadoop_fs(spark, path)
    stream = fs.open(jpath(path))
    try:
        raw = bytes(
            spark._jvm.org.apache.hadoop.io.IOUtils.readFullyToByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(raw.decode("utf-8"))


def write_small_json_commit(spark, path: str, payload) -> None:
    """Write JSON to ``path`` with an ATOMIC-EXISTENCE commit: content
    goes to ``<path>.part`` first and the rename makes the file appear
    whole or not at all — a reader can never observe a truncated file.
    NOTE (single-writer contract): POSIX/object-store rename REPLACES an
    existing destination silently; the pre-rename exists check below
    narrows, but cannot eliminate, a two-writer race — multi-writer
    coordination needs an external lock/CAS (the same reason Delta on
    S3 needs a LogStore), and every caller documents one writer per
    table."""
    jpath, fs = hadoop_fs(spark, path)
    part = jpath(path + ".part")
    out = fs.create(part, True)
    try:
        out.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        out.close()
    if fs.exists(jpath(path)):
        fs.delete(part, False)
        raise IOError(f"commit target already exists: {path}")
    if not fs.rename(part, jpath(path)):
        raise IOError(f"could not commit {path}")


def write_small_json_exclusive(spark, path: str, payload) -> None:
    """write_small_json_commit with the two-writer race CLOSED (on
    local/HDFS): of N concurrent writers to one ``path``, exactly one
    commits; every loser raises :class:`CommitConflict` and never
    replaces the winner's file.

    Mechanism — three pieces, each load-bearing:

    1. content first lands whole under a per-writer unique ``.part.<id>``
       name (two writers' staging never clobbers);
    2. winner selection is ``FileSystem.createNewFile`` on
       ``<path>.lock`` — atomic create-if-absent (O_EXCL locally, a
       single namenode op on HDFS); the loser sees False and raises;
    3. under the lock: re-check the destination doesn't exist (a third
       writer may have fully committed between our head read and lock
       grab), rename in, then READ BACK and compare — refusing loudly
       beats trusting a filesystem's rename return.

    The lock is held only around the exists-check + rename of an
    already-complete file, so a crashed winner leaves either a committed
    file (future writers conflict, re-read head, move on) or an orphan
    ``.lock`` that blocks this one path until ``break_commit_lock`` —
    fail-stop, never silent loss. Readers keep the atomic-existence
    guarantee: they only ever see ``path`` whole (local/HDFS rename).
    """
    import uuid

    jpath, fs = hadoop_fs(spark, path)
    if fs.exists(jpath(path)):
        raise CommitConflict(f"commit target already exists: {path}")
    part = jpath(f"{path}.part.{uuid.uuid4().hex[:8]}")
    out = fs.create(part, True)
    try:
        out.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        out.close()
    lock = jpath(path + ".lock")
    if not fs.createNewFile(lock):
        fs.delete(part, False)
        raise CommitConflict(
            f"another writer holds the commit lock for {path}; if no "
            f"writer is alive this is a crashed commit — break_commit_lock "
            f"after confirming"
        )
    try:
        if fs.exists(jpath(path)):
            fs.delete(part, False)
            raise CommitConflict(f"commit target already exists: {path}")
        if not fs.rename(part, jpath(path)):
            raise IOError(f"could not commit {path}")
        # Compare against the payload's JSON round-trip, not the raw
        # object: tuples deserialize as lists and int dict keys as
        # strings, and the check exists to catch filesystem corruption,
        # not JSON canonicalization.
        if read_small_json(spark, path) != json.loads(json.dumps(payload)):
            raise IOError(f"post-commit read-back mismatch at {path}")
    finally:
        fs.delete(lock, False)


def break_commit_lock(spark, path: str) -> bool:
    """Remove an orphaned ``<path>.lock`` left by a CRASHED exclusive
    commit (the fail-stop residue documented in
    write_small_json_exclusive). Operator-invoked only, after confirming
    no writer is alive — a live winner whose lock is broken mid-rename
    could race a new writer. Returns whether a lock was removed."""
    jpath, fs = hadoop_fs(spark, path)
    return bool(fs.delete(jpath(path + ".lock"), False))
