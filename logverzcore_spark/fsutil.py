"""Small shared Hadoop-FS helpers (local/hdfs/s3a-uniform).

One copy of the open-read-close / atomic-write JSON logic that
snapshots.py and export.py (delete_rows recovery, CompactedAppendSink
manifests) all need — a fix to encoding/close/retry behavior lands once.
py4j passes byte[] ARGUMENTS by copy, so reads must return the JVM array
(IOUtils.readFullyToByteArray), never fill a Python bytearray.
"""

from __future__ import annotations

import json
import os


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
