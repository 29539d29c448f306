"""S3ConditionalPutBackend contract tests (r10 task 4) — against a
stub client speaking the boto3 S3 surface, so the contract is proven
without AWS creds in the container: the winner path, the 412 loser
path, the 409 in-flight-conflict retry, read_bytes/exists/delete/
list_dir/mtime, and the snapshot + metastore layers running end-to-end
on the backend.
"""

import datetime
import json
import threading

import pytest

from logverzcore_spark.fsutil import (
    CommitConflict,
    S3ConditionalPutBackend,
    write_small_json_exclusive,
)


class _ClientError(Exception):
    """The botocore ClientError SHAPE (a .response dict) without
    importing botocore — exactly what the backend keys off."""

    def __init__(self, status, code):
        super().__init__(code)
        self.response = {
            "ResponseMetadata": {"HTTPStatusCode": status},
            "Error": {"Code": code},
        }


class FakeS3Client:
    """A minimal in-memory S3 speaking the five calls the backend
    makes, with real If-None-Match semantics and an injectable
    pre-PUT hook for race tests."""

    def __init__(self):
        self._objects: dict[tuple[str, str], tuple[bytes, object]] = {}
        self._mu = threading.Lock()
        self.before_put = None
        self._clock = 0.0

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, **kw):
        if self.before_put is not None:
            self.before_put(Bucket, Key)
        with self._mu:
            if IfNoneMatch == "*" and (Bucket, Key) in self._objects:
                raise _ClientError(412, "PreconditionFailed")
            self._clock += 1.0
            lm = datetime.datetime.fromtimestamp(
                self._clock, tz=datetime.timezone.utc
            )
            self._objects[(Bucket, Key)] = (bytes(Body), lm)
        return {}

    def get_object(self, Bucket, Key):
        with self._mu:
            if (Bucket, Key) not in self._objects:
                raise _ClientError(404, "NoSuchKey")
            data, _ = self._objects[(Bucket, Key)]

        class _Body:
            def read(self_inner):
                return data

        return {"Body": _Body()}

    def head_object(self, Bucket, Key):
        with self._mu:
            if (Bucket, Key) not in self._objects:
                raise _ClientError(404, "404")
            _, lm = self._objects[(Bucket, Key)]
        return {"LastModified": lm, "ContentLength": 1}

    def delete_object(self, Bucket, Key):
        with self._mu:
            self._objects.pop((Bucket, Key), None)
        return {}

    def list_objects_v2(self, Bucket, Prefix, Delimiter="/", **kw):
        with self._mu:
            keys = sorted(
                k for b, k in self._objects if b == Bucket and k.startswith(Prefix)
            )
        return {"Contents": [{"Key": k} for k in keys], "IsTruncated": False}


def test_contract_winner_loser_and_primitives():
    c = FakeS3Client()
    be = S3ConditionalPutBackend(client=c)
    p = "s3://bkt/_snapshots/v1.json"
    be.put_if_absent(p, b'{"files": []}')
    with pytest.raises(CommitConflict):
        be.put_if_absent(p, b"other")  # the 412 loser path
    assert be.read_bytes(p) == b'{"files": []}'  # loser never replaced
    assert be.exists(p) and not be.exists("s3://bkt/_snapshots/v2.json")
    with pytest.raises(FileNotFoundError):
        be.read_bytes("s3://bkt/nope.json")
    be.put_if_absent("s3://bkt/_snapshots/bs-aa.json", b"{}")
    be.put_if_absent("s3://bkt/_snapshots/sub/deep.json", b"{}")
    assert be.list_dir("s3://bkt/_snapshots") == ["bs-aa.json", "v1.json"]
    assert be.mtime(p) is not None
    assert be.mtime("s3://bkt/nope.json") is None
    assert be.delete("s3://bkt/_snapshots/bs-aa.json") is True
    assert be.delete("s3://bkt/_snapshots/bs-aa.json") is False
    # bare keys resolve through the default bucket; s3a:// accepted
    be2 = S3ConditionalPutBackend(bucket="bkt", client=c)
    assert be2.read_bytes("_snapshots/v1.json") == b'{"files": []}'
    assert be.read_bytes("s3a://bkt/_snapshots/v1.json") == b'{"files": []}'
    with pytest.raises(ValueError):
        S3ConditionalPutBackend(client=c)._split("no-bucket-key")


def test_409_inflight_conflict_retries_then_resolves():
    """S3 returns 409 ConditionalRequestConflict while two conditional
    PUTs are literally in flight; the retry must resolve to the 412
    loser once the winner lands — never an exception, never a silent
    replace."""
    c = FakeS3Client()
    be = S3ConditionalPutBackend(client=c)
    state = {"n": 0}

    def flaky(bucket, key):
        state["n"] += 1
        if state["n"] <= 2:
            raise _ClientError(409, "ConditionalRequestConflict")
        if state["n"] == 3:  # the racing winner lands between retries
            c._objects[(bucket, key)] = (b"winner", None)

    c.before_put = flaky
    with pytest.raises(CommitConflict):
        be.put_if_absent("s3://bkt/v1.json", b"loser")
    c.before_put = None
    assert be.read_bytes("s3://bkt/v1.json") == b"winner"


def test_write_small_json_exclusive_routes_through_backend():
    c = FakeS3Client()
    be = S3ConditionalPutBackend(client=c)
    write_small_json_exclusive(None, "s3://bkt/m/v1.json", {"a": 1}, backend=be)
    assert json.loads(be.read_bytes("s3://bkt/m/v1.json")) == {"a": 1}
    with pytest.raises(CommitConflict):
        write_small_json_exclusive(
            None, "s3://bkt/m/v1.json", {"a": 2}, backend=be
        )


def test_metastore_cas_on_s3_backend():
    """GenerationStore's conditional-PutItem parity runs unchanged on
    the S3 contract: contended mutators all land item-level."""
    from logverzcore_spark.metastore import GenerationStore

    c = FakeS3Client()
    be = S3ConditionalPutBackend(bucket="bkt", client=c)
    store = GenerationStore("meta/catalog", backend=be)

    def add(i):
        store.mutate(lambda recs: (recs + [{"k": i}], None))

    threads = [threading.Thread(target=add, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    _gen, recs = store.head()
    assert sorted(r["k"] for r in recs) == list(range(12))


def test_snapshot_manifest_commits_on_s3_backend(spark, tmpdir_path):
    """The snapshot metadata plane runs on the S3 contract end-to-end:
    manifests commit exclusively, tags no-op on replay, versions
    resolve — while data files stay on the local FS (the backend only
    owns the metadata commits, exactly the Delta LogStore split)."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from logverzcore_spark.snapshots import SnapshotTable

    c = FakeS3Client()
    be = S3ConditionalPutBackend(bucket="bkt", client=c)
    root = os.path.join(str(tmpdir_path), f"s3t_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(root, backend=be)
    df = spark.range(0, 50).withColumn("v", F.col("id") * 2)
    assert t.append(df.coalesce(1), tag="s:batch-0") == 1
    assert t.append(df.coalesce(1), tag="s:batch-0") == 1  # replay no-op
    assert t.append(df.coalesce(1), tag="s:batch-1") == 2
    assert t.versions(spark) == [1, 2]
    assert t.count(spark) == 100
    # a second handle racing the same next version loses loudly
    t2 = SnapshotTable(root, backend=be)
    head_v, head = t2._head(spark)
    t._commit(spark, head["files"], None, head, head_v)
    with pytest.raises(CommitConflict):
        t2._commit(spark, head["files"], None, head, head_v)
