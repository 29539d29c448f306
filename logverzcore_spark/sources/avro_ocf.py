"""Avro Object Container File source (SURVEY §2.1 S8-S10 family).

The reference ingests CSV/JSON only; ORC (q123), XML (q124) and VARIANT
(q125) established that this engine's ingest tier covers the mainstream
data-lake formats — Avro is the last one with no reader. This
environment's pyspark ships the avro *core* jars but NOT the
``spark-avro`` DataSource module, so ``spark.read.format("avro")``
raises at load time. :func:`read_avro` therefore tries the native
source first (a real cluster with spark-avro on the classpath gets the
JVM fast path, including predicate-independent block skipping) and
falls back to a self-contained OCF decoder: ``binaryFile`` scan →
``mapInPandas`` (Arrow-batched), one task per file batch — the same
forced-off-JVM justification as the ZIP path (readers.read_zip_csv).

The fallback implements the published container format
(avro.apache.org/docs/current/specification: magic ``Obj\\x01``, a
string→bytes metadata map carrying ``avro.schema``/``avro.codec``, a
16-byte sync marker, then length-prefixed record blocks) and the binary
encoding for the ingestion-relevant type set: null, boolean, int, long,
float, double, string, bytes, and 2-branch nullable unions, inside a
top-level record. ``deflate`` (raw zlib) and ``null`` codecs. Anything
else (arrays, maps, enums, fixed, nested records, snappy) raises
``NotImplementedError`` — honestly out of scope, not silently wrong.

Per-record Python decode is unavoidable for Avro's variable-width
zigzag-varint encoding (the same discipline as the multimodal byte
walks); it runs inside executors over Arrow batches, never on the
driver. Quarantine parity with the CSV path: a corrupt file — or one
whose writer schema doesn't match the directory's — becomes ONE
quarantine row (all-NULL fields + ``_corrupt_record`` + lineage), so
``split_quarantine``/CollectReport account for it instead of losing it.

The encoder half (:func:`encode_ocf`) exists for build-and-read round
trips (suite q127, pytest) and small export jobs; it is the m13/m23
fixture pattern — we build real bytes, then prove the reader walks them.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
#: Deterministic default sync marker (no randomness: replays byte-exact).
DEFAULT_SYNC = b"\x16" * 16

_PRIMITIVES = {
    "boolean": T.BooleanType,
    "int": T.IntegerType,
    "long": T.LongType,
    "float": T.FloatType,
    "double": T.DoubleType,
    "string": T.StringType,
    "bytes": T.BinaryType,
}


# ---------------------------------------------------------------- encode

def _enc_long(n: int) -> bytes:
    """Zigzag + varint (the Avro long/int wire encoding)."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _enc_value(v, typ) -> bytes:
    if isinstance(typ, list):  # union: write branch index, then value
        if v is None:
            return _enc_long(typ.index("null"))
        branch = next(i for i, t in enumerate(typ) if t != "null")
        return _enc_long(branch) + _enc_value(v, typ[branch])
    if not isinstance(typ, str):  # complex types ({"type": "array", ...})
        raise NotImplementedError(f"avro type {typ!r} not supported")
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return _enc_long(int(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        return _enc_bytes(str(v).encode("utf-8"))
    if typ == "bytes":
        return _enc_bytes(bytes(v))
    raise NotImplementedError(f"avro type {typ!r} not supported")


def encode_ocf(
    records: list[dict],
    schema: dict,
    codec: str = "null",
    sync: bytes = DEFAULT_SYNC,
    records_per_block: int = 1000,
) -> bytes:
    """Serialize ``records`` as an Avro Object Container File.

    ``schema`` is the Avro record schema as a dict (``{"type":
    "record", "name": ..., "fields": [{"name", "type"}, ...]}``).
    Deterministic for fixed inputs (fixed sync marker)."""
    if schema.get("type") != "record":
        raise NotImplementedError("top-level schema must be a record")
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    fields = schema["fields"]
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += _enc_long(len(meta))
    for k, v in sorted(meta.items()):
        out += _enc_bytes(k.encode()) + _enc_bytes(v)
    out += _enc_long(0)  # end of metadata map
    out += sync
    for lo in range(0, len(records), records_per_block):
        blk = records[lo : lo + records_per_block]
        payload = b"".join(
            b"".join(_enc_value(r.get(f["name"]), f["type"]) for f in fields)
            for r in blk
        )
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            payload = comp.compress(payload) + comp.flush()
        elif codec != "null":
            raise NotImplementedError(f"codec {codec!r} not supported")
        out += _enc_long(len(blk)) + _enc_bytes(payload) + sync
    return bytes(out)


# ---------------------------------------------------------------- decode

class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf, self.pos = buf, pos

    def long(self) -> int:
        shift = z = 0
        buf, pos = self.buf, self.pos
        while True:
            b = buf[pos]
            pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        self.pos = pos
        return (z >> 1) ^ -(z & 1)  # un-zigzag

    def raw(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def bytes_(self) -> bytes:
        return self.raw(self.long())


def _dec_value(cur: _Cursor, typ):
    if isinstance(typ, list):
        return _dec_value(cur, typ[cur.long()])
    if typ == "null":
        return None
    if typ == "boolean":
        return cur.raw(1) == b"\x01"
    if typ in ("int", "long"):
        return cur.long()
    if typ == "float":
        return struct.unpack("<f", cur.raw(4))[0]
    if typ == "double":
        return struct.unpack("<d", cur.raw(8))[0]
    if typ == "string":
        return cur.bytes_().decode("utf-8")
    if typ == "bytes":
        return cur.bytes_()
    raise NotImplementedError(f"avro type {typ!r} not supported")


def parse_header(blob: bytes) -> tuple[dict, str, bytes, int]:
    """Parse an OCF header → (schema, codec, sync, data_offset).
    Raises on bad magic / truncation (quarantined by the reader)."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    cur = _Cursor(blob, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = cur.long()
        if n == 0:
            break
        if n < 0:  # spec: negative count prefixes a byte size
            cur.long()
            n = -n
        for _ in range(n):
            # NB: assignment would evaluate the RHS first — read the key
            # explicitly before the value.
            key = cur.bytes_().decode("utf-8")
            meta[key] = cur.bytes_()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = cur.raw(16)
    return schema, codec, sync, cur.pos


def decode_ocf(blob: bytes) -> tuple[dict, list[dict]]:
    """Decode a whole OCF → (schema, records). Verifies every block's
    sync marker — silent corruption becomes a loud error."""
    schema, codec, sync, pos = parse_header(blob)
    fields = schema["fields"]
    cur = _Cursor(blob, pos)
    out: list[dict] = []
    while cur.pos < len(blob):
        count = cur.long()
        payload = cur.bytes_()
        if cur.raw(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec!r} not supported")
        bc = _Cursor(payload)
        for _ in range(count):
            out.append({f["name"]: _dec_value(bc, f["type"]) for f in fields})
    return schema, out


def avro_to_spark_schema(schema: dict) -> T.StructType:
    """Map the supported Avro record schema onto a Spark StructType
    (nullable unions → nullable fields)."""
    if schema.get("type") != "record":
        raise NotImplementedError("top-level schema must be a record")
    fields = []
    for f in schema["fields"]:
        typ, nullable = f["type"], False
        if isinstance(typ, list):
            if len(typ) != 2 or "null" not in typ:
                raise NotImplementedError(f"union {typ!r} not supported")
            typ = next(t for t in typ if t != "null")
            nullable = True
        if not isinstance(typ, str) or typ not in _PRIMITIVES:
            raise NotImplementedError(f"avro type {typ!r} not supported")
        fields.append(T.StructField(f["name"], _PRIMITIVES[typ](), nullable))
    return T.StructType(fields)


# ----------------------------------------------------------------- spark

def _peek_schema(spark: SparkSession, paths: list[str]) -> dict:
    """Read ONE file's header driver-side (bounded: grows from 64 KiB
    only if the schema JSON is larger) to learn the directory's writer
    schema. binaryFile prunes the content column, so discovering the
    first path costs a listing, not a read."""
    first = (
        spark.read.format("binaryFile")
        .load(paths)
        .select("path")
        .first()
    )
    if first is None:
        raise FileNotFoundError(f"no files under {paths}")
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(first["path"])
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    size = 64 * 1024
    status = fs.getFileStatus(jpath)
    # py4j passes byte[] arguments by copy, so readFully into a Python
    # bytearray would never come back — read via commons-io toByteArray
    # (returns the JVM array as Python bytes) instead.
    flen = int(status.getLen())
    want = min(flen, size, 2**31 - 1)
    while True:
        stream = fs.open(jpath)
        try:
            data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream, want))
        finally:
            stream.close()
        try:
            schema, _, _, _ = parse_header(data)
            return schema
        except (EOFError, IndexError, KeyError):
            if want >= flen:
                raise
            want = min(flen, want * 4, 2**31 - 1)


def read_avro(
    spark: SparkSession,
    path,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Read Avro OCF files → typed DataFrame + ``_source_file`` lineage
    + ``_corrupt_record`` quarantine column (NULL for clean rows), the
    same contract as readers.read_raw. Native spark-avro when present;
    self-contained decoder otherwise (module docstring)."""
    from logverzcore_spark.sources.readers import CORRUPT_COL, SOURCE_COL

    paths = path if isinstance(path, list) else [path]
    try:
        reader = spark.read.format("avro")
        for k, v in (extra_options or {}).items():
            reader = reader.option(k, v)
        df = reader.load(paths)
        df.schema  # force source resolution now, not at action time
        return df.withColumn(SOURCE_COL, F.input_file_name()).withColumn(
            CORRUPT_COL, F.lit(None).cast("string")
        )
    except Exception:
        pass  # spark-avro not on the classpath: decoder fallback

    expected = _peek_schema(spark, paths)
    spark_schema = avro_to_spark_schema(expected)
    names = [f.name for f in spark_schema.fields]
    # Everything nullable in the OUTPUT: quarantine rows (corrupt or
    # schema-mismatched files) carry NULL in every data field.
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in spark_schema.fields]
        + [
            T.StructField(CORRUPT_COL, T.StringType(), True),
            T.StructField(SOURCE_COL, T.StringType(), True),
        ]
    )
    out_columns = names + [CORRUPT_COL, SOURCE_COL]
    expected_canon = json.dumps(expected, sort_keys=True)

    def _error_frame(src: str, err: str) -> pd.DataFrame:
        return pd.DataFrame(
            [[None] * len(names) + [err, src]], columns=out_columns, dtype=object
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for src, blob in zip(pdf["path"], pdf["content"]):
                try:
                    schema, records = decode_ocf(bytes(blob))
                    if json.dumps(schema, sort_keys=True) != expected_canon:
                        yield _error_frame(
                            src, "writer schema differs from directory schema"
                        )
                        continue
                except Exception as exc:
                    yield _error_frame(src, str(exc))
                    continue
                if not records:
                    continue
                rows = [
                    [r.get(n) for n in names] + [None, src] for r in records
                ]
                yield pd.DataFrame(rows, columns=out_columns, dtype=object)

    reader = spark.read.format("binaryFile")
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    blobs = reader.load(paths)
    return blobs.select("path", "content").mapInPandas(decode, out_schema)
