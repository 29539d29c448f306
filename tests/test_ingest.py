"""Ingest-path tests: readers (B1/B3/B6/B7/CloudTrail/B8), decompression
(gzip/zip), quarantine, coercion, ingest-time WHERE matrix (FIXTURES.md)."""

import pytest

from logverzcore_spark.catalog import Catalog, User
from logverzcore_spark.ingest import CollectJob, collect
from logverzcore_spark.schemas import REGISTRY, get_datatype
from logverzcore_spark.sources import readers

from rawfixtures import (
    ALB_ROWS,
    CUSTOM_SCHEMA,
    VPCFLOW_ROWS,
    write_alb_gz,
    write_cloudfront_gz,
    write_cloudtrail_gz,
    write_custom_csv_gz,
    write_vpcflow_gz,
    write_vpcflow_zip,
    write_windows_events,
)


def test_vpcflow_gzip_header_csv(spark, tmpdir_path):
    write_vpcflow_gz(tmpdir_path, n_files=2)
    dt = REGISTRY["VPCFlow"]
    raw = readers.read_raw(spark, tmpdir_path, dt)
    good, bad = readers.split_quarantine(raw)
    assert good.count() == 2 * len(VPCFLOW_ROWS)
    assert bad.count() == 0
    from logverzcore_spark.operators.coerce import coerce

    typed = coerce(good.drop(readers.SOURCE_COL), dt.schema)
    row = typed.where(typed["srcport"] == 443).select("bytes", "traffic-path").first()
    assert row["bytes"] in (8400, 1200)
    assert row["traffic-path"] is None  # '-' → NULL for int column
    assert dict(typed.dtypes)["packets"] == "bigint"


def test_vpcflow_zip_single_and_multi_entry(spark, tmpdir_path):
    write_vpcflow_zip(tmpdir_path, multi_entry=False)
    dt = REGISTRY["VPCFlow"]
    df = readers.read_zip_csv(spark, tmpdir_path + "/vpcflow_arch.zip", dt)
    good, bad = readers.split_quarantine(df)
    assert good.count() == len(VPCFLOW_ROWS)
    # Multi-entry archive rejected (reference single-file rule).
    p = write_vpcflow_zip(tmpdir_path, multi_entry=True)
    df2 = readers.read_zip_csv(spark, p, dt)
    good2, bad2 = readers.split_quarantine(df2)
    assert good2.count() == 0
    assert "entries" in bad2.first()[readers.CORRUPT_COL]


def test_alb_quoted_headerless(spark, tmpdir_path):
    write_alb_gz(tmpdir_path)
    dt = REGISTRY["ApplicationLB"]
    raw = readers.read_raw(spark, tmpdir_path, dt)
    good, _ = readers.split_quarantine(raw)
    from logverzcore_spark.operators.coerce import coerce

    typed = coerce(good.drop(readers.SOURCE_COL), dt.schema)
    assert typed.count() == len(ALB_ROWS)
    # Quoted field with spaces survives; colon-bearing column name works.
    r = typed.where(typed["`target:port`"] == "172.31.10.146:80")
    assert r.count() == 2
    assert r.first()["request"].startswith(("GET ", "POST "))
    # response_processing_time -1 parses as double; status int.
    assert dict(typed.dtypes)["response_processing_time"] == "double"


def test_cloudfront_tsv_preamble(spark, tmpdir_path):
    write_cloudfront_gz(tmpdir_path)
    dt = REGISTRY["CloudFront"]
    raw = readers.read_raw(spark, tmpdir_path, dt)
    good, _ = readers.split_quarantine(raw)
    from logverzcore_spark.operators.coerce import coerce

    typed = coerce(good.drop(readers.SOURCE_COL), dt.schema)
    assert typed.count() == 3  # two '#' preamble lines dropped
    assert typed.where(typed["`sc-status`"] == 404).count() == 1
    assert dict(typed.dtypes)["date"] == "date"


def test_cloudtrail_records_unnest(spark, tmpdir_path):
    write_cloudtrail_gz(tmpdir_path)
    dt = REGISTRY["CloudTrail"]
    raw = readers.read_raw(spark, tmpdir_path, dt)
    good, _ = readers.split_quarantine(raw, min_fields=1)
    from logverzcore_spark.operators.coerce import coerce

    typed = coerce(good.drop(readers.SOURCE_COL), dt.schema)
    assert typed.count() == 4
    # JSON column preserved as string twin; path query works via SQL.
    typed.createOrReplaceTempView("ct")
    got = spark.sql(
        "SELECT get_json_object(userIdentity, '$.sessionContext.sessionIssuer.userName') u "
        "FROM ct WHERE errorCode = 'AccessDenied'"
    ).collect()
    assert [r["u"] for r in got] == ["role2"]
    assert dict(typed.dtypes)["eventTime"] == "timestamp"


def test_windows_events_document_array(spark, tmpdir_path):
    write_windows_events(tmpdir_path)
    dt = REGISTRY["WindowsDemoEvents"]
    raw = readers.read_raw(spark, tmpdir_path + "/win_0.json", dt)
    good, _ = readers.split_quarantine(raw, min_fields=1)
    from logverzcore_spark.operators.coerce import coerce

    typed = coerce(good.drop(readers.SOURCE_COL), dt.schema)
    assert typed.count() == 3
    # CRLF in Message replaced by space (reference worker.js:996-1000).
    msg = typed.where(typed["Id"] == 4624).first()["Message"]
    assert "\r" not in msg and "\n" not in msg and "Line two" in msg


def test_custom_schema_coercion_and_quarantine(spark, tmpdir_path):
    write_custom_csv_gz(tmpdir_path)
    dt = get_datatype("Custom", CUSTOM_SCHEMA)
    dt.options.update({"sep": ",", "header": "false"})
    raw = readers.read_raw(spark, tmpdir_path, dt)
    good, bad = readers.split_quarantine(raw)
    assert bad.count() == 1  # the 'garbage' row
    from logverzcore_spark.operators.coerce import coerce

    typed = coerce(good.drop(readers.SOURCE_COL), dt.schema)
    rows = {r["id"]: r for r in typed.collect()}
    assert rows[2]["score"] is None  # '-' numeric marker
    assert rows[3]["score"] is None  # '' numeric marker
    assert rows[4]["name"] is None and rows[4]["ok"] is None  # null/NULL words
    assert rows[1]["ok"] is True and rows[1]["score"] == 3.5
    assert rows[5]["ts"] is not None


@pytest.mark.parametrize(
    "where,expect",
    [
        ("SELECT * FROM S3Object s WHERE s.action = 'REJECT'", 4),
        ("SELECT * FROM S3Object s WHERE s.srcport != 443", 6),
        ("SELECT * FROM S3Object s WHERE s.protocol IN (17)", 2),
        ("SELECT * FROM S3Object s WHERE s.dstaddr LIKE '%172.31%'", 6),
        ("SELECT * FROM S3Object s WHERE s.action = 'ACCEPT' AND (s.bytes > 1000 OR s.protocol = 17)", 6),
    ],
)
def test_ingest_filter_matrix(spark, tmpdir_path, where, expect):
    """The FIXTURES.md filter matrix over VPCFlow (2 identical files)."""
    write_vpcflow_gz(tmpdir_path, n_files=2)
    cat = Catalog()
    job = CollectJob(
        path=tmpdir_path, datatype="VPCFlow",
        table_name=f"t_filter_{abs(hash(where)) % 10**8}",
        query_string=where, owners=["tester"],
    )
    report = collect(spark, job, catalog=cat, user=User("tester"))
    assert report.rows_written == expect
    assert cat.for_table(job.table_name).QuerySettings["QueryString"] == where
    spark.sql(f"DROP TABLE IF EXISTS {job.table_name}")


def test_collect_projection_and_quarantine_table(spark, tmpdir_path):
    write_custom_csv_gz(tmpdir_path)
    job = CollectJob(
        path=tmpdir_path, datatype="Custom", custom_schema=CUSTOM_SCHEMA,
        table_name="t_custom_proj",
        query_string="SELECT s.id, s.name FROM S3Object s WHERE s.score IS NOT MISSING",
    )
    # Custom read options travel via the registry-independent path:
    from logverzcore_spark import ingest

    dt = get_datatype("Custom", CUSTOM_SCHEMA)
    dt.options.update({"sep": ",", "header": "false"})
    orig = ingest.get_datatype
    ingest.get_datatype = lambda *a, **k: dt
    try:
        report = collect(spark, job, quarantine_table="t_custom_quar")
    finally:
        ingest.get_datatype = orig
    assert report.rows_written == 3  # ids 1,4,5 have non-null score
    assert report.rows_quarantined == 1
    assert spark.table("t_custom_proj").columns == ["id", "name"]
    assert spark.table("t_custom_quar").count() == 1
    spark.sql("DROP TABLE IF EXISTS t_custom_proj")
    spark.sql("DROP TABLE IF EXISTS t_custom_quar")


def test_plan_files(spark, tmpdir_path):
    from logverzcore_spark.ingest import plan_files

    write_vpcflow_gz(tmpdir_path, n_files=3)
    plan = plan_files(spark, CollectJob(path=tmpdir_path, datatype="VPCFlow", table_name="x"))
    assert plan.n_files == 3
    assert plan.total_bytes > 0
    assert plan.scan_partitions >= 1


def test_plan_files_honors_unit_suffix_conf(spark, tmpdir_path):
    """maxPartitionBytes set with a unit suffix ('128m') must parse, not
    ValueError (r1 ADVICE)."""
    from logverzcore_spark.ingest import _parse_byte_string, plan_files

    write_vpcflow_gz(tmpdir_path, n_files=1)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    try:
        plan = plan_files(
            spark, CollectJob(path=tmpdir_path, datatype="VPCFlow", table_name="x")
        )
        assert plan.max_partition_bytes == 128 * 1024 * 1024
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert _parse_byte_string(spark, "1g") == 1024**3
    assert _parse_byte_string(spark, "134217728b") == 134217728


def test_ingest_query_cannot_reference_other_tables(spark, tmpdir_path):
    """The ingest-time query runs in a gated scope: only the staged view
    is addressable; other session tables and DDL are rejected (r1 ADVICE
    ACL-bypass fix)."""
    from logverzcore_spark.plans.sqlgate import SqlValidationError

    write_vpcflow_gz(tmpdir_path, n_files=1)
    spark.range(3).write.mode("overwrite").saveAsTable("t_secret")
    try:
        for hostile in [
            "SELECT * FROM t_secret",
            "SELECT s.*, (SELECT max(id) FROM t_secret) x FROM S3Object s",
            "DROP TABLE t_secret",
        ]:
            job = CollectJob(
                path=tmpdir_path, datatype="VPCFlow",
                table_name="t_should_not_exist", query_string=hostile,
            )
            with pytest.raises(SqlValidationError):
                collect(spark, job)
        assert spark.table("t_secret").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS t_secret")
        spark.sql("DROP TABLE IF EXISTS t_should_not_exist")


def test_collect_partitioned_write_prunes(spark, tmpdir_path):
    """partition_by produces a partitioned table whose scan prunes
    partitions for equality filters (the date-partitioning scale story)."""
    write_vpcflow_gz(tmpdir_path, n_files=1)
    job = CollectJob(
        path=tmpdir_path, datatype="VPCFlow", table_name="t_part",
        partition_by=["action"],
    )
    collect(spark, job)
    plan = (
        spark.table("t_part").where("action = 'REJECT'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert spark.table("t_part").where("action = 'REJECT'").count() == 2
    # Partition filter must appear as a partition (not data) filter.
    assert "PartitionFilters" in plan or "action" not in plan.split("PushedFilters")[0]
    spark.sql("DROP TABLE IF EXISTS t_part")


def test_costdemo_schemas_registered_and_usable(spark, tmpdir_path):
    """CostDemoAWS/Azure (126/96 cols) are in the registry; a file carrying
    a column subset reads with drift tolerance (missing cols → NULL)."""
    import gzip, os
    from logverzcore_spark.operators.coerce import coerce

    dt = REGISTRY["CostDemoAWS"]
    assert len(dt.schema.fields) == 126
    assert len(REGISTRY["CostDemoAzure"].schema.fields) == 96
    cols = [f.name for f in dt.schema.fields[:6]]
    p = os.path.join(tmpdir_path, "cost.csv.gz")
    with gzip.open(p, "wt") as fh:
        fh.write(",".join(cols) + "\n")
        fh.write("li-1,2024-01,42,AWS,Anniversary,123.0\n")
        fh.write("li-2,2024-02,-,AWS,Anniversary,456.0\n")
    raw = readers.read_raw(spark, p, dt)
    good, _ = readers.split_quarantine(raw)
    typed = coerce(good.drop(readers.SOURCE_COL), dt.schema)
    rows = typed.collect()
    assert len(rows) == 2
    assert rows[0]["identity_line_item_id"] in ("li-1", "li-2")
    assert {r["bill_invoice_id"] for r in rows} == {42, None}  # '-' → NULL int
    assert all(r["line_item_line_item_type"] is None for r in rows)  # drift col


def test_cloudtrail_typed_struct_view(spark, tmpdir_path):
    """typed_json_view turns the string-JSON twin into a real struct
    queryable by path without get_json_object."""
    from logverzcore_spark.operators.coerce import coerce
    from logverzcore_spark.schemas import typed_json_view

    write_cloudtrail_gz(tmpdir_path)
    dt = REGISTRY["CloudTrail"]
    raw = readers.read_raw(spark, tmpdir_path, dt)
    good, _ = readers.split_quarantine(raw, min_fields=1)
    typed = typed_json_view(coerce(good.drop(readers.SOURCE_COL), dt.schema), dt)
    assert "userIdentity_struct" in typed.columns
    got = (
        typed.where(typed["errorCode"] == "AccessDenied")
        .select("userIdentity_struct.sessionContext.sessionIssuer.userName")
        .collect()
    )
    assert [r[0] for r in got] == ["role2"]
    # String twin still present for ->>-style parity.
    assert dict(typed.dtypes)["userIdentity"] == "string"


def test_corrupt_json_file_reaches_quarantine(spark, tmpdir_path):
    """A malformed JSON document must land in quarantine with lineage,
    not silently vanish in the root-element explode."""
    import gzip, os

    write_cloudtrail_gz(tmpdir_path)  # one valid file
    with gzip.open(os.path.join(tmpdir_path, "ct_bad.json.gz"), "wt") as fh:
        fh.write('{"Records": [ {"eventName": "broken"')  # truncated doc
    dt = REGISTRY["CloudTrail"]
    raw = readers.read_raw(spark, tmpdir_path, dt)
    good, bad = readers.split_quarantine(raw, min_fields=1)
    assert good.count() == 4  # the valid file's records
    assert bad.count() >= 1
    assert "ct_bad" in bad.first()[readers.SOURCE_COL]


def test_projection_only_ingest_query_applies(spark, tmpdir_path):
    """A projection-only legacy query (no WHERE) must not be silently
    ignored (only the trivial SELECT * default is a no-op)."""
    write_vpcflow_gz(tmpdir_path, n_files=1)
    job = CollectJob(
        path=tmpdir_path, datatype="VPCFlow", table_name="t_proj_only",
        query_string="SELECT s.srcaddr, s.bytes FROM S3Object s",
    )
    collect(spark, job)
    assert spark.table("t_proj_only").columns == ["srcaddr", "bytes"]
    spark.sql("DROP TABLE IF EXISTS t_proj_only")


def test_classiclb_plain_csv(spark, tmpdir_path):
    """ClassicLB (B4): plain uncompressed space-delimited CSV with quoted
    request/user-agent fields and '-' numeric null markers."""
    from rawfixtures import write_classiclb_csv

    write_classiclb_csv(tmpdir_path)
    rep = collect(
        spark,
        CollectJob(path=tmpdir_path, datatype="ClassicLB", table_name="t_clb"),
    )
    try:
        out = spark.table("t_clb").orderBy("timestamp").collect()
        assert rep.rows_written == 3
        # Quoted multi-word field survives with spaces intact.
        assert out[0]["request"] == "GET http://example.com:80/ HTTP/1.1"
        assert out[1]["request_processing_time"] is None  # '-' -> NULL
        assert out[1]["elb_status_code"] == 504
        assert out[2]["request"] == "GET https://example.com:443/a b HTTP/1.1"
        assert out[0]["received_bytes"] == 0 and out[2]["sent_bytes"] == 312
    finally:
        spark.sql("DROP TABLE IF EXISTS t_clb")


def test_networklb_gzip_csv(spark, tmpdir_path):
    """NetworkLB (B5): gzip space-delimited CSV, no header; '-' markers in
    numeric columns coerce to NULL."""
    from rawfixtures import write_networklb_gz

    write_networklb_gz(tmpdir_path)
    rep = collect(
        spark,
        CollectJob(path=tmpdir_path, datatype="NetworkLB", table_name="t_nlb"),
    )
    try:
        out = spark.table("t_nlb").orderBy("timestamp").collect()
        assert rep.rows_written == 2
        assert out[0]["connection_time"] == 5.0
        assert out[0]["alpn_client_preference_list"] == "h2,http/1.1"
        assert out[1]["connection_time"] is None  # '-' -> NULL
        assert out[1]["incoming_tls_alert"] == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS t_nlb")


def test_zip_csv_quoted_embedded_newline(spark, tmpdir_path):
    """A quoted field containing a newline inside a ZIP CSV must parse as
    ONE record (the reference's PapaParse handled this; a naive line
    split breaks the row in two). VERDICT r2 edge case."""
    import os
    import zipfile as _zipfile

    from logverzcore_spark.schemas import DataType, _schema

    dt = DataType(
        name="MiniQuoted",
        format="csv",
        options={"sep": ",", "header": "true", "quote": '"'},
        schema=_schema(("id", "string"), ("msg", "string"), ("code", "string")),
    )
    text = (
        "id,msg,code\n"
        '1,"hello world",A\n'
        '2,"line one\nline two",B\n'
        '3,plain,C\n'
    )
    p = os.path.join(tmpdir_path, "quoted.zip")
    with _zipfile.ZipFile(p, "w") as zf:
        zf.writestr("inner.csv", text)
    df = readers.read_zip_csv(spark, p, dt)
    good, bad = readers.split_quarantine(df)
    assert bad.count() == 0
    rows = {r["id"]: (r["msg"], r["code"]) for r in good.collect()}
    assert rows == {
        "1": ("hello world", "A"),
        "2": ("line one\nline two", "B"),
        "3": ("plain", "C"),
    }


def test_system_datatypes_and_placeholder():
    """Registry parity with the reference's 12 schema entries: the
    system-table shapes (Invocations, ProcessingErrors) resolve with
    their Default views; the SetDataTypePlease placeholder fails loudly
    (its registry 'schema' is a prose string in the reference too)."""
    import pytest

    from logverzcore_spark.schemas import REGISTRY, get_datatype

    inv = get_datatype("Invocations")
    assert inv.views["Default"] == ["jobid", "invocationid", "status", "logstream"]
    pe = get_datatype("ProcessingErrors")
    assert "errormessage" in [f.name for f in pe.schema.fields]
    with pytest.raises(ValueError):
        get_datatype("SetDataTypePlease")
    assert len(REGISTRY) == 11  # 9 log types + 2 system shapes


def test_incremental_collect_modified_after(spark, tmpdir_path):
    """Incremental re-collection: modifiedAfter prunes files at the FILE
    INDEX (old files never read), and mode='append' folds only the new
    arrivals into the table."""
    import os
    import time

    from logverzcore_spark.ingest import CollectJob, collect
    from rawfixtures import VPCFLOW_ROWS, write_vpcflow_gz

    d = f"{tmpdir_path}/inc"
    os.makedirs(d)
    old_f, new_f = write_vpcflow_gz(d, n_files=2)
    cutoff_epoch = time.time()
    os.utime(old_f, (cutoff_epoch - 100, cutoff_epoch - 100))
    os.utime(new_f, (cutoff_epoch + 100, cutoff_epoch + 100))

    try:
        # full collection sees both files
        rep = collect(
            spark, CollectJob(path=d, datatype="VPCFlow", table_name="inc_tab")
        )
        assert rep.rows_written == 2 * len(VPCFLOW_ROWS)
        assert rep.files_seen == 2

        from datetime import datetime, timezone

        cutoff = datetime.fromtimestamp(
            cutoff_epoch, tz=timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%S")
        inc = CollectJob(
            path=d,
            datatype="VPCFlow",
            table_name="inc_tab",
            mode="append",
            reader_options={"modifiedAfter": cutoff},
        )
        rep2 = collect(spark, inc)
        assert rep2.rows_written == len(VPCFLOW_ROWS)  # new file only
        assert rep2.files_seen == 1  # old file pruned at the file index
        assert spark.table("inc_tab").count() == 3 * len(VPCFLOW_ROWS)
    finally:
        spark.sql("DROP TABLE IF EXISTS inc_tab")


def test_collect_dedupe_on_drops_redelivered_rows(spark, tmpdir_path):
    """dedupe_on guards against at-least-once upstream redelivery: two
    identical files collapse to one file's rows under full-row dedup."""
    import os

    from logverzcore_spark.ingest import CollectJob, collect
    from rawfixtures import VPCFLOW_ROWS, write_vpcflow_gz

    d = f"{tmpdir_path}/dd"
    os.makedirs(d)
    write_vpcflow_gz(d, n_files=2)  # identical content = a redelivery
    try:
        rep = collect(
            spark,
            CollectJob(
                path=d, datatype="VPCFlow", table_name="dd_tab",
                dedupe_on=["*"],
            ),
        )
        assert rep.rows_written == len(VPCFLOW_ROWS)
        rep2 = collect(
            spark,
            CollectJob(
                path=d, datatype="VPCFlow", table_name="dd_tab2",
                dedupe_on=["srcaddr", "dstaddr", "srcport", "dstport", "start"],
            ),
        )
        assert rep2.rows_written == len(VPCFLOW_ROWS)

        # cross-INVOCATION redelivery (the common SQS case): appending
        # the same files again must write zero rows.
        rep3 = collect(
            spark,
            CollectJob(
                path=d, datatype="VPCFlow", table_name="dd_tab",
                dedupe_on=["*"], mode="append",
            ),
        )
        assert rep3.rows_written == 0
        assert spark.table("dd_tab").count() == len(VPCFLOW_ROWS)
    finally:
        spark.sql("DROP TABLE IF EXISTS dd_tab")
        spark.sql("DROP TABLE IF EXISTS dd_tab2")


# ---------------------------------------------------------------- avro


def test_avro_ocf_roundtrip_all_types_and_codecs(spark, tmpdir_path):
    """Encoder→decoder→Spark round trip over every supported primitive,
    nullable unions (both orders), negative zigzag edges, multi-block
    files, and both codecs; corrupt and schema-mismatched files land in
    quarantine with lineage instead of failing the scan."""
    import os

    from pyspark.sql import functions as F

    from logverzcore_spark.sources.avro_ocf import (
        avro_to_spark_schema,
        decode_ocf,
        encode_ocf,
        read_avro,
    )

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "b", "type": ["bytes", "null"]},  # reversed union
            {"name": "d", "type": "double"},
            {"name": "f", "type": "float"},
            {"name": "ok", "type": "boolean"},
        ],
    }
    recs = [
        {
            "id": (-1) ** k * (2**62 - k),
            "i": k - 50,
            "s": None if k % 7 == 0 else f"s{k} é中\n\"q\"",
            "b": None if k % 5 == 0 else bytes([k % 256]),
            "d": k / 3.0,
            "f": float(k),
            "ok": k % 2 == 0,
        }
        for k in range(300)
    ]
    d = os.path.join(tmpdir_path, "avro")
    os.makedirs(d)
    for name, codec in (("a.avro", "null"), ("b.avro", "deflate")):
        blob = encode_ocf(recs, schema, codec=codec, records_per_block=64)
        s2, back = decode_ocf(blob)
        assert s2 == schema and back == recs  # byte-level round trip
        with open(os.path.join(d, name), "wb") as fh:
            fh.write(blob)
    with open(os.path.join(d, "corrupt.avro"), "wb") as fh:
        fh.write(b"Obj\x01\xff\xff\xff")  # truncated header
    with open(os.path.join(d, "other.avro"), "wb") as fh:
        fh.write(
            encode_ocf(
                [{"x": 1}],
                {"type": "record", "name": "o",
                 "fields": [{"name": "x", "type": "long"}]},
            )
        )

    assert (
        avro_to_spark_schema(schema).simpleString()
        == "struct<id:bigint,i:int,s:string,b:binary,d:double,f:float,ok:boolean>"
    )
    df = read_avro(spark, d)
    clean = df.where(F.col("_corrupt_record").isNull())
    assert clean.count() == 600  # both files, nothing lost
    bad = {
        r["_corrupt_record"]
        for r in df.where(F.col("_corrupt_record").isNotNull()).collect()
    }
    assert len(bad) == 2
    assert any("schema differs" in e for e in bad)
    # exact value fidelity through the Spark path (one file's worth)
    got = sorted(
        (r.asDict() for r in clean.where("_source_file LIKE '%a.avro'").collect()),
        key=lambda r: (r["id"], r["i"]),
    )
    exp = sorted(recs, key=lambda r: (r["id"], r["i"]))
    for g, e in zip(got, exp):
        assert g["id"] == e["id"] and g["i"] == e["i"] and g["s"] == e["s"]
        assert (g["b"] is None) == (e["b"] is None)
        if g["b"] is not None:
            assert bytes(g["b"]) == e["b"]
        assert g["d"] == e["d"] and g["ok"] == e["ok"]
        assert abs(g["f"] - e["f"]) < 1e-6


def test_avro_unsupported_shapes_raise(spark):
    """Arrays/maps/nested records/snappy are honestly out of scope:
    loud NotImplementedError, never silent corruption."""
    import pytest as _pytest

    from logverzcore_spark.sources.avro_ocf import (
        avro_to_spark_schema,
        encode_ocf,
    )

    arr_schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}],
    }
    with _pytest.raises(NotImplementedError):
        encode_ocf([{"a": [1]}], arr_schema)
    with _pytest.raises(NotImplementedError):
        avro_to_spark_schema(arr_schema)
    with _pytest.raises(NotImplementedError):
        encode_ocf(
            [{"x": 1}],
            {"type": "record", "name": "r",
             "fields": [{"name": "x", "type": "long"}]},
            codec="snappy",
        )


def test_collect_avro_datatype_end_to_end(spark, tmpdir_path):
    """Avro is a first-class ingest format: a CollectJob over .avro
    files runs the same read -> stringify -> coerce -> quarantine path
    as CSV/JSON — typed table out, corrupt file accounted as one
    quarantined row, not lost."""
    import os

    from pyspark.sql import functions as F

    from logverzcore_spark.schemas import REGISTRY, DataType, _schema
    from logverzcore_spark.sources.avro_ocf import encode_ocf

    schema = {
        "type": "record", "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
        ],
    }
    d = os.path.join(tmpdir_path, "avro_in")
    os.makedirs(d)
    recs = [
        {"doc_id": i, "text": f"body {i}", "score": i / 4.0} for i in range(60)
    ]
    with open(os.path.join(d, "a.avro"), "wb") as fh:
        fh.write(encode_ocf(recs[:30], schema, codec="null"))
    with open(os.path.join(d, "b.avro"), "wb") as fh:
        fh.write(encode_ocf(recs[30:], schema, codec="deflate"))
    with open(os.path.join(d, "bad.avro"), "wb") as fh:
        fh.write(b"Obj\x01broken")

    REGISTRY["AvroDocs"] = DataType(
        name="AvroDocs",
        format="avro",
        schema=_schema(("doc_id", "long"), ("text", "string"),
                       ("score", "double")),
    )
    try:
        rep = collect(
            spark,
            CollectJob(path=d, datatype="AvroDocs", table_name="avro_tab"),
        )
        assert rep.rows_written == 60
        assert rep.rows_quarantined == 1  # the corrupt file, with lineage
        tab = spark.table("avro_tab")
        assert dict(tab.dtypes)["doc_id"] == "bigint"
        assert dict(tab.dtypes)["score"] == "double"
        assert tab.agg(F.sum("doc_id")).first()[0] == sum(range(60))
    finally:
        REGISTRY.pop("AvroDocs", None)
        spark.sql("DROP TABLE IF EXISTS avro_tab")
