"""End-to-end lifecycle test — the reference's three entry points
(SURVEY §3.1 batch job, §3.2 continuous collection, §3.3 interactive
query) run as one scenario against the same catalog: a user of the
reference switching to this engine follows exactly this path.
"""

import os

import pytest

from logverzcore_spark.api import Engine
from logverzcore_spark.catalog import Catalog, User
from logverzcore_spark.ingest import CollectJob, collect
from logverzcore_spark.schemas import REGISTRY
from logverzcore_spark.streaming.collect_stream import collect_stream
from pyspark.sql import types as T

from rawfixtures import write_vpcflow_gz

ALICE = User("alice")
BOB = User("bob", groups=["netops"])
MALLORY = User("mallory")
ADMIN = User("root", is_admin=True)


def test_reference_lifecycle_end_to_end(spark, tmpdir_path):
    raw = os.path.join(tmpdir_path, "landing")
    os.makedirs(raw)
    write_vpcflow_gz(raw, n_files=2)
    cat = Catalog(path=f"{tmpdir_path}/catalog.jsonl")
    table = "lc_flows"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    # -- §3.1 batch collection job (jobproducer → controller → workers) --
    report = collect(
        spark,
        CollectJob(
            path=raw, datatype="VPCFlow", table_name=table,
            query_string="SELECT * FROM S3Object s WHERE s.action = 'ACCEPT'",
            owners=["alice"], access=["netops"],
        ),
        catalog=cat, user=ALICE,
        metrics_table="lc_metrics", quarantine_table="lc_quarantine",
    )
    assert report.rows_written > 0 and report.files_seen == 2
    entry = cat.for_table(table)
    assert entry and entry.Type == "C" and entry.Owners == ["alice"]
    # Invocations-style job metrics recorded.
    m = spark.table("lc_metrics").first()
    assert m["status"] == "completed" and m["rows_written"] == report.rows_written

    # -- §3.3 interactive query surface over the collected dataset --
    eng = Engine(spark, cat)
    n_all = eng.sql(f"SELECT count(*) AS n FROM {table}", user=BOB).first()["n"]
    assert n_all == report.rows_written
    with pytest.raises(PermissionError):
        eng.sql(f"SELECT * FROM {table}", user=MALLORY)
    found = eng.find_all(
        table, user=BOB,
        where={"action": {"eq": "ACCEPT"}}, attributes=["srcaddr", "dstaddr"],
        limit=5,
    )
    assert found.columns == ["srcaddr", "dstaddr"] and found.count() > 0
    assert table in eng.list_tables(pattern="lc_*", user=BOB)
    eng.save_query("lc_daily", f"SELECT srcaddr, count(*) AS n FROM {table} GROUP BY srcaddr",
                   user=ALICE, access=["netops"])
    assert eng.run_saved("lc_daily", user=BOB).count() > 0

    # -- §3.2 continuous collection: owns its OWN typed table (the
    # reference creates the dataset table at CC setup, collection.js:363) --
    more = os.path.join(tmpdir_path, "landing_cc")
    os.makedirs(more)
    write_vpcflow_gz(more, n_files=1)
    dt = REGISTRY["VPCFlow"]
    schema = T.StructType([T.StructField(f.name, T.StringType()) for f in dt.schema.fields])
    cc_table = "lc_flows_cc"
    spark.sql(f"DROP TABLE IF EXISTS {cc_table}")
    q = collect_stream(
        spark, more, schema, cc_table,
        fmt="csv", reader_options=dict(dt.options),
        where="SELECT * FROM S3Object s WHERE s.action = 'ACCEPT'",
        checkpoint_dir=os.path.join(tmpdir_path, "lc_ckpt"), available_now=True,
        coerce_to=dt.schema,
    )
    q.awaitTermination()
    cc = spark.table(cc_table)
    assert cc.count() == 3  # one file's ACCEPT rows
    # The coercion pass ran on the stream: typed like the batch table.
    assert dict((f.name, f.dataType) for f in cc.schema.fields)["srcport"].simpleString() == "int"
    # Streaming into the BATCH table is refused — the sink's
    # _spark_metadata log would hide every batch-written row.
    with pytest.raises(ValueError, match="_spark_metadata"):
        collect_stream(
            spark, more, schema, table, fmt="csv",
            reader_options=dict(dt.options),
            checkpoint_dir=os.path.join(tmpdir_path, "lc_ckpt2"), available_now=True,
        )
    spark.sql(f"DROP TABLE IF EXISTS {cc_table}")

    # -- teardown path: owner-gated delete + catalog deactivation --
    with pytest.raises(PermissionError):
        eng.delete_table(table, user=MALLORY)
    eng.delete_table(table, user=ALICE)
    assert cat.for_table(table) is None
    assert table not in [t.name for t in spark.catalog.listTables()]
    for t in ("lc_metrics", "lc_quarantine"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
