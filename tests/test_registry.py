"""Multi-database registry tests — the reference supports several
registered analytics DBs per deployment (SSM /Logverz/Database/Registry,
LookupDBParameters); here registered Spark databases with separate
warehouse locations, name-resolved per job/query."""

import os

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.api import Engine
from logverzcore_spark.catalog import Catalog, CatalogEntry, User
from logverzcore_spark.ingest import CollectJob, collect
from logverzcore_spark.registry import DatabaseRegistry, split_table_ref

from rawfixtures import write_vpcflow_gz


def test_split_table_ref():
    assert split_table_ref("t") == ("default", "t")
    assert split_table_ref("db.t") == ("db", "t")
    assert split_table_ref("`db`.`t`") == ("db", "t")
    assert split_table_ref("spark_catalog.db.t") == ("db", "t")


def test_register_resolve_and_guards(spark, tmpdir_path):
    reg = DatabaseRegistry(spark, path=f"{tmpdir_path}/registry.jsonl")
    reg.register("archive_db", location=f"{tmpdir_path}/arch_wh")
    assert reg.resolve("archive_db").location == f"{tmpdir_path}/arch_wh"
    # Idempotent re-register; conflicting location rejected.
    reg.register("archive_db", location=f"{tmpdir_path}/arch_wh")
    with pytest.raises(ValueError):
        reg.register("archive_db", location=f"{tmpdir_path}/elsewhere")
    with pytest.raises(KeyError):
        reg.resolve("nope")
    with pytest.raises(ValueError):
        reg.register("bad-name!")
    with pytest.raises(ValueError):
        reg.drop("default")
    # Persistence round-trip.
    reg2 = DatabaseRegistry(spark, path=f"{tmpdir_path}/registry.jsonl")
    assert reg2.resolve("archive_db").location == f"{tmpdir_path}/arch_wh"
    reg.drop("archive_db", cascade=True)


def test_collect_into_registered_databases(spark, tmpdir_path):
    """Same table name into two registered DBs: rows land under each DB's
    own warehouse location and the catalog keeps both entries distinct."""
    os.makedirs(tmpdir_path + "/raw", exist_ok=True)
    write_vpcflow_gz(tmpdir_path + "/raw", n_files=2)
    reg = DatabaseRegistry(spark)
    cat = Catalog()
    try:
        reg.register("db_a", location=f"{tmpdir_path}/wh_a")
        reg.register("db_b", location=f"{tmpdir_path}/wh_b")
        for db, where in (("db_a", None), ("db_b", "SELECT * FROM S3Object s WHERE s.srcport = 443")):
            collect(
                spark,
                CollectJob(
                    path=tmpdir_path + "/raw", datatype="VPCFlow",
                    table_name="flows", database=db,
                    query_string=where, owners=["alice"],
                ),
                catalog=cat, registry=reg,
            )
        n_a = spark.table("db_a.flows").count()
        n_b = spark.table("db_b.flows").count()
        assert n_a > n_b > 0 or (n_b == 0 and n_a > 0)
        assert os.path.isdir(f"{tmpdir_path}/wh_a/flows")
        assert os.path.isdir(f"{tmpdir_path}/wh_b/flows")
        assert cat.for_table("flows", "db_a") is not None
        assert cat.for_table("flows", "db_b") is not None
        # Unregistered database: refuse rather than land in default.
        with pytest.raises((ValueError, KeyError)):
            collect(
                spark,
                CollectJob(path=tmpdir_path + "/raw", datatype="VPCFlow",
                           table_name="flows", database="ghost"),
                registry=reg,
            )
        with pytest.raises(ValueError):
            collect(
                spark,
                CollectJob(path=tmpdir_path + "/raw", datatype="VPCFlow",
                           table_name="flows", database="db_a"),
            )  # non-default db without a registry
    finally:
        for db in ("db_a", "db_b"):
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_qualified_table_acl(spark, tmpdir_path):
    """A db-qualified query authorizes against THAT database's catalog
    entries — visibility in one DB must not leak into another."""
    reg = DatabaseRegistry(spark)
    cat = Catalog()
    alice = User("alice")
    try:
        reg.register("db_acl", location=f"{tmpdir_path}/wh_acl")
        spark.range(5).write.mode("overwrite").saveAsTable("db_acl.nums")
        cat.record_query(CatalogEntry(TableName="nums", DatabaseName="db_acl", Owners=["alice"]))
        eng = Engine(spark, cat)
        assert eng.sql("SELECT count(*) AS n FROM db_acl.nums", user=alice).first()["n"] == 5
        # Same table name, different (unregistered-in-catalog) database →
        # no entry → non-admin denied.
        spark.range(3).write.mode("overwrite").saveAsTable("nums")
        with pytest.raises(PermissionError):
            eng.sql("SELECT * FROM nums", user=alice)
        spark.sql("DROP TABLE IF EXISTS nums")
    finally:
        spark.sql("DROP DATABASE IF EXISTS db_acl CASCADE")


def test_collect_stream_into_registered_database(spark, tmpdir_path):
    """Continuous collection routes its sink through the registry, same
    as batch collect (the reference's DBServerAlias parameter)."""
    from logverzcore_spark.schemas import REGISTRY
    from logverzcore_spark.streaming.collect_stream import collect_stream
    from pyspark.sql import types as T

    watch = os.path.join(tmpdir_path, "stream_in")
    os.makedirs(watch)
    write_vpcflow_gz(watch, n_files=1)
    dt = REGISTRY["VPCFlow"]
    schema = T.StructType([T.StructField(f.name, T.StringType()) for f in dt.schema.fields])
    reg = DatabaseRegistry(spark)
    try:
        reg.register("db_stream", location=f"{tmpdir_path}/wh_stream")
        q = collect_stream(
            spark, watch, schema, "flows_cc",
            fmt="csv", reader_options=dict(dt.options),
            checkpoint_dir=os.path.join(tmpdir_path, "ckpt_reg"),
            available_now=True, database="db_stream", registry=reg,
        )
        q.awaitTermination()
        assert spark.table("db_stream.flows_cc").count() > 0
        assert os.path.isdir(f"{tmpdir_path}/wh_stream/flows_cc")
        with pytest.raises(ValueError):
            collect_stream(
                spark, watch, schema, "flows_cc", fmt="csv",
                database="db_other",  # no registry passed
            )
    finally:
        spark.sql("DROP DATABASE IF EXISTS db_stream CASCADE")


def test_list_tables_per_database_visibility(spark, tmpdir_path):
    """list_tables(database=…) lists that DB and filters visibility by
    (database, table) — an entry in db_x must not expose a same-named
    table in default."""
    reg = DatabaseRegistry(spark)
    cat = Catalog()
    alice = User("alice")
    try:
        reg.register("db_x", location=f"{tmpdir_path}/wh_x")
        spark.range(1).write.mode("overwrite").saveAsTable("db_x.shared_name")
        spark.range(1).write.mode("overwrite").saveAsTable("shared_name")
        cat.record_query(CatalogEntry(TableName="shared_name", DatabaseName="db_x", Owners=["alice"]))
        eng = Engine(spark, cat)
        assert "shared_name" in eng.list_tables(user=alice, database="db_x")
        assert "shared_name" not in eng.list_tables(user=alice)  # default DB: no entry
        spark.sql("DROP TABLE IF EXISTS shared_name")
    finally:
        spark.sql("DROP DATABASE IF EXISTS db_x CASCADE")


def test_engine_submit_job_uses_registry(spark, tmpdir_path):
    """Engine.submit_job (the jobproducer surface) routes through the
    engine's catalog AND registry in one call."""
    os.makedirs(tmpdir_path + "/raw2", exist_ok=True)
    write_vpcflow_gz(tmpdir_path + "/raw2", n_files=1)
    reg = DatabaseRegistry(spark)
    cat = Catalog()
    try:
        reg.register("db_j", location=f"{tmpdir_path}/wh_j")
        eng = Engine(spark, cat, registry=reg)
        rep = eng.submit_job(
            CollectJob(path=tmpdir_path + "/raw2", datatype="VPCFlow",
                       table_name="jflows", database="db_j", owners=["alice"]),
            user=User("alice"),
        )
        assert rep.rows_written > 0
        assert spark.table("db_j.jflows").count() == rep.rows_written
        assert cat.for_table("jflows", "db_j") is not None
    finally:
        spark.sql("DROP DATABASE IF EXISTS db_j CASCADE")


def test_qualified_validates_table_name(spark):
    """qualified() applies the identifier rule to the TABLE too — a
    backtick in an unvalidated name would escape the quoting and
    redirect the write (ADVICE r2)."""
    reg = DatabaseRegistry(spark)
    assert reg.qualified("default", "good_name") == "`default`.`good_name`"
    for bad in ("evil`.`other", "semi;colon", "has space", ""):
        with pytest.raises(ValueError):
            reg.qualified("default", bad)


def test_collect_rejects_invalid_sink_names(spark, tmpdir_path):
    """Every sink name reaching collect (target, quarantine, metrics)
    goes through the same identifier validation."""
    write_vpcflow_gz(tmpdir_path, n_files=1)
    with pytest.raises(ValueError):
        collect(
            spark,
            CollectJob(path=tmpdir_path, datatype="VPCFlow", table_name="bad`name"),
        )
    with pytest.raises(ValueError):
        collect(
            spark,
            CollectJob(path=tmpdir_path, datatype="VPCFlow", table_name="ok_t"),
            quarantine_table="evil`.`q",
        )


def test_list_tables_follows_current_database(spark, tmpdir_path):
    """list_tables(database=None) resolves the session's CURRENT database
    and uses that one value for both the listing and the visibility
    filter — after USE db, non-admins are filtered against db's catalog
    entries, not default's (ADVICE r2)."""
    reg = DatabaseRegistry(spark)
    cat = Catalog()
    alice = User("alice")
    try:
        reg.register("db_cur", location=f"{tmpdir_path}/wh_cur")
        spark.range(1).write.mode("overwrite").saveAsTable("db_cur.cur_tab")
        cat.record_query(
            CatalogEntry(TableName="cur_tab", DatabaseName="db_cur", Owners=["alice"])
        )
        eng = Engine(spark, cat)
        spark.catalog.setCurrentDatabase("db_cur")
        try:
            assert "cur_tab" in eng.list_tables(user=alice)
        finally:
            spark.catalog.setCurrentDatabase("default")
    finally:
        spark.sql("DROP DATABASE IF EXISTS db_cur CASCADE")
