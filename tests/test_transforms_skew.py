"""Transforms hook (§2.8) and skew utilities."""

from pyspark.sql import functions as F

from logverzcore_spark.ingest import CollectJob, collect
from logverzcore_spark.operators import skew
from logverzcore_spark.transforms import apply_transforms

from rawfixtures import write_vpcflow_gz


def test_transforms_in_collect(spark, tmpdir_path):
    write_vpcflow_gz(tmpdir_path, n_files=1)
    job = CollectJob(
        path=tmpdir_path, datatype="VPCFlow", table_name="t_tf",
        transforms=[
            {"name": "mask_ip", "column": "srcaddr"},
            {"name": "hash_column", "column": "account-id"},
            {"name": "drop_columns", "columns": ["az-id"]},
        ],
    )
    collect(spark, job)
    t = spark.table("t_tf")
    assert "az-id" not in t.columns
    srcs = {r[0] for r in t.select("srcaddr").collect()}
    assert srcs <= {"10.0.0.0"}  # host octet masked
    acct = t.select("`account-id`").first()[0]
    assert isinstance(acct, str) and len(acct) == 32  # md5-pseudonymized
    spark.sql("DROP TABLE IF EXISTS t_tf")


def test_unknown_transform(spark):
    df = spark.range(1)
    try:
        apply_transforms(df, [{"name": "nope"}])
        raise AssertionError("expected KeyError")
    except KeyError as exc:
        assert "nope" in str(exc)


def test_salted_aggregate_matches_plain(spark):
    # Skewed: 90% of rows share one key.
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 13).alias("v"),
    )
    got = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in skew.salted_aggregate(
            df, ["k"], {"n": ("count", "*"), "total": ("sum", "v"), "mx": ("max", "v")}
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_salted_collect_set(spark):
    df = spark.range(1000).select(F.lit(1).alias("k"), (F.col("id") % 17).alias("v"))
    out = skew.salted_aggregate(df, ["k"], {"vals": ("collect_set", "v")}).collect()
    assert sorted(out[0]["vals"]) == list(range(17))


def test_salted_join_matches_plain(spark):
    fact = spark.range(20_000).select(
        F.when(F.col("id") % 4 != 3, F.lit(5)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("rowid"),
    )
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("attr"))
    got = skew.salted_broadcast_left(fact, dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    want = fact.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_normalize_text_transform(spark):
    from logverzcore_spark.transforms import apply_transforms

    df = spark.createDataFrame(
        [("  Hello,   WORLD!! (test) ",), ("already clean",)], "t string"
    )
    out = [r["t"] for r in apply_transforms(df, [{"name": "normalize_text", "column": "t"}]).collect()]
    assert out == ["hello world test", "already clean"]


def test_redact_pii_transform(spark):
    from logverzcore_spark.transforms import apply_transforms

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.co from 10.1.2.3 or +1 (415) 555-0100 now"),
            (2, "card 4111 1111 1111 1111 plain text stays"),
            (3, "nothing sensitive here"),
        ],
        "id long, body string",
    )
    out = {
        r["id"]: r["body"]
        for r in apply_transforms(
            df, [{"name": "redact_pii", "column": "body"}]
        ).collect()
    }
    assert out[1] == "mail <EMAIL> from <IPV4> or <PHONE> now"
    assert out[2] == "card <CARD> plain text stays"
    assert out[3] == "nothing sensitive here"
    # kinds subset: only emails touched
    only_email = {
        r["id"]: r["body"]
        for r in apply_transforms(
            df, [{"name": "redact_pii", "column": "body", "kinds": ["email"]}]
        ).collect()
    }
    assert "10.1.2.3" in only_email[1] and "<EMAIL>" in only_email[1]
