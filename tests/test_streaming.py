"""Continuous-collection tests (SURVEY §2.7, §3.2): incremental file
pickup, pathGlobFilter prefix/suffix semantics, and exactly-once across a
stream restart (the upgrade over the reference's at-least-once SQS path)."""

import os

from logverzcore_spark.schemas import REGISTRY
from logverzcore_spark.sources import readers
from logverzcore_spark.streaming.collect_stream import collect_stream

from rawfixtures import VPCFLOW_ROWS, write_vpcflow_gz


def _string_schema(dt):
    return readers._string_schema(dt, with_corrupt=False)


def test_stream_ingest_exactly_once_across_restart(spark, tmpdir_path):
    watch = os.path.join(tmpdir_path, "incoming")
    os.makedirs(watch)
    ckpt = os.path.join(tmpdir_path, "ckpt")
    dt = REGISTRY["VPCFlow"]
    table = "st_vpc_eo"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    def run_round():
        q = collect_stream(
            spark, watch, _string_schema(dt), table,
            fmt="csv", reader_options=dict(dt.options),
            path_glob_filter="vpcflow_*.log.gz",
            max_files_per_trigger=2, checkpoint_dir=ckpt, available_now=True,
        )
        q.awaitTermination()

    # Round 1: two files land.
    write_vpcflow_gz(watch, n_files=2)
    run_round()
    assert spark.table(table).count() == 2 * len(VPCFLOW_ROWS)

    # Round 2 (restart, same checkpoint): one NEW file + a non-matching
    # file that the glob must ignore; old files must not re-ingest.
    import gzip

    with gzip.open(os.path.join(watch, "vpcflow_9.log.gz"), "wt") as fh:
        from rawfixtures import VPCFLOW_HEADER, vpcflow_line

        fh.write("\n".join([VPCFLOW_HEADER] + [vpcflow_line(i, r) for i, r in enumerate(VPCFLOW_ROWS)]) + "\n")
    with open(os.path.join(watch, "ignore_me.txt"), "w") as fh:
        fh.write("not a log\n")
    run_round()
    assert spark.table(table).count() == 3 * len(VPCFLOW_ROWS)

    # Round 3 (restart, nothing new): count unchanged — exactly-once.
    run_round()
    assert spark.table(table).count() == 3 * len(VPCFLOW_ROWS)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stream_ingest_filter(spark, tmpdir_path):
    """Ingest-time WHERE applied on the stream (P1 streaming form),
    including the legacy FROM-clause shim."""
    watch = os.path.join(tmpdir_path, "in2")
    os.makedirs(watch)
    dt = REGISTRY["VPCFlow"]
    table = "st_vpc_filtered"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_vpcflow_gz(watch, n_files=1)
    q = collect_stream(
        spark, watch, _string_schema(dt), table,
        fmt="csv", reader_options=dict(dt.options),
        where="SELECT s.srcaddr, s.dstaddr, s.action FROM S3Object s WHERE s.action = 'REJECT'",
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt2"), available_now=True,
    )
    q.awaitTermination()
    out = spark.table(table)
    assert out.columns == ["srcaddr", "dstaddr", "action"]
    assert out.count() == 2
    spark.sql(f"DROP TABLE IF EXISTS {table}")
