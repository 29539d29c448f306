"""Ingest throughput probe: synthesize a gzip'd VPCFlow corpus of a
requested size, run `ingest.collect` end-to-end (decompress → headerless
CSV parse → coercion → filter → parquet table), and print rows/s and
MB/s — the number to hold against the reference's implicit capacity
model (BASELINE.md: ~50 files ≈ 2 MB compressed per worker task, fleets
of 275–1400 Lambda workers), which publishes no single-node throughput.

Usage: python tools/ingest_probe.py [n_files] [rows_per_file]
Writes to /tmp; drops the result table afterwards.
"""

from __future__ import annotations

import gzip
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logverzcore_spark.engine import get_session
from logverzcore_spark.ingest import CollectJob, collect

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from rawfixtures import VPCFLOW_ROWS, vpcflow_line  # noqa: E402


def synth_corpus(dirpath: str, n_files: int, rows_per_file: int) -> int:
    total = 0
    for f in range(n_files):
        lines = [
            vpcflow_line(i % 10, VPCFLOW_ROWS[i % len(VPCFLOW_ROWS)])
            for i in range(rows_per_file)
        ]
        p = os.path.join(dirpath, f"vpcflow_{f:05d}.log.gz")
        with gzip.open(p, "wt") as fh:
            fh.write("\n".join(lines) + "\n")
        total += os.path.getsize(p)
    return total


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    spark = get_session("ingest-probe")
    src = tempfile.mkdtemp(prefix="ingest_probe_")
    try:
        gz_bytes = synth_corpus(src, n_files, rows_per_file)
        raw_rows = n_files * rows_per_file
        job = CollectJob(
            path=src, datatype="VPCFlow", table_name="ingest_probe_t",
            query_string="SELECT * FROM S3Object WHERE action = 'ACCEPT'",
        )
        t0 = time.time()
        report = collect(spark, job)
        dt = time.time() - t0
        print(
            f"files={n_files} raw_rows={raw_rows} gz_mb={gz_bytes / 1e6:.1f} "
            f"ingested_rows={report.rows_written} wall={dt:.2f}s "
            f"rows_per_s={raw_rows / dt:,.0f} gz_mb_per_s={gz_bytes / 1e6 / dt:.1f}"
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS ingest_probe_t")


if __name__ == "__main__":
    main()
