"""Dataset maintenance utilities for long-lived table layouts.

At 100 TB the operational killers are rarely the queries — they're layout
drift: thousands of tiny files from incremental appends (every scan pays
per-file open/listing cost, every executor core starves on 2 MB splits)
and unsorted data (no row-group skipping). These helpers rewrite layouts;
they are driver-orchestrated but all data movement is executor-side.

No reference parity: the reference (single-process pandas) has no file
layout to maintain — this is part of the scale extension.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def dataset_stats(spark: SparkSession, path: str) -> dict:
    """File-layout stats via the Hadoop FileSystem API (works for any
    scheme Spark supports — local, HDFS, s3a…): total bytes, data-file
    count, mean file size. Metadata-only; reads no data."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    files = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not status.isFile() or name.startswith(("_", ".")):
            continue
        files.append(status.getLen())
    total = sum(files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "mean_file_bytes": total // len(files) if files else 0,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet dataset into ~``target_file_mb`` files.

    Sizing comes from the file listing (metadata-only), the rewrite is one
    distributed job: ``repartition(n)`` (or range-repartition when
    ``sort_by`` is given, which also restores row-group skipping on those
    columns). Writes to ``out_path`` — swapping it over the source is the
    caller's (atomicity-owning) move. Returns before/after stats."""
    before = dataset_stats(spark, path)
    n = max(1, math.ceil(before["total_bytes"] / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_path)
    after = dataset_stats(spark, out_path)
    return {"before": before, "after": after, "target_files": n}
