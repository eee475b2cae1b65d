"""Metadata-driven partition sizing: estimate a frame's input volume from
its files' on-disk sizes (one filesystem metadata call per file, ANY
Hadoop-supported scheme) instead of scanning the data or forcing a
plan-to-RDD conversion. At 100 TB a sizing scan of a blob column IS the
dominant cost; file status calls are free by comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the frame's input files, from filesystem
    metadata only. None when the frame has no file inputs (pure in-memory
    or derived-with-unknown-lineage plans)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    return total


def estimated_scan_partitions(df: DataFrame) -> int | None:
    """How many partitions Spark's file scan will produce, estimated from
    file count and total bytes vs spark.sql.files.maxPartitionBytes.
    None when the frame has no file inputs."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession
    max_bytes = spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    )
    total = input_bytes(df) or 0
    return max(len(files), -(-total // max(1, max_bytes)))


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to the cluster before CPU-heavy evaluation.
    A small parquet file arrives as ONE partition and a no-shuffle map
    stage then runs on a single core regardless of cluster size. No-op
    when the scan is already wide enough (estimated from file METADATA —
    ``df.rdd.getNumPartitions()`` forced a plan-to-RDD conversion per
    call; the RDD probe remains only as the fallback for file-less
    frames), so wide 100 TB inputs are never collapsed."""
    target = df.sparkSession.sparkContext.defaultParallelism
    est = estimated_scan_partitions(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est >= target:
        return df
    return df.repartition(target)
