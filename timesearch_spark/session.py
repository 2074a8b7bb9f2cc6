"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); production
target is a 1000-executor cluster over ~100 TB.  Every default here is
chosen to survive that scale-up:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting —
  author/thread activity in the reference's domain is heavily Zipf-skewed).
- Arrow on (all Python UDF paths are pandas_udf / applyInPandas, never
  row-at-a-time).
- UTC session timezone (parity with the reference's unix-seconds model,
  tsdb.py:54, and with the DuckDB oracle).
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "timesearch_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    If a session already exists (e.g. the driver passed one in), its
    config wins — Spark ignores builder config on getOrCreate of a live
    session, which is the behavior we want for the driver harness.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cpus)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_for_scale(spark: SparkSession, target_bytes: int) -> None:
    """Adjust partition sizing for a known input volume.

    At 100 TB with 128 MiB target partitions we want ~800k input splits and
    shuffle partitions sized so post-shuffle partitions stay under executor
    memory; AQE coalesces down from there at runtime.
    """
    per_part = 128 * 1024 * 1024
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(per_part))
    want = max(32, min(200_000, target_bytes // per_part))
    spark.conf.set("spark.sql.shuffle.partitions", str(want))
