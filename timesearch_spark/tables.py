"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

``load`` reads one table; ``load_all`` returns a dict.  Reads are plain
``spark.read.parquet`` so Catalyst gets full pushdown/pruning; nothing is
cached here (callers decide) and nothing is collected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's events.parquet stores TIMESTAMP(NANOS) which Spark 4
    # refuses by default; read nanos as a raw long (session-settable, safe
    # for every other table).  Filters on the raw nano column still push
    # down to the parquet scan as plain INT64 comparisons.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure at least ``min_parts`` (default: cores) partitions before
    expensive per-row compute.

    Parquet parallelism is bounded by row groups: the driver's test files
    are single-row-group, so every scan reads as ONE task no matter how
    many cores the session has — a 64×-expression map stage then runs
    serially.  At production scale the inputs are many multi-row-group
    files and the scan already yields >= cores partitions, making this a
    NO-OP (no Exchange in the plan); it only round-robins when the scan
    genuinely under-splits, which is exactly when the shuffle is cheaper
    than the serial compute it unblocks.
    """
    want = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


NANOS_PER_SEC = 1_000_000_000


def event_ts_sec(col="ts"):
    """events.ts (nanos-as-long) → epoch seconds (long, true floor).

    Exact integer math — nano epochs (~1.7e18) exceed double's 2^53
    mantissa, so float division would corrupt the low digits.  Decimal
    division alone isn't enough either: its scale-6 result rounds HALF_UP
    before the long cast, so a nano within 5e-7 s below a second boundary
    would round UP, diverging from the oracle's FLOOR(EPOCH(ts)).  We
    subtract the pmod remainder first so the division is exact.
    """
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    cd = c.cast("decimal(38,0)")
    whole = cd - F.pmod(cd, F.lit(NANOS_PER_SEC).cast("decimal(38,0)"))
    return (whole / NANOS_PER_SEC).cast("long")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for n in TABLE_NAMES:
        load(spark, sf_dir, n).createOrReplaceTempView(n)
