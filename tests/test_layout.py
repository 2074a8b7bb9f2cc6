"""Physical layout (operators/layout.py): clustered writes must make
row-group min/max stats selective (measured from parquet footers, not
timing), and compaction must shrink file counts without changing data."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from timesearch_spark.operators import layout
from timesearch_spark.tables import load


def test_cluster_write_makes_rowgroups_prunable(spark, tmp_path):
    ev = load(spark, SF_ORACLE, "events").select("event_id", "user_id", "ts")
    shuffled = str(tmp_path / "shuffled")
    clustered = str(tmp_path / "clustered")
    # worst case: hash-shuffle on an unrelated key → every file spans
    # the whole user domain
    ev.repartition(8, "event_id").write.parquet(shuffled)
    layout.cluster_write(ev, clustered, ["user_id"], num_files=8)

    q_bad = layout.clustering_quality(shuffled, "user_id")
    q_good = layout.clustering_quality(clustered, "user_id")
    assert q_bad > 0.9  # unclustered: point predicates read everything
    assert q_good < 0.3  # clustered: most row groups prune away
    # same data either way
    a = spark.read.parquet(clustered)
    assert a.count() == ev.count()
    assert a.select(F.sum("event_id")).first()[0] == \
        ev.select(F.sum("event_id")).first()[0]


def test_cluster_write_single_shuffle(spark):
    from timesearch_spark import plans

    ev = load(spark, SF_ORACLE, "events").select("event_id", "user_id")
    df = ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
    # the sort must ride the range exchange, not add one
    assert plans.executed_plan(df).count("Exchange") == 1


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    from timesearch_spark.operators.windows import with_event_time

    ev = with_event_time(load(spark, SF_ORACLE, "events")).select(
        "event_id", "user_id", "ts_sec"
    )
    linear = str(tmp_path / "linear")
    zorder = str(tmp_path / "zorder")
    layout.cluster_write(ev, linear, ["user_id", "ts_sec"], num_files=16)
    layout.zorder_write(ev, zorder, ["user_id", "ts_sec"], num_files=16)

    lin_user = layout.clustering_quality(linear, "user_id")
    lin_ts = layout.clustering_quality(linear, "ts_sec")
    z_user = layout.clustering_quality(zorder, "user_id")
    z_ts = layout.clustering_quality(zorder, "ts_sec")
    # linear sort: leading key prunes, trailing key doesn't
    assert lin_user < 0.3 and lin_ts > 0.8
    # z-order: BOTH dimensions prune (each file covers a 2-D square)
    assert z_user < 0.6 and z_ts < 0.6
    # same data
    z = spark.read.parquet(zorder)
    assert z.count() == ev.count()
    assert z.select(F.sum("event_id")).first()[0] == \
        ev.select(F.sum("event_id")).first()[0]
    with pytest.raises(ValueError, match="exactly 2"):
        layout.zorder_write(ev, str(tmp_path / "bad"), ["user_id"])


def test_compact_shrinks_files_preserves_data(spark, tmp_path):
    ev = load(spark, SF_ORACLE, "events").select("event_id", "user_id")
    p = str(tmp_path / "frag")
    ev.repartition(40).write.parquet(p)
    before = sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    assert before == 40
    total = ev.count()
    checksum = ev.select(F.sum("event_id")).first()[0]

    n = layout.compact(spark, p, target_mb=128, cluster_cols=["user_id"])
    assert n < before
    got = spark.read.parquet(p)
    assert got.count() == total
    assert got.select(F.sum("event_id")).first()[0] == checksum
    # compaction with cluster_cols also fixes the layout
    assert layout.clustering_quality(p, "user_id") <= 1.0 / n + 0.2


def test_compact_repairs_crash_residue_and_rejects_partitioned(
    spark, tmp_path
):
    ev = load(spark, SF_ORACLE, "events").select("event_id", "user_id")
    p = str(tmp_path / "t")
    ev.repartition(4).write.parquet(p)
    total = ev.count()

    # crash between the two renames: live path gone, old snapshot left
    os.rename(p, p + ".__compact_old__")
    layout.compact(spark, p, target_mb=128)
    assert spark.read.parquet(p).count() == total

    # crash after the swap: stale old dir next to a live table
    os.makedirs(p + ".__compact_old__")
    layout.compact(spark, p, target_mb=128)
    assert not os.path.exists(p + ".__compact_old__")
    assert spark.read.parquet(p).count() == total

    # hive-partitioned input is refused, not silently flattened
    pp = str(tmp_path / "part")
    ev.withColumn("b", F.col("user_id") % 2).write.partitionBy("b").parquet(pp)
    with pytest.raises(ValueError, match="partitioned"):
        layout.compact(spark, pp)


def test_bucket_write_joins_without_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key by bucket_write join with
    ZERO Exchange in the physical plan (the write-side shuffle is
    amortized across every downstream join), and the results match the
    plain join exactly."""
    from timesearch_spark import plans

    orders = spark.createDataFrame(
        [(i, f"c{i % 7}") for i in range(200)], "o_key long, cust string"
    )
    items = spark.createDataFrame(
        [(i % 150, i, float(i)) for i in range(600)],
        "o_key long, item long, amt double",
    )
    layout.bucket_write(orders, "t_orders_b", ["o_key"], 8,
                        sort_cols=["o_key"], path=str(tmp_path / "o"))
    layout.bucket_write(items, "t_items_b", ["o_key"], 8,
                        sort_cols=["o_key"], path=str(tmp_path / "i"))
    try:
        bo, bi = spark.table("t_orders_b"), spark.table("t_items_b")
        joined = bo.join(bi, "o_key").select("o_key", "cust", "item", "amt")
        # the whole point: co-located scan, no Exchange anywhere
        assert plans.num_shuffles(joined) == 0
        expected = sorted(
            map(tuple, orders.join(items, "o_key")
                .select("o_key", "cust", "item", "amt").collect())
        )
        assert sorted(map(tuple, joined.collect())) == expected
        # aggregation on the bucket key skips its shuffle too
        agg = bi.groupBy("o_key").count()
        assert plans.num_shuffles(agg) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_items_b")
