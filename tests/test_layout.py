"""Physical layout (operators/layout.py): clustered writes must make
row-group min/max stats selective (measured from parquet footers, not
timing), and compaction must shrink file counts without changing data."""

from __future__ import annotations

import os

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
