"""HLL distinct-count sketches (operators/sketches.py): estimate
accuracy vs exact COUNT(DISTINCT), union/cumulative algebra, and the
SketchStore incremental-refresh contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from timesearch_spark.operators import sketches as sk
from timesearch_spark.operators.windows import with_event_time
from timesearch_spark.tables import load


@pytest.fixture(scope="module")
def events(spark):
    return load(spark, SF_ORACLE, "events")


@pytest.fixture(scope="module")
def daily(spark, events):
    return sk.distinct_sketches(events).cache()


def _exact_daily(events):
    return (
        with_event_time(events)
        .withColumn("period", (F.col("ts_sec") / 86400).cast("long") * 86400)
        .groupBy("period", "event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
    )


def test_per_key_estimates_within_tolerance(events, daily):
    est = sk.rollup_estimates(daily).filter(F.col("event_type") != "__all__")
    j = est.join(_exact_daily(events), ["period", "event_type"]).toPandas()
    assert len(j) > 0
    rel = ((j.n_unique - j.exact).abs() / j.exact).max()
    assert rel <= 0.02  # lg_k=12 → ~1.6% theoretical; exact at this card.


def test_overall_row_is_a_true_union(events, daily):
    est = sk.rollup_estimates(daily).toPandas()
    exact_all = (
        with_event_time(events)
        .withColumn("period", (F.col("ts_sec") / 86400).cast("long") * 86400)
        .groupBy("period")
        .agg(F.count_distinct("user_id").alias("exact"))
        .toPandas()
        .set_index("period")["exact"]
    )
    for period, grp in est.groupby("period"):
        overall = grp[grp.event_type == "__all__"].n_unique.iloc[0]
        per_key = grp[grp.event_type != "__all__"].n_unique
        # union algebra: bounded by max key and sum of keys
        assert per_key.max() <= overall <= per_key.sum()
        assert abs(overall - exact_all[period]) / exact_all[period] <= 0.02


def test_one_pass_rollup_equals_two_step_composition(spark, events, daily):
    one = sk.distinct_rollup(events)
    two = sk.rollup_estimates(daily)
    assert one.exceptAll(two).count() == 0
    assert two.exceptAll(one).count() == 0
    # and it really is one aggregate pass: a single scan of events
    from timesearch_spark import plans

    plan = plans.executed_plan(sk.distinct_rollup(events, lg_k=11))
    assert plan.count("FileScan") == 1
    assert "Expand" in plan  # grouping-sets expansion, not a self-union


def test_cumulative_monotone_and_converges(events, daily):
    cum = sk.cumulative_estimates(daily).toPandas()
    for _, grp in cum.groupby("event_type"):
        vals = grp.sort_values("period").n_unique_cum.tolist()
        assert vals == sorted(vals)  # prefix unions never shrink
    final = (
        cum.sort_values("period").groupby("event_type").n_unique_cum.last()
    )
    exact = (
        events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("e"))
        .toPandas()
        .set_index("event_type")["e"]
    )
    for k, v in final.items():
        assert abs(v - exact[k]) / exact[k] <= 0.02


def test_sketch_store_incremental_refresh(spark, events, tmp_path):
    store = sk.SketchStore(spark, str(tmp_path / "sk"))
    evt = with_event_time(events)
    cut = 1704067200 + 15 * 86400
    n1 = store.refresh(evt.filter(F.col("ts_sec") < cut).drop("ts_sec", "event_time"))
    assert n1 == 15
    # second refresh sees the full stream: only periods from the stored
    # horizon forward are (re)written; old partitions are immutable
    old_dirs = {
        d: os.path.getmtime(os.path.join(store.path, d))
        for d in os.listdir(store.path)
        if d.startswith("p=")
    }
    n2 = store.refresh(events)
    assert n2 == 16  # horizon period + the 15 new days
    untouched = [
        d
        for d, mt in old_dirs.items()
        if int(d[2:]) < max(int(x[2:]) for x in old_dirs)
        and os.path.getmtime(os.path.join(store.path, d)) == mt
    ]
    assert len(untouched) == len(old_dirs) - 1

    # estimates from the store match exact over the full range
    got = store.estimate().toPandas().set_index("event_type")["n_unique"]
    exact = (
        events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("e"))
        .toPandas()
        .set_index("event_type")["e"]
    )
    for k, v in exact.items():
        assert abs(got[k] - v) / v <= 0.02

    # range pruning: [since, until) restricts to stored periods
    sub = store.estimate(since=cut, until=cut + 86400).toPandas()
    ex_sub = (
        evt.filter(
            (F.col("ts_sec") >= cut) & (F.col("ts_sec") < cut + 86400)
        )
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("e"))
        .toPandas()
    )
    j = sub.merge(ex_sub, on="event_type")
    assert ((j.n_unique - j.e).abs() / j.e).max() <= 0.02


def test_empty_store_reads_empty(spark, tmp_path):
    store = sk.SketchStore(spark, str(tmp_path / "none"))
    assert store.read().count() == 0
    assert store.estimate().count() == 0


def test_sketch_agg_partially_aggregates(spark, events):
    # the raw-event stage must map-side combine: the shuffle carries
    # bounded sketches, not ids
    from timesearch_spark import plans

    # lg_k differs from the cached `daily` fixture so the cache manager
    # can't swap in InMemoryTableScan and hide the aggregate shape
    df = sk.distinct_sketches(events, lg_k=11)
    # sketch aggs run as ObjectHashAggregate, not HashAggregate, so look
    # for the partial mode on the function itself
    plan = plans.executed_plan(df)
    assert "partial_hll_sketch_agg" in plan
    assert plan.count("Exchange") == 1
