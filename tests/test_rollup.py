"""Materialized continuous aggregate (operators/rollup)."""

from __future__ import annotations

from timesearch_spark.operators.rollup import MaterializedRollup

H = 3600


def _events(spark, rows):
    return spark.createDataFrame(
        [(f"e{i}", ts * 10**9, "u", t, v) for i, (ts, t, v) in enumerate(rows)],
        "event_id string, ts long, user_id string, event_type string, value double",
    )


def _snap(roll):
    return {
        (r["w"], r["event_type"]): (r["n"], r["value_sum_micros"])
        for r in roll.read().collect()
    }


def test_incremental_refresh_matches_full_recompute(spark, tmp_path):
    rows1 = [(10, "click", 1.0), (20, "view", 2.0),
             (H + 30, "click", 3.0)]
    all_rows = rows1 + [
        (2 * H + 5, "click", 4.0),      # new window
        (H + 40, "view", 5.0),          # late event, inside lateness
    ]
    inc = MaterializedRollup(spark, str(tmp_path / "inc"))
    out1 = inc.refresh(_events(spark, rows1))
    assert out1 == {"from_window": None, "windows": 2}
    assert _snap(inc)[(0, "click")] == (1, 1_000_000)

    out2 = inc.refresh(_events(spark, all_rows))
    # refresh starts one window below the max materialized (lateness=1)
    assert out2["from_window"] == 0 and out2["windows"] == 3

    full = MaterializedRollup(spark, str(tmp_path / "full"))
    full.refresh(_events(spark, all_rows))
    assert _snap(inc) == _snap(full)
    # the late view landed
    assert _snap(inc)[(H, "view")] == (1, 5_000_000)


def test_refresh_prunes_scan_below_lateness_horizon(spark, tmp_path):
    """Window 0 is outside the horizon on the second refresh: even if the
    second input LACKS window-0 events entirely, the materialized window
    0 must survive untouched (proof the old windows aren't recomputed)."""
    roll = MaterializedRollup(spark, str(tmp_path / "r"))
    roll.refresh(_events(spark, [(10, "click", 1.0), (2 * H + 10, "view", 1.0)]))
    assert (0, "click") in _snap(roll)
    # second refresh input only has recent events; horizon = 2H - 1H = H
    roll.refresh(_events(spark, [(2 * H + 20, "view", 2.0)]))
    snap = _snap(roll)
    assert snap[(0, "click")] == (1, 1_000_000)   # untouched
    assert snap[(2 * H, "view")] == (1, 2_000_000)  # recomputed window
