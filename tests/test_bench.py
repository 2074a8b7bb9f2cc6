"""bench.py harness self-test — r3's bench died in warmup and recorded
ZERO numbers for the whole round; the harness mechanics (JSON shape,
per-query error isolation) are now pinned so that cannot silently
recur."""

from __future__ import annotations

import io
import json
from contextlib import redirect_stdout

import bench


def _run_main(monkeypatch, headline, gate="1e9"):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # mechanics tests must not depend on what other tenants are doing to
    # this shared host: disable the quiet-host gate unless a test
    # explicitly exercises it (gate tests pass their own threshold)
    monkeypatch.setenv("SPARK_GRAFT_LOAD_GATE", gate)
    monkeypatch.setenv("SPARK_GRAFT_LOAD_COOLOFF", "0")
    monkeypatch.setattr(bench, "HEADLINE", headline)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    # detail line(s) first, compact summary LAST — the driver tails stdout
    assert len(lines) == 2, "bench must print detail then ONE summary line"
    detail = json.loads(lines[0])["detail"]
    summary = json.loads(lines[-1])
    return summary, detail


def test_bench_emits_summary_last(spark, monkeypatch):
    out, detail = _run_main(monkeypatch, ["dedup_ids", "media_stats"])
    assert out["metric"] == "headline_queries_total"
    assert out["unit"] == "sec" and out["sf"] == 0.001
    assert set(out["queries"]) == {"dedup_ids", "media_stats"}
    assert all(len(detail["runs"][q]) == 3 for q in out["queries"])
    assert all(len(detail["load"][q]) == 3 for q in out["queries"])
    assert out["value"] > 0 and out["errors"] == {}


def test_bench_isolates_a_broken_query(spark, monkeypatch):
    """One raising query must record an error and NOT kill the rest —
    the exact r3 failure mode."""
    import timesearch_spark.queries as tsq

    def boom(spark, sf_dir):
        raise RuntimeError("synthetic breakage")

    monkeypatch.setitem(tsq.QUERIES, "__boom", boom)
    out, detail = _run_main(monkeypatch, ["__boom", "media_stats"])
    assert "__boom" in out["errors"]
    assert "synthetic breakage" in out["errors"]["__boom"]
    assert detail["runs"]["__boom"] == "err"
    assert "media_stats" in out["queries"]  # the rest still benched


def test_bench_quiet_gate_flags_never_quiet_queries(spark, monkeypatch):
    """A query whose best-of-3 triple never STARTS under the loadavg gate
    must be retried (quietest attempt kept) and surface in both the
    summary's "noisy" list and the detail sidecar — the r10 official run
    sampled at loadavg 3.5-9.2 and was unreadable as a regression signal
    without this."""
    # gate of 0 on a live host: every attempt starts "loud", so the run
    # must exhaust retries, keep the quietest, and flag the query
    monkeypatch.setenv("SPARK_GRAFT_LOAD_RETRIES", "2")
    out, detail = _run_main(monkeypatch, ["dedup_ids"], gate="0")
    assert out["noisy"] == ["dedup_ids"]
    assert detail["noisy"] == ["dedup_ids"]
    assert detail["gate"]["load_gate"] == 0.0
    assert detail["start_load"]["dedup_ids"] > 0
    # quietest attempt kept: still exactly one best-of-3 triple recorded
    assert len(detail["runs"]["dedup_ids"]) == 3


def test_bench_quiet_gate_silent_on_quiet_host(spark, monkeypatch):
    """Under an open gate the summary must NOT carry a noisy field (the
    driver-parsed line stays minimal) and no retries happen."""
    out, detail = _run_main(monkeypatch, ["dedup_ids"])  # gate=1e9
    assert "noisy" not in out
    assert detail["noisy"] == []
    assert detail["gate"]["slept"] == 0


def test_summary_noisy_list_degrades_to_count_before_overflow():
    """The noisy flag list must shrink to a count before the summary ever
    exceeds the driver's capture window."""
    times = {f"extremely_long_query_name_variant_{i:04d}": 1.0 for i in range(200)}
    line = bench.compact_summary(times, 0.1, {}, noisy=sorted(times))
    assert len(line) <= 1900
    out = json.loads(line)
    assert out["noisy"] == 200  # names degraded to a count

    # small noisy list on a normal run: names survive verbatim
    line = bench.compact_summary({"q1": 1.0}, 0.1, {}, noisy=["q1"])
    assert json.loads(line)["noisy"] == ["q1"]


def test_summary_line_fits_driver_tail_window():
    """r9's official bench record was LOST because the one JSON line grew
    to 3.6 KB and the driver keeps only the last 2,000 chars of stdout.
    Pin: at the full 32-query headline set with realistic names/values,
    the final summary line stays comfortably inside the window."""
    times = {name: 12.345 for name in bench.HEADLINE}
    line = bench.compact_summary(times, 0.1, {})
    assert len(line) < 1500, f"summary line {len(line)} chars — too fat"
    out = json.loads(line)
    assert out["queries"] == times and "runs" not in out


def test_summary_line_truncates_rather_than_overflow():
    """Even a pathological registry (hundreds of queries, long names)
    must never push the summary past the 2,000-char capture: the guard
    drops the cheapest queries first and flags the truncation."""
    times = {f"extremely_long_query_name_variant_{i:04d}": 1.0 for i in range(200)}
    line = bench.compact_summary(times, 0.1, {})
    assert len(line) <= 1900
    out = json.loads(line)
    assert out.get("queries_truncated") is True
    assert out["value"] == round(sum(times.values()), 3)  # total still exact

    # a mass-error run (every query raising a long message) must also fit:
    # error bodies degrade to a bounded name list before ever overflowing
    errors = {f"q_{i:03d}": "SparkException: " + "x" * 300 for i in range(40)}
    line = bench.compact_summary({}, 0.1, errors)
    assert len(line) <= 1900 and json.loads(line)


def test_headline_names_all_registered():
    """Every HEADLINE entry must exist in the registry — a renamed query
    would otherwise be skipped silently ('skipped if not yet
    registered' is for forward declarations, not typos) and vanish from
    the driver's recorded bench without any error."""
    import timesearch_spark.queries as tsq

    missing = [q for q in bench.HEADLINE if q not in tsq.QUERIES]
    assert missing == []


def test_check_oracle_canon_normalization():
    """The local t2 stand-in's normalization must match the driver's
    contract: floats rounded to 6, NaN spelled out, None sentinel, bytes
    hexed, nested lists flattened, columns compared by sorted name."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    assert mod.norm_cell(None) == "\0"
    assert mod.norm_cell(1.23456789) == "1.234568"
    assert mod.norm_cell(float("nan")) == "nan"
    assert mod.norm_cell(b"\x01\xff") == "01ff"
    assert mod.norm_cell([1.0, None]) == "[1.0,\0]"
    # column order must not matter: (a, b) rows vs (b, a) rows hash equal
    left = mod.canon([(1, "x"), (2, "y")], ["a", "b"])
    right = mod.canon([("x", 1), ("y", 2)], ["b", "a"])
    assert left == right
