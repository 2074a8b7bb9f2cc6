"""bench.py harness self-test — r3's bench died in warmup and recorded
ZERO numbers for the whole round; the harness mechanics (JSON shape,
per-query error isolation) are now pinned so that cannot silently
recur."""

from __future__ import annotations

import io
import json
from contextlib import redirect_stdout

import bench


def _run_main(monkeypatch, headline):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "HEADLINE", headline)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, "bench must print exactly ONE JSON line"
    return json.loads(lines[0])


def test_bench_emits_one_json_line(spark, monkeypatch):
    out = _run_main(monkeypatch, ["dedup_ids", "media_stats"])
    assert out["metric"] == "headline_queries_total"
    assert out["unit"] == "sec" and out["sf"] == 0.001
    assert set(out["queries"]) == {"dedup_ids", "media_stats"}
    assert all(len(out["runs"][q]) == 3 for q in out["queries"])
    assert out["value"] > 0 and out["errors"] == {}


def test_bench_isolates_a_broken_query(spark, monkeypatch):
    """One raising query must record an error and NOT kill the rest —
    the exact r3 failure mode."""
    import timesearch_spark.queries as tsq

    def boom(spark, sf_dir):
        raise RuntimeError("synthetic breakage")

    monkeypatch.setitem(tsq.QUERIES, "__boom", boom)
    out = _run_main(monkeypatch, ["__boom", "media_stats"])
    assert "__boom" in out["errors"]
    assert "synthetic breakage" in out["errors"]["__boom"]
    assert out["runs"]["__boom"] == "err"
    assert "media_stats" in out["queries"]  # the rest still benched


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
