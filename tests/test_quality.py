"""Data-quality profiling tests (operators/quality)."""

from __future__ import annotations

from timesearch_spark.operators.quality import drift_report, table_profile


def _profile_map(df):
    return {r["column"]: r for r in table_profile(df).collect()}


def test_table_profile_one_pass_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, None, 2.5), (3, "b", None)],
        "k long, s string, v double",
    )
    p = _profile_map(df)
    assert set(p) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in p.values())
    assert p["k"]["n_null"] == 0 and p["s"]["n_null"] == 1 and p["v"]["n_null"] == 2
    assert p["k"]["min_value"] == "1" and p["k"]["max_value"] == "3"
    assert p["s"]["min_value"] == "a" and p["s"]["max_value"] == "b"
    # HLL approx: tiny cardinalities are exact
    assert p["k"]["approx_distinct"] == 3
    assert p["v"]["approx_distinct"] == 2


def test_table_profile_unordered_types(spark):
    df = spark.createDataFrame([([1, 2],), ([3],)], "a array<bigint>")
    p = _profile_map(df)
    assert p["a"]["min_value"] is None and p["a"]["max_value"] is None
    assert p["a"]["approx_distinct"] == 2


def test_drift_report_flags_each_issue(spark):
    base = spark.createDataFrame(
        [(i, f"u{i % 50}", float(i)) for i in range(100)],
        "k long, user string, v double",
    )
    # current: 'v' retyped, 'user' cardinality collapsed, 'k' null flood,
    # 'extra' added
    cur = spark.createDataFrame(
        [(i if i % 2 else None, "u0", str(i), True) for i in range(100)],
        "k long, user string, v string, extra boolean",
    )
    issues = {(r["column"], r["issue"]) for r in
              drift_report(table_profile(cur), table_profile(base)).collect()}
    assert ("extra", "added_column") in issues
    assert ("v", "retyped_column") in issues
    assert ("k", "null_flood") in issues
    assert ("user", "cardinality_drift") in issues


def test_drift_report_empty_on_identical_profiles(spark):
    df = spark.createDataFrame([(1, "x")], "k long, s string")
    p = table_profile(df)
    assert drift_report(p, p).count() == 0
