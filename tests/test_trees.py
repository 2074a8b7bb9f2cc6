"""Golden tests for the comment-forest walk (offline_reading.py parity):
reachability, phantom parents, score-desc render order, preorder positions.
"""

from __future__ import annotations

from timesearch_spark.operators.trees import comment_forest, render_comment_html

COLS = "idstr string, parent string, submission string, created long, score long"


def _forest(spark, rows):
    return comment_forest(spark.createDataFrame(rows, COLS))


def test_walk_order_score_desc(spark):
    # root -> a(score 5), b(score 9); b renders first (offline_reading.py:211)
    rows = [
        ("t1_a", "t3_s", "s", 1, 5),
        ("t1_b", "t3_s", "s", 2, 9),
        ("t1_c", "t1_a", "s", 3, 1),
    ]
    out = sorted(_forest(spark, rows).collect(), key=lambda r: r["position"])
    assert [r["idstr"] for r in out] == ["t1_b", "t1_a", "t1_c"]
    assert [r["depth"] for r in out] == [0, 0, 1]
    assert [r["position"] for r in out] == [0, 1, 2]
    assert not any(r["phantom"] for r in out)


def test_phantom_parent_for_orphan(spark):
    # t1_x's parent t1_missing doesn't exist -> phantom node under root
    # with data=None semantics (offline_reading.py:360-366).
    rows = [
        ("t1_a", "t3_s", "s", 1, 1),
        ("t1_x", "t1_missing", "s", 2, 7),
    ]
    out = {r["idstr"]: r for r in _forest(spark, rows).collect()}
    assert set(out) == {"t1_a", "t1_x", "t1_missing"}
    assert out["t1_missing"]["phantom"] and out["t1_missing"]["depth"] == 0
    assert out["t1_x"]["parent"] == "t1_missing" and out["t1_x"]["depth"] == 1


def test_every_comment_reachable(spark):
    # SURVEY §5.3: every comment appears exactly once in its thread's walk.
    rows = [
        (f"t1_{i}", ("t3_s" if i % 3 == 0 else f"t1_{i - 1}"), "s", i, i % 7)
        for i in range(30)
    ]
    out = _forest(spark, rows).collect()
    assert sorted(r["idstr"] for r in out) == sorted(f"t1_{i}" for i in range(30))
    assert sorted(r["position"] for r in out) == list(range(30))


def test_multiple_threads_isolated(spark):
    rows = [
        ("t1_a", "t3_s1", "s1", 1, 1),
        ("t1_b", "t1_a", "s1", 2, 1),
        ("t1_c", "t3_s2", "s2", 1, 1),
    ]
    out = _forest(spark, rows).collect()
    by_sub = {}
    for r in out:
        by_sub.setdefault(r["submission"], []).append(r)
    assert len(by_sub["s1"]) == 2 and len(by_sub["s2"]) == 1
    # positions restart per thread
    assert sorted(r["position"] for r in by_sub["s1"]) == [0, 1]
    assert [r["position"] for r in by_sub["s2"]] == [0]


def test_render_html_escapes_with_reference_typo(spark):
    rows = [("t1_a", "t3_s", "s", 1, 1)]
    forest = _forest(spark, rows)
    import pyspark.sql.functions as F

    enriched = forest.withColumn("body", F.lit("a <b> c"))
    html = render_comment_html(enriched).first()["html"]
    # '&rt;' [sic] — the reference's own typo (offline_reading.py:285-290)
    assert "&lt;b&rt;" in html and 'id="t1_a"' in html


def test_null_scores_sort_as_zero_not_nan(spark):
    """Arrow hands nullable long scores over as float64 NaN; the walk
    must treat them as 0 (deterministic sibling order), never let NaN
    poison the sort key into shuffle-order output."""
    rows = [
        ("t1_a", "t3_s", "s", 1, None),   # null score -> 0
        ("t1_b", "t3_s", "s", 2, -5),     # below 0 -> after a
        ("t1_c", "t3_s", "s", 3, 7),      # above 0 -> first
    ]
    for _ in range(3):
        out = sorted(_forest(spark, rows).collect(), key=lambda r: r["position"])
        assert [r["idstr"] for r in out] == ["t1_c", "t1_a", "t1_b"]
