"""Smoke: every registered t2 query runs at sf0.001 and returns a stable
schema; entry() matches the driver contract."""

from __future__ import annotations

import __spark_entry__ as entrymod

from tests.conftest import SF_SMALL


def test_registry_complete():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(osql) <= set(qs)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"custkey", "submissions", "comments", "total_posts"}


def test_all_queries_run(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name
        df.limit(5).collect()


def test_oracled_registry_exactly_fills_driver_window():
    """HEADROOM POLICY (queries.py, next to the import-time assert): the
    driver grades the FIRST 50 registered queries; the oracled set must
    fill that window exactly — no oracled query outside it (it would
    silently vanish from grading) and no rows-only query inside it (it
    would burn a graded slot on a weaker rows-only check).  Adding a
    51st oracled query must fail HERE, forcing an explicit consolidate-
    or-demote decision, not a silent eviction.  Checked at the driver
    surface (__spark_entry__), the registry the grader actually sees."""
    names = list(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    assert len(oracled) == 50, (
        f"{len(oracled)} oracled queries vs the 50-row window — "
        "consolidate or demote (see HEADROOM POLICY in queries.py)"
    )
    assert set(names[:50]) == oracled, {
        "oracled_outside_window": sorted(oracled - set(names[:50])),
        "rows_only_inside_window": sorted(set(names[:50]) - oracled),
    }


def test_registry_invariants():
    """Driver-contract guards: every oracle has a query, every oracled
    query sits inside the driver's 50-row CORRECTNESS window (oracled
    entries are re-ordered first at import), and the rows-only tail is
    exactly the engine-private set."""
    import timesearch_spark.queries as tsq

    qs, oracle = tsq.QUERIES, tsq.ORACLE
    assert set(oracle) <= set(qs)
    idx = {k: i for i, k in enumerate(qs)}
    assert all(idx[k] <= 49 for k in oracle), [k for k in oracle if idx[k] > 49]
    assert len(oracle) == 50  # the window is exactly full
    # every registered callable is a (spark, sf_dir) function
    assert all(callable(v) for v in qs.values())


def test_oracle_slot_source_registry():
    """HEADROOM POLICY, r14 enforcement (VERDICT r13 #4): the window has
    saturated twice; each fix was ad-hoc.  Now every oracled query is
    either in the frozen pre-r13 charter or carries an explicit
    slot-source entry naming the consolidation/demotion that freed its
    slot — adding an oracled query without recording the decision fails
    HERE (and at import, queries.py's paired assert)."""
    import timesearch_spark.queries as tsq

    assert set(tsq.ORACLE) == \
        (tsq.ORACLE_CHARTER - set(tsq.ORACLE_DEMOTED)) \
        | set(tsq.ORACLE_SLOT_SOURCES)
    assert tsq.ORACLE_CHARTER.isdisjoint(tsq.ORACLE_SLOT_SOURCES)
    assert set(tsq.ORACLE_DEMOTED) <= tsq.ORACLE_CHARTER
    # every slot-source / demotion note is a real explanation
    for name, src in {**tsq.ORACLE_SLOT_SOURCES,
                      **tsq.ORACLE_DEMOTED}.items():
        assert isinstance(src, str) and len(src) > 20, (name, src)
        assert ("consolidation" in src or "demotion" in src
                or "promotion" in src or "rollup" in src), (name, src)


def test_tree_stats_is_rollup_of_oracled_tree_depth(spark):
    """r14 demotion pin: tree_stats' rows are exactly the per-thread
    rollup (count, max depth, phantom count) of the oracled tree_depth
    relation — which since r14 hash-checks the phantom column too, so
    the demoted query's entire input is still externally graded."""
    from pyspark.sql import functions as F

    qs = entrymod.queries()
    depth = qs["tree_depth"](spark, SF_SMALL)
    assert set(depth.columns) == {"submission", "idstr", "depth", "phantom"}
    rolled = {
        tuple(r) for r in depth.groupBy("submission").agg(
            F.count("*").alias("n_nodes"),
            F.max("depth").alias("max_depth"),
            F.sum(F.col("phantom").cast("long")).alias("n_phantom"),
        ).collect()
    }
    stats = {tuple(r) for r in qs["tree_stats"](spark, SF_SMALL).collect()}
    assert stats == rolled and stats


def test_r14_consolidations_partition_exactly(spark):
    """r14 slot recovery: the merged oracled queries are EXACTLY their
    demoted parents relabeled — similarity_brute rows partition into
    similarity_topk ('topk' mode) and similarity_neardup_brute
    ('neardup'), media_decode into media_features ('image') and
    media_frames ('video') — so the one oracle hash-grades both parents
    and the freed slots grade text_lm_ppl_bigram and pipeline_dsir."""
    import timesearch_spark.queries as tsq

    for parent in ("similarity_topk", "similarity_neardup_brute",
                   "media_features", "media_frames"):
        assert parent not in tsq.ORACLE
    for merged in ("similarity_brute", "media_decode"):
        assert merged in tsq.ORACLE

    qs = entrymod.queries()
    sb = qs["similarity_brute"](spark, SF_SMALL).collect()
    topk = {("topk", r["qid"], r["vec_id"], r["cos"], r["rn"])
            for r in qs["similarity_topk"](spark, SF_SMALL).collect()}
    nd = {("neardup", r["a"], r["b"], r["cos"], None)
          for r in qs["similarity_neardup_brute"](
              spark, SF_SMALL).collect()}
    assert {tuple(r) for r in sb} == topk | nd
    assert topk and nd  # both arms exercised

    md = qs["media_decode"](spark, SF_SMALL).collect()
    feats = {(r["media_id"], r["kind"], None, None, r["feature_csv"],
              r["feat_dim"])
             for r in qs["media_features"](spark, SF_SMALL).collect()}
    frames = {(r["media_id"], "video", r["frame_index"], r["ts_ms"],
               r["frame_hex"], None)
              for r in qs["media_frames"](spark, SF_SMALL).collect()}
    assert {tuple(r) for r in md} == feats | frames
    assert feats and frames


def test_r15_scalar_consolidations_graded_through_merged(spark):
    """r15 slot recovery (VERDICT #2/#3): scalar_datefmt's formatting
    columns are hash-graded through filter_timerange (same events
    grain, same Column expressions) and scalar_newline's string ops
    through scalar_escape (same tsf functions on documents.text) — the
    two freed slots grade text_html_extract and text_clf_score.  The
    pins are value-level: the merged queries' new columns must equal an
    independent application of the same tsf functions, and the demoted
    parents must agree with the merged queries on every shared row."""
    from pyspark.sql import functions as F

    import timesearch_spark.queries as tsq
    from timesearch_spark import functions as tsf
    from timesearch_spark.tables import load

    for demoted in ("scalar_newline", "scalar_datefmt"):
        assert demoted not in tsq.ORACLE
        assert demoted in tsq.ORACLE_DEMOTED
    for promoted in ("text_html_extract", "text_clf_score"):
        assert promoted in tsq.ORACLE
        assert promoted in tsq.ORACLE_SLOT_SOURCES

    qs = entrymod.queries()
    # datefmt: on the rows filter_timerange grades, the demoted query's
    # formatted columns must match cell-for-cell
    cols = ["event_id", "ts_sec", "listing_ts", "human_ts"]
    ft_rows = {tuple(r) for r in
               qs["filter_timerange"](spark, SF_SMALL).select(*cols).collect()}
    sd_rows = {tuple(r) for r in
               qs["scalar_datefmt"](spark, SF_SMALL).select(*cols).collect()}
    assert ft_rows and ft_rows <= sd_rows

    # newline family: scalar_escape's merged columns == the same tsf
    # functions applied independently to documents.text; the demoted
    # scalar_newline == the same functions on part.p_name
    def newline_cols(df, col):
        return df.select(
            tsf.flatten_newlines(col),
            tsf.sanitize_braces(
                F.concat(F.lit("{"), F.col(col), F.lit("}"))),
            F.array_join(tsf.split_any(col), "\x01"),
        )

    se = qs["scalar_escape"](spark, SF_SMALL) \
        .select("flat_text", "braced", "parts").collect()
    ref = newline_cols(load(spark, SF_SMALL, "documents"), "text").collect()
    assert sorted(map(tuple, se)) == sorted(map(tuple, ref)) and se
    sn = qs["scalar_newline"](spark, SF_SMALL) \
        .select("flat_name", "braced", "parts").collect()
    refp = newline_cols(load(spark, SF_SMALL, "part"), "p_name").collect()
    assert sorted(map(tuple, sn)) == sorted(map(tuple, refp)) and sn


def test_enrich_join_alias_demotion_is_sound():
    """r13 slot recovery: enrich_join is rows-only BY DESIGN because it
    is the SAME function object as the oracled window_latest_version —
    its exactness pin is this identity (the driver already hash-checks
    the shared plan through window_latest_version's green row), and the
    slot it used to burn now grades text_lm_ppl under a DuckDB oracle."""
    import timesearch_spark.queries as tsq

    assert tsq.QUERIES["enrich_join"] is tsq.QUERIES["window_latest_version"]
    assert "enrich_join" not in tsq.ORACLE
    assert "window_latest_version" in tsq.ORACLE
    assert "text_lm_ppl" in tsq.ORACLE
