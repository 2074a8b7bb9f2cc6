"""Unit tests for the text-analysis column helpers (operators/textstats).

The table form (text_profile_table) is covered by the oracle compare and
the plan tests; these pin the column-level helpers' values.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from timesearch_spark.operators import textstats as tx
from timesearch_spark.operators.dedup import tokens


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")
    ).first()["v"]


def test_token_counts(spark):
    assert _one(spark, "a b  c", tx.token_count_ws("text")) == 3
    assert _one(spark, "", tx.token_count_ws("text")) == 0
    # BPE-ish: letter runs, digit runs, single symbols
    assert _one(spark, "ab12 cd!", tx.token_count_bpe("text")) == 4


def test_lang_id_and_quality(spark):
    en = "the cat sat on the mat and it is a cat for now"
    fr = "le chat et la table de les chats en un salon du jour que"
    assert _one(spark, en, tx.lang_id("text")) == "en"
    assert _one(spark, fr, tx.lang_id("text")) == "fr"
    assert _one(spark, "zzz qqq xxx", tx.lang_id("text")) == "und"
    q = _one(spark, en, tx.quality_score("text"))
    assert 0.0 <= q <= 1.0


def test_fingerprint_rolling_matches_naive_form(spark):
    """The single-traversal aggregate must equal the naive min over
    explicit window slices (the O(n²)-splits form it replaced)."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"tok{i % 11}" for i in range(40))),
            (2, "alpha bravo charlie delta echo foxtrot golf hotel india"),
            (3, "short doc"),                       # below the window
            (4, "exactly eight tokens one two three four five"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    w = 8
    t = tokens("text")
    n = F.size(t)
    naive = F.array_min(
        F.when(
            n >= w,
            F.transform(
                F.sequence(F.lit(1), n - (w - 1)),
                lambda i: F.xxhash64(F.array_join(F.slice(t, i, w), " ")),
            ),
        ).otherwise(F.array(F.xxhash64(F.array_join(t, " "))))
    )
    rows = docs.select(
        "doc_id",
        tx.fingerprint_rolling("text", w).alias("fast"),
        naive.alias("naive"),
    ).collect()
    for r in rows:
        assert r["fast"] == r["naive"], r["doc_id"]


def test_fingerprint_rolling_locality(spark):
    # appending tokens AFTER the minimal gram keeps the fingerprint when
    # the new windows don't beat the minimum — equal fingerprints mark
    # shared content; a fully different doc fingerprints differently
    base = " ".join(f"w{i}" for i in range(20))
    rows = spark.createDataFrame(
        [(1, base), (2, base + " " + base), (3, "totally different words here now "
          + " ".join(f"x{i}" for i in range(10)))],
        "doc_id long, text string",
    ).select("doc_id", tx.fingerprint_rolling("text").alias("fp")).collect()
    fp = {r["doc_id"]: r["fp"] for r in rows}
    assert fp[1] == fp[2]  # doc 2 contains every window of doc 1
    assert fp[3] != fp[1]


def test_profile_table_total_on_empty_docs(spark):
    """ADVICE r4 regression: the single-pass bigram build evaluated
    slice(t, 1, n_t - 1) with length -1 on zero-token documents, crashing
    the stage — empty/whitespace docs are routine in real corpora."""
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, "   \n\t "), (4, "word"), (5, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in tx.text_profile_table(df).collect()}
    assert rows[1]["n_ws"] == 3
    for empty in (2, 3):
        assert rows[empty]["n_ws"] == 0
        assert rows[empty]["lang_guess"] == "und"
        assert rows[empty]["stopword_ratio"] is None
        assert rows[empty]["top_bigram_frac"] is None
    assert rows[4]["n_ws"] == 1  # one token: no bigrams, but counted
    assert rows[4]["top_bigram_frac"] is None
