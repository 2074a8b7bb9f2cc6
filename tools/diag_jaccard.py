"""Stage-level row attribution for the ngram-Jaccard prefix join.

``python tools/diag_jaccard.py [SMALL_DIR] [BIG_DIR]`` prints, for each
directory, the row count of every stage of the PPJoin pipeline plus the
analytic join-output volume (Sigma per-(block,gh) prefix-posting^2),
which IS the number of rows the candidate self-join generates before
any filter runs.  The stage whose big/small ratio grows far beyond the
data ratio is the superlinear one.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from timesearch_spark.session import get_spark  # noqa: E402
from timesearch_spark.tables import load  # noqa: E402
from timesearch_spark.operators import dedup as dd  # noqa: E402


def probe(spark, sf_dir: str, threshold: float = 0.5, n: int = 1) -> dict:
    d = load(spark, sf_dir, "documents")
    post, base = dd._jaccard_postings(d, "source", "text", "doc_id", n)
    pref = dd._jaccard_prefix_postings(post, "doc_id", threshold)
    post = post.persist()
    pref = pref.persist()

    stats = {"docs": d.count(), "postings": post.count(), "prefix_rows": pref.count()}

    # join fanout = Sigma over (block, gh) of cnt*(cnt-1)/2 ordered pairs
    per_gram = pref.groupBy("block", "gh").agg(F.count("*").alias("c"))
    fan = per_gram.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
        F.max("c").alias("max_posting"),
        F.expr("percentile_approx(c, 0.999)").alias("p999_posting"),
        F.count("*").alias("distinct_grams"),
    ).collect()[0]
    stats["join_output_pairs"] = int(fan["pairs"] or 0)
    stats["max_prefix_posting"] = int(fan["max_posting"] or 0)
    stats["p999_prefix_posting"] = float(fan["p999_posting"] or 0)
    stats["distinct_prefix_grams"] = int(fan["distinct_grams"] or 0)

    # full-posting df distribution too (pre-prefix)
    pg = post.groupBy("block", "gh").agg(F.count("*").alias("c"))
    fp = pg.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
        F.max("c").alias("max_posting"),
    ).collect()[0]
    stats["raw_join_output_pairs"] = int(fp["pairs"] or 0)
    stats["raw_max_posting"] = int(fp["max_posting"] or 0)

    # candidates surviving filters + dedup, and the final pair count
    pairs = dd._jaccard_from_prefix(base, pref, "doc_id", threshold)
    a = pref.select(
        "block", "gh", F.col("doc_id").alias("a"),
        F.col("sz").alias("na"), F.col("rn").alias("pa"),
    )
    b = pref.select(
        "block", "gh", F.col("doc_id").alias("b"),
        F.col("sz").alias("nb"), F.col("rn").alias("pb"),
    )
    req = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("na") + F.col("nb")).cast("double") - F.lit(1e-9)
    )
    bound = F.lit(1) + F.least(
        F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")
    )
    cand = (
        a.join(b, on=["block", "gh"])
        .filter(
            (F.col("a") < F.col("b"))
            & (
                F.least("na", "nb").cast("double")
                >= F.lit(threshold) * F.greatest("na", "nb").cast("double")
                - F.lit(1e-9)
            )
            & (bound >= req)
        )
        .dropDuplicates(["a", "b"])
    )
    stats["candidates_deduped"] = cand.count()
    stats["final_pairs"] = pairs.count()

    for p in [post, pref]:
        p.unpersist()
    return stats


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".bench_data", "sf1")
    spark = get_spark("diag-jaccard")
    out = {}
    for name, d in (("small", small), ("big", big)):
        spark.catalog.clearCache()
        out[name] = probe(spark, d)
        print(f"{name}: {json.dumps(out[name])}", file=sys.stderr)
    ratios = {
        k: round(out["big"][k] / max(out["small"][k], 1), 2)
        for k in out["small"]
    }
    out["ratio"] = ratios
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
