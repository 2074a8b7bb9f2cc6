"""Stage-level profile of thread_page_frags_mega (r15 optimization).

Times each boundary of the streamed mega-thread pipeline through the
noop sink so the deltas attribute wall-clock to (a) input synthesis,
(b) the pointer-doubling walk, (c) the Python fragment render, (d) the
final agg.  Usage: python tools/profile_mega.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from timesearch_spark.operators import trees as tr  # noqa: E402
from timesearch_spark.session import get_spark  # noqa: E402


def noop(df, label):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label:38s} {dt:7.2f}s")
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-mega")
    from timesearch_spark.queries import _mega_page_inputs

    sc = spark.sparkContext

    for rep in range(2):
        print(f"--- pass {rep} ---")
        submissions, comments = _mega_page_inputs(spark, sf_dir)
        sc.setJobDescription("mega: inputs only")
        noop(comments, "inputs (synth comments)")

        submissions, comments = _mega_page_inputs(spark, sf_dir)
        comments2 = comments.withColumn(
            "submission",
            F.when(F.col("submission").startswith("t3_"),
                   F.col("submission")).otherwise(
                F.concat(F.lit("t3_"), F.col("submission"))),
        )
        sc.setJobDescription("mega: walk")
        t0 = time.time()
        joined = tr.comment_forest_big(
            comments2.select("submission", "idstr", "parent", "score",
                             "created", "author", "body", "subreddit"),
            max_depth=65536,
            page_order=True,
            drop_orphan_subtrees=True,
            emit_path=True,
            payload=("created", "score", "author", "body", "subreddit"),
        ).select("submission", "idstr", "order_key", "depth",
                 "created", "score", "author", "body", "subreddit")
        build = time.time() - t0
        print(f"{'walk plan build (driver, ckpts run)':38s} {build:7.2f}s")
        noop(joined, "walk output (+noop)")

        sc.setJobDescription("mega: walk+render")
        frags = tr.thread_page_fragments(submissions, comments)
        noop(frags, "full fragments (+render+heads)")

        sc.setJobDescription("mega: full query")
        out = frags.groupBy("submission").agg(
            F.count("*").alias("n_frags"),
            F.sum(F.octet_length("pre") + F.octet_length("post"))
            .alias("frag_bytes"),
        )
        noop(out, "full query (fresh frags agg)")
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
