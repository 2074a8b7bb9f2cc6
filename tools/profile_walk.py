"""Phase-level profile of comment_forest_big on the mega fixture (r15).

Replicates the walk's internal phases with timers between the eager
materializations so wall-clock attributes to: base ckpt, parent
normalization + sibling rank + state ckpt, each pointer-doubling round
(advance ckpt + convergence probe), and the final consumption.

Usage: python tools/profile_walk.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from timesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("profile-walk")
    from timesearch_spark.fs import checkpointer
    from timesearch_spark.queries import _mega_page_inputs

    for rep in range(reps):
        print(f"--- rep {rep} ---")
        t_all = time.time()
        submissions, comments = _mega_page_inputs(spark, sf_dir)
        comments = comments.select(
            "submission", "idstr", "parent", "score", "created",
            "author", "body", "subreddit")
        payload = ("created", "score", "author", "body", "subreddit")
        page_order = True

        root = F.concat(F.lit("t3_"),
                        F.regexp_replace("submission", "^t3_", ""))
        pl = [f"__pl_{c}" for c in payload]
        base = comments.select(
            F.col("submission").cast("string").alias("submission"),
            F.col("idstr").cast("string").alias("idstr"),
            F.col("parent").cast("string").alias("parent"),
            F.coalesce(F.nanvl(F.col("score").cast("double"), F.lit(0.0)),
                       F.lit(0.0)).alias("__score"),
            root.alias("__root"),
            F.col("created").alias("__created"),
            *[F.col(c).alias(a) for c, a in zip(payload, pl)],
        )
        ckpt = checkpointer(spark, None)
        t0 = time.time()
        base = ckpt(base)
        print(f"  base ckpt              {time.time() - t0:7.2f}s")

        t0 = time.time()
        known = base.select(F.col("submission").alias("__ksub"),
                            F.col("idstr").alias("__kid")).distinct()
        normed = (
            base.join(known,
                      (base["submission"] == known["__ksub"])
                      & (base["parent"] == known["__kid"]), "left")
            .select(
                "submission", "idstr",
                F.when(F.col("parent").startswith("t3_"), F.col("__root"))
                .otherwise(F.col("parent")).alias("parent"),
                "__score", "__root",
                (F.col("__kid").isNull()
                 & ~F.col("parent").startswith("t3_"))
                .alias("__parent_missing"),
                "__created", *pl,
            )
        )
        phantoms = (
            normed.filter("__parent_missing")
            .select("submission", F.col("parent").alias("idstr"), "__root")
            .distinct()
            .select("submission", "idstr",
                    F.col("__root").alias("parent"),
                    F.lit(0.0).alias("__score"), "__root",
                    F.lit(True).alias("phantom"),
                    F.lit(None).cast(dict(normed.dtypes)["__created"])
                    .alias("__created"),
                    *[F.lit(None).cast(dict(normed.dtypes)[a]).alias(a)
                      for a in pl])
        )
        nodes = (normed.drop("__parent_missing")
                 .withColumn("phantom", F.lit(False)).unionByName(phantoms))
        order = [F.desc("__score"), F.asc(F.lower(F.col("idstr"))),
                 F.asc_nulls_first("__created"), F.asc("idstr")]
        rank = F.row_number().over(
            Window.partitionBy("submission", "parent").orderBy(*order))
        seg = F.lpad(rank.cast("string"), 8, "0")
        seg = F.when(F.col("phantom"),
                     F.concat(F.lit("~"),
                              F.lpad(rank.cast("string"), 7, "0"))
                     ).otherwise(seg)
        state = nodes.select(
            "submission", "idstr", "parent", "phantom", "__root",
            F.col("parent").alias("anc"), seg.alias("path"),
            F.lit(1).alias("hops"), *pl)
        state = ckpt(state)
        print(f"  norm+rank+state ckpt   {time.time() - t0:7.2f}s")

        done_parts = [state.filter(F.col("anc") == F.col("__root"))]
        todo = state.filter(F.col("anc") != F.col("__root"))
        for rnd in range(17):
            t0 = time.time()
            full = reduce(lambda a, b: a.unionByName(b), done_parts + [todo])
            anc_state = full.select(
                F.col("submission").alias("__asub"),
                F.col("idstr").alias("__aid"),
                F.col("anc").alias("__aanc"),
                F.col("path").alias("__apath"),
                F.col("hops").alias("__ahops"))
            advanced = (
                todo.join(anc_state,
                          (todo["submission"] == anc_state["__asub"])
                          & (todo["anc"] == anc_state["__aid"]), "inner")
                .select("submission", "idstr", "parent", "phantom",
                        "__root", F.col("__aanc").alias("anc"),
                        F.concat(F.col("__apath"), F.col("path"))
                        .alias("path"),
                        (F.col("hops") + F.col("__ahops")).alias("hops"),
                        *pl)
                .filter(F.col("hops") <= F.lit(65536)))
            advanced = ckpt(advanced)
            t1 = time.time()
            done_parts.append(
                advanced.filter(F.col("anc") == F.col("__root")))
            todo = advanced.filter(F.col("anc") != F.col("__root"))
            n_todo = todo.limit(1).count()
            t2 = time.time()
            print(f"  round {rnd}: advance+ckpt {t1 - t0:6.2f}s "
                  f"probe {t2 - t1:6.2f}s")
            if n_todo == 0:
                break

        t0 = time.time()
        resolved = reduce(lambda a, b: a.unionByName(b), done_parts)
        resolved = resolved.filter(~F.col("path").contains("~"))
        back = [F.col(a).alias(c) for c, a in zip(payload, pl)]
        out = resolved.select(
            "submission", "idstr", "parent",
            (F.col("hops") - F.lit(1)).cast("int").alias("depth"),
            F.col("path").alias("order_key"), "phantom", *back)
        out.write.format("noop").mode("overwrite").save()
        print(f"  consume walk output    {time.time() - t0:7.2f}s")
        print(f"  TOTAL                  {time.time() - t_all:7.2f}s")


if __name__ == "__main__":
    main()
