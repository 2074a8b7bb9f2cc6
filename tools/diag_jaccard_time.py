"""Wall-time attribution for the ngram-Jaccard prefix join stages.

Times two cuts at each SF (cache cleared before each):
  A. postings + prefix materialization (noop write of prefix rows)
  C. the full query (noop write)
so stage time =~ C-A (candidate gen + verify).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from timesearch_spark.session import get_spark  # noqa: E402
from timesearch_spark.tables import load  # noqa: E402
from timesearch_spark.operators import dedup as dd  # noqa: E402


def probe(spark, sf_dir: str, threshold: float = 0.5, n: int = 1) -> dict:
    res = {}

    def cut_a():
        d = load(spark, sf_dir, "documents")
        post, base = dd._jaccard_postings(d, "source", "text", "doc_id", n)
        pref = dd._jaccard_prefix_postings(post, "doc_id", threshold)
        return base, pref

    spark.catalog.clearCache()
    t0 = time.time()
    base, pref = cut_a()
    pref.write.format("noop").mode("overwrite").save()
    res["A_prefix"] = round(time.time() - t0, 2)

    spark.catalog.clearCache()
    t0 = time.time()
    base, pref = cut_a()
    pairs = dd._jaccard_from_prefix(base, pref, "doc_id", threshold)
    pairs.write.format("noop").mode("overwrite").save()
    res["C_full"] = round(time.time() - t0, 2)
    return res


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".bench_data", "sf1")
    spark = get_spark("diag-jaccard-time")
    # warmup
    probe(spark, "/root/testdata/sf0.01")
    out = {}
    for name, d in (("small", small), ("big", big)):
        out[name] = probe(spark, d)
        print(f"{name}: {json.dumps(out[name])}", file=sys.stderr)
    out["ratio"] = {
        k: round(out["big"][k] / max(out["small"][k], 0.01), 2)
        for k in out["small"]
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
