"""Capture the trained quality-classifier weights bit-exactly, to prove
a trainer-internals change (np.add.at -> np.bincount) leaves the fit
bit-identical.  Writes a .npz of the sorted nonzero (idx, w) pairs and
the bias, plus wall time of the GD section.

Usage: python tools/capture_clf_weights.py OUT.npz [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from timesearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("capture-clf")
    from timesearch_spark.operators.textstats import train_quality_classifier
    from timesearch_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    pos = docs.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 5000)
    ).select("text")
    neg = pos.select(F.reverse("text").alias("text"))
    t0 = time.time()
    W, b = train_quality_classifier(pos, neg, dim=1 << 14, iters=100)
    rows = sorted((r["idx"], r["w"]) for r in W.collect())
    dt = time.time() - t0
    idx = np.array([r[0] for r in rows], dtype=np.int64)
    w = np.array([r[1] for r in rows], dtype=np.float64)
    np.savez(out, idx=idx, w=w, b=np.float64(b))
    print(f"captured {len(idx)} nonzero weights, bias={b!r}, "
          f"train+collect {dt:.2f}s")


if __name__ == "__main__":
    main()
