"""Pathological-shape probe for ``remove_repeated_spans`` (SCALING_r09).

``python tools/bench_spans_patho.py [TOKENS ...]`` (default 20000 80000)
runs two shapes at each size, two warm passes each:

  mostly-dup  — two docs that are one giant duplicated region (spans ≈
                tokens/stride): the shape where the r8 per-token
                ``F.exists`` surgery did ~tokens²/stride work
                (measured 13.5 s at 80k tokens and climbing
                quadratically; the r9 interval sweep holds ~1.8 s flat);
  alternating — 50-token shared runs separated by 50 unique tokens:
                many DISJOINT removed intervals per doc, the worst case
                for the sweep's per-interval slice+join rebuild.

Prints one JSON line per (shape, size) with warm walls and the removed
token counts (fixed expected values double as a correctness check).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from timesearch_spark.session import get_spark  # noqa: E402


def mostly_dup(n_toks: int):
    body = " ".join("dup" for _ in range(n_toks))
    return [(1, body), (2, body), (3, "unique words only here")], {
        1: n_toks - 50, 2: n_toks, 3: 0,
    }


def alternating(n_toks: int):
    units = max(1, n_toks // 100)

    def doc(tag):
        parts = []
        for i in range(units):
            parts.append(" ".join(f"dup{i}_{j}" for j in range(50)))
            parts.append(" ".join(f"u_{tag}_{i}_{j}" for j in range(50)))
        return " ".join(parts)

    # doc 1 holds every winner; doc 2 drops every shared 50-token run
    return [(1, doc("a")), (2, doc("b")), (3, "plain short doc")], {
        1: 0, 2: units * 50, 3: 0,
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 80_000]
    spark = get_spark("bench-spans-patho")
    from timesearch_spark.operators.dedup import (
        release_pins, remove_repeated_spans,
    )

    for shape_name, make in (("mostly_dup", mostly_dup),
                             ("alternating", alternating)):
        for n_toks in sizes:
            rows, expected = make(n_toks)
            df = spark.createDataFrame(rows, "doc_id long, text string")
            walls = []
            got = {}
            for _ in range(2):
                t0 = time.time()
                out = remove_repeated_spans(df, n=50)
                got = {r["doc_id"]: r["n_removed_tokens"]
                       for r in out.collect()}
                walls.append(round(time.time() - t0, 2))
                release_pins(out)
            assert got == expected, (shape_name, n_toks, got, expected)
            print(json.dumps({
                "shape": shape_name, "tokens": n_toks, "walls": walls,
                "loadavg": round(os.getloadavg()[0], 2),
            }))


if __name__ == "__main__":
    main()
