"""Scaling probe: run every bench headliner at two scale factors and
report the time ratio per query.

``python tools/bench_scaling.py [SMALL_DIR] [BIG_DIR] [FACTOR] [NAME...]``
(defaults: /root/testdata/sf0.1, .bench_data/sf1, 10; trailing NAMEs
restrict the probe to those headliners — re-probing one NOISY row
doesn't cost a full sweep).  The BIG dir is
produced by tools/gen_scale_data.py — FACTOR logical copies of SMALL
with key offsets, so every per-key group size is preserved and an
honest linear plan should land near ratio == FACTOR (local[32] is
already saturated at sf0.1, so there is no free parallelism to hide
behind).  A ratio far above FACTOR is the scaling bug this tool exists
to surface: bucket explosions, quadratic candidate generation, window
state that grows with total volume, a broadcast flipping to SMJ.

Writes one JSON line to stdout and a markdown table to SCALING_r{N}.md
(round from $SPARK_GRAFT_ROUND, default unnumbered).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402
from timesearch_spark.session import get_spark  # noqa: E402


def _sink_breakdown_streamed(spark, sf_dir, out_dir):
    """The r12 streamed single-file breakdown sink end-to-end: agg →
    executor-side json.dumps fragments → one streaming single-task
    write.  Contractually ends in ONE sequential writer task (the output
    is one file of one line), so the scaling question this row answers
    is whether the fragment shuffle, not the writer, dominates at 10×."""
    from timesearch_spark.operators.exports import (
        write_breakdown_unsorted_streamed,
    )
    from timesearch_spark.queries import breakdown_counts

    bd = breakdown_counts(spark, sf_dir)
    write_breakdown_unsorted_streamed(bd, out_dir, "probe",
                                      key_name="custkey")


def _sink_thread_docs_streamed(spark, sf_dir, out_dir):
    """The r12 streamed no-ceiling page sink end-to-end: distributed
    page-order walk → fragment render → per-thread O(depth) stack
    writer actually writing every page file.  One page = one file, so
    the writer parallelism is the thread count, not a single task."""
    from timesearch_spark.operators.exports import write_thread_docs_streamed
    from timesearch_spark.operators.trees import thread_page_fragments
    from timesearch_spark.queries import _page_inputs

    subs, comments = _page_inputs(spark, sf_dir)
    write_thread_docs_streamed(
        thread_page_fragments(subs, comments), out_dir)


def _sink_thread_docs_routed(spark, sf_dir, out_dir):
    """r14 (VERDICT r13 #7): the DEFAULT export path end-to-end — the
    auto-router's probe agg + broadcast split joins + fused arm over
    the small-thread archive + streamed arm over the over-bound
    threads, writing every page file.  Mixed fixture: the _page_inputs
    archive plus ONE mega thread; the bound is forced under the mega
    thread's size AT EVERY PROBED SF (sf0.001's mega ≈ 6k comments) so
    the router actually splits — at the production 2M-row bound the
    mega fixture would ride the fused arm and the router's split joins
    would go unmeasured."""
    from timesearch_spark.api import _routed_page_export
    from timesearch_spark.fs import derive_checkpoint_dir
    from timesearch_spark.queries import _mega_page_inputs, _page_inputs

    subs, comments = _page_inputs(spark, sf_dir)
    msubs, mcomments = _mega_page_inputs(spark, sf_dir)
    _routed_page_export(
        subs.unionByName(msubs),
        comments.unionByName(mcomments, allowMissingColumns=False),
        out_dir,
        checkpoint_dir=derive_checkpoint_dir(out_dir),
        bound=5_000,
    )


#: sinks probed end-to-end (files written to a temp dir, timing includes
#: the write, cleanup excluded) — the bench headliners reduce these
#: pipelines to narrow aggregates, so without these rows neither
#: streamed sink had scaling evidence (r12 verdict item 7)
SINK_PROBES = {
    "sink_breakdown_streamed": _sink_breakdown_streamed,
    "sink_thread_docs_streamed": _sink_thread_docs_streamed,
    "sink_thread_docs_routed": _sink_thread_docs_routed,
}


def _pairs_fanout(grouped_counts):
    """Σ c·(c−1)/2 over per-group posting counts: the exact number of
    ordered candidate pairs the family's self-join generates BEFORE any
    filter — the drift evidence the r11/r12 jaccard investigations had
    to reconstruct by hand (r12 verdict item 8)."""
    from pyspark.sql import functions as F

    row = grouped_counts.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs")
    ).first()
    return int(row["pairs"] or 0)


def _cand_ngram_jaccard(spark, sf_dir):
    from pyspark.sql import functions as F

    from timesearch_spark.operators import dedup as dd
    from timesearch_spark.tables import load

    d = load(spark, sf_dir, "documents")
    post, _base = dd._jaccard_postings(d, "source", "text", "doc_id", 1)
    pref = dd._jaccard_prefix_postings(post, "doc_id", 0.5)
    return _pairs_fanout(
        pref.groupBy("block", "gh").agg(F.count("*").alias("c")))


def _cand_minhash(hash_family, num_hashes, bands, suffix):
    def counter(spark, sf_dir):
        from pyspark.sql import functions as F

        from timesearch_spark.operators import dedup as dd
        from timesearch_spark.queries import _docs_with_mutations

        u = _docs_with_mutations(spark, sf_dir, suffix)
        bb = dd.minhash_band_buckets(
            u, num_hashes=num_hashes, bands=bands, hash_family=hash_family)
        return _pairs_fanout(
            bb.groupBy("band", "bucket").agg(F.count("*").alias("c")))

    return counter


def _cand_simhash(spark, sf_dir):
    from pyspark.sql import functions as F

    from timesearch_spark.operators import dedup as dd
    from timesearch_spark.queries import _docs_with_mutations

    u = _docs_with_mutations(spark, sf_dir, " zzq")
    h = dd.simhash_table(u, "text", "doc_id", "xxhash64")
    ex = h.select(F.explode(dd._simhash_chunks("sh", 3)).alias("cv")).select(
        F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    return _pairs_fanout(
        ex.groupBy("chunk", "val").agg(F.count("*").alias("c")))


def _cand_similarity_topk_lsh(spark, sf_dir):
    """Candidate VECTORS the query's multiprobe admits (the exact set
    cosine_topk_lsh verifies): corpus rows whose signature is within
    Hamming-1 of the query's in any table — the operator's defaults
    (64 dims, 6 bits × 16 tables, seed 42), same as the registry
    entry."""
    import numpy as np
    from pyspark.sql import functions as F

    from timesearch_spark.operators import similarity as sim
    from timesearch_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    planes = sim.hyperplanes(64, 6, 16, 42)
    qrow = emb.filter(F.col("vec_id") == 0).select(
        sim.as_double("embedding").alias("q")).first()
    qsig = sim.pack_signatures(
        np.array([list(qrow["q"])], dtype=np.float64), planes)[0]
    sigs = sim.with_signatures(emb, planes, "vec_id", "embedding")
    match = F.lit(False)
    for t in range(16):
        match = match | (
            F.bit_count(F.col(f"sig{t}").bitwiseXOR(F.lit(int(qsig[t])))) <= 1
        )
    return int(sigs.filter(match).count())


def _cand_similarity_neardup_lsh(spark, sf_dir):
    """Σ c·(c−1)/2 over (table, signature) buckets at the registry
    entry's parameters (64 dims, bits="auto" via neardup_lsh_params,
    planted-copy input) — the pairs the bucket self-join generates
    before cosine verification."""
    from pyspark.sql import functions as F

    from timesearch_spark.operators import similarity as sim
    from timesearch_spark.queries import _emb_with_planted

    emb = _emb_with_planted(spark, sf_dir)
    bits, tables = sim.neardup_lsh_params(emb.count(), 0.9)
    planes = sim.hyperplanes(64, bits, tables, 42)
    sigs = sim.with_signatures(emb, planes, "vec_id", "embedding")
    ex = sigs.select(F.explode(F.array(*[
        F.struct(F.lit(t).alias("t"), F.col(f"sig{t}").alias("sig"))
        for t in range(tables)
    ])).alias("ts")).select(F.col("ts.t").alias("t"),
                            F.col("ts.sig").alias("sig"))
    return _pairs_fanout(ex.groupBy("t", "sig").agg(F.count("*").alias("c")))


#: per-query candidate-pair counters (same parameters as the registry
#: query each names); counted once per probe at BOTH scale factors so a
#: future wall-clock drift is attributable to candidate growth vs load
#: in one run
CANDIDATE_COUNTERS = {
    "dedup_ngram_jaccard": _cand_ngram_jaccard,
    "dedup_minhash_lsh": _cand_minhash("md5", 32, 8, " zzq wwx vvy"),
    "dedup_minhash_xx64": _cand_minhash("xxhash64", 64, 16, " zzq wwx vvy"),
    "dedup_simhash_xx64": _cand_simhash,
    # r14 (VERDICT r13 #6): the embedding-LSH probes get the same
    # diagnosable-drift columns the dedup family's paid off with
    "similarity_topk_lsh": _cand_similarity_topk_lsh,
    "similarity_neardup_lsh": _cand_similarity_neardup_lsh,
}


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".bench_data", "sf1")
    )
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    only = set(sys.argv[4:])  # empty = all headliners

    spark = get_spark("bench-scaling")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def run(name: str, sf_dir: str) -> float:
        # a SCALING probe must measure the full plan including persisted
        # sub-plan population: identical re-invocations hit the
        # CacheManager (plans match), and min-of-warm-runs would report
        # a physically impossible ~1.0 ratio for any query that pins a
        # rung (curate, incremental minhash).  bench.py deliberately
        # keeps steady-state semantics; this tool deliberately doesn't.
        spark.catalog.clearCache()
        if name in SINK_PROBES:
            import shutil
            import tempfile

            tmp = tempfile.mkdtemp(prefix=f"scaling_{name}_")
            t0 = time.time()
            try:
                SINK_PROBES[name](spark, sf_dir, tmp)
                return time.time() - t0
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warmup both directories (JVM + codegen + parquet footers)
    for d in (small, big):
        try:
            run("dedup_ids", d)
        except Exception:
            pass

    # Quiet-host gating (r9 verdict item 6): a ratio sampled while other
    # tenants ramp this shared host is mush (r9's 22.94x "regression"
    # was loadavg 9->25 during the sample; the quiet re-probe read
    # 5.34x).  A row whose 1-min loadavg exceeds the gate AT SAMPLE
    # START is re-measured after a cool-off, up to
    # $SPARK_GRAFT_LOAD_RETRIES times; the QUIETEST attempt is kept and
    # rows that never started under the gate carry noisy=true — no
    # silent loud samples, no manual re-probe section.  Start-only on
    # purpose: the probe ITSELF drives the post-run 1-min EMA well past
    # any sane gate (a 30s 32-wide sf1 run is self-load, not tenant
    # noise), so an end-of-run sample cannot distinguish the two; the
    # cool-off both waits out tenants and lets our own EMA decay.
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "8"))
    retries = int(os.environ.get("SPARK_GRAFT_LOAD_RETRIES", "3"))
    cooloff = float(os.environ.get("SPARK_GRAFT_LOAD_COOLOFF", "25"))

    def measure(name: str) -> tuple[float, float, float]:
        l0 = os.getloadavg()[0]
        t_small = min(run(name, small) for _ in range(2))
        t_big = min(run(name, big) for _ in range(2))
        return t_small, t_big, round(l0, 2)

    rows = []
    errors: dict[str, str] = {}
    probe_names = list(HEADLINE) + [n for n in SINK_PROBES
                                    if n not in HEADLINE]
    for name in probe_names:
        if (name not in qs and name not in SINK_PROBES) \
                or (only and name not in only):
            continue
        try:
            best = None
            for attempt in range(retries + 1):
                t_small, t_big, load = measure(name)
                if best is None or load < best[2]:
                    best = (t_small, t_big, load)
                if load <= load_gate:
                    break
                if attempt < retries:
                    print(
                        f"  {name}: loadavg {load} > gate {load_gate:g}, "
                        f"cooling off {cooloff:g}s (retry {attempt + 1}/"
                        f"{retries})",
                        file=sys.stderr,
                    )
                    time.sleep(cooloff)
            t_small, t_big, load = best
            noisy = load > load_gate
            row = {
                "query": name,
                "t_small": round(t_small, 3),
                "t_big": round(t_big, 3),
                "ratio": round(t_big / t_small, 2),
                "load": load,
                "noisy": noisy,
            }
            if name in CANDIDATE_COUNTERS:
                counter = CANDIDATE_COUNTERS[name]
                row["cand_small"] = counter(spark, small)
                row["cand_big"] = counter(spark, big)
                row["cand_ratio"] = (
                    round(row["cand_big"] / row["cand_small"], 2)
                    if row["cand_small"] else None
                )
            rows.append(row)
            print(
                f"  {name}: {t_small:.2f}s -> {t_big:.2f}s "
                f"(x{t_big / t_small:.1f})"
                + (" NOISY" if noisy else ""),
                file=sys.stderr,
            )
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"  {name}: ERROR {errors[name]}", file=sys.stderr)

    rnd = os.environ.get("SPARK_GRAFT_ROUND", "")
    stem = f"SCALING_r{rnd}" if rnd else "SCALING"
    side = os.path.join(REPO, stem + ".json")

    # A targeted re-probe (trailing NAMEs) REWRITES the canonical
    # table's rows in place (r11 missing #3: addendum files left the
    # main table carrying NOISY rows a quiet re-probe had already
    # superseded).  The full sweep's rows live in the JSON sidecar; a
    # re-probed row replaces its old row when it is quieter (or the old
    # row was noisy and the new one is not) — a LOUDER re-probe never
    # degrades the table.
    if only and os.path.exists(side):
        with open(side) as f:
            prior = json.load(f)
        merged = {r["query"]: r for r in prior.get("queries", [])}
        for r in rows:
            old = merged.get(r["query"])
            if (old is None or r["load"] < old.get("load", float("inf"))
                    or (old.get("noisy") and not r["noisy"])):
                merged[r["query"]] = r
            else:
                print(f"  {r['query']}: re-probe louder than the standing "
                      f"row (load {r['load']} vs {old.get('load')}), "
                      "keeping the old row", file=sys.stderr)
        rows = list(merged.values())
        errors = {**prior.get("errors", {}), **errors}
        errors = {k: v for k, v in errors.items() if k not in merged}

    flagged = [r for r in rows if r["ratio"] > 1.5 * factor]
    result = {
        "metric": "scaling_ratio",
        "factor": factor,
        "small": small,
        "big": big,
        "load_gate": load_gate,
        "queries": rows,
        "flagged_over_1p5x_factor": [r["query"] for r in flagged],
        "noisy": [r["query"] for r in rows if r["noisy"]],
        "errors": errors,
    }
    print(json.dumps(result))
    with open(side, "w") as f:
        json.dump(result, f, indent=1)

    out = os.path.join(REPO, stem + ".md")
    # Hand-written analysis sections ("## ..." blocks after the table /
    # legend) survive a re-probe rewrite: r12 lost its tree_depth_dist
    # variance note twice to targeted re-probes before this carry-over.
    notes = ""
    if os.path.exists(out):
        prior_md = open(out).read()
        cut = prior_md.find("\n## ")
        while cut != -1 and prior_md[cut + 1:cut + 10] == "## Errors":
            cut = prior_md.find("\n## ", cut + 1)
        if cut != -1:
            notes = prior_md[cut:]
    with open(out, "w") as f:
        f.write(
            f"# Scaling probe: {small} -> {big} ({factor:g}x rows)\n\n"
            "Generated by tools/bench_scaling.py (data from "
            "tools/gen_scale_data.py — key-offset replication, so group "
            "sizes and join fan-outs are preserved; see its docstring "
            "for the document-text mutation that keeps near-dup "
            "candidate volume linear).  local[32] is compute-saturated "
            f"at the small SF already, so ~{factor:g}x wall-clock is the "
            "expected linear-plan ratio; materially above that = "
            "superlinear work, materially below = fixed overhead "
            "dominating the small run.\n\n"
            f"Samples are quiet-host gated (1-min loadavg <= {load_gate:g} "
            "at sample start, quietest of up to "
            f"{retries + 1} attempts kept); rows that never STARTED under "
            "the gate are marked NOISY and should be re-read, not "
            "trusted.  (Start-only: the probe's own 32-wide run drives "
            "the post-run 1-min EMA past any sane gate, so an end-of-run "
            "sample cannot tell self-load from tenant noise.)\n\n"
            "Dedup-family rows carry the candidate-pair fanout "
            "(Σ c·(c−1)/2 over the family's blocking groups, counted at "
            "both SFs with the registry query's own parameters): a "
            "wall-clock drift with a flat candidate ratio is load or "
            "plan overhead, one WITH candidate growth is a real recall/"
            "blocking problem — diagnosable from this one table.\n\n"
            "| query | t_small (s) | t_big (s) | ratio | "
            "candidates small→big (ratio) | loadavg@sample |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in sorted(rows, key=lambda r: -r["ratio"]):
            flag = " **<-- investigate**" if r["ratio"] > 1.5 * factor else ""
            noise = " **NOISY**" if r["noisy"] else ""
            cand = ""
            if "cand_small" in r:
                ratio_cell = (
                    f"({r['cand_ratio']}×)"
                    if r.get("cand_ratio") is not None else "(n/a)"
                )
                cand = (f"{r['cand_small']:,} → {r['cand_big']:,} "
                        f"{ratio_cell}")
            f.write(
                f"| {r['query']} | {r['t_small']} | {r['t_big']} | "
                f"{r['ratio']}{flag} | {cand} | "
                f"{r.get('load', '?')}{noise} |\n"
            )
        if errors:
            f.write("\n## Errors\n\n")
            for k, v in errors.items():
                f.write(f"- **{k}**: `{v}`\n")
        if notes:
            f.write(notes)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
