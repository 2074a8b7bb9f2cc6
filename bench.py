"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is materialized through the noop sink (full execution, no
driver-side collect) so the number measures the distributed plan, not
result transfer.  First a warmup query runs to absorb JVM/codegen start.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timesearch_spark.session import get_spark  # noqa: E402

# Headline queries: one per engine subsystem (scan pushdown, hash agg +
# outer join, big equi-join, window, merge, global sort, dedup, union,
# plus the LLM-pipeline extensions when present).
HEADLINE = [
    "filter_timerange",
    "sort_computed_key",
    "equi_join_thread",
    "window_rank_children",
    "upsert_merge",
    "sort_score_desc",
    "dedup_ids",
    "union_tagged",
    # extensions (skipped silently if not yet registered)
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash_xx64",
    "dedup_simhash_xx64",
    "dedup_minhash_lsh",  # md5 oracle-parity family: xx64 twin is the default
    "dedup_ngram_jaccard",
    "dedup_paragraphs",
    "dedup_spans",
    "dedup_incremental_minhash",
    "similarity_topk",
    "similarity_topk_lsh",
    "similarity_neardup_blas",
    "similarity_neardup_lsh",  # bucketed all-pairs scale path (r14)
    "text_profile",
    "text_html_extract",  # HTML→text ingestion stage (r14)
    "text_lm_ppl",  # CCNet-style unigram-LM perplexity filter (r12)
    "text_lm_ppl_bigram",  # stupid-backoff bigram upgrade (r12)
    "text_quality_clf",  # trained hashed-linear quality filter (r12)
    "text_clf_score",  # scoring-only md5 oracle-replay family (r15)
    "events_windows",
    "sessionize",
    "events_asof",
    "events_interval",
    "events_unique_sketch",
    "orders_scd2",
    "pipeline_curate",  # the five-rung curation ladder users actually run
    "pipeline_dsir",  # DSIR md5 oracle-replay family (r14; the dedup_minhash_lsh pattern)
    "pipeline_dsir_xx64",  # DSIR production hash family (r13 plan shape)
    "tree_depth",
    "thread_pages",  # A10 flagship: full reference-parity page pipeline
    # r14 (VERDICT r13 #3): the streamed arm is benched on its
    # POST-ROUTING workload — one mega-thread — not the whole
    # small-thread archive the auto-router no longer sends it
    # (thread_page_frags stays registered for the byte-parity suite)
    "thread_page_frags_mega",
    "media_stats",
    # skew-immune exact twins (round 8): same results as their plain
    # forms, hot-key-proof plans — benched so the scaling probe covers
    # the path a skewed corpus would actually take
    "sessionize_salted",
    "tree_depth_dist",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    from timesearch_spark.operators.dedup import release_pins

    def run(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        # Operators that persist() shared sub-plans attach the handles as
        # _pinned; without this, best-of-3 × 30 queries accumulates cache
        # entries for the whole bench session (and mixes cached-rung reuse
        # into later timings).
        release_pins(df)
        return dt

    load_before = os.getloadavg()
    # Warmup (JVM + codegen + parquet footer cache): never a single point
    # of failure — r3's bench died in warmup on one broken query and
    # recorded zero numbers for the whole round.
    for warm in ("count_max", "dedup_ids", "point_lookup"):
        try:
            run(warm)
            break
        except Exception:
            continue

    # Quiet-host gating (r10 verdict item 1, ported from
    # tools/bench_scaling.py): on this shared host the official r10 run
    # sampled at loadavg 3.5→9.2 and showed ±25% per-query swings against
    # r9 with byte-identical physical plans — the scoreboard could not
    # tell a real regression from tenant noise.  A query whose 1-min
    # loadavg exceeds the gate AT the best-of-3 triple's START is
    # re-measured after a cool-off (quietest attempt kept); queries that
    # never started under the gate are listed in the summary's "noisy"
    # field.  Start-only, like the scaling probe: our own 3×32-thread run
    # drives the post-run EMA past any sane gate, so an end sample cannot
    # distinguish self-load from tenants.  Total sleep is budget-capped so
    # a persistently loud host degrades to the old ungated behaviour
    # (flagged, not stalled).
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "8"))
    retries = int(os.environ.get("SPARK_GRAFT_LOAD_RETRIES", "2"))
    cooloff = float(os.environ.get("SPARK_GRAFT_LOAD_COOLOFF", "20"))
    sleep_budget = float(os.environ.get("SPARK_GRAFT_LOAD_BUDGET", "480"))
    slept = 0.0

    def steal_ticks() -> int | None:
        # r16 (VERDICT r15 item 8): this host's inflation episodes are
        # CPU steal, which loadavg does NOT predict (r15 measured 5-14%
        # steal at loadavg < 2 with ±2× wall swings on byte-identical
        # plans).  Record steal per sample so a PERF comparison can
        # separate host inflation from code.  Additive only: every
        # pre-existing field keeps its meaning.
        try:
            with open("/proc/stat") as fh:
                return int(fh.readline().split()[8])
        except (OSError, IndexError, ValueError):
            return None

    def triple(name: str) -> tuple[list, list, float, list]:
        # 1-min loadavg AT each sample: a regression claim read off a
        # sample taken at loadavg 8 on this shared host is mush (r8's
        # cold-run comparison) — the reader needs per-sample evidence,
        # not the global before/after pair
        start_load = round(os.getloadavg()[0], 2)
        samples, lds, steals = [], [], []
        ncpu = os.cpu_count() or 1
        for _ in range(3):
            lds.append(round(os.getloadavg()[0], 2))
            s0 = steal_ticks()
            dt = run(name)
            s1 = steal_ticks()
            samples.append(round(dt, 3))
            if s0 is None or s1 is None:
                steals.append(None)
            else:
                # steal during the run as % of this process's whole-host
                # tick budget (ticks are 10 ms each)
                steals.append(
                    round((s1 - s0) / 100.0 / max(dt, 0.01) / ncpu * 100, 1)
                )
        return samples, lds, start_load, steals

    # best-of-3 per query: later runs reuse the codegen cache, so the
    # number reflects the steady-state distributed plan (what scales to the
    # cluster) instead of one-off driver-side JIT/GC jitter.  All raw runs
    # plus the host load averages are recorded so a reader can tell a code
    # regression from a loaded sandbox (r1→r2 showed a uniform ~1.8×
    # environmental swing that best-of-2 didn't absorb).  A query that
    # raises records "err" instead of killing the run.
    times: dict[str, float] = {}
    raw: dict[str, object] = {}
    loads: dict[str, list] = {}
    start_loads: dict[str, float] = {}
    steals_all: dict[str, list] = {}
    noisy: list[str] = []
    errors: dict[str, str] = {}
    for name in HEADLINE:
        if name in qs:
            try:
                best = None
                for attempt in range(retries + 1):
                    samples, lds, l0, stls = triple(name)
                    if best is None or l0 < best[2]:
                        best = (samples, lds, l0, stls)
                    if l0 <= load_gate:
                        break
                    if attempt < retries and slept + cooloff <= sleep_budget:
                        print(
                            f"  {name}: loadavg {l0} > gate {load_gate:g}, "
                            f"cooling off {cooloff:g}s "
                            f"(retry {attempt + 1}/{retries})",
                            file=sys.stderr,
                        )
                        time.sleep(cooloff)
                        slept += cooloff
                    else:
                        break
                samples, lds, l0, stls = best
                raw[name] = samples
                loads[name] = lds
                start_loads[name] = l0
                steals_all[name] = stls
                if l0 > load_gate:
                    noisy.append(name)
                times[name] = min(samples)
            except Exception as exc:  # record, keep benching the rest
                raw[name] = "err"
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    # The grading driver captures only the LAST ~2000 chars of stdout, so
    # the machine-readable record must be (a) the final line and (b)
    # compact.  Round 9 lost its official bench record because one fat
    # line (summary + runs + per-sample loads, 3.6 KB) pushed the leading
    # fields past the tail window and the driver recorded parsed:null.
    # Detail (raw samples, per-sample loadavg) goes to a sidecar file and
    # an EARLIER stdout line; the summary prints last and is size-checked.
    detail = {
        "runs": raw,
        "load": loads,
        "start_load": start_loads,
        "steal_pct": steals_all,
        "gate": {
            "load_gate": load_gate,
            "retries": retries,
            "cooloff": cooloff,
            "slept": round(slept, 1),
        },
        "noisy": sorted(noisy),
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(sidecar, "w") as fh:
            json.dump(detail, fh)
    except OSError:
        pass  # read-only checkout: the stdout detail line still carries it
    print(json.dumps({"detail": detail}))

    # compact steal aggregate for the one-line summary: the steal % of
    # each query's BEST (= reported) sample, summarized med/max — enough
    # for a reader to tell "quiet run" from "inflated run" without the
    # sidecar; per-query detail stays in BENCH_DETAIL.json.
    best_steals = []
    for name, samples in raw.items():
        if isinstance(samples, list) and name in steals_all:
            stls = steals_all[name]
            i = samples.index(min(samples))
            if i < len(stls) and stls[i] is not None:
                best_steals.append(stls[i])
    steal_summary = None
    if best_steals:
        best_steals.sort()
        steal_summary = {
            "med": best_steals[len(best_steals) // 2],
            "max": best_steals[-1],
        }

    summary = compact_summary(times, sf, errors, noisy, steal_summary)
    print(summary)


def compact_summary(times: dict, sf, errors: dict, noisy=(),
                    steal=None) -> str:
    """The one line the driver parses. Kept deliberately small: per-query
    bests only, errors truncated hard, never-quiet queries named (so a
    reader can discount their numbers), and a guard that drops the
    per-query map's long tail before ever exceeding the driver's capture
    window (should never trigger at 32 headliners — test-pinned)."""
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "errors": {k: v[:80] for k, v in errors.items()},
    }
    if steal:
        payload["steal"] = steal
    if noisy:
        payload["noisy"] = sorted(noisy)
    line = json.dumps(payload)
    if len(line) > 1900 and noisy:  # shrink the flag list before data
        payload["noisy"] = len(noisy)
        line = json.dumps(payload)
    if len(line) > 1900:  # hard ceiling under the driver's 2000-char tail
        payload["queries_truncated"] = True
        qitems = sorted(times.items(), key=lambda kv: -kv[1])
        while len(line) > 1900 and qitems:
            qitems.pop()
            payload["queries"] = dict(qitems)
            line = json.dumps(payload)
    if len(line) > 1900:  # still fat: a mass-error run — keep names only
        payload["errors"] = sorted(errors)[:16]
        line = json.dumps(payload)
    return line


if __name__ == "__main__":
    main()
