"""Similarity-search tests: exact vs BLAS parity, LSH recall."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from timesearch_spark.operators import similarity as sim


def _emb(spark, n=60, dim=16):
    # deterministic unit-ish vectors with planted near-dup pairs
    rows = []
    for i in range(1, n + 1):  # start at 1: i=0 would be the zero vector
        v = [math.sin(0.1 * i * (j + 1)) for j in range(dim)]
        rows.append((i, v))
        if i % 10 == 0:  # planted near-duplicate: tiny perturbation
            rows.append((i + 1000, [x + 1e-4 for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_blas_matches_exact_pairs(spark):
    emb = _emb(spark)
    exact = {
        (r["a"], r["b"]): r["cos"]
        for r in sim.embedding_near_dups(emb, threshold=0.9).collect()
    }
    blas = {
        (r["a"], r["b"]): r["cos"]
        for r in sim.embedding_near_dups_blas(emb, threshold=0.9).collect()
    }
    assert set(exact) == set(blas)
    for k in exact:
        assert abs(exact[k] - blas[k]) < 1e-9


def test_blas_finds_planted_pairs(spark):
    emb = _emb(spark)
    got = {(r["a"], r["b"]) for r in
           sim.embedding_near_dups_blas(emb, threshold=0.999).collect()}
    planted = {(i, i + 1000) for i in range(10, 61, 10)}
    assert planted <= got


def test_neardup_lsh_precision_and_planted_recall(spark):
    """r14 (similarity_neardup_lsh registry entry): the bucketed
    all-pairs scale arm — candidates come only from shared
    (table, signature) buckets, then exact-cosine verification, so
    every returned pair must be a brute pair at the same threshold
    with the identical cosine (precision exact), and the planted
    near-identical pairs — which share every signature in every table —
    must all be recalled."""
    emb = _emb(spark, dim=64)
    brute = {(r["a"], r["b"]): r["cos"] for r in
             sim.embedding_near_dups(emb, threshold=0.999).collect()}
    lsh = {(r["a"], r["b"]): r["cos"] for r in
           sim.embedding_near_dups_lsh(emb, threshold=0.999).collect()}
    assert set(lsh) <= set(brute)
    for k in lsh:
        assert abs(lsh[k] - brute[k]) < 1e-9
    planted = {(i, i + 1000) for i in range(10, 61, 10)}
    assert planted <= set(lsh)

    # bits="auto" (the scale mode the registry entry runs): same
    # precision/recall contract — near-identical pairs collide in every
    # table at ANY signature width, and verification keeps precision
    # exact — with (bits, tables) derived from the density rule
    auto = {(r["a"], r["b"]): r["cos"] for r in
            sim.embedding_near_dups_lsh(
                emb, threshold=0.999, bits="auto").collect()}
    assert set(auto) <= set(brute)
    assert planted <= set(auto)
    # the derivation: constant occupancy, recall-pinned tables,
    # monotone in n
    b1, t1 = sim.neardup_lsh_params(100_000, 0.9)
    b2, t2 = sim.neardup_lsh_params(100_000_000, 0.9)
    assert b2 > b1 >= 12 and t2 >= t1 >= 2
    assert b2 - b1 == 10  # 1000x corpus = +log2(1000) bits
    assert sim.neardup_lsh_params(2_000, 0.9)[0] == 12  # small-n floor

    # the registry entry runs end-to-end on the embeddings table
    import __spark_entry__ as m

    from tests.conftest import SF_SMALL

    reg = m.queries()["similarity_neardup_lsh"](spark, SF_SMALL)
    assert set(reg.columns) == {"a", "b", "cos"}
    assert all(r["cos"] >= 0.9 for r in reg.collect())


def test_neardup_lsh_candidate_gate_and_auto_tables_guard(spark):
    """r15 (VERDICT #4 + ADVICE r14): the recall-pinned LSH candidate
    floor grows ~n^1.22, so an over-bound corpus must fail LOUDLY with
    a remediation message before any job runs — and an explicit tables
    argument alongside bits='auto' must raise instead of being silently
    ignored (recall at the threshold pins the table count)."""
    import pytest

    emb = _emb(spark, dim=8)

    # explicit tables + auto bits: loud, not silent
    with pytest.raises(ValueError, match="derived from corpus size"):
        sim.embedding_near_dups_lsh(emb, bits="auto", tables=8)

    # the analytic volume the gate uses: uniform-occupancy pair count
    est = sim.expected_lsh_candidates(1_000_000, bits=12, tables=6)
    m = 1_000_000 / 4096
    assert abs(est - 6 * 4096 * m * (m - 1) / 2) < 1e-6

    # over-bound corpus (n passed, no count job needed): actionable error
    with pytest.raises(ValueError, match="max_candidates"):
        sim.embedding_near_dups_lsh(
            emb, bits="auto", n=500_000_000, max_candidates=100_000_000)
    # same n with the gate raised/disabled: parameter derivation proceeds
    # (plan construction only — not executed)
    sim.embedding_near_dups_lsh(
        emb, bits="auto", n=500_000_000, max_candidates=None)

    # in-bounds auto mode with precomputed n returns the same pairs as
    # counting (the registry entry's double-scan fix)
    n_real = emb.count()
    a = {(r["a"], r["b"]) for r in sim.embedding_near_dups_lsh(
        emb, threshold=0.999, dim=8, bits="auto").collect()}
    b = {(r["a"], r["b"]) for r in sim.embedding_near_dups_lsh(
        emb, threshold=0.999, dim=8, bits="auto", n=n_real).collect()}
    assert a == b and a


def test_blas_guard_spills_to_lsh(spark):
    """Past max_broadcast_rows the BLAS path must (a) never materialize
    the full frame on the driver and (b) return LSH results instead of
    raising.  The bounded probe is limit(max+1).toPandas() — assert it by
    spying on DataFrame.toPandas sizes."""
    emb = _emb(spark, dim=64)  # 66 rows > max_broadcast_rows=10
    cls = type(emb)  # the concrete (classic) DataFrame class
    n_total = emb.count()
    collected_sizes = []
    real_topandas = cls.toPandas

    def spy(self):
        out = real_topandas(self)
        collected_sizes.append(len(out))
        return out

    cls.toPandas = spy
    try:
        df = sim.embedding_near_dups_blas(emb, threshold=0.999, max_broadcast_rows=10)
        got = {(r["a"], r["b"]) for r in df.collect()}
    finally:
        cls.toPandas = real_topandas

    # the probe stayed bounded: no driver-side collect saw the full frame
    assert collected_sizes and max(collected_sizes) <= 11 < n_total
    # and we got the LSH result, not an exception: planted pairs surface
    planted = {(i, i + 1000) for i in range(10, 61, 10)}
    assert planted <= got


def test_topk_ivf_recall_vs_brute(spark):
    emb = _emb(spark, n=120, dim=64)
    qv = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("q"))
    brute = [r["vec_id"] for r in sim.cosine_topk(emb, qv, k=10).collect()]
    ann = [
        r["vec_id"]
        for r in sim.cosine_topk_ivf(emb, qv, k=10, n_cells=8, n_probe=3).collect()
    ]
    # probing 3/8 cells must still surface the bulk of the true top-k
    assert len(set(brute) & set(ann)) >= 6
    assert brute[0] in ann


def test_ivf_assignment_partitions_all_rows(spark):
    emb = _emb(spark, n=40, dim=16)
    cents = sim.centroid_seeds(emb, 4)
    cells = sim.assign_cells(emb, cents)
    assert cells.count() == emb.count()          # assignment is total
    cell_ids = {r["cell"] for r in cells.select("cell").distinct().collect()}
    assert cell_ids <= {cid for cid, _ in cents}  # every cell is a seed id
    # each seed lands in its own cell (cos(seed, seed) = 1 is the max)
    own = cells.filter(F.col("vec_id").isin([c for c, _ in cents]))
    assert all(r["vec_id"] == r["cell"] for r in own.collect())


def test_topk_lsh_recall_vs_brute(spark):
    emb = _emb(spark, n=120, dim=64)
    qv = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("q"))
    brute = [r["vec_id"] for r in sim.cosine_topk(emb, qv, k=10).collect()]
    # recall/cost knob: fewer bits per table + more tables = higher recall
    # (collision prob 1-(1-(1-θ/π)^bits)^tables)
    ann = [
        r["vec_id"]
        for r in sim.cosine_topk_lsh(emb, qv, k=10, dim=64, bits=4, tables=16).collect()
    ]
    assert len(set(brute) & set(ann)) >= 6
    # and the true nearest item (the query itself) is always found
    assert brute[0] in ann


def test_embedding_dedup_clusters_groups_planted_dups(spark):
    import math

    # three exact-duplicate groups + isolated vectors; clustering must
    # put each dup group under its min id, transitively
    base = []
    for i in range(30):
        v = [math.sin(i * 7.3 + d) for d in range(16)]
        base.append((i, v))
    dups = [(100 + i, base[i][1]) for i in range(0, 6, 2)]  # copies of 0,2,4
    df = spark.createDataFrame(base + dups, "vec_id long, embedding array<double>")

    from timesearch_spark.operators.similarity import embedding_dedup_clusters

    out = {r["vec_id"]: r for r in embedding_dedup_clusters(
        df, threshold=0.999, method="exact"
    ).collect()}
    for i in (0, 2, 4):
        assert out[100 + i]["cluster_id"] == out[i]["cluster_id"] == i
        assert not out[100 + i]["is_keeper"] and out[i]["is_keeper"]
    assert len(out) == 33


def test_quantize_embeddings_error_bound(spark):
    from pyspark.sql import functions as F

    emb = _emb(spark, dim=64)
    qz = sim.quantize_embeddings(emb)
    joined = emb.join(qz, on="vec_id").select(
        "vec_id",
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("q"),
                lambda v, q: F.abs(v - q.cast("double") * F.col("scale")),
            )
        ).alias("max_err"),
        "scale",
    )
    rows = joined.collect()
    # symmetric rounding: reconstruction error <= scale/2 per component
    assert all(r["max_err"] <= r["scale"] / 2 + 1e-12 for r in rows)


def test_quantized_topk_recall(spark):
    emb = _emb(spark, dim=64)
    qv = emb.limit(1).select(F.col("embedding").alias("q"))
    exact = [r["vec_id"] for r in sim.cosine_topk(emb, qv, k=10).collect()]
    quant = [r["vec_id"] for r in sim.cosine_topk_quantized(emb, qv, k=10).collect()]
    # int8 rounding noise may reorder near-ties but must keep the set
    assert len(set(exact) & set(quant)) >= 8
    assert quant[0] == exact[0]  # the self-match survives quantization


def test_topk_batch_matches_single_query_path(spark):
    """cosine_topk_batch must return, for every query, exactly the rows
    cosine_topk returns for that query alone — same ids, same cos values
    (the fold-order numpy math is bit-identical to the JVM expression)."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id").isin(3, 17, 42)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")
    )
    batch = {
        (r["qid"], r["rn"]): (r["vec_id"], r["cos"])
        for r in sim.cosine_topk_batch(emb, queries, k=5).collect()
    }
    assert len(batch) == 15
    for qid in (3, 17, 42):
        qv = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("q")
        )
        single = sim.cosine_topk(emb, qv, k=5).collect()
        for rn, row in enumerate(single, start=1):
            got_id, got_cos = batch[(qid, rn)]
            assert got_id == row["vec_id"], (qid, rn)
            assert got_cos == row["cos"], (qid, rn)  # bit-identical, no tol


def test_topk_batch_empty_queries(spark):
    emb = _emb(spark)
    out = sim.cosine_topk_batch(emb, emb.filter("vec_id < 0").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")), k=5)
    assert out.count() == 0


def test_topk_ivf_batch_exact_when_probing_all_cells(spark):
    """n_probe = n_cells disables pruning: results must equal the exact
    batch path row-for-row (same ids, bit-identical cos)."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id").isin(5, 23)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")
    )
    exact = {(r["qid"], r["rn"]): (r["vec_id"], r["cos"])
             for r in sim.cosine_topk_batch(emb, queries, k=5).collect()}
    ivf = {(r["qid"], r["rn"]): (r["vec_id"], r["cos"])
           for r in sim.cosine_topk_ivf_batch(
               emb, queries, k=5, n_cells=8, n_probe=8).collect()}
    assert ivf == exact


def test_topk_ivf_batch_recall_under_pruning(spark):
    """Pruned probes keep most of the true top-k per query (the toy
    lowest-id quantizer is weak, so this bounds recall, not exactness —
    the n_probe=n_cells case above pins exact equality)."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id").isin(5, 23)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")
    )
    exact = sim.cosine_topk_batch(emb, queries, k=5).collect()
    ivf = sim.cosine_topk_ivf_batch(emb, queries, k=5, n_cells=8, n_probe=6).collect()
    for qid in (5, 23):
        truth = {r["vec_id"] for r in exact if r["qid"] == qid}
        got = {r["vec_id"] for r in ivf if r["qid"] == qid}
        assert len(got & truth) >= 4, (qid, got, truth)


def test_ivf_honors_preassigned_cells(spark):
    """A stored `cell` column (cell-partitioned production layout) is used
    as-is — assignment is not re-derived, and results are unchanged."""
    emb = _emb(spark)
    from timesearch_spark.operators.similarity import assign_cells, centroid_seeds

    pre = assign_cells(emb, centroid_seeds(emb, 8), "embedding")
    queries = emb.filter(F.col("vec_id").isin(5, 23)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")
    )
    base = sorted(map(tuple, sim.cosine_topk_ivf_batch(
        emb, queries, k=5, n_cells=8, n_probe=8).collect()))
    with_pre = sorted(map(tuple, sim.cosine_topk_ivf_batch(
        pre, queries, k=5, n_cells=8, n_probe=8).collect()))
    assert base == with_pre


def test_train_codebook_recovers_planted_blobs(spark):
    """k-means|| codebook lands one centroid near each well-separated
    blob, and plugs into assign_cells/cosine_topk_ivf_batch unchanged."""
    import math

    rows = []
    blobs = [(10.0, 0.0), (0.0, 10.0), (-10.0, -10.0)]
    i = 0
    for bx, by in blobs:
        for j in range(20):
            rows.append((i, [bx + math.sin(j) * 0.1, by + math.cos(j) * 0.1,
                             0.0, 0.0]))
            i += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    book = sim.train_codebook(emb, n_cells=3, seed=7)
    assert len(book) == 3 and sorted(c for c, _ in book) == [0, 1, 2]
    # every blob center is close to some learned centroid
    for bx, by in blobs:
        d = min((cx - bx) ** 2 + (cy - by) ** 2
                for _, (cx, cy, _, _) in book)
        assert d < 1.0, (bx, by, book)
    # interchangeability with the IVF machinery
    cells = sim.assign_cells(emb, book, "embedding")
    assert cells.select("cell").distinct().count() == 3
    # the trained-codebook path: pre-assigned cells + centroids= must
    # probe the SAME codebook (cell ids don't transfer) — with full
    # probes the result equals the seeds-codebook run exactly
    queries = emb.filter(F.col("vec_id").isin(0, 25)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")
    )
    trained = sorted(map(tuple, sim.cosine_topk_ivf_batch(
        cells, queries, k=5, n_cells=3, n_probe=3,
        centroids=book).collect()))
    base = sorted(map(tuple, sim.cosine_topk_ivf_batch(
        emb, queries, k=5, n_cells=3, n_probe=3).collect()))
    assert trained == base
    # pruned probe on the trained book: the query's own blob is always
    # probed, so the true nearest neighbors survive
    near = sim.cosine_topk_ivf(
        cells, emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("q")),
        k=5, n_cells=3, n_probe=1, centroids=book,
    ).collect()
    assert {r["vec_id"] for r in near} <= set(range(20))


def test_embed_documents_shapes_and_determinism(spark):
    from timesearch_spark.operators.embed import embed_documents

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = {r["vec_id"]: r["embedding"] for r in embed_documents(docs, dim=16).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1] == rows[2]                       # same text, same vector
    assert all(len(v) == 16 for v in rows.values())
    import math

    assert math.isclose(sum(x * x for x in rows[1]), 1.0, rel_tol=1e-9)  # L2=1
    assert all(x == 0.0 for x in rows[3]) and all(x == 0.0 for x in rows[4])


def test_semantic_dedup_clusters_shared_vocabulary(spark):
    from timesearch_spark.operators.embed import semantic_dedup

    doc = "the quick brown fox jumps over the lazy dog near the red barn"
    shuffled = "near the red barn the lazy dog jumps over the quick brown fox"
    docs = spark.createDataFrame(
        [(1, doc),
         (2, shuffled),    # same bag of words, different order -> cos 1.0
         (3, "entirely different vocabulary about spark shuffle planning")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           semantic_dedup(docs, threshold=0.9, method="exact").collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == 1
    assert out[1]["is_keeper"] is True and out[2]["is_keeper"] is False
    assert out[3]["cluster_id"] == 3 and out[3]["is_keeper"] is True


def test_semantic_decontaminate_flags_paraphrase_leaks(spark):
    """A leaked benchmark doc (verbatim + word-order-shuffled paraphrase
    — identical hashed-BoW, the miss case for n-gram decontamination)
    must flag, clean docs must not, and a doc leaked twice flags both
    copies (no top-k cap)."""
    from timesearch_spark.operators.embed import semantic_decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog today"
    shuffled = "dog lazy the over jumps fox brown quick the today"
    docs = spark.createDataFrame(
        [
            (1, bench_text),                       # verbatim leak
            (2, shuffled),                         # paraphrase-shaped leak
            (3, bench_text),                       # second verbatim copy
            (4, "completely unrelated words about spark and parquet files"),
            (5, None),                             # null text: never flags
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    hits = semantic_decontaminate(docs, bench, threshold=0.95)
    got = {(r["doc_id"], r["bench_id"]) for r in hits.collect()}
    assert got == {(1, 100), (2, 100), (3, 100)}
    # empty benchmark: stable empty schema
    assert semantic_decontaminate(
        docs, bench.limit(0), threshold=0.9
    ).count() == 0


def test_semantic_decontaminate_string_ids(spark):
    """Output id columns must mirror the INPUT id types (a store with
    string doc ids previously hit the hard-coded `long` schema)."""
    from timesearch_spark.operators.embed import semantic_decontaminate

    t = "the quick brown fox jumps over the lazy dog today"
    docs = spark.createDataFrame(
        [("d-1", t), ("d-2", "unrelated words about parquet files")],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame([("b-9", t)], "doc_id string, text string")
    hits = semantic_decontaminate(docs, bench, threshold=0.95)
    assert dict(hits.dtypes)["doc_id"] == "string"
    assert dict(hits.dtypes)["bench_id"] == "string"
    assert {(r["doc_id"], r["bench_id"]) for r in hits.collect()} == {
        ("d-1", "b-9")
    }
    # empty benchmark keeps the derived schema too
    empty = semantic_decontaminate(docs, bench.limit(0), threshold=0.9)
    assert dict(empty.dtypes)["doc_id"] == "string" and empty.count() == 0


def test_semantic_decontaminate_oversized_benchmark_raises(spark):
    """The benchmark side is collected + broadcast; an oversized one must
    raise the pointed swap-detection error BEFORE materializing anything,
    not OOM the driver."""
    import pytest

    from timesearch_spark.operators.embed import semantic_decontaminate

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    big_bench = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("some text").alias("text")
    )
    with pytest.raises(ValueError, match="benchmark exceeds 10 rows"):
        semantic_decontaminate(docs, big_bench, max_benchmark_rows=10)


def test_pluggable_embedding_model(spark):
    """`model` is the batch-inference seam: a caller-supplied
    list[str] -> (n, dim) encoder must flow through embed_documents,
    semantic_dedup, and semantic_decontaminate; the default (None)
    stays the hashing stand-in; a wrong-width model fails loudly."""
    import numpy as np
    import pytest

    from timesearch_spark.operators.embed import (
        embed_documents,
        semantic_decontaminate,
        semantic_dedup,
    )

    def fake_model(texts):
        # deterministic 4-dim encoder: one-hot-ish on first-char bucket
        out = np.zeros((len(texts), 4))
        for i, t in enumerate(texts):
            out[i, (ord(t[0]) if t else 0) % 4] = 1.0
        return out

    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, "avocado toast"), (3, "banana bread")],
        "doc_id long, text string",
    )
    rows = {r["vec_id"]: list(r["embedding"])
            for r in embed_documents(docs, dim=4, model=fake_model).collect()}
    assert rows[1] == rows[2] != rows[3]        # 'a'-docs collide by design
    out = {r["doc_id"]: r for r in semantic_dedup(
        docs, threshold=0.99, dim=4, method="exact", model=fake_model
    ).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"]
    assert out[3]["cluster_id"] != out[1]["cluster_id"]
    bench = spark.createDataFrame([(9, "anything")], "doc_id long, text string")
    hits = semantic_decontaminate(
        docs, bench, threshold=0.99, dim=4, model=fake_model
    )
    assert {r["doc_id"] for r in hits.collect()} == {1, 2}
    # wrong-width model: pointed shape error, not a downstream mismatch
    with pytest.raises(Exception, match="expected"):
        embed_documents(docs, dim=8, model=fake_model).collect()


def test_ivf_survives_prior_topk_collect_in_same_session(spark):
    """Regression: Spark 4.1's constraint propagation mis-binds the
    in-query cell-assignment expression across the cells⋈probe join
    (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) — but only after certain
    earlier queries executed in the same session, so single-query tests
    never saw it.  _cell_join_barrier keeps the join key underived;
    this pins the exact poisoning order: a full collect of the batched
    brute-force top-k, then an IVF collect."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_ORACLE

    qs = entrymod.queries()
    assert len(qs["similarity_topk"](spark, SF_ORACLE).collect()) > 0
    got = qs["similarity_topk_ivf"](spark, SF_ORACLE).collect()
    assert len(got) == 10
    got_b = qs["similarity_topk_ivf_batch"](spark, SF_ORACLE).collect()
    assert len(got_b) > 0


def test_ivf_barrier_survives_the_optimizer(spark, monkeypatch):
    """VERDICT r6 item 5: ``_cell_join_barrier``'s ``floor(rand(0)*0)``
    no-op is load-bearing — it stops Catalyst propagating constraints
    through the in-query cell assignment, which mis-binds the
    higher-order-function expression behind the cells⋈probed-cells join
    (order-dependent INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND, see the
    barrier's docstring).  A Spark upgrade that starts constant-folding
    the expression would silently resurrect the crash; this canary
    pins its presence in the OPTIMIZED plan, after every folding rule
    has run."""
    emb = _emb(spark, n=40, dim=16)
    qv = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("q"))

    def optimized_plan():
        out = sim.cosine_topk_ivf(emb, qv, k=5, n_cells=4, n_probe=2)
        return out._jdf.queryExecution().optimizedPlan().toString()

    assert "rand(" in optimized_plan(), (
        "the IVF constraint barrier (similarity._cell_join_barrier, "
        "floor(rand(0)*0)) was folded away by the optimizer — without a "
        "nondeterministic marker Catalyst derives join-key constraints "
        "through the cell column and the ATTRIBUTE_NOT_FOUND crash it "
        "guards against comes back; re-establish a barrier the "
        "optimizer cannot remove before trusting IVF queries"
    )

    # prove the canary detects removal: with the barrier patched out,
    # the marker must vanish from the same plan (i.e. a deleted barrier
    # line turns this test red, not silently green)
    monkeypatch.setattr(sim, "_cell_join_barrier", lambda df: df)
    assert "rand(" not in optimized_plan()


def test_blas_guard_footer_precheck_skips_probe(spark, tmp_path):
    """Round 9: a parquet-backed input whose row-preserving plan proves
    (exactly, from footers) it exceeds max_broadcast_rows must route to
    LSH WITHOUT the bounded Arrow probe — no toPandas of probe size at
    all, just a 1-row dim peek.  A filtered (unprovable) small input
    still takes the probe and the BLAS arm."""
    p = str(tmp_path / "emb.parquet")
    _emb(spark, n=60, dim=16).write.parquet(p)
    emb = spark.read.parquet(p)  # 66 rows, exact from footers

    cls = type(emb)
    sizes = []
    real_topandas = cls.toPandas

    def spy(self):
        out = real_topandas(self)
        sizes.append(len(out))
        return out

    cls.toPandas = spy
    try:
        routed = sim.embedding_near_dups_blas(
            emb, threshold=0.999, max_broadcast_rows=10
        )
        probe_sizes = list(sizes)  # gate-time toPandas calls only
        got = {(r["a"], r["b"]) for r in routed.collect()}
    finally:
        cls.toPandas = real_topandas
    assert probe_sizes == [], f"probe ran despite exact footer count: {probe_sizes}"
    planted = {(i, i + 1000) for i in range(10, 61, 10)}
    assert planted <= got

    # filtered input: footer count is only a ceiling -> probe runs,
    # BLAS arm keeps exact semantics
    # 13 rows <= gate (the planted near-dup 1010 must survive the filter)
    small = emb.filter((F.col("vec_id") <= 12) | (F.col("vec_id") == 1010))
    cls.toPandas = spy
    sizes.clear()
    try:
        exact_pairs = {
            (r["a"], r["b"])
            for r in sim.embedding_near_dups_blas(
                small, threshold=0.999, max_broadcast_rows=20
            ).collect()
        }
    finally:
        cls.toPandas = real_topandas
    assert sizes and max(sizes) <= 21  # bounded probe, BLAS arm
    assert exact_pairs == {(10, 1010)}
