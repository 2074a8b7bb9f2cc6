"""Document embedding (engine extension): text → fixed-width vectors.

Production embeds with a model server or an in-process encoder; this
container has neither, so the featurizer is the classic HASHING TRICK —
each token hashes to (index, sign) in a ``dim``-wide space, vectors are
L2-normalized counts.  Deterministic, order-insensitive, and honestly a
real (if dated) featurizer: hashing vectorizers power plenty of
large-scale dedup/classification pipelines, and cosine over them is a
usable lexical-overlap similarity.  Swapping in a model is the same
one-function change the multimodal decoder documents: the mapInPandas
batch loop, output schema, and every downstream operator
(similarity.*, embedding_dedup_clusters) stay as they are.

Scale shape: one Arrow-batched map stage, no shuffle; vectors are
float64 so downstream fold-order cosine stays bit-identical to the
oracle's list_* math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_embed_matrix(texts, dim):
    """list[str|None] → (n, dim) float64 L2-normalized hashed-BoW."""
    import hashlib

    import numpy as np

    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        for tok in t.lower().split():
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
            )
            idx = h % dim
            sign = 1.0 if (h >> 63) & 1 == 0 else -1.0
            out[i, idx] += sign
    norms = np.sqrt((out * out).sum(axis=1))
    nz = norms > 0
    out[nz] = out[nz] / norms[nz, None]
    return out


def embed_documents(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id → vec_id, embedding array<double>): hashed-BoW embeddings,
    ready for every operator in ``similarity`` (top-k, ANN, near-dup
    clustering).  Empty/NULL text embeds to the zero vector (cosine
    treats it as NULL downstream)."""
    from timesearch_spark.tables import spread

    def batch_embed(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            M = _hash_embed_matrix(list(pdf[text_col]), dim)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col], "embedding": list(map(list, M))}
            )

    return (
        spread(docs)
        .select(F.col(id_col).alias(id_col), F.col(text_col).alias(text_col))
        .mapInPandas(batch_embed, "vec_id long, embedding array<double>")
    )


def semantic_dedup(
    docs: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "lsh",
) -> DataFrame:
    """Text in, semantic near-dup clusters out: embed (hashing trick →
    swap in a model for true semantics) then cluster in embedding space
    (similarity.embedding_dedup_clusters — LSH-bucketed pairs, hash-min
    components over the edge subgraph).  Output: (doc_id, cluster_id,
    is_keeper).  Complements the token-level ladder: minhash catches
    edits, embedding-cosine catches paraphrase-shaped similarity a
    shingle set misses."""
    from timesearch_spark.operators.similarity import embedding_dedup_clusters

    emb = embed_documents(docs, dim, text_col, id_col)
    out = embedding_dedup_clusters(emb, threshold=threshold, method=method)
    return out.select(
        F.col("vec_id").alias(id_col), "cluster_id", "is_keeper"
    )


def semantic_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Embedding-space contamination check: every corpus document whose
    cosine against ANY benchmark document reaches ``threshold`` — the
    semantic sibling of ``pipeline.decontaminate`` (n-gram overlap
    misses paraphrased leaks; embedding cosine catches them).

    Plan shape mirrors the gram version's broadcast contract: the
    benchmark embeds into one driver-side matrix (benchmarks are MBs,
    corpora are TBs — the same boundedness assumption), every corpus
    Arrow batch scores all benchmark rows with fold-order float64 math
    (bit-identical to similarity's oracle arithmetic) and emits ONLY
    the pairs at/above threshold.  One corpus scan, no shuffle, no
    top-k cap — a benchmark doc leaked a thousand times flags all
    thousand copies (cosine_topk_batch would cap at k).

    Returns (``id_col``, bench_id, cos) hit pairs; anti-join the ids to
    drop contaminated documents."""
    import numpy as np

    from timesearch_spark.operators.similarity import (
        _fold_dot,
        _round6,
        batch_cosines,
        query_matrix_state,
    )

    # the benchmark embeds DRIVER-side: it is being collected into the
    # broadcast matrix anyway, so a Spark embed job just to collect its
    # output would be pure overhead (the nested-job shape r5 removed
    # from cosine_topk_lsh)
    brows = benchmark.select(F.col(id_col), F.col(text_col)).collect()
    if not brows:
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} long, bench_id long, cos double"
        )
    Bm = _hash_embed_matrix([r[text_col] for r in brows], dim)
    Qm, qids, qnorm = query_matrix_state(
        [(r[id_col], list(Bm[i])) for i, r in enumerate(brows)]
    )
    corpus_emb = embed_documents(docs, dim, text_col, id_col)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(list(pdf["embedding"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            vnorm = np.sqrt(_fold_dot(V * V, np.ones(V.shape[1])))
            out_ids, out_bench, out_cos = [], [], []
            for m in range(len(qids)):
                cos = batch_cosines(V, vnorm, Qm, qnorm, m)
                hit = np.nan_to_num(cos, nan=-2.0) >= threshold - 1e-9
                if hit.any():
                    out_ids.extend(ids[hit])
                    out_bench.extend([qids[m]] * int(hit.sum()))
                    out_cos.extend(_round6(float(c)) for c in cos[hit])
            yield pd.DataFrame(
                {id_col: out_ids, "bench_id": out_bench, "cos": out_cos}
            )

    return corpus_emb.mapInPandas(
        score, f"{id_col} long, bench_id long, cos double"
    )
