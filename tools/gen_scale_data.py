"""Scale-up generator: replicate an existing sf directory K-fold with
consistent key offsets, for scaling (not correctness) runs.

``python tools/gen_scale_data.py SRC_DIR OUT_DIR K`` writes K logical
copies of every table.  Copy i shifts each join key by ``i * offset``
(offset = max key rounded up to a power of 10), so joins resolve only
within a copy: per-key group sizes, join fan-outs, and skew shape are
preserved exactly while total volume scales by K — the property a
scaling probe needs (a superlinear plan shows up as a >K time ratio).

Documents get a per-copy token mutation (2 of every 3 whitespace
tokens are prefixed with the copy tag) chosen against the engine's own
text operators:

- cross-copy TOKEN-set Jaccard drops to (1/3)/(5/3) = 0.2 — safely
  under the 0.5 threshold the n=1 Jaccard query runs at — and every
  3-word shingle contains ≥1 mutated position, so neither
  MinHash/shingle nor token-set near-dup pairs form ACROSS copies.
  (Replicating text verbatim, or mutating only 1/3 of tokens, leaves
  cross-copy similarity at/above threshold: every doc then gains K-1
  genuine partners and the OUTPUT is quadratic in K — a 119×-at-10×
  ratio that is an artifact of replication, not of the plan under
  test.  All-pairs-over-threshold semantics are inherently quadratic
  in duplicate-group size; the probe must keep group sizes fixed.);
- the mutated tokens are copy-unique and rarer than any shared token,
  so they dominate the PPJoin prefix and shared-token candidate pairs
  stay linear too;
- language-ID is an argmax over per-language stopword hits; the
  mutation removes ~2/3 of hits UNIFORMLY across languages, so the
  argmax (and the curate ladder's language gate) is unchanged;
- identical lines mutate identically, so exact-dup groups, repeated
  paragraphs, and dup_line_frac survive within each copy.

KNOWN, BOUNDED overshoot (r12 probe, tools/diag_jaccard.py): a word
occurring at BOTH a mutated and an unmutated position inside one doc
splits into two distinct tokens, so mutated copies carry MORE distinct
tokens per doc than copy 0 — measured 1.37× at k=10 (23.2 → 31.8
postings/doc), which flows through the Jaccard pipeline as postings
13.7×, prefix-join volume 11.8×, deduped candidates 8.8×, final pairs
4.1× at 10× docs.  The dedup_ngram_jaccard wall ratio therefore reads
~8-10× even though the OPERATOR is linear in its input rows — the
inflation is the generator's, and it SATURATES at 2× (each distinct
word maps to at most {word, z{i}q+word} per copy), so no k makes it
superlinear.  Read Jaccard-family ratios against the posting ratio,
not the doc ratio.

Copy 0 is byte-identical to the source.  Embeddings replicate with
shifted ids and unchanged vectors (ANN bucket sizes scale linearly;
identical vectors across copies only add linear candidate volume).

Everything is deterministic; no RNG anywhere.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: table → columns shifted by the per-copy offset of the named key space.
#: Key spaces (not columns) get offsets, so l_orderkey and o_orderkey
#: shift identically and the join still resolves.
KEYSPACES: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "part": [("p_partkey", "partkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [
        ("l_orderkey", "orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ],
    "events": [("event_id", "eventid"), ("user_id", "userid")],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
}

#: tiny dimensions shared by every copy (nationkey/regionkey spaces are
#: fixed vocabularies, like enum columns)
SHARED_DIMS = ["region", "nation"]


def _pow10_at_least(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def keyspace_offsets(spark: SparkSession, src: str) -> dict[str, int]:
    """One offset per key space: a power of 10 strictly above the max id
    observed in ANY column of that space."""
    maxes: dict[str, int] = {}
    for table, cols in KEYSPACES.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        row = df.agg(
            *[F.max(c).alias(c) for c, _space in cols]
        ).first()
        for c, space in cols:
            v = row[c] or 0
            maxes[space] = max(maxes.get(space, 0), int(v))
    return {space: _pow10_at_least(mx) for space, mx in maxes.items()}


def mutate_text(col, copy_idx: int):
    """Prefix 2 of every 3 whitespace tokens with the copy tag (copy 0:
    identity).  See module docstring for why this exact shape."""
    if copy_idx == 0:
        return col
    toks = F.split(col, r"\s+")
    tag = F.lit(f"z{copy_idx}q")
    mut = F.transform(
        toks,
        lambda x, i: F.when(i % 3 != 0, F.concat(tag, x)).otherwise(x),
    )
    return F.array_join(mut, " ")


def mutate_embedding(col, copy_idx: int, dim: int, dtype: str):
    """Per-copy deterministic sign-flip rotation (a diagonal orthogonal
    transform, r14): within-copy geometry is preserved EXACTLY — every
    pair (s∘u, s∘v) has the same inner product and norms as (u, v),
    and negation is exact in IEEE floats — while cross-copy cosine
    cos(v, s∘v) = Σ sⱼvⱼ²/|v|² collapses toward 0 (~half the
    components flip).  Without this, embeddings replicated VERBATIM
    give every vector K−1 identical cross-copy twins at cosine 1.0 and
    every all-pairs-over-threshold output (similarity_neardup_*) grows
    quadratically in K — the same replication artifact mutate_text
    exists to prevent for the text family.  Copy 0 is the identity."""
    if copy_idx == 0:
        return col
    import random

    rng = random.Random(copy_idx)
    signs = [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
    return F.zip_with(
        col, F.array(*[F.lit(s) for s in signs]), lambda a, b: a * b
    ).cast(dtype)


def replicate_table(
    spark: SparkSession, src: str, table: str, k: int, offsets: dict[str, int]
) -> DataFrame:
    df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
    emb_dim = None
    if table == "embeddings":
        row = df.select("embedding").first()
        emb_dim = len(row["embedding"]) if row else 0
    copies = []
    for i in range(k):
        c = df
        for col, space in KEYSPACES.get(table, []):
            dtype = dict(df.dtypes)[col]
            c = c.withColumn(
                col, (F.col(col) + F.lit(i * offsets[space])).cast(dtype)
            )
        if table == "documents":
            c = c.withColumn("text", mutate_text(F.col("text"), i))
            if "n_chars" in c.columns:
                c = c.withColumn(
                    "n_chars", F.length(F.coalesce("text", F.lit(""))).cast("long")
                )
        if table == "embeddings" and emb_dim:
            c = c.withColumn(
                "embedding",
                mutate_embedding(F.col("embedding"), i, emb_dim,
                                 dict(df.dtypes)["embedding"]),
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from timesearch_spark.session import get_spark

    spark = get_spark("gen-scale-data")
    os.makedirs(dst, exist_ok=True)
    offsets = keyspace_offsets(spark, src)
    print("keyspace offsets:", offsets)
    for table in SHARED_DIMS:
        spark.read.parquet(os.path.join(src, f"{table}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: copied")
    for table in KEYSPACES:
        out = replicate_table(spark, src, table, k, offsets)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
        n = spark.read.parquet(os.path.join(dst, f"{table}.parquet")).count()
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
