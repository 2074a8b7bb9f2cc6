"""Prototype: does a DuckDB oracle reproduce text_lm_ppl exactly?

Driver-style compare: run Spark query + DuckDB SQL on the same sf dir,
sort columns by name and rows by value, compare every cell.

Cross-engine determinism notes (why this SQL looks the way it does):
- ``printf('%.Nf', x)`` instead of ``round(x, N)``: DuckDB's round on
  DOUBLE scales by 10^N (a lossy multiply) before rounding, which can
  flip a value sitting within 1 ulp of a .5 boundary; printf ({fmt})
  rounds the EXACT binary value — the same semantics as Spark's
  BigDecimal-based round, up to ties that require an exactly
  representable midpoint (measure-zero).
- The decimal per-token sum makes the aggregate order-independent, and
  cast-to-double-then-divide is one IEEE division of identical
  operands on both engines.
"""
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

TOK = r"list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')"

ORACLE = f"""
WITH ref_tok AS (
  SELECT unnest({TOK}) AS token FROM documents WHERE doc_id % 2 = 0
),
counts AS (SELECT token, COUNT(*) AS c FROM ref_tok GROUP BY token),
tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) + (LEAST(COUNT(*), 2000) + 1) AS denom
  FROM counts
),
model AS (
  SELECT token, ln((c + 1.0) / (SELECT denom FROM tot)) AS logp
  FROM counts ORDER BY c DESC, token ASC LIMIT 2000
),
dt AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE t END AS t
  FROM (SELECT doc_id, {TOK} AS t FROM documents)
),
tok AS (SELECT doc_id, unnest(t) AS token FROM dt),
lp AS (
  SELECT doc_id, token,
         CAST(CAST(COALESCE(m.logp, (SELECT ln(1.0 / denom) FROM tot))
                   AS VARCHAR)
              AS DECIMAL(28,9)) AS lp
  FROM tok LEFT JOIN model m USING (token)
),
agg AS (
  SELECT doc_id, COUNT(token) AS n_tok,
         SUM(CASE WHEN token IS NOT NULL THEN lp END) AS s
  FROM lp GROUP BY doc_id
),
fin AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         CASE WHEN n_tok > 0
              THEN CAST(CAST(CAST(CAST(s AS DOUBLE) / n_tok AS VARCHAR)
                             AS DECIMAL(38,9)) AS DOUBLE)
         END AS avg_logp,
         CASE WHEN n_tok > 0
              THEN CAST(CAST(CAST(exp(-(CAST(s AS DOUBLE) / n_tok))
                                  AS VARCHAR) AS DECIMAL(38,6)) AS DOUBLE)
         END AS ppl
  FROM agg
)
SELECT doc_id, n_tok, avg_logp, ppl,
       CASE WHEN ppl <= 300.0 THEN 'head'
            WHEN ppl <= 1000.0 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM fin
"""


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    oracle = con.execute(ORACLE).fetchdf()

    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    from timesearch_spark.queries import QUERIES
    got = QUERIES["text_lm_ppl"](spark, SF).toPandas()

    cols = sorted(oracle.columns)
    assert cols == sorted(got.columns), (cols, sorted(got.columns))
    o = oracle[cols].sort_values(cols).reset_index(drop=True)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    print("rows:", len(o), len(g))
    assert len(o) == len(g)
    bad = 0
    for c in cols:
        ov, gv = o[c], g[c]
        for i in range(len(o)):
            a, b = ov.iloc[i], gv.iloc[i]
            if (a is None or a != a) and (b is None or b != b):
                continue
            if a != b:
                if bad < 10:
                    print("MISMATCH", c, i, repr(a), repr(b))
                bad += 1
    print("mismatches:", bad)
    spark.stop()


if __name__ == "__main__":
    main()
