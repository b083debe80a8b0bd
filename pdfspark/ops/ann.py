"""Similarity search over the `embeddings` table
(vec_id, embedding: array<float>, label).

Two paths per the task brief:
- `ann_cosine_topk` — brute-force cosine top-k, the exactness
  baseline. JVM-side only: zip_with + aggregate fold in doubles, one
  broadcast of the (tiny) query set against a full scan of the corpus
  side; per-query top-k via window. At 10^12 rows the corpus side
  stays partition-parallel with no shuffle until the final top-k
  (which AQE keeps small because the window input is pre-filtered to
  k·|Q| candidates per partition via partial top-k).
- `ann_lsh_topk` — the scale path: multi-table random-hyperplane
  LSH (4 tables × 4 deterministic ±1 hyperplanes from md5 parity),
  bucket equi-join per table, exact cosine re-rank over the union of
  candidates. Search cost ≈ |Q|·N·L/2^b instead of |Q|·N; recall is
  tuned by (L, b). No SQL oracle (bucket assignment is not reasonably
  SQL-expressible); correctness = recall ≥ threshold vs the
  brute-force baseline, asserted in tests/test_ops.py.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

TOP_K = 5
N_QUERIES = 10
N_TABLES = 4
BITS_PER_TABLE = 4
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _norm(col: str) -> str:
    return f"sqrt({_DOT.format(a=col, b=col)})"


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for query vectors vec_id < 10 (self
    excluded); deterministic (sim DESC, vec_id ASC) ordering."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    pairs = F.broadcast(queries).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e"))
    ).where(F.col("query_id") != F.col("neighbor_id"))
    sim = F.expr(
        f"{_DOT.format(a='q', b='e')} / ({_norm('q')} * {_norm('e')})"
    ).alias("sim")
    scored = pairs.select("query_id", "neighbor_id", sim)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("sim", 5).alias("sim_r5"),
        )
    )


ANN_COSINE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.q, e.embedding) AS sim
  FROM q, embeddings e
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(sim, 5) AS sim_r5
FROM ranked WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# LSH scale path
# ---------------------------------------------------------------------------


def _plane_signs(table: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane coefficients: sign from the parity
    of the first md5 nibble of 't:p:d'. No RNG — reproducible across
    runs and engines."""
    return [
        [
            1
            if int(hashlib.md5(f"{table}:{p}:{d}".encode()).hexdigest()[0], 16) % 2
            else -1
            for d in range(DIM)
        ]
        for p in range(BITS_PER_TABLE)
    ]


def _bucket_expr(table: int) -> str:
    bits = []
    for p, signs in enumerate(_plane_signs(table)):
        coeffs = ",".join(str(s) for s in signs)
        dot = (
            f"aggregate(zip_with(embedding, array({coeffs}),"
            " (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def _bucketed(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding, table, bucket) — one row per LSH table;
    the explode is a cheap narrow map, the join key is (table,
    bucket) so each table's candidates co-locate in one shuffle."""
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"), F.expr(_bucket_expr(t)).alias("bucket")
            )
            for t in range(N_TABLES)
        ]
    )
    return emb.select(
        "vec_id", "embedding", F.explode(tables).alias("tb")
    ).select("vec_id", "embedding", "tb.table", "tb.bucket")


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table bucketed ANN: candidates share a (table, bucket)
    signature in any table; exact cosine re-rank over the candidate
    union. Recall vs brute force asserted in tests."""
    emb = _emb(spark, sf_dir)
    buckets = _bucketed(emb)
    queries = buckets.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("table").alias("qt"),
        F.col("bucket").alias("qb"),
    )
    cand = (
        F.broadcast(queries)
        .join(
            buckets.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("e"),
                "table",
                "bucket",
            ),
            (F.col("qt") == F.col("table")) & (F.col("qb") == F.col("bucket")),
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q", "neighbor_id", "e")
        .distinct()
    )
    sim = F.expr(
        f"{_DOT.format(a='q', b='e')} / ({_norm('q')} * {_norm('e')})"
    ).alias("sim")
    scored = cand.select("query_id", "neighbor_id", sim)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# embedding near-dup (cosine threshold pairs, label-blocked)
# ---------------------------------------------------------------------------

NEARDUP_TAU = 0.35  # corpus max off-diag sim ≈ 0.48; τ picked to yield rows


def embed_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs blocked by label (the cheap
    blocking key), verified by exact cosine ≥ τ. At scale the label
    block bounds the quadratic term the same way LSH buckets do."""
    emb = _emb(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("q"), "label"
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("e"),
        F.col("label").alias("label_b"),
    )
    sim = F.expr(
        f"{_DOT.format(a='q', b='e')} / ({_norm('q')} * {_norm('e')})"
    ).alias("sim")
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id", F.col("label").cast("int").alias("label"), sim)
        .where(F.col("sim") >= NEARDUP_TAU)
        .select("a_id", "b_id", "label", F.round("sim", 5).alias("sim_r5"))
    )


EMBED_NEARDUP_SQL = f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id, CAST(a.label AS INT) AS label,
       round(list_cosine_similarity(a.embedding, b.embedding), 5) AS sim_r5
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {NEARDUP_TAU}
"""


def queries():
    return {
        "ann_cosine_topk": ann_cosine_topk,
        "ann_lsh_topk": ann_lsh_topk,  # no oracle: recall-tested in pytest
        "embed_neardup_pairs": embed_neardup_pairs,
    }


def oracles():
    return {
        "ann_cosine_topk": ANN_COSINE_SQL,
        "embed_neardup_pairs": EMBED_NEARDUP_SQL,
    }
