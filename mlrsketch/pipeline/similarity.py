"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k via JVM-side F.zip_with /
  F.aggregate dot products against a broadcast query vector — the
  correctness baseline.
- lsh_topk: random-hyperplane LSH (Charikar 2002) bucketing as the
  scale path: candidates share >= 1 of `n_tables` sign-pattern buckets,
  exact cosine re-rank within candidates only. At 10^12 rows the
  bucket join replaces the full scan; hyperplanes are a broadcast
  literal matrix.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine_col(vec_col: str, query: list[float]):
    """Cosine similarity of an array column against a literal query —
    whole-stage-codegen'd, no UDF."""
    q = F.array(*[F.lit(float(v)) for v in query])
    qn = float(np.linalg.norm(query))
    return _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))


def brute_force_topk(
    df: DataFrame, query: list[float], k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k: full scan + global top-k (orderBy + limit —
    Spark executes this as a TakeOrdered, not a full sort)."""
    return (
        df.select(id_col, F.round(cosine_col(vec_col, query), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_tables: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, bits, dim))


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_tables: int = 8,
    bits: int = 12,
    seed: int = 42,
) -> DataFrame:
    """ANN cosine top-k via random-hyperplane LSH.

    Each vector gets n_tables bucket ids (sign pattern of `bits`
    hyperplane dot products, folded to an int). Rows sharing the query's
    bucket in ANY table are candidates; exact cosine re-ranks them.
    Recall grows with n_tables; cost ~ n_candidates ≪ n_rows.
    """
    dim = len(query)
    planes = _hyperplanes(dim, n_tables, bits, seed)

    def bucket_expr(table: int):
        acc = F.lit(0).cast("long")
        for b in range(bits):
            plane = F.array(*[F.lit(float(v)) for v in planes[table, b]])
            bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
            acc = acc.bitwiseOR(F.shiftleft(bit, b))
        return acc

    q_buckets = []
    qv = np.asarray(query)
    for t in range(n_tables):
        signs = (planes[t] @ qv > 0).astype(np.int64)
        q_buckets.append(int((signs << np.arange(bits)).sum()))

    cond = F.lit(False)
    for t, qb in enumerate(q_buckets):
        cond = cond | (bucket_expr(t) == qb)
    candidates = df.filter(cond)
    return brute_force_topk(candidates, query, k, vec_col, id_col)
