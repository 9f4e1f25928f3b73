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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means buckets + nprobe search
# ---------------------------------------------------------------------------


def _kmeans_cosine(vecs: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Driver-side spherical k-means (deterministic): unit-normalize,
    seed centroids from evenly spaced sample points, Lloyd iterations
    with cosine (= dot on unit vectors) assignment."""
    v = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = v[rng.choice(len(v), size=k, replace=False)]
    for _ in range(iters):
        assign = (v @ cent.T).argmax(axis=1)
        for j in range(k):
            members = v[assign == j]
            if len(members):
                m = members.sum(axis=0)
                cent[j] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    sample_n: int = 4096,
    iters: int = 10,
    seed: int = 42,
):
    """Build an IVF index: spherical k-means centroids trained on a
    deterministic sample (driver-side numpy — centroids are k x dim,
    tiny), then every row assigned to its nearest-centroid bucket by a
    vectorized pandas UDF (one matmul per Arrow batch).

    Returns (indexed_df with __ivf_bucket, centroids). At 10^12 rows the
    assignment is a single scan; write the indexed table partitioned by
    __ivf_bucket so a query's nprobe buckets prune to a few partitions.
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_n).collect()], dtype=np.float64
    )
    cent = _kmeans_cosine(sample, k, iters, seed)
    b_cent = df.sparkSession.sparkContext.broadcast(cent)
    out_schema = StructType(
        list(df.schema.fields) + [StructField("__ivf_bucket", IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            pdf["__ivf_bucket"] = (m @ b_cent.value.T).argmax(axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(assign, schema=out_schema), cent


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k via IVF: rank centroids by cosine to the query, scan
    only the `nprobe` nearest buckets, exact cosine re-rank within.
    The bucket filter is a pushdown-friendly IN-list predicate; on a
    bucket-partitioned table it prunes to nprobe partitions."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = (centroids @ qn).argsort()[::-1][:nprobe]
    probes = [int(b) for b in order]
    candidates = indexed.filter(F.col("__ivf_bucket").isin(probes))
    return brute_force_topk(candidates, query, k, vec_col, id_col)
