"""Miller-verb-shaped APPROXIMATE verbs — the sketch-backed scale path.

Each verb mirrors an exact verb in mlrsketch.verbs.exact (and hence a
Miller verb) but returns bounded-state estimates suitable for 10^12-row
inputs, with the sketch's published error bound attached:

  count_distinct_hll   ~ `mlr count-distinct` / stats1 distinct_count
                         (reference: pkg/transformers/uniq.go:27)
  quantiles_tdigest /
  quantiles_kll        ~ `mlr stats1 -a median,p10,...`
                         (pkg/transformers/utils/percentile_keeper.go)
  most_frequent_cms    ~ `mlr most-frequent`
                         (pkg/transformers/most_or_least_frequent.go:28)
  seen_bloom / bloom_dedup
                       ~ `mlr uniq -a` membership
                         (pkg/transformers/uniq.go:391-425)
  ewma_pandas          ~ `mlr step -a ewma` (pkg/transformers/step.go:647)

All run the two-level partial/final plan in mlrsketch.agg: per-partition
Arrow-batched partials, associative merge, single KB-scale shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mlrsketch.agg import STATE_COL, SketchSpec, partial_states, sketch_aggregate
from mlrsketch.sketches import (
    KLL,
    BloomFilter,
    HyperLogLog,
    TDigest,
    ThetaSketch,
    TopKSketch,
    theta_a_not_b,
    theta_intersect,
    theta_union,
)


def _by_fields(df: DataFrame, by: Sequence[str]):
    return [df.schema[c] for c in by]


# ---------------------------------------------------------------------------
# distinct count (HLL++)
# ---------------------------------------------------------------------------


def count_distinct_hll(
    df: DataFrame, of: str, by: Sequence[str] = (), p: int = 14, salted: bool = False
) -> DataFrame:
    """Approximate `count-distinct -f of [-g by]`; ±1.04/sqrt(2^p) stderr.

    Output: by..., distinct_count_est:double, error_bound:double.
    """
    spec = SketchSpec(
        make=lambda: HyperLogLog(p=p),
        update=lambda sk, pdf: sk.update_hashes(pdf["__h"].to_numpy(dtype=np.int64)),
        finalize=lambda sk: pd.DataFrame(
            {
                "distinct_count_est": [sk.estimate()],
                "error_bound": [sk.error_bound()],
            }
        ),
        deserialize=HyperLogLog.deserialize,
    )
    schema = StructType(
        list(_by_fields(df, by))
        + [
            StructField("distinct_count_est", DoubleType()),
            StructField("error_bound", DoubleType()),
        ]
    )
    return sketch_aggregate(df, of, spec, by=by, out_schema=schema, salted=salted)


# ---------------------------------------------------------------------------
# distinct count + set operations (theta / KMV)
# ---------------------------------------------------------------------------


def _theta_spec(k: int) -> SketchSpec:
    return SketchSpec(
        make=lambda: ThetaSketch(k=k),
        update=lambda sk, pdf: sk.update_hashes(pdf["__h"].to_numpy(dtype=np.int64)),
        finalize=lambda sk: pd.DataFrame(
            {
                "distinct_count_est": [sk.estimate()],
                "error_bound": [sk.error_bound()],
            }
        ),
        deserialize=ThetaSketch.deserialize,
    )


def count_distinct_theta(
    df: DataFrame, of: str, by: Sequence[str] = (), k: int = 4096, salted: bool = False
) -> DataFrame:
    """Approximate `count-distinct -f of [-g by]` via a theta/KMV sketch.

    Same query shape as count_distinct_hll but the state supports set
    algebra (see theta_set_ops); error_bound is 0 while the group has
    fewer than k distinct values (exact mode), else ~1/sqrt(k-1).
    """
    schema = StructType(
        list(_by_fields(df, by))
        + [
            StructField("distinct_count_est", DoubleType()),
            StructField("error_bound", DoubleType()),
        ]
    )
    return sketch_aggregate(df, of, _theta_spec(k), by=by, out_schema=schema, salted=salted)


def theta_sketches_by_group(
    df: DataFrame, of: str, group_col: str, k: int = 4096
) -> dict:
    """One merged ThetaSketch of `of`'s distinct values per value of
    `group_col`. Distributed two-level plan: per-partition partial
    states (mapInPandas), one KB-scale shuffle of states, per-group
    merge; only the k-hash final states reach the driver."""
    spec = _theta_spec(k)
    partials = partial_states(df, of, spec, by=[group_col])

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = None
        for blob in pdf[STATE_COL]:
            sk = ThetaSketch.deserialize(bytes(blob))
            merged = sk if merged is None else merged.merge(sk)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], STATE_COL: [merged.serialize()]}
        )

    schema = StructType(
        [df.schema[group_col], StructField(STATE_COL, BinaryType(), False)]
    )
    rows = partials.groupBy(group_col).applyInPandas(merge_group, schema=schema).collect()
    return {r[group_col]: ThetaSketch.deserialize(bytes(r[STATE_COL])) for r in rows}


def theta_set_ops(
    df: DataFrame, of: str, group_col: str, group_a, group_b, k: int = 4096
) -> DataFrame:
    """Distinct-set algebra between two groups' values of `of`:
    union / intersection / difference cardinalities + Jaccard, each a
    theta-sketch estimate with its published error bound.

    The crawl-overlap query: "how many distinct URLs does crawl A share
    with crawl B?" — Miller can only answer by materializing both
    distinct sets (pkg/transformers/count_distinct.go keeps every
    distinct value in an ordered map); the theta algebra answers from
    two O(k) states. At test scale (distinct < k) theta stays 1 and
    every number is EXACT, which is what the DuckDB oracle checks.

    Output (one row): union_est, intersect_est, a_not_b_est,
    b_not_a_est, jaccard_est, error_bound.
    """
    pair = df.filter(F.col(group_col).isin([group_a, group_b]))
    sketches = theta_sketches_by_group(pair, of, group_col, k=k)
    ska = sketches.get(group_a, ThetaSketch(k=k))
    skb = sketches.get(group_b, ThetaSketch(k=k))
    un = theta_union(ska, skb)
    inter = theta_intersect(ska, skb)
    only_a = theta_a_not_b(ska, skb)
    only_b = theta_a_not_b(skb, ska)
    u_est = un.estimate()
    out = pd.DataFrame(
        {
            "union_est": [u_est],
            "intersect_est": [inter.estimate()],
            "a_not_b_est": [only_a.estimate()],
            "b_not_a_est": [only_b.estimate()],
            "jaccard_est": [inter.estimate() / u_est if u_est else 0.0],
            "error_bound": [max(un.error_bound(), inter.error_bound())],
        }
    )
    schema = StructType([StructField(c, DoubleType()) for c in out.columns])
    return df.sparkSession.createDataFrame(out, schema=schema)


# ---------------------------------------------------------------------------
# quantiles (t-digest / KLL)
# ---------------------------------------------------------------------------


def _quantile_spec(make_sketch, deserialize, qs: Sequence[float], bound_fn):
    def finalize(sk) -> pd.DataFrame:
        row = {f"p{str(q * 100).rstrip('0').rstrip('.').replace('.', '_')}": sk.quantile(q) for q in qs}
        row["rank_error_bound"] = bound_fn(sk)
        return pd.DataFrame([row])

    return SketchSpec(
        make=make_sketch,
        update=lambda sk, pdf: sk.update_batch(pdf["__v"].to_numpy(dtype=np.float64)),
        finalize=finalize,
        internal_cols=("__v",),
        prepare=lambda df, of: df.withColumn("__v", F.col(of).cast("double")),
        deserialize=deserialize,
    )


def _quantile_schema(df, by, qs):
    names = [f"p{str(q * 100).rstrip('0').rstrip('.').replace('.', '_')}" for q in qs]
    return StructType(
        list(_by_fields(df, by))
        + [StructField(n, DoubleType()) for n in names]
        + [StructField("rank_error_bound", DoubleType())]
    )


def quantiles_tdigest(
    df: DataFrame,
    of: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    by: Sequence[str] = (),
    delta: int = 200,
    salted: bool = False,
) -> DataFrame:
    """Approximate `stats1 -a p50,p90,... -f of -g by` via merging t-digest."""
    spec = _quantile_spec(
        lambda: TDigest(delta=delta),
        TDigest.deserialize,
        qs,
        lambda sk: sk.rank_error_bound(0.5),
    )
    return sketch_aggregate(
        df, of, spec, by=by, out_schema=_quantile_schema(df, by, qs), salted=salted
    )


def quantiles_kll(
    df: DataFrame,
    of: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    by: Sequence[str] = (),
    k: int = 200,
    salted: bool = False,
) -> DataFrame:
    """Approximate grouped quantiles via KLL (uniform rank error ~2/k)."""
    spec = _quantile_spec(
        lambda: KLL(k=k), KLL.deserialize, qs, lambda sk: sk.error_bound()
    )
    return sketch_aggregate(
        df, of, spec, by=by, out_schema=_quantile_schema(df, by, qs), salted=salted
    )


# ---------------------------------------------------------------------------
# heavy hitters (Count-Min + candidates)
# ---------------------------------------------------------------------------


def most_frequent_cms(
    df: DataFrame,
    of: str,
    k: int = 10,
    by: Sequence[str] = (),
    depth: int = 5,
    width: int = 8192,
    capacity: int = 1024,
    salted: bool = False,
) -> DataFrame:
    """Approximate `most-frequent -f of -b k [-g by]`.

    Output: by..., value:string, count_est:long — top-k per group ranked
    by CMS estimate (overcount <= e/width * N with prob 1-e^-depth).
    """

    def update(sk: TopKSketch, pdf: pd.DataFrame) -> None:
        # pre-aggregate the Arrow batch; __h is the JVM xxhash64 of the
        # value, so no string is ever hashed in Python on this path
        g = pdf.groupby(["__v", "__h"], sort=False).size()
        idx = g.index
        sk.update_hashed(
            idx.get_level_values(0).to_numpy(),
            idx.get_level_values(1).to_numpy(dtype=np.int64),
            g.to_numpy(dtype=np.int64),
        )

    def finalize(sk: TopKSketch) -> pd.DataFrame:
        rows = sk.top(k)
        return pd.DataFrame(
            {"value": [r[0] for r in rows], "count_est": [r[1] for r in rows]}
        )

    spec = SketchSpec(
        make=lambda: TopKSketch(depth=depth, width=width, capacity=capacity),
        update=update,
        finalize=finalize,
        internal_cols=("__v", "__h"),
        prepare=lambda df, of: df.withColumn("__v", F.col(of).cast("string")).withColumn(
            "__h", F.xxhash64(F.col("__v"))
        ),
        deserialize=TopKSketch.deserialize,
    )
    schema = StructType(
        list(_by_fields(df, by))
        + [StructField("value", StringType()), StructField("count_est", LongType())]
    )
    return sketch_aggregate(df, of, spec, by=by, out_schema=schema, salted=salted)


def token_top_k(
    df: DataFrame,
    text_col: str = "text",
    k: int = 10,
    sep: str = " ",
    by: Sequence[str] = (),
    depth: int = 5,
    width: int = 16384,
    capacity: int = 2048,
    salted: bool = False,
) -> DataFrame:
    """Global token heavy hitters straight from a TEXT column — the
    `nest --explode then most-frequent` composition (reference:
    pkg/transformers/nest.go:34 + most_or_least_frequent.go:28) without
    materializing one row per token.

    Why not explode + most_frequent_cms: exploding 10^2 tokens/doc
    multiplies the Arrow JVM->Python transfer by the token count — at
    1M docs that round-trip alone costs ~16s vs ~2s for shipping each
    text once (measured, BENCH_scaling). Instead the document string
    crosses Arrow once and tokenization happens inside the batch
    (pandas str.split/explode, C-level), with only the ~vocab-sized
    distinct set hashed per batch. Same estimates, same bounds.
    """

    def update(sk: TopKSketch, pdf: pd.DataFrame) -> None:
        # Counter over split lists beats pandas explode+value_counts
        # ~2.3x (no 10^6-element object Series materialized); only the
        # DISTINCT tokens are hashed.
        from collections import Counter

        from mlrsketch.sketches.hashing import hash_strings

        c: Counter = Counter()
        for t in pdf["__text"]:
            if t is None:  # null/missing text must not fail the job
                continue
            c.update(t.split(sep))
        if not c:
            return
        vals = np.array(list(c.keys()), dtype=object)
        cnts = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        sk.update_hashed(vals, hash_strings(vals), cnts)

    def finalize(sk: TopKSketch) -> pd.DataFrame:
        rows = sk.top(k)
        return pd.DataFrame(
            {"value": [r[0] for r in rows], "count_est": [r[1] for r in rows]}
        )

    spec = SketchSpec(
        make=lambda: TopKSketch(depth=depth, width=width, capacity=capacity),
        update=update,
        finalize=finalize,
        internal_cols=("__text",),
        prepare=lambda df, of: df.withColumn("__text", F.col(of).cast("string")),
        deserialize=TopKSketch.deserialize,
    )
    schema = StructType(
        list(_by_fields(df, by))
        + [StructField("value", StringType()), StructField("count_est", LongType())]
    )
    return sketch_aggregate(df, text_col, spec, by=by, out_schema=schema, salted=salted)


# ---------------------------------------------------------------------------
# one-pass multi-sketch profile (Miller `summary` reimagined)
# ---------------------------------------------------------------------------


def sketch_profile(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    by: Sequence[str] = (),
    p: int = 14,
    kll_k: int = 200,
    top_k: int = 20,
    cms_depth: int = 5,
    cms_width: int = 16384,
    salted: bool = False,
) -> DataFrame:
    """The north-star page profile in ONE scan: HLL distinct urls, KLL
    text-length quantiles, and CMS top tokens — Miller `summary`
    (reference: pkg/transformers/summary.go:77,237-246 computes every
    stat in one streaming pass) rebuilt as a fused MultiSketch plan.

    At 100 TB the table scan dominates; fusing k sketches into one
    partial/final plan reads the data once instead of k times and pays
    one job's scheduling cost instead of k. State per (partition x
    group) = 2^p + O(k_kll) + depth*width*8 bytes (~700 KB default).

    Output: by..., url_distinct_est, url_distinct_bound, len_p50/p90/
    p99, len_rank_bound, top_tokens:array<string>, top_counts:array<long>.
    """
    from mlrsketch.sketches.hashing import hash_strings
    from mlrsketch.sketches.multi import MultiSketch

    def make() -> MultiSketch:
        return MultiSketch(
            {
                "hll": HyperLogLog(p=p),
                "kll": KLL(k=kll_k),
                "topk": TopKSketch(depth=cms_depth, width=cms_width, capacity=4 * top_k + 1024),
            }
        )

    def update(sk: MultiSketch, pdf: pd.DataFrame) -> None:
        from collections import Counter

        sk.parts["hll"].update_hashes(pdf["__h_url"].to_numpy(dtype=np.int64))
        tl = pdf["__tl"].to_numpy(dtype=np.float64)
        tl = tl[~np.isnan(tl)]  # null text has no length
        if tl.size:
            sk.parts["kll"].update_batch(tl)
        c: Counter = Counter()
        for t in pdf["__text"]:
            if t is None:
                continue
            c.update(t.split(" "))
        if not c:
            return
        vals = np.array(list(c.keys()), dtype=object)
        cnts = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        sk.parts["topk"].update_hashed(vals, hash_strings(vals), cnts)

    def finalize(sk: MultiSketch) -> pd.DataFrame:
        hll, kll, topk = sk.parts["hll"], sk.parts["kll"], sk.parts["topk"]
        top = topk.top(top_k)
        return pd.DataFrame(
            [
                {
                    "url_distinct_est": hll.estimate(),
                    "url_distinct_bound": hll.error_bound(),
                    "len_p50": kll.quantile(0.5),
                    "len_p90": kll.quantile(0.9),
                    "len_p99": kll.quantile(0.99),
                    "len_rank_bound": kll.error_bound(),
                    "top_tokens": [t for t, _ in top],
                    "top_counts": [c for _, c in top],
                }
            ]
        )

    deserializers = {
        "hll": HyperLogLog.deserialize,
        "kll": KLL.deserialize,
        "topk": TopKSketch.deserialize,
    }

    spec = SketchSpec(
        make=make,
        update=update,
        finalize=finalize,
        internal_cols=("__h_url", "__tl", "__text"),
        prepare=lambda df, of: (
            df.withColumn("__h_url", F.xxhash64(F.col(url_col).cast("string")))
            .withColumn("__tl", F.length(F.col(text_col)).cast("double"))
            .withColumn("__text", F.col(text_col).cast("string"))
        ),
        deserialize=lambda b: MultiSketch.deserialize(b, deserializers),
    )
    schema = StructType(
        list(_by_fields(df, by))
        + [
            StructField("url_distinct_est", DoubleType()),
            StructField("url_distinct_bound", DoubleType()),
            StructField("len_p50", DoubleType()),
            StructField("len_p90", DoubleType()),
            StructField("len_p99", DoubleType()),
            StructField("len_rank_bound", DoubleType()),
            StructField("top_tokens", ArrayType(StringType())),
            StructField("top_counts", ArrayType(LongType())),
        ]
    )
    return sketch_aggregate(df, url_col, spec, by=by, out_schema=schema, salted=salted)


# ---------------------------------------------------------------------------
# membership (Bloom)
# ---------------------------------------------------------------------------


def build_bloom(df: DataFrame, of: str, n_bits: int = 1 << 23, n_hashes: int = 7) -> BloomFilter:
    """Build a Bloom filter over column `of` with the two-level plan and
    return the merged driver-side filter (state is n_bits/8 bytes)."""
    spec = SketchSpec(
        make=lambda: BloomFilter(n_bits=n_bits, n_hashes=n_hashes),
        update=lambda sk, pdf: sk.add_hashes(pdf["__h"].to_numpy(dtype=np.int64)),
        finalize=lambda sk: pd.DataFrame({"state": [sk.serialize()]}),
        deserialize=BloomFilter.deserialize,
    )
    schema = StructType([StructField("state", BinaryType())])
    row = sketch_aggregate(df, of, spec, by=(), out_schema=schema).collect()[0]
    return BloomFilter.deserialize(bytes(row["state"]))


def bloom_filter_new(df: DataFrame, of: str, bloom: BloomFilter) -> DataFrame:
    """`uniq -a`-style membership at scale: keep rows whose `of` value is
    definitely NOT in the filter (no false negatives ⇒ no true duplicate
    survives; a published-FPR fraction of new rows is dropped).

    The filter is broadcast once; the membership test is a vectorized
    Arrow-batched predicate over JVM-computed xxhash64.
    """
    sc = df.sparkSession.sparkContext
    b_state = sc.broadcast(bloom.serialize())

    def keep_new(batches):
        bf = BloomFilter.deserialize(b_state.value)
        for pdf in batches:
            mask = ~bf.contains_hashes(pdf["__h"].to_numpy(dtype=np.int64))
            yield pdf[mask]

    prepared = df.withColumn("__h", F.xxhash64(F.col(of).cast("string")))
    return prepared.mapInPandas(keep_new, schema=prepared.schema).drop("__h")


# ---------------------------------------------------------------------------
# ewma (order-sensitive; no closed Catalyst form that is numerically stable)
# ---------------------------------------------------------------------------


def ewma_pandas(
    df: DataFrame,
    value: str,
    alphas: Sequence[float],
    order_by: Sequence[str],
    by: Sequence[str] = (),
) -> DataFrame:
    """`mlr step -a ewma -d a1,a2 -f value` (reference: step.go:647-651):
    y_0 = x_0; y_t = a*x_t + (1-a)*y_{t-1}, one output column per alpha.
    applyInPandas per group, pandas ewm (adjust=False matches Miller).
    """
    by = list(by)
    cols = {
        f"{value}_ewma_{('%g' % a).replace('.', '_')}": a for a in alphas
    }
    schema = StructType(
        list(df.schema.fields) + [StructField(n, DoubleType()) for n in cols]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_by), kind="stable")
        for name, a in cols.items():
            pdf[name] = pdf[value].ewm(alpha=a, adjust=False).mean()
        return pdf

    grouped = df.groupBy(*by) if by else df.groupBy()
    return grouped.applyInPandas(per_group, schema=schema)


# ---------------------------------------------------------------------------
# bootstrap-ci as a sketch (SURVEY.md §2.5 `bootstrap-ci`, the scale path)
# ---------------------------------------------------------------------------


def bootstrap_ci_sketch(
    df: DataFrame,
    value: str,
    key: str,
    by: Sequence[str] = (),
    n_boot: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
    seed: int = 42,
    salted: bool = False,
) -> DataFrame:
    """`mlr bootstrap-ci` riding the two-level partial/final sketch
    plan: the mergeable state is n_boot (sum c*v, sum c) Poisson-
    bootstrap accumulators (sketches/bootci.py) — constant KB per
    group, no per-group materialization, resample multiplicities
    deterministic in (key row hash, replicate, seed) under ANY
    partitioning. Output: by..., {value}_mean, {value}_ci_lo,
    {value}_ci_hi.

    This is the 10^12-row shape for CI estimation; exact.bootstrap_ci
    (applyInPandas index resampling) and exact.bootstrap_ci_hash (the
    engine-portable oracle variant) are the test-scale references it is
    validated against (tests/test_sketch_verbs_spark.py)."""
    from mlrsketch.sketches.bootci import BootstrapCI

    def prepare(d: DataFrame, of: str) -> DataFrame:
        return d.withColumn(
            "__h", F.xxhash64(F.coalesce(F.col(key).cast("string"), F.lit("")))
        ).withColumn("__v", F.col(of).cast("double"))

    spec = SketchSpec(
        make=lambda: BootstrapCI(n_boot=n_boot, lo=lo, hi=hi, seed=seed),
        update=lambda sk, pdf: sk.update(
            pdf["__h"].to_numpy(dtype=np.int64),
            pdf["__v"].to_numpy(dtype=np.float64),
        ),
        finalize=lambda sk: pd.DataFrame(
            [dict(zip((f"{value}_mean", f"{value}_ci_lo", f"{value}_ci_hi"),
                      sk.result()))]
        ),
        internal_cols=("__h", "__v"),
        prepare=prepare,
        deserialize=BootstrapCI.deserialize,
    )
    schema = StructType(
        list(_by_fields(df, by))
        + [
            StructField(f"{value}_mean", DoubleType()),
            StructField(f"{value}_ci_lo", DoubleType()),
            StructField(f"{value}_ci_hi", DoubleType()),
        ]
    )
    return sketch_aggregate(df, value, spec, by=by, out_schema=schema, salted=salted)
