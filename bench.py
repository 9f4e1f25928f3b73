#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Two workload families:
 - Miller-verb exact queries over the TPC-H-ish driver tables
   (lineitem/orders/customer/documents), via mlrsketch.verbs.exact.
 - The north-rule sketch suite (HLL / t-digest / KLL / CMS / Bloom)
   over a deterministically synthesized Common-Crawl-style pages table
   (url, warc_ts, html, text, lang) — mlrsketch.pages.generate_pages,
   cached as parquet under .bench_cache/ so repeat runs at different
   parallelism levels read identical bytes.

Each query is timed with the `noop` data source (full distributed
execution, zero driver-side collect). Also reports pages-suite
docs/sec throughput — the BASELINE.json headline metric.

Path disclosure: `percentiles_lineitem` runs the EXACT interpolated
percentile path (per-group sorted collect_list — memory class A per
group, test-scale oracle only); the 100 TB path for quantiles is the
sketch family benchmarked by `pages_kll_textlen_by_lang` /
`pages_tdigest_warcts` (mergeable KB states, one shuffle of states).
All other queries run their scale path directly.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from mlrsketch import pages as pg  # noqa: E402
from mlrsketch.session import get_spark, load_table  # noqa: E402
from mlrsketch.verbs import exact as ev  # noqa: E402
from mlrsketch.verbs import sketch as sv  # noqa: E402
from mlrsketch.pipeline import dedup  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", "100000"))
CACHE_DIR = os.path.join(REPO, ".bench_cache")


def _sf_label(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return base


def _run(df) -> None:
    """Execute the full plan distributed; no rows cross to the driver."""
    df.write.format("noop").mode("overwrite").save()


def pages_table(spark):
    """Deterministic pages parquet, cached (identical bytes across runs
    and parallelism levels — every value derives from row_id alone)."""
    path = os.path.join(CACHE_DIR, f"pages_{N_PAGES}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pg.write_pages(spark, N_PAGES, path)
    return spark.read.parquet(path)


def build_benches(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    docs = load_table(spark, sf_dir, "documents")
    pages = pages_table(spark)

    def b_stats1_lineitem():
        return ev.stats1(
            li,
            accs=["count", "sum", "mean", "min", "max", "var", "stddev"],
            values=["l_quantity", "l_extendedprice"],
            by=["l_returnflag", "l_linestatus"],
        )

    def b_percentiles_lineitem():
        return ev.stats1(
            li, accs=["p25", "p50", "p90", "p99"], values=["l_extendedprice"],
            by=["l_returnflag"], interpolated=True,
        )

    def b_top_orders():
        return ev.top(orders, "o_totalprice", n=5, by=["o_orderpriority"],
                      tiebreak=["o_orderkey"])

    def b_join_orders_cust_nation():
        j = orders.join(
            cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        return j.groupBy("n_name").agg(
            F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("revenue")
        )

    def b_dsl_put_lineitem():
        # round 2: the Miller-DSL string compiles to ONE Catalyst
        # projection (whole-stage codegen, no Python in the hot path)
        from mlrsketch.dsl import put
        return put(
            li,
            '$net = $l_extendedprice * (1 - $l_discount); '
            '$tier = $l_quantity > 30 ? "bulk" : "retail"; '
            '$tag = toupper($l_returnflag) . "-" . $l_linestatus',
        )

    def b_step_global_events():
        # round 2: ungrouped order-dependent steppers on the distributed
        # global-order path (range-partition prefix + broadcast offsets,
        # no single-task window)
        ev_t = load_table(spark, sf_dir, "events")
        return ev.step(ev_t, ["shift", "delta", "rsum"], ["value"],
                       order_by=["ts", "event_id"])

    def b_most_frequent_doc_tokens():
        tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
        return ev.most_frequent(tok, ["token"], n=20)

    def b_minhash_dedup_docs():
        return dedup.minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=32,
                                       bands=8, jaccard_threshold=0.8)

    # -- north-rule sketch suite over the Common-Crawl-style pages table --
    def b_pages_hll_url_by_lang():
        return sv.count_distinct_hll(pages, of="url", by=["lang"], p=14)

    def b_pages_kll_textlen_by_lang():
        withlen = pages.withColumn("text_len", F.length("text"))
        return sv.quantiles_kll(withlen, "text_len", (0.5, 0.9, 0.99), by=["lang"])

    def b_pages_tdigest_warcts():
        withts = pages.withColumn("ts_sec", F.unix_timestamp("warc_ts"))
        return sv.quantiles_tdigest(withts, "ts_sec", (0.5, 0.9), by=())

    def b_pages_cms_top_tokens():
        # token_top_k ships each text ONCE through Arrow and tokenizes
        # batch-side — ~8x cheaper than explode + most_frequent_cms
        # (the exploded token rows' serialization dominates otherwise).
        return sv.token_top_k(pages, "text", k=20, depth=5, width=16384)

    def b_pages_exact_stats1_by_lang():
        withlen = pages.withColumn("text_len", F.length("text"))
        return ev.stats1(withlen, accs=["count", "mean", "p50"],
                         values=["text_len"], by=["lang"])

    def b_pages_sketch_profile():
        # the fused one-pass profile (HLL + KLL + CMS in one scan) —
        # the north-star flagship job; also the scaling-bench workload
        return sv.sketch_profile(pages, "url", "text", p=14, top_k=20)

    return {
        "stats1_lineitem": b_stats1_lineitem,
        "percentiles_lineitem": b_percentiles_lineitem,
        "top_orders": b_top_orders,
        "join_orders_cust_nation": b_join_orders_cust_nation,
        "dsl_put_lineitem": b_dsl_put_lineitem,
        "step_global_events": b_step_global_events,
        "most_frequent_doc_tokens": b_most_frequent_doc_tokens,
        "minhash_dedup_docs": b_minhash_dedup_docs,
        "pages_hll_url_by_lang": b_pages_hll_url_by_lang,
        "pages_kll_textlen_by_lang": b_pages_kll_textlen_by_lang,
        "pages_tdigest_warcts": b_pages_tdigest_warcts,
        "pages_cms_top_tokens": b_pages_cms_top_tokens,
        "pages_exact_stats1_by_lang": b_pages_exact_stats1_by_lang,
        "pages_sketch_profile": b_pages_sketch_profile,
    }


PAGES_QUERIES = (
    "pages_hll_url_by_lang",
    "pages_kll_textlen_by_lang",
    "pages_tdigest_warcts",
    "pages_cms_top_tokens",
    "pages_exact_stats1_by_lang",
    "pages_sketch_profile",
)


REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
FAST_EXTRA = int(os.environ.get("SPARK_GRAFT_BENCH_FAST_EXTRA", "4"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _iqr(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[(3 * n) // 4] - s[n // 4] if n >= 4 else s[-1] - s[0]


def main() -> None:
    spark = get_spark(app="mlrsketch-bench")
    spark.sparkContext.setLogLevel("ERROR")
    benches = build_benches(spark, SF_DIR)

    # Warm the JVM, codegen, AND the Arrow/pandas-UDF worker pool once so
    # timings measure the engine, not process startup. The reference's
    # published numbers run on a warm binary
    # (/root/reference/docs/src/performance.md:66-70).
    _run(load_table(spark, SF_DIR, "region"))

    def _ident(it):
        yield from it

    warm = load_table(spark, SF_DIR, "region")
    _run(warm.mapInPandas(_ident, schema=warm.schema))

    # Noise-robust protocol (round-3): this VM shows ±50-80% per-query
    # swings between back-to-back runs with near-zero local load — the
    # contention is hypervisor steal, outside our control. Sequential
    # best-of-N of one query correlates with whatever the steal is doing
    # at that moment; instead we run INTERLEAVED rounds (every query
    # sampled once per round, so a burst taxes all queries equally, and
    # each query gets N chances spread across the whole wall-clock of
    # the run), with extra reps for sub-second queries where one pause
    # is a large relative error. Headline statistic = MIN over reps:
    # under purely-external steal the minimum estimates the uncontended
    # runtime of the code (and matches the reference's own best-of-five
    # warm-binary protocol, performance.md:66-70, plus rounds 1-2 of
    # this repo's records). Median and IQR are disclosed alongside so
    # the spread is never hidden.
    samples: dict[str, list[float]] = {name: [] for name in benches}

    def one_rep(name: str) -> None:
        t0 = time.perf_counter()
        _run(benches[name]())
        samples[name].append(time.perf_counter() - t0)

    for _ in range(REPS):
        for name in benches:
            one_rep(name)
    fast = [n for n, xs in samples.items() if min(xs) < 1.0]
    for _ in range(FAST_EXTRA):
        for name in fast:
            one_rep(name)

    timings = {n: round(min(xs), 4) for n, xs in samples.items()}
    medians = {n: round(_median(xs), 4) for n, xs in samples.items()}
    spread = {n: round(_iqr(xs), 4) for n, xs in samples.items()}

    total = round(sum(timings.values()), 4)
    pages_sec = sum(timings[q] for q in PAGES_QUERIES)
    docs_per_sec = round(len(PAGES_QUERIES) * N_PAGES / pages_sec, 1)

    print(json.dumps({
        "metric": "mlrsketch headline suite (exact verbs + north-rule sketch suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_median": medians,
        "query_iqr": spread,
        "stat": f"min of {REPS}+ interleaved reps (+{FAST_EXTRA} for sub-second"
                " queries); median/IQR disclosed (hypervisor-steal noise)",
        "sf": _sf_label(SF_DIR),
        "n_pages": N_PAGES,
        "pages_docs_per_sec": docs_per_sec,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
