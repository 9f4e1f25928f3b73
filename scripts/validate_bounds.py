#!/usr/bin/env python
"""Sketch error-bound validation at bench scale → VALIDATION.md.

North rule: "matching the reference's sketch estimates within the
algorithm's published error bound". The pytest suite proves this at
unit scale; this script documents it at 1M-row scale against exact
Spark answers on the deterministic pages table:

- HLL++ (p=12,14,16): |est-exact|/exact vs 1.04/sqrt(2^p) (1 sigma;
  we report sigmas consumed — expect ~<2 for a single draw)
- KLL (k=200) & t-digest (delta=200): observed rank error of the
  estimated quantile value vs the bound (2/k; ~1/delta near median)
- CMS top-k: estimated counts vs exact counts of the same tokens
  (overcount-only, <= eps*N with eps = e/width at prob 1-e^-depth)
- Bloom (m bits, k hashes): observed FPR on definitely-new keys vs
  (1-e^{-kn/m})^k

Run: python scripts/validate_bounds.py   (writes VALIDATION.md)
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mlrsketch import pages as pg  # noqa: E402
from mlrsketch.session import get_spark  # noqa: E402
from mlrsketch.verbs import exact as ev  # noqa: E402
from mlrsketch.verbs import sketch as sv  # noqa: E402

N = int(os.environ.get("SPARK_GRAFT_VALIDATE_PAGES", "1000000"))


def main() -> None:
    spark = get_spark(cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages = pg.load_or_create_pages(
        spark, N, os.path.join(REPO, ".bench_cache", f"pages_{N}")
    )
    lines = [
        "# VALIDATION — sketch estimates vs exact, at scale",
        "",
        f"Input: deterministic pages table, {N:,} rows. Exact answers via",
        "Spark; estimates via the mlrsketch two-level partial/final plans.",
        "Regenerate: `python scripts/validate_bounds.py`.",
        "",
    ]

    # -- HLL ---------------------------------------------------------------
    exact_urls = pages.select("url").distinct().count()
    lines += ["## HyperLogLog++ — distinct urls", "",
              f"exact distinct: {exact_urls:,}", "",
              "| p | estimate | rel.err | bound (1.04/sqrt(m)) | sigmas |",
              "|---|---|---|---|---|"]
    for p in (12, 14, 16):
        r = sv.count_distinct_hll(pages, of="url", p=p).first()
        est, bound = r["distinct_count_est"], r["error_bound"]
        rel = abs(est - exact_urls) / exact_urls
        lines.append(
            f"| {p} | {est:,.0f} | {rel:.5f} | {bound:.5f} | {rel / bound:.2f} |"
        )
    lines.append("")

    # -- quantiles ---------------------------------------------------------
    withlen = pages.withColumn("tl", F.length("text").cast("double"))
    n_rows = withlen.count()
    sorted_lens = None  # computed lazily via exact rank queries

    def exact_rank(v: float) -> float:
        return withlen.filter(F.col("tl") <= v).count() / n_rows

    lines += ["## KLL (k=200) & t-digest (delta=200) — text-length quantiles", "",
              "| sketch | q | estimate | exact rank of estimate | rank err | bound |",
              "|---|---|---|---|---|---|"]
    kll = sv.quantiles_kll(withlen, "tl", (0.5, 0.9, 0.99)).first()
    td = sv.quantiles_tdigest(withlen, "tl", (0.5, 0.9, 0.99)).first()
    for label, row, bound in (("KLL", kll, kll["rank_error_bound"]),
                              ("t-digest", td, td["rank_error_bound"])):
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            est = row[col]
            r_ = exact_rank(est)
            err = abs(r_ - q)
            lines.append(
                f"| {label} | {q} | {est:.0f} | {r_:.5f} | {err:.5f} | {bound:.5f} |"
            )
    lines.append("")

    # -- CMS top-k ---------------------------------------------------------
    depth, width, k = 5, 16384, 20
    topk = [
        (r["value"], r["count_est"])
        for r in sv.token_top_k(pages, "text", k=k, depth=depth, width=width).collect()
    ]
    tok = pages.select(F.explode(F.split("text", " ")).alias("t"))
    total_tokens = tok.count()
    exact_counts = {
        r["t"]: r["cnt"]
        for r in tok.filter(F.col("t").isin([v for v, _ in topk]))
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    eps = math.e / width
    lines += [f"## Count-Min + heavy hitters — top-{k} tokens", "",
              f"total tokens N = {total_tokens:,}; overcount bound eps*N = "
              f"{eps * total_tokens:,.0f} (eps = e/width = {eps:.2e}, "
              f"P(violation) <= e^-depth = {math.exp(-depth):.3f})", "",
              "| token | est | exact | overcount | <= eps*N |",
              "|---|---|---|---|---|"]
    worst = 0
    for v, est in topk[:10]:
        ex = exact_counts.get(v, 0)
        over = est - ex
        worst = max(worst, over)
        lines.append(f"| {v} | {est:,} | {ex:,} | {over:,} | "
                     f"{'yes' if over <= eps * total_tokens else 'NO'} |")
    lines.append("")
    lines.append(f"max overcount across top-{k}: {worst:,} "
                 f"(never undercounts: CMS point estimates are upper bounds)")
    lines.append("")

    # -- Bloom -------------------------------------------------------------
    n_bits, n_hashes = 1 << 22, 7
    half_a = pages.filter(F.col("row_id") % 2 == 0)
    half_b = pages.filter(F.col("row_id") % 2 == 1)
    bf = sv.build_bloom(half_a, "url", n_bits=n_bits, n_hashes=n_hashes)
    b_urls = half_b.select("url").distinct()
    a_urls = half_a.select("url").distinct()
    new_b = b_urls.join(a_urls, "url", "left_anti")
    n_new = new_b.count()
    kept = sv.bloom_filter_new(new_b, "url", bf).count()
    fpr_obs = (n_new - kept) / n_new
    n_inserted = a_urls.count()
    fpr_theory = (1 - math.exp(-n_hashes * n_inserted / n_bits)) ** n_hashes
    lines += ["## Bloom — seen-URL membership", "",
              f"filter: m = 2^22 bits, k = {n_hashes}; inserted n = {n_inserted:,} urls",
              f"definitely-new urls probed: {n_new:,}; false positives: {n_new - kept:,}",
              f"observed FPR = {fpr_obs:.5f} vs theoretical (1-e^(-kn/m))^k = {fpr_theory:.5f}",
              ""]

    with open(os.path.join(REPO, "VALIDATION.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines[-30:]))
    spark.stop()


if __name__ == "__main__":
    main()
