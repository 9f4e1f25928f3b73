#!/usr/bin/env python
"""Scale smoke: empirically confirm the memory-class disclosures.

Runs the same queries at sf0.1 (600k lineitem / 100k pages) and at a
10x "sf1-equivalent" (6M lineitem / 1M pages, derived deterministically
from the driver-provided sf0.1 parquet by key-shifted replication and
from the seeded pages generator) and reports wall times:

 - `percentiles_exact` is the EXACT interpolated-percentile oracle path
   (per-group sorted collect_list, memory class A per group): expected
   to degrade superlinearly with group size — test-scale only.
 - `stats1_grouped`, `kll_quantiles`, `sketch_profile` are the scale
   paths (partial/final aggregation, mergeable KB sketch states):
   expected ~linear in rows, no OOM.

Results land in BASELINE.md (round-3 section). Usage:
    python scripts/scale_smoke.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mlrsketch import pages as pg  # noqa: E402
from mlrsketch.session import get_spark, load_table  # noqa: E402
from mlrsketch.verbs import exact as ev  # noqa: E402
from mlrsketch.verbs import sketch as sv  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE = os.path.join(REPO, ".bench_cache")


def _run(df):
    df.write.format("noop").mode("overwrite").save()


def lineitem_x10(spark):
    """6M-row lineitem: 10 key-shifted replicas of the driver's sf0.1
    table, written once to parquet so scans are identical real scans."""
    path = os.path.join(CACHE, "lineitem_x10")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li = load_table(spark, SF_DIR, "lineitem")
        maxkey = li.agg(F.max("l_orderkey")).first()[0]
        rep = li.crossJoin(F.broadcast(
            spark.range(10).withColumnRenamed("id", "__rep")))
        rep = rep.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("__rep") * (maxkey + 1)
        ).drop("__rep")
        rep.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def pages_1m(spark):
    path = os.path.join(CACHE, "pages_1000000")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pg.write_pages(spark, 1_000_000, path)
    return spark.read.parquet(path)


def queries(li, pages):
    withlen = pages.withColumn("text_len", F.length("text"))
    return {
        "percentiles_exact": lambda: ev.stats1(
            li, accs=["p25", "p50", "p90", "p99"],
            values=["l_extendedprice"], by=["l_returnflag"],
            interpolated=True),
        "stats1_grouped": lambda: ev.stats1(
            li, accs=["count", "sum", "mean", "min", "max", "var",
                      "stddev"],
            values=["l_quantity", "l_extendedprice"],
            by=["l_returnflag", "l_linestatus"]),
        "kll_quantiles": lambda: sv.quantiles_kll(
            withlen, "text_len", (0.5, 0.9, 0.99), by=["lang"]),
        "sketch_profile": lambda: sv.sketch_profile(
            pages, "url", "text", p=14, top_k=20),
    }


def main():
    spark = get_spark(app="mlrsketch-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    li_small = load_table(spark, SF_DIR, "lineitem")
    pages_small = spark.read.parquet(os.path.join(CACHE, "pages_100000")) \
        if os.path.exists(os.path.join(CACHE, "pages_100000", "_SUCCESS")) \
        else None
    if pages_small is None:
        p = os.path.join(CACHE, "pages_100000")
        pg.write_pages(spark, 100_000, p)
        pages_small = spark.read.parquet(p)
    li_big = lineitem_x10(spark)
    pages_big = pages_1m(spark)

    _run(li_small.limit(1000))  # warm JVM + codegen + Arrow workers
    _run(pages_small.limit(1000))

    out = {}
    for label, li, pages in (("sf0.1", li_small, pages_small),
                             ("sf1", li_big, pages_big)):
        qs = queries(li, pages)
        for name, fn in qs.items():
            best = None
            for _ in range(2):
                t0 = time.time()
                _run(fn())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[f"{name}@{label}"] = round(best, 3)
            print(f"{name:24s} {label:6s} {best:7.2f} s", flush=True)

    ratios = {}
    for name in ("percentiles_exact", "stats1_grouped", "kll_quantiles",
                 "sketch_profile"):
        a, b = out[f"{name}@sf0.1"], out[f"{name}@sf1"]
        ratios[name] = round(b / a, 2) if a else None
    print(json.dumps({"times": out, "x10_ratio": ratios}))


if __name__ == "__main__":
    main()
