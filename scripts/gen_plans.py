#!/usr/bin/env python
"""Regenerate PLANS.md: representative physical plans (explain audit).

Each section pairs the operator tree from `.explain("formatted")` with
the plan property it evidences (pushdown, partial/final agg, broadcast
join, TakeOrdered global top, KB-state-only sketch shuffle, broadcast
scalar denominator). Run from the repo root:

    python scripts/gen_plans.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mlrsketch.session import get_spark  # noqa: E402
from mlrsketch.verbs import exact as ev  # noqa: E402
from mlrsketch.verbs import sketch as sv  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def fmt(spark, df) -> str:
    s = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return s.split("\n\n")[0]


def main() -> None:
    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    sections = []

    q1 = ev.stats1(
        li.filter(F.col("l_shipdate") >= "1995-01-01"),
        accs=["count", "sum", "mean", "min", "max"],
        values=["l_quantity"],
        by=["l_returnflag", "l_linestatus"],
    )
    sections.append((
        "stats1 (filtered, grouped)",
        fmt(spark, q1),
        "What to see: the filter reaches the parquet scan (`PushedFilters:\n"
        "[IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate,...)]`), the scan\n"
        "reads only the 4 referenced columns (ReadSchema), HashAggregate appears\n"
        "TWICE (partial before the exchange, final after — map-side combine), and\n"
        "everything between scan and exchange is one WholeStageCodegen span.",
    ))

    q2 = (
        ev.join(orders, cust.withColumnRenamed("c_custkey", "o_custkey"), ["o_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    sections.append((
        "join (large-large + broadcast dim)",
        fmt(spark, q2),
        "What to see: orders-customer resolves as a shuffled hash/sort-merge join\n"
        "on the equi-key; the 25-row nation dim is a BroadcastHashJoin (no\n"
        "shuffle of the big side); the final aggregation again splits\n"
        "partial/final around one exchange.",
    ))

    q3 = ev.top(orders, "o_totalprice", n=5, tiebreak=["o_orderkey"])
    sections.append((
        "top (global, ungrouped)",
        fmt(spark, q3),
        "What to see: TakeOrderedAndProject — each partition keeps its local\n"
        "top-5 and the driver merges; there is NO global sort and NO\n"
        "single-partition window.",
    ))

    q4 = sv.count_distinct_hll(docs, "text", ["lang"], p=12)
    sections.append((
        "count_distinct_hll (two-level sketch plan)",
        fmt(spark, q4),
        "What to see: the scan feeds xxhash64 inside the projection (JVM-side,\n"
        "codegen'd — Python only ever receives int64 hash batches), MapInPandas\n"
        "emits one KB-scale state row per (input partition x lang), the ONLY\n"
        "exchange moves those states (not raw rows), and FlatMapGroupsInPandas\n"
        "merges per group. Raw-data shuffle volume: zero.",
    ))

    q5 = ev.fraction(orders, "o_totalprice")
    sections.append((
        "fraction (global denominator)",
        fmt(spark, q5),
        "What to see: the scalar total is computed by a partial/final aggregate\n"
        "and joined back via BroadcastNestedLoopJoin of a single row — not an\n"
        "empty-partition window funneling all rows through one task.",
    ))

    q5c = ev.fraction(orders, "o_totalprice", cumulative=True, order_by=["o_orderkey"])
    sections.append((
        "fraction -c ungrouped (range-partition prefix + broadcast carry)",
        fmt(spark, q5c),
        "What to see (round-3 fix): the cumulative sum runs inside\n"
        "Window.partitionBy(__pid) over the range-partitioned stream order,\n"
        "each partition's carry-in is a broadcast literal map, and the global\n"
        "denominator falls out of the same per-partition sums — no\n"
        "SinglePartition exchange, no empty-partition window.",
    ))

    # ungrouped order-dependent paths (round-2 de-single-tasking): each
    # plan must show NO empty-partition window / SinglePartition exchange
    li_n = li.select("l_orderkey", "l_extendedprice").withColumn(
        "__ord", F.monotonically_increasing_id()
    )
    q6 = ev.step(li_n, ["rsum", "shift", "delta"], ["l_extendedprice"], order_by=["__ord"])
    sections.append((
        "step ungrouped (rsum/shift/delta, distributed)",
        fmt(spark, q6),
        "What to see: shift/delta resolve as an equi-JOIN on the global row\n"
        "number (built by range partition + per-partition offsets), rsum is a\n"
        "per-range-partition running sum plus a broadcast carry map — every\n"
        "Window in the plan is partitioned by __pid; there is no\n"
        "SinglePartition exchange anywhere.",
    ))

    q7 = ev.stats1_windowed(li_n, ["mean", "min", "max"], ["l_extendedprice"], 10, order_by=["__ord"])
    sections.append((
        "stats1 -w ungrouped (block+ghost trailing window)",
        fmt(spark, q7),
        "What to see: the input is duplicated into (block, block+1) with a\n"
        "ghost flag and the trailing frame runs inside Window.partitionBy(__blk)\n"
        "— bounded 2x data motion instead of a single-task global window; min/\n"
        "max work because the physical rows (not just prefix sums) are present.",
    ))

    q8 = ev.rank(li.select("l_quantity").limit(100000), "l_quantity")
    sections.append((
        "rank ungrouped (distinct-table prefix ranks)",
        fmt(spark, q8),
        "What to see: ranking happens on the DISTINCT-value table (a grouped\n"
        "count), windows are partitioned by __pid over the range-partitioned\n"
        "value order, and the ranks join back on the value — the raw rows are\n"
        "never globally sorted through one task.",
    ))

    from mlrsketch import dsl

    q9 = dsl.filter_records(
        dsl.put(
            li,
            '$ratio = $l_extendedprice / $l_quantity; '
            '$bucket = $ratio > 1000 ? "high" : "low"',
        ),
        '$bucket == "high" && $l_quantity > 10',
    )
    sections.append((
        "tier-1 DSL put+filter (compiled, pushdown-preserving)",
        fmt(spark, q9),
        "What to see: the whole two-statement put program plus the filter is ONE\n"
        "codegen'd Project over the scan — no Python anywhere — and the\n"
        "`$l_quantity > 10` conjunct of the filter reaches the parquet reader\n"
        "(`PushedFilters: [..., GreaterThan(l_quantity,10.0)]`) even though its\n"
        "sibling conjunct references a computed column: the filter condition is\n"
        "passed bare (not wrapped in coalesce(c,false)), so PushDownPredicate\n"
        "can split the AND. Asserted by tests/test_plan_shapes.py.",
    ))

    out = [
        "# PLANS — representative physical plans (explain audit)\n\n"
        "Generated against sf0.01 with AQE on, `local[8]`. Each section: the\n"
        "operator tree from `.explain(\"formatted\")` plus what property the plan\n"
        "is evidence of. Regenerate with `python scripts/gen_plans.py`.\n"
    ]
    for title, plan, note in sections:
        out.append(f"## {title}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written, {len(sections)} sections")
    spark.stop()


if __name__ == "__main__":
    main()
