"""Driver contract for the spark-graft builder (PySpark target).

Maps SURVEY.md §2's operator inventory onto the mlrsketch library:
- queries(): one callable per implemented verb/operator, built from
  mlrsketch.verbs.exact / mlrsketch.pipeline (exact, oracle-checkable)
  plus rows-only entries for the sketch verbs (estimates have no SQL
  equivalent — the error-bound validation lives in tests/).
- oracle_sql(): ANSI-SQL equivalents for DuckDB, with identical column
  aliases and identical explicit rounding on recomputed doubles
  (raw pass-through doubles are compared unrounded — both engines
  return the stored IEEE value bit-for-bit).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mlrsketch.pipeline import dedup, similarity, textstats
from mlrsketch.verbs import exact as ev
from mlrsketch.verbs import sketch as sv


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Miller `stats1` + `count-distinct` reimagined — per-lang
    doc profile with exact stats AND sketch estimates side by side."""
    sf = "/root/testdata/sf0.001"
    docs = _t(spark, sf, "documents")
    exact = ev.stats1(
        docs, accs=["count", "mean", "min", "max", "p50"], values=["n_chars"], by=["lang"]
    )
    hll = sv.count_distinct_hll(docs, of="text", by=["lang"], p=12)
    return exact.join(hll, "lang").orderBy("lang")


# ---------------------------------------------------------------------------
# queries — each exercises one operator from SURVEY.md §2
# ---------------------------------------------------------------------------


def q_stats1_basic(spark, sf):
    li = _t(spark, sf, "lineitem")
    s = ev.stats1(
        li,
        accs=["count", "sum", "mean", "min", "max", "var", "stddev"],
        values=["l_quantity"],
        by=["l_returnflag", "l_linestatus"],
    )
    return s.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity_count").alias("cnt"),
        F.round("l_quantity_sum", 4).alias("sum_qty"),
        F.round("l_quantity_mean", 4).alias("mean_qty"),
        F.col("l_quantity_min").alias("min_qty"),
        F.col("l_quantity_max").alias("max_qty"),
        F.round("l_quantity_var", 4).alias("var_qty"),
        F.round("l_quantity_stddev", 4).alias("stddev_qty"),
    )


def q_stats1_percentiles_interp(spark, sf):
    li = _t(spark, sf, "lineitem")
    s = ev.stats1(
        li, accs=["p50", "p90", "p99"], values=["l_extendedprice"],
        by=["l_returnflag"], interpolated=True,
    )
    return s.select(
        "l_returnflag",
        F.round("l_extendedprice_p50", 4).alias("p50"),
        F.round("l_extendedprice_p90", 4).alias("p90"),
        F.round("l_extendedprice_p99", 4).alias("p99"),
    )


def q_stats1_percentiles_miller(spark, sf):
    # Miller's default NON-interpolated percentile: element at
    # int(p/100*n) clamped (reference pkg/bifs/percentiles.go:193-208)
    li = _t(spark, sf, "lineitem")
    s = ev.stats1(
        li, accs=["median", "p25", "p90"], values=["l_extendedprice"], by=["l_returnflag"]
    )
    return s.select(
        "l_returnflag",
        F.col("l_extendedprice_median").alias("median_np"),
        F.col("l_extendedprice_p25").alias("p25_np"),
        F.col("l_extendedprice_p90").alias("p90_np"),
    )


def q_stats1_mode(spark, sf):
    li = _t(spark, sf, "lineitem").withColumn("__ord", F.col("l_orderkey") * 10 + F.col("l_linenumber"))
    return ev.mode_impl(li, "l_quantity", by=["l_returnflag"]).orderBy("l_returnflag")


def q_count_records(spark, sf):
    return ev.count_records(_t(spark, sf, "lineitem"), by=["l_returnflag"])


def q_count_distinct(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts")
    )


def q_count_distinct_combo(spark, sf):
    return ev.count_distinct(_t(spark, sf, "orders"), ["o_orderstatus", "o_orderpriority"])


def q_count_distinct_unlashed(spark, sf):
    return ev.count_distinct(
        _t(spark, sf, "orders"), ["o_orderstatus", "o_orderpriority"], unlashed=True
    )


def q_uniq_counts(spark, sf):
    return ev.uniq(_t(spark, sf, "orders"), ["o_orderpriority"], show_counts=True)


def q_uniq_distinct(spark, sf):
    return ev.uniq(_t(spark, sf, "documents"), ["lang", "source"])


def q_uniq_n(spark, sf):
    return ev.uniq_distinct_count(_t(spark, sf, "documents"), ["lang", "source"])


def q_top(spark, sf):
    return ev.top(
        _t(spark, sf, "orders"), "o_totalprice", n=3, by=["o_orderpriority"],
        tiebreak=["o_orderkey"],
    )


def q_most_frequent_tokens(spark, sf):
    tok = _t(spark, sf, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    return ev.most_frequent(tok, ["token"], n=10)


def q_least_frequent_tokens(spark, sf):
    tok = _t(spark, sf, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    return ev.most_frequent(tok, ["token"], n=10, descending=False)


def q_count_similar(spark, sf):
    return ev.count_similar(_t(spark, sf, "documents"), ["lang"]).select(
        "doc_id", "lang", "count"
    )


def q_fraction(spark, sf):
    o = _t(spark, sf, "orders")
    return ev.fraction(o, "o_totalprice", by=["o_orderpriority"]).select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice_fraction", 6).alias("frac"),
    )


def q_fraction_cumulative(spark, sf):
    o = _t(spark, sf, "orders")
    return ev.fraction(
        o, "o_totalprice", by=["o_orderpriority"], cumulative=True, order_by=["o_orderkey"]
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice_cumulative_fraction", 6).alias("cumfrac"),
    )


def q_histogram(spark, sf):
    return ev.histogram(_t(spark, sf, "orders"), "o_totalprice", lo=0.0, hi=500000.0, nbins=20)


def q_merge_fields(spark, sf):
    li = _t(spark, sf, "lineitem")
    m = ev.merge_fields(li, ["min", "max", "sum"], ["l_quantity", "l_discount", "l_tax"], "qdt")
    return m.select(
        "l_orderkey",
        "l_linenumber",
        F.col("qdt_min").alias("qdt_min"),
        F.col("qdt_max").alias("qdt_max"),
        F.round("qdt_sum", 4).alias("qdt_sum"),
    )


def q_stats2(spark, sf):
    s = ev.stats2(
        _t(spark, sf, "lineitem"), "l_quantity", "l_extendedprice",
        ["corr", "cov", "r2"], by=["l_returnflag"],
    )
    return s.select(
        "l_returnflag",
        F.round("l_quantity_l_extendedprice_corr", 6).alias("corr_qp"),
        F.round("l_quantity_l_extendedprice_cov", 4).alias("cov_qp"),
        F.round("l_quantity_l_extendedprice_r2", 6).alias("r2_qp"),
    )


def q_step(spark, sf):
    e = _t(spark, sf, "events")
    s = ev.step(
        e, ["shift", "delta", "rsum", "counter"], ["value"],
        order_by=["ts", "event_id"], by=["user_id"],
    )
    return s.select(
        "event_id",
        "user_id",
        "value",
        F.col("value_shift").alias("shift_v"),
        F.round("value_delta", 6).alias("delta_v"),
        F.round("value_rsum", 4).alias("rsum_v"),
        F.col("value_counter").alias("counter_v"),
    )


def q_slwin(spark, sf):
    e = _t(spark, sf, "events")
    s = ev.slwin(e, "value", 2, 2, order_by=["ts", "event_id"], by=["user_id"])
    return s.select("event_id", F.round("value_slwin_2_2", 6).alias("slwin_v"))


def q_fill_down(spark, sf):
    e = _t(spark, sf, "events").withColumn(
        "v2", F.when(F.col("value") < 100, None).otherwise(F.col("value"))
    )
    return ev.fill_down(e, ["v2"], order_by=["ts", "event_id"], by=["user_id"]).select(
        "event_id", "user_id", "v2"
    )


def q_fill_empty(spark, sf):
    d = _t(spark, sf, "documents").withColumn(
        "src2", F.when(F.col("lang") == "en", "").otherwise(F.col("source"))
    )
    return ev.fill_empty(d, fill="N/A", fields=["src2"]).select("doc_id", "src2")


def q_rank(spark, sf):
    li = _t(spark, sf, "lineitem")
    return ev.rank(li, "l_quantity", by=["l_returnflag"]).select(
        "l_orderkey", "l_linenumber", "l_quantity", "rank"
    )


def q_decimate(spark, sf):
    return ev.decimate(_t(spark, sf, "orders"), 10, order_by=["o_orderkey"]).select(
        "o_orderkey", "o_totalprice"
    )


def q_head_group(spark, sf):
    return ev.head(_t(spark, sf, "orders"), 2, by=["o_orderstatus"], order_by=["o_orderkey"]).select(
        "o_orderkey", "o_orderstatus"
    )


def q_tail_group(spark, sf):
    return ev.tail(_t(spark, sf, "orders"), 2, by=["o_orderstatus"], order_by=["o_orderkey"]).select(
        "o_orderkey", "o_orderstatus"
    )


def q_cat_numbered(spark, sf):
    return ev.cat_numbered(_t(spark, sf, "region"), order_by=["r_regionkey"]).select(
        "n", "r_regionkey", "r_name"
    )


def q_join_inner(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    j = ev.join(o, c.withColumnRenamed("c_custkey", "o_custkey"), ["o_custkey"], "inner",
                broadcast_left=False)
    j = j.join(F.broadcast(n), j["c_nationkey"] == n["n_nationkey"])
    return j.groupBy("n_name").agg(
        F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )


def q_join_anti(spark, sf):
    o = _t(spark, sf, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = _t(spark, sf, "customer")
    return ev.join(c, o, ["c_custkey"], "left-anti").select("c_custkey", "c_name")


def q_join_left_outer(spark, sf):
    o = _t(spark, sf, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = _t(spark, sf, "customer")
    j = ev.join(c, o, ["c_custkey"], "left")
    return j.groupBy("c_custkey", "c_name").agg(F.count("o_orderkey").alias("n_orders"))


def q_nest_explode(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", F.col("text").alias("token"))
    return ev.nest_explode_values(d, "token", sep=" ")


def q_nest_implode(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return d.groupBy("doc_id").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list("token"))).alias("sorted_text")
    )


def q_reshape_l2w(spark, sf):
    e = _t(spark, sf, "events")
    p = e.groupBy("user_id").pivot(
        "event_type", ["click", "error", "purchase", "signup", "view"]
    ).agg(F.round(F.avg("value"), 6))
    return p


def q_reshape_w2l(spark, sf):
    li = _t(spark, sf, "lineitem")
    return ev.reshape_wide_to_long(
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"),
        ["l_quantity", "l_discount", "l_tax"], "measure", "val",
    )


def q_sec2gmt(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts_gmt"),
        F.to_date("ts").alias("ts_date"),
    )


def q_seqgen(spark, sf):
    return ev.seqgen(spark, 1, 100)


def q_case_upper(spark, sf):
    return ev.case_fields(_t(spark, sf, "part"), ["p_name"], "upper").select(
        "p_partkey", "p_name"
    )


def q_gsub(spark, sf):
    return ev.sub_field(_t(spark, sf, "part"), "p_name", "[aeiou]", "*").select(
        "p_partkey", "p_name"
    )


def q_clean_whitespace(spark, sf):
    p = _t(spark, sf, "part").withColumn("messy", F.concat(F.lit("  "), F.col("p_name"), F.lit("   x  ")))
    return ev.clean_whitespace(p, ["messy"]).select("p_partkey", "messy")


def q_repeat(spark, sf):
    return ev.repeat(_t(spark, sf, "region"), 3).select("r_regionkey", "r_name")


def q_template(spark, sf):
    return ev.template(_t(spark, sf, "region"), ["r_regionkey", "r_name", "extra"])


def q_json_parse(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


def q_grep(spark, sf):
    d = _t(spark, sf, "documents")
    return d.filter(F.col("text").rlike("batch join")).select("doc_id")


def q_sort_multi(spark, sf):
    return ev.sort(
        _t(spark, sf, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice"),
        [("o_orderstatus", "f"), ("o_totalprice", "nr")],
    )


# -- pipeline: text analysis -------------------------------------------------


def q_token_count(spark, sf):
    return textstats.token_count(_t(spark, sf, "documents")).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    )


def q_quality_score(spark, sf):
    return textstats.quality_score(_t(spark, sf, "documents")).select(
        "doc_id", "len_score", "alpha_ratio", "stop_ratio", "quality_score"
    )


def q_lang_id(spark, sf):
    return textstats.lang_id(_t(spark, sf, "documents")).select("doc_id", "lang_pred")


def q_fingerprint(spark, sf):
    return textstats.fingerprint(_t(spark, sf, "documents")).select("doc_id", "fp")


# -- pipeline: dedup ---------------------------------------------------------


def q_dedup_exact_stats(spark, sf):
    d = _t(spark, sf, "documents")
    return d.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )


def q_dedup_keep_first(spark, sf):
    d = _t(spark, sf, "documents")
    return dedup.exact_dedup(d, "text", keep_by="doc_id").select("doc_id", "lang")


def q_ngram_jaccard(spark, sf):
    d = _t(spark, sf, "documents").filter(F.col("lang") == "de")
    pairs = dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=1, threshold=0.9)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# -- pipeline: similarity ----------------------------------------------------


def q_ann_brute_force(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    casted = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
    return similarity.brute_force_topk(casted, qvec, k=10).select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    )


# -- sketch verbs (rows-only: estimates have no SQL equivalent) --------------


def q_hll_distinct_per_lang(spark, sf):
    return sv.count_distinct_hll(_t(spark, sf, "documents"), "text", ["lang"], p=12)


def q_tdigest_quantiles(spark, sf):
    return sv.quantiles_tdigest(_t(spark, sf, "documents"), "n_chars", (0.5, 0.9, 0.99), ["lang"])


def q_kll_quantiles(spark, sf):
    return sv.quantiles_kll(_t(spark, sf, "events"), "value", (0.5, 0.9), ["event_type"])


def q_cms_top_tokens(spark, sf):
    tok = _t(spark, sf, "documents").select(F.explode(F.split("text", " ")).alias("token"))
    return sv.most_frequent_cms(tok, "token", k=10)


def q_minhash_near_dups(spark, sf):
    d = _t(spark, sf, "documents")
    return dedup.minhash_lsh_pairs(d, "doc_id", "text", n_hashes=32, bands=8,
                                   jaccard_threshold=0.9)


def q_simhash_near_dups(spark, sf):
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return dedup.simhash_near_dups(d, "doc_id", "text", max_hamming=10)


def q_ewma(spark, sf):
    return sv.ewma_pandas(
        _t(spark, sf, "events"), "value", [0.3], ["ts", "event_id"], by=["user_id"]
    ).select("event_id", F.round("value_ewma_0_3", 6).alias("ewma_v"))


def q_sample_per_group(spark, sf):
    return ev.sample(_t(spark, sf, "orders"), 5, by=["o_orderpriority"]).select(
        "o_orderpriority", "o_orderkey"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stats1_basic": q_stats1_basic,
        "stats1_percentiles_interp": q_stats1_percentiles_interp,
        "stats1_percentiles_miller": q_stats1_percentiles_miller,
        "stats1_mode": q_stats1_mode,
        "count_records": q_count_records,
        "count_distinct": q_count_distinct,
        "count_distinct_combo": q_count_distinct_combo,
        "count_distinct_unlashed": q_count_distinct_unlashed,
        "uniq_counts": q_uniq_counts,
        "uniq_distinct": q_uniq_distinct,
        "uniq_n": q_uniq_n,
        "top": q_top,
        "most_frequent_tokens": q_most_frequent_tokens,
        "least_frequent_tokens": q_least_frequent_tokens,
        "count_similar": q_count_similar,
        "fraction": q_fraction,
        "fraction_cumulative": q_fraction_cumulative,
        "histogram": q_histogram,
        "merge_fields": q_merge_fields,
        "stats2": q_stats2,
        "step": q_step,
        "slwin": q_slwin,
        "fill_down": q_fill_down,
        "fill_empty": q_fill_empty,
        "rank": q_rank,
        "decimate": q_decimate,
        "head_group": q_head_group,
        "tail_group": q_tail_group,
        "cat_numbered": q_cat_numbered,
        "join_inner": q_join_inner,
        "join_anti": q_join_anti,
        "join_left_outer": q_join_left_outer,
        "nest_explode": q_nest_explode,
        "nest_implode": q_nest_implode,
        "reshape_l2w": q_reshape_l2w,
        "reshape_w2l": q_reshape_w2l,
        "sec2gmt": q_sec2gmt,
        "seqgen": q_seqgen,
        "case_upper": q_case_upper,
        "gsub": q_gsub,
        "clean_whitespace": q_clean_whitespace,
        "repeat": q_repeat,
        "template": q_template,
        "json_parse": q_json_parse,
        "grep": q_grep,
        "sort_multi": q_sort_multi,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "dedup_exact_stats": q_dedup_exact_stats,
        "dedup_keep_first": q_dedup_keep_first,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_brute_force": q_ann_brute_force,
        # sketch / non-SQL-expressible (rows-only checks)
        "hll_distinct_per_lang": q_hll_distinct_per_lang,
        "tdigest_quantiles": q_tdigest_quantiles,
        "kll_quantiles": q_kll_quantiles,
        "cms_top_tokens": q_cms_top_tokens,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "ewma": q_ewma,
        "sample_per_group": q_sample_per_group,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    return {
        "stats1_basic": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS cnt,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(avg(l_quantity), 4) AS mean_qty,
                   min(l_quantity) AS min_qty,
                   max(l_quantity) AS max_qty,
                   round(var_samp(l_quantity), 4) AS var_qty,
                   round(stddev_samp(l_quantity), 4) AS stddev_qty
            FROM lineitem GROUP BY 1, 2
        """,
        "stats1_percentiles_interp": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
                   round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
            FROM lineitem GROUP BY 1
        """,
        "stats1_percentiles_miller": """
            SELECT l_returnflag,
                   list_sort(list(l_extendedprice))[least(cast(floor(0.50*count(*)) AS BIGINT), count(*)-1) + 1] AS median_np,
                   list_sort(list(l_extendedprice))[least(cast(floor(0.25*count(*)) AS BIGINT), count(*)-1) + 1] AS p25_np,
                   list_sort(list(l_extendedprice))[least(cast(floor(0.90*count(*)) AS BIGINT), count(*)-1) + 1] AS p90_np
            FROM lineitem GROUP BY 1
        """,
        "stats1_mode": """
            WITH counted AS (
              SELECT l_returnflag, l_quantity, count(*) AS cnt,
                     min(l_orderkey * 10 + l_linenumber) AS first_seen
              FROM lineitem GROUP BY 1, 2)
            SELECT l_returnflag, l_quantity AS l_quantity_mode
            FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                         ORDER BY cnt DESC, first_seen ASC) AS rn FROM counted)
            WHERE rn = 1 ORDER BY l_returnflag
        """,
        "count_records": "SELECT l_returnflag, count(*) AS count FROM lineitem GROUP BY 1",
        "count_distinct": """
            SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts
            FROM lineitem GROUP BY 1
        """,
        "count_distinct_combo": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS count
            FROM orders GROUP BY 1, 2
        """,
        "count_distinct_unlashed": """
            SELECT 'o_orderstatus' AS field, o_orderstatus AS value, count(*) AS count
            FROM orders GROUP BY 2
            UNION ALL
            SELECT 'o_orderpriority' AS field, o_orderpriority AS value, count(*) AS count
            FROM orders GROUP BY 2
        """,
        "uniq_counts": "SELECT o_orderpriority, count(*) AS count FROM orders GROUP BY 1",
        "uniq_distinct": "SELECT DISTINCT lang, source FROM documents",
        "uniq_n": "SELECT count(*) AS count FROM (SELECT DISTINCT lang, source FROM documents)",
        "top": """
            SELECT o_orderpriority, top_idx, o_totalprice AS o_totalprice_top FROM (
              SELECT o_orderpriority, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS top_idx
              FROM orders) WHERE top_idx <= 3
        """,
        "most_frequent_tokens": """
            SELECT token, count(*) AS count
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY 1 ORDER BY count DESC, token ASC LIMIT 10
        """,
        "least_frequent_tokens": """
            SELECT token, count(*) AS count
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY 1 ORDER BY count ASC, token ASC LIMIT 10
        """,
        "count_similar": """
            SELECT doc_id, lang, count(*) OVER (PARTITION BY lang) AS count FROM documents
        """,
        "fraction": """
            SELECT o_orderkey, o_orderpriority,
                   round(o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_orderpriority), 6) AS frac
            FROM orders
        """,
        "fraction_cumulative": """
            SELECT o_orderkey, o_orderpriority,
                   round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         / sum(o_totalprice) OVER (PARTITION BY o_orderpriority), 6) AS cumfrac
            FROM orders
        """,
        "histogram": """
            SELECT CAST(b * 25000.0 AS DOUBLE) AS bin_lo,
                   CAST((b+1) * 25000.0 AS DOUBLE) AS bin_hi,
                   coalesce(c, 0) AS count
            FROM range(20) t(b)
            LEFT JOIN (SELECT cast(floor(o_totalprice / 25000.0) AS BIGINT) AS b2, count(*) AS c
                       FROM orders WHERE o_totalprice >= 0 AND o_totalprice < 500000
                       GROUP BY 1) h ON b = b2
            ORDER BY bin_lo
        """,
        "merge_fields": """
            SELECT l_orderkey, l_linenumber,
                   least(l_quantity, l_discount, l_tax) AS qdt_min,
                   greatest(l_quantity, l_discount, l_tax) AS qdt_max,
                   round(l_quantity + l_discount + l_tax, 4) AS qdt_sum
            FROM lineitem
        """,
        "stats2": """
            SELECT l_returnflag,
                   round(corr(l_extendedprice, l_quantity), 6) AS corr_qp,
                   round(covar_samp(l_extendedprice, l_quantity), 4) AS cov_qp,
                   round(corr(l_extendedprice, l_quantity)^2, 6) AS r2_qp
            FROM lineitem GROUP BY 1
        """,
        "step": """
            SELECT event_id, user_id, value,
                   lag(value) OVER w AS shift_v,
                   round(coalesce(value - lag(value) OVER w, 0), 6) AS delta_v,
                   round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS rsum_v,
                   count(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS counter_v
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "slwin": """
            SELECT event_id,
                   round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS slwin_v
            FROM events
        """,
        "fill_down": """
            SELECT event_id, user_id,
                   last_value(CASE WHEN value < 100 THEN NULL ELSE value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v2
            FROM events
        """,
        "fill_empty": """
            SELECT doc_id, CASE WHEN lang = 'en' THEN 'N/A' ELSE source END AS src2
            FROM documents
        """,
        "rank": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC) AS rank
            FROM lineitem
        """,
        "decimate": """
            SELECT o_orderkey, o_totalprice FROM (
              SELECT o_orderkey, o_totalprice, row_number() OVER (ORDER BY o_orderkey) AS rn
              FROM orders) WHERE rn % 10 = 0
        """,
        "head_group": """
            SELECT o_orderkey, o_orderstatus FROM (
              SELECT o_orderkey, o_orderstatus,
                     row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn
              FROM orders) WHERE rn <= 2
        """,
        "tail_group": """
            SELECT o_orderkey, o_orderstatus FROM (
              SELECT o_orderkey, o_orderstatus,
                     row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey DESC) AS rn
              FROM orders) WHERE rn <= 2
        """,
        "cat_numbered": """
            SELECT row_number() OVER (ORDER BY r_regionkey) AS n, r_regionkey, r_name
            FROM region
        """,
        "join_inner": """
            SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "join_anti": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "join_left_outer": """
            SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY 1, 2
        """,
        "nest_explode": """
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        """,
        "nest_implode": """
            SELECT doc_id, array_to_string(list_sort(string_split(text, ' ')), ' ') AS sorted_text
            FROM documents
        """,
        "reshape_l2w": """
            SELECT user_id,
                   round(avg(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
                   round(avg(CASE WHEN event_type = 'error' THEN value END), 6) AS error,
                   round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
                   round(avg(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
                   round(avg(CASE WHEN event_type = 'view' THEN value END), 6) AS view
            FROM events GROUP BY 1
        """,
        "reshape_w2l": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        """,
        "sec2gmt": """
            SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_gmt,
                   cast(ts AS DATE) AS ts_date
            FROM events
        """,
        "seqgen": "SELECT i FROM range(1, 101) t(i)",
        "case_upper": "SELECT p_partkey, upper(p_name) AS p_name FROM part",
        "gsub": "SELECT p_partkey, regexp_replace(p_name, '[aeiou]', '*', 'g') AS p_name FROM part",
        "clean_whitespace": """
            SELECT p_partkey,
                   regexp_replace(trim('  ' || p_name || '   x  '), '\\s+', ' ', 'g') AS messy
            FROM part
        """,
        "repeat": """
            SELECT r_regionkey, r_name FROM region, range(3)
        """,
        "template": """
            SELECT r_regionkey, r_name, CAST(NULL AS VARCHAR) AS extra FROM region
        """,
        "json_parse": """
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
        """,
        "grep": """
            SELECT doc_id FROM documents WHERE regexp_matches(text, 'batch join')
        """,
        "sort_multi": """
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            ORDER BY o_orderstatus ASC, o_totalprice DESC
        """,
        "token_count": """
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
        """,
        "quality_score": """
            WITH f AS (
              SELECT doc_id,
                     length(text) AS nc,
                     len(string_split(text, ' ')) AS nt,
                     len(list_filter(string_split(text, ' '), t -> t = 'the'))
                     + len(list_filter(string_split(text, ' '), t -> t = 'and'))
                     + len(list_filter(string_split(text, ' '), t -> t = 'of')) AS stop,
                     length(regexp_replace(text, '[a-z ]', '', 'g')) AS nonalpha
              FROM documents)
            SELECT doc_id,
                   round(least(nc / 500.0, 1.0), 6) AS len_score,
                   round((nc - nonalpha) * 1.0 / nc, 6) AS alpha_ratio,
                   round(least(10.0 * stop / nt, 1.0), 6) AS stop_ratio,
                   round((least(nc / 500.0, 1.0) + (nc - nonalpha) * 1.0 / nc
                          + least(10.0 * stop / nt, 1.0)) / 3.0, 6) AS quality_score
            FROM f
        """,
        "lang_id": """
            WITH s AS (
              SELECT doc_id,
                len(list_filter(string_split(text,' '), t -> t='der'))
                + len(list_filter(string_split(text,' '), t -> t='und'))
                + len(list_filter(string_split(text,' '), t -> t='die')) AS s_de,
                len(list_filter(string_split(text,' '), t -> t='the'))
                + len(list_filter(string_split(text,' '), t -> t='and'))
                + len(list_filter(string_split(text,' '), t -> t='of')) AS s_en,
                len(list_filter(string_split(text,' '), t -> t='el'))
                + len(list_filter(string_split(text,' '), t -> t='de'))
                + len(list_filter(string_split(text,' '), t -> t='los')) AS s_es,
                len(list_filter(string_split(text,' '), t -> t='le'))
                + len(list_filter(string_split(text,' '), t -> t='et'))
                + len(list_filter(string_split(text,' '), t -> t='les')) AS s_fr,
                len(list_filter(string_split(text,' '), t -> t='i'))
                + len(list_filter(string_split(text,' '), t -> t='v'))
                + len(list_filter(string_split(text,' '), t -> t='ne')) AS s_ru
              FROM documents)
            SELECT doc_id,
                   CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_ru) = 0 THEN 'und'
                        WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_ru) THEN 'de'
                        WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_ru) THEN 'en'
                        WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_ru) THEN 'es'
                        WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_ru) THEN 'fr'
                        ELSE 'ru' END AS lang_pred
            FROM s
        """,
        "fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "dedup_exact_stats": """
            SELECT count(*) AS n_rows, count(DISTINCT md5(text)) AS n_unique FROM documents
        """,
        "dedup_keep_first": """
            SELECT doc_id, lang FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
        """,
        "ngram_jaccard": """
            WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                       FROM documents WHERE lang = 'de')
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.toks, b.toks)) * 1.0
                         / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
            FROM t a, t b
            WHERE a.doc_id < b.doc_id
              AND len(list_intersect(a.toks, b.toks)) * 1.0
                  / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
        """,
        "ann_brute_force": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qv), 4) AS cosine
            FROM embeddings, q
            ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv) DESC, vec_id ASC
            LIMIT 10
        """,
    }
