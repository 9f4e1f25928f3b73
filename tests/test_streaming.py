"""Structured Streaming: windowed stats1 with watermark, HLL as a
custom stateful operator (applyInPandasWithState), and the resumable
foreachBatch sketch-state sink — each validated against the batch
answer on the same data (file-source stream, Trigger.AvailableNow)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from mlrsketch import streaming as st  # noqa: E402
from mlrsketch.agg import SketchSpec, partial_states  # noqa: E402
from mlrsketch.sketches import HyperLogLog  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    """events split into 4 files so AvailableNow runs multiple batches."""
    path = str(tmp_path_factory.mktemp("stream_src"))
    batch = spark.read.parquet(os.path.join(SF, "events.parquet")).withColumn(
        "ts", F.col("ts").cast("timestamp")  # NTZ -> LTZ: watermarks need TIMESTAMP
    )
    batch.repartition(4).write.mode("overwrite").parquet(path)
    schema = batch.schema
    return path, schema


def _run_available_now(sdf, name, output_mode, max_files=2):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_stats1_matches_batch(spark, stream_src):
    path, schema = stream_src
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(path)
    out = st.stream_stats1(
        sdf, ["count", "sum", "min", "max"], ["value"], time_col="ts",
        window="6 hours", by=["event_type"], watermark="1 hour",
    )
    _run_available_now(out, "t_stats1", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["value_count"], round(r["value_sum"], 6))
        for r in spark.sql("select * from t_stats1").collect()
    }

    batch = spark.read.parquet(path)
    exp = {
        (r["ws"], r["event_type"]): (r["c"], round(r["s"], 6))
        for r in batch.groupBy(
            F.window("ts", "6 hours").alias("w"), "event_type"
        )
        .agg(F.count("value").alias("c"), F.sum("value").alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "c", "s")
        .collect()
    }
    assert got == exp and len(got) > 5


def test_stream_hll_stateful_matches_exact(spark, stream_src):
    path, schema = stream_src
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    out = st.stream_count_distinct_hll(sdf, of="event_id", by=["event_type"], p=12)
    _run_available_now(out, "t_hll", "update")
    rows = spark.sql("select * from t_hll").collect()
    # update mode emits one row per group per batch touching it — keep the
    # last (max n_batches) per group
    best: dict[str, tuple[int, float, float]] = {}
    for r in rows:
        cur = best.get(r["event_type"])
        if cur is None or r["n_batches"] > cur[0]:
            best[r["event_type"]] = (r["n_batches"], r["distinct_count_est"], r["error_bound"])

    exact = {
        r["event_type"]: r["d"]
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("d"))
        .collect()
    }
    assert set(best) == set(exact)
    for etype, (nb, est, bound) in best.items():
        assert nb >= 2, "stream should have processed multiple batches"
        assert abs(est - exact[etype]) <= 4 * bound * exact[etype] + 2, (
            etype, est, exact[etype], bound,
        )


def test_foreach_batch_state_sink_resumable(spark, stream_src, tmp_path):
    path, schema = stream_src
    state_dir = str(tmp_path / "hll_states")
    ckpt = str(tmp_path / "ckpt")

    spec = SketchSpec(
        make=lambda: HyperLogLog(p=12),
        update=lambda sk, pdf: sk.update_hashes(
            pdf["__h"].to_numpy(dtype="int64")
        ),
        finalize=lambda sk: None,
        deserialize=HyperLogLog.deserialize,
    )
    sink = st.sketch_foreach_batch(
        lambda bdf: partial_states(bdf, "event_id", spec), state_dir
    )
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = st.read_merged_states(spark, state_dir, HyperLogLog.deserialize)
    exact = spark.read.parquet(path).select("event_id").distinct().count()
    assert abs(merged.estimate() - exact) <= 4 * merged.error_bound() * exact + 2

    # resume: restarting with the same checkpoint reprocesses nothing,
    # so the merged estimate is unchanged (exactly-once accumulation)
    q2 = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    merged2 = st.read_merged_states(spark, state_dir, HyperLogLog.deserialize)
    assert merged2.estimate() == merged.estimate()


def test_stream_kll_stateful_matches_exact(spark, stream_src):
    path, schema = stream_src
    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(path)
    out = st.stream_quantiles_kll(sdf, of="value", by=["event_type"], qs=(0.5, 0.9))
    q = (
        out.writeStream.format("memory").queryName("t_kll").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from t_kll").collect()
    best = {}
    for r in rows:
        cur = best.get(r["event_type"])
        if cur is None or r["n_batches"] > cur["n_batches"]:
            best[r["event_type"]] = r.asDict()

    batch = spark.read.parquet(path)
    for etype, got in best.items():
        grp = batch.filter(F.col("event_type") == etype)
        n = grp.count()
        for q_, col in ((0.5, "p50"), (0.9, "p90")):
            est = got[col]
            rank = grp.filter(F.col("value") <= est).count() / n
            assert abs(rank - q_) <= 3 * got["rank_error_bound"] + 2.0 / n, (
                etype, col, est, rank,
            )


def test_stream_sketch_profile_matches_batch(spark, tmp_path_factory):
    """The fused HLL+KLL+TopK profile as a stateful stream: final
    per-lang numbers must match the batch sketch_profile over the same
    documents (associative merges => stream order is irrelevant)."""
    path = str(tmp_path_factory.mktemp("profile_src"))
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    docs.repartition(4).write.mode("overwrite").parquet(path)
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = st.stream_sketch_profile(
        sdf, url_col="doc_id", text_col="text", by=["lang"], p=12, kll_k=1024
    )
    _run_available_now(out, "t_profile", "update")
    rows = spark.sql("select * from t_profile").collect()
    best = {}
    for r in rows:
        cur = best.get(r["lang"])
        if cur is None or r["n_batches"] > cur["n_batches"]:
            best[r["lang"]] = r.asDict()

    from mlrsketch.verbs import sketch as sv

    batch = {
        r["lang"]: r.asDict()
        for r in sv.sketch_profile(
            docs, url_col="doc_id", text_col="text", by=["lang"], p=12, kll_k=1024
        ).collect()
    }
    assert set(best) == set(batch)
    for lang, b in batch.items():
        s = best[lang]
        assert s["n_batches"] >= 2
        # sparse HLL + uncompacted KLL at this scale: exact equality
        assert s["url_distinct_est"] == b["url_distinct_est"]
        for q in ("len_p50", "len_p90", "len_p99"):
            assert s[q] == b[q], (lang, q, s[q], b[q])
        assert s["top_tokens"].split(",") == b["top_tokens"]
