"""Unit coverage for the small §2.1/2.2 completeness verbs (the oracle
gate covers the rest)."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from mlrsketch.verbs import exact as ev  # noqa: E402


def test_ssub_first_literal_only(spark):
    df = spark.createDataFrame([("aXbXc",), ("noop",)], ["s"])
    got = {r["s"] for r in ev.ssub_field(df, "s", "X", "-").collect()}
    assert got == {"a-bXc", "noop"}  # first occurrence only, literal


def test_nothing_and_tee(spark, tmp_path):
    df = spark.range(10)
    assert ev.nothing(df).count() == 0
    out = ev.tee(df, str(tmp_path / "tee_out"))
    assert out.count() == 10
    assert spark.read.parquet(str(tmp_path / "tee_out")).count() == 10


def test_latin1_roundtrip(spark):
    df = spark.createDataFrame([("café",)], ["s"])
    rt = ev.latin1_to_utf8(ev.utf8_to_latin1(df, ["s"]), ["s"])
    assert rt.first()["s"] == "café"


def test_histogram_auto_covers_all_rows(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    bins = ev.histogram_auto(df, "x", 10).collect()
    assert len(bins) == 10
    assert sum(r["count"] for r in bins) == 100  # max included via open-top pad


def test_natural_sort_orders_numerically(spark):
    df = spark.createDataFrame([("doc10",), ("doc2",), ("doc1",)], ["s"])
    got = [r["s"] for r in ev.sort(df, [("s", "t")]).collect()]
    assert got == ["doc1", "doc2", "doc10"]


def test_step_rprod_matches_cumprod(spark):
    import numpy as np

    vals = [1.5, 2.0, 0.5, 3.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "v"])
    got = (
        ev.step(df, ["rprod"], ["v"], order_by=["i"])
        .orderBy("i")
        .select("v_rprod")
        .collect()
    )
    exp = np.cumprod(vals)
    for g, e in zip(got, exp):
        assert abs(g["v_rprod"] - e) < 1e-9
