"""Unit tests for the put/filter DSL compiler (mlrsketch/dsl) —
semantics pinned by the reference's disposition matrices
(pkg/bifs/arithmetic.go etc.). The broad behavioral gate is
tests/test_golden_dsl.py (480+ replayed reference cases); these cover
the load-bearing corners directly."""

from __future__ import annotations

import pytest

from mlrsketch import dsl
from mlrsketch.dsl.parser import DslSyntaxError, DslUnsupported, parse_program


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, 0.5, "pan", "3"),
            (2, 1.5, "eks", ""),
            (3, 2.5, "wye", None),
            (4, None, "abc", "x"),
        ],
        "i bigint, x double, a string, s string",
    )


def rows(out):
    return [r.asDict() for r in out.orderBy("i").collect()]


class TestArithmetic:
    def test_native_and_absent_identity(self, df, spark):
        r = rows(dsl.put(df, "$j = $i + $i; $k = $x * 2; $d = $x - $i"))
        assert r[0]["j"] == 2 and r[0]["k"] == 1.0
        # absent x: x*2 = 2 (absent is identity), x - i returns i (sic)
        assert r[3]["k"] == 2.0
        assert r[3]["d"] == 4.0

    def test_carrier_void_and_error(self, df):
        r = rows(dsl.put(df, "$n = $s + 1"))
        assert r[0]["n"] == "4"      # "3" + 1
        assert r[1]["n"] == "1"      # void + 1 -> the number
        assert r[2]["n"] == "1"      # absent + 1 -> the number
        assert r[3]["n"] == "(error)"  # "x" + 1

    def test_string_literal_arith_is_error(self, df):
        r = rows(dsl.put(df, '$e = "3" + 4'))
        assert all(x["e"] == "(error)" for x in r)

    def test_pythonic_mod_and_intdiv(self, df):
        r = rows(dsl.put(df, "$m = (0 - $i) % 3; $f = $i // 2"))
        assert r[0]["m"] == 2.0 and r[0]["f"] == 0.0  # -1 % 3 = 2
        assert r[3]["f"] == 2.0

    def test_division_by_zero_is_inf_not_crash(self, df):
        r = rows(dsl.put(df, "$z = $i / 0"))
        assert r[0]["z"] == float("inf")


class TestLogicAndComparison:
    def test_filter(self, df):
        out = dsl.filter_records(df, "$i % 2 == 1")
        assert sorted(r.i for r in out.collect()) == [1, 3]

    def test_smart_compare_numeric_strings(self, df):
        r = rows(dsl.put(df, '$c = $s > 2'))
        assert r[0]["c"] is True  # "3" compares numerically

    def test_short_circuit_error_semantics(self, df):
        r = rows(dsl.put(df, "$z = false && 4; $w = true && 4"))
        assert r[0]["z"] == "false" and r[0]["w"] == "(error)"

    def test_coalesce_operators(self, df):
        r = rows(dsl.put(df, '$p = $s ?? "dflt"; $q = $s ??? "dflt"'))
        assert r[1]["p"] == "" and r[1]["q"] == "dflt"   # void passes ??
        assert r[2]["p"] == "dflt" and r[2]["q"] == "dflt"


class TestStatements:
    def test_if_elif_else_sequential(self, df):
        r = rows(dsl.put(df, 'if ($i > 2) { $t = "hi"; $i = $i * 10 } else { $t = "lo" }'))
        assert [x["i"] for x in r] == [1, 2, 30, 40]
        assert [x["t"] for x in r] == ["lo", "lo", "hi", "hi"]

    def test_locals_and_op_assign(self, df):
        r = rows(dsl.put(df, "var t = $i * 100; $z = t + 1; $z *= 2"))
        assert r[0]["z"] == 202.0

    def test_unset(self, df):
        out = dsl.put(df, "unset $a")
        assert "a" not in out.columns

    def test_filter_statement_inside_put(self, df):
        out = dsl.put(df, "filter $i > 2; $y = $i")
        assert sorted(r.i for r in out.collect()) == [3, 4]

    def test_pattern_action(self, df, spark):
        d2 = df.withColumn("__ord", df.i - 1)
        out = dsl.put(d2, "NR == 2 { $z = 100 }", nr_col="__ord", exclude=("__ord",))
        got = {r.i: r.z for r in out.collect()}
        assert got[2] == 100 and got[1] is None


class TestUnsupported:
    @pytest.mark.parametrize(
        "prog",
        [
            "@sum += $x",
            "begin { print 1 }",
            "emit @x",
            "for (k, v in $*) { }",
            "func f(x) { return x }",
            "$y = $*",
        ],
    )
    def test_out_of_subset_raises(self, prog, df):
        # the full-grammar parser accepts these; the Column compiler is
        # the layer that rejects cross-record / map-valued constructs
        with pytest.raises((DslUnsupported, DslSyntaxError)):
            parse_program(prog)
            dsl.put(df, prog)

    def test_unknown_function_raises(self, df):
        with pytest.raises(DslUnsupported):
            dsl.put(df, "$y = made_up_fn($i)")


class TestPlanShape:
    def test_single_codegen_projection(self, df):
        plan = dsl.put(
            df, '$g = $i * 2; $t = $a . "-" . $i; $c = $i > 2 ? "y" : "n"'
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "a put program must never shuffle"
