"""AST -> pyspark Column compiler for the Miller DSL scalar subset.

Semantics follow the reference's disposition matrices
(/root/reference/pkg/bifs/arithmetic.go, strings.go, cmp.go):

- Values are dynamically typed int/float/bool/string plus two nulls:
  ABSENT (field missing from the record — here: SQL NULL) and VOID
  (empty string). Arithmetic identities: x+absent=x, absent-x=x (sic,
  minus_dispositions ABSENT row is _2___), absent/x=0, x/void=void,
  non-numeric strings in arithmetic yield the value "(error)".
- Statically-typed columns (long/double) compile to native JVM
  arithmetic with the absent branches only. Data-inferred string
  columns ("any") compile through a string "carrier" that classifies
  each value (absent/void/numeric/string) and applies the full
  disposition — still pure Column logic, whole-stage-codegen'd.

Everything here is a projection: one `select` per program, no shuffle,
no Python row path.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mlrsketch.dsl.parser import DslUnsupported, parse_program

_ERROR = "(error)"


class TC(NamedTuple):
    col: Column
    t: str  # "int" | "float" | "bool" | "str" | "any"


def _lit(v, t) -> TC:
    return TC(F.lit(v), t)


def _fcol(name: str) -> Column:
    """F.col by EXACT name: backtick-quote so dots in Miller field names
    (e.g. `req.id` from flattened JSON) aren't parsed as struct access."""
    return F.col("`" + name.replace("`", "``") + "`")


def _null_tc() -> TC:
    return TC(F.lit(None).cast("string"), "any")


def _dtype_t(dtype: str) -> str:
    if dtype in ("bigint", "int", "smallint", "tinyint", "long"):
        return "int"
    if dtype in ("double", "float", "decimal"):
        return "float"
    if dtype == "boolean":
        return "bool"
    return "any"


# --------------------------------------------------------------------------
# conversions
# --------------------------------------------------------------------------


_NUMERIC = ("int", "float", "num")


def to_str(a: TC) -> Column:
    """Miller-style string form: ints plain, floats without a trailing
    .0 (Go %v prints 3.0 as 3), booleans lowercase. NULL stays NULL."""
    if a.t == "int":
        return a.col.cast("string")
    if a.t in ("float", "num"):
        s = a.col.cast("string")
        return F.regexp_replace(s, r"^(-?\d+)\.0$", "$1")
    if a.t == "bool":
        return F.when(a.col, "true").otherwise("false")
    return a.col.cast("string")


def to_num(a: TC) -> Column:
    # NOTE: this is the hottest coercion in the compiler and its tree is
    # duplicated into every arithmetic node over untyped operands —
    # keep it ONE try_cast. (A round-4 experiment inlined the full
    # leading-zero/hex scan here; nested expressions multiplied the
    # subtree until the driver OOMed building the plan. The per-value
    # inference divergence — "0123" is a string in Miller — is the
    # stream interpreter's contract, not this tier's.)
    if a.t in _NUMERIC:
        return a.col
    if a.t == "bool":
        return F.lit(None).cast("double")
    return a.col.cast("string").try_cast("double")


def to_bool(a: TC) -> Column:
    if a.t == "bool":
        return a.col
    s = a.col.cast("string")
    return F.when(s == "true", F.lit(True)).when(s == "false", F.lit(False))


def _num_str(c: Column) -> Column:
    """Format a double result the way Miller prints numbers."""
    s = c.cast("string")
    return F.regexp_replace(s, r"^(-?\d+)\.0$", "$1")


# --------------------------------------------------------------------------
# arithmetic
# --------------------------------------------------------------------------


def _num_core(op: str, x: Column, y: Column) -> Column:
    """All arithmetic runs in double precision: ANSI mode makes integral
    ops fail hard (overflow, /0), while Miller auto-overflows int to
    float and yields +/-Inf on zero division — IEEE double semantics.
    Integer-looking results print back as ints through _num_str."""
    x, y = x.cast("double"), y.cast("double")

    def div0(num):  # IEEE x/0 without tripping ANSI (even in const-fold)
        return (
            F.when(num > 0, F.lit(float("inf")))
            .when(num < 0, F.lit(float("-inf")))
            .otherwise(F.lit(float("nan")))
        )

    def safe_div(a_, b_):
        return F.when(b_ != 0, F.try_divide(a_, b_)).otherwise(div0(a_))

    def dfloor(d):  # floor on doubles without the long-overflow cast
        return F.when(F.abs(d) < 9.0e15, F.floor(d).cast("double")).otherwise(d)

    if op == "+":
        return x + y
    if op == "-":
        return x - y
    if op == "*":
        return x * y
    if op == "/":
        return safe_div(x, y)
    if op == "//":
        return dfloor(safe_div(x, y))
    if op == "%":
        # pythonic mod (reference modulus_i_ii): sign follows the divisor
        return F.when(y != 0, x - y * dfloor(F.try_divide(x, y))).otherwise(div0(x))
    if op == "**":
        return F.pow(x, y)
    raise DslUnsupported(f"operator {op}")


# per-op disposition when one side is ABSENT and the other numeric:
# value returned for (absent OP num, num OP absent)
_ABSENT_RULES = {
    "+": ("other", "other"),
    "-": ("other", "other"),  # minus_dispositions ABSENT row: _2___
    "*": ("other", "other"),
    "/": ("zero", "other"),
    "//": ("zero", "other"),
    "%": ("zero", "other"),
    "**": ("other", "other"),
}

# (void OP num, num OP void) — "void" result means empty string
_VOID_RULES = {
    "+": ("other", "other"),
    "-": ("negother", "other"),  # minus VOID row: _n2__
    "*": ("other", "other"),
    "/": ("void", "void"),
    "//": ("void", "void"),
    "%": ("void", "void"),
    "**": ("other", "other"),
}


def _out_t(a: TC, b: TC) -> str:
    return "float" if "float" in (a.t, b.t) else "num"


def _native_arith(op: str, a: TC, b: TC) -> TC:
    x, y = a.col.cast("double"), b.col.cast("double")
    core = _num_core(op, x, y)
    l_abs, r_abs = _ABSENT_RULES[op]

    def pick(rule, other):
        if rule == "other":
            return other
        return F.lit(0.0)

    res = (
        F.when(x.isNull() & y.isNull(), F.lit(None))
        .when(x.isNull(), pick(l_abs, y))
        .when(y.isNull(), pick(r_abs, x))
        .otherwise(core)
    )
    return TC(res, _out_t(a, b))


def _carrier_arith(op: str, a: TC, b: TC) -> TC:
    a_s, b_s = to_str(a), to_str(b)
    an, bn = to_num(a), to_num(b)
    aA, bA = a_s.isNull(), b_s.isNull()
    aV, bV = a_s == "", b_s == ""
    aN, bN = an.isNotNull(), bn.isNotNull()
    core = _num_core(op, an, bn)
    # int-int stays int-looking through _num_str; true float results
    # print as floats
    num_result = _num_str(core)
    l_abs, r_abs = _ABSENT_RULES[op]
    l_void, r_void = _VOID_RULES[op]

    def pick(rule, other_s, other_n):
        if rule == "other":
            return other_s
        if rule == "zero":
            return F.lit("0")
        if rule == "void":
            return F.lit("")
        if rule == "negother":
            return _num_str(-other_n)
        raise AssertionError(rule)

    res = (
        F.when(aA & bA, F.lit(None))
        .when(aA & bV, F.lit(None))
        .when(aV & bA, F.lit(None))
        .when(aV & bV, F.lit(""))
        .when(aA & bN, pick(l_abs, b_s, bn))
        .when(bA & aN, pick(r_abs, a_s, an))
        .when(aV & bN, pick(l_void, b_s, bn))
        .when(bV & aN, pick(r_void, a_s, an))
        .when(aN & bN, num_result)
        .otherwise(F.lit(_ERROR))
    )
    return TC(res, "any")


def _arith(op: str, a: TC, b: TC) -> TC:
    if a.t in _NUMERIC and b.t in _NUMERIC:
        return _native_arith(op, a, b)
    if a.t in ("bool", "str") or b.t in ("bool", "str"):
        # string LITERALS stay strings in Miller ("3"+4 is a type
        # error); only values read from data are type-inferred
        return TC(F.lit(_ERROR), "str")
    return _carrier_arith(op, a, b)


def _dot(a: TC, b: TC) -> TC:
    res = F.when(
        a.col.isNull() & b.col.isNull(), F.lit(None)
    ).otherwise(F.concat(F.coalesce(to_str(a), F.lit("")), F.coalesce(to_str(b), F.lit(""))))
    return TC(res, "str")


# --------------------------------------------------------------------------
# comparison / logic
# --------------------------------------------------------------------------


def _cmp(op: str, a: TC, b: TC) -> TC:
    def c(x, y):
        if op == "<":
            return x < y
        if op == "<=":
            return x <= y
        if op == ">":
            return x > y
        if op == ">=":
            return x >= y
        if op == "==":
            return x == y
        if op == "!=":
            return x != y
        raise AssertionError(op)

    if a.t in _NUMERIC and b.t in _NUMERIC:
        return TC(c(a.col, b.col), "bool")
    if a.t == "bool" and b.t == "bool":
        return TC(c(a.col, b.col), "bool")
    an, bn = to_num(a), to_num(b)
    a_s, b_s = to_str(a), to_str(b)
    res = F.when(an.isNotNull() & bn.isNotNull(), c(an, bn)).otherwise(c(a_s, b_s))
    return TC(res, "bool")


def _logic(op: str, a: TC, b: TC) -> TC:
    """&&/||/^^ with the reference's type rules (pkg/bifs/booleans.go):
    non-boolean operands are a type error UNLESS short-circuit decides
    first (false && X = false, true || X = true). Data-inferred strings
    are never booleans in Miller; absent propagates to absent."""
    a_b = a.t == "bool"
    b_b = b.t == "bool"
    ab, bb = to_bool(a), to_bool(b)
    if a_b and b_b:
        if op == "&&":
            return TC(ab & bb, "bool")
        if op == "||":
            return TC(ab | bb, "bool")
        return TC(ab != bb, "bool")
    if a_b and op in ("&&", "||"):
        # right side non-boolean: only the short-circuit value survives
        sc_val, sc_cond = ("false", ~ab) if op == "&&" else ("true", ab)
        res = F.when(sc_cond, F.lit(sc_val)).when(
            a.col.isNull() | b.col.isNull(), F.lit(None)
        ).otherwise(F.lit(_ERROR))
        return TC(res, "any")
    # left side non-boolean (or ^^): absent propagates, else error
    res = F.when(a.col.isNull() | b.col.isNull(), F.lit(None)).otherwise(
        F.lit(_ERROR)
    )
    return TC(res, "any")


def _spaceship(a: TC, b: TC) -> TC:
    lt = _cmp("<", a, b).col
    eq = _cmp("==", a, b).col
    return TC(F.when(eq, 0).when(lt, -1).otherwise(1), "int")


def _unify(a: TC, b: TC) -> tuple[Column, Column, str]:
    if a.t == b.t:
        return a.col, b.col, a.t
    if a.t in _NUMERIC and b.t in _NUMERIC:
        return a.col.cast("double"), b.col.cast("double"), "num"
    return to_str(a), to_str(b), "any"


# --------------------------------------------------------------------------
# builtin functions
# --------------------------------------------------------------------------


def _go_time_to_java(fmt: str) -> str:
    """Translate the strftime subset Miller uses to a Java pattern."""
    mapping = {
        "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
        "%S": "ss", "%y": "yy", "%j": "DDD", "%a": "EEE", "%A": "EEEE",
        "%b": "MMM", "%B": "MMMM", "%e": "d", "%F": "yyyy-MM-dd",
        "%T": "HH:mm:ss", "%p": "a", "%z": "xx", "%Z": "zz",
    }
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%":
            d = fmt[i : i + 2]
            if d == "%%":
                out.append("%")
                i += 2
                continue
            if d not in mapping:
                raise DslUnsupported(f"strftime directive {d}")
            out.append(mapping[d])
            i += 2
        else:
            ch = fmt[i]
            # quote Java-pattern letters appearing literally
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def _translate_printf(fmt: str) -> str:
    """Miller fmtnum accepts Go verbs with optional l/ll length
    modifiers; Spark's format_string is Java printf. Strip the length
    modifiers, map %x family through java equivalents."""
    return re.sub(r"%([0-9.#+\- ]*)(?:l|ll)?([dxXobeEfgGs])", r"%\1\2", fmt)


def _pattern_lit(node) -> str:
    """Literal regex argument; ("regexi", p) becomes (?i)p."""
    if node[0] == "str":
        return node[1]
    if node[0] == "regexi":
        return "(?i)" + node[1]
    raise DslUnsupported("non-literal regex pattern")


def _ssub(args: list[TC]) -> TC:
    """Literal FIRST-occurrence replacement (reference strings.go ssub)."""
    s, t, rep = to_str(args[0]), to_str(args[1]), to_str(args[2])
    pos = F.instr(s, t)
    res = F.when(
        pos > 0,
        F.concat(
            F.substring(s, F.lit(1), (pos - 1).try_cast("int")),
            rep,
            F.substring(
                s, (pos + F.length(t)).try_cast("int"), F.lit(2147483647)
            ),
        ),
    ).otherwise(s)
    return TC(res, "str")


def _sub_builder(all_matches: bool):
    def build(args: list[TC], raw_args) -> TC:
        s, pat, rep = args
        if raw_args[2][0] != "str":
            raise DslUnsupported("sub with non-literal replacement")
        pattern, repl = _pattern_lit(raw_args[1]), raw_args[2][1]
        repl = repl.replace("$", "\\$")
        repl = re.sub(r"\\(\d)", r"$\1", repl)
        if all_matches:
            res = F.regexp_replace(to_str(s), pattern, repl)
        else:
            flags = "(?s)"
            if pattern.startswith("(?i)"):
                flags, pattern = "(?si)", pattern[4:]
            n_inner = re.compile(pattern).groups
            shifted = re.sub(r"(?<!\\)\$(\d)", lambda m: f"${int(m.group(1)) + 1}", repl)
            res = F.regexp_replace(
                to_str(s), f"{flags}({pattern})(.*)", shifted + f"${n_inner + 2}"
            )
        return TC(res, "str")

    return build


def _strftime(args: list[TC], raw_args) -> TC:
    t, fmt = args
    if raw_args[1][0] != "str":
        raise DslUnsupported("strftime with non-literal format")
    pat = _go_time_to_java(raw_args[1][1])
    n = to_num(t)
    s = t.col.cast("string")
    res = (
        F.when(n.isNotNull(), F.date_format(F.timestamp_seconds(n), pat))
        .when(s.isNull(), F.lit(None))
        .when(s == "", F.lit(""))
        .otherwise(F.lit(_ERROR))
    )
    return TC(res, "any")


def _strptime(args: list[TC], raw_args) -> TC:
    s, fmt = args
    if raw_args[1][0] != "str":
        raise DslUnsupported("strptime with non-literal format")
    pat = _go_time_to_java(raw_args[1][1])
    # Go's %S tolerates fractional seconds: parse the whole part, add
    # the fraction back (a bare ".Z" stays unparseable and errors)
    txt = F.regexp_replace(to_str(s), r"\.\d+", "")
    secs = F.unix_seconds(F.try_to_timestamp(txt, F.lit(pat)))
    frac = F.coalesce(
        F.concat(F.lit("0."), F.regexp_extract(to_str(s), r"\.(\d+)", 1)).try_cast(
            "double"
        ),
        F.lit(0.0),
    )
    res = (
        F.when(secs.isNotNull(), _num_str(secs.cast("double") + frac))
        .when(s.col.isNull(), F.lit(None))
        .when(s.col.cast("string") == "", F.lit(""))
        .otherwise(F.lit(_ERROR))
    )
    return TC(res, "any")


def _sec2gmt(args: list[TC], raw_args) -> TC:
    num = to_num(args[0])
    s = args[0].col.cast("string")
    base = F.date_format(F.timestamp_seconds(F.floor(num)), "yyyy-MM-dd'T'HH:mm:ss")
    iso = F.concat(base, F.lit("Z"))
    if len(args) > 1:
        if raw_args[1][0] != "int":
            raise DslUnsupported("sec2gmt with non-literal decimals")
        dec = raw_args[1][1]
        frac = F.floor((num - F.floor(num)) * (10 ** dec)).try_cast("long")
        iso = F.concat(base, F.lit("."), F.lpad(frac.cast("string"), dec, "0"), F.lit("Z"))
    if len(args) > 1:
        res = (
            F.when(num.isNotNull(), iso)
            .when(s.isNull(), F.lit(None))
            .otherwise(F.lit(_ERROR))
        )
    else:
        res = (
            F.when(num.isNotNull(), iso)
            .when(s.isNull(), F.lit(None))
            .otherwise(s)  # verb-like passthrough, "" included
        )
    return TC(res, "any")


def _gmt2sec(a: TC) -> TC:
    s = to_str(a)
    whole = F.unix_seconds(
        F.try_to_timestamp(
            F.regexp_replace(s, r"\.\d+", ""), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")
        )
    )
    frac = F.coalesce(
        F.concat(F.lit("0."), F.regexp_extract(s, r"\.(\d+)", 1)).try_cast("double"),
        F.lit(0.0),
    )
    res = (
        F.when(whole.isNotNull(), _num_str(whole.cast("double") + frac))
        .when(s.isNull(), F.lit(None))
        .otherwise(F.lit(_ERROR))
    )
    return TC(res, "any")


def _typeof(a: TC, raw) -> TC:
    if a.t == "int":
        res = F.when(a.col.isNull(), "absent").otherwise("int")
    elif a.t == "num":
        d = a.col.cast("double")
        res = (
            F.when(a.col.isNull(), "absent")
            .when(~F.isnan(d) & (d == F.floor(d)), "int")
            .otherwise("float")
        )
    elif a.t == "float":
        res = F.when(a.col.isNull(), "absent").otherwise("float")
    elif a.t == "bool":
        res = F.when(a.col.isNull(), "absent").otherwise("boolean")
    elif raw is not None and raw[0] == "str":
        res = F.lit("empty" if raw[1] == "" else "string")
    else:
        s = a.col.cast("string")
        res = (
            F.when(s.isNull(), "absent")
            .when(s == "", "empty")
            # leading-zero decimal ints are STRINGS by default
            # (io-infer-flags/default; -O opts into octal)
            .when(s.rlike(r"^[+-]?0[0-9]+$"), "string")
            .when(
                s.rlike(r"^-?[0-9]+$")
                | s.rlike(r"^[+-]?0[xX][0-9a-fA-F]+$")
                | s.rlike(r"^[+-]?0[bB][01]+$"),
                "int",
            )
            .when(s.rlike(r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"), "float")
            .otherwise("string")
        )
    return TC(res, "str")


def _num_fn(fn, t="float"):
    return lambda args, raw: TC(fn(to_num(args[0])), t)


def _num2_fn(fn, t="float"):
    return lambda args, raw: TC(fn(to_num(args[0]), to_num(args[1])), t)


def _str_fn(fn):
    return lambda args, raw: TC(fn(to_str(args[0])), "str")


def _is_pred(build):
    return lambda args, raw: TC(build(args[0]), "bool")


def _minmax(greatest: bool):
    def build(args: list[TC], raw) -> TC:
        if not args:
            return _null_tc()
        # least/greatest skip SQL NULLs — Miller's absent-loses rule
        numeric = all(a.t in _NUMERIC for a in args)
        if numeric:
            cols = [a.col.cast("double") for a in args]
            t = "float" if any(a.t == "float" for a in args) else "num"
            if len(cols) == 1:
                return TC(cols[0], t)
            res = F.greatest(*cols) if greatest else F.least(*cols)
            return TC(res, t)
        # mixed: numerics sort below strings (reference cmp.go);
        # min prefers numeric, max prefers string
        nums = [to_num(a) for a in args]
        strs = [to_str(a) for a in args]
        num_best = (
            nums[0] if len(nums) == 1
            else (F.least(*nums) if not greatest else F.greatest(*nums))
        )
        str_nonnum = [
            F.when(n.isNull() & s.isNotNull(), s)
            for n, s in zip(nums, strs)
        ]
        str_best = (
            F.least(*str_nonnum) if not greatest else F.greatest(*str_nonnum)
        ) if len(str_nonnum) > 1 else str_nonnum[0]
        if greatest:
            res = F.when(str_best.isNotNull(), str_best).otherwise(_num_str(num_best))
        else:
            res = F.when(num_best.isNotNull(), _num_str(num_best)).otherwise(str_best)
        return TC(res, "any")

    return build


def _substr(up: int):
    def build(args: list[TC], raw) -> TC:
        s, m, n = to_str(args[0]), to_num(args[1]), to_num(args[2])
        start = (m + (1 - up)).try_cast("int")
        length = (n - m + 1).try_cast("int")
        return TC(F.substring(s, start, length), "str")

    return build


def _format(args: list[TC], raw) -> TC:
    if raw[0][0] != "str":
        raise DslUnsupported("format with non-literal template")
    parts = raw[0][1].split("{}")
    if len(parts) != len(args):
        raise DslUnsupported("format placeholder/arg mismatch")
    pieces: list[Column] = [F.lit(parts[0])]
    for a, p in zip(args[1:], parts[1:]):
        pieces.append(F.coalesce(to_str(a), F.lit("")))
        pieces.append(F.lit(p))
    return TC(F.concat(*pieces), "str")


def _int_scan(s: Column) -> Column:
    """Miller's integer literal scan over a string column: decimal,
    0x/0X hex, 0b/0B binary, leading-0 octal (pkg/lib/mlrval parse);
    NULL when the string is not an int literal."""
    sign = F.when(s.startswith("-"), F.lit(-1)).otherwise(F.lit(1)).cast("long")
    body = F.regexp_replace(s, r"^[-+]", "")
    return (
        F.when(body.rlike(r"^0[xX][0-9a-fA-F]+$"),
               F.conv(F.regexp_replace(body, r"^0[xX]", ""), 16, 10).try_cast("long") * sign)
        .when(body.rlike(r"^0[bB][01]+$"),
              F.conv(F.regexp_replace(body, r"^0[bB]", ""), 2, 10).try_cast("long") * sign)
        .when(body.rlike(r"^0[0-7]+$"), F.conv(body, 8, 10).try_cast("long") * sign)
        .when(body.rlike(r"^[0-9]+$"), body.try_cast("long") * sign)
    )


def _cast_int(a: TC) -> TC:
    """int(x): ints pass through; floats truncate toward zero; bools
    0/1; strings must be INT literals (a float-looking string is
    (error), reference dsl-type-reflect/0001)."""
    if a.t == "int":
        return a
    if a.t in ("float", "num"):
        # numeric VALUES truncate toward zero (int+int stays int in
        # Miller; the compiled numeric tier carries it as double) —
        # only float-looking STRINGS are (error)
        return TC(a.col.try_cast("long"), "int")
    if a.t == "bool":
        return TC(F.when(a.col, 1).otherwise(0).cast("long"), "int")
    s = a.col.cast("string")
    i = _int_scan(s)
    res = (
        F.when(s.isNull(), F.lit(None))
        .when(i.isNotNull(), i.cast("string"))
        .otherwise(F.lit(_ERROR))
    )
    return TC(res, "any")


def _cast_float(a: TC) -> TC:
    """float(x): numbers widen; bools 0/1; strings must parse as a
    number (int literals in any base count); else (error)."""
    if a.t in ("float", "num"):
        return a
    if a.t == "int":
        return TC(a.col.cast("double"), "float")
    if a.t == "bool":
        return TC(F.when(a.col, 1.0).otherwise(0.0), "float")
    s = a.col.cast("string")
    d = F.coalesce(s.try_cast("double"), _int_scan(s).cast("double"))
    res = (
        F.when(s.isNull(), F.lit(None))
        .when(s.rlike(r"^(true|false)$"), F.lit(_ERROR))
        .when(d.isNotNull(), _num_str(d))
        .otherwise(F.lit(_ERROR))
    )
    return TC(res, "any")


def _cast_boolean(a: TC) -> TC:
    """boolean(x): bools pass; numbers are 0=false else true; only the
    strings "true"/"false" convert — numeric strings are (error)."""
    if a.t == "bool":
        return a
    if a.t in _NUMERIC:
        return TC(a.col != 0, "bool")
    s = a.col.cast("string")
    # string-column values re-infer per value (CSV/NIDX data arrives as
    # strings): numeric strings act as numbers, like carrier arithmetic
    n = F.coalesce(s.try_cast("double"), _int_scan(s).cast("double"))
    res = (
        F.when(s.isNull(), F.lit(None))
        .when(s == "true", F.lit("true"))
        .when(s == "false", F.lit("false"))
        .when(n.isNotNull(), F.when(n != 0, "true").otherwise("false"))
        .otherwise(F.lit(_ERROR))
    )
    return TC(res, "any")


def _pad_repeats(a: list) -> Column:
    """Whole-pad-string repetitions for leftpad/rightpad
    (bifs/strings.go:266-268): while out+padlen <= target."""
    s, target, pad = to_str(a[0]), to_num(a[1]).try_cast("int"), to_str(a[2])
    k = F.greatest(
        F.floor(F.try_divide(target - F.length(s), F.length(pad))).try_cast("int"),
        F.lit(0),
    )
    return F.coalesce(F.repeat(pad, k), F.lit(""))


_FUNCS = {
    # strings
    "strlen": lambda a, r: TC(F.length(to_str(a[0])), "int"),
    "toupper": _str_fn(F.upper),
    "tolower": _str_fn(F.lower),
    "capitalize": lambda a, r: TC(
        F.concat(F.upper(F.substring(to_str(a[0]), 1, 1)), F.substring(to_str(a[0]), 2, 2147483647)),
        "str",
    ),
    "lstrip": lambda a, r: TC(F.regexp_replace(to_str(a[0]), r"^\s+", ""), "str"),
    "rstrip": lambda a, r: TC(F.regexp_replace(to_str(a[0]), r"\s+$", ""), "str"),
    "strip": lambda a, r: TC(F.regexp_replace(F.regexp_replace(to_str(a[0]), r"^\s+", ""), r"\s+$", ""), "str"),
    "clean_whitespace": lambda a, r: TC(
        F.regexp_replace(F.regexp_replace(F.regexp_replace(to_str(a[0]), r"^\s+", ""), r"\s+$", ""), r"\s+", " "),
        "str",
    ),
    "collapse_whitespace": lambda a, r: TC(F.regexp_replace(to_str(a[0]), r"\s+", " "), "str"),
    "truncate": lambda a, r: TC(
        F.when(to_num(a[1]) >= 0, F.substring(to_str(a[0]), 1, to_num(a[1]).try_cast("int")))
        .when(a[0].col.isNull(), F.lit(None))
        .otherwise(F.lit(_ERROR)),
        "any",
    ),
    "sub": _sub_builder(False),
    "gsub": _sub_builder(True),
    "ssub": lambda a, r: _ssub(a),
    "regextract": lambda a, r: TC(
        F.when(
            to_str(a[0]).rlike(_pattern_lit(r[1])),
            F.regexp_extract(to_str(a[0]), _pattern_lit(r[1]), 0),
        ),
        "str",
    ),
    "regextract_or_else": lambda a, r: TC(
        F.when(
            to_str(a[0]).rlike(_pattern_lit(r[1])),
            F.regexp_extract(to_str(a[0]), _pattern_lit(r[1]), 0),
        ).otherwise(to_str(a[2])),
        "str",
    ),
    "matchx": None,
    "substr": _substr(0),
    "substr_0_up": _substr(0),
    "substr_1_up": _substr(1),
    "format": _format,
    "hexfmt": lambda a, r: TC(
        F.when(
            to_num(a[0]).isNotNull() & (to_num(a[0]) == F.floor(to_num(a[0]))),
            F.concat(F.lit("0x"), F.lower(F.hex(to_num(a[0]).try_cast("long")))),
        ).otherwise(to_str(a[0])),
        "any",
    ),
    "fmtnum": lambda a, r: TC(
        (
            F.when(to_num(a[0]).isNotNull(),
                   F.format_string(_translate_printf(r[1][1]), to_num(a[0])))
            .when(a[0].col.isNull(), F.lit(None))
            .when(a[0].col.cast("string") == "", F.lit(""))
            .otherwise(F.lit(_ERROR))
        )
        if r[1][0] == "str" else (_ for _ in ()).throw(DslUnsupported("fmtnum non-literal")),
        "any",
    ),
    # leftpad/rightpad (bifs/strings.go:242-290): whole copies of the
    # pad string only — never split, so the result may undershoot the
    # target width (unlike SQL lpad/rpad, which truncate the pad)
    "leftpad": lambda a, r: TC(
        F.concat(_pad_repeats(a), to_str(a[0])), "str"
    ),
    "rightpad": lambda a, r: TC(
        F.concat(to_str(a[0]), _pad_repeats(a)), "str"
    ),
    "md5": lambda a, r: TC(F.md5(F.encode(to_str(a[0]), "UTF-8")), "str"),
    "sha1": lambda a, r: TC(F.sha1(F.encode(to_str(a[0]), "UTF-8")), "str"),
    "sha256": lambda a, r: TC(F.sha2(F.encode(to_str(a[0]), "UTF-8"), 256), "str"),
    "crc32": lambda a, r: TC(F.crc32(F.encode(to_str(a[0]), "UTF-8")), "int"),
    # math
    "abs": lambda a, r: TC(F.abs(to_num(a[0])), a[0].t if a[0].t in _NUMERIC else "num"),
    "ceiling": lambda a, r: TC(F.ceil(to_num(a[0])), "int"),
    "ceil": lambda a, r: TC(F.ceil(to_num(a[0])), "int"),
    "floor": lambda a, r: TC(F.floor(to_num(a[0])), "int"),
    "round": lambda a, r: TC(F.round(to_num(a[0]), 0), "float"),
    "roundm": lambda a, r: TC(
        F.round(F.try_divide(to_num(a[0]), to_num(a[1])), 0) * to_num(a[1]), "float"
    ),
    "sgn": lambda a, r: TC(F.signum(to_num(a[0])), "float"),
    "exp": _num_fn(F.exp),
    "expm1": _num_fn(F.expm1),
    "log": _num_fn(F.log),
    "log10": _num_fn(F.log10),
    "log1p": _num_fn(F.log1p),
    "sqrt": _num_fn(F.sqrt),
    "cbrt": _num_fn(F.cbrt),
    "pow": _num2_fn(F.pow),
    "atan2": _num2_fn(F.atan2),
    "sin": _num_fn(F.sin), "cos": _num_fn(F.cos), "tan": _num_fn(F.tan),
    "asin": _num_fn(F.asin), "acos": _num_fn(F.acos), "atan": _num_fn(F.atan),
    "sinh": _num_fn(F.sinh), "cosh": _num_fn(F.cosh), "tanh": _num_fn(F.tanh),
    "bitcount": lambda a, r: TC(
        F.when(
            to_num(a[0]).isNotNull() & (to_num(a[0]) == F.floor(to_num(a[0]))),
            F.bit_count(to_num(a[0]).try_cast("long")).cast("string"),
        )
        .when(a[0].col.isNull(), F.lit(None))
        .otherwise(F.lit(_ERROR)),
        "any",
    ),
    "min": _minmax(False),
    "max": _minmax(True),
    # casts (reference pkg/bifs/types.go: int/float/boolean return
    # (error) for non-convertible strings; int scans 0x/0b/leading-0
    # octal like Miller's number inference; a 2nd arg to int is ignored)
    "int": lambda a, r: _cast_int(a[0]),
    "float": lambda a, r: _cast_float(a[0]),
    "string": lambda a, r: TC(to_str(a[0]), "str"),
    "boolean": lambda a, r: _cast_boolean(a[0]),
    # type predicates
    "typeof": lambda a, r: _typeof(a[0], r[0] if r else None),
    "is_present": _is_pred(lambda a: a.col.isNotNull()),
    "is_absent": _is_pred(lambda a: a.col.isNull()),
    "is_empty": _is_pred(lambda a: F.coalesce(a.col.cast("string") == "", F.lit(False))),
    "is_not_empty": _is_pred(lambda a: a.col.isNotNull() & (a.col.cast("string") != "")),
    "is_null": _is_pred(lambda a: a.col.isNull() | (a.col.cast("string") == "")),
    "is_not_null": _is_pred(lambda a: a.col.isNotNull() & (a.col.cast("string") != "")),
    "is_numeric": lambda a, r: TC(
        a[0].col.isNotNull() if a[0].t in _NUMERIC else
        (F.lit(False) if a[0].t == "bool" else F.coalesce(to_num(a[0]).isNotNull(), F.lit(False))),
        "bool",
    ),
    "is_int": lambda a, r: TC(
        (F.lit(a[0].t == "int") & a[0].col.isNotNull()) if a[0].t in ("int", "float", "bool") else
        F.coalesce(to_num(a[0]) == F.floor(to_num(a[0])), F.lit(False)) if a[0].t == "num" else
        F.coalesce(to_str(a[0]).rlike(r"^-?[0-9]+$"), F.lit(False)),
        "bool",
    ),
    "is_float": lambda a, r: TC(
        (F.lit(a[0].t == "float") & a[0].col.isNotNull()) if a[0].t in ("int", "float", "bool") else
        F.coalesce(to_num(a[0]) != F.floor(to_num(a[0])), F.lit(False)) if a[0].t == "num" else
        F.coalesce(to_num(a[0]).isNotNull() & ~to_str(a[0]).rlike(r"^-?[0-9]+$"), F.lit(False)),
        "bool",
    ),
    "is_string": lambda a, r: TC(
        (F.lit(a[0].t == "str") & a[0].col.isNotNull())
        if a[0].t in ("int", "float", "bool", "str", "num") else
        (a[0].col.isNotNull() & to_num(a[0]).isNull()),
        "bool",
    ),
    "is_boolean": lambda a, r: TC(F.lit(a[0].t == "bool") & a[0].col.isNotNull(), "bool"),
    "is_bool": lambda a, r: TC(F.lit(a[0].t == "bool") & a[0].col.isNotNull(), "bool"),
    "is_nan": lambda a, r: TC(F.isnan(to_num(a[0]).cast("double")), "bool"),
    "is_inf": lambda a, r: TC(to_num(a[0]).cast("double").isin(float("inf"), float("-inf")), "bool"),
    # time
    "strftime": _strftime,
    "strptime": _strptime,
    "sec2gmt": _sec2gmt,
    "sec2gmtdate": lambda a, r: TC(
        F.when(to_num(a[0]).isNotNull(),
               F.date_format(F.timestamp_seconds(F.floor(to_num(a[0]))), "yyyy-MM-dd"))
        .when(a[0].col.isNull(), F.lit(None))
        .otherwise(a[0].col.cast("string")),
        "any",
    ),
    "gmt2sec": lambda a, r: _gmt2sec(a[0]),
    # scalar collection stubs (maps/arrays are out of scope; Miller
    # defines these on scalars too)
    "length": lambda a, r: TC(F.when(a[0].col.isNull(), 0).otherwise(1), "int"),
    "depth": lambda a, r: TC(F.when(a[0].col.isNotNull(), 0), "int"),
    "leafcount": lambda a, r: TC(F.when(a[0].col.isNotNull(), 1), "int"),
    # asserting_* must FATAL on violation — only the stream
    # interpreter can do that; never claim them here
}


# argument positions consumed as RAW literal nodes (patterns, printf /
# time formats, replacement strings with \1 backrefs) — never compiled
# as value expressions
_RAW_ARG_POSITIONS = {
    "sub": (1, 2),
    "gsub": (1, 2),
    "regextract": (1,),
    "regextract_or_else": (1,),
    "fmtnum": (1,),
    "strftime": (1,),
    "strptime": (1,),
    "format": (0,),
}


# --------------------------------------------------------------------------
# expression compiler
# --------------------------------------------------------------------------


class Env:
    """Per-program compile state: field columns (updated as statements
    assign), locals, filter conjuncts, record context (NR...)."""

    def __init__(self, df: DataFrame, nr_col: str | None, filename: str | None,
                 visible: list[str] | None = None, fnr_col: str | None = None,
                 filename_col: str | None = None, filenum_col: str | None = None):
        self.fields: dict[str, TC] = {}
        cols = visible if visible is not None else df.columns
        for c, dt in df.dtypes:
            if c in cols:
                self.fields[c] = TC(_fcol(c), _dtype_t(dt))
        self.order = [c for c in cols]
        self.locals: dict[str, TC] = {}
        self.filters: list[Column] = []
        self.nr_col = nr_col
        self.filename = filename
        self.fnr_col = fnr_col
        self.filename_col = filename_col
        self.filenum_col = filenum_col
        self.last_bare: TC | None = None
        # \1..\9 capture columns bound by the most recent executed `=~`
        # (reference-dsl regex captures); None until a match runs
        self.captures: dict[int, Column] | None = None

    def nf(self) -> Column:
        cnt = F.lit(0)
        for name in self.order:
            tc = self.fields.get(name)
            if tc is not None:
                cnt = cnt + tc.col.isNotNull().cast("int")
        return cnt


def compile_expr(node, env: Env) -> TC:
    kind = node[0]
    if kind == "int":
        return _lit(node[1], "int")
    if kind == "float":
        return _lit(node[1], "float")
    if kind == "bool":
        return _lit(node[1], "bool")
    if kind in ("str", "regexi"):
        v = node[1]
        if re.search(r"\\[0-9]", v):
            if env.captures is None:
                # no =~ has executed: \1 stays literal text
                return _lit(v, "str")
            pieces: list[Column] = []
            for part in re.split(r"(\\[0-9])", v):
                if re.fullmatch(r"\\[0-9]", part):
                    pieces.append(
                        F.coalesce(env.captures.get(int(part[1]), F.lit("")), F.lit(""))
                    )
                elif part:
                    pieces.append(F.lit(part))
            return TC(F.concat(*pieces) if pieces else F.lit(""), "str")
        return _lit(v, "str")
    if kind == "field":
        tc = env.fields.get(node[1])
        return tc if tc is not None else _null_tc()
    if kind == "var":
        tc = env.locals.get(node[1])
        if tc is None:
            # reading a never-assigned local yields ABSENT (reference
            # reference-dsl-variables: unset locals are absent)
            return _null_tc()
        return tc
    if kind == "ctx":
        name = node[1]
        if name == "NR":
            if env.nr_col is None:
                raise DslUnsupported("NR without stream-order column")
            return TC(F.col(env.nr_col).try_cast("long") + 1, "int")
        if name == "FNR":
            col = env.fnr_col or env.nr_col
            if col is None:
                raise DslUnsupported("FNR without stream-order column")
            return TC(F.col(col).try_cast("long") + 1, "int")
        if name == "NF":
            return TC(env.nf(), "int")
        if name == "FILENAME":
            if env.filename_col is not None:
                return TC(F.col(env.filename_col).cast("string"), "str")
            if env.filename is None:
                raise DslUnsupported("FILENAME unavailable")
            return _lit(env.filename, "str")
        if name == "FILENUM":
            if env.filenum_col is not None:
                return TC(F.col(env.filenum_col).try_cast("long"), "int")
            return _lit(1, "int")
        if name == "M_PI":
            return _lit(3.141592653589793, "float")
        if name == "M_E":
            return _lit(2.718281828459045, "float")
        raise DslUnsupported(f"context variable {name}")
    if kind == "unop":
        op, sub = node[1], node[2]
        a = compile_expr(sub, env)
        if op == "!":
            return TC(~to_bool(a), "bool")
        if op == "~":
            return TC(F.bitwise_not(to_num(a).try_cast("long")), "int")
        if op in ("-", "+"):
            if a.t in ("int", "float"):
                return TC(-a.col if op == "-" else a.col, a.t)
            n = to_num(a)
            s = to_str(a)
            res = (
                F.when(s.isNull(), F.lit(None))
                .when(s == "", F.lit(""))
                .when(n.isNotNull(), _num_str(-n if op == "-" else n))
                .otherwise(F.lit(_ERROR))
            )
            return TC(res, "any")
    if kind == "binop":
        op = node[1]
        if op == ".":
            # Miller map-dot access on nested JSON ($req.headers.host,
            # reference dsl-map-dot suite): under the flattened-column
            # model the dotted chain IS the column name. Resolve a
            # left-nested dot chain of field + bare identifiers to the
            # flattened column when it exists; otherwise fall through to
            # string-concat dot.
            parts: list[str] = []
            cur = node
            while cur[0] == "binop" and cur[1] == "." and cur[3][0] == "var":
                parts.append(cur[3][1])
                cur = cur[2]
            if cur[0] == "field" and parts:
                dotted = ".".join([cur[1]] + list(reversed(parts)))
                if dotted in env.fields:
                    return env.fields[dotted]
        a = compile_expr(node[2], env)
        b = compile_expr(node[3], env)
        if op in ("+", "-", "*", "/", "//", "%", "**"):
            return _arith(op, a, b)
        if op == ".":
            return _dot(a, b)
        if op in ("<", "<=", ">", ">=", "==", "!="):
            return _cmp(op, a, b)
        if op == "<=>":
            return _spaceship(a, b)
        if op in ("&&", "||", "^^"):
            return _logic(op, a, b)
        if op == "??":
            x, y, t = _unify(a, b)
            return TC(F.when(a.col.isNotNull(), x).otherwise(y), t)
        if op == "???":
            x, y, t = _unify(a, b)
            return TC(
                F.when(a.col.isNotNull() & (to_str(a) != "") & (to_str(a) != _ERROR), x).otherwise(y),
                t,
            )
        if op in ("&", "|", "^"):
            x, y = to_num(a).try_cast("long"), to_num(b).try_cast("long")
            res = {"&": x.bitwiseAND(y), "|": x.bitwiseOR(y), "^": x.bitwiseXOR(y)}[op]
            return TC(res, "int")
        if op in ("<<", ">>", ">>>"):
            if node[3][0] != "int":
                raise DslUnsupported("shift by non-literal")
            bits = node[3][1]
            x = to_num(a).try_cast("long")
            if op == "<<":
                return TC(F.shiftleft(x, bits), "int")
            if op == ">>":
                return TC(F.shiftright(x, bits), "int")
            return TC(F.shiftrightunsigned(x, bits), "int")
        if op in (".+", ".-", ".*", "./"):
            raise DslUnsupported("dot-arithmetic (64-bit wrap) operator")
        if op in ("=~", "!=~"):
            raise DslUnsupported("=~ with non-literal pattern")
        raise DslUnsupported(f"operator {op}")
    if kind == "ternary":
        c = to_bool(compile_expr(node[1], env))
        a = compile_expr(node[2], env)
        b = compile_expr(node[3], env)
        x, y, t = _unify(a, b)
        return TC(F.when(c, x).otherwise(y), t)
    if kind == "match":
        _, sub, pattern, ci, negate = node
        target = compile_expr(sub, env)
        pat = ("(?i)" if ci else "") + pattern
        res = to_str(target).rlike(pat)
        if not negate:
            # bind \1..\9 for the rest of the program: group value on
            # match, VOID on no-match or group-out-of-range
            # (reference-dsl-regular-expressions: captures)
            try:
                ngroups = re.compile(pattern).groups
            except re.error:
                ngroups = 0
            env.captures = {
                k: (
                    F.when(res, F.regexp_extract(to_str(target), pat, k)).otherwise(
                        F.lit("")
                    )
                    if k <= ngroups or k == 0
                    else F.lit("")
                )
                for k in range(0, 10)
            }
        return TC(~res if negate else res, "bool")
    if kind == "call":
        name, arg_nodes = node[1], node[2]
        fn = _FUNCS.get(name)
        if fn is None:
            raise DslUnsupported(f"function {name}")
        raw_idx = _RAW_ARG_POSITIONS.get(name, ())
        args = [
            None if i in raw_idx else compile_expr(n, env)
            for i, n in enumerate(arg_nodes)
        ]
        return fn(args, arg_nodes)
    raise DslUnsupported(f"node {kind}")


# --------------------------------------------------------------------------
# statement compiler
# --------------------------------------------------------------------------

_OPASSIGN_BASE = {
    "+=": "+", "-=": "-", "*=": "*", "/=": "/", "//=": "//", "%=": "%",
    "**=": "**", ".=": ".", "&&=": "&&", "||=": "||", "^^=": "^^",
    "??=": "??", "???=": "???", "&=": "&", "|=": "|", "^=": "^",
    "<<=": "<<", ">>=": ">>", ">>>=": ">>>",
}


def _assign(env: Env, target, value: TC, cond: Column | None):
    tkind, tname = target[0], target[1]
    if tkind not in ("var", "field"):
        raise DslUnsupported(f"assignment target {tkind}")
    if tkind == "var":
        if cond is not None:
            old = env.locals.get(tname) or _null_tc()
            x, y, t = _unify(value, old)
            value = TC(F.when(cond, x).otherwise(y), t)
        env.locals[tname] = value
        return
    old = env.fields.get(tname)
    if cond is not None:
        if old is None:
            value = TC(F.when(cond, value.col), value.t)
        else:
            x, y, t = _unify(value, old)
            value = TC(F.when(cond, x).otherwise(y), t)
    if tname not in env.fields:
        env.order.append(tname)
    env.fields[tname] = value


def compile_stmts(stmts, env: Env, cond: Column | None = None):
    for st in stmts:
        kind = st[0]
        if kind == "assign":
            op, target, rhs = st[1], st[2], st[3]
            if op != "=":
                base = _OPASSIGN_BASE[op]
                rhs = ("binop", base, target, rhs)
            value = compile_expr(rhs, env)
            _assign(env, target, value, cond)
        elif kind == "decl":
            # typed local declaration: var/str/num/... name [= expr].
            # Non-`var` types carry runtime checks on every assignment
            # (fatal on mismatch) the Column plan cannot express —
            # those programs run in the stream interpreter instead.
            _typ, name, rhs = st[1], st[2], st[3]
            if _typ not in (None, "var"):
                raise DslUnsupported(f"typed local declaration {_typ}")
            value = compile_expr(rhs, env) if rhs is not None else _null_tc()
            _assign(env, ("var", name), value, cond)
        elif kind == "unset":
            for tgt in st[1]:
                if not (isinstance(tgt, tuple) and tgt[0] == "field"):
                    raise DslUnsupported(f"unset target {tgt!r}")
                name = tgt[1]
                if name not in env.fields:
                    continue
                if cond is None:
                    env.fields[name] = None  # type: ignore[assignment]
                else:
                    old = env.fields[name]
                    if old is not None:
                        env.fields[name] = TC(
                            F.when(cond, F.lit(None)).otherwise(old.col), old.t
                        )
        elif kind == "filter":
            filt = to_bool(compile_expr(st[1], env))
            if cond is not None:
                filt = ~cond | F.coalesce(filt, F.lit(False))
            env.filters.append(filt)
        elif kind == "if":
            arms, else_stmts = st[1], st[2]
            taken = None  # disjunction of prior arm conditions
            for c_node, body in arms:
                c = F.coalesce(to_bool(compile_expr(c_node, env)), F.lit(False))
                arm_cond = c if taken is None else (~taken & c)
                full = arm_cond if cond is None else (cond & arm_cond)
                compile_stmts(body, env, full)
                taken = c if taken is None else (taken | c)
            if else_stmts:
                els = ~taken
                full = els if cond is None else (cond & els)
                compile_stmts(else_stmts, env, full)
        elif kind == "bare":
            env.last_bare = compile_expr(st[1], env)
        else:
            raise DslUnsupported(f"statement {kind}")


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def apply_program(
    df: DataFrame,
    program: str,
    mode: str = "put",
    nr_col: str | None = None,
    filename: str | None = None,
    fnr_col: str | None = None,
    filename_col: str | None = None,
    filenum_col: str | None = None,
    exclude: tuple[str, ...] = (),
) -> DataFrame:
    """Compile and apply a put/filter program. `exclude` columns (e.g. a
    stream-order helper) are carried through untouched and invisible to
    the program."""
    stmts = parse_program(program)
    visible = [c for c in df.columns if c not in exclude]
    env = Env(df, nr_col=nr_col, filename=filename, visible=visible,
              fnr_col=fnr_col, filename_col=filename_col, filenum_col=filenum_col)
    compile_stmts(stmts, env)

    sel: list[Column] = []
    for name in env.order:
        tc = env.fields.get(name)
        if tc is None:
            continue
        sel.append(tc.col.alias(name))
    for c in exclude:
        if c in df.columns:
            sel.append(_fcol(c))
    out = df.select(*sel)

    conds = list(env.filters)
    if mode == "filter":
        if env.filters:
            # validate.go:80 — fatal. DslUnsupported defers to the
            # stream interpreter, whose own check raises the fatal.
            raise DslUnsupported(
                'filter expressions must not also contain the '
                '"filter" keyword'
            )
        if env.last_bare is None:
            raise DslUnsupported("filter program without a bare boolean")
        conds.append(to_bool(env.last_bare))
    for c in conds:
        # NOT coalesce(c, false): Filter keeps only condition=TRUE rows,
        # so nulls drop either way — but the coalesce wrapper is opaque
        # to PushDownPredicate, which otherwise splits a top-level AND
        # and pushes scan-column conjuncts into the parquet reader
        # (asserted by tests/test_plan_shapes.py).
        out = out.filter(c)
    return out


def put(df: DataFrame, program: str, **kw) -> DataFrame:
    """`mlr put 'program'` (reference pkg/transformers/put_or_filter.go:38)."""
    return apply_program(df, program, mode="put", **kw)


def filter_records(df: DataFrame, program: str, **kw) -> DataFrame:
    """`mlr filter 'program'`: the final bare expression keeps records."""
    return apply_program(df, program, mode="filter", **kw)


def compile_filter(df: DataFrame, expression: str, nr_col: str | None = None) -> Column:
    """Compile a single boolean expression to a Column against df."""
    from mlrsketch.dsl.parser import parse_expr

    env = Env(df, nr_col=nr_col, filename=None)
    return to_bool(compile_expr(parse_expr(expression), env))
