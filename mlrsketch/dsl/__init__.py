"""Miller-DSL (`put`/`filter`) expression language, compiled to Catalyst.

The reference's DSL (grammar: /root/reference/pkg/parsing/mlr.bnf,
evaluator: /root/reference/pkg/dsl/cst/*) is a per-record dynamically
typed language. Here the scalar-expression subset — field references,
arithmetic with Miller's int/float/absent/void dispositions
(pkg/bifs/arithmetic.go), string/regex/math builtins, comparisons,
boolean logic, ternaries, if/elif/else and pattern-action blocks, local
variables, multi-statement programs — is COMPILED to pyspark Column
expressions: the whole program becomes one whole-stage-codegen'd
projection, no Python in the row path, fully distributed.

Out of scope (raise DslUnsupported): oosvars/begin/end (cross-record
state — that is what the verbs and sketch aggregates are for), emit/tee
redirects, map/array values, user-defined functions, loops.

Usage:
    from mlrsketch import dsl
    df2 = dsl.put(df, '$ratio = $x / $y; $flag = $ratio > 2')
    df3 = dsl.filter_records(df, '$lang == "en" && strlen($text) > 100')
"""

from mlrsketch.dsl.parser import DslSyntaxError, DslUnsupported, parse_program
from mlrsketch.dsl.compiler import apply_program, compile_filter, put, filter_records
from mlrsketch.dsl.stream import put_stream, filter_stream

__all__ = [
    "DslSyntaxError",
    "DslUnsupported",
    "parse_program",
    "apply_program",
    "compile_filter",
    "put",
    "filter_records",
    "put_stream",
    "filter_stream",
]
