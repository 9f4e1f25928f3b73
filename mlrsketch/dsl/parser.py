"""Lexer + Pratt parser for the Miller DSL — full grammar.

Grammar reference: /root/reference/pkg/parsing/mlr.bnf; operator
precedence per the reference docs (reference-dsl-operators.md), highest
first:

    **                      right
    ??? ??                  left
    ! ~ unary+ unary-       right
    .                       left
    * / // %                left
    + -                     left
    << >> >>>               left
    &                       left
    ^                       left
    |                       left
    < <= > >=               left
    == != =~ !=~ <=>        left
    &&                      left
    ^^                      left
    ||                      left
    ?:                      right

The parser accepts the whole language (oosvars, blocks, loops, emit
family, user functions, map/array literals).  Consumers decide what they
can execute: the Column compiler (compiler.py) raises DslUnsupported on
cross-record constructs; the stream interpreter (interp.py) handles
everything.

AST nodes are plain tuples:
    ("int", v) ("float", v) ("str", v) ("bool", v) ("null",)
    ("field", name) ("fieldstar",) ("fieldexpr", e)
    ("oosvar", name) ("oosvarstar",)
    ("var", name) ("ctx", name)      # NR/NF/FILENAME/M_PI...
    ("maplit", [(kexpr, vexpr), ...]) ("arraylit", [exprs])
    ("index", base, idx) ("slice", base, lo|None, hi|None)
    ("unop", op, a) ("binop", op, a, b) ("ternary", c, a, b)
    ("call", fname, [args])
    ("match", a, pattern, case_insensitive, negate)   # =~ with literal
    ("env",)                          # the ENV map

Statements:
    ("assign", op, target_node, expr)   # op in {"=", "+=", ...}
    ("decl", type, name, expr|None)     # var/str/num/int/float/bool/map/arr
    ("unset", [target nodes])           # ("all",) clears both $* and @*
    ("filter", expr)
    ("if", [(cond, stmts), ...], else_stmts)
    ("bare", expr)                      # expression statement
    ("for_kv", [keyvars], valvar|None, expr, body)
    ("for_c", init_stmts, cond, update_stmts, body)
    ("while", cond, body) ("dowhile", body, cond)
    ("break",) ("continue",) ("return", expr|None)
    ("emit", variant, redirect, [emittables], [name exprs])
        variant in {"emit","emitp","emitf","emit1"}
        redirect = (op, target_expr) | None;  op in {">",">>","|"}
        target_expr may be ("ctx","stderr"/"stdout")
    ("tee", redirect, expr)
    ("print", where, redirect, expr|None, newline)  # where in {out,err}
    ("dump", where, redirect, expr|None)
    ("call_subr", name, [args])

Top level (parse_full_program):
    ("program", funcs, subrs, begins, mains, ends)
    funcs/subrs: {name: (params, body)}; params = [(type|None, name)]
"""

from __future__ import annotations


class DslSyntaxError(Exception):
    pass


class DslUnsupported(Exception):
    """Construct outside the executing engine's subset."""


# --------------------------------------------------------------------------
# lexer
# --------------------------------------------------------------------------

_OPERATORS = [
    # longest first
    "???=", ">>>=", "!=~",
    "???", "??=", "**=", "//=", "<<=", ">>=", "&&=", "||=", "^^=", ">>>", "<=>",
    ".+", ".-", ".*", "./",
    "??", "**", "//", "<<", ">>", "<=", ">=", "==", "!=", "=~", "&&", "||",
    "^^", ".=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "!~",
    "+", "-", "*", "/", "%", ".", "<", ">", "=", "!", "~", "&", "|", "^",
    "?", ":", ";", "(", ")", "{", "}", "[", "]", ",",
]

_KEYWORDS = {
    "if", "elif", "else", "for", "while", "do", "func", "subr", "return",
    "begin", "end", "filter", "unset", "emit", "emitp", "emitf", "emit1",
    "tee", "print", "printn", "eprint", "eprintn", "dump", "edump", "call",
    "true", "false", "var", "str", "num", "int", "float", "bool", "map",
    "arr", "funct", "in", "break", "continue", "null", "all", "ENV",
}

_ID_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")
_ID_CHARS = _ID_START | set("0123456789")


def _id_start(c: str) -> bool:
    # mlr.bnf:11 _letter admits every codepoint >= U+00A0, so bare
    # field/var names may be any non-ASCII text ($año)
    return c in _ID_START or ord(c) >= 0xA0


def _id_char(c: str) -> bool:
    return c in _ID_CHARS or ord(c) >= 0xA0


class _PosList(list):
    """Token list that records each token's source char offset at
    append time (fed by tokenize() setting .cur to the scan position) —
    lets the parser attach positions to nodes without changing the
    (kind, value) token shape."""

    def __init__(self):
        super().__init__()
        self.pos: list[int] = []
        self.cur = 0

    def append(self, item):  # noqa: A003
        super().append(item)
        self.pos.append(self.cur)


def tokenize(src: str) -> list[tuple[str, object]]:
    """Returns list of (kind, value); kinds: NUM, STR, FIELD, FIELDSTAR,
    OOSVAR, OOSVARSTAR, IDENT, KW, OP, REGEXI (string literal with
    trailing i flag). The returned list is a _PosList carrying parallel
    source offsets in .pos."""
    toks: list[tuple[str, object]] = _PosList()
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        toks.cur = i
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "%" and src.startswith("%%%panic%%%", i):
            # grammar token for short-circuit tests (mlr.bnf:96-97):
            # parses fine, panics only if evaluated
            toks.append(("PANIC", None))
            i += len("%%%panic%%%")
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n and src[j] != '"':
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    if esc == "x" and j + 3 < n and all(
                        ch in "0123456789abcdefABCDEF" for ch in src[j + 2 : j + 4]
                    ):
                        buf.append(chr(int(src[j + 2 : j + 4], 16)))
                        j += 4
                        continue
                    if esc in "01234567" and j + 3 < n and all(
                        ch in "01234567" for ch in src[j + 1 : j + 4]
                    ):
                        buf.append(chr(int(src[j + 1 : j + 4], 8)))
                        j += 4
                        continue
                    buf.append(
                        {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
                         "/": "/"}.get(esc, "\\" + esc)
                    )
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise DslSyntaxError("unterminated string")
            # trailing `i` flag => case-insensitive regex literal
            if j + 1 < n and src[j + 1] == "i":
                toks.append(("REGEXI", "".join(buf)))
                i = j + 2
            else:
                toks.append(("STR", "".join(buf)))
                i = j + 1
            continue
        if c == "$":
            if src[i : i + 2] == "$*":
                toks.append(("FIELDSTAR", None))
                i += 2
                continue
            if src[i : i + 2] == "${":
                j = src.find("}", i + 2)
                if j < 0:
                    raise DslSyntaxError("unterminated ${...}")
                toks.append(("FIELD", src[i + 2 : j]))
                i = j + 1
                continue
            if src[i : i + 2] == "$[":
                # computed field name $[expr]; also the ${...} braced
                # form with [[n]]/[[[n]]] positional references
                toks.append(("OP", "$["))
                i += 2
                continue
            j = i + 1
            while j < n and _id_char(src[j]):
                j += 1
            if j == i + 1:
                raise DslSyntaxError(f"bare $ at {i}")
            toks.append(("FIELD", src[i + 1 : j]))
            i = j
            continue
        if c == "@":
            if src[i : i + 2] == "@*":
                toks.append(("OOSVARSTAR", None))
                i += 2
                continue
            if src[i : i + 2] == "@{":
                j = src.find("}", i + 2)
                if j < 0:
                    raise DslSyntaxError("unterminated @{...}")
                toks.append(("OOSVAR", src[i + 2 : j]))
                i = j + 1
                continue
            if src[i : i + 2] == "@[":
                toks.append(("OP", "@["))
                i += 2
                continue
            j = i + 1
            while j < n and _id_char(src[j]):
                j += 1
            if j == i + 1:
                raise DslSyntaxError(f"bare @ at {i}")
            toks.append(("OOSVAR", src[i + 1 : j]))
            i = j
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            if src[i : i + 2].lower() in ("0x", "0b", "0o"):
                k2 = src[i + 1].lower()
                base = 16 if k2 == "x" else 8 if k2 == "o" else 2
                j = i + 2
                digits = (
                    "0123456789abcdefABCDEF"
                    if base == 16
                    else "01234567" if base == 8 else "01"
                )
                while j < n and src[j] in digits:
                    j += 1
                toks.append(("NUM", int(src[i:j], base)))
                i = j
                continue
            seen_dot = seen_exp = False
            while j < n:
                ch = src[j]
                if ch.isdigit():
                    j += 1
                elif ch == "." and not seen_dot and not seen_exp:
                    if j + 1 < n and (
                        src[j + 1].isdigit()
                        or (
                            # "2.e-4": dot directly followed by a valid
                            # exponent is still one float literal
                            src[j + 1] in "eE"
                            and j + 2 < n
                            and (
                                src[j + 2].isdigit()
                                or (src[j + 2] in "+-" and j + 3 < n and src[j + 3].isdigit())
                            )
                        )
                    ):
                        seen_dot = True
                        j += 1
                    elif j + 1 >= n or src[j + 1] in " \t\r\n+-*/%);,=<>!&|^?":
                        # trailing dot: "123." is the float 123 (the
                        # reference scanner takes the dot); "123.x"
                        # leaves the dot to the concat operator
                        seen_dot = True
                        j += 1
                        break
                    else:
                        break
                elif ch in "eE" and not seen_exp and j + 1 < n and (
                    src[j + 1].isdigit() or (src[j + 1] in "+-" and j + 2 < n and src[j + 2].isdigit())
                ):
                    seen_exp = seen_dot = True
                    j += 2 if src[j + 1] in "+-" else 1
                else:
                    break
            text = src[i:j]
            if seen_dot or seen_exp:
                toks.append(("NUM", float(text)))
            else:
                toks.append(("NUM", int(text)))
            i = j
            continue
        if c in _ID_START:
            j = i
            while j < n and _id_char(src[j]):
                j += 1
            word = src[i:j]
            toks.append(("KW" if word in _KEYWORDS else "IDENT", word))
            i = j
            continue
        # adjacent "[[" / "[[[" lex as positional-index tokens (the
        # reference grammar has distinct [[ and [[[ tokens; "[ [1,2]"
        # with a space stays a plain index of an array literal)
        if src.startswith("[[[", i):
            toks.append(("OP", "[[["))
            i += 3
            continue
        if src.startswith("[[", i):
            toks.append(("OP", "[["))
            i += 2
            continue
        for op in _OPERATORS:
            if src.startswith(op, i):
                toks.append(("OP", op))
                i += len(op)
                break
        else:
            raise DslSyntaxError(f"unexpected character {c!r} at {i}")
    return toks


# --------------------------------------------------------------------------
# Pratt parser
# --------------------------------------------------------------------------

# binding powers, higher binds tighter; (lbp, rbp): rbp<lbp => right-assoc
_BP = {
    "**": (90, 89),  # right-assoc
    "???": (85, 86), "??": (84, 85),
    # unary at 80 (handled in nud)
    ".": (75, 76),
    "*": (70, 71), "/": (70, 71), "//": (70, 71), "%": (70, 71),
    ".*": (70, 71), "./": (70, 71),
    "+": (65, 66), "-": (65, 66),
    ".+": (65, 66), ".-": (65, 66),
    "<<": (60, 61), ">>": (60, 61), ">>>": (60, 61),
    "&": (55, 56),
    "^": (50, 51),
    "|": (45, 46),
    "<": (40, 41), "<=": (40, 41), ">": (40, 41), ">=": (40, 41),
    "==": (35, 36), "!=": (35, 36), "=~": (35, 36), "!=~": (35, 36),
    "!~": (35, 36), "<=>": (35, 36),
    "&&": (30, 31),
    "^^": (28, 29),
    "||": (26, 27),
    "?": (20, 19),  # ternary, right-assoc
}

_INDEX_BP = 95  # postfix [ ... ] binds tighter than any binary op

_UNARY_BP = 80

_ASSIGN_OPS = {
    "=", "+=", "-=", "*=", "/=", "//=", "%=", "**=", ".=", "&&=", "||=",
    "^^=", "??=", "???=", "&=", "|=", "^=", "<<=", ">>=", ">>>=",
}

_CTX_NAMES = {"NR", "NF", "FNR", "FILENAME", "FILENUM", "M_PI", "M_E", "IPS",
              "IFS", "IRS", "OPS", "OFS", "ORS", "FLATSEP", "stdout", "stderr"}

_TYPE_KWS = ("var", "str", "num", "int", "float", "bool", "map", "arr",
             "funct")


class _Parser:
    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("EOF", None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect_op(self, op: str):
        k, v = self.next()
        if k != "OP" or v != op:
            raise DslSyntaxError(f"expected {op!r}, got {k} {v!r}")

    def _tokpos(self, back: int = 1):
        """Source char offset of the token `back` steps behind the
        cursor (None when the token list carries no positions)."""
        pos = getattr(self.toks, "pos", None)
        j = self.i - back
        return pos[j] if pos and 0 <= j < len(pos) else None

    # -- expressions -------------------------------------------------------

    def expr(self, rbp: int = 0):
        left = self.nud()
        while True:
            k, v = self.peek()
            if k != "OP":
                break
            if v == "[[":
                # positional-name index: m[[n]] -> n-th key
                self.next()
                e = self.expr(0)
                self.expect_op("]")
                self.expect_op("]")
                left = ("posidxname", left, e)
                continue
            if v == "[[[":
                # positional-value index: m[[[n]]] -> n-th value
                self.next()
                e = self.expr(0)
                self.expect_op("]")
                self.expect_op("]")
                self.expect_op("]")
                left = ("posidxval", left, e)
                continue
            if v == "[":
                # postfix index / slice
                self.next()
                if self.peek() == ("OP", ":"):
                    self.next()
                    if self.peek() == ("OP", "]"):
                        # full slice x[:] (dsl-parse/0055)
                        self.next()
                        left = ("slice", left, None, None)
                        continue
                    hi = self.expr(0)
                    self.expect_op("]")
                    left = ("slice", left, None, hi)
                    continue
                idx = self.expr(0)
                if self.peek() == ("OP", ":"):
                    self.next()
                    if self.peek() == ("OP", "]"):
                        self.next()
                        left = ("slice", left, idx, None)
                        continue
                    hi = self.expr(0)
                    self.expect_op("]")
                    left = ("slice", left, idx, hi)
                    continue
                self.expect_op("]")
                left = ("index", left, idx)
                continue
            if v not in _BP:
                break
            lbp, next_rbp = _BP[v]
            if lbp <= rbp:
                break
            self.next()
            if v == "?":
                a = self.expr(0)
                self.expect_op(":")
                b = self.expr(19)
                left = ("ternary", left, a, b)
            elif v in ("=~", "!=~", "!~"):
                k2, v2 = self.peek()
                k3, v3 = self.peek(1)
                # literal fast path only when the pattern is a LONE
                # literal — `=~ "^a.*" . "d$"` must parse the full
                # concat expression (dsl-regex-matching/0006)
                extends = k3 == "OP" and (
                    v3 == "[" or (v3 in _BP and _BP[v3][0] > next_rbp)
                )
                if k2 == "STR" and not extends:
                    self.next()
                    left = ("match", left, v2, False, v in ("!=~", "!~"))
                elif k2 == "REGEXI" and not extends:
                    self.next()
                    left = ("match", left, v2, True, v in ("!=~", "!~"))
                else:
                    rhs = self.expr(next_rbp)
                    left = ("binop", "=~" if v == "=~" else "!=~", left, rhs)
            else:
                # unary may follow ** ( 2 ** -3 )
                right = self.expr(next_rbp)
                left = ("binop", v, left, right)
        return left

    def nud(self):
        k, v = self.next()
        if k == "NUM":
            return ("int", v) if isinstance(v, int) else ("float", v)
        if k == "STR":
            return ("str", v)
        if k == "REGEXI":
            return ("regexi", v)
        if k == "FIELD":
            return ("field", v)
        if k == "FIELDSTAR":
            return ("fieldstar",)
        if k == "OOSVAR":
            return ("oosvar", v)
        if k == "OOSVARSTAR":
            return ("oosvarstar",)
        if k == "KW" and v in ("true", "false"):
            return ("bool", v == "true")
        if k == "KW" and v == "null":
            return ("null",)
        if k == "PANIC":
            return ("panic",)
        if k == "KW" and v == "ENV":
            return ("env",)
        if k == "KW" and v in _TYPE_KWS:
            # type name used as a cast-style function: int(...), float(...)
            nk, nv = self.peek()
            if nk == "OP" and nv == "(":
                self.next()
                args = self._call_args()
                return ("call", v, args)
            raise DslSyntaxError(f"unexpected keyword {v}")
        if k == "KW" and v == "func":
            # anonymous function literal: func(a, b) { ... } — passed to
            # sort/apply/fold/reduce (reference-dsl higher-order funcs)
            self.expect_op("(")
            params = []
            if self.peek() != ("OP", ")"):
                while True:
                    ptype = None
                    k1, v1 = self.peek()
                    if k1 == "KW" and v1 in _TYPE_KWS:
                        self.next()
                        ptype = v1
                    k2, v2 = self.next()
                    if k2 != "IDENT":
                        raise DslSyntaxError(f"expected parameter, got {v2!r}")
                    params.append((ptype, v2))
                    if self.peek() == ("OP", ","):
                        self.next()
                        continue
                    break
            self.expect_op(")")
            if self.peek() == ("OP", ":"):
                self.next()
                self.next()  # return type annotation, ignored
            body = self.block()
            return ("funclit", params, body)
        if k == "IDENT":
            nk, nv = self.peek()
            if nk == "OP" and nv == "(":
                self.next()
                args = self._call_args()
                return ("call", v, args)
            if v in _CTX_NAMES:
                return ("ctx", v)
            # third element: source char offset of the identifier (for
            # -w/-W warning positions); consumers index [0]/[1] only
            return ("var", v, self._tokpos())
        if k == "OP":
            if v == "(":
                e = self.expr(0)
                self.expect_op(")")
                return e
            if v == "-":
                return ("unop", "-", self.expr(_UNARY_BP))
            if v == "+":
                return ("unop", "+", self.expr(_UNARY_BP))
            if v == "!":
                return ("unop", "!", self.expr(_UNARY_BP))
            if v == "~":
                return ("unop", "~", self.expr(_UNARY_BP))
            if v == "$[":
                # $[[n]] / $[[[n]]]: positional NAME / positional VALUE
                # (the "[[" may arrive merged as one token)
                if self.peek() == ("OP", "[["):  # $[[[n]]]
                    self.next()
                    e = self.expr(0)
                    self.expect_op("]")
                    self.expect_op("]")
                    self.expect_op("]")
                    return ("posval", e)
                if self.peek() == ("OP", "["):
                    self.next()
                    if self.peek() == ("OP", "["):
                        self.next()
                        e = self.expr(0)
                        self.expect_op("]")
                        self.expect_op("]")
                        self.expect_op("]")
                        return ("posval", e)
                    e = self.expr(0)
                    self.expect_op("]")
                    self.expect_op("]")
                    return ("posname", e)
                e = self.expr(0)
                self.expect_op("]")
                return ("fieldexpr", e)
            if v == "@[":
                e = self.expr(0)
                self.expect_op("]")
                return ("oosvarexpr", e)
            if v in ("[[", "[[["):
                # expression-leading "[[": an array literal whose first
                # element is itself an array — split the merged token
                self.toks.insert(self.i, ("OP", "[" * (len(v) - 1)))
                v = "["
                return self._array_literal_nud()
            if v == "[":
                return self._array_literal_nud()
            if v == "{":
                pairs = []
                if self.peek() != ("OP", "}"):
                    while True:
                        key = self.expr(0)
                        self.expect_op(":")
                        val = self.expr(0)
                        pairs.append((key, val))
                        if self.peek() == ("OP", ","):
                            self.next()
                            if self.peek() == ("OP", "}"):
                                break  # trailing comma
                            continue
                        break
                self.expect_op("}")
                return ("maplit", pairs)
        raise DslSyntaxError(f"unexpected token {k} {v!r}")

    def _array_literal_nud(self):
        items = []
        if self.peek() != ("OP", "]"):
            while True:
                items.append(self.expr(0))
                if self.peek() == ("OP", ","):
                    self.next()
                    if self.peek() == ("OP", "]"):
                        break  # trailing comma
                    continue
                break
        self.expect_op("]")
        return ("arraylit", items)

    def _call_args(self):
        args = []
        if not (self.peek() == ("OP", ")")):
            while True:
                # a single trailing comma is legal; an empty slot —
                # leading comma or double comma — is a parse error
                # (dsl-trailing-commas: 0015/0019 pass, 0003/0016/0017
                # fatal)
                if self.peek() == ("OP", ","):
                    raise DslSyntaxError("empty argument in call")
                args.append(self.expr(0))
                if self.peek() == ("OP", ","):
                    self.next()
                    if self.peek() == ("OP", ")"):
                        break  # trailing comma
                    continue
                break
        self.expect_op(")")
        return args

    # -- statements ----------------------------------------------------------

    def statements(self, until: str | None = None) -> list:
        out = []
        need_sep = False
        while True:
            k, v = self.peek()
            if k == "EOF":
                if until:
                    raise DslSyntaxError(f"expected {until!r}")
                break
            if until and (k, v) == ("OP", until):
                break
            if (k, v) == ("OP", ";"):
                self.next()
                need_sep = False
                continue
            if need_sep:
                # two statements need a ';' between them unless the
                # first ended in a block (reference grammar; the
                # `x x` tail of test/input/parse-error.mlr must reject)
                raise DslSyntaxError(
                    f"expected ';' between statements, got {v!r}"
                )
            out.append(self.statement())
            need_sep = self.toks[self.i - 1] != ("OP", "}")
        return out

    def block(self) -> list:
        self.expect_op("{")
        body = self.statements(until="}")
        self.expect_op("}")
        return body

    def _redirect(self):
        """Optional output redirect: > expr | >> expr | '|' expr ."""
        k, v = self.peek()
        if k == "OP" and v in (">", ">>", "|"):
            self.next()
            target = self.expr(25)  # bind looser than . concat, avoid commas
            return (v, target)
        return None

    def statement(self):
        k, v = self.peek()
        if k == "KW":
            if v in ("begin", "end"):
                self.next()
                return (v, self.block())
            if v in ("func", "subr"):
                return self.func_def()
            if v == "for":
                return self.for_statement()
            if v == "while":
                self.next()
                self.expect_op("(")
                cond = self.expr(0)
                self.expect_op(")")
                return ("while", cond, self.block())
            if v == "do":
                self.next()
                body = self.block()
                if self.peek() != ("KW", "while"):
                    raise DslSyntaxError("expected while after do-block")
                self.next()
                self.expect_op("(")
                cond = self.expr(0)
                self.expect_op(")")
                return ("dowhile", body, cond)
            if v == "break":
                self.next()
                return ("break",)
            if v == "continue":
                self.next()
                return ("continue",)
            if v == "return":
                self.next()
                nk, nv = self.peek()
                if (nk, nv) in (("OP", ";"), ("OP", "}"), ("EOF", None)):
                    return ("return", None)
                return ("return", self.expr(0))
            if v == "call":
                self.next()
                nk, name = self.next()
                if nk != "IDENT":
                    raise DslSyntaxError("expected subroutine name after call")
                self.expect_op("(")
                args = self._call_args()
                return ("call_subr", name, args)
            if v in ("emit", "emitp", "emitf", "emit1"):
                return self.emit_statement()
            if v == "tee":
                self.next()
                redir = self._redirect()
                if redir is None:
                    raise DslSyntaxError("tee requires a redirect target")
                if self.peek() == ("OP", ","):
                    self.next()
                e = self.expr(0)
                return ("tee", redir, e)
            if v in ("print", "printn", "eprint", "eprintn"):
                self.next()
                where = "err" if v.startswith("e") else "out"
                nl = not v.endswith("n") or v in ("print", "eprint")
                nl = v in ("print", "eprint")
                redir = self._redirect()
                if redir and redir[0] == ">" and redir[1][0] == "ctx" and \
                        redir[1][1] in ("stdout", "stderr"):
                    where = "err" if redir[1][1] == "stderr" else "out"
                    redir = None
                if self.peek() == ("OP", ","):
                    self.next()
                nk, nv = self.peek()
                if (nk, nv) in (("OP", ";"), ("OP", "}"), ("EOF", None)):
                    return ("print", where, redir, None, nl)
                e = self.expr(0)
                if self.peek() == ("OP", ","):
                    # print a, b, c: space-joined (dsl-contains/0001,
                    # strptime-z: `print "TZ       ", tz`)
                    parts = [e]
                    while self.peek() == ("OP", ","):
                        self.next()
                        parts.append(self.expr(0))
                    e = ("printargs", parts)
                return ("print", where, redir, e, nl)
            if v in ("dump", "edump"):
                self.next()
                where = "err" if v == "edump" else "out"
                redir = self._redirect()
                if redir is not None and self.peek() == ("OP", ","):
                    self.next()
                nk, nv = self.peek()
                if (nk, nv) in (("OP", ";"), ("OP", "}"), ("EOF", None)):
                    return ("dump", where, redir, None)
                e = self.expr(0)
                if self.peek() == ("OP", ","):
                    # dump a, b: one dump per argument, each on its own
                    # line (dsl-dump-print/0003)
                    parts = [e]
                    while self.peek() == ("OP", ","):
                        self.next()
                        parts.append(self.expr(0))
                    e = ("printargs", parts)
                return ("dump", where, redir, e)
            if v == "if":
                return self.if_statement()
            if v == "filter":
                self.next()
                return ("filter", self.expr(0))
            if v == "unset":
                self.next()
                targets = []
                while True:
                    if self.peek() == ("KW", "all"):
                        self.next()
                        targets.append(("all",))
                    else:
                        t = self.expr(0)
                        # unset operands must be lvalues — `unset 3` is
                        # a parse error in the reference (dsl-parse/0112)
                        if t[0] not in ("field", "fieldstar", "fieldexpr",
                                        "oosvar", "oosvarstar", "var",
                                        "index", "env", "posname", "posval",
                                        "posidxname", "posidxval"):
                            raise DslSyntaxError(
                                "unset: target must be a field, oosvar, "
                                "or local variable"
                            )
                        targets.append(t)
                    if self.peek() == ("OP", ","):
                        self.next()
                        continue
                    break
                return ("unset", targets)
            if v in _TYPE_KWS:
                # typed local declaration: `var x = e` / `map m` / `int i`
                if self.peek(1)[0] == "IDENT" and (
                    self.peek(2) == ("OP", "=")
                    or self.peek(2) == ("OP", ";")
                    or self.peek(2) == ("OP", "}")
                    or self.peek(2)[0] == "EOF"
                    or self.peek(2)[0] == "KW"  # next statement keyword
                    or self.peek(2)[0] == "IDENT"
                ):
                    self.next()
                    _, name = self.next()
                    if self.peek() == ("OP", "="):
                        self.next()
                        return ("decl", v, name, self.expr(0))
                    return ("decl", v, name, None)
                # fallthrough: could be int(...) call — parse as expression
        # expression-led statement: assignment / pattern-action / bare
        e = self.expr(0)
        k, v = self.peek()
        if k == "OP" and v in _ASSIGN_OPS:
            self.next()
            rhs = self.expr(0)
            return ("assign", v, e, rhs)
        if (k, v) == ("OP", "{"):
            # awk-style pattern-action
            body = self.block()
            return ("if", [(e, body)], [])
        return ("bare", e)

    def emit_statement(self):
        _, variant = self.next()
        redir = self._redirect()
        if redir is not None and self.peek() == ("OP", ","):
            self.next()
        lashed = []
        if self.peek() == ("KW", "all") and variant in ("emit", "emitp"):
            # `emit all` == `emit @*`
            self.next()
            lashed.append(("oosvarstar",))
        elif self.peek() == ("OP", "(") and variant in ("emit", "emitp"):
            self.next()
            while True:
                if self.peek() == ("KW", "all"):
                    self.next()
                    lashed.append(("oosvarstar",))
                else:
                    lashed.append(self.expr(0))
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
            self.expect_op(")")
        else:
            lashed.append(self.expr(0))
            if variant == "emitf":
                while self.peek() == ("OP", ","):
                    self.next()
                    lashed.append(self.expr(0))
        names = []
        if variant in ("emit", "emitp"):
            while self.peek() == ("OP", ","):
                self.next()
                names.append(self.expr(0))
        return ("emit", variant, redir, lashed, names)

    def func_def(self):
        _, kind = self.next()  # func | subr
        nk, name = self.next()
        if nk not in ("IDENT", "KW"):
            raise DslSyntaxError(f"expected function name, got {name!r}")
        self.expect_op("(")
        params = []
        if self.peek() != ("OP", ")"):
            while True:
                ptype = None
                k1, v1 = self.peek()
                if k1 == "KW" and v1 in _TYPE_KWS:
                    self.next()
                    ptype = v1
                k2, v2 = self.next()
                if k2 != "IDENT":
                    raise DslSyntaxError(f"expected parameter name, got {v2!r}")
                params.append((ptype, v2))
                if self.peek() == ("OP", ","):
                    self.next()
                    if self.peek() == ("OP", ")"):
                        break  # trailing comma in the param list
                    continue
                break
        self.expect_op(")")
        rettype = None
        if self.peek() == ("OP", ":"):
            self.next()
            k3, v3 = self.next()  # return type annotation
            if k3 not in ("KW", "IDENT"):
                raise DslSyntaxError("expected return type")
            rettype = v3
        body = self.block()
        return ("funcdef" if kind == "func" else "subrdef", name, params,
                body, rettype)

    def for_statement(self):
        self.next()  # for
        self.expect_op("(")
        # disambiguate: key-value loop  for (k, v in X) / for ((k1,k2), v in X)
        # vs C-style                    for (i = 0; i < n; i += 1)
        save = self.i
        try:
            return self._for_kv()
        except DslSyntaxError:
            self.i = save
        return self._for_c()

    def _for_kv(self):
        keyvars: list[str] = []
        if self.peek() == ("OP", "("):
            self.next()
            while True:
                k, v = self.next()
                if k == "KW" and v in _TYPE_KWS:
                    k, v = self.next()
                if k != "IDENT":
                    raise DslSyntaxError("expected loop variable")
                keyvars.append(v)
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
            self.expect_op(")")
            self.expect_op(",")
            k, v = self.next()
            if k == "KW" and v in _TYPE_KWS:
                k, v = self.next()
            if k != "IDENT":
                raise DslSyntaxError("expected loop value variable")
            valvar = v
        else:
            k, v = self.next()
            if k == "KW" and v in _TYPE_KWS:
                k, v = self.next()
            if k != "IDENT":
                raise DslSyntaxError("expected loop variable")
            first = v
            if self.peek() == ("OP", ","):
                self.next()
                k2, v2 = self.next()
                if k2 == "KW" and v2 in _TYPE_KWS:
                    k2, v2 = self.next()
                if k2 != "IDENT":
                    raise DslSyntaxError("expected loop value variable")
                keyvars, valvar = [first], v2
            else:
                keyvars, valvar = [first], None
        if self.peek() != ("KW", "in"):
            raise DslSyntaxError("expected in")
        self.next()
        coll = self.expr(0)
        self.expect_op(")")
        allvars = keyvars + ([valvar] if valvar else [])
        if len(set(allvars)) != len(allvars):
            # for (k, k in $*): duplicate bindings fatal in the
            # reference (dsl-for-oosvar-loops/0005)
            dup = next(v for v in allvars if allvars.count(v) > 1)
            raise DslSyntaxError(
                f"redefinition of variable {dup} in the same scope"
            )
        body = self.block()
        return ("for_kv", keyvars, valvar, coll, body)

    def _for_c(self):
        init: list = []
        if self.peek() != ("OP", ";"):
            while True:
                init.append(self.statement())
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
        self.expect_op(";")
        cond = None
        if self.peek() != ("OP", ";"):
            # continuation block: zero or more assignments, then a bare
            # boolean LAST (reference cst/for.go:784 — enforced there,
            # not in the grammar)
            items = [self.statement()]
            while self.peek() == ("OP", ","):
                self.next()
                items.append(self.statement())
            if items[-1][0] != "bare":
                raise DslSyntaxError(
                    "the final triple-for continuation statement must be "
                    "a bare boolean"
                )
            for it in items[:-1]:
                if it[0] != "assign":
                    raise DslSyntaxError(
                        "the non-final triple-for continuation statements "
                        "must be assignments"
                    )
            if len(items) == 1:
                cond = items[0][1]
            else:
                cond = ("condseq", items[:-1], items[-1][1])
        self.expect_op(";")
        update: list = []
        if self.peek() != ("OP", ")"):
            while True:
                update.append(self.statement())
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
        self.expect_op(")")
        body = self.block()
        return ("for_c", init, cond, update, body)

    def if_statement(self):
        arms = []
        self.next()  # if
        self.expect_op("(")
        cond = self.expr(0)
        self.expect_op(")")
        body = self.block()
        arms.append((cond, body))
        else_stmts: list = []
        while self.peek() == ("KW", "elif"):
            self.next()
            self.expect_op("(")
            c2 = self.expr(0)
            self.expect_op(")")
            arms.append((c2, self.block()))
        if self.peek() == ("KW", "else"):
            self.next()
            else_stmts = self.block()
        return ("if", arms, else_stmts)


def parse_program(src: str) -> list:
    """Parse a put/filter program into a flat statement list (no
    begin/end/func separation — the Column compiler's entry point)."""
    p = _Parser(tokenize(src))
    stmts = p.statements()
    if p.peek()[0] != "EOF":
        raise DslSyntaxError(f"trailing tokens at {p.i}")
    return stmts


def _is_builtin_name(name: str) -> bool:
    """True if `name` is a DSL built-in function (udf.go:407: defining a
    func with a built-in's name is a build-time fatal). Lazy import: the
    registry lives in interp.py, which imports this module at load."""
    try:
        from .interp import BUILTINS
    except Exception:  # noqa: BLE001 — registry unavailable: no check
        return False
    return name in BUILTINS


def warn_unset_locals(program, src: str | None = None) -> list[str]:
    """Static might-not-be-assigned-yet analysis for `put -w/-W`
    (warn.go:17-180): an in-order treewalk carrying the set of local
    names written so far; a local-variable READ whose name isn't in the
    set warns. Flow-insensitive (an `if (false) {x=1}` counts as a
    write — dsl-warnings/0026). The written-set resets at begin/end and
    func/subr boundaries, with parameters pre-marked. Returns warning
    messages (empty = ok); with ``src``, messages carry the reference's
    "at DSL expression line L column C" suffix from the var node's
    recorded source offset (dsl-warnings/0014)."""
    _, funcs, subrs, begins, mains, ends = program
    warnings: list[str] = []

    def read(name, written, off=None):
        if name not in written:
            at = ""
            if src is not None and off is not None:
                line = src.count("\n", 0, off) + 1
                col = off - src.rfind("\n", 0, off)
                at = f" at DSL expression line {line} column {col}"
            warnings.append(
                f"Variable name {name} might not have been assigned yet{at}."
            )

    def walk(node, written, in_assign=False):
        if isinstance(node, list):
            for s in node:
                walk(s, written, in_assign)
            return
        if not isinstance(node, tuple) or not node:
            return
        k = node[0]
        if k == "var":
            if in_assign:
                written.add(node[1])
            else:
                read(node[1], written, node[2] if len(node) > 2 else None)
            return
        if k == "decl":
            # typed decl writes the name; the init expr is a read
            if node[3] is not None:
                walk(node[3], written, False)
            written.add(node[2])
            return
        if k == "assign":
            # LHS walks first in write context (x = x + 1 is clean);
            # inside an indexed lvalue only the base is a write
            # (warn.go:150-168: in z[i]=1, z writes, i reads)
            walk(node[2], written, True)
            walk(node[3], written, False)
            return
        if k in ("index", "slice"):
            walk(node[1], written, in_assign)
            for sub in node[2:]:
                if sub is not None:
                    walk(sub, written, False)
            return
        if k == "for_kv":
            for kv in node[1]:
                written.add(kv if isinstance(kv, str) else kv[1])
            if node[2] is not None:
                written.add(node[2] if isinstance(node[2], str)
                            else node[2][1])
            walk(node[3], written, False)
            walk(node[4], written, False)
            return
        if k == "funclit":
            inner = {p[1] if isinstance(p, tuple) else p
                     for p in node[1]}
            walk(node[2], inner, False)
            return
        for sub in node[1:]:
            walk(sub, written, in_assign)

    def walk_def(params, body):
        written = {p[1] if isinstance(p, tuple) else p for p in params}
        walk(body, written, False)

    for params, body, *_ in funcs.values():
        walk_def(params, body)
    for params, body in subrs.values():
        walk_def(params, body)
    for blk in begins:
        walk(blk, set(), False)
    for blk in ends:
        walk(blk, set(), False)
    walk(mains, set(), False)
    return warnings


def parse_full_program(src: str):
    """Parse into ("program", funcs, subrs, begins, mains, ends) for the
    stream interpreter. funcs/subrs: {name: (params, body)}."""
    stmts = parse_program(src)
    funcs: dict = {}
    subrs: dict = {}
    begins: list = []
    ends: list = []
    mains: list = []
    def check_break(node, in_loop):
        # break/continue only inside for/do/while — enforced at build
        # time in the reference (dsl-context-validation/0009..0012:
        # `func f() { break }` fatals without ever being called)
        if isinstance(node, list):
            for s2 in node:
                check_break(s2, in_loop)
            return
        if not isinstance(node, tuple) or not node:
            return
        k = node[0]
        if k in ("break", "continue") and not in_loop:
            raise DslSyntaxError(
                f"{k} statements are only valid within for/do/while loops"
            )
        if k in ("while", "dowhile", "for_kv", "for_c"):
            for sub in node[1:]:
                check_break(sub, True)
            return
        if k in ("funcdef", "subrdef"):
            check_break(node[3], False)
            return
        if k == "funclit":
            check_break(node[2], False)
            return
        for sub in node[1:]:
            check_break(sub, in_loop)

    for s in stmts:
        check_break(s, False)

    def forbid(node, kinds):
        # func/subr (and begin/end inside func bodies) are top-level
        # only — the reference fatals (dsl-context-validation/0005,
        # 0006; dsl-user-defined-functions-and-subroutines/0010,0011).
        # NOTE: "funclit" nodes are expressions, not definitions.
        if isinstance(node, tuple):
            if node and node[0] in kinds:
                label = {"funcdef": "func", "subrdef": "subr",
                         "begin": "begin", "end": "end"}[node[0]]
                raise DslSyntaxError(
                    f"{label} blocks can only be at top level"
                )
            for sub in node[1:]:
                forbid(sub, kinds)
        elif isinstance(node, list):
            for sub in node:
                forbid(sub, kinds)

    for s in stmts:
        if s[0] == "funcdef":
            if s[1] in funcs:
                raise DslSyntaxError(
                    f'function named "{s[1]}" has already been defined'
                )
            if _is_builtin_name(s[1]):
                # udf.go:407-410 — build-time fatal
                raise DslSyntaxError(
                    f'function named "{s[1]}" must not override a '
                    "built-in function of the same name"
                )
            forbid(s[3], ("funcdef", "subrdef", "begin", "end"))
            funcs[s[1]] = (s[2], s[3], s[4] if len(s) > 4 else None)
        elif s[0] == "subrdef":
            if s[1] in subrs:
                raise DslSyntaxError(
                    f'subroutine named "{s[1]}" has already been defined'
                )
            forbid(s[3], ("funcdef", "subrdef", "begin", "end"))
            subrs[s[1]] = (s[2], s[3])
        elif s[0] == "begin":
            forbid(s[1], ("funcdef", "subrdef"))
            begins.append(s[1])
        elif s[0] == "end":
            forbid(s[1], ("funcdef", "subrdef"))
            ends.append(s[1])
        else:
            forbid(s, ("funcdef", "subrdef", "begin", "end"))
            mains.append(s)

    def walk_returns(node, where):
        # return-context rules enforced at CST build in the reference:
        # funcs must return a value, subrs must not, and top-level
        # return is fatal (dsl-subr/0007, dsl-user-defined-functions-
        # and-subroutines/0004-0005, dsl-context-validation/0008).
        # funclit bodies are function scopes of their own.
        if isinstance(node, list):
            for s2 in node:
                walk_returns(s2, where)
            return
        if not isinstance(node, tuple) or not node:
            return
        k = node[0]
        if k == "funclit":
            walk_returns(node[2], "func")
            return
        if k == "return":
            if where == "main":
                raise DslSyntaxError(
                    "return statements are only valid within func/subr "
                    "blocks"
                )
            if where == "subr" and node[1] is not None:
                raise DslSyntaxError(
                    "return statements within subroutines must not "
                    "return a value"
                )
            if where == "func" and node[1] is None:
                raise DslSyntaxError(
                    "return statements within functions must return a "
                    "value"
                )
        for sub in node[1:]:
            walk_returns(sub, where)

    def walk_calls(node):
        # `call s(...)` targets resolve at build time (dsl-subr/0001)
        if isinstance(node, list):
            for s2 in node:
                walk_calls(s2)
            return
        if not isinstance(node, tuple) or not node:
            return
        if node[0] == "call_subr" and node[1] not in subrs:
            raise DslSyntaxError(
                f'subroutine "{node[1]}" not found'
            )
        for sub in node[1:]:
            walk_calls(sub)

    _FIELD_KINDS = ("field", "fieldstar", "fieldexpr",
                    "posname", "posval")

    def walk_no_fields(node):
        # $-anything is fatal inside begin/end blocks (validate.go:128
        # "begin/end blocks cannot refer to records via $x, $*, etc");
        # funclit/func bodies validate in their own (record) context
        if isinstance(node, list):
            for s2 in node:
                walk_no_fields(s2)
            return
        if not isinstance(node, tuple) or not node:
            return
        if node[0] in _FIELD_KINDS:
            raise DslSyntaxError(
                "begin/end blocks cannot refer to records via $x, $*, etc"
            )
        if node[0] == "funclit":
            return
        for sub in node[1:]:
            walk_no_fields(sub)

    for params, body, _rt in funcs.values():
        walk_returns(body, "func")
        walk_calls(body)
    for params, body in subrs.values():
        walk_returns(body, "subr")
        walk_calls(body)
    for blk in (*begins, *ends):
        walk_returns(blk, "main")
        walk_calls(blk)
        walk_no_fields(blk)
    walk_returns(mains, "main")
    walk_calls(mains)
    return ("program", funcs, subrs, begins, mains, ends)


def parse_expr(src: str):
    p = _Parser(tokenize(src))
    e = p.expr(0)
    if p.peek()[0] != "EOF":
        raise DslSyntaxError("trailing tokens after expression")
    return e
