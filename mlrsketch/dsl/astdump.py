"""Reference-format AST echo for `put -v` / `filter -v`.

The reference prints its parse tree before processing records
(pkg/climain via the pgpg asts package): one line per node,

    "token" [tt:terminal_name] [nt:NodeType]

indented 4 spaces per level, preceded by a "DSL EXPRESSION:" echo of
the program source. The terminal names come from the grammar
(pkg/parsing/mlr.bnf) and the node types from the bnf's shaping
annotations. This module re-derives that tree from the program text
with a raw-text-preserving tokenizer + Pratt parser, mirroring the
shapes observed across the reference's 500+ `-v` golden cases.

Constructs outside the corpus raise AstUnsupported so callers can fall
back to skipping rather than emitting a wrong dump.
"""

from __future__ import annotations

import re


class AstUnsupported(Exception):
    pass


# ---------------------------------------------------------------------------
# tokenizer (raw text preserving)
# ---------------------------------------------------------------------------

_OPS = [
    # longest-first
    "<<=", ">>=", "//=", "**=", "^^=", "&&=", "||=", "???", "!=~", ">>>",
    "<=>", "??", "==", "!=", "<=", ">=", "=~", "&&", "||", "^^", "<<",
    ">>", "**", "//", ".=", "+=", "-=", "*=", "/=", "%=", "&=", "|=",
    "^=", ".+", ".-", ".*", "./", "{", "}", "[", "]", "(", ")", ";",
    ",", ":", "?", "=", "<", ">", "+", "-", "*", "/", "%", ".", "!",
    "~", "&", "|", "^", "$", "@",
]

_KWS = {
    "begin", "end", "func", "subr", "if", "elif", "else", "for", "while",
    "do", "return", "break", "continue", "emit", "emitp", "emitf", "emit1",
    "print", "printn", "eprint", "eprintn", "dump", "edump", "tee", "call",
    "unset", "filter", "true", "false", "null", "in", "ENV",
    "var", "str", "num", "int", "float", "bool", "map", "arr", "funct",
    "all",
}

_TYPES = {"var", "str", "num", "int", "float", "bool", "map", "arr", "funct"}

_CTX = {"NR", "NF", "FNR", "FILENAME", "FILENUM",
        "IPS", "IFS", "IRS", "OPS", "OFS", "ORS", "FLATSEP"}

_NUM_RE = re.compile(
    r"0[xX][0-9a-fA-F]+|0[bB][01]+|"
    r"(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?"
)
_ID_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


def _tokenize(src: str):
    toks = []  # (kind, raw)
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == '"':
            j = i + 1
            while j < n and src[j] != '"':
                if src[j] == "\\":
                    j += 1
                j += 1
            if j >= n:
                raise AstUnsupported("unterminated string")
            raw = src[i : j + 1]
            i = j + 1
            if i < n and src[i] == "i" and not (
                i + 1 < n and (src[i + 1].isalnum() or src[i + 1] == "_")
            ):
                toks.append(("STRI", raw))
                i += 1
            else:
                toks.append(("STR", raw))
            continue
        if c in "$@":
            if i + 1 < n and src[i + 1] == "*":
                toks.append(("STAR" + c, c + "*"))
                i += 2
                continue
            if i + 1 < n and src[i + 1] == "{":
                j = src.index("}", i)
                toks.append(("BRACED" + c, src[i : j + 1]))
                i = j + 1
                continue
            if i + 1 < n and src[i + 1] == "[":
                toks.append(("IND" + c, c + "["))
                i += 2
                continue
            m = _ID_RE.match(src, i + 1) or _NUM_RE.match(src, i + 1)
            if not m:
                raise AstUnsupported(f"bare sigil {c}")
            toks.append(("NAME" + c, c + m.group(0)))
            i = m.end()
            continue
        m = _NUM_RE.match(src, i)
        if m and c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            m = _NUM_RE.match(src, i)
            raw = m.group(0)
            isf = ("." in raw or "e" in raw or "E" in raw) and not raw[:2].lower() in ("0x", "0b")
            toks.append(("FLOAT" if isf else "INT", raw))
            i = m.end()
            continue
        m = _ID_RE.match(src, i)
        if m:
            raw = m.group(0)
            toks.append(("KW" if raw in _KWS else "ID", raw))
            i = m.end()
            continue
        for op in _OPS:
            if src.startswith(op, i):
                toks.append(("OP", op))
                i += len(op)
                break
        else:
            raise AstUnsupported(f"character {c!r}")
    toks.append(("EOF", ""))
    return toks


# ---------------------------------------------------------------------------
# node helpers
# ---------------------------------------------------------------------------


def N(tok, tt, nt, kids=()):
    return (tok, tt, nt, list(kids))


_OP_TT = {
    "+": "op_plus", "-": "op_minus", "*": "op_star", "/": "op_slash",
    "//": "op_slash_slash", "%": "op_percent", "**": "op_pow",
    "==": "op_eqeq", "!=": "op_ne", "<": "op_lt", "<=": "op_le",
    ">": "op_gt", ">=": "op_ge", "=~": "op_eqtilde", "!=~": "op_negtilde",
    "&&": "op_logical_and", "||": "op_logical_or", "^^": "op_logical_xor",
    "&": "op_bit_and", "|": "op_bit_or", "^": "op_bit_xor",
    "<<": "op_shift_left", ">>": "op_shift_right",
    ">>>": "op_shift_right_logical",
    ".": "op_dot", ".+": "op_dot_plus", ".-": "op_dot_minus",
    ".*": "op_dot_star", "./": "op_dot_slash",
    "?": "op_ternary", "!": "op_bang", "~": "op_tilde",
    "??": "op_absent_coalesce", "???": "op_full_coalesce",
    "<=>": "op_spaceship",
}

_ASSIGN_TT = {
    "+=": "op_plus_equals", "-=": "op_minus_equals", "*=": "op_star_equals",
    "/=": "op_slash_equals", "//=": "op_slash_slash_equals",
    "%=": "op_percent_equals", "**=": "op_pow_equals",
    ".=": "op_dot_equals", "&&=": "op_and_equals", "||=": "op_or_equals",
    "^^=": "op_xor_equals", "&=": "op_bit_and_equals",
    "|=": "op_bit_or_equals", "^=": "op_bit_xor_equals",
    "<<=": "op_shift_left_equals", ">>=": "op_shift_right_equals",
}

# binding powers mirror mlrsketch/dsl/parser._BP
_BP = {
    "**": (90, 89),
    "???": (85, 86), "??": (84, 85),
    ".": (75, 76),
    "*": (70, 71), "/": (70, 71), "//": (70, 71), "%": (70, 71),
    ".*": (70, 71), "./": (70, 71),
    "+": (65, 66), "-": (65, 66), ".+": (65, 66), ".-": (65, 66),
    "<<": (60, 61), ">>": (60, 61), ">>>": (60, 61),
    "&": (55, 56), "^": (50, 51), "|": (45, 46),
    "<": (40, 41), "<=": (40, 41), ">": (40, 41), ">=": (40, 41),
    "==": (35, 36), "!=": (35, 36), "=~": (35, 36), "!=~": (35, 36),
    "<=>": (35, 36),
    "&&": (30, 31), "^^": (28, 29), "||": (26, 27),
    "?": (20, 19),
}

_ASSIGN_OPS = {"="} | set(_ASSIGN_TT)


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def next(self):
        t = self.toks[self.i]
        if t[0] != "EOF":
            self.i += 1
        return t

    def eat(self, raw):
        k, v = self.next()
        if v != raw:
            raise AstUnsupported(f"expected {raw!r}, got {v!r}")

    # -- expressions --------------------------------------------------------

    def expr(self, rbp=0):
        left = self.nud()
        while True:
            k, v = self.peek()
            if k == "OP" and v == "[":
                # postfix index or slice
                self.next()
                lo = None
                if self.peek() != ("OP", ":"):
                    lo = self.expr(0)
                if self.peek() == ("OP", ":"):
                    self.next()
                    hi = None
                    if self.peek() != ("OP", "]"):
                        hi = self.expr(0)
                    self.eat("]")
                    if lo is not None and hi is not None:
                        left = N("[]", "[]", "ArraySliceLoHi",
                                 [left, lo, hi])
                    elif lo is not None:
                        left = N("[]", "[]", "ArraySliceLoOnly",
                                 [left, lo])
                    elif hi is not None:
                        left = N("[]", "[]", "ArraySliceHiOnly",
                                 [left, hi])
                    else:
                        left = N("[]", "[]", "ArraySliceFull", [left])
                    continue
                self.eat("]")
                if left[2] == "EnvironmentVariable" and not left[3]:
                    left = N(left[0], left[1], left[2], [lo])
                else:
                    left = N("[]", "[]", "ArrayOrMapIndexAccess", [left, lo])
                continue
            if k == "OP" and v == "?" and _BP["?"][0] > rbp:
                self.next()
                a = self.expr(0)
                self.eat(":")
                b = self.expr(_BP["?"][1])
                left = N("?", "op_ternary", "Operator", [left, a, b])
                continue
            if k == "OP" and v in _BP and v != "?":
                lbp, rbp2 = _BP[v]
                if lbp <= rbp:
                    break
                self.next()
                right = self.expr(rbp2)
                nt = "DotOperator" if v == "." else "Operator"
                left = N(v, _OP_TT[v], nt, [left, right])
                continue
            break
        return left

    def nud(self):
        k, v = self.next()
        if k == "INT":
            return N(v, "int_literal", "int_literal")
        if k == "FLOAT":
            return N(v, "float_literal", "float_literal")
        if k == "STR":
            return N(v, "string_literal", "string_literal")
        if k == "STRI":
            return N(v, "string_literal", "RegexCaseInsensitive",
                     [N(v, "string_literal", "string_literal")])
        if k == "NAME$":
            return N(v, "field_name", "DirectFieldValue")
        if k == "STAR$":
            return N("$*", "full_srec", "FullSrec")
        if k == "BRACED$":
            return N(v, "braced_field_name", "BracedFieldValue")
        if k == "IND$":
            e = self.expr(0)
            self.eat("]")
            return N("$[]", "$[]", "IndirectFieldValue", [e])
        if k == "NAME@":
            return N(v, "oosvar_name", "DirectOosvarValue")
        if k == "STAR@":
            return N("@*", "full_oosvar", "FullOosvar")
        if k == "BRACED@":
            return N(v, "braced_oosvar_name", "BracedOosvarValue")
        if k == "IND@":
            e = self.expr(0)
            self.eat("]")
            return N("@[]", "@[]", "IndirectOosvarValue", [e])
        if k == "KW" and v == "true":
            return N("true", "literal_true", "bool_literal")
        if k == "KW" and v == "false":
            return N("false", "literal_false", "bool_literal")
        if k == "KW" and v == "ENV":
            return N("ENV", "kw_env", "EnvironmentVariable")
        if k == "KW" and v in _TYPES and self.peek() == ("OP", "("):
            self.next()
            args = self._args()
            return N(v, "kw_" + v, "FunctionCallsite", args)
        if k == "ID" or (k == "KW" and v == "all"):
            if v in _CTX:
                return N(v, "ctx_" + v, "ctx_" + v)
            if self.peek() == ("OP", "("):
                self.next()
                args = self._args()
                return N(v, "non_sigil_name", "FunctionCallsite", args)
            return N(v, "non_sigil_name", "LocalVariable")
        if k == "OP" and v == "(":
            e = self.expr(0)
            self.eat(")")
            return N(e[0], e[1], "Parenthesized", [e])
        if k == "OP" and v in ("!", "~", "-", "+"):
            sub = self.expr(80)
            return N(v, _OP_TT[v], "Operator", [sub])
        if k == "OP" and v == "[":
            items = []
            while self.peek() != ("OP", "]"):
                items.append(self.expr(0))
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
            self.eat("]")
            return N("[]", "[]", "ArrayLiteral", items)
        if k == "OP" and v == "{":
            pairs = []
            while self.peek() != ("OP", "}"):
                key = self.expr(0)
                self.eat(":")
                val = self.expr(0)
                pairs.append(N(":", "colon", "MapLiteralKeyValuePair",
                               [key, val]))
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
            self.eat("}")
            return N("{}", "{}", "MapLiteral", pairs)
        raise AstUnsupported(f"expression token {v!r}")

    def _args(self):
        args = []
        if self.peek() != ("OP", ")"):
            while True:
                if self.peek() == ("OP", ","):
                    self.next()
                    if self.peek() == ("OP", ")"):
                        break
                    continue
                args.append(self.expr(0))
                if self.peek() == ("OP", ","):
                    self.next()
                    if self.peek() == ("OP", ")"):
                        break
                    continue
                break
        self.eat(")")
        return args

    # -- statements ---------------------------------------------------------

    def statements(self, until=None):
        out = []
        while True:
            k, v = self.peek()
            if k == "EOF":
                if until:
                    raise AstUnsupported(f"expected {until!r}")
                break
            if until and (k, v) == ("OP", until):
                break
            if (k, v) == ("OP", ";"):
                self.next()
                continue
            out.append(self.statement())
        return out

    def braces(self):
        self.eat("{")
        stmts = self.statements("}")
        self.eat("}")
        return N("block", "block", "StatementBlockInBraces",
                 [N("block", "block", "StatementBlock", stmts)])

    def statement(self):
        k, v = self.peek()
        if k == "KW":
            if v in ("begin", "end"):
                self.next()
                return N(v, "kw_" + v,
                         "BeginBlock" if v == "begin" else "EndBlock",
                         [self.braces()])
            if v in ("func", "subr"):
                return self.func_def(v)
            if v == "if":
                return self.if_chain()
            if v == "while":
                self.next()
                self.eat("(")
                cond = self.expr(0)
                self.eat(")")
                return N("while", "kw_while", "WhileLoop",
                         [cond, self.braces()])
            if v == "do":
                self.next()
                body = self.braces()
                kw = self.next()
                if kw[1] != "while":
                    raise AstUnsupported("do without while")
                self.eat("(")
                cond = self.expr(0)
                self.eat(")")
                return N("do", "kw_do", "DoWhileLoop", [body, cond])
            if v == "for":
                return self.for_stmt()
            if v == "return":
                self.next()
                nk, nv = self.peek()
                if (nk, nv) in (("OP", ";"), ("OP", "}"), ("EOF", "")):
                    return N("return", "kw_return", "ReturnStatement")
                return N("return", "kw_return", "ReturnStatement",
                         [self.expr(0)])
            if v == "break":
                self.next()
                return N("break", "kw_break", "BreakStatement")
            if v == "continue":
                self.next()
                return N("continue", "kw_continue", "ContinueStatement")
            if v in ("emit", "emitp", "emitf"):
                return self.emit_stmt(v)
            if v == "dump":
                self.next()
                return N("dump", "kw_dump", "DumpStatement")
            if v == "print":
                self.next()
                nk, nv = self.peek()
                if (nk, nv) in (("OP", ";"), ("OP", "}"), ("EOF", "")):
                    return N("print", "kw_print", "PrintStatement")
                return N("print", "kw_print", "PrintStatement",
                         [self.expr(0)])
            if v == "unset":
                self.next()
                targets = [self.expr(0)]
                while self.peek() == ("OP", ","):
                    self.next()
                    targets.append(self.expr(0))
                return N("unset", "kw_unset", "Unset", targets)
            if v == "call":
                self.next()
                nk, name = self.next()
                self.eat("(")
                args = self._args()
                return N(name, "non_sigil_name", "SubroutineCallsite", args)
            if v in _TYPES and self.peek(1)[0] == "ID":
                self.next()
                _, name = self.next()
                lv = N(v, "kw_" + v, "TypedeclLocalVariable",
                       [N(v, "kw_" + v, "kw_" + v),
                        N(name, "non_sigil_name", "LocalVariable")])
                if self.peek() == ("OP", "="):
                    self.next()
                    return N("=", "equals", "Assignment", [lv, self.expr(0)])
                raise AstUnsupported("bare typed declaration")
        # expression-led
        e = self.expr(0)
        k, v = self.peek()
        if (k, v) == ("OP", "="):
            self.next()
            return N("=", "equals", "Assignment", [e, self.expr(0)])
        if k == "OP" and v in _ASSIGN_TT:
            self.next()
            tt = _ASSIGN_TT[v]
            return N(v, tt, "CompoundAssignment",
                     [e, N(v, tt, tt), self.expr(0)])
        if (k, v) == ("OP", "{"):
            return N(e[0], e[1], "CondBlock", [e, self.braces()])
        return N(e[0], e[1], "BareBoolean", [e])

    def if_chain(self):
        items = []
        self.next()  # if
        self.eat("(")
        cond = self.expr(0)
        self.eat(")")
        items.append(N("if", "kw_if", "IfItem", [cond, self.braces()]))
        while self.peek() == ("KW", "elif"):
            self.next()
            self.eat("(")
            cond = self.expr(0)
            self.eat(")")
            items.append(N("elif", "kw_elif", "IfItem",
                           [cond, self.braces()]))
        if self.peek() == ("KW", "else"):
            self.next()
            items.append(N("else", "kw_else", "IfItem", [self.braces()]))
        return N("if_chain", "if_chain", "IfChain", items)

    def for_stmt(self):
        self.next()  # for
        self.eat("(")
        # multivariable: for ((k1,k2), v in X)
        if self.peek() == ("OP", "("):
            self.next()
            keys = []
            while True:
                nk, nv = self.next()
                if nk not in ("ID", "KW"):
                    raise AstUnsupported("loop key variable")
                keys.append(N(nv, "non_sigil_name", "LocalVariable"))
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
            self.eat(")")
            self.eat(",")
            nk, nv = self.next()
            val = N(nv, "non_sigil_name", "LocalVariable")
            kw = self.next()
            if kw[1] != "in":
                raise AstUnsupported("for multivariable without in")
            coll = self.expr(0)
            self.eat(")")
            mi = N("multi_index", "multi_index", "MultiIndex", keys)
            return N("for", "kw_for", "ForLoopMultivariable",
                     [mi, val, coll, self.braces()])
        # one/two-variable or triple
        save = self.i
        try:
            names = []
            while True:
                nk, nv = self.next()
                if nk == "KW" and nv in _TYPES:
                    raise AstUnsupported("typed loop variable")
                if nk != "ID":
                    raise AstUnsupported("loop variable")
                names.append(nv)
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
            kw = self.next()
            if kw[1] != "in":
                raise AstUnsupported("not a for-in")
            coll = self.expr(0)
            self.eat(")")
            body = self.braces()
            vars_ = [N(nm, "non_sigil_name", "LocalVariable")
                     for nm in names]
            if len(names) == 1:
                return N("for", "kw_for", "ForLoopOneVariable",
                         [*vars_, coll, body])
            if len(names) == 2:
                return N("for", "kw_for", "ForLoopTwoVariable",
                         [*vars_, coll, body])
            raise AstUnsupported("for-in with >2 loop variables")
        except AstUnsupported:
            self.i = save
        # triple-for
        init = self.statements_until_semi()
        cond_items = self.statements_until_semi()
        # final continuation item renders as BareBoolean inside the block
        update = []
        while self.peek() != ("OP", ")"):
            update.append(self.statement())
            if self.peek() == ("OP", ","):
                self.next()
        self.eat(")")
        body = self.braces()
        return N("for", "kw_for", "TripleForLoop", [
            N("block", "block", "StatementBlock", init),
            N("block", "block", "StatementBlock", cond_items),
            N("block", "block", "StatementBlock", update),
            body,
        ])

    def statements_until_semi(self):
        out = []
        while self.peek() != ("OP", ";"):
            out.append(self.statement())
            if self.peek() == ("OP", ","):
                self.next()
        self.eat(";")
        return out

    def emit_stmt(self, kw):
        self.next()
        nt = {"emit": "EmitStatement", "emitp": "EmitPStatement",
              "emitf": "EmitFStatement"}[kw]
        if self.peek()[1] in (">", ">>", "|"):
            raise AstUnsupported("emit redirect")
        kids = []
        if self.peek() == ("OP", "("):
            self.next()
            while True:
                kids.append(self.expr(0))
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
            self.eat(")")
            kids = [N("lashed", "lashed", "EmittableList", kids)]
        else:
            kids.append(self.expr(0))
        while self.peek() == ("OP", ","):
            self.next()
            kids.append(self.expr(0))
        return N(kw, "kw_" + kw, nt, kids)

    def func_def(self, kind):
        self.next()
        nk, name = self.next()
        self.eat("(")
        params = []
        if self.peek() != ("OP", ")"):
            while True:
                pk, pv = self.peek()
                if pk == "KW" and pv in _TYPES:
                    self.next()
                    _, pname = self.next()
                    params.append(N(pv, "kw_" + pv, "Parameter",
                                    [N(pv, "kw_" + pv, "kw_" + pv),
                                     N(pname, "non_sigil_name",
                                       "LocalVariable")]))
                else:
                    _, pname = self.next()
                    params.append(N(pname, "non_sigil_name", "Parameter",
                                    [N(pname, "non_sigil_name",
                                       "LocalVariable")]))
                if self.peek() == ("OP", ","):
                    self.next()
                    if self.peek() == ("OP", ")"):
                        break
                    continue
                break
        self.eat(")")
        if params:
            plist = N("params", "params", "ParameterList",
                      [N("params", "params", "ParameterList", params)])
        else:
            plist = N("params", "params", "ParameterList")
        kids = [plist]
        if self.peek() == ("OP", ":"):
            self.next()
            tk, tv = self.next()
            kids.append(N(tv, "kw_" + tv, "kw_" + tv))
        kids.append(self.braces())
        nt = ("NamedFunctionDefinition" if kind == "func"
              else "SubroutineDefinition")
        return N(name, "non_sigil_name", nt, kids)


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------


def _render(node, depth, out):
    tok, tt, nt, kids = node
    out.append(f'{"    " * depth}"{tok}" [tt:{tt}] [nt:{nt}]')
    for kid in kids:
        _render(kid, depth + 1, out)


def ast_dump(src: str) -> str:
    """The tree text only (no DSL EXPRESSION header)."""
    p = _P(_tokenize(src))
    stmts = p.statements()
    root = N("block", "block", "StatementBlock", stmts)
    out: list[str] = []
    _render(root, 0, out)
    return "\n".join(out)


def verbose_header(src: str) -> str:
    """The full `put -v` preamble exactly as the reference prints it:
    Println(src) — so a file-sourced program (trailing newline kept)
    yields two blank lines before AST:, an inline one yields one."""
    return ("DSL EXPRESSION:\n" + src + "\n" + "\nAST:\n"
            + ast_dump(src) + "\n\n")
