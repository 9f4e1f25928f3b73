"""Lexer + Pratt parser for the Miller DSL scalar subset.

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

AST nodes are plain tuples:
    ("int", v) ("float", v) ("str", v) ("bool", v)
    ("field", name) ("var", name) ("ctx", name)      # NR/NF/FILENAME/M_PI...
    ("unop", op, a) ("binop", op, a, b) ("ternary", c, a, b)
    ("call", fname, [args])
    ("match", a, pattern, case_insensitive, negate)   # =~ / !=~ with literal pattern

Statements:
    ("assign", op, target_node, expr)   # op in {"=", "+=", ...}
    ("unset", [field names])
    ("filter", expr)
    ("if", [(cond, stmts), ...], else_stmts)
    ("bare", expr)                      # expression statement
"""

from __future__ import annotations


class DslSyntaxError(Exception):
    pass


class DslUnsupported(Exception):
    """Construct outside the Column-compilable subset."""


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
    "arr", "in", "break", "continue",
}

_ID_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")
_ID_CHARS = _ID_START | set("0123456789")


def tokenize(src: str) -> list[tuple[str, object]]:
    """Returns list of (kind, value); kinds: NUM, STR, FIELD, OOSVAR,
    IDENT, KW, OP, REGEXI (string literal with trailing i flag)."""
    toks: list[tuple[str, object]] = []
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
                raise DslUnsupported("$* record reference")
            if src[i : i + 2] == "${":
                j = src.find("}", i + 2)
                if j < 0:
                    raise DslSyntaxError("unterminated ${...}")
                toks.append(("FIELD", src[i + 2 : j]))
                i = j + 1
                continue
            if src[i : i + 2] == "$[":
                raise DslUnsupported("computed field name $[...]")
            j = i + 1
            while j < n and src[j] in _ID_CHARS:
                j += 1
            if j == i + 1:
                raise DslSyntaxError(f"bare $ at {i}")
            toks.append(("FIELD", src[i + 1 : j]))
            i = j
            continue
        if c == "@":
            raise DslUnsupported("oosvar (@) — cross-record state")
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
            while j < n and src[j] in _ID_CHARS:
                j += 1
            word = src[i:j]
            toks.append(("KW" if word in _KEYWORDS else "IDENT", word))
            i = j
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

_UNARY_BP = 80

_ASSIGN_OPS = {
    "=", "+=", "-=", "*=", "/=", "//=", "%=", "**=", ".=", "&&=", "||=",
    "^^=", "??=", "???=", "&=", "|=", "^=", "<<=", ">>=", ">>>=",
}

_CTX_NAMES = {"NR", "NF", "FNR", "FILENAME", "FILENUM", "M_PI", "M_E", "IPS",
              "IFS", "IRS", "OPS", "OFS", "ORS"}


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

    # -- expressions -------------------------------------------------------

    def expr(self, rbp: int = 0):
        left = self.nud()
        while True:
            k, v = self.peek()
            if k != "OP" or v not in _BP:
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
                if k2 == "STR":
                    self.next()
                    left = ("match", left, v2, False, v in ("!=~", "!~"))
                elif k2 == "REGEXI":
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
        if k == "KW" and v in ("true", "false"):
            return ("bool", v == "true")
        if k == "IDENT":
            nk, nv = self.peek()
            if nk == "OP" and nv == "(":
                self.next()
                args = []
                if not (self.peek() == ("OP", ")")):
                    while True:
                        args.append(self.expr(0))
                        if self.peek() == ("OP", ","):
                            self.next()
                            continue
                        break
                self.expect_op(")")
                return ("call", v, args)
            if v in _CTX_NAMES:
                return ("ctx", v)
            return ("var", v)
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
            if v == "[":
                raise DslUnsupported("array literal")
            if v == "{":
                raise DslUnsupported("map literal")
        raise DslSyntaxError(f"unexpected token {k} {v!r}")

    # -- statements ----------------------------------------------------------

    def statements(self, until: str | None = None) -> list:
        out = []
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
                continue
            out.append(self.statement())
        return out

    def statement(self):
        k, v = self.peek()
        if k == "KW":
            if v in ("begin", "end"):
                raise DslUnsupported(f"{v} block — cross-record state")
            if v in ("func", "subr"):
                raise DslUnsupported("user-defined function")
            if v in ("for", "while", "do", "break", "continue", "return", "call"):
                raise DslUnsupported(f"{v} statement")
            if v in ("emit", "emitp", "emitf", "emit1", "tee", "print",
                     "printn", "eprint", "eprintn", "dump", "edump"):
                raise DslUnsupported(f"{v} statement")
            if v == "if":
                return self.if_statement()
            if v == "filter":
                self.next()
                return ("filter", self.expr(0))
            if v == "unset":
                self.next()
                names = []
                while True:
                    fk, fv = self.next()
                    if fk != "FIELD":
                        raise DslUnsupported("unset of non-field")
                    names.append(fv)
                    if self.peek() == ("OP", ","):
                        self.next()
                        continue
                    break
                return ("unset", names)
            if v in ("var", "str", "num", "int", "float", "bool", "map", "arr"):
                # typed local declaration: `var x = e` (type asserted at
                # compile where cheap; ignored otherwise)
                if self.peek(1)[0] == "IDENT" and self.peek(2) == ("OP", "="):
                    self.next()
                    _, name = self.next()
                    self.next()  # =
                    return ("assign", "=", ("var", name), self.expr(0))
                if v in ("map", "arr"):
                    raise DslUnsupported(f"{v} declaration")
                # fallthrough: could be int(...) call — parse as expression
        # expression-led statement: assignment / pattern-action / bare
        e = self.expr(0)
        k, v = self.peek()
        if k == "OP" and v in _ASSIGN_OPS:
            self.next()
            if e[0] not in ("field", "var"):
                raise DslUnsupported(f"assignment target {e[0]}")
            rhs = self.expr(0)
            return ("assign", v, e, rhs)
        if (k, v) == ("OP", "{"):
            # awk-style pattern-action
            self.next()
            body = self.statements(until="}")
            self.expect_op("}")
            return ("if", [(e, body)], [])
        return ("bare", e)

    def if_statement(self):
        arms = []
        self.next()  # if
        self.expect_op("(")
        cond = self.expr(0)
        self.expect_op(")")
        self.expect_op("{")
        body = self.statements(until="}")
        self.expect_op("}")
        arms.append((cond, body))
        else_stmts: list = []
        while self.peek() == ("KW", "elif"):
            self.next()
            self.expect_op("(")
            c2 = self.expr(0)
            self.expect_op(")")
            self.expect_op("{")
            b2 = self.statements(until="}")
            self.expect_op("}")
            arms.append((c2, b2))
        if self.peek() == ("KW", "else"):
            self.next()
            self.expect_op("{")
            else_stmts = self.statements(until="}")
            self.expect_op("}")
        return ("if", arms, else_stmts)


def parse_program(src: str) -> list:
    """Parse a put/filter program into a statement list."""
    p = _Parser(tokenize(src))
    stmts = p.statements()
    if p.peek()[0] != "EOF":
        raise DslSyntaxError(f"trailing tokens at {p.i}")
    return stmts


def parse_expr(src: str):
    p = _Parser(tokenize(src))
    e = p.expr(0)
    if p.peek()[0] != "EOF":
        raise DslSyntaxError("trailing tokens after expression")
    return e
