"""Record-stream writers: render a list of key→value dicts the way the
reference CLI prints each output format, so `python -m mlrsketch` is a
drop-in for `mlr` on the supported surface.

Format conventions verified against the reference writers:
  dkvp   pkg/output/record_writer_dkvp.go   (k=v joined by OFS)
  nidx   pkg/output/record_writer_nidx.go   (values joined by OFS)
  csv    pkg/output/record_writer_csv.go    (header once; schema change is
         an error unless the new keys extend the first header — the
         "auto-unsparsify over" rule at record_writer_csv.go:96-110;
         Go-csv minimal quoting, record_writer_csv_colorizer.go:183)
  csvlite pkg/output/record_writer_csvlite.go (blank line + new header on
         schema change, no quoting)
  tsv    pkg/output/record_writer_tsv.go    (backslash escapes, no quoting)
  json   pkg/output/record_writer_json.go   (list-wrapped, 2-space indent)
  jsonl  single-line objects, ", " / ": " separators
  xtab   pkg/output/record_writer_xtab.go   (keys padded per record to the
         record's max key width; blank line between records)
  pprint pkg/output/record_writer_pprint.go (per-schema-block column
         alignment, "" rendered as "-", last column unpadded)
  markdown pkg/output/record_writer_markdown.go

Values arrive either as strings (the interpreter's carrier model) or as
typed Python values (Spark collect); both render through the DSL
interpreter's `format_value`, which honors MLR_OFMT when set. A key
whose value is None is ABSENT (not printed); "" is Miller VOID (printed
empty).
"""

from __future__ import annotations

from typing import Iterable

from mlrsketch.dsl import interp as MI


_NO_SCAN_OFMT = False  # set by render() for -S (all-strings) streams


def _fmt(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, str) and v[:1] == "\x02":
        return v[1:]  # error-as-value mark: print the bare token
    fmt = None if _NO_SCAN_OFMT else MI.current_ofmt()
    if fmt and isinstance(v, str):
        # Under MLR_OFMT the reference formats every FLOAT-typed value
        # at output, including pass-through ones (ints untouched); our
        # string-carrier values re-scan like the reader's inference did.
        from mlrsketch.mlrcli import _infer

        iv = _infer(v)
        if isinstance(iv, float):
            try:
                return fmt % iv
            except (TypeError, ValueError):
                pass
    out = MI.format_value(v)
    if out is None:
        return None
    return out if isinstance(out, str) else str(out)


def _cells(rec: dict) -> list[tuple[str, str]]:
    """(key, rendered value) pairs, absent keys dropped."""
    out = []
    for k, v in rec.items():
        s = _fmt(v)
        if s is not None:
            out.append((k, s))
    return out


def _schema_blocks(records: list[dict]):
    """Group CONSECUTIVE records sharing an identical key list — the
    unit at which csvlite/pprint emit a fresh header."""
    block: list[list[tuple[str, str]]] = []
    keys: tuple[str, ...] | None = None
    for rec in records:
        cells = _cells(rec)
        if not cells:
            continue  # writers skip keyless records
        ks = tuple(k for k, _ in cells)
        if keys is not None and ks != keys:
            yield keys, block
            block = []
        keys = ks
        block.append(cells)
    if keys is not None:
        yield keys, block


def _csv_quote(field: str, sep: str) -> str:
    if field == "":
        return field
    if field == "\\." or any(c in field for c in (sep, '"', "\r", "\n")):
        return '"' + field.replace('"', '""') + '"'
    return field


def _cmap(comments):
    """index -> [comment lines] (pass-comments interleave points)."""
    m: dict[int, list[str]] = {}
    for idx, ln in (comments or ()):
        m.setdefault(idx, []).append(ln)
    return m


def w_dkvp(records, ofs=None, quoted=False, comments=None, ops=None, **_):
    ofs = ofs or ","
    ops = ops or "="
    cm = _cmap(comments)
    lines = []
    for i, rec in enumerate(records):
        lines.extend(cm.get(i, ()))
        cells = _cells(rec)
        if quoted:
            # dkvpx: CSV-style minimal quoting — only values containing
            # the pair/field separators or a quote, inner quotes doubled
            def q(v):
                if any(c in v for c in (ofs, ops, '"')):
                    return '"' + v.replace('"', '""') + '"'
                return v

            lines.append(ofs.join(f"{k}{ops}{q(v)}" for k, v in cells))
        else:
            lines.append(ofs.join(f"{k}{ops}{v}" for k, v in cells))
    for idx in sorted(k for k in cm if k >= len(records)):
        lines.extend(cm[idx])
    return "".join(ln + "\n" for ln in lines)


def w_nidx(records, ofs=None, comments=None, **_):
    ofs = ofs or " "
    cm = _cmap(comments)
    lines = []
    for i, r in enumerate(records):
        lines.extend(cm.get(i, ()))
        lines.append(ofs.join(v for _, v in _cells(r)))
    for idx in sorted(k for k in cm if k >= len(records)):
        lines.extend(cm[idx])
    return "".join(ln + "\n" for ln in lines)


def w_csv(records, ofs=None, headerless=False, lite=False, **_):
    comments = _.get("comments")
    quote_all = _.get("quote_all", False)
    ors2 = _.get("ors2", False)  # --ors lflf: blank line after each row
    qf = ((lambda v, sp: '"' + v.replace('"', '""') + '"')
          if quote_all else _csv_quote)
    eol = "\n\n" if ors2 else "\n"
    sep = ofs or ","
    out: list[str] = []
    if lite:
        first = True
        for keys, block in _schema_blocks(records):
            if not first and not ors2:
                out.append("\n")
            first = False
            if not headerless:
                out.append(sep.join(keys) + eol)
            for cells in block:
                out.append(sep.join(v for _, v in cells) + eol)
        return "".join(out)
    # strict csv: one header; later records must extend the first keys
    # (extra trailing values printed positionally, missing ones "")
    cm = _cmap(comments)
    first_keys: list[str] | None = None
    for i, rec in enumerate(records):
        out.extend(c + "\n" for c in cm.get(i, ()))
        cells = _cells(rec)
        if not cells:
            continue
        ks = [k for k, _ in cells]
        if first_keys is None:
            first_keys = ks
            if not headerless:
                out.append(sep.join(qf(k, sep) for k in ks) + eol)
        else:
            if ks[: len(first_keys)] != first_keys[: len(ks)]:
                raise ValueError(
                    f"CSV schema change: first keys {first_keys}; current keys {ks}"
                )
        vals = [v for _, v in cells]
        if len(vals) < len(first_keys):
            vals += [""] * (len(first_keys) - len(vals))
        out.append(sep.join(qf(v, sep) for v in vals) + eol)
    for idx in sorted(k for k in cm if k >= len(records)):
        out.extend(c + "\n" for c in cm[idx])
    return "".join(out)


_TSV_ESC = {"\\": "\\\\", "\n": "\\n", "\t": "\\t", "\r": "\\r"}


def _tsv_escape(s: str) -> str:
    if any(c in s for c in "\\\n\t\r"):
        for raw, esc in _TSV_ESC.items():
            s = s.replace(raw, esc)
    return s


def w_tsv(records, ofs=None, headerless=False, lite=False, **_):
    sep = ofs or "\t"
    out: list[str] = []
    esc = (lambda s: s) if lite else _tsv_escape  # tsvlite: bytes literal
    if not lite:
        # strict tsv mirrors the csv writer's auto-unsparsify rule:
        # one header; later records must extend its prefix (short rows
        # pad with voids, long rows print positionally) —
        # io-tsv-auto-unsparsify/{over,under}
        cm = _cmap(_.get("comments"))
        first_keys: list[str] | None = None
        for i, rec in enumerate(records):
            out.extend(c + "\n" for c in cm.get(i, ()))
            cells = _cells(rec)
            if not cells:
                continue
            ks = [k for k, _ in cells]
            if first_keys is None:
                first_keys = ks
                if not headerless:
                    out.append(sep.join(esc(k) for k in ks) + "\n")
            elif ks[: len(first_keys)] != first_keys[: len(ks)]:
                raise ValueError("TSV schema change")
            vals = [v for _, v in cells]
            if len(vals) < len(first_keys):
                vals += [""] * (len(first_keys) - len(vals))
            out.append(sep.join(esc(v) for v in vals) + "\n")
        for idx in sorted(k for k in cm if k >= len(records)):
            out.extend(c + "\n" for c in cm[idx])
        return "".join(out)
    first = True
    for keys, block in _schema_blocks(records):
        if not first:
            out.append("\n")
        first = False
        if not headerless:
            out.append(sep.join(esc(k) for k in keys) + "\n")
        for cells in block:
            out.append(sep.join(esc(v) for _, v in cells) + "\n")
    return "".join(out)


_JSON_NUM_RE = __import__("re").compile(r"-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?")


def _json_scalar(v, typed: bool = False) -> str:
    """One JSON value: numeric-typed (or numeric-scanning string) values
    print bare, everything else as a JSON string — Miller prints from
    the typed mlrval, and our string-carrier model re-scans like the
    reader did (mlrval_new.go inference). `typed` = the records carry
    native JSON types already (pristine json pass-through): strings are
    REAL strings and must stay quoted, no re-scan."""
    import json as _json

    if v is MI.NULL:
        return "null"  # MT_NULL prints bare (mlrval_json.go:326-328)
    if isinstance(v, str) and v[:1] == "\x02":
        # error-as-value carrier mark: bare token, intentionally
        # invalid JSON like the reference (mlrval_json.go MT_ERROR)
        return v[1:]
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, MI.Err):
        return "(error)"  # Miller prints the bare token (invalid JSON)
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        s = _fmt(v)
        return s if s is not None else "null"
    if isinstance(v, (dict, list)):
        return MI.json_encode(v)
    if typed and isinstance(v, str):
        return _json.dumps(v, ensure_ascii=False)
    s = v if isinstance(v, str) else str(v)
    from mlrsketch.mlrcli import _infer

    iv = _infer(s)
    if isinstance(iv, (int, float)) and not isinstance(iv, bool):
        if _JSON_NUM_RE.fullmatch(s):
            return _fmt(s)  # bare number; MLR_OFMT applies to float scans
        # numeric but not a VALID JSON literal (004.56 / .56 / 4. / +4.56):
        # print the parsed value (record_writer_json emits the mlrval's
        # number, and the printrep would be invalid JSON)
        out = MI.format_value(float(iv) if isinstance(iv, float) else iv)
        return out if isinstance(out, str) else str(out)
    # NOTE: "true"/"false" STRINGS stay quoted — Miller never infers
    # booleans from data; bare booleans only arise typed from the DSL.
    return _json.dumps(s, ensure_ascii=False)


def _scan_leaves(v):
    """Carrier-mode leaf scan for nested values rebuilt by the final
    unflatten: string leaves re-infer like the reader did (the reference
    had typed mlrvals all along), keeping the original spelling via
    PInt/PFloat printreps."""
    if isinstance(v, dict):
        return {k: _scan_leaves(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_scan_leaves(x) for x in v]
    if isinstance(v, str):
        return MI.infer_value(v)
    return v


def _maybe_unflatten(rec: dict, flatsep: str, auto: bool) -> dict:
    if not auto:
        return {k: v for k, v in rec.items() if v is not None}
    if not any(flatsep in k for k in rec):
        # the final unflatten still reverses flatten's empty-collection
        # special case on every terminal ("{}"/"[]" -> {} / [],
        # mlrmap_flatten_unflatten.go unflattenTerminal)
        return {
            k: MI._unflatten_terminal(v)
            for k, v in rec.items() if v is not None
        }
    out = MI.unflatten_record(
        {k: v for k, v in rec.items() if v is not None}, flatsep
    )
    return {
        k: (_scan_leaves(v) if isinstance(v, (dict, list)) else v)
        for k, v in out.items()
    }


def _json_key(k: str) -> str:
    import json as _json

    return _json.dumps(str(k), ensure_ascii=False)


def _quote_leaves(v):
    """--jvquoteall: every scalar leaf becomes its string spelling
    (maps/lists keep structure; the typed encoder then quotes them)."""
    if isinstance(v, dict):
        return {k: _quote_leaves(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_quote_leaves(x) for x in v]
    if isinstance(v, bool):
        return "true" if v else "false"
    s = _fmt(v)
    return "" if s is None else str(s)


def w_json(records, flatsep=".", auto_unflatten=True, no_jvstack=False,
           comments=None,
           json_typed=False, json_quote_all=False, **_):
    pre = ""
    if json_quote_all:
        json_typed = True  # quoted leaves are REAL strings: no re-scan
    if comments:
        # pass-comments with a buffered writer: the reader's comment
        # copies reach stdout before the end-of-stream list renders
        pre = "".join(ln + "\n" for _, ln in comments)
    if no_jvstack:
        # --no-jvstack: single-line objects inside the list wrapper
        bodies = []
        for rec in records:
            nested = _maybe_unflatten(rec, flatsep, auto_unflatten)
            if json_quote_all:
                nested = _quote_leaves(nested)
            if not nested:
                bodies.append("{}")  # zero-key record prints {} (sparsify)
                continue
            parts = [
                f"{_json_key(k)}: "
                + (MI.json_encode(v) if isinstance(v, (dict, list)) else _json_scalar(v, json_typed))
                for k, v in nested.items()
            ]
            bodies.append("{" + ", ".join(parts) + "}")
        return pre + ("[\n" + ",\n".join(bodies) + "\n]\n" if bodies else "")
    bodies = []
    for rec in records:
        nested = _maybe_unflatten(rec, flatsep, auto_unflatten)
        if json_quote_all:
            nested = _quote_leaves(nested)
        if not nested:
            bodies.append("{}")  # zero-key record prints {} (sparsify)
            continue
        fields = []
        for k, v in nested.items():
            if isinstance(v, (dict, list)):
                enc = MI.json_encode(v, indent=2)
                enc = "\n".join(
                    ("  " + ln if i else ln) for i, ln in enumerate(enc.splitlines())
                )
                fields.append(f"  {_json_key(k)}: {enc}")
            else:
                fields.append(f"  {_json_key(k)}: {_json_scalar(v, json_typed)}")
        bodies.append("{\n" + ",\n".join(fields) + "\n}")
    # no records -> no output at all (the reference writer emits the
    # [ ] wrapper lazily, around the first record)
    return pre + ("[\n" + ",\n".join(bodies) + "\n]\n" if bodies else "")


def w_jsonl(records, flatsep=".", auto_unflatten=True, json_typed=False,
            json_quote_all=False, **_):
    lines = []
    for rec in records:
        nested = _maybe_unflatten(rec, flatsep, auto_unflatten)
        if not nested:
            lines.append("{}")  # zero-key record prints {} (sparsify)
            continue
        parts = []
        for k, v in nested.items():
            if json_quote_all and not isinstance(v, (dict, list)):
                import json as _json

                s = _fmt(v)
                enc = _json.dumps("" if s is None else s,
                                  ensure_ascii=False)
            else:
                enc = (MI.json_encode(v) if isinstance(v, (dict, list))
                       else _json_scalar(v, json_typed))
            parts.append(f"{_json_key(k)}: {enc}")
        lines.append("{" + ", ".join(parts) + "}")
    return "".join(ln + "\n" for ln in lines)


def w_xtab(records, ofs=None, comments=None, ops=None, xvright=False, **_):
    # OFS is xtab's LINE terminator (default "\n"); two consecutive OFS
    # stand in for the record separator (record_writer_xtab.go:31,82,101)
    # OPS is the key padding character(s), written "always at least
    # once" to the per-record key width (record_writer_xtab.go:92)
    ofs = "\n" if not ofs else ofs
    ops = ops or " "
    cm = _cmap(comments)
    out: list[str] = []
    first = True
    for i, rec in enumerate(records):
        # pass-comments land after the previous block, BEFORE the next
        # record's separator (the writer prepends OFS per record)
        for c in cm.get(i, ()):
            out.append(c + "\n")
        cells = _cells(rec)
        if not first:
            out.append(ofs)
        first = False
        if not cells:
            continue
        width = max((len(k) for k, _ in cells), default=1)
        if xvright:
            # --xvright: values right-aligned to the record's max
            # value width (record_writer_xtab.go writeWithRightAligned)
            vw = max((len(v) for _, v in cells), default=1)
            out.append("".join(
                f"{k.ljust(width)} {v.rjust(vw)}{ofs}" for k, v in cells
            ))
            continue
        # single-char OPS pads to the record's key width; multi-char
        # OPS writes exactly once (record_writer_xtab.go:91-98)
        out.append("".join(
            (f"{k}{ops * (width - len(k) + 1)}{v}{ofs}" if len(ops) == 1
             else f"{k}{ops}{v}{ofs}")
            for k, v in cells
        ))
    for idx in sorted(k for k in cm if k >= len(records)):
        out.extend(c + "\n" for c in cm[idx])
    return "".join(out)


def _is_numeric(v) -> bool:
    if isinstance(v, bool):
        return False
    if isinstance(v, (int, float)):
        return True
    from mlrsketch.mlrcli import _infer

    iv = _infer(v)
    return isinstance(iv, (int, float)) and not isinstance(iv, bool)


def w_pprint(records, ofs=None, headerless=False, barred=False,
             right_numeric=False, right_all=False, **_):
    """record_writer_pprint.go: per-schema-block column alignment. Cell
    widths are max over the block's values AND the key (key width always
    participates — the reference merges key widths unconditionally).
    Non-barred rewrites "" to "-"; barred leaves it empty. With
    --right-align-numeric, each numeric CELL right-aligns, and a HEADER
    right-aligns only when every value in its column is numeric
    (issue #380); --right right-aligns everything."""
    out = []
    first = True
    for keys, block in _schema_blocks(records):
        if not first:
            out.append("\n")
        first = False
        raw = [[v for _, v in cells] for cells in block]
        cell_right = [
            [right_all or (right_numeric and _is_numeric(v)) for v in row]
            for row in raw
        ]
        hdr_right = [
            right_all
            or (right_numeric and all(cr[i] for cr in cell_right))
            for i in range(len(keys))
        ]
        disp = raw if barred else [
            [v if v != "" else "-" for v in row] for row in raw
        ]
        widths = [
            max([1, len(keys[i])] + [len(r[i]) for r in disp])
            for i in range(len(keys))
        ]

        def cell(s, i, right):
            return s.rjust(widths[i]) if right else s.ljust(widths[i])

        sep = ofs or " "
        if barred:
            bar = "+-" + "-+-".join("-" * w for w in widths) + "-+\n"
            if not headerless:
                out.append(bar)
                out.append(
                    "| " + " | ".join(
                        cell(k, i, hdr_right[i]) for i, k in enumerate(keys)
                    ) + " |\n"
                )
            out.append(bar)
            for r, row in enumerate(disp):
                out.append(
                    "| " + " | ".join(
                        cell(v, i, cell_right[r][i]) for i, v in enumerate(row)
                    ) + " |\n"
                )
            out.append(bar)
            continue
        if not headerless:
            hcells = []
            for i, k in enumerate(keys):
                last = i == len(keys) - 1
                if hdr_right[i]:
                    hcells.append(cell(k, i, True))
                else:
                    hcells.append(k if last else cell(k, i, False))
            out.append(sep.join(hcells) + "\n")
        for r, row in enumerate(disp):
            dcells = []
            for i, v in enumerate(row):
                last = i == len(row) - 1
                if cell_right[r][i]:
                    dcells.append(cell(v, i, True))
                else:
                    dcells.append(v if last else cell(v, i, False))
            out.append(sep.join(dcells) + "\n")
    return "".join(out)


def w_markdown(records, right_numeric=False, right_all=False,
               md_aligned=False, **_):
    if md_aligned:
        # --omd-aligned: pad each column to its block-wide width;
        # numeric columns (all non-empty cells numeric) right-align and
        # mark the separator ---: right-aligned too
        out = []
        for keys, block in _schema_blocks(records):
            ncols = len(keys)
            widths = [
                max(len(keys[i]), max(len(c[i][1]) for c in block), 3)
                for i in range(ncols)
            ]
            rightish = [
                (right_all or all(
                    _is_numeric(c[i][1]) for c in block if c[i][1] != ""
                )) and any(c[i][1] != "" for c in block)
                for i in range(ncols)
            ]

            def cell(s, i):
                return s.rjust(widths[i]) if rightish[i] else s.ljust(widths[i])

            out.append("| " + " | ".join(
                cell(k, i) for i, k in enumerate(keys)) + " |\n")
            out.append("| " + " | ".join(
                cell("---:" if rightish[i] else "---", i)
                for i in range(ncols)) + " |\n")
            for cells in block:
                out.append("| " + " | ".join(
                    cell(v.replace("|", "\\|"), i)
                    for i, (_k, v) in enumerate(cells)) + " |\n")
        return "".join(out)
    out = []
    last_keys = None
    for keys, block in _schema_blocks(records):
        if keys != last_keys:
            out.append("| " + " | ".join(k.replace("|", "\\|") for k in keys) + " |\n")
            # --right-align-numeric: the marker is chosen from the FIRST
            # record's cells (record_writer_markdown.go:84-89)
            seps = []
            for i in range(len(keys)):
                right = right_all or (
                    right_numeric and _is_numeric(block[0][i][1])
                )
                seps.append("---:" if right else "---")
            out.append("| " + " | ".join(seps) + " |\n")
            last_keys = keys
        for cells in block:
            out.append(
                "| " + " | ".join(v.replace("|", "\\|") for _, v in cells) + " |\n"
            )
    return "".join(out)


_YAML_PLAIN = __import__("re").compile(
    r"[A-Za-z_][A-Za-z0-9_ ./()<>=,+'-]*$"
)

# yaml.v3 quotes YAML-1.1 boolean-ish plain scalars to keep them strings
_YAML_BOOLISH = {
    "y", "Y", "yes", "Yes", "YES", "n", "N", "no", "No", "NO",
    "true", "True", "TRUE", "false", "False", "FALSE",
    "on", "On", "ON", "off", "Off", "OFF", "null", "Null", "NULL", "~",
}


def _yaml_quote(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _yaml_scalar(v, typed: bool = False) -> str:
    """One YAML scalar, emulating the reference's yaml.v3 marshal of
    Miller values (record_writer_yaml.go MlrmapToYAMLNative + Marshal):
    numbers print their ORIGINAL spelling bare (yaml output never
    applies MLR_OFMT), plain-safe strings bare, boolean-ish and special
    strings double-quoted; MT_NULL is null, VOID is ''""''. In `typed`
    mode (native pristine records) strings never re-scan as numbers —
    a string "1.0" quotes to stay a string."""
    if v is MI.NULL:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        pr = getattr(v, "printrep", None)
        if pr is not None:
            return pr
        if isinstance(v, float):
            return repr(float(v))
        return str(int(v))
    s = v if isinstance(v, str) else str(v)
    if s[:1] == "\x02":
        return s[1:]
    if s == "":
        return '""'
    from mlrsketch.mlrcli import _infer

    iv = _infer(s)
    if isinstance(iv, (int, float)) and not isinstance(iv, bool):
        # numeric spelling: bare with original spelling (carrier
        # strings) — or quoted in typed mode (it is a REAL string)
        return _yaml_quote(s) if typed else s
    if s in _YAML_BOOLISH or not _YAML_PLAIN.match(s):
        return _yaml_quote(s)
    return s


def _yaml_key(k) -> str:
    s = str(k)
    if s == "":
        return '""'
    if s in _YAML_BOOLISH or not _YAML_PLAIN.match(s):
        return _yaml_quote(s)
    return s


def _yaml_block(v, indent: int, lines: list, lead: str | None = None,
                typed: bool = False):
    """Emit one value as YAML block lines. `lead` is a prefix ('- ')
    consuming the first line's indent (sequence items)."""
    pad = " " * indent
    first = (lead if lead is not None else pad)
    if isinstance(v, dict):
        items = list(v.items())
        if not items:
            lines.append(first + "{}")
            return
        for i, (k, x) in enumerate(items):
            p = first if i == 0 else pad
            if isinstance(x, (dict, list)) and x:
                lines.append(f"{p}{_yaml_key(k)}:")
                _yaml_block(x, indent + 2, lines, typed=typed)
            else:
                lines.append(f"{p}{_yaml_key(k)}: {_yaml_scalar(x, typed)}")
        return
    if isinstance(v, list):
        if not v:
            lines.append(first + "[]")
            return
        for x in v:
            if isinstance(x, (dict, list)) and x:
                _yaml_block(x, indent + 2, lines, lead=pad + "- ",
                            typed=typed)
            else:
                lines.append(f"{pad}- {_yaml_scalar(x, typed)}")
        return
    lines.append(first + _yaml_scalar(v, typed))


def w_yaml(records, flatsep=".", auto_unflatten=True, yarray=True,
           json_typed=False, **_):
    """YAML writer (record_writer_yaml.go): default wraps the stream in
    one top-level sequence; --no-yarray emits one document per record
    with `---` separators between documents."""
    recs = [_maybe_unflatten(r, flatsep, auto_unflatten) for r in records]
    lines: list[str] = []
    if yarray:
        if not recs:
            return "[]\n"
        for r in recs:
            _yaml_block(r, 2, lines, lead="- ", typed=json_typed)
        return "\n".join(lines) + "\n"
    chunks = []
    for r in recs:
        doc: list[str] = []
        _yaml_block(r, 0, doc, typed=json_typed)
        chunks.append("\n".join(doc) + "\n")
    return "---\n".join(chunks)


def w_recutils(records, **_):
    """recutils writer: Key: value lines, multi-line values continue
    with '+ ' prefixes, blank line between records
    (record_reader/writer pair in the reference)."""
    blocks = []
    for rec in records:
        lines = []
        for k, v in rec.items():
            s = _fmt(v)
            if s is None:
                continue
            parts = s.split("\n")
            lines.append(f"{k}: {parts[0]}")
            lines.extend(f"+ {p}" for p in parts[1:])
        blocks.append("\n".join(lines) + "\n")
    return "\n".join(blocks) + ("\n" if blocks else "")


def w_dcf(records, flatsep=".", auto_unflatten=True, **_):
    """Debian-control writer: Key: value lines; array-valued fields
    (Depends etc.) join with ', '. DCF values are STRING-typed in the
    reference (record_reader_dcf.go FromString) — no OFMT re-scan."""
    blocks = []
    for rec in records:
        nested = _maybe_unflatten(rec, flatsep, auto_unflatten)
        lines = []
        for k, v in nested.items():
            if v is None:
                continue
            if isinstance(v, list):
                s = ", ".join(str(x) for x in v)
            elif v is MI.NULL:
                s = ""
            else:
                # numeric values format through OFMT like other text
                # writers; dcf-READ values are strings and skip the
                # re-scan via the str_only render flag
                s = _fmt(v)
                if s is None:
                    continue
            parts = s.split("\n")
            lines.append(f"{k}: {parts[0]}")
            lines.extend(f" {p}" for p in parts[1:])
        blocks.append("\n".join(lines) + "\n")
    return "\n".join(blocks) + ("\n" if blocks else "")


_WRITERS = {
    "dkvp": w_dkvp,
    "nidx": w_nidx,
    "csv": w_csv,
    "tsv": w_tsv,
    "json": w_json,
    "jsonl": w_jsonl,
    "xtab": w_xtab,
    "pprint": w_pprint,
    "markdown": w_markdown,
    "yaml": w_yaml,
    "recutils": w_recutils,
    "dcf": w_dcf,
}


def render(records: Iterable[dict], ofmt: str, *, ofs: str | None = None,
           flatsep: str = ".", headerless: bool = False,
           quoted_dkvp: bool = False, lite: bool = False,
           auto_unflatten: bool = True, float_ofmt: str | None = None,
           barred: bool = False, right_numeric: bool = False,
           right_all: bool = False, no_jvstack: bool = False,
           str_only: bool = False, gap_n: int | None = None,
           gap_keys: list | None = None, json_typed: bool = False,
           no_unflatten: bool = False, no_yarray: bool = False,
           comments: list | None = None, ops: str | None = None,
           json_quote_all: bool = False, quote_all: bool = False,
           ors2: bool = False, xvright: bool = False,
           md_aligned: bool = False) -> str:
    """Render a record stream as `ofmt` text (see module docstring).
    `float_ofmt` is MLR_OFMT / --ofmt: a Go-style %-format applied to
    float-typed values (not to byte-preserved input strings)."""
    w = _WRITERS.get(ofmt)
    if w is None:
        raise ValueError(f"unsupported output format: {ofmt}")
    if no_unflatten:
        # set by an explicit last-verb flatten: the final unflatten is
        # suppressed (cli/flatten_unflatten.go DecideFinalUnflatten)
        auto_unflatten = False
    if (gap_n or gap_keys) and ofmt in ("pprint", "dkvp", "nidx", "xtab", "markdown"):
        # `mlr gap`: blank line every n records / on group-key change;
        # pprint flushes its batch (header repeats) — gap.go:157,178.
        recs = list(records)
        segs: list[list[dict]] = [[]]
        prev_key = object()
        for i, r in enumerate(recs):
            if gap_keys is not None:
                key = tuple(r.get(k) for k in gap_keys)
                if segs[-1] and key != prev_key:
                    segs.append([])
                prev_key = key
            elif gap_n and i > 0 and i % gap_n == 0:
                segs.append([])
            segs[-1].append(r)
        return "\n".join(
            render(
                seg, ofmt, ofs=ofs, flatsep=flatsep, headerless=headerless,
                quoted_dkvp=quoted_dkvp, lite=lite,
                auto_unflatten=auto_unflatten, float_ofmt=float_ofmt,
                barred=barred, right_numeric=right_numeric,
                right_all=right_all, no_jvstack=no_jvstack,
                str_only=str_only, json_typed=json_typed,
            )
            for seg in segs
        )
    prev = MI.current_ofmt()
    MI.set_ofmt(float_ofmt)
    global _NO_SCAN_OFMT
    prev_scan = _NO_SCAN_OFMT
    _NO_SCAN_OFMT = str_only
    try:
        return w(
            list(records), ofs=ofs, flatsep=flatsep, headerless=headerless,
            quoted=quoted_dkvp, lite=lite, auto_unflatten=auto_unflatten,
            barred=barred, right_numeric=right_numeric, right_all=right_all,
            no_jvstack=no_jvstack, json_typed=json_typed,
            yarray=not no_yarray, comments=comments, ops=ops,
            json_quote_all=json_quote_all, quote_all=quote_all,
            ors2=ors2, xvright=xvright, md_aligned=md_aligned,
        )
    finally:
        MI.set_ofmt(prev)
        _NO_SCAN_OFMT = prev_scan
