"""Mini mlr-CLI interpreter over mlrsketch: auto-replays reference
golden cases (test/cases/verb-*/NNNN: cmd + expout) whose command line
is fully parseable into our verb calls. Anything with an unsupported
verb/flag raises Unsupported and the case is skipped (and counted) —
so every case that RUNS is a hard assertion of parity.

Supported surface: format flags (--opprint/--oxtab/--ocsv/--csv/
--csvlite/--c2p/--icsv/--from/-n), multi-file implicit union, `then`
chains, and ~30 verbs mapped onto mlrsketch.verbs.exact.
"""

from __future__ import annotations

import os
import shlex

from pyspark.sql import functions as F

from mlrsketch.verbs import exact as ev

REF = "/root/reference/test"


class Unsupported(Exception):
    pass


# ---------------------------------------------------------------------------
# input / output parsing (same formats as test_golden_reference)
# ---------------------------------------------------------------------------


def _read_records(path: str, icsv, jsonin: bool = False) -> list[dict]:
    full = path if os.path.isfile(path) else os.path.join("/root/reference", path)
    with open(full, "rb") as f:
        raw = f.read()
    try:
        text = raw.decode("utf-8")
    except UnicodeDecodeError:
        text = raw.decode("latin-1")
    if jsonin:
        import json as _json

        try:
            data = _json.loads(text)
        except ValueError:
            # Miller also accepts concatenated objects: {..}\n{..}
            dec = _json.JSONDecoder()
            data, idx = [], 0
            s = text.strip()
            try:
                while idx < len(s):
                    obj, end = dec.raw_decode(s, idx)
                    data.append(obj)
                    idx = end
                    while idx < len(s) and s[idx] in " \t\r\n,":
                        idx += 1
            except ValueError as e:
                raise Unsupported(f"json input parse: {e}")
        if not isinstance(data, list):
            data = [data]
        for r in data:
            if not isinstance(r, dict) or any(
                isinstance(v, (dict, list)) for v in r.values()
            ):
                raise Unsupported("nested json input")
        return [{k: str(v) if v is not None else None for k, v in r.items()} for r in data]
    if icsv == "pprint":
        recs = []
        for chunk in text.split("\n\n"):
            clines = [ln for ln in chunk.splitlines() if ln.strip()]
            if not clines:
                continue
            header = clines[0].split()
            recs.extend(dict(zip(header, ln.split())) for ln in clines[1:])
        return recs
    if icsv == "xtab":
        recs, cur = [], {}
        for ln in text.splitlines():
            if not ln.strip():
                if cur:
                    recs.append(cur)
                    cur = {}
                continue
            k, _, v = ln.partition(" ")
            cur[k] = v.strip()
        if cur:
            recs.append(cur)
        return recs
    lines = [ln for ln in text.splitlines() if ln.strip() != ""]
    if icsv:
        header = lines[0].split(",")
        return [dict(zip(header, ln.split(","))) for ln in lines[1:]]
    recs = []
    for ln in lines:
        rec = {}
        for idx, pair in enumerate(ln.split(",")):
            if "=" in pair:
                k, _, v = pair.partition("=")
            else:
                # DKVP pair without '=': positional key 1..n (Miller
                # record_reader_dkvp semantics)
                k, v = str(idx + 1), pair
            rec[k] = v
        recs.append(rec)
    return recs


def parse_out(text: str, fmt: str) -> list[dict]:
    if fmt == "json":
        import json as _json

        data = _json.loads(text) if text.strip() else []
        if not isinstance(data, list):
            data = [data]
        for r in data:
            if not isinstance(r, dict) or any(
                isinstance(v, (dict, list)) for v in r.values()
            ):
                raise Unsupported("nested json output")
        return data
    lines = [ln for ln in text.splitlines() if ln.strip() != ""]
    if not lines:
        return []
    if fmt == "pprint":
        # heterogeneous output prints MULTIPLE tables separated by blank
        # lines, each with its own header
        recs = []
        for chunk in text.split("\n\n"):
            clines = [ln for ln in chunk.splitlines() if ln.strip()]
            if not clines:
                continue
            header = clines[0].split()
            recs.extend(dict(zip(header, ln.split())) for ln in clines[1:])
        return recs
    if fmt == "csv":
        # csvlite emits a fresh header block after a blank line when the
        # record schema changes (het output)
        recs = []
        for chunk in text.split("\n\n"):
            clines = [ln for ln in chunk.splitlines() if ln.strip()]
            if not clines:
                continue
            header = clines[0].split(",")
            recs.extend(dict(zip(header, ln.split(","))) for ln in clines[1:])
        return recs
    if fmt == "xtab":
        recs, cur = [], {}
        for ln in text.splitlines():
            if not ln.strip():
                if cur:
                    recs.append(cur)
                    cur = {}
                continue
            k, _, v = ln.partition(" ")
            cur[k] = v.strip()
        if cur:
            recs.append(cur)
        return recs
    # dkvp
    recs = []
    for ln in lines:
        rec = {}
        for pair in ln.split(","):
            k, _, v = pair.partition("=")
            rec[k] = v
        recs.append(rec)
    return recs


# ---------------------------------------------------------------------------
# verb executors: (df, argv) -> df  (argv = this verb's args only)
# ---------------------------------------------------------------------------


def _flags(argv: list[str], known: dict[str, int]):
    """Parse argv into {flag: value(s)} + positionals; raise on unknown -flags."""
    out: dict[str, object] = {}
    pos: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in known:
            nvals = known[a]
            if nvals == 0:
                out[a] = True
                i += 1
            else:
                out[a] = argv[i + 1]
                i += 2
        elif a.startswith("-"):
            raise Unsupported(f"flag {a}")
        else:
            pos.append(a)
            i += 1
    return out, pos


def _csl(s: str) -> list[str]:
    return s.split(",")


def v_cat(df, argv):
    fl, pos = _flags(argv, {"-n": 0, "-N": 1, "-g": 1})
    if pos or "-N" in fl:
        raise Unsupported("cat positional/-N")
    if not fl.get("-n"):
        return df
    if "-g" not in fl:
        return ev.cat_numbered(df, order_by=["__ord"])
    # Miller: records missing ANY group key share ONE counter bucket
    # (golden verb-cat/0007)
    by = _csl(fl["-g"])
    if any(b not in df.columns for b in by):
        key = F.lit("__missing__")
    else:
        present = None
        for b in by:
            c = F.col(b).isNotNull()
            present = c if present is None else (present & c)
        key = F.when(present, F.concat_ws("\x1f", *[F.col(b) for b in by])).otherwise(
            F.lit("__missing__")
        )
    return ev.cat_numbered(df.withColumn("__grp", key), by=["__grp"], order_by=["__ord"]).drop("__grp")


def _drop_missing_keys(df, by):
    for b in by:
        if b not in df.columns:
            return df.limit(0)
        df = df.filter(F.col(b).isNotNull())
    return df


def v_head(df, argv):
    fl, _ = _flags(argv, {"-n": 1, "-g": 1})
    n = int(fl.get("-n", 10))
    if n < 0:
        raise Unsupported("negative -n")
    by = _csl(fl["-g"]) if "-g" in fl else []
    return ev.head(_drop_missing_keys(df, by), n, by=by, order_by=["__ord"])


def v_tail(df, argv):
    fl, _ = _flags(argv, {"-n": 1, "-g": 1})
    raw = str(fl.get("-n", 10))
    by = _csl(fl["-g"]) if "-g" in fl else []
    d = _drop_missing_keys(df, by)
    if raw.startswith("+"):
        # tail -n +K: emit from the Kth record onward (per group)
        k = int(raw[1:])
        from pyspark.sql import Window as W
        w = (W.partitionBy(*by) if by else W.partitionBy()).orderBy("__ord")
        return (
            d.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") >= k)
            .drop("__rn")
        )
    n = int(raw)
    if n < 0:
        raise Unsupported("negative -n")
    return ev.tail(d, n, by=by, order_by=["__ord"])


def v_cut(df, argv):
    fl, _ = _flags(argv, {"-f": 1, "-x": 0, "-o": 0})
    fields = [f for f in _csl(fl["-f"]) if f in df.columns or fl.get("-x")]
    if fl.get("-x"):
        return ev.cut(df.drop("__ord"), _csl(fl["-f"]), complement=True)
    keep = [f for f in df.columns if f in _csl(fl["-f"])] if not fl.get("-o") else [
        f for f in _csl(fl["-f"]) if f in df.columns
    ]
    return df.select(*keep) if keep else df.select(*fields)


def v_sort(df, argv):
    specs = []
    i = 0
    while i < len(argv):
        a = argv[i]
        how = {"-f": "f", "-r": "r", "-nf": "nf", "-nr": "nr", "-c": "c", "-cr": "cr",
               "-t": "t", "-tr": "tr"}.get(a)
        if how is None:
            raise Unsupported(f"sort flag {a}")
        for f_ in _csl(argv[i + 1]):
            if f_ not in df.columns:
                raise Unsupported("sort on absent field")
            specs.append((f_, how))
        i += 2
    return ev.sort(df.drop("__ord"), specs)


def v_uniq(df, argv):
    fl, _ = _flags(argv, {"-g": 1, "-f": 1, "-c": 0, "-n": 0, "-a": 0, "-o": 1})
    by = _csl(fl.get("-g") or fl.get("-f") or "")
    if fl.get("-a"):
        raise Unsupported("uniq -a")
    if not by or by == [""]:
        raise Unsupported("uniq without -g/-f")
    d = df
    for b in by:
        if b not in d.columns:
            raise Unsupported("uniq on absent field")
        d = d.filter(F.col(b).isNotNull())
    if fl.get("-n"):
        return ev.uniq_distinct_count(d, by)
    out = ev.uniq(d, by, show_counts=bool(fl.get("-c")))
    if fl.get("-c") and "-o" in fl:
        out = out.withColumnRenamed("count", fl["-o"])
    return out


def v_count(df, argv):
    fl, _ = _flags(argv, {"-g": 1, "-o": 1})
    out = ev.count_records(df, by=_csl(fl["-g"]) if "-g" in fl else ())
    if "-o" in fl:
        out = out.withColumnRenamed("count", fl["-o"])
    return out


def v_count_distinct(df, argv):
    fl, _ = _flags(argv, {"-f": 1, "-u": 0, "-n": 0})
    fields = _csl(fl["-f"])
    if any(f_ not in df.columns for f_ in fields):
        raise Unsupported("count-distinct absent field")
    if fl.get("-n"):
        return ev.count_distinct_n(df, fields)
    return ev.count_distinct(df, fields, unlashed=bool(fl.get("-u")))


_STATS1_OK = {
    "mean", "sum", "count", "min", "max", "var", "stddev", "meaneb", "skewness",
    "kurtosis", "median", "mode", "antimode", "mad", "null_count", "distinct_count",
    "minlen", "maxlen", "first", "last", "iqr", "lof", "lif", "uif", "uof",
}


def v_stats1(df, argv):
    fl, _ = _flags(argv, {"-a": 1, "-f": 1, "-g": 1, "-i": 0})
    accs, values = _csl(fl["-a"]), _csl(fl["-f"])
    by = _csl(fl["-g"]) if "-g" in fl else []
    df = _drop_missing_keys(df, by)
    if any(v not in df.columns for v in values):
        raise Unsupported("stats1 absent value field")
    for a in accs:
        if a not in _STATS1_OK and not (a.startswith("p") and a[1:].replace(".", "").isdigit()):
            raise Unsupported(f"stats1 acc {a}")
    plain = [a for a in accs if a not in ("mode", "antimode", "mad")]
    out = (
        ev.stats1(df, plain, values, by=by, interpolated=bool(fl.get("-i")))
        if plain
        else None
    )
    extras = {}
    for a in accs:
        if a in ("mode", "antimode"):
            for f_ in values:
                m = ev.mode_impl(df, f_, by=by, anti=(a == "antimode"))
                extras[f"{f_}_{a}"] = m
        elif a == "mad":
            for f_ in values:
                extras[f"{f_}_mad"] = ev.mad(df, f_, by=by)
    for name, mdf in extras.items():
        out = mdf if out is None else (out.join(mdf, by) if by else out.crossJoin(mdf))
    # restore Miller's column order f x acc
    cols = by + [f"{f_}_{a}" for f_ in values for a in accs]
    return out.select(*[c for c in cols if c in out.columns])


def v_fraction(df, argv):
    fl, _ = _flags(argv, {"-f": 1, "-g": 1, "-p": 0, "-c": 0})
    by = _csl(fl["-g"]) if "-g" in fl else []
    d, passthrough = df, None
    if by:
        if any(b not in d.columns for b in by):
            raise Unsupported("fraction group key absent from schema")
        cond = None
        for b in by:
            c = F.col(b).isNotNull()
            cond = c if cond is None else (cond & c)
        passthrough = d.filter(~cond)
        d = d.filter(cond)
    for f_ in _csl(fl["-f"]):
        d = ev.fraction(d, f_, by=by, percent=bool(fl.get("-p")),
                        cumulative=bool(fl.get("-c")), order_by=["__ord"])
    if passthrough is not None:
        d = d.unionByName(passthrough, allowMissingColumns=True)
    return d


def v_top(df, argv):
    fl, _ = _flags(argv, {"-f": 1, "-n": 1, "-g": 1, "--min": 0, "-a": 0})
    if fl.get("-a"):
        raise Unsupported("top -a")
    n = int(fl.get("-n", 1))
    by = _csl(fl["-g"]) if "-g" in fl else []
    fields = _csl(fl["-f"])
    d = df
    for f_ in fields:  # lashed: all fields present
        if f_ not in d.columns:
            raise Unsupported("top absent field")
        d = d.filter(F.col(f_).isNotNull())
    for b in by:
        d = d.filter(F.col(b).isNotNull())
    out = None
    for f_ in fields:
        t = ev.top(d, f_, n=n, by=by, use_min=bool(fl.get("--min")), pad=bool(by))
        out = t if out is None else out.join(t, [*by, "top_idx"])
    return out


def v_most_frequent(df, argv, descending=True):
    fl, _ = _flags(argv, {"-f": 1, "-b": 1})
    fields = _csl(fl["-f"])
    if any(f_ not in df.columns for f_ in fields):
        raise Unsupported("most-frequent absent field")
    return ev.most_frequent(df, fields, n=int(fl.get("-b", 10)), descending=descending)


def v_decimate(df, argv):
    fl, _ = _flags(argv, {"-n": 1, "-b": 0, "-e": 0, "-g": 1})
    return ev.decimate(
        df, int(fl.get("-n", 10)), order_by=["__ord"],
        by=_csl(fl["-g"]) if "-g" in fl else (), keep_first=bool(fl.get("-b")),
    )


def v_fill_down(df, argv):
    fl, _ = _flags(argv, {"-f": 1, "-a": 0, "--all": 0, "--only-if-blank": 0})
    if fl.get("--only-if-blank"):
        raise Unsupported("fill-down --only-if-blank")
    fields = df.columns if fl.get("--all") else _csl(fl["-f"])
    fields = [f_ for f_ in fields if f_ != "__ord" and f_ in df.columns]
    if not fl.get("-a"):
        # default fills absent OR void (golden verb-fill-down/0001);
        # -a restricts to absent-only (0002)
        df = df.withColumns(
            {f_: F.when(F.col(f_).cast("string") == "", None).otherwise(F.col(f_)) for f_ in fields}
        )
    return ev.fill_down(df, fields, order_by=["__ord"])


def v_fill_empty(df, argv):
    fl, _ = _flags(argv, {"-v": 1, "-S": 0, "--only-if-all-blank": 0})
    if fl.get("--only-if-all-blank"):
        raise Unsupported(" --only-if-all-blank")
    return ev.fill_empty(df, fill=str(fl.get("-v", "N/A")))


def v_grep(df, argv):
    fl, pos = _flags(argv, {"-v": 0, "-i": 0, "-a": 0, "-o": 0})
    if len(pos) != 1 or fl.get("-a") or fl.get("-o"):
        raise Unsupported("grep form")
    pat = pos[0]
    cols = [c for c in df.columns if c != "__ord"]
    ser = F.concat_ws(",", *[F.concat(F.lit(f"{c}="), F.col(c).cast("string")) for c in cols])
    cond = ser.rlike(f"(?i){pat}" if fl.get("-i") else pat)
    return df.filter(~cond if fl.get("-v") else cond)


def v_rename(df, argv):
    fl, pos = _flags(argv, {"-r": 0, "-g": 0})
    if fl:
        raise Unsupported("rename -r/-g")
    parts = _csl(pos[0])
    mapping = {parts[i]: parts[i + 1] for i in range(0, len(parts), 2) if parts[i] in df.columns}
    return ev.rename_fields(df, mapping)


def v_label(df, argv):
    _, pos = _flags(argv, {})
    names = _csl(pos[0])
    d = df.drop("__ord")
    return ev.label(d, names[: len(d.columns)])


def v_reorder(df, argv):
    fl, _ = _flags(argv, {"-f": 1, "-e": 0})
    fields = [f_ for f_ in _csl(fl["-f"]) if f_ in df.columns]
    if not fields:
        return df  # nothing to move: pure pass-through
    return ev.reorder(df, back=fields) if fl.get("-e") else ev.reorder(df, front=fields)


def v_template(df, argv):
    fl, _ = _flags(argv, {"-f": 1, "--fill-with": 1, "-t": 1})
    if "-t" in fl:
        hdr = _read_records(fl["-t"], icsv=True)
        fields = list(hdr[0].keys()) if hdr else []
        if not fields:
            full = os.path.join("/root/reference", fl["-t"])
            with open(full) as fh:
                fields = fh.readline().strip().split(",")
    else:
        fields = _csl(fl["-f"])
    return ev.template(df, fields, fill=fl.get("--fill-with"))


def v_regularize(df, argv):
    return df  # fixed schema: no-op


def v_sec2gmt(df, argv):
    fl, pos = _flags(argv, {"-1": 0, "-2": 0, "-3": 0, "-6": 0, "-9": 0, "--millis": 0})
    dec = next((int(k[1:]) for k in ("-1", "-2", "-3", "-6", "-9") if fl.get(k)), 0)
    if fl.get("--millis"):
        raise Unsupported("sec2gmt --millis")
    return ev.sec2gmt(df, [f_ for f_ in _csl(pos[0]) if f_ in df.columns], decimals=dec)


def v_sec2gmtdate(df, argv):
    _, pos = _flags(argv, {})
    return ev.sec2gmtdate(df, [f_ for f_ in _csl(pos[0]) if f_ in df.columns])


def v_repeat(df, argv):
    fl, _ = _flags(argv, {"-n": 1, "-f": 1})
    d = df.drop("__ord")
    if "-f" in fl:
        fld = fl["-f"]
        if fld not in d.columns:
            raise Unsupported("repeat absent field")
        return ev.repeat(d.withColumn(fld, F.col(fld).try_cast("int")).filter(F.col(fld).isNotNull()).withColumn(fld, F.col(fld).cast("string")), fld)
    return ev.repeat(d, int(fl["-n"]))


def v_count_similar(df, argv):
    fl, _ = _flags(argv, {"-g": 1, "-o": 1})
    out = ev.count_similar(df, _csl(fl["-g"]))
    if "-o" in fl:
        out = out.withColumnRenamed("count", fl["-o"])
    return out


def v_nothing(df, argv):
    return ev.nothing(df)


def v_tac(df, argv):
    return ev.tac(df, order_by=["__ord"])


def v_gsub(df, argv, first_only=False, literal=False):
    fl, pos = _flags(argv, {"-f": 1, "-a": 0})
    if len(pos) != 2:
        raise Unsupported("sub form")
    pat, rep = pos
    if not literal:
        # Miller replacements use \1..\9; Java regexp_replace uses $1.
        # Escape literal dollars first, then translate backrefs.
        rep = rep.replace("$", "\\$")
        rep = _re.sub(r"\\(\d)", r"$\1", rep)
        if "\\" in rep.replace("\\$", ""):
            raise Unsupported("sub escape")
    fields = df.columns if fl.get("-a") else _csl(fl["-f"])
    d = df
    for f_ in fields:
        if f_ == "__ord" or f_ not in d.columns:
            continue
        if dict(d.dtypes).get(f_) != "string":
            continue
        if literal:
            d = ev.ssub_field(d, f_, pat, rep)
        else:
            d = ev.sub_field(d, f_, pat, rep, all_matches=not first_only)
    return d


def v_case(df, argv):
    fl, _ = _flags(argv, {"-u": 0, "-l": 0, "-t": 0, "-k": 0, "-v": 0, "-f": 1})
    mode = "upper" if fl.get("-u") else "lower" if fl.get("-l") else "title" if fl.get("-t") else None
    if mode is None:
        raise Unsupported("case mode")
    which = "keys" if fl.get("-k") else "values" if fl.get("-v") else "both"
    fields = _csl(fl["-f"]) if "-f" in fl else [c for c in df.columns if c != "__ord"]
    return ev.case_fields(df, fields, mode, which=which)


def v_having_fields(df, argv):
    fl, _ = _flags(argv, {"--at-least": 1, "--all-defined": 1})
    fields = _csl(fl.get("--at-least") or fl.get("--all-defined") or "")
    if not fields or any(f_ not in df.columns for f_ in fields):
        # requesting a field no record has => empty result
        return df.limit(0)
    return ev.having_fields_all_defined(df, fields)


def v_seqgen(spark, argv):
    fl, _ = _flags(argv, {"--start": 1, "--stop": 1, "--step": 1, "-f": 1})
    step = int(fl.get("--step", 1))
    start, stop = int(fl["--start"]), int(fl["--stop"])
    if step > 0 and stop < start or step < 0 and stop > start or step == 0:
        raise Unsupported("seqgen degenerate")
    return ev.seqgen(spark, start, stop, step, field=fl.get("-f", "i"))


def v_join(spark, right, argv, to_df, ifmt):
    """`mlr join -f LEFT -j out [-l lk] [-r rk] [--np|--ul|--ur] [-s|-u]`
    (join.go:24-31 emit-flag matrix). The join field is renamed to the
    -j output name on EVERY emitted record, paired or not (golden
    verb-join/0009); records missing the key never pair and flow to the
    unpaired side."""
    fl, pos = _flags(argv, {
        "-f": 1, "-j": 1, "-l": 1, "-r": 1, "-s": 0, "-u": 0,
        "--np": 0, "--ul": 0, "--ur": 0, "-i": 1, "--lp": 1, "--rp": 1,
    })
    if pos:
        raise Unsupported("join positional")
    lp, rp = fl.get("--lp", "left_"), fl.get("--rp", "right_")
    use_prefixes = "--lp" in fl or "--rp" in fl
    lfmt = fl.get("-i", "dkvp" if ifmt == "dkvp" else "csv")
    if lfmt not in ("dkvp", "csv", "csvlite"):
        raise Unsupported(f"join -i {lfmt}")
    j = _csl(fl["-j"]) if "-j" in fl else None
    lk = _csl(fl["-l"]) if "-l" in fl else j
    rk = _csl(fl["-r"]) if "-r" in fl else j
    if j is None:
        j = lk or rk
    if not (j and lk and rk) or len({len(j), len(lk), len(rk)}) != 1:
        raise Unsupported("join key spec")

    lrecs = _read_records(fl["-f"], icsv=(lfmt != "dkvp"))
    left = to_df(spark, lrecs, infer=(lfmt == "dkvp")) if lrecs else None

    emit_paired = not fl.get("--np")
    emit_ul, emit_ur = bool(fl.get("--ul")), bool(fl.get("--ur"))

    def prep(df, keys):
        """Rename key cols to the output names; return (all, nonnull)."""
        if df is None or any(k not in df.columns for k in keys):
            return None, None
        allr = df.withColumnsRenamed(dict(zip(keys, j))).drop("__ord")
        nn = allr
        for k in j:
            nn = nn.filter(F.col(k).isNotNull())
        return allr, nn

    l_all, l_nn = prep(left, lk)
    r_all, r_nn = prep(right, rk)

    parts = []
    if emit_paired and l_nn is not None and r_nn is not None:
        lcols = [c for c in l_nn.columns if c not in j]
        rcols = [c for c in r_nn.columns if c not in j]
        collide = set(lcols) & set(rcols)
        if collide and not use_prefixes:
            raise Unsupported("join non-key column collision")
        if collide:
            l_nn = l_nn.withColumnsRenamed({c: lp + c for c in collide})
            r_nn = r_nn.withColumnsRenamed({c: rp + c for c in collide})
        parts.append(l_nn.join(r_nn, on=j, how="inner"))
    if emit_ul:
        if l_all is None and left is not None:
            parts.append(left.drop("__ord"))  # key absent from schema: all unpaired
        elif l_all is not None:
            if r_nn is not None:
                parts.append(
                    l_all.join(r_nn.select(*j).distinct(), on=j, how="left_anti")
                )
            else:
                parts.append(l_all)
    if emit_ur:
        if r_all is None and right is not None:
            parts.append(right.drop("__ord"))
        elif r_all is not None:
            if l_nn is not None:
                parts.append(
                    r_all.join(l_nn.select(*j).distinct(), on=j, how="left_anti")
                )
            else:
                parts.append(r_all)

    parts = [p for p in parts if p is not None]
    if not parts:
        raise Unsupported("join emits nothing computable")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


_STEPPERS_OK = {"shift", "shift_lag", "shift_lead", "delta", "ratio", "rsum",
                "rprod", "counter", "from-first"}


def v_step(df, argv):
    fl, _ = _flags(argv, {"-a": 1, "-f": 1, "-g": 1, "-d": 1})
    steppers = [s for s in _csl(fl["-a"]) if s != "ewma"]
    has_ewma = "ewma" in _csl(fl["-a"])
    for s in steppers:
        base = s.rsplit("_", 1)
        if s not in _STEPPERS_OK and not (
            len(base) == 2 and base[1].isdigit() and base[0] in
            ("shift_lag", "shift_lead", "delta", "ratio")
        ):
            raise Unsupported(f"stepper {s}")
    alphas = [float(a) for a in _csl(fl["-d"])] if "-d" in fl else []
    if has_ewma and not alphas:
        raise Unsupported("ewma without -d")
    by = _csl(fl["-g"]) if "-g" in fl else []
    values = _csl(fl["-f"])
    if any(v not in df.columns for v in values):
        raise Unsupported("step absent field")
    dtypes = dict(df.dtypes)
    numeric_needed = [s for s in steppers if s not in ("shift", "shift_lag", "shift_lead", "counter")] or has_ewma
    if numeric_needed and any(dtypes[v] == "string" for v in values):
        raise Unsupported("step arithmetic on string field")
    passthrough = None
    if by:
        if any(b not in df.columns for b in by):
            raise Unsupported("step group key absent")
        cond = None
        for b in by:
            c = F.col(b).isNotNull()
            cond = c if cond is None else (cond & c)
        passthrough = df.filter(~cond)
        df = df.filter(cond)
    out = ev.step(df, steppers, values, order_by=["__ord"], by=by,
                  ewma_alphas=alphas if has_ewma else [])
    if passthrough is not None:
        out = out.unionByName(passthrough, allowMissingColumns=True)
    # Miller names ewma columns {f}_ewma_{alpha-literal}
    for f_ in values:
        for a in alphas if has_ewma else []:
            ours = f"{f_}_ewma_" + ("%g" % a).replace(".", "_")
            out = out.withColumnRenamed(ours, f"{f_}_ewma_" + "%g" % a)
    return out


_STATS2_NAME = {
    "corr": [("corr", "{x}_{y}_corr")],
    "cov": [("cov", "{x}_{y}_cov")],
    "r2": [("r2", "{x}_{y}_r2")],
}


def v_stats2(df, argv):
    fl, _ = _flags(argv, {"-a": 1, "-f": 1, "-g": 1, "-v": 0})
    accs = _csl(fl["-a"])
    fields = _csl(fl["-f"])
    by = _csl(fl["-g"]) if "-g" in fl else []
    if len(fields) % 2 or fl.get("-v"):
        raise Unsupported("stats2 field pairing/-v")
    for a in accs:
        if a not in ("corr", "cov", "r2", "linreg-ols", "linreg-pca"):
            raise Unsupported(f"stats2 acc {a}")
    df = _drop_missing_keys(df, by)
    out = None
    for i2 in range(0, len(fields), 2):
        x, y = fields[i2], fields[i2 + 1]
        if x not in df.columns or y not in df.columns:
            raise Unsupported("stats2 absent field")
        # no row filter: Spark's corr/covar ignore null pairs, and a
        # group whose pairs are all-null still emits a (void) record
        s = ev.stats2(df, x, y, accs, by=by)
        ren = {}
        if "linreg-ols" in accs:
            ren[f"{x}_{y}_m"] = f"{x}_{y}_ols_m"
            ren[f"{x}_{y}_b"] = f"{x}_{y}_ols_b"
        s = s.withColumnsRenamed(ren)
        if "linreg-ols" in accs:
            pair = F.sum(
                F.when(F.col(x).isNotNull() & F.col(y).isNotNull(), 1).otherwise(0)
            ).alias(f"{x}_{y}_ols_n")
            n = df.groupBy(*by).agg(pair) if by else df.agg(pair)
            s = s.join(n, by) if by else s.crossJoin(n)
        out = s if out is None else (out.join(s, by) if by else out.crossJoin(s))
    return out


def v_merge_fields(df, argv):
    fl, _ = _flags(argv, {"-a": 1, "-f": 1, "-o": 1, "-k": 0})
    accs = _csl(fl["-a"])
    ok = {"min", "max", "sum", "mean", "count", "var", "stddev", "median",
          "iqr", "lof", "lif", "uif", "uof"}
    for a in accs:
        if a not in ok and not (a.startswith("p") and a[1:].replace(".", "").isdigit()):
            raise Unsupported(f"merge-fields acc {a}")
    fields = [f_ for f_ in _csl(fl["-f"]) if f_ in df.columns]
    if not fields:
        raise Unsupported("merge-fields no fields")
    out = ev.merge_fields(df, accs, fields, fl.get("-o", "out"))
    if not fl.get("-k"):
        out = out.drop(*fields)
    return out


def v_unsparsify(df, argv):
    fl, _ = _flags(argv, {"--fill-with": 1})
    fill = fl.get("--fill-with")
    if fill is None:
        return df  # union schema already holds all keys; absent==void in compare
    cols = [c for c in df.columns if c != "__ord"]
    return df.withColumns(
        {c: F.coalesce(F.col(c).cast("string"), F.lit(fill)) for c in cols}
    )


def v_histogram(df, argv):
    fl, _ = _flags(argv, {"-f": 1, "--lo": 1, "--hi": 1, "--nbins": 1, "-o": 1, "--auto": 0})
    fields = _csl(fl["-f"])
    nbins = int(fl["--nbins"])
    prefix = fl.get("-o", "")
    out = None
    if fl.get("--auto"):
        # Miller --auto sizes bins from the joint min/max over ALL
        # requested fields (one shared bin table in the output)
        aggs = []
        for f_ in fields:
            if f_ not in df.columns:
                raise Unsupported("histogram absent field")
            aggs += [F.min(F.col(f_).cast("double")), F.max(F.col(f_).cast("double"))]
        row = df.agg(*aggs).first()
        lo = min(v for v in row[0::2] if v is not None)
        hi = max(v for v in row[1::2] if v is not None)
    for f_ in fields:
        if f_ not in df.columns:
            raise Unsupported("histogram absent field")
        if fl.get("--auto"):
            h = ev.histogram(df, f_, lo, hi, nbins, include_hi=True)
        else:
            h = ev.histogram(df, f_, float(fl["--lo"]), float(fl["--hi"]), nbins)
        h = h.select(
            F.round("bin_lo", 9).alias("bin_lo"), F.round("bin_hi", 9).alias("bin_hi"),
            F.col("count").alias(f"{prefix}{f_}_count"),
        )
        out = h if out is None else out.join(h, ["bin_lo", "bin_hi"])
    if prefix:
        out = out.withColumnsRenamed({"bin_lo": f"{prefix}bin_lo", "bin_hi": f"{prefix}bin_hi"})
    return out


import re as _re

from mlrsketch import dsl as _dsl
from mlrsketch.dsl.parser import DslSyntaxError, DslUnsupported


def _dsl_program(argv, case_dir=None):
    """Extract the program text: inline positional or `-f file`."""
    fl, pos = _flags(argv, {"-q": 0, "-S": 0, "-x": 0, "-f": 1, "-s": 1, "-e": 1})
    if fl.get("-q"):
        raise Unsupported("put -q (emit-only output)")
    if "-s" in fl:
        raise Unsupported("put -s presets")
    if "-f" in fl:
        path = fl["-f"]
        full = path if os.path.isfile(path) else os.path.join("/root/reference", path)
        if not os.path.isfile(full):
            raise Unsupported("put -f file missing")
        with open(full) as fh:
            prog = fh.read()
        if "-e" in fl:
            prog += ";" + fl["-e"]
    elif "-e" in fl:
        prog = fl["-e"]
    elif len(pos) == 1:
        prog = pos[0]
    else:
        raise Unsupported("put program form")
    return prog, bool(fl.get("-x")), bool(fl.get("-S"))


def _run_dsl(df, argv, mode):
    prog, negate, s_flag = _dsl_program(argv)
    if s_flag:
        raise Unsupported("put -S string-only inference")
    hidden = tuple(c for c in df.columns if c.startswith("__"))
    try:
        out = _dsl.apply_program(
            df,
            prog,
            mode=mode,
            nr_col="__ord",
            fnr_col="__fnr" if "__fnr" in df.columns else None,
            filename_col="__fname" if "__fname" in df.columns else None,
            filenum_col="__fnum" if "__fnum" in df.columns else None,
            exclude=hidden,
        )
        if mode == "filter" and negate:
            # -x: recompute with inverted condition by set-difference on
            # the row ordinal (simplest correct form)
            kept = out.select("__ord")
            out = df.join(kept, "__ord", "left_anti")
        return out
    except (DslUnsupported, DslSyntaxError) as e:
        raise Unsupported(f"dsl: {e}")


def v_put(df, argv):
    """`mlr put` via the real expression-to-Column compiler
    (mlrsketch/dsl): the whole program becomes one Catalyst projection."""
    if "-x" in argv:
        raise Unsupported("put -x")
    return _run_dsl(df, argv, "put")


def v_filter(df, argv):
    return _run_dsl(df, argv, "filter")


def v_passthrough(df, argv):
    if argv:
        raise Unsupported("passthrough verb with args")
    return df


def v_skip_trivial(df, argv):
    _flags(argv, {})
    cols = [c for c in df.columns if c != "__ord"]
    cond = F.lit(False)
    for c in cols:
        cond = cond | (F.col(c).isNotNull() & (F.col(c).cast("string") != ""))
    return df.filter(cond)


def v_sparsify(df, argv):
    _flags(argv, {})
    return df  # empty values are dropped by the record compare anyway


def _regexes(parts):
    """Miller -r field patterns: bare, "quoted", /slashed/, with optional
    trailing i for case-insensitivity."""
    import re

    out = []
    for raw in parts:
        flags = 0
        if raw.endswith("i") and len(raw) > 2 and raw[0] in "\"/" and raw[-2] == raw[0]:
            raw, flags = raw[1:-2], re.IGNORECASE
        elif len(raw) > 1 and raw[0] in "\"/" and raw[-1] == raw[0]:
            raw = raw[1:-1]
        out.append(re.compile(raw, flags))
    return out


def v_cut_regex(df, argv):
    fl, _ = _flags(argv, {"-f": 1, "-r": 0, "-x": 0, "-o": 0})
    if not fl.get("-r"):
        return v_cut(df, argv)
    pats = _regexes(_csl(fl["-f"]))
    cols = [c for c in df.columns if c != "__ord"]
    hit = [c for c in cols if any(p.search(c) for p in pats)]
    keep = [c for c in cols if (c in hit) != bool(fl.get("-x"))]
    return df.select(*keep) if keep else df.limit(0).select(*cols)


def v_rename_regex(df, argv):
    fl, pos = _flags(argv, {"-r": 0, "-g": 0})
    if not fl.get("-r"):
        return v_rename(df, argv)
    parts = _csl(pos[0])
    mapping = {}
    for i2 in range(0, len(parts), 2):
        pat = _regexes([parts[i2]])[0]
        rep = parts[i2 + 1].replace("\\1", "\\g<1>").replace("\\2", "\\g<2>")
        for c in df.columns:
            if c == "__ord" or c in mapping:
                continue
            if pat.search(c):
                count = 0 if fl.get("-g") else 1
                new = pat.sub(rep, c, count=count)
                if new != c:
                    mapping[c] = new
    # record-wise rename: several sources mapping to one target merge
    # exactly when at most ONE source is present per record (coalesce);
    # with >=2 co-present sources Miller's outcome depends on each
    # record's own key order, which the fixed schema can't represent
    targets: dict[str, list[str]] = {}
    for c in df.columns:
        if c in mapping:
            targets.setdefault(mapping[c], []).append(c)
    for t, srcs in targets.items():
        if len(srcs) > 1:
            present = None
            for s in srcs:
                p = F.col(s).isNotNull().cast("int")
                present = p if present is None else (present + p)
            if df.filter(present >= 2).limit(1).count() > 0:
                raise Unsupported("rename collision with co-present sources")
    sel = []
    emitted = set()
    for c in df.columns:
        if c == "__ord":
            sel.append(F.col("__ord"))
        elif c in mapping:
            t = mapping[c]
            if t in emitted:
                continue
            srcs = targets[t]
            col = F.coalesce(*[F.col(s) for s in reversed(srcs)]) if len(srcs) > 1 else F.col(c)
            sel.append(col.alias(t))
            emitted.add(t)
        elif c in targets:
            continue  # pre-existing field replaced by a rename
        else:
            sel.append(F.col(c))
    return df.select(*sel)


def v_having_fields_full(df, argv):
    fl, _ = _flags(argv, {"--at-least": 1, "--all-defined": 1, "--which-are": 1,
                          "--at-most": 1, "--any-defined": 1})
    cols = [c for c in df.columns if c != "__ord"]
    if fl.get("--which-are"):
        want = set(_csl(fl["--which-are"]))
        cond = F.lit(True)
        for c in cols:
            has = F.col(c).isNotNull()
            cond = cond & (has if c in want else ~has)
        missing = want - set(cols)
        return df.limit(0) if missing else df.filter(cond)
    if fl.get("--any-defined"):
        fields = [f_ for f_ in _csl(fl["--any-defined"]) if f_ in cols]
        if not fields:
            return df.limit(0)
        cond = F.lit(False)
        for f_ in fields:
            cond = cond | F.col(f_).isNotNull()
        return df.filter(cond)
    if fl.get("--at-most"):
        allowed = set(_csl(fl["--at-most"]))
        cond = F.lit(True)
        for c in cols:
            if c not in allowed:
                cond = cond & F.col(c).isNull()
        return df.filter(cond)
    return v_having_fields(df, argv)


_NEST_SEPS = {"pipe": "|", "semicolon": ";", "comma": ",", ";": ";", "|": "|", ",": ","}


def v_nest(df, argv):
    fl, _ = _flags(argv, {
        "--explode": 0, "--implode": 0, "--values": 0, "--pairs": 0,
        "--across-records": 0, "--across-fields": 0, "-f": 1,
        "--nested-fs": 1, "--nested-ps": 1, "--evar": 1, "--ivar": 1,
    })
    if fl.get("--pairs") or fl.get("--across-fields"):
        raise Unsupported("nest pairs/across-fields")
    if "--evar" in fl or "--ivar" in fl:
        sep = _NEST_SEPS.get(fl.get("--evar") or fl.get("--ivar"))
        explode = "--evar" in fl
    else:
        sep = _NEST_SEPS.get(fl.get("--nested-fs", ";"))
        explode = bool(fl.get("--explode"))
        if not explode and not fl.get("--implode"):
            raise Unsupported("nest mode")
    field = fl["-f"]
    if sep is None or field not in df.columns:
        raise Unsupported("nest sep/field")
    if explode:
        return ev.nest_explode_values(df, field, sep=("\\|" if sep == "|" else sep))
    others = [c for c in df.columns if c not in (field, "__ord")]
    grouped = df.groupBy(*others).agg(
        F.min("__ord").alias("__ord"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__ord").alias("o"), F.col(field).cast("string").alias("v"))
                    )
                ),
                lambda s: s.v,
            ),
            sep,
        ).alias(field),
    )
    return grouped


def v_reshape(df, argv):
    fl, _ = _flags(argv, {"-i": 1, "-o": 1, "-r": 1, "-s": 1})
    if "-s" in fl:
        key, val = _csl(fl["-s"])
        if key not in df.columns or val not in df.columns:
            raise Unsupported("reshape -s absent fields")
        ids = [c for c in df.columns if c not in (key, val, "__ord")]
        return ev.reshape_long_to_wide(df.drop("__ord"), key, val, ids)
    if "-r" in fl:
        pats = _regexes(_csl(fl["-r"]))
        measures = [c for c in df.columns if c != "__ord" and any(p.search(c) for p in pats)]
    else:
        measures = [m for m in _csl(fl["-i"]) if m in df.columns]
    if not measures or "-o" not in fl:
        raise Unsupported("reshape fields")
    key_name, val_name = _csl(fl["-o"])
    any_measure = None
    for m in measures:
        c = F.col(m).isNotNull()
        any_measure = c if any_measure is None else (any_measure | c)
    melted = ev.reshape_wide_to_long(
        df.filter(any_measure).drop("__ord"), measures, key_name, val_name
    ).filter(F.col(val_name).isNotNull())
    passthrough = df.filter(~any_measure).drop("__ord").drop(*measures)
    return melted.unionByName(passthrough, allowMissingColumns=True)


VERBS = {
    "cat": v_cat, "head": v_head, "tail": v_tail, "cut": v_cut_regex, "sort": v_sort,
    "uniq": v_uniq, "count": v_count, "count-distinct": v_count_distinct,
    "stats1": v_stats1, "fraction": v_fraction, "top": v_top,
    "most-frequent": lambda df, a: v_most_frequent(df, a, True),
    "least-frequent": lambda df, a: v_most_frequent(df, a, False),
    "decimate": v_decimate, "fill-down": v_fill_down, "fill-empty": v_fill_empty,
    "grep": v_grep, "rename": v_rename_regex, "label": v_label, "reorder": v_reorder,
    "template": v_template, "regularize": v_regularize, "sec2gmt": v_sec2gmt,
    "sec2gmtdate": v_sec2gmtdate, "repeat": v_repeat,
    "count-similar": v_count_similar, "nothing": v_nothing, "tac": v_tac,
    "gsub": lambda df, a: v_gsub(df, a, first_only=False),
    "sub": lambda df, a: v_gsub(df, a, first_only=True),
    "ssub": lambda df, a: v_gsub(df, a, literal=True),
    "case": v_case, "having-fields": v_having_fields_full,
    "step": v_step, "stats2": v_stats2, "merge-fields": v_merge_fields,
    "unsparsify": v_unsparsify, "histogram": v_histogram,
    "sort-within-records": v_passthrough, "gap": v_passthrough,
    "skip-trivial-records": v_skip_trivial,
    "latin1-to-utf8": v_passthrough, "put": v_put, "filter": v_filter,
    "reshape": v_reshape,
    # utf8-to-latin1 emits Miller's (error) value for unencodable text —
    # error-as-value (MT_ERROR) isn't modeled here

    "regularize": v_regularize, "sparsify": v_sparsify, "nest": v_nest,
}

_FMT_FLAGS = {
    # (input_format_or_None, output_format_or_None) — output-only flags
    # must NOT touch the input side
    "--opprint": (None, "pprint"), "--oxtab": (None, "xtab"),
    "--ocsv": (None, "csv"), "--icsv": ("csv", None), "--csv": ("csv", "csv"),
    "--csvlite": ("csv", "csv"), "--c2p": ("csv", "pprint"), "--pprint": ("pprint", "pprint"),
    "--dkvp": ("dkvp", "dkvp"), "--idkvp": ("dkvp", None), "--odkvp": (None, "dkvp"),
    "--icsvlite": ("csv", None), "--ocsvlite": (None, "csv"),
    "--ojson": (None, "json"), "--ijson": ("json", None), "--json": ("json", "json"),
    "--ojsonl": (None, "jsonl"), "--c2j": ("csv", "json"),
    "--ixtab": ("xtab", None), "--xtab": ("xtab", "xtab"),
}


def run_case(spark, case_dir: str, to_df):
    """Execute one golden case; returns (got_records, exp_records).
    Raises Unsupported for anything outside the interpreter's surface."""
    run_case.__globals__["_TO_DF"] = to_df
    with open(os.path.join(case_dir, "cmd")) as f:
        cmd = f.read().strip()
    if os.path.exists(os.path.join(case_dir, "env")) or "should-fail" in os.listdir(case_dir):
        raise Unsupported("env/should-fail")
    experr = os.path.join(case_dir, "experr")
    expout_path = os.path.join(case_dir, "expout")
    if (
        os.path.exists(experr)
        and os.path.getsize(experr) > 0
        and (not os.path.exists(expout_path) or os.path.getsize(expout_path) == 0)
    ):
        # the reference expects this command to FAIL (stderr only)
        raise Unsupported("expected-error case")
    cmd = cmd.replace("${CASEDIR}", case_dir).replace("./" + case_dir, case_dir)
    argv = shlex.split(cmd)
    if argv[0] != "mlr":
        raise Unsupported("not mlr")
    argv = argv[1:]

    ifmt, ofmt = "dkvp", "dkvp"
    files: list[str] = []
    i = 0
    no_input = False
    while i < len(argv):
        a = argv[i]
        if a in _FMT_FLAGS:
            fi, fo = _FMT_FLAGS[a]
            ifmt, ofmt = fi or ifmt, fo or ofmt
            i += 1
        elif a == "--from":
            files.append(argv[i + 1])
            i += 2
        elif a == "-n":
            no_input = True
            i += 1
        elif a == "--ofmt":
            i += 2  # numeric print format — tolerant compare absorbs it
        elif a.startswith("--"):
            raise Unsupported(f"global flag {a}")
        else:
            break
        continue

    if ofmt == "jsonl":
        raise Unsupported("jsonl output")
    rest = argv[i:]

    # split on `then`
    chains: list[list[str]] = [[]]
    for a in rest:
        if a == "then":
            chains.append([])
        else:
            chains[-1].append(a)

    # trailing positional file paths on the LAST verb — but not a path
    # that is the VALUE of a value-taking flag (e.g. `join -f left.dkvp`)
    _VALUE_FLAGS = {
        "-f", "-j", "-l", "-r", "-i", "-o", "-v", "-n", "-g", "-a", "-d", "-b",
        "--lo", "--hi", "--nbins", "--start", "--stop", "--step", "--fill-with", "-t", "-s",
        "--lp", "--rp", "--at-least", "--all-defined",
    }
    last = chains[-1]
    popped: list[str] = []
    while (
        last
        and not last[-1].startswith("-")
        and (
            os.path.isfile(os.path.join("/root/reference", last[-1]))
            or os.path.isfile(last[-1])
        )
        and not (len(last) >= 2 and last[-2] in _VALUE_FLAGS)
    ):
        popped.append(last.pop())
    # --from files first (cmd order), then trailing positionals (popping
    # walked right-to-left, so reverse to restore cmd order)
    files = files + list(reversed(popped))

    if not files and not no_input and chains[0][0] != "seqgen":
        raise Unsupported("no input file resolved")

    has_dsl = any(chain and chain[0] in ("put", "filter") for chain in chains)
    dsl_text = cmd
    for chain in chains:
        if chain and chain[0] in ("put", "filter") and "-f" in chain:
            fpath = chain[chain.index("-f") + 1]
            full = fpath if os.path.isfile(fpath) else os.path.join("/root/reference", fpath)
            if os.path.isfile(full):
                with open(full) as fh:
                    dsl_text += fh.read()
    needs_filectx = has_dsl and any(
        tok in dsl_text for tok in ("FNR", "FILENAME", "FILENUM")
    )
    spark_df = None
    if files:
        recs: list[dict] = []
        for fidx, f_ in enumerate(files):
            rs = _read_records(
                f_,
                icsv=(ifmt if ifmt in ("xtab", "pprint") else ifmt == "csv"),
                jsonin=(ifmt == "json"),
            )
            if needs_filectx:
                for j, r in enumerate(rs):
                    r["__fnr"] = str(j)
                    r["__fnum"] = str(fidx + 1)
                    r["__fname"] = f_
            recs.extend(rs)
        if not recs:
            raise Unsupported("empty input")
        # DSL programs distinguish absent from void: keep "" values
        spark_df = to_df(
            spark, recs, infer=(ifmt not in ("csv",)), keep_void=has_dsl
        )

    for chain in chains:
        if not chain:
            raise Unsupported("empty verb")
        verb, vargv = chain[0], chain[1:]
        if verb == "seqgen":
            spark_df = v_seqgen(spark, vargv).withColumn("__ord", F.monotonically_increasing_id())
            continue
        if verb == "join":
            spark_df = v_join(spark, spark_df, vargv, to_df, ifmt)
            spark_df = spark_df.withColumn("__ord", F.monotonically_increasing_id())
            continue
        if verb not in VERBS:
            raise Unsupported(f"verb {verb}")
        if spark_df is None:
            raise Unsupported("verb without input")
        spark_df = VERBS[verb](spark_df, vargv)

    # lowercase booleans for the text compare (DSL programs can leave
    # boolean-typed columns; Miller prints true/false)
    for c, t in spark_df.dtypes:
        if t == "boolean":
            spark_df = spark_df.withColumn(
                c, F.when(F.col(c), "true").when(~F.col(c), "false")
            )
    got = [
        {k: v for k, v in r.asDict().items() if not k.startswith("__")}
        for r in spark_df.collect()
    ]
    # Tabular writers skip records with NO KEYS at all. Under the fixed
    # schema an all-null row is keyless only if the last verb can remove
    # keys from a record (cut); verbs like template keep the keys with
    # void values (pprint renders dashes) and the record survives.
    if ofmt != "json" and chains[-1] and chains[-1][0] == "cut":
        got = [r for r in got if any(v is not None and v != "" for v in r.values())]
    with open(os.path.join(case_dir, "expout"), "rb") as f:
        raw = f.read()
    try:
        exp_text = raw.decode("utf-8")
    except UnicodeDecodeError:
        exp_text = raw.decode("latin-1")
    exp = parse_out(exp_text, ofmt)
    return got, exp
