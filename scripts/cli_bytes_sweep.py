"""Byte-exactness sweep for the CLI render path.

For every golden case in the given families, run the FULL CLI pipeline
(mlrcli.execute + writers.render, MLR_OFMT=%.8f like the reference's
regtest harness) and compare the rendered bytes against expout
verbatim. Only order-preserving chains can be byte-compared (emission
order is part of the bytes); others are counted as skipped.

Usage: python scripts/cli_bytes_sweep.py [family-glob ...]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from mlrsketch.mlrcli import Unsupported, execute  # noqa: E402
from mlrsketch.writers import render  # noqa: E402
from mlrsketch.session import get_spark  # noqa: E402

REF = "/root/reference/test/cases"


def try_case(spark, case_dir: str):
    """Returns ("pass"|"fail"|"skip", detail)."""
    if "should-fail" in os.listdir(case_dir):
        return "skip", "should-fail"
    with open(os.path.join(case_dir, "cmd")) as f:
        cmd = f.read().strip()
    cmd = cmd.replace("${CASEDIR}", case_dir).replace("./" + case_dir, case_dir)
    env = {"MLR_OFMT": "%.8f"}
    envf = os.path.join(case_dir, "env")
    if os.path.exists(envf):
        for line in open(envf):
            k, _, v = line.strip().partition("=")
            if k:
                env[k] = v
    experr = os.path.join(case_dir, "experr")
    if os.path.exists(experr) and os.path.getsize(experr) > 0:
        return "skip", "stderr case"
    try:
        res = execute(spark, cmd, env=env)
    except Unsupported as e:
        return "skip", f"unsupported: {e}"
    with open(os.path.join(case_dir, "expout"), "rb") as f:
        exp = f.read().decode("utf-8", "replace")
    if res.text is not None:
        got = res.text
    else:
        if not res.ordered:
            return "skip", "unordered chain"
        try:
            got = render(
                (res.render_records if res.render_records is not None
                 else res.records) or [],
                res.ofmt, ofs=res.ofs, flatsep=res.flatsep,
                headerless=res.headerless_out, quoted_dkvp=res.quoted_dkvp,
                lite=res.olite, auto_unflatten=not res.no_auto_unflatten,
                float_ofmt=res.float_ofmt,
                **res.render_opts,
            )
        except ValueError as e:
            return "skip", f"writer: {e}"
    if res.last_verb == "utf8-to-latin1":
        # the reference writes LATIN-1 bytes here (intentionally not
        # UTF-8); compare raw bytes instead of the lossy utf-8 decode
        with open(os.path.join(case_dir, "expout"), "rb") as f:
            raw = f.read()
        try:
            gb = got.encode("latin-1")
        except UnicodeEncodeError:
            return "fail", "latin-1 encode"
        if gb == raw:
            return "pass", None
        return "fail", f"{len(gb)}b vs {len(raw)}b (latin-1)"
    if got == exp:
        return "pass", None
    return "fail", f"{len(got)}b vs {len(exp)}b"


def main():
    pats = sys.argv[1:] or ["io-*", "verb-*", "dsl-*", "cli-*"]
    spark = get_spark(cores=8, shuffle_partitions=8, app="cli-bytes")
    spark.sparkContext.setLogLevel("ERROR")
    cases = sorted(
        d for pat in pats for d in glob.glob(f"{REF}/{pat}/*/")
        if os.path.exists(d + "cmd")
    )
    n_pass, fails = 0, []
    skips = Counter()
    for c in cases:
        c = c.rstrip("/")
        try:
            status, detail = try_case(spark, c)
        except Exception as e:  # noqa: BLE001
            status, detail = "fail", f"RUNTIME {type(e).__name__}: {e}"
        if status == "pass":
            n_pass += 1
        elif status == "fail":
            fails.append((c.replace(REF + "/", ""), detail))
        else:
            skips[detail.split(":")[0]] += 1
    print(f"\nbyte-exact pass={n_pass} fail={len(fails)} "
          f"skip={sum(skips.values())} total={len(cases)}")
    print("\n-- skip reasons --")
    for r, n in skips.most_common(12):
        print(f"  {n:5d}  {r}")
    fam = Counter(c.split("/")[0] for c, _ in fails)
    print("\n-- fail families --")
    for r, n in fam.most_common(30):
        print(f"  {n:5d}  {r}")
    print("\n-- first 60 fails --")
    for c, d in fails[:60]:
        print(f"  {c}: {d}")


if __name__ == "__main__":
    main()
