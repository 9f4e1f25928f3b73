"""`python -m mlrsketch` — an mlr-compatible command-line front end.

Runs the same interpreter that replays the reference's golden corpus
(mlrsketch.mlrcli: format flags, `then` chains, ~60 verbs, the full
put/filter DSL) and renders the result through the reference-exact
writers (mlrsketch.writers). Examples:

    python -m mlrsketch --icsv --opprint stats1 -a mean,sum -f x -g a in.csv
    python -m mlrsketch --ijson --ojson put '$z = $x + $y' in.json
    cat in.dkvp | python -m mlrsketch sort -nr x

Spark runs locally (local[N] via MLRSKETCH_CPUS, default all cores);
the same verb implementations scale out unchanged on a cluster via
spark-submit --py-files (scripts/submit_job.py).
"""

from __future__ import annotations

import os
import sys
import tempfile


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0

    from mlrsketch.mlrcli import Unsupported, execute
    from mlrsketch.session import get_spark
    from mlrsketch.writers import render

    # mlr reads stdin when no file operands are given; the interpreter
    # resolves existing paths, so materialize stdin to a temp file.
    stdin_tmp = None
    has_file_operand = any(
        not a.startswith("-") and os.path.isfile(a) for a in argv
    )
    # -n means "no input" only in GLOBAL flag position (before the first
    # verb) — `uniq -a -n` is the verb's own flag, not mlr -n
    from mlrsketch.mlrcli import VERBS

    verb_at = next((i for i, a in enumerate(argv) if a in VERBS), len(argv))
    no_input = "-n" in argv[:verb_at]
    if not has_file_operand and not no_input and not sys.stdin.isatty():
        data = sys.stdin.buffer.read()
        stdin_tmp = tempfile.NamedTemporaryFile(
            prefix="mlrsketch_stdin_", suffix=".dat", delete=False
        )
        stdin_tmp.write(data)
        stdin_tmp.close()
        argv.append(stdin_tmp.name)

    # -I (global position): in-place processing — run the chain on each
    # file operand separately and rewrite that file with the output
    in_place = "-I" in argv[:verb_at]
    if in_place:
        argv = [a for i, a in enumerate(argv) if not (a == "-I" and i < verb_at)]

    spark = get_spark(cores=os.environ.get("MLRSKETCH_CPUS"), app="mlrsketch-cli")
    spark.sparkContext.setLogLevel("ERROR")

    def _render(res) -> str:
        return render(
            (res.render_records if res.render_records is not None
             else res.records) or [],
            res.ofmt,
            ofs=res.ofs,
            flatsep=res.flatsep,
            headerless=res.headerless_out,
            quoted_dkvp=res.quoted_dkvp,
            lite=res.olite,
            auto_unflatten=not res.no_auto_unflatten,
            float_ofmt=res.float_ofmt,
            **res.render_opts,
        )

    try:
        if in_place:
            files = []
            while argv and os.path.isfile(argv[-1]):
                files.append(argv.pop())
            files.reverse()
            if not files:
                print("mlrsketch: -I needs file operands", file=sys.stderr)
                return 1
            for fpath in files:
                res = execute(spark, ["mlr"] + argv + [fpath], env=dict(os.environ))
                body = res.text if res.text is not None else _render(res)
                with open(fpath, "w") as fh:
                    fh.write(body)
            return 0
        res = execute(spark, ["mlr"] + argv, env=dict(os.environ))
        if res.text is not None:
            sys.stdout.write(res.text)
            return 0
        for kind, payload in res.stderr:
            if kind == "txt":
                sys.stderr.write(payload)
        sys.stdout.write(_render(res))
        return 0
    except Unsupported as e:
        print(f"mlrsketch: unsupported: {e}", file=sys.stderr)
        return 2
    finally:
        if stdin_tmp is not None:
            os.unlink(stdin_tmp.name)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
