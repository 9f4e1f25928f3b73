"""Auto-replay of the reference's golden corpus through the mini
mlr-CLI interpreter (mlrsketch/mlrcli.py).

Every verb-*/NNNN case whose command line the interpreter fully parses
is executed against our verbs and compared to the checked-in expout at
print precision. Unsupported verbs/flags are skipped and counted; a
pass-count floor guards against silent interpreter regressions that
would skip everything."""

from __future__ import annotations

import glob
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

from mlrsketch.mlrcli import Unsupported, run_case  # noqa: E402
from test_golden_reference import assert_matches, to_df  # noqa: E402

REF = "/root/reference/test/cases"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

MIN_PASS = 913

# Round-3 status: EMPTY. Every formerly-divergent case is now
# implemented faithfully — the step het event model (ingest-gated
# outputs, nil-push prev-cache resets, drain drop rule: exact.step),
# block-aligned xtab/pprint expout parsers for space-containing keys,
# key-anchored xtab reassembly for multiline values, the fill-empty -S
# forced-string sentinel, and format-values JSON re-inference.
KNOWN_DIVERGENCES: set[str] = set()


def test_auto_replay_reference_golden_corpus(spark):
    cases = sorted(
        p for p in glob.glob(f"{REF}/verb-*/*/") if os.path.exists(p + "cmd")
    )
    assert cases, "no cases found"
    passed, skipped, failures = 0, 0, []

    def one(c):
        if any(k in c for k in KNOWN_DIVERGENCES):
            return "skip", None
        try:
            got, exp, ordered = run_case(spark, c.rstrip("/"), to_df)
        except Unsupported:
            return "skip", None
        except Exception as e:  # noqa: BLE001 — interpreter bug, count it
            return "fail", f"RUNTIME {type(e).__name__}: {e}"
        try:
            assert_matches(got, exp, ordered=ordered)
            return "pass", None
        except AssertionError as e:
            return "fail", str(e)[:300]

    # Spark actions are thread-safe; 8-way case concurrency cuts the
    # ~700-job wall time ~4x
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(8) as pool:
        for c, (status, msg) in zip(cases, pool.map(one, cases)):
            if status == "pass":
                passed += 1
            elif status == "skip":
                skipped += 1
            else:
                failures.append((c, msg))

    assert not failures, (
        f"{len(failures)} golden mismatches (passed {passed}):\n"
        + "\n".join(f"{c}: {m}" for c, m in failures[:10])
    )
    assert passed >= MIN_PASS, f"only {passed} cases ran (floor {MIN_PASS})"
