#!/usr/bin/env python
"""Gate-coverage audit: per-gate row counts, so vacuous gates are visible.

Round-2 lesson (VERDICT "What's wrong" #1): a gate whose Spark plan and
DuckDB oracle both return the EMPTY SET "passes" the driver's
rows+schema+hash comparison while verifying nothing. Two defenses now exist:

1. `tests/test_gate_parity.py` asserts a non-empty (or expected-rowcount)
   result for every gate entry, so an accidentally-vacuous oracle fails CI;
2. this script renders the per-gate `spark_rows` from the newest
   `CORRECTNESS_r*.json` driver artifact as a markdown table for
   BASELINE.md "Measured", flagging any 0-row entry at a glance.

Run: python scripts/gate_rows_audit.py [CORRECTNESS_rNN.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))[-1]
    )
    data = json.load(open(path))
    n_zero = 0
    print(f"Per-gate row counts from `{os.path.basename(path)}` "
          f"({len(data)} entries):\n")
    print("| gate | spark_rows | rows/schema/hash | note |")
    print("|---|---|---|---|")
    for name, r in data.items():
        ok = all((r.get("rows_match"), r.get("schema_match"), r.get("hash_match")))
        rows = r.get("spark_rows")
        note = ""
        if r.get("err"):
            note = f"err: {r['err']}"
        elif rows == 0:
            note = "**VACUOUS — passes on 0 rows**"
            n_zero += 1
        print(f"| {name} | {rows} | {'pass' if ok else 'FAIL'} | {note} |")
    print(f"\n{n_zero} vacuous entr{'y' if n_zero == 1 else 'ies'}; "
          "tests/test_gate_parity.py asserts non-empty results per gate.")


if __name__ == "__main__":
    main()
