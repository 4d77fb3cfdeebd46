#!/usr/bin/env python3
"""Print the live repo counts the COVERAGE.md header quotes.

The header's numbers must be GENERATED, never hand-typed (they drifted
in round 6: "~560 tests" while the suite held 593).  Run this and paste
its one-line output into the header whenever the counts change:

    python3 tools/gen_counts.py
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from qin_cdc_spark.plans.registry import _HEAD, all_oracles, all_queries

    q, o = all_queries(), all_oracles()
    rows_only = [n for n in q if n not in o]
    collected = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True,
        text=True,
        cwd=Path(__file__).resolve().parent.parent,
    ).stdout.strip().splitlines()[-1]
    print(
        f"registry queries: {len(q)} | oracle-checked: {len(q) - len(rows_only)} "
        f"| rows-only: {len(rows_only)} {rows_only or ''}| driver prefix: {len(_HEAD)} "
        f"| pytest: {collected}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
