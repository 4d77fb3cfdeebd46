#!/usr/bin/env python3
"""Print the driver-green VINTAGE ledger: for every registry query,
the most recent round with a green CORRECTNESS_r*.json row — the input
to the rotation's freshness rule (plans/registry.py::_HEAD: spare
slots go first to new queries, then to the OLDEST-green names).

    python3 tools/vintage.py            # full ledger, oldest first
    python3 tools/vintage.py 2          # only names with vintage <= 2
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def vintages() -> dict[str, int]:
    from qin_cdc_spark.plans.registry import all_oracles  # noqa: F401 (import check)

    latest: dict[str, int] = {}
    root = Path(__file__).resolve().parent.parent
    for f in sorted(glob.glob(str(root / "CORRECTNESS_r*.json"))):
        rnd = int(Path(f).stem.split("_r")[1])
        for name, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    cutoff = int(sys.argv[1]) if len(sys.argv) > 1 else 10**9
    from qin_cdc_spark.plans.registry import all_queries

    latest = vintages()
    rows = [
        (latest.get(n, 0), n)
        for n in all_queries()
        if latest.get(n, 0) <= cutoff
    ]
    for v, n in sorted(rows):
        print(f"r{v or '-'}\t{n}")
    print(f"-- {len(rows)} names (0/'-' = never driver-green)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
