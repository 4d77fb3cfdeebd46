#!/usr/bin/env python3
"""Calibrated bench comparison — the drift-vs-regression verdict tool.

Raw BENCH numbers moved r4→r5→r6 by double-digit percentages with plan
checks green every round; round 6 shipped ``calibration_sec`` (a fixed
20M-row in-memory shuffle-agg, median of the same n_runs) precisely so
rounds could be compared as MULTIPLES OF THE HOST CONSTANT instead of
raw seconds.  This tool reads two bench result files and prints the
per-query calibrated ratios plus a verdict:

    python3 tools/compare_bench.py BENCH_r06.json BENCH_r07.json
    python3 tools/compare_bench.py BENCH_r06.json /tmp/bench_r7_local.out

Accepts either the driver's BENCH_r{N}.json wrapper (bench stdout in
its "tail" field) or a raw bench.py output line.  Queries present in
only one file are listed as appended/removed, never counted as
movement.  A calibrated ratio within [1/THRESH, THRESH] is "stable";
anything outside is an offender the round's PLANS.md must explain
(plan change? new work in the gate? genuinely slower operator?).
"""

from __future__ import annotations

import json
import re
import sys

THRESH = 1.15


def _from_fragment(t: str) -> dict:
    """The driver's BENCH_r{N}.json keeps only the TAIL of bench
    stdout, which can cut the JSON line mid-dict; recover the two
    fields a calibrated comparison needs by brace-matching."""
    out: dict = {}
    m = re.search(r'"calibration_sec":\s*([0-9.]+)', t)
    if m:
        out["calibration_sec"] = float(m.group(1))
    for field in ("calibrated", "queries"):
        i = t.find(f'"{field}":')
        if i < 0:
            continue
        j = t.index("{", i)
        depth = 0
        for k in range(j, len(t)):
            if t[k] == "{":
                depth += 1
            elif t[k] == "}":
                depth -= 1
                if depth == 0:
                    out[field] = json.loads(t[j : k + 1].replace("\\", ""))
                    break
    return out


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        # raw bench stdout (possibly with log noise): last JSON-looking line
        line = [l for l in text.splitlines() if l.startswith("{")][-1]
        return json.loads(line)
    if "tail" in obj and isinstance(obj["tail"], str):
        try:
            return json.loads(obj["tail"])
        except json.JSONDecodeError:
            return _from_fragment(obj["tail"])
    return obj


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    ca, cb = a.get("calibrated"), b.get("calibrated")
    if not ca or not cb:
        print(
            "one side has no `calibrated` dict (pre-round-6 file?) — "
            "only calibrated comparisons are meaningful across hosts"
        )
        return 2
    common = sorted(set(ca) & set(cb))
    appended = sorted(set(cb) - set(ca))
    removed = sorted(set(ca) - set(cb))
    ratios = {q: cb[q] / ca[q] for q in common if ca[q] > 0}
    med = sorted(ratios.values())[len(ratios) // 2]
    # sub-second queries move ×1.5 on pure scheduling jitter (PLANS.md
    # round-7 note) — a ratio verdict on them is noise by construction,
    # so they report in their own class and never page a reader as
    # regressions.  "Sub-second" is judged on RAW medians in either
    # file (the calibrated value divides by a host constant <~1).
    ra, rb = a.get("queries", {}), b.get("queries", {})
    sub = {q for q in common if ra.get(q, 9e9) < 1.0 or rb.get(q, 9e9) < 1.0}
    worse = {q: r for q, r in ratios.items() if r > THRESH and q not in sub}
    better = {q: r for q, r in ratios.items() if r < 1 / THRESH and q not in sub}
    jitter = {q: r for q, r in ratios.items()
              if q in sub and (r > THRESH or r < 1 / THRESH)}
    print(f"calibration_sec: {a.get('calibration_sec')} -> {b.get('calibration_sec')}")
    print(
        f"common set: {len(common)} queries | calibrated total "
        f"{sum(ca[q] for q in common):.1f} -> {sum(cb[q] for q in common):.1f} "
        f"(x{sum(cb[q] for q in common) / sum(ca[q] for q in common):.3f}) "
        f"| median per-query ratio x{med:.3f}"
    )
    if appended:
        print(f"appended (no prior — first number, not a regression): {appended}")
    if removed:
        print(f"removed: {removed}")
    for label, d in (("SLOWER", worse), ("faster", better)):
        for q, r in sorted(d.items(), key=lambda kv: -abs(kv[1] - 1)):
            print(f"  {label} x{r:.2f}  {q}: {ca[q]:.2f} -> {cb[q]:.2f} (calibrated)")
    for q, r in sorted(jitter.items(), key=lambda kv: -abs(kv[1] - 1)):
        print(
            f"  jitter-class (sub-second raw) x{r:.2f}  {q}: "
            f"{ca[q]:.2f} -> {cb[q]:.2f} — not a verdict input"
        )
    if not worse:
        print(f"verdict: no query moved beyond x{THRESH} calibrated — any raw-seconds")
        print("drift between these two files is host speed, not plan change.")
    else:
        print(f"verdict: {len(worse)} quer{'y' if len(worse)==1 else 'ies'} moved beyond "
              f"x{THRESH} calibrated — explain each in PLANS.md (plan change, added")
        print("gate work, or a real regression to fix).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
