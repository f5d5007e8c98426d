#!/usr/bin/env python
"""Compare a fresh BENCH_DETAIL.json against the committed record.

Usage:  python scripts/bench_compare.py [ref_git_rev] [--allow-drops]

Diffs the working-tree BENCH_DETAIL.json (written by `python bench.py`)
against the version committed at ``ref_git_rev`` (default HEAD) and
prints per-query deltas, flagging anything slower by more than the
noise threshold. Median-of-3 numbers on an idle host are stable to
roughly ±15%; a >50% jump on a single query is a real plan regression
until proven otherwise (check `.explain("formatted")` before blaming
the host — see SCALE.md). Exit code 1 when any query trips the flag
threshold, so a round script can gate on it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

FLAG_RATIO = 1.5  # new/old above this → flagged
NOISE_FLOOR = 0.2  # seconds; sub-floor queries are all noise

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--allow-drops"]
    allow_drops = "--allow-drops" in sys.argv[1:]
    rev = argv[0] if argv else "HEAD"
    cur_path = os.path.join(REPO, "BENCH_DETAIL.json")
    # bench.py's loaded-host guard diverts degraded runs to
    # BENCH_DETAIL.loaded.json, leaving the canonical file untouched;
    # if that diverted artifact is the NEWER of the two, it IS the
    # latest run — comparing the stale canonical file against itself
    # would silently pass a real regression.
    loaded_path = os.path.join(REPO, "BENCH_DETAIL.loaded.json")
    if os.path.exists(loaded_path) and (
        not os.path.exists(cur_path)
        or os.path.getmtime(loaded_path) > os.path.getmtime(cur_path)
    ):
        cur_path = loaded_path
        print(
            "note: latest run was guard-diverted to BENCH_DETAIL.loaded.json "
            "— comparing it (expect host-load inflation OR a real regression)"
        )
    with open(cur_path) as fh:
        cur = json.load(fh)
    ref_raw = subprocess.run(
        ["git", "show", f"{rev}:BENCH_DETAIL.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if ref_raw.returncode != 0:
        sys.exit(f"no BENCH_DETAIL.json at {rev}: {ref_raw.stderr.strip()}")
    ref = json.loads(ref_raw.stdout)

    flagged = []
    # Extended diffs key on the min-of-sweeps floor when both sides
    # carry it (one-sided timing noise made the median scatter >15% on
    # sub-second names across idle sweeps); median kept as fallback for
    # records predating the stat.
    ext_key = (
        "queries_extended_min"
        if "queries_extended_min" in cur and "queries_extended_min" in ref
        else "queries_extended"
    )
    for key in ("queries_min", ext_key):
        old = ref.get(key, {})
        new = cur.get(key, {})
        for name in sorted(set(old) & set(new)):
            o, n = old[name], new[name]
            if max(o, n) < NOISE_FLOOR:
                continue
            ratio = n / o if o else float("inf")
            mark = ""
            if ratio > FLAG_RATIO:
                mark = "  <-- REGRESSION?"
                flagged.append(name)
            if ratio > FLAG_RATIO or ratio < 1 / FLAG_RATIO:
                print(f"{key[8:]:>9} {name:35s} {o:7.3f} -> {n:7.3f}  ({ratio:.2f}x){mark}")
        gone = sorted(set(old) - set(new))
        added = sorted(set(new) - set(old))
        if gone:
            # a query silently vanishing from the sweep (renamed, or
            # erroring out) is itself a regression unless waived
            print(f"{key}: dropped {gone}" + ("" if allow_drops else "  <-- GATED"))
            if not allow_drops:
                flagged.extend(f"dropped:{g}" for g in gone)
        if added:
            print(f"{key}: added {added}")

    ot, nt = ref.get("value_min"), cur.get("value_min")
    if ot and nt:
        print(f"headline min total: {ot:.3f} -> {nt:.3f} ({nt / ot:.2f}x)")
    lf, calib = cur.get("load_factor"), cur.get("calib_sec")
    if lf is not None:
        # written by bench.py at sweep time: this run ÷ the record
        # committed at its HEAD (a flat >1.1 across queries = ambient
        # host load; see SCALE.md "Bench record provenance")
        print(f"load_factor vs committed record: {lf:.3f}"
              + (f"  (calibration probe {calib:.3f}s)" if calib else ""))
    if flagged:
        print(f"\n{len(flagged)} flagged: {flagged}")
        return 1
    print("no regressions flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
