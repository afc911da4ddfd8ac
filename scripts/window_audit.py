"""Driver-correctness window bookkeeping.

The driver's per-round CORRECTNESS gate checks only the FIRST 50
``queries()`` entries (dict order). This audit reports, for every entry:
which round's CORRECTNESS_r0N.json recorded it green, whether it sits in
the current window, and — the actionable part — which never-driver-checked
entries are OUTSIDE the window (i.e. what the next round's reorder must
promote).

Usage: PYTHONPATH=/root/repo python scripts/window_audit.py
Exit 0 always (it's a report, not a gate); the summary line is the point.
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

WINDOW = 50


def main():
    import __spark_entry__ as entrymod

    keys = list(entrymod.queries().keys())
    oracles = set(entrymod.oracle_sql().keys())

    green: dict[str, list[str]] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = path.rsplit("CORRECTNESS_", 1)[1].split(".")[0]
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        for name, res in rec.items():
            if not isinstance(res, dict):
                continue
            ok = res.get("rows_match") and res.get("schema_match") is not False
            if ok:
                green.setdefault(name, []).append(rnd)

    in_window = keys[:WINDOW]
    never = [k for k in keys if k not in green]
    never_outside = [k for k in never if k not in in_window]
    never_inside = [k for k in never if k in in_window]
    stale_inside = [k for k in in_window if k in green]
    untwinned = [k for k in keys if k not in oracles]

    print(f"queries: {len(keys)}  oracles: {len(oracles)}  untwinned: {untwinned or 'none'}")
    print(f"driver-green somewhere: {len(green)}")
    print(f"window (first {WINDOW}): {len(never_inside)} never-checked, "
          f"{len(stale_inside)} already-green (wasted slots)")
    print(f"never-checked OUTSIDE window ({len(never_outside)}):")
    for k in never_outside:
        print(f"  - {k}  (pos {keys.index(k)})")
    if stale_inside:
        print(f"already-green INSIDE window (swap these out): {stale_inside}")
    fit = "YES" if len(never_outside) == 0 else (
        "NO — promote the list above" if len(never) <= WINDOW
        else f"IMPOSSIBLE this round — {len(never)} never-checked > {WINDOW} slots")
    print(f"window covers all never-checked entries: {fit}")


if __name__ == "__main__":
    main()
