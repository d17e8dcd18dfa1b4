#!/usr/bin/env python3
"""Re-record the per-query floor table from an honest full sweep.

Usage: record_floors.py BENCH.json [--write] [--init]

Reads a graft.Bench output line (or a file containing it — the
/tmp/bench.json copy or src/main/resources/bench_last_run.json), checks it
covers every query that already has a floor (refuses a BENCH_ONLY subset:
floors must come from ONE uniform sweep, the r12+ discipline; with no
existing floors file the guard has nothing to check against and refuses
without --init; queries newer than the floors file cannot be checked —
eyeball the emitted count against the registry's), and emits

  - src/main/resources/bench_floors.json   (sorted by name)
  - the 4-column BASELINE.md floor table   (sorted by seconds, descending)

Prints both to stdout; only --write touches the resources file. Dev-only
tool — not part of the shipped library.
"""
import json
import sys


def main(path, write):
    with open(path) as f:
        rec = json.loads(f.read().strip())
    queries = rec["queries"]
    try:
        with open("src/main/resources/bench_floors.json") as f:
            old = json.load(f)
    except FileNotFoundError:
        old = None
    if not old and "--init" not in sys.argv:
        sys.exit("REFUSED: no (non-empty) bench_floors.json to check "
                 "coverage against — any subset would record as "
                 "authoritative. Pass --init only for a genuinely fresh repo.")
    old = old or {}
    missing = sorted(set(old) - set(queries))
    if missing:
        sys.exit(f"REFUSED: sweep lacks {len(missing)} queries with existing "
                 f"floors (BENCH_ONLY subset?): {', '.join(missing[:8])}…")
    floors = {k: queries[k] for k in sorted(queries)}
    print(json.dumps(floors, indent=1, sort_keys=True))
    print()
    ordered = sorted(queries.items(), key=lambda kv: (-kv[1], kv[0]))
    ncol, nrow = 4, (len(ordered) + 3) // 4
    print("| query | s | query | s | query | s | query | s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in range(nrow):
        cells = []
        for c in range(ncol):
            i = c * nrow + r
            cells.append(f"{ordered[i][0]} | {ordered[i][1]:.3f}"
                         if i < len(ordered) else " | ")
        print("| " + " | ".join(cells) + " |")
    if write:
        with open("src/main/resources/bench_floors.json", "w") as f:
            json.dump(floors, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"\nwrote {len(floors)} floors", file=sys.stderr)


if __name__ == "__main__":
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(paths) != 1:
        sys.exit(__doc__)
    main(paths[0], "--write" in sys.argv)
