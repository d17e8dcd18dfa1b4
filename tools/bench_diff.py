#!/usr/bin/env python3
"""Compare two bench JSON lines (graft.Bench stdout / SPARK_GRAFT_BENCH_OUT
files): per-query deltas sorted by absolute impact, so a round-over-round
regression localizes to queries instead of hiding in the total.

Usage: bench_diff.py OLD.json NEW.json [min_abs_delta_sec]

Accepts either the raw one-line bench JSON or a driver BENCH_r{N}.json
wrapper whose "tail" field holds (a possibly head-truncated copy of) it —
queries lost to truncation are simply absent from the comparison.
"""
import json
import re
import sys


def load_queries(path):
    with open(path) as f:
        raw = f.read()
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and isinstance(obj.get("queries"), dict):
        return obj["queries"], obj.get("total_sec") or obj.get("value")
    # driver wrapper or truncated line: scrape "q_name":sec pairs (the
    # wrapper's "tail" holds the bench line as an ESCAPED string, so
    # accept backslashed quotes too)
    text = raw if obj is None else json.dumps(obj)
    qs = {m.group(1): float(m.group(2))
          for m in re.finditer(r'\\?"(q_[a-z0-9_]+)\\?":([0-9.]+)', text)}
    tm = re.search(r'\\?"total_sec\\?":([0-9.]+)', text)
    return qs, float(tm.group(1)) if tm else sum(qs.values())


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, old_total = load_queries(sys.argv[1])
    new, new_total = load_queries(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
    # real deltas first (largest impact on top), then one-sided names —
    # a head-truncated OLD wrapper loses its alphabetically-early queries,
    # and those should not bury the comparable ones
    rows = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            rows.append((0, 0.0, name, o, n, None))
        elif abs(n - o) >= thresh:
            rows.append((1, abs(n - o), name, o, n, n - o))
    rows.sort(key=lambda r: (-r[0], -r[1]))
    print(f"old total {old_total:.1f}s ({len(old)} queries)  "
          f"new total {new_total:.1f}s ({len(new)} queries)")
    for _, _, name, o, n, d in rows:
        if d is None:
            side = "only in NEW" if o is None else "only in OLD"
            val = n if o is None else o
            print(f"  {name:<24} {side}  ({val:.3f}s)")
        else:
            arrow = "SLOWER" if d > 0 else "faster"
            print(f"  {name:<24} {o:8.3f} -> {n:8.3f}  {d:+7.3f}s  {arrow}")
    if not rows:
        print(f"  no per-query delta >= {thresh}s")


if __name__ == "__main__":
    main()
