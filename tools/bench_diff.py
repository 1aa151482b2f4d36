"""Diff two per-query benchmark artifacts.

Accepts BENCH_FULL*.json (written by ``bench.py --full``: a plain
JSON object with a ``queries`` map) and the driver's BENCH_r*.json
records (whose payload is a truncated JSON-line *string* — per-query
numbers are recovered with a regex, never json-parsed, because the
tail is cut mid-document).

Usage: python tools/bench_diff.py OLD NEW [--top 15] [--threshold 1.2]
Prints added/removed queries and the biggest movers by ratio, with
absolute deltas — the round-over-round regression check for the ~215
queries outside the headline tail.
"""

from __future__ import annotations

import json
import re
import sys


def load_timings(path: str) -> dict[str, float]:
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and isinstance(doc.get("queries"), dict):
            return {k: float(v) for k, v in doc["queries"].items()}
    except ValueError:
        pass
    # driver record: escaped, possibly truncated — regex the pairs out
    pairs = re.findall(r'\\"([a-zA-Z0-9_]+)\\": ([0-9.]+)', text)
    # a record cut MID-NUMBER would yield a bogus final value
    # ('12.34' truncated to '1'): drop the last pair when the text
    # ends inside its number
    if pairs and re.search(r"[0-9.]$", text.rstrip('"\n }')):
        pairs = pairs[:-1]
    out = {k: float(v) for k, v in pairs if k not in ("sf", "value")}
    if not out:
        raise SystemExit(f"{path}: no per-query timings found")
    return out


def main() -> int:
    import argparse

    p = argparse.ArgumentParser(description="diff two benchmark artifacts")
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--threshold", type=float, default=1.2)
    ns = p.parse_args()
    args = [ns.old, ns.new]
    top, thr = ns.top, ns.threshold
    old, new = load_timings(args[0]), load_timings(args[1])
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    # zero entries (possible in a truncated driver record recovered by
    # regex) are excluded from the totals the same way the mover list
    # excludes them — and they'd make the ratio divide by zero
    timed = [n for n in shared if old[n] > 0 and new[n] > 0]
    tot_old = sum(old[n] for n in timed)
    tot_new = sum(new[n] for n in timed)
    print(
        f"shared {len(timed)} timed queries: {tot_old:.1f}s -> "
        f"{tot_new:.1f}s ({tot_new / tot_old:.2f}x)"
        if timed and tot_old > 0
        else "no shared timed queries"
    )
    movers = sorted(
        (
            (new[n] / old[n], n)
            for n in shared
            # sub-50ms (or zero — a truncated capture) entries are noise
            if old[n] > 0.05
            and new[n] > 0.05
            and max(new[n] / old[n], old[n] / new[n]) >= thr
            and abs(new[n] - old[n]) >= 0.1
        ),
        reverse=True,
    )
    for ratio, n in movers[:top]:
        print(f"  {ratio:5.2f}x  {n}: {old[n]:.2f}s -> {new[n]:.2f}s")
    slow = sorted(((new[n], n) for n in new), reverse=True)[:top]
    print("slowest now: " + ", ".join(f"{n}={t:.2f}s" for t, n in slow))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
