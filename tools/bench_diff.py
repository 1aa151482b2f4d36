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
    out = {k: float(v) for k, v in pairs if k not in ("sf", "value")}
    if not out:
        raise SystemExit(f"{path}: no per-query timings found")
    return out


def main() -> int:
    argv = sys.argv[1:]
    args, skip = [], False
    for i, a in enumerate(argv):
        if skip:
            skip = False
        elif a.startswith("--"):
            skip = True  # every flag takes one value
        else:
            args.append(a)
    if len(args) != 2:
        raise SystemExit(__doc__)
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 15
    thr = (
        float(sys.argv[sys.argv.index("--threshold") + 1])
        if "--threshold" in sys.argv
        else 1.2
    )
    old, new = load_timings(args[0]), load_timings(args[1])
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    tot_old = sum(old[n] for n in shared)
    tot_new = sum(new[n] for n in shared)
    print(
        f"shared {len(shared)} queries: {tot_old:.1f}s -> {tot_new:.1f}s "
        f"({tot_new / tot_old:.2f}x)" if shared else "no shared queries"
    )
    movers = sorted(
        (
            (new[n] / old[n], n)
            for n in shared
            if old[n] > 0.05 and max(new[n] / old[n], old[n] / new[n]) >= thr
            # sub-50ms entries are pure noise
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
