"""Regenerate the pinned _DRIVER_CONFIRMED snapshot in queries.py.

The public ordering of `queries()` pushes driver-confirmed entries to
the back so each round's 50-query sample covers fresh names. The
confirmed set is the union of (a) the PINNED snapshot in queries.py
and (b) any CORRECTNESS_r*.json files present at runtime. Run this at
round end to fold (b) into (a), so the ordering is reproducible even
without the JSON files (a missing/foreign file can then only ADD
confirmations for the current round, never change history).

Usage: python tools/gen_confirmed.py [--write]
  default prints the regenerated block; --write rewrites queries.py
  in place between the frozenset's triple-quote markers.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_PY = os.path.join(REPO, "syncflux_spark", "queries.py")


def green_names() -> set[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            doc = json.load(f)
        rows = doc.get("queries", doc) if isinstance(doc, dict) else {}
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                names.add(name)
    return names


def warn_missing_rounds() -> None:
    """Warn when a round left no CORRECTNESS/BENCH artifact (it has
    happened: no r7 files were recorded), so the next round's focus
    list is sized knowing a round of confirmations never landed."""
    rounds: dict[str, set[int]] = {"CORRECTNESS": set(), "BENCH": set()}
    for path in glob.glob(os.path.join(REPO, "*_r*.json")):
        m = re.match(r"(CORRECTNESS|BENCH)_r(\d+)\.json", os.path.basename(path))
        if m:
            rounds[m.group(1)].add(int(m.group(2)))
    for kind, seen in rounds.items():
        if not seen:
            continue
        missing = sorted(set(range(1, max(seen) + 1)) - seen)
        if missing:
            hint = (
                "those rounds confirmed nothing; keep their changed "
                "queries in _ROUND_FOCUS"
                if kind == "CORRECTNESS"
                else "no regression record for those rounds"
            )
            print(
                f"# WARNING: no {kind} artifact for round(s) {missing} — "
                f"{hint}",
                file=sys.stderr,
            )


def warn_null_bench_artifacts() -> None:
    """A present-but-unusable artifact is worse than a missing one:
    BENCH_r08/r09.json both arrived with ``"parsed": null`` and a
    truncated string tail (driver-side truncation), so the round's
    perf record silently rested on BENCH_FULL alone. Surface that the
    same way missing rounds are surfaced."""
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        base = os.path.basename(path)
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            print(
                f"# WARNING: {base} is not valid JSON — the round has no "
                "usable headline bench record; rely on BENCH_FULL and say so",
                file=sys.stderr,
            )
            continue
        if isinstance(doc, dict) and "parsed" in doc and doc["parsed"] is None:
            print(
                f"# WARNING: {base} parsed to null (truncated driver "
                "capture) — the round's perf record rests on its BENCH_FULL "
                "artifact; keep the isolated --only re-measure discipline",
                file=sys.stderr,
            )


def current_pinned(src: str) -> set[str]:
    m = re.search(
        r'_DRIVER_CONFIRMED = frozenset\(\s*"""(.*?)"""', src, re.S
    )
    if not m:
        raise SystemExit("queries.py: _DRIVER_CONFIRMED block not found")
    return set(m.group(1).split())


def main() -> None:
    warn_missing_rounds()
    warn_null_bench_artifacts()
    with open(QUERIES_PY) as f:
        src = f.read()
    union = sorted(current_pinned(src) | green_names())
    body = textwrap.fill(
        " ".join(union), width=71, initial_indent="    ",
        subsequent_indent="    ",
    )
    block = f'_DRIVER_CONFIRMED = frozenset(\n    """\n{body}\n    """'
    if "--write" in sys.argv:
        new = re.sub(
            r'_DRIVER_CONFIRMED = frozenset\(\s*""".*?"""',
            block,
            src,
            count=1,
            flags=re.S,
        )
        with open(QUERIES_PY, "w") as f:
            f.write(new)
        print(f"pinned {len(union)} names into queries.py")
    else:
        print(block + ".split()\n)")
        print(f"# {len(union)} names", file=sys.stderr)


if __name__ == "__main__":
    main()
