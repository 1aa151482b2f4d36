#!/usr/bin/env python3
"""Dump .explain("formatted") for named registered queries.

Usage: python tools/gen_plans.py --out plans/r12 --suffix _after \
           --sf /root/testdata/sf0.1 name1 name2 ...

Run from any checkout: the repo whose plans you want must be first on
sys.path (cd there, or PYTHONPATH). Queries whose builder executes
eager sub-jobs (census collects, iterative loops) will run those jobs;
the dumped plan is the final returned DataFrame's physical plan —
the one the noop-sink bench executes.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    ns = ap.parse_args()

    sys.path.insert(0, os.getcwd())
    import __spark_entry__ as entry
    from syncflux_spark.session import get_spark

    spark = get_spark("gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = entry.queries()
    os.makedirs(ns.out, exist_ok=True)
    rc = 0
    for name in ns.names:
        if name not in reg:
            print(f"# {name}: not registered in this checkout, skipped", file=sys.stderr)
            continue
        try:
            df = reg[name](spark, ns.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - record, keep going
            text = f"ERROR building {name}: {e}\n"
            rc = 1
        path = os.path.join(ns.out, f"{name}{ns.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"# wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
