"""Measure wall-time scaling slopes of the expensive operator family.

Times each query against the synthetic x1/x3/x10 corpora from
``tools/gen_scale_data.py`` and fits the scaling exponent
``t ≈ c·scale^alpha`` by least squares in log-log space. alpha near 1
is linear scaling; anything super-linear beyond its documented reason
is a named wall. At toy scale a constant per-job overhead deflates
alpha, so the fit is a LOWER bound on honest work growth — the
numbers to watch are the raw wall times and whether alpha stays near
(or below) 1.

Usage: python tools/measure_slopes.py [--data /tmp/syncflux_scale]
         [--queries name1,name2,...] [--budget 300] [--out -]
Prints a markdown table (for SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

#: The family SCALE.md argues about: iterative graph ops, the LSH
#: kernel and its consumers, exact PPJoin baseline, IVF build+search,
#: winnowing. (VERDICT r6 item 3 names this exact list.)
DEFAULT_QUERIES = [
    "dedup_components",
    "emb_dedup_components",
    "doc_pagerank",
    "word_jaccard_pairs",
    "contrastive_triplets",
    "ivf_topk_kmeans",
    "winnow_incremental",
    "ngram_jaccard_pairs",
]


def fit_alpha(points: list[tuple[float, float]]) -> float:
    """Least-squares slope of log(t) on log(scale)."""
    xs = [math.log(s) for s, _ in points]
    ys = [math.log(t) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/syncflux_scale")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument(
        "--budget",
        type=float,
        default=300.0,
        help="skip a query's larger scales once one run exceeds this",
    )
    ns = ap.parse_args()
    names = ns.queries.split(",")
    scales = [int(s) for s in ns.scales.split(",")]
    for s in scales:
        d = os.path.join(ns.data, f"x{s}")
        if not os.path.isdir(d):
            raise SystemExit(
                f"{d} missing — run tools/gen_scale_data.py first"
            )

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from syncflux_spark import queries as q
    from syncflux_spark.session import get_spark

    spark = get_spark("syncflux-slopes")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {n: q.REGISTRY[n].spark for n in names}
    # warmup: codegen + Arrow worker pool
    registry[names[0]](spark, os.path.join(ns.data, "x1")).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for name in names:
        fn = registry[name]
        times: dict[int, float] = {}
        for s in scales:
            d = os.path.join(ns.data, f"x{s}")
            # best-of-2 at x1 (absorbs per-shape codegen); single run
            # above — the larger corpora dominate their own noise
            runs = 2 if s == 1 else 1
            best = float("inf")
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            times[s] = round(best, 2)
            print(f"# {name} x{s}: {times[s]}s", file=sys.stderr)
            # prospective: if the NEXT scale would exceed the budget
            # even at linear growth, don't start it — a super-linear
            # query at x10 can cost 15 minutes nobody asked for
            nxt = scales[scales.index(s) + 1] if s != scales[-1] else None
            if nxt is not None and best * (nxt / s) > ns.budget:
                print(
                    f"# {name}: projected x{nxt} > budget, skipping",
                    file=sys.stderr,
                )
                break
        pts = [(float(s), t) for s, t in times.items() if t > 0]
        alpha = round(fit_alpha(pts), 2) if len(pts) >= 2 else None
        results[name] = {"times": times, "alpha": alpha}

    print("| query | " + " | ".join(f"x{s}" for s in scales) + " | alpha |")
    print("|---|" + "---|" * (len(scales) + 1))
    for name, r in results.items():
        cells = [
            f"{r['times'][s]:.1f}s" if s in r["times"] else "—"
            for s in scales
        ]
        print(f"| {name} | " + " | ".join(cells) + f" | {r['alpha']} |")
    print(json.dumps({"metric": "scale_slopes", "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
