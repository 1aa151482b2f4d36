"""Linear-time per-series kernels for the InfluxQL TA fold family.

The in-row codegen forms in ``influxql.py`` compute bucket *j*'s value
by re-folding the per-series prefix ``x₁..xⱼ`` — O(B²) work inside one
projection, which is fine at rollup scale (≤ a few thousand buckets)
but a straggler that never finishes at ``GROUP BY time(1m)`` over a
year (525 k buckets → ~10¹¹ fold steps on ONE row). Above the
engine's ``fold_linear_threshold`` (estimated from the statement's
time range and group interval at plan-build time) the engine switches
to these kernels: ONE Arrow-batched pass per series that carries the
running state and emits every bucket's value — O(B).

**Bit-determinism contract**: every kernel replays EXACTLY the same
sequence of individually-rounded IEEE-754 operations as the codegen
fold it replaces (and therefore as the DuckDB oracle): same operand
order, same intermediate rounding, no FMA contraction (CPython and
JVM both evaluate ``a*b + c*d`` as two mults and an add on doubles).
SQL null semantics are mirrored op-by-op: plain arithmetic
null-propagates, ``greatest(expr, 0.0)`` treats a null operand as
absent (yielding 0.0), ``when(cond_null)`` falls to the otherwise
branch. Tested bit-exact against the codegen forms over randomized
series including nulls (tests/test_influxql.py::TestLinearFolds).

These are per-SERIES kernels: one input row per series, the array
column holding that series' rollup values in time order — so the
Python-side loop is O(buckets) with Arrow transfer amortized over the
whole series, not a row-at-a-time UDF over fact rows.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def _is_null(x) -> bool:
    return x is None or (isinstance(x, float) and math.isnan(x))


def _vals(cell) -> list:
    """Arrow list cell → Python list with None for SQL nulls (Arrow
    surfaces them as NaN in float arrays, None in object arrays)."""
    xs = cell.tolist() if hasattr(cell, "tolist") else list(cell)
    return [None if _is_null(x) else x for x in xs]


def _arr_udf(fn):
    """Wrap a list→list series kernel as an Arrow-batched pandas UDF
    over array<double> columns."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def k(col):
        return col.apply(lambda cell: fn(_vals(cell)))

    return k


def ema_values(xs: list, alpha: float, beta: float) -> list:
    """EMA₁ = x₁; EMAⱼ = xⱼ·α + EMAⱼ₋₁·β. Output aligned to bucket
    index (full length); null-propagating like the codegen fold (any
    null in the prefix nulls everything after it)."""
    out, acc = [], None
    for i, x in enumerate(xs):
        if i == 0:
            acc = x
        elif acc is None or x is None:
            acc = None
        else:
            acc = x * alpha + acc * beta
        out.append(acc)
    return out


def ema_udf(alpha: float, beta: float):
    return _arr_udf(lambda xs: ema_values(xs, alpha, beta))


def rsi_values(xs: list, n: int) -> list:
    """Wilder RSI: N-bucket seeded average then the (ag·(N−1)+g)/N
    smoothing; value emitted per bucket from N+1 (earlier slots None).
    greatest() semantics: a move involving a null bucket counts as
    0-gain/0-loss, and `prev` still advances to the null."""
    fn, fn1 = float(n), float(n - 1)
    out: list = [None] * len(xs)
    if not xs:
        return out
    prev, ag, al, k = xs[0], 0.0, 0.0, 0
    for j in range(2, len(xs) + 1):
        x = xs[j - 1]
        k += 1
        if x is None or prev is None:
            gain = loss = 0.0
        else:
            gain = max(x - prev, 0.0)
            loss = max(prev - x, 0.0)
        if k <= n:
            ag = ag + gain / fn
            al = al + loss / fn
        else:
            ag = (ag * fn1 + gain) / fn
            al = (al * fn1 + loss) / fn
        prev = x
        if j >= n + 1:
            s = ag + al
            out[j - 1] = (100.0 * ag) / s if s != 0.0 else None
    return out


def rsi_udf(n: int):
    return _arr_udf(lambda xs: rsi_values(xs, n))


def cascade_values(xs: list, alpha: float, beta: float, kind: str) -> list:
    """DEMA / TEMA / TRIX over the e1→e2→e3 EMA cascade, all levels
    advanced per step, seeded at x₁. DEMA/TEMA emit from bucket 1,
    TRIX from bucket 2 (needs the previous e3)."""
    out: list = [None] * len(xs)
    if not xs:
        return out
    e1 = e2 = e3 = xs[0]
    prev_e3 = None
    for j in range(1, len(xs) + 1):
        if j > 1:
            x = xs[j - 1]
            prev_e3 = e3
            if x is None or e1 is None:
                e1 = e2 = e3 = None
            else:
                e1 = x * alpha + e1 * beta
                e2 = e1 * alpha + e2 * beta
                e3 = e2 * alpha + e3 * beta
        if kind == "double_exponential_moving_average":
            out[j - 1] = (
                None if e1 is None else 2.0 * e1 - e2
            )
        elif kind == "triple_exponential_moving_average":
            out[j - 1] = (
                None if e1 is None else (3.0 * e1 - 3.0 * e2) + e3
            )
        else:  # triple_exponential_derivative (TRIX), j >= 2
            if j >= 2 and prev_e3 is not None and e3 is not None:
                out[j - 1] = (
                    (100.0 * (e3 - prev_e3)) / prev_e3
                    if prev_e3 != 0.0
                    else None
                )
    return out


def cascade_udf(alpha: float, beta: float, kind: str):
    return _arr_udf(lambda xs: cascade_values(xs, alpha, beta, kind))


def kama_values(xs: list, n: int, spread: float, slow: float) -> list:
    """Kaufman adaptive MA: seeds at x_{N+1}, then
    kama' = kama + sc²·(x − kama) with sc = er₀·spread + slow. er₀'s
    denominator re-folds the N-move window left-to-right each step
    (same op order as the codegen inner fold — O(B·N) total, linear
    in buckets); a null anywhere in the window makes the denominator
    null, which the when().otherwise(0.0) maps to er₀ = 0."""
    out: list = [None] * len(xs)
    b = len(xs)
    if b < n + 1:
        return out
    # moves array (None-propagating), same as the _ad transform
    ad = [
        None
        if xs[i + 1] is None or xs[i] is None
        else abs(xs[i + 1] - xs[i])
        for i in range(b - 1)
    ]
    kama = xs[n]  # element N+1, 1-based
    out[n] = kama
    for k in range(n + 2, b + 1):  # 1-based bucket being folded
        x = xs[k - 1]
        # den: fold of ad[k-n .. k-1] (1-based) in order
        den: float | None = 0.0
        for m in range(k - n - 1, k - 1):
            den = None if (den is None or ad[m] is None) else den + ad[m]
        if xs[k - 1] is None or xs[k - 1 - n] is None:
            num = None
        else:
            num = abs(xs[k - 1] - xs[k - 1 - n])
        if den is not None and den != 0.0:
            er0 = None if num is None else num / den
        else:
            er0 = 0.0
        if er0 is None or kama is None or x is None:
            kama = None
        else:
            sc = er0 * spread + slow
            sc2 = sc * sc
            kama = kama + sc2 * (x - kama)
        out[k - 1] = kama
    return out


def kama_udf(n: int, spread: float, slow: float):
    return _arr_udf(lambda xs: kama_values(xs, n, spread, slow))


def hw_fit_values(xs: list) -> list:
    """holt_winters_with_fit fitted values over the int64-micros
    array — see :func:`hw_fit_udf`."""
    out: list = [None] * len(xs)
    if not xs:
        return out
    x1 = xs[0]
    out[0] = None if x1 is None else float(x1) / 1e6
    l, b = x1, 0
    for i in range(2, len(xs) + 1):
        out[i - 1] = None if (l is None or b is None) else (l + b) / 1e6
        x = xs[i - 1]
        if x is None or l is None:
            l = b = None
        else:
            s_new = math.floor(float(x + l + b) / 2.0)
            b = math.floor(float(s_new - l) / 4.0) + (
                b - math.floor(float(b) / 4.0)
            )
            l = s_new
    return out


def hw_fit_udf():
    """holt_winters_with_fit fitted values: one-step-ahead prediction
    from the dyadic fixed-point level/trend state after the previous
    bucket. Input is the int64-micros array; output the fitted
    doubles. Integer floor arithmetic matches the codegen form's
    float-divide-then-floor exactly (Python ints are exact where
    int64 is)."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def k(col):
        return col.apply(lambda cell: hw_fit_values(_vals(cell)))

    return k
