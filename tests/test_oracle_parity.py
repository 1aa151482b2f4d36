"""Local replica of the driver's correctness gate.

For every registered query: run the Spark implementation and the
DuckDB oracle on the same sf directory, then compare
(row count, column names + dtypes, order-insensitive values).
Mirrors the driver's comparison: columns sorted by name, rows sorted,
exact equality for ints/strings/bools, bit-equality for floats.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from syncflux_spark.sources.parquet import TABLES

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    s = normalize(spark_pdf)
    d = normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col], d[col]
        # The driver's value-hash stringifies each cell, so an
        # int64-vs-float64 divergence (1082416320 vs 1082416320.0)
        # hash-mismatches even when the values are numerically equal.
        # The classic leak: DuckDB SUM(BIGINT) returns HUGEINT, which
        # pandas materializes as float64 — the oracle must CAST such
        # output columns to BIGINT. Catch that class locally (ts_acf
        # slipped through in r9 because the old float branch coerced
        # both sides to float before comparing).
        ks, kd = sv.dtype.kind, dv.dtype.kind
        if ks in "iufb" and kd in "iufb":
            # kind equality up to signed/unsigned width: i/u
            # interchange is stringify-identical, but bool-vs-int
            # ('True' vs '1') and int-vs-float ('1' vs '1.0') are the
            # driver hash leaks (ADVICE r10 tightened this from a
            # float-ness-only check)
            canon = {"u": "i"}
            assert canon.get(ks, ks) == canon.get(kd, kd), (
                f"{name}.{col}: dtype kind mismatch spark={sv.dtype} "
                f"oracle={dv.dtype} — the driver's value-hash stringifies "
                "bool/int/float differently; CAST the oracle column (DuckDB "
                "HUGEINT from SUM-of-BIGINT arrives as float64) or align "
                "the Spark type"
            )
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sa, da = sv.astype(float).to_numpy(), dv.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(sa, da)):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r} (Δ={x - y!r})"
        else:
            mism = (sv.astype(str).to_numpy() != dv.astype(str).to_numpy())
            if mism.any():
                i = int(mism.argmax())
                raise AssertionError(
                    f"{name}.{col}[{i}]: {sv.iloc[i]!r} != {dv.iloc[i]!r}"
                )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    # Driver-canonicalizable shapes only: the gate sorts result
    # columns through pandas, and a top-level array/map column crashes
    # it (unhashable list — bit emb_top_eigenvector in r5). Vectors
    # must leave exploded to (idx, value) rows or scalar columns.
    import pyspark.sql.types as T

    for field in sdf.schema.fields:
        assert not isinstance(field.dataType, (T.ArrayType, T.MapType)), (
            f"{name}.{field.name}: top-level {field.dataType.simpleString()} "
            "column would crash the driver's rows-only canonicalization"
        )
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check for non-SQL ops
        return
    duck_pdf = duck.sql(ORACLES[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_dtype_kind_gate_catches_hugeint_leak():
    """The r9 blind spot, pinned: identical VALUES but int64 on the
    Spark side vs float64 on the oracle side (what DuckDB HUGEINT
    from an uncast SUM-of-BIGINT materializes as) must FAIL locally,
    because the driver's value-hash stringifies them differently."""
    ints = pd.DataFrame({"k": ["a", "b"], "s": pd.array([10, 20], dtype="int64")})
    floats = pd.DataFrame({"k": ["a", "b"], "s": pd.array([10.0, 20.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype kind mismatch"):
        assert_frames_match(ints, floats, "hugeint_leak_fixture")
    # same-kind frames still pass
    assert_frames_match(ints, ints.copy(), "int_ok")
    assert_frames_match(floats, floats.copy(), "float_ok")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_dtype_kind_gate_catches_bool_int_leak():
    """ADVICE r10: bool-vs-int (kinds 'b'/'i') stringify differently
    in the driver's hash ('True' vs '1') but both sat inside the old
    float-ness-only check — the tightened gate must flag it, while
    int64-vs-uint64 (stringify-identical) must still pass."""
    import numpy as np

    bools = pd.DataFrame({"k": ["a", "b"], "v": pd.array([True, False], dtype="bool")})
    ints = pd.DataFrame({"k": ["a", "b"], "v": pd.array([1, 0], dtype="int64")})
    with pytest.raises(AssertionError, match="dtype kind mismatch"):
        assert_frames_match(bools, ints, "bool_int_leak_fixture")
    signed = pd.DataFrame({"v": np.array([1, 2], dtype="int64")})
    unsigned = pd.DataFrame({"v": np.array([1, 2], dtype="uint64")})
    assert_frames_match(signed, unsigned, "iu_ok")
