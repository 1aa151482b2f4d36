"""ANN quality gates: the approximate paths (sign-LSH, IVF) must
actually FIND most of what exact search finds — a correctness-of-
approximation property the oracle hash cannot express (the oracle
reproduces the same approximation; these tests measure it against
ground truth instead).

Recall floors are deliberately modest: the sf fixtures are small and
the bucketing parameters are tuned for scale behavior, not tiny-corpus
recall. The point is a tripwire — a refactor that silently breaks
bucketing (wrong plane math, probe off-by-one) sends recall to ~0 and
fails loudly here while leaving row shapes plausible.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from syncflux_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from syncflux_spark.sources.parquet import load_table

K = 5
N_QUERIES = 30


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def truth(spark, emb):
    q = emb.where(F.col("vec_id") < N_QUERIES)
    exact = brute_force_topk(emb, q, k=K)
    return {
        (r.query_id, r.neighbor_id) for r in exact.select("query_id", "neighbor_id").collect()
    }


def _recall(approx_df, truth) -> float:
    got = {
        (r.query_id, r.neighbor_id)
        for r in approx_df.select("query_id", "neighbor_id").collect()
    }
    return len(got & truth) / len(truth)


def test_ivf_recall(spark, emb, truth):
    q = emb.where(F.col("vec_id") < N_QUERIES)
    approx = ivf_topk(emb, q, k=K, n_centroids=16, nprobe=4)
    r = _recall(approx, truth)
    assert r >= 0.5, f"IVF recall collapsed: {r:.2f}"


def test_lsh_recall_multi_table(spark, emb, truth):
    q = emb.where(F.col("vec_id") < N_QUERIES)
    approx = lsh_topk(emb, q, k=K, n_planes=4, dim=64, n_tables=4)
    r = _recall(approx, truth)
    assert r >= 0.4, f"multi-table sign-LSH recall collapsed: {r:.2f}"


def test_lsh_more_tables_more_recall(spark, emb, truth):
    """n_tables is LSH's recall dial (1-(1-p)^T) — must be monotone."""
    q = emb.where(F.col("vec_id") < N_QUERIES)
    r1 = _recall(lsh_topk(emb, q, k=K, n_planes=4, dim=64, n_tables=1), truth)
    r4 = _recall(lsh_topk(emb, q, k=K, n_planes=4, dim=64, n_tables=4), truth)
    assert r4 >= r1


def test_ivf_more_probes_more_recall(spark, emb, truth):
    """nprobe is the recall/cost dial — turning it up must not turn
    recall down (monotonicity is what makes it tunable at scale)."""
    q = emb.where(F.col("vec_id") < N_QUERIES)
    r2 = _recall(ivf_topk(emb, q, k=K, n_centroids=16, nprobe=2), truth)
    r8 = _recall(ivf_topk(emb, q, k=K, n_centroids=16, nprobe=8), truth)
    assert r8 >= r2
    assert r8 >= 0.7, f"nprobe=8 recall too low: {r8:.2f}"
