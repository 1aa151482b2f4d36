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


def test_ivf_twolevel_recall_and_routing(spark, emb, truth):
    """Two-level assignment (ivf_assign_twolevel) is the >67M-vector
    path: recall must stay in the flat kernel's class (it changes
    ROUTING, not scoring), and the routing itself must stay a valid
    fine-centroid assignment — every assigned cid must exist in the
    centroid table, and vectors that ARE fine centroids must agree
    with flat assignment on themselves (a centroid's nearest fine
    centroid is itself at either level)."""
    from syncflux_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_twolevel,
    )

    q = emb.where(F.col("vec_id") < N_QUERIES)
    approx = ivf_topk(
        emb, q, k=K, n_centroids=16, nprobe=4, assign_levels=2
    )
    r = _recall(approx, truth)
    assert r >= 0.4, f"two-level IVF recall collapsed: {r:.2f}"

    two = ivf_assign_twolevel(emb, n_centroids=16)
    flat = ivf_assign(emb, n_centroids=16)
    cids = {r2.cid for r2 in two.select("cid").distinct().collect()}
    assert cids <= set(range(16))
    self_two = {
        r2.vec_id: r2.cid
        for r2 in two.where(F.col("vec_id") < 16).collect()
    }
    self_flat = {
        r2.vec_id: r2.cid
        for r2 in flat.where(F.col("vec_id") < 16).collect()
    }
    assert self_two == self_flat == {i: i for i in range(16)}


def test_ivf_more_probes_more_recall(spark, emb, truth):
    """nprobe is the recall/cost dial — turning it up must not turn
    recall down (monotonicity is what makes it tunable at scale)."""
    q = emb.where(F.col("vec_id") < N_QUERIES)
    r2 = _recall(ivf_topk(emb, q, k=K, n_centroids=16, nprobe=2), truth)
    r8 = _recall(ivf_topk(emb, q, k=K, n_centroids=16, nprobe=8), truth)
    assert r8 >= r2
    assert r8 >= 0.7, f"nprobe=8 recall too low: {r8:.2f}"


class TestNearDupAutoPlanes:
    """near_dup_pairs' auto-sized planes: the 100 TB guard is that
    bucket granularity GROWS with the corpus instead of a fixed 64
    buckets whose per-bucket n² work scales as (N/64)²."""

    def test_auto_planes_formula(self):
        from syncflux_spark.operators.similarity import auto_planes

        assert auto_planes(500, target_bucket_size=1024) == 0
        assert auto_planes(2048, target_bucket_size=1024) == 1
        assert auto_planes(1 << 20, target_bucket_size=1024) == 10
        # 100 TB regime stays capped where n_tables takes over
        assert auto_planes(10**12, target_bucket_size=1024) == 24

    def test_bounded_buckets_on_skewed_corpus(self, spark):
        """A half-space-biased (sign-skewed) corpus must still split:
        with auto-sized planes the largest bucket stays within a small
        multiple of the target, instead of one bucket swallowing the
        corpus."""
        from syncflux_spark.operators.similarity import (
            auto_planes,
            sign_lsh_bucket,
        )

        n, dim, target = 4096, 16, 64
        # deterministic skew: every component positive-leaning
        rows = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (
                        F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(1000))
                        / 1000.0
                        - 0.25
                    ).cast("double")
                    for d in range(dim)
                ]
            ).alias("embedding"),
        )
        p = auto_planes(n, target_bucket_size=target)
        assert p == 6
        sizes = (
            rows.select(sign_lsh_bucket("embedding", p, dim).alias("bk"))
            .groupBy("bk")
            .count()
        )
        max_bucket = sizes.agg(F.max("count")).collect()[0][0]
        assert max_bucket <= 8 * target, (
            f"largest bucket {max_bucket} vs target {target}: skewed corpus "
            "defeated the plane split"
        )

    def test_bucket_cap_star_collapse(self, spark):
        """The embedding flavor of the r10 hot-bucket dial: a tight
        cluster that no plane count can split must emit star
        candidates around its min id; when the cap doesn't bind the
        output is identical to uncapped."""
        from syncflux_spark.operators.similarity import near_dup_pairs

        dim = 8
        # cluster A: five near-identical vectors (ids 10..14) — one
        # sign bucket; ids 20,21: two isolated directions
        base = [1.0] * dim

        def jig(i):
            v = list(base)
            v[0] += i * 1e-3
            return v

        rows = [(10 + i, jig(i)) for i in range(5)] + [
            (20, [1.0, -1.0] * (dim // 2)),
            (21, [-1.0, 1.0] * (dim // 2)),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

        def pairs(**kw):
            return {
                (r.id_a, r.id_b)
                for r in near_dup_pairs(
                    emb, threshold=0.3, n_planes=4, dim=dim, **kw
                ).collect()
            }

        uncapped = pairs()
        capped = pairs(bucket_cap=3)
        # cluster A clique (10 pairs, all cos≈1) collapses to the
        # star around 10; everything else unchanged
        clusterA_clique = {
            (a, b) for a in range(10, 15) for b in range(a + 1, 15)
        }
        assert clusterA_clique <= uncapped
        assert capped & clusterA_clique == {
            (10, b) for b in range(11, 15)
        }
        assert (uncapped - clusterA_clique) == (capped - clusterA_clique)
        # non-binding cap is the identity
        assert pairs(bucket_cap=5) == uncapped
        import pytest

        with pytest.raises(ValueError, match="bucket_cap"):
            near_dup_pairs(emb, threshold=0.3, dim=dim, bucket_cap=0)

    def test_more_tables_superset_pairs(self, spark, emb):
        """Multi-table banding only ADDS candidate pairs (recall dial):
        every pair found with 1 table must appear with 2 tables."""
        from syncflux_spark.operators.similarity import near_dup_pairs

        def pairs(t):
            return {
                (r.id_a, r.id_b)
                for r in near_dup_pairs(
                    emb, threshold=0.3, n_planes=4, dim=64, n_tables=t
                ).collect()
            }

        p1, p2 = pairs(1), pairs(2)
        assert p1 <= p2
        assert len(p2) > len(p1)  # the second plane set finds new pairs


def test_simhash_band_search_is_exact(spark, sf_dir):
    """The pigeonhole banding claims 100% recall: pairs found via the
    (band_id, band_bits) self-join must EQUAL the brute-force
    all-pairs Hamming filter — not approximate it."""
    from syncflux_spark.functions.text import words
    from syncflux_spark.functions.vectors import simhash_bits
    from syncflux_spark.operators.dedup import simhash_near_pairs
    from syncflux_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    banded = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    fp = docs.select("doc_id", simhash_bits(words("text"), 16).alias("sh"))
    a, b = fp.alias("a"), fp.alias("b")
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("h"),
        )
        .where(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute and len(brute) > 0


def test_simhash64_band_search_is_exact(spark, sf_dir):
    """Same pigeonhole-exactness claim for the 64-bit two-word form:
    the 4x16 band self-join over (lo, hi) must equal the brute-force
    Hamming-over-both-halves filter. Also pins the half layout: lo =
    nibble top-bit votes, hi = second-bit votes (independent coins
    from ONE md5 pass), so the two halves genuinely differ."""
    from syncflux_spark.functions.text import words
    from syncflux_spark.functions.vectors import simhash_bits
    from syncflux_spark.operators.dedup import simhash_near_pairs
    from syncflux_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_pairs(docs, n_bits=64, max_hamming=3).collect()
    }
    toks = words("text")
    fp = docs.select(
        "doc_id",
        simhash_bits(toks, 32, nibble_bit=3).alias("lo"),
        simhash_bits(toks, 32, nibble_bit=2).alias("hi"),
    )
    halves_differ = fp.where(F.col("lo") != F.col("hi")).count()
    assert halves_differ > 0
    a, b = fp.alias("a"), fp.alias("b")
    brute = {
        (r.id_a, r.id_b, r.h)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
                + F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
            )
            .cast("long")
            .alias("h"),
        )
        .where(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute and len(brute) > 0


def test_simhash64_requires_hamming3(spark, sf_dir):
    from syncflux_spark.operators.dedup import simhash_near_pairs
    from syncflux_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="max_hamming=3"):
        simhash_near_pairs(docs, n_bits=64, max_hamming=2)


def test_simhash_nibble_bit_validated():
    from syncflux_spark.functions.vectors import simhash_bits

    with pytest.raises(ValueError, match="nibble_bit"):
        simhash_bits(F.col("toks"), 16, nibble_bit=1)


def test_ivf_kmeans_centroids_recall(spark, emb, truth):
    """k-means|| centroids must keep IVF usable: a recall floor and
    the nprobe dial still monotone. (Measured on this NEAR-UNIFORM
    synthetic fixture: recall 0.61 vs the seed set's 0.73 at
    nprobe=4/16, list-size ratio 8.1 vs 2.1 — uniform shells are the
    adversarial case for adapted quantizers, which pay off on the
    clustered distributions real embedding corpora have. The gate is
    therefore a floor, not a beat-the-seed-set comparison.)"""
    from syncflux_spark.operators.similarity import kmeans_centroids

    q = emb.where(F.col("vec_id") < N_QUERIES)
    cents = kmeans_centroids(emb, n_centroids=16)
    r4 = _recall(
        ivf_topk(emb, q, k=K, n_centroids=16, nprobe=4, centroids=cents), truth
    )
    r8 = _recall(
        ivf_topk(emb, q, k=K, n_centroids=16, nprobe=8, centroids=cents), truth
    )
    assert r4 >= 0.5, f"k-means IVF recall collapsed: {r4:.2f}"
    assert r8 >= r4, "nprobe dial lost monotonicity under k-means centroids"


def test_kmeans_train_fraction_recall(spark, emb, truth):
    """The 100 TB training dial: a quantizer fit on a deterministic
    hash sample of the corpus must stay usable — recall within a
    small delta of full-corpus training (k-means needs a
    representative sample, not the population), and the sampler must
    be reproducible (same fraction → same centroids → same recall)."""
    from syncflux_spark.operators.similarity import kmeans_centroids

    q = emb.where(F.col("vec_id") < N_QUERIES)
    full = kmeans_centroids(emb, n_centroids=16)
    sampled = kmeans_centroids(emb, n_centroids=16, train_fraction=0.5)
    r_full = _recall(
        ivf_topk(emb, q, k=K, n_centroids=16, nprobe=4, centroids=full), truth
    )
    r_half = _recall(
        ivf_topk(emb, q, k=K, n_centroids=16, nprobe=4, centroids=sampled),
        truth,
    )
    assert r_half >= 0.5, f"sampled-training recall collapsed: {r_half:.2f}"
    assert r_half >= r_full - 0.15, (
        f"half-corpus training lost too much recall: {r_half:.2f} vs "
        f"{r_full:.2f}"
    )
    again = kmeans_centroids(emb, n_centroids=16, train_fraction=0.5)
    a = sorted(map(tuple, sampled.select("cid", "centv").collect()))
    b = sorted(map(tuple, again.select("cid", "centv").collect()))
    assert a == b, "hash-sampled training set must be deterministic"

    with pytest.raises(ValueError, match="train_fraction"):
        kmeans_centroids(emb, n_centroids=16, train_fraction=0.0)


def test_int8_quantization_quality(spark, emb):
    """SQ8 must be nearly lossless for similarity purposes: cosine
    between original and dequantized vector > 0.999 for every row,
    per-element error bounded by scale/2."""
    from syncflux_spark.functions.vectors import (
        as_double,
        dequantize,
        int8_scale,
        quantize_int8,
    )

    s = emb.select(
        "vec_id",
        as_double("embedding").alias("v"),
        int8_scale("embedding").alias("scale"),
    ).where(F.col("scale") > 0)
    d = s.select(
        "vec_id",
        "v",
        "scale",
        dequantize(quantize_int8("v", F.col("scale")), F.col("scale")).alias("dq"),
    )
    checked = d.select(
        F.min(
            F.aggregate(
                F.zip_with("v", "dq", lambda a, b: (a - b) / F.col("scale")),
                F.lit(0.0),
                lambda acc, e: F.greatest(acc, F.abs(e)),
            )
            <= 0.5000001
        ).alias("err_ok"),
        F.min(
            F.aggregate(
                F.zip_with("v", "dq", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("_"),
    ).collect()[0]
    assert checked["err_ok"]
    from syncflux_spark.queries import queries

    import os
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cos_min = (
        queries()["emb_quantize_int8"](spark, sf)
        .agg(F.min("recon_cos"))
        .collect()[0][0]
    )
    assert cos_min > 0.999, f"int8 reconstruction cosine degraded: {cos_min}"


def test_power_iteration_matches_numpy(spark, emb):
    """The distributed matrix-free power iteration must be
    ALGEBRAICALLY the same computation as the local one: run the
    identical iteration in numpy from the identical init and demand
    near-bit agreement — a wrong per-round M·v pass (dropped /n,
    transposed product, off-by-one dim) diverges immediately. The
    true-eigenpair check is deliberately loose: the fixture's spectrum
    is nearly flat (random-ish embeddings ⇒ tiny eigengap), so 20
    rounds bound the eigenvalue but not the direction — convergence
    RATE is a property of the spectrum, not of this operator."""
    import math

    import numpy as np

    from syncflux_spark.operators.similarity import top_eigenvector

    n_iter = 20
    row = top_eigenvector(emb, n_iter=n_iter).collect()[0]
    v = np.array(row.eigenvector)

    X = np.array(
        [r.x for r in emb.select(F.col("embedding").cast("array<double>").alias("x")).collect()]
    )
    M = X.T @ X / len(X)

    ref = np.full(X.shape[1], 1.0 / math.sqrt(X.shape[1]))
    ev_ref = 0.0
    for _ in range(n_iter):
        mv = M @ ref
        ev_ref = float(np.linalg.norm(mv))
        ref = mv / ev_ref
    # same algorithm, same init, same rounds → only float-order drift
    assert float(v @ ref) > 1.0 - 1e-9
    assert abs(row.eigenvalue - ev_ref) / ev_ref < 1e-9

    # loose spectral sanity: the eigenvalue estimate (which converges
    # ~(λ2/λ1)^2k, much faster than the vector) is near the true λ1
    top_val = np.linalg.eigh(M)[0][-1]
    assert abs(row.eigenvalue - top_val) / top_val < 0.05


def test_power_iteration_fixedpoint_matches_float(spark, emb):
    """The integer-micros variant (the oracle-hashable registered
    query) must track the float power iteration to quantization
    error: components agree to ~1e-5 and the eigenvalue to 1e-4
    relative — a wrong scale, a dropped /n, or a rounding-rule
    mismatch shifts results far beyond that."""
    import numpy as np

    from syncflux_spark.operators.similarity import (
        top_eigenvector,
        top_eigenvector_fixedpoint,
    )

    frow = top_eigenvector(emb, n_iter=10).collect()[0]
    rows = top_eigenvector_fixedpoint(emb, n_iter=10).collect()
    assert sorted(r.dim_idx for r in rows) == list(range(1, frow.dim + 1))
    got = np.array(
        [r.component_micro for r in sorted(rows, key=lambda r: r.dim_idx)]
    ) / 1e6
    ref = np.array(frow.eigenvector)
    assert float(np.abs(got - ref).max()) < 1e-4
    ev = rows[0].eigenvalue_micro / 1e6
    assert abs(ev - frow.eigenvalue) / frow.eigenvalue < 1e-4


def test_pagerank_fixedpoint_matches_float(spark, sf_dir):
    """The int64 parts-per-10¹² variant (the oracle-hashable
    registered query) must track float PageRank to quantization
    error (≤1 part per 10¹² per op × 10 rounds ≪ 1e-9)."""
    from syncflux_spark.operators.dedup import ngram_jaccard_pairs
    from syncflux_spark.operators.graph import pagerank, pagerank_fixedpoint

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
    fl = {
        r.doc_id: r.rank
        for r in pagerank(docs.select("doc_id"), pairs, n_iter=10).collect()
    }
    fp = pagerank_fixedpoint(docs.select("doc_id"), pairs, n_iter=10).collect()
    assert len(fp) == len(fl)
    for r in fp:
        assert abs(r.rank - fl[r.doc_id]) < 1e-9, (r.doc_id, r.rank, fl[r.doc_id])
        assert r.rank == r.rank_fp / 1e12


def test_pagerank_matches_numpy(spark, sf_dir):
    """The distributed PageRank rounds must agree with a local numpy
    replica of the identical iteration (same init, damping, rounds) —
    only cross-row float-order drift is tolerated. A dropped degree
    division, missed symmetrization, or lost isolated-node floor
    shifts ranks far beyond 1e-9."""
    import numpy as np

    from syncflux_spark.operators.dedup import ngram_jaccard_pairs
    from syncflux_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
    got = {
        r.doc_id: r.rank
        for r in pagerank(docs.select("doc_id"), pairs, n_iter=10).collect()
    }

    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    idx = {d: i for i, d in enumerate(ids)}
    n = len(ids)
    edges = [(idx[r.id_a], idx[r.id_b]) for r in pairs.collect()]
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    rank = np.full(n, 1.0 / n)
    for _ in range(10):
        nxt = np.full(n, 0.15 / n)
        for u, vs in nbrs.items():
            share = 0.85 * rank[u] / len(vs)
            for v in vs:
                nxt[v] += share
        rank = nxt
    for d, i in idx.items():
        assert abs(got[d] - rank[i]) < 1e-9, (d, got[d], rank[i])


class TestProductQuantization:
    def _l2_truth(self, spark, emb):
        """Exact integer-micros squared-L2 top-K — the correct ground
        truth for PQ (which approximates L2, not cosine)."""
        from syncflux_spark.operators.similarity import micros_vec

        from pyspark.sql import Window

        v = emb.select("vec_id", micros_vec("embedding").alias("vm"))
        q = v.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("vm").alias("qm")
        )
        d = F.aggregate(
            F.zip_with("qm", "vm", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        scored = q.crossJoin(v).where(
            F.col("query_id") != F.col("vec_id")
        ).select("query_id", "vec_id", d.alias("d"))
        w = Window.partitionBy("query_id").orderBy("d", "vec_id")
        top = scored.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= K
        )
        return {(r.query_id, r.vec_id) for r in top.collect()}

    def test_pq_recall_vs_exact_l2(self, spark, emb):
        from syncflux_spark.operators.similarity import pq_topk

        truth = self._l2_truth(spark, emb)
        approx = pq_topk(emb, emb.where(F.col("vec_id") < N_QUERIES), k=K)
        got = {
            (r.query_id, r.neighbor_id)
            for r in approx.select("query_id", "neighbor_id").collect()
        }
        r = len(got & truth) / len(truth)
        # raw ADC on weakly-clustered synthetic vectors is the floor,
        # not the product — rescoring below is the production number
        assert r >= 0.1, f"PQ recall collapsed: {r:.2f}"

    def test_pq_rescored_recall(self, spark, emb):
        """The two-stage pipeline (ADC shortlist R=50 -> exact-L2
        rescore) must recover most of the exact top-5."""
        from syncflux_spark.operators.similarity import pq_rescored_topk

        truth = self._l2_truth(spark, emb)
        top = pq_rescored_topk(
            emb, emb.where(F.col("vec_id") < N_QUERIES), k=K, shortlist=50
        )
        got = {
            (r.query_id, r.neighbor_id)
            for r in top.select("query_id", "neighbor_id").collect()
        }
        r = len(got & truth) / len(truth)
        assert r >= 0.5, f"rescored PQ recall collapsed: {r:.2f}"

    def test_wider_codebook_not_worse(self, spark, emb):
        """More codewords per subspace → finer quantization → recall
        must not degrade (the PQ quality dial)."""
        from syncflux_spark.operators.similarity import pq_topk

        truth = self._l2_truth(spark, emb)
        q = emb.where(F.col("vec_id") < N_QUERIES)

        def rec(k_codes):
            got = {
                (r.query_id, r.neighbor_id)
                for r in pq_topk(emb, q, k=K, k_codes=k_codes)
                .select("query_id", "neighbor_id")
                .collect()
            }
            return len(got & truth) / len(truth)

        assert rec(32) >= rec(8) - 1e-9


def test_ivfpq_recall_and_probe_monotonicity(spark, emb, truth):
    """IVFPQ tripwire: residual-coded ADC over probed cells must keep
    nonzero recall, and more probes must not reduce it (the same
    tunability contract as plain IVF)."""
    from syncflux_spark.operators.similarity import ivf_pq_topk

    q = emb.where(F.col("vec_id") < N_QUERIES)
    r2 = _recall(ivf_pq_topk(emb, q, k=K, n_centroids=8, nprobe=2), truth)
    r8 = _recall(ivf_pq_topk(emb, q, k=K, n_centroids=8, nprobe=8), truth)
    assert r2 > 0.05, f"IVFPQ recall collapsed: {r2:.2f}"
    assert r8 >= r2, f"probe monotonicity broken: {r2:.2f} -> {r8:.2f}"


def test_ivfpq_candidates_only_from_probed_cells(spark, emb):
    """nprobe=1 of 8 cells must score a strict subset of the corpus —
    the pruning that makes IVFPQ sublinear. With all cells probed the
    candidate set is the whole corpus (minus self)."""
    from syncflux_spark.operators.similarity import ivf_pq_topk

    q = emb.where(F.col("vec_id") < 3)
    narrow = ivf_pq_topk(emb, q, k=10**9, n_centroids=8, nprobe=1)
    wide = ivf_pq_topk(emb, q, k=10**9, n_centroids=8, nprobe=8)
    n_narrow, n_wide = narrow.count(), wide.count()
    total = emb.count()
    assert n_wide == 3 * (total - 1) or n_wide == 3 * total - 3
    assert n_narrow < n_wide


class TestSemanticDedup:
    def test_keep_rule_and_cluster_bound(self, spark):
        """Crafted clusters: near-identical vectors in one cluster →
        the LOW centroid-similarity one survives; cross-cluster
        near-dups are (by design) not compared."""
        from syncflux_spark.operators.similarity import (
            seed_centroids,
            semantic_dedup_flags,
        )

        rows = [
            (0, [1.0, 0.0, 0.0]),     # centroid seed A — also a dup of 10/11
            (1, [0.0, 1.0, 0.0]),     # centroid seed B
            (10, [0.9, 0.1, 0.0]),    # cluster A, dup group {0,10,11}
            (11, [0.89, 0.11, 0.0]),  # cluster A, dup group {0,10,11}
            (20, [0.0, 0.6, 0.8]),    # cluster B, isolated (cos to 1 = 0.6)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents = seed_centroids(df.where("vec_id < 2"), 2)
        out = {
            r.vec_id: r
            for r in semantic_dedup_flags(
                df, n_centroids=2, tau=0.95, centroids=cents
            ).collect()
        }
        assert len(out) == 5
        # {0,10,11} are mutual within-cluster dups: exactly ONE kept,
        # and it's the LOWEST cos-to-centroid member (cluster edge)
        group = [out[0], out[10], out[11]]
        kept = [r for r in group if r.dropped == 0]
        assert len(kept) == 1
        assert kept[0].vec_id == 11  # 0.9925 < 0.9939 (10) < 1.0 (0)
        assert kept[0].cos_to_centroid == min(r.cos_to_centroid for r in group)
        # isolated vector and its centroid both survive (cos 0.6 < τ)
        assert out[20].dropped == 0 and out[1].dropped == 0


class TestHardNegatives:
    def test_excludes_positives_and_self(self, spark):
        from syncflux_spark.operators.similarity import hard_negatives

        # two tight clusters; 0/1 are mutual positives, 10/11 the
        # other class — the hard negatives for query 0
        rows = [
            (0, [1.0, 0.0]), (1, [0.99, 0.14]),
            (10, [0.7, 0.71]), (11, [0.6, 0.8]), (12, [-1.0, 0.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        queries = emb.where("vec_id = 0")
        positives = spark.createDataFrame(
            [(0, 1)], "query_id long, neighbor_id long"
        )
        out = hard_negatives(emb, queries, positives, k=2).collect()
        got = [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
        # neither self (0) nor positive (1) appear; nearest non-positive
        # is 10, then 11
        assert got == [(10, 1), (11, 2)]


class TestIvfIndexAppend:
    def test_append_equals_rebuild(self, spark, emb):
        """Appending a batch to a persisted index must yield the
        identical inverted file — and identical search results — as
        rebuilding over the union (assignment is a pure function of
        vector × frozen centroids)."""
        from syncflux_spark.operators.similarity import (
            ivf_index_append,
            ivf_index_build,
            ivf_index_topk,
            seed_centroids,
        )

        old = emb.where(F.col("vec_id") < 400)
        batch = emb.where((F.col("vec_id") >= 400) & (F.col("vec_id") < 500))
        both = emb.where(F.col("vec_id") < 500)
        # quantizer frozen on the FULL corpus's seed rows (ids < 16,
        # present in `old`) so append and rebuild share centroids
        cents = seed_centroids(both, 16)
        _, idx_old = ivf_index_build(old, 16, centroids=cents)
        appended = ivf_index_append(cents, idx_old, batch)
        _, rebuilt = ivf_index_build(both, 16, centroids=cents)
        a = {(r.vec_id, r.cid) for r in appended.select("vec_id", "cid").collect()}
        b = {(r.vec_id, r.cid) for r in rebuilt.select("vec_id", "cid").collect()}
        assert a == b
        q = emb.where(F.col("vec_id") < 5)
        ra = {
            (r.query_id, r.rank, r.neighbor_id)
            for r in ivf_index_topk(cents, appended, q, k=5, nprobe=4).collect()
        }
        rb = {
            (r.query_id, r.rank, r.neighbor_id)
            for r in ivf_index_topk(cents, rebuilt, q, k=5, nprobe=4).collect()
        }
        assert ra == rb


class TestMaxSimAnn:
    def _bags(self, emb):
        return emb.select(
            F.expr("CAST(vec_id DIV 10 AS BIGINT)").alias("doc_id"),
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
        )

    def test_full_shortlist_equals_exact(self, spark, emb):
        """With m >= corpus vectors every doc is a candidate, so the
        ANN form must reproduce the exact MaxSim row-for-row."""
        from syncflux_spark.operators.similarity import (
            maxsim_topk,
            maxsim_topk_ann,
        )

        bags = self._bags(emb)
        q = bags.where(F.col("vec_id") < 30)
        c = bags.where(F.col("vec_id") >= 30)
        n_corpus = c.count()
        exact = {
            (r.q_doc, r.rank, r.c_doc, r.score_micro)
            for r in maxsim_topk(c, q, k=5).collect()
        }
        full = {
            (r.q_doc, r.rank, r.c_doc, r.score_micro)
            for r in maxsim_topk_ann(
                c, q, k=5, m=n_corpus, n_centroids=16, nprobe=16
            ).collect()
        }
        assert full == exact

    def test_shortlist_recall_floor(self, spark, emb):
        from syncflux_spark.operators.similarity import (
            maxsim_topk,
            maxsim_topk_ann,
        )

        bags = self._bags(emb)
        q = bags.where(F.col("vec_id") < 30)
        c = bags.where(F.col("vec_id") >= 30)
        exact = {
            (r.q_doc, r.c_doc) for r in maxsim_topk(c, q, k=5).collect()
        }
        approx = {
            (r.q_doc, r.c_doc)
            for r in maxsim_topk_ann(c, q, k=5, m=20, nprobe=4).collect()
        }
        assert len(approx & exact) / len(exact) >= 0.5


class TestSemdedupAutoK:
    def test_auto_k_arithmetic(self):
        """clamp(ceil(n/target), 1, 65536) — the integer-exact rule the
        semantic_dedup_auto oracle mirrors as (n + t - 1) // t."""
        from syncflux_spark.operators.similarity import (
            SEMDEDUP_MAX_K,
            semdedup_auto_k,
        )

        assert semdedup_auto_k(0) == 1
        assert semdedup_auto_k(1) == 1
        assert semdedup_auto_k(1024) == 1
        assert semdedup_auto_k(1025) == 2
        assert semdedup_auto_k(500, target_cell_size=64) == 8
        assert semdedup_auto_k(10**12) == SEMDEDUP_MAX_K
        import pytest as _pytest

        with _pytest.raises(ValueError, match="target_cell_size"):
            semdedup_auto_k(10, target_cell_size=0)

    def test_auto_default_matches_pinned_k(self, spark):
        """On a corpus where ceil(n/target) equals the pinned k, the
        default path must give byte-identical flags."""
        from syncflux_spark.operators.similarity import semantic_dedup_flags

        rows = [
            (i, [float(i % 7 + 1), float((i * 3) % 5 + 1), 1.0])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        auto = sorted(
            map(
                tuple,
                semantic_dedup_flags(
                    df, tau=0.9, target_cell_size=10
                ).collect(),
            )
        )
        pinned = sorted(
            map(
                tuple,
                semantic_dedup_flags(df, n_centroids=4, tau=0.9).collect(),
            )
        )
        assert auto == pinned and len(auto) == 40
