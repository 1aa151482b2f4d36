"""Similarity search over embedding columns (``array<float>``).

Two paths, per the standard ANN playbook:

* **Brute-force cosine top-k** — the correctness baseline. Queries
  broadcast against the corpus (broadcast nested-loop join); each
  executor scans its corpus slice once computing codegen'd dot
  products. Linear in corpus size, embarrassingly parallel — at
  100 TB this is the "exact rescore" stage, not the first stage.
* **LSH-bucketed (random-hyperplane sign LSH)** — the scale path:
  vectors bucket by the sign pattern of d' fixed pseudo-random
  hyperplanes; only same-bucket pairs are compared. The hyperplanes
  are derived deterministically from md5 of (plane, dim) so the
  partitioning is reproducible across runs/engines. Recall is tuned
  by number of tables × bits (standard SimHash-for-cosine analysis,
  Charikar '02).

No Python UDFs anywhere — dot products ride `zip_with`/`aggregate`
inside whole-stage codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from syncflux_spark.functions.vectors import as_double, dot, norm
from syncflux_spark.utils import spread_for_cpu

# ---------------------------------------------------------------------------
# Per-pair scoring discipline: every pairwise stage below pre-casts the
# vector to double and precomputes its L2 norm ONCE PER ROW, so the
# per-pair work is a single in-order dot product. Evaluating
# ``cosine(a, b)`` per pair instead would recompute both norms and
# re-allocate the cast arrays for every candidate — measured 6.6s → <1s
# on the sf0.1 near-dup self-join, and at 100 TB it is the difference
# between O(pairs·d) and O(pairs·3d) with 6× the allocations.
# ``dot/(na*nb)`` is bit-identical to ``cosine``: the same IEEE ops in
# the same order, just cached.
# ---------------------------------------------------------------------------


def _sides(
    df: DataFrame, id_col: str, vec_col: str, prefix: str,
    dim: int | None = None,
) -> DataFrame:
    """(id, double-cast vector, norm) projection for one join side.
    The CORPUS side ("c") is spread to the session parallelism first:
    every downstream scoring stage is a small-bytes big-CPU narrow
    pass (n×k HOF dot products) that otherwise runs on the parquet's
    few byte-sized scan partitions — the utils.spread_for_cpu trap;
    no-op on already-wide input. Query sides broadcast, so spreading
    them would buy nothing."""
    if prefix == "c":
        df = spread_for_cpu(df)
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        as_double(vec_col).alias(f"{prefix}v"),
        norm(vec_col).alias(f"{prefix}n"),  # per-row: HOF fold is fine
    )


def _pair_cos(dim: int | None = None) -> F.Column:
    return (dot("qv", "cv", dim) / (F.col("qn") * F.col("cn"))).alias("cos_sim")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k for each query vector: broadcast the (small)
    query side, rank per query. Output: (query_id, neighbor_id,
    cos_sim, rank). Deterministic: ties broken by neighbor id."""
    q = _sides(queries, id_col, vec_col, "q", dim).withColumnsRenamed(
        {"q_id": "query_id"}
    )
    c = _sides(corpus, id_col, vec_col, "c", dim).withColumnsRenamed(
        {"c_id": "neighbor_id"}
    )
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select("query_id", "neighbor_id", _pair_cos(dim))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def threshold_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """All (query, corpus) pairs with cosine ≥ threshold — the
    rank-free formulation (no tie sensitivity, oracle-friendly)."""
    q = _sides(queries, id_col, vec_col, "q", dim).withColumnsRenamed(
        {"q_id": "query_id"}
    )
    c = _sides(corpus, id_col, vec_col, "c", dim).withColumnsRenamed(
        {"c_id": "neighbor_id"}
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    return pairs.select(
        "query_id", "neighbor_id", _pair_cos(dim)
    ).where(F.col("cos_sim") >= threshold)


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1):
    md5-derived, so every engine/run regenerates the same planes."""
    h = hashlib.md5(f"plane{plane}_dim{dim}".encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 31) - 1.0


def sign_lsh_bucket(
    vec_col, n_planes: int, dim: int, plane_offset: int = 0
) -> F.Column:
    """Random-hyperplane sign bucket: bit p = [v · h_p >= 0]. Returns a
    long bitmap. The per-plane dot is a fixed linear combination of
    the vector's components — pure codegen arithmetic.
    ``plane_offset`` selects an independent plane set, so multi-table
    LSH (table t = planes [t·n, (t+1)·n)) reuses one implementation."""
    v = as_double(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        coeffs = [_hyperplane(plane_offset + p, d) for d in range(dim)]
        dp = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(c) for c in coeffs]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + (dp >= 0).cast("long") * F.lit(1 << p)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing a sign-LSH
    bucket in ANY of ``n_tables`` independent hash tables. Each table
    cuts candidates ~2^n_planes-fold; tables union recall up as
    1-(1-p)^T (Charikar '02) — n_planes trades cost per table, and
    n_tables buys recall, which is the dial that matters at 100 TB
    (measured on the sf0.001 fixture: 0.10 recall@5 with one 4-plane
    table → 0.57 with four).

    Plan shape: every table's (bucket → candidate) map is one struct
    in a per-row array, exploded to (table, bucket) rows — a single
    corpus/query scan regardless of T — then ONE join on
    (table, bucket) and a distinct before scoring, so a pair matching
    in several tables is scored once."""
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                sign_lsh_bucket("qv", n_planes, dim, t * n_planes).alias("bk"),
            )
            for t in range(n_tables)
        ]
    )
    q = (
        _sides(queries, id_col, vec_col, "q", dim)
        .withColumnsRenamed({"q_id": "query_id"})
        .select("*", F.explode(tables).alias("qt"))
        .select("query_id", "qv", "qn", "qt.tbl", "qt.bk")
    )
    ctables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                sign_lsh_bucket("cv", n_planes, dim, t * n_planes).alias("bk"),
            )
            for t in range(n_tables)
        ]
    )
    c = (
        _sides(corpus, id_col, vec_col, "c", dim)
        .withColumnsRenamed({"c_id": "neighbor_id"})
        .select("*", F.explode(ctables).alias("ct"))
        .select("neighbor_id", "cv", "cn", "ct.tbl", "ct.bk")
    )
    pairs = (
        c.join(F.broadcast(q), ["tbl", "bk"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "qn", "cv", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select("query_id", "neighbor_id", _pair_cos(dim))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def seed_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed centroids (``id < n_centroids``) — the
    oracle-reproducible choice; quantization quality is whatever the
    first rows happen to be. Schema: (cid, centv, centn)."""
    return corpus.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"),
        as_double(vec_col).alias("centv"),
        norm(vec_col).alias("centn"),
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 20,
    train_fraction: float = 1.0,
) -> DataFrame:
    """k-means|| centroids (pyspark.ml KMeans, Bahmani et al. '12) —
    the production IVF path at 100 TB: the parallel init + Lloyd
    rounds run as distributed Spark jobs, and the resulting quantizer
    actually adapts to the data distribution, so inverted lists are
    balanced instead of inheriting whatever the first
    ``n_centroids`` rows looked like. Deterministic for a fixed seed
    within Spark, but NOT reproducible in a SQL oracle — IVF queries
    built on these centroids get the weaker rows-only gate, with
    recall gated by tests/test_ann_quality.py instead. Same
    (cid, centv, centn) schema as :func:`seed_centroids`, so every
    downstream assignment/probe plan is unchanged.

    ``train_fraction`` is the 100 TB training dial: a quantizer needs
    a representative sample, not the corpus — FAISS-style practice is
    ~100–1000 training points per centroid, so at a billion vectors
    fitting on the full corpus wastes every Lloyd round on data that
    can't move the centroids. The sample is the engine's standard
    deterministic hash threshold (operators/sampling.py idiom:
    md5(id) prefix < threshold — reproducible under corpus growth, no
    RNG), so the trained quantizer is stable for a fixed corpus;
    assignment/search still covers ALL vectors. Recall under sampled
    training is gated in tests/test_ann_quality.py."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if not 0.0 < train_fraction <= 1.0:
        raise ValueError(f"train_fraction must be in (0, 1], got {train_fraction}")
    train = corpus
    if train_fraction < 1.0:
        from syncflux_spark.operators.sampling import deterministic_sample

        train = deterministic_sample(
            corpus, train_fraction, id_col=id_col, salt="pq-train"
        )
    feats = train.select(array_to_vector(as_double(vec_col)).alias("features"))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode="k-means||"
    ).fit(feats)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cents = spark.createDataFrame(rows, "cid int, centv array<double>")
    return cents.select("cid", "centv", norm("centv").alias("centn"))


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every corpus vector to its
    nearest centroid by cosine (ties → lowest centroid id). Returns
    (id, vector, norm, cluster_id, cosine-to-centroid).

    ``centroids`` accepts any (cid, centv, centn) table —
    :func:`seed_centroids` (default: oracle-reproducible) or
    :func:`kmeans_centroids` (production) — the assignment plumbing is
    identical either way. The centroid table broadcasts (it is tiny
    by construction), so assignment is a map-only pass over the
    corpus: no shuffle."""
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(corpus, n_centroids, id_col, vec_col)
    )
    # spread first: the n×k dot stage is small-bytes big-CPU and the
    # broadcast crossJoin preserves input partitioning (the max_by
    # combine relies on that) — on a few-partition parquet scan the
    # whole assignment would otherwise run on those few cores
    rows = spread_for_cpu(corpus).select(
        F.col(id_col),
        as_double(vec_col).alias("_v"),
        norm(vec_col).alias("_n"),
    )
    scored = rows.crossJoin(F.broadcast(cents)).select(
        id_col,
        "_v",
        "_n",
        "cid",
        (dot("_v", "centv", dim) / (F.col("_n") * F.col("centn"))).alias("_cs"),
    )
    # argmax as a PARTIAL-AGG max_by, not a window: the window form
    # shuffled all n×k scored rows — each dragging the full vector
    # payload — through a per-id sort (measured ~20 GB of exchange at
    # 200k vectors × 196 auto centroids, SCALE.md r11); max_by
    # combines map-side (the broadcast crossJoin preserves corpus
    # partitioning, so every id's k candidates are combined locally)
    # and the exchange carries exactly n rows. Tie-break identical to
    # the old ORDER BY _cs DESC, cid ASC: max over (_cs, -cid).
    # _v/_n are constant within an id group, so any-value is exact.
    pick = F.max_by(
        F.struct(F.col("cid"), F.col("_cs")),
        F.struct(F.col("_cs").alias("s"), (-F.col("cid")).alias("t")),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            pick.alias("_b"),
            F.first("_v").alias("_v"),
            F.first("_n").alias("_n"),
        )
        .select(
            id_col,
            "_v",
            "_n",
            F.col("_b.cid").alias("cid"),
            F.col("_b._cs").alias("_cs"),
        )
    )


def ivf_assign_twolevel(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_coarse: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """HIERARCHICAL (two-level) IVF coarse quantization — the
    >67M-vector regime's assignment path (VERDICT r11 #3): flat
    :func:`ivf_assign` costs n×k dots, and with auto-k capped at
    65536 that is the first ANN ceiling a 100 TB corpus hits. Here a
    vector pays O(n_coarse + k/n_coarse) dots — ~2√k at the default
    ``n_coarse = ceil(√k)`` — by routing through a COARSE level:

    1. the √k coarse centroids are a deterministic subset of the fine
       table (the √k lowest cids — oracle-replayable; a production
       deployment passes kmeans tables for both levels);
    2. each FINE centroid maps to its nearest coarse centroid (k×√k
       dots, broadcast, once);
    3. each vector finds its nearest COARSE centroid (n×√k dots),
       then its nearest FINE centroid WITHIN that coarse group
       (n×(k/√k) expected dots).

    Both argmaxes are the same map-side-combined ``max_by`` as flat
    assignment (r11) — the exchanges carry n rows, never n×k — and
    both broadcasts are O(√k)/O(k) centroid rows, so the 65536-
    centroid broadcast stays but the per-vector dot count drops
    ~k/(2√k)-fold (256: 16× fewer; 65536: 128×).

    APPROXIMATE by design, like every hierarchical quantizer: a
    vector whose true nearest fine centroid lives under a different
    coarse group is routed elsewhere (same trade FAISS IMI / two-
    level IVF makes). Tie-breaks match flat assignment at both
    levels (highest cosine, then lowest id). Output schema is
    identical to :func:`ivf_assign`: (id, _v, _n, cid, _cs)."""
    import math

    from pyspark.sql import Window

    cents = (
        centroids
        if centroids is not None
        else seed_centroids(corpus, n_centroids, id_col, vec_col)
    )
    if n_coarse is None:
        k = cents.count() if centroids is not None else n_centroids
        n_coarse = max(1, math.ceil(math.sqrt(k)))
    # level-0 table: the n_coarse lowest fine cids (deterministic for
    # any centroid table; the window runs over k tiny rows)
    wc = Window.orderBy("cid")
    coarse = (
        cents.withColumn("_rn", F.row_number().over(wc))
        .where(F.col("_rn") <= n_coarse)
        .select(
            F.col("cid").alias("gid"),
            F.col("centv").alias("gv"),
            F.col("centn").alias("gn"),
        )
    )
    # fine → coarse map (k×√k dots, once)
    pick_g = F.max_by(
        F.col("gid"),
        F.struct(F.col("_gs").alias("s"), (-F.col("gid")).alias("t")),
    )
    cmap = (
        cents.crossJoin(F.broadcast(coarse))
        .select(
            "cid",
            "gid",
            (dot("centv", "gv", dim) / (F.col("centn") * F.col("gn"))).alias(
                "_gs"
            ),
        )
        .groupBy("cid")
        .agg(pick_g.alias("gid"))
    )
    fine_tagged = cents.join(F.broadcast(cmap), "cid")
    # spread: same small-bytes big-CPU rationale as ivf_assign
    rows = spread_for_cpu(corpus).select(
        F.col(id_col),
        as_double(vec_col).alias("_v"),
        norm(vec_col).alias("_n"),
    )
    # vector → coarse (n×√k dots, max_by partial agg: exchange = n rows)
    vg = (
        rows.crossJoin(F.broadcast(coarse))
        .select(
            id_col,
            "_v",
            "_n",
            "gid",
            (dot("_v", "gv", dim) / (F.col("_n") * F.col("gn"))).alias("_gs"),
        )
        .groupBy(id_col)
        .agg(
            pick_g.alias("gid"),
            F.first("_v").alias("_v"),
            F.first("_n").alias("_n"),
        )
    )
    # vector → fine within its coarse group (n×(k/√k) expected dots)
    pick_c = F.max_by(
        F.struct(F.col("cid"), F.col("_cs")),
        F.struct(F.col("_cs").alias("s"), (-F.col("cid")).alias("t")),
    )
    return (
        vg.join(F.broadcast(fine_tagged), "gid")
        .select(
            id_col,
            "_v",
            "_n",
            "cid",
            (dot("_v", "centv", dim) / (F.col("_n") * F.col("centn"))).alias(
                "_cs"
            ),
        )
        .groupBy(id_col)
        .agg(
            pick_c.alias("_b"),
            F.first("_v").alias("_v"),
            F.first("_n").alias("_n"),
        )
        .select(
            id_col,
            "_v",
            "_n",
            F.col("_b.cid").alias("cid"),
            F.col("_b._cs").alias("_cs"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: DataFrame | None = None,
    assign_levels: int = 1,
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``nprobe`` nearest
    centroids and scans only those inverted lists. Candidate work
    drops ~nprobe/n_centroids vs brute force; the candidate join
    shuffles on cluster id, which is the scale axis (raise
    n_centroids to shrink lists and widen parallelism; at 100 TB,
    n_centroids ~ sqrt(N) per the FAISS IVF rule of thumb, built with
    :func:`kmeans_centroids` and passed via ``centroids``).
    Output: (query_id, neighbor_id, cos_sim, rank) like
    :func:`brute_force_topk` — recall < 1 by design.

    ``assign_levels=2`` routes corpus assignment through
    :func:`ivf_assign_twolevel` (O(2√k) dots per vector instead of
    O(k)) — the >67M-vector path; probes stay flat over the fine
    centroid table (queries are the small side)."""
    if assign_levels not in (1, 2):
        raise ValueError(
            f"assign_levels must be 1 or 2, got {assign_levels}"
        )
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(corpus, n_centroids, id_col, vec_col)
    )
    if assign_levels == 2:
        assigned = ivf_assign_twolevel(
            corpus, n_centroids, None, id_col, vec_col, dim, cents
        )
    else:
        assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, dim, cents)
    from pyspark.sql import Window

    pw = Window.partitionBy("query_id").orderBy(F.desc("_cs"), F.asc("cid"))
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(vec_col).alias("qv"),
            norm(vec_col).alias("qn"),
        )
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "qn",
            "cid",
            (dot("qv", "centv", dim) / (F.col("qn") * F.col("centn"))).alias("_cs"),
        )
        .withColumn("_rn", F.row_number().over(pw))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", "cid")
    )
    cand = probes.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("_v").alias("cv"),
            F.col("_n").alias("cn"),
            "cid",
        ),
        "cid",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select("query_id", "neighbor_id", _pair_cos(dim))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def auto_planes(n_rows: int, target_bucket_size: int = 1024) -> int:
    """Plane count sized to the corpus: 2^planes buckets so the
    *expected* bucket holds ~``target_bucket_size`` vectors. A fixed
    plane count is the classic LSH scale trap — 6 planes = 64 buckets
    means per-bucket |bucket|² work grows as (N/64)², so the
    "cross product never materializes" claim only holds if planes
    grow as log2(N). Capped at 24 (16M buckets) — beyond that,
    bucket-count overhead dominates and n_tables is the better dial."""
    import math

    if n_rows <= target_bucket_size:
        return 0  # one bucket == exact all-pairs; fine at this size
    return min(24, math.ceil(math.log2(n_rows / target_bucket_size)))


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
    target_bucket_size: int = 1024,
    bucket_cap: int | None | str = "auto",
    auto_floor: int | None = None,
    auto_ceiling: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection over the whole corpus:
    sign-LSH bucket (2^n_planes buckets) → same-bucket self-join →
    exact cosine ≥ threshold. The self-join shuffles on the bucket id
    only; per-bucket work is |bucket|² — n_planes trades recall
    (Charikar: P[same bucket] = (1 - θ/π)^n_planes) against bucket
    size. Candidates never leave the bucket, so at 100 TB the cross
    product never materializes — PROVIDED planes scale with the
    corpus, which is why ``n_planes=None`` (the default) sizes them
    from a cheap corpus count via :func:`auto_planes` instead of
    trusting a fixed dial.

    Recall lost to higher plane counts is bought back with
    ``n_tables`` independent plane sets (same multi-table banding as
    :func:`lsh_topk`): a pair is a candidate if it shares a bucket in
    ANY table — P = 1-(1-p)^T — and each extra table adds one struct
    to a per-row array, not a second corpus scan; pairs matching in
    several tables are deduplicated before the (expensive) exact
    cosine so each is scored once.

    The tagged projection is eager-persisted: both self-join sides
    scan it, and the bucket bitmap costs n_planes×dim multiply-adds
    per row — recomputing it on the second side measured 2.6s → 2.1s
    at sf0.1 (unlike the text-shingle case in operators/dedup.py,
    where caching the much wider array column lost).

    ``bucket_cap`` is the embedding flavor of the hot-bucket
    star-collapse dial (operators/dedup.py, SCALE.md r10): plane
    count sizes buckets only under the UNIFORM-hashing assumption,
    and real embedding corpora are clustered — a tight cluster shares
    signs on every hyperplane, so one bucket holds the whole cluster
    at ANY plane count (measured: the registered 16-bucket query on
    60k clustered vectors built ~112M candidate pairs, each dragging
    two dim-double arrays into the shuffle, and spilled past the
    machine's disk). Buckets above the cap emit (bucket-min, member)
    star candidates — O(c) — instead of the O(c²) clique; every
    candidate still faces the exact-cosine ≥ threshold verify, so a
    star edge failing it can split a hot cluster (recall trade
    confined to over-cap buckets; connectivity of what survives is
    the downstream components' concern, same as the text dial).

    The DEFAULT is ``bucket_cap="auto"`` (r11): the cap is resolved
    from the (tbl, bucket) census as ``clamp(p99 bucket count,
    auto_floor, auto_ceiling)`` — floor defaults to the shared
    AUTO_CAP_FLOOR (64), ceiling to ``2 × target_bucket_size``
    (buckets more than twice the size the plane count TARGETS are by
    definition hashing failures: under uniform hashing a bucket sits
    within ~√target of target, so 2× headroom only ever collapses
    cluster-degenerate buckets). When no bucket exceeds the resolved
    cap, the exact uncapped plan is returned bit-for-bit. ``None``
    opts out (pre-r11 behavior); an int pins the cap.

    Hot-set size bound (the broadcast premise): each hot bucket
    contributes one min row carrying a dim-double payload (~8·dim
    bytes), so the mins broadcast holds while hot buckets ≲ a few
    hundred thousand. In auto mode the operator KNOWS the hot count
    from the census histogram and falls back to shuffle joins past
    200k hot buckets; with a MANUAL ``bucket_cap`` the caller owns
    that bound — keep ``bucket_cap`` high enough that the expected
    over-cap bucket count stays well under ~200k (for a corpus of n
    vectors, cap ≳ n / 10⁶ · target_bucket_size is a practical
    floor), or use "auto".

    SCORE-IN-BUCKET, DEDUP SLIM (r12): the bucket self-join already
    CO-LOCATES both payloads (one corpus-sized exchange, reused for
    both sides), so each candidate is exact-scored immediately after
    the join — map-side, no extra shuffle — and the threshold filter
    runs BEFORE ``dropDuplicates``. The dedup exchange therefore
    moves 24-byte (id_a, id_b, cos) rows, never vector payloads. The
    r11 shape deduplicated FIRST and scored after, which shipped both
    vectors on every candidate row through the dedup exchange and its
    sort (98M pairs × ~1 KB at x100 — the measured alpha-1.4
    residual, SCALE.md r11); an intermediate r12 design carried ids
    only and joined payloads back post-dedup, but that re-shuffles
    the corpus payload per join side AND still moves one pair-mass
    payload exchange — scoring where the bucket join already put
    both vectors does neither. The trade: a pair colliding in
    several tables is scored once per collision instead of once —
    d multiply-adds per extra collision, bytes-free, the right side
    of the CPU-vs-shuffle ledger at any scale. Values are identical
    by construction: the score is a pure per-pair function, so
    filter∘dedup ≡ dedup∘filter, and duplicate collisions score
    bit-identically."""
    from syncflux_spark.operators.dedup import (
        AUTO_CAP_FLOOR,
        _validate_bucket_cap,
        resolve_auto_cap,
    )
    from syncflux_spark.utils import eager_persist

    _validate_bucket_cap(bucket_cap)
    if n_planes is None:
        n_planes = auto_planes(corpus.count(), target_bucket_size)
    if n_planes == 0:
        n_tables = 1  # all tables would be the same single bucket
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                sign_lsh_bucket(vec_col, n_planes, dim, t * n_planes).alias("bk"),
            )
            for t in range(n_tables)
        ]
    )
    # spread: the bucket bitmap is n_planes×dim multiply-adds per row
    # (small-bytes big-CPU) — see utils.spread_for_cpu; no-op on wide
    # input
    tagged = spread_for_cpu(corpus).select(
        F.col(id_col),
        as_double(vec_col).alias("v"),
        norm(vec_col).alias("n"),
        F.explode(tables).alias("tb"),
    ).select(F.col(id_col), "v", "n", "tb.tbl", "tb.bk")
    if bucket_cap == "auto":
        # the census collect below is the first action over the
        # cached frame — it materializes the persist, so auto mode
        # pays one job where the eager count used to be (not one
        # more on top)
        tagged = tagged.persist()
    else:
        tagged = eager_persist(tagged)
    hot_is_small = True
    if bucket_cap == "auto":
        floor = AUTO_CAP_FLOOR if auto_floor is None else auto_floor
        # derived ceiling never undercuts the floor: at
        # target_bucket_size < floor/2 a bare 2×target would make
        # resolve_auto_cap raise about parameters the caller never
        # passed (ADVICE r11); clamping collapses the auto band to
        # [floor, floor] there, i.e. cap = floor — still a valid
        # survival bound, and tiny targets already imply tiny buckets
        ceiling = (
            max(floor, 2 * target_bucket_size)
            if auto_ceiling is None
            else auto_ceiling
        )
        hist = [
            (int(r["_c"]), int(r["_f"]))
            for r in tagged.groupBy("tbl", "bk")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("_c")
            .agg(F.count(F.lit(1)).alias("_f"))
            .collect()
        ]
        cap = resolve_auto_cap(hist, floor, ceiling)
        max_c = max((c for c, _ in hist), default=0)
        if max_c > cap:
            bucket_cap = cap
            # the census is already on the driver: bound the hot-set
            # broadcast by COUNT, not hope (ADVICE r10) — past
            # HOT_BROADCAST_MAX hot buckets the mins frame (8·dim B
            # each) outgrows a sane broadcast and the joins fall
            # back to shuffles
            from syncflux_spark.operators.dedup import HOT_BROADCAST_MAX

            n_hot = sum(f for c, f in hist if c > cap)
            hot_is_small = n_hot <= HOT_BROADCAST_MAX
        else:
            bucket_cap = None
    # score-in-bucket (r12): the bucket join co-locates both payloads
    # already — score each candidate map-side right after the join and
    # filter by threshold BEFORE the pair-dedup, so the dedup exchange
    # carries 24-byte (id_a, id_b, cos) rows, never vectors
    cos = (dot("va", "vb", dim) / (F.col("na") * F.col("nb"))).alias(
        "cos_sim"
    )
    join_src = tagged
    star_scored = None
    if bucket_cap is not None:
        # hot set = one map-side-combined count, broadcast back (few
        # by definition; in auto mode the census PROVED it small, else
        # the shuffle fallback above); only the hot-bucket MINS frame
        # carries a vector payload (8·dim B per hot bucket)
        maybe_bcast = F.broadcast if hot_is_small else (lambda df: df)
        hot = maybe_bcast(
            tagged.groupBy("tbl", "bk")
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.min(id_col).alias("_m"),
            )
            .where(F.col("_c") > bucket_cap)
        )
        join_src = tagged.join(hot, ["tbl", "bk"], "left_anti")
        # one row per hot bucket: its min id + that vector's payload
        mins = (
            tagged.alias("t")
            .join(
                maybe_bcast(hot.alias("h")),
                (F.col("t.tbl") == F.col("h.tbl"))
                & (F.col("t.bk") == F.col("h.bk"))
                & (F.col(f"t.{id_col}") == F.col("h._m")),
            )
            .select(
                F.col("t.tbl").alias("_htbl"),
                F.col("t.bk").alias("_hbk"),
                F.col(f"t.{id_col}").alias("_min_id"),
                F.col("t.v").alias("va"),
                F.col("t.n").alias("na"),
            )
        )
        star_scored = (
            tagged.join(
                maybe_bcast(mins),
                (F.col("tbl") == F.col("_htbl"))
                & (F.col("bk") == F.col("_hbk"))
                & (F.col(id_col) > F.col("_min_id")),
            )
            .select(
                F.col("_min_id").alias("id_a"),
                F.col(id_col).alias("id_b"),
                "va",
                "na",
                F.col("v").alias("vb"),
                F.col("n").alias("nb"),
            )
            .select("id_a", "id_b", cos)
        )
    a, c = join_src.alias("a"), join_src.alias("b")
    scored = (
        a.join(
            c,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("a.n").alias("na"),
            F.col("b.v").alias("vb"),
            F.col("b.n").alias("nb"),
        )
        .select("id_a", "id_b", cos)
    )
    if star_scored is not None:
        scored = scored.unionByName(star_scored)
    # threshold BEFORE dedup: score is a pure per-pair function, so
    # every duplicate collision scores bit-identically and the filter
    # commutes with dropDuplicates — only survivors pay the exchange
    return scored.where(F.col("cos_sim") >= threshold).dropDuplicates(
        ["id_a", "id_b"]
    )


def embedding_norms(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector L2 norm + dimension — the sanity/statistics scan."""
    return df.select(
        F.col(id_col),
        F.size(vec_col).alias("dim"),
        norm(vec_col).alias("l2_norm"),
        dot(vec_col, vec_col).alias("sq_norm"),
    )


def top_eigenvector(
    df,
    vec_col: str = "embedding",
    n_iter: int = 10,
):
    """Matrix-free power iteration for the top principal direction of
    the (uncentered) second-moment matrix M = Σ x xᵀ / n — the first
    step of PCA / spectral denoising at corpus scale.

    The d×d matrix is NEVER materialized: each iteration computes
    M·v = Σ x (x·v) / n as one distributed pass — broadcast v (d
    doubles), a codegen dot per row, a per-row scalar-vector scale,
    and an element-wise array SUM aggregate — then normalizes on the
    driver (d-sized work). Cost is n_iter scans of n×d; state shipped
    per iteration is d doubles each way. This is how power iteration /
    Lanczos runs on a 1000-executor cluster: the data never moves, the
    d-vector does.

    Deterministic: fixed all-ones/√d init and a fixed iteration count
    (convergence is the test's job, not the operator's); float sums
    across rows are accumulation-order-dependent, so this operator is
    registered rows-only (no bitwise oracle) and its numerics are
    gated against numpy eigendecomposition in tests/test_ann_quality.py.

    Returns a 1-row DataFrame: (n_iter, dim, eigenvalue, eigenvector).
    """
    import math

    from pyspark.sql import functions as F

    from syncflux_spark.functions.vectors import as_double

    spark = df.sparkSession
    x = df.select(as_double(vec_col).alias("x"))
    n = x.count()
    dim = len(x.first()["x"])
    v = [1.0 / math.sqrt(dim)] * dim
    eigenvalue = 0.0
    for _ in range(n_iter):
        vlit = F.array(*[F.lit(c) for c in v])
        dotv = F.aggregate(
            F.zip_with("x", vlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        contrib = x.select(F.transform("x", lambda c: c * dotv).alias("cx"))
        summed = contrib.agg(
            F.array(
                *[F.sum(F.element_at("cx", i + 1)) for i in range(dim)]
            ).alias("mv")
        ).collect()[0]["mv"]
        mv = [c / n for c in summed]
        eigenvalue = math.sqrt(sum(c * c for c in mv))
        v = [c / eigenvalue for c in mv] if eigenvalue > 0 else v
    return spark.createDataFrame(
        [(n_iter, dim, float(eigenvalue), [float(c) for c in v])],
        "n_iter int, dim int, eigenvalue double, eigenvector array<double>",
    )


def _round_half_away(x: float) -> int:
    """round() with ties away from zero — the rule Spark's
    ``F.round`` (BigDecimal HALF_UP) and DuckDB's ``ROUND`` share.
    Python's builtin rounds half-to-even, so driver-side arithmetic
    that must replay bit-for-bit in SQL goes through this instead."""
    import math

    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def top_eigenvector_fixedpoint(
    df,
    vec_col: str = "embedding",
    n_iter: int = 10,
):
    """Power iteration with ORDER-FREE cross-row accumulation — the
    oracle-hashable variant of :func:`top_eigenvector`.

    The float version's M·v pass sums doubles across rows, so its
    last ulps depend on partition order. Here every cross-row sum is
    an integer sum of per-row rounded micros, making the whole
    10-round recurrence deterministic and replayable in SQL:

    * per row: ``dot_micro = Σ_d round(x_d · v_d · 1e6)`` — the
      per-term rounding moves the float work inside the row, the
      cross-dim sum is int64;
    * per dimension: ``mv_micro_d = Σ_rows round(x_d · dot_micro)``
      — int64 sum over rows, order-free;
    * driver (d-sized): ``mv_d = mv_micro_d / 1e6 / n``; the norm
      accumulates ``round(mv_d² · 1e12)`` in int64 before one sqrt;
      ``v_d = mv_d / λ``.

    Same distributed shape as the float version (broadcast d-vector
    down, one partial-agg of d int64 sums up, n_iter scans), same
    convergence up to the 1e-6 quantization. Returns d scalar rows
    ``(dim_idx, component_micro, eigenvalue_micro, n_iter, dim)`` —
    no array columns, so the result canonicalizes through any
    row-hash gate (VERDICT r5: top-level arrays crash the driver's
    pandas sort).

    The per-round v travels as a broadcast ONE-ROW frame rather than
    64 literals: literals bake into the generated code, so every
    iteration would be a fresh whole-stage-codegen compile (~3s × 10
    rounds of pure JIT, measured); with v as data the plan text is
    identical each round and Spark's generated-class cache compiles
    once. The input projection is persisted across rounds."""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from syncflux_spark.functions.vectors import as_double

    spark = df.sparkSession
    x = df.select(as_double(vec_col).alias("x")).persist()
    try:
        n = x.count()
        dim = len(x.first()["x"])
        v = [1.0 / math.sqrt(dim)] * dim
        lam = 0.0
        vschema = T.StructType(
            [T.StructField("varr", T.ArrayType(T.DoubleType()))]
        )
        dotm = F.aggregate(
            F.zip_with(
                "x",
                "varr",
                lambda a, b: F.round(a * b * 1000000.0).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        )
        # dotm is hoisted into its OWN projection before the transform
        # that consumes it: nested inside the lambda it would re-run
        # the whole zip_with fold per output element (64× per row,
        # each allocating the zipped array — measured 4s/round vs
        # 0.8s hoisted)
        cx = F.transform(
            "x", lambda c: F.round(c * F.col("dotm")).cast("long")
        )
        for _ in range(n_iter):
            vdf = spark.createDataFrame([([float(c) for c in v],)], vschema)
            # posexplode + d-key partial agg instead of d aggregate
            # columns: same shuffle bytes (map-side combine reduces
            # both to d values per partition), but a plan the analyzer
            # and codegen handle in milliseconds rather than seconds
            rows = (
                x.crossJoin(F.broadcast(vdf))
                .select("x", dotm.alias("dotm"))
                .select(F.posexplode(cx).alias("d", "c"))
                .groupBy("d")
                .agg(F.sum("c").alias("mvm"))
                .collect()
            )
            mvm = [0] * dim
            for r in rows:
                mvm[r["d"]] = r["mvm"]
            # the oracle replays CAST(mvm AS DOUBLE)/1e6/n — identical
            # to Python int/float division only while the int64 fits a
            # double exactly; past 2^53 the gate would mismatch with a
            # confusing hash error, so fail loudly at the source
            # instead (unit-norm v keeps dot_micro ≤ ~8e6·√d per row,
            # so this bound holds far beyond the supported SFs)
            if any(abs(m) >= 2**53 for m in mvm):
                raise OverflowError(
                    "power-iteration micros exceed 2^53; the SQL oracle's"
                    " int->double cast would no longer be exact"
                )
            mvd = [m / 1000000.0 / n for m in mvm]
            s = sum(_round_half_away(c * c * 1000000000000.0) for c in mvd)
            lam = math.sqrt(s / 1000000000000.0)
            v = [c / lam for c in mvd] if lam > 0 else v
    finally:
        x.unpersist()
    ev_micro = _round_half_away(lam * 1000000.0)
    return spark.createDataFrame(
        [
            (i + 1, _round_half_away(c * 1000000.0), ev_micro, n_iter, dim)
            for i, c in enumerate(v)
        ],
        "dim_idx int, component_micro bigint, eigenvalue_micro bigint,"
        " n_iter int, dim int",
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_offset: int = 50_000,
) -> DataFrame:
    """Johnson-Lindenstrauss-style dimensionality reduction: project
    each embedding onto ``out_dim`` deterministic md5-derived random
    directions (the same generator as the sign-LSH planes, disjoint
    offset range). 64→16 dims cuts the ANN working set 4× while
    approximately preserving pairwise distances — the standard
    pre-reduction before brute-force rescoring or IVF at 100 TB.
    Narrow per-row codegen arithmetic: out_dim dot products, no
    shuffle, no UDF; any engine regenerates identical planes.

    The dot runs in FIXED-POINT int64 (vector and plane components
    quantized to micros, one divide at the end): a float dot's value
    depends on accumulation order, and engines don't agree on one —
    DuckDB reassociates long ``+`` chains and its list_dot_product
    uses SIMD partials, so no float formulation is portable. The
    2e-7 quantization error is far below JL distortion at these
    dims; determinism is what the correctness gate (and reproducible
    pipelines) need."""
    v_q = F.transform(
        as_double(vec_col),
        lambda x: F.floor(x * F.lit(1_000_000) + F.lit(0.5)).cast("long"),
    )
    cols = [F.col(id_col)]
    for j in range(out_dim):
        w_q = F.array(
            *[
                F.lit(round(_hyperplane(plane_offset + j, d) * 1_000_000))
                for d in range(dim)
            ]
        )
        dp = F.aggregate(
            F.zip_with(v_q, w_q, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        cols.append((dp / F.lit(1e12)).alias(f"p{j}"))
    return df.select(*cols)


def micros_vec(vec_col: str) -> F.Column:
    """array<double> → array<long> fixed-point micros with the
    engine's portable floor(x·1e6 + 0.5) rounding — the
    representation every exact-integer vector op in this module
    shares."""
    return F.transform(
        as_double(vec_col),
        lambda x: F.floor(x * F.lit(1_000_000.0) + F.lit(0.5)).cast("long"),
    )


def pq_codebook(
    corpus: DataFrame,
    n_sub: int = 8,
    sub_dim: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebook: per subspace m, the codewords
    are the m-th subvectors of the first ``k_codes`` corpus vectors
    (the same deterministic seed policy as seed_centroids — swap in
    per-subspace k-means for production, plumbing unchanged).
    Subvectors are exact integer micros. Schema: (m, code, cw)."""
    structs = [
        F.struct(
            F.lit(m).alias("m"),
            F.slice(F.col("_vm"), m * sub_dim + 1, sub_dim).alias("cw"),
        )
        for m in range(n_sub)
    ]
    return (
        corpus.where(F.col(id_col) < k_codes)
        .select(F.col(id_col).alias("code"), micros_vec(vec_col).alias("_vm"))
        .select("code", F.explode(F.array(*structs)).alias("s"))
        .select(F.col("s.m").alias("m"), "code", F.col("s.cw").alias("cw"))
    )


def _sq_l2(a, b) -> F.Column:
    """Exact integer squared L2 between two micros subvectors: the
    zip_with products stay ≤ ~1.6e13 per dim, summed by an integer
    fold — commutative, so no ordering discipline is needed."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    n_sub: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding: each vector → ``n_sub`` small codes, the nearest
    codeword per subspace by exact integer squared-L2 (ties → lowest
    code). 64 dims × 8 bytes collapse to 8 codes — the 64×
    compression that lets a 100 TB vector corpus live in RAM-scale
    storage for ADC scans. Map-only: the codebook broadcasts, the
    argmin is a per-(vector, subspace) window over k_codes rows.
    Output: (id, m, code), one row per subspace."""
    from pyspark.sql import Window

    structs = [
        F.struct(
            F.lit(m).alias("m"),
            F.slice(F.col("_vm"), m * sub_dim + 1, sub_dim).alias("subv"),
        )
        for m in range(n_sub)
    ]
    sub = (
        corpus.select(F.col(id_col), micros_vec(vec_col).alias("_vm"))
        .select(id_col, F.explode(F.array(*structs)).alias("s"))
        .select(id_col, F.col("s.m").alias("m"), F.col("s.subv").alias("subv"))
    )
    scored = sub.join(F.broadcast(codebook), "m").select(
        id_col, "m", "code", _sq_l2(F.col("subv"), F.col("cw")).alias("d")
    )
    w = Window.partitionBy(id_col, "m").orderBy("d", "code")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "m", "code")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 8,
    sub_dim: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance computation (ADC,
    Jégou et al. '11): the query stays UNquantized; per subspace a
    query×codeword distance table (|queries|·n_sub·k_codes rows —
    metadata-sized) broadcasts onto the code table, and a vector's
    approximate distance is the SUM of its 8 looked-up entries —
    integer addition, so partial aggregation collapses map-side and
    the shuffle carries one compact row per (query, vector). Exact
    integer µ² distances end-to-end: encoding, tables, and ranking
    are bit-identical in any engine (the property that lets the
    oracle check an ANN index build). Compose with
    brute_force_topk over the PQ top-R for the rescored production
    pipeline. Output: (query_id, neighbor_id, approx_d_micro2,
    rank)."""
    from pyspark.sql import Window

    cb = pq_codebook(corpus, n_sub, sub_dim, k_codes, id_col, vec_col)
    codes = pq_encode(corpus, cb, n_sub, sub_dim, id_col, vec_col)
    structs = [
        F.struct(
            F.lit(m).alias("m"),
            F.slice(F.col("_vm"), m * sub_dim + 1, sub_dim).alias("subv"),
        )
        for m in range(n_sub)
    ]
    qsub = (
        queries.select(F.col(id_col).alias("query_id"), micros_vec(vec_col).alias("_vm"))
        .select("query_id", F.explode(F.array(*structs)).alias("s"))
        .select(
            "query_id", F.col("s.m").alias("m"), F.col("s.subv").alias("subv")
        )
    )
    qtable = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "m", "code", _sq_l2(F.col("subv"), F.col("cw")).alias("qd")
    )
    contrib = codes.join(
        F.broadcast(qtable), ["m", "code"]
    ).where(F.col("query_id") != F.col(id_col))
    scored = contrib.groupBy("query_id", id_col).agg(
        F.sum("qd").alias("approx_d_micro2")
    )
    w = Window.partitionBy("query_id").orderBy("approx_d_micro2", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "approx_d_micro2",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_rescored_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    n_sub: int = 8,
    sub_dim: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production PQ pipeline: ADC shortlist of ``shortlist``
    candidates per query (compressed-domain scan), then EXACT
    integer-micros L2 over the full vectors for just those
    |queries|·shortlist pairs, re-ranked to top-k. Measured on the
    sf0.01 fixture: raw ADC recall@5 0.16 → 0.72 rescored at R=50 —
    rescoring is where PQ recall comes from on weakly-clustered data,
    at the cost of fetching R full vectors per query (a semi-join
    against the corpus, tiny next to the compressed scan). Still
    bit-exact end-to-end, so the full two-stage retrieval is
    oracle-gated."""
    from pyspark.sql import Window

    short = pq_topk(
        corpus, queries, shortlist, n_sub, sub_dim, k_codes, id_col, vec_col
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), micros_vec(vec_col).alias("_nvm")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), micros_vec(vec_col).alias("_qvm")
    )
    rescored = (
        short.select("query_id", "neighbor_id")
        .join(nv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _sq_l2(F.col("_qvm"), F.col("_nvm")).alias("d_micro2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d_micro2", "neighbor_id")
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "d_micro2",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    n_sub: int = 8,
    sub_dim: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-style IVFPQ (Jégou et al. '11, §IV): the IVF coarse
    quantizer prunes WHICH inverted lists a query scans
    (~nprobe/n_centroids of the corpus), PQ codes over the RESIDUAL
    (vector − assigned centroid) make the scanned lists ~64× smaller,
    and asymmetric distance computation scores candidates without
    ever decompressing them — the composition that serves
    billion-vector ANN from RAM-scale storage. Residual encoding is
    what distinguishes this from running IVF and PQ side by side: the
    codebook models the (much tighter) within-cell distribution.

    Exact integer µ² arithmetic end-to-end (micros vectors, integer
    residuals, integer codeword distances), so assignment, encoding,
    probe tables, and the final ranking are bit-identical across
    engines — an oracle-checkable ANN *index build*, not just a
    recall statistic. Deterministic seed policy: centroids = first
    ``n_centroids`` corpus vectors, residual codewords = residual
    subvectors of the first ``k_codes`` vectors (swap k-means in via
    the same plumbing for production).

    Plan shape at scale: centroid + codebook tables broadcast
    (metadata-sized); corpus assignment and encoding are map-side
    argmins; the ADC join keys on (cid, m, code) against the
    broadcast query tables, and its integer sum partially aggregates
    map-side, so the one shuffle carries a compact (query, vector)
    row per candidate — candidates only from probed cells.
    Output: (query_id, neighbor_id, approx_d_micro2, rank)."""
    from pyspark.sql import Window

    vm = corpus.select(F.col(id_col), micros_vec(vec_col).alias("vm"))
    cents = vm.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col("vm").alias("centv")
    )
    # coarse assignment: exact integer L2 over the full dim
    a0 = vm.crossJoin(F.broadcast(cents)).select(
        id_col, "vm", "cid", _sq_l2(F.col("vm"), F.col("centv")).alias("d")
    )
    wv = Window.partitionBy(id_col).orderBy("d", "cid")
    assigned = (
        a0.withColumn("_rn", F.row_number().over(wv))
        .where(F.col("_rn") == 1)
        .select(id_col, "vm", "cid")
    )
    res = assigned.join(F.broadcast(cents), "cid").select(
        id_col,
        "cid",
        F.zip_with("vm", "centv", lambda x, y: x - y).alias("rm"),
    )
    structs = [
        F.struct(
            F.lit(m).alias("m"),
            F.slice("rm", m * sub_dim + 1, sub_dim).alias("subv"),
        )
        for m in range(n_sub)
    ]
    rsub = res.select(id_col, "cid", F.explode(F.array(*structs)).alias("s")).select(
        id_col, "cid", F.col("s.m").alias("m"), F.col("s.subv").alias("subv")
    )
    cb = rsub.where(F.col(id_col) < k_codes).select(
        "m", F.col(id_col).alias("code"), F.col("subv").alias("cw")
    )
    enc0 = rsub.join(F.broadcast(cb), "m").select(
        id_col, "cid", "m", "code", _sq_l2(F.col("subv"), F.col("cw")).alias("d")
    )
    we = Window.partitionBy(id_col, "m").orderBy("d", "code")
    codes = (
        enc0.withColumn("_rn", F.row_number().over(we))
        .where(F.col("_rn") == 1)
        .select(id_col, "cid", "m", "code")
    )
    # query side: probe nprobe nearest cells, table the residual
    # distances per probed cell
    qm = queries.select(
        F.col(id_col).alias("query_id"), micros_vec(vec_col).alias("qv")
    )
    q0 = qm.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "cid",
        "centv",
        _sq_l2(F.col("qv"), F.col("centv")).alias("d"),
    )
    wq = Window.partitionBy("query_id").orderBy("d", "cid")
    probes = (
        q0.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= nprobe)
        .select(
            "query_id",
            "cid",
            F.zip_with("qv", "centv", lambda x, y: x - y).alias("qres"),
        )
    )
    qstructs = [
        F.struct(
            F.lit(m).alias("m"),
            F.slice("qres", m * sub_dim + 1, sub_dim).alias("subv"),
        )
        for m in range(n_sub)
    ]
    qsub = probes.select(
        "query_id", "cid", F.explode(F.array(*qstructs)).alias("s")
    ).select(
        "query_id", "cid", F.col("s.m").alias("m"), F.col("s.subv").alias("subv")
    )
    qtable = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "cid", "m", "code",
        _sq_l2(F.col("subv"), F.col("cw")).alias("qd"),
    )
    contrib = codes.join(F.broadcast(qtable), ["cid", "m", "code"]).where(
        F.col("query_id") != F.col(id_col)
    )
    scored = contrib.groupBy("query_id", id_col).agg(
        F.sum("qd").alias("approx_d_micro2")
    )
    wr = Window.partitionBy("query_id").orderBy("approx_d_micro2", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "approx_d_micro2",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cell_representatives(
    corpus: DataFrame,
    n_centroids: int = 16,
    k_per_cell: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Diversity sampling by cluster representatives: assign every
    vector to its nearest centroid, keep the ``k_per_cell`` vectors
    closest to each centroid (ties → lowest id). The cheap
    distributed stand-in for MMR-style diverse selection — coverage
    comes from the cell partition (every region of the embedding
    space sends a delegate), not from an O(n²) pairwise-diversity
    scan, so it runs as one broadcast assignment pass plus one
    bounded per-cell top-k window. The iterative MMR greedy loop is
    inherently sequential (each pick re-scores the rest) and has no
    scalable exact form; cluster delegates are what production
    corpus-subsampling pipelines use instead.

    Output: (cid, id, cos_to_centroid, rank). Deterministic for any
    deterministic centroid table (seed_centroids for the oracle gate,
    kmeans_centroids in production)."""
    from pyspark.sql import Window

    assigned = ivf_assign(
        corpus, n_centroids, id_col, vec_col, dim, centroids
    )
    w = Window.partitionBy("cid").orderBy(F.desc("_cs"), F.asc(id_col))
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_per_cell)
        .select(
            "cid",
            F.col(id_col),
            F.col("_cs").alias("cos_to_centroid"),
            F.col("rank").cast("integer").alias("rank"),
        )
    )


#: semantic_dedup_flags auto-k: hold the expected CELL size constant
#: instead of the cluster count — pair work per cell is c², so a
#: fixed k goes quadratic in the corpus (measured: k=16 read alpha
#: 1.78 on the x10→x30 step, 51 s → 359.6 s — SCALE.md r11) while a
#: fixed cell size keeps total pair mass linear. 1024 matches the
#: sign-LSH kernel's target_bucket_size and the SemDeDup paper's
#: cluster sizing regime. The centroid count is capped so the
#: broadcast (k × dim doubles) and the assignment fan-out stay sane:
#: past ~67M vectors cells grow beyond target again — the documented
#: residual (the next step is hierarchical assignment, not a bigger
#: broadcast).
SEMDEDUP_CELL_SIZE = 1024
SEMDEDUP_MAX_K = 65536


def semdedup_auto_k(
    n_rows: int, target_cell_size: int = SEMDEDUP_CELL_SIZE
) -> int:
    """ceil(n / target) clamped to [1, SEMDEDUP_MAX_K] — integer-exact
    (mirrored by the semantic_dedup_auto oracle as
    (COUNT(*) + target - 1) // target)."""
    if target_cell_size < 1:
        raise ValueError(
            f"target_cell_size must be >= 1, got {target_cell_size}"
        )
    return max(1, min(SEMDEDUP_MAX_K,
                      (n_rows + target_cell_size - 1) // target_cell_size))


def semantic_dedup_flags(
    corpus: DataFrame,
    n_centroids: int | None = None,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: DataFrame | None = None,
    target_cell_size: int = SEMDEDUP_CELL_SIZE,
) -> DataFrame:
    """Semantic deduplication in the SemDeDup shape (Abbas et al.
    2023, arXiv:2303.09540): cluster the embedding space, then look
    for near-duplicate PAIRS only within a cluster — the cluster
    partition is what turns O(n²) pairwise cosine into
    O(Σ cell_size²), the same bounding trick as LSH banding but in
    embedding space.

    A vector is ``dropped`` when some same-cluster vector exceeds
    ``tau`` cosine with it AND ranks before it under the keep rule
    (lower cosine-to-centroid first, id tiebreak) — per the paper,
    the kept representative of a duplicate group is the LOW
    centroid-similarity example (keeping cluster-edge examples
    preserves diversity; the ones nearest the centroid are the most
    redundant). The dominance rule needs no transitive closure, so
    the whole operator is: one broadcast centroid assignment
    (map-only), one within-cluster self-join, one distinct, one
    flag join.

    Output: (id, cid, cos_to_centroid, dropped) for EVERY corpus
    vector — callers filter ``dropped = 0`` for the surviving set or
    aggregate for a dedup-rate report. Deterministic for any
    deterministic centroid table (seed_centroids → oracle gate,
    kmeans_centroids → production).

    ``n_centroids=None`` (the default since r11) sizes k from the
    corpus so the expected CELL stays ~``target_cell_size``: the
    within-cluster join is O(Σ cell²), and a FIXED k makes that
    quadratic in the corpus (measured alpha 1.78 at k=16, SCALE.md
    r11) while a fixed cell size keeps it linear — the SemDeDup paper
    itself scales cluster count with the corpus. One count job pays
    for the derivation; pass an int to pin k (the registered pinned
    gate query), or a ``centroids`` table to skip derivation
    entirely."""
    from syncflux_spark.utils import eager_persist

    if n_centroids is None and centroids is None:
        n_centroids = semdedup_auto_k(corpus.count(), target_cell_size)
    assigned = eager_persist(
        ivf_assign(corpus, n_centroids, id_col, vec_col, dim, centroids)
    )  # scanned three times: both join sides + the flag base
    a = assigned.alias("a")
    b = assigned.alias("b")
    aid, bid = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
    pair_cos = dot("a._v", "b._v", dim) / (F.col("a._n") * F.col("b._n"))
    dominated = (
        a.join(b, (F.col("a.cid") == F.col("b.cid")) & (aid != bid))
        .where(pair_cos >= F.lit(tau))
        .where(
            (F.col("b._cs") < F.col("a._cs"))
            | ((F.col("b._cs") == F.col("a._cs")) & (bid < aid))
        )
        .select(aid.alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return (
        assigned.join(dominated, id_col, "left")
        .select(
            F.col(id_col),
            "cid",
            F.col("_cs").alias("cos_to_centroid"),
            F.coalesce("_dropped", F.lit(0)).cast("integer").alias("dropped"),
        )
    )


def semdedup_cell_census(
    corpus: DataFrame,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: DataFrame | None = None,
    target_cell_size: int = SEMDEDUP_CELL_SIZE,
) -> DataFrame:
    """The SemDeDup PRE-FLIGHT (r12, precedent: dedup.py's LSH bucket
    census): the cell-size histogram of a centroid assignment plus
    each size's within-cell pair mass — the decision input a user
    needs BEFORE pinning a cluster count by hand, because the
    dominance join's cost is Σ cell·(cell−1)/2 and a fixed k goes
    quadratic in the corpus (measured alpha 1.78 at k=16, SCALE.md
    r11; ≥1.25B pair mass at x100 — not runnable). Output one row per
    DISTINCT cell size: (cell_size, n_cells, pair_mass) with
    pair_mass = n_cells · c·(c−1)/2 unordered within-cell pairs.
    Driver/collect footprint anywhere this is consumed is O(distinct
    cell sizes) — scale-free, same shape as the map-side-combined
    count-of-counts the auto bucket cap resolves from.

    ``n_centroids`` semantics match :func:`semantic_dedup_flags`
    (None → auto-k from the corpus count; int → the pinned partition
    being pre-flighted; ``centroids`` table → as given)."""
    if n_centroids is None and centroids is None:
        n_centroids = semdedup_auto_k(corpus.count(), target_cell_size)
    assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, dim, centroids)
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("_c"))
    return (
        sizes.groupBy("_c")
        .agg(F.count(F.lit(1)).alias("n_cells"))
        .select(
            F.col("_c").cast("long").alias("cell_size"),
            F.col("n_cells").cast("long"),
            (
                F.col("n_cells")
                * (F.col("_c") * (F.col("_c") - 1) / F.lit(2)).cast("long")
            ).cast("long").alias("pair_mass"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the top-k most-similar corpus vectors that are NOT known
    positives — the negatives that actually teach the model, vs
    random negatives the embedding already separates.

    ``positives`` carries (query_id, neighbor_id) known-positive
    pairs; they (and self-pairs) are excluded BEFORE ranking, so the
    k slots all land on genuine negatives. Shape: broadcast query
    side + anti-join on the (tiny) positive set + the same per-query
    top-k heap as brute_force_topk; at corpus scale the scored pass
    swaps for the IVF/LSH candidate generators with the identical
    exclusion join. Output: (query_id, neighbor_id, cos_sim, rank)."""
    q = _sides(queries, id_col, vec_col, "q", dim).withColumnsRenamed(
        {"q_id": "query_id"}
    )
    c = _sides(corpus, id_col, vec_col, "c", dim).withColumnsRenamed(
        {"c_id": "neighbor_id"}
    )
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    pos = positives.select("query_id", "neighbor_id")
    pairs = pairs.join(
        F.broadcast(pos), ["query_id", "neighbor_id"], "left_anti"
    )
    scored = pairs.select("query_id", "neighbor_id", _pair_cos(dim))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# -- persisted IVF index ----------------------------------------------------


def ivf_index_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: DataFrame | None = None,
    assign_levels: int = 1,
):
    """Build the IVF index as two PLAIN TABLES to persist: the
    centroid table (cid, centv, centn) and the inverted-file
    assignment table (id, vec, vnorm, cid). This is the
    index-once-query-many pattern a billion-vector deployment needs —
    quantizer training and corpus assignment are paid at ingest, and
    every later search reads the tables instead of re-clustering
    (the ANN analog of dedup.py::build_dedup_index). Partition the
    persisted index by ``cid`` so a probe prunes to nprobe
    directories. Returns (centroids, assignments).

    ``assign_levels=2`` builds the assignment hierarchically
    (:func:`ivf_assign_twolevel`, O(2√k) dots per vector) — the
    explicit dial for the >67M-vector / large-k ingest, where flat
    assignment's n×k dots are the build-time wall. The dial changes
    ROUTING (two-level is approximate), so it is a build-time choice
    recorded by the index's contents, never flipped implicitly."""
    if assign_levels not in (1, 2):
        raise ValueError(
            f"assign_levels must be 1 or 2, got {assign_levels}"
        )
    cents = (
        centroids
        if centroids is not None
        else seed_centroids(corpus, n_centroids, id_col, vec_col)
    )
    if assign_levels == 2:
        assigned = ivf_assign_twolevel(
            corpus, n_centroids, None, id_col, vec_col, dim, cents
        )
    else:
        assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, dim, cents)
    index = assigned.select(
        F.col(id_col),
        F.col("_v").alias("vec"),
        F.col("_n").alias("vnorm"),
        "cid",
    )
    return cents, index


def ivf_index_topk(
    centroids: DataFrame,
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF top-k against a PERSISTED index: probe each query's
    ``nprobe`` nearest centroids (centroid table broadcasts), scan
    only those inverted lists from the assignment table, exact-score
    candidates, per-query top-k heap. Produces results identical to
    :func:`ivf_topk` run directly on the corpus the index was built
    from — proven by the ivf_index_roundtrip oracle entry — while
    touching none of the original vectors' plans."""
    from pyspark.sql import Window

    pw = Window.partitionBy("query_id").orderBy(F.desc("_cs"), F.asc("cid"))
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(vec_col).alias("qv"),
            norm(vec_col).alias("qn"),
        )
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qv",
            "qn",
            "cid",
            (dot("qv", "centv", dim) / (F.col("qn") * F.col("centn"))).alias(
                "_cs"
            ),
        )
        .withColumn("_rn", F.row_number().over(pw))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", "cid")
    )
    cand = probes.join(
        index.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("vec").alias("cv"),
            F.col("vnorm").alias("cn"),
            "cid",
        ),
        "cid",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select("query_id", "neighbor_id", _pair_cos(dim))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivf_index_append(
    centroids: DataFrame,
    index: DataFrame,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Incremental index maintenance: assign ONLY the new vectors to
    the existing (frozen) quantizer and union them into the inverted
    file — the standard billion-vector ingest loop, where the
    quantizer is retrained rarely and appends land continuously.
    Because assignment is a pure function of (vector, centroids),
    appending batch B to an index of corpus A yields BYTE-IDENTICAL
    rows to rebuilding over A ∪ B — tested exactly
    (tests/test_ann_quality.py::TestIvfIndexAppend). Cost: one
    broadcast-assign map pass over the NEW batch only; the existing
    index is untouched (with a cid-partitioned parquet index, the
    append writes only the affected list partitions)."""
    n_centroids = 0  # unused by ivf_assign when centroids are passed
    assigned = ivf_assign(
        new_vectors, n_centroids, id_col, vec_col, dim, centroids
    )
    new_rows = assigned.select(
        F.col(id_col),
        F.col("_v").alias("vec"),
        F.col("_n").alias("vnorm"),
        "cid",
    )
    return index.unionByName(new_rows)


def maxsim_topk(
    corpus_vecs: DataFrame,
    query_vecs: DataFrame,
    k: int = 5,
    doc_col: str = "doc_id",
    id_col: str = "vec_id",
    vec_col: str = "v",
    dim: int | None = None,
) -> DataFrame:
    """Late-interaction (ColBERT-style) multi-vector retrieval: a
    document and a query are each a BAG of vectors, and
    score(Q, D) = Σ_{q∈Q} max_{d∈D} cos(q, d) — every query vector
    finds its best match inside the document, so fine-grained token
    alignment survives, which single-vector pooling destroys.

    Exact form: the query side broadcasts (query bags are small by
    definition) and each (query vector × corpus vector) cosine is
    computed once; per (query-vector, doc) max then per (query-doc,
    doc) sum. The per-pair MaxSim sum accumulates in integer MICROS
    (round(cos·1e6)) so the aggregation is order-free and
    bit-identical cross-engine — float summation order never leaks
    into the score. At 100 TB the exact corpus scan becomes the
    per-query-vector ANN shortlist (ivf_index_topk/lsh_topk per
    vector, union candidates per doc, rescore exactly) — same
    max-then-sum plan over the candidate set.

    Inputs carry (doc_col, id_col, vec_col) on both sides. Output:
    (q_doc, c_doc, score_micro, rank) with rank ≤ k per q_doc."""
    from pyspark.sql import Window

    q = query_vecs.select(
        F.col(doc_col).alias("q_doc"),
        F.col(id_col).alias("_qvec"),
        F.col(vec_col).alias("qv"),
    )
    c = corpus_vecs.select(
        F.col(doc_col).alias("c_doc"), F.col(vec_col).alias("cv")
    )
    cos = dot("qv", "cv", dim) / (norm("qv") * norm("cv"))
    mc = (
        c.crossJoin(F.broadcast(q))
        .select("q_doc", "_qvec", "c_doc", cos.alias("_cos"))
        .groupBy("q_doc", "_qvec", "c_doc")
        .agg(F.max("_cos").alias("_m"))
    )
    sc = mc.groupBy("q_doc", "c_doc").agg(
        F.sum(F.round(F.col("_m") * 1_000_000).cast("long"))
        .cast("long")
        .alias("score_micro")
    )
    w = Window.partitionBy("q_doc").orderBy(
        F.desc("score_micro"), F.asc("c_doc")
    )
    return sc.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def maxsim_topk_ann(
    corpus_vecs: DataFrame,
    query_vecs: DataFrame,
    k: int = 5,
    m: int = 20,
    n_centroids: int = 16,
    nprobe: int = 4,
    doc_col: str = "doc_id",
    id_col: str = "vec_id",
    vec_col: str = "v",
    dim: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The scale path for :func:`maxsim_topk`: instead of scoring
    every (query bag × corpus doc), candidate docs come from
    per-QUERY-VECTOR ANN — each query vector probes an IVF index of
    the corpus VECTORS for its top-``m`` neighbors, the neighbors'
    parent docs form the candidate set per query doc, and MaxSim is
    then rescored EXACTLY over the candidates' full bags (a doc in
    the shortlist is never scored approximately — the ANN only
    selects, like pq_rescored_topk). Candidate volume is
    O(#query-vecs · m) docs instead of the whole corpus; recall < 1
    by construction (a doc whose every vector misses every query
    vector's top-m is skipped), gated in tests/test_ann_quality.py —
    with ``m`` ≥ corpus vectors the output equals the exact operator
    row-for-row (also tested). Query and corpus ``id_col`` spaces
    must be disjoint (the vec-level ANN drops identical ids as
    self-matches)."""
    cvecs = corpus_vecs.select(
        F.col(doc_col).alias("c_doc"),
        F.col(id_col),
        as_double(vec_col).alias("_v"),
    )
    if centroids is None:
        # seed quantizer = the n_centroids LOWEST-id corpus vectors
        # (seed_centroids' `id < n` rule assumes ids start at 0,
        # which a doc-bag corpus slice generally violates)
        centroids = (
            cvecs.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.col(id_col).cast("int").alias("cid"),
                F.col("_v").alias("centv"),
                norm("_v").alias("centn"),
            )
        )
    cents, index = ivf_index_build(
        cvecs, n_centroids, id_col=id_col, vec_col="_v",
        dim=dim, centroids=centroids,
    )
    qv = query_vecs.select(
        F.col(doc_col).alias("q_doc"),
        F.col(id_col),
        as_double(vec_col).alias("_v"),
    )
    hits = ivf_index_topk(
        cents, index, qv.select(id_col, "_v"),
        k=m, nprobe=nprobe, id_col=id_col, vec_col="_v", dim=dim,
    )
    pairs = (
        hits.join(
            qv.select(F.col(id_col).alias("query_id"), "q_doc"), "query_id"
        )
        .join(
            cvecs.select(F.col(id_col).alias("neighbor_id"), "c_doc"),
            "neighbor_id",
        )
        .select("q_doc", "c_doc")
        .distinct()
    )
    qside = qv.select("q_doc", F.col(id_col).alias("_qvec"), F.col("_v").alias("qv"))
    cside = cvecs.select("c_doc", F.col("_v").alias("cv"))
    from pyspark.sql import Window

    cos = dot("qv", "cv", dim) / (norm("qv") * norm("cv"))
    mc = (
        pairs.join(qside, "q_doc")
        .join(cside, "c_doc")
        .select("q_doc", "_qvec", "c_doc", cos.alias("_cos"))
        .groupBy("q_doc", "_qvec", "c_doc")
        .agg(F.max("_cos").alias("_m"))
    )
    sc = mc.groupBy("q_doc", "c_doc").agg(
        F.sum(F.round(F.col("_m") * 1_000_000).cast("long"))
        .cast("long")
        .alias("score_micro")
    )
    w = Window.partitionBy("q_doc").orderBy(
        F.desc("score_micro"), F.asc("c_doc")
    )
    return sc.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
