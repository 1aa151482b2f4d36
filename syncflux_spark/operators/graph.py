"""Iterative graph algorithms over pair graphs (Pregel-pattern).

Connected components (operators/dedup.py::connected_components) covers
reachability; this module adds importance propagation — PageRank over
the near-dup graph ranks the "hub" documents inside duplicate
neighborhoods (the canonical-copy heuristic: keep the highest-ranked
member of each cluster, not the lowest doc_id).

Same driver-coordinated iteration discipline as components: every
round is one join + one partial-agg shuffle on the edge list, and
per-round results go through ``localCheckpoint`` so the logical plan
stays O(1) across rounds instead of doubling (see the
connected_components docstring for the 2 GB plan-cap war story; swap
``checkpoint`` in for executor-loss tolerance on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    damping: float = 0.85,
    n_iter: int = 10,
    ckpt_every: int = 5,
) -> DataFrame:
    """PageRank over an undirected pair graph: ``nodes`` (one
    ``id_col`` column), ``pairs`` (id_a, id_b) symmetrized here.
    Fixed ``n_iter`` rounds of rank_v = (1-d)/N + d·Σ_in rank_u/deg_u.

    Scale shape per round: ranks÷degrees joined to the edge list on
    the source id (one hash join), contributions partial-agg summed on
    the destination id (one shuffle) — O(|E|) work, O(|V|) state, the
    textbook distributed PageRank. Isolated nodes hold the (1-d)/N
    floor; dangling-mass redistribution is omitted (symmetrized graphs
    have no rank sinks — every edge is bidirectional, so any node with
    an in-edge has an out-edge).

    Cross-row float sums make the result order-sensitive in the last
    ulps → registered rows-only; numerics are gated against a numpy
    replica in tests (same rounds, same init, tolerance 1e-9)."""
    if ckpt_every < 1:
        raise ValueError(f"ckpt_every must be >= 1, got {ckpt_every}")
    edges = pairs.select("id_a", "id_b").localCheckpoint()
    sym = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    deg = sym.groupBy(F.col("id_a").alias("_src")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # degree is loop-invariant: annotate the edge list with the source
    # degree once — one hash join per round instead of two (isolated
    # nodes still drop out: they have no out-edges)
    esrc = (
        sym.join(deg, sym.id_a == F.col("_src"))
        .select("id_a", "id_b", "deg")
        .localCheckpoint()
    )
    nodes0 = nodes.select(F.col(id_col)).localCheckpoint()
    n = nodes0.count()
    base = (1.0 - damping) / n
    ranks = nodes0.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    # per-round shuffles move only ranks and the annotated edge list —
    # size partitions to that state (utils.loop_parallelism; both
    # counts are over checkpointed data)
    from syncflux_spark.utils import loop_parallelism, shuffle_partitions

    spark = nodes.sparkSession
    parts = loop_parallelism(spark, max(n, esrc.count()))
    with shuffle_partitions(spark, parts):
        for i in range(n_iter):
            contrib = esrc.join(ranks, esrc.id_a == ranks[id_col]).select(
                F.col("id_b").alias("_dst"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            inflow = contrib.groupBy(F.col("_dst").alias(id_col)).agg(
                F.sum("c").alias("inflow")
            )
            ranks = nodes0.join(inflow, id_col, "left").select(
                F.col(id_col),
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            # checkpoint every ckpt_every rounds, not every round:
            # unlike components (whose pointer-halving SELF-JOIN
            # doubles the plan per round), the rank lineage grows
            # LINEARLY (one branch per round), so batching K rounds
            # into one materialization job is safe and cuts the
            # per-round job-launch overhead K× — measured 6.4s → 4.9s
            # end-to-end at sf0.1 with identical fixed-point ranks
            if (i + 1) % ckpt_every == 0 or i == n_iter - 1:
                ranks = ranks.localCheckpoint()
    return ranks


def pagerank_fixedpoint(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    n_iter: int = 10,
    scale: int = 10**12,
    ckpt_every: int = 5,
) -> DataFrame:
    """:func:`pagerank` with ORDER-FREE integer arithmetic — the
    oracle-hashable variant. Ranks live as int64 at ``scale`` parts
    per unit; damping 0.85 is the exact rational 17/20, so every op
    is integer (share = rank DIV deg, inflow = int64 SUM, next =
    base + 17·inflow DIV 20) and the result is bit-identical under
    any row order or partitioning — replayable in unrolled SQL.

    Same distributed shape as the float version: per round one hash
    join of ranks÷degrees onto the edge list + one partial-agg shuffle
    on the destination id; O(|E|) work, O(|V|) state. Quantization
    error is ≤1 part-per-scale per op (~1e-12 relative), far below
    the float version's own accumulation drift tolerance."""
    if ckpt_every < 1:
        raise ValueError(f"ckpt_every must be >= 1, got {ckpt_every}")
    edges = pairs.select("id_a", "id_b").localCheckpoint()
    sym = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    deg = sym.groupBy(F.col("id_a").alias("_src")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # degree is loop-invariant: annotate the edge list with the source
    # degree ONCE instead of re-joining ranks⋈deg every round — one
    # hash join per round instead of two
    esrc = (
        sym.join(deg, sym.id_a == F.col("_src"))
        .select("id_a", "id_b", "deg")
        .localCheckpoint()
    )
    nodes0 = nodes.select(F.col(id_col)).localCheckpoint()
    n = nodes0.count()
    base = (3 * scale) // (20 * n)
    ranks = nodes0.withColumn(
        "rank_fp", F.lit(scale // n).cast("long")
    ).localCheckpoint()
    # same loop-state partition sizing as the float variant
    from syncflux_spark.utils import loop_parallelism, shuffle_partitions

    spark = nodes.sparkSession
    parts = loop_parallelism(spark, max(n, esrc.count()))
    with shuffle_partitions(spark, parts):
        for i in range(n_iter):
            contrib = esrc.join(ranks, esrc.id_a == ranks[id_col]).select(
                F.col("id_b").alias("_dst"),
                F.expr("rank_fp DIV deg").alias("c"),
            )
            inflow = contrib.groupBy(F.col("_dst").alias(id_col)).agg(
                F.sum("c").alias("inflow")
            )
            ranks = nodes0.join(inflow, id_col, "left").select(
                F.col(id_col),
                (
                    F.lit(base)
                    + F.expr("(17 * coalesce(inflow, CAST(0 AS LONG))) DIV 20")
                ).alias("rank_fp"),
            )
            # linear lineage → batch K rounds per checkpoint (see the
            # float variant's loop comment for the measurement)
            if (i + 1) % ckpt_every == 0 or i == n_iter - 1:
                ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col(id_col),
        "rank_fp",
        (F.col("rank_fp").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def degree_oriented_edges(pairs: DataFrame) -> DataFrame:
    """Re-point every undirected edge from its lower-degree endpoint
    to its higher-degree one (ties by id): (src, dst, deg_dst). Under
    this total order a vertex's out-degree is O(√|E|) — more precisely
    O(arboricity) — regardless of its raw degree: a hub touching 30%
    of all edges has huge IN-degree but out-degree bounded by the
    number of neighbors at least as high in the order. This is the
    orientation step of the compact-forward triangle algorithm
    (Latapy '08 / Suri–Vassilvitskii '11): the quadratic wedge stage
    enumerates out-neighbor pairs, so bounding out-degree bounds the
    per-vertex (and per-shuffle-key) work that an id-orientation
    leaves O(d_hub²) on hub-headed graphs."""
    e = pairs.select("id_a", "id_b").distinct()
    sym = e.union(
        e.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    deg = sym.groupBy(F.col("id_a").alias("_n")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    da, db = deg.alias("da"), deg.alias("db")
    ranked = (
        e.join(da, e.id_a == F.col("da._n"))
        .join(db, e.id_b == F.col("db._n"))
        .select(
            "id_a",
            "id_b",
            F.col("da._deg").alias("deg_a"),
            F.col("db._deg").alias("deg_b"),
        )
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("id_a") < F.col("id_b"))
    )
    return ranked.select(
        F.when(a_first, F.col("id_a")).otherwise(F.col("id_b")).alias("src"),
        F.when(a_first, F.col("id_b")).otherwise(F.col("id_a")).alias("dst"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_dst"),
    )


def triangle_counts(
    pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-node triangle participation over an undirected pair graph
    (``pairs``: id_a < id_b, distinct) — the local clustering signal
    that separates tight duplicate cliques from chains of borderline
    matches (a doc in many triangles sits in a dense near-dup cluster;
    a bridge doc linking two clusters sits in few).

    Compact-forward enumeration over the DEGREE-ORIENTED edge list
    (:func:`degree_oriented_edges`): each triangle's lowest-order
    vertex u emits the wedge (u→v, u→w) with v below w in the
    (degree, id) order, closed by probing the oriented edge v→w — so
    every triangle is found exactly once and the quadratic wedge
    fanout rides OUT-degree, which the orientation caps at
    O(arboricity). An id-oriented join (the round-2 form) left
    O(d²) wedge work on any hub that sorted low — the classic skewed
    self-join; with degree orientation a hub is the HIGHEST-order
    endpoint of nearly all its edges and emits ~no wedges at all.
    Output is orientation-invariant: (id_col, n_triangles) for nodes
    in ≥1 triangle, identical to the naive enumeration.
    """
    from syncflux_spark.utils import (
        eager_persist,
        loop_parallelism,
        shuffle_partitions,
    )

    # r13 (guide §2.4): everything downstream of the pair generator —
    # orientation, the wedge/close joins, the count agg — moves only
    # the edge list and its wedges, so their shuffle partitions are
    # sized to the EDGE mass, not the batch default the corpus-scale
    # pair generator needs (the loop_parallelism lever; stage-isolated
    # A/B at sf0.1 on a 4,280-edge graph: 1.68 s → 1.05 s steady-
    # state, identical counts — query-level effect sits inside box
    # noise because pair-gen dominates there). Pair-gen materializes
    # OUTSIDE the clamp at full parallelism (the localCheckpoint);
    # rows_per_partition is 10× tighter than the label-loop default
    # because the wedge stage fans out up to O(√E) per edge; at
    # production edge counts the quotient exceeds the session default
    # and the clamp is a no-op. The result materializes inside the
    # clamp (localCheckpoint — per-node counts, small) so the sizing
    # sticks when the caller executes the returned frame.
    edges = pairs.select("id_a", "id_b").localCheckpoint()
    spark = pairs.sparkSession
    parts = loop_parallelism(spark, edges.count(), rows_per_partition=25_000)
    below = (F.col("e1.deg_dst") < F.col("e2.deg_dst")) | (
        (F.col("e1.deg_dst") == F.col("e2.deg_dst"))
        & (F.col("e1.dst") < F.col("e2.dst"))
    )
    with shuffle_partitions(spark, parts):
        o = eager_persist(degree_oriented_edges(edges))
        tri = (
            o.alias("e1")
            .join(o.alias("e2"), (F.col("e1.src") == F.col("e2.src")) & below)
            .join(
                o.alias("e3"),
                (F.col("e3.src") == F.col("e1.dst"))
                & (F.col("e3.dst") == F.col("e2.dst")),
            )
            .select(
                F.col("e1.src").alias("a"),
                F.col("e1.dst").alias("b"),
                F.col("e2.dst").alias("c"),
            )
        )
        out = (
            tri.select(F.explode(F.array("a", "b", "c")).alias(id_col))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
            .localCheckpoint()
        )
    return out


def k_core(
    pairs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    max_rounds: int = 100,
) -> DataFrame:
    """Vertices of the ``k``-core — the maximal subgraph where every
    vertex keeps degree ≥ k — plus each survivor's core-internal
    degree. The dense-cluster extractor for dedup QA: a near-dup
    CLIQUE (template spam, mirrored boilerplate) survives high-k
    peeling, while chains of borderline pairwise matches peel away —
    the same signal triangle counting gives, but subgraph-global
    instead of per-wedge.

    Distributed peeling (Batagelj–Zaveršnik made parallel): each
    round recounts degrees on the surviving edge list (one partial-agg
    shuffle) and drops every vertex below ``k`` simultaneously (one
    semi-join per endpoint). Simultaneous removal converges to the
    same unique k-core as sequential peeling (the k-core is the
    unique maximal fixpoint; removal order never changes it) in at
    most graph-diameter-ish rounds. Per-round plans go through
    ``localCheckpoint`` so the lineage stays O(1) — the same
    discipline as connected_components.

    Output: (id_col, core_degree) for k-core members; empty when the
    graph has no k-core. Raises if ``max_rounds`` passes without a
    fixpoint (cannot happen for a finite graph unless max_rounds is
    set below the peel depth — the raise turns silent truncation
    into a visible failure, dedup.py::connected_components policy).
    """
    edges = (
        pairs.select("id_a", "id_b")
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
        .localCheckpoint()
    )
    # peel-loop shuffles move only the (shrinking) edge list — size
    # partitions to the initial edge count (utils.loop_parallelism)
    from syncflux_spark.utils import loop_parallelism, shuffle_partitions

    spark = pairs.sparkSession
    parts = loop_parallelism(spark, 2 * edges.count())
    with shuffle_partitions(spark, parts):
        for _ in range(max_rounds):
            sym = edges.union(
                edges.select(
                    F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
                )
            )
            deg = sym.groupBy(F.col("id_a").alias("_v")).agg(
                F.count(F.lit(1)).alias("_deg")
            )
            bad = deg.where(F.col("_deg") < k).select("_v")
            n_bad = bad.count()
            if n_bad == 0:
                survivors = deg.select(
                    F.col("_v").alias(id_col),
                    F.col("_deg").cast("long").alias("core_degree"),
                )
                return survivors
            edges = (
                edges.join(bad, edges.id_a == bad._v, "left_anti")
                .join(bad, F.col("id_b") == bad._v, "left_anti")
                .localCheckpoint()
            )
            # an emptied edge list terminates next round: empty degrees →
            # zero bad vertices → empty survivors with the right schema
        raise RuntimeError(
            f"k_core did not converge in {max_rounds} rounds — raise max_rounds"
        )
