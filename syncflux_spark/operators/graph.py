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
    edges = pairs.select("id_a", "id_b").localCheckpoint()
    sym = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).localCheckpoint()
    deg = sym.groupBy(F.col("id_a").alias(id_col)).agg(
        F.count(F.lit(1)).alias("deg")
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = (
        nodes.select(F.col(id_col))
        .withColumn("rank", F.lit(1.0 / n))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        src = ranks.join(deg, id_col)  # isolated nodes drop out: no out-edges
        contrib = sym.join(src, sym.id_a == src[id_col]).select(
            F.col("id_b").alias("_dst"),
            (F.col("rank") / F.col("deg")).alias("c"),
        )
        inflow = contrib.groupBy(F.col("_dst").alias(id_col)).agg(
            F.sum("c").alias("inflow")
        )
        ranks = (
            nodes.select(F.col(id_col))
            .join(inflow, id_col, "left")
            .select(
                F.col(id_col),
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def triangle_counts(
    pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-node triangle participation over an undirected pair graph
    (``pairs``: id_a < id_b, distinct) — the local clustering signal
    that separates tight duplicate cliques from chains of borderline
    matches (a doc in many triangles sits in a dense near-dup cluster;
    a bridge doc linking two clusters sits in few).

    One triangle (a<b<c) is found exactly once by joining the
    id-oriented edge list three ways: (a,b)⋈(b,c)⋈(a,c) — the
    standard SQL triangle enumeration; each join shuffles on a single
    node key. The id orientation bounds a hub's join fanout by its
    out-degree under "<"; on graphs with extreme hubs the refinement
    is DEGREE orientation (re-point every edge low-degree →
    high-degree, ties by id) which provably caps per-vertex work at
    O(arboricity) — same output, one extra degree-computation pass;
    the LSH dedup graph's band-entropy already bounds skew, so the
    simple orientation is kept and the dial documented. Returns
    (id_col, n_triangles) for nodes in ≥1 triangle.
    """
    from syncflux_spark.utils import eager_persist

    e = eager_persist(pairs.select("id_a", "id_b").distinct())
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.id_b") == F.col("e2.id_a"))
        .join(
            e.alias("e3"),
            (F.col("e3.id_a") == F.col("e1.id_a"))
            & (F.col("e3.id_b") == F.col("e2.id_b")),
        )
        .select(
            F.col("e1.id_a").alias("a"),
            F.col("e1.id_b").alias("b"),
            F.col("e2.id_b").alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
