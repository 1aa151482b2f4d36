"""Degree-oriented triangle counting: correctness (orientation must
not change the answer) and the skew bound it exists for — on a
hub-headed graph the quadratic wedge stage must ride out-degree under
the (degree, id) order, not the hub's raw degree.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syncflux_spark.operators.graph import (
    degree_oriented_edges,
    triangle_counts,
)


@pytest.fixture(scope="module")
def hub_graph(spark):
    """One hub (node 0) in well over 30% of all edges: star 0–{1..100}
    plus a path 1–2–…–60 (59 triangles through the hub) and chords
    10–12, 20–23 (wedges that close without the hub)."""
    edges = [(0, i) for i in range(1, 101)]
    edges += [(i, i + 1) for i in range(1, 60)]
    edges += [(10, 12), (20, 23)]
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _naive_counts(e, spark):
    """Reference: id-oriented 3-way equality join (the textbook SQL
    enumeration — correct, but O(d²) on low-id hubs)."""
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
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


class TestDegreeOrientation:
    def test_counts_match_naive_enumeration(self, hub_graph, spark):
        got = {
            r.doc_id: r.n_triangles
            for r in triangle_counts(hub_graph).collect()
        }
        exp = {
            r.doc_id: r.n_triangles
            for r in _naive_counts(hub_graph, spark).collect()
        }
        assert got == exp and exp
        # the hub sits in every path triangle (59) + both chord
        # triangles (0,10,12) and (0,20,23)
        assert got[0] == 61

    def test_hub_emits_no_wedges(self, hub_graph):
        """Degree orientation points every star edge leaf→hub, so the
        hub's out-degree — and with it the C(d,2) wedge fanout an
        id-orientation would put on one shuffle key — collapses to 0.
        Every other node keeps out-degree ≤ its tiny raw degree."""
        out_deg = {
            r.src: r.n
            for r in degree_oriented_edges(hub_graph)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert 0 not in out_deg  # hub: 100 edges, zero out-edges
        assert max(out_deg.values()) <= 4

    def test_orientation_covers_every_edge_once(self, hub_graph):
        o = degree_oriented_edges(hub_graph)
        assert o.count() == hub_graph.count()
        # each undirected edge appears exactly once, as one direction
        canon = o.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        assert canon.distinct().count() == hub_graph.count()

    def test_triangle_free_graph(self, spark):
        star = spark.createDataFrame(
            [(0, i) for i in range(1, 30)], "id_a long, id_b long"
        )
        assert triangle_counts(star).count() == 0


class TestKCore:
    def test_clique_survives_chain_peels(self, spark):
        from syncflux_spark.operators.graph import k_core

        # 4-clique (a,b,c,d) + pendant chain e-f-g hanging off d
        clique = [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),
        ]
        chain = [("d", "e"), ("e", "f"), ("f", "g")]
        pairs = spark.createDataFrame(
            clique + chain, "id_a string, id_b string"
        )
        out = {r.doc_id: r.core_degree for r in k_core(pairs, k=3).collect()}
        assert set(out) == {"a", "b", "c", "d"}
        assert all(v == 3 for v in out.values())

    def test_no_kcore_returns_empty(self, spark):
        from syncflux_spark.operators.graph import k_core

        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "id_a string, id_b string"
        )
        out = k_core(pairs, k=2)
        assert out.count() == 0
        assert out.columns == ["doc_id", "core_degree"]

    def test_k1_keeps_everything_with_degrees(self, spark):
        from syncflux_spark.operators.graph import k_core

        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "id_a string, id_b string"
        )
        out = {r.doc_id: r.core_degree for r in k_core(pairs, k=1).collect()}
        assert out == {"a": 1, "b": 2, "c": 1}
