"""CDC merge-apply semantics and blocked record linkage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syncflux_spark.operators.cdc import apply_changes, change_counts
from syncflux_spark.operators.dedup import blocked_edit_distance_pairs


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, status string, price double",
    )


@pytest.fixture(scope="module")
def changes(spark):
    return spark.createDataFrame(
        [
            (2, "U", "b2", 22.0),   # update present key
            (3, "D", None, None),   # delete present key
            (4, "I", "d", 40.0),    # fresh insert
            (1, "I", "a2", 11.0),   # re-delivered insert: replaces
            (9, "U", "x", 90.0),    # update absent key: no-op
            (8, "D", None, None),   # delete absent key: no-op
        ],
        "k long, op string, status string, price double",
    )


class TestApplyChanges:
    def test_merge_semantics(self, base, changes):
        out = {
            r.k: (r.status, r.price)
            for r in apply_changes(base, changes, key_col="k").collect()
        }
        assert out == {
            1: ("a2", 11.0),  # idempotent re-insert replaced values
            2: ("b2", 22.0),  # updated
            4: ("d", 40.0),   # inserted
        }  # 3 deleted; 8/9 no-ops contributed nothing

    def test_audit_counts(self, base, changes):
        r = change_counts(base, changes, key_col="k").collect()[0]
        assert (r.n_insert, r.n_update, r.n_delete, r.n_noop) == (2, 1, 1, 2)
        # +1 fresh insert (k=4), -1 delete (k=3); re-insert of k=1
        # replaces in place
        assert r.row_delta == 0

    def test_schema_matches_base(self, base, changes):
        merged = apply_changes(base, changes, key_col="k")
        assert merged.columns == base.columns

    def test_empty_batch_is_identity(self, base, spark):
        empty = spark.createDataFrame(
            [], "k long, op string, status string, price double"
        )
        out = sorted(
            (r.k, r.status, r.price)
            for r in apply_changes(base, empty, key_col="k").collect()
        )
        assert out == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]


class TestBlockedEditDistance:
    def test_pairs_and_blocking(self, spark):
        df = spark.createDataFrame(
            [
                (1, "ITEM-001"),
                (2, "ITEM-002"),   # dist 1 from ITEM-001
                (3, "ITEM-011"),   # dist 1 from 001 BUT same block
                (4, "WIDGET-9"),   # different block entirely
                (5, "ITEM-901"),   # different block (prefix differs)
            ],
            "id long, name string",
        )
        out = {
            (r.id_a, r.id_b): r.dist
            for r in blocked_edit_distance_pairs(
                df,
                key_col="name",
                id_col="id",
                block_col=F.expr("substring(name, 1, length(name) - 2)"),
                max_dist=1,
            ).collect()
        }
        # block 'ITEM-0': ids 1,2,3 — (1,2) and (1,3) are distance 1;
        # (2,3) is distance 2 ('02'→'11') and must be filtered out
        assert out == {(1, 2): 1, (1, 3): 1}

    def test_default_block_is_suffix_trim(self, spark):
        df = spark.createDataFrame(
            [(1, "AB1"), (2, "AB2"), (3, "AC1")], "id long, name string"
        )
        out = blocked_edit_distance_pairs(
            df, key_col="name", id_col="id", max_dist=1
        ).collect()
        # default block = name minus last char: AB vs AC split blocks
        assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}

    def test_single_shuffle_plan(self, spark):
        df = spark.createDataFrame(
            [(1, "AB1"), (2, "AB2")], "id long, name string"
        )
        plan = (
            blocked_edit_distance_pairs(df, key_col="name", id_col="id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        # no cartesian / nested-loop stage: the join must be an
        # equality join on the block key
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
