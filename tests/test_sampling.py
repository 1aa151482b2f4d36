"""Deterministic sampling/split properties (operators/sampling.py):
the guarantees a training pipeline actually relies on, beyond the
oracle's value-hash check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syncflux_spark.operators.sampling import (
    deterministic_sample,
    split_assign,
    split_thresholds,
    stratified_sample,
)
from syncflux_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_split_covers_everything_once(docs):
    out = split_assign(docs)
    assert out.count() == docs.count()
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) <= {"train", "val", "test"}
    n = sum(counts.values())
    # 500 docs: loose sanity bounds, not exact fractions
    assert counts["train"] / n > 0.8
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0


def test_split_stable_under_repartition(docs):
    a = {(r.doc_id, r.split) for r in split_assign(docs).collect()}
    b = {
        (r.doc_id, r.split)
        for r in split_assign(docs.repartition(13)).collect()
    }
    assert a == b  # df.sample would fail this


def test_nested_samples(docs):
    s5 = {r.doc_id for r in deterministic_sample(docs, 0.05).collect()}
    s20 = {r.doc_id for r in deterministic_sample(docs, 0.20).collect()}
    assert s5 <= s20
    assert 0 < len(s5) < len(s20)


def test_independent_salts_differ(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.2, salt="a").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 0.2, salt="b").collect()}
    assert a != b


def test_bad_fractions_rejected():
    with pytest.raises(ValueError):
        split_thresholds({"train": 0.5, "test": 0.2})


def test_stratified_rates_and_full_keep(docs):
    out = stratified_sample(docs, {"en": 0.3}, "lang", default_rate=1.0)
    per = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    full = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    # non-en classes: rate 1.0 keeps EVERY row (the "~" threshold)
    for lang in full:
        if lang != "en":
            assert per[lang] == full[lang]
    assert 0.15 < per["en"] / full["en"] < 0.45  # ~30%, loose bounds


def test_stratified_nested_within_class(docs):
    lo = {
        r.doc_id
        for r in stratified_sample(docs, {"en": 0.1}, "lang").collect()
    }
    hi = {
        r.doc_id
        for r in stratified_sample(docs, {"en": 0.4}, "lang").collect()
    }
    assert lo <= hi
    assert 0 < len(lo) < len(hi)


class TestSnapshotDiff:
    def test_statuses(self, spark):
        from syncflux_spark.operators.diff import diff_summary, snapshot_diff

        old = spark.createDataFrame(
            [("a", "alpha"), ("b", "beta"), ("c", "gamma")],
            "doc_id string, text string",
        )
        new = spark.createDataFrame(
            [("a", "alpha"), ("b", "beta v2"), ("d", "delta")],
            "doc_id string, text string",
        )
        rows = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
        assert rows == {
            "a": "unchanged",
            "b": "changed",
            "c": "removed",
            "d": "added",
        }
        summary = {
            r.status: r.n
            for r in diff_summary(snapshot_diff(old, new)).collect()
        }
        assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


class TestEpochShuffle:
    def test_permutation_and_balance(self, spark):
        from syncflux_spark.operators.sampling import epoch_shuffle

        df = spark.range(101).select(F.col("id").alias("doc_id"))
        out = epoch_shuffle(df, seed="e1", n_shards=8).collect()
        # a permutation: every position exactly once
        assert sorted(r.position for r in out) == list(range(1, 102))
        # round-robin shards balanced to ±1
        from collections import Counter

        c = Counter(r.shard for r in out)
        assert set(c) == set(range(8))
        assert max(c.values()) - min(c.values()) <= 1

    def test_seed_changes_order_and_replays(self, spark):
        from syncflux_spark.operators.sampling import epoch_shuffle

        df = spark.range(64).select(F.col("id").alias("doc_id"))
        e1a = {r.doc_id: r.position for r in epoch_shuffle(df, "e1").collect()}
        e1b = {r.doc_id: r.position for r in epoch_shuffle(df, "e1").collect()}
        e2 = {r.doc_id: r.position for r in epoch_shuffle(df, "e2").collect()}
        assert e1a == e1b  # same seed replays exactly
        assert e1a != e2  # different seed permutes


class TestMixtureResample:
    def _docs(self, spark, sizes):
        rows = []
        i = 0
        for src, n in sizes.items():
            for _ in range(n):
                rows.append((i, src))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_shares_hit_targets(self, spark):
        from syncflux_spark.operators.sampling import mixture_resample

        df = self._docs(spark, {"a": 4000, "b": 4000, "c": 4000, "x": 500})
        out = mixture_resample(
            df, {"a": 0.5, "b": 0.3, "c": 0.2}
        ).groupBy("source").count().collect()
        got = {r.source: r["count"] for r in out}
        assert "x" not in got  # unlisted source dropped entirely
        total = sum(got.values())
        # scarcest-group cap: n_out = 4000/0.5 = 8000
        assert abs(got["a"] / total - 0.5) < 0.03
        assert abs(got["b"] / total - 0.3) < 0.03
        assert abs(got["c"] / total - 0.2) < 0.03
        assert got["a"] == 4000  # rate-1.0 group keeps every row

    def test_deterministic_and_subset(self, spark):
        from syncflux_spark.operators.sampling import mixture_resample

        df = self._docs(spark, {"a": 1000, "b": 1000})
        t = {"a": 0.7, "b": 0.3}
        one = {r.doc_id for r in mixture_resample(df, t).collect()}
        two = {r.doc_id for r in mixture_resample(df, t).collect()}
        assert one == two
        assert one <= {r.doc_id for r in df.collect()}

    def test_bad_targets_raise(self, spark):
        from syncflux_spark.operators.sampling import (
            mixture_rates,
            mixture_resample,
        )

        with pytest.raises(ValueError, match="sum to 1"):
            mixture_rates({"a": 10}, {"a": 0.5})
        df = self._docs(spark, {"a": 10})
        with pytest.raises(ValueError, match="absent"):
            mixture_resample(df, {"a": 0.5, "ghost": 0.5})


class TestLeakageSafeSplit:
    def test_dup_clusters_share_a_split(self, spark):
        from syncflux_spark.operators.sampling import leakage_safe_split

        # three dup clusters + singletons; many docs so every split
        # gets members
        rows = []
        for i in range(60):
            base = f"document number {i} with entirely distinct content "
            rows.append((i, base * 4))
        # dup pairs: (100,101), (102,103,104) share text
        rows += [
            (100, "the quick brown fox jumps over the lazy dog " * 5),
            (101, "the quick brown fox jumps over the lazy dog " * 5),
            (102, "pack my box with five dozen liquor jugs today " * 5),
            (103, "pack my box with five dozen liquor jugs today " * 5),
            (104, "pack my box with five dozen liquor jugs today " * 5),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: (r.component, r.split)
               for r in leakage_safe_split(df).collect()}
        assert len(out) == 65
        # every dup cluster is in exactly one split
        assert out[100] == out[101]
        assert out[102] == out[103] == out[104]
        assert out[100][0] == 100 and out[102][0] == 102  # min-id labels
        # and the assignment is keyed on the component, so a cluster's
        # split equals a singleton's split with the same label hash
        splits = {s for _, s in out.values()}
        assert "train" in splits  # 90% weight: certainly populated
