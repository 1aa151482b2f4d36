"""End-to-end training-data pipeline composition: the operators a
curation pipeline chains — quality gates → dedup → leakage-safe
split → mixture resample → epoch shuffle → shard manifest — run
against the driver fixture as one flow, with the invariants a real
pipeline depends on asserted at each stage (determinism, row
conservation, no cross-split leakage, mixture shares)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syncflux_spark.operators import dedup as dd
from syncflux_spark.operators.sampling import (
    epoch_shuffle,
    leakage_safe_split,
    mixture_resample,
)
from syncflux_spark.operators.textops import c4_filter_flags
from syncflux_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


class TestPipelineComposition:
    def test_full_flow(self, spark, docs):
        n0 = docs.count()

        # 1. quality gate: C4-style rule flags, keep passing docs
        # fixture docs are single-sentence: floor at 1 keeps the
        # gate meaningful (blocklist/code/lorem rules still apply)
        flagged = c4_filter_flags(docs, min_sentences=1)
        kept = flagged.where(F.col("passes")).select("doc_id").join(
            docs, "doc_id"
        )
        n1 = kept.count()
        assert 0 < n1 <= n0

        # 2. exact dedup: one survivor per digest group
        groups = dd.exact_dedup_groups(kept)
        survivors = groups.select(F.col("keep_id").alias("doc_id"))
        deduped = survivors.join(kept, "doc_id")
        n2 = deduped.count()
        assert 0 < n2 <= n1

        # 3. leakage-safe split: near-dup clusters share a split
        split = leakage_safe_split(deduped)
        assert split.count() == n2  # row conservation
        pairs = dd.ngram_jaccard_pairs(deduped, threshold=0.5)
        cross = (
            pairs.join(
                split.select(F.col("doc_id").alias("id_a"),
                             F.col("split").alias("sa")), "id_a")
            .join(
                split.select(F.col("doc_id").alias("id_b"),
                             F.col("split").alias("sb")), "id_b")
            .where(F.col("sa") != F.col("sb"))
        )
        assert cross.count() == 0  # leakage impossible by construction

        # 4. mixture resample the train split to target source shares
        train = split.where(F.col("split") == "train").select("doc_id").join(
            deduped, "doc_id"
        )
        sources = [r.source for r in
                   train.select("source").distinct().limit(3).collect()]
        if len(sources) == 3:
            targets = dict(zip(sources, (0.5, 0.3, 0.2)))
            mixed = mixture_resample(train, targets)
            shares = {
                r.source: r["count"]
                for r in mixed.groupBy("source").count().collect()
            }
            total = sum(shares.values())
            assert total > 0
            for src, w in targets.items():
                assert abs(shares.get(src, 0) / total - w) < 0.15
        else:  # tiny fixtures may not have 3 sources in train
            mixed = train

        # 5. epoch shuffle: a permutation manifest over the final set
        manifest = epoch_shuffle(mixed.select("doc_id"), seed="e0", n_shards=4)
        rows = manifest.collect()
        assert sorted(r.position for r in rows) == list(
            range(1, len(rows) + 1)
        )
        from collections import Counter

        c = Counter(r.shard for r in rows)
        assert max(c.values()) - min(c.values()) <= 1

        # 6. the whole flow is deterministic: rerun → identical manifest
        again = epoch_shuffle(mixed.select("doc_id"), seed="e0", n_shards=4)
        assert {(r.doc_id, r.position) for r in again.collect()} == {
            (r.doc_id, r.position) for r in rows
        }
