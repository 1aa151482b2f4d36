"""BPE learning and application (operators/tokenize.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syncflux_spark.operators.tokenize import (
    bpe_tokenize_stats,
    bpe_tokens,
    learn_bpe,
)


class TestLearnBpe:
    def test_classic_example(self, spark):
        """Sennrich-style fixture, counts worked by hand: round 1
        (a,a) fires 6 times; after it 'aaab'→[aa,a,b], so (a,b)
        appears 3+1=4 times vs (aa,a)'s 3; round 3 merges the
        remaining (aa,ab)."""
        df = spark.createDataFrame(
            [("aaab aaab aaab ab",)], "text string"
        )
        merges = learn_bpe(df, n_merges=3, min_freq=1)
        assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]

    def test_deterministic_tiebreak(self, spark):
        # 'ab' and 'cd' both appear twice; lexicographic pair wins
        df = spark.createDataFrame([("ab ab cd cd",)], "text string")
        merges = learn_bpe(df, n_merges=1, min_freq=1)
        assert merges == [("a", "b")]

    def test_min_freq_stops(self, spark):
        df = spark.createDataFrame([("xy",)], "text string")
        assert learn_bpe(df, n_merges=5, min_freq=2) == []

    def test_vocab_collect_is_bounded(self, spark):
        """A long garbage tail (unique hash-like words) must not reach
        the driver: min_freq pushes into the cluster agg and max_vocab
        top-V caps the collect, without changing the learned merges
        when the cap keeps every above-threshold word."""
        rows = [("the cat sat on the mat " * 3,)] * 4 + [
            (f"x{i:06d}y{i:06d}z",) for i in range(500)  # 500 singletons
        ]
        df = spark.createDataFrame(rows, "text string")
        unbounded = learn_bpe(df, n_merges=5, min_freq=2, max_vocab=10**6)
        capped = learn_bpe(df, n_merges=5, min_freq=2, max_vocab=10)
        assert capped == unbounded  # only 6 words survive min_freq=2

        # the collected table itself stays within max_vocab even with
        # min_freq=1 admitting the whole tail
        from syncflux_spark.functions.text import words as _words
        from syncflux_spark.utils import spread_for_cpu

        wc = (
            spread_for_cpu(df)
            .select(F.explode(_words(F.col("text"))).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= 1)
            .orderBy(F.col("n").desc(), F.col("w").asc())
            .limit(10)
        )
        assert len(wc.collect()) == 10
        # the top-V cap compiles to distributed TakeOrderedAndProject,
        # not a single-partition global sort
        assert "TakeOrderedAndProject" in wc._jdf.queryExecution().executedPlan().toString()


class TestApplyBpe:
    def test_rank_order_segmentation(self, spark):
        merges = [("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le")]
        df = spark.createDataFrame(
            [(0, "table"), (1, "tale"), (2, "cab")], "id long, w string"
        )
        out = {
            r.id: r.toks
            for r in df.select(
                "id", bpe_tokens(F.col("w"), merges).alias("toks")
            ).collect()
        }
        assert out[0] == ["table"]          # full derivation
        assert out[1] == ["ta", "le"]       # partial merges apply
        assert out[2] == ["c", "a", "b"]    # no merge fires
    def test_overlapping_merges_left_to_right(self, spark):
        # 'aaaa' with merge (a,a): left-to-right non-overlapping
        # pairing gives [aa, aa]; a lookbehind-free replace must not
        # skip the second pair
        df = spark.createDataFrame([(0, "aaaa"), (1, "aaa")], "id long, w string")
        out = {
            r.id: r.toks
            for r in df.select(
                "id", bpe_tokens(F.col("w"), [("a", "a")]).alias("toks")
            ).collect()
        }
        assert out[0] == ["aa", "aa"]
        assert out[1] == ["aa", "a"]

    def test_marker_chars_scrubbed(self, spark):
        df = spark.createDataFrame([(0, "a⟨b⟩c")], "id long, w string")
        out = df.select(
            bpe_tokens(F.col("w"), []).alias("toks")
        ).collect()[0].toks
        assert out == ["a", "b", "c"]

    def test_learn_then_apply_roundtrip(self, spark):
        """Merges learned from a corpus segment its own frequent
        words into single tokens."""
        df = spark.createDataFrame(
            [("scan scan scan scan table table table",)], "text string"
        )
        merges = learn_bpe(df, n_merges=20, min_freq=1)
        toks = spark.createDataFrame(
            [(0, "scan"), (1, "table")], "id long, w string"
        ).select("id", bpe_tokens(F.col("w"), merges).alias("toks"))
        got = {r.id: r.toks for r in toks.collect()}
        assert got[0] == ["scan"] and got[1] == ["table"]

    def test_stats_no_shuffle_and_counts(self, spark):
        merges = [("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le")]
        df = spark.createDataFrame(
            [(0, "table cab"), (1, "")], "doc_id long, text string"
        )
        out = bpe_tokenize_stats(df, merges)
        rows = {r.doc_id: r for r in out.collect()}
        assert rows[0].n_words == 2
        assert rows[0].n_tokens == 1 + 3  # 'table' + c,a,b
        assert rows[0].n_chars == 8
        assert rows[0].chars_per_token == 2.0
        plan = (
            out._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "Exchange" not in plan
