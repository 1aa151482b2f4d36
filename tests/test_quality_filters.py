"""Gopher / C4 quality-filter rules on crafted prose fixtures.

The oracle-parity suite pins these operators against DuckDB on the
driver corpus; these tests pin each RULE's direction on documents
built to flip exactly one rule at a time.
"""

from __future__ import annotations

import pytest

from syncflux_spark.operators.textops import (
    c4_filter_flags,
    gopher_quality_flags,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and that sentence "
    "must have enough words to clear the gopher floor of fifty with "
    "plenty of ordinary english prose in it so we keep writing words "
    "that look like text until the counter is comfortably past the "
    "minimum bound for this rule and then some more filler words"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, GOOD),  # passes everything
        (1, "too short to pass the word count rule"),  # < 50 words
        (2, GOOD + " " + "#### " * 20),  # symbol ratio blown
        (3, GOOD.replace("the", "zzz").replace("of", "qqq")
            .replace("and", "rrr").replace("that", "sss")
            .replace("have", "ttt").replace("with", "uuu")),  # no stopwords
        (4, " ".join(["ab"] * 60)),  # mean word length < 3
        (5, " ".join(["12345"] * 60)),  # alpha ratio 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopherRules:
    def test_each_rule_flips(self, docs):
        out = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
        assert out[0].passes
        assert not out[1].flag_word_count and out[0].flag_word_count
        assert not out[2].flag_symbol_ratio and out[0].flag_symbol_ratio
        assert not out[3].flag_stopwords and out[0].flag_stopwords
        assert not out[4].flag_word_len and out[0].flag_word_len
        assert not out[5].flag_alpha_words and out[0].flag_alpha_words
        for i in range(1, 6):
            assert not out[i].passes

    def test_counts_exact(self, docs):
        r = {x.doc_id: x for x in gopher_quality_flags(docs).collect()}
        assert r[4].n_words == 60
        assert r[4].mean_word_len == 2.0
        assert r[0].n_stopwords >= 2
        assert r[5].alpha_ratio == 0.0

    def test_no_shuffle_plan(self, docs):
        plan = (
            gopher_quality_flags(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "Exchange" not in plan


class TestC4Rules:
    @pytest.fixture(scope="module")
    def c4docs(self, spark):
        rows = [
            (0, "This is a sentence with many words inside.\n"
                "Here is another full sentence for the filter!\n"
                "And a third one to clear the sentence floor."),
            (1, "no terminal punctuation here at all"),  # 1 "sentence"
            (2, "Real sentences here. Three of them. Yes indeed. "
                "But it mentions lorem ipsum dolor."),
            (3, "Code like function() { return 1; } is here. "
                "Two more sentences follow. They are fine."),
            (4, "Blocked word badword appears. In a real doc. Sadly so."),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_rules(self, c4docs):
        out = {
            r.doc_id: r
            for r in c4_filter_flags(
                c4docs, blocklist=["badword"]
            ).collect()
        }
        assert out[0].passes and out[0].n_sentences == 3
        assert not out[1].flag_sentences
        assert not out[2].flag_no_lorem
        assert not out[3].flag_no_code
        assert not out[4].flag_blocklist and out[4].n_blocked_words == 1
        for i in range(1, 5):
            assert not out[i].passes

    def test_kept_line_ratio(self, c4docs):
        r = {x.doc_id: x for x in c4_filter_flags(c4docs).collect()}
        # doc 0: all 3 lines end in terminal punctuation with >= 5 words
        assert r[0].n_lines == 3 and r[0].kept_line_ratio == 1.0
        assert r[1].kept_line_ratio == 0.0

    def test_blocklist_is_word_exact(self, spark):
        df = spark.createDataFrame(
            [(0, "the classic passage. has classy words. three here.")],
            "doc_id long, text string",
        )
        out = c4_filter_flags(df, blocklist=["class"]).collect()[0]
        # 'classic'/'classy' must NOT match the blocked word 'class'
        assert out.n_blocked_words == 0 and out.flag_blocklist


class TestCompressionStats:
    """compression_stats (zlib entropy filter): the three text
    classes it exists to separate, plus exactness of the lengths."""

    def test_separates_repetitive_natural_random(self, spark):
        import random
        import zlib

        rng = random.Random(7)
        natural = " ".join(
            rng.choice(
                "the quick brown fox jumps over a lazy dog while rain "
                "falls on ancient stone bridges near quiet rivers".split()
            )
            for _ in range(400)
        )
        rows = [
            (1, "spam spam spam " * 100),                     # repetitive
            (2, natural),                                      # mid band
            (3, "".join(chr(rng.randint(33, 126)) for _ in range(1500))),
        ]
        from syncflux_spark.operators.textops import compression_stats

        got = {
            r.doc_id: r
            for r in compression_stats(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect()
        }
        ratios = {i: got[i].comp_len / got[i].raw_len for i in (1, 2, 3)}
        assert ratios[1] < 0.1            # boilerplate collapses
        assert 0.2 < ratios[2] < 0.8      # prose sits in the mid band
        assert ratios[3] > 0.8            # junk barely compresses
        assert ratios[1] < ratios[2] < ratios[3]
        # lengths are exactly the local zlib's output, no approximation
        for i, text in rows:
            assert got[i].raw_len == len(text.encode("utf-8"))
            assert got[i].comp_len == len(zlib.compress(text.encode("utf-8"), 6))

    def test_null_and_empty_text(self, spark):
        from syncflux_spark.operators.textops import compression_stats

        rows = [(1, None), (2, "")]
        got = {
            r.doc_id: r
            for r in compression_stats(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect()
        }
        assert got[1].raw_len == 0 and got[2].raw_len == 0
        # zlib of b"" is the 8-byte empty deflate stream, not 0
        assert got[1].comp_len == got[2].comp_len > 0
