"""Containment candidate recall: the tiny-doc-quoted-in-huge-doc
shape is the headline target of asymmetric containment dedup, and the
exact regime MinHash banding provably degrades in (collision
probability tracks Jaccard, which the size skew crushes toward 0).
`containment_pairs_exact` must find these pairs deterministically;
this file pins both the miss (banding) and the catch (prefix
filtering), plus equivalence to brute force on a small corpus.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from syncflux_spark.operators import dedup as dd


def _filler(n_chars: int, alphabet: str = "bcdfghjklmnpqrstvwxz") -> str:
    """Deterministic high-entropy filler with no repeated 5-grams:
    stream of distinct 3-letter words from a quote-free alphabet."""
    words = (
        "".join(t) for t in itertools.product(alphabet, repeat=3)
    )
    out = []
    total = 0
    for w in words:
        out.append(w)
        total += len(w) + 1
        if total >= n_chars:
            break
    return " ".join(out)


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    quote = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, quote),  # the tiny doc
        (2, _filler(1500) + " " + quote + " " + _filler(1500)),  # the book
        (3, _filler(900)),  # unrelated long doc (prefix overlap w/ 2)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestIndexedIncrementalDedup:
    def test_index_backed_flags_equal_recompute(self, spark, tmp_path):
        """incremental_dedup_indexed reading build_dedup_index output
        must flag exactly what the recompute path flags — exact dups,
        near dups, and accepted docs."""
        corpus_rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "an entirely different corpus document about spark"),
            (3, "yet another unrelated body of text for the corpus here"),
        ]
        batch_rows = [
            (10, "the quick brown fox jumps over the lazy dog"),  # exact
            (11, "the quick brown fox jumps over the lazy cat"),  # near
            (12, "completely novel content never seen before at all"),
        ]
        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
        idx = str(tmp_path / "idx")
        dd.build_dedup_index(corpus, idx)
        recompute = {
            r.doc_id: (r.exact_dup, r.near_dup, r.accepted)
            for r in dd.incremental_dedup(batch, corpus).collect()
        }
        indexed = {
            r.doc_id: (r.exact_dup, r.near_dup, r.accepted)
            for r in dd.incremental_dedup_indexed(batch, corpus, idx).collect()
        }
        assert indexed == recompute
        assert indexed[10][0] == 1  # exact dup caught
        assert indexed[11][1] == 1  # near dup caught
        assert indexed[12] == (0, 0, 1)  # novel doc accepted


class TestContainmentRecall:
    def test_banding_misses_the_quote_pair(self, skewed_corpus):
        # Jaccard(1,2) ≈ |quote|/|book| ≈ 0.02 → P(band hit) ≈ 1-(1-J⁴)²
        # ≈ 3e-7; with md5 fixed this specific fixture deterministically
        # produces no banding candidate — the documented blind spot.
        got = {
            (r.id_a, r.id_b)
            for r in dd.containment_pairs(skewed_corpus).collect()
        }
        assert (1, 2) not in got

    def test_exact_catches_the_quote_pair(self, skewed_corpus):
        out = {
            (r.id_a, r.id_b): r
            for r in dd.containment_pairs_exact(skewed_corpus).collect()
        }
        assert (1, 2) in out
        r = out[(1, 2)]
        assert r.c_ab == 1.0  # every quote shingle appears in the book
        assert r.c_ba < 0.1  # and the asymmetry is real

    def test_exact_matches_brute_force(self, spark):
        # 12 docs with overlapping repeated phrases: prefix filtering
        # must emit EXACTLY the pairs brute-force containment does
        base = [
            "alpha beta gamma delta epsilon zeta",
            "one two three four five six seven eight",
            "lorem ipsum dolor sit amet consectetur",
        ]
        rows = []
        for i in range(12):
            b = base[i % 3]
            rows.append((i, b if i < 6 else b + " " + _filler(40 + 13 * i)))
        df = spark.createDataFrame(rows, "doc_id long, text string")

        sh = df.select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(length(text)-4, 0)), "
                    "i -> substring(text, i, 5))"
                )
            ).alias("sh"),
        ).where(F.size("sh") > 0)
        a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
        b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
        brute = (
            a.crossJoin(b)
            .where(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                (
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size("sh_a")
                ).alias("c_ab"),
                (
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size("sh_b")
                ).alias("c_ba"),
            )
            .where((F.col("c_ab") >= 0.8) | (F.col("c_ba") >= 0.8))
        )
        expected = {(r.id_a, r.id_b) for r in brute.collect()}
        got = {
            (r.id_a, r.id_b)
            for r in dd.containment_pairs_exact(df).collect()
        }
        assert got == expected and expected  # non-trivial fixture


class TestDuplicateSpans:
    """Planted-passage recall + span-merge exactness for the
    substring-dedup operator (Lee et al. 2022 shape)."""

    def _df(self, spark):
        import random

        rng = random.Random(7)
        alpha = "abcdefghijklmnopqrstuvwxyz "
        rand = lambda n: "".join(rng.choice(alpha) for _ in range(n))
        quote = "the quick brown fox jumps over the lazy dog near the riverbank"
        rows = [
            ("a", rand(200) + quote + rand(200)),
            ("b", rand(150) + quote + rand(250)),
            ("c", rand(400)),  # no duplication
            ("d", "tiny"),  # shorter than span_len: must not explode
        ]
        return spark.createDataFrame(rows, "doc_id string, text string")

    def test_planted_quote_found_and_merged(self, spark):
        from syncflux_spark.operators import dedup as dd

        spans = dd.duplicate_spans(self._df(spark), span_len=40).collect()
        by_doc = {}
        for r in spans:
            by_doc.setdefault(r.doc_id, []).append(r)
        # the quote is one contiguous island in each carrier, covering
        # at least the full quote length
        assert set(by_doc) == {"a", "b"}
        for doc, start in (("a", 201), ("b", 151)):
            (s,) = by_doc[doc]
            assert s.span_start == start
            assert s.span_chars >= 62  # full quote covered
            assert s.span_end - s.span_start == s.span_chars

    def test_fraction_covers_all_docs(self, spark):
        from syncflux_spark.operators import dedup as dd

        out = dd.duplicate_char_fraction(self._df(spark), span_len=40)
        rows = {r.doc_id: r for r in out.collect()}
        assert set(rows) == {"a", "b", "c", "d"}
        assert rows["c"].dup_fraction == 0.0 and rows["d"].dup_fraction == 0.0
        assert 0 < rows["a"].dup_fraction < 1


class TestSortedNeighborhood:
    def test_global_rank_returns_total_without_second_pass(self, spark):
        """return_total hands back the row count the offset pass
        already computed, so rank-arithmetic consumers (exact
        quantiles) don't run a second count() job over the data."""
        from pyspark.sql import functions as F

        from syncflux_spark.utils import global_rank

        df = spark.range(321).select((F.col("id") % 9).alias("k"), "id")
        ranked, total = global_rank(
            df, ["k", "id"], n_ranges=5, return_total=True
        )
        assert total == 321
        assert ranked.agg(F.max("_rank")).collect()[0][0] == 321

    def test_global_rank_matches_single_partition(self, spark):
        from syncflux_spark.utils import global_rank
        from pyspark.sql import Window
        import pyspark.sql.functions as F

        df = spark.range(500).select(
            (F.col("id") * 37 % 101).alias("k"), F.col("id")
        )
        got = {
            (r.k, r.id): r._rank
            for r in global_rank(df, ["k", "id"], n_ranges=7).collect()
        }
        want = {
            (r.k, r.id): r.rn
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy("k", "id"))
            ).collect()
        }
        assert got == want

    def test_prefix_near_dups_found(self, spark):
        from syncflux_spark.operators import dedup as dd

        rows = [
            ("a", "The quick brown fox jumps over the lazy dog today"),
            ("b", "The quick brown fox jumps over the lazy dog tonight"),
            ("c", "completely different text about spark execution plans"),
            ("d", "zebra crossing patterns in urban traffic design"),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        pairs = {
            (r.id_a, r.id_b)
            for r in dd.sorted_neighborhood_pairs(
                df, window=2, threshold=0.5
            ).collect()
        }
        assert ("a", "b") in pairs
        assert all(p[0] != p[1] for p in pairs)


class TestVerifyFingerprintDial:
    def test_modes_agree(self, spark, sf_dir):
        """Both dial positions must produce identical pair sets and
        counts — the representation changes, the set math doesn't."""
        from syncflux_spark.operators import dedup as dd
        from syncflux_spark.sources.parquet import load_table

        docs = load_table(spark, sf_dir, "documents").limit(150)
        h = {
            (r.id_a, r.id_b): (r.n_inter, r.n_union)
            for r in dd.ngram_jaccard_pairs(
                docs, threshold=0.5, fingerprint="hash64"
            ).collect()
        }
        s = {
            (r.id_a, r.id_b): (r.n_inter, r.n_union)
            for r in dd.ngram_jaccard_pairs(
                docs, threshold=0.5, fingerprint="string"
            ).collect()
        }
        assert h == s and len(h) > 0

    def test_exact_containment_modes_agree(self, spark, sf_dir):
        from syncflux_spark.operators import dedup as dd
        from syncflux_spark.sources.parquet import load_table

        docs = load_table(spark, sf_dir, "documents").limit(120)
        kw = dict(k_shingle=8, threshold=0.7)
        h = {
            (r.id_a, r.id_b): r.n_inter
            for r in dd.containment_pairs_exact(
                docs, fingerprint="hash64", **kw
            ).collect()
        }
        s = {
            (r.id_a, r.id_b): r.n_inter
            for r in dd.containment_pairs_exact(
                docs, fingerprint="string", **kw
            ).collect()
        }
        assert h == s

    def test_word_jaccard_modes_agree_and_match_brute_force(
        self, spark, sf_dir
    ):
        """r12 verify slimming for word_jaccard_all_pairs: the hash64
        fingerprint dial and the AllPairs length filter must change
        NOTHING about the output — both modes equal, and both equal a
        brute-force all-pairs word Jaccard (which uses neither the
        prefix filter, the length filter, nor fingerprints)."""
        from syncflux_spark.functions.text import words
        from syncflux_spark.operators import dedup as dd
        from syncflux_spark.sources.parquet import load_table

        docs = load_table(spark, sf_dir, "documents").limit(120)
        t = 0.6
        h = {
            (r.id_a, r.id_b): (r.n_inter, r.n_union)
            for r in dd.word_jaccard_all_pairs(
                docs, threshold=t, fingerprint="hash64"
            ).collect()
        }
        s = {
            (r.id_a, r.id_b): (r.n_inter, r.n_union)
            for r in dd.word_jaccard_all_pairs(
                docs, threshold=t, fingerprint="string"
            ).collect()
        }
        assert h == s and len(h) > 0
        sets = docs.select(
            "doc_id", F.array_distinct(words("text")).alias("ws")
        )
        a, b = sets.alias("a"), sets.alias("b")
        brute = {
            (r.id_a, r.id_b): (r.n_inter, r.n_union)
            for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.size(F.array_intersect("a.ws", "b.ws")).alias("n_inter"),
                (
                    F.size("a.ws") + F.size("b.ws")
                    - F.size(F.array_intersect("a.ws", "b.ws"))
                ).alias("n_union"),
            )
            .where(F.col("n_inter") / F.col("n_union") >= t)
            .collect()
        }
        assert h == brute

    def test_bad_mode_rejected(self):
        import pytest as _pytest

        from syncflux_spark.operators.dedup import verify_fingerprint_mode

        with _pytest.raises(ValueError, match="hash64"):
            verify_fingerprint_mode("md5")
        assert verify_fingerprint_mode(None, default="string") == "string"


class TestHotBucketStarCollapse:
    """The r10 scale dial: buckets above bucket_cap emit the star
    around their minimum instead of the O(c²) clique (found by the
    x100 disk wall — SCALE.md r10). Pin the exact edge set on a
    constructed hot bucket and the connectivity-preservation claim."""

    @pytest.fixture()
    def hot_corpus(self, spark):
        # five byte-identical docs: every band bucket holds all five
        # (one hot cluster), plus two unrelated singleton docs
        same = "the same exact sentence repeated for banding " * 3
        rows = [(i, same) for i in range(10, 15)] + [
            (20, "first completely unrelated text with private words"),
            (21, "second disjoint document nothing shared here at all"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_star_edges_replace_clique(self, hot_corpus):
        uncapped = {
            (r.id_a, r.id_b)
            for r in dd.lsh_candidate_pairs(hot_corpus).collect()
        }
        capped = {
            (r.id_a, r.id_b)
            for r in dd.lsh_candidate_pairs(
                hot_corpus, bucket_cap=3
            ).collect()
        }
        # clique on {10..14}: 10 pairs; star around min=10: 4 edges
        assert uncapped == {
            (a, b)
            for a in range(10, 15)
            for b in range(a + 1, 15)
        }
        assert capped == {(10, b) for b in range(11, 15)}

    def test_cap_not_binding_is_identity(self, hot_corpus):
        uncapped = sorted(
            map(tuple, dd.lsh_candidate_pairs(hot_corpus).collect())
        )
        big_cap = sorted(
            map(
                tuple,
                dd.lsh_candidate_pairs(hot_corpus, bucket_cap=5).collect(),
            )
        )
        assert big_cap == uncapped

    def test_components_preserved_under_cap(self, hot_corpus):
        """Star spans the same component as the clique, so the
        unverified-graph clustering is invariant; with verification,
        byte-identical members (Jaccard 1.0) also survive intact."""
        base = {
            (r.doc_id, r.component)
            for r in dd.duplicate_components(hot_corpus).collect()
        }
        capped = {
            (r.doc_id, r.component)
            for r in dd.duplicate_components(
                hot_corpus, bucket_cap=3
            ).collect()
        }
        assert capped == base
        assert {(i, 10) for i in range(10, 15)} <= base

    def test_bad_cap_rejected(self, hot_corpus):
        with pytest.raises(ValueError, match="bucket_cap"):
            dd.lsh_candidate_pairs(hot_corpus, bucket_cap=0).collect()


class TestAutoCap:
    """bucket_cap="auto" (r11, the default): cap = clamp(discrete-p99
    bucket size, floor, ceiling) resolved from the census HISTOGRAM.
    Pin the resolver arithmetic, the not-binding-is-bit-identity
    claim, and equivalence of auto to the explicit cap it resolves."""

    # ---- pure resolver arithmetic (mirrored verbatim by the *_auto
    # oracle SQL — the same cases the driver gate rides) ----

    def test_resolver_empty_histogram_is_floor(self):
        assert dd.resolve_auto_cap([], 64, 512) == 64

    def test_resolver_floor_wins_on_singleton_corpora(self):
        # 1000 singleton buckets: p99 = 1 → clamped up to floor
        assert dd.resolve_auto_cap([(1, 1000)], 64, 512) == 64

    def test_resolver_p99_wins_between_clamps(self):
        # 99 singletons + 1 bucket of 100: ceil(.99*100)=99 → p99 = 1;
        # 98 singletons + 2 of 100: ceil(.99*100)=99 → falls on the
        # second group → p99 = 100
        assert dd.resolve_auto_cap([(1, 99), (100, 1)], 2, 512) == 2
        assert dd.resolve_auto_cap([(1, 98), (100, 2)], 2, 512) == 100

    def test_resolver_ceiling_clamps_degenerate_majority(self):
        # the 16-bucket clustered-embedding shape: p99 = max → only
        # the ceiling can save it
        assert dd.resolve_auto_cap([(20000, 16)], 64, 2048) == 2048

    def test_resolver_validates_clamps(self):
        with pytest.raises(ValueError, match="auto_floor"):
            dd.resolve_auto_cap([(1, 10)], 0, 512)
        with pytest.raises(ValueError, match="auto_ceiling"):
            dd.resolve_auto_cap([(1, 10)], 64, 63)

    def test_bool_and_junk_caps_rejected(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="bucket_cap"):
            dd.lsh_candidate_pairs(df, bucket_cap=True)
        with pytest.raises(ValueError, match="bucket_cap"):
            dd.lsh_candidate_pairs(df, bucket_cap="always")

    # ---- end-to-end over a constructed hot corpus ----

    @pytest.fixture()
    def hot_corpus(self, spark):
        same = "the same exact sentence repeated for banding " * 3
        rows = [(i, same) for i in range(10, 15)] + [
            (20, "first completely unrelated text with private words"),
            (21, "second disjoint document nothing shared here at all"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_default_auto_not_binding_is_identity(self, hot_corpus):
        """Default floor 64 ≫ the 5-member hot bucket: the default
        plan must equal the explicit opt-out bit-for-bit."""
        auto = sorted(
            map(tuple, dd.lsh_candidate_pairs(hot_corpus).collect())
        )
        uncapped = sorted(
            map(
                tuple,
                dd.lsh_candidate_pairs(hot_corpus, bucket_cap=None).collect(),
            )
        )
        assert auto == uncapped

    def test_auto_binding_equals_resolved_explicit_cap(self, hot_corpus):
        """With tight clamps the auto path must produce exactly the
        edge set of the explicit cap it resolves to."""
        bands = dd.band_keys(hot_corpus)
        hist_rows = (
            bands.groupBy("band_id", "band_key")
            .count()
            .groupBy("count")
            .count()
            .collect()
        )
        hist = [(int(r[0]), int(r[1])) for r in hist_rows]
        cap = dd.resolve_auto_cap(hist, 2, 3)
        assert max(c for c, _ in hist) > cap  # the fixture binds
        auto = sorted(
            map(
                tuple,
                dd.lsh_candidate_pairs(
                    hot_corpus, auto_floor=2, auto_ceiling=3
                ).collect(),
            )
        )
        explicit = sorted(
            map(
                tuple,
                dd.lsh_candidate_pairs(hot_corpus, bucket_cap=cap).collect(),
            )
        )
        assert auto == explicit
        # and the star actually engaged: fewer edges than the clique
        uncapped = dd.lsh_candidate_pairs(
            hot_corpus, bucket_cap=None
        ).count()
        assert len(auto) < uncapped

    def test_components_survive_auto_binding(self, hot_corpus):
        """Connectivity invariance holds through the auto path too."""
        base = {
            (r.doc_id, r.component)
            for r in dd.duplicate_components(
                hot_corpus, bucket_cap=None
            ).collect()
        }
        auto = {
            (r.doc_id, r.component)
            for r in dd.duplicate_components(
                hot_corpus, auto_floor=2, auto_ceiling=3
            ).collect()
        }
        assert auto == base


class TestEmbeddingAutoCap:
    """The embedding flavor: near_dup_pairs bucket_cap='auto'."""

    @pytest.fixture()
    def clustered(self, spark):
        # 12 near-identical vectors (one tight cluster → one sign
        # bucket at any plane count) + 3 well-separated singletons
        import math

        rows = []
        for i in range(12):
            v = [1.0] * 8
            v[i % 8] += 0.01 * (i + 1)
            rows.append((i, v))
        rows += [
            (100, [(-1.0) ** d * (d + 1.0) for d in range(8)]),
            (101, [math.sin(d + 1.0) * 5 for d in range(8)]),
            (102, [-3.0 if d < 4 else 2.0 for d in range(8)]),
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_default_auto_not_binding_is_identity(self, clustered):
        from syncflux_spark.operators.similarity import near_dup_pairs

        auto = sorted(
            map(
                tuple,
                near_dup_pairs(
                    clustered, threshold=0.9, n_planes=3, dim=8
                ).collect(),
            )
        )
        uncapped = sorted(
            map(
                tuple,
                near_dup_pairs(
                    clustered,
                    threshold=0.9,
                    n_planes=3,
                    dim=8,
                    bucket_cap=None,
                ).collect(),
            )
        )
        assert auto == uncapped

    def test_auto_binding_equals_resolved_explicit(self, clustered):
        from syncflux_spark.operators.similarity import near_dup_pairs

        # floor 2 / ceiling 4: the 12-member cluster bucket exceeds
        # any resolvable cap in [2, 4] → star engages
        auto = sorted(
            map(
                tuple,
                near_dup_pairs(
                    clustered,
                    threshold=0.9,
                    n_planes=3,
                    dim=8,
                    auto_floor=2,
                    auto_ceiling=4,
                ).collect(),
            )
        )
        explicit = sorted(
            map(
                tuple,
                near_dup_pairs(
                    clustered,
                    threshold=0.9,
                    n_planes=3,
                    dim=8,
                    bucket_cap=4,
                ).collect(),
            )
        )
        # p99 of this census is the cluster size (few buckets → p99 =
        # max) so the ceiling 4 is the resolved cap
        assert auto == explicit
        assert len(auto) > 0

    def test_tiny_target_bucket_size_does_not_raise(self, clustered):
        """target_bucket_size < AUTO_CAP_FLOOR/2 used to derive a
        ceiling below the floor and raise about parameters the caller
        never passed (ADVICE r11); the derived ceiling now clamps to
        the floor (auto band collapses to cap = floor)."""
        from syncflux_spark.operators.similarity import near_dup_pairs

        out = near_dup_pairs(
            clustered, threshold=0.9, dim=8, target_bucket_size=8
        ).collect()
        assert len(out) > 0


class TestHotSetShuffleFallback:
    """The auto path's no-broadcast branch (hot count >
    HOT_BROADCAST_MAX): values must be identical to the broadcast
    path — the bound changes the JOIN STRATEGY, never the answer."""

    def test_text_fallback_values_identical(self, spark, monkeypatch):
        same = "the same exact sentence repeated for banding " * 3
        rows = [(i, same) for i in range(10, 15)] + [
            (20, "first completely unrelated text with private words"),
            (21, "second disjoint document nothing shared here at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        bcast = sorted(
            map(
                tuple,
                dd.lsh_candidate_pairs(
                    df, auto_floor=2, auto_ceiling=3
                ).collect(),
            )
        )
        monkeypatch.setattr(dd, "HOT_BROADCAST_MAX", 0)
        fallback = sorted(
            map(
                tuple,
                dd.lsh_candidate_pairs(
                    df, auto_floor=2, auto_ceiling=3
                ).collect(),
            )
        )
        assert fallback == bcast and len(fallback) > 0

    def test_embedding_fallback_values_identical(self, spark, monkeypatch):
        import math

        from syncflux_spark.operators import dedup as dmod
        from syncflux_spark.operators.similarity import near_dup_pairs

        rows = []
        for i in range(12):
            v = [1.0] * 8
            v[i % 8] += 0.01 * (i + 1)
            rows.append((i, v))
        rows += [
            (100, [(-1.0) ** d * (d + 1.0) for d in range(8)]),
            (101, [math.sin(d + 1.0) * 5 for d in range(8)]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        def run():
            return sorted(
                map(
                    tuple,
                    near_dup_pairs(
                        df,
                        threshold=0.9,
                        n_planes=3,
                        dim=8,
                        auto_floor=2,
                        auto_ceiling=4,
                    ).collect(),
                )
            )

        bcast = run()
        monkeypatch.setattr(dmod, "HOT_BROADCAST_MAX", 0)
        fallback = run()
        assert fallback == bcast and len(fallback) > 0
