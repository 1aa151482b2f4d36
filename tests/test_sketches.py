"""Sketch-specific invariants beyond oracle parity: the one-sided
error guarantees that make CMS/Bloom/KMV usable as filters — parity
proves both engines agree; these prove the sketches keep their
contracts (no undercount, no false negative, sane estimate ranges).
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


class TestCountMin:
    def test_estimate_never_undercounts(self, spark, sf_dir):
        rows = QUERIES["cms_user_counts"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.est_n >= r.exact_n, (r.user_id, r.est_n, r.exact_n)
            assert r.overcount == r.est_n - r.exact_n


class TestBloom:
    def test_no_false_negatives(self, spark, sf_dir):
        row = QUERIES["bloom_purchase_filter"](spark, sf_dir).collect()[0]
        # every true member must be claimed: claimed ⊇ members
        assert row.n_claimed >= row.n_members
        assert row.n_false_pos == row.n_claimed - row.n_members
        if row.n_users > row.n_members:
            assert 0.0 <= row.fp_rate <= 1.0


class TestKmvOverlap:
    def test_estimates_in_range(self, spark, sf_dir):
        rows = QUERIES["kmv_set_overlap"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r.jaccard_est <= 1.0
            assert r.est_union >= float(r.n_sample) - 1e-9
            # intersection estimate can't exceed the union estimate
            assert r.est_intersection <= r.est_union + 1e-9
