"""Winnowing fingerprint guarantees (Schleimer-Wilkerson-Aiken '03).

The algorithm's contract: with k-word grams and window w, (1) any
shared word run of length >= w + k - 1 between two documents leaves
at least one SHARED fingerprint; (2) the retained density is about
2/(w+1) of grams; (3) documents too short for one full window
produce no fingerprints but stay in the profile with zeros.
"""

from __future__ import annotations

import itertools

import pytest

from syncflux_spark.operators import dedup as dd

K, W = 3, 4
GUARANTEE = W + K - 1  # shared runs of this many words must be caught


def _distinct_words(n: int, alphabet: str = "bcdfghjklmnpqrstvwxz") -> list:
    gen = ("".join(t) for t in itertools.product(alphabet, repeat=3))
    return list(itertools.islice(gen, n))


@pytest.fixture(scope="module")
def corpus(spark):
    shared = "alpha beta gamma delta epsilon zeta"  # exactly w+k-1 = 6 words
    fill_a = " ".join(_distinct_words(40))
    fill_b = " ".join(_distinct_words(80)[40:])  # disjoint filler
    rows = [
        (1, f"{fill_a} {shared}"),
        (2, f"{shared} {fill_b}"),
        (3, " ".join(_distinct_words(120)[80:])),  # unrelated
        (4, "tiny doc"),  # 2 words < k: zero grams
        (5, "just five little words here"),  # 3 grams < w: no full window
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shared_run_yields_shared_fingerprint(corpus):
    fps = dd.winnow_fingerprints(corpus, k=K, w=W).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # the guarantee: docs 1 and 2 share a 6-word run => >= 1 shared fp
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    # the unrelated doc shares nothing with either
    assert not (by_doc.get(3, set()) & (by_doc[1] | by_doc[2]))


def test_short_docs_profile_zero(corpus):
    prof = {r.doc_id: r for r in dd.winnow_profile(corpus, k=K, w=W).collect()}
    assert set(prof) == {1, 2, 3, 4, 5}  # full corpus column, no drops
    assert prof[4].n_grams == 0 and prof[4].n_fingerprints == 0
    assert prof[4].fp_digest is None
    assert prof[5].n_grams == 3  # 5 words -> 3 grams, but no full window
    assert prof[5].n_fingerprints == 0


def test_density_tracks_theory(corpus):
    # expected density ~ 2/(w+1) = 0.4 on high-entropy text; allow slack
    prof = {r.doc_id: r for r in dd.winnow_profile(corpus, k=K, w=W).collect()}
    d = prof[3].density
    assert 0.15 <= d <= 0.7, d


def test_overlap_pair_found(corpus):
    pairs = dd.winnow_overlap_pairs(
        corpus, k=K, w=W, max_df=10, min_overlap=0.0
    ).collect()
    keys = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in keys
    assert all(p in {(1, 2)} for p in keys), keys


# -- property-based guarantee (pure-python reference implementation) --------

import hashlib as _hashlib

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_fingerprints(doc_words, k=K, w=W):
    """Reference winnowing on plain Python: md5 k-gram hashes,
    distinct window minima over full windows."""
    grams = [
        _hashlib.md5(" ".join(doc_words[i : i + k]).encode()).hexdigest()
        for i in range(len(doc_words) - k + 1)
    ]
    return {
        min(grams[q : q + w]) for q in range(len(grams) - w + 1)
    } if len(grams) >= w else set()


_word = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=40)


@settings(max_examples=25, deadline=None)
@given(a=_doc, b=_doc, run=st.lists(_word, min_size=GUARANTEE, max_size=GUARANTEE))
def test_guarantee_holds_on_random_docs(spark, a, b, run):
    """For ANY two documents sharing an inserted w+k-1-word run, the
    Spark operator must (1) reproduce the pure-python reference
    fingerprints per doc and (2) give the pair >= 1 shared
    fingerprint — the SIGMOD '03 guarantee, property-tested."""
    wa, wb = a + run, run + b
    df = spark.createDataFrame(
        [(1, " ".join(wa)), (2, " ".join(wb))], ["doc_id", "text"]
    )
    got = {}
    for r in dd.winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    # NB: words() splits on whitespace, so the joined text re-splits
    # to exactly wa/wb (generated words are non-empty, no spaces)
    assert got.get(1, set()) == _ref_fingerprints(wa)
    assert got.get(2, set()) == _ref_fingerprints(wb)
    assert got.get(1, set()) & got.get(2, set()), "guarantee violated"
