"""Synthesize scaled copies of documents/embeddings/events for slope
measurement (SCALE.md's measured-exponent table).

The driver's testdata stops at sf0.1, so every 100 TB claim was a
design argument. This generates statistically-similar corpora at 1x,
3x and 10x the sf0.1 row counts — same schemas, same vocabulary
style, a deliberate near-duplicate fraction, clustered embeddings —
so the expensive operator family can be TIMED against scale and the
wall-time exponent fitted. Slope measurement needs shape, not oracle
parity: the generators are seeded and deterministic but independent
of the driver's.

Output: ``/tmp/syncflux_scale/x{1,3,10}/{documents,embeddings,
events}.parquet`` plus symlinks to the sf0.1 TPC-H tables (so any
query's side lookups still resolve). Never writes inside
/root/testdata.

Usage: python tools/gen_scale_data.py [--base /root/testdata/sf0.1]
                                      [--out /tmp/syncflux_scale]

``--zipf-vocab N`` (r13) swaps the 44-word vocabulary for an N-word
zipfian one (exponent ``--zipf-s``, default 1.07 — web-corpus-like).
The 44-word corpus makes word-SET similarity degenerate: every pair
of 40-80-word docs shares most of the vocabulary, so at t=0.8
essentially all C(n,2) pairs qualify and any word-family measurement
times the Θ(n²) OUTPUT, not the algorithm (SCALE.md r12). A 50k-word
zipfian draw gives realistic selectivity — random pairs share only
stop-words (which prefix filtering excludes by construction), near-dup
tail pairs still qualify — so prefix/positional-filter candidate
masses can actually be measured. Write zipf corpora to a SEPARATE
--out (default appends ``_zipf``) so the char-shingle fixtures and
their recorded slopes stay untouched.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: sf0.1 row counts (the 1x anchor).
BASE_DOCS, BASE_VECS, BASE_EVENTS = 5_000, 2_000, 100_000

_VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window table vector join scan "
    "merge read write page block index shard stream state plan stage task"
).split()
_LANGS = ["en", "de", "fr", "es", "it"]
_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def zipf_vocab(size: int) -> list[str]:
    """Deterministic synthetic vocabulary: short low-rank "stop words"
    through long rare tails, so token length correlates with rarity
    like real text (matters only for char-shingle realism)."""
    import hashlib

    out = []
    for i in range(size):
        h = hashlib.md5(f"zv{i}".encode()).hexdigest()
        ln = 2 + min(10, int(np.log2(i + 2)))  # rank 0 → 3 chars, tail → 12
        out.append(h[:ln])
    return out


def gen_documents_zipf(
    n: int, rng: np.random.RandomState, vocab_size: int, s: float
) -> pa.Table:
    """:func:`gen_documents` with a ``vocab_size``-word zipfian draw
    (P(rank r) ∝ 1/r^s) — realistic word-level selectivity; same
    doc-length range, same ~5% mutate-one-word near-duplicate tail,
    same schema. Bulk-vectorized (one choice() over all docs' words;
    the per-doc loop at 44 words was fine, at 9M draws it is not)."""
    vocab = np.array(zipf_vocab(vocab_size))
    p = 1.0 / np.power(np.arange(1, vocab_size + 1, dtype=np.float64), s)
    p /= p.sum()
    lens = rng.randint(40, 80, size=n)
    flat = rng.choice(vocab_size, size=int(lens.sum()), p=p)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    texts: list[str] = []
    dup_draws = rng.rand(n)
    for i in range(n):
        if i > 0 and dup_draws[i] < 0.05:
            words = texts[rng.randint(0, i)].split()
            words[rng.randint(0, len(words))] = vocab[
                rng.choice(vocab_size, p=p)
            ]
            texts.append(" ".join(words))
        else:
            texts.append(" ".join(vocab[flat[bounds[i]:bounds[i + 1]]]))
    langs = [_LANGS[j] for j in rng.randint(0, len(_LANGS), size=n)]
    sources = [f"src{j}" for j in rng.randint(0, 20, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def gen_documents(n: int, rng: np.random.RandomState) -> pa.Table:
    """Word-salad docs (~50-70 words from a small vocab) with a ~5%
    near-duplicate tail: a dup re-samples a prior doc and mutates one
    word — enough shared shingles to band together, like the driver
    corpus's 4992-distinct-of-5000 shape."""
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.rand() < 0.05:
            words = texts[rng.randint(0, i)].split()
            words[rng.randint(0, len(words))] = _VOCAB[
                rng.randint(0, len(_VOCAB))
            ]
            texts.append(" ".join(words))
        else:
            k = rng.randint(40, 80)
            idx = rng.randint(0, len(_VOCAB), size=k)
            texts.append(" ".join(_VOCAB[j] for j in idx))
    langs = [_LANGS[j] for j in rng.randint(0, len(_LANGS), size=n)]
    sources = [f"src{j}" for j in rng.randint(0, 20, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def gen_embeddings(n: int, rng: np.random.RandomState, dim: int = 64) -> pa.Table:
    """Unit-norm random 64-dim float32 vectors matching the driver
    corpus's measured shape (no label/cluster structure; at the
    near-dup threshold 0.3 a constant ~0.75% of ALL pairs qualify by
    random-cosine mass alone, so pair counts scale quadratically — a
    property of the DATA+threshold, which the slope run must
    reproduce, not hide), plus a 2% true-duplicate tail (copy + tiny
    noise, cos > 0.999) so high-threshold dedup paths see a linear
    duplicate mass too. A first draft used 10 TIGHT clusters instead:
    intra-cluster cosine ≈ 0.94 made ~10% of all pairs 'near-dups'
    and x10 emb_dedup_components took 252s on pair volume no real
    corpus has — matching the measured distribution matters."""
    vecs = rng.randn(n, dim).astype(np.float32)
    dup_mask = rng.rand(n) < 0.02
    for i in np.flatnonzero(dup_mask):
        if i == 0:
            continue
        j = rng.randint(0, i)
        vecs[i] = vecs[j] + rng.randn(dim).astype(np.float32) * 0.01
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    labels = rng.randint(0, 10, size=n).astype(np.int32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                list(vecs), type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels),
        }
    )


def gen_events(n: int, rng: np.random.RandomState) -> pa.Table:
    """30 days of events, user ids scaled with volume (constant
    events/user, like the driver corpus's 100k rows / 1.5k users)."""
    n_users = max(1, int(1500 * n / BASE_EVENTS))
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 24 * 3600 * 1_000_000, "us")
    offs = np.sort(rng.rand(n)) * span.astype(np.int64)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(t0 + offs.astype("timedelta64[us]")),
            "user_id": pa.array(
                rng.randint(0, n_users, size=n).astype(np.int64)
            ),
            "event_type": pa.array(
                [_EVENT_TYPES[j] for j in rng.randint(0, 5, size=n)]
            ),
            "value": pa.array(rng.rand(n) * 100.0),
            "props": pa.array(
                [f'{{"k": {j}}}' for j in rng.randint(0, 100, size=n)]
            ),
        }
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument(
        "--zipf-vocab",
        type=int,
        default=0,
        help="documents vocabulary size with zipfian draw (0 = the "
        "original 44-word vocab)",
    )
    ap.add_argument("--zipf-s", type=float, default=1.07)
    ns = ap.parse_args()
    if ns.out is None:
        ns.out = (
            "/tmp/syncflux_scale_zipf" if ns.zipf_vocab else "/tmp/syncflux_scale"
        )
    for mult in [int(s) for s in ns.scales.split(",")]:
        d = os.path.join(ns.out, f"x{mult}")
        os.makedirs(d, exist_ok=True)
        rng = np.random.RandomState(42)  # same stream prefix per scale
        docs = (
            gen_documents_zipf(BASE_DOCS * mult, rng, ns.zipf_vocab, ns.zipf_s)
            if ns.zipf_vocab
            else gen_documents(BASE_DOCS * mult, rng)
        )
        pq.write_table(
            docs,
            os.path.join(d, "documents.parquet"),
        )
        pq.write_table(
            gen_embeddings(BASE_VECS * mult, rng),
            os.path.join(d, "embeddings.parquet"),
        )
        pq.write_table(
            gen_events(BASE_EVENTS * mult, rng),
            os.path.join(d, "events.parquet"),
        )
        for f in os.listdir(ns.base):
            if f.endswith(".parquet") and not os.path.exists(
                os.path.join(d, f)
            ):
                os.symlink(os.path.join(ns.base, f), os.path.join(d, f))
        print(f"wrote {d} (x{mult})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
