"""Deduplication operators for large-scale training-data pipelines.

Four families, all shaped for 100 TB:

* **Exact** — hash-groupBy on a content digest. One shuffle on the
  digest; map-side partial agg collapses duplicates before the
  exchange, so shuffle volume is ~one row per distinct document.
* **Normalized exact** — same, over canonicalized text (case-folded,
  whitespace-collapsed), catching trivial reformat dups.
* **MinHash + LSH** — shingle → k seeded min-hashes → band buckets →
  candidate pairs via self-join on (band_id, band_key) → exact
  Jaccard verify on candidates only. The self-join shuffles on the
  band key, never on full text; candidate verification is
  |candidates| work instead of O(n²). Hashes are md5 hex strings so
  the DuckDB oracle reproduces them bit-for-bit.
* **SimHash** — near-dup via Hamming-adjacent fingerprint buckets.
* **Embedding near-dup** — cosine-threshold pairs, LSH-bucketed by
  sign pattern (see operators/similarity.py for the general k-NN).
* **Exact substring spans** — the Lee et al. '22 substring-dedup
  shape: linear position explode → md5 window key → cross-doc
  window filter → gaps-and-islands merge (duplicate_spans).
* **Sorted neighborhood** — Hernández-Stolfo candidates over a
  range-exchanged global rank: O(n·w) pairs by construction, the
  no-bucket-skew complement to banding.
* **Inverted-index cosine** — Bayardo '07 all-pairs with df-gated
  postings and exact integer dot products (doc_cosine_pairs).

References: MinHash banding per Broder '97 / MMDS ch.3; the engine
treats these as first-class queries (BASELINE.json north star), not
ports of anything in /root/reference (which has no dedup surface).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from syncflux_spark.functions.text import char_shingles, shingles_of_words, words
from syncflux_spark.utils import eager_persist, loop_checkpoint, spread_for_cpu


def verify_fingerprint_mode(mode: str | None = None, default: str = "hash64") -> str:
    """Verify-side shingle representation dial for the LSH/containment
    verify stages: ``hash64`` (xxhash64 fingerprints — ~8× fewer
    shuffle bytes, counts exact modulo a m²/2⁶⁵-per-pair collision
    bound) vs ``string`` (raw shingles — no hash CPU). The A/B note in
    :func:`containment_pairs_exact` shows the optimum flips with the
    shuffle medium: locally the hash CPU dominates, on a
    network-shuffle cluster the byte reduction does. Per-call ``mode``
    wins; else the ``SYNCFLUX_VERIFY_FP`` env var; else the
    operator's measured-local default."""
    m = mode or os.environ.get("SYNCFLUX_VERIFY_FP") or default
    if m not in ("hash64", "string"):
        raise ValueError(
            f"verify fingerprint mode must be 'hash64' or 'string', got {m!r}"
        )
    return m


def _verify_arrays(
    df: DataFrame, text_col: str, id_col: str, k_shingle: int, mode: str
) -> DataFrame:
    """(id, shingle array) for a verify stage, fingerprinted per the
    dial — intersect/union semantics identical in either mode."""
    base = shingle_sets(df, text_col, id_col, k_shingle)
    if mode == "hash64":
        return base.select(
            F.col(id_col),
            F.transform("_sh", lambda s: F.xxhash64(s)).alias("sh"),
        )
    return base.select(F.col(id_col), F.col("_sh").alias("sh"))

#: MinHash layout: 8 hash lanes → 2 bands of 4. Candidate probability
#: 1-(1-J⁴)² targets the true near-duplicate regime (J≳0.7). Wider
#: bands (band_size=2) flood the candidate set on
#: vocabulary-homogeneous corpora — 753k candidates vs 12.8k on the
#: sf0.1 fixture — so precision is the scale lever here.
#:
#: The 8 lanes are *slices* of ONE md5 digest per shingle (32 hex
#: chars → 8 lanes × 4 hex chars = 16 bits each), not 8
#: independently-seeded md5 calls: md5 is the only hash both Spark
#: and the DuckDB oracle compute bit-identically, and slicing cuts the
#: digest work per shingle 8× (measured 8.9s → ~1.2s for the sf0.1
#: signature stage). Non-overlapping slices of a cryptographic digest
#: are independent uniform draws, which is all MinHash needs. 16-bit
#: lanes admit a ~n/2^17 chance min-collision between unrelated docs
#: (n ≈ shingles/doc) — that only ADDS candidates, never drops true
#: pairs, and the exact-Jaccard verify stage filters them; the 4-lane
#: (64-bit) band key keeps bucket skew bounded.
N_MINHASH = 8
BAND_SIZE = 4
LANE_WIDTH = 4  # hex chars per lane (16 bits)

#: AUTO-CAP: the default position of the hot-bucket star-collapse
#: dial (r11, closing the r10 verdict's "dial exists but the default
#: is the wall"). ``bucket_cap="auto"`` derives the cap from the
#: bucket census itself:
#:
#:     cap = clamp(p99_bucket_count, AUTO_CAP_FLOOR, ceiling)
#:
#: * p99 = the exact discrete 99th-percentile bucket size (smallest
#:   count whose cumulative bucket frequency reaches ceil(0.99 ×
#:   n_buckets)) — on a BENIGN corpus, where big buckets are common
#:   enough to be the corpus's real duplicate structure, p99 rises to
#:   meet them and the clique semantics stay exact;
#: * FLOOR — buckets this small are never collapsed, so tiny corpora
#:   and ordinary duplicate groups always get exact pair semantics
#:   (the local test fixtures' max band bucket is 4-20, far below);
#: * ceiling — the absolute survival bound. The verify join's cost
#:   per bucket is c·(c−1)/2 pairs × two fingerprint payloads; disk
#:   and executor memory do NOT grow with the corpus, so past some c
#:   the clique is un-runnable no matter how "real" the bucket is
#:   (the r10 x100 wall: 33 buckets > 1000 members = 62% of 120.9M
#:   pairs = >78 GB of spill). The ceiling turns exactly those
#:   buckets into O(c) stars. 512 caps a bucket's clique at ~131k
#:   pairs. The p99-only rule fails precisely when degenerate
#:   buckets are the MAJORITY of mass (a 16-bucket sign-LSH table of
#:   clustered embeddings: p99 = max → no collapse → wall); the
#:   ceiling is what makes auto survive that case.
#:
#: The census is a map-side-combined groupBy of the (already
#: persisted) band rows, and the cap is resolved from its count-of-
#: counts HISTOGRAM — O(distinct bucket sizes) driver rows, never
#: O(buckets), so resolution is scale-free. When no bucket exceeds
#: the resolved cap the operator returns the EXACT uncapped plan
#: (no hot/cold split, no extra joins) — auto is bit-identical to
#: ``bucket_cap=None`` everywhere the wall isn't.
AUTO_CAP_P = 0.99
AUTO_CAP_FLOOR = 64
AUTO_CAP_CEILING = 512
#: hot-set broadcast bound (auto mode only — the census histogram
#: makes the hot-bucket COUNT known on the driver for free): above
#: this many over-cap buckets the hot/cold/star joins fall back to
#: shuffle joins instead of shipping an oversized broadcast (~60 B
#: per hot bucket row for text, 8·dim B for embedding mins). With a
#: manual int cap no census exists and the caller owns the bound —
#: see the operator docstrings.
HOT_BROADCAST_MAX = 200_000


def auto_cap_stats(
    hist: list[tuple[int, int]],
    floor: int = AUTO_CAP_FLOOR,
    ceiling: int = AUTO_CAP_CEILING,
) -> tuple[int, int, int, int]:
    """Auto-cap derivation with its decision inputs exposed:
    ``(n_buckets, max_bucket, p99, cap)`` from a bucket-size histogram
    ``[(bucket_size, n_buckets_of_that_size), ...]`` (any order), with
    ``cap = min(ceiling, max(floor, p99))`` and p99 the exact discrete
    99th-percentile bucket size (smallest size whose cumulative bucket
    frequency reaches ceil(0.99 × n_buckets); 0 on an empty corpus).
    Pure arithmetic on the histogram — the driver never sees
    per-bucket rows — and mirrored verbatim by the oracle SQL of the
    ``lsh_auto_cap`` / ``*_auto`` registered queries, so the
    derivation itself is value-hash-gated."""
    if floor < 1:
        raise ValueError(f"auto_floor must be >= 1, got {floor}")
    if ceiling < floor:
        raise ValueError(
            f"auto_ceiling must be >= auto_floor, got {ceiling} < {floor}"
        )
    rows = sorted(hist)
    n = sum(f for _, f in rows)
    if n == 0:
        return (0, 0, 0, floor)
    idx = math.ceil(AUTO_CAP_P * n)
    cum = 0
    p99 = int(rows[-1][0])
    for c, f in rows:
        cum += f
        if cum >= idx:
            p99 = int(c)
            break
    return (n, int(rows[-1][0]), p99, min(ceiling, max(floor, p99)))


def resolve_auto_cap(
    hist: list[tuple[int, int]],
    floor: int = AUTO_CAP_FLOOR,
    ceiling: int = AUTO_CAP_CEILING,
) -> int:
    """The cap alone — see :func:`auto_cap_stats`."""
    return auto_cap_stats(hist, floor, ceiling)[3]


def _validate_bucket_cap(bucket_cap) -> None:
    if bucket_cap is None or bucket_cap == "auto":
        return
    if isinstance(bucket_cap, bool) or not isinstance(bucket_cap, int):
        raise ValueError(
            f"bucket_cap must be an int >= 1, None, or 'auto', got {bucket_cap!r}"
        )
    if bucket_cap < 1:
        raise ValueError(f"bucket_cap must be >= 1, got {bucket_cap}")


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate groups by exact content digest: (digest, representative
    id = min id, group size). Keep `keep_id`, drop the rest."""
    digest = F.md5(F.col(text_col)).alias("digest")
    return df.groupBy(digest).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def normalized_text(text_col: str = "text") -> F.Column:
    """Canonical form: lowercase, collapse whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def normalized_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    digest = F.md5(normalized_text(text_col)).alias("digest")
    return df.groupBy(digest).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
) -> DataFrame:
    """(id, distinct k-shingle array) — the shared first stage of the
    LSH pipeline. Both the signature and the exact-Jaccard verify
    stages consume it, so a composed pipeline extracts shingles ONCE
    (eager-persist it when both consumers run in one job)."""
    return (
        spread_for_cpu(df)
        .select(
            F.col(id_col),
            F.array_distinct(char_shingles(text_col, k_shingle)).alias("_sh"),
        )
        # docs shorter than the shingle width have no signature — drop
        # them (matches the SQL formulation, where GROUP BY over zero
        # shingle rows yields no row; keeping them would give all-NULL
        # signatures whose concat_ws band keys collide at "")
        .where(F.size("_sh") > 0)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    n_hashes: int = N_MINHASH,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Per-document MinHash signature: one column per lane, each the
    lexicographic min over the document's distinct k-shingles of a
    4-hex-char slice of md5(s). Narrow per-row transform — no
    shuffle. Lexicographic min over fixed-width lowercase hex ==
    numeric min over the 16-bit slice, identical in any engine.

    The shingle array is materialized once and deduplicated before
    hashing (min is duplicate-invariant; distinct cuts digest calls
    on repetitive text), and both digests are computed in one pass —
    Catalyst does not CSE across projection expressions, so deriving
    each lane from the raw text would re-shingle and re-hash
    ``n_hashes`` times. Pass ``shingled`` (from :func:`shingle_sets`,
    possibly persisted) to share the extraction with other stages."""
    if n_hashes * LANE_WIDTH > 32:
        raise ValueError(
            f"n_hashes={n_hashes} needs {n_hashes * LANE_WIDTH} hex chars but an "
            "md5 digest has 32 — extra lanes would read past the digest and "
            "degenerate to empty strings (every doc colliding in those bands)"
        )
    if shingled is None:
        shingled = shingle_sets(df, text_col, id_col, k_shingle)
    hashed = shingled.select(
        F.col(id_col),
        F.transform("_sh", F.md5).alias("_hs"),
    )

    def lane(i: int):
        # factory so the lambda stays unary (PySpark treats a
        # two-parameter lambda, defaults included, as (element, index))
        off = 1 + LANE_WIDTH * i
        return lambda h: F.substring(h, off, LANE_WIDTH)

    cols = [F.col(id_col)]
    for i in range(n_hashes):
        cols.append(F.array_min(F.transform("_hs", lane(i))).alias(f"mh{i}"))
    return hashed.select(*cols)


def band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Per-document LSH band keys: (id, band_id, band_key), one row
    per band. One pass — the (band_id, band_key) structs are exploded
    from a single array instead of a UNION ALL of n_bands selects (a
    union would re-evaluate the signature subplan per band). Callers
    that scan the result more than once (the self-join) should wrap it
    in ``eager_persist``."""
    sig = minhash_signatures(
        df, text_col, id_col, k_shingle, n_hashes, shingled=shingled
    )
    n_bands = n_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(
                "|", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bd")
    ).select(F.col(id_col), F.col("bd.band_id"), F.col("bd.band_key"))


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
    shingled: DataFrame | None = None,
    bucket_cap: int | None | str = "auto",
    auto_floor: int = AUTO_CAP_FLOOR,
    auto_ceiling: int = AUTO_CAP_CEILING,
) -> DataFrame:
    """LSH banding: signature split into bands of ``band_size`` hashes;
    documents sharing any band key become a candidate pair (id_a <
    id_b, deduplicated across bands). The only shuffle is the
    band-key self-join; band keys are md5-concat strings with high
    entropy, so bucket skew is bounded by true duplicate mass.

    ``bucket_cap`` is the HOT-BUCKET STAR-COLLAPSE dial, the measured
    answer to exactly that bound biting (SCALE.md r10): a bucket of c
    members emits c·(c−1)/2 clique pairs, and a corpus whose duplicate
    mass concentrates (boilerplate, templates, the homogeneous x100
    fixture: 33 buckets > 1000 members carried 62% of 120.9M pairs and
    a >78 GB verify-shuffle spill) goes quadratic in its hot tail no
    matter how high-entropy the keys are. With a cap, buckets of
    c > cap emit the STAR instead — (bucket-min, member) edges, O(c) —
    which preserves CONNECTIVITY exactly (a star spans the same
    component as its clique), so downstream connected-components
    clustering is unaffected where edges are used unverified; what is
    given up is pair-level completeness inside hot buckets, the same
    trade every production web-dedup makes for degenerate clusters.
    The hot set is found with one map-side-combined count and
    broadcast back (hot buckets are FEW by definition), so the dial
    adds no wide shuffle.

    The DEFAULT is ``bucket_cap="auto"`` (r11): the cap is derived
    from the bucket census itself — ``clamp(p99 bucket size,
    auto_floor, auto_ceiling)``, see :func:`resolve_auto_cap` and the
    AUTO_CAP_* constants — so a user running defaults on a degenerate
    corpus gets the measured survival path without opting in, while
    any corpus whose buckets all fit under the resolved cap gets the
    bit-identical exact uncapped plan. ``None`` opts out entirely
    (exact cliques at any bucket size — the pre-r11 default); an int
    pins the cap by hand."""
    # materialized persist: a lazy persist would let the self-join's
    # two concurrent stage scans each recompute the signature plan
    # (utils.eager_persist). In auto mode the census collect IS the
    # materializing action (it scans every band row before any join
    # runs), so the kernel skips the separate count job.
    all_bands = band_keys(
        df, text_col, id_col, k_shingle, n_hashes, band_size, shingled=shingled
    )
    if bucket_cap == "auto":
        all_bands = all_bands.persist()
    else:
        all_bands = eager_persist(all_bands)
    return _bands_to_pairs(all_bands, id_col, bucket_cap, auto_floor, auto_ceiling)


def _bands_to_pairs(
    bands: DataFrame,
    id_col: str,
    bucket_cap: int | None | str,
    auto_floor: int = AUTO_CAP_FLOOR,
    auto_ceiling: int = AUTO_CAP_CEILING,
) -> DataFrame:
    """(id, band_id, band_key) rows → distinct candidate pairs, with
    the hot-bucket star collapse (see lsh_candidate_pairs). With
    ``bucket_cap="auto"`` the cap is resolved from the bucket-census
    histogram (:func:`resolve_auto_cap`); when no bucket exceeds the
    resolved cap the returned plan is EXACTLY the uncapped self-join
    (bit-identical output, no extra join stages)."""
    _validate_bucket_cap(bucket_cap)
    hot_is_small = True
    if bucket_cap == "auto":
        # count-of-counts histogram: O(distinct bucket sizes) driver
        # rows — scale-free even at billions of buckets. bands is
        # persist()ed by every caller and this collect is the FIRST
        # action over it, so the census doubles as the cache
        # materialization (the eager count the pre-auto kernels paid
        # is folded in, not added — one job, not two).
        hist = [
            (int(r["_c"]), int(r["_f"]))
            for r in bands.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("_c")
            .agg(F.count(F.lit(1)).alias("_f"))
            .collect()
        ]
        cap = resolve_auto_cap(hist, auto_floor, auto_ceiling)
        max_c = max((c for c, _ in hist), default=0)
        if max_c > cap:
            bucket_cap = cap
            # the census is already driver-side: bound the hot-set
            # broadcast by COUNT (~60 B per hot bucket row) — past
            # HOT_BROADCAST_MAX hot buckets fall back to shuffle
            # joins rather than ship an oversized broadcast (ADVICE
            # r10, the embedding flavor of the same bound)
            n_hot = sum(f for c, f in hist if c > cap)
            hot_is_small = n_hot <= HOT_BROADCAST_MAX
        else:
            bucket_cap = None
    a = bands.alias("a")
    b_ = bands.alias("b")
    band_eq = (F.col("a.band_id") == F.col("b.band_id")) & (
        F.col("a.band_key") == F.col("b.band_key")
    )
    if bucket_cap is None:
        return (
            a.join(b_, band_eq & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    maybe_bcast = F.broadcast if hot_is_small else (lambda df: df)
    hot = maybe_bcast(
        bands.groupBy("band_id", "band_key")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(id_col).alias("_m"),
        )
        .where(F.col("_c") > bucket_cap)
    )
    cold = bands.join(hot, ["band_id", "band_key"], "left_anti")
    ca, cb = cold.alias("a"), cold.alias("b")
    clique = ca.join(
        cb, band_eq & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    star = (
        bands.join(hot, ["band_id", "band_key"])
        .where(F.col(id_col) > F.col("_m"))
        .select(F.col("_m").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    return clique.unionByName(star).distinct()


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.0,
    fingerprint: str | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs:
    J = |A∩B| / |A∪B| via array_intersect/array_union on distinct
    shingle arrays. Work is O(|pairs| × shingles) — only candidates
    pay, which is the whole point of LSH. The division is a single op
    on exact integers → portable to the oracle.

    Two alternatives were measured SLOWER on the sf0.1 fixture and
    intentionally not taken (revisit at other corpus shapes):
    * inverted-index verify (explode + join on (doc, shingle)):
      ~2× slower — three narrow shuffles + a 1→shingles row blow-up
      per pair cost more than caching the shingle arrays;
    * pre-pruning the corpus to candidate documents via semi-join:
      needs the candidate set persisted (it would otherwise re-run
      the whole LSH pipeline per consumer) and adds union/distinct/
      semi-join stages — a win only when candidates ≪ corpus, which
      a near-dup-heavy fixture is not; at 100 TB with a low dup rate,
      add ``pairs = eager_persist(pairs)`` and semi-join ``df`` on
      the candidate ids before shingling."""
    # default hash64: shingle strings → 64-bit fingerprints before the
    # pair joins — the persisted arrays shrink ~k× and intersect/union
    # compare longs, not strings (Lee et al. '22 practice). Counts
    # stay exact unless two DISTINCT shingles of one candidate pair
    # collide in 64 bits — p ≈ m²/2⁶⁵ per pair, immaterial at any m
    # the pair stage can hold. The dial (verify_fingerprint_mode)
    # switches to raw strings where hash CPU outweighs shuffle bytes.
    mode = verify_fingerprint_mode(fingerprint)
    sh = eager_persist(
        _verify_arrays(df, text_col, id_col, k_shingle, mode)
    )  # scanned twice (both join sides) — eager so neither recomputes
    # SHUFFLE_HASH on the fingerprint sides (r12): a sort-merge join
    # would SORT the pair-side stream — after the first join each pair
    # row drags a full fingerprint array through that sort, which is
    # exactly the verify-stage spill mechanism at 100 TB pair mass.
    # Hash-building the corpus side instead streams the wide rows
    # through unsorted; the build side is O(corpus/partitions).
    a = sh.hint("shuffle_hash").alias("sa")
    b = sh.hint("shuffle_hash").alias("sb")
    joined = (
        pairs.join(a, pairs.id_a == F.col(f"sa.{id_col}"))
        .join(b, pairs.id_b == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sa.sh", "sb.sh")).alias("n_inter"),
            # |A∪B| = |A|+|B|-|A∩B| arithmetically: array_union would
            # materialize a union-sized array per pair just to size it
            # (measured ~0.4s of the sf0.1 verify stage). Exact for
            # sets — the arrays are distinct by construction, and a
            # 64-bit same-doc fingerprint collision (p ≈ m²/2⁶⁵) is
            # the same immaterial class the mode dial documents.
            (F.size("sa.sh") + F.size("sb.sh")).alias("n_ab"),
        )
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (F.col("n_ab") - F.col("n_inter")).alias("n_union"),
        )
    )
    out = joined.withColumn(
        "jaccard", F.col("n_inter") / F.col("n_union")
    )
    if threshold > 0:
        out = out.where(F.col("jaccard") >= threshold)
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.5,
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
    fingerprint: str | None = None,
    bucket_cap: int | None | str = "auto",
    auto_floor: int = AUTO_CAP_FLOOR,
    auto_ceiling: int = AUTO_CAP_CEILING,
) -> DataFrame:
    """The full near-dup pipeline: LSH candidates → exact Jaccard ≥
    threshold. This is the scalable composition: at 100 TB the
    candidate set (not the corpus square) bounds the verify cost.

    FUSED single-extraction form (r7): shingles are extracted ONCE
    and both hash families ride the same pass — the md5 lanes the
    banding needs and the verify fingerprints — persisted together as
    one narrow frame (8 lane strings + a long array per doc). Since
    r12 the verify also FUSES INTO THE BAND JOIN (score-in-bucket,
    see the inline comment): band rows carry the fingerprint array,
    candidates are verified where the band join co-located both
    arrays, and only slim verified stats reach the pair-dedup
    exchange. Earlier rounds re-extracted per stage because caching
    the RAW shingle-string arrays measured slower than recomputing
    (4.3s vs 3.9s at sf0.1, r3); caching the 64-bit fingerprints
    instead is ~8× fewer cached bytes and measured 5.4s → 3.7s
    end-to-end at sf0.1. Five registry consumers (dedup_near_keep,
    dedup_components, leakage_safe_split, contrastive_triplets,
    doc_novelty) ride this kernel."""
    def stats(frame):
        joined = frame.select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sha", "shb")).alias("n_inter"),
            # arithmetic union size — see jaccard_verify
            (F.size("sha") + F.size("shb")).alias("n_ab"),
        ).select(
            "id_a",
            "id_b",
            "n_inter",
            (F.col("n_ab") - F.col("n_inter")).alias("n_union"),
        )
        return joined.withColumn(
            "jaccard", F.col("n_inter") / F.col("n_union")
        )

    scored = _fused_scored_pairs(
        df,
        text_col,
        id_col,
        k_shingle,
        n_hashes,
        band_size,
        fingerprint,
        bucket_cap,
        auto_floor,
        auto_ceiling,
        stats,
    )
    if threshold > 0:
        scored = scored.where(F.col("jaccard") >= threshold)
    return scored.dropDuplicates(["id_a", "id_b"])


def _fused_scored_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k_shingle: int,
    n_hashes: int,
    band_size: int,
    fingerprint: str | None,
    bucket_cap: int | None | str,
    auto_floor: int,
    auto_ceiling: int,
    stats,
) -> DataFrame:
    """The shared SCORE-IN-BUCKET core of the fused banded kernels
    (r12): one shingle extraction feeding both hash families, band
    rows CARRYING the verify fingerprint array, so the band self-join
    co-locates both sides' arrays in one corpus-sized exchange
    (identical subplans on both sides → the exchange is planned once
    and REUSED) and every candidate is exact-verified map-side right
    after the join via ``stats`` (a callable over (id_a, id_b, sha,
    shb) rows returning slim scored columns). Callers filter by their
    threshold BEFORE dropDuplicates — the score is a pure per-pair
    function, so filter∘dedup ≡ dedup∘filter and the dedup exchange
    moves ~40-byte stat rows, never fingerprint arrays.

    The prior shape deduplicated ids first and joined the arrays
    back, which re-shuffled the corpus arrays per join side AND moved
    one pair-mass array payload exchange; at wall scale (candidates ≫
    corpus) that payload exchange is the spill driver. The trade
    here: a pair colliding in BOTH bands is verified twice
    (bit-identical results) — intersect CPU for shuffle bytes, the
    right side of the ledger at every measured scale (A/B in SCALE.md
    r12). Hot-bucket star collapse rides the same resolution as
    lsh_candidate_pairs; only the hot-mins frame carries an array
    payload (one per hot bucket)."""
    mode = verify_fingerprint_mode(fingerprint)
    base = shingle_sets(df, text_col, id_col, k_shingle)
    fp = (
        (lambda s: F.xxhash64(s)) if mode == "hash64" else (lambda s: s)
    )
    hashed = base.select(
        F.col(id_col),
        F.transform("_sh", F.md5).alias("_hs"),
        F.transform("_sh", fp).alias("sh"),
    )

    def lane(i: int):
        off = 1 + LANE_WIDTH * i
        return lambda h: F.substring(h, off, LANE_WIDTH)

    cols = [F.col(id_col), F.col("sh")]
    for i in range(n_hashes):
        cols.append(F.array_min(F.transform("_hs", lane(i))).alias(f"mh{i}"))
    # in auto mode the census collect below is the first action over
    # the cached frame and materializes it (one job replaces the
    # eager count — see lsh_candidate_pairs)
    combined = hashed.select(*cols)
    if bucket_cap == "auto":
        combined = combined.persist()
    else:
        combined = eager_persist(combined)

    n_bands = n_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(
                "|",
                *[F.col(f"mh{b * band_size + j}") for j in range(band_size)],
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    bands = combined.select(
        F.col(id_col), "sh", F.explode(F.array(*band_structs)).alias("bd")
    ).select(
        F.col(id_col), "sh", F.col("bd.band_id"), F.col("bd.band_key")
    )
    _validate_bucket_cap(bucket_cap)
    hot_is_small = True
    if bucket_cap == "auto":
        # count-of-counts histogram (column-pruned to the band keys);
        # doubles as the cache materialization — see _bands_to_pairs
        hist = [
            (int(r["_c"]), int(r["_f"]))
            for r in bands.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("_c")
            .agg(F.count(F.lit(1)).alias("_f"))
            .collect()
        ]
        cap = resolve_auto_cap(hist, auto_floor, auto_ceiling)
        max_c = max((c for c, _ in hist), default=0)
        if max_c > cap:
            bucket_cap = cap
            n_hot = sum(f for c, f in hist if c > cap)
            hot_is_small = n_hot <= HOT_BROADCAST_MAX
        else:
            bucket_cap = None

    join_src = bands
    star_scored = None
    if bucket_cap is not None:
        # a star edge failing the verify can split a hot cluster the
        # clique would have held (the documented over-cap recall trade)
        maybe_bcast = F.broadcast if hot_is_small else (lambda df: df)
        hot = maybe_bcast(
            bands.groupBy("band_id", "band_key")
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.min(id_col).alias("_m"),
            )
            .where(F.col("_c") > bucket_cap)
        )
        join_src = bands.join(hot, ["band_id", "band_key"], "left_anti")
        mins = (
            bands.alias("t")
            .join(
                maybe_bcast(hot.alias("h")),
                (F.col("t.band_id") == F.col("h.band_id"))
                & (F.col("t.band_key") == F.col("h.band_key"))
                & (F.col(f"t.{id_col}") == F.col("h._m")),
            )
            .select(
                F.col("t.band_id").alias("_hbid"),
                F.col("t.band_key").alias("_hbk"),
                F.col(f"t.{id_col}").alias("_min_id"),
                F.col("t.sh").alias("sha"),
            )
        )
        star_scored = stats(
            bands.join(
                maybe_bcast(mins),
                (F.col("band_id") == F.col("_hbid"))
                & (F.col("band_key") == F.col("_hbk"))
                & (F.col(id_col) > F.col("_min_id")),
            ).select(
                F.col("_min_id").alias("id_a"),
                F.col(id_col).alias("id_b"),
                "sha",
                F.col("sh").alias("shb"),
            )
        )
    a, b_ = join_src.alias("a"), join_src.alias("b")
    scored = stats(
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sh").alias("sha"),
            F.col("b.sh").alias("shb"),
        )
    )
    if star_scored is not None:
        scored = scored.unionByName(star_scored)
    return scored


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.8,
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
    fingerprint: str | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: shingle containment
    C(A→B) = |A∩B|/|A| — a short document quoted inside a long one
    has high containment but low Jaccard (the union is dominated by
    the long doc), so symmetric dedup misses exactly the
    quote/excerpt/boilerplate-wrapper case this catches. Emits
    candidate pairs with both containments and flags pairs where
    either direction clears ``threshold``.

    Candidates come from the same MinHash LSH banding as the Jaccard
    path — honest caveat: MinHash collision probability tracks
    JACCARD, so a tiny-doc-in-huge-doc pair can evade banding at
    extreme size skew. :func:`containment_pairs_exact` is the
    100%-recall variant (prefix filtering on the containment bound) —
    use it when the quote-in-book case matters; this banding form
    stays for the cheap moderate-skew regime. Since r12 it rides the
    same fused score-in-bucket core as :func:`ngram_jaccard_pairs`
    (:func:`_fused_scored_pairs`): containments computed where the
    band join co-located the arrays, threshold filter before the
    pair-dedup, no pair-mass payload exchange — and the hot-bucket
    auto cap applies (the old shape delegated candidates to
    lsh_candidate_pairs and joined the arrays back per side)."""

    def stats(frame):
        j = frame.select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias(
                "n_inter"
            ),
            F.size("sha").cast("long").alias("n_a"),
            F.size("shb").cast("long").alias("n_b"),
        )
        c_ab = F.col("n_inter").cast("double") / F.col("n_a").cast("double")
        c_ba = F.col("n_inter").cast("double") / F.col("n_b").cast("double")
        return j.select(
            "id_a",
            "id_b",
            "n_inter",
            "n_a",
            "n_b",
            c_ab.alias("c_ab"),
            c_ba.alias("c_ba"),
        )

    scored = _fused_scored_pairs(
        df,
        text_col,
        id_col,
        k_shingle,
        n_hashes,
        band_size,
        fingerprint,
        "auto",
        AUTO_CAP_FLOOR,
        AUTO_CAP_CEILING,
        stats,
    )
    return scored.where(
        (F.col("c_ab") >= threshold) | (F.col("c_ba") >= threshold)
    ).dropDuplicates(["id_a", "id_b"])


def containment_pairs_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.8,
    fingerprint: str | None = None,
) -> DataFrame:
    """Asymmetric shingle containment with **100% recall** — the
    size-skew-proof candidate generator :func:`containment_pairs`'s
    docstring calls for. MinHash banding tracks JACCARD, so the
    operator's headline target (a tiny doc quoted inside a huge one:
    containment ≈ 1, Jaccard ≈ |A|/|B| ≈ 0) can evade banding
    entirely. This variant generates candidates by **prefix
    filtering on the containment bound** instead:

    * each document's distinct shingles are totally ordered by
      (global document frequency, shingle) — rarest first;
    * the PROBE side explodes only each doc's prefix of length
      ``n - ceil(t·n) + 1``: if C(A→B) ≥ t then |A∩B| ≥ ceil(t·|A|),
      and a miss on A's whole prefix would cap the intersection at
      ceil(t·|A|) - 1 — pigeonhole, so every qualifying pair shares
      a probe-prefix shingle, deterministically;
    * the INDEX side explodes full shingle lists, semi-join-pruned to
      shingles that occur in at least one prefix — a corpus-wide
      boilerplate shingle never becomes a join key unless some doc is
      almost entirely boilerplate, so no O(corpus) posting list forms
      (same PPJoin logic as :func:`word_jaccard_all_pairs`, adapted
      to the asymmetric bound: the index side must be FULL because
      the intersection can sit anywhere in the long doc's order).

    Both directions are covered (every doc is both probe and index),
    pairs are canonicalized (id_a < id_b), and the exact verify
    computes both containments — output contract identical to
    :func:`containment_pairs`, but the result is the TRUE set of
    pairs with either containment ≥ threshold, not a banding-limited
    subset. Shuffles: dfreq agg, sort-collect agg, candidate join,
    verify joins — all on keys bounded by prefix selectivity, no
    all-pairs stage anywhere. r13 adds the PPJoin directional
    positional filter on the candidate match rows (see the inline
    comment at ``cand`` for the exactness argument — it also subsumes
    the directional length bound) so non-qualifying matches are
    dropped map-side before the candidate-dedup exchange and the
    verify joins."""
    # persisted: scanned twice (df aggregation + the df join-back);
    # recomputing would re-shingle the corpus — measured 7.3s → 6.0s
    # at sf0.1 for the k=12 registry entry. VERIFY fingerprints are a
    # dial (verify_fingerprint_mode); re-A/B'd with order-alternated
    # same-session runs in BOTH orders at sf0.1 (k=12): steady-state
    # hash64 ≈ 4.8-5.3s vs string ≈ 6.4-7.2s at matched positions
    # (first run of either mode pays ~+9s of session warmup, which
    # polluted an earlier single-order measurement that picked
    # string) — so default 'hash64' here like the banded verifies;
    # on a network-shuffle cluster its ~8× verify-byte reduction
    # widens the gap further. A window-over-s df attach was also
    # measured and NOT taken (15s vs 10s — the window's per-partition
    # sort of the full explode costs more than the agg + join-back
    # it saves).
    # HASH-EARLY (r13): in hash64 mode the xxhash64 fingerprint moves
    # from the verify stage to directly after the shingle explode, so
    # the dfreq exchange, the sort-collect agg (whose per-doc
    # sort_array compares 8-byte longs instead of k-char strings) and
    # every candidate/semi join key carry longs. array_distinct still
    # runs on the STRINGS, so per-doc counts (n) are bit-identical to
    # string mode, and the verify intersects exactly the same hash
    # values the r12 form produced via transform() — the output is
    # value-identical to the previous hash64 default, same documented
    # per-pair collision class, brute-force-pinned. r12 probed this
    # and measured no win at sf0.1 (1.9M shingle rows — the extra
    # hash pass ≈ the narrower-type saving); on the r13 zipfian x30
    # fixture (58M rows) the sort-collect stage was 42 s of a 62 s
    # wall and the trade flips (measured, OPTIMIZATION_r13.md).
    mode = verify_fingerprint_mode(fingerprint, default="hash64")
    tok = F.explode(
        F.array_distinct(char_shingles(text_col, k_shingle))
    ).alias("s0")
    sh = eager_persist(
        spread_for_cpu(df)
        .select(F.col(id_col), tok)
        .select(
            F.col(id_col),
            (F.xxhash64("s0") if mode == "hash64" else F.col("s0")).alias("s"),
        )
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # The sort-collect agg's per-task state is (grouped rows × struct
    # bytes) IN MEMORY, but AQE's partition coalescing provisions
    # tasks from the exchange's COMPRESSED map-output bytes — and
    # hash-early longs compress ~5× denser than the strings they
    # replaced, so at 58M exploded rows AQE packed the collect state
    # into so few tasks that ObjectHashAggregate could not acquire
    # memory (measured: bench form at zipf x30 / local[32] / 8g OOMs;
    # completes in 60 s with coalescing off). Pin the exchange with an
    # EXPLICIT partition count (user-specified counts are never
    # AQE-coalesced) sized at ≤2M exploded rows (~80 MB collect state)
    # per task, floored at the session default so the dial only ever
    # turns UP: at cluster scale the default (sized for the cluster)
    # wins unless the row mass genuinely needs more tasks. The count
    # is free — eager_persist already materialized sh.
    import math

    parts = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        math.ceil(sh.count() / 2_000_000),
    )
    # BOTH the join inputs and the agg exchange are pinned: the
    # partial collect_list buffers ride the join-output stage, so the
    # join's own (s-keyed) exchanges are the ones whose coalescing
    # blows the partial-agg state — pinning only the agg exchange was
    # measured insufficient (still OOM'd; the failing stack is the
    # SMJ stage's createHashMap).
    docs = eager_persist(
        sh.repartition(parts, "s")
        .join(dfreq.repartition(parts, "s"), "s")
        .repartition(parts, id_col)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df", "s"))).alias("ss"))
        .select(
            F.col(id_col),
            F.transform("ss", lambda x: x["s"]).alias("sh"),
            F.size("ss").alias("n"),
        )
        .withColumn(
            # n - ceil(t·n) + 1; 1e-9 guards float overshoot (see
            # word_jaccard_all_pairs)
            "plen",
            F.col("n")
            - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)).cast("int")
            + 1,
        )
    )  # scanned four times: probe, index, two verify sides
    # "rem" = how many shingles remain at or after this position in
    # the doc's rare-first order (0-based pos: rem = n - pos) — the
    # per-row overlap upper bound the positional filter compares.
    pref = docs.select(
        F.col(id_col),
        F.col("n"),
        F.posexplode(F.slice("sh", F.lit(1), F.col("plen"))).alias("p", "s"),
    ).select(
        F.col(id_col), F.col("n"), (F.col("n") - F.col("p")).alias("rem"), "s"
    )
    index = (
        docs.select(F.col(id_col), F.col("n"), F.posexplode("sh").alias("p", "s"))
        # only rem crosses the (full-list, corpus-sized) index explode:
        # the directional length bound n_x ≥ ceil(t·n_p) is implied by
        # the positional filter (rem_x ≤ n_x), so x.n is never needed
        .select(F.col(id_col), (F.col("n") - F.col("p")).alias("rem"), "s")
        .join(pref.select("s").distinct(), "s", "left_semi")
    )
    p, x = pref.alias("p"), index.alias("x")
    # per-DIRECTION positional filter (r13, PPJoin): this probe row
    # only has to witness C(P→X) ≥ t (the opposite direction is
    # generated by the X-as-probe row), which needs overlap ≥
    # ceil(t·n_p). A FIRST common shingle at (p_p, p_x) bounds the
    # overlap at min(rem_p, rem_x) (everything strictly before a
    # first common shingle is unshared), and for a qualifying
    # direction that first-common row is inside the probe prefix
    # (pigeonhole) with bound ≥ overlap ≥ ceil(t·n_p) — so at least
    # one row per qualifying pair survives. Exact, like
    # word_jaccard_all_pairs; runs map-side before the candidate-dedup
    # exchange. (r12 noted "no length filter exists for containment" —
    # true pair-symmetrically, but the DIRECTIONAL bound is real and
    # subsumed by this predicate.)
    cand = (
        p.join(
            x,
            (F.col("p.s") == F.col("x.s"))
            & (F.col(f"p.{id_col}") != F.col(f"x.{id_col}")),
        )
        .where(
            F.least(F.col("p.rem"), F.col("x.rem"))
            >= F.ceil(F.lit(threshold) * F.col("p.n") - F.lit(1e-9))
        )
        .select(
            F.least(F.col(f"p.{id_col}"), F.col(f"x.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"p.{id_col}"), F.col(f"x.{id_col}")).alias("id_b"),
        )
        .distinct()
    )
    # hash-early already fingerprinted the arrays at the explode (or
    # left strings in string mode) — the verify reads them as stored.
    # SHUFFLE_HASH (r12): same verify doctrine as jaccard_verify /
    # word_jaccard_all_pairs — never let a sort-merge join sort the
    # pair×payload stream; hash-build the corpus side instead
    da = docs.select(
        F.col(id_col), F.col("sh").alias("sh_a"), F.col("n").alias("n_a")
    ).hint("shuffle_hash")
    db = docs.select(
        F.col(id_col), F.col("sh").alias("sh_b"), F.col("n").alias("n_b")
    ).hint("shuffle_hash")
    joined = (
        cand.join(da, cand.id_a == da[id_col])
        .join(db, cand.id_b == db[id_col])
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_inter"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
        )
    )
    c_ab = F.col("n_inter").cast("double") / F.col("n_a").cast("double")
    c_ba = F.col("n_inter").cast("double") / F.col("n_b").cast("double")
    return joined.select(
        "id_a", "id_b", "n_inter", "n_a", "n_b",
        c_ab.alias("c_ab"), c_ba.alias("c_ba"),
    ).where((c_ab >= threshold) | (c_ba >= threshold))


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.5,
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Admission control for an ingest batch against an EXISTING
    corpus — the steady-state form of dedup (a production pipeline
    rarely re-dedups the world; it gates what's new against what's
    kept). Per batch document: ``exact_dup`` (content digest already
    in the corpus), ``near_dup`` (shares an LSH band with a corpus
    doc AND shingle-Jaccard ≥ threshold), ``accepted`` (neither).
    Flags are 0/1 longs.

    Scale shape: the exact gate is a digest left-semi probe (corpus
    side reduced to distinct digests — at 100 TB this is the
    bucketed/partitioned lookup table an ingest service maintains);
    the near gate joins batch bands to corpus bands — a batch×corpus
    band join whose cost is driven by the BATCH size, not corpus²;
    verify pays only for candidates. Corpus band keys and digests
    are recomputed here from text — a real deployment persists both
    as incremental indexes and this operator reads them instead
    (band_keys / exact digests are exactly the columns to store)."""
    b_dig = batch.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    )
    c_dig = corpus.select(F.md5(F.col(text_col)).alias("digest")).distinct()
    exact_ids = (
        b_dig.join(c_dig, "digest", "left_semi").select(id_col).distinct()
    )
    bb = band_keys(batch, text_col, id_col, k_shingle, n_hashes, band_size)
    cb = band_keys(corpus, text_col, id_col, k_shingle, n_hashes, band_size)
    cand = (
        bb.alias("a")
        .join(
            cb.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    both = batch.select(F.col(id_col), F.col(text_col)).unionByName(
        corpus.select(F.col(id_col), F.col(text_col))
    )
    near = jaccard_verify(both, cand, text_col, id_col, k_shingle, threshold)
    near_ids = near.select(F.col("id_a").alias(id_col)).distinct()
    flags = (
        batch.select(id_col)
        .join(exact_ids.withColumn("_e", F.lit(1)), id_col, "left")
        .join(near_ids.withColumn("_n", F.lit(1)), id_col, "left")
    )
    e = F.coalesce(F.col("_e"), F.lit(0)).cast("long")
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("long")
    return flags.select(
        F.col(id_col),
        e.alias("exact_dup"),
        n.alias("near_dup"),
        F.when((e == 0) & (n == 0), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("accepted"),
    )


def build_dedup_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
) -> None:
    """Persist the corpus-side dedup indexes that
    :func:`incremental_dedup` otherwise recomputes from text on every
    batch — exactly the two tables its docstring names:

    * ``{path}/digests`` — (id, md5 content digest): the exact-dup
      probe table;
    * ``{path}/bands``   — (id, band_id, band_key): the LSH candidate
      index.

    Both are tiny next to the corpus (a digest row and
    ``n_hashes/band_size`` band rows per document — no shingles, no
    text), so the steady-state ingest loop reads megabytes of index
    instead of re-shingling terabytes of corpus. At 100 TB, write
    ``bands`` bucketed by ``band_key`` (``.bucketBy(…)
    .saveAsTable``) so the batch×corpus band join co-locates without
    shuffling the corpus side; plain parquet keeps this path-portable
    here. Appending a new accepted batch = appending its digest/band
    rows — the index is additive."""
    corpus.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    ).write.mode("overwrite").parquet(f"{path}/digests")
    band_keys(corpus, text_col, id_col, k_shingle, n_hashes, band_size).write.mode(
        "overwrite"
    ).parquet(f"{path}/bands")


def incremental_dedup_indexed(
    batch: DataFrame,
    corpus: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.5,
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """:func:`incremental_dedup` reading the persisted corpus indexes
    (:func:`build_dedup_index`) instead of recomputing digests and
    band keys from corpus text — the deployment shape the recompute
    form's docstring promises. Only the BATCH is shingled up front;
    corpus text is touched solely for candidate verification, pruned
    by a semi-join to the candidate ids first, so verify cost rides
    the candidate count, not the corpus size. Flags are identical to
    the recompute path (gated by a parity test and its own oracle
    entry)."""
    spark = batch.sparkSession
    c_dig = (
        spark.read.parquet(f"{index_path}/digests").select("digest").distinct()
    )
    cb = spark.read.parquet(f"{index_path}/bands")
    b_dig = batch.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
    exact_ids = (
        b_dig.join(c_dig, "digest", "left_semi").select(id_col).distinct()
    )
    bb = band_keys(batch, text_col, id_col, k_shingle, n_hashes, band_size)
    cand = eager_persist(
        bb.alias("a")
        .join(
            cb.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )  # consumed twice: corpus prune + verify pair join
    corp_cand = corpus.join(
        cand.select(F.col("id_b").alias(id_col)).distinct(), id_col, "left_semi"
    )
    both = batch.select(F.col(id_col), F.col(text_col)).unionByName(
        corp_cand.select(F.col(id_col), F.col(text_col))
    )
    near = jaccard_verify(both, cand, text_col, id_col, k_shingle, threshold)
    near_ids = near.select(F.col("id_a").alias(id_col)).distinct()
    flags = (
        batch.select(id_col)
        .join(exact_ids.withColumn("_e", F.lit(1)), id_col, "left")
        .join(near_ids.withColumn("_n", F.lit(1)), id_col, "left")
    )
    e = F.coalesce(F.col("_e"), F.lit(0)).cast("long")
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("long")
    return flags.select(
        F.col(id_col),
        e.alias("exact_dup"),
        n.alias("near_dup"),
        F.when((e == 0) & (n == 0), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("accepted"),
    )


def word_jaccard_all_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    fingerprint: str | None = None,
) -> DataFrame:
    """Exact word-set Jaccard ≥ threshold over all pairs, via
    **prefix filtering** (the AllPairs/PPJoin family — Xiao et al.,
    WWW'08): candidates are generated by self-joining only each
    document's *prefix* — its ``n - ceil(t·n) + 1`` globally rarest
    tokens under a total order by (document frequency, token). Any
    pair with J ≥ t must share a prefix token (pigeonhole on the
    required overlap t·max(|A|,|B|)), so the output is IDENTICAL to
    the naive inverted-index join — but a corpus-wide stop word
    ("the", present in every doc) never enters a prefix unless a doc
    is almost all stop words, so no join key carries an O(n) posting
    list and the ~n² hot-key reducer of the naive formulation cannot
    form. Verification joins candidates back to full word arrays and
    computes the exact intersection.

    The naive join-on-every-token variant was the round-1
    implementation; it answered correctly but put every document
    sharing one hot token into a single shuffle partition — the
    classic skewed-key self-join scale-killer.

    VERIFY (r12): the per-pair intersection dominates wall clock on
    dup-heavy corpora (the sf0.1 fixture: 12.17M candidates from 5k
    docs, ~7 s of a 9 s query was the verify stage), so the verify
    stage applies the three measured fixes from the banded family:

    * token arrays cross the verify joins as xxhash64 FINGERPRINTS
      by default (``verify_fingerprint_mode`` dial, same collision
      class as :func:`jaccard_verify`: counts exact modulo a
      m²/2⁶⁵-per-pair chance — and long-vs-long intersection hashes
      8-byte keys instead of rehashing full token strings per pair);
    * the AllPairs LENGTH FILTER runs at the CANDIDATE stage (r13 —
      it ran after the verify joins in r12): J ≥ t ⇒ t·|B| ≤ |A|
      (for |A| ≤ |B|), so any match row whose sizes violate
      ``n_a ≥ t·n_b ∧ n_b ≥ t·n_a`` is dropped from exact integer
      sizes alone, before the candidate-dedup exchange ever sees the
      pair — no array work, provably no qualifying pair lost
      (i ≤ min(n_a,n_b) and i ≥ t(n_a+n_b)/(1+t) force the bound);
    * the PPJOIN POSITIONAL FILTER (r13, Xiao et al. §3.2) runs
      beside it: a prefix match at 0-based sorted positions (p_a,
      p_b) bounds the overlap at ``min(n_a - p_a, n_b - p_b)``
      (everything strictly before a FIRST common token is, by
      definition of "first", not shared), so rows where that bound
      misses the required overlap α = ceil(t/(1+t)·(n_a+n_b)) are
      dropped map-side. Exact: a qualifying pair's first common
      token is inside both prefixes (the prefix-filter pigeonhole)
      and ITS row has bound ≥ overlap ≥ α, so at least one row per
      qualifying pair always survives to the dedup. Measured on the
      50k-zipf x10 corpus: candidate pairs 3.37M → 319k (0.095×;
      length alone only reaches 0.61×);
    * the array sides are SHUFFLE_HASH-hinted: a sort-merge join
      would sort the pair×payload stream — the r12 verify doctrine
      (never sort wide rows; hash-build the corpus side).

    The persisted frame is also slimmer: it carries the PREFIX token
    array (``pw``, the only part the candidate stage reads) plus the
    fingerprint array, never the full raw token array alongside.
    Measured at sf0.1: 9.0 s → 5.25 s, identical rows AND identical
    Σ n_inter (76,782,232)."""
    mode = verify_fingerprint_mode(fingerprint)
    # HASH-EARLY (r13): in hash64 mode tokens become xxhash64 longs at
    # the explode, so the dfreq exchange, the rare-first sort_array
    # (long comparisons, not string), and the prefix join keys all
    # carry 8 bytes — same trade as containment_pairs_exact (see its
    # inline comment); value-identical to the r12 hash64 default
    # (array_distinct still runs on the strings, the verify intersects
    # the same hash values), brute-force-pinned.
    tok = F.explode(F.array_distinct(words(text_col))).alias("w0")
    toks = (
        spread_for_cpu(df)
        .select(F.col(id_col), tok)
        .select(
            F.col(id_col),
            (F.xxhash64("w0") if mode == "hash64" else F.col("w0")).alias("w"),
        )
    )
    # global document frequency — the canonical rare-first total order
    dfreq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    docs = eager_persist(
        toks.join(dfreq, "w")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df", "w"))).alias("sw"))
        .select(
            F.col(id_col),
            F.transform("sw", lambda x: x["w"]).alias("ws"),
            F.size("sw").alias("n"),
        )
        .withColumn(
            # n - ceil(t·n) + 1; the 1e-9 guards binary-float overshoot
            # (0.3·10 = 3.0000000000000004 → ceil 4 would under-size
            # the prefix and silently drop true pairs)
            "plen",
            F.col("n")
            - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)).cast("int")
            + 1,
        )
        .select(
            F.col(id_col),
            F.slice("ws", F.lit(1), F.col("plen")).alias("pw"),
            F.col("ws").alias("vw"),
            F.col("n"),
        )
    )  # scanned three times: two prefix-join sides + verify
    pref = docs.select(
        F.col(id_col), F.col("n"), F.posexplode("pw").alias("p", "w")
    )
    a, b = pref.alias("a"), pref.alias("b")
    # required overlap for J >= t; 1e-9 guards float overshoot like plen
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a.n") + F.col("b.n"))
        - F.lit(1e-9)
    )
    cand = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        # length + positional filters run map-side on the match rows,
        # BEFORE the candidate-dedup exchange (see docstring: exact)
        .where(
            (F.col("b.n") >= F.lit(threshold) * F.col("a.n"))
            & (F.col("a.n") >= F.lit(threshold) * F.col("b.n"))
        )
        .where(
            F.least(
                F.col("a.n") - F.col("a.p"), F.col("b.n") - F.col("b.p")
            )
            >= alpha
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    da = docs.select(
        F.col(id_col), F.col("vw").alias("ws_a"), F.col("n").alias("n_a")
    ).hint("shuffle_hash")
    db = docs.select(
        F.col(id_col), F.col("vw").alias("ws_b"), F.col("n").alias("n_b")
    ).hint("shuffle_hash")
    out = (
        cand.join(da, cand.id_a == da[id_col])
        .join(db, cand.id_b == db[id_col])
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ws_a", "ws_b")).alias("n_inter"),
            (F.col("n_a") + F.col("n_b")).alias("_n_sum"),
        )
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (F.col("_n_sum") - F.col("n_inter")).alias("n_union"),
        )
        .withColumn("jaccard", F.col("n_inter") / F.col("n_union"))
        .where(F.col("jaccard") >= threshold)
    )
    return out


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate PAIRS within Hamming distance
    ``max_hamming`` — the search operator that turns the fingerprint
    column into a dedup primitive.

    Bucketing is exact, not probabilistic: the fingerprint splits into
    ``max_hamming + 1`` disjoint bit bands, and by pigeonhole two
    fingerprints differing in ≤ max_hamming bits agree on at least one
    whole band — so a self-join on (band_id, band_bits) finds EVERY
    qualifying pair (100% recall), and the cheap
    ``bit_count(a XOR b) <= k`` verify discards band-collision false
    positives. One shuffle on the band key; per-bucket work is
    |bucket|², bounded by 2^band_width granularity — at larger corpora
    raise n_bits (wider fingerprint, finer bands) exactly like the
    MinHash banding above.

    ``n_bits=64`` (the Manku-et-al production width; requires
    ``max_hamming=3``) stores the fingerprint as TWO 32-bit longs —
    ``lo`` from each md5 nibble's top bit, ``hi`` from its second bit
    (functions/vectors.py::simhash_bits ``nibble_bit``) — banded
    4 × 16. Two longs instead of one keeps every materialized value
    unsigned-small (< 2^32): a single 64-bit bitmap would need bit 63,
    which overflows a signed BIGINT literal in both engines' SQL.
    Hamming distance is the sum of the halves' XOR popcounts —
    identical to the one-word form since the halves partition the
    bits. Plan shape is unchanged: one band-key self-join."""
    from syncflux_spark.functions.vectors import simhash_bits_hex

    if n_bits == 64:
        if max_hamming != 3:
            raise ValueError(
                "n_bits=64 supports max_hamming=3 (4 bands x 16 bits), "
                f"got {max_hamming}"
            )
        return _simhash_near_pairs64(df, text_col, id_col)
    # digest array materialized in its own projection: Catalyst does
    # not CSE a transform() repeated inside each bit's filter, so the
    # fused form would md5 the token array once PER BIT
    # (vectors.simhash_bits_hex documents the 3.1x measurement)
    fp = _simhash_hex_tokens(df, text_col, id_col).select(
        F.col(id_col),
        simhash_bits_hex("_hx", F.col("_nt"), n_bits).alias("simhash"),
    )
    n_bands = max_hamming + 1
    bounds = [i * n_bits // n_bands for i in range(n_bands + 1)]
    band_structs = []
    for b in range(n_bands):
        lo, width = bounds[b], bounds[b + 1] - bounds[b]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright("simhash", lo)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("band_bits"),
            )
        )
    banded = eager_persist(
        fp.select(
            F.col(id_col), "simhash", F.explode(F.array(*band_structs)).alias("bd")
        ).select(F.col(id_col), "simhash", "bd.band_id", "bd.band_bits")
    )  # both self-join sides scan it
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def _simhash_hex_tokens(df, text_col, id_col):
    """(id, _hx: array<md5 hex>, _nt: token count) — the shared
    one-md5-per-token projection every simhash width reads bits from."""
    toks = words(text_col)
    return spread_for_cpu(df).select(
        F.col(id_col),
        F.transform(toks, lambda t: F.md5(t)).alias("_hx"),
        F.size(toks).alias("_nt"),
    )


def _simhash_near_pairs64(df, text_col, id_col):
    """The 64-bit two-word body of :func:`simhash_near_pairs` —
    4 bands × 16 bits over (lo, hi), exact Hamming ≤ 3 recall by the
    same pigeonhole. Both 32-bit halves ride ONE md5 pass per token:
    the digest array is materialized once (`_simhash_hex_tokens`) and
    the two nibble-bit vote predicates read it — so the corpus-scan
    cost is ~the 32-bit kernel's, not 2×."""
    from syncflux_spark.functions.vectors import simhash_bits_hex

    fp = _simhash_hex_tokens(df, text_col, id_col).select(
        F.col(id_col),
        simhash_bits_hex("_hx", F.col("_nt"), 32, nibble_bit=3).alias("lo"),
        simhash_bits_hex("_hx", F.col("_nt"), 32, nibble_bit=2).alias("hi"),
    )
    band_structs = []
    for b in range(4):
        half = F.col("lo") if b < 2 else F.col("hi")
        lo_bit = 16 * (b % 2)
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(half, lo_bit)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_bits"),
            )
        )
    banded = eager_persist(
        fp.select(
            F.col(id_col), "lo", "hi", F.explode(F.array(*band_structs)).alias("bd")
        ).select(F.col(id_col), "lo", "hi", "bd.band_id", "bd.band_bits")
    )  # both self-join sides scan it
    a, b_ = banded.alias("a"), banded.alias("b")
    hamming = (
        F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
        + F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
    ).cast("long")
    return (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= 3)
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over an arbitrary undirected pair graph:
    every node labeled with the min node id reachable through edges —
    the transitive closure that turns pairwise matches into GROUPS
    (pairs alone under-merge: A~B, B~C must collapse to one group
    even when A~C has no direct edge). ``nodes``: one column
    ``id_col``; ``pairs``: (id_a, id_b).

    Iterative min-label propagation (the Pregel/GraphX pattern,
    driver-coordinated like any Spark iterative algorithm) PLUS
    pointer halving: each round every node takes the min of its own
    label, its neighbors' labels, and its LABEL'S label (one extra
    hash join against the label table — the path-halving step of
    MapReduce components à la Kiveris et al.). Neighbor-min alone
    moves the min one hop per round (O(diameter) rounds — measured
    13 rounds on the cosine-0.3 semantic graph at sf0.1, 13s);
    halving makes established labels jump exponentially, converging
    in O(log diameter) rounds. The fixpoint is unchanged: a node's
    label is always a node id inside its own component, so label-of-
    label is still a same-component id and the limit is the same min
    reachable id the oracle's recursive CTE computes.

    Edges and per-round labels go through ``localCheckpoint`` (eager),
    NOT ``persist``: ``labels`` feeds two plan branches per round
    (neighbor-min and the least/coalesce merge), so with persist-only
    the LOGICAL plan doubles every round even though the data is
    cached — 2^rounds × the edge plan's size. With a candidate
    generator whose leaves carry big literal trees (sign-LSH
    hyperplane arrays) that reached Spark's 2 GB plan-string cap and
    OOMed the driver around round 10. Checkpointing truncates lineage
    to the materialized RDD, keeping every round's plan O(1). (On a
    cluster, executor loss invalidates localCheckpoint data — for a
    long-running production job set a checkpoint dir and swap in
    ``checkpoint``; the loop is unchanged.)

    The per-round state goes through :func:`utils.loop_checkpoint`
    rather than bare ``localCheckpoint``: the checkpoint leaf carries
    the pre-checkpoint plan's STATISTICS, and because each round
    self-joins the label table (pointer halving), the sizeInBytes
    estimate compounds to ~s³ per round — BigInteger digits triple
    every round and Catalyst's stats visitor dominated wall time past
    round ~11 (0.5s → 48s/round, found by the r7 slope measurement on
    a 15-round-diameter graph). The rebase keeps planning cost
    constant; see loop_checkpoint's docstring.
    """
    edges = pairs.select("id_a", "id_b").localCheckpoint()
    sym = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    labels = loop_checkpoint(
        nodes.select(F.col(id_col)).withColumn("component", F.col(id_col))
    )
    # loop shuffles move only the label table and the symmetrized
    # edge list — size their partition count to that state, not the
    # batch default (both counts are over already-checkpointed data,
    # ~free). See utils.loop_parallelism for the measurement.
    from syncflux_spark.utils import loop_parallelism, shuffle_partitions

    spark = nodes.sparkSession
    state_rows = max(labels.count(), 2 * edges.count())
    with shuffle_partitions(spark, loop_parallelism(spark, state_rows)):
        labels = _components_loop(sym, labels, id_col, max_iter)
    return labels


def _components_loop(sym, labels, id_col, max_iter):
    changed = None  # max_iter <= 0 reaches the else: branch unbound otherwise
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym.id_a == labels[id_col])
            .groupBy(F.col("id_b").alias(id_col))
            .agg(F.min("component").alias("nbr_min"))
        )
        # pointer halving: my label's own current label (labels is
        # keyed by node id and every label IS a node id, so this is
        # one hash join of the label table against itself)
        half = labels.join(
            labels.select(
                F.col(id_col).alias("_lbl"), F.col("component").alias("_lbl_c")
            ),
            F.col("component") == F.col("_lbl"),
        ).select(F.col(id_col), F.col("_lbl_c").alias("half_min"))
        # the changed-label count rides the SAME job that materializes
        # the checkpoint (observe() metrics are collected during the
        # localCheckpoint action) — previously a separate join+count
        # job per round, ~a third of each round's wall time
        from pyspark.sql import Observation

        obs = Observation()
        new_labels = loop_checkpoint(
            labels.join(nbr, on=id_col, how="left")
            .join(half, on=id_col, how="left")
            .select(
                F.col(id_col),
                F.col("component").alias("_old"),
                F.least(
                    "component",
                    F.coalesce("nbr_min", "component"),
                    F.coalesce("half_min", "component"),
                ).alias("_new"),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("_new") != F.col("_old")).cast("long")
                ).alias("changed"),
            )
            .select(F.col(id_col), F.col("_new").alias("component"))
        )
        changed = obs.get["changed"] or 0
        labels = new_labels
        if changed == 0:
            break
    else:
        # max_iter rounds exhausted with labels still moving: the
        # result is NOT the transitive closure (components with
        # diameter > max_iter keep split labels) and would silently
        # diverge from the oracle's recursive-CTE closure
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} rounds "
            + (
                "(no rounds ran)"
                if changed is None
                else f"({changed} labels still changing)"
            )
            + "; increase max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def duplicate_components(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_iter: int = 20,
    bucket_cap: int | None | str = "auto",
    auto_floor: int = AUTO_CAP_FLOOR,
    auto_ceiling: int = AUTO_CAP_CEILING,
) -> DataFrame:
    """Dedup GROUPS over the verified text near-dup graph: connected
    components of :func:`ngram_jaccard_pairs` edges (see
    :func:`connected_components` for the propagation pattern).
    ``bucket_cap`` rides through to the pair generator (default
    ``"auto"`` — the census-derived cap, r11) — the hot-bucket star
    collapse keeps the candidate graph linear in over-cap buckets;
    because star edges still face the Jaccard verify, a failing one
    can split a hot cluster (recall trade documented at
    lsh_candidate_pairs)."""
    pairs = ngram_jaccard_pairs(
        df,
        text_col,
        id_col,
        threshold=threshold,
        bucket_cap=bucket_cap,
        auto_floor=auto_floor,
        auto_ceiling=auto_ceiling,
    )
    return connected_components(
        df.select(F.col(id_col)), pairs, id_col, max_iter
    )


def embedding_components(
    corpus: DataFrame,
    threshold: float = 0.3,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
    bucket_cap: int | None | str = "auto",
    auto_floor: int = AUTO_CAP_FLOOR,
    auto_ceiling: int | None = None,
) -> DataFrame:
    """SEMANTIC dedup groups: connected components over the
    embedding-cosine near-dup graph
    (operators/similarity.py::near_dup_pairs edges with cosine ≥
    threshold) — the "keep one per meaning cluster" primitive of an
    LLM training pipeline, complementing the lexical
    :func:`duplicate_components`. Same label propagation, same
    scale shape: bucketed candidate generation (auto-capped by
    default — near_dup_pairs's census-derived dial, r11), then
    O(diameter) rounds of one shuffle each."""
    from syncflux_spark.operators.similarity import near_dup_pairs

    pairs = near_dup_pairs(
        corpus,
        threshold,
        n_planes,
        dim,
        id_col=id_col,
        vec_col=vec_col,
        bucket_cap=bucket_cap,
        auto_floor=auto_floor,
        auto_ceiling=auto_ceiling,
    )
    return connected_components(
        corpus.select(F.col(id_col)), pairs, id_col, max_iter
    )


def contamination_check(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    k-word shingle with an evaluation/benchmark set, with the count
    of distinct shared shingles as evidence — the standard pretraining
    hygiene step (eval answers leaking into training data inflate
    scores). Real pipelines use k≈8-13 words; the dial is exposed.

    Scale shape: the benchmark side is an eval suite — thousands of
    docs, not billions — so its distinct shingle set is broadcast and
    the training corpus is probed with a map-side hash join BEFORE any
    per-doc dedup: explode → broadcast-probe → aggregate the hits.
    Only matching shingles (a contamination-rate-sized trickle) ever
    shuffle; deduplicating the train shingles first instead would
    shuffle the entire exploded corpus (measured 8.6 s → 1.7 s at
    sf0.1 for this reordering plus the words-staging below). A
    benchmark too large to broadcast
    degrades gracefully to a shuffle join on the shingle key (drop
    the broadcast hint), same semantics."""
    from syncflux_spark.functions.text import shingles_of_words

    def _shingled(df: DataFrame, *keep: str) -> DataFrame:
        # stage the words array as a bound column so the shingle
        # lambda reads an attribute — an inline words(text) would
        # re-run the tokenizing split per shingle (see
        # functions/text.py::shingles_of_words)
        staged = df.select(*keep, words(F.col(text_col)).alias("__ws"))
        return staged.select(
            *keep, F.explode(shingles_of_words(F.col("__ws"), k)).alias("sh")
        )

    bench_sh = _shingled(benchmark).distinct()
    hits = _shingled(train, id_col).join(F.broadcast(bench_sh), "sh")
    # count_distinct absorbs repeated shingles WITHIN a train doc (the
    # job the dropped train-side distinct used to do)
    return hits.groupBy(id_col).agg(
        F.count_distinct("sh").alias("n_shared_shingles")
    )


# ---------------------------------------------------------------------------
# Exact substring dedup (repeated-span detection)
# ---------------------------------------------------------------------------


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 40,
    cross_doc: bool = True,
) -> DataFrame:
    """Exact repeated-substring spans, the substring-dedup shape of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"): find every maximal character range that
    participates in some length-``span_len`` substring occurring in
    ≥2 documents (``cross_doc=True``) or ≥2 times anywhere.

    The suffix-array construction of the paper is replaced by the
    Spark-native equivalent: explode one row per character position
    (O(total_chars) rows — linear, never pairwise), key each
    position by md5 of its length-L window, keep keys whose document
    frequency ≥ 2, then merge surviving positions into maximal spans
    per document with a gaps-and-islands window. Each stage is a
    single hash shuffle (window-key group, id×island group) plus one
    per-document sort for the island scan — no driver state, no
    per-pair work, and the md5 window key is what lets the DuckDB
    oracle replay the pipeline bit-for-bit.

    At 100 TB the explode is the dominant cost and is embarrassingly
    parallel; the duplicate-key join shuffles only (id, pos, h)
    triples. Returns (id, span_start [1-based], span_end [exclusive],
    span_chars) — one row per maximal duplicated span.
    """
    pos = (
        spread_for_cpu(df)
        # guard: Spark's sequence(1, stop) DESCENDS when stop < 1, so a
        # doc shorter than span_len would emit bogus negative positions
        .where(F.length(text_col) >= span_len)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.lit(1), F.length(text_col) - F.lit(span_len - 1)
                )
            ).alias("pos"),
            F.col(text_col),
        )
        .select(
            F.col(id_col),
            F.col("pos"),
            F.md5(
                F.col(text_col).substr(F.col("pos"), F.lit(span_len))
            ).alias("h"),
        )
    )
    # duplicate-key detection as a WINDOW over the hash, not a
    # groupBy + join-back: the join formulation evaluates the
    # explode+md5 subplan twice (once to build the dup set, once to
    # probe it) and pays a second shuffle. One window partitioned on
    # the key shuffles the positions once and computes the
    # cross-doc indicator in the same pass — "≥2 distinct docs" is
    # exactly min(doc) != max(doc), no COUNT DISTINCT needed
    # (measured ~2× on the sf0.1 spans entry).
    from pyspark.sql import Window

    hw = Window.partitionBy("h")
    if cross_doc:
        dup_flag = F.min(id_col).over(hw) != F.max(id_col).over(hw)
    else:
        dup_flag = F.count(F.lit(1)).over(hw) >= 2
    hits = (
        pos.withColumn("_dup", dup_flag)
        .where(F.col("_dup"))
        .select(id_col, "pos")
    )

    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        "_new",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + span_len).over(w), F.lit(-1)),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "_island",
        F.sum("_new").over(
            Window.partitionBy(id_col)
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + span_len).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_chars"),
        )
    )


def duplicate_char_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 40,
) -> DataFrame:
    """Per-document duplicated-character fraction: Σ span_chars /
    n_chars over the maximal spans of :func:`duplicate_spans`, zero
    for documents with no duplicated span (left join keeps them).
    The per-corpus quality dial substring dedup feeds — drop or trim
    documents above a duplication threshold."""
    spans = duplicate_spans(df, text_col, id_col, span_len)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_chars").alias("dup_chars"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return (
        df.select(F.col(id_col), F.length(text_col).alias("n_chars"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_chars",
            F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            (
                F.coalesce("dup_chars", F.lit(0))
                / F.col("n_chars").cast("double")
            ).alias("dup_fraction"),
        )
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup (Hernández-Stolfo '95 family)
# ---------------------------------------------------------------------------


def sorted_neighborhood_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    key_chars: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Sorted-neighborhood candidate generation + exact word-Jaccard
    verify: sort the corpus by a normalized prefix key (first
    ``key_chars`` chars of case-folded, whitespace-collapsed text),
    pair each document with its ``window`` successors in sort order,
    and keep pairs with word-set Jaccard ≥ ``threshold``.

    The complementary family to MinHash banding: candidates are
    O(n·w) by construction (no bucket-skew failure mode — a hot
    band key can flood LSH, but a sort neighborhood is always w
    wide), at the cost of recall limited to near-dups that agree on
    the sort-key prefix. Production systems run several passes with
    different keys; one pass is registered here.

    Scale shape: the sort is a range exchange via
    :func:`syncflux_spark.utils.global_rank` (NEVER a one-partition
    ROW_NUMBER), successor pairing is an equi-join of rank against
    rank+j for j=1..w (explode, then one hash join on the rank),
    and the verify runs on |candidates| rows only.
    """
    from syncflux_spark.utils import global_rank

    keyed = spread_for_cpu(df).select(
        F.col(id_col),
        F.substring(normalized_text(text_col), 1, key_chars).alias("_key"),
        F.array_distinct(words(text_col)).alias("_w"),
    )
    ranked = global_rank(keyed, ["_key", id_col], rank_col="_r")
    probes = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("_key").alias("key_a"),
        F.col("_w").alias("w_a"),
        F.explode(
            F.sequence(F.col("_r") + 1, F.col("_r") + window)
        ).alias("_r"),
    )
    cand = probes.join(
        ranked.select(
            F.col("_r"),
            F.col(id_col).alias("id_b"),
            F.col("_w").alias("w_b"),
        ),
        "_r",
    )
    inter = F.size(F.array_intersect("w_a", "w_b"))
    union = F.size("w_a") + F.size("w_b") - inter
    return (
        cand.select(
            "id_a",
            "id_b",
            (inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "jaccard",
        )
    )


# ---------------------------------------------------------------------------
# Bag-of-words cosine similarity (inverted-index all-pairs)
# ---------------------------------------------------------------------------


def doc_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df_frac: float = 0.10,
) -> DataFrame:
    """Document pairs with bag-of-words cosine similarity ≥
    ``threshold``, computed over the **df-pruned** term space: terms
    appearing in more than ``max_df_frac`` of documents are dropped
    before pairing (the idf intuition as a hard gate — stop words
    carry no similarity signal AND are exactly the terms whose
    inverted lists explode the pair space).

    The all-pairs shape of Bayardo et al. '07 ("Scaling Up All Pairs
    Similarity Search") in its Spark-native form: an inverted index
    (term → postings of (doc, tf)) self-joined per term, partial
    products Σ tf_a·tf_b summed by pair, then normalized by the
    pruned-space vector norms. The df gate bounds every posting list
    at ``max_df_frac·N``, so per-term join work is ≤ (max_df·N)² and
    the hot-key failure mode of raw term joins is structurally
    excluded — the same lever as the prefix filter in
    :func:`word_jaccard_all_pairs`.

    Determinism for the oracle gate: dot products and squared norms
    are INTEGER sums (tf counts), so aggregation order cannot perturb
    them; the only floating ops are two correctly-rounded sqrts and
    one multiply/divide chain, identical in every IEEE engine.
    """
    n_docs = df.count()
    max_df = int(n_docs * max_df_frac)
    toks = (
        spread_for_cpu(df)
        .select(F.col(id_col), F.explode(words(text_col)).alias("t"))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    kept = toks.join(
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("t"),
        "t",
    )
    kept = eager_persist(kept)
    norms = kept.groupBy(id_col).agg(
        F.sum(F.col("tf") * F.col("tf")).alias("_n2")
    )
    a = kept.select(
        F.col("t"),
        F.col(id_col).alias("id_a"),
        F.col("tf").alias("tf_a"),
    )
    b = kept.select(
        F.col("t"),
        F.col(id_col).alias("id_b"),
        F.col("tf").alias("tf_b"),
    )
    dots = (
        a.join(b, "t")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("_dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("_n2").alias("_na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("_n2").alias("_nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_dot").cast("double")
                / (F.sqrt(F.col("_na")) * F.sqrt(F.col("_nb")))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def blocked_edit_distance_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    block_col: F.Column | None = None,
    max_dist: int = 1,
) -> DataFrame:
    """Entity resolution / record linkage: candidate pairs whose
    ``key_col`` strings are within ``max_dist`` Levenshtein edits,
    generated by BLOCKING — the standard linkage decomposition
    (Fellegi-Sunter pipelines, Hernández-Stolfo merge/purge): a
    cheap deterministic block key bounds the candidate set, the
    expensive exact distance runs on candidates only.

    ``block_col`` defaults to the key minus its last ``max_dist``
    characters — exact-recall for SUBSTITUTION-only edits confined to
    the suffix (serial-number / code-style keys), a documented recall
    trade-off otherwise; real deployments pass a domain block key
    (phonetic code, sorted-token prefix, zip+surname). The plan is
    one self-join on the block key (single shuffle, block sizes bound
    the fan-out) + a codegen ``levenshtein`` filter — no UDF, no
    all-pairs stage. Pairs are canonicalized ``id_a < id_b``.
    """
    if block_col is None:
        block_col = F.expr(
            f"substring({key_col}, 1, length({key_col}) - {max_dist})"
        )
    sd = spread_for_cpu(df).select(
        F.col(id_col), F.col(key_col), block_col.alias("_blk")
    )
    a, b = sd.alias("ea"), sd.alias("eb")
    return (
        a.join(
            b,
            (F.col("ea._blk") == F.col("eb._blk"))
            & (F.col(f"ea.{id_col}") < F.col(f"eb.{id_col}")),
        )
        .select(
            F.col(f"ea.{id_col}").alias("id_a"),
            F.col(f"eb.{id_col}").alias("id_b"),
            F.levenshtein(
                F.col(f"ea.{key_col}"), F.col(f"eb.{key_col}")
            ).alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )


# -- winnowing fingerprints (rolling-hash document fingerprinting) ----------


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer-Wilkerson-Aiken, SIGMOD '03 —
    the MOSS algorithm): hash every k-word gram, slide a window of
    ``w`` consecutive gram hashes, keep the minimum of each window.
    Guarantee: any shared run of at least ``w + k - 1`` words between
    two documents contributes at least one shared fingerprint, while
    only ~``2/(w+1)`` of gram hashes are retained — position-robust
    local sampling, unlike the global min of MinHash.

    Implementation note: the fingerprint SET equals the distinct
    window-minima, so no argmin/position bookkeeping is needed — one
    ``min() OVER (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)`` per
    gram plus a distinct. Hashes are md5 hex strings (lexicographic
    min == numeric min on fixed-width hex, identical in any engine).

    Scale shape: the gram explode is linear in corpus tokens and
    embarrassingly parallel; the window runs inside a per-document
    sort (documents hash-partition, no global sort); the distinct is
    a map-side-combined agg on (doc, fp). No pairwise stage.

    Returns (id_col, fp) — one row per retained fingerprint.
    """
    grams = (
        spread_for_cpu(df)
        .select(F.col(id_col), words(text_col).alias("_ws"))
        .select(
            F.col(id_col),
            F.posexplode(shingles_of_words(F.col("_ws"), k)).alias(
                "_pos", "_gram"
            ),
        )
        .select(F.col(id_col), "_pos", F.md5(F.col("_gram")).alias("_h"))
    )
    win = (
        Window.partitionBy(id_col).orderBy("_pos").rowsBetween(0, w - 1)
    )
    return (
        grams.select(
            F.col(id_col),
            F.min("_h").over(win).alias("fp"),
            F.count(F.lit(1)).over(win).alias("_n"),
        )
        # only full windows: a trailing window of fewer than w grams
        # would elect extra minima the algorithm does not define
        .where(F.col("_n") == w)
        .select(id_col, "fp")
        .distinct()
    )


def winnow_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Per-document winnowing profile: gram count, retained
    fingerprint count, retention density, and an order-insensitive
    digest of the fingerprint set (md5 over the sorted fps) — the
    compact per-doc identity a fingerprint store persists. Documents
    too short for one full window stay in the output with zero
    fingerprints and a NULL digest (left join), so the result is a
    full corpus column, not a hit list."""
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    per_doc = fps.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.md5(F.concat_ws(",", F.array_sort(F.collect_list("fp")))).alias(
            "fp_digest"
        ),
    )
    base = spread_for_cpu(df).select(
        F.col(id_col),
        F.greatest(
            F.size(words(text_col)) - F.lit(k - 1), F.lit(0)
        ).cast("long").alias("n_grams"),
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_fingerprints", F.lit(0)).cast("long").alias(
                "n_fingerprints"
            ),
            "fp_digest",
            (
                F.coalesce("n_fingerprints", F.lit(0)).cast("double")
                / F.greatest("n_grams", F.lit(1)).cast("double")
            ).alias("density"),
        )
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    max_df: int = 50,
    min_overlap: float = 0.2,
) -> DataFrame:
    """Document pairs sharing winnowing fingerprints — MOSS-style
    local-similarity detection. Candidates come from fingerprint
    posting lists: fingerprints held by 2..``max_df`` documents pair
    the documents that share them (a fingerprint in more than
    ``max_df`` docs is boilerplate — a stop-fingerprint, dropped like
    a df-gated posting in Bayardo '07). Overlap score =
    |shared| / min(|A|, |B|) — containment-style, so a small doc
    embedded in a large one still scores high.

    Scale shape: posting-list self-join on the fingerprint key — the
    fan-out per fingerprint is bounded by ``max_df`` choose 2, so the
    candidate volume is O(#fps * max_df), never O(n_docs**2)."""
    fps = eager_persist(winnow_fingerprints(df, text_col, id_col, k=k, w=w))
    sizes = fps.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_fp")
    )
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select("fp")
    )
    posting = fps.join(keep, "fp")
    a, b = posting.alias("pa"), posting.alias("pb")
    shared = (
        a.join(
            b,
            (F.col("pa.fp") == F.col("pb.fp"))
            & (F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}")),
        )
        .groupBy(
            F.col(f"pa.{id_col}").alias("id_a"),
            F.col(f"pb.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_fp_a")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_fp_b")
    )
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / F.least("n_fp_a", "n_fp_b").cast("double")
            ).alias("overlap"),
        )
        .where(F.col("overlap") >= min_overlap)
    )


def winnow_incremental_pairs(
    index_fps: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    max_df: int = 50,
    min_overlap: float = 0.2,
) -> DataFrame:
    """Incremental winnowing overlap: fingerprint ONLY the new batch
    and pair it against a PERSISTED corpus fingerprint table
    (``index_fps`` = a stored :func:`winnow_fingerprints` result) —
    the ingest-loop form of :func:`winnow_overlap_pairs`, mirroring
    incremental_dedup_indexed: the corpus is never re-shingled, so
    per-batch cost is O(batch) + the posting join. Pairs cover
    batch×corpus AND batch×batch (a fresh batch can collide with
    itself); corpus×corpus pairs are the previous runs' output and
    are not re-emitted. The df stop-fingerprint gate counts over the
    COMBINED posting list, so boilerplate that only becomes hot with
    the new batch is gated correctly."""
    batch_fps = eager_persist(
        winnow_fingerprints(batch, text_col, id_col, k=k, w=w)
    )
    # r13: one flagged union instead of separate batch/all posting
    # builds — the batch side of the pair join is posting rows with
    # is_batch set (identical set to the old batch_fps⋈keep), so the
    # df-gate join runs ONCE and the pair join's two sides scan the
    # same persisted frame (one exchange, reused). Previously the
    # keep aggregate fed two separate joins and the index∪batch union
    # was rebuilt per consumer.
    all_fps = index_fps.select(
        F.col(id_col), F.col("fp"), F.lit(False).alias("_is_batch")
    ).unionByName(
        batch_fps.select(
            F.col(id_col), F.col("fp"), F.lit(True).alias("_is_batch")
        )
    )
    sizes = all_fps.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_fp")
    )
    keep = (
        all_fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select("fp")
    )
    posting = eager_persist(all_fps.join(keep, "fp"))
    b = posting.where(F.col("_is_batch")).alias("pb")
    a = posting.alias("pa")
    # candidate pairs must include a batch doc; canonicalize id_a<id_b
    shared = (
        b.join(
            a,
            (F.col("pb.fp") == F.col("pa.fp"))
            & (F.col(f"pb.{id_col}") != F.col(f"pa.{id_col}")),
        )
        .select(
            F.least(F.col(f"pb.{id_col}"), F.col(f"pa.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"pb.{id_col}"), F.col(f"pa.{id_col}")).alias(
                "id_b"
            ),
            "pb.fp",
        )
        .distinct()
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_fp_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / F.least("n_fp_a", "n_fp_b").cast("double")
            ).alias("overlap"),
        )
        .where(F.col("overlap") >= min_overlap)
    )
