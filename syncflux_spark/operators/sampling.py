"""Deterministic sampling & dataset splits for training pipelines.

A 100 TB corpus can't use ``df.sample`` for train/val/test assignment:
Spark's sampler is seeded per-partition, so adding files, changing
partitioning, or re-running on a different cluster reshuffles which
rows land where — silently leaking held-out documents into training.
The primitives here derive the assignment from a **content hash of the
row's id plus a salt**, so a document's split is a pure function of
its identity: stable across runs, engines, partitionings, and
incremental corpus growth (new docs don't move old ones).

Mechanics: ``md5(id || salt)`` is uniform; its first 4 hex chars give
a 16-bit bucket compared AS A STRING against precomputed hex
thresholds (fixed-width lowercase hex compares lexicographically ==
numerically, the same trick as the MinHash lanes in operators/dedup.py
— and the only formulation both Spark and a SQL oracle reproduce
bit-for-bit without integer-parsing builtins). Granularity is
1/65536 ≈ 0.0015%; fractions round down to it.

Everything is a pure column expression — no shuffle, no UDF; the
assignment rides whatever scan produces the rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex chars


def _hex_threshold(fraction: float) -> str:
    """Cumulative fraction → 4-hex-char upper bound (floor). A full
    1.0 maps to ``"~"`` (> any hex char) so rate-1.0 keeps every row —
    the 5-digit ``"10000"`` would compare LESS than most 4-hex buckets
    lexicographically."""
    n = min(_BUCKETS, max(0, int(fraction * _BUCKETS)))
    return "~" if n >= _BUCKETS else format(n, "04x")


def _bucket(id_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 4
    )


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, cumulative-upper-bound-hex)] in declaration order;
    the last split absorbs the rounding remainder. Shared by the Spark
    operator and SQL-oracle generation so both use identical bounds."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, cum = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, _hex_threshold(cum)))
    out.append((names[-1], "ffff~"))  # "~" > any hex char: catch-all
    return out


def split_assign(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Append a ``split`` column assigning each row to train/val/test
    (or any named fractions) by salted content hash. Change ``salt``
    to draw a fresh independent assignment; keep it fixed to keep the
    split stable forever."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = _bucket(id_col, salt)
    bounds = split_thresholds(fractions)
    expr = None
    for name, bound in bounds[:-1]:
        cond = b < F.lit(bound)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(bounds[-1][0])
    return df.withColumn(
        "split", last if expr is None else expr.otherwise(last)
    )


def deterministic_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by salted content hash — the
    reproducible alternative to ``df.sample`` (same rows survive
    regardless of partitioning or cluster). Different salts give
    independent samples; the same salt at a higher rate yields a
    SUPERSET of the lower rate's rows (nested samples, the property
    that makes scaling-law subsets comparable)."""
    return df.where(_bucket(id_col, salt) < F.lit(_hex_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    class_col: str,
    id_col: str = "doc_id",
    salt: str = "strat-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-class deterministic sampling — the corpus-rebalancing
    primitive (downweight the dominant language/source, keep the rest
    whole). Same salted-hash bucket as :func:`deterministic_sample`,
    but the keep-threshold is selected by ``class_col``; within every
    class the kept rows are stable and nested across rate changes.
    Still a pure column expression: the per-class CASE costs nothing
    and nothing shuffles."""
    b = _bucket(id_col, salt)
    thr = None
    for cls, rate in rates.items():
        cond = F.col(class_col) == F.lit(cls)
        bound = F.lit(_hex_threshold(rate))
        thr = F.when(cond, bound) if thr is None else thr.when(cond, bound)
    default = F.lit(_hex_threshold(default_rate))
    return df.where(b < (default if thr is None else thr.otherwise(default)))


def sql_stratified_where(
    rates: dict[str, float],
    class_col: str,
    id_col: str = "doc_id",
    salt: str = "strat-v1",
    default_rate: float = 0.0,
) -> str:
    """DuckDB WHERE-clause mirror of :func:`stratified_sample`."""
    whens = " ".join(
        f"WHEN {class_col} = '{cls}' THEN '{_hex_threshold(rate)}'"
        for cls, rate in rates.items()
    )
    case = f"CASE {whens} ELSE '{_hex_threshold(default_rate)}' END"
    return f"{sql_bucket(id_col, salt)} < {case}"


def sql_bucket(id_col: str, salt: str) -> str:
    """DuckDB mirror of the bucket expression (oracle generation)."""
    return f"substr(md5(CAST({id_col} AS VARCHAR) || '{salt}'), 1, 4)"


def sql_split_case(
    fractions: dict[str, float], id_col: str = "doc_id", salt: str = "split-v1"
) -> str:
    """DuckDB CASE expression equivalent to :func:`split_assign`."""
    b = sql_bucket(id_col, salt)
    parts = []
    for name, bound in split_thresholds(fractions)[:-1]:
        parts.append(f"WHEN {b} < '{bound}' THEN '{name}'")
    last = list(fractions)[-1]
    return f"CASE {' '.join(parts)} ELSE '{last}' END"


def quota_cap(
    df: DataFrame,
    n_per_class: int,
    class_col: str,
    id_col: str = "doc_id",
    salt: str = "quota-v1",
) -> DataFrame:
    """Cap each class (source/domain) at ``n_per_class`` rows — the
    C4-style "no domain dominates" step. Which rows survive is
    deterministic: rank by salted hash then id (a total order), so
    re-runs and repartitions keep the same subset, and raising the cap
    yields a superset. One shuffle on the class key; a pathologically
    hot class concentrates its rank computation in one task, but the
    window only carries a counter — state is O(1) per task, so the
    skew cost is scan time, not memory."""
    from pyspark.sql import Window

    win = Window.partitionBy(class_col).orderBy(
        _bucket(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("class_rank", F.row_number().over(win).cast("long"))
        .where(F.col("class_rank") <= n_per_class)
    )


def pack_bins(
    df: DataFrame,
    token_budget: int,
    token_col: str,
    class_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing: concatenate documents in deterministic order
    (by id, within each class/shard) and chunk the token stream into
    ``token_budget``-sized context windows; each doc is assigned the
    bin where it STARTS. This is the standard pretraining
    concat-then-chunk packing, shaped for Spark: one window cumsum per
    class partition (exact integers), no global sort — packing is
    per-shard by design so 1000 executors pack 1000 shards
    independently."""
    from pyspark.sql import Window

    win = (
        Window.partitionBy(class_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(win)
    return df.select(
        F.col(id_col),
        F.col(class_col),
        F.col(token_col),
        cum.alias("cum_tokens"),
        F.expr(f"(sum({token_col}) over (partition by {class_col} "
               f"order by {id_col} rows between unbounded preceding and "
               f"current row) - {token_col}) div {token_budget}")
        .alias("bin"),
    )


def epoch_shuffle(
    df: DataFrame,
    seed: str = "epoch0",
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-epoch shuffle: every doc gets a
    global position under the order md5(seed·id) — a different seed
    permutes the corpus into a fresh epoch order, the same seed
    replays the identical order on any cluster layout — plus a
    round-robin shard assignment (position mod n_shards), which keeps
    shard sizes balanced to ±1 doc with zero knowledge of the total
    count.

    Scale shape: the global position rides
    :func:`syncflux_spark.utils.global_rank` — ONE range exchange on
    the hash key + per-partition ranks + B driver-side count scalars,
    never a one-partition ROW_NUMBER. This is the manifest a loader
    consumes; the data itself doesn't move until shards are read.

    Output: (id, shuffle_key, position, shard)."""
    from pyspark.sql import functions as F

    from syncflux_spark.utils import global_rank

    keyed = df.select(
        F.col(id_col),
        F.md5(
            F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
        ).alias("shuffle_key"),
    )
    ranked = global_rank(keyed, ["shuffle_key", id_col], rank_col="position")
    return ranked.select(
        id_col,
        "shuffle_key",
        F.col("position").cast("long").alias("position"),
        ((F.col("position") - 1) % n_shards).cast("integer").alias("shard"),
    )


def mixture_rates(
    counts: dict[str, int], targets: dict[str, float]
) -> dict[str, float]:
    """Per-group acceptance rates that hit a target mixture by
    DOWNSAMPLING only (no duplication): the largest achievable output
    is capped by the scarcest group relative to its target share —
    n_out = min_g(n_g / w_g) — and every group then keeps
    (n_out · w_g) / n_g of its rows. Shared by the Spark operator and
    the SQL-oracle generator so both engines compute bit-identical
    rates (same op order: divide, min, multiply, divide)."""
    total_w = sum(targets.values())
    if not 0.999 <= total_w <= 1.001:
        raise ValueError(f"target weights must sum to 1, got {total_w}")
    missing = sorted(g for g in targets if g not in counts)
    if missing:
        raise ValueError(f"target groups absent from data: {missing}")
    n_out = min(counts[g] / w for g, w in targets.items())
    return {g: (n_out * w) / counts[g] for g, w in targets.items()}


def _rate_threshold(rate: float) -> str:
    """Acceptance rate → the 4-hex bucket bound (floor to 65536ths);
    rate 1.0 → '~' (keeps every bucket), mirroring _hex_threshold."""
    n = int(rate * _BUCKETS)
    return "~" if n >= _BUCKETS else format(n, "04x")


def mixture_resample(
    df: DataFrame,
    targets: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic mixture resampling — the data-mixing step of a
    training pipeline (DoReMi-style STATIC target weights; the
    optimization loop that produces the weights is upstream): keep a
    hash-thresholded subset of each listed group so the output's
    group shares match ``targets``, retaining as much data as the
    scarcest group allows. Groups not in ``targets`` drop entirely.

    Two passes: one partial-agg count per group (collected — groups
    are a handful of sources, never data-sized) to derive the rates,
    then one filter scan with the per-group threshold as a CASE over
    the same md5 bucket machinery as split_assign — seed-free,
    cluster-layout-independent, re-runnable."""
    counts = {
        r[0]: r[1] for r in df.groupBy(group_col).count().collect()
    }
    rates = mixture_rates(counts, targets)
    bucket = _bucket(id_col, salt)
    cond = None
    for g, r in rates.items():
        c = (F.col(group_col) == g) & (bucket < F.lit(_rate_threshold(r)))
        cond = c if cond is None else (cond | c)
    return df.where(cond)


def leakage_safe_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    salt: str = "split-v1",
) -> DataFrame:
    """Train/val/test assignment with ZERO near-dup leakage by
    construction: documents are first clustered into near-dup
    components (LSH candidates → exact Jaccard ≥ threshold →
    connected components), then the split is keyed on the COMPONENT
    label, so every member of a dup cluster lands in the same split.
    Splitting per-doc and repairing afterwards can't give this
    guarantee (a repaired doc's partner may itself have another
    cross-split partner); splitting per-component makes cross-split
    near-dup pairs impossible at any corpus size.

    Output: (id, component, split). Deterministic: the component
    label is the cluster's min id and the split is a salted hash of
    the label — stable across runs, partitionings and corpus growth
    for unchanged clusters."""
    from syncflux_spark.operators.dedup import duplicate_components

    comp = duplicate_components(
        df, text_col=text_col, id_col=id_col, threshold=threshold
    )
    return split_assign(comp, fractions, id_col="component", salt=salt)
