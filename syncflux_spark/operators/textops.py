"""Text-analysis operators (DataFrame-level) for the documents table.

Composes the expression builders in functions/text.py into the
pipeline stages a training-data curation job runs: token counting,
quality scoring, language ID, fingerprinting. All narrow per-row
transforms — zero shuffles, linear scale-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from syncflux_spark.utils import spread_for_cpu
from syncflux_spark.functions.text import (
    lang_id,
    lang_scores,
    longest_equal_run,
    quality_metrics,
    shingles_of_words,
    token_count,
    word_fingerprint,
    words,
)


def analyze_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token statistics per document."""
    m = quality_metrics(text_col)
    return spread_for_cpu(df).select(
        F.col(id_col),
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        m["n_distinct_tokens"].alias("n_distinct_tokens"),
        m["mean_word_len"].alias("mean_word_len"),
        m["distinct_ratio"].alias("distinct_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """A simple composite quality gate: flags docs that are too short,
    too repetitive, or degenerate. The score is a deterministic
    integer rubric (one point per passed check) — portable to SQL."""
    m = quality_metrics(text_col)
    checks = [
        (m["n_tokens"] >= 10).cast("long"),
        (m["n_chars"] >= 50).cast("long"),
        (m["distinct_ratio"] >= 0.3).cast("long"),
        (m["mean_word_len"] >= 3).cast("long"),
    ]
    score = checks[0]
    for c in checks[1:]:
        score = score + c
    return spread_for_cpu(df).select(
        F.col(id_col),
        m["n_tokens"].alias("n_tokens"),
        m["distinct_ratio"].alias("distinct_ratio"),
        score.alias("quality_score"),
        (score >= 3).alias("passes"),
    )


def detect_language(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language ID with per-language scores."""
    scores = lang_scores(text_col)
    cols = [F.col(id_col)]
    for lang in sorted(scores):
        cols.append(scores[lang].alias(f"score_{lang}"))
    cols.append(lang_id(text_col).alias("pred_lang"))
    return spread_for_cpu(df).select(*cols)


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive word-set fingerprint + token count."""
    return spread_for_cpu(df).select(
        F.col(id_col),
        word_fingerprint(text_col).alias("fingerprint"),
        token_count(text_col).alias("n_tokens"),
    )


def doc_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document salient terms: rank terms by (tf DESC, corpus
    doc-frequency ASC, term ASC) and keep the top ``k`` — the TF-IDF
    ordering with the log taken out. A log changes no per-document
    ranking that (tf, df) doesn't already decide, and libm logs are
    engine/platform-dependent — integers are the portable (and
    cheaper) formulation.

    One explode feeds everything: tf = per-(doc, term) counts; df is
    re-aggregated FROM tf (each tf row is one distinct (doc, term), so
    df = row count per term — no second pass over the corpus). Join
    back on term, rank with a per-doc window. Shuffles: tf partial-agg,
    df re-agg, term join, doc window — all on bounded keys; no
    all-pairs anywhere."""
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("w"))
    tf = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    win = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("w")
    )
    return (
        tf.join(dfreq, "w")
        .select(
            F.col(id_col),
            F.col("w").alias("term"),
            "tf",
            "df",
            F.row_number().over(win).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style repetition signals per document: the share of
    the most frequent token and bigram, and the longest consecutive
    same-token run. High top-bigram share or long runs mark the
    boilerplate / keyword-stuffed docs a curation pipeline drops.

    Every signal is an in-row array fold (sort the token/bigram list,
    take the longest equal-adjacent run = max multiplicity) — zero
    shuffles and no per-doc groupBy, so it scales exactly like a
    projection. Counts are exact longs; the single ratio is one
    long/long division (portable to the DuckDB oracle, which computes
    the same counts via unnest + GROUP BY)."""
    # stage words/bigrams as bound columns: the bigram lambda would
    # otherwise re-run the tokenizing split per element
    # (functions/text.py::shingles_of_words)
    staged = spread_for_cpu(df).select(
        F.col(id_col), words(F.col(text_col)).alias("__ws")
    ).select(
        F.col(id_col),
        F.col("__ws"),
        shingles_of_words(F.col("__ws"), 2).alias("__bg"),
    )
    ws, bg = F.col("__ws"), F.col("__bg")
    n_tokens = F.size(ws).cast("long")
    n_bigrams = F.size(bg).cast("long")
    top_token_cnt = longest_equal_run(F.array_sort(ws))
    top_bigram_cnt = longest_equal_run(F.array_sort(bg))
    return staged.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_bigrams.alias("n_bigrams"),
        top_token_cnt.alias("top_token_cnt"),
        top_bigram_cnt.alias("top_bigram_cnt"),
        longest_equal_run(ws).alias("max_token_run"),
        F.when(n_bigrams > 0, top_bigram_cnt / n_bigrams)
        .otherwise(F.lit(None).cast("double"))
        .alias("top_bigram_frac"),
    )


def token_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Lexical diversity per document, log-free: type-token ratio and
    Gini impurity 1 − Σ(tf/n)² of the token distribution (entropy's
    libm-free stand-in — same ordering of repetitive vs diverse docs,
    but exact-rational so the oracle gate stays bitwise). (doc_id,
    n_tokens, n_types, ttr, gini).

    Zero shuffle: the token histogram is never materialized — the
    sorted words array is folded in-row (run-length walk tracking the
    current run, Σrun², and the type count), the same
    whole-stage-codegen pattern as repetition_stats. Σtf² ≤ n² stays
    in int64 for any document under ~3e9 tokens."""
    from syncflux_spark.functions.text import words

    sorted_ws = F.array_sort(words(text_col))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("sum2"),
        F.lit(0).cast("long").alias("types"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["sum2"])
            .otherwise(acc["sum2"] + acc["run"] * acc["run"])
            .alias("sum2"),
            F.when(same, acc["types"]).otherwise(acc["types"] + 1).alias("types"),
        )

    folded = F.aggregate(
        sorted_ws,
        init,
        step,
        lambda acc: F.struct(
            (acc["sum2"] + acc["run"] * acc["run"]).alias("sum2"),
            acc["types"].alias("types"),
        ),
    )
    n = F.size(sorted_ws).cast("long")
    out = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        folded["types"].alias("n_types"),
        folded["sum2"].alias("sum_tf2"),
    ).where(F.col("n_tokens") > 0)
    n_d = F.col("n_tokens").cast("double")
    return out.select(
        F.col(id_col),
        "n_tokens",
        "n_types",
        (F.col("n_types").cast("double") / n_d).alias("ttr"),
        (F.lit(1.0) - F.col("sum_tf2").cast("double") / (n_d * n_d)).alias("gini"),
    )


def lm_predictability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Statistical language-model quality score: per document, the
    mean in-corpus bigram transition probability P(w2|w1) =
    count(w1 w2) / count(w1 ·) — the log-free cousin of CCNet's LM
    perplexity filter (documents whose word transitions are unusual
    for the corpus score low: boilerplate scores high, shuffled or
    off-domain text scores low). (doc_id, n_bigrams, mean_prob);
    docs with fewer than two words drop out.

    Exactness: each transition probability is ONE double division of
    exact integer counts; the per-doc mean folds the probabilities in
    bigram-position order (sorted in-row fold), so the float sum has
    one deterministic association on every engine.

    Scale: the transition table is vocabulary-shaped, built by two
    partial-agg passes over the exploded corpus and joined back
    broadcast when small (Spark auto-broadcasts under the threshold;
    a web-scale bigram table falls back to a hash join on the bigram
    key — both fine, the corpus-sized side is never collected)."""
    from syncflux_spark.functions.text import shingles_of_words, words

    staged = df.select(F.col(id_col), words(text_col).alias("ws"))
    bg = staged.select(
        F.col(id_col),
        F.posexplode(shingles_of_words(F.col("ws"), 2)).alias("i", "bg"),
    )
    cb = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    cw = (
        cb.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .groupBy("w1")
        .agg(F.sum("c_bg").alias("c_w1"))
    )
    pt = (
        cb.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .join(cw, "w1")
        .select(
            "bg",
            (F.col("c_bg").cast("double") / F.col("c_w1").cast("double")).alias("p"),
        )
    )
    j = bg.join(pt, "bg")
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("i", "p"))), lambda s: s["p"]
    )
    g = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x).alias("total"),
    )
    return g.select(
        F.col(id_col),
        "n_bigrams",
        (F.col("total") / F.col("n_bigrams").cast("double")).alias("mean_prob"),
    )


def bm25_rank(
    df: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyword search: rank documents by a BM25-shaped score for a
    fixed bag of query ``terms``. (doc_id, score), top-``k``.

    The idf factor is the log-free rational form (N - df + ½)/(df + ½)
    — a monotone transform of the textbook ln(1 + ·), so the RANKING
    is identical while every arithmetic step stays in plain IEEE ops
    (no libm, bit-identical across engines).

    Scale shape: the token explode is filtered to the query terms
    before any aggregation (predicate on the exploded value — the
    corpus-sized token stream never reaches a shuffle); doc length
    comes free from the staged words array; the three corpus scalars
    (N, Σdl, per-term df) are broadcast back via 1-row / |terms|-row
    cross joins; the final top-k is TakeOrderedAndProject. Per-term
    partial scores collapse in one fixed left-assoc sum so the float
    result is order-deterministic."""
    from syncflux_spark.functions.text import words

    staged = df.select(F.col(id_col), words(text_col).alias("ws"))
    dl = staged.select(F.col(id_col), F.size("ws").cast("long").alias("dl"))
    tf = (
        staged.select(F.col(id_col), F.explode("ws").alias("t"))
        .where(F.col("t").isin(terms))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total_dl")
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n_d = F.col("n").cast("double")
    df_d = F.col("df").cast("double")
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    idf = (n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5))
    avgdl = F.col("total_dl").cast("double") / n_d
    den = tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl_d / avgdl))
    sc = (
        tf.join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(dfreq), "t")
        .select(F.col(id_col), "t", ((idf * (tf_d * F.lit(k1 + 1.0))) / den).alias("s"))
    )
    per_term = [
        F.coalesce(F.max(F.when(F.col("t") == t, F.col("s"))), F.lit(0.0))
        for t in terms
    ]
    score = per_term[0]
    for p in per_term[1:]:
        score = score + p
    return (
        sc.groupBy(id_col)
        .agg(score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
]
"""(name, pattern, mask) triples, applied in order. Patterns stick to
the regex subset Java (Spark) and RE2 (DuckDB/Go) agree on — character
classes, bounded repeats, \\b — no lookaround, no backrefs."""


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Mask PII-shaped spans (emails, URLs, phone fragments) and count
    what was masked — the redaction pass a training-data pipeline runs
    before anything is retained. Pure column expressions: per-pattern
    `regexp_count` on the source text plus a chained `regexp_replace`,
    all inside whole-stage codegen — no UDFs, no shuffle, scales as a
    map-only pass. Output: (id, n_<pattern>..., scrubbed)."""
    counts = []
    masked = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        masked = F.regexp_replace(masked, pat, token)
    return df.select(F.col(id_col), *counts, masked.alias("scrubbed"))


def bigram_top_terms(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus bigram statistics: top-``k`` adjacent word pairs by
    document frequency, with total occurrence counts — the phrase-level
    companion to :func:`vocab_top_terms` (boilerplate headers, license
    blurbs and navigation chrome show up here long before they dominate
    any unigram list). (bigram, doc_freq, total_tf).

    The words array is staged as a real column before the shingle
    lambda (free subexpressions inside higher-order-function lambdas
    re-evaluate per element — see functions/text.py::shingles_of_words),
    then the same two partial-aggregating shuffles + per-partition
    top-k heap merge as the unigram path: TakeOrderedAndProject, never
    a global sort."""
    from syncflux_spark.functions.text import shingles_of_words, words

    staged = df.select(F.col(id_col), words(text_col).alias("ws"))
    toks = staged.select(
        F.col(id_col), F.explode(shingles_of_words(F.col("ws"), 2)).alias("bg")
    )
    per = toks.groupBy("bg").agg(
        F.count_distinct(F.col(id_col)).alias("doc_freq"),
        F.count(F.lit(1)).alias("total_tf"),
    )
    return (
        per.orderBy(F.desc("doc_freq"), F.asc("bg"))
        .limit(k)
        .select(F.col("bg").alias("bigram"), "doc_freq", "total_tf")
    )


def vocab_top_terms(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary statistics: the top-``k`` tokens by document
    frequency, with total term frequency alongside — the
    stop-word/domain-term profile a pipeline consults before setting
    dedup caps or quality filters. (word, doc_freq, total_tf).

    Two partial-aggregating shuffles (per-doc distinct, then global
    per-word), then top-k via sort+limit — Spark plans that as
    TakeOrderedAndProject (per-partition heaps + merge on the driver),
    NOT a global sort shuffle, so the vocabulary never materializes
    in one place. Ties are impossible in the limit: (doc_freq DESC,
    word ASC) is a total order because word is unique."""
    from syncflux_spark.functions.text import words

    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("w"))
    per_word = toks.groupBy("w").agg(
        F.count_distinct(F.col(id_col)).alias("doc_freq"),
        F.count(F.lit(1)).alias("total_tf"),
    )
    return (
        per_word.orderBy(F.desc("doc_freq"), F.asc("w"))
        .limit(k)
        .select(F.col("w").alias("word"), "doc_freq", "total_tf")
    )


def passage_stats(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into NON-overlapping ``k``-word passages
    with a content hash — the unit for cross-document repeated-passage
    (boilerplate) detection, the passage-level sibling of document-
    level dedup. (id, passage_id, n_tokens, passage_hash).

    Map-only: a sequence of passage starts exploded per row, each
    passage a slice of the staged words array; the 1→N expansion is
    bounded by tokens/k. No shuffle until a consumer aggregates."""
    from syncflux_spark.functions.text import words

    staged = df.select(F.col(id_col), words(text_col).alias("ws"))
    return staged.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws"), F.lit(k)),
                lambda s: F.slice("ws", s, k),
            )
        ).alias("passage_id", "pw"),
    ).select(
        id_col,
        F.col("passage_id").cast("long").alias("passage_id"),
        F.size("pw").cast("long").alias("n_tokens"),
        F.md5(F.array_join("pw", " ")).alias("passage_hash"),
    )


def boilerplate_passages(
    df: DataFrame,
    k: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Passages repeated across ≥ ``min_df`` distinct documents —
    CCNet-style boilerplate discovery (headers, disclaimers, templated
    text that document-level dedup can't see). (passage_hash, df_docs,
    n_occurrences, example_doc).

    One hash aggregation on the passage digest with map-side partial
    agg: the shuffle carries one row per distinct passage, not per
    passage occurrence. A hot passage (site-wide boilerplate on
    millions of pages) is exactly what partial aggregation collapses
    before the exchange — no skew problem by construction."""
    p = passage_stats(df, k=k, text_col=text_col, id_col=id_col)
    return (
        p.groupBy("passage_hash")
        .agg(
            F.count_distinct(F.col(id_col)).alias("df_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.col(id_col)).alias("example_doc"),
        )
        .where(F.col("df_docs") >= min_df)
    )


def doc_boilerplate_ratio(
    df: DataFrame,
    k: int = 8,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document boilerplate exposure: how much of each document is
    passages shared with ≥ ``min_df`` documents, and the token count
    left after removing them — the passage-level cleaning decision a
    corpus pipeline applies after document dedup.
    (id, n_passages, n_boiler_passages, boiler_ratio, clean_tokens).

    Plan: passage explode (map-only) → document-frequency hash agg →
    hash join back on the digest → per-doc hash agg. The df-aggregate
    and the join share the passage_hash key, so the join reuses the
    aggregation's partitioning (one effective extra shuffle for the
    per-doc rollup). The boilerplate set is NOT broadcast by
    assumption — at corpus scale it can be large; the hash join
    handles either case and AQE converts it to broadcast when the
    filtered side turns out small."""
    p = passage_stats(df, k=k, text_col=text_col, id_col=id_col)
    dfreq = p.groupBy("passage_hash").agg(
        F.count_distinct(F.col(id_col)).alias("df_docs")
    )
    j = p.join(dfreq, "passage_hash")
    boiler = F.col("df_docs") >= min_df
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(boiler.cast("long")).alias("n_boiler_passages"),
        (
            F.sum(boiler.cast("long")).cast("double") / F.count(F.lit(1))
        ).alias("boiler_ratio"),
        F.sum(F.when(~boiler, F.col("n_tokens")).otherwise(F.lit(0))).alias(
            "clean_tokens"
        ),
    )


def pmi_bigrams(
    df: DataFrame,
    k: int = 50,
    min_count: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information —
    phrases whose words co-occur far more than unigram frequencies
    predict (named entities, idioms, templated boilerplate), the
    association signal behind phrase vocabularies and tokenizer merge
    candidates.

    Emits the PMI **ratio** p(w1,w2) / (p(w1)·p(w2)) rather than its
    log: the ratio is pure integer-derived arithmetic
    ((c12·N·N) / (M·c1·c2)), bit-identical across engines, whereas a
    transcendental log invites last-ulp drift between libm
    implementations. Monotone in PMI, so the ranking is the same.

    Plan shape: two token-level aggregations (unigram, bigram) — each
    one partial-agg shuffle — a two-key join of bigrams to unigram
    counts, broadcast scalar totals, and a top-k heap
    (TakeOrderedAndProject). All counts stay JVM-side column
    expressions."""
    from syncflux_spark.functions.text import shingles_of_words, words

    staged = df.select(F.col(id_col), words(text_col).alias("ws"))
    uni = (
        staged.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        staged.select(F.explode(shingles_of_words(F.col("ws"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= min_count)
        .select(
            "bg",
            "c12",
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
        )
    )
    totals = staged.select(
        F.sum(F.size("ws")).alias("n_tokens"),
        F.sum(F.greatest(F.size("ws") - 1, F.lit(0))).alias("n_bigrams"),
    )
    from pyspark.sql.functions import broadcast

    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    joined = bi.join(u1, "w1").join(u2, "w2").crossJoin(broadcast(totals))
    # double-side multiplication, left-associated identically in the
    # DuckDB oracle: integer products of corpus-level counts would
    # overflow int64 at ~1e13 tokens, doubles never do
    scored = joined.select(
        F.col("bg").alias("bigram"),
        F.col("c12"),
        (
            (F.col("c12").cast("double") * F.col("n_tokens") * F.col("n_tokens"))
            / (F.col("n_bigrams").cast("double") * F.col("c1") * F.col("c2"))
        ).alias("pmi_ratio"),
    )
    return scored.orderBy(F.desc("pmi_ratio"), F.asc("bigram")).limit(k)


def bpe_merge_candidates(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent-symbol merge candidates over the corpus —
    the counting step of one BPE iteration (Sennrich et al. '16,
    arXiv:1508.07909) at the character level: for every word, count
    adjacent character pairs, weight by corpus word frequency, rank
    pairs by total count. The pair a real tokenizer trainer would
    merge first is the top row.

    Corpus-scale shape: words are aggregated to (word, freq) FIRST —
    one partial-agg shuffle collapses the Zipf head, so the char-pair
    explode runs once per DISTINCT word, not once per token ('the'
    explodes 2 pairs once, weighted 60M, instead of 60M times). The
    pair aggregation is a second bounded-key shuffle; top-k is a heap
    (TakeOrderedAndProject), never a global sort."""
    from syncflux_spark.functions.text import words

    wf = (
        spread_for_cpu(df)
        .select(F.explode(words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.length("w") >= 2)
    )
    pairs = wf.select(
        F.col("freq"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def lang_consistency(
    df: DataFrame,
    chunk_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Code-switching / mixed-language detection: split each document
    into ``chunk_tokens``-token chunks, language-ID each chunk with
    the marker heuristic, and report per document the majority
    language, its chunk share, and the distinct-language count. A doc
    whose chunks disagree (mix_ratio high, n_langs > 1) is
    concatenation garbage or code-switched text — the per-document
    lang_id alone calls it whatever wins globally and hides the mix.

    Shape: one explode of chunk starts (bounded by tokens/chunk), the
    per-chunk language fold as pure column expressions, then two
    bounded aggregations per doc (per-lang counts, then majority via
    a per-doc window over ≤|languages| rows). No corpus-wide state.

    Output: (id, n_chunks, majority_lang, n_majority, mix_ratio,
    n_langs)."""
    from pyspark.sql import Window

    from syncflux_spark.functions.text import lang_id, words

    staged = spread_for_cpu(df).select(
        F.col(id_col), words(text_col).alias("_ws")
    )
    chunks = staged.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(1), F.size("_ws"), F.lit(chunk_tokens)
            )
        ).alias("_st"),
        F.col("_ws"),
    ).select(
        F.col(id_col),
        F.array_join(
            F.slice("_ws", F.col("_st"), chunk_tokens), " "
        ).alias("_ct"),
    )
    labeled = chunks.select(F.col(id_col), lang_id("_ct").alias("lang"))
    per = labeled.groupBy(id_col, "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("n"), F.asc("lang"))
    top = (
        per.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("lang").alias("majority_lang"),
            F.col("n").alias("n_majority"),
        )
    )
    totals = per.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    return (
        totals.join(top, id_col)
        .select(
            id_col,
            "n_chunks",
            "majority_lang",
            "n_majority",
            (
                F.lit(1) - F.col("n_majority") / F.col("n_chunks")
            ).alias("mix_ratio"),
            "n_langs",
        )
    )


#: Gopher rule 6's stopword probe (Rae et al. 2021, app. A1.1): a doc
#: of natural English prose contains at least 2 of these.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """The Gopher quality-filter rules (Rae et al. 2021, appendix A1.1
    — the de-facto standard web-scale pretraining text gate) as one
    per-document flag row: word-count bounds, mean-word-length bounds,
    symbol-to-word ratio (``#``/``…``), alphabetic-word ratio, and
    stopword presence, plus the AND of all of them.

    Every signal is a per-row array fold over the whitespace token
    list — zero shuffles, linear scale-out, identical plan shape to
    ``quality_score``. Ratios are single divisions of exact integer
    counts so the DuckDB oracle reproduces them bit-for-bit. The
    bullet/ellipsis *line* rules of the paper are in
    :func:`c4_filter_flags`' line stats (this corpus is single-line).
    """
    sw = stopwords or GOPHER_STOPWORDS
    t = F.col(text_col)
    staged = spread_for_cpu(df).select(
        F.col(id_col), t.alias("__t"), words(t).alias("__ws")
    )
    tc, ws = F.col("__t"), F.col("__ws")
    n_words = F.size(ws).cast("long")
    mean_wl = (
        F.aggregate(ws, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
        / n_words
    )
    n_symbols = (
        F.length(tc) - F.length(F.replace(tc, F.lit("#"), F.lit("")))
    ) + (F.length(tc) - F.length(F.replace(tc, F.lit("…"), F.lit(""))))
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(ws), F.array(*[F.lit(s) for s in sw])
        )
    ).cast("long")
    f_count = (n_words >= min_words) & (n_words <= max_words)
    f_wlen = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    f_symbol = (n_symbols / n_words) <= max_symbol_ratio
    f_alpha = (n_alpha / n_words) >= min_alpha_ratio
    f_stop = n_stop >= min_stopwords
    return staged.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        (n_alpha / n_words).alias("alpha_ratio"),
        n_stop.alias("n_stopwords"),
        f_count.alias("flag_word_count"),
        f_wlen.alias("flag_word_len"),
        f_symbol.alias("flag_symbol_ratio"),
        f_alpha.alias("flag_alpha_words"),
        f_stop.alias("flag_stopwords"),
        (f_count & f_wlen & f_symbol & f_alpha & f_stop).alias("passes"),
    )


def c4_filter_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist: list[str] | None = None,
    min_sentences: int = 3,
    min_words_per_line: int = 5,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) as per-document
    flags: sentence-count floor (terminal-punctuation splits), policy
    placeholders (``lorem ipsum``), code markers (``{``), a word
    blocklist (C4 ships a "bad words" list; callers pass their own),
    and the line-level keep ratio (lines ending in terminal
    punctuation with ≥ ``min_words_per_line`` words).

    Blocklist matching is word-exact (intersection against the token
    set), not substring — C4's own filter drops a page on any listed
    WORD, and substring matching would flag e.g. 'class' for 'ass'.
    Per-row expressions only; no shuffle, no UDF.
    """
    bl = blocklist or []
    t = F.col(text_col)
    staged = spread_for_cpu(df).select(
        F.col(id_col), t.alias("__t"), words(t).alias("__ws")
    )
    tc, ws = F.col("__t"), F.col("__ws")
    # sentences = terminal-punctuation splits that leave a non-empty
    # remainder: 'a. b! c' -> 3; text with no .!? -> 1 fragment, so a
    # doc needs real sentence breaks to reach min_sentences
    n_sentences = F.size(
        F.filter(
            F.split(tc, r"[.!?]"), lambda s: F.length(F.trim(s)) > 0
        )
    ).cast("long")
    lines = F.split(tc, r"\n")
    n_lines = F.size(lines).cast("long")
    kept = F.size(
        F.filter(
            lines,
            lambda l: l.rlike(r"[.!?]\s*$")
            & (F.size(F.split(F.trim(l), r"\s+")) >= min_words_per_line),
        )
    ).cast("long")
    n_blocked = (
        F.size(
            F.array_intersect(
                F.array_distinct(ws), F.array(*[F.lit(w) for w in bl])
            )
        ).cast("long")
        if bl
        else F.lit(0).cast("long")
    )
    has_lorem = F.lower(tc).contains("lorem ipsum")
    has_brace = tc.contains("{")
    f_sent = n_sentences >= min_sentences
    f_block = n_blocked == 0
    return staged.select(
        F.col(id_col),
        n_sentences.alias("n_sentences"),
        n_lines.alias("n_lines"),
        (kept / n_lines).alias("kept_line_ratio"),
        n_blocked.alias("n_blocked_words"),
        f_sent.alias("flag_sentences"),
        f_block.alias("flag_blocklist"),
        (~has_brace).alias("flag_no_code"),
        (~has_lorem).alias("flag_no_lorem"),
        (f_sent & f_block & ~has_brace & ~has_lorem).alias("passes"),
    )


def compression_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document zlib compression statistics — the classic
    "entropy" quality filter (CCNet/MassiveWeb lineage): text that
    compresses TOO well is boilerplate/template spam (long repeats),
    text that barely compresses is junk (minified code, base64,
    random bytes). Natural prose sits in a stable mid band, so the
    ratio separates both failure modes with one number that n-gram
    rules miss (repeats longer than the n-gram window, junk made of
    common characters).

    Returns (id, raw_len, comp_len) — byte lengths of UTF-8 text and
    its zlib level-6 deflate. Ratios/flags are left to plain column
    arithmetic downstream so a SQL oracle can replay them from the
    persisted kernel output (the audio-features handshake pattern).

    Scale: an Arrow-batched ``mapInPandas`` kernel, map-only — no
    shuffle, no per-row Python overhead beyond the deflate call itself
    (the per-row cost IS the deflate; the dispatch around it is
    negligible next to it); total cost is one linear deflate pass over
    the corpus bytes, the same IO class as the scan itself. zlib is
    in-process (no codec libs needed); level 6 is the zlib default —
    deterministic for a fixed zlib build, which is all the handshake
    needs since BOTH engines read the persisted lengths."""
    import pandas as pd

    id_field = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_field}, raw_len long, comp_len long"
    cols = df.select(id_col, text_col)

    def kernel(batches):
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_len": raw.str.len().astype("int64"),
                    "comp_len": raw.map(
                        lambda b: len(zlib.compress(b, 6))
                    ).astype("int64"),
                }
            )

    return spread_for_cpu(cols).mapInPandas(kernel, out_schema)
