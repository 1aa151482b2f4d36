"""Text-analysis column expressions for the training-data pipeline.

Everything here is built from ``pyspark.sql.functions`` intrinsics
(split/transform/filter/md5/length) so the hot path stays inside
whole-stage codegen — no Python UDFs. Each builder has a direct ANSI
SQL equivalent runnable by the DuckDB oracle (see __spark_entry__.py),
which is why hashing is done with md5 *hex strings* (identical across
engines) rather than engine-specific integer hashes.

Scale: all are narrow per-row transforms — no shuffle, perfectly
partition-parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(text: Column | str) -> Column:
    """Whitespace tokenization (the reference point for token counts)."""
    return F.split(F.trim(_c(text)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(words(text))


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """All overlapping k-character shingles of a string (positions
    1..len-k+1), via a single regex pass: a zero-width lookahead
    ``(?=(.{k}))`` captures the k chars at every position, so one
    JVM-regex scan emits all shingles in position order. Measured
    4-5× faster than the previous higher-order-function form
    (``transform(sequence(1, n), i -> substr(t, i, k))``) — HOF
    lambdas evaluate INTERPRETED per element, and the shingle
    explode was the single largest constant of the whole banded
    dedup family (x30 profile: 63 s of a 66 s banding pass,
    SCALE.md r12); bit-identical output verified corpus-wide.
    ``(?s)`` makes ``.`` cross newlines like substr does; both
    engines' ``.`` consumes one code point, matching substr's
    code-point indexing. Empty array when the text is shorter than
    k (no match positions), and on NULL text (coalesce — the old
    guard's behavior)."""
    t = _c(text)
    return F.coalesce(
        F.regexp_extract_all(t, F.lit(rf"(?s)(?=(.{{{k}}}))"), 1),
        F.array().cast("array<string>"),
    )


def word_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 over the sorted distinct word set —
    robust to word order and duplication (near-dup canonicalization à
    la key collision / fingerprint clustering)."""
    ws = words(text)
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(ws))))


def shingles_of_words(ws: Column, k: int) -> Column:
    """All overlapping k-word shingles of a words ARRAY, space-joined.
    Empty array below k tokens (``sequence(1, 0)`` counts down, so the
    n>=1 guard is required, mirroring char_shingles).

    Built as ``array_join(slice(ws, i, k))`` — ONE reference to ``ws``
    per element. Free subexpressions inside a higher-order-function
    lambda are re-evaluated per ELEMENT, not per row, so hot callers
    must pass a bound column (stage ``words(text)`` in a projection
    first), or the tokenizing split runs once per shingle — measured
    4× on benchmark_contamination at sf0.1."""
    n = F.size(ws) - F.lit(k - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(ws, i, F.lit(k)), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column | str, k: int) -> Column:
    """k-word shingles straight from a text expression — convenience
    form; see :func:`shingles_of_words` for why hot paths should stage
    the words array as a column instead."""
    return shingles_of_words(words(text), k)


def word_bigrams(text: Column | str) -> Column:
    """All adjacent word pairs joined with a single space."""
    return word_shingles(text, 2)


def longest_equal_run(arr: Column) -> Column:
    """Length of the longest run of equal ADJACENT elements, as a
    single in-row fold (no explode, no shuffle). On a sorted array
    this is the max element multiplicity — the building block for
    Gopher/C4-style repetition filters (most-repeated token / n-gram
    share) computed entirely inside whole-stage codegen."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + F.lit(1)).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(arr, init, step, lambda acc: acc["best"])


def substr_count(text: Column | str, needle: str) -> Column:
    """Non-overlapping occurrence count of ``needle`` via the
    length-difference trick (identical semantics in Spark and DuckDB's
    ``replace``). Text is space-padded so word-boundary needles like
    ' the ' match at string edges."""
    padded = F.concat(F.lit(" "), _c(text), F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


#: Tiny per-language stopword marker lists for the n-gram/stopword
#: language-ID heuristic. Chosen to be disjoint across languages.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " los "],
    "fr": [" le ", " les ", " des "],
    "de": [" der ", " und ", " die "],
    "zh": ["的", "是", "了"],
}


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (integer, deterministic)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            c = substr_count(text, m)
            score = c if score is None else score + c
        out[lang] = score
    return out


def lang_id(text: Column | str) -> Column:
    """Argmax language, 'und' when no marker hits. Tie-break:
    alphabetically-first language code wins (processing languages in
    reverse-alphabetical order means a candidate must strictly exceed
    the incumbent to displace it)."""
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        best = F.when(s > best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(s > best_score, s).otherwise(best_score)
    return best


def quality_metrics(text: Column | str) -> dict[str, Column]:
    """Quality-scoring signals: lengths and integer counts; ratios are
    single divisions of deterministic integers (portable)."""
    t = _c(text)
    ws = words(t)
    n_chars = F.length(t)
    n_tokens = F.size(ws)
    n_spaces = substr_count(t, " ") - F.lit(2)  # undo the padding added
    mean_word_len = (
        F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        / n_tokens
    )
    n_distinct = F.size(F.array_distinct(ws))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "n_distinct_tokens": n_distinct.cast("long"),
        "mean_word_len": mean_word_len,
        "distinct_ratio": n_distinct / n_tokens,
    }
