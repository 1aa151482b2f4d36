"""BPE tokenization: learn merges from the corpus word-frequency
table, apply them corpus-wide as pure column expressions.

The two halves have deliberately different execution homes:

* **Learning** (:func:`learn_bpe`) is the classic Sennrich et al.
  2016 greedy loop over the WORD-FREQUENCY table — which is Zipf-tiny
  relative to the corpus (distinct words, not tokens), so the
  standard practice even at 100 TB is: one distributed word-count
  aggregation, collect the vocabulary to the driver, run the merge
  loop locally, broadcast the learned table. The driver never holds
  corpus text — only (word, count) rows. Ties break deterministically
  (highest count, then lexicographic pair) so the merge list is
  reproducible across runs and engines.

* **Application** (:func:`bpe_tokens`, :func:`bpe_tokenize_stats`)
  runs merges in rank order as plain substring replaces over a
  boundary-marked spelling: each character token is wrapped
  ``⟨c⟩``, so merging pair (a, b) is literally
  ``replace('⟨a⟩⟨b⟩' → '⟨ab⟩')`` — no regex, no lookarounds
  (RE2-safe for the DuckDB oracle), no cross-token false matches,
  and correct left-to-right handling of overlapping occurrences.
  Applying merges in learned rank order reproduces greedy BPE
  inference (a merge's constituents always exist before it fires —
  the same order HuggingFace tokenizers apply). Everything is
  whole-stage-codegen column expressions: zero Python in the
  per-document path.

The marker characters U+27E8/U+27E9 must not appear in the input
text; :func:`bpe_tokens` scrubs them defensively first.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from syncflux_spark.functions.text import words
from syncflux_spark.utils import spread_for_cpu

L, R = "⟨", "⟩"  # ⟨ ⟩ token boundary markers


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_freq: int = 2,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus: one distributed
    word-count (explode + map-side-combined groupBy — the only
    cluster work), then the classic greedy pair-merge loop over the
    collected (word, count) table. Deterministic: ties break by
    (count desc, pair asc).

    The collect is BOUNDED cluster-side: ``min_freq`` pushes into the
    aggregate (a merge below min_freq can never fire, and dropping
    sub-threshold words only removes pair counts that sum < min_freq
    per word), and ``max_vocab`` caps the table at the top-V words by
    (count desc, word asc) via ``orderBy().limit()`` — which Catalyst
    compiles to TakeOrderedAndProject (per-partition top-K merged on
    the driver), NOT a single-partition sort — because on web-scale
    text the distinct-"word" long tail (hashes, base64, URLs) is
    O(10⁸) rows that would otherwise OOM the driver while
    contributing nothing to any merge above threshold."""
    wc = (
        spread_for_cpu(df)
        .select(F.explode(words(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_freq)
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_vocab)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r.w): r.n for r in wc
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for toks, n in vocab.items():
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best, freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if freq < min_freq:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for toks, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _spell(word: Column) -> Column:
    """``'cat'`` → ``'⟨c⟩⟨a⟩⟨t⟩'``: every character wrapped in
    boundary markers (markers scrubbed from the input first)."""
    clean = F.replace(
        F.replace(word, F.lit(L), F.lit("")), F.lit(R), F.lit("")
    )
    return F.regexp_replace(clean, "(.)", f"{L}$1{R}")


def bpe_spelled(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply merges in rank order over the marked spelling — each one
    a plain substring replace, statically unrolled into the
    expression tree (codegen-friendly; merge tables are static per
    tokenizer version, exactly like a broadcast dictionary)."""
    s = _spell(word)
    for a, b in merges:
        s = F.replace(
            s, F.lit(f"{L}{a}{R}{L}{b}{R}"), F.lit(f"{L}{a}{b}{R}")
        )
    return s


def bpe_tokens(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Token array for one word under the merge table."""
    s = bpe_spelled(word, merges)
    inner = F.substring(s, 2, F.length(s) - F.lit(2))
    return F.when(
        F.length(s) > 0, F.split(inner, f"{R}{L}")
    ).otherwise(F.array().cast("array<string>"))


def bpe_tokenize_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document tokenization accounting under a fixed merge
    table: word count, BPE token count, character count, and the
    chars-per-token compression ratio (THE tokenizer-efficiency
    metric a data pipeline tracks per source/language). Token counts
    fold in-row over the per-word spellings — one corpus scan, zero
    shuffles, zero Python."""
    ws = words(F.col(text_col))
    per_word_tokens = F.transform(
        ws,
        lambda w: (
            F.length(bpe_spelled(w, merges))
            - F.length(
                F.replace(bpe_spelled(w, merges), F.lit(L), F.lit(""))
            )
        ).cast("long"),
    )
    n_tokens = F.aggregate(
        per_word_tokens, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n_chars = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return spread_for_cpu(df).select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_words"),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        (
            F.when(n_tokens > 0, n_chars / n_tokens)
        ).alias("chars_per_token"),
    )
