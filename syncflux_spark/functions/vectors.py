"""Vector column expressions over ``array<float>`` embeddings.

All builders stay JVM-side (``zip_with``/``aggregate``/``transform``
higher-order functions — no Python UDFs), and accumulate **in array
order in double precision** so results are bit-identical across
engines (DuckDB's ``list_dot_product`` on ``DOUBLE[]`` uses the same
sequential accumulation — verified empirically). That determinism is
what makes cosine results hashable against a SQL oracle.

Scale note: a 64-dim dot product is ~64 fused multiply-adds inside
whole-stage codegen; a brute-force k-NN over N vectors × Q queries is
a broadcast nested-loop join that Spark distributes by the N side, so
it scales linearly with executors (the Q side must be small enough to
broadcast — for the general case see operators/similarity.py's LSH
variant).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col: Column | str) -> Column:
    """array<float> → array<double> (exact widening, element-wise)."""
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """In-order double dot product: sum_i a[i]*b[i].

    With ``dim`` given, the sum unrolls into a fixed multiply-add
    chain of ``getItem`` accesses (IEEE-identical to the fold: the
    fold's leading ``0.0 + x`` is exact and additions stay in order).
    NOTE: measured SLOWER than the HOF fold inside real plans — the
    64-term tree is duplicated across filter/sort/project contexts and
    the generated methods grow past HotSpot's JIT threshold — so
    callers leave ``dim=None`` in the hot paths; the option remains
    for narrow single-projection uses."""
    if dim is not None:
        av, bv = as_double(a), as_double(b)
        out = av.getItem(0) * bv.getItem(0)
        for i in range(1, dim):
            out = out + av.getItem(i) * bv.getItem(i)
        return out
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str, dim: int | None = None) -> Column:
    """L2 norm, same accumulation order as :func:`dot`."""
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Cosine similarity = dot/(|a|·|b|). Division and sqrt are single
    IEEE ops on deterministic inputs → deterministic output."""
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def int8_scale(vec: Column | str) -> Column:
    """Symmetric int8 quantization scale: max|v| / 127. One scale per
    vector (the FAISS SQ8-style scheme) — 4× smaller than float32,
    which at 100 TB of embeddings is the difference between spilling
    and fitting the ANN working set in memory."""
    return F.array_max(F.transform(as_double(vec), lambda x: F.abs(x))) / F.lit(
        127.0
    )


def quantize_int8(vec: Column | str, scale: Column) -> Column:
    """v → round(v/scale) as int8-range longs. Rounding is explicit
    ``floor(x + 0.5)`` — portable: engines disagree on round()'s
    half-even vs half-away behavior, floor never."""
    return F.transform(
        as_double(vec), lambda x: F.floor(x / scale + F.lit(0.5))
    )


def dequantize(qvec: Column | str, scale: Column) -> Column:
    """int8-range longs → doubles (q · scale)."""
    return F.transform(_c(qvec) if isinstance(qvec, str) else qvec, lambda q: q * scale)


def simhash_bits(
    tokens: Column | str, n_bits: int = 16, nibble_bit: int = 3
) -> Column:
    """SimHash over a token array: for each bit b, sign of
    sum_tokens(±1 votes) — expressed with higher-order functions only,
    portable to the SQL oracle.

    ONE md5 per token supplies every bit's vote: bit b is 1 iff the
    number of tokens whose md5 hex digest has its (b+1)-th character
    >= '8' (the top bit of that nibble — an unbiased coin per
    position, since md5's 128 bits are uniform and independent)
    exceeds half the token count. The first form of this function
    hashed per BIT (md5(token||'_b') × n_bits) — 32× the hashing for
    a 32-bit fingerprint, and hashing IS the corpus-scan cost of the
    simhash family at scale; hashing once and reading positional
    nibble bits is vote-for-vote as unbiased. Caps at 32 bits (md5
    has 32 hex chars) per ``nibble_bit``. Returns an int bitmap.

    ``nibble_bit`` picks WHICH bit of each hex nibble supplies the
    vote: 3 (default, value >= 8) or 2 (value & 4 != 0). The two are
    independent uniform coins from the same digest, so a 64-bit
    fingerprint is two 32-bit calls — one per nibble bit — sharing the
    single md5 pass (the Manku-et-al production width without a second
    hash of the corpus). Both predicates are plain string compares on
    the lowercase hex alphabet ('0'-'9' < 'a'-'f'), portable verbatim
    to the DuckDB oracle.
    """
    toks = _c(tokens) if not isinstance(tokens, str) else F.col(tokens)
    return simhash_bits_hex(
        F.transform(toks, lambda t: F.md5(t)), F.size(toks), n_bits, nibble_bit
    )


def simhash_bits_hex(
    hexes: Column | str,
    n_tokens: Column,
    n_bits: int = 16,
    nibble_bit: int = 3,
) -> Column:
    """:func:`simhash_bits` from a PRE-MATERIALIZED md5-hex array
    column. Callers computing more than ~16 bits (or two nibble-bit
    halves) should select ``transform(tokens, md5)`` into a column
    first and build bits from THAT: Catalyst does not common-
    subexpression-eliminate a ``transform`` repeated inside each
    bit's ``filter``, so the fused form re-hashes the token array
    once per bit — measured 144s fused vs 46s pre-materialized for
    the 64-bit fingerprint on 50k docs (the wide kernel's whole
    "one md5 per token" claim only holds through this split)."""
    if n_bits > 32:
        raise ValueError(f"simhash_bits supports at most 32 bits, got {n_bits}")
    if nibble_bit not in (2, 3):
        raise ValueError(f"nibble_bit must be 2 or 3, got {nibble_bit}")
    hexes = _c(hexes)
    total = n_tokens

    def pred(b: int):
        # NB: must return a SINGLE-arg lambda — a `lambda h, b=b` would
        # be inspected by PySpark as the (element, index) binary form
        # and the index would silently shadow the closure value.
        if nibble_bit == 3:
            return lambda h: F.substring(h, b + 1, 1) >= F.lit("8")
        # nibble bit 2 set ⇔ hex char in 4-7 or c-f
        return lambda h: (
            (F.substring(h, b + 1, 1) >= F.lit("4"))
            & (F.substring(h, b + 1, 1) <= F.lit("7"))
        ) | (F.substring(h, b + 1, 1) >= F.lit("c"))

    bits = []
    for b in range(n_bits):
        votes = F.size(F.filter(hexes, pred(b)))
        bit = (votes * 2 > total).cast("long") * F.lit(1 << b)
        bits.append(bit)
    out = bits[0]
    for bcol in bits[1:]:
        out = out + bcol
    return out
