"""Deterministic text expression library (Spark side).

Every builder here has an exact ANSI-SQL mirror in ``oracle_ext.py`` — same
normalization, same tokenization, same hashing — so the LLM-pipeline
operators built on them (dedup, text analysis, fingerprinting) are
oracle-checkable bit-for-bit, not merely "close".

Design rules for cross-engine determinism:
- Hashing is md5-over-UTF-8 hex strings (lowercase in both Spark and
  DuckDB). MinHash uses *lexicographic MIN over hex strings*, so no
  hex->int conversion (whose width/signedness differs across engines) is
  ever needed.
- Integer-valued intermediates (token counts, stopword hits) are exact;
  the only doubles are final ratios, computed in one fixed expression
  shape.
- Regexes stick to explicit ASCII classes (`[a-z0-9]`) that mean the same
  thing in Java regex (Spark) and RE2 (DuckDB).

All expressions are built from pyspark.sql.functions only — JVM-side,
whole-stage-codegen'd, no Python UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word-splitting normalization: lowercase, collapse every non-alnum run to
# one space, trim. '' stays '' (whose token list is empty, not ['']).
_NORM_PATTERN = "[^a-z0-9]+"


def normalized(col: Column) -> Column:
    """Lowercased, punctuation-collapsed, trimmed text."""
    return F.trim(F.regexp_replace(F.lower(col), _NORM_PATTERN, " "))


def tokens(col: Column) -> Column:
    """array<string> of non-empty normalized word tokens."""
    return F.filter(F.split(normalized(col), " "), lambda t: t != F.lit(""))


def word_shingles(toks: Column, n: int) -> Column:
    """array<string> of space-joined word n-grams (deduplicated).

    Empty when the document has fewer than ``n`` tokens. Dedup makes the
    shingle *set* (Jaccard semantics) rather than the multiset.
    """
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def char_shingles(col: Column, n: int) -> Column:
    """array<string> of distinct character n-grams of the normalized text."""
    norm = normalized(col)
    grams = F.when(
        F.length(norm) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - F.lit(n - 1)),
            lambda i: F.substring(norm, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def md5_hex(col: Column) -> Column:
    """Lowercase 32-char md5 hex of a string column (UTF-8 bytes)."""
    return F.md5(col.cast("binary"))


def seeded_hash(col: Column, seed: int) -> Column:
    """Seeded 128-bit hash as hex: md5('<seed>|' || value).

    A family of independent hash functions indexed by ``seed`` —
    lexicographic order over the hex is a total order, which is all MinHash
    needs.
    """
    return md5_hex(F.concat(F.lit(f"{seed}|"), col))


def minhash_signature(shingles: Column, n_hashes: int) -> Column:
    """array<string> MinHash signature: for each seed i, the lexicographic
    MIN of seeded md5 hex over the shingle set; NULL-free only when the
    shingle set is non-empty (callers filter empty docs first).

    One pass per seed over an in-memory array (TransformExpression) — no
    shuffle, no UDF; cost is O(n_hashes * |shingles|) cheap md5 calls per
    row, embarrassingly parallel across rows.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, i=i: seeded_hash(s, i)))
            for i in range(n_hashes)
        ]
    )


def band_keys(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """array<string> of LSH band bucket keys: 'b<i>:' || concat(band rows).

    Two docs collide on band i iff their signatures agree on all
    ``rows_per_band`` components of that band.
    """
    return F.array(
        *[
            F.concat_ws(
                "",
                F.lit(f"b{b}:"),
                *[
                    F.element_at(signature, b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
            )
            for b in range(n_bands)
        ]
    )


def round6(col: Column) -> Column:
    """Deterministic 6-dp rounding: floor(x * 1e6 + 0.5) / 1e6.

    Engine round() implementations (JVM BigDecimal HALF_UP vs DuckDB's C
    path) can disagree in the last ulp; this fixed IEEE expression is
    reproduced exactly by the oracle. Intended for non-negative or
    contract-defined values (it's floor-based, not half-away-from-zero).
    """
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


_HEX_DIGITS = "0123456789abcdef"


def hex32_to_long(h: Column) -> Column:
    """bigint value of the first 8 hex chars of ``h`` (0 .. 2^32-1).

    Recovered via strpos('0123456789abcdef', char) - 1 per nibble — pure
    integer arithmetic with an exact DuckDB mirror, avoiding engine-specific
    hex->int casts (conv()'s signedness/width differs across engines).
    """
    out: Column | None = None
    for i in range(8):
        nib = (F.instr(F.lit(_HEX_DIGITS), F.substring(h, i + 1, 1)) - F.lit(1)).cast(
            "bigint"
        )
        term = nib * F.lit(16 ** (7 - i)).cast("bigint")
        out = term if out is None else out + term
    assert out is not None
    return out


def token_hashes32(toks: Column) -> Column:
    """array<bigint>: 32-bit md5-derived hash per token (md5 computed once
    per token via a nested transform). Materialize this as a column before
    fanning out into the 32 per-bit sums of :func:`simhash32_from_hashes`.
    """
    return F.transform(
        F.transform(toks, lambda t: md5_hex(t)),
        lambda h: hex32_to_long(h),
    )


def simhash32_from_hashes(hashes: Column) -> Column:
    """32-bit SimHash fingerprint (bigint in [0, 2^32)) from per-token
    32-bit hashes.

    Classic Charikar construction: bit j of the fingerprint is set iff
    sum over tokens of (+1 if bit j of the token hash else -1) > 0.
    Empty token list -> 0.
    """

    def bit_sum(j: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + (F.shiftright(v, j) % F.lit(2)) * F.lit(2) - F.lit(1),
        )

    fp: Column = F.lit(0).cast("bigint")
    for j in range(32):
        fp = fp + F.when(bit_sum(j) > 0, F.lit(2**j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return F.when(F.size(hashes) > 0, fp).otherwise(F.lit(0).cast("bigint"))


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit fingerprints stored as bigint."""
    x = a.bitwiseXOR(b)
    return sum(
        ((F.shiftright(x, j) % F.lit(2)) for j in range(32)),
        F.lit(0).cast("bigint"),
    ).cast("int")
