"""Text primitives shared by the dedup / text-analysis operators.

Everything here is built-in (JVM-side, codegen'd) column algebra — no Python
UDFs — and every function is *portable*: an ANSI-SQL twin exists so operators
composed from these stay DuckDB-oracle-checkable. Hashing is md5-based
(available and bit-identical in Spark, DuckDB, and most engines) rather than
xxhash64/murmur (engine-specific seeds).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space split — the fixture corpus is
    single-space separated; swap for regexp split on real corpora)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-gram shingle array (positional; not deduplicated).

    SQL twin: ``list_transform(range(1, length(s)-k+2), i -> substr(s,i,k))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    # guard: F.sequence(1, 0) would generate a DESCENDING [1, 0] — short
    # texts must yield an empty array instead.
    return F.when(
        F.length(c) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - (k - 1)),
            lambda i: F.substring(c, i, k),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-gram array (space-joined consecutive token windows; positional,
    not deduplicated). Texts with fewer than ``n`` tokens yield an empty
    array.

    SQL twin (DuckDB, where ``w = string_split(s, ' ')`` and slices are
    1-based inclusive): ``list_transform(range(1, len(w) - n + 2),
    i -> array_to_string(w[i:i+n-1], ' '))`` — DuckDB ``range`` is already
    empty when the upper bound is below the lower; Spark ``sequence`` would
    DESCEND, hence the explicit guard here.
    """
    w = tokens(col)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def md5_u60(col: Column, seed: int | Column | None = None) -> Column:
    """Deterministic 60-bit hash of a string column: first 15 hex chars of
    md5(seed || value) as a non-negative bigint (no seed prefix when None).

    15 hex chars = 60 bits keeps the value inside a signed 64-bit range in
    every engine (no overflow/sign divergence). SQL twin:
    ``CAST(('0x' || substr(md5([seed ||] s), 1, 15)) AS BIGINT)``.
    """
    if seed is None:
        hashed = F.md5(col)
    else:
        s = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
        hashed = F.md5(F.concat(s, col))
    return F.conv(F.substring(hashed, 1, 15), 16, 10).cast("bigint")


def rolling_hash(
    col: Column | str, base: int = 31, mod: int = (1 << 31) - 1
) -> Column:
    """Polynomial (Rabin-Karp) rolling hash over the character stream:
    fold acc → (acc*base + codepoint) mod ``mod``. With mod < 2^31 the
    intermediate acc*base + c < 2^36 stays far inside bigint range.

    SQL twin (DuckDB list_reduce seeds from the FIRST element, so prepend
    the zero accumulator): ``list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, x) -> (acc * base + x) % mod)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * base + x) % mod,
    )


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-style pre-tokenization: lowercase, then alphanumeric runs and
    individual punctuation marks as separate tokens (the GPT-2-ish regex
    pre-tokenizer shape, minus unicode classes).

    SQL twin: ``regexp_extract_all(lower(s), '[a-z0-9]+|[^a-z0-9 ]')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+|[^a-z0-9 ]"), F.lit(0))


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, strip everything but
    [a-z0-9 ], collapse runs of spaces, trim.

    SQL twin: ``trim(regexp_replace(regexp_replace(lower(s),
    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))`` (DuckDB needs the 'g' flag;
    Spark replaces all matches by default).
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), "[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(cleaned, " +", " "))
