"""Column-expression building blocks for the training-data pipeline
operators.  Everything here stays JVM-side (built-in pyspark.sql.functions;
no row-at-a-time Python UDFs) so it survives whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# -- text ------------------------------------------------------------------


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased text (empty-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint_md5(col: Column | str) -> Column:
    """Deterministic document fingerprint over the normalized text."""
    return F.md5(normalized_text(col))


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Distinct word n-grams as strings ("w1 w2 w3")."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(tok) - n, F.lit(0)))
    gram = lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n))  # noqa: E731
    return F.array_distinct(F.transform(idx, gram))


def token_jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two pre-deduplicated string arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# -- hashing / sketches ----------------------------------------------------


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed i, min over shingles of xxhash64(s, i).

    xxhash64 is a JVM-native 64-bit hash (whole-stage codegen friendly);
    one array_min per seed over the shingle array — no shuffle, no UDF.
    """
    mins = [
        F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(i)))
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def band_hashes(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each band of the signature to one bucket key."""
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            ).alias(f"band{b}")
            for b in range(bands)
        ]
    )


def simhash64(tok: Column) -> Column:
    """64-bit SimHash over token xxhash64 values.

    For each bit position j, sum +-1 over tokens by bit j of the token hash,
    then take the sign bit.  Pure array expressions — distributed, no UDF.
    """
    hashes = F.transform(tok, lambda t: F.xxhash64(t))
    bit_cols = []
    for j in range(64):
        # bit 63 of a signed 64-bit long is the sign bit: 1<<63 overflows a
        # JVM long literal, so use its two's-complement value.
        mask = (1 << j) if j < 63 else -(1 << 63)
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(mask).cast("long")) != 0, 1).otherwise(-1),
        )
        bit_cols.append(F.when(votes > 0, F.lit(mask).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# -- vectors ---------------------------------------------------------------


def vec_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (sequential fold, matching
    DuckDB's list_dot_product order for oracle comparison)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
