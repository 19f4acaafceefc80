"""Shuffle-width narrowing for content_sha lineage columns.

Every provenance sha in the engine is ``sha2(content, 256)`` — a 64-char
lowercase-hex string, i.e. 64 bytes of entropy-dense payload per row in every
exchange it crosses. The hex alphabet doubles the byte count of the digest and
defeats lz4's match-based shuffle compression (random hex has no repeats), so
each sha costs ~72 bytes of UnsafeRow per shuffled row where the raw digest
costs 40. At 10^12-file scale the sha rides the resolution joins, the triple
dedup, and every edge-family aggregation — narrowing it to 32-byte binary
across those exchanges removes ~25-30% of their shuffle bytes on a
memory-bandwidth-bound cluster.

The narrowing is *guarded* so it is bit-exact for arbitrary inputs, not just
contract shas: a value is converted only when it is exactly 64 chars of
LOWERCASE hex (``sha2``'s output alphabet); everything else — test fixtures
like ``"sha1"``, NULLs, odd strings, and uppercase hex variants — rides an
overflow string column untouched, so narrow→widen is the identity for ALL
inputs and distinct/min over the pair equals distinct/min over the original
strings (round 6 shipped uppercase-canonicalization as a documented
deviation; the lowercase gate closes it at the cost of one string compare
per row).

Order/equality facts the call sites rely on (pinned by tests/test_sha.py):
- fixed-length binary compares byte-lexicographically in Spark, and lowercase
  hex encoding is monotone per byte, so ``min`` over the binary column equals
  ``min`` over the original hex strings within the converted class;
- ``F.least`` skips NULLs, so ``least(widen(min(bin)), min(raw))`` is the min
  over the ORIGINAL strings even when a group mixes converted and overflow
  values (each original is reproduced exactly before the final comparison).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHA_BIN = "_sha_bin"
SHA_RAW = "_sha_raw"


def sha_narrow(col: Column) -> tuple[Column, Column]:
    """Split a sha column into (binary, overflow-string) columns.

    ``binary`` is the 32-byte digest when the value is a 64-char LOWERCASE
    hex string (``F.unhex`` yields NULL on any non-hex char, which the guard
    relies on; the lowercase gate keeps uppercase variants byte-exact on the
    overflow path); ``overflow`` carries the original string for every
    unconverted value. Exactly one of the two is non-null per non-null input.
    """
    bin_col = F.when((F.length(col) == 64) & (col == F.lower(col)), F.unhex(col))
    raw_col = F.when(bin_col.isNull(), col)
    return bin_col, raw_col


def sha_widen(bin_col: Column, raw_col: Column) -> Column:
    """Reassemble the original sha string (lowercase-canonical for hex)."""
    return F.coalesce(F.lower(F.hex(bin_col)), raw_col)


def sha_min_agg() -> tuple[Column, Column]:
    """The aggregate pair every narrowed min-provenance groupBy uses.

    ``agg(*sha_min_agg())`` keeps the shuffle on the narrow columns; feed the
    two results to :func:`sha_min` for the reconstructed-string minimum.
    """
    return F.min(SHA_BIN).alias(SHA_BIN), F.min(SHA_RAW).alias(SHA_RAW)


def sha_distinct(df: DataFrame) -> DataFrame:
    """``distinct()`` over a frame carrying the narrow pair, widened after.

    The dedup exchange moves the 32-byte digest; the output replaces the
    (SHA_BIN, SHA_RAW) pair with a single ``content_sha`` string column in
    SHA_BIN's position, other columns untouched. Distinct over the pair
    equals distinct over the original strings because the narrowing is
    injective (the converted and overflow classes are disjoint).
    """
    out_cols: list[Column] = []
    for name in df.columns:
        if name == SHA_BIN:
            out_cols.append(
                sha_widen(F.col(SHA_BIN), F.col(SHA_RAW)).alias("content_sha")
            )
        elif name != SHA_RAW:
            out_cols.append(F.col(name))
    return df.distinct().select(*out_cols)


def sha_min(bin_col: Column, raw_col: Column) -> Column:
    """``min(original sha)`` from pre-aggregated min(bin)/min(raw) columns.

    Use as ``agg(F.min(bin).alias(b), F.min(raw).alias(r))`` followed by this
    over the two results — the shuffle carries the narrow pair, the final
    comparison happens on the reconstructed strings.
    """
    return F.least(sha_widen(bin_col, F.lit(None).cast("string")), raw_col)
