"""Shuffle-width narrowing for uuid5 id columns — the uuid twin of
``functions/sha.py``.

Every deterministic id in the engine is an RFC 4122 uuid5 rendered as the
36-char lowercase ``8-4-4-4-12`` hex string (functions/ids.py). That string
costs ~44 bytes of UnsafeRow per shuffled row where the underlying digest
costs 20, and — like hex shas — it defeats lz4's match-based shuffle
compression. Chunk ids ride the contains/structural edge dedup exchanges as
group KEYS, so narrowing them to 16-byte binary removes ~40% of the key
bytes on those exchanges.

Unlike the sha module's documented uppercase-canonicalization deviation
(ADVICE r6), the guard here is EXACT: a value converts only when it is
byte-for-byte a canonical lowercase uuid — 36 chars, dashes at positions
9/14/19/24, remaining 32 chars lowercase hex. Everything else (repo:path
container ids, test fixtures, uppercase variants) rides the overflow string
untouched, so narrow→widen is the identity for ALL inputs and
distinct/groupBy over the (bin, raw) pair equals distinct/groupBy over the
original strings (the converted and overflow classes are disjoint and the
conversion is bijective on its class — pinned by tests/test_ids.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UUID_BIN = "_uuid_bin"
UUID_RAW = "_uuid_raw"

_UUID_RE = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"


def uuid_narrow(col: Column) -> tuple[Column, Column]:
    """Split an id column into (16-byte binary, overflow-string) columns.

    Exactly one of the two is non-null per non-null input.
    """
    bin_col = F.when(col.rlike(_UUID_RE), F.unhex(F.translate(col, "-", "")))
    raw_col = F.when(bin_col.isNull(), col)
    return bin_col, raw_col


def uuid_widen(bin_col: Column, raw_col: Column) -> Column:
    """Reassemble the original id string (bit-exact for all inputs)."""
    h = F.lower(F.hex(bin_col))
    formatted = F.concat(
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-"),
        F.substring(h, 13, 4),
        F.lit("-"),
        F.substring(h, 17, 4),
        F.lit("-"),
        F.substring(h, 21, 12),
    )
    return F.coalesce(formatted, raw_col)
