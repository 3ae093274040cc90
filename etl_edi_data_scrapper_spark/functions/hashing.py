"""Engine-portable hash primitives.

Everything here is expressible with identical semantics in any SQL engine
(md5 + substring + instr arithmetic) so every operator built on top stays
oracle-checkable — no dialect-specific conv/unhex/hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def hex_val(c: Column) -> Column:
    """One hex char → 0..15 via instr arithmetic."""
    return F.instr(F.lit(HEX), c) - 1


def hex_word(h: Column, start: int) -> Column:
    """Parse 8 hex chars of an md5 hex string (1-based `start`) into a
    bigint (0..2^32-1)."""
    v: Column = F.lit(0).cast("long")
    for k in range(8):
        v = v * 16 + hex_val(F.substring(h, start + k, 1))
    return v
