"""Z-order (Morton) keys as pure Catalyst expressions — data-skipping
layout for multi-dimensional filters.

Parquet readers skip whole files/row-groups whose footer min/max
excludes the filter range — but only if the layout makes those ranges
narrow.  A linear sort gives perfect skipping on ONE column and none on
others; interleaving the bits of two columns (Morton order) bounds the
per-file range of BOTH: sorting by ``morton2(x, y)`` tiles the (x, y)
plane into quadrants, so a predicate on either column prunes most files
(the layout trick behind Delta/Iceberg ``ZORDER BY``).

The bit-spread is the classic mask cascade (Morton 1966) in closed
form — five shift-and-mask steps per dimension, all JVM-side integer
ops inside whole-stage codegen; no UDF.  Inputs are clamped to the low
32 bits as NON-NEGATIVE values (negative inputs raise at key-build
time rather than silently interleaving sign bits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def spread_bits32(c: Column) -> Column:
    """The low 32 bits of ``c`` spread to the even bit positions of a
    64-bit value (bit i → bit 2i)."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton2(a: Column, b: Column) -> Column:
    """64-bit Morton key interleaving two non-negative 32-bit values
    (``a`` on even bits, ``b`` on odd)."""
    guard = F.when(
        (a.cast("long") < 0) | (b.cast("long") < 0),
        F.raise_error(F.lit("morton2: inputs must be non-negative")),
    )
    key = spread_bits32(a).bitwiseOR(F.shiftleft(spread_bits32(b), 1))
    return F.coalesce(guard, key)
