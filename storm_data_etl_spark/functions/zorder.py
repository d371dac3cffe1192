"""Z-order (Morton) curve expressions for multi-dimensional data layout.

A lake partitioned/sorted on ONE column prunes only on that column; a
100 TB table queried by conjunctive ranges on several columns (lat+lon,
user+time, …) wants files whose min/max envelopes are tight in ALL of
them.  Sorting by the Z-value — the bit-interleave of the dimensions —
clusters rows so each parquet file covers a small hyper-rectangle, and
ordinary min/max footer stats then skip most files for any box query
(the same layout trick Delta OPTIMIZE ZORDER BY applies).

Everything here is a pure integer ``Column`` expression (shifts/ands) —
JVM-side, codegen-fused, no UDFs — plus a mirrored SQL-text generator so
the curve itself is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton code of the low ``bits`` bits of each (non-negative integral)
    column: bit ``b`` of column ``i`` lands at position ``b * n_cols + i``.
    Result is a bigint; ``n_cols * bits`` must stay ≤ 63."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit Z-value")
    terms = []
    for i, c in enumerate(cols):
        c = c.cast("bigint")
        for b in range(bits):
            terms.append(F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i))
    return reduce(add, terms)


def interleave_bits_sql(exprs: list[str], bits: int = 16) -> str:
    """DuckDB SQL text computing the identical Morton code (for oracles)."""
    n = len(exprs)
    terms = []
    for i, e in enumerate(exprs):
        for b in range(bits):
            terms.append(f"((({e} >> {b}) & 1) << {b * n + i})")
    return "(" + " + ".join(terms) + ")"


def scale_to_bits(c: Column, lo: Column | float, hi: Column | float, bits: int = 16) -> Column:
    """Min-max scale a numeric column onto the integer grid [0, 2**bits):
    the normalization step before interleaving heterogeneous dimensions."""
    cells = 2**bits
    lo = F.lit(lo) if not isinstance(lo, Column) else lo
    hi = F.lit(hi) if not isinstance(hi, Column) else hi
    span = hi - lo
    frac = F.when(span > 0, (c.cast("double") - lo) / span).otherwise(F.lit(0.0))
    return F.least(F.floor(frac * cells).cast("bigint"), F.lit(cells - 1))
