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


def hilbert_index(x: Column, y: Column, bits: int = 16) -> Column:
    """Hilbert-curve index of a 2-D point on the [0, 2**bits)² grid — the
    locality-better sibling of the Morton code (adjacent curve positions
    are always adjacent cells, so file min/max envelopes are tighter for
    box queries; the same layout Databricks' liquid clustering favors
    over Z-order — public knowledge, classic xy→d algorithm).

    Implemented as a pure-integer left fold over the bit levels
    (state = [x, y, d]; per level: quadrant bits rx/ry, d += s²·((3rx)⊕ry),
    then the conditional reflect+swap rotation) — all JVM bitwise/CASE
    expressions, no UDF, and exactly mirrorable in SQL because every op
    is integer."""
    # bigint levels: s*s at bits >= 17 overflows IntegerType literals
    levels = F.array(
        *[
            F.array(
                F.lit(1 << b).cast("bigint"),
                F.lit(0).cast("bigint"),
                F.lit(0).cast("bigint"),
            )
            for b in range(bits - 1, -1, -1)
        ]
    )
    init = F.array(x.cast("bigint"), y.cast("bigint"), F.lit(0).cast("bigint"))

    def step(acc, lv):
        s = F.element_at(lv, 1)
        xx = F.element_at(acc, 1)
        yy = F.element_at(acc, 2)
        dd = F.element_at(acc, 3)
        rx = F.when(xx.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        ry = F.when(yy.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        new_d = dd + s * s * (F.lit(3) * rx).bitwiseXOR(ry)
        new_x = F.when(ry == 0, F.when(rx == 1, s - 1 - yy).otherwise(yy)).otherwise(xx)
        new_y = F.when(ry == 0, F.when(rx == 1, s - 1 - xx).otherwise(xx)).otherwise(yy)
        return F.array(new_x, new_y, new_d)

    return F.element_at(F.aggregate(levels, init, step), 3)


def hilbert_index_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB SQL computing the identical Hilbert index: the same integer
    fold, written as a list_reduce over the level list with a 3-element
    state (rx/ry inlined at each use — integer ops, so repeating the
    subexpression is exact)."""
    levels = ", ".join(f"[{1 << b}::BIGINT, 0::BIGINT, 0::BIGINT]" for b in range(bits - 1, -1, -1))
    rx = "(CASE WHEN (acc[1] & lv[1]) > 0 THEN 1 ELSE 0 END)::BIGINT"
    ry = "(CASE WHEN (acc[2] & lv[1]) > 0 THEN 1 ELSE 0 END)::BIGINT"
    return f"""
      list_reduce(
        list_prepend([({x_expr})::BIGINT, ({y_expr})::BIGINT, 0::BIGINT],
                     [{levels}]),
        (acc, lv) -> [
          CASE WHEN {ry} = 0
               THEN CASE WHEN {rx} = 1 THEN lv[1] - 1 - acc[2] ELSE acc[2] END
               ELSE acc[1] END,
          CASE WHEN {ry} = 0
               THEN CASE WHEN {rx} = 1 THEN lv[1] - 1 - acc[1] ELSE acc[1] END
               ELSE acc[2] END,
          acc[3] + lv[1] * lv[1] * xor(3 * {rx}, {ry})
        ])[3]
    """
