"""Generic relational operators mirroring the reference's analytics surface.

Maps genmock/validate's hard-coded loops (SURVEY.md §2.3-2.6) onto declarative
DataFrame ops so Catalyst gets full optimization freedom. Each function is
schema-agnostic: the same implementation runs against the storm tables and
the driver's TPC-H-ish tables.

Scale notes (100 TB posture):
- group-by counts are hash aggregates with map-side partial aggregation —
  shuffle carries only (key, partial count);
- first-wins dedup / top-N-per-group use window functions over a single
  shuffle on the partition key;
- existence checks are left-anti joins: Catalyst/AQE picks broadcast when the
  probe side is small, else shuffled hash join (salting/AQE for skew);
- global top-N uses orderBy+limit which Spark executes as per-partition
  TakeOrdered + driver merge of N — no full sort of 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_counts(df: DataFrame, *keys: str | Column, count_name: str = "count") -> DataFrame:
    """A1/A2: counts by one or more keys (cmd/genmock/main.go:204-226).

    Hash aggregate; partial (map-side) combine happens automatically.
    """
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_name))


def conditional_count(df: DataFrame, cond: Column, name: str = "n") -> DataFrame:
    """A3: count of rows satisfying a predicate (genmock main.go:217-223)."""
    return df.agg(F.count(F.when(cond, 1)).alias(name))


def global_max(df: DataFrame, col: str | Column, name: str = "max_value") -> DataFrame:
    """A4: global max (genmock main.go:346-353)."""
    return df.agg(F.max(col).alias(name))


def distinct_count(df: DataFrame, col: str | Column, name: str = "n_distinct") -> DataFrame:
    """A5: exact distinct count. At 100 TB prefer approx_distinct_count."""
    return df.agg(F.countDistinct(col).alias(name))


def approx_distinct_count(df: DataFrame, col: str | Column, name: str = "n_distinct", rsd: float = 0.01) -> DataFrame:
    """A5 scale path: HyperLogLog++ sketch — one pass, no giant shuffle."""
    return df.agg(F.approx_count_distinct(col, rsd).alias(name))


def top_n(df: DataFrame, order_cols: Sequence[Column], n: int) -> DataFrame:
    """Top-N global sort-and-slice (genmock main.go:252-267 top-5 states).

    Executes as TakeOrderedAndProject: per-partition heap of N, driver merge —
    never a full sort. Pass deterministic tie-breaker columns for stable
    results under re-partitioning.
    """
    return df.orderBy(*order_cols).limit(n)


def first_per_group(
    df: DataFrame,
    partition_cols: Sequence[str | Column],
    order_cols: Sequence[str | Column],
    rn_name: str = "_rn",
) -> DataFrame:
    """A7/D1: first row per group under an explicit total order.

    The reference's "first hail record in file order" (genmock
    main.go:324-344) and its first-wins dedup by ID (validate
    main.go:357-391, mirroring downstream ON CONFLICT DO NOTHING) both
    require an explicit order key — Spark's dropDuplicates is
    order-nondeterministic under shuffle, so the window form is mandatory
    for parity (SURVEY.md §7).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(rn_name, F.row_number().over(w))
        .filter(F.col(rn_name) == 1)
        .drop(rn_name)
    )


def first_wins_dedup(df: DataFrame, id_cols: Sequence[str], order_cols: Sequence[str | Column]) -> DataFrame:
    """D1: keep the first occurrence per ID (validate main.go:357-391)."""
    return first_per_group(df, id_cols, order_cols)


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """D2/S8: UNION ALL by column name (genmock main.go:69-79)."""
    return reduce(DataFrame.unionByName, dfs)


def missing_keys(src: DataFrame, target: DataFrame, on: Sequence[str]) -> DataFrame:
    """J1: rows of ``src`` whose key is absent from ``target`` (validate
    main.go:298-313). Left-anti join; AQE broadcasts the small side."""
    return src.join(target.select(*on).dropDuplicates(list(on)), on=list(on), how="left_anti")


def count_parity(
    a: DataFrame, b: DataFrame, key: str, count_name_a: str = "count_a", count_name_b: str = "count_b"
) -> DataFrame:
    """A6: per-key count comparison between two datasets (validate
    main.go:268-285). Returns keys whose counts mismatch (empty = parity)."""
    ca = grouped_counts(a, key, count_name=count_name_a)
    cb = grouped_counts(b, key, count_name=count_name_b)
    joined = ca.join(cb, on=key, how="full_outer")
    return joined.filter(
        ~F.coalesce(F.col(count_name_a), F.lit(0)).eqNullSafe(
            F.coalesce(F.col(count_name_b), F.lit(0))
        )
    )


def field_compare(
    expected: DataFrame,
    actual: DataFrame,
    key: str,
    numeric_cols: Sequence[str] = (),
    exact_cols: Sequence[str] = (),
    tol: float = 1e-9,
) -> DataFrame:
    """J2: equi-join by key and per-field comparison with float tolerance
    and null-safe equality (validate main.go:352-462). Returns one row per
    mismatching key with a `mismatches` array naming the offending fields."""
    e = expected.alias("e")
    a = actual.alias("a")
    checks: list[Column] = []
    for c in numeric_cols:
        bad = ~(
            (F.col(f"e.{c}").isNull() & F.col(f"a.{c}").isNull())
            | (F.abs(F.col(f"e.{c}") - F.col(f"a.{c}")) <= tol)
        )
        checks.append(F.when(bad, F.lit(c)))
    for c in exact_cols:
        checks.append(F.when(~F.col(f"e.{c}").eqNullSafe(F.col(f"a.{c}")), F.lit(c)))
    mismatches = F.array_compact(F.array(*checks))
    return (
        e.join(a, on=key, how="inner")
        .select(F.col(key), mismatches.alias("mismatches"))
        .filter(F.size("mismatches") > 0)
    )


def positional_compare(a: DataFrame, b: DataFrame, order_cols: Sequence[str | Column]) -> DataFrame:
    """J3: row-aligned structural compare (validate main.go:228-252).

    The reference compares files positionally; a distributed engine needs an
    explicit total order to define "position", so callers pass order_cols.
    Rows are numbered under that order and full-outer joined; any row whose
    cells differ (or that exists on one side only) is returned.
    """
    w = Window.orderBy(*order_cols)
    an = a.withColumn("_pos", F.row_number().over(w))
    bn = b.withColumn("_pos", F.row_number().over(w))
    cols = [c for c in a.columns]
    cond = ~F.struct(*[F.col(f"x.{c}") for c in cols]).eqNullSafe(
        F.struct(*[F.col(f"y.{c}") for c in cols])
    )
    return (
        an.alias("x")
        .join(bn.alias("y"), on="_pos", how="full_outer")
        .filter(cond | F.col(f"x.{cols[0]}").isNull() | F.col(f"y.{cols[0]}").isNull())
        .select("_pos", *[F.col(f"x.{c}").alias(f"a_{c}") for c in cols],
                *[F.col(f"y.{c}").alias(f"b_{c}") for c in cols])
    )


def bounding_box(df: DataFrame, lat: str | Column, lon: str | Column,
                 center_lat: float, center_lon: float, radius_deg: float) -> DataFrame:
    """F5: geo bounding-box range predicate (genmock main.go:304-322)."""
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    return df.filter(
        (F.abs(lat_c - center_lat) <= radius_deg) & (F.abs(lon_c - center_lon) <= radius_deg)
    )
