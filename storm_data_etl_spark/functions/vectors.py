"""Vector column expressions over array<float|double> embedding columns.

All JVM-side (zip_with / aggregate higher-order functions) — no Python UDFs,
so similarity scans stay inside WholeStageCodegen and scale with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two equal-length array columns.

    Elements are cast to double BEFORE multiplying: float32 inputs would
    otherwise multiply in float32 while any SQL oracle computing over
    ::DOUBLE[] multiplies exact doubles — a ~1e-8 divergence that can cross
    a round(6) boundary. Float→double casts are exact, and the left-to-right
    fold (0.0 + p1) + p2 + … is the same IEEE sequence DuckDB's
    list_reduce performs, so results are bit-identical."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: ColumnOrName) -> Column:
    """L2 norm (double accumulation — see dot)."""
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(None).cast("double")).otherwise(
        dot(a, b) / (na * nb)
    )


def lit_vector(values: list[float]) -> Column:
    """A literal query vector as an array column."""
    return F.array(*[F.lit(float(v)) for v in values])


def hyperplane_signs(vec: ColumnOrName, hyperplanes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket key: one sign bit per hyperplane, packed
    into a long. Deterministic given the hyperplane list (callers derive the
    planes from a fixed seed). Cosine-similar vectors collide with high
    probability → equality-joinable ANN buckets."""
    bits = [
        F.when(dot(vec, lit_vector(h)) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        * (2 ** i)
        for i, h in enumerate(hyperplanes)
    ]
    out = F.lit(0).cast("long")
    for b in bits:
        out = out + b
    return out
