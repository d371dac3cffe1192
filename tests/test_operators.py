"""Unit tests for the generic relational operators (SURVEY.md §2.3-2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_data_etl_spark.operators import relational as R


def test_first_wins_dedup(spark):
    df = spark.createDataFrame(
        [("a", 2, "second"), ("a", 1, "first"), ("b", 5, "only"), ("a", 3, "third")],
        "id string, pos int, val string",
    )
    out = R.first_wins_dedup(df, ["id"], ["pos"]).orderBy("id").collect()
    assert [(r.id, r.val) for r in out] == [("a", "first"), ("b", "only")]


def test_first_per_group_requires_total_order_stability(spark):
    # Same partition key, tie on the first order col → second breaks the tie.
    df = spark.createDataFrame(
        [("k", 1, 9), ("k", 1, 3), ("k", 2, 1)], "id string, a int, b int"
    )
    out = R.first_per_group(df, ["id"], ["a", "b"]).collect()
    assert (out[0].a, out[0].b) == (1, 3)


def test_missing_keys(spark):
    src = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    tgt = spark.createDataFrame([(1,), (3,)], "k int")
    out = R.missing_keys(src, tgt, ["k"]).collect()
    assert [r.k for r in out] == [2]


def test_count_parity(spark):
    a = spark.createDataFrame([("x",), ("x",), ("y",)], "k string")
    b = spark.createDataFrame([("x",), ("x",), ("z",)], "k string")
    out = {r.k: (r.count_a, r.count_b) for r in R.count_parity(a, b, "k").collect()}
    assert out == {"y": (1, None), "z": (None, 1)}


def test_field_compare_tolerance(spark):
    e = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, "b"), (3, None, "c")], "id int, x double, s string"
    )
    a = spark.createDataFrame(
        [(1, 1.0 + 1e-12, "a"), (2, 2.5, "b"), (3, None, "DIFF")],
        "id int, x double, s string",
    )
    out = {
        r.id: sorted(r.mismatches)
        for r in R.field_compare(e, a, "id", numeric_cols=["x"], exact_cols=["s"]).collect()
    }
    # id 1: within 1e-9 tolerance → no mismatch row at all
    assert out == {2: ["x"], 3: ["s"]}


def test_positional_compare(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "pos int, v string")
    b = spark.createDataFrame([(1, "x"), (2, "DIFF")], "pos int, v string")
    out = R.positional_compare(a, b, ["pos"]).collect()
    assert len(out) == 1 and out[0].a_v == "y" and out[0].b_v == "DIFF"


def test_top_n_deterministic(spark):
    df = spark.createDataFrame([("a", 5), ("b", 5), ("c", 1)], "k string, n int")
    out = R.top_n(df, [F.desc("n"), F.asc("k")], 2).collect()
    assert [r.k for r in out] == ["a", "b"]


def test_union_all_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([("y", 2)], "v string, id int")  # reordered cols
    out = R.union_all([a, b]).orderBy("id").collect()
    assert [(r.id, r.v) for r in out] == [(1, "x"), (2, "y")]


def test_grouped_and_conditional_counts(spark):
    df = spark.createDataFrame([("a", 1), ("a", 5), ("b", 10)], "k string, v int")
    g = {r.k: r["count"] for r in R.grouped_counts(df, "k").collect()}
    assert g == {"a": 2, "b": 1}
    c = R.conditional_count(df, F.col("v") >= 5, "n").collect()[0].n
    assert c == 2


def test_bounding_box(spark):
    df = spark.createDataFrame(
        [(32.7, -97.2), (35.0, -97.2), (32.8, -96.0)], "lat double, lon double"
    )
    out = R.bounding_box(df, "lat", "lon", 32.75, -97.15, 0.75).collect()
    assert len(out) == 1


def test_percentile_approx_exact_at_high_accuracy(spark):
    """key_skew_profile equates percentile_approx(accuracy=1e6) with
    DuckDB's quantile_disc for group counts (n ≈ 150 keys). Pin the
    guarantee that at accuracy >= n the sketch IS the exact discrete
    quantile, including on adversarial tie-heavy data."""
    import duckdb

    from pyspark.sql import functions as F

    vals = [1, 1, 1, 2, 3, 5, 5, 8, 13, 21, 21, 21, 34, 55, 89] * 7 + [144]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = df.agg(
        F.percentile_approx("c", F.lit(0.5), F.lit(1000000)).alias("p50"),
        F.percentile_approx("c", F.lit(0.99), F.lit(1000000)).alias("p99"),
    ).collect()[0]
    con = duckdb.connect()
    exp = con.execute(
        "SELECT quantile_disc(c, 0.5), quantile_disc(c, 0.99) "
        "FROM (SELECT unnest(?) AS c)", [vals]
    ).fetchone()
    assert (got.p50, got.p99) == exp


def test_approx_top_k_exact_when_capacity_exceeds_cardinality(spark):
    """approx_top_k (Spark 4 heavy-hitter sketch) is exact while
    maxItemsTracked >= distinct items — the same capacity-exactness
    contract pinned for percentile_approx and HLL. At corpus scale the
    sketch replaces the full groupBy count for top-k questions; this pins
    the regime where its answers are not approximations at all."""
    rows = [(t,) for t, n in
            [("click", 50), ("view", 30), ("purchase", 20), ("error", 7),
             ("signup", 3)] for _ in range(n)]
    df = spark.createDataFrame(rows, "x string")
    df.createOrReplaceTempView("_atk")
    got = spark.sql(
        "SELECT approx_top_k(x, 3, 100) AS tk FROM _atk"
    ).collect()[0].tk
    assert [(r.item, r["count"]) for r in got] == [
        ("click", 50), ("view", 30), ("purchase", 20)
    ]


def test_two_phase_agg_equals_plain_groupby(spark):
    """Salting must be result-invariant for decomposable aggregates —
    asserted against the plain groupBy on a skewed fixture (one key holds
    90% of rows), for several bucket counts including 1 (degenerate)."""
    from pyspark.sql import functions as F

    from storm_data_etl_spark.operators.skew import two_phase_agg

    rows = [("hot" if i % 10 else f"cold{i}", i, i * 3 % 17) for i in range(400)]
    df = spark.createDataFrame(rows, ["k", "rid", "v"])
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"], r["mn"])
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"), F.sum("v").alias("s"),
            F.max("v").alias("mx"), F.min("v").alias("mn"),
        )
        .collect()
    }
    for buckets in (1, 4, 32):
        salted = {
            r["k"]: (r["n"], r["s"], r["mx"], r["mn"])
            for r in two_phase_agg(
                df,
                ["k"],
                {"n": ("count", "v"), "s": ("sum", "v"),
                 "mx": ("max", "v"), "mn": ("min", "v")},
                buckets=buckets,
                salt_from="rid",
            ).collect()
        }
        assert salted == plain, buckets


def test_two_phase_agg_rejects_non_decomposable(spark):
    import pytest as _pytest

    from storm_data_etl_spark.operators.skew import two_phase_agg

    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with _pytest.raises(ValueError, match="not decomposable"):
        two_phase_agg(df, ["k"], {"m": ("median", "v")})
