"""Hand-computed semantics for the native-primitive analytics added in
round 2: batch session_window, sliding (hopping) windows, unpivot/melt,
snowflake nation-pair join, and funnel timing. Each test writes a tiny
parquet `events`/`lineitem`/... table and runs the registry query against
it, asserting exact hand-derived outputs (the DuckDB oracle cross-check
runs separately via tools/pandas_parity_check.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from storm_data_etl_spark.plans import window_queries as WQ
from storm_data_etl_spark.plans import queries as Q


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_session_window_gap_boundary(spark, tmp_path):
    # user 1: 10:00 and 10:29:59.999999 merge (gap < 30 min); 11:00 breaks.
    # user 2: 10:00 and exactly 10:30: session_window MERGES at the exact
    # boundary (break is strictly > gap), same as sessionize.
    rows = [
        (1, _ts(10), 1, "click", 1.0, "{}"),
        (2, _ts(10, 29, 59, 999999), 1, "click", 1.0, "{}"),
        (3, _ts(11), 1, "click", 1.0, "{}"),
        (4, _ts(10), 2, "click", 1.0, "{}"),
        (5, _ts(10, 30), 2, "click", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    sw = {
        r.user_id: (r.n_sessions, r.max_session_events, r.total_session_min)
        for r in WQ.session_window_agg(spark, str(tmp_path)).collect()
    }
    # user 1: sessions [10:00, 10:29:59.999999] (dur ~30+30 min) and [11:00]
    # (dur 30 min) → floor(total) = 89 min (59:59.999999 + 30:00)
    assert sw[1][0] == 2 and sw[1][1] == 2 and sw[1][2] == 89
    # user 2: one merged session 10:00→10:30 (+gap) = 60 min
    assert sw[2] == (1, 2, 60)
    sess = {
        r.user_id: r.n_sessions
        for r in WQ.sessionize(spark, str(tmp_path)).collect()
    }
    assert sess[1] == 2
    assert sess[2] == 1  # strict > 30 min keeps the exact-gap pair together


def test_sliding_window_expansion(spark, tmp_path):
    _write_events(spark, tmp_path, [(1, _ts(10, 7), 1, "click", 1.0, "{}")])
    out = WQ.sliding_window_counts(spark, str(tmp_path)).collect()
    starts = sorted(r.w_start for r in out)
    assert starts == [_ts(9, 15), _ts(9, 30), _ts(9, 45), _ts(10, 0)]
    assert all(r.n == 1 and r.event_type == "click" for r in out)


def test_time_to_conversion_buckets(spark, tmp_path):
    rows = [
        (1, _ts(9), 1, "purchase", 1.0, "{}"),    # before signup → ignored
        (2, _ts(10), 1, "signup", 1.0, "{}"),
        (3, _ts(12, 30), 1, "purchase", 1.0, "{}"),  # 2.5 h → bucket 2
        (4, _ts(13), 1, "purchase", 1.0, "{}"),      # later → not first
        (5, _ts(10), 2, "purchase", 1.0, "{}"),      # no signup → excluded
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r.hours_to_convert: r.n_users
        for r in WQ.time_to_conversion(spark, str(tmp_path)).collect()
    }
    assert out == {2: 1}


def test_unpivot_metrics_shape(spark, tmp_path):
    spark.createDataFrame(
        [
            (1, 10, 10, 1, 2.0, 100.50, 0.05, 0.02, "N", "O", _ts(10)),
            (2, 20, 20, 1, 3.0, 200.25, 0.10, 0.04, "R", "F", _ts(11)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {r.metric: (r.n, r.sum_e2) for r in
           Q.unpivot_metrics(spark, str(tmp_path)).collect()}
    assert out["l_quantity"] == (2, 500)          # 5.00 → 500
    assert out["l_extendedprice"] == (2, 30075)   # 300.75 → 30075
    assert out["l_discount"] == (2, 15)           # 0.15 → 15
    assert out["l_tax"] == (2, 6)                 # 0.06 → 6


def test_nation_pair_trade_revenue(spark, tmp_path):
    p = str(tmp_path)
    spark.createDataFrame(
        [(1, "ALPHA", 0), (2, "BETA", 0)], "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/nation.parquet")
    spark.createDataFrame(
        [(7, "s", 1, 0.0)], "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/supplier.parquet")
    spark.createDataFrame(
        [(9, "c", 2, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/customer.parquet")
    spark.createDataFrame(
        [(5, 9, "O", 100.0, _ts(10), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/orders.parquet")
    spark.createDataFrame(
        [
            (5, 1, 7, 1, 1.0, 100.00, 0.10, 0.0, "N", "O", _ts(10)),
            (5, 2, 7, 2, 1.0, 50.00, 0.00, 0.0, "N", "O", _ts(10)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/lineitem.parquet")
    rows = Q.nation_pair_trade(spark, p).collect()
    assert len(rows) == 1
    r = rows[0]
    # revenue = 100*0.9 + 50*1.0 = 140.00 → e2 = 14000
    assert (r.supp_nation, r.cust_nation, r.n_items, r.revenue_e2) == (
        "ALPHA", "BETA", 2, 14000
    )


def test_collation_join_sort_matches_lower_join(spark, sf_dir):
    """The collated join must equal the classic lower()-normalized join
    row for row, and the output must arrive sorted by segment."""
    from pyspark.sql import functions as F

    from storm_data_etl_spark.plans import queries as Q

    got = Q.collation_join_sort(spark, sf_dir).collect()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    mixed = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment"))
        .otherwise(F.upper("c_mktsegment"))
        .alias("seg"),
        "c_custkey",
    )
    dim = c.select(F.col("c_mktsegment").alias("seg_name")).distinct()
    ref = (
        mixed.join(dim, F.lower(mixed["seg"]) == F.lower(dim["seg_name"]))
        .groupBy(F.lower("seg_name").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c_custkey").alias("s"))
        .collect()
    )
    ref_map = {r.segment: (r.n, r.s) for r in ref}
    assert [r.segment for r in got] == sorted(ref_map)  # sorted output
    for r in got:
        assert (r.n_matched, r.key_sum) == ref_map[r.segment]


def test_welch_ttest_matches_python_model(spark, sf_dir):
    """t statistic recomputed in pure Python from the same quantized
    values must agree exactly (same integer sums, same IEEE ops)."""
    import math

    row = WQ.welch_ttest(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    vals = {
        et: [math.floor(r.value * 100) for r in ev.filter(
                 (F.col("event_type") == et) & F.col("value").isNotNull())
             .select("value").collect()]
        for et in ("click", "purchase")
    }
    n1, n2 = len(vals["click"]), len(vals["purchase"])
    s1, s2 = sum(vals["click"]), sum(vals["purchase"])
    q1, q2 = sum(v * v for v in vals["click"]), sum(v * v for v in vals["purchase"])
    m1, m2 = s1 / (100.0 * n1), s2 / (100.0 * n2)
    v1 = (q1 / 10000.0 - (s1 / 100.0) * (s1 / 100.0) / n1) / (n1 - 1)
    v2 = (q2 / 10000.0 - (s2 / 100.0) * (s2 / 100.0) / n2) / (n2 - 1)
    tstat = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert (row.n1, row.n2) == (n1, n2)
    assert row.t_e4 == math.floor(10000.0 * tstat)
    # variances must be positive and the statistic finite
    assert v1 > 0 and v2 > 0


def test_association_rules_known_baskets(spark):
    """Hand-built baskets: 4 users, A&B co-occur for 2 of the 3 A-users
    and 2 of the 2 B-users; lift > 1 for the coupled pair."""
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "C"),
        (1, "A"),  # duplicate event: baskets must dedup
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    orig = WQ.t
    WQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        out = {(r.type_a, r.type_b): r for r in WQ.association_rules(spark, "x").collect()}
    finally:
        WQ.t = orig
    ab = out[("A", "B")]
    assert (ab.n_ab, ab.n_a, ab.n_b) == (2, 3, 2)
    assert ab.conf_ab_e4 == (10000 * 2) // 3   # P(B|A) = 2/3
    assert ab.conf_ba_e4 == 10000              # P(A|B) = 1
    assert ab.lift_e4 == (10000 * 2 * 4) // (3 * 2)  # lift = 4/3
    ac = out[("A", "C")]
    assert (ac.n_ab, ac.n_a, ac.n_b) == (1, 3, 2)
    assert ("B", "C") not in out  # never co-occur


def test_ks_two_sample_known_distributions(spark):
    """A = {1,2,3} clicks vs B = {3,4} purchases → D = 2/3 at v=2."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, 1, "click", float(v), "{}") for i, v in enumerate([1, 2, 3])]
    rows += [(10 + i, base, 1, "purchase", float(v), "{}") for i, v in enumerate([3, 4])]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts_utc", F.col("ts"))
    orig = WQ.t
    WQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        out = WQ.ks_two_sample(spark, "x").collect()[0]
    finally:
        WQ.t = orig
    assert (out.n, out.m) == (3, 2)
    # D = |2/3 - 0| at v=200 → floor(1e6 * 4 / 6)
    assert out.d_e6 == 666666


def test_k_anonymity_audit_flags_small_classes(spark, sf_dir):
    out = WQ.k_anonymity_audit(spark, sf_dir).collect()[0]
    assert out.n_classes > 0
    assert 0 <= out.classes_below_k <= out.n_classes
    assert out.min_class_size >= 1
    # rows_at_risk counts only rows in sub-k classes
    assert out.rows_at_risk < 5 * (out.classes_below_k + 1)


def test_cms_estimates_bounded(spark, sf_dir):
    """CMS guarantees: estimate never undercounts, and with d=4 rows the
    min-estimate stays within eps*N (eps = e/w) on the deterministic
    fixture (probabilistic in general, stable here)."""
    import math

    rows = WQ.cms_frequency_estimates(spark, sf_dir).collect()
    assert len(rows) == 8
    n_events = (
        spark.read.parquet(f"{sf_dir}/events.parquet").count()
    )
    eps_bound = math.e / 256 * n_events
    for r in rows:
        assert r.cms_estimate >= r.true_count
        assert r.cms_estimate - r.true_count <= eps_bound


def test_gini_known_distributions(spark):
    """Uniform values → G ≈ 0; one row carrying everything → G → (n-1)/n."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, 1, "flat", 5.0, "{}") for i in range(10)]
    rows += [(100 + i, base, 1, "spike", 0.01 if i else 1000.0, "{}") for i in range(10)]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts_utc", F.col("ts"))
    orig = WQ.t
    WQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        out = {r.event_type: r for r in WQ.value_concentration_gini(spark, "x").collect()}
    finally:
        WQ.t = orig
    assert out["flat"].gini_e6 == 0  # identical values: perfectly equal
    # one of ten rows holds ~99.999% of the mass → G ≈ 0.9 - tiny
    assert out["spike"].gini_e6 > 880000
    assert out["spike"].n == 10


def test_mann_whitney_u_known_values_and_identity(spark, sf_dir):
    """Handcrafted A={1,2,3} vs B={3,4}: midranks 1,2,3.5,3.5,5 →
    R_A=6.5, U_A=0.5 → u2_a=1; the tie at 3 contributes t³−t=6. Also pin
    the U_A + U_B = n_a·n_b identity on the real fixture."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, 1, "click", float(v), "{}") for i, v in enumerate([1, 2, 3])]
    rows += [(10 + i, base, 1, "purchase", float(v), "{}") for i, v in enumerate([3, 4])]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts_utc", F.col("ts"))
    orig = WQ.t
    WQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        out = WQ.mann_whitney_u(spark, "x").collect()[0]
    finally:
        WQ.t = orig
    assert (out.n_a, out.n_b) == (3, 2)
    assert out.u2_a == 1   # 2×U_A = 2·(6.5 − 6)
    assert out.u2_b == 11  # 2×U_B = 2·(n_a·n_b − U_A) = 2·5.5
    assert out.u2_a + out.u2_b == 2 * out.n_a * out.n_b
    assert out.tie_term == 6

    real = WQ.mann_whitney_u(spark, sf_dir).collect()[0]
    assert real.u2_a + real.u2_b == 2 * real.n_a * real.n_b
    assert real.tie_term >= 0


def test_approx_percentile_exact_regime_vs_exact(spark, sf_dir):
    """In the exactness regime (accuracy >> n) percentile_approx must
    equal the exact percentile for every group and quantile."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
    )
    approx = WQ.approx_percentile_regime(spark, sf_dir).collect()
    for r in approx:
        vals = sorted(
            x.value
            for x in ev.filter(F.col("event_type") == r.event_type).collect()
        )
        import math

        for p, got in ((0.25, r.q25), (0.5, r.q50), (0.75, r.q75), (0.99, r.q99)):
            # discrete quantile: smallest element with cum fraction >= p
            idx = max(0, math.ceil(p * len(vals)) - 1)
            assert got == vals[idx], (r.event_type, p, got, vals[idx])


def test_l_diversity_handcrafted(spark):
    """A class with many rows but one distinct user is k-safe yet
    l-unsafe — the case that motivates l-diversity over k-anonymity."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 5)
    rows = [(i, base, 7, "click", 50.0, "{}") for i in range(10)]       # 10 rows, 1 user
    rows += [(100 + i, base, i, "view", 50.0, "{}") for i in range(4)]  # 4 rows, 4 users
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts_utc", F.col("ts"))
    orig = WQ.t
    WQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        out = WQ.l_diversity_audit(spark, "x").collect()[0]
    finally:
        WQ.t = orig
    assert out.n_classes == 2
    assert out.classes_below_l == 1      # the single-user click class
    assert out.rows_at_risk == 10        # all 10 of its rows
    assert out.min_diversity == 1


def test_rolling_median_robust_to_spike(spark):
    """A single spike day moves the rolling mean but not the median —
    the property that motivates the robust variant."""
    import datetime as dt

    rows = []
    for i, v in enumerate([10.0, 10.0, 10.0, 999.0, 10.0, 10.0, 10.0]):
        rows.append((i, dt.datetime(2024, 1, 1 + i), 1, "click", v, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts_utc", F.col("ts"))
    orig = WQ.t
    WQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        out = sorted(
            WQ.rolling_median_7d(spark, "x").collect(), key=lambda r: r.day
        )
    finally:
        WQ.t = orig
    # day 7 frame holds [1000,1000,1000,99900,1000,1000,1000] cents
    assert out[-1].med7_cents == 1000
    assert out[3].cents == 99900  # the spike itself is present
    # the growing frame always holds a 1000-cent majority, so the
    # discrete median is 1000 on every day — including the spike day
    assert all(r.med7_cents == 1000 for r in out)


def test_rolling_median_calendar_frame_excludes_gap_days(spark):
    """The frame is calendar days, not observed rows: a value 20 days ago
    must NOT sit in today's 7-day window even when it is the previous
    observed row (sparse event types with outage gaps)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "click", 999.0, "{}"),   # 20 days before
        (2, dt.datetime(2024, 1, 21), 1, "click", 10.0, "{}"),
        (3, dt.datetime(2024, 1, 22), 1, "click", 20.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts_utc", F.col("ts"))
    orig = WQ.t
    WQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        out = {r.day.day: r.med7_cents for r in WQ.rolling_median_7d(spark, "x").collect()}
    finally:
        WQ.t = orig
    assert out[1] == 99900            # its own singleton frame
    assert out[21] == 1000            # Jan 1 is outside the 7-day range
    assert out[22] == 1000            # median of {1000, 2000} -> lower


# ---------------------------------------------------------------------
# Decorrelated-subquery join patterns (Q2/Q17/Q11 shapes)
# ---------------------------------------------------------------------

def _write_tpch(spark, path, lineitem, part, supplier):
    spark.createDataFrame(
        lineitem,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    spark.createDataFrame(
        part, "p_partkey long, p_name string, p_brand string, p_size int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/part.parquet")
    spark.createDataFrame(
        supplier, "s_suppkey long, s_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/supplier.parquet")


def test_min_cost_supplier_tiebreak(spark, tmp_path):
    """Two suppliers tie on the min price -> the lower suppkey wins (the
    struct-min tie-break), and a cheaper line elsewhere drives the min."""
    _write_tpch(
        spark,
        str(tmp_path),
        [
            (1, 100, 7, 1.0, 50.0),
            (2, 100, 3, 1.0, 50.0),   # tie with supplier 7 -> 3 wins
            (3, 100, 7, 1.0, 80.0),   # non-min line ignored
            (4, 200, 9, 1.0, 10.0),   # part filtered out by p_size
        ],
        [(100, "big part", "Brand#4", 50), (200, "small part", "Brand#4", 1)],
        [(3, "s-three"), (7, "s-seven"), (9, "s-nine")],
    )
    rows = Q.min_cost_supplier(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.p_partkey == 100 and r.s_name == "s-three" and r.min_cost == 50.0


def test_correlated_avg_filter_strict_boundary(spark, tmp_path):
    """qty exactly at half the part average is EXCLUDED (strict <), and the
    integer-arithmetic form matches the float threshold semantics."""
    # part 100 (Brand#4): quantities 2, 4, 6 -> avg 4, half-avg 2.
    #   qty 2 == boundary -> excluded; nothing below -> n_small counts 0...
    # part 200 (Brand#4): quantities 1, 9 -> avg 5, half 2.5 -> qty 1 kept.
    _write_tpch(
        spark,
        str(tmp_path),
        [
            (1, 100, 1, 2.0, 100.0),
            (2, 100, 1, 4.0, 100.0),
            (3, 100, 1, 6.0, 100.0),
            (4, 200, 1, 1.0, 70.0),
            (5, 200, 1, 9.0, 100.0),
        ],
        [(100, "a", "Brand#4", 10), (200, "b", "Brand#4", 10)],
        [(1, "s")],
    )
    r = Q.correlated_avg_filter(spark, str(tmp_path)).collect()[0]
    assert r.n_small == 1
    assert r.avg_yearly == 10.0  # 70.0 / 7


def test_acf_alternating_series(spark, tmp_path):
    """A strictly alternating daily count series has lag-1 ACF == -1 and
    lag-2 ACF == +1 (exact integer arithmetic -> exactly -10000/10000)."""
    rows = []
    eid = 0
    for day in range(10):  # counts alternate 1, 3, 1, 3, ...
        for _ in range(1 if day % 2 == 0 else 3):
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + day, 12), 1, "click", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    out = {r.lag: r for r in WQ.acf_lag_profile(spark, str(tmp_path)).collect()}
    assert out[1].acf_e4 == -10000
    assert out[2].acf_e4 == 10000
    assert out[1].n_pairs == 9 and out[2].n_pairs == 8


def test_acf_gap_days_shrink_pairs(spark, tmp_path):
    """Calendar-exact pairing: a missing day removes its pairs instead of
    pairing non-adjacent days (the row-offset lag() failure mode)."""
    rows = []
    eid = 0
    for day in [1, 2, 4, 5]:  # day 3 missing
        for _ in range(day):
            rows.append(
                (eid, dt.datetime(2024, 3, day, 12), 1, "click", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    out = {r.lag: r.n_pairs for r in WQ.acf_lag_profile(spark, str(tmp_path)).collect()}
    assert out[1] == 2  # (2,1) and (5,4) — never (4,2)
    assert out[2] == 1  # only (4,2); (3,1) and (5,3) need the missing day
    assert out[3] == 2  # (4,1) and (5,2)


def test_weekday_seasonality_flat_and_spiked(spark, tmp_path):
    """Two Mondays at 30 events/day vs five other days at 10/day: the
    Monday index is exactly 60*7/(2*110) of the flat baseline."""
    rows = []
    eid = 0
    # 2024-03-04 and 2024-03-11 are Mondays
    days = [(dt.date(2024, 3, 4), 30), (dt.date(2024, 3, 11), 30),
            (dt.date(2024, 3, 5), 10), (dt.date(2024, 3, 6), 10),
            (dt.date(2024, 3, 7), 10), (dt.date(2024, 3, 8), 10),
            (dt.date(2024, 3, 9), 10)]
    for d, n in days:
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(d.year, d.month, d.day, 9), 1, "x", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    out = {r.weekday_name: r for r in
           WQ.weekday_seasonality_index(spark, str(tmp_path)).collect()}
    assert out["mon"].n_events == 60 and out["mon"].n_days == 2
    assert out["mon"].mean_daily_e2 == 3000
    # index = (60 * 7) / (2 * 110) = 1.9090... -> 19090
    assert out["mon"].index_e4 == 19090
    assert out["tue"].index_e4 == 6363  # floor(1e4 * 10 * 7 / 110)


def test_watermark_lag_bands_handcrafted(spark, tmp_path):
    """Arrival order = ts + LCG jitter; verify against a pure-Python
    replica of the running-max lateness on a two-user stream."""
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i % 60, i // 60), i % 2, "x", 1.0, "{}")
        for i in range(40)
    ]
    _write_events(spark, str(tmp_path), rows)
    out = {r.band: r for r in
           WQ.watermark_lag_histogram(spark, str(tmp_path)).collect()}

    def lcg(i):
        return ((i % 2_147_483_648) * 1103515245 + 12345) % 2_147_483_648

    import collections
    streams = collections.defaultdict(list)
    for i in range(40):
        ts_ns = int(dt.datetime(2024, 1, 1, 0, i % 60, i // 60)
                    .timestamp() * 1e9)
        arr = ts_ns + (lcg(i) % 7_200_000) * 1_000_000
        streams[i % 2].append((arr, i, ts_ns))
    expected = collections.Counter()
    max_by_band = collections.defaultdict(int)
    for evs in streams.values():
        evs.sort()
        run_max = None
        for _, _, ts_ns in evs:
            late = max(0, (run_max if run_max is not None else ts_ns) - ts_ns)
            b = ("in_order" if late == 0 else
                 "le_1s" if late <= 1e9 else
                 "le_10s" if late <= 1e10 else
                 "le_1min" if late <= 6e10 else
                 "le_10min" if late <= 6e11 else "gt_10min")
            expected[b] += 1
            max_by_band[b] = max(max_by_band[b], late)
            run_max = ts_ns if run_max is None else max(run_max, ts_ns)
    assert {b: r.n_events for b, r in out.items()} == dict(expected)
    for b, r in out.items():
        assert r.max_lateness_ns == max_by_band[b]


def test_score_calibration_bin_accounting(spark, sf_dir):
    """Bins partition the corpus exactly; rates are exact integer e4."""
    from storm_data_etl_spark.plans import ml_queries as MQ

    rows = MQ.score_calibration_bins(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n for r in rows) == docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    assert sum(r.n_pos for r in rows) == n_en
    for r in rows:
        assert 0 <= r.bin <= 9
        assert r.pos_rate_e4 == (10000 * r.n_pos) // r.n


def test_skyline_dominance_semantics(spark, tmp_path):
    """Strict-dominance edge cases: equal-price-larger-size dominates;
    exact duplicates co-survive; incomparable points all survive."""
    parts = [
        (1, "a", "B", 10, 100.00),   # skyline (cheapest)
        (2, "b", "B", 20, 200.00),   # skyline (bigger, pricier)
        (3, "c", "B", 15, 200.00),   # dominated by 2 (same price, smaller)
        (4, "d", "B", 20, 200.00),   # duplicate of 2 -> co-survives
        (5, "e", "B", 5, 300.00),    # dominated by 2 (pricier, smaller)
        (6, "f", "B", 30, 400.00),   # skyline (largest)
    ]
    spark.createDataFrame(
        parts,
        "p_partkey long, p_name string, p_brand string, p_size int, "
        "p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    got = sorted(r.p_partkey for r in Q.skyline_2d(spark, str(tmp_path)).collect())
    assert got == [1, 2, 4, 6]


def test_bfs_layers_known_graph(spark):
    """Hand-built path + branch graph: exact layer assignment, min-dist
    on multi-path nodes, unreached nodes absent."""
    from pyspark.sql import Row

    from storm_data_etl_spark.operators.graph import bfs_layers
    from storm_data_etl_spark.session import release_pinned

    # 1->2->3->4->5 chain, 1->3 shortcut, 9->10 disconnected
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=4),
         Row(src=4, dst=5), Row(src=1, dst=3), Row(src=9, dst=10)]
    )
    seeds = spark.createDataFrame([Row(node=1)])
    try:
        got = {r.node: r.dist for r in bfs_layers(edges, seeds, max_hops=3).collect()}
    finally:
        release_pinned()
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}  # 3 via shortcut; 9/10 absent


def test_spearman_perfect_and_inverse(spark, tmp_path):
    """Monotone-increasing punct with length -> rho 10000; strictly
    inverse -> -10000; scipy-checked midranks under ties."""
    rows = [
        # source A: punct strictly increases with n_chars -> rho = 1
        (1, "aa.", "en", "A", 10), (2, "bb..", "en", "A", 20),
        (3, "cc...", "en", "A", 30), (4, "dd....", "en", "A", 40),
        # source B: punct strictly decreases with n_chars -> rho = -1
        (5, "x....", "en", "B", 10), (6, "y...", "en", "B", 20),
        (7, "z..", "en", "B", 30), (8, "w.", "en", "B", 40),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from storm_data_etl_spark.plans import window_queries as WQ2

    out = {r.source: r.spearman_e4 for r in
           WQ2.spearman_quality_length(spark, str(tmp_path)).collect()}
    assert out["A"] == 10000 and out["B"] == -10000


def test_multiset_semantics_handcrafted(spark, tmp_path):
    """Bag cancellation: a has key 1 x3 and key 2 x1; b has key 1 x1 and
    key 2 x2 -> EXCEPT ALL leaves 1 x2; INTERSECT ALL gives 1 x1, 2 x1."""
    rows = [
        # a-side: status 'O'; b-side: priority '1-URGENT' (overlapping)
        (1, 1, "O", 1.0, dt.datetime(2024, 1, 1), "3-LOW"),
        (2, 1, "O", 1.0, dt.datetime(2024, 1, 1), "3-LOW"),
        (3, 1, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT"),  # both sides
        (4, 2, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT"),  # both sides
        (5, 2, "F", 1.0, dt.datetime(2024, 1, 1), "1-URGENT"),  # only b
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    ex = {r.o_custkey: r.multiplicity for r in
          Q.multiset_except_all(spark, str(tmp_path)).collect()}
    # a: {1:3, 2:1}; b: {1:1, 2:2} -> except_all: {1:2}
    assert ex == {1: 2}
    it = {r.o_custkey: r.multiplicity for r in
          Q.multiset_intersect_all(spark, str(tmp_path)).collect()}
    assert it == {1: 1, 2: 1}
