"""Round-9 continuation operators (stats-family completion): Jarque-Bera
normality, the Cohen/Hedges/Cliff effect-size panel, and the t-closeness
privacy audit. Each test writes a tiny parquet events table and asserts
values hand-derived in the comments; float expectations are mirrored in
pure Python with the SAME IEEE expression order the engine declares, so
an engine-side formula drift breaks these rows first."""

from __future__ import annotations

import datetime as dt
import math

from storm_data_etl_spark.plans import queries as Q
from storm_data_etl_spark.plans import window_queries  # noqa: F401 (registry)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_jarque_bera_hand_moments(spark, tmp_path):
    """Type 'a' holds v = 1,2,3,4 — every raw moment is hand-exact:
    s1=10 s2=30 s3=100 s4=354; the central moments are dyadic-exact
    (m2=1.25, m3=0, m4=2.5625) so skew is exactly 0. Type 'b' is constant
    (m2=0) -> NULL statistics. NaN / NULL value rows and NULL types are
    excluded before any moment accumulates."""
    ts = dt.datetime(2024, 1, 1, 12)
    rows = [(i, ts, 1, "a", float(v), "{}") for i, v in enumerate([1, 2, 3, 4])]
    rows += [(10, ts, 1, "b", 5.0, "{}"), (11, ts, 1, "b", 5.0, "{}")]
    rows += [
        (20, ts, 1, "a", None, "{}"),
        (21, ts, 1, "a", float("nan"), "{}"),
        (22, ts, 1, None, 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r.event_type: r
        for r in Q.REGISTRY["jarque_bera_normality"].runner(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {"a", "b"}
    a = got["a"]
    assert (a.n, a.skew_e6) == (4, 0)
    # mirrored IEEE order: exkurt = m4/(m2*m2) - 3 with the exact inputs
    exk = 2.5625 / (1.25 * 1.25) - 3.0
    assert a.exkurt_e6 == math.floor(1e6 * exk)
    jb = 1e4 * (4.0 / 6.0) * (0.0 * 0.0 + exk * exk / 4.0)
    assert a.jb_e4 == math.floor(jb)
    b = got["b"]
    assert (b.n, b.skew_e6, b.exkurt_e6, b.jb_e4) == (2, None, None, None)


def test_effect_size_panel_hand_ranks(spark, tmp_path):
    """click = [1.00, 2.00, 2.00], purchase = [2.00, 3.00] (hundredths
    100/200/200 vs 200/300). Hand rank math: per-value (a,b,t) rows are
    (100:1,0,1) (200:2,1,3) (300:0,1,1) with below = 0,1,4; the doubled
    rank sums are r2a = 2+12 = 14, r2b = 6+10 = 16, so 2U_a = 14-12 = 2,
    2U_b = 16-6 = 10 and Cliff's delta = (2-10)/(2*3*2) = -2/3 — exactly
    the pair census (0 greater - 4 less) / 6 pairs. Moment side: ss1 =
    9 - 25/3, ss2 = 0.5, pooled over df=3."""
    ts = dt.datetime(2024, 1, 1, 12)
    rows = [
        (0, ts, 1, "click", 1.0, "{}"),
        (1, ts, 1, "click", 2.0, "{}"),
        (2, ts, 1, "click", 2.0, "{}"),
        (3, ts, 1, "purchase", 2.0, "{}"),
        (4, ts, 1, "purchase", 3.0, "{}"),
        (5, ts, 1, "view", 99.0, "{}"),  # other types excluded
        (6, ts, 1, "click", None, "{}"),  # null value excluded
    ]
    _write_events(spark, tmp_path, rows)
    got = Q.REGISTRY["effect_size_panel"].runner(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n1, r.n2) == (3, 2)
    assert r.cliffs_delta_e6 == math.floor(1e6 * (2 - 10) / (2.0 * 3.0 * 2.0))
    m1 = 500.0 / (100.0 * 3.0)
    m2 = 500.0 / (100.0 * 2.0)
    ss1 = 90000.0 / 10000.0 - (500.0 / 100.0) * (500.0 / 100.0) / 3.0
    ss2 = 130000.0 / 10000.0 - (500.0 / 100.0) * (500.0 / 100.0) / 2.0
    d = (m1 - m2) / math.sqrt((ss1 + ss2) / 3.0)
    assert r.cohens_d_e6 == math.floor(1e6 * d)
    g = d * (1.0 - 3.0 / (4.0 * 5.0 - 9.0))
    assert r.hedges_g_e6 == math.floor(1e6 * g)


def test_t_closeness_hand_emd(spark, tmp_path):
    """Two classes over hours {0,1} (m=2, N=4, global hour counts 2/2).
    Class ('a',0): hours 0,0,1 -> cross-multiplied steps |2*4-2*3| = 2
    then 0, t = 2/(3*4*1) = 1/6. Class ('b',0): hour 1 only ->
    |0*4-2*1| = 2 then 0, t = 2/(1*4*1) = 1/2 > 0.25 -> the only
    violator, exposing its 1 row."""
    rows = [
        (0, dt.datetime(2024, 1, 1, 0), 1, "a", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 0), 1, "a", 2.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1), 1, "a", 3.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 1), 1, "b", 4.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = Q.REGISTRY["t_closeness_audit"].runner(spark, str(tmp_path)).collect()
    from storm_data_etl_spark.session import release_pinned

    release_pinned()
    assert len(got) == 1
    r = got[0]
    assert (r.n_classes, r.classes_above_t, r.rows_at_risk) == (2, 1, 1)
    assert r.max_t_e6 == 500000


def test_t_closeness_identical_distribution_is_zero(spark, tmp_path):
    """A class whose hour distribution equals the global one has EMD
    exactly 0 — the audit's fixed point."""
    rows = [
        (0, dt.datetime(2024, 1, 1, 0), 1, "a", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 1), 1, "a", 2.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0), 1, "b", 3.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 1), 1, "b", 4.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    got = Q.REGISTRY["t_closeness_audit"].runner(spark, str(tmp_path)).collect()
    from storm_data_etl_spark.session import release_pinned

    release_pinned()
    r = got[0]
    assert (r.n_classes, r.classes_above_t, r.rows_at_risk, r.max_t_e6) == (
        2,
        0,
        0,
        0,
    )
