"""Window / analytical queries extending the relational surface: ranking,
running totals, sessionization, exact percentiles, pivot, rollup, and the
as-of join — each with a DuckDB oracle.

These generalize the reference's window patterns (A7/D1 row_number is its
only window op) to the full analytical family a Spark engine owes its users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_data_etl_spark.operators.asof import as_of_join
from storm_data_etl_spark.operators.range_join import bucketed_range_join
from storm_data_etl_spark.plans.queries import register
from storm_data_etl_spark.plans.tables import t


@register(
    "rank_in_group",
    """
    SELECT c_nationkey, c_custkey, c_name, rnk FROM (
      SELECT c_nationkey, c_custkey, c_name,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
      FROM customer)
    WHERE rnk <= 3
    """,
)
def rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation: the canonical top-k-per-group
    window (single shuffle on the partition key)."""
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_name", "rnk")
    )


@register(
    "running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders WHERE o_custkey < 50
    """,
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative spend over order history (frame-bounded
    running aggregate)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
    )


@register(
    "sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, sum(new_session) AS n_sessions, count(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a session break is a >30 min gap per user (lag +
    conditional sum — the batch analog of session_window). events.ts is raw
    epoch-nanos (long), so the gap compares in ns; the oracle compares
    INTERVAL against timestamp_ns — identical semantics."""
    gap_ns = 30 * 60 * 1_000_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = t(spark, sf_dir, "events").select(
        "user_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > gap_ns),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return gaps.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "exact_percentiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ≡ DuckDB
    `quantile_cont`). The 100 TB path swaps in percentile_approx (t-digest)
    — same plan shape, bounded memory."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "pivot_counts",
    """
    SELECT user_id % 10 AS cohort,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events GROUP BY user_id % 10
    """,
)
def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event-type counts per user cohort. Explicit value list keeps
    the schema static (no extra distinct pass) — required at scale."""
    ev = t(spark, sf_dir, "events").withColumn("cohort", F.col("user_id") % 10)
    return (
        ev.groupBy("cohort")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase", "signup", "error"])
    )


@register(
    "rollup_counts",
    """
    SELECT c_nationkey, c_mktsegment, count(*) AS n,
           grouping(c_nationkey) AS g_nation, grouping(c_mktsegment) AS g_seg
    FROM customer GROUP BY ROLLUP (c_nationkey, c_mktsegment)
    """,
)
def rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with grouping flags (subtotal rows carry
    NULL keys; grouping() disambiguates real NULLs)."""
    return (
        t(spark, sf_dir, "customer")
        .rollup("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("c_nationkey").cast("int").alias("g_nation"),
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
        )
    )


@register(
    "asof_join",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    signups AS (
      SELECT user_id, ts, event_id AS signup_event_id FROM events
      WHERE event_type = 'signup'
    )
    SELECT c.user_id, c.event_id, s.signup_event_id AS asof_signup_event_id
    FROM clicks c ASOF LEFT JOIN signups s
      ON c.user_id = s.user_id AND c.ts >= s.ts
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the user's most recent prior (or
    simultaneous) signup. Implemented as union + carry-forward window — one
    shuffle, no range bucketing, no Python (operators/asof.py); the oracle
    is DuckDB's native ASOF JOIN."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event_id")
    )
    joined = as_of_join(
        clicks,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["signup_event_id"],
    )
    return joined.select("user_id", "event_id", "asof_signup_event_id")


@register(
    "hourly_event_counts",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling aggregation — the batch twin of the streaming
    windowed count (streaming/windows.py drives the same expression through
    readStream + watermark)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts_utc")).alias("hour"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "range_join_busy_windows",
    """
    WITH busy AS (
      SELECT date_trunc('hour', ts) AS hour, count(*) AS n
      FROM events GROUP BY 1
      ORDER BY n DESC, hour ASC LIMIT 5
    ), intervals AS (
      SELECT hour - INTERVAL 30 MINUTE AS start_ts,
             hour + INTERVAL 90 MINUTE AS end_ts
      FROM busy
    )
    SELECT i.start_ts, count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM intervals i JOIN events e
      ON e.ts >= i.start_ts AND e.ts < i.end_ts
    GROUP BY i.start_ts
    """,
)
def range_join_busy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval join via bucketing (operators/range_join.py): the 5
    busiest hours, widened to overlapping [hour-30min, hour+90min) windows,
    joined back to every event inside each window. The bucketed form
    replaces the BroadcastNestedLoopJoin Spark would otherwise pick —
    the formulation that still works when the interval side is too big to
    broadcast."""
    ev = t(spark, sf_dir, "events")
    busy = (
        ev.groupBy(F.date_trunc("hour", F.col("ts_utc")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("hour"))
        .limit(5)
    )
    intervals = busy.select(
        (F.col("hour") - F.expr("INTERVAL 30 MINUTES")).alias("start_ts"),
        (F.col("hour") + F.expr("INTERVAL 90 MINUTES")).alias("end_ts"),
    )
    joined = bucketed_range_join(
        ev.select(F.col("ts_utc"), F.col("value")),
        intervals,
        point_ts="ts_utc",
        start_col="start_ts",
        end_col="end_ts",
        bucket_width_s=1800,
    )
    return joined.groupBy("start_ts").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "cube_counts",
    """
    SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
    FROM events
    GROUP BY CUBE (event_type, date_trunc('day', ts))
    """,
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all four grouping-set combinations in
    one pass — the generalization of rollup_counts. Spark expands the cube
    map-side; the shuffle still carries partial counts only."""
    ev = t(spark, sf_dir, "events")
    # to_date, not date_trunc: DuckDB's date_trunc('day') yields DATE and
    # the value-hash compare is type-sensitive through the ISO string form.
    return ev.cube(
        F.col("event_type"), F.to_date(F.col("ts_utc")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
