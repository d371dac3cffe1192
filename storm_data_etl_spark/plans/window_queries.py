"""Window / analytical queries extending the relational surface: ranking,
running totals, sessionization, exact percentiles, pivot, rollup, and the
as-of join — each with a DuckDB oracle.

These generalize the reference's window patterns (A7/D1 row_number is its
only window op) to the full analytical family a Spark engine owes its users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_data_etl_spark.operators import sampling as SP
from storm_data_etl_spark.operators.asof import as_of_join
from storm_data_etl_spark.operators.range_join import bucketed_range_join
from storm_data_etl_spark.plans.queries import register
from storm_data_etl_spark.plans.tables import t
from storm_data_etl_spark.session import pin as _pin


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
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a session break is a >30 min gap per user (lag +
    conditional sum — the batch analog of session_window). events.ts is raw
    epoch-nanos (long), so the gap compares in ns; the oracle compares
    INTERVAL against timestamp_ns — identical semantics."""
    gap_ns = 30 * 60 * 1_000_000_000
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gaps = t(spark, sf_dir, "events").select(
        "user_id",
        F.when(
            F.lag("ts_ns").over(w).isNull()
            | ((F.col("ts_ns") - F.lag("ts_ns").over(w)) > gap_ns),
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
    "winsorized_stats",
    """
    WITH b AS (
      SELECT event_type, "value",
             quantile_cont("value", 0.05) OVER (PARTITION BY event_type) AS lo,
             quantile_cont("value", 0.95) OVER (PARTITION BY event_type) AS hi
      FROM events
    )
    SELECT event_type, count(*) AS n,
           CAST(sum(CASE WHEN "value" < lo OR "value" > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped,
           CAST(floor(10000 * sum(least(greatest("value", lo), hi)) / count(*))
                AS BIGINT) AS winsor_mean_e4,
           CAST(floor(10000 * max(lo)) AS BIGINT) AS p05_e4,
           CAST(floor(10000 * max(hi)) AS BIGINT) AS p95_e4
    FROM b GROUP BY event_type
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) robust mean per event type: exact p05/p95 as
    partition-window percentiles, values clipped into the band, outliers
    counted — the standard tail-taming pass before numeric features feed
    training. One shuffle on event_type; at 100 TB the exact holistic
    percentile swaps for percentile_approx computed in a pre-aggregate
    (same two-pass shape) rather than a window."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    staged = ev.select(
        "event_type",
        "value",
        F.percentile("value", F.lit(0.05)).over(w).alias("lo"),
        F.percentile("value", F.lit(0.95)).over(w).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    out_of_band = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return staged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(out_of_band, 1).otherwise(0)).alias("n_clipped"),
        F.floor(10000 * F.sum(clipped) / F.count(F.lit(1)))
        .cast("bigint")
        .alias("winsor_mean_e4"),
        F.floor(10000 * F.max("lo")).cast("bigint").alias("p05_e4"),
        F.floor(10000 * F.max("hi")).cast("bigint").alias("p95_e4"),
    )


@register(
    "rolling_distinct_types",
    """
    WITH r AS (
      SELECT user_id,
             len(list_distinct(list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)))
               AS n_distinct_1h
      FROM events
    )
    SELECT user_id, count(*) AS n_events,
           max(n_distinct_1h) AS max_distinct_1h
    FROM r GROUP BY user_id
    """,
)
def rolling_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burst diversity: distinct event types within the trailing
    hour at every event (range frame over the raw ns timestamp — ties are
    peers, so ordering is unambiguous), summarized as the per-user max.
    Distinct-in-frame is collect_list + array_distinct (bounded by the
    frame); at 100 TB the range frame stays per-user-local — one shuffle
    on user_id."""
    one_hour_ns = 3_600_000_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns")
        .rangeBetween(-one_hour_ns, 0)
    )
    r = t(spark, sf_dir, "events").select(
        "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w))).alias(
            "n_distinct_1h"
        ),
    )
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("n_distinct_1h").alias("max_distinct_1h"),
    )


@register(
    "value_corr_by_type",
    """
    SELECT event_type, count(*) AS n,
           CAST(floor(10000 * corr("value", CAST(hour(ts) AS DOUBLE)))
                AS BIGINT) AS corr_value_hour_e4
    FROM events GROUP BY event_type
    """,
)
def value_corr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of event value against hour-of-day per type —
    the quick seasonality screen before feature selection. Spark `corr` ≡
    DuckDB `corr` (sample covariance over n−1); one partial-aggregable
    shuffle on event_type."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(
            10000 * F.corr("value", F.hour("ts_utc").cast("double"))
        )
        .cast("bigint")
        .alias("corr_value_hour_e4"),
    )


@register("hll_distinct_rollup", None)  # Datasketches binary: no SQL oracle
def hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-day HLL sketches of user_id
    built once (`hll_sketch_agg`), then UNIONED upward (`hll_union_agg`)
    into per-type totals — distinct counts composed from partial states
    without re-touching rows, the incremental_agg_maintenance /
    hypertable_rollup discipline applied to COUNT(DISTINCT), which does
    not otherwise compose. At 100 TB the daily sketch table is KBs per
    partition and replaces a full-corpus shuffle per rollup question;
    estimates are within ~2% (lgK=12) — pytest pins the error against the
    exact count. No SQL oracle: the sketch binary is Datasketches-
    specific (driver does the rows-only check)."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts_utc").alias("day"), "user_id"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n_rows").alias("n_rows"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "distinct_users_est"
            ),
        )
        .select("event_type", "n_days", "n_rows", "distinct_users_est")
    )


@register(
    "percentile_ranks",
    """
    WITH r AS (
      SELECT event_type, event_id,
             percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY "value", event_id) AS pr,
             cume_dist()    OVER (PARTITION BY event_type
                                  ORDER BY "value", event_id) AS cd
      FROM events
    )
    SELECT event_type,
           count(*) AS n,
           CAST(floor(1000000 * max(CASE WHEN pr <= 0.5 THEN pr END))
                AS BIGINT) AS median_pr_e6,
           CAST(floor(1000000 * min(CASE WHEN cd >= 0.9 THEN cd END))
                AS BIGINT) AS p90_cd_e6
    FROM r GROUP BY event_type
    """,
)
def percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist relative-position windows (deterministic
    event_id tiebreak), summarized per type: the largest percent_rank at
    or below the median and the smallest cume_dist at or above 0.9. The
    ranks are exact rationals (k/(n−1), k/n) — identical doubles in both
    engines, so the e6 floor is parity-safe."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = t(spark, sf_dir, "events").select(
        "event_type",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(1000000 * F.max(F.when(F.col("pr") <= 0.5, F.col("pr"))))
        .cast("bigint")
        .alias("median_pr_e6"),
        F.floor(1000000 * F.min(F.when(F.col("cd") >= 0.9, F.col("cd"))))
        .cast("bigint")
        .alias("p90_cd_e6"),
    )


@register(
    "event_transition_matrix",
    """
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT prev, event_type AS next, count(*) AS n,
           CAST(floor(1000000 * count(*)::DOUBLE /
                sum(count(*)) OVER (PARTITION BY prev)) AS BIGINT) AS prob_e6
    FROM s WHERE prev IS NOT NULL
    GROUP BY prev, event_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (lag window with the standard ns-ts + event_id order): count and
    row-normalized probability per (prev → next) pair — the behavioral-
    model summary behind session simulation and anomaly scoring. One
    shuffle on user_id for the lag, one tiny aggregate; the normalizing
    row sums ride a window over the K×K result, not the events."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = t(spark, sf_dir, "events").select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    counts = (
        s.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("prev")
    return counts.select(
        "prev",
        "next",
        "n",
        F.floor(1000000 * F.col("n").cast("double") / F.sum("n").over(wrow))
        .cast("bigint")
        .alias("prob_e6"),
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
    "grouping_sets_counts",
    """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n,
           CAST(floor(100 * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE)) AS BIGINT) AS total_price_e2,
           grouping(o_orderpriority) AS g_prio, grouping(o_orderstatus) AS g_status
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderstatus), ())
    """,
)
def grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (the general form behind ROLLUP/CUBE): the
    (priority × status) detail grid, per-status subtotals, and the grand
    total in ONE pass — Catalyst expands the sets into a single Expand +
    hash aggregate, so the table is scanned once instead of three times.
    Price totals use the exact-decimal-sum + floor formulation
    (see moving_avg_7d)."""
    o = t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupingSets(
        [[F.col("o_orderpriority"), F.col("o_orderstatus")],
         [F.col("o_orderstatus")], []],
        F.col("o_orderpriority"),
        F.col("o_orderstatus"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(100 * F.sum(dec).cast("double")).cast("bigint").alias("total_price_e2"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
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
    "asof_join_tolerance",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    signups AS (
      SELECT user_id, ts, event_id AS signup_event_id FROM events
      WHERE event_type = 'signup'
    ),
    j AS (
      SELECT c.user_id, c.event_id, c.ts AS cts, s.ts AS sts,
             s.signup_event_id
      FROM clicks c ASOF LEFT JOIN signups s
        ON c.user_id = s.user_id AND c.ts >= s.ts
    )
    SELECT user_id, event_id,
           CASE WHEN epoch_us(cts) - epoch_us(sts) <= 3600000000
                THEN signup_event_id END AS asof_signup_event_id,
           CASE WHEN epoch_us(cts) - epoch_us(sts) <= 3600000000
                THEN epoch_us(cts) - epoch_us(sts) END AS signup_age_us
    FROM j
    """,
)
def asof_join_tolerance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas merge_asof(tolerance=...)
    semantics): each click matches its most recent prior signup ONLY if
    that signup is within the last hour; staler matches come back NULL.
    Same union + carry-forward single-shuffle plan as asof_join — the
    bound is one post-comparison on the carried row, exact because the
    carried row is already the latest prior (anything earlier is farther).
    The oracle is DuckDB's native ASOF JOIN with the same post-filter;
    the age column and the tolerance compare are both integer
    microseconds (unix_micros / epoch_us) — exact-integer cross-engine
    parity, no float boundary anywhere."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event_id"), F.col("ts").alias("signup_ts")
    )
    joined = as_of_join(
        clicks,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["signup_event_id", "signup_ts"],
        tolerance_seconds=3600.0,
    )
    return joined.select(
        "user_id",
        "event_id",
        "asof_signup_event_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_signup_ts").cast("timestamp"))
        ).alias("signup_age_us"),
    )


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
    # date_trunc on both sides: DuckDB date_trunc('day', TIMESTAMP) yields
    # TIMESTAMP, and the driver's pandas canonicalizer stringifies a DATE
    # differently from a midnight TIMESTAMP.
    return ev.cube(
        F.col("event_type"), F.date_trunc("day", F.col("ts_utc")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "props_json_stats",
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k,
           min(CAST(props->>'$.k' AS INTEGER)) AS min_k,
           max(CAST(props->>'$.k' AS INTEGER)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column extraction at scan speed: pull a field out of
    the JSON `props` payload with get_json_object (JVM, codegen'd — no
    Python, no schema inference pass) and aggregate per event type. The
    pattern for the 'typed metadata beside an opaque payload' layout the
    multimodal tables use."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "conversion_funnel",
    """
    WITH s AS (
      SELECT user_id, min(ts) FILTER (WHERE event_type = 'signup') AS s_ts
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'click' AND s.s_ts IS NOT NULL AND e.ts >= s.s_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s WHERE s_ts IS NOT NULL) AS n_signup,
           (SELECT count(*) FROM c) AS n_click_after_signup,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase: users counted at
    a stage only when its event happens at-or-after the previous stage's
    first event. ONE shuffle: three stacked whole-partition windows over
    user_id resolve each stage's earliest qualifying timestamp in-partition,
    and the per-user collapse + global count reuse the same partitioning
    (no further exchange). The join-per-stage alternative shuffles 3×."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "s_ts", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
        )
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("s_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("c_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("s_ts").alias("s_ts"),
        F.first("c_ts").alias("c_ts"),
        F.first("p_ts").alias("p_ts"),
    )
    return per_user.agg(
        F.count("s_ts").alias("n_signup"),
        F.count("c_ts").alias("n_click_after_signup"),
        F.count("p_ts").alias("n_purchase_after_click"),
    )


@register(
    "retention_cohorts",
    """
    WITH cohort AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts) FILTER (WHERE event_type = 'signup'))
                  AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             CAST(date_trunc('week', e.ts) AS DATE) AS active_week
      FROM events e JOIN cohort c ON c.user_id = e.user_id
      WHERE c.cohort_week IS NOT NULL
        AND CAST(e.ts AS DATE) >= c.cohort_week
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
           CAST((active_week - cohort_week) / 7 AS BIGINT) AS week_offset,
           count(*) AS n_active_users
    FROM active
    GROUP BY cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by the week of their first
    signup, counted once per subsequent active week (any event type).
    Shuffles: per-user cohort agg + join co-partition on user_id, then one
    rollup exchange — the once-per-week dedup folds into the rollup as
    countDistinct instead of a separate distinct exchange. The per-user
    join side is one row per user: broadcast-eligible under AQE."""
    ev = t(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.to_date(
            F.date_trunc(
                "week", F.min(F.when(F.col("event_type") == "signup", F.col("ts_utc")))
            )
        ).alias("cohort_week")
    ).filter(F.col("cohort_week").isNotNull())
    active = (
        ev.join(cohort, "user_id")
        .filter(F.to_date("ts_utc") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            F.to_date(F.date_trunc("week", F.col("ts_utc"))).alias("active_week"),
        )
    )
    offset = (F.datediff("active_week", "cohort_week") / 7).cast("long")
    return (
        active.groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count_distinct(F.col("user_id")).alias("n_active_users"))
        .select(
            F.col("cohort_week").cast("timestamp").alias("cohort_week"),
            "week_offset",
            "n_active_users",
        )
    )


# =====================================================================
# Time-series gap fill (hourly resample + forward fill)
# =====================================================================

@register(
    "gapfill_forward_fill",
    """
    WITH ev AS (SELECT user_id, ts, "value" FROM events
                WHERE user_id < 5 AND "value" IS NOT NULL),
    obs AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             max_by("value", ts) AS v_obs
      FROM ev GROUP BY user_id, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM ev
    ),
    grid AS (
      SELECT u.user_id, g.hour
      FROM (SELECT DISTINCT user_id FROM ev) u
      CROSS JOIN bounds b,
           unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS g(hour)
    )
    SELECT g.user_id, g.hour, round(o.v_obs, 2) AS observed,
           round(last_value(o.v_obs IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value_ffill
    FROM grid g
    LEFT JOIN obs o ON o.user_id = g.user_id AND o.hour = g.hour
    """,
)
def gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: project each user's event values onto a dense
    hourly grid (sequence + explode — generated, not stored) and
    forward-fill gaps with the last observation (`last(ignorenulls)` running
    window). The grid bounds ride a broadcast single-row cross join; cost is
    ONE shuffle for the per-(user,hour) last-observation aggregate and one
    for the per-user fill window — at 100 TB the grid is generated
    executor-side, never materialized as input."""
    ev = t(spark, sf_dir, "events").filter(
        (F.col("user_id") < 5) & F.col("value").isNotNull()
    )
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts_utc").alias("hour")
    ).agg(F.max_by("value", "ts").alias("v_obs"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts_utc")).alias("h0"),
        F.date_trunc("hour", F.max("ts_utc")).alias("h1"),
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.round("v_obs", 2).alias("observed"),
            F.round(F.last("v_obs", ignorenulls=True).over(w), 2).alias(
                "value_ffill"
            ),
        )
    )


# =====================================================================
# Equi-width histogram
# =====================================================================

@register(
    "value_histogram",
    """
    SELECT CAST(floor("value" / 25) AS BIGINT) AS bin,
           count(*) AS n,
           round(CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)
             AS avg_value
    FROM events GROUP BY CAST(floor("value" / 25) AS BIGINT)
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of the value column (bin width 25): the one-pass
    binned aggregate behind distribution profiling. Narrow map-side partial
    + tiny final agg — bins are bounded, never skewed beyond the data's own
    distribution."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 25).cast("bigint").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact decimal sum -> single double division: avg-of-doubles is
            # summation-order-dependent in the last ulp and splits round(,4)
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_value"),
        )
    )


# =====================================================================
# Range-frame moving average (calendar window, not row window)
# =====================================================================

@register(
    "moving_avg_7d",
    """
    WITH ev AS (
      SELECT user_id, event_id, ts, CAST("value" AS DECIMAL(18,2)) AS v
      FROM events WHERE user_id < 20
    )
    SELECT event_id, user_id,
           CAST(floor(10000 * CAST(sum(v) OVER w AS DOUBLE) / count(*) OVER w)
                AS BIGINT) AS avg_7d_e4,
           count(*) OVER w AS n_7d
    FROM ev
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
    )
    """,
)
def moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average per user — a RANGE frame over event
    time (calendar semantics: the frame holds however many events fall in
    the window), not a row-count frame. Spark orders by the exact
    nanosecond long and bounds the range in ns; the sum is carried in
    exact decimal with ONE double division at the end (running
    double-sums are order-dependent across engines). One shuffle on
    user_id."""
    six_days_ns = 6 * 86_400 * 1_000_000_000
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns")
        .rangeBetween(-six_days_ns, 0)
    )
    dec = F.col("value").cast("decimal(18,2)")
    return ev.select(
        "event_id",
        "user_id",
        # floor of ten-thousandths, NOT round(,4): Spark rounds doubles via
        # the shortest decimal string (HALF_UP on "43.01125") while DuckDB
        # rounds the binary value (43.011249999999996...) — exact-half
        # quotients split them. floor on the identical IEEE quotient is
        # deterministic in both engines.
        F.floor(
            10000 * F.sum(dec).over(w).cast("double") / F.count(F.lit(1)).over(w)
        ).cast("bigint").alias("avg_7d_e4"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


# =====================================================================
# Token entropy (vocabulary-diversity quality signal)
# =====================================================================

@register(
    "token_entropy",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents WHERE trim(text) <> ''
    ),
    freq AS (
      SELECT doc_id, w.w AS word, count(*) AS c
      FROM toks, unnest(words) AS w(w)
      GROUP BY doc_id, w.w
    ),
    totals AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM freq
               GROUP BY doc_id)
    SELECT f.doc_id, max(t.n) AS n_tokens,
           round(-sum((f.c::DOUBLE / t.n) * ln(f.c::DOUBLE / t.n)), 6) AS entropy
    FROM freq f JOIN totals t ON t.doc_id = f.doc_id
    GROUP BY f.doc_id
    """,
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram entropy per document — the vocabulary-diversity signal that
    separates natural text from keyword stuffing / boilerplate (low
    entropy) in corpus quality filters. One shuffle on (doc, word) for
    frequencies, one per-doc aggregate; both map-side partial."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
    )
    freq = docs.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    # Optimization r12 (guide §2.4): the per-doc total was a second
    # aggregate over freq joined back — re-running the explode + count and
    # paying a join. A doc-keyed window sum computes the same n per row in
    # one pass, and the final aggregate runs co-partitioned behind it
    # (zero further exchange). Same (c, n) inputs per doc, same outputs.
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        freq.withColumn("n", n)
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_tokens"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


# =====================================================================
# NTILE bucketing (quartile assignment per group)
# =====================================================================

@register(
    "ntile_quartiles",
    """
    WITH ranked AS (
      SELECT event_type, event_id, "value",
             ntile(4) OVER (
               PARTITION BY event_type
               ORDER BY "value" NULLS FIRST, event_id) AS quartile
      FROM events
    )
    SELECT event_type, quartile,
           count(*) AS n,
           CAST(floor(10000 * CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE)
                / count(*)) AS BIGINT) AS avg_value_e4
    FROM ranked GROUP BY event_type, quartile
    """,
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile assignment per event type (ntile window with a
    deterministic event_id tiebreak) summarized per bucket — the
    equal-frequency binning behind feature bucketization. One shuffle on
    the partition key, per-partition sort; the bucket average uses the
    exact-decimal-sum + floor formulation (see moving_avg_7d)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    dec = F.col("value").cast("decimal(18,2)")
    return (
        ev.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(10000 * F.sum(dec).cast("double") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("avg_value_e4"),
        )
    )


# =====================================================================
# Hypertable rollup (hourly partials reaggregated to daily)
# =====================================================================

@register(
    "hypertable_rollup",
    """
    SELECT date_trunc('day', ts) AS day, event_type,
           count(*) AS n_events,
           CAST(floor(100 * CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE))
                AS BIGINT) AS sum_value_e2
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the daily aggregate is
    computed FROM the hourly partials (count-sum states re-aggregate
    losslessly), not from the raw rows — the incremental-rollup pattern
    where each coarser granularity reads the finer materialization
    instead of rescanning the 100 TB base table. The oracle aggregates
    the base table directly at day grain — identical results prove the
    partial states compose."""
    ev = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts_utc").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec).alias("_sum_v"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour").alias("day"), "event_type"
        )
        .agg(
            F.sum("_n").alias("n_events"),
            F.floor(100 * F.sum("_sum_v").cast("double"))
            .cast("bigint")
            .alias("sum_value_e2"),
        )
    )


# =====================================================================
# Interval union merge (gaps-and-islands over overlapping intervals)
# =====================================================================

@register(
    "interval_union_merge",
    """
    WITH iv AS (
      SELECT user_id, event_id, epoch_ns(ts) AS s,
             epoch_ns(ts) + (1 + event_id % 30) * 60000000000 AS e
      FROM events
    ),
    m AS (
      SELECT user_id, event_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ),
    fl AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END
               AS new_island
      FROM m
    ),
    isl AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS island
      FROM fl
    ),
    g AS (
      SELECT user_id, island, min(s) AS i_start, max(e) AS i_end
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id, count(*) AS n_islands,
           CAST(floor(sum(i_end - i_start) / 60000000000.0) AS BIGINT)
             AS covered_min,
           CAST(floor(max(i_end - i_start) / 60000000000.0) AS BIGINT)
             AS longest_min
    FROM g GROUP BY user_id
    """,
)
def interval_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user union of overlapping time intervals (gaps-and-islands):
    each event opens a deterministic (1 + event_id mod 30)-minute interval;
    overlapping/touching-by-overlap intervals merge into islands via the
    classic running-max-of-ends break detector, then per-user island
    count / covered / longest-coverage stats. This is the interval-algebra
    primitive behind utilization, on-call coverage, and downtime-merge
    queries — distinct from sessionize's point-gap sessions (intervals
    have extents; islands end only when the next start clears EVERY prior
    end, hence the cummax, not lag).

    All arithmetic is exact int64 nanoseconds (events.ts scans as raw ns
    long); the only floats are the final minute divisions, identical IEEE
    ops in both engines. Plan: one shuffle partitioning by user_id serves
    both stacked windows (same key+order), then the two grouped
    aggregations reuse that partitioning — no extra exchange.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts_ns").alias("s"),
        (F.col("ts_ns") + (1 + F.col("event_id") % 30) * F.lit(60_000_000_000)).alias(
            "e"
        ),
    )
    w_order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max = F.max("e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    )
    isl = ev.withColumn("new_island", new_island).withColumn(
        "island",
        F.sum("new_island").over(
            w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    g = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("i_start"), F.max("e").alias("i_end")
    )
    span = F.col("i_end") - F.col("i_start")
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.floor(F.sum(span) / 60_000_000_000.0).cast("bigint").alias("covered_min"),
        F.floor(F.max(span) / 60_000_000_000.0).cast("bigint").alias("longest_min"),
    )


# =====================================================================
# Per-type linear trend (regression slope over time)
# =====================================================================

@register(
    "trend_slope_by_type",
    """
    SELECT event_type, count(*) AS n,
           CAST(floor(1000000 * regr_slope(
                 "value", epoch_ns(ts) / 86400000000000.0)) AS BIGINT)
             AS slope_per_day_e6,
           CAST(floor(10000 * regr_intercept(
                 "value", epoch_ns(ts) / 86400000000000.0)) AS BIGINT)
             AS intercept_e4
    FROM events GROUP BY event_type
    """,
)
def trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of event value over time per type (slope per
    day + intercept) — the drift screen that catches a metric ramping
    before a threshold alarm would. x is exact epoch-ns scaled to days by
    one per-row double division (deterministic IEEE op), y the raw value;
    regr_slope/regr_intercept are single-pass partial-aggregable moments,
    so the whole query is one map-side-combined shuffle on event_type —
    the same plan at any scale. Spark and DuckDB share the moment
    formulas; outputs are floor-scaled like value_corr_by_type."""
    ev = t(spark, sf_dir, "events")
    x = (F.col("ts_ns") / 86400000000000.0).alias("x")
    return (
        ev.select("event_type", F.col("value").alias("y"), x)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(1000000 * F.regr_slope("y", "x"))
            .cast("bigint")
            .alias("slope_per_day_e6"),
            F.floor(10000 * F.regr_intercept("y", "x"))
            .cast("bigint")
            .alias("intercept_e4"),
        )
    )


# =====================================================================
# PSI drift bins (population stability index, per-bin terms)
# =====================================================================

@register(
    "psi_drift_bins",
    """
    WITH half AS (
      SELECT "value",
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS h
      FROM events
    ),
    edges AS (
      SELECT quantile_cont("value", [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e
      FROM half WHERE h = 0
    ),
    binned AS (
      SELECT h,
             CAST("value" > e[1] AS INT) + CAST("value" > e[2] AS INT)
           + CAST("value" > e[3] AS INT) + CAST("value" > e[4] AS INT)
           + CAST("value" > e[5] AS INT) + CAST("value" > e[6] AS INT)
           + CAST("value" > e[7] AS INT) + CAST("value" > e[8] AS INT)
           + CAST("value" > e[9] AS INT) AS bin
      FROM half CROSS JOIN edges
    ),
    counts AS (
      SELECT bin,
             count(*) FILTER (h = 0) AS n_first,
             count(*) FILTER (h = 1) AS n_second
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(n_first) AS t1, sum(n_second) AS t2 FROM counts)
    SELECT bin, n_first, n_second,
           CAST(floor(1000000 * ((n_second + 1.0) / (t2 + 10)
                                 - (n_first + 1.0) / (t1 + 10))
                * ln(((n_second + 1.0) / (t2 + 10))
                     / ((n_first + 1.0) / (t1 + 10)))) AS BIGINT)
             AS psi_term_e6
    FROM counts CROSS JOIN tot
    """,
)
def psi_drift_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift check: decile bin edges fitted on
    the first half of the month, both halves histogrammed into those
    bins, and the add-one-smoothed per-bin PSI term emitted (summing the
    terms gives the headline PSI; per-bin output keeps every float op
    per-row-deterministic — no cross-row double summation to diverge
    between engines, the same discipline as moving_avg_7d).

    Scale shape: the 9 edges are one exact-percentile aggregate on the
    reference half (Spark `percentile` ≡ DuckDB `quantile_cont`,
    both (n-1)p interpolation on doubles) broadcast to the scan; binning
    is 9 comparisons per row; the bin histogram is a 10-key grouped count
    with map-side partials — at 100 TB this is one scan plus two scalar
    broadcasts. Used as the production gate that training-data value
    distributions haven't shifted between snapshots."""
    ev = t(spark, sf_dir, "events")
    cutoff = 1705363200000000000  # 2024-01-16T00:00:00Z in epoch ns
    half = ev.select(
        "value", F.when(F.col("ts_ns") < cutoff, 0).otherwise(1).alias("h")
    )
    half = _pin(half)  # scanned for edges and again for binning
    edges = half.filter(F.col("h") == 0).agg(
        F.percentile(
            "value", F.array(*[F.lit(p / 10.0) for p in range(1, 10)])
        ).alias("e")
    )
    bin_col = sum(
        (F.col("value") > F.col("e")[i]).cast("int") for i in range(9)
    ).alias("bin")
    counts = (
        half.crossJoin(F.broadcast(edges))
        .select("h", bin_col)
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("h") == 0, 1).otherwise(0)).alias("n_first"),
            F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).alias("n_second"),
        )
    )
    tot = counts.agg(
        F.sum("n_first").alias("t1"), F.sum("n_second").alias("t2")
    )
    p1 = (F.col("n_first") + 1.0) / (F.col("t1") + 10)
    p2 = (F.col("n_second") + 1.0) / (F.col("t2") + 10)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_first",
            "n_second",
            F.floor(1000000 * (p2 - p1) * F.log(p2 / p1))
            .cast("bigint")
            .alias("psi_term_e6"),
        )
    )


# =====================================================================
# Frequent event trigrams (sequential pattern mining)
# =====================================================================

@register(
    "frequent_event_trigrams",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events WHERE event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS trigram, count(*) AS c
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT trigram, c,
           row_number() OVER (ORDER BY c DESC, trigram) AS rank
    FROM tri QUALIFY rank <= 20
    """,
)
def frequent_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-event behavioral sequences across users (lead ×2 within
    each user's (ts, event_id)-ordered stream, then a global count) — the
    sequential-pattern primitive behind funnel discovery and bot-signature
    mining, generalizing event_transition_matrix from order-1 to order-2
    context. One shuffle partitions by user for the windows, the trigram
    count is map-side-combined on a key space bounded by |types|³, and the
    top-20 is a TakeOrdered under the total (count desc, trigram) order."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    tri = (
        seq.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "trigram")
        .limit(20)
    )
    return tri.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("c"), "trigram"))
    )


# =====================================================================
# Native session windows (batch session_window — the Spark primitive
# sessionize derives by hand)
# =====================================================================

@register(
    "session_window_agg",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    isl AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM gaps
    ),
    sess AS (
      SELECT user_id, sid, count(*) AS n_events,
             epoch_us(max(ts)) - epoch_us(min(ts)) + 1800000000 AS dur_us
      FROM isl GROUP BY user_id, sid
    )
    SELECT user_id, count(*) AS n_sessions,
           max(n_events) AS max_session_events,
           CAST(floor(sum(dur_us) / 60000000.0) AS BIGINT)
             AS total_session_min
    FROM sess GROUP BY user_id
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats via Spark's NATIVE session_window (gap 30 min)
    — the built-in primitive whose semantics `sessionize` reconstructs with
    lag+cumsum. An event at EXACTLY prev + gap still merges (verified in
    tests/test_new_analytics.py) — the break is strictly `> gap`, matching
    sessionize. Duration sums are exact microsecond integers (end =
    last-event + gap); one floor at the end. Same single user_id shuffle as
    sessionize — the merging of session intervals happens inside the
    aggregate, which is how Structured Streaming maintains it incrementally
    with state."""
    ev = t(spark, sf_dir, "events")
    sess = ev.groupBy(
        "user_id",
        F.session_window(F.col("ts_utc").cast("timestamp"), "30 minutes").alias("sw"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    per = sess.select(
        "user_id",
        "n_events",
        (
            F.unix_micros(F.col("sw.end")) - F.unix_micros(F.col("sw.start"))
        ).alias("dur_us"),
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.floor(F.sum("dur_us") / 60000000.0).cast("bigint").alias(
            "total_session_min"
        ),
    )


# =====================================================================
# Sliding (hopping) time windows — each event counted in 4 overlapping
# 1-hour windows on a 15-minute grid
# =====================================================================

@register(
    "sliding_window_counts",
    """
    WITH g AS (
      SELECT make_timestamp(
               (CAST(floor(epoch_us(ts) / 900000000.0) AS BIGINT) - k.k)
               * 900000000) AS w_start,
             event_type
      FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
    )
    SELECT w_start, event_type, count(*) AS n
    FROM g GROUP BY w_start, event_type
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window counts: 1-hour windows sliding every 15 minutes
    (Spark's F.window with slideDuration — the batch twin of the streaming
    hopping aggregate). Every event lands in exactly 4 windows; Spark
    expands them map-side (Expand, narrow) and the shuffle carries
    (window, type) partial counts. The oracle states the same expansion
    arithmetically on the epoch-15-minute grid, which is exactly Spark's
    epoch-aligned window origin."""
    ev = t(spark, sf_dir, "events")
    win = ev.groupBy(
        F.window(F.col("ts_utc").cast("timestamp"), "1 hour", "15 minutes").alias("w"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    return win.select(
        F.col("w.start").alias("w_start"), "event_type", "n"
    )


# =====================================================================
# Time-to-conversion (event-sequence latency distribution)
# =====================================================================

@register(
    "multitouch_attribution",
    """
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT DISTINCT p.p_id, e.event_type AS touch_type
      FROM purchases p JOIN events e
        ON e.user_id = p.user_id
       AND e.ts < p.p_ts
       AND epoch_us(p.p_ts) - epoch_us(e.ts) <= 86400000000
      WHERE e.event_type <> 'purchase'
    ),
    per_conv AS (
      SELECT p_id, count(*) AS n_touch FROM touches GROUP BY p_id
    ),
    credits AS (
      SELECT t.touch_type, t.p_id, 1000000 // c.n_touch AS credit_e6
      FROM touches t JOIN per_conv c ON c.p_id = t.p_id
    )
    SELECT touch_type,
           CAST(sum(credit_e6) AS BIGINT) AS total_credit_e6,
           count(DISTINCT p_id) AS n_conversions
    FROM credits GROUP BY touch_type
    """,
)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase distributes one unit
    of credit equally across the DISTINCT event types that touched the
    user in the 24h before it — the marketing-analytics allocation model
    between last-touch (nth_value) and Shapley (exponential). Credit is
    integerized (1e6 // n_touches per touch) so allocation sums are exact
    across engines — attribution reports feed budget decisions, the same
    never-let-floats-decide rule as temperature_sampling_mix.

    Plan: touches come from ONE equi-join on user_id with the time window
    as a post-join filter (per-user event runs are short; the equi key
    carries the shuffle) — same shape as time_to_conversion; then two tiny
    aggregates on (purchase) and (type). Output: per touch type, total
    scaled credit and conversions influenced."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_ns").alias("p_ns"),
    )
    touches = (
        purchases.join(ev, purchases["p_user"] == ev["user_id"])
        .filter(
            (F.col("ts_ns") < F.col("p_ns"))
            & (F.col("p_ns") - F.col("ts_ns") <= 86_400_000_000_000)
            & (F.col("event_type") != "purchase")
        )
        .select("p_id", F.col("event_type").alias("touch_type"))
        .distinct()
    )
    # Optimization r12 (guide §2.4): the per-conversion touch count was a
    # second aggregate joined back — both sides re-ran the user equi-join
    # + distinct. A purchase-keyed window count computes n_touch in one
    # pass; same integers.
    credits = touches.withColumn(
        "n_touch", F.count(F.lit(1)).over(Window.partitionBy("p_id"))
    ).select(
        "touch_type", "p_id", F.expr("1000000 div n_touch").alias("credit_e6")
    )
    return credits.groupBy("touch_type").agg(
        F.sum("credit_e6").cast("bigint").alias("total_credit_e6"),
        F.count_distinct("p_id").alias("n_conversions"),
    )


@register(
    "time_to_conversion",
    """
    WITH s AS (
      SELECT user_id, min(ts) FILTER (WHERE event_type = 'signup') AS s_ts
      FROM events GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND s.s_ts IS NOT NULL
        AND e.ts >= s.s_ts
      GROUP BY e.user_id
    )
    SELECT CAST(floor((epoch_us(p.p_ts) - epoch_us(s.s_ts)) / 3600000000.0)
                AS BIGINT) AS hours_to_convert,
           count(*) AS n_users
    FROM p JOIN s ON s.user_id = p.user_id
    GROUP BY hours_to_convert
    """,
)
def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase latency histogram (hour buckets) — the
    funnel-timing companion to conversion_funnel: not just whether users
    convert but how fast. ONE user_id shuffle computes both anchors as
    conditional aggregates in the same hash aggregate; the delta is exact
    microsecond arithmetic, floored into hour buckets, then a tiny
    histogram aggregate."""
    ev = t(spark, sf_dir, "events")
    anchors = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ns"))).alias("s_ns"),
    )
    # first purchase AT OR AFTER signup needs the signup anchor first: join
    # back and re-aggregate (same key → AQE reuses the partitioning).
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(anchors.filter(F.col("s_ns").isNotNull()).select("user_id", "s_ns"),
              "user_id")
        .filter(F.col("ts_ns") >= F.col("s_ns"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("p_ns"), F.first("s_ns").alias("s_ns"))
    )
    return (
        first_purchase.select(
            F.floor((F.col("p_ns") - F.col("s_ns")) / F.lit(3600.0 * 1e9))
            .cast("bigint")
            .alias("hours_to_convert")
        )
        .groupBy("hours_to_convert")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# =====================================================================
# VariantType semi-structured ingestion (Spark 4 open variant encoding)
# =====================================================================

@register(
    "props_variant_buckets",
    """
    WITH x AS (
      SELECT CAST(props->>'$.k' AS INTEGER) // 10 AS k_bucket,
             event_type, "value"
      FROM events
    )
    SELECT k_bucket, count(*) AS n,
           count(DISTINCT event_type) AS n_types,
           CAST(floor(100 * CAST(sum(CAST("value" AS DECIMAL(18,2)))
                AS DOUBLE)) AS BIGINT) AS sum_value_e2
    FROM x GROUP BY k_bucket
    """,
)
def props_variant_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via Spark 4's VariantType: `props` is
    parsed ONCE into the open variant binary encoding (parse_json), then
    fields are extracted with variant_get — the scan-speed path for schema-
    flexible columns, superseding per-field get_json_object re-parsing
    (props_json_stats keeps the classic form for comparison). Decade
    buckets of $.k, with exact-decimal value sums. Narrow until the 10-key
    aggregate."""
    ev = t(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json("props"), "$.k", "int")
    dec = F.col("value").cast("decimal(18,2)")
    # F.floor matches DuckDB's // floor-division unconditionally, including
    # negative k (a plain cast would truncate toward zero and diverge).
    return (
        ev.select(
            F.floor(k / 10).cast("int").alias("k_bucket"), "event_type", dec.alias("v")
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("event_type").alias("n_types"),
            F.floor(100 * F.sum("v").cast("double")).cast("bigint").alias(
                "sum_value_e2"
            ),
        )
    )


# =====================================================================
# Theil-Sen robust trend (grouped-map applyInPandas — the Python-kernel
# escape hatch for per-group algorithms Catalyst can't express)
# =====================================================================

@register(
    "theil_sen_trend",
    """
    WITH ev AS (
      SELECT user_id, epoch_ns(ts) / 86400000000000.0 AS x, "value" AS y,
             event_id
      FROM events WHERE user_id < 12 AND "value" IS NOT NULL
    ),
    slopes AS (
      SELECT a.user_id, (b.y - a.y) / (b.x - a.x) AS s
      FROM ev a JOIN ev b
        ON b.user_id = a.user_id AND b.event_id > a.event_id AND b.x <> a.x
    )
    SELECT user_id, count(*) AS n_pairs,
           CAST(floor(10000 * quantile_cont(s, 0.5)) AS BIGINT)
             AS slope_per_day_e4
    FROM slopes GROUP BY user_id
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per user: the MEDIAN of all pairwise slopes
    (value delta / day delta) — the outlier-immune complement of
    trend_slope_by_type's least-squares fit (one wild spike cannot move a
    median of O(n²) slopes). Implemented as a grouped-map applyInPandas
    kernel: per-group pairwise computation over numpy is exactly the shape
    Catalyst can't express and the grouped-map API exists for — one
    shuffle on user_id, Arrow batch per group, O(n²) work bounded by the
    per-user event count (restricted to 12 users here; production caps
    pairs by windowing recent history).

    Parity: each pair slope is one IEEE division on identical doubles in
    both engines (x derives from exact epoch-ns), and the even-count
    median interpolates (a+b)/2 on identical sorted doubles — numpy's
    median ≡ DuckDB quantile_cont(0.5) bit-for-bit; the floor-e4 scaling
    then hashes stably."""
    import numpy as np
    import pandas as pd

    ev = (
        t(spark, sf_dir, "events")
        .filter((F.col("user_id") < 12) & F.col("value").isNotNull())
        .select(
            "user_id",
            (F.col("ts_ns") / F.lit(86400000000000.0)).alias("x"),
            F.col("value").alias("y"),
            "event_id",
        )
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id", kind="stable")
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        # upper-triangle pairwise slopes, skipping zero time deltas
        dx = x[None, :] - x[:, None]
        dy = y[None, :] - y[:, None]
        iu = np.triu_indices(len(x), k=1)
        dxu, dyu = dx[iu], dy[iu]
        keep = dxu != 0.0
        slopes = dyu[keep] / dxu[keep]
        if len(slopes) == 0:
            return pd.DataFrame(
                {"user_id": pdf["user_id"].iloc[:0], "n_pairs": [], "slope_per_day_e4": []}
            )
        med = float(np.median(slopes))
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_pairs": [int(len(slopes))],
                "slope_per_day_e4": [int(np.floor(10000 * med))],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        kernel, "user_id long, n_pairs long, slope_per_day_e4 long"
    )


# =====================================================================
# Week-over-week growth (lag over an aggregate — the BI report shape)
# =====================================================================

@register(
    "weekly_growth_report",
    """
    WITH weekly AS (
      SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, n,
           lag(n) OVER w AS prev_n,
           CAST(floor(10000.0 * (n - lag(n) OVER w) / lag(n) OVER w)
                AS BIGINT) AS wow_delta_e4
    FROM weekly WINDOW w AS (PARTITION BY event_type ORDER BY week)
    """,
)
def weekly_growth_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type: weekly counts with the
    previous week's count and the scaled relative delta — the lag-over-
    aggregate composition every BI report runs (and a different shape from
    the row-level lags elsewhere: here the window runs over the OUTPUT of
    an aggregate, so it costs a second tiny exchange over weeks×types
    rows, not a per-event shuffle). The delta divides two exact integers
    once — floor-e4 is engine-stable."""
    ev = t(spark, sf_dir, "events")
    # Spark keeps week as TIMESTAMP (midnight) while the oracle casts to
    # DATE: the driver's pandas comparator maps DuckDB DATE and Spark
    # TIMESTAMP both to pd.Timestamp, whereas a Spark DATE would surface as
    # datetime.date and never compare equal.
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts_utc")).alias("week")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        "week",
        "n",
        prev.alias("prev_n"),
        F.floor(10000.0 * (F.col("n") - prev) / prev).cast("bigint").alias(
            "wow_delta_e4"
        ),
    )


# =====================================================================
# Behavioral signatures (sorted set-aggregation cohorts)
# =====================================================================

@register(
    "behavior_signatures",
    """
    WITH sigs AS (
      SELECT user_id,
             array_to_string(list_sort(list(DISTINCT event_type)), '>')
               AS signature
      FROM events GROUP BY user_id
    )
    SELECT signature, count(*) AS n_users
    FROM sigs GROUP BY signature
    """,
)
def behavior_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral cohorts by event-type signature: each user's DISTINCT
    event types, sorted and joined into a canonical string, then users
    counted per signature. Set aggregation (collect_set) is
    order-nondeterministic by itself — the array_sort is what makes the
    signature reproducible (the same discipline the determinism audit
    enforces everywhere). Two small shuffles: user grouping, then the
    tiny signature histogram."""
    ev = t(spark, sf_dir, "events")
    sig = F.array_join(F.array_sort(F.collect_set("event_type")), ">")
    sigs = ev.groupBy("user_id").agg(sig.alias("signature"))
    return sigs.groupBy("signature").agg(F.count(F.lit(1)).alias("n_users"))


# =====================================================================
# Chi-square independence test (statistical data-quality gate)
# =====================================================================

@register(
    "chi_square_independence",
    """
    WITH obs AS (
      SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
    ),
    rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY lang),
    ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY source),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS total FROM obs),
    terms AS (
      SELECT obs.lang, obs.source,
             CAST(floor(1000000.0 * (obs.o - rt.r * ct.c / CAST(n.total AS DOUBLE))
                  * (obs.o - rt.r * ct.c / CAST(n.total AS DOUBLE))
                  / (rt.r * ct.c / CAST(n.total AS DOUBLE))) AS BIGINT)
               AS term_e6
      FROM obs JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
    )
    SELECT count(*) AS n_cells,
           CAST(sum(term_e6) AS BIGINT) AS chi2_e6
    FROM terms
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between document language and source —
    the statistical gate that catches a scraper suddenly feeding one
    language from one domain (distribution coupling) before it skews a
    training mix. Per-cell terms (o−e)²/e are computed from exact integer
    marginals with per-row IEEE ops, FLOORED TO INTEGERS per cell, then
    summed exactly — a float sum over cells would be accumulation-order
    nondeterministic, the trap every aggregated float in this repo
    avoids. Contingency table and marginals are three tiny aggregates;
    everything broadcasts."""
    docs = t(spark, sf_dir, "documents")
    # contingency table is ~50 cells — recompute beats a lingering cache
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("total"))
    e = F.col("r") * F.col("c") / F.col("total").cast("double")
    term = F.floor(1000000.0 * (F.col("o") - e) * (F.col("o") - e) / e).cast(
        "bigint"
    )
    return (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(term.alias("term_e6"))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("term_e6").alias("chi2_e6"),
        )
    )


# =====================================================================
# ANSI error-safe arithmetic (try_divide — NULL, not job-abort, on the
# poison rows that reach every real pipeline)
# =====================================================================

@register(
    "ansi_safe_division",
    """
    WITH x AS (
      SELECT event_type,
             "value" / nullif(CAST(props->>'$.k' AS INTEGER) - 26, 0)
               AS ratio
      FROM events
    )
    SELECT event_type,
           count(*) AS n,
           count(ratio) AS n_ok,
           count(*) - count(ratio) AS n_divzero,
           CAST(floor(100 * max(ratio)) AS BIGINT) AS max_ratio_e2
    FROM x GROUP BY event_type
    """,
)
def ansi_safe_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI mode (Spark 4 default): try_divide
    yields NULL instead of aborting the job when the denominator (here a
    props-derived divisor that hits zero on real rows) is zero — the
    per-row poison-tolerance discipline of the reference's parse-or-zero
    P2 applied to arithmetic. The report counts clean vs divide-by-zero
    rows per type; the oracle spells the same semantics with
    nullif(d, 0). max() ignores NULLs identically in both engines."""
    ev = t(spark, sf_dir, "events")
    divisor = F.get_json_object("props", "$.k").cast("int") - 26
    ratio = F.try_divide(F.col("value"), divisor)
    x = ev.select("event_type", ratio.alias("ratio"))
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("ratio").alias("n_ok"),
        (F.count(F.lit(1)) - F.count("ratio")).alias("n_divzero"),
        F.floor(100 * F.max("ratio")).cast("bigint").alias("max_ratio_e2"),
    )


# =====================================================================
# DataFrame.transpose (Spark 4 metrics-matrix pivot of an aggregate)
# =====================================================================

@register(
    "transpose_metrics",
    """
    WITH agg AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n_events,
             CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users,
             CAST(floor(100 * CAST(sum(CAST("value" AS DECIMAL(18,2)))
                  AS DOUBLE)) AS DOUBLE) AS total_e2
      FROM events GROUP BY event_type
    )
    SELECT 'n_events' AS key,
           max(CASE WHEN event_type = 'click' THEN n_events END) AS click,
           max(CASE WHEN event_type = 'error' THEN n_events END) AS error,
           max(CASE WHEN event_type = 'purchase' THEN n_events END) AS purchase,
           max(CASE WHEN event_type = 'signup' THEN n_events END) AS signup,
           max(CASE WHEN event_type = 'view' THEN n_events END) AS view
    FROM agg
    UNION ALL
    SELECT 'n_users',
           max(CASE WHEN event_type = 'click' THEN n_users END),
           max(CASE WHEN event_type = 'error' THEN n_users END),
           max(CASE WHEN event_type = 'purchase' THEN n_users END),
           max(CASE WHEN event_type = 'signup' THEN n_users END),
           max(CASE WHEN event_type = 'view' THEN n_users END)
    FROM agg
    UNION ALL
    SELECT 'total_e2',
           max(CASE WHEN event_type = 'click' THEN total_e2 END),
           max(CASE WHEN event_type = 'error' THEN total_e2 END),
           max(CASE WHEN event_type = 'purchase' THEN total_e2 END),
           max(CASE WHEN event_type = 'signup' THEN total_e2 END),
           max(CASE WHEN event_type = 'view' THEN total_e2 END)
    FROM agg
    """,
)
def transpose_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics matrix via Spark 4's DataFrame.transpose: the per-type
    aggregate flips to metrics-as-rows × types-as-columns — the
    dashboard/report orientation that previously needed hand-written
    conditional pivots (which is exactly what the oracle spells out).
    transpose coerces values to the least common type, so every metric is
    pre-cast to double; the driver's column-name-sorted compare makes the
    engine's column ordering irrelevant."""
    ev = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.count_distinct("user_id").cast("double").alias("n_users"),
        F.floor(100 * F.sum(dec).cast("double")).cast("double").alias("total_e2"),
    )
    return agg.transpose(indexColumn="event_type")


# =====================================================================
# nth_value podium (frame-positional window functions as columns)
# =====================================================================

@register(
    "nth_value_podium",
    """
    WITH ranked AS (
      SELECT c_nationkey,
             nth_value(c_name, 1) OVER w AS gold,
             nth_value(c_name, 2) OVER w AS silver,
             nth_value(c_name, 3) OVER w AS bronze,
             row_number() OVER w AS rn
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT c_nationkey, gold, silver, bronze
    FROM ranked WHERE rn = 1
    """,
)
def nth_value_podium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-3 customers as COLUMNS via nth_value over the full
    partition frame — the positional-window complement of rank_in_group's
    top-k-as-rows (a report wants the podium on one line). The frame must
    be UNBOUNDED FOLLOWING: nth_value's default frame ends at CURRENT ROW
    and would make silver/bronze NULL on the first row. One shuffle on the
    partition key; deterministic (balance, custkey) order."""
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    c = t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_nationkey",
            F.nth_value("c_name", 1).over(w).alias("gold"),
            F.nth_value("c_name", 2).over(w).alias("silver"),
            F.nth_value("c_name", 3).over(w).alias("bronze"),
            F.row_number()
            .over(
                Window.partitionBy("c_nationkey").orderBy(
                    F.desc("c_acctbal"), F.asc("c_custkey")
                )
            )
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# =====================================================================
# Fiscal-quarter calendar rollup (quarter/year calendar functions)
# =====================================================================

@register(
    "quarterly_order_report",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           count(*) AS n_orders,
           CAST(floor(100 * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE)) AS BIGINT) AS revenue_e2
    FROM orders
    GROUP BY year(o_orderdate), quarter(o_orderdate)
    """,
)
def quarterly_order_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fiscal-quarter rollup through the calendar extraction functions
    (year/quarter) — the finance-facing counterpart of the epoch-grid
    windows used elsewhere: calendar periods have irregular lengths that
    epoch arithmetic cannot bucket. Exact-decimal revenue; both engines
    share the Gregorian definitions."""
    o = t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.floor(100 * F.sum(dec).cast("double")).cast("bigint").alias("revenue_e2"),
    )


# =====================================================================
# Audience overlap matrix (set-intersection analytics between segments)
# =====================================================================

@register(
    "audience_overlap_matrix",
    """
    WITH aud AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IS NOT NULL
    ),
    sizes AS (SELECT event_type, count(*) AS n FROM aud GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_shared
      FROM aud a JOIN aud b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, n_shared,
           CAST(floor(1000000.0 * n_shared / (sa.n + sb.n - n_shared))
                AS BIGINT) AS jaccard_e6
    FROM pairs
    JOIN sizes sa ON sa.event_type = type_a
    JOIN sizes sb ON sb.event_type = type_b
    """,
)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event-type segments: distinct-user sets per
    type, pairwise shared-user counts via a self-join on user, and the set
    Jaccard — the segment-overlap matrix behind campaign planning and
    cohort-independence checks, and the USER-set analog of the document
    family's cross_source_overlap. All integers until one floor-scaled
    division. Plan: the distinct audience is one exchange; the self-join
    shuffles on user_id (uniform key); sizes broadcast back."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    # Optimization r12 (guide §2.3/§2.4): the distinct audience previously
    # fed three lineages (sizes + both self-join legs), each re-running
    # the events-wide distinct, and the pair count shuffled the audience
    # again on user_id. One user-keyed basket aggregate (sorted distinct
    # type set per user, bounded by the type vocabulary) is pinned; pair
    # counts explode in-array i<j pairs (sort order = the same binary
    # string '<' the join filter used) and sizes explode the same
    # baskets — identical shared-user and audience counts.
    bsk = (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
    )
    bsk = _pin(bsk)
    aud = bsk.select("user_id", F.explode("types").alias("event_type"))
    sizes = aud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    pair_arr = F.flatten(
        F.transform(
            F.col("types"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("types"), i + 2, F.greatest(F.size("types") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("type_a"), y.alias("type_b")),
            ),
        )
    )
    pairs = (
        bsk.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_shared",
            F.floor(
                1000000.0 * F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared"))
            )
            .cast("bigint")
            .alias("jaccard_e6"),
        )
    )


# =====================================================================
# Two-sample inference + market-basket association (classic analytics
# surfaces; reference has none — extension ops)
# =====================================================================

@register(
    "welch_ttest",
    """
    WITH q AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS v
             , event_type
      FROM events WHERE event_type IN ('click', 'purchase')
        AND "value" IS NOT NULL
    ),
    s AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN event_type = 'click' THEN v ELSE 0 END) AS BIGINT) AS s1,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN v ELSE 0 END) AS BIGINT) AS s2,
        CAST(sum(CASE WHEN event_type = 'click' THEN v * v ELSE 0 END) AS BIGINT) AS q1,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN v * v ELSE 0 END) AS BIGINT) AS q2
      FROM q
    )
    SELECT n1, n2,
           CAST(floor(10000.0 * (s1 / (100.0 * n1) - s2 / (100.0 * n2))) AS BIGINT)
             AS mean_diff_e4,
           CAST(floor(10000.0 *
             (s1 / (100.0 * n1) - s2 / (100.0 * n2))
             / sqrt(
                 ((q1 / 10000.0 - (s1 / 100.0) * (s1 / 100.0) / n1) / (n1 - 1)) / n1
               + ((q2 / 10000.0 - (s2 / 100.0) * (s2 / 100.0) / n2) / (n2 - 1)) / n2
             )) AS BIGINT) AS t_e4
    FROM s
    """,
)
def welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic between the click
    and purchase value distributions — the A/B-test primitive. Values are
    quantized to integer hundredths FIRST, so the sums and sums-of-squares
    are exact BIGINTs on both engines (no accumulation-order float noise);
    mean/variance/t are then closed-form per-row IEEE ops over those six
    integers, floored at 1e4. ONE conditional-aggregate scan — no pivot,
    no second pass, no shuffle beyond the 1-row aggregate.

    Exactness bound: the int64 sum-of-squares is exact while
    n · max(v²) < 2^63 — ~9e8 rows per arm at |value| ≤ 1000. Beyond
    that, recompute with DOUBLE sums (the statistic becomes
    double-precision) — and note DuckDB widens BIGINT sums to HUGEINT
    while Spark does not, so the twin queries diverge past the bound."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase") & F.col("value").isNotNull()
    )
    v = F.floor(F.col("value") * 100).cast("bigint")
    is1 = (F.col("event_type") == "click").cast("bigint")
    is2 = (F.col("event_type") == "purchase").cast("bigint")
    s = ev.select(
        v.alias("v"), is1.alias("i1"), is2.alias("i2")
    ).agg(
        F.sum("i1").alias("n1"),
        F.sum("i2").alias("n2"),
        F.sum(F.col("i1") * F.col("v")).alias("s1"),
        F.sum(F.col("i2") * F.col("v")).alias("s2"),
        F.sum(F.col("i1") * F.col("v") * F.col("v")).alias("q1"),
        F.sum(F.col("i2") * F.col("v") * F.col("v")).alias("q2"),
    )
    m1 = F.col("s1") / (100.0 * F.col("n1"))
    m2 = F.col("s2") / (100.0 * F.col("n2"))
    var1 = (F.col("q1") / 10000.0 - (F.col("s1") / 100.0) * (F.col("s1") / 100.0) / F.col("n1")) / (
        F.col("n1") - 1
    )
    var2 = (F.col("q2") / 10000.0 - (F.col("s2") / 100.0) * (F.col("s2") / 100.0) / F.col("n2")) / (
        F.col("n2") - 1
    )
    tstat = (m1 - m2) / F.sqrt(var1 / F.col("n1") + var2 / F.col("n2"))
    return s.select(
        "n1",
        "n2",
        F.floor(10000.0 * (m1 - m2)).cast("bigint").alias("mean_diff_e4"),
        F.floor(10000.0 * tstat).cast("bigint").alias("t_e4"),
    )


@register(
    "association_rules",
    """
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    supp AS (SELECT event_type, count(*) AS n_u FROM b GROUP BY event_type),
    tot AS (SELECT count(DISTINCT user_id) AS n_users FROM b),
    pairs AS (
      SELECT a.event_type AS type_a, c.event_type AS type_b, count(*) AS n_ab
      FROM b a JOIN b c ON a.user_id = c.user_id AND a.event_type < c.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(sa.n_u AS BIGINT) AS n_a,
           CAST(sb.n_u AS BIGINT) AS n_b,
           CAST(floor(1e4 * CAST(p.n_ab AS DOUBLE) / CAST(sa.n_u AS DOUBLE))
                AS BIGINT) AS conf_ab_e4,
           CAST(floor(1e4 * CAST(p.n_ab AS DOUBLE) / CAST(sb.n_u AS DOUBLE))
                AS BIGINT) AS conf_ba_e4,
           CAST(floor(1e4 * CAST(p.n_ab AS DOUBLE) * CAST(t.n_users AS DOUBLE)
                      / (CAST(sa.n_u AS DOUBLE) * CAST(sb.n_u AS DOUBLE)))
                AS BIGINT) AS lift_e4
    FROM pairs p
    JOIN supp sa ON p.type_a = sa.event_type
    JOIN supp sb ON p.type_b = sb.event_type
    CROSS JOIN tot t
    """,
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over user event baskets: for every
    event-type pair, co-occurrence support, both conditional confidences
    and the lift — all emitted as EXACT integers (scaled integer division
    over exact counts; no float anywhere). Baskets are distinct
    (user, type) rows; the pair join is keyed on user_id, and a user's
    basket is bounded by the type vocabulary, so the self-join emits
    O(users · types²) rows with no hot key — the Apriori support-counting
    core (Agrawal & Srikant 1994, public literature), not a cross
    product. Supports broadcast onto the pair table."""
    ev = t(spark, sf_dir, "events")
    # ONE shuffle builds the per-user basket (sorted set, bounded by the
    # type vocabulary); pairs are generated INSIDE the array with
    # higher-order functions — no basket self-join, so the second shuffle
    # is straight to the (type_a, type_b) count.
    bsk = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
    )
    # Optimization r12 (guide §2.4): the basket table feeds the support
    # count AND the pair fan-out — pinned so the events-wide user grouping
    # shuffles once instead of twice; same baskets, same counts.
    bsk = _pin(bsk)
    b = bsk.select("user_id", F.explode("types").alias("event_type"))
    supp = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_u"))
    # the oracle's basket universe includes users whose only events carry a
    # NULL type (they just never pair) — count users over ALL events
    tot = ev.agg(F.countDistinct("user_id").alias("n_users"))
    pair_arr = F.flatten(
        F.transform(
            F.col("types"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("types"), i + 2, F.greatest(F.size("types") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("type_a"), y.alias("type_b")),
            ),
        )
    )
    pairs = (
        bsk.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = supp.select(F.col("event_type").alias("type_a"), F.col("n_u").alias("n_a"))
    sb = supp.select(F.col("event_type").alias("type_b"), F.col("n_u").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            # ALL ratio math in DOUBLE with explicit casts and double
            # literals: int products overflow int64 at cluster scale, and a
            # decimal-typed literal (DuckDB parses 10000.0 as DECIMAL)
            # would round at different points than Spark's double path
            F.floor(10000.0 * F.col("n_ab").cast("double") / F.col("n_a").cast("double"))
            .cast("bigint")
            .alias("conf_ab_e4"),
            F.floor(10000.0 * F.col("n_ab").cast("double") / F.col("n_b").cast("double"))
            .cast("bigint")
            .alias("conf_ba_e4"),
            F.floor(
                10000.0 * F.col("n_ab").cast("double") * F.col("n_users").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            )
            .cast("bigint")
            .alias("lift_e4"),
        )
    )


@register(
    "k_anonymity_audit",
    """
    WITH q AS (
      SELECT event_type,
             CAST(floor("value" / 100) AS BIGINT) AS value_band,
             CAST(extract(hour FROM ts) AS INTEGER) AS hour,
             user_id
      FROM events WHERE "value" IS NOT NULL AND event_type IS NOT NULL
    ),
    g AS (
      SELECT event_type, value_band, hour, count(*) AS n
      FROM q GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below_k,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(min(n) AS BIGINT) AS min_class_size
    FROM g
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002, public literature) over the
    quasi-identifier tuple (event_type, value band, hour): how many
    equivalence classes exist, how many fall below k=5, how many rows
    those expose, and the worst class size — the release gate a privacy
    review runs before publishing event-level data. One groupBy on the
    quasi-identifier (uniform keys) + a 1-row rollup; hour comes from the
    UTC-pinned event timestamp so both engines band identically."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    g = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 100).alias("value_band"),
        F.hour("ts_utc").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return g.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0)).alias("classes_below_k"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0)).alias("rows_at_risk"),
        F.min("n").alias("min_class_size"),
    )


@register(
    "rolling_median_7d",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE "value" IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type, CAST(d AS TIMESTAMP) AS day,
           cents,
           quantile_disc(cents, 0.5) OVER (
             PARTITION BY event_type ORDER BY d
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ) AS med7_cents
    FROM daily
    """,
)
def rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling MEDIAN of daily per-type value totals — the robust
    companion to moving_avg_7d (a single spike day drags a mean but not a
    median). The median runs as percentile_approx in its exactness
    regime (accuracy 1e6 over <= 7-element frames — provably the exact
    discrete median, the same certified equivalence as
    approx_percentile_regime) so the oracle is DuckDB's quantile_disc
    window verbatim. The frame is a CALENDAR range (day-number
    rangeBetween −6..0, matching moving_avg_7d's RANGE semantics) — a
    row frame over observed days would silently span weeks for sparse
    event types with gap days. Daily totals quantize to integer cents
    before summing, making every value exact-integer. One shuffle for
    the daily aggregate; the window partitions by event_type over day
    counts — bounded frames, no global window."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts_utc")).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    daily = daily.withColumn("_day_num", day_num)
    w = (
        Window.partitionBy("event_type")
        .orderBy("_day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "cents",
        F.percentile_approx("cents", 0.5, 1_000_000).over(w).alias("med7_cents"),
    )


@register(
    "l_diversity_audit",
    """
    WITH q AS (
      SELECT event_type,
             CAST(floor("value" / 100) AS BIGINT) AS value_band,
             CAST(extract(hour FROM ts) AS INTEGER) AS hour,
             user_id
      FROM events WHERE "value" IS NOT NULL AND event_type IS NOT NULL
        AND user_id IS NOT NULL
    ),
    g AS (
      SELECT event_type, value_band, hour,
             count(*) AS n,
             count(DISTINCT user_id) AS l
      FROM q GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below_l,
           CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(min(l) AS BIGINT) AS min_diversity
    FROM g
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, public literature)
    — k-anonymity's successor check: a class can hold >= k rows and STILL
    leak if every row shares one sensitive value. Over the same
    quasi-identifier tuple as k_anonymity_audit, count DISTINCT sensitive
    values (user_id here) per equivalence class and report classes below
    l=3 plus the rows they expose. Same 1-shuffle shape as k-anonymity;
    the distinct-count adds one dedup pass keyed on the same uniform
    quasi-identifier."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    )
    g = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 100).alias("value_band"),
        F.hour("ts_utc").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("l"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0)).alias("classes_below_l"),
        F.sum(F.when(F.col("l") < 3, F.col("n")).otherwise(0)).alias("rows_at_risk"),
        F.min("l").alias("min_diversity"),
    )


@register(
    "mann_whitney_u",
    """
    WITH q AS (
      SELECT CAST(floor("value" * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
      FROM events WHERE event_type IN ('click', 'purchase')
        AND "value" IS NOT NULL
    ),
    per_v AS (
      SELECT v, CAST(sum(ia) AS BIGINT) AS a_cnt,
             CAST(sum(ib) AS BIGINT) AS b_cnt,
             CAST(count(*) AS BIGINT) AS t
      FROM q GROUP BY v
    ),
    cum AS (
      SELECT a_cnt, b_cnt, t,
             CAST(sum(t) OVER (ORDER BY v) - t AS BIGINT) AS below
      FROM per_v
    ),
    tot AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a,
                   CAST(sum(ib) AS BIGINT) AS n_b FROM q)
    SELECT tot.n_a, tot.n_b,
           CAST(sum(a_cnt * (2 * below + t + 1)) - tot.n_a * (tot.n_a + 1)
                AS BIGINT) AS u2_a,
           CAST(sum(b_cnt * (2 * below + t + 1)) - tot.n_b * (tot.n_b + 1)
                AS BIGINT) AS u2_b,
           CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
    FROM cum CROSS JOIN tot
    GROUP BY tot.n_a, tot.n_b
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between the click and
    purchase value distributions — the nonparametric location test
    completing the drift family (welch_ttest assumes normality;
    ks_two_sample measures shape; this one ranks). Values quantize to
    integer hundredths like ks_two_sample, making every quantity EXACT
    integer arithmetic: with `below` the count of smaller observations
    and t the tie-group size, twice the average midrank is
    2*below + t + 1, so 2*R_A = Σ a_cnt·(2·below+t+1) and
    u2_a = 2·R_A − n_a(n_a+1) is 2×U_A with no float anywhere; the tie
    correction Σ(t³−t) is emitted for the caller's variance formula.
    Sanity identity u2_a + u2_b = 2·n_a·n_b is pinned in pytest. The one
    ordered window runs over the quantized value DOMAIN (≤ |support|
    rows regardless of event count — same boundedness argument as
    ks_two_sample); everything else is a uniform groupBy. Integer paths
    overflow only past n ~ 3e9 rows per side, the same documented bound
    as ks."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase") & F.col("value").isNotNull()
    )
    q = ev.select(
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        (F.col("event_type") == "click").cast("bigint").alias("ia"),
        (F.col("event_type") == "purchase").cast("bigint").alias("ib"),
    )
    per_v = q.groupBy("v").agg(
        F.sum("ia").alias("a_cnt"),
        F.sum("ib").alias("b_cnt"),
        F.count(F.lit(1)).alias("t"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        "a_cnt",
        "b_cnt",
        "t",
        (F.sum("t").over(w) - F.col("t")).alias("below"),
    )
    tot = q.agg(F.sum("ia").alias("n_a"), F.sum("ib").alias("n_b"))
    rank2 = 2 * F.col("below") + F.col("t") + 1
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            (
                F.sum(F.col("a_cnt") * rank2) - F.col("n_a") * (F.col("n_a") + 1)
            )
            .cast("bigint")
            .alias("u2_a"),
            (
                F.sum(F.col("b_cnt") * rank2) - F.col("n_b") * (F.col("n_b") + 1)
            )
            .cast("bigint")
            .alias("u2_b"),
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tie_term"),
        )
    )


@register(
    "approx_percentile_regime",
    """
    SELECT event_type,
           count(*) AS n,
           quantile_disc("value", 0.25) AS q25,
           quantile_disc("value", 0.50) AS q50,
           quantile_disc("value", 0.75) AS q75,
           quantile_disc("value", 0.99) AS q99
    FROM events WHERE "value" IS NOT NULL
    GROUP BY event_type
    """,
)
def approx_percentile_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactness regime for Spark's percentile_approx (the GK/quantile-
    summary sketch): with accuracy = 10^6 the rank error ε·n = n/accuracy
    stays below one rank for any group under ~500k rows, so the sketch
    returns the EXACT discrete quantile — hash-gated here against
    DuckDB's quantile_disc. This certifies the swap docs/SCALE.md
    prescribes at 100 TB (exact percentile() → percentile_approx): the
    approximate operator users run at scale is the thing being verified,
    in a configuration provably identical to exact. No arithmetic
    touches the values (both engines return actual data elements), so
    float parity is bit-trivial. One shuffle on event_type; the sketch
    is mergeable (map-side partials)."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("value", 0.25, 1_000_000).alias("q25"),
        F.percentile_approx("value", 0.50, 1_000_000).alias("q50"),
        F.percentile_approx("value", 0.75, 1_000_000).alias("q75"),
        F.percentile_approx("value", 0.99, 1_000_000).alias("q99"),
    )


@register(
    "ks_two_sample",
    """
    WITH q AS (
      SELECT CAST(floor("value" * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
      FROM events WHERE event_type IN ('click', 'purchase')
        AND "value" IS NOT NULL
    ),
    per_v AS (
      SELECT v, sum(ia) AS a_cnt, sum(ib) AS b_cnt FROM q GROUP BY v
    ),
    cum AS (
      SELECT v,
             sum(a_cnt) OVER (ORDER BY v) AS ca,
             sum(b_cnt) OVER (ORDER BY v) AS cb
      FROM per_v
    ),
    tot AS (SELECT sum(ia) AS n, sum(ib) AS m FROM q)
    SELECT CAST(t.n AS BIGINT) AS n, CAST(t.m AS BIGINT) AS m,
           CAST(floor(1e6 * max(abs(CAST(c.ca AS DOUBLE) * CAST(t.m AS DOUBLE)
                                    - CAST(c.cb AS DOUBLE) * CAST(t.n AS DOUBLE)))
                      / (CAST(t.n AS DOUBLE) * CAST(t.m AS DOUBLE)))
                AS BIGINT) AS d_e6
    FROM cum c CROSS JOIN tot t
    GROUP BY t.n, t.m
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the click and
    purchase value distributions — the distribution-drift complement of
    psi_drift_bins. Values are quantized to integer hundredths, which
    makes the statistic EXACT integer arithmetic (D = max|i·m − j·n| over
    the merged support, divided once at the end) AND bounds the
    cumulative grid by the value DOMAIN rather than the row count — the
    one ordered window here runs over ≤ |domain| rows no matter how many
    events exist, so the plan survives scale despite being a global
    cumulative (same boundedness argument as ewma_last's 20-row frame).
    Everything before it is a uniform groupBy on the quantized value."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase") & F.col("value").isNotNull()
    )
    q = ev.select(
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        (F.col("event_type") == "click").cast("bigint").alias("ia"),
        (F.col("event_type") == "purchase").cast("bigint").alias("ib"),
    )
    per_v = q.groupBy("v").agg(F.sum("ia").alias("a_cnt"), F.sum("ib").alias("b_cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        "v",
        F.sum("a_cnt").over(w).alias("ca"),
        F.sum("b_cnt").over(w).alias("cb"),
    )
    tot = q.agg(F.sum("ia").alias("n"), F.sum("ib").alias("m"))
    # the CDF gap and its normalization run ENTIRELY in double (explicit
    # casts + double literals): bigint products ca·m overflow int64 once
    # n,m ~ 3e9, and mixed decimal/double literal typing would make the
    # two engines round at different points. Beyond 2^53 the statistic is
    # double-precision — the right semantics for a test statistic.
    d = cum.crossJoin(F.broadcast(tot)).select(
        "n",
        "m",
        F.abs(
            F.col("ca").cast("double") * F.col("m").cast("double")
            - F.col("cb").cast("double") * F.col("n").cast("double")
        ).alias("dd"),
    )
    return d.groupBy("n", "m").agg(
        F.floor(
            1000000.0 * F.max("dd")
            / (F.col("n").cast("double") * F.col("m").cast("double"))
        )
        .cast("bigint")
        .alias("d_e6"),
    )


@register(
    "mad_outliers",
    """
    WITH v AS (
      SELECT event_type, "value" FROM events WHERE "value" IS NOT NULL
    ),
    med AS (
      SELECT event_type, quantile_cont("value", 0.5) AS m
      FROM v GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, abs(v."value" - med.m) AS adev
      FROM v JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, count(*) AS n,
           CAST(floor(10000 * max(med.m)) AS BIGINT) AS median_e4,
           CAST(floor(10000 * max(mad.mad)) AS BIGINT) AS mad_e4,
           CAST(sum(CASE WHEN d.adev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad USING (event_type) JOIN med USING (event_type)
    GROUP BY d.event_type
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    outlier gate that, unlike anomaly_zscore_events, a few extreme points
    cannot corrupt (median and MAD both have 50% breakdown). Two exact
    interpolated medians (Spark `percentile` ≡ DuckDB `quantile_cont` —
    same parity argument as exact_percentiles) with the tiny per-type
    results broadcast back onto the deviations; flags |v − median| >
    3·MAD. At 100 TB the medians swap to percentile_approx with the plan
    shape unchanged."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("m")).alias("adev"), "m"
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(10000 * F.max("m")).cast("bigint").alias("median_e4"),
            F.floor(10000 * F.max("mad")).cast("bigint").alias("mad_e4"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@register("cms_frequency_estimates", None)  # xxhash64 rows: no SQL oracle
def cms_frequency_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public literature)
    over the user_id stream, with per-key frequency estimates read back
    for the 8 lowest user ids. The sketch is d=4 hash rows × w=256
    buckets built in ONE groupBy on (row, xxhash64(key, seed_row) % w) —
    a fixed-size (d·w-cell) mergeable summary no matter how many events
    stream through, the structure a 1000-executor pre-aggregation ships
    to the driver instead of a full frequency table. The estimate for a
    key is min over rows of its bucket count: always ≥ the true count,
    over by at most ε·N with ε = e/w (pytest pins both properties against
    exact counts). Rows-only at the gate (xxhash64 is engine-specific);
    the exact twin is the plain groupBy count it approximates."""
    ev = t(spark, sf_dir, "events").select("user_id")
    d, w = 4, 256
    # ONE scan: per input row, all d (row, bucket) cells via posexplode
    # (a d-way union would re-scan the source d times when uncached)
    hashed = ev.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("user_id"), F.lit(s_)), F.lit(w))
                    for s_ in range(d)
                ]
            )
        ).alias("row", "bucket")
    )
    sketch = hashed.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))
    probes = (
        ev.select("user_id").distinct().orderBy("user_id").limit(8)
    )
    probe_cells = probes.crossJoin(F.broadcast(spark.range(d).withColumnRenamed("id", "row")))
    probe_cells = probe_cells.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("user_id"), F.col("row").cast("int")), F.lit(w))
    )
    est = (
        probe_cells.join(sketch, ["row", "bucket"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_estimate"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        est.join(exact, "user_id")
        .select("user_id", "true_count", "cms_estimate")
        .orderBy("user_id")
    )


@register(
    "cms_exact_regime",
    """
    SELECT abs(user_id) % 61 AS key61,
           count(*) AS true_count,
           count(*) AS cms_estimate
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1
    """,
)
def cms_exact_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch run in its exactness regime, hash-gated against the
    plain groupBy oracle. Keys are folded to abs(user_id) % 61 (domain
    0..60) and each of the d=4 rows buckets by key*(s+1) mod 61 — 61 is
    prime and s+1 ∈ {1..4} is coprime to it, so every row's bucket map is
    injective on the key domain: zero collisions, and min-over-rows is
    provably the exact count. The SAME sketch pipeline as
    cms_frequency_estimates (posexplode to (row, bucket) cells, one
    groupBy, min-over-rows probe join) executes end to end; only the hash
    family differs, so a hash match certifies the CMS machinery itself —
    complementing the xxhash64 form whose estimates are rows-only by
    design with pytest ε·N bounds."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(F.pmod(F.abs(F.col("user_id")), F.lit(61)).alias("key61"))
    )
    d, w = 4, 61
    hashed = ev.select(
        F.col("key61"),
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.col("key61") * F.lit(s_ + 1), F.lit(w))
                    for s_ in range(d)
                ]
            )
        ).alias("row", "bucket"),
    ).select("row", "bucket")
    sketch = hashed.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))
    probes = ev.select("key61").distinct()
    probe_cells = probes.crossJoin(
        F.broadcast(spark.range(d).withColumnRenamed("id", "row"))
    ).withColumn(
        "bucket", F.pmod(F.col("key61") * (F.col("row") + 1), F.lit(w))
    )
    est = (
        probe_cells.join(sketch, ["row", "bucket"], "left")
        .groupBy("key61")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_estimate"))
    )
    exact = ev.groupBy("key61").agg(F.count(F.lit(1)).alias("true_count"))
    return est.join(exact, "key61").select("key61", "true_count", "cms_estimate")


@register(
    "benford_digit_audit",
    """
    WITH x AS (
      SELECT CAST(floor(abs("value") * 100) AS BIGINT) AS iv
      FROM events WHERE "value" IS NOT NULL AND abs("value") * 100 >= 1
    ),
    d AS (
      SELECT CAST(substr(CAST(iv AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM x
    ),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT sum(n) AS total FROM c)
    SELECT c.digit, CAST(c.n AS BIGINT) AS n,
           CAST(floor(1e6 * CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE))
                AS BIGINT) AS observed_e6,
           CAST(floor(1e6 * log10(1.0 + 1.0 / c.digit)) AS BIGINT) AS benford_e6
    FROM c CROSS JOIN tot t
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit (Newcomb 1881 / Benford
    1938, public literature) over the value column — the classic
    fabricated-data smoke test: naturally-arising magnitudes follow
    P(d) = log10(1 + 1/d), while invented or truncated numbers don't.
    The first digit comes from the integer's decimal string (identical
    on both engines, no float log in the extraction); observed and
    expected frequencies emit as floored parts-per-million with all
    ratio math in DOUBLE. One groupBy on the 9-value digit key + a
    broadcast 1-row total. (The synthetic fixture's uniform-ish values
    will NOT follow Benford — the query reports the divergence, which
    is exactly its job.)"""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.abs(F.col("value")) * 100 >= 1)
    )
    x = ev.select(
        F.floor(F.abs(F.col("value")) * 100).cast("bigint").alias("iv")
    )
    d = x.select(
        F.substring(F.col("iv").cast("string"), 1, 1).cast("int").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.floor(1000000.0 * F.col("n").cast("double") / F.col("total").cast("double"))
        .cast("bigint")
        .alias("observed_e6"),
        F.floor(1000000.0 * F.log10(1.0 + 1.0 / F.col("digit")))
        .cast("bigint")
        .alias("benford_e6"),
    )


@register(
    "value_concentration_gini",
    """
    WITH q AS (
      SELECT event_type, CAST(floor("value" * 100) AS BIGINT) AS v
      FROM events WHERE "value" IS NOT NULL AND "value" >= 0
    ),
    g AS (SELECT event_type, v, count(*) AS c FROM q GROUP BY event_type, v),
    cum AS (
      SELECT event_type, v, c,
             coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY v
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS base
      FROM g
    ),
    agg AS (
      SELECT event_type,
             sum(c) AS n, sum(v * c) AS s,
             sum(v * (c * base + (c * (c + 1)) // 2)) AS t
      FROM cum GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN s = 0 THEN 0 ELSE
             floor(1e6 * (2.0 * CAST(t AS DOUBLE)
                          / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                          - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)))
           END AS BIGINT) AS gini_e6
    FROM agg
    """,
)
def value_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the value distribution per event type — the
    concentration/inequality readout (0 = uniform, →1 = one row carries
    everything) a traffic or revenue review runs. Exact: values quantize
    to integer hundredths, ties group on the bounded value DOMAIN (the
    same scale trick as ks_two_sample — the one ordered window runs over
    ≤ |domain| rows regardless of row count), and the rank-weighted sum
    for a tie group of c copies of v starting at cumulative base is the
    closed form v·(c·base + c(c+1) div 2) — integer arithmetic end to
    end (integer div, not float, for the triangular term), the final
    ratio in DOUBLE (explicit casts both engines), and all-zero groups
    emit gini 0 (perfect equality) instead of 0/0.

    Exactness bound: the rank-weighted int64 accumulator t ~ v·n² per
    group is exact while it stays under 2^63 (≈3e6 rows per type at
    v ≤ 1e6); beyond that ANSI Spark fails loudly while DuckDB widens
    to HUGEINT — recompute with double sums (order noise returns) or
    coarser value buckets at that scale."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    q = ev.select(
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("v")
    )
    g = q.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = g.withColumn("base", F.coalesce(F.sum("c").over(w), F.lit(0)))
    agg = cum.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("v") * F.col("c")).alias("s"),
        # (c*(c+1)) div 2 — INTEGER division; float `/` loses exactness
        # past 2^53 and would hash-diverge from DuckDB's `//`
        F.sum(F.expr("v * (c * base + (c * (c + 1)) div 2)")).alias("t"),
    )
    return agg.select(
        "event_type",
        "n",
        F.when(F.col("s") == 0, F.lit(0))
        .otherwise(
            F.floor(
                1000000.0
                * (
                    2.0 * F.col("t").cast("double")
                    / (F.col("n").cast("double") * F.col("s").cast("double"))
                    - (F.col("n").cast("double") + 1.0) / F.col("n").cast("double")
                )
            )
        )
        .cast("bigint")
        .alias("gini_e6"),
    )


@register(
    "skewed_agg_salted",
    """
    SELECT CASE WHEN abs(user_id) % 10 < 9 THEN 'hot'
                ELSE 'cold-' || CAST(user_id AS VARCHAR) END AS bucket,
           count(*) AS n_events,
           CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(max(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS max_cents,
           CAST(min(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS min_cents
    FROM events WHERE user_id IS NOT NULL AND "value" IS NOT NULL
    GROUP BY 1
    """,
)
def skewed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a deliberately hot key: 90% of
    rows share one bucket ('hot'), the shape that funnels a plain groupBy
    into a single reducer at 100 TB. operators/skew.two_phase_agg splits
    the hot key across 32 salt sub-keys for the partial aggregate, then
    re-aggregates ≤ 32 partials per key — both shuffles uniform. Salting
    is provably result-invariant for decomposable aggregates, so the
    oracle is the PLAIN single-phase GROUP BY: a hash match certifies the
    equivalence, not just the plumbing. Values quantize to integer cents
    BEFORE summing (exact integer arithmetic — no float summation-order
    noise between the salted and plain forms or between engines)."""
    from storm_data_etl_spark.operators.skew import two_phase_agg

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select(
            # abs() % matches the SQL twin for NEGATIVE ids too (Spark pmod
            # vs SQL % disagree below zero — the repo convention is abs()
            # on both sides, as in cms_exact_regime / bloom_exact_regime).
            F.when(F.pmod(F.abs(F.col("user_id")), F.lit(10)) < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("cold-"), F.col("user_id").cast("string")))
            .alias("bucket"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            F.col("event_id"),
        )
    )
    return two_phase_agg(
        ev,
        ["bucket"],
        {
            "n_events": ("count", "cents"),
            "sum_cents": ("sum", "cents"),
            "max_cents": ("max", "cents"),
            "min_cents": ("min", "cents"),
        },
        buckets=32,
        salt_from="event_id",
    )


# =====================================================================
# Time-series diagnostics: autocorrelation + weekday seasonality
# =====================================================================

@register(
    "acf_lag_profile",
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
             count(*) AS cnt
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.day_num - b.day_num AS lag,
             a.cnt AS x, b.cnt AS y
      FROM daily a JOIN daily b
        ON a.day_num - b.day_num BETWEEN 1 AND 7
    ),
    s AS (
      SELECT lag, count(*) AS n_pairs,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT lag, n_pairs, sx, sy, sxy,
           CASE WHEN n_pairs * sxx - sx * sx > 0
                 AND n_pairs * syy - sy * sy > 0
                THEN CAST(floor(
                       10000.0 * (n_pairs * sxy - sx * sy)
                       / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                              * CAST(n_pairs * syy - sy * sy AS DOUBLE))
                     ) AS BIGINT)
           END AS acf_e4
    FROM s
    """,
)
def acf_lag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged autocorrelation profile of the daily event-count series
    (lags 1-7): the diagnostic that picks seasonality periods and
    change-detection windows for a telemetry stream. Per lag, the Pearson
    correlation of (count_t, count_{t-lag}) pairs — carried as EXACT
    integer sums (counts are integers; n*sxy - sx*sy is exact), with one
    floor on an identical IEEE sqrt/division at emission. The exact
    integer sums are emitted alongside so the correlation is auditable.

    Scale shape: the raw scan collapses to one row per DAY in the first
    map-side-partial agg (a 100 TB stream is still ~3650 rows/decade), so
    the lag self-join runs on a trivially broadcastable aggregate —
    calendar-exact on day numbers (a day gap shrinks n_pairs rather than
    silently pairing non-adjacent days, which a row-offset lag() would).
    No window over the raw table exists. Extends the A1 family
    (cmd/genmock/main.go:204-215) to temporal diagnostics."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts_utc"), F.lit("1970-01-01")).alias("day_num")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a = daily.select(F.col("day_num").alias("a_day"), F.col("cnt").alias("x"))
    b = daily.select(F.col("day_num").alias("b_day"), F.col("cnt").alias("y"))
    pairs = a.join(
        F.broadcast(b), (F.col("a_day") - F.col("b_day")).between(1, 7)
    ).select((F.col("a_day") - F.col("b_day")).alias("lag"), "x", "y")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "lag",
        "n_pairs",
        "sx",
        "sy",
        "sxy",
        # guard as two comparisons, not vx*vy > 0: the int64 product
        # overflows at ~1e6 events/day even though each factor fits
        F.when(
            (vx > 0) & (vy > 0),
            F.floor(
                10000.0 * cov / F.sqrt(vx.cast("double") * vy.cast("double"))
            ).cast("bigint"),
        ).alias("acf_e4"),
    )


@register(
    "weekday_seasonality_index",
    """
    WITH ev AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
      FROM events
    ),
    wd AS (
      SELECT (day_num + 4) % 7 AS weekday,
             count(*) AS n_events,
             count(DISTINCT day_num) AS n_days
      FROM ev GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_events) AS BIGINT) AS total_events,
             CAST(sum(n_days) AS BIGINT) AS total_days
      FROM wd
    )
    SELECT weekday,
           CASE weekday WHEN 0 THEN 'sun' WHEN 1 THEN 'mon' WHEN 2 THEN 'tue'
                        WHEN 3 THEN 'wed' WHEN 4 THEN 'thu' WHEN 5 THEN 'fri'
                        ELSE 'sat' END AS weekday_name,
           n_events, n_days,
           CAST(floor(100 * n_events / n_days) AS BIGINT) AS mean_daily_e2,
           CAST(floor(10000 * (n_events * total_days)
                      / (n_days * total_events)) AS BIGINT) AS index_e4
    FROM wd, tot
    """,
)
def weekday_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index: each weekday's mean daily event count
    relative to the overall mean (10000 = flat). Weekday derives from pure
    epoch-day arithmetic ((days_since_1970 + 4) % 7, 1970-01-01 being a
    Thursday) — no engine-specific DOW convention can diverge. The index
    is exact integer arithmetic end to end: floor(1e4 * n_events *
    total_days / (n_days * total_events)) on BIGINTs.

    Scale shape: one map-side-partial agg to at most 7 rows (the distinct
    day count per weekday is a tiny exact distinct within each group),
    then a 1-row broadcast total. Nothing global-sorted, nothing
    collected."""
    ev = t(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts_utc"), F.lit("1970-01-01")).alias("day_num")
    )
    wd = ev.groupBy(((F.col("day_num") + 4) % 7).alias("weekday")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("day_num").alias("n_days"),
    )
    tot = wd.agg(
        F.sum("n_events").cast("bigint").alias("total_events"),
        F.sum("n_days").cast("bigint").alias("total_days"),
    )
    name = (
        F.when(F.col("weekday") == 0, "sun")
        .when(F.col("weekday") == 1, "mon")
        .when(F.col("weekday") == 2, "tue")
        .when(F.col("weekday") == 3, "wed")
        .when(F.col("weekday") == 4, "thu")
        .when(F.col("weekday") == 5, "fri")
        .otherwise("sat")
    )
    return wd.crossJoin(F.broadcast(tot)).select(
        "weekday",
        name.alias("weekday_name"),
        "n_events",
        "n_days",
        F.floor(100 * F.col("n_events") / F.col("n_days"))
        .cast("bigint")
        .alias("mean_daily_e2"),
        F.floor(
            10000
            * (F.col("n_events") * F.col("total_days"))
            / (F.col("n_days") * F.col("total_events"))
        )
        .cast("bigint")
        .alias("index_e4"),
    )


@register(
    "watermark_lag_histogram",
    """
    WITH arr AS (
      SELECT user_id, event_id, epoch_us(ts) * 1000 AS ts_ns,
             epoch_us(ts) * 1000
               + (((((event_id % 2147483648) * 1103515245 + 12345)
                    % 2147483648) % 7200000)) * 1000000 AS arrival_ns
      FROM events
    ),
    late AS (
      SELECT greatest(0,
               coalesce(max(ts_ns) OVER (PARTITION BY user_id
                                         ORDER BY arrival_ns, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), ts_ns)
               - ts_ns) AS lateness_ns
      FROM arr
    ),
    banded AS (
      SELECT CASE WHEN lateness_ns = 0 THEN 'in_order'
                  WHEN lateness_ns <= 1000000000 THEN 'le_1s'
                  WHEN lateness_ns <= 10000000000 THEN 'le_10s'
                  WHEN lateness_ns <= 60000000000 THEN 'le_1min'
                  WHEN lateness_ns <= 600000000000 THEN 'le_10min'
                  ELSE 'gt_10min' END AS band,
             lateness_ns
      FROM late
    )
    SELECT band, count(*) AS n_events,
           CAST(max(lateness_ns) AS BIGINT) AS max_lateness_ns
    FROM banded GROUP BY band
    """,
)
def watermark_lag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder audit — the measurement that picks a Structured
    Streaming watermark delay: each event's ARRIVAL time is its event
    time plus a deterministic LCG transport jitter (0-2 h — the shared
    LCG, so both engines rebuild the same arrival log), and its lateness
    is how far its event time sits behind the maximum event time that
    already arrived on its key (running max over ROWS ... 1 PRECEDING, so
    an event is never late against itself).
    The lateness distribution is banded into the operational buckets
    (in-order / ≤1s / ≤10s / ≤1min / ≤10min / beyond) with the per-band
    max — 'withWatermark("ts", X)' drops exactly the mass in bands above
    X, so this histogram IS the data-loss-vs-latency tradeoff curve.

    Scale shape: one shuffle on user_id for the running-max window
    (keyed, as the stream itself would be — never a global arrival
    order), then a 6-row banded aggregate of map-side partials. Exact
    int64 nanosecond arithmetic end to end. Complements the streaming
    family (streaming/stateful.py dedup-in-watermark) with the batch
    audit that calibrates it."""
    ev = t(spark, sf_dir, "events").withColumn(
        "arrival_ns",
        F.col("ts_ns")
        + F.pmod(SP.lcg_value("event_id"), F.lit(7_200_000)) * F.lit(1_000_000),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = ev.select(
        F.greatest(
            F.lit(0),
            F.coalesce(F.max("ts_ns").over(w), F.col("ts_ns")) - F.col("ts_ns"),
        ).alias("lateness_ns")
    )
    ns = F.col("lateness_ns")
    band = (
        F.when(ns == 0, "in_order")
        .when(ns <= 1_000_000_000, "le_1s")
        .when(ns <= 10_000_000_000, "le_10s")
        .when(ns <= 60_000_000_000, "le_1min")
        .when(ns <= 600_000_000_000, "le_10min")
        .otherwise("gt_10min")
    )
    return late.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("lateness_ns").cast("bigint").alias("max_lateness_ns"),
    )


@register(
    "spearman_quality_length",
    """
    WITH q AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN length(coalesce(text, '')) = 0 THEN 0
                  ELSE length(regexp_replace(text, '[a-zA-Z0-9_\\s]', '', 'g'))
             END AS punct
      FROM documents
    ),
    ranked AS (
      SELECT source,
             2 * (rank() OVER (PARTITION BY source ORDER BY n_chars) - 1)
               + count(*) OVER (PARTITION BY source, n_chars) + 1 AS x,
             2 * (rank() OVER (PARTITION BY source ORDER BY punct) - 1)
               + count(*) OVER (PARTITION BY source, punct) + 1 AS y
      FROM q
    ),
    moments AS (
      SELECT source, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM ranked GROUP BY source
    )
    SELECT source, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(floor(
                       10000.0 * (n * sxy - sx * sy)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE))
                     ) AS BIGINT)
           END AS spearman_e4
    FROM moments
    """,
)
def spearman_quality_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between document length and punctuation
    mass, per source — the tie-robust monotone-association check a
    curation team runs before trusting a heuristic signal (Pearson on
    raw values is outlier-dominated; rank correlation is not). Ranks are
    EXACT doubled midranks (2·(min_rank−1) + tie_count + 1, the
    Mann-Whitney integer trick), so all five moment sums are exact
    int64 and the one floor runs on an identical IEEE quotient — the
    ACF/Welch float-parity regime.

    Scale shape: the rank windows partition by source (keyed shuffle,
    never global); moments are map-side-partial. Overflow bound:
    n·Σxy ≤ 4n⁴ must fit int64 → safe to ~38k docs per source; beyond
    that cast the moment sums to DECIMAL(38,0) on both engines (the
    oracle's HUGEINT already has no limit)."""
    q = t(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.when(F.length(F.coalesce(F.col("text"), F.lit(""))) == 0, 0)
        .otherwise(
            F.length(F.regexp_replace("text", r"[a-zA-Z0-9_\s]", ""))
        )
        .alias("punct"),
    )

    def midrank2(col: str):
        r = F.rank().over(Window.partitionBy("source").orderBy(col))
        tie = F.count(F.lit(1)).over(Window.partitionBy("source", col))
        return 2 * (r - 1) + tie + 1

    ranked = q.select(
        "source",
        midrank2("n_chars").cast("long").alias("x"),
        midrank2("punct").cast("long").alias("y"),
    )
    m = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "source",
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            F.floor(
                10000.0 * cov / F.sqrt(vx.cast("double") * vy.cast("double"))
            ).cast("bigint"),
        ).alias("spearman_e4"),
    )


@register(
    "misra_gries_heavy_hitters",
    """
    WITH s AS (
      SELECT user_id % 199 AS hh_key FROM events WHERE user_id IS NOT NULL
    ),
    tot AS (SELECT count(*) AS n_stream FROM s)
    SELECT hh_key,
           count(*) AS est_count,
           (SELECT n_stream FROM tot) AS n_stream,
           CAST((SELECT n_stream FROM tot) // 257 AS BIGINT) AS max_undercount
    FROM s GROUP BY hh_key
    """,
)
def misra_gries_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters (Misra & Gries 1982) in the MERGEABLE
    form of Agarwal et al. (PODS 2012 §3.1), run in its EXACTNESS regime
    and hash-gated against the plain GROUP BY oracle. The distributed
    formulation is fully declarative — no per-row imperative loop: an
    MG(k) summary of a partition equals its exact counts minus the
    (k+1)-th largest count (zero-clipped), and merging summaries is a
    pointwise sum followed by the same trim. Here the key domain
    (user_id mod 199) is strictly smaller than the capacity k = 256, so
    every (k+1)-th-largest threshold is provably absent → both trims
    subtract zero → the summary IS the exact count table: the gate
    certifies the per-partition summarize, the merge, and the final trim
    arithmetic end to end. The estimate regime (capacity < distinct) is
    pinned in pytest on a skewed stream against the n/(k+1) undercount
    guarantee, which the output carries per row (max_undercount).

    Scale shape: one narrow pass stamps partition ids; per-partition
    counts are a map-side-combinable aggregate; thresholds come from a
    pid-keyed window (parallel); the merged summary is ≤ #partitions × k
    rows BY CONSTRUCTION, so the final trim's unkeyed window is a
    single task over a provably bounded set — never over the stream."""
    from storm_data_etl_spark.operators.heavy_hitters import misra_gries_summary

    s = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        # truncated %, not pmod: matches DuckDB's % for negative ids
        .select((F.col("user_id") % 199).alias("hh_key"))
    )
    summary = misra_gries_summary(s, "hh_key", k=256)
    n_stream = s.agg(F.count(F.lit(1)).alias("n_stream"))
    return summary.crossJoin(F.broadcast(n_stream)).select(
        "hh_key",
        "est_count",
        F.col("n_stream").cast("bigint").alias("n_stream"),
        F.expr("n_stream div 257").cast("bigint").alias("max_undercount"),
    )


@register(
    "kruskal_wallis_h",
    """
    WITH q AS (
      SELECT CAST(floor("value" * 100) AS BIGINT) AS v, event_type
      FROM events WHERE "value" IS NOT NULL
    ),
    per_vg AS (
      SELECT v, event_type, CAST(count(*) AS BIGINT) AS c
      FROM q GROUP BY v, event_type
    ),
    per_v AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM q GROUP BY v),
    cum AS (
      SELECT v, t, CAST(sum(t) OVER (ORDER BY v) - t AS BIGINT) AS below
      FROM per_v
    ),
    groups AS (
      SELECT g.event_type,
             CAST(sum(g.c) AS BIGINT) AS n_j,
             CAST(sum(g.c * (2 * cum.below + cum.t + 1)) AS BIGINT) AS s2_j
      FROM per_vg g JOIN cum USING (v)
      GROUP BY g.event_type
    ),
    qsum AS (
      SELECT CAST(sum((CAST(3000000 AS HUGEINT) * s2_j * s2_j) // n_j)
                  AS HUGEINT) AS qs,
             CAST(sum(n_j) AS BIGINT) AS n_total,
             count(*) AS k_groups
      FROM groups
    ),
    ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_term FROM cum)
    SELECT n_total, k_groups,
           CAST(qs // (CAST(n_total AS HUGEINT) * (n_total + 1))
                - 3000000 * (n_total + 1) AS BIGINT) AS h_e6,
           tie_term
    FROM qsum, ties
    """,
)
def kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (1952) across ALL event-type groups — the k-group
    extension of mann_whitney_u, completing the nonparametric battery
    (two-group ranks / two-group shape / k-group ranks). Same exact
    integer construction: values quantize to hundredths, doubled midranks
    come from the tie-group prefix (2·below + t + 1), and per group
    S2_j = 2·R_j, so

        H = 3·Σ S2_j²/n_j / (N(N+1)) − 3(N+1)

    (S2_j = 2·R_j folds the classic 12/(N(N+1))·ΣR²/n constant's /4 into
    the 3× factor)

    h_e6 is computed as nested exact floors — (3e6·S2_j²) // n_j per
    group (DuckDB HUGEINT; Spark's decimal (x − x%y)/y exact floor-div,
    since `div` would overflow long), then // 4N(N+1) — identical on
    both engines, zero float ops. The tie term Σ(t³−t) is emitted for
    the caller's correction factor, as in mann_whitney_u. Width bound:
    3e6·S2² < 1e38 holds to N ≈ 5e7 observations — past that a rank
    test's p-value has long since saturated and the right move is
    subsampling, not wider integers (documented, not silent).

    Scale shape: the ordered window runs over the quantized value DOMAIN
    (bounded support, the ks/mann-whitney argument), never the stream;
    everything else is map-side-combinable aggregates and a k-row
    combine."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = ev.select(
        F.floor(F.col("value") * 100).cast("bigint").alias("v"), "event_type"
    )
    # Optimization r12 (guide §2.4): the per-value tie table is a
    # re-aggregate of the (value, group) counts — previously both scanned
    # the stream. The (value, group) table is pinned (bounded by the
    # quantized value domain × k groups) and everything downstream reads
    # it; identical integers.
    per_vg = q.groupBy("v", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_vg = _pin(per_vg)
    per_v = per_vg.groupBy("v").agg(F.sum("c").cast("bigint").alias("t"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        "v", "t", (F.sum("t").over(w) - F.col("t")).alias("below")
    )
    rank2 = 2 * F.col("below") + F.col("t") + 1
    groups = (
        per_vg.join(cum, "v")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_j"),
            F.sum(F.col("c") * rank2).cast("bigint").alias("s2_j"),
        )
    )
    qsum = groups.select(
        F.expr(
            "CAST(3000000 AS DECIMAL(38,0)) * s2_j * s2_j"
        ).alias("num"),
        "n_j",
    ).agg(
        F.sum(
            F.expr(
                "CAST((num - num % CAST(n_j AS DECIMAL(38,0)))"
                " / CAST(n_j AS DECIMAL(38,0)) AS DECIMAL(38,0))"
            )
        ).alias("qs"),
        F.sum("n_j").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).alias("k_groups"),
    )
    ties = cum.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_term")
    )
    return (
        qsum.crossJoin(F.broadcast(ties))
        .withColumn(
            "den",
            F.expr(
                "CAST(n_total AS DECIMAL(38,0))"
                " * (CAST(n_total AS DECIMAL(38,0)) + 1)"
            ),
        )
        .select(
            "n_total",
            "k_groups",
            F.expr(
                "CAST((qs - qs % den) / den AS DECIMAL(38,0))"
                " - 3000000 * (CAST(n_total AS DECIMAL(38,0)) + 1)"
            )
            .cast("bigint")
            .alias("h_e6"),
            "tie_term",
        )
    )


@register(
    "anova_oneway_f",
    """
    WITH q AS (
      SELECT event_type, CAST(floor("value" * 100) AS BIGINT) AS x
      FROM events WHERE "value" IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_j,
             CAST(sum(x) AS BIGINT) AS s_j,
             CAST(sum(x * x) AS HUGEINT) AS x2_j
      FROM q GROUP BY event_type
    ),
    nt AS (
      SELECT CAST(sum(n_j) AS BIGINT) AS n,
             CAST(sum(s_j) AS HUGEINT) AS s,
             CAST(sum(x2_j) AS HUGEINT) AS x2,
             count(*) AS k
      FROM g
    ),
    av AS (
      SELECT CAST(sum((CAST(nt.n AS HUGEINT) * g.s_j * g.s_j) // g.n_j)
                  AS HUGEINT) AS a
      FROM g, nt
    )
    SELECT n, k,
           CAST((CAST(1000000 AS HUGEINT) * (a - s * s) * (n - k))
                // ((CAST(n AS HUGEINT) * x2 - a) * (k - 1)) AS BIGINT)
             AS f_e6,
           CAST((a - s * s) // n AS BIGINT) AS ss_between,
           CAST((CAST(n AS HUGEINT) * x2 - a) // n AS BIGINT) AS ss_within
    FROM nt, av
    """,
)
def anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across all event-type groups — the parametric
    companion to kruskal_wallis_h, completing the battery (Welch's t is
    two-group; this is the k-group equal-variance F). Scaled through by
    N so every quantity is integer: N·SSB = Σ N·S_j²/n_j − S² and
    N·SSW = N·ΣX² − Σ N·S_j²/n_j share the single per-group floor
    A = Σ ⌊N·S_j²/n_j⌋, computed as DuckDB HUGEINT // and Spark's
    decimal (x − x%y)/y exact floor-division; F_e6 is one wide division
    of the two. ss_between / ss_within are emitted (integer-scaled) for
    the caller's effect-size math. Width bound: 1e6·N·S²·N < 1e38 holds
    to N ≈ 5e7 hundredths-quantized observations — same documented
    envelope and rationale as kruskal_wallis_h (a mean test on more
    samples than that has saturated long before the integers do).

    Scale shape: one map-side-combinable group aggregate (k rows), one
    k-row combine. No windows, no sorts, no floats."""
    q = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("x"),
        )
    )
    g = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.sum("x").cast("bigint").alias("s_j"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("x2_j"),
    )
    n_tot = g.agg(F.sum("n_j").cast("bigint").alias("n"))
    joined = g.crossJoin(F.broadcast(n_tot))
    per = joined.select(
        "n",
        "n_j",
        "s_j",
        "x2_j",
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * s_j * s_j) AS DECIMAL(38,0))"
        ).alias("num"),
    ).select(
        "n",
        "n_j",
        "s_j",
        "x2_j",
        F.expr(
            "CAST((num - num % CAST(n_j AS DECIMAL(38,0)))"
            " / CAST(n_j AS DECIMAL(38,0)) AS DECIMAL(38,0))"
        ).alias("q_j"),
    )
    tot = per.groupBy("n").agg(
        F.sum("s_j").cast("decimal(38,0)").alias("s"),
        F.sum("x2_j").cast("decimal(38,0)").alias("x2"),
        F.count(F.lit(1)).alias("k"),
        F.sum("q_j").alias("a"),
    )
    return tot.withColumn(
        "num", F.expr("CAST(1000000 AS DECIMAL(38,0)) * (a - s * s) * (n - k)")
    ).withColumn(
        "den", F.expr("(CAST(n AS DECIMAL(38,0)) * x2 - a) * (k - 1)")
    ).select(
        "n",
        "k",
        F.expr("CAST((num - num % den) / den AS DECIMAL(38,0))")
        .cast("bigint")
        .alias("f_e6"),
        F.expr(
            "CAST(((a - s * s) - (a - s * s) % CAST(n AS DECIMAL(38,0)))"
            " / CAST(n AS DECIMAL(38,0)) AS DECIMAL(38,0))"
        )
        .cast("bigint")
        .alias("ss_between"),
        F.expr(
            "CAST(((CAST(n AS DECIMAL(38,0)) * x2 - a)"
            " - (CAST(n AS DECIMAL(38,0)) * x2 - a) % CAST(n AS DECIMAL(38,0)))"
            " / CAST(n AS DECIMAL(38,0)) AS DECIMAL(38,0))"
        )
        .cast("bigint")
        .alias("ss_within"),
    )


@register(
    "poisson_bootstrap_means",
    f"""
    WITH q AS (
      SELECT event_id, CAST(floor("value" * 100) AS BIGINT) AS x
      FROM events WHERE "value" IS NOT NULL
    ),
    reps AS (
      SELECT b.b AS rep, q.x,
             {SP.lcg_bucket_sql('q.event_id * 64 + b.b', 10000)} AS u
      FROM q, unnest(range(0, 32)) AS b(b)
    ),
    weighted AS (
      SELECT rep, x,
             CASE WHEN u < 3678 THEN 0 WHEN u < 7357 THEN 1
                  WHEN u < 9196 THEN 2 WHEN u < 9810 THEN 3
                  WHEN u < 9963 THEN 4 WHEN u < 9994 THEN 5
                  ELSE 6 END AS w
      FROM reps
    ),
    means AS (
      SELECT rep,
             CAST(sum(w) AS BIGINT) AS n_eff,
             CAST((1000000 * sum(w * x)) // sum(w) AS BIGINT) AS rep_mean_e6
      FROM weighted GROUP BY rep
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY rep_mean_e6, rep) AS rnk
      FROM means
    )
    SELECT rep, n_eff, rep_mean_e6,
           (SELECT rep_mean_e6 FROM ranked WHERE rnk = 2) AS boot_lo_e6,
           (SELECT rep_mean_e6 FROM ranked WHERE rnk = 31) AS boot_hi_e6
    FROM means
    """,
)
def poisson_bootstrap_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    for massive data streams"; Hanley & MacGibbon 2006) — THE distributed
    bootstrap: classical resampling needs n draws from n rows (a global
    shuffle per replicate), but Binomial(n, 1/n) → Poisson(1), so each
    row independently contributes a Poisson(1)-weighted copy to every
    replicate — one narrow pass, no coordination. Weights come from the
    shared LCG's inverse-CDF on a 1e4 grid (thresholds = e4 floors of
    the Poisson(1) CDF: 3678/7357/9196/9810/9963/9994), so both engines
    draw IDENTICAL weights; replicate means are integer floors; the 32
    replicate means plus the 5th/95th-ish order statistics (ranks 2 and
    31 of 32) are all hash-certified.

    Scale shape: the only cost is the ×32 row amplification (flatMap,
    narrow, no shuffle) feeding one 32-key map-side-combinable aggregate;
    the CI order statistics run over exactly 32 rows. For 100 TB inputs
    prefer B ≤ 64 or bag-of-little-bootstraps (Kleiner et al. 2014) —
    the plan shape is the same."""
    q = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("x"),
        )
    )
    reps = q.select(
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("rep"),
        "event_id",
    ).select(
        "rep",
        "x",
        SP.lcg_bucket(
            F.col("event_id") * 64 + F.col("rep"), 10000
        ).alias("u"),
    )
    w = (
        F.when(F.col("u") < 3678, 0)
        .when(F.col("u") < 7357, 1)
        .when(F.col("u") < 9196, 2)
        .when(F.col("u") < 9810, 3)
        .when(F.col("u") < 9963, 4)
        .when(F.col("u") < 9994, 5)
        .otherwise(6)
    )
    means = (
        reps.withColumn("w", w)
        .groupBy("rep")
        .agg(
            F.sum("w").cast("bigint").alias("n_eff"),
            F.expr("(1000000 * sum(w * x)) div sum(w)")
            .cast("bigint")
            .alias("rep_mean_e6"),
        )
    )
    # 32 rows by construction: constant-key windows are single-task by
    # design (non-foldable constant, see heavy_hitters).
    one = F.spark_partition_id() * 0 + 1
    ranked = means.repartition(1).withColumn(
        "rnk", F.row_number().over(Window.partitionBy(one).orderBy("rep_mean_e6", "rep"))
    )
    lohi = ranked.withColumn(
        "boot_lo_e6",
        F.max(F.when(F.col("rnk") == 2, F.col("rep_mean_e6"))).over(
            Window.partitionBy(one)
        ),
    ).withColumn(
        "boot_hi_e6",
        F.max(F.when(F.col("rnk") == 31, F.col("rep_mean_e6"))).over(
            Window.partitionBy(one)
        ),
    )
    return lohi.select("rep", "n_eff", "rep_mean_e6", "boot_lo_e6", "boot_hi_e6")


# =====================================================================
# CUSUM drift detection (ordered per-type fold) — round 8
# =====================================================================

@register(
    "cusum_drift_scores",
    """
    WITH xe AS (
      SELECT event_type, event_id,
             CAST(floor("value" * 10000 + 0.5) AS BIGINT) AS x_e4
      FROM events WHERE "value" IS NOT NULL AND NOT isnan("value")
    ),
    k AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(x_e4) AS BIGINT) // CAST(count(*) AS BIGINT) AS k_e4
      FROM xe GROUP BY event_type
    ),
    d AS (
      SELECT xe.event_type, xe.event_id, xe.x_e4 - k.k_e4 AS dev
      FROM xe JOIN k ON k.event_type = xe.event_type
    ),
    folded AS (
      SELECT event_type,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT), list(dev ORDER BY event_id)),
               (acc, dd) -> greatest(CAST(0 AS BIGINT), acc + dd)
             ) AS cusum_pos_e4,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT), list(-dev ORDER BY event_id)),
               (acc, dd) -> greatest(CAST(0 AS BIGINT), acc + dd)
             ) AS cusum_neg_e4
      FROM d GROUP BY event_type
    )
    SELECT k.event_type, k.n_events, k.k_e4,
           f.cusum_pos_e4, f.cusum_neg_e4
    FROM k JOIN folded f ON f.event_type = k.event_type
    """,
)
def cusum_drift_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift statistic (Page 1954) per event type: the one-sided
    cumulative sums S⁺ = max(0, S⁺ + (x − k)) and S⁻ = max(0, S⁻ + (k − x))
    folded over the event stream in event_id order, with reference level
    k = the type's own mean — the classic sequential change-point
    statistic a metrics pipeline runs to catch level shifts that PSI-style
    binned snapshots (psi_drift_bins) smear out. A large terminal S⁺/S⁻
    means the tail of the stream sits above/below the long-run level.

    ORDER-DEPENDENT by construction (the max-clamp is non-commutative),
    so it rides the engine's ordered-fold discipline (ewma_last /
    elo_sequential_ratings): both engines fold the identical
    integer list in identical event_id order — and the state is an exact
    BIGINT (x quantized to e4 BEFORE differencing; k_e4 a truncating
    nonneg division), so unlike the EWMA there is no float to drift.

    Scale: one events scan → tiny per-type mean (broadcast back) → one
    shuffle on event_type → per-type ordered fold. Per-type event lists
    are collected into one task (the ewma/elo capacity line: ≤ ~1e6
    events/type; shard the timeline past that — docs/LIMITS.md round-8
    note). Capacity: |dev| ≤ max(x_e4), so S ≤ n·max(x_e4) — 2⁶³ allows
    n·x̂ < 9.2e18 (e.g. 1e9 events at x̂ ≤ 9e9)."""
    xe = (
        t(spark, sf_dir, "events")
        # NaN is not NULL: without the isnan gate Spark's non-ANSI cast
        # would fold a phantom sample while DuckDB errors on the cast —
        # and the streaming twin's dropna skips NaN rows. All three
        # paths now agree: null AND NaN measurements carry no signal.
        .filter(F.col("value").isNotNull() & ~F.isnan(F.col("value")))
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 10000 + 0.5).cast("bigint").alias("x_e4"),
        )
    )
    k = xe.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.expr("CAST(sum(x_e4) AS BIGINT) div CAST(count(*) AS BIGINT)")
        .cast("bigint")
        .alias("k_e4"),
    )
    d = xe.join(F.broadcast(k.select("event_type", "k_e4")), "event_type").select(
        "event_type",
        "event_id",
        (F.col("x_e4") - F.col("k_e4")).alias("dev"),
    )
    devs = F.transform(
        F.sort_array(F.collect_list(F.struct("event_id", "dev"))),
        lambda s: s["dev"],
    )
    zero = F.lit(0).cast("bigint")

    def _cusum(sign: int):
        return F.aggregate(
            devs if sign > 0 else F.transform(devs, lambda v: -v),
            zero,
            lambda acc, dd: F.greatest(zero, acc + dd),
        )

    folded = d.groupBy("event_type").agg(
        _cusum(+1).alias("cusum_pos_e4"),
        _cusum(-1).alias("cusum_neg_e4"),
    )
    return k.join(folded, "event_type").select(
        "event_type", "n_events", "k_e4", "cusum_pos_e4", "cusum_neg_e4"
    )


# =====================================================================
# Benford first-digit audit + Wald–Wolfowitz runs test — round 8
# =====================================================================

#: Benford P(d) = log10(1 + 1/d) as 17-digit literals — log10 ran once,
#: here; neither engine ever executes a transcendental.
_BENFORD_P = (
    "0.3010299956639812", "0.17609125905568124", "0.12493873660829992",
    "0.09691001300805642", "0.07918124604762482", "0.06694678963061322",
    "0.05799194697768673", "0.05115252244738129", "0.04575749056067514",
)
#: χ² as one fixed left-associated 9-term sum over the integer digit
#: counts: ((c_d − n·p_d))²/(n·p_d), identical expression both engines.
_BENFORD_CHI2 = " + ".join(
    f"((CAST(c{d} AS DOUBLE) - CAST(n_pos AS DOUBLE) * {p})"
    f" * (CAST(c{d} AS DOUBLE) - CAST(n_pos AS DOUBLE) * {p}))"
    f" / (CAST(n_pos AS DOUBLE) * {p})"
    for d, p in enumerate(_BENFORD_P, start=1)
)
_BENFORD_CD_SQL = ",\n             ".join(
    f"CAST(sum(CASE WHEN fd = '{d}' THEN 1 ELSE 0 END) AS BIGINT) AS c{d}"
    for d in range(1, 10)
)


@register(
    "benford_chi2_by_type",
    f"""
    WITH xe AS (
      SELECT event_type,
             CAST(floor("value" * 10000 + 0.5) AS BIGINT) AS x_e4
      FROM events
      WHERE "value" IS NOT NULL AND NOT isnan("value") AND "value" > 0
    ),
    fd AS (
      SELECT event_type, substr(CAST(x_e4 AS VARCHAR), 1, 1) AS fd
      FROM xe WHERE x_e4 > 0
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_pos,
             {_BENFORD_CD_SQL}
      FROM fd GROUP BY event_type
    )
    SELECT event_type, n_pos, c1, c9,
           CAST(floor(1000.0 * ({_BENFORD_CHI2})) AS BIGINT) AS chi2_e3
    FROM m
    """,
)
def benford_chi2_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit χ² audit per event type
    (Benford 1938; Nigrini's fraud-detection χ² form) — the cheap
    synthetic-data detector a training pipeline points at numeric
    columns: naturally-occurring magnitudes follow P(d) = log10(1+1/d),
    while generated or template-filled numbers usually don't, and the
    χ² distance against the Benford expectation ranks which slices to
    inspect.

    Exactness: digits are taken from the STRING form of the e4-quantized
    BIGINT (identical integer→string rendering on both engines — never
    from float formatting, which differs); the nine digit counts are
    exact integers; P(d) are embedded 17-digit literals (log10 ran once,
    generating this source); χ² is ONE fixed left-associated 9-term
    expression over the counts — IEEE multiply/subtract/divide on
    identical operands, so floor(1e3·χ²) matches bit-for-bit. Zero and
    negative measurements are excluded by definition (no first
    significant digit).

    Scale: one events scan → one tiny groupBy(event_type). No capacity
    edge below 2⁵³ events/type (double-exact integer counts)."""
    xe = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan(F.col("value"))
            & (F.col("value") > 0)
        )
        .select(
            "event_type",
            F.floor(F.col("value") * 10000 + 0.5).cast("bigint").alias("x_e4"),
        )
        .filter(F.col("x_e4") > 0)
        .select("event_type", F.substring(F.col("x_e4").cast("string"), 1, 1).alias("fd"))
    )
    cds = [
        F.sum(F.when(F.col("fd") == str(d), 1).otherwise(0))
        .cast("bigint")
        .alias(f"c{d}")
        for d in range(1, 10)
    ]
    m = xe.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pos"), *cds
    )
    return m.select(
        "event_type",
        "n_pos",
        "c1",
        "c9",
        F.floor(F.lit(1000.0) * F.expr(_BENFORD_CHI2)).cast("bigint").alias("chi2_e3"),
    )


@register(
    "runs_test_randomness",
    """
    WITH xe AS (
      SELECT event_type, event_id,
             CAST(floor("value" * 10000 + 0.5) AS BIGINT) AS x_e4
      FROM events WHERE "value" IS NOT NULL AND NOT isnan("value")
    ),
    k AS (
      SELECT event_type,
             CAST(sum(x_e4) AS BIGINT) // CAST(count(*) AS BIGINT) AS k_e4
      FROM xe GROUP BY event_type
    ),
    signs AS (
      SELECT xe.event_type, xe.event_id,
             CASE WHEN xe.x_e4 > k.k_e4 THEN 1 ELSE 0 END AS s
      FROM xe JOIN k ON k.event_type = xe.event_type
      WHERE xe.x_e4 <> k.k_e4
    ),
    runs AS (
      SELECT event_type, s,
             CASE WHEN lag(s) OVER (PARTITION BY event_type
                                    ORDER BY event_id) IS DISTINCT FROM s
                  THEN 1 ELSE 0 END AS r_start
      FROM signs
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s) AS BIGINT) AS n1,
             CAST(count(*) - sum(s) AS BIGINT) AS n0,
             CAST(sum(r_start) AS BIGINT) AS r
      FROM runs GROUP BY event_type
    )
    SELECT event_type, n, n1, n0, r,
           CASE WHEN n0 = 0 OR n1 = 0 OR 2 * n0 * n1 <= n THEN NULL
                ELSE CAST(floor(1000000.0 *
                       (CAST(r AS DOUBLE)
                        - (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                           / CAST(n AS DOUBLE) + 1.0))
                       / sqrt(2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                              * (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                                 - CAST(n AS DOUBLE))
                              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                 * (CAST(n AS DOUBLE) - 1.0))))
                     AS BIGINT)
           END AS z_e6
    FROM m
    """,
)
def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test per event type: is the sequence of
    above/below-mean signs (event_id order) serially independent? Too
    FEW runs = positive serial correlation (regimes, drift — what CUSUM
    localizes); too MANY = oscillation. The complement to
    cusum_drift_scores' level-shift view: CUSUM finds WHERE the level
    moved, the runs z says whether the ordering carries structure at
    all. Ties (x = reference) are excluded, the standard treatment.

    Exactness: signs and run starts are pure integers (a source-keyed
    lag window on the unique event_id — IS DISTINCT FROM so the first
    row starts a run on both engines); the z statistic is ONE fixed
    expression over four BIGINTs whose float path is IEEE
    multiply/divide/sqrt on identical operands (the kendall_tau_b / MCC
    discipline). NULL when a sign class is empty or σ = 0
    (2·n0·n1 ≤ n).

    Scale: one scan → tiny per-type mean (broadcast) → one event_type-
    keyed lag window → tiny aggregate. Capacity: 2·n0·n1 ≤ n²/2 must
    stay exact in DOUBLE → n < 1.3e8 events/type before the operand
    rounds (recast to DECIMAL past that, docs/LIMITS.md round-8
    note)."""
    xe = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & ~F.isnan(F.col("value")))
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 10000 + 0.5).cast("bigint").alias("x_e4"),
        )
    )
    k = xe.groupBy("event_type").agg(
        F.expr("CAST(sum(x_e4) AS BIGINT) div CAST(count(*) AS BIGINT)")
        .cast("bigint")
        .alias("k_e4")
    )
    signs = (
        xe.join(F.broadcast(k), "event_type")
        .filter(F.col("x_e4") != F.col("k_e4"))
        .select(
            "event_type",
            "event_id",
            F.when(F.col("x_e4") > F.col("k_e4"), 1).otherwise(0).alias("s"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("event_id")
    runs = signs.select(
        "event_type",
        "s",
        F.when(~F.lag("s").over(w).eqNullSafe(F.col("s")), 1)
        .otherwise(0)
        .alias("r_start"),
    )
    m = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n0"),
        F.sum("r_start").cast("bigint").alias("r"),
    )
    nd = F.col("n").cast("double")
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    rd = F.col("r").cast("double")
    mu = F.lit(2.0) * n0d * n1d / nd + F.lit(1.0)
    var = (
        F.lit(2.0) * n0d * n1d * (F.lit(2.0) * n0d * n1d - nd)
        / (nd * nd * (nd - F.lit(1.0)))
    )
    z = F.floor(F.lit(1000000.0) * (rd - mu) / F.sqrt(var)).cast("bigint")
    degenerate = (
        (F.col("n0") == 0)
        | (F.col("n1") == 0)
        | (2 * F.col("n0") * F.col("n1") <= F.col("n"))
    )
    return m.select(
        "event_type",
        "n",
        "n1",
        "n0",
        "r",
        F.when(degenerate, F.lit(None).cast("bigint")).otherwise(z).alias("z_e6"),
    )


# =====================================================================
# Streaming replay certificate (VERDICT r8 task 6): the cross-batch
# stateful fold, proven equal to a batch query — under the driver gate.
# =====================================================================

@register(
    "stream_replay_running_stats",
    """
    WITH ev AS (
      SELECT user_id, date_trunc('hour', ts) AS batch_h, ts, event_id, value
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    b AS (
      SELECT user_id, batch_h,
             list(value ORDER BY ts, event_id) AS lv
      FROM ev GROUP BY user_id, batch_h
    ),
    pfx AS (
      SELECT user_id, batch_h,
             flatten(list(lv) OVER (PARTITION BY user_id ORDER BY batch_h
                                    ROWS UNBOUNDED PRECEDING)) AS plv
      FROM b
    ),
    folded AS (
      SELECT user_id, batch_h,
             len(plv) AS n,
             list_reduce(list_prepend(0.0::DOUBLE, plv::DOUBLE[]),
                         (acc, x) -> acc + x) AS total,
             list_reduce(plv::DOUBLE[], (acc, x) -> least(acc, x)) AS vmin,
             list_reduce(plv::DOUBLE[], (acc, x) -> greatest(acc, x)) AS vmax,
             list_reduce(plv::DOUBLE[],
                         (acc, x) -> 0.2::DOUBLE * x
                                     + (1.0::DOUBLE - 0.2::DOUBLE) * acc)
               AS ewma
      FROM pfx
    )
    SELECT user_id, batch_h,
           CAST(n AS BIGINT) AS n,
           CAST(floor(total * 10000) AS BIGINT) AS total_e4,
           CAST(floor(vmin * 10000) AS BIGINT) AS vmin_e4,
           CAST(floor(vmax * 10000) AS BIGINT) AS vmax_e4,
           CAST(floor(ewma * 10000) AS BIGINT) AS ewma_e4
    FROM folded
    """,
)
def stream_replay_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-certificate query (VERDICT r8 task 6): replays a
    micro-batched execution of the streaming_running_stats kernel with
    BATCH BOUNDARIES AS DATA and proves, under the driver's DuckDB hash
    gate, that the cross-batch stateful fold equals the batch query over
    the union — the streaming_cusum twin pattern made gate-visible.

    Spark side: events are assigned to micro-batches by hour bucket
    (batch_h = the trigger interval a real stream would see); per key,
    an applyInPandas harness replays the batches IN ORDER through the
    EXACT fold function the streaming kernel executes
    (streaming/stateful.running_stats_fold — one function, two
    harnesses: applyInPandasWithState in production, this replay under
    the gate), carrying the (n, total, vmin, vmax, ewma) state tuple
    across batch calls and emitting one snapshot per touched batch —
    exactly the stream's append-mode output trace.

    Oracle side: the same trace derived WITHOUT any batch machinery —
    for every (key, batch) the prefix of values in batches <= b, folded
    by an explicit ordered list_reduce with the identical expression
    trees (total: 0.0-seeded +; ewma: 0.2*x + (1.0-0.2)*acc — the
    literal subtraction is evaluated in SQL too, because Python's
    1.0 - alpha and a handwritten 0.8 literal are DIFFERENT doubles).
    Both engines fold identical lists in identical order, so all four
    running doubles are bit-identical (the ewma_last/elo discipline);
    outputs quantized to e4 integers.

    A wrong state carry, wrong batch slicing, chunk-local sort (the
    round-8 bug class), or dropped/duplicated snapshot breaks the hash.
    NaN/NULL values are excluded on both sides (the kernel's dropna).

    Scale shape: ONE shuffle on user_id for the replay (the same state
    -store partitioning the real stream uses); the oracle's prefix lists
    are per-key bounded. Python is Arrow-batched applyInPandas — the
    deliberate exception for order-dependent stateful recursion, same
    class as the streaming kernels themselves.

    Reference basis: extends the reference's commit-after-load
    at-least-once loop (internal/pipeline/pipeline.go:63-118) test
    strategy — its integration tests replay fixed batches and assert
    end-state (kafka_pipeline_test.go:158-286); this certifies the
    whole per-batch trace instead."""
    import pandas as pd

    from storm_data_etl_spark.streaming.stateful import (
        RUNNING_STATS_ZERO,
        running_stats_fold,
    )

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", F.col("ts_utc")).alias("batch_h"),
        "ts",
        "event_id",
        "value",
        # shard-group pattern (streaming_heavy_hitters): one Arrow call
        # per SHARD of keys, not per key — per-group Python invocation
        # overhead multiplied by key count dominated the per-key form
        # (measured 8.7 s pandas-per-key / 3.5 s numpy-per-key / the
        # sharded numpy form below at sf0.1). Keys never split across
        # shards, so per-key state/order semantics are unchanged.
        F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("_shard"),
    )
    schema = (
        "user_id long, batch_h timestamp, n long, total double, "
        "vmin double, vmax double, ewma double"
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cols = ["user_id", "batch_h", "n", "total", "vmin", "vmax", "ewma"]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        # whole-shard stable sort (uid, batch, ts, event_id), then slice
        # per key and per batch — the concat-then-sort discipline (never
        # per-chunk) the round-8 fix established, applied shard-wide.
        uids = pdf["user_id"].to_numpy()
        bh = pdf["batch_h"].to_numpy()
        order = np.lexsort(
            (pdf["event_id"].to_numpy(), pdf["ts"].to_numpy(), bh, uids)
        )
        uids, bh = uids[order], bh[order]
        vals = pdf["value"].to_numpy(dtype=float)[order]
        out_uid, out_bh, out_state = [], [], []
        boundary = np.r_[
            True, (uids[1:] != uids[:-1]) | (bh[1:] != bh[:-1])
        ]
        starts = np.flatnonzero(boundary)
        bounds = np.r_[starts, len(bh)]
        state = RUNNING_STATS_ZERO
        prev_uid = None
        for i, s in enumerate(starts):
            if uids[s] != prev_uid:
                state = RUNNING_STATS_ZERO  # new key: fresh state
                prev_uid = uids[s]
            xs = vals[s : bounds[i + 1]]
            xs = xs[~np.isnan(xs)]
            if not len(xs):
                continue
            state = running_stats_fold(state, [float(x) for x in xs])
            out_uid.append(uids[s])
            out_bh.append(bh[s])
            out_state.append(state)
        if not out_state:
            return pd.DataFrame(columns=cols)
        n, total, vmin, vmax, ewma = zip(*out_state)
        return pd.DataFrame(
            {
                "user_id": out_uid,
                "batch_h": out_bh,
                "n": n,
                "total": total,
                "vmin": vmin,
                "vmax": vmax,
                "ewma": ewma,
            },
            columns=cols,
        )

    trace = ev.groupBy("_shard").applyInPandas(replay, schema)
    return trace.select(
        "user_id",
        "batch_h",
        "n",
        F.floor(F.col("total") * 10000).cast("bigint").alias("total_e4"),
        F.floor(F.col("vmin") * 10000).cast("bigint").alias("vmin_e4"),
        F.floor(F.col("vmax") * 10000).cast("bigint").alias("vmax_e4"),
        F.floor(F.col("ewma") * 10000).cast("bigint").alias("ewma_e4"),
    )


# =====================================================================
# Round 9 — statistics-family completion: moment-based normality test,
# standardized effect sizes, and the t-closeness privacy audit.
# =====================================================================

@register(
    "jarque_bera_normality",
    """
    WITH q AS (
      SELECT event_type, CAST(floor("value") AS BIGINT) AS v
      FROM events
      WHERE "value" IS NOT NULL AND NOT isnan("value")
        AND event_type IS NOT NULL
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s1,
             CAST(sum(v * v) AS BIGINT) AS s2,
             CAST(sum(v * v * v) AS BIGINT) AS s3,
             CAST(sum(v * v * v * v) AS BIGINT) AS s4
      FROM q GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS md,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM s
    ),
    c AS (
      SELECT event_type, n, md,
             r2 - md * md AS m2,
             r3 - CAST(3 AS DOUBLE) * md * r2
                + CAST(2 AS DOUBLE) * md * md * md AS m3,
             r4 - CAST(4 AS DOUBLE) * md * r3
                + CAST(6 AS DOUBLE) * md * md * r2
                - CAST(3 AS DOUBLE) * md * md * md * md AS m4
      FROM m
    ),
    k AS (
      SELECT event_type, n, m2,
             m3 / (m2 * sqrt(m2)) AS skew,
             m4 / (m2 * m2) - CAST(3 AS DOUBLE) AS exkurt
      FROM c
    )
    SELECT event_type, n,
           CASE WHEN m2 <= CAST(0 AS DOUBLE) THEN NULL
                ELSE CAST(floor(CAST(1000000 AS DOUBLE) * skew) AS BIGINT)
           END AS skew_e6,
           CASE WHEN m2 <= CAST(0 AS DOUBLE) THEN NULL
                ELSE CAST(floor(CAST(1000000 AS DOUBLE) * exkurt) AS BIGINT)
           END AS exkurt_e6,
           CASE WHEN m2 <= CAST(0 AS DOUBLE) THEN NULL
                ELSE CAST(floor(
                  CAST(10000 AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(6 AS DOUBLE))
                  * (skew * skew + exkurt * exkurt / CAST(4 AS DOUBLE))
                ) AS BIGINT)
           END AS jb_e4
    FROM k
    """,
)
def jarque_bera_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per event type (Jarque & Bera 1980,
    public literature): sample skewness and excess kurtosis from the first
    four raw moments, JB = n/6 * (S^2 + K^2/4) — the moment-based
    distributional gate completing the inference family (welch assumes
    normality, this one CHECKS it; ks_two_sample/runs_test are its
    nonparametric siblings).

    Values quantize to integer UNITS (floor(value)) first so all four
    power sums are exact BIGINTs on both engines — no accumulation-order
    float noise. The moment->skew/kurt/JB chain is then closed-form
    per-row IEEE double arithmetic over five integers with identical
    expression trees on both sides (sqrt is IEEE-correctly-rounded, no
    transcendentals). Constant groups (m2 <= 0) emit NULL statistics.

    Exactness bound: the int64 fourth-power sum is exact while
    n * max(v)^4 < 2^63 — ~1.6e8 rows per type at v <= 490 (same class
    of documented bound as welch_ttest; DuckDB widens to HUGEINT past it,
    Spark wraps, so the twins diverge TOGETHER with the data, loudly).
    ONE conditional-aggregate scan, map-side partial agg, tiny shuffle."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & F.col("event_type").isNotNull()
    )
    v = F.floor(F.col("value")).cast("bigint")
    s = ev.select(F.col("event_type"), v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v")).cast("bigint").alias("s3"),
        F.sum(F.col("v") * F.col("v") * F.col("v") * F.col("v"))
        .cast("bigint")
        .alias("s4"),
    )
    nd = F.col("n").cast("double")
    md = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    three = F.lit(3).cast("double")
    m2 = r2 - md * md
    m3 = r3 - three * md * r2 + F.lit(2).cast("double") * md * md * md
    m4 = (
        r4
        - F.lit(4).cast("double") * md * r3
        + F.lit(6).cast("double") * md * md * r2
        - three * md * md * md * md
    )
    skew = m3 / (m2 * F.sqrt(m2))
    exkurt = m4 / (m2 * m2) - three
    jb = (
        F.lit(10000).cast("double")
        * (nd / F.lit(6).cast("double"))
        * (skew * skew + exkurt * exkurt / F.lit(4).cast("double"))
    )
    bad = m2 <= F.lit(0).cast("double")
    e6 = F.lit(1000000).cast("double")
    return s.select(
        "event_type",
        "n",
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(F.floor(e6 * skew).cast("bigint"))
        .alias("skew_e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(F.floor(e6 * exkurt).cast("bigint"))
        .alias("exkurt_e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(F.floor(jb).cast("bigint"))
        .alias("jb_e4"),
    )


@register(
    "effect_size_panel",
    """
    WITH q AS (
      SELECT CAST(floor("value" * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
      FROM events WHERE event_type IN ('click', 'purchase')
        AND "value" IS NOT NULL
    ),
    per_v AS (
      SELECT v, CAST(sum(ia) AS BIGINT) AS a_cnt,
             CAST(sum(ib) AS BIGINT) AS b_cnt,
             CAST(count(*) AS BIGINT) AS t
      FROM q GROUP BY v
    ),
    cum AS (
      SELECT v, a_cnt, b_cnt, t,
             CAST(sum(t) OVER (ORDER BY v) - t AS BIGINT) AS below
      FROM per_v
    ),
    s AS (
      SELECT
        CAST(sum(a_cnt) AS BIGINT) AS n1,
        CAST(sum(b_cnt) AS BIGINT) AS n2,
        CAST(sum(a_cnt * v) AS BIGINT) AS s1,
        CAST(sum(b_cnt * v) AS BIGINT) AS s2,
        CAST(sum(a_cnt * v * v) AS BIGINT) AS q1,
        CAST(sum(b_cnt * v * v) AS BIGINT) AS q2,
        CAST(sum(a_cnt * (2 * below + t + 1)) AS BIGINT) AS r2a,
        CAST(sum(b_cnt * (2 * below + t + 1)) AS BIGINT) AS r2b
      FROM cum
    ),
    d AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / (CAST(100 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS m1,
             CAST(s2 AS DOUBLE) / (CAST(100 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS m2,
             (CAST(q1 AS DOUBLE) / CAST(10000 AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(100 AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / CAST(100 AS DOUBLE)) / CAST(n1 AS DOUBLE))
               AS ss1,
             (CAST(q2 AS DOUBLE) / CAST(10000 AS DOUBLE)
              - (CAST(s2 AS DOUBLE) / CAST(100 AS DOUBLE))
                * (CAST(s2 AS DOUBLE) / CAST(100 AS DOUBLE)) / CAST(n2 AS DOUBLE))
               AS ss2,
             r2a - n1 * (n1 + 1) AS u2a,
             r2b - n2 * (n2 + 1) AS u2b
      FROM s
    )
    SELECT n1, n2,
           CAST(floor(CAST(1000000 AS DOUBLE) * (m1 - m2)
             / sqrt((ss1 + ss2) / CAST(n1 + n2 - 2 AS DOUBLE))) AS BIGINT)
             AS cohens_d_e6,
           CAST(floor(CAST(1000000 AS DOUBLE) * (m1 - m2)
             / sqrt((ss1 + ss2) / CAST(n1 + n2 - 2 AS DOUBLE))
             * (CAST(1 AS DOUBLE) - CAST(3 AS DOUBLE)
                / (CAST(4 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE) - CAST(9 AS DOUBLE))))
             AS BIGINT) AS hedges_g_e6,
           CAST(floor(CAST(1000000 AS DOUBLE) * CAST(u2a - u2b AS DOUBLE)
             / (CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             AS BIGINT) AS cliffs_delta_e6
    FROM d
    """,
)
def effect_size_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes between the click and purchase value
    distributions — the companion panel the inference family was missing:
    a significance test (welch_ttest / mann_whitney_u) says WHETHER arms
    differ, these say BY HOW MUCH. Cohen's d (pooled-variance), its
    small-sample Hedges' g correction g = d * (1 - 3/(4N - 9)) (Hedges
    1981), and the nonparametric Cliff's delta derived exactly from the
    tie-aware doubled rank sums: with 2R computed from midranks,
    2U = 2R - n(n+1) per arm, and delta = (#[a>b] - #[a<b]) / (n1*n2)
    = (2U_a - 2U_b) / (2*n1*n2) — the half-tie terms cancel in the
    difference, so delta is EXACT integer arithmetic until the final
    scaled division.

    Values quantize to integer hundredths first (the welch/mann-whitney
    discipline): the moment sums are exact BIGINTs and the rank sums come
    from the same per-value tie-group scan mann_whitney_u proved out —
    one value-vocabulary-sized aggregate + a cumulative window over
    distinct values, then a 1-row panel. Same int64 bound as welch_ttest
    (~9e8 rows/arm at |value| <= 1000)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase") & F.col("value").isNotNull()
    )
    q = ev.select(
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        (F.col("event_type") == "click").cast("bigint").alias("ia"),
        (F.col("event_type") == "purchase").cast("bigint").alias("ib"),
    )
    per_v = q.groupBy("v").agg(
        F.sum("ia").cast("bigint").alias("a_cnt"),
        F.sum("ib").cast("bigint").alias("b_cnt"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.withColumn(
        "below", (F.sum("t").over(w) - F.col("t")).cast("bigint")
    )
    s = cum.agg(
        F.sum("a_cnt").cast("bigint").alias("n1"),
        F.sum("b_cnt").cast("bigint").alias("n2"),
        F.sum(F.col("a_cnt") * F.col("v")).cast("bigint").alias("s1"),
        F.sum(F.col("b_cnt") * F.col("v")).cast("bigint").alias("s2"),
        F.sum(F.col("a_cnt") * F.col("v") * F.col("v")).cast("bigint").alias("q1"),
        F.sum(F.col("b_cnt") * F.col("v") * F.col("v")).cast("bigint").alias("q2"),
        F.sum(F.col("a_cnt") * (2 * F.col("below") + F.col("t") + 1))
        .cast("bigint")
        .alias("r2a"),
        F.sum(F.col("b_cnt") * (2 * F.col("below") + F.col("t") + 1))
        .cast("bigint")
        .alias("r2b"),
    )
    hundred = F.lit(100).cast("double")
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / (hundred * n1d)
    m2 = F.col("s2").cast("double") / (hundred * n2d)
    ss1 = (
        F.col("q1").cast("double") / F.lit(10000).cast("double")
        - (F.col("s1").cast("double") / hundred)
        * (F.col("s1").cast("double") / hundred)
        / n1d
    )
    ss2 = (
        F.col("q2").cast("double") / F.lit(10000).cast("double")
        - (F.col("s2").cast("double") / hundred)
        * (F.col("s2").cast("double") / hundred)
        / n2d
    )
    u2a = F.col("r2a") - F.col("n1") * (F.col("n1") + 1)
    u2b = F.col("r2b") - F.col("n2") * (F.col("n2") + 1)
    pooled = F.sqrt((ss1 + ss2) / (F.col("n1") + F.col("n2") - 2).cast("double"))
    d = (m1 - m2) / pooled
    g = d * (
        F.lit(1).cast("double")
        - F.lit(3).cast("double")
        / (
            F.lit(4).cast("double") * (F.col("n1") + F.col("n2")).cast("double")
            - F.lit(9).cast("double")
        )
    )
    e6 = F.lit(1000000).cast("double")
    delta = (
        e6
        * (u2a - u2b).cast("double")
        / (F.lit(2).cast("double") * n1d * n2d)
    )
    return s.select(
        "n1",
        "n2",
        F.floor(e6 * d).cast("bigint").alias("cohens_d_e6"),
        F.floor(e6 * g).cast("bigint").alias("hedges_g_e6"),
        F.floor(delta).cast("bigint").alias("cliffs_delta_e6"),
    )


@register(
    "t_closeness_audit",
    """
    WITH q AS (
      SELECT event_type,
             CAST(floor("value" / 100) AS BIGINT) AS value_band,
             CAST(extract(hour FROM ts) AS BIGINT) AS hour
      FROM events WHERE "value" IS NOT NULL AND event_type IS NOT NULL
    ),
    hours AS (SELECT DISTINCT hour FROM q),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM hours),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM q),
    ch AS (SELECT hour, CAST(count(*) AS BIGINT) AS c_all FROM q GROUP BY hour),
    cls AS (
      SELECT event_type, value_band, CAST(count(*) AS BIGINT) AS n_g
      FROM q GROUP BY 1, 2
    ),
    gh AS (
      SELECT event_type, value_band, hour, CAST(count(*) AS BIGINT) AS c_g
      FROM q GROUP BY 1, 2, 3
    ),
    dense AS (
      SELECT cls.event_type, cls.value_band, cls.n_g, hours.hour,
             coalesce(gh.c_g, 0) AS c_g, ch.c_all
      FROM cls CROSS JOIN hours
      LEFT JOIN gh ON gh.event_type = cls.event_type
                  AND gh.value_band = cls.value_band
                  AND gh.hour = hours.hour
      JOIN ch ON ch.hour = hours.hour
    ),
    cumd AS (
      SELECT event_type, value_band, n_g,
             abs(sum(c_g) OVER (PARTITION BY event_type, value_band
                                ORDER BY hour
                                ROWS UNBOUNDED PRECEDING)
                 * (SELECT n_total FROM tot)
                 - sum(c_all) OVER (PARTITION BY event_type, value_band
                                    ORDER BY hour
                                    ROWS UNBOUNDED PRECEDING)
                 * n_g) AS step
      FROM dense
    ),
    per_class AS (
      SELECT event_type, value_band, n_g,
             CAST(floor(
               CAST(1000000 AS DOUBLE) * CAST(sum(step) AS DOUBLE)
               / (CAST(n_g AS DOUBLE) * CAST((SELECT n_total FROM tot) AS DOUBLE)
                  * CAST((SELECT m FROM m) - 1 AS DOUBLE))
             ) AS BIGINT) AS t_e6
      FROM cumd
      GROUP BY event_type, value_band, n_g
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN t_e6 > 250000 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_above_t,
           CAST(sum(CASE WHEN t_e6 > 250000 THEN n_g ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(max(t_e6) AS BIGINT) AS max_t_e6
    FROM per_class
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007, public
    literature) — the third rung of the release-gate ladder after
    k_anonymity_audit and l_diversity_audit: a class can be k-anonymous
    AND l-diverse yet still leak if its SENSITIVE-VALUE DISTRIBUTION
    differs sharply from the table's. Over the quasi-identifier
    (event_type, value_band), the sensitive attribute is the ORDERED
    event hour; distance is the ordered-attribute Earth Mover's Distance
    EMD = sum_i |cumP_i - cumQ_i| / (m - 1), reported per class and
    rolled up (classes above t = 0.25, rows they expose, worst t).

    Exactness: every cumulative term is cross-multiplied to the common
    denominator n_g * N — |cum_g * N - cum_all * n_g| is an exact BIGINT
    (bound: n_g * N < 2^63, ~3e9 rows at 1e9-row classes), summed
    exactly, with ONE final scaled division per class. No floats until
    the last floor.

    Scale shape: ONE grouped count over the finest (QI x hour) key —
    every coarser aggregate (class totals, hour marginals, N, the hour
    domain) re-aggregates that pinned |classes| * 24-row rollup, so the
    events table is scanned exactly once — then a cumulative window
    PARTITIONED BY CLASS over at most 24 ordered hour rows. The global
    N and m ride in as 1-row broadcast scalars."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    q = ev.select(
        "event_type",
        F.floor(F.col("value") / 100).cast("bigint").alias("value_band"),
        F.hour("ts_utc").cast("bigint").alias("hour"),
    )
    # ONE pass over the events table: every coarser aggregate (class
    # totals, hour marginals, N, the hour domain) re-aggregates the
    # finest (QI x hour) rollup — |classes| * 24 rows, pinned.
    gh = q.groupBy("event_type", "value_band", "hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_g")
    )
    gh = _pin(gh)
    hours = gh.select("hour").distinct()
    tot = gh.agg(F.sum("c_g").cast("bigint").alias("n_total"))
    mrow = hours.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    ch = gh.groupBy("hour").agg(F.sum("c_g").cast("bigint").alias("c_all"))
    cls = gh.groupBy("event_type", "value_band").agg(
        F.sum("c_g").cast("bigint").alias("n_g")
    )
    dense = (
        cls.crossJoin(F.broadcast(hours))
        .join(
            gh.withColumnsRenamed({"c_g": "_cg"}),
            ["event_type", "value_band", "hour"],
            "left",
        )
        .join(F.broadcast(ch), "hour")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "value_band",
            "n_g",
            "hour",
            F.coalesce(F.col("_cg"), F.lit(0)).cast("bigint").alias("c_g"),
            "c_all",
            "n_total",
        )
    )
    w = (
        Window.partitionBy("event_type", "value_band")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cumd = dense.select(
        "event_type",
        "value_band",
        "n_g",
        F.abs(
            F.sum("c_g").over(w) * F.col("n_total")
            - F.sum("c_all").over(w) * F.col("n_g")
        ).alias("step"),
        "n_total",
    )
    per_class = (
        cumd.groupBy("event_type", "value_band", "n_g", "n_total")
        .agg(F.sum("step").cast("bigint").alias("steps"))
        .crossJoin(F.broadcast(mrow))
        .select(
            "n_g",
            F.floor(
                F.lit(1000000).cast("double")
                * F.col("steps").cast("double")
                / (
                    F.col("n_g").cast("double")
                    * F.col("n_total").cast("double")
                    * (F.col("m") - 1).cast("double")
                )
            )
            .cast("bigint")
            .alias("t_e6"),
        )
    )
    return per_class.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("t_e6") > 250000, 1).otherwise(0))
        .cast("bigint")
        .alias("classes_above_t"),
        F.sum(F.when(F.col("t_e6") > 250000, F.col("n_g")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.max("t_e6").cast("bigint").alias("max_t_e6"),
    )


@register(
    "stream_replay_sessionize",
    """
    WITH ev AS (
      SELECT user_id, date_trunc('hour', ts) AS batch_h,
             epoch_ns(ts) AS tsn, event_id
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    marked AS (
      SELECT user_id, batch_h, tsn,
             CASE WHEN lag(tsn) OVER w IS NULL
                    OR tsn - lag(tsn) OVER w > 1800000000000
                  THEN 1 ELSE 0 END AS is_start
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
    ),
    per_batch AS (
      SELECT user_id, batch_h,
             CAST(sum(is_start) AS BIGINT) AS st,
             CAST(count(*) AS BIGINT) AS ne,
             CAST(max(tsn) AS BIGINT) AS mt
      FROM marked GROUP BY user_id, batch_h
    )
    SELECT user_id, batch_h,
           CAST(sum(st) OVER wb AS BIGINT) AS n_sessions,
           CAST(sum(ne) OVER wb AS BIGINT) AS n_events,
           CAST(max(mt) OVER wb AS BIGINT) AS last_ts
    FROM per_batch
    WINDOW wb AS (PARTITION BY user_id ORDER BY batch_h
                  ROWS UNBOUNDED PRECEDING)
    """,
)
def stream_replay_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second streaming replay certificate (the stream_replay_running_stats
    pattern applied to the ORDER-DEPENDENT gap recursion): replays a
    micro-batched execution of the streaming_sessionize kernel with batch
    boundaries as data (hour buckets) and proves, under the driver's
    DuckDB hash gate, that the cross-batch session counter equals the
    batch query over the union.

    Spark side: per key shard, an applyInPandas harness replays batches
    in order through the EXACT fold the streaming kernel executes
    (streaming/stateful.sessionize_fold — extracted so
    applyInPandasWithState and this replay share one code path), carrying
    (last_ts, n_sessions, n_events) across batch calls and emitting one
    snapshot per touched (key, batch) — the stream's append-mode trace.

    Oracle side: the same trace with NO batch machinery — a session start
    is lag-gap > 30 min over (tsn, event_id) ordering per key, and each
    batch snapshot is the running prefix (sum of starts, count, max ts)
    over hour buckets. Every quantity is an exact int64 (epoch-ns,
    counters) — unlike the running-stats certificate there is NO float
    anywhere, so this one also pins the pure ordering/state-carry logic
    with zero quantization envelope.

    A wrong state carry, wrong batch slicing, chunk-local sort (the
    round-8 bug class), double-counted session at a batch boundary (gap
    measured against the PREVIOUS BATCH's last event), or dropped
    snapshot breaks the hash.

    Scale shape: ONE shuffle on the key shard (the state-store
    partitioning the real stream uses); the oracle's windows are
    key-partitioned. Arrow-batched applyInPandas is the deliberate
    exception for order-dependent stateful recursion — the same class as
    the streaming kernels themselves."""
    import pandas as pd

    from storm_data_etl_spark.streaming.stateful import (
        SESSIONIZE_ZERO,
        sessionize_fold,
    )

    gap_ns = 30 * 60 * 1_000_000_000
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts_utc")).alias("batch_h"),
            F.col("ts_ns"),
            "event_id",
            # shard-group pattern (stream_replay_running_stats): one Arrow
            # call per shard of keys, never per key.
            F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("_shard"),
        )
    )
    schema = (
        "user_id long, batch_h timestamp, n_sessions long, n_events long, "
        "last_ts long"
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cols = ["user_id", "batch_h", "n_sessions", "n_events", "last_ts"]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        # whole-shard stable sort (uid, batch, ts, event_id) — the
        # concat-then-sort discipline, applied shard-wide; keys never
        # split across shards so per-key order semantics are unchanged.
        uids = pdf["user_id"].to_numpy()
        bh = pdf["batch_h"].to_numpy()
        order = np.lexsort(
            (pdf["event_id"].to_numpy(), pdf["ts_ns"].to_numpy(), bh, uids)
        )
        uids, bh = uids[order], bh[order]
        tsn = pdf["ts_ns"].to_numpy(dtype="int64")[order]
        out = []
        boundary = np.r_[True, (uids[1:] != uids[:-1]) | (bh[1:] != bh[:-1])]
        starts = np.flatnonzero(boundary)
        bounds = np.r_[starts, len(bh)]
        state = SESSIONIZE_ZERO
        prev_uid = None
        for i, s in enumerate(starts):
            if uids[s] != prev_uid:
                state = SESSIONIZE_ZERO  # new key: fresh state
                prev_uid = uids[s]
            state = sessionize_fold(
                state, [int(x) for x in tsn[s : bounds[i + 1]]], gap_ns
            )
            last_ts, n_sessions, n_events = state
            out.append((uids[s], bh[s], n_sessions, n_events, last_ts))
        return pd.DataFrame(out, columns=cols)

    return ev.groupBy("_shard").applyInPandas(replay, schema)


@register(
    "stream_replay_dedup",
    """
    WITH ev AS (
      SELECT user_id, event_type, date_trunc('hour', ts) AS batch_h,
             epoch_ns(ts) AS tsn, event_id
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL AND event_id IS NOT NULL
    ),
    r AS (
      SELECT user_id, event_type, batch_h, event_id,
             row_number() OVER (PARTITION BY user_id, event_type, batch_h
                                ORDER BY tsn, event_id) AS rn
      FROM ev
    ),
    b AS (
      SELECT user_id, event_type, batch_h,
             CAST(count(*) AS BIGINT) AS n_batch,
             CAST(min(CASE WHEN rn = 1 THEN event_id END) AS BIGINT)
               AS first_id
      FROM r GROUP BY user_id, event_type, batch_h
    ),
    c AS (
      SELECT user_id, event_type, batch_h, n_batch, first_id,
             CAST(sum(n_batch) OVER (PARTITION BY user_id, event_type
                                     ORDER BY batch_h
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS seen_after
      FROM b
    )
    SELECT user_id, event_type, batch_h, n_batch, seen_after,
           CASE WHEN seen_after = n_batch THEN 1 ELSE 0 END AS emitted,
           CASE WHEN seen_after = n_batch THEN first_id ELSE NULL END
             AS emitted_event_id
    FROM c
    """,
)
def stream_replay_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third streaming replay certificate: the first-wins dedup kernel —
    the remaining production stateful path (streaming_first_wins_dedup,
    the in-stream re-expression of the reference's ON CONFLICT (id) DO
    NOTHING upsert, docs/Architecture.md:98-102) was proven only by unit
    tests until now. Same recipe as stream_replay_running_stats /
    _sessionize: replay a micro-batched execution with batch boundaries
    as data (hour buckets) through the EXACT extracted fold the
    applyInPandasWithState kernel executes
    (streaming/stateful.dedup_fold — one function, two harnesses), and
    hash-compare the full per-(key, batch) trace against a DuckDB twin
    with no batch machinery.

    Dedup identity: (user_id, event_type) — event_id is unique, so the
    coarser key gives real cross-batch duplicates (the r8
    chunk-boundary bug class this certificate exists to catch: a key
    spanning batches 2 and 5 must emit ONLY from batch 2, and the seen
    counter must carry, not reset, across the boundary). Trace row per
    touched (key, batch): the batch's row count, the post-batch seen
    counter, whether the kernel emitted, and WHICH row it emitted (the
    batch's first by (ts, event_id) — so a wrong within-batch arrival
    order also breaks the hash, not just a wrong emit decision).

    Oracle side: first_id per (key, batch) via row_number, seen_after as
    a running prefix sum over hour buckets, emitted iff the prefix
    BEFORE this batch was zero (seen_after = n_batch). All-integer — no
    quantization envelope; pure ordering/state-carry logic.

    Scale shape: ONE shuffle on the key shard (the state-store
    partitioning the real stream uses — keys never split across shards,
    so per-key state/order semantics are unchanged); Arrow-batched
    applyInPandas is the deliberate exception for order-dependent
    stateful recursion, same class as the kernels themselves."""
    import pandas as pd

    from storm_data_etl_spark.streaming.stateful import DEDUP_ZERO, dedup_fold

    ev = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts_utc")).alias("batch_h"),
            F.col("ts_ns"),
            "event_id",
            # shard-group pattern (stream_replay_running_stats): one Arrow
            # call per shard of keys, never per key.
            F.pmod(F.xxhash64("user_id", "event_type"), F.lit(64)).alias(
                "_shard"
            ),
        )
    )
    schema = (
        "user_id long, event_type string, batch_h timestamp, n_batch long, "
        "seen_after long, emitted int, emitted_event_id long"
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cols = [
            "user_id",
            "event_type",
            "batch_h",
            "n_batch",
            "seen_after",
            "emitted",
            "emitted_event_id",
        ]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        # whole-shard stable sort (uid, etype, batch, ts, event_id) — the
        # concat-then-sort discipline, applied shard-wide. event_type is
        # factorized to int codes for lexsort; only grouping contiguity
        # and INTRA-key order matter (keys fold independently), so the
        # code order being factorization order, not lexicographic, is
        # irrelevant to the semantics.
        uids = pdf["user_id"].to_numpy()
        codes, etypes = pd.factorize(pdf["event_type"])
        bh = pdf["batch_h"].to_numpy()
        order = np.lexsort(
            (pdf["event_id"].to_numpy(), pdf["ts_ns"].to_numpy(), bh, codes, uids)
        )
        uids, codes, bh = uids[order], codes[order], bh[order]
        eids = pdf["event_id"].to_numpy(dtype="int64")[order]
        out = []
        boundary = np.r_[
            True,
            (uids[1:] != uids[:-1])
            | (codes[1:] != codes[:-1])
            | (bh[1:] != bh[:-1]),
        ]
        starts = np.flatnonzero(boundary)
        bounds = np.r_[starts, len(bh)]
        state = DEDUP_ZERO
        prev_key = None
        for i, s in enumerate(starts):
            key = (uids[s], codes[s])
            if key != prev_key:
                state = DEDUP_ZERO  # new key: fresh state
                prev_key = key
            n = int(bounds[i + 1] - s)
            state, emit = dedup_fold(state, n)
            out.append(
                (
                    uids[s],
                    etypes[codes[s]],
                    bh[s],
                    n,
                    state[0],
                    1 if emit else 0,
                    int(eids[s]) if emit else None,
                )
            )
        return pd.DataFrame(out, columns=cols)

    return ev.groupBy("_shard").applyInPandas(replay, schema)


@register(
    "stream_replay_change_detect",
    """
    WITH ev AS (
      SELECT user_id, date_trunc('hour', ts) AS batch_h, epoch_ns(ts) AS tsn,
             event_id, "value" AS v
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND "value" IS NOT NULL AND NOT isnan("value")
    ),
    lagd AS (
      SELECT user_id, batch_h, v,
             lag(v) OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS pv
      FROM ev
    )
    SELECT user_id, batch_h,
           CAST(floor(pv * 10000) AS BIGINT) AS prev_e4,
           CAST(floor(v * 10000) AS BIGINT) AS curr_e4,
           CAST(floor((v - pv) * 10000) AS BIGINT) AS jump_e4
    FROM lagd WHERE pv IS NOT NULL AND abs(v - pv) > 100.0
    """,
)
def stream_replay_change_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth streaming replay certificate: the transformWithState
    change-point kernel (streaming/stateful.make_change_detector — the
    modern StatefulProcessor API's representative). Replays hour-bucket
    micro-batches per user through the EXACT extracted fold
    (change_detect_fold — one function, two harnesses) and hash-compares
    the full emitted-jump trace against a lag() twin with no batch
    machinery: the oracle's lag runs across the WHOLE key history, so a
    per-batch state reset (losing the last-seen value at a batch
    boundary) emits a wrong/missing first-row-of-batch jump and breaks
    the hash. jump = v - last is one double subtraction, identical IEEE
    on both engines; prev/curr/jump are floor-quantized at 1e4.

    Threshold 100.0 (the kernel's default) sits inside the fixture value
    domain at every gate scale, so real jumps are emitted everywhere —
    the mantel_haenszel fixture-scaled-constants lesson applied on
    arrival.

    Scale shape: ONE shuffle on the key shard (the state-store
    partitioning); the oracle is one keyed window. Arrow-batched
    applyInPandas is the deliberate exception for order-dependent
    stateful recursion."""
    import pandas as pd

    from storm_data_etl_spark.streaming.stateful import (
        CHANGE_DETECT_ZERO,
        change_detect_fold,
    )

    ev = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
            & ~F.isnan("value")
        )
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts_utc")).alias("batch_h"),
            F.col("ts_ns"),
            "event_id",
            "value",
            F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("_shard"),
        )
    )
    schema = (
        "user_id long, batch_h timestamp, prev double, curr double, "
        "jump double"
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cols = ["user_id", "batch_h", "prev", "curr", "jump"]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        uids = pdf["user_id"].to_numpy()
        bh = pdf["batch_h"].to_numpy()
        order = np.lexsort(
            (pdf["event_id"].to_numpy(), pdf["ts_ns"].to_numpy(), bh, uids)
        )
        uids, bh = uids[order], bh[order]
        vals = pdf["value"].to_numpy(dtype=float)[order]
        out = []
        boundary = np.r_[True, (uids[1:] != uids[:-1]) | (bh[1:] != bh[:-1])]
        starts = np.flatnonzero(boundary)
        bounds = np.r_[starts, len(bh)]
        state = CHANGE_DETECT_ZERO
        prev_uid = None
        for i, s in enumerate(starts):
            if uids[s] != prev_uid:
                state = CHANGE_DETECT_ZERO  # new key: fresh state
                prev_uid = uids[s]
            state, emits = change_detect_fold(
                state, [float(x) for x in vals[s : bounds[i + 1]]], 100.0
            )
            out.extend((uids[s], bh[s], p, c, j) for p, c, j in emits)
        return pd.DataFrame(out, columns=cols)

    trace = ev.groupBy("_shard").applyInPandas(replay, schema)
    return trace.select(
        "user_id",
        "batch_h",
        F.floor(F.col("prev") * 10000).cast("bigint").alias("prev_e4"),
        F.floor(F.col("curr") * 10000).cast("bigint").alias("curr_e4"),
        F.floor(F.col("jump") * 10000).cast("bigint").alias("jump_e4"),
    )


@register(
    "stream_replay_cusum",
    """
    WITH ev AS (
      SELECT event_type, date_trunc('hour', ts) AS batch_h, event_id,
             CAST(floor("value" * 10000 + 0.5) AS BIGINT) - 2500000 AS dev
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
        AND "value" IS NOT NULL AND NOT isnan("value")
    ),
    pfx AS (
      SELECT event_type, batch_h,
             CAST(sum(dev) OVER wo AS BIGINT) AS p,
             row_number() OVER wo AS rn
      FROM ev
      WINDOW wo AS (PARTITION BY event_type ORDER BY batch_h, event_id
                    ROWS UNBOUNDED PRECEDING)
    ),
    clamped AS (
      SELECT event_type, batch_h, rn,
             p - least(0, min(p) OVER wk) AS s_pos,
             greatest(0, max(p) OVER wk) - p AS s_neg
      FROM pfx
      WINDOW wk AS (PARTITION BY event_type ORDER BY rn
                    ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, batch_h,
           CAST(rn AS BIGINT) AS n_events,
           CAST(s_pos AS BIGINT) AS cusum_pos_e4,
           CAST(s_neg AS BIGINT) AS cusum_neg_e4
    FROM clamped
    QUALIFY rn = max(rn) OVER (PARTITION BY event_type, batch_h)
    """,
)
def stream_replay_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth streaming replay certificate: the Page CUSUM kernel
    (streaming/stateful.streaming_cusum). Replays hour-bucket
    micro-batches per event type through the EXACT extracted fold
    (cusum_fold) with the kernel's own quantization
    (dev = floor(v*1e4 + 0.5) - k_e4, k = 250.0 frozen inside the
    fixture value domain) and emits the kernel's per-batch snapshot
    (n_events, S+, S-).

    The oracle has NO loop: Page's clamp recursion
    s_n = max(0, s_{n-1} + d_n) has the closed drawdown form
    s_n = p_n - min(0, min_{j<=n} p_j) over prefix sums p (and the
    negative side mirrors via the running MAX), so the twin is two keyed
    windows over exact BIGINTs — a wrong clamp, wrong batch slicing, or
    state reset at a batch boundary shifts every later snapshot and
    breaks the hash. All-integer: zero quantization envelope beyond the
    kernel's own dev rounding.

    Scale shape: ONE shuffle on the key shard; the oracle is two keyed
    windows + a QUALIFY. The event-type key space is vocabulary-bounded,
    so per-key fold state is O(1) and snapshots are O(keys x batches)."""
    import math as _math

    import pandas as pd

    from storm_data_etl_spark.streaming.stateful import CUSUM_ZERO, cusum_fold

    k_e4 = 2_500_000
    ev = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
            & ~F.isnan("value")
        )
        .select(
            "event_type",
            F.date_trunc("hour", F.col("ts_utc")).alias("batch_h"),
            "event_id",
            "value",
            F.pmod(F.xxhash64("event_type"), F.lit(64)).alias("_shard"),
        )
    )
    schema = (
        "event_type string, batch_h timestamp, n_events long, "
        "cusum_pos_e4 long, cusum_neg_e4 long"
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cols = ["event_type", "batch_h", "n_events", "cusum_pos_e4", "cusum_neg_e4"]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        codes, etypes = pd.factorize(pdf["event_type"])
        bh = pdf["batch_h"].to_numpy()
        order = np.lexsort((pdf["event_id"].to_numpy(), bh, codes))
        codes, bh = codes[order], bh[order]
        vals = pdf["value"].to_numpy(dtype=float)[order]
        out = []
        boundary = np.r_[True, (codes[1:] != codes[:-1]) | (bh[1:] != bh[:-1])]
        starts = np.flatnonzero(boundary)
        bounds = np.r_[starts, len(bh)]
        state = CUSUM_ZERO
        prev_code = None
        for i, s in enumerate(starts):
            if codes[s] != prev_code:
                state = CUSUM_ZERO  # new key: fresh state
                prev_code = codes[s]
            devs = [
                int(_math.floor(float(x) * 10000 + 0.5)) - k_e4
                for x in vals[s : bounds[i + 1]]
            ]
            state = cusum_fold(state, devs)
            out.append((etypes[codes[s]], bh[s], state[2], state[0], state[1]))
        return pd.DataFrame(out, columns=cols)

    return ev.groupBy("_shard").applyInPandas(replay, schema)


@register(
    "stream_replay_attribution",
    """
    WITH ev AS (
      SELECT user_id, event_id, ts FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
    ),
    imp AS (
      SELECT user_id, event_id AS imp_id, ts AS imp_ts,
             date_trunc('hour', ts)
               + to_hours(CAST(event_id % 3 AS BIGINT)) AS arr_h
      FROM ev WHERE event_id % 2 = 0
    ),
    conv AS (
      SELECT user_id, event_id AS conv_id, ts AS conv_ts,
             date_trunc('hour', ts)
               + to_hours(CAST(event_id % 4 AS BIGINT)) AS arr_h
      FROM ev WHERE event_id % 2 = 1
    )
    SELECT i.user_id, i.imp_id, c.conv_id,
           greatest(i.arr_h, c.arr_h) AS emit_h,
           CASE WHEN i.arr_h = c.arr_h THEN 0
                WHEN c.arr_h > i.arr_h THEN 1
                ELSE 2 END AS late_side
    FROM imp i JOIN conv c
      ON i.user_id = c.user_id
     AND c.conv_ts >= i.imp_ts
     AND c.conv_ts <= i.imp_ts + INTERVAL 1 HOUR
    """,
)
def stream_replay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth streaming replay certificate (VERDICT r10 task 5): the
    stream-stream attribution join — the last streaming surface proven
    only by unit tests. streaming/joins.attribution_join is Spark's
    built-in watermarked two-sided join, so unlike the five kernel
    certificates there is no custom production fold to share; instead
    streaming/stateful.attribution_fold MODELS the join contract (buffer
    both sides; a match emits in the micro-batch where the LATER side
    arrives), tests/test_streaming.py pins the model against the real
    streaming join on crafted cross-batch arrivals, and this replay
    hash-pins the model at scale against a DuckDB twin with no batch
    machinery.

    Replay construction: events split by event_id parity into impressions
    and conversions (conversion attributable within 1 h of the
    impression); ARRIVAL is deliberately skewed off event time
    (event-hour + event_id % 3 hours for impressions, % 4 for
    conversions) so both late-arrival directions occur — at sf0.01 the
    trace carries 18 impression-late and 180 conversion-late matches, so
    a per-batch state reset on EITHER side's buffer (the r8
    chunk-boundary bug class) loses real matches and breaks the hash.
    Each emitted row carries WHEN it emitted (emit_h = the later arrival
    batch) and WHICH side was buffered (late_side 0/1/2), so a match
    emitted in the wrong batch — not just a lost match — also breaks the
    hash. All-integer ns arithmetic: zero quantization envelope.

    Eviction is out of scope by declaration: the certificate assumes a
    watermark at least the worst-case RELATIVE lateness between matched
    sides, which here is ~4 h (conversion arrival skew up to 3 h, on an
    event up to 1 h after an impression whose own skew can be 0) — NOT
    the 2 h production default, under which Spark could evict some of
    these matches (ADVICE r11). Inside any watermark >= 4 h, Spark
    guarantees no match loss, so the fold's buffer-both-sides model and
    the join agree on every row this replay carries.

    Scale shape: ONE shuffle on the user shard (the state-store
    partitioning the real join uses — a key's rows never split across
    shards); per-key buffered state is bounded by the key's row count
    exactly like the join's own state store. Arrow-batched applyInPandas
    is the deliberate exception for order-dependent stateful replay."""
    import pandas as pd

    from storm_data_etl_spark.streaming.stateful import (
        ATTRIBUTION_ZERO,
        attribution_fold,
    )

    hour_ns = 3_600 * 10**9
    ev = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "user_id",
            "event_id",
            F.col("ts_ns"),
            (F.col("event_id") % 2 == 0).cast("int").alias("is_imp"),
            # arrival batch in epoch-ns: event hour + parity-dependent skew
            (
                F.col("ts_ns")
                - F.pmod(F.col("ts_ns"), F.lit(hour_ns))
                + F.when(
                    F.col("event_id") % 2 == 0, F.col("event_id") % 3
                ).otherwise(F.col("event_id") % 4)
                * F.lit(hour_ns)
            ).alias("arr_ns"),
            F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("_shard"),
        )
    )
    schema = (
        "user_id long, imp_id long, conv_id long, emit_h timestamp, "
        "late_side int"
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        # Optimization r12 (guide §4.2): one numpy lexsort + boundary scan
        # replaces the nested pandas groupbys and row loops that dominated
        # this certificate's cost; attribution_fold still runs once per
        # (user, arrival-batch) — the certificate's subject is unchanged.
        import numpy as np

        cols = ["user_id", "imp_id", "conv_id", "emit_h", "late_side"]
        if len(pdf) == 0:
            res = pd.DataFrame(columns=cols)
            res["emit_h"] = pd.to_datetime(res["emit_h"], unit="ns")
            return res
        uid = pdf["user_id"].to_numpy()
        arr = pdf["arr_ns"].to_numpy()
        ts = pdf["ts_ns"].to_numpy()
        eid = pdf["event_id"].to_numpy()
        imp = pdf["is_imp"].to_numpy()
        order = np.lexsort((eid, ts, arr, uid))
        uid, arr, ts, eid, imp = (
            uid[order],
            arr[order],
            ts[order],
            eid[order],
            imp[order],
        )
        n = len(uid)
        # slice boundaries: new user OR new arrival batch within a user
        user_brk = np.flatnonzero(uid[1:] != uid[:-1]) + 1
        batch_brk = np.flatnonzero(
            (uid[1:] != uid[:-1]) | (arr[1:] != arr[:-1])
        ) + 1
        starts = np.concatenate(([0], batch_brk))
        ends = np.concatenate((batch_brk, [n]))
        user_start = set(np.concatenate(([0], user_brk)).tolist())
        ts_l, eid_l, imp_l = ts.tolist(), eid.tolist(), imp.tolist()
        out = []
        state = ATTRIBUTION_ZERO
        arr_of: dict[int, int] = {}
        for s, e in zip(starts.tolist(), ends.tolist()):
            if s in user_start:
                state = ATTRIBUTION_ZERO
                arr_of = {}
            a = int(arr[s])
            imps, convs = [], []
            for i in range(s, e):
                (imps if imp_l[i] else convs).append((ts_l[i], eid_l[i]))
                arr_of[eid_l[i]] = a
            state, matches = attribution_fold(state, imps, convs, hour_ns)
            if matches:
                u = int(uid[s])
                for iid, cid in matches:
                    ia, ca = arr_of[iid], arr_of[cid]
                    late = 0 if ia == ca else (1 if ca > ia else 2)
                    out.append((u, iid, cid, a, late))
        res = pd.DataFrame(out, columns=cols)
        res["emit_h"] = pd.to_datetime(res["emit_h"], unit="ns")
        return res

    return ev.groupBy("_shard").applyInPandas(replay, schema)


@register(
    "attribution_lateness_profile",
    """
    WITH ev AS (
      SELECT user_id, event_id, ts FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
    ),
    imp AS (
      SELECT user_id, ts AS imp_ts,
             date_trunc('hour', ts)
               + to_hours(CAST(event_id % 3 AS BIGINT)) AS arr_h
      FROM ev WHERE event_id % 2 = 0
    ),
    conv AS (
      SELECT user_id, ts AS conv_ts,
             date_trunc('hour', ts)
               + to_hours(CAST(event_id % 4 AS BIGINT)) AS arr_h
      FROM ev WHERE event_id % 2 = 1
    ),
    m AS (
      SELECT CAST(abs(epoch(c.arr_h) - epoch(i.arr_h)) / 3600 AS BIGINT)
               AS lateness_h
      FROM imp i JOIN conv c
        ON i.user_id = c.user_id
       AND c.conv_ts >= i.imp_ts
       AND c.conv_ts <= i.imp_ts + INTERVAL 1 HOUR
    ),
    prof AS (
      SELECT lateness_h, count(*) AS n_matches FROM m GROUP BY lateness_h
    )
    SELECT lateness_h, n_matches,
           CAST(SUM(n_matches) OVER (ORDER BY lateness_h) AS BIGINT)
             AS retained_cum,
           CAST(FLOOR(
             CAST(SUM(n_matches) OVER (ORDER BY lateness_h) AS BIGINT)
               * 1000000.0
               / CAST(SUM(n_matches) OVER () AS BIGINT)
           ) AS BIGINT) AS retained_ppm
    FROM prof
    """,
)
def attribution_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing profile for the attribution join (round 12, from
    ADVICE r11): the distribution of RELATIVE lateness between the two
    sides of each matched impression/conversion pair — the quantity a
    stream-stream join's watermark must dominate to retain the match.
    One row per whole-hour lateness bucket with the match count, the
    cumulative matches retained by a watermark of that many hours, and
    that share in ppm — i.e. "watermark 2 h retains retained_ppm/1e6 of
    matches; the max lateness_h row is the minimal loss-free watermark".
    On this trace the worst case is 4 h (conversion skew up to 3 h on an
    event up to 1 h after an impression with skew 0), which is exactly
    the bound stream_replay_attribution's certificate scope assumes and
    the ADVICE r11 docstring correction documents; this query turns that
    static analysis into a measured, oracle-backed artifact a deployer
    can run on their own arrival trace.

    Scale shape: one shuffle join on user_id (the state-store keying the
    real join uses), map-side-combinable aggregation to <= max-skew+2
    rows; the cumulative window runs UNKEYED but on that provably tiny
    post-aggregation frame (bounded by the skew construction, not the
    data volume). All-integer ns arithmetic; the ppm share is
    floor-quantized so both engines compute it identically."""
    hour_ns = 3_600 * 10**9
    ev = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select("user_id", "event_id", "ts_ns")
    )

    def side(parity: int, mod: int, prefix: str) -> DataFrame:
        return ev.filter(F.col("event_id") % 2 == parity).select(
            F.col("user_id").alias(f"{prefix}_uid"),
            F.col("ts_ns").alias(f"{prefix}_ts"),
            (
                F.col("ts_ns")
                - F.pmod(F.col("ts_ns"), F.lit(hour_ns))
                + (F.col("event_id") % mod) * F.lit(hour_ns)
            ).alias(f"{prefix}_arr"),
        )

    imp, conv = side(0, 3, "imp"), side(1, 4, "conv")
    m = imp.join(
        conv,
        (F.col("imp_uid") == F.col("conv_uid"))
        & (F.col("conv_ts") >= F.col("imp_ts"))
        & (F.col("conv_ts") <= F.col("imp_ts") + F.lit(hour_ns)),
    ).select(
        (F.abs(F.col("conv_arr") - F.col("imp_arr")) / F.lit(hour_ns))
        .cast("long")
        .alias("lateness_h")
    )
    prof = m.groupBy("lateness_h").agg(F.count(F.lit(1)).alias("n_matches"))
    cum_w = Window.orderBy("lateness_h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot_w = Window.orderBy("lateness_h").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return prof.select(
        "lateness_h",
        "n_matches",
        F.sum("n_matches").over(cum_w).alias("retained_cum"),
        F.floor(
            F.sum("n_matches").over(cum_w)
            * F.lit(1_000_000.0)
            / F.sum("n_matches").over(tot_w)
        ).alias("retained_ppm"),
    )


@register(
    "cochran_armitage_trend",
    """
    WITH q AS (
      SELECT event_type,
             CAST(user_id % 4 AS BIGINT) AS w,
             CASE WHEN "value" >= 250.0 THEN 1 ELSE 0 END AS y
      FROM events
      WHERE "value" IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS a,
             CAST(sum(w * y) AS BIGINT) AS t_w,
             CAST(sum(w) AS BIGINT) AS w1,
             CAST(sum(w * w) AS BIGINT) AS w2
      FROM q GROUP BY event_type
    )
    SELECT event_type, n, a, t_w,
           CAST(n * t_w - a * w1 AS BIGINT) AS num,
           CASE WHEN a = 0 OR a = n OR n * w2 - w1 * w1 <= 0 THEN NULL
                ELSE CAST(floor(1000000.0 * (((n * t_w - a * w1)
                     * sqrt(CAST(n AS DOUBLE))
                     / sqrt(CAST(a * (n - a) AS DOUBLE)))
                     / sqrt(CAST(n * w2 - w1 * w1 AS DOUBLE)))) AS BIGINT)
           END AS z_e6
    FROM g
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test (Cochran 1954; Armitage 1955) per event
    type: is the success proportion (value >= 250, the fixture-scaled
    outcome convention) MONOTONE in an ordered exposure dose
    (user_id % 4 with standard scores 0..3 — the repo's arm convention
    extended to four arms)? Completes the categorical A/B family:
    mcnemar (paired 2x2), mantel_haenszel (stratified 2x2), cochran-
    armitage (ordered k x 2 dose-response) — the test run before
    claiming "more exposure, more conversions".

    z = (N*T - A*W1) * sqrt(N / (A(N-A)(N*W2 - W1^2))) with T = sum w*y,
    W1 = sum w, W2 = sum w^2 — every sum an exact BIGINT from one
    conditional-aggregate scan. The denominator is NOT materialized as
    one integer: A(N-A)*(N*W2-W1^2) exceeds BIGINT near N ~ 1e5 rows/
    type (DuckDB would widen to HUGEINT while Spark wraps — the doremi
    r9 bug class), so z is evaluated as num * sqrt(N) / sqrt(A(N-A)) /
    sqrt(N*W2 - W1^2), each factor individually BIGINT-safe to N ~ 3e9
    rows/type, with the staged expression mirrored verbatim on both
    engines and floor-quantized e6. Degenerate arms (all-success,
    all-failure, single dose group) are explicit NULLs. Uncorrected
    form (no continuity correction), stated.

    Scale shape: ONE scan, one keyed conditional aggregate, zero joins,
    zero windows — the friedman shape."""
    q = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select(
            "event_type",
            (F.col("user_id") % 4).cast("bigint").alias("w"),
            F.when(F.col("value") >= 250.0, 1).otherwise(0).alias("y"),
        )
    )
    g = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("a"),
        F.sum(F.col("w") * F.col("y")).cast("bigint").alias("t_w"),
        F.sum("w").cast("bigint").alias("w1"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("w2"),
    )
    num = F.col("n") * F.col("t_w") - F.col("a") * F.col("w1")
    den2 = F.col("n") * F.col("w2") - F.col("w1") * F.col("w1")
    z = (
        F.when(
            (F.col("a") == 0) | (F.col("a") == F.col("n")) | (den2 <= 0),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(
                1000000.0
                * (
                    (
                        num
                        * F.sqrt(F.col("n").cast("double"))
                        / F.sqrt((F.col("a") * (F.col("n") - F.col("a"))).cast("double"))
                    )
                    / F.sqrt(den2.cast("double"))
                )
            ).cast("bigint")
        )
    )
    return g.select(
        "event_type",
        "n",
        "a",
        "t_w",
        num.cast("bigint").alias("num"),
        z.alias("z_e6"),
    )


@register(
    "mann_kendall_trend",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE "value" IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day
      GROUP BY 1
    ),
    nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM daily GROUP BY 1),
    ties AS (
      SELECT event_type,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY 1, 2) g
      WHERE t > 1
      GROUP BY event_type
    )
    SELECT n.event_type,
           n.n AS n_days,
           coalesce(p.s, 0) AS s_stat,
           CAST(n.n * (n.n - 1) * (2 * n.n + 5) - coalesce(t.tie_term, 0)
                AS BIGINT) AS var18,
           CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5)
                     - coalesce(t.tie_term, 0) <= 0 THEN NULL
                WHEN coalesce(p.s, 0) > 0
                THEN CAST(floor(1000000.0 * (coalesce(p.s, 0) - 1)
                     / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                             - coalesce(t.tie_term, 0)) / 18.0)) AS BIGINT)
                WHEN coalesce(p.s, 0) < 0
                THEN CAST(floor(1000000.0 * (coalesce(p.s, 0) + 1)
                     / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                             - coalesce(t.tie_term, 0)) / 18.0)) AS BIGINT)
                ELSE 0 END AS z_e6
    FROM nn n LEFT JOIN pairs p USING (event_type)
              LEFT JOIN ties t USING (event_type)
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test (Mann 1945; Kendall 1975) per event type
    over the daily cents series — the SIGNIFICANCE companion the trend
    family was missing: theil_sen_trend estimates a robust slope,
    trend_slope_by_type fits least squares, but nothing answered "is
    there a monotonic trend at all". S = sum of sign(x_j - x_i) over all
    day pairs i<j; the tie-corrected variance
    Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18 (the standard
    correction, Kendall 1975 §4), and the continuity-corrected normal
    score z = (S -/+ 1)/sqrt(Var) with the all-tied / single-day
    degenerate cases as a NULL arm.

    Exactness: the daily series quantizes to integer cents first, so S,
    n, and 18*Var are EXACT BIGINTs (sign comparisons and tie-group
    cubes never touch floats); z is one closed-form double over two
    exact scalars, floor-quantized e6 — the welch discipline. Capacity:
    var18 ~ 2n^3 + tie cubes <= 4n^3 -> BIGINT headroom past 1e6 days
    (2,700 years of dailies); S bounded by n^2/2.

    Scale shape: the corpus collapses to the (event_type x day) rollup
    before anything quadratic — the O(n^2) pair census runs on the
    vocabulary-bounded daily table (AQE broadcasts it against itself),
    exactly the bounded-rollup discipline hits/friedman use. At 100 TB
    the only corpus-sized stage is the daily aggregate's one shuffle."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts_utc")).alias("day")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    daily = _pin(daily)  # one rollup feeds the pair census, n, and ties
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") > F.col("a.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.cents") > F.col("a.cents"), 1)
                .when(F.col("b.cents") < F.col("a.cents"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ties = (
        daily.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    m = (
        nn.join(pairs, "event_type", "left")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.coalesce(F.col("s"), F.lit(0)).cast("bigint").alias("s_stat"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            )
            .cast("bigint")
            .alias("var18"),
        )
    )
    sd = F.sqrt(F.col("var18") / 18.0)
    z = (
        F.when(F.col("var18") <= 0, F.lit(None).cast("bigint"))
        .when(
            F.col("s_stat") > 0,
            F.floor(1000000.0 * (F.col("s_stat") - 1) / sd).cast("bigint"),
        )
        .when(
            F.col("s_stat") < 0,
            F.floor(1000000.0 * (F.col("s_stat") + 1) / sd).cast("bigint"),
        )
        .otherwise(F.lit(0))
    )
    return m.select("event_type", "n_days", "s_stat", "var18", z.alias("z_e6"))


@register(
    "forecast_mase_backtest",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE "value" IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, cents,
             lag(cents, 1) OVER w AS l1,
             lag(cents, 7) OVER w AS l7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(count(l1) AS BIGINT) AS cnt1,
             CAST(coalesce(sum(abs(cents - l1)), 0) AS BIGINT) AS sae1,
             CAST(count(l7) AS BIGINT) AS cnt7,
             CAST(coalesce(sum(abs(cents - l7)), 0) AS BIGINT) AS sae7
      FROM lagged GROUP BY event_type
    )
    SELECT event_type, n_days, cnt1, sae1, cnt7, sae7,
           CASE WHEN sae1 = 0 OR cnt7 = 0 THEN NULL
                ELSE (1000000 * sae7 * cnt1) // (sae1 * cnt7)
           END AS mase_snaive_e6
    FROM g
    """,
)
def forecast_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE backtest of the weekly seasonal-naive forecaster against the
    one-step naive scale (Hyndman & Koehler 2006, public literature) —
    the forecast-ACCURACY primitive the time-series family was missing
    (holt_trend_forecast / theil_sen_trend produce forecasts; nothing
    scored one): MASE = MAE(seasonal-naive, m=7) / MAE(naive, 1-step)
    per event type, over the daily cents series. MASE < 1e6 (scaled)
    means weekly seasonality genuinely beats persistence — the go/no-go
    gate before shipping a seasonal model.

    Lags are over OBSERVED days in day order (a gap day shifts the
    7-row lag off calendar alignment — acceptable for dense daily
    series, documented; gapfill_forward_fill is the densifier to
    compose upstream if a sparse series needs calendar lags).

    Exactness: daily totals quantize to integer cents before summing;
    absolute errors and both MAE numerators stay exact BIGINTs; the
    final ratio is one cross-multiplied integer division
    (1e6 * sae7 * cnt1) div (sae1 * cnt7) — all positive, so Spark's
    `div` and DuckDB's `//` agree with floor. Bound: 1e6 * sae7 * cnt1
    < 2^63 -> sae7 * cnt1 < 9.2e12, comfortable for years of daily
    cents at test scales; recast to DECIMAL(38,0) for cluster-scale
    totals (the pass_at_k discipline).

    Scale shape: one groupBy(type, day) shuffle, one type-keyed window
    over day counts (bounded frames), one type-keyed rollup."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts_utc")).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "cents",
        F.lag("cents", 1).over(w).alias("l1"),
        F.lag("cents", 7).over(w).alias("l7"),
    )
    g = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.count("l1").cast("bigint").alias("cnt1"),
        F.coalesce(F.sum(F.abs(F.col("cents") - F.col("l1"))), F.lit(0))
        .cast("bigint")
        .alias("sae1"),
        F.count("l7").cast("bigint").alias("cnt7"),
        F.coalesce(F.sum(F.abs(F.col("cents") - F.col("l7"))), F.lit(0))
        .cast("bigint")
        .alias("sae7"),
    )
    return g.select(
        "event_type",
        "n_days",
        "cnt1",
        "sae1",
        "cnt7",
        "sae7",
        F.when(
            (F.col("sae1") == 0) | (F.col("cnt7") == 0),
            F.lit(None).cast("bigint"),
        )
        .otherwise(F.expr("(1000000 * sae7 * cnt1) div (sae1 * cnt7)"))
        .cast("bigint")
        .alias("mase_snaive_e6"),
    )


@register(
    "xcorr_lead_lag",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE "value" IS NOT NULL
        AND event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ),
    lags AS (SELECT unnest([0, 1, 7]) AS k),
    aligned AS (
      SELECT l.k, a.cents AS x, b.cents AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b
        ON b.event_type = 'purchase'
       AND b.d = a.d + CAST(l.k || ' days' AS INTERVAL)
      WHERE a.event_type = 'click'
    ),
    s AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM aligned GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS k, n_days,
           CASE WHEN n_days < 2
                  OR n_days * sxx - sx * sx = 0
                  OR n_days * syy - sy * sy = 0 THEN NULL
                ELSE CAST(floor(CAST(1000000 AS DOUBLE)
                  * CAST(n_days * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))))
                  AS BIGINT)
           END AS xcorr_e6
    FROM s
    """,
)
def xcorr_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the click and purchase daily
    cents series at lags k = 0, 1, 7 days (does click activity today
    predict purchase activity k days later?) — the pairwise companion to
    acf_lag_profile's autocorrelation and the discovery primitive behind
    attribution/forecast-feature selection. Pearson r at each lag over
    CALENDAR-aligned days (the join is on d + k, so gap days drop the
    pair rather than silently shifting the series — the opposite
    trade-off from forecast_mase_backtest's row-lag, both documented).

    Exactness: daily totals are exact integer cents; all five
    co-moment sums are exact BIGINTs (bound: days * max_daily_cents^2
    < 2^63 — decades of 9-figure daily totals); r is closed-form
    per-row doubles over those integers with sqrt(dx)*sqrt(dy) (two
    correctly-rounded sqrts, deterministic cross-engine — never
    sqrt(dx*dy), whose product would overflow int64 first). Degenerate
    (constant-series or <2-day) lags emit NULL.

    Scale shape: one groupBy(type, day) shuffle; the lag table is a
    3-row broadcast fan-out; the align join keys on the (bounded) day
    domain; final rollup is 3 rows."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", F.col("ts_utc"))).alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    daily = _pin(daily)  # both legs of the align join
    lags = spark.createDataFrame([(0,), (1,), (7,)], "k int")
    a = daily.filter(F.col("event_type") == "click").select(
        F.col("d").alias("da"), F.col("cents").alias("x")
    )
    b = daily.filter(F.col("event_type") == "purchase").select(
        F.col("d").alias("db"), F.col("cents").alias("y")
    )
    aligned = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.expr("date_add(da, k)"))
        .select("k", "x", "y")
    )
    s = aligned.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    dx = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    bad = (F.col("n_days") < 2) | (dx == 0) | (dy == 0)
    r = F.floor(
        F.lit(1000000).cast("double")
        * num.cast("double")
        / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double")))
    ).cast("bigint")
    return s.select(
        F.col("k").cast("bigint").alias("k"),
        "n_days",
        F.when(bad, F.lit(None).cast("bigint")).otherwise(r).alias("xcorr_e6"),
    )


@register(
    "cuped_adjusted_lift",
    """
    WITH u AS (
      SELECT user_id,
             CAST(user_id % 2 AS BIGINT) AS treat,
             CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(floor("value" * 100) AS BIGINT) END), 0)
               AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(floor("value" * 100) AS BIGINT) END), 0)
               AS BIGINT) AS y
      FROM events
      WHERE "value" IS NOT NULL AND user_id IS NOT NULL
      GROUP BY user_id
    ),
    s AS (
      SELECT
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
        CAST(sum(y * y) AS BIGINT) AS syy,
        CAST(sum(CASE WHEN treat = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
        CAST(sum(CASE WHEN treat = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
      FROM u
    )
    SELECT n, n1,
           CAST(floor(CAST(10000 AS DOUBLE) * (
             CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(sy - sy1 AS DOUBLE) / CAST(n - n1 AS DOUBLE)
           ) / CAST(100 AS DOUBLE)) AS BIGINT) AS raw_lift_e4,
           CAST(floor(CAST(1000000 AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS theta_e6,
           CAST(floor(CAST(10000 AS DOUBLE) * (
             (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(sy - sy1 AS DOUBLE) / CAST(n - n1 AS DOUBLE))
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE))
               * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(sx - sx1 AS DOUBLE) / CAST(n - n1 AS DOUBLE))
           ) / CAST(100 AS DOUBLE)) AS BIGINT) AS cuped_lift_e4,
           CAST(floor(CAST(1000000 AS DOUBLE)
             * (CAST(n * sxy - sx * sy AS DOUBLE)
                * CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
             AS var_reduction_e6
    FROM s
    """,
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi & Walker
    2013, public literature) — the industry-standard A/B adjustment: per
    user, x = pre-period metric (cents before Jan 16), y = experiment
    metric (cents after); theta = cov(x,y)/var(x) fitted on the pooled
    population; the adjusted lift subtracts theta * (pre-period arm
    imbalance) from the raw lift, and the variance reduction equals the
    squared x-y correlation (rho^2). Arms are the deterministic
    user_id % 2 split. Completes the experimentation family: welch/
    mann-whitney test the difference, effect_size_panel standardizes it,
    this one SHRINKS its variance with pre-period data.

    Exactness: per-user cents are exact integers; ALL co-moments (sxx,
    sxy, syy, per-arm sums) are exact BIGINTs from one conditional
    aggregate over the per-user rollup; theta/lifts/rho^2 are closed-form
    per-row doubles over those integers with identical expression trees
    (divides only — no transcendentals, no float aggregation). Bound:
    n * sxy < 2^63 — ~1e9 users at 1e5-cent user totals (the welch
    class of documented bound). Lifts are floored e4 DOLLARS
    (cents / 100).

    Scale shape: one groupBy(user_id) shuffle (the per-user rollup),
    then a 1-row conditional aggregate; nothing else."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    cents = F.floor(F.col("value") * 100).cast("bigint")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts_utc") < cutoff, cents)), F.lit(0)
        )
        .cast("bigint")
        .alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("ts_utc") >= cutoff, cents)), F.lit(0)
        )
        .cast("bigint")
        .alias("y"),
    ).withColumn("treat", (F.col("user_id") % 2).cast("bigint"))
    s = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.when(F.col("treat") == 1, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sx1"),
        F.sum(F.when(F.col("treat") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy1"),
    )
    nd = F.col("n").cast("double")
    n1d = F.col("n1").cast("double")
    n0d = (F.col("n") - F.col("n1")).cast("double")
    ym1 = F.col("sy1").cast("double") / n1d
    ym0 = (F.col("sy") - F.col("sy1")).cast("double") / n0d
    xm1 = F.col("sx1").cast("double") / n1d
    xm0 = (F.col("sx") - F.col("sx1")).cast("double") / n0d
    covn = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varn = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    theta = covn / varn
    e4 = F.lit(10000).cast("double")
    e6 = F.lit(1000000).cast("double")
    hundred = F.lit(100).cast("double")
    return s.select(
        "n",
        "n1",
        F.floor(e4 * (ym1 - ym0) / hundred).cast("bigint").alias("raw_lift_e4"),
        F.floor(e6 * theta).cast("bigint").alias("theta_e6"),
        F.floor(e4 * ((ym1 - ym0) - theta * (xm1 - xm0)) / hundred)
        .cast("bigint")
        .alias("cuped_lift_e4"),
        F.floor(e6 * (covn * covn) / (varn * vary))
        .cast("bigint")
        .alias("var_reduction_e6"),
    )


@register(
    "km_survival_curve",
    """
    WITH e AS (
      SELECT user_id, epoch_ns(ts) AS tsn, event_id
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    g AS (
      SELECT user_id, tsn,
             CASE WHEN lag(tsn) OVER w IS NULL
                    OR tsn - lag(tsn) OVER w > 1800000000000
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
    ),
    sid AS (
      SELECT user_id, tsn,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY tsn
                                    ROWS UNBOUNDED PRECEDING) AS s
      FROM g
    ),
    mx AS (SELECT max(tsn) AS max_tsn FROM e),
    sess AS (
      SELECT (max(tsn) - min(tsn)) // 60000000000 AS dur,
             CASE WHEN (SELECT max_tsn FROM mx) - max(tsn) > 1800000000000
                  THEN 1 ELSE 0 END AS death
      FROM sid GROUP BY user_id, s
    ),
    byd AS (
      SELECT dur, CAST(sum(death) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS total
      FROM sess GROUP BY dur
    ),
    risk AS (
      SELECT dur, d,
             CAST(sum(total) OVER (ORDER BY dur DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS n_risk
      FROM byd
    ),
    steps AS (
      SELECT dur, d, n_risk,
             row_number() OVER (ORDER BY dur) AS rn
      FROM risk WHERE d > 0
    ),
    arr AS (
      SELECT list(struct_pack(d := d, n := n_risk) ORDER BY rn) AS a
      FROM steps
    )
    SELECT CAST(s.dur AS BIGINT) AS t_min, s.n_risk, s.d,
           CAST(floor(CAST(1000000 AS DOUBLE) * list_reduce(
             list_prepend(CAST(1 AS DOUBLE),
               list_transform(a[1:s.rn],
                 x -> CAST(1 AS DOUBLE)
                      - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
             (acc, f) -> acc * f)) AS BIGINT) AS surv_e6
    FROM steps s CROSS JOIN arr
    """,
)
def km_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival curve (Kaplan & Meier 1958,
    public literature) over SESSION lifetimes — the survival/churn
    primitive the engine lacked. Subjects are 30-min-gap sessions (the
    sessionize convention); a session's duration is last-minus-first
    event in whole minutes, and a session whose last event is within one
    gap of the global max timestamp could still be running — it is
    RIGHT-CENSORED, shrinking future risk sets without contributing a
    death, which is the entire point of KM over a naive duration
    histogram. Emits one row per death time: t, risk-set size n, deaths
    d, and S(t) = prod_{j<=i} (1 - d_j/n_j) scaled e6.

    Exactness: session bounds, durations, deaths and risk sets are exact
    integers (ns timestamps; the risk set is a suffix sum over the
    duration rollup); S(t) is an ORDERED left fold of (1 - d/n) factors
    from a 1.0 seed with identical expression trees on both engines —
    the ewma_last/elo/stream-replay discipline: identical lists folded
    in identical order make the running double bit-identical. No
    transcendentals anywhere.

    Scale shape: one user-keyed window pass builds sessions (the
    sessionize shuffle), one groupBy(user, session) rollup, then
    everything lives on the duration rollup — bounded by the longest
    session in minutes, never session- or event-scale. The per-step
    prefix fold is O(k^2) over those k bounded rows via a broadcast
    1-row step array — deliberately quadratic on a provably tiny set to
    stay in pure JVM expressions (the mann_whitney bounded-window
    class)."""
    gap_ns = 30 * 60 * 1_000_000_000
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    g = ev.select(
        "user_id",
        "ts_ns",
        F.when(
            F.lag("ts_ns").over(w).isNull()
            | ((F.col("ts_ns") - F.lag("ts_ns").over(w)) > gap_ns),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sid = g.withColumn("s", F.sum("new_session").over(ws))
    s0 = sid.groupBy("user_id", "s").agg(
        F.min("ts_ns").alias("smin"), F.max("ts_ns").alias("smax")
    )
    # the global max timestamp equals max over session ends (every event
    # belongs to a session), so derive it from the pinned session rollup
    # instead of a second events scan.
    s0 = _pin(s0)
    mx = s0.agg(F.max("smax").alias("max_tsn"))
    sess = (
        s0.crossJoin(F.broadcast(mx))
        .select(
            # integer div, never / : double division of int64 ns carries
            # rounding error across the minute boundary (the tables.py
            # ts_utc lesson)
            F.expr("(smax - smin) div 60000000000").alias("dur"),
            F.when(F.col("max_tsn") - F.col("smax") > gap_ns, 1)
            .otherwise(0)
            .alias("death"),
        )
    )
    byd = sess.groupBy("dur").agg(
        F.sum("death").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("total"),
    )
    w_desc = (
        Window.orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = byd.withColumn("n_risk", F.sum("total").over(w_desc).cast("bigint"))
    steps = risk.filter(F.col("d") > 0).withColumn(
        "rn", F.row_number().over(Window.orderBy("dur"))
    )
    # steps feeds the broadcast step array AND the output rows — pin so
    # the duration rollup (and everything above it) computes once.
    steps = _pin(steps)
    arr = steps.agg(
        F.sort_array(
            F.collect_list(F.struct("rn", "d", F.col("n_risk").alias("n")))
        ).alias("a")
    )
    one = F.lit(1).cast("double")
    surv = F.aggregate(
        F.transform(
            F.slice(F.col("a"), 1, F.col("rn").cast("int")),
            lambda x: one - x["d"].cast("double") / x["n"].cast("double"),
        ),
        one,
        lambda acc, f: acc * f,
    )
    return (
        steps.crossJoin(F.broadcast(arr))
        .select(
            F.col("dur").cast("bigint").alias("t_min"),
            "n_risk",
            "d",
            F.floor(F.lit(1000000).cast("double") * surv)
            .cast("bigint")
            .alias("surv_e6"),
        )
    )


@register(
    "levene_brown_forsythe",
    """
    WITH q AS (
      SELECT event_type, CAST(floor("value" * 100) AS BIGINT) AS x
      FROM events WHERE "value" IS NOT NULL AND event_type IS NOT NULL
    ),
    per_v AS (
      SELECT event_type, x, CAST(count(*) AS BIGINT) AS cnt
      FROM q GROUP BY event_type, x
    ),
    cum AS (
      SELECT event_type, x, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY x
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_g
      FROM per_v
    ),
    med AS (
      SELECT event_type, min(x) AS med
      FROM cum WHERE c >= (n_g + 1) // 2
      GROUP BY event_type
    ),
    zlev AS (
      SELECT p.event_type, abs(p.x - m.med) AS z, p.cnt
      FROM per_v p JOIN med m ON m.event_type = p.event_type
    ),
    g AS (
      SELECT event_type,
             CAST(sum(cnt) AS BIGINT) AS n_j,
             CAST(sum(z * cnt) AS BIGINT) AS s_j,
             CAST(sum(z * z * cnt) AS HUGEINT) AS x2_j
      FROM zlev GROUP BY event_type
    ),
    tot AS (SELECT CAST(sum(n_j) AS BIGINT) AS n FROM g),
    per AS (
      SELECT g.*, tot.n,
             (CAST(tot.n AS HUGEINT) * s_j * s_j) // n_j AS q_j
      FROM g CROSS JOIN tot
    ),
    s AS (
      SELECT n, CAST(sum(s_j) AS HUGEINT) AS s,
             CAST(sum(x2_j) AS HUGEINT) AS x2,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(q_j) AS HUGEINT) AS a
      FROM per GROUP BY n
    )
    SELECT n, k,
           CAST((CAST(1000000 AS HUGEINT) * (a - s * s) * (n - k))
                // ((CAST(n AS HUGEINT) * x2 - a) * (k - 1)) AS BIGINT)
             AS bf_f_e6
    FROM s
    """,
)
def levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Brown & Forsythe 1974,
    public literature; Levene's test with the median center — the robust
    recommendation): a one-way ANOVA F computed on z = |x - median_g|,
    answering the question welch/anova themselves ASSUME away — are the
    group variances even comparable? Completes the inference battery
    (location: welch/mann-whitney/kruskal/anova; shape: ks; normality:
    jarque-bera; now spread).

    One scan: the per-(type, value) histogram yields BOTH the exact
    per-group LOWER MEDIAN (smallest value whose cumulative count
    reaches (n+1) div 2 — an explicit rank selection, not an
    approximate-percentile convention that could differ across engines)
    AND the z-level counts, so the deviations never touch the raw rows
    again. The F itself reuses anova_oneway_f's wide-integer discipline
    verbatim: the single per-group floor A = sum(floor(N * S_j^2 / n_j))
    in DECIMAL(38,0)/HUGEINT, one wide division at the end, no floats
    anywhere. Same documented width envelope (N ~ 5e7 hundredths
    observations).

    Scale shape: one groupBy(type, x) histogram shuffle (value-vocab
    bounded), type-keyed cumulative windows over that histogram, k-row
    finishing math."""
    q = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("x"),
        )
    )
    per_v = q.groupBy("event_type", "x").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    per_v = _pin(per_v)  # median selection + z-levels both read it
    wc = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("event_type")
    cum = per_v.select(
        "event_type",
        "x",
        F.sum("cnt").over(wc).cast("bigint").alias("c"),
        F.sum("cnt").over(wg).cast("bigint").alias("n_g"),
    )
    med = (
        # integer div, never / : Spark's / on bigints is DOUBLE division,
        # which shifts the even-n rank threshold by 0.5 vs the oracle's //
        cum.filter(F.col("c") >= F.expr("(n_g + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("x").alias("med"))
    )
    zlev = per_v.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("x") - F.col("med")).alias("z"),
        "cnt",
    )
    g = zlev.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_j"),
        F.sum(F.col("z") * F.col("cnt")).cast("bigint").alias("s_j"),
        F.sum(F.col("z") * F.col("z") * F.col("cnt"))
        .cast("decimal(38,0)")
        .alias("x2_j"),
    )
    n_tot = g.agg(F.sum("n_j").cast("bigint").alias("n"))
    per = (
        g.crossJoin(F.broadcast(n_tot))
        .withColumn(
            "num",
            F.expr("CAST(CAST(n AS DECIMAL(38,0)) * s_j * s_j AS DECIMAL(38,0))"),
        )
        .withColumn(
            "q_j",
            F.expr(
                "CAST((num - num % CAST(n_j AS DECIMAL(38,0)))"
                " / CAST(n_j AS DECIMAL(38,0)) AS DECIMAL(38,0))"
            ),
        )
    )
    s = per.groupBy("n").agg(
        F.sum("s_j").cast("decimal(38,0)").alias("s"),
        F.sum("x2_j").cast("decimal(38,0)").alias("x2"),
        F.count(F.lit(1)).alias("k"),
        F.sum("q_j").alias("a"),
    )
    return (
        s.withColumn(
            "fnum",
            F.expr("CAST(1000000 AS DECIMAL(38,0)) * (a - s * s) * (n - k)"),
        )
        .withColumn("fden", F.expr("(CAST(n AS DECIMAL(38,0)) * x2 - a) * (k - 1)"))
        .select(
            "n",
            F.col("k").cast("bigint").alias("k"),
            F.expr("CAST((fnum - fnum % fden) / fden AS DECIMAL(38,0))")
            .cast("bigint")
            .alias("bf_f_e6"),
        )
    )


@register(
    "log_rank_test",
    """
    WITH e AS (
      SELECT user_id, epoch_ns(ts) AS tsn, event_id,
             CAST(user_id % 2 AS BIGINT) AS arm
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    g AS (
      SELECT user_id, arm, tsn,
             CASE WHEN lag(tsn) OVER w IS NULL
                    OR tsn - lag(tsn) OVER w > 1800000000000
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
    ),
    sid AS (
      SELECT user_id, arm, tsn,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY tsn
                                    ROWS UNBOUNDED PRECEDING) AS s
      FROM g
    ),
    s0 AS (
      SELECT arm, (max(tsn) - min(tsn)) // 60000000000 AS dur,
             max(tsn) AS smax
      FROM sid GROUP BY user_id, s, arm
    ),
    mx AS (SELECT max(smax) AS max_tsn FROM s0),
    sess AS (
      SELECT arm, dur,
             CASE WHEN (SELECT max_tsn FROM mx) - smax > 1800000000000
                  THEN 1 ELSE 0 END AS death
      FROM s0
    ),
    byd AS (
      SELECT dur,
             CAST(count(*) AS BIGINT) AS total,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS total1,
             CAST(sum(death) AS BIGINT) AS d,
             CAST(sum(CASE WHEN arm = 1 THEN death ELSE 0 END) AS BIGINT)
               AS d1
      FROM sess GROUP BY dur
    ),
    risk AS (
      SELECT dur, d, d1,
             CAST(sum(total) OVER wd AS BIGINT) AS n,
             CAST(sum(total1) OVER wd AS BIGINT) AS n1
      FROM byd
      WINDOW wd AS (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING)
    ),
    steps AS (SELECT dur, d, d1, n, n1 FROM risk WHERE d > 0),
    arr AS (
      SELECT list(struct_pack(d := d, n := n, n1 := n1) ORDER BY dur) AS a,
             CAST(coalesce(sum(d1), 0) AS BIGINT) AS o1,
             CAST(count(*) AS BIGINT) AS n_steps
      FROM steps
    )
    SELECT o1, n_steps,
           CAST(floor(CAST(1000000 AS DOUBLE) * list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
               list_transform(a, x -> CAST(x.d AS DOUBLE)
                 * (CAST(x.n1 AS DOUBLE) / CAST(x.n AS DOUBLE)))),
             (acc, v) -> acc + v)) AS BIGINT) AS e1_e6,
           CASE WHEN list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
               list_transform(a, x -> CASE WHEN x.n > 1 THEN
                 CAST(x.d AS DOUBLE)
                 * (CAST(x.n1 AS DOUBLE) / CAST(x.n AS DOUBLE))
                 * (CAST(1 AS DOUBLE)
                    - CAST(x.n1 AS DOUBLE) / CAST(x.n AS DOUBLE))
                 * (CAST(x.n - x.d AS DOUBLE) / CAST(x.n - 1 AS DOUBLE))
                 ELSE CAST(0 AS DOUBLE) END)),
             (acc, v) -> acc + v) <= CAST(0 AS DOUBLE) THEN NULL
           ELSE CAST(floor(CAST(1000000 AS DOUBLE)
             * (CAST(o1 AS DOUBLE) - list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                   list_transform(a, x -> CAST(x.d AS DOUBLE)
                     * (CAST(x.n1 AS DOUBLE) / CAST(x.n AS DOUBLE)))),
                 (acc, v) -> acc + v))
             / sqrt(list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                   list_transform(a, x -> CASE WHEN x.n > 1 THEN
                     CAST(x.d AS DOUBLE)
                     * (CAST(x.n1 AS DOUBLE) / CAST(x.n AS DOUBLE))
                     * (CAST(1 AS DOUBLE)
                        - CAST(x.n1 AS DOUBLE) / CAST(x.n AS DOUBLE))
                     * (CAST(x.n - x.d AS DOUBLE) / CAST(x.n - 1 AS DOUBLE))
                     ELSE CAST(0 AS DOUBLE) END)),
                 (acc, v) -> acc + v))) AS BIGINT)
           END AS z_e6
    FROM arr
    """,
)
def log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test between the two deterministic arms'
    session survival curves (Mantel 1966, public literature) — the
    hypothesis test completing km_survival_curve exactly as welch
    completes the mean panel: does arm 1 (odd users) churn out of
    sessions faster than arm 0? Subjects, durations and censoring follow
    the KM conventions verbatim; at each pooled death time the observed
    arm-1 deaths are compared with the hypergeometric expectation
    d * n1/n, with variance d*(n1/n)*(1-n1/n)*(n-d)/(n-1).

    Exactness: O1 and every per-step (d, d1, n, n1) are exact integers
    (arm-wise suffix-sum risk sets over the bounded duration rollup);
    E1 and V are ORDERED left folds of per-step IEEE terms over the
    identical step list on both engines (the km/ewma discipline) — a
    sum() aggregate over the steps would be accumulation-order
    nondeterministic, the fold is not. z floored at e6; NULL when the
    variance is zero (degenerate single-arm risk sets).

    Scale shape: identical to km_survival_curve — one user-keyed window
    pass, one session rollup, everything after lives on the bounded
    duration domain; the step array rides a 1-row broadcast."""
    gap_ns = 30 * 60 * 1_000_000_000
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    g = ev.select(
        "user_id",
        (F.col("user_id") % 2).cast("bigint").alias("arm"),
        "ts_ns",
        F.when(
            F.lag("ts_ns").over(w).isNull()
            | ((F.col("ts_ns") - F.lag("ts_ns").over(w)) > gap_ns),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sid = g.withColumn("s", F.sum("new_session").over(ws))
    s0 = sid.groupBy("user_id", "s", "arm").agg(
        F.min("ts_ns").alias("smin"), F.max("ts_ns").alias("smax")
    )
    s0 = _pin(s0)
    mx = s0.agg(F.max("smax").alias("max_tsn"))
    sess = s0.crossJoin(F.broadcast(mx)).select(
        "arm",
        F.expr("(smax - smin) div 60000000000").alias("dur"),
        F.when(F.col("max_tsn") - F.col("smax") > gap_ns, 1)
        .otherwise(0)
        .alias("death"),
    )
    byd = sess.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("total1"),
        F.sum("death").cast("bigint").alias("d"),
        F.sum(F.when(F.col("arm") == 1, F.col("death")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
    )
    w_desc = (
        Window.orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = byd.select(
        "dur",
        "d",
        "d1",
        F.sum("total").over(w_desc).cast("bigint").alias("n"),
        F.sum("total1").over(w_desc).cast("bigint").alias("n1"),
    )
    steps = risk.filter(F.col("d") > 0)
    arr = steps.agg(
        F.sort_array(
            F.collect_list(F.struct("dur", "d", "n", "n1"))
        ).alias("a"),
        F.coalesce(F.sum("d1"), F.lit(0)).cast("bigint").alias("o1"),
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
    )
    zero = F.lit(0).cast("double")
    one = F.lit(1).cast("double")
    e6 = F.lit(1000000).cast("double")

    def _e_term(x):
        return x["d"].cast("double") * (x["n1"].cast("double") / x["n"].cast("double"))

    def _v_term(x):
        frac = x["n1"].cast("double") / x["n"].cast("double")
        return F.when(
            x["n"] > 1,
            x["d"].cast("double")
            * frac
            * (one - frac)
            * ((x["n"] - x["d"]).cast("double") / (x["n"] - 1).cast("double")),
        ).otherwise(zero)

    e1 = F.aggregate(F.transform(F.col("a"), _e_term), zero, lambda a, v: a + v)
    v = F.aggregate(F.transform(F.col("a"), _v_term), zero, lambda a, v_: a + v_)
    z = F.floor(e6 * (F.col("o1").cast("double") - e1) / F.sqrt(v)).cast("bigint")
    return arr.select(
        "o1",
        "n_steps",
        F.floor(e6 * e1).cast("bigint").alias("e1_e6"),
        F.when(v <= zero, F.lit(None).cast("bigint")).otherwise(z).alias("z_e6"),
    )


@register(
    "diff_in_differences",
    """
    WITH u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS treat,
             CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
               AS post,
             CAST(floor("value" * 100) AS BIGINT) AS cents
      FROM events WHERE "value" IS NOT NULL AND user_id IS NOT NULL
    ),
    cell AS (
      SELECT treat, post,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM u GROUP BY treat, post
    ),
    w AS (
      SELECT
        max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
        max(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s11,
        max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
        max(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s10,
        max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
        max(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s01,
        max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
        max(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s00
      FROM cell
    )
    SELECT CAST(n11 + n10 + n01 + n00 AS BIGINT) AS n,
           CAST(floor(CAST(10000 AS DOUBLE) * (
             CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
             - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE)
           ) / CAST(100 AS DOUBLE)) AS BIGINT) AS treat_delta_e4,
           CAST(floor(CAST(10000 AS DOUBLE) * (
             CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
             - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)
           ) / CAST(100 AS DOUBLE)) AS BIGINT) AS control_delta_e4,
           CAST(floor(CAST(10000 AS DOUBLE) * (
             (CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
              - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
             - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE))
           ) / CAST(100 AS DOUBLE)) AS BIGINT) AS did_e4
    FROM w
    """,
)
def diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator (Card & Krueger 1994 is the
    canonical public application) over the CUPED panel conventions
    (Jan 1-15 pre / Jan 16-30 post, user_id % 2 arms): the treatment
    effect is the treated arm's pre-to-post mean change MINUS the
    control arm's — the causal readout that survives a common trend the
    raw post-period comparison would misattribute. Completes the
    experimentation family: welch/mann-whitney test, effect_size_panel
    standardizes, cuped_adjusted_lift shrinks variance, this one
    de-biases against parallel trends (control_delta_e4 IS the trend
    estimate a reviewer checks).

    Exactness: the 2x2 (arm, period) cell counts and cents sums are one
    exact conditional-aggregate scan; all three deltas are closed-form
    per-row doubles over those eight integers, floored e4 dollars —
    the welch/cuped discipline. Scale shape: one groupBy over a 4-key
    space; nothing else."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    cutoff = F.lit("2024-01-16").cast("timestamp")
    u = ev.select(
        (F.col("user_id") % 2).cast("bigint").alias("treat"),
        F.when(F.col("ts_utc") >= cutoff, 1).otherwise(0).alias("post"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    cell = u.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )

    def pick(tr, po, col):
        return F.max(
            F.when((F.col("treat") == tr) & (F.col("post") == po), F.col(col))
        )

    w = cell.agg(
        pick(1, 1, "n").alias("n11"),
        pick(1, 1, "s").alias("s11"),
        pick(1, 0, "n").alias("n10"),
        pick(1, 0, "s").alias("s10"),
        pick(0, 1, "n").alias("n01"),
        pick(0, 1, "s").alias("s01"),
        pick(0, 0, "n").alias("n00"),
        pick(0, 0, "s").alias("s00"),
    )
    def mean(s, n):
        return F.col(s).cast("double") / F.col(n).cast("double")

    e4 = F.lit(10000).cast("double")
    hundred = F.lit(100).cast("double")
    td = mean("s11", "n11") - mean("s10", "n10")
    cd = mean("s01", "n01") - mean("s00", "n00")
    return w.select(
        (F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00"))
        .cast("bigint")
        .alias("n"),
        F.floor(e4 * td / hundred).cast("bigint").alias("treat_delta_e4"),
        F.floor(e4 * cd / hundred).cast("bigint").alias("control_delta_e4"),
        F.floor(e4 * (td - cd) / hundred).cast("bigint").alias("did_e4"),
    )


# =====================================================================
# Paired-binary and stratified 2x2 inference (McNemar / Mantel-Haenszel)
# =====================================================================

@register(
    "mcnemar_test",
    """
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM u
    )
    SELECT n_pairs, n11, n10, n01, n00,
           CASE WHEN n10 + n01 = 0 THEN NULL
                ELSE (1000000 * (n10 - n01) * (n10 - n01)) // (n10 + n01)
           END AS chi2_e6,
           CASE WHEN n10 + n01 = 0 THEN NULL
                ELSE (1000000
                      * greatest(abs(n10 - n01) - 1, 0)
                      * greatest(abs(n10 - n01) - 1, 0))
                     // (n10 + n01)
           END AS chi2_cc_e6
    FROM m
    """,
)
def mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (McNemar 1947) for paired binary outcomes: per user
    the pair is (ever clicked, ever purchased); the test asks whether the
    two marginal rates differ using ONLY the discordant cells —
    chi2 = (n10 - n01)^2 / (n10 + n01), plus the Edwards
    continuity-corrected form (|n10 - n01| - 1)^2 / (n10 + n01) clamped
    at 0 so equal discordance reads 0, not 1/(b+c). This is the k = 2
    member of the family cochran_q_test generalizes (its docstring calls
    Q "the k-sample generalization of McNemar") — landing it closes that
    gap downward.

    Exact integers end to end: the 2x2 concordance table is one
    conditional aggregate over per-user max() flags; both statistics are
    truncating BIGINT divisions at 1e6, NULL when there are no discordant
    pairs (test undefined). Capacity: 1e6 * n^2 < 2^63 -> n < 3.0e6
    discordant pairs; recast to DECIMAL(38,0) past that (docs/LIMITS.md).

    Scale shape: one scan -> per-user conditional agg (1 shuffle on
    user_id, map-side combinable) -> one-row global aggregate. No
    windows, no sorts, no floats anywhere."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("b"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n00"),
    )
    disc = F.col("n10") + F.col("n01")
    chi2 = F.when(disc == 0, F.lit(None).cast("bigint")).otherwise(
        F.expr("(1000000 * (n10 - n01) * (n10 - n01)) div (n10 + n01)")
    )
    chi2_cc = F.when(disc == 0, F.lit(None).cast("bigint")).otherwise(
        F.expr(
            "(1000000 * greatest(abs(n10 - n01) - 1, 0)"
            " * greatest(abs(n10 - n01) - 1, 0)) div (n10 + n01)"
        )
    )
    return m.select(
        "n_pairs",
        "n11",
        "n10",
        "n01",
        "n00",
        chi2.cast("bigint").alias("chi2_e6"),
        chi2_cc.cast("bigint").alias("chi2_cc_e6"),
    )


@register(
    "mantel_haenszel_or",
    """
    WITH q AS (
      SELECT event_type AS stratum,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS exposed,
             CASE WHEN "value" >= 250.0 THEN 1 ELSE 0 END AS outcome
      FROM events
      WHERE "value" IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
    ),
    cells AS (
      SELECT stratum,
             CAST(sum(CASE WHEN exposed = 1 AND outcome = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN exposed = 1 AND outcome = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN exposed = 0 AND outcome = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN exposed = 0 AND outcome = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM q GROUP BY stratum
    ),
    terms AS (
      SELECT stratum, a, b, c, d,
             (1000000 * a * d) // (a + b + c + d) AS r_term_e6,
             (1000000 * b * c) // (a + b + c + d) AS s_term_e6
      FROM cells
    )
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           CAST(sum(a + b + c + d) AS BIGINT) AS n_rows,
           CAST(sum(r_term_e6) AS BIGINT) AS r_e6,
           CAST(sum(s_term_e6) AS BIGINT) AS s_e6,
           CASE WHEN sum(s_term_e6) = 0 THEN NULL
                ELSE (1000000 * CAST(sum(r_term_e6) AS BIGINT))
                     // CAST(sum(s_term_e6) AS BIGINT)
           END AS or_mh_e6
    FROM terms
    """,
)
def mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio (Mantel & Haenszel 1959) across
    event-type strata: exposure = even user_id (the repo's standing A/B
    arm convention), outcome = value >= 250 — a threshold INSIDE the
    fixture value domain (events.value maxes at 327.5/490.0/~600 at
    sf0.001/0.01/0.1), so the gated run produces nonzero a/d cells at
    every scale and the pooled-OR arithmetic is actually exercised (the
    secret_entropy_audit fixture-scaled-constants standard; ADVICE r9
    flagged the old value >= 500 form as vacuously green at sf0.01).
    The pooled estimate
    OR_MH = sum_i(a_i d_i / n_i) / sum_i(b_i c_i / n_i) answers "what is
    the common odds ratio once the stratum mix is controlled for" — the
    confounding-robust counterpart to a single collapsed 2x2 (which
    Simpson's paradox can invert).

    Exactness convention: each stratum's term a_i d_i / n_i is a
    truncating BIGINT division at 1e6 BEFORE the cross-stratum sum, so
    the distributed sums are exact integers and the final ratio is one
    more truncating division — identical arithmetic on both engines by
    definition. Capacity: 1e6 * a_i * d_i < 2^63 -> n_i < 6.0e6 rows per
    stratum (a_i d_i <= n_i^2/4); recast to DECIMAL(38,0) past that —
    and note DuckDB widens overflowing BIGINT products to HUGEINT while
    Spark wraps, so the twins diverge past the bound (docs/LIMITS.md).

    Scale shape: one conditional-aggregate scan keyed by stratum (the
    event-type vocabulary — bounded), then a one-row fold over the
    stratum table. No joins, no windows, no floats."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    q = ev.select(
        F.col("event_type").alias("stratum"),
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("exposed"),
        F.when(F.col("value") >= 250.0, 1).otherwise(0).alias("outcome"),
    )
    cells = q.groupBy("stratum").agg(
        F.sum(F.when((F.col("exposed") == 1) & (F.col("outcome") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("exposed") == 1) & (F.col("outcome") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("outcome") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("exposed") == 0) & (F.col("outcome") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    terms = cells.select(
        "a",
        "b",
        "c",
        "d",
        F.expr("(1000000 * a * d) div (a + b + c + d)").alias("r_term_e6"),
        F.expr("(1000000 * b * c) div (a + b + c + d)").alias("s_term_e6"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum(F.col("a") + F.col("b") + F.col("c") + F.col("d"))
        .cast("bigint")
        .alias("n_rows"),
        F.sum("r_term_e6").cast("bigint").alias("r_e6"),
        F.sum("s_term_e6").cast("bigint").alias("s_e6"),
    )
    or_mh = F.when(F.col("s_e6") == 0, F.lit(None).cast("bigint")).otherwise(
        F.expr("(1000000 * r_e6) div s_e6")
    )
    return agg.select(
        "n_strata", "n_rows", "r_e6", "s_e6", or_mh.cast("bigint").alias("or_mh_e6")
    )


# =====================================================================
# Brier score + Murphy decomposition (forecast calibration accounting)
# =====================================================================

@register(
    "brier_decomposition",
    """
    WITH q AS (
      SELECT least(greatest(CAST(floor("value" / 10) AS BIGINT), 0), 100) AS p_e2,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE "value" IS NOT NULL
    ),
    bins AS (
      SELECT p_e2 // 10 AS bin,
             CAST(count(*) AS BIGINT) AS n_k,
             CAST(sum(p_e2) AS BIGINT) AS sp_k,
             CAST(sum(y) AS BIGINT) AS sy_k,
             CAST(sum((p_e2 - 100 * y) * (p_e2 - 100 * y)) AS BIGINT) AS sb_k
      FROM q GROUP BY p_e2 // 10
    ),
    tot AS (
      SELECT CAST(sum(n_k) AS BIGINT) AS n,
             CAST(sum(sy_k) AS BIGINT) AS sy,
             CAST(sum(sb_k) AS BIGINT) AS sb
      FROM bins
    ),
    terms AS (
      SELECT n, sy, sb,
             CAST(floor(1000000.0 * n_k
                        * pow(sp_k / (100.0 * n_k) - sy_k / CAST(n_k AS DOUBLE), 2))
                  AS BIGINT) AS rel_k_e6,
             CAST(floor(1000000.0 * n_k
                        * pow(sy_k / CAST(n_k AS DOUBLE) - sy / CAST(n AS DOUBLE), 2))
                  AS BIGINT) AS res_k_e6
      FROM bins CROSS JOIN tot
    )
    SELECT n,
           CAST((1000000 * sb) // (10000 * n) AS BIGINT) AS brier_e6,
           CAST(sum(rel_k_e6) // n AS BIGINT) AS reliability_e6,
           CAST(sum(res_k_e6) // n AS BIGINT) AS resolution_e6,
           CAST((1000000 * sy * (n - sy)) // (n * n) AS BIGINT) AS uncertainty_e6
    FROM terms GROUP BY n, sy, sb
    """,
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy (1973) decomposition
    Brier = reliability - resolution + uncertainty over 10 forecast
    bins: forecast p = value/1000 clamped to [0,1] (hundredths), outcome
    = purchase. Complements ece_calibration_error: ECE reports the
    calibration GAP alone; the Murphy accounting splits the full proper
    score into calibration (REL), discrimination (RES) and the
    irreducible base-rate term UNC = ybar(1-ybar) — the standard way to
    tell a well-calibrated-but-useless forecaster from a sharp one.
    (Binned p_bar_k makes the identity exact up to within-bin forecast
    variance, as always for the binned estimator.)

    Exactness: the per-row Brier sum uses integer (p_e2 - 100y)^2 —
    exact BIGINTs; REL/RES per-bin terms are closed-form doubles over
    exact bin integers (deterministic per row — the welch discipline),
    floored at 1e6 per bin BEFORE the 10-element sum, so no float ever
    crosses an aggregation boundary. UNC is pure integer arithmetic.
    Capacity: 1e6 * sy * (n - sy) < 2^63 -> n < 6.0e6 rows (sy(n-sy) <=
    n^2/4); 1e6 * sb needs the same bound (sb <= 1e4 n). DECIMAL(38,0)
    past that (docs/LIMITS.md).

    Scale shape: one scan -> 11-key conditional aggregate -> broadcast
    1-row total back onto the bin table -> one-row fold. No windows."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = ev.select(
        F.least(
            F.greatest(F.floor(F.col("value") / 10).cast("bigint"), F.lit(0)),
            F.lit(100),
        ).alias("p_e2"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    d = F.col("p_e2") - 100 * F.col("y")
    bins = q.groupBy(F.expr("p_e2 div 10").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("p_e2").cast("bigint").alias("sp_k"),
        F.sum("y").cast("bigint").alias("sy_k"),
        F.sum(d * d).cast("bigint").alias("sb_k"),
    )
    bins = _pin(bins)  # 11 rows feed BOTH the total and the term table
    tot = bins.agg(
        F.sum("n_k").cast("bigint").alias("n"),
        F.sum("sy_k").cast("bigint").alias("sy"),
        F.sum("sb_k").cast("bigint").alias("sb"),
    )
    terms = bins.crossJoin(F.broadcast(tot)).select(
        "n",
        "sy",
        "sb",
        F.floor(
            1000000.0
            * F.col("n_k")
            * F.pow(
                F.col("sp_k") / (100.0 * F.col("n_k"))
                - F.col("sy_k") / F.col("n_k").cast("double"),
                F.lit(2),
            )
        )
        .cast("bigint")
        .alias("rel_k_e6"),
        F.floor(
            1000000.0
            * F.col("n_k")
            * F.pow(
                F.col("sy_k") / F.col("n_k").cast("double")
                - F.col("sy") / F.col("n").cast("double"),
                F.lit(2),
            )
        )
        .cast("bigint")
        .alias("res_k_e6"),
    )
    return terms.groupBy("n", "sy", "sb").agg(
        F.expr("(1000000 * first(sb)) div (10000 * first(n))")
        .cast("bigint")
        .alias("brier_e6"),
        F.expr("sum(rel_k_e6) div first(n)").cast("bigint").alias("reliability_e6"),
        F.expr("sum(res_k_e6) div first(n)").cast("bigint").alias("resolution_e6"),
        F.expr("(1000000 * first(sy) * (first(n) - first(sy))) div (first(n) * first(n))")
        .cast("bigint")
        .alias("uncertainty_e6"),
    ).select("n", "brier_e6", "reliability_e6", "resolution_e6", "uncertainty_e6")


# =====================================================================
# Exact Shapley-value channel attribution (coalition lattice rollup)
# =====================================================================

@register(
    "shapley_channel_attribution",
    """
    WITH RECURSIVE ch AS (
      SELECT event_type AS channel,
             row_number() OVER (ORDER BY event_type) - 1 AS idx
      FROM (SELECT DISTINCT event_type FROM events
            WHERE event_type IS NOT NULL AND event_type <> 'purchase')
    ),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ch),
    u AS (
      SELECT e.user_id,
             CAST(coalesce(bit_or(CASE WHEN c.idx IS NOT NULL
                                       THEN (CAST(1 AS BIGINT) << c.idx)
                                       END), 0) AS BIGINT) AS mask,
             max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events e LEFT JOIN ch c ON c.channel = e.event_type
      WHERE e.user_id IS NOT NULL
      GROUP BY e.user_id
    ),
    ct AS (
      SELECT mask, CAST(count(*) AS BIGINT) AS c
      FROM u WHERE conv = 1 GROUP BY mask
    ),
    coal AS (
      SELECT CAST(0 AS BIGINT) AS s
      UNION ALL
      SELECT s + 1 FROM coal
      WHERE s + 1 < (SELECT CAST(1 AS BIGINT) << k FROM k)
    ),
    v AS (
      SELECT coal.s, CAST(coalesce(sum(ct.c), 0) AS BIGINT) AS v
      FROM coal LEFT JOIN ct ON (ct.mask & coal.s) = ct.mask
      GROUP BY coal.s
    ),
    contrib AS (
      SELECT ch.channel, k.k,
             CAST(factorial(CAST(bit_count(v0.s) AS INTEGER)) AS BIGINT)
               * CAST(factorial(CAST(k.k - 1 - bit_count(v0.s) AS INTEGER)) AS BIGINT)
               * (v1.v - v0.v) AS term
      FROM ch CROSS JOIN k
      JOIN v v0 ON (v0.s & (CAST(1 AS BIGINT) << ch.idx)) = 0
      JOIN v v1 ON v1.s = v0.s + (CAST(1 AS BIGINT) << ch.idx)
    )
    SELECT channel,
           CAST(max(k) AS BIGINT) AS n_channels,
           CAST(sum(term) AS BIGINT) AS phi_num,
           CAST((1000000 * sum(term))
                // CAST(factorial(CAST(max(k) AS INTEGER)) AS BIGINT) AS BIGINT) AS phi_e6
    FROM contrib GROUP BY channel
    """,
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution (Shapley 1953; Zhao et al. 2018,
    arXiv 1804.05327, for the marketing formulation) of purchase
    conversions across touch channels (the non-purchase event types):
    phi_i = sum over coalitions S not containing i of
    |S|!(k-1-|S|)!/k! * (v(S+i) - v(S)), with the characteristic
    function v(S) = converted users whose touch set fits inside S.
    The axiomatic counterpart to multitouch_attribution's positional
    heuristics — efficiency (sum phi = v(full) - v(empty)) is asserted
    in the hand test, and baseline conversions (no touches) cancel out
    of every marginal by construction.

    Exactness: everything is integer — per-user masks via bit_or over
    (1 << idx); v via the subset-containment join; the weights carried
    as |S|!(k-1-|S)|! (times-k! form) so phi_num is an exact BIGINT and
    phi_e6 one truncating division. factorial() is native in DuckDB and
    an unrolled product in Spark — equal integers, not floats.

    Scale shape: the ONLY corpus-sized stages are the per-user bit_or
    groupBy (one shuffle) and the mask rollup; the coalition lattice is
    2^k rows for the k-channel vocabulary (k bounded by the event-type
    vocabulary; the 2^k x 2^k containment join is vocabulary-sized,
    never user-sized). Guard: k <= 20 keeps the lattice ~1e6 rows —
    beyond that use sampled permutations, documented in docs/LIMITS.md."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ch = (
        ev.filter(F.col("event_type").isNotNull() & (F.col("event_type") != "purchase"))
        .select(F.col("event_type").alias("channel"))
        .distinct()
    )
    # bounded window: the channel vocabulary
    ch = ch.withColumn(
        "idx", F.row_number().over(Window.orderBy("channel")) - 1
    )
    ch = _pin(ch)  # tiny dim: feeds mask build, lattice size and contribs
    kdf = ch.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    u = (
        ev.join(F.broadcast(ch), ev.event_type == ch.channel, "left")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.expr("bit_or(CASE WHEN idx IS NOT NULL THEN shiftleft(CAST(1 AS BIGINT), idx) END)"),
                F.lit(0),
            )
            .cast("bigint")
            .alias("mask"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "conv"
            ),
        )
    )
    ct = u.filter(F.col("conv") == 1).groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ct = _pin(ct)  # mask rollup (<= 2^k rows) feeds the lattice join
    coal = kdf.select(
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)) - 1"))
        ).alias("s")
    )
    v = (
        coal.join(ct, F.expr("(mask & s) = mask"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("v"))
    )
    v = _pin(v)  # the lattice (2^k rows) is joined twice per channel
    fact = (
        "CASE WHEN {n} <= 1 THEN CAST(1 AS BIGINT) "
        "ELSE aggregate(sequence(2, CAST({n} AS INT)), CAST(1 AS BIGINT), "
        "(a, x) -> a * CAST(x AS BIGINT)) END"
    )
    v0 = v.select(F.col("s").alias("s0"), F.col("v").alias("va"))
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("vb"))
    contrib = (
        ch.crossJoin(F.broadcast(kdf))
        .join(v0, F.expr("(s0 & shiftleft(CAST(1 AS BIGINT), idx)) = 0"))
        .join(v1, F.expr("s1 = s0 + shiftleft(CAST(1 AS BIGINT), idx)"))
        .select(
            "channel",
            "k",
            (
                F.expr(fact.format(n="bit_count(s0)"))
                * F.expr(fact.format(n="k - 1 - bit_count(s0)"))
                * (F.col("vb") - F.col("va"))
            ).alias("term"),
        )
    )
    return contrib.groupBy("channel").agg(
        F.max("k").cast("bigint").alias("n_channels"),
        F.sum("term").cast("bigint").alias("phi_num"),
        F.expr(
            "CAST((1000000 * sum(term)) div ("
            + fact.format(n="max(k)")
            + ") AS BIGINT)"
        ).alias("phi_e6"),
    )


@register(
    "pacf_durbin_levinson",
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
             count(*) AS cnt
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.day_num - b.day_num AS lag, a.cnt AS x, b.cnt AS y
      FROM daily a JOIN daily b ON a.day_num - b.day_num BETWEEN 1 AND 3
    ),
    s AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY lag
    ),
    r AS (
      SELECT lag,
             n_pairs,
             (n_pairs * sxy - sx * sy)
               / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                      * CAST(n_pairs * syy - sy * sy AS DOUBLE)) AS rho
      FROM s
      WHERE n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
    ),
    w AS (
      SELECT max(CASE WHEN lag = 1 THEN rho END) AS rho1,
             max(CASE WHEN lag = 2 THEN rho END) AS rho2,
             max(CASE WHEN lag = 3 THEN rho END) AS rho3,
             CAST(max(CASE WHEN lag = 1 THEN n_pairs END) AS BIGINT) AS n1,
             CAST(max(CASE WHEN lag = 2 THEN n_pairs END) AS BIGINT) AS n2,
             CAST(max(CASE WHEN lag = 3 THEN n_pairs END) AS BIGINT) AS n3
      FROM r
    ),
    l2 AS (
      SELECT *,
             CASE WHEN 1.0 - rho1 * rho1 <> 0.0
                  THEN (rho2 - rho1 * rho1) / (1.0 - rho1 * rho1) END AS phi22
      FROM w
    ),
    l3 AS (
      SELECT *, rho1 * (1.0 - phi22) AS phi21 FROM l2
    )
    SELECT n1, n2, n3,
           CAST(floor(10000.0 * rho1) AS BIGINT) AS pacf1_e4,
           CAST(floor(10000.0 * phi22) AS BIGINT) AS pacf2_e4,
           CASE WHEN 1.0 - phi21 * rho1 - phi22 * rho2 <> 0.0
                THEN CAST(floor(10000.0
                     * ((rho3 - phi21 * rho2 - phi22 * rho1)
                        / (1.0 - phi21 * rho1 - phi22 * rho2))) AS BIGINT)
           END AS pacf3_e4
    FROM l3
    """,
)
def pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lags 1-3 via the Durbin-Levinson
    recursion (Durbin 1960), unrolled closed-form — the AR-order
    selection companion acf_lag_profile lacks: ACF says WHETHER lag k
    correlates, PACF says whether it adds anything AFTER lags < k are
    regressed out (the AR(p) cutoff diagnostic every telemetry
    forecaster reads). phi11 = rho1; phi22 = (rho2 - rho1^2)/(1 -
    rho1^2); phi33 from the level-2 coefficients.

    Exactness: the per-lag rho inputs are the SAME closed-form doubles
    over exact integer sums as acf_lag_profile (one row per lag — no
    aggregated floats), and the recursion is a fixed scalar IEEE
    expression tree mirrored verbatim in both engines; only the final
    floors quantize. Degenerate guards: a zero-variance lag drops out
    of r (NULL cascades); |rho1| = 1 or a singular level-2 denominator
    emit NULL rather than Inf.

    Scale shape: identical to acf_lag_profile — the corpus collapses to
    one row per DAY in the first map-side partial aggregate, the lag
    join runs on that tiny table, and the recursion is a 1-row select.
    At 100 TB the only corpus-sized stage is the daily count."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts_utc").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "day_num"
        )
    ).agg(F.count(F.lit(1)).alias("cnt"))
    daily = _pin(daily)  # tiny: one row per day, joined to itself
    a = daily.select(F.col("day_num").alias("da"), F.col("cnt").alias("x"))
    b = daily.select(F.col("day_num").alias("db"), F.col("cnt").alias("y"))
    pairs = a.join(
        b, (F.col("da") - F.col("db")).between(1, 3)
    ).select((F.col("da") - F.col("db")).alias("lag"), "x", "y")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    r = s.filter((vx > 0) & (vy > 0)).select(
        "lag",
        "n_pairs",
        (
            (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(vx.cast("double") * vy.cast("double"))
        ).alias("rho"),
    )
    w = r.agg(
        F.max(F.when(F.col("lag") == 1, F.col("rho"))).alias("rho1"),
        F.max(F.when(F.col("lag") == 2, F.col("rho"))).alias("rho2"),
        F.max(F.when(F.col("lag") == 3, F.col("rho"))).alias("rho3"),
        F.max(F.when(F.col("lag") == 1, F.col("n_pairs"))).cast("bigint").alias("n1"),
        F.max(F.when(F.col("lag") == 2, F.col("n_pairs"))).cast("bigint").alias("n2"),
        F.max(F.when(F.col("lag") == 3, F.col("n_pairs"))).cast("bigint").alias("n3"),
    )
    phi22 = F.when(
        1.0 - F.col("rho1") * F.col("rho1") != 0.0,
        (F.col("rho2") - F.col("rho1") * F.col("rho1"))
        / (1.0 - F.col("rho1") * F.col("rho1")),
    )
    l2 = w.withColumn("phi22", phi22)
    l3 = l2.withColumn("phi21", F.col("rho1") * (1.0 - F.col("phi22")))
    den3 = 1.0 - F.col("phi21") * F.col("rho1") - F.col("phi22") * F.col("rho2")
    phi33 = F.when(
        den3 != 0.0,
        (
            F.col("rho3")
            - F.col("phi21") * F.col("rho2")
            - F.col("phi22") * F.col("rho1")
        )
        / den3,
    )
    return l3.select(
        "n1",
        "n2",
        "n3",
        F.floor(10000.0 * F.col("rho1")).cast("bigint").alias("pacf1_e4"),
        F.floor(10000.0 * F.col("phi22")).cast("bigint").alias("pacf2_e4"),
        F.floor(10000.0 * phi33).cast("bigint").alias("pacf3_e4"),
    )
