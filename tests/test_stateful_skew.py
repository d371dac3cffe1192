"""Tests for the stateful streaming dedup and skew-salting utilities."""

from __future__ import annotations

import json
import os

from storm_data_etl_spark.operators.skew import (
    salted_distinct_count,
    salted_top_values,
)
from storm_data_etl_spark.streaming.stateful import streaming_first_wins_dedup


def test_streaming_first_wins_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_batch(fname, rows):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # batch 0: a, b, duplicate a
    write_batch(
        "b0.json",
        [
            {"id": "a", "v": 1},
            {"id": "b", "v": 2},
            {"id": "a", "v": 99},
        ],
    )

    stream = spark.readStream.schema("id string, v long").json(src)
    deduped = streaming_first_wins_dedup(stream, "id")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 1 arrives later: duplicate of a (cross-batch) + new c
        write_batch("b1.json", [{"id": "a", "v": 100}, {"id": "c", "v": 3}])
        q.processAllAvailable()
        rows = {r.id: r.v for r in spark.sql("select * from dedup_out").collect()}
    finally:
        q.stop()

    # first occurrence wins within AND across batches
    assert rows == {"a": 1, "b": 2, "c": 3}


def test_salted_distinct_count(spark):
    rows = [("hot", f"v{i % 7}") for i in range(100)] + [("cold", "x"), ("cold", "y")]
    df = spark.createDataFrame(rows, "k string, v string")
    out = {r.k: r.n_distinct for r in salted_distinct_count(df, "k", "v", salt=8).collect()}
    assert out == {"hot": 7, "cold": 2}


def test_salted_top_values(spark):
    rows = (
        [("k1", "a")] * 5 + [("k1", "b")] * 3 + [("k1", "c")] + [("k2", "z")] * 2
    )
    df = spark.createDataFrame(rows, "k string, v string")
    out = salted_top_values(df, "k", "v", n=2, salt=4).collect()
    got = {(r.key, r.rank): (r.value, r["count"]) for r in out}
    assert got[("k1", 1)] == ("a", 5)
    assert got[("k1", 2)] == ("b", 3)
    assert got[("k2", 1)] == ("z", 2)


def test_aqe_skew_join_split_and_salted_parity(spark):
    """Skew handling, both layers, on a deliberately skewed key:

    1. AQE skew-join splitting actually fires: with thresholds scaled to
       test data, the executed adaptive plan must carry the skew marker on
       the sort-merge join — pinning that the engine's config
       (session.get_spark: adaptive.skewJoin.enabled) reaches the plan.
    2. The salted aggregation path (operators/skew.py) and the plain
       Catalyst path return identical results on the same skewed frame —
       salting is a pure optimization, never a semantics change.
    """
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        )
    }
    try:
        # Force SMJ (no broadcast) and scale AQE's skew thresholds down to
        # fixture size so the splitter can trigger.
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "131072"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16384")

        # hot key: 40k padded rows (~5 MB shuffled); 20 cold keys tiny.
        big = (
            spark.range(40_000)
            .select(
                F.lit("hot").alias("k"),
                F.concat(F.lit("x" * 120), F.col("id").cast("string")).alias("pad"),
            )
            .unionAll(
                spark.range(2_000).select(
                    F.concat(F.lit("cold"), (F.col("id") % 20).cast("string")).alias("k"),
                    F.col("id").cast("string").alias("pad"),
                )
            )
        )
        dim = spark.createDataFrame(
            [("hot", 1)] + [(f"cold{i}", i) for i in range(20)], "k string, tag int"
        )
        # No groupBy on the join key downstream: reusing the join's hash
        # partitioning would forbid OptimizeSkewedJoin from splitting the
        # skewed partition (it never adds a shuffle unless forced).
        joined = big.join(dim, "k").select("k", "tag", "pad")
        # collect() executes THIS QueryExecution (count() would build its
        # own, leaving joined's adaptive plan unfinalized)
        assert len(joined.collect()) == 42_000

        # the EXECUTED adaptive plan must mark the skewed join side
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=" in plan, f"AQE skew-join did not fire:\n{plan[:2000]}"

        # per-key correctness of the same join (separate query; its own
        # plan may legally skip skew-splitting to reuse partitioning)
        got = {
            r.k: r.n
            for r in big.join(dim, "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got["hot"] == 40_000
        assert got["cold3"] == 100

        # layer 2: salted aggregation ≡ plain aggregation on the same data
        vals = big.select("k", F.substring("pad", -2, 2).alias("v"))
        salted = {
            r.k: r.n_distinct
            for r in salted_distinct_count(vals, "k", "v", salt=8).collect()
        }
        plain = {
            r.k: r.nd
            for r in vals.groupBy("k").agg(F.countDistinct("v").alias("nd")).collect()
        }
        assert salted == plain
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_streaming_running_stats_cross_batch(spark, tmp_path):
    """Running (n, sum, min, max, EWMA) accumulates across micro-batches;
    the final snapshot per key matches a sequential Python fold."""
    import json as _json
    import os as _os

    from storm_data_etl_spark.streaming.stateful import streaming_running_stats

    src = str(tmp_path / "src_stats")
    _os.makedirs(src)

    def write_batch(fname, rows):
        with open(_os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write_batch("b0.json", [{"user_id": 1, "value": 10.0}, {"user_id": 1, "value": 20.0}])

    stream = spark.readStream.schema("user_id long, value double").json(src)
    stats = streaming_running_stats(stream, "user_id", "value", alpha=0.5)
    q = (
        stats.writeStream.outputMode("append")
        .format("memory")
        .queryName("stats_out")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("b1.json", [{"user_id": 1, "value": 2.0}, {"user_id": 2, "value": 7.0}])
        q.processAllAvailable()
        rows = spark.sql(
            "select * from stats_out order by n"
        ).collect()
    finally:
        q.stop()

    latest = {}
    for r in rows:  # last snapshot per key (ordered by n, so later overwrites)
        latest[r.user_id] = r
    # user 1: fold 10, 20, 2 with alpha=0.5 → ewma = 0.5*2 + 0.5*(0.5*20+0.5*10) = 8.5
    u1 = latest[1]
    assert (u1.n, u1.total, u1.vmin, u1.vmax, u1.ewma) == (3, 32.0, 2.0, 20.0, 8.5)
    u2 = latest[2]
    assert (u2.n, u2.total, u2.vmin, u2.vmax, u2.ewma) == (1, 7.0, 7.0, 7.0, 7.0)


def test_two_phase_agg_guards(spark):
    """Empty agg dict and a pre-existing _salt column are rejected loudly
    instead of raising bare StopIteration / silently clobbering."""
    import pytest

    from storm_data_etl_spark.operators.skew import two_phase_agg

    df = spark.createDataFrame([(1, 2)], ["k", "v"])
    with pytest.raises(ValueError, match="at least one aggregate"):
        two_phase_agg(df, ["k"], {})
    salted = df.withColumnRenamed("v", "_salt")
    with pytest.raises(ValueError, match="_salt"):
        two_phase_agg(salted, ["k"], {"m": ("max", "_salt")})


def test_streaming_heavy_hitters_cross_batch(spark, tmp_path):
    """Cross-batch MG: exact counts while shards stay within capacity;
    a second micro-batch merges into existing state (pointwise add)."""
    import json as _json
    import os as _os

    from storm_data_etl_spark.streaming.stateful import streaming_heavy_hitters

    src = str(tmp_path / "src_hh")
    _os.makedirs(src)

    def write_batch(fname, rows):
        with open(_os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write_batch("b0.json", [{"k": "a"}] * 5 + [{"k": "b"}] * 2)
    stream = spark.readStream.schema("k string").json(src)
    hh = streaming_heavy_hitters(stream, "k", k=8, num_shards=4)
    q = (
        hh.writeStream.outputMode("append")
        .format("memory")
        .queryName("hh_out")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("b1.json", [{"k": "a"}] * 3 + [{"k": "c"}] * 4)
        q.processAllAvailable()
        # append mode: keep the LATEST emission per key (max batch id via
        # monotonic arrival — use the largest est per key, counts only grow
        # in the exactness regime)
        rows = spark.sql("select * from hh_out").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:
        latest[r.hh_key] = max(latest.get(r.hh_key, 0), r.est_count)
    assert latest == {"a": 8, "b": 2, "c": 4}


def test_streaming_heavy_hitters_trims_at_capacity(spark, tmp_path):
    """Capacity 2, one shard: 6 distinct keys with a dominant one — the
    heavy key survives every trim and never overcounts."""
    import json as _json
    import os as _os

    from storm_data_etl_spark.streaming.stateful import streaming_heavy_hitters

    src = str(tmp_path / "src_hh2")
    _os.makedirs(src)
    rows = [{"k": "hot"}] * 30 + [{"k": f"cold{i}"} for i in range(5) for _ in range(2)]
    with open(_os.path.join(src, "b0.json"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    stream = spark.readStream.schema("k string").json(src)
    hh = streaming_heavy_hitters(stream, "k", k=2, num_shards=1)
    q = (
        hh.writeStream.outputMode("append")
        .format("memory")
        .queryName("hh_out2")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.hh_key: r.est_count for r in spark.sql("select * from hh_out2").collect()}
    finally:
        q.stop()
    assert len(got) <= 2
    assert "hot" in got
    n = len(rows)
    assert 30 - n // 3 <= got["hot"] <= 30


def test_streaming_heavy_hitters_counts_null_keys(spark, tmp_path):
    """NULL keys count as a regular key — same semantics as the batch twin
    misra_gries_summary (groupBy counts NULL as a group). ADVICE r6: the
    old value_counts() default silently dropped every null-key row."""
    import json as _json
    import os as _os

    from storm_data_etl_spark.streaming.stateful import streaming_heavy_hitters

    src = str(tmp_path / "src_hh3")
    _os.makedirs(src)
    rows = [{"k": None}] * 4 + [{"k": "x"}] * 3 + [{"k": "n"}] * 2
    with open(_os.path.join(src, "b0.json"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    stream = spark.readStream.schema("k string").json(src)
    hh = streaming_heavy_hitters(stream, "k", k=8, num_shards=2)
    q = (
        hh.writeStream.outputMode("append")
        .format("memory")
        .queryName("hh_out3")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.hh_key: r.est_count
            for r in spark.sql("select * from hh_out3").collect()
        }
    finally:
        q.stop()
    # the literal key "n" must not collide with the NULL sentinel encoding
    assert got == {None: 4, "x": 3, "n": 2}


def test_streaming_sessionize_cross_batch_equals_batch_twin(spark, tmp_path):
    """streaming_sessionize replayed over time-ordered micro-batches ends
    at exactly the batch sessionize answer (lag-window, 30-min gap) on
    the union — the streaming/batch-twin exactness discipline. Sessions
    split across a batch BOUNDARY must not double-count, and a gap
    inside one batch must still split."""
    import json as _json
    import os as _os

    from pyspark.sql import Window
    from storm_data_etl_spark.streaming.stateful import streaming_sessionize

    MIN = 60 * 1_000_000_000  # one minute in ns
    # user 1: events at 0m, 10m | 10m+31m (gap>30 splits ACROSS batches),
    #         then 100m (in-batch split later)
    # user 2: single session entirely inside batch 0
    b0 = [
        {"user_id": 1, "event_id": 1, "ts_ns": 0 * MIN},
        {"user_id": 1, "event_id": 2, "ts_ns": 10 * MIN},
        {"user_id": 2, "event_id": 3, "ts_ns": 5 * MIN},
        {"user_id": 2, "event_id": 4, "ts_ns": 6 * MIN},
    ]
    b1 = [
        {"user_id": 1, "event_id": 5, "ts_ns": 41 * MIN},  # 31m gap → new
        {"user_id": 1, "event_id": 6, "ts_ns": 100 * MIN},  # 59m gap → new
        {"user_id": 1, "event_id": 7, "ts_ns": 101 * MIN},  # same session
    ]
    src = str(tmp_path / "src_sess")
    _os.makedirs(src)

    def write_batch(fname, rows):
        with open(_os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write_batch("b0.json", b0)
    stream = spark.readStream.schema(
        "user_id long, event_id long, ts_ns long"
    ).json(src)
    out = streaming_sessionize(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("b1.json", b1)
        q.processAllAvailable()
        rows = spark.sql("select * from sess_out order by n_events").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:  # later snapshots have larger n_events per key
        latest[r.user_id] = r

    # batch twin on the union (same 30-min gap rule)
    gap_ns = 30 * MIN
    union = spark.createDataFrame(
        b0 + b1, "user_id long, event_id long, ts_ns long"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    import pyspark.sql.functions as F

    twin = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in union.select(
            "user_id",
            F.when(
                F.lag("ts_ns").over(w).isNull()
                | ((F.col("ts_ns") - F.lag("ts_ns").over(w)) > gap_ns),
                1,
            )
            .otherwise(0)
            .alias("ns"),
        )
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert twin[1] == (3, 5) and twin[2] == (1, 2)  # hand-computed
    for uid, (ns, ne) in twin.items():
        assert (latest[uid].n_sessions, latest[uid].n_events) == (ns, ne)


def test_streaming_cusum_cross_batch_equals_batch_twin(spark, tmp_path):
    """streaming_cusum replayed over event_id-ordered micro-batches ends at
    exactly the registered batch cusum_drift_scores answer on the union —
    the streaming/batch-twin exactness discipline. The fixture's values
    are chosen so each type's retrospective mean (the batch query's k)
    equals the frozen k_e4=20000 fed to the stream, making the two
    reference levels coincide. Type 'u' arrives UNSORTED within its batch
    file (ids 5,4,6) to pin the within-batch order_col sort."""
    import datetime as _dt
    import json as _json
    import os as _os

    from storm_data_etl_spark.streaming.stateful import streaming_cusum

    # type t: values (1,3,2) at ids 1,2,3 split ACROSS batches → carry.
    # type u: same multiset permuted (3,1,2) at ids 4,5,6, one batch,
    #         file rows out of order.
    b0 = [
        {"event_type": "t", "event_id": 1, "value": 1.0},
        {"event_type": "t", "event_id": 2, "value": 3.0},
        {"event_type": "u", "event_id": 5, "value": 1.0},
        {"event_type": "u", "event_id": 4, "value": 3.0},
        {"event_type": "u", "event_id": 6, "value": 2.0},
    ]
    b1 = [
        {"event_type": "t", "event_id": 3, "value": 2.0},
        {"event_type": "t", "event_id": 7, "value": None},  # dropped
    ]
    src = str(tmp_path / "src_cusum")
    _os.makedirs(src)

    def write_batch(fname, rows):
        with open(_os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write_batch("b0.json", b0)
    stream = spark.readStream.schema(
        "event_type string, event_id long, value double"
    ).json(src)
    out = streaming_cusum(stream, k_e4=20000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cusum_out")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("b1.json", b1)
        q.processAllAvailable()
        rows = spark.sql("select * from cusum_out").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:  # later snapshots have larger n_events per key
        if r.event_type not in latest or r.n_events > latest[r.event_type].n_events:
            latest[r.event_type] = r

    # batch twin: the REGISTERED query over the union written as events
    # parquet (its retrospective per-type mean = the frozen k by fixture
    # construction: both types hold {1,2,3} → mean 2.0 → k_e4 = 20000).
    ts = _dt.datetime(2024, 1, 1)
    union = [
        (r["event_id"], ts, 1, r["event_type"], r["value"], "{}")
        for r in b0 + b1
    ]
    spark.createDataFrame(
        union,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from storm_data_etl_spark.plans import window_queries  # noqa: F401
    from storm_data_etl_spark.plans.queries import REGISTRY

    twin = {
        r.event_type: r
        for r in REGISTRY["cusum_drift_scores"].runner(spark, str(tmp_path)).collect()
    }
    assert set(latest) == set(twin) == {"t", "u"}
    for et in ("t", "u"):
        assert twin[et].k_e4 == 20000  # fixture premise
        assert latest[et].n_events == twin[et].n_events
        assert latest[et].cusum_pos_e4 == twin[et].cusum_pos_e4
        assert latest[et].cusum_neg_e4 == twin[et].cusum_neg_e4
    # and the hand numbers, so the twin agreement is not vacuous
    assert (latest["t"].cusum_pos_e4, latest["t"].cusum_neg_e4) == (10000, 0)
    assert (latest["u"].cusum_pos_e4, latest["u"].cusum_neg_e4) == (0, 10000)


def test_streaming_running_stats_order_col_sorts_within_batch(spark, tmp_path):
    """With order_col set, the EWMA folds in event_id order regardless of
    file row order; count/sum/min/max are order-free and unchanged. The
    expected EWMA is hand-folded over the SORTED values."""
    import json as _json
    import os as _os

    from storm_data_etl_spark.streaming.stateful import streaming_running_stats

    src = str(tmp_path / "src_rs_ord")
    _os.makedirs(src)
    # file order (3.0, 1.0, 2.0) but event_id order (1.0, 2.0, 3.0)
    rows = [
        {"user_id": 1, "event_id": 3, "value": 3.0},
        {"user_id": 1, "event_id": 1, "value": 1.0},
        {"user_id": 1, "event_id": 2, "value": 2.0},
    ]
    with open(_os.path.join(src, "b0.json"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    stream = spark.readStream.schema(
        "user_id long, event_id long, value double"
    ).json(src)
    out = streaming_running_stats(stream, order_col="event_id")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("rs_ord_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from rs_ord_out").collect()
    finally:
        q.stop()
    assert len(got) == 1
    r = got[0]
    assert (r.n, r.total, r.vmin, r.vmax) == (3, 6.0, 1.0, 3.0)
    # hand fold over (1, 2, 3): s=1 → 0.2*2+0.8*1=1.2 → 0.2*3+0.8*1.2=1.56
    ewma = 1.0
    for x in (2.0, 3.0):
        ewma = 0.2 * x + 0.8 * ewma
    assert r.ewma == ewma


def test_streaming_cusum_sorts_across_arrow_chunks(spark, tmp_path):
    """With arrow.maxRecordsPerBatch=2, one key's 6-row micro-batch is
    delivered as 3 pandas chunks; rows are written globally shuffled so
    chunk-LOCAL sorting would fold in the wrong order (the max-clamp is
    non-commutative). Pins the concat-then-one-stable-sort fix: values
    (1,2,3,1,2,3) in event_id order with k=2.0 give S⁺=10000, S⁻=10000;
    the shuffled arrival order would give different clamp points."""
    import json as _json
    import os as _os

    from storm_data_etl_spark.streaming.stateful import streaming_cusum

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        src = str(tmp_path / "src_cusum_chunks")
        _os.makedirs(src)
        # event_id order values: 1,2,3,1,2,3 (k=2 → devs -1,0,+1,-1,0,+1
        # e4-scaled). File order interleaves ids across chunk boundaries.
        rows = [
            {"event_type": "t", "event_id": 6, "value": 3.0},
            {"event_type": "t", "event_id": 1, "value": 1.0},
            {"event_type": "t", "event_id": 4, "value": 1.0},
            {"event_type": "t", "event_id": 3, "value": 3.0},
            {"event_type": "t", "event_id": 2, "value": 2.0},
            {"event_type": "t", "event_id": 5, "value": 2.0},
        ]
        with open(_os.path.join(src, "b0.json"), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        stream = spark.readStream.schema(
            "event_type string, event_id long, value double"
        ).json(src)
        out = streaming_cusum(stream, k_e4=20000)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("cusum_chunks_out")
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql("select * from cusum_chunks_out").collect()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(got) == 1
    r = got[0]
    assert r.n_events == 6
    # Hand fold over the id-ordered devs (-1,0,+1,-1,0,+1)·1e4:
    # S⁺ → 0,0,10000,0,0,10000 (final 10000)
    # S⁻ → 10000,10000,0,10000,10000,0 (final 0).
    # A chunk-LOCAL sort of the file order ((6,1),(4,3),(2,5)) folds
    # devs (-1,+1,+1,-1,0,0)·1e4 instead → S⁻ ends at 10000, not 0 —
    # so this assertion discriminates the bug.
    assert (r.cusum_pos_e4, r.cusum_neg_e4) == (10000, 0)
