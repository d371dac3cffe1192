"""Lake-maintenance operators: CDC merge, PII redaction, Z-order layout,
small-file compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from storm_data_etl_spark.functions import pii as PII
from storm_data_etl_spark.functions.zorder import interleave_bits
from storm_data_etl_spark.operators.merge import upsert_last_writer_wins
from storm_data_etl_spark.plans.tables import t
from storm_data_etl_spark.sources.parquet import compact_parquet, write_zordered


def test_upsert_last_writer_wins(spark):
    log = spark.createDataFrame(
        [
            Row(k=1, v="a", ver=1, op="I"),
            Row(k=1, v="b", ver=2, op="U"),  # update wins over insert
            Row(k=2, v="c", ver=1, op="I"),
            Row(k=3, v="d", ver=1, op="I"),
            Row(k=3, v=None, ver=2, op="D"),  # tombstone removes the key
            Row(k=4, v="x", ver=5, op="I"),
            Row(k=4, v="y", ver=5, op="U"),  # same version: op desc breaks tie
        ]
    )
    got = {
        r["k"]: r["v"]
        for r in upsert_last_writer_wins(log, ["k"], "ver", "op").collect()
    }
    assert got == {1: "b", 2: "c", 4: "y"}


def test_upsert_without_op_column_keeps_latest(spark):
    log = spark.createDataFrame([Row(k=1, v="old", ver=1), Row(k=1, v="new", ver=9)])
    rows = upsert_last_writer_wins(log, ["k"], "ver").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1, "new")]


def test_pii_redact_and_count(spark):
    df = spark.createDataFrame(
        [Row(text="mail a.b+c@x-corp.io or call 555-013-0042 from 10.0.3.7 ok")]
    )
    row = df.select(
        PII.redact("text").alias("clean"),
        PII.pii_count("text", "email").alias("e"),
        PII.pii_count("text", "phone").alias("p"),
        PII.pii_count("text", "ipv4").alias("i"),
    ).first()
    assert row["clean"] == "mail <EMAIL> or call <PHONE> from <IP> ok"
    assert (row["e"], row["p"], row["i"]) == (1, 1, 1)


def test_interleave_bits_truth_table(spark):
    df = spark.createDataFrame(
        [Row(x=0, y=0), Row(x=1, y=0), Row(x=0, y=1), Row(x=3, y=5), Row(x=65535, y=65535)]
    )
    z = [
        r["z"]
        for r in df.select(
            interleave_bits([F.col("x"), F.col("y")], 16).alias("z")
        ).collect()
    ]
    # bit b of x → position 2b; bit b of y → position 2b+1
    assert z[0] == 0
    assert z[1] == 1
    assert z[2] == 2
    assert z[3] == 0b100111  # x=11 → bits 0,2; y=101 → bits 1,5 → 39
    assert z[4] == 2**32 - 1


def test_zorder_write_improves_box_locality(spark, sf_dir, tmp_path):
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts_utc")
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    n_files = 8
    # baseline: sorted by time only (the default single-dim layout)
    ev.repartitionByRange(n_files, "ts_utc").sortWithinPartitions("ts_utc").write.parquet(linear)
    write_zordered(ev, zord, ["user_id", "value"], n_files=n_files)

    box = (F.col("user_id").between(10, 12)) & (F.col("value").between(50.0, 80.0))

    def files_touched(path: str) -> int:
        return (
            spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    # same rows either way
    assert (
        spark.read.parquet(zord).filter(box).count()
        == spark.read.parquet(linear).filter(box).count()
    )
    # the 2-d box concentrates in fewer files under Z-order → min/max footer
    # stats let the scan skip the rest
    assert files_touched(zord) < files_touched(linear)


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "small_files")
    dest = str(tmp_path / "compacted")
    spark.range(0, 10_000).repartition(32).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "part-*"))) == 32
    n = compact_parquet(spark, src, dest, target_bytes=128 << 20)
    assert n == 1
    assert len(glob.glob(os.path.join(dest, "part-*"))) == 1
    assert spark.read.parquet(dest).count() == 10_000


def test_pagerank_known_graph(spark):
    # star: 1 -> {2,3}, 2 -> 1, 3 -> 1 ; hand-computed 2 iterations
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=1, dst=3), Row(src=2, dst=1), Row(src=3, dst=1)]
    )
    from storm_data_etl_spark.operators.graph import pagerank

    r2 = {r["node"]: r["rank"] for r in pagerank(edges, iterations=2).collect()}
    # iter1: r(1)=0.15+0.85*(1+1)=1.85 ; r(2)=r(3)=0.15+0.85*0.5=0.575
    # iter2: r(1)=0.15+0.85*(0.575+0.575)=1.1275 ; r(2)=r(3)=0.15+0.85*0.925=0.93625
    assert abs(r2[1] - 1.1275) < 1e-12
    assert abs(r2[2] - 0.93625) < 1e-12 and abs(r2[3] - 0.93625) < 1e-12


def test_pagerank_sink_node_gets_base_rank(spark):
    # 1 -> 2 ; node 2 has no out-edges (dangling), node 1 no in-edges
    edges = spark.createDataFrame([Row(src=1, dst=2)])
    from storm_data_etl_spark.operators.graph import pagerank

    r = {row["node"]: row["rank"] for row in pagerank(edges, iterations=3).collect()}
    assert abs(r[1] - 0.15) < 1e-12  # no in-edges -> reset mass only
    assert abs(r[2] - (0.15 + 0.85 * 0.15)) < 1e-12


def test_interleave_bits_matches_python_model(spark):
    import random

    rng = random.Random(42)
    pairs = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(200)]

    def model(x: int, y: int) -> int:
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    df = spark.createDataFrame([Row(x=x, y=y) for x, y in pairs])
    got = [
        r["z"]
        for r in df.select(
            interleave_bits([F.col("x"), F.col("y")], 16).alias("z")
        ).collect()
    ]
    assert got == [model(x, y) for x, y in pairs]


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    """Backfill ONE day partition idempotently: with
    partitionOverwriteMode=dynamic, an overwrite write replaces only the
    partitions present in the incoming frame — the standard lake backfill
    (re-run a bad day) that static overwrite mode would turn into
    truncate-the-table."""
    lake = str(tmp_path / "daily_lake")
    base = spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0),
            (2, "2024-01-01", 20.0),
            (3, "2024-01-02", 30.0),
            (4, "2024-01-03", 40.0),
        ],
        "event_id long, day string, value double",
    )
    base.write.partitionBy("day").mode("overwrite").parquet(lake)

    # Backfill day 2 with corrected values (one row dropped, one changed).
    fixed = spark.createDataFrame(
        [(3, "2024-01-02", 33.0)], "event_id long, day string, value double"
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed.write.partitionBy("day").mode("overwrite").parquet(lake)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    # partition-column inference parses the day strings back as DATEs
    got = {
        (r.event_id, str(r.day), r.value)
        for r in spark.read.parquet(lake).collect()
    }
    assert got == {
        (1, "2024-01-01", 10.0),
        (2, "2024-01-01", 20.0),
        (3, "2024-01-02", 33.0),  # replaced
        (4, "2024-01-03", 40.0),  # untouched
    }


def test_compaction_plan_next_fit_semantics(spark):
    """Hand-built file listing: next-fit must close a bin exactly when the
    EXCLUSIVE prefix reaches the target, and an oversized file must occupy
    a bin alone without absorbing its successors' budget."""
    import datetime as dt

    from pyspark.sql import functions as F

    from storm_data_etl_spark.plans import lake_queries as LQ

    # one event row per (type, hour) with count = size/128
    base = dt.datetime(2024, 1, 1)
    rows = []
    # type 'a': hourly file sizes (bytes): 40k, 30k, 70k(oversized), 10k, 20k
    for hour, size in enumerate([40 * 1024, 30 * 1024, 70 * 1024, 10 * 1024, 20 * 1024]):
        for i in range(size // 128):
            rows.append((len(rows), base + dt.timedelta(hours=hour), 1, "a", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts_utc", F.col("ts"))
    orig = LQ.t
    LQ.t = lambda spark_, sf_dir_, name: df  # noqa: ARG005
    try:
        out = {r.bin_id: r for r in LQ.compaction_plan(spark, "x").collect()}
    finally:
        LQ.t = orig
    # target 64k: exclusive prefixes are 0k, 40k, 70k, 140k, 150k
    # → bins 0, 0, 1, 2, 2
    assert out[0].n_files == 2 and out[0].total_bytes == 70 * 1024
    assert out[1].n_files == 1 and out[1].total_bytes == 70 * 1024  # oversized alone
    assert out[2].n_files == 2 and out[2].total_bytes == 30 * 1024
    assert (out[0].first_hour, out[0].last_hour) == (out[0].first_hour, out[0].first_hour + 1)


def test_hilbert_index_matches_reference_and_locality(spark):
    """The JVM fold must equal the classic xy→d algorithm, and the curve
    must be a bijection with unit steps on a small grid (the locality
    property that beats Morton for box queries)."""
    import random

    from pyspark.sql import functions as F

    from storm_data_etl_spark.functions.zorder import hilbert_index

    def ref(x, y, bits):
        d = 0
        for b in range(bits - 1, -1, -1):
            s = 1 << b
            rx = 1 if x & s else 0
            ry = 1 if y & s else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
        return d

    rng = random.Random(7)
    pts = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(40)]
    pts += [(0, 0), (65535, 65535), (0, 65535), (65535, 0)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = [r.d for r in df.select(
        hilbert_index(F.col("x"), F.col("y"), 16).alias("d")).collect()]
    assert got == [ref(x, y, 16) for x, y in pts]

    # 8x8 grid: bijection onto 0..63 and every curve step moves to a
    # 4-neighbor cell (|dx|+|dy| == 1) — Morton fails this property
    grid = [(x, y) for y in range(8) for x in range(8)]
    gdf = spark.createDataFrame(grid, ["x", "y"])
    out = {(r.x, r.y): r.d for r in gdf.select(
        "x", "y", hilbert_index(F.col("x"), F.col("y"), 3).alias("d")).collect()}
    assert sorted(out.values()) == list(range(64))
    by_d = {d: xy for xy, d in out.items()}
    for d in range(63):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, f"step {d} not unit"


def test_luhn_valid_known_numbers(spark):
    """Classic Luhn vectors: industry test card numbers pass, off-by-one
    and non-digit strings fail, and a Python-model sweep agrees."""
    from storm_data_etl_spark.functions.pii import luhn_valid

    def py_luhn(s: str) -> bool:
        if not s.isdigit() or len(s) < 2:
            return False
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    cases = [
        "4111111111111111",   # Visa test number — valid
        "5500005555555559",   # MC test number — valid
        "4111111111111112",   # off by one — invalid
        "1234567812345678",   # invalid
        "0000000000000000",   # degenerate but Luhn-valid
        "411111111111111a",   # non-digit — invalid
        "79927398713",        # canonical Luhn example — valid
        "7",                  # too short
    ]
    # deterministic synthetic sweep widens coverage beyond the vectors
    cases += [str(1_000_000_000_000_000 + 48271 * i) for i in range(50)]
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    got = {r.s: r.v for r in df.select("s", luhn_valid("s").alias("v")).collect()}
    for c in cases:
        assert got[c] == py_luhn(c), c
    assert got["4111111111111111"] and not got["4111111111111112"]


def test_snapshot_retention_current_version_always_kept(spark, tmp_path):
    """An old CURRENT version survives expiry; old superseded versions are
    reclaimed; versions inside the 7-day window survive even when
    superseded."""
    import datetime as dt

    from storm_data_etl_spark.plans import lake_queries as LQ

    base = dt.datetime(2024, 3, 1)
    rows = [
        # file 0: two ancient superseded versions + one recent current
        (0, base, 1, "x", 1.0, "{}"),                                # rn=3, old
        (200, base + dt.timedelta(days=1), 1, "x", 1.0, "{}"),       # rn=2, old
        (400, base + dt.timedelta(days=29), 1, "x", 1.0, "{}"),      # current
        # file 1: single ancient version -> kept (current), nothing expires
        (1, base, 1, "x", 1.0, "{}"),
        # file 2: two versions inside the window -> both kept
        (2, base + dt.timedelta(days=28), 1, "x", 1.0, "{}"),
        (202, base + dt.timedelta(days=29), 1, "x", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.file_id: r for r in
           LQ.snapshot_retention_plan(spark, str(tmp_path)).collect()}
    # event 400 is current (kept); events 0 and 200 are superseded AND
    # before the day-22 cutoff -> both expire
    assert out[0].n_versions == 3 and out[0].n_keep == 1 and out[0].n_expire == 2
    assert out[1].n_versions == 1 and out[1].n_expire == 0
    assert out[2].n_keep == 2 and out[2].n_expire == 0


def test_encoding_plan_threshold(spark, tmp_path):
    """5% distinct-ratio boundary (strict <): 48/980 -> dictionary;
    49/980 sits exactly at 5% (20*49 == 980) -> plain."""
    import datetime as dt

    from storm_data_etl_spark.plans import lake_queries as LQ

    rows = [
        (i, dt.datetime(2024, 1, 1), i % 49, f"t{i % 48}", float(i), "{}")
        for i in range(980)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.column_name: r for r in
           LQ.encoding_dictionary_plan(spark, str(tmp_path)).collect()}
    assert out["event_type"].encoding == "dictionary"   # 48/980 < 5%
    assert out["user_id"].encoding == "plain"           # 20*49 == 980, not <
    assert out["value"].encoding == "plain"             # 980 distinct values
    assert out["props"].encoding == "dictionary"        # single value
    assert out["event_type"].n_distinct == 48 and out["value"].n_values == 980


def test_partition_pruning_layout_contrast(spark, sf_dir):
    """Value-clustered layout must prune (only buckets intersecting
    95.00-99.50 scan); time layout scans everything; per layout the
    matched rows are identical."""
    from storm_data_etl_spark.plans import lake_queries as LQ

    rows = LQ.partition_pruning_plan(spark, sf_dir).collect()
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r.layout, []).append(r)
    t_rows = by_layout["time"]
    v_rows = by_layout["value"]
    assert all(r.scanned for r in t_rows)          # time layout: no pruning
    scanned_v = [r for r in v_rows if r.scanned]
    assert 0 < len(scanned_v) < len(v_rows)        # value layout: real pruning
    # buckets 19 (95-100) must scan; bucket 0 (0-5) must not
    flags = {r.file_id: r.scanned for r in v_rows}
    assert flags[19] and not flags[0]
    # same true matches either layout; clustered reads strictly fewer rows
    assert sum(r.n_match for r in t_rows) == sum(r.n_match for r in v_rows)
    assert sum(r.rows_read for r in v_rows) < sum(r.rows_read for r in t_rows)
    # stats honesty: every scanned file's interval intersects the predicate
    for r in scanned_v:
        assert r.vmax_cents >= 9500 and r.vmin_cents <= 9950
