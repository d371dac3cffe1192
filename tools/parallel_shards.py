"""Parallel-shard deployment-shape measurement (VERDICT r9 task 4).

The round-9 crossover table ran the 4 per-shard ExactSubstr builds
SEQUENTIALLY on one driver (sum-of-shards). Real deployment runs them as
independent jobs; the honest cluster number is max-of-shards + reconcile.
This harness runs the 4 shard builds CONCURRENTLY — one Python thread per
shard, each in its own FAIR scheduler pool inside the shared local[32]
session — then times the cross-shard reconcile + cut, and the global
build on the same corpus in the same boot.

Interpretation caveat (stated with the numbers): concurrent shards here
still SHARE 32 cores, so the parallel-shard wall is an UPPER bound on a
real cluster's max-of-shards (there each shard owns its own executors);
the reconcile/cut phase is shared-fate in both deployments. The
suffix-array build has per-round driver sync points where executors idle
— exactly the gaps concurrent shard jobs fill, which is why even
core-sharing concurrency beats the sequential sum.

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/parallel_shards.py \
      /tmp/spark-graft-stretch/N10 /tmp/spark-graft-stretch/N30

Prints one JSON line per corpus:
  {"corpus", "chars", "global_s", "shard_s": [...4], "shards_wall_s",
   "reconcile_cut_s", "sharded_wall_s", "sharded_parallel_s",
   "global_rows", "sharded_rows", "cut_checksum_match"}
`sharded_parallel_s` is null unless the shard phase ran CONCURRENTLY in
this process (ADVICE r11 — a sequential sum must not read as the
parallel wall); `sharded_wall_s` + `shard_mode` carry the mode-qualified
number in every mode.

Single-host N100-class workflow (each step a FRESH process so shard
builds get the scratch-disk isolation a cluster's executors have):
  SPARK_GRAFT_ONLY_SHARD=i SPARK_GRAFT_SHARD_DP_DIR=/tmp/dp ...   # ×4
  SPARK_GRAFT_RECONCILE_FROM=/tmp/dp \
      SPARK_GRAFT_EXPECT_CHECKSUM=rows:hash ...  # reconcile + cut +
      # identity check against the recorded global-build checksum
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from storm_data_etl_spark.operators.suffix import (  # noqa: E402
    _cross_shard_positions,
    _cut_from_dup_positions,
    _dup_positions,
    _is_big_corpus,
    exact_substr_cut,
)
from storm_data_etl_spark.session import get_spark  # noqa: E402

MIN_LEN = 32
N_SHARDS = 4


def _checksum(cut_df):
    """Order-insensitive certificate of the cut SET: count plus xor/sum
    folds over (doc_id, n_cut_chars, deduped_len)."""
    row = cut_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64(
                    F.col("doc_id"), F.col("n_cut_chars"), F.col("deduped_len")
                ),
                F.lit(1_000_000_007),
            )
        ).alias("h"),
    ).collect()[0]
    return (row["n"], int(row["h"] or 0))


def measure(spark, corpus_dir: str) -> dict:
    d = (
        spark.read.parquet(f"{corpus_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    chars = d.agg(F.sum(F.length("text"))).collect()[0][0]
    big = _is_big_corpus(d, F.length("text"))
    shard_of = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_SHARDS))

    # --- Phase 1: per-shard suffix-array dup positions. Concurrent by
    # default (deployment shape, threads + FAIR pools); SOLO mode builds
    # the shards sequentially, one at a time — each timing is then an
    # honest per-shard number for a cluster where every shard owns its own
    # executors AND its own scratch disks. Solo mode exists because 4
    # concurrent N100-class shard builds overran this host's 80 GB shuffle
    # scratch (java.io.IOException: No space left on device) — a real
    # single-host boundary a cluster does not share; at that scale the
    # max-of-solo-shards + reconcile is the deployable number.
    solo = os.environ.get("SPARK_GRAFT_SHARDS_SOLO", "") == "1"
    #: GLOBAL_ONLY skips the shard phase entirely — used to probe whether
    #: the global build alone fits the single-host scratch budget after
    #: the shard phases exhausted it (the N100 boundary question).
    global_only = os.environ.get("SPARK_GRAFT_GLOBAL_ONLY", "") == "1"
    shard_times = [0.0] * N_SHARDS
    shard_dps = [None] * N_SHARDS

    def build_shard(i: int):
        # per-thread pool => FAIR sharing across the 4 shard jobs
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"shard{i}")
        t0 = time.perf_counter()
        part = d.filter(shard_of == i)
        dp = _dup_positions(part, MIN_LEN).localCheckpoint(eager=True)
        dp.count()
        shard_times[i] = round(time.perf_counter() - t0, 1)
        shard_dps[i] = dp

    #: ONLY_SHARD=i builds exactly one shard then stops (reconcile/global
    #: skipped) — run one per FRESH process to measure the per-shard cost
    #: with the scratch-disk isolation a cluster's executors actually have.
    #: With SPARK_GRAFT_SHARD_DP_DIR set, the shard's dup positions are
    #: saved as parquet (dir/shard{i}) so a later RECONCILE_FROM process
    #: can run the cross-shard reconcile + cut without rebuilding — the
    #: per-process isolation a real cluster's independent shard jobs have,
    #: with the shard outputs landing on shared storage exactly as they
    #: would land on a cluster's object store.
    only_shard = os.environ.get("SPARK_GRAFT_ONLY_SHARD", "")
    dp_dir = os.environ.get("SPARK_GRAFT_SHARD_DP_DIR", "")
    #: RECONCILE_FROM=dir skips the shard builds and loads the four saved
    #: dup-position parquets instead; the process then times ONLY the
    #: shared-fate reconcile + cut (phase 2) and checksums the cut set.
    reconcile_from = os.environ.get("SPARK_GRAFT_RECONCILE_FROM", "")

    wall0 = time.perf_counter()
    if global_only or reconcile_from:
        pass
    elif only_shard != "":
        build_shard(int(only_shard))
    elif solo:
        for i in range(N_SHARDS):
            build_shard(i)
    else:
        with ThreadPoolExecutor(max_workers=N_SHARDS) as ex:
            list(ex.map(build_shard, range(N_SHARDS)))
    shards_wall = round(time.perf_counter() - wall0, 1)
    if only_shard != "":
        rec = {
            "corpus": os.path.basename(corpus_dir.rstrip("/")),
            "chars": int(chars),
            "shard": int(only_shard),
            "shard_s": shard_times[int(only_shard)],
        }
        if dp_dir:
            t0 = time.perf_counter()
            shard_dps[int(only_shard)].write.mode("overwrite").parquet(
                os.path.join(dp_dir, f"shard{only_shard}")
            )
            rec["dp_save_s"] = round(time.perf_counter() - t0, 1)
        print("SHARD_ONLY " + json.dumps(rec), flush=True)
        return {"shard_only": shard_times[int(only_shard)]}

    # --- Phase 2, shared-fate: reconcile + keep-first cut.
    t0 = time.perf_counter()
    if reconcile_from:
        shard_dps = [
            spark.read.parquet(os.path.join(reconcile_from, f"shard{i}"))
            for i in range(N_SHARDS)
        ]
    if global_only:
        sharded_sum = (None, None)
        reconcile_s = 0.0
    else:
        within = shard_dps[0]
        for dp in shard_dps[1:]:
            within = within.unionByName(dp)
        cross = _cross_shard_positions(d, shard_of, MIN_LEN, big)
        dup_pos = within.unionByName(cross).distinct()
        sharded_cut = _cut_from_dup_positions(d, dup_pos, MIN_LEN, big=big)
        sharded_sum = _checksum(sharded_cut)
        reconcile_s = round(time.perf_counter() - t0, 1)

    # Partial record FIRST (flushed by the caller): at N100-class sizes
    # the global build can exhaust the declared-config driver — a dead JVM
    # must not take the already-measured shard phase with it.
    # Record labeling (ADVICE r11): `sharded_parallel_s` is populated ONLY
    # when the shard phase actually ran concurrently — in solo-sequential
    # mode the wall is a SUM of sequential builds and in global-only /
    # reconcile-from modes no shards ran here at all, so the parallel key
    # is null and the mode-qualified `sharded_wall_s` (+ `shard_mode`)
    # carries what was measured in THIS process.
    shards_ran = not (global_only or reconcile_from)
    rec = {
        "corpus": os.path.basename(corpus_dir.rstrip("/")),
        "chars": int(chars),
        "big_regime": big,
        "shard_mode": (
            "skipped (global-only)"
            if global_only
            else (
                "loaded (reconcile-from)"
                if reconcile_from
                else ("solo-sequential" if solo else "concurrent")
            )
        ),
        "global_s": None,
        "shard_s": shard_times if shards_ran else None,
        "shards_wall_s": shards_wall if shards_ran else None,
        "reconcile_cut_s": None if global_only else reconcile_s,
        "sharded_wall_s": (
            round(shards_wall + reconcile_s, 1) if shards_ran else None
        ),
        "sharded_parallel_s": (
            round(shards_wall + reconcile_s, 1)
            if shards_ran and not solo
            else None
        ),
        "global_rows": None,
        "sharded_rows": sharded_sum[0],
        "sharded_checksum": sharded_sum,
        "cut_checksum_match": None,
    }
    print("PARTIAL " + json.dumps(rec), flush=True)

    # In reconcile-from mode the global number already exists (the prior
    # global-only run) — compare against it when provided instead of
    # re-paying the global build in this process.
    expect = os.environ.get("SPARK_GRAFT_EXPECT_CHECKSUM", "")
    if reconcile_from and expect:
        n_s, h_s = expect.split(":")
        rec["expected_checksum"] = [int(n_s), int(h_s)]
        rec["cut_checksum_match"] = sharded_sum == (int(n_s), int(h_s))
        return rec

    # --- Global build, same boot (also re-proves the scoped-hint big
    # regime completes at this scale — VERDICT r9 task 3 done-condition).
    try:
        t0 = time.perf_counter()
        global_cut = exact_substr_cut(d, MIN_LEN)
        global_sum = _checksum(global_cut)
        rec["global_s"] = round(time.perf_counter() - t0, 1)
        rec["global_rows"] = global_sum[0]
        rec["global_checksum"] = global_sum
        rec["cut_checksum_match"] = (
            None if global_only else global_sum == sharded_sum
        )
    except Exception as exc:  # document the boundary, keep the shard data
        rec["global_error"] = f"{type(exc).__name__}: {exc}"[:300]
    return rec


def main() -> int:
    dirs = sys.argv[1:] or [
        "/tmp/spark-graft-stretch/N10",
        "/tmp/spark-graft-stretch/N30",
    ]
    spark = get_spark(
        "parallel-shards",
        master="local[32]",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    for cd in dirs:
        if not os.path.isdir(cd):
            print(f"skip {cd}: not found", file=sys.stderr)
            continue
        print(json.dumps(measure(spark, cd)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
