"""Scaling-curve measurement: run the bench headline queries at every
available scale factor and report per-query wall time plus the implied
scaling exponent between the largest two SFs (time ratio / data ratio).

An exponent ≈ 1 means linear scaling (scan-bound — the shape that survives
a 100× cluster scale-up); < 1 means fixed overhead still dominates at these
sizes; >> 1 flags a super-linear stage (pair explosion, skewed shuffle) to
fix before real scale.

Usage: python tools/scaling_curve.py [sf_dir ...]  (default: the three
driver testdata SFs). Prints one JSON line per SF and a final summary table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

from storm_data_etl_spark.session import get_spark, release_pinned  # noqa: E402


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    import bench

    spark = get_spark("scaling-curve", master="local[32]")
    from storm_data_etl_spark.plans import queries as _q
    from storm_data_etl_spark.plans.tables import t

    runners = {
        name: _q.REGISTRY[name].runner
        for name in bench.HEADLINE
        if name in _q.REGISTRY
    }
    # Same dev-loop subset filter as bench.py.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    only_set = {s.strip() for s in only.split(",") if s.strip()}
    if only_set:
        runners = {n: f for n, f in runners.items() if n in only_set}

    results: dict[str, dict[str, float]] = {}
    sfs: list[float] = []
    for sf_dir in sf_dirs:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
        sfs.append(sf)
        t(spark, sf_dir, "lineitem").count()  # warmup: JVM + cache fill
        times: dict[str, float] = {}
        for name, fn in runners.items():
            df = fn(spark, sf_dir)
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
            times[name] = round(best, 3)
            release_pinned()
        results[str(sf)] = times
        print(json.dumps({"sf": sf, "queries": times}))

    if len(sfs) >= 2:
        lo, hi = str(sfs[-2]), str(sfs[-1])
        data_ratio = sfs[-1] / sfs[-2]
        print(f"\n{'query':34s} {'sf' + lo:>9s} {'sf' + hi:>9s}  exponent")
        for name in runners:
            a, b = results[lo].get(name), results[hi].get(name)
            if not a or not b or a <= 0:
                continue
            exp = math.log(b / a) / math.log(data_ratio)
            print(f"{name:34s} {a:9.3f} {b:9.3f}  {exp:6.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
