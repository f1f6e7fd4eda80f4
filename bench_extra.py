"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Per-query isolation following the optimization guide §1:
- times each query exactly the way bench.py does (`fn(spark, sf_dir).count()`),
  min of N passes, in a session configured identically to bench.py's query
  pass (cores=$SPARK_GRAFT_CPUS, shuffle_partitions=cores);
- additionally records the number of Spark JOBS each query ran (driver-round
  floor diagnostics: job_count x ~per-job floor explains the maintained/
  iterate family's time) and the per-query wall seconds;
- `--explain <query>` captures .explain("formatted") to stdout for plan-shape
  audits (committed under plans/r06/).

Usage:
  python bench_extra.py                       # all queries, 2 passes
  python bench_extra.py q1 q2 ...             # subset
  python bench_extra.py --passes 3 q1         # more passes
  python bench_extra.py --explain q1          # print formatted plan
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from differential_dataflow_spark.queries import QUERIES
    from differential_dataflow_spark.session import get_spark, release_all_cached

    args = sys.argv[1:]
    passes = 2
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    explain = "--explain" in args
    if explain:
        args.remove("--explain")
    names = args if args else list(QUERIES.keys())

    spark = get_spark(app_name="bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    from pyspark.sql import functions as F

    # Same warmup as bench.py's first query pass.
    spark.range(20_000_000).groupBy((F.col("id") % 97).alias("g")).agg(
        F.count("*")
    ).count()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    if explain:
        for name in names:
            df = QUERIES[name](spark, SF_DIR)
            print(f"=== {name} ===")
            df.explain("formatted")
            release_all_cached(spark)
        return

    tracker = spark.sparkContext.statusTracker()
    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        times, jobs = [], []
        for p in range(passes):
            release_all_cached(spark)
            j0 = max(tracker.getJobIdsForGroup() or [-1])
            t0 = time.time()
            fn(spark, SF_DIR).count()
            dt = time.time() - t0
            j1 = max(tracker.getJobIdsForGroup() or [-1])
            times.append(dt)
            jobs.append(j1 - j0)
            release_all_cached(spark)
        results[name] = {
            "min_sec": round(min(times), 3),
            "times": [round(t, 3) for t in times],
            "jobs": jobs[-1],
        }
        print(
            f"{name}: min={min(times):.3f}s jobs={jobs[-1]} times={[round(t,2) for t in times]}",
            file=sys.stderr,
            flush=True,
        )
    total = sum(r["min_sec"] for r in results.values())
    out = {"sf_dir": SF_DIR, "cpus": CPUS, "total_min_sec": round(total, 3), "queries": results}
    Path("/tmp/bench_extra_last.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
