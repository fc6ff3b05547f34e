"""r14 verdict item 3: a scaling-capable bench point.

sf0.1 is overhead-bound (the r14 8-core block's median 8c/32c ratio was
0.89 — core count barely mattered), so this tool times the TOP-30
batch queries by round-open cost (read from the committed
BENCH_LOCAL_r15.json) against a 10x constant-density replica
(sf1.0-scale, built with scale_experiment.build_replica) and prints the
bench contract's one JSON line. Run it once with SPARK_GRAFT_CPUS=32
and once with SPARK_GRAFT_CPUS=8 on the same replica dir; the 8c/32c
ratio per query is the scaling evidence sf0.1 structurally cannot give.

Usage:
  python tools/scale_bench_r15.py [replica_dir]
Env: SPARK_GRAFT_CPUS (session core count, the bench contract's knob),
     SPARK_GRAFT_BENCH_RUNS (default 2 — the replica is 10x the data;
     interleaved rounds, median), SPARK_GRAFT_BENCH_OUT (JSON dest).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOP_N = 30


def top_queries() -> list[str]:
    with open(os.path.join(REPO, "BENCH_LOCAL_r15.json")) as fh:
        base = json.load(fh)["queries"]
    return [n for n, _ in sorted(base.items(), key=lambda kv: -kv[1])[:TOP_N]]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/replica_sf1.0"
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

    from osm_poi_database_maker_spark.queries import QUERIES
    from osm_poi_database_maker_spark.session import (
        default_parallelism,
        get_spark,
    )

    names = top_queries()
    spark = get_spark("scale-bench-r15")
    # warmup: session + parquet footers
    QUERIES[names[-1]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rnd in range(n_runs):
        for name in names:
            spark.sparkContext.setJobDescription(f"scale-bench:{name}:r{rnd}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
    timings = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}
    out = {
        "metric": "total_query_runtime",
        "unit": "sec",
        "queries": timings,
        "samples": {n: [round(t, 3) for t in ts] for n, ts in samples.items()},
        "sf": 1.0,
        "replica_of": "/root/testdata/sf0.1 x10 constant",
        "cpus": default_parallelism(),
        "runs_per_query": n_runs,
        "n_queries": len(timings),
        "value": round(sum(timings.values()), 3),
    }
    dest = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if dest:
        with open(dest, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
