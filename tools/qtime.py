"""Time named queries in isolation with the noop sink (guide §1.4).

Usage: python tools/qtime.py [-n RUNS] <query> [query ...]

Prints per-query median of RUNS (default 5) interleaved rounds after one
warmup round, matching bench.py methodology but restricted to the named
queries so a single optimization iterates in seconds, not a 20-minute
full bench. Labels each job (guide §1.5).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    n_runs = 5
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    names = args

    from osm_poi_database_maker_spark.queries import QUERIES
    from osm_poi_database_maker_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qtime")
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rnd in range(n_runs + 1):  # round 0 = warmup, discarded
        for name in names:
            spark.sparkContext.setJobDescription(f"qtime:{name}:r{rnd}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            if rnd > 0:
                samples[name].append(dt)
    for name in names:
        ts = samples[name]
        print(
            f"{name}: median={statistics.median(ts):.3f}s "
            f"min={min(ts):.3f} max={max(ts):.3f} runs={ts}"
        )


if __name__ == "__main__":
    main()
