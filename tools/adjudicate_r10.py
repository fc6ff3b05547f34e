"""In-session-controls adjudication of the four r9 bench movers
(r9 verdict "What's wrong" #1), per the SCALE.md §r9-adjudication
protocol: warm session, sf0.1, local[32], 5 interleaved runs per query,
medians, with four r8→r9-stable controls measured in the SAME session
to calibrate the host.

Usage: python tools/adjudicate_r10.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MOVERS = [
    "lineitem_hist_quantiles",
    "doc_minhash_pairs",
    "doc_collapse_repeats",
    "orders_column_profile",
]
CONTROLS = [
    "brand_supplier_counts",
    "orders_referential_integrity",
    "customer_referral_rollup",
    "osm_dbscan_clusters",
]
SF_DIR = "/root/testdata/sf0.1"
N_RUNS = 5


def main() -> None:
    from osm_poi_database_maker_spark.queries import QUERIES
    from osm_poi_database_maker_spark.session import get_spark

    spark = get_spark("adjudicate")
    names = MOVERS + CONTROLS
    # warm: one untimed pass each
    for n in names:
        QUERIES[n](spark, SF_DIR).count()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(N_RUNS):
        for n in names:  # interleaved
            t0 = time.time()
            QUERIES[n](spark, SF_DIR).count()
            times[n].append(time.time() - t0)
    r8 = json.load(open(os.path.join(REPO, "BENCH_LOCAL_r08.json")))["queries"]
    r9 = json.load(open(os.path.join(REPO, "BENCH_LOCAL_r09.json")))["queries"]
    out = {}
    for n in names:
        med = statistics.median(times[n])
        out[n] = {
            "kind": "mover" if n in MOVERS else "control",
            "r8": r8[n],
            "r9": r9[n],
            "idle_median": round(med, 3),
            "vs_r8": round(med / r8[n], 2),
            "vs_r9": round(med / r9[n], 2),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
