"""Scaling experiment: replicate an SF dir N× and time registry queries
at 1× vs N× to measure how each operator's cost actually grows.

Two replication modes (the round-3 methodology, now checked in):

* ``constant`` — constant duplicate density: replica k suffixes every
  document token with ``k``, perturbs embeddings with seeded noise, and
  offsets user/order ids, so per-key and per-shingle frequencies stay at
  1× levels while volume grows N×. Measures pure data-volume scaling.
* ``growth`` — growing duplicate density: replicas share text and
  vectors verbatim, so every doc/vector gains N-1 near-identical twins
  and pair-producing operators face a ~N² harder PROBLEM, not just more
  data. Measures how the pair guards (bucket caps, df caps, cells)
  absorb duplicate mass.

Usage:
  python tools/scale_experiment.py [N] [mode] [query ...]
Defaults: N=4, mode=constant, queries = the round-4 additions.

Results are reported as wall-clock medians (2 runs, warm session) and a
N×/1× ratio; interpret ratios against each operator's documented
contract (linear, quadratic-exact-by-contract, constant-output).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "doc_bpe_merges",
    "doc_bpe_encode",
    "doc_dup_ngram_fraction",
    "doc_quality_filter_verdict",
    "doc_source_overlap_matrix",
    "emb_knn_graph",
    "emb_semdedup",
    "emb_pq_codes",
    "emb_ivf_pq_topk",
    "events_path_trigrams",
    "nation_volume_shipping",
    "orders_scd2_intervals",
]

OFFSET = 1_000_000_000


def build_replica(src: str, dst: str, n: int, mode: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    tables = [
        f[:-8] for f in os.listdir(src) if f.endswith(".parquet")
    ]
    for t in tables:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(dst, f"{t}.parquet")
        parts = []
        for k in range(n):
            off = k * OFFSET
            if t == "documents":
                if mode == "constant" and k > 0:
                    # suffix every token with the replica id: disjoint
                    # shingle/word universes per replica
                    txt = f"regexp_replace(text, '(\\S+)', '\\1{k}', 'g')"
                else:
                    txt = "text"
                parts.append(
                    f"SELECT doc_id + {off} AS doc_id, {txt} AS text,"
                    f" lang, source, n_chars FROM read_parquet('{sp}')"
                )
            elif t == "embeddings":
                if mode == "constant" and k > 0:
                    # seeded per-element perturbation: distinct vectors,
                    # same distribution (hash-based, reproducible)
                    vec = (
                        "list_transform(list_zip(embedding,"
                        " range(len(embedding))),"
                        f" p -> CAST(p[1] + ((hash(vec_id * 131 + p[2] * 17 + {k})"
                        " % 1000) / 1000.0 - 0.5) * 0.1 AS FLOAT))"
                    )
                else:
                    vec = "embedding"
                parts.append(
                    f"SELECT vec_id + {off} AS vec_id, {vec} AS embedding,"
                    f" label FROM read_parquet('{sp}')"
                )
            elif t == "events":
                parts.append(
                    f"SELECT event_id + {off} AS event_id, ts,"
                    f" user_id + {off} AS user_id, event_type, value, props"
                    f" FROM read_parquet('{sp}')"
                )
            elif t == "orders":
                parts.append(
                    f"SELECT o_orderkey + {off} AS o_orderkey,"
                    f" o_custkey + {off} AS o_custkey,"
                    " o_orderstatus, o_totalprice, o_orderdate,"
                    f" o_orderpriority FROM read_parquet('{sp}')"
                )
            elif t == "lineitem":
                parts.append(
                    f"SELECT l_orderkey + {off} AS l_orderkey,"
                    " l_partkey, l_suppkey, l_linenumber, l_quantity,"
                    " l_extendedprice, l_discount, l_tax, l_returnflag,"
                    f" l_linestatus, l_shipdate FROM read_parquet('{sp}')"
                )
            elif t == "customer":
                if mode == "constant" and k > 0:
                    # suffix names too: TPC-H names are key-unique, so a
                    # verbatim copy gives every name k twins — which made
                    # the FastSS edit-distance join face a quadratic
                    # twin-mass problem the mode's contract (per-key
                    # frequencies at 1x) says it must not (r14 finding)
                    name = f"c_name || '{k}' AS c_name"
                else:
                    name = "c_name"
                parts.append(
                    f"SELECT c_custkey + {off} AS c_custkey, {name},"
                    " * EXCLUDE (c_custkey, c_name)"
                    f" FROM read_parquet('{sp}')"
                )
            else:  # dims: nation/region/supplier/part — keep one copy
                if k == 0:
                    parts.append(f"SELECT * FROM read_parquet('{sp}')")
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dp}' (FORMAT PARQUET)"
        )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mode = sys.argv[2] if len(sys.argv) > 2 else "constant"
    names = sys.argv[3:] or DEFAULT_QUERIES

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = f"/tmp/scale_{mode}_{n}x"
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    print(f"building {n}x {mode}-density replica at {dst} ...")
    build_replica(src, dst, n, mode)

    from osm_poi_database_maker_spark.queries import QUERIES
    from osm_poi_database_maker_spark.session import get_spark

    spark = get_spark("scale-experiment")

    def timed(name: str, sf_dir: str) -> float:
        ts = []
        for i in range(3):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.time() - t0)
        return statistics.median(ts[1:])  # drop the cold first run

    print(f"{'query':34s} {'1x':>7s} {f'{n}x':>7s} ratio")
    for name in names:
        t1 = timed(name, src)
        tn = timed(name, dst)
        print(f"{name:34s} {t1:7.2f} {tn:7.2f} {tn / t1:5.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
