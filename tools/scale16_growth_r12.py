"""r11 verdict #3: 16× GROWTH-mode stress for the pair-producing dedup
family (doc_minhash_pairs, doc_ppjoin_pairs).

Growth mode (scale_experiment.build_replica mode="growth") replicates
documents VERBATIM: at N× every doc gains N−1 exact twins, so duplicate
MASS — not just volume — grows, and true-pair count itself is Θ(dup²):
~C(N,2) per original doc plus N² per original near-dup pair. That is
the pair-producing worst case the constant-density §16x run cannot
exercise. What must stay bounded is not the output (exact joins owe
every true pair by contract) but the GUARDS:

* minhash: band-bucket occupancy grows ~N× per bucket, so the 200 cap
  must BIND — candidates ΣC(min(c,200),2) must grow far slower than
  the uncapped ΣC(c,2); the tool reports both plus saturated-bucket
  counts.
* ppjoin (lossless): candidates may legitimately grow ~N²·true-pairs;
  the filter-quality metric is candidates / true-pairs — prefix +
  length filtering must keep that ratio roughly FLAT as duplicate mass
  explodes (a filter that degrades would show candidates growing
  faster than true pairs).

Usage: python tools/scale16_growth_r12.py [sf_dir]
  (default /root/testdata/sf0.1; prints the SCALE.md §16x-growth table)
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from scale16_r11 import _run, _session  # noqa: E402
from scale_experiment import build_replica  # noqa: E402

CHAIN = ["doc_minhash_pairs", "doc_ppjoin_pairs"]


def _minhash_bucket_stats(spark, sf_dir):
    """(capped candidates, uncapped candidates, saturated buckets):
    ΣC(min(c,200),2) vs ΣC(c,2) over (band, bucket), plus how many
    buckets hit the cap — the direct measurement of the guard binding."""
    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.dedup import (
        DEFAULT_BANDS,
        HASH_COUNT,
        _port_mix,
        lsh_bands,
        portable_token_hash,
        word_shingles,
    )
    from osm_poi_database_maker_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.filter(F.size(F.split(F.col("text"), " +")) >= 3)
        .select("doc_id", F.explode(word_shingles(F.col("text"))).alias("s"))
        .select("doc_id", portable_token_hash(F.col("s")).alias("h"))
    )
    mins = [
        F.min(_port_mix(F.col("h"), F.lit(i).cast("long"))).alias(f"m{i}")
        for i in range(HASH_COUNT)
    ]
    sigs = (
        sh.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[F.col(f"m{i}") for i in range(HASH_COUNT)]).alias("sig"),
        )
    )
    occ = (
        sigs.select(F.explode(lsh_bands(F.col("sig"), DEFAULT_BANDS)).alias("bb"))
        .groupBy("bb.band", "bb.bucket")
        .agg(F.count("*").alias("c"))
    )
    row = occ.agg(
        F.sum(
            F.least(F.col("c"), F.lit(200))
            * (F.least(F.col("c"), F.lit(200)) - 1)
            / 2
        ).alias("capped"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("uncapped"),
        F.sum((F.col("c") >= 200).cast("long")).alias("saturated"),
    ).collect()[0]
    return int(row.capped or 0), int(row.uncapped or 0), int(row.saturated or 0)


def _ppjoin_candidates(spark, sf_dir) -> int:
    """Distinct pre-verify candidate pairs of q_doc_ppjoin_pairs —
    the prefix-join output after the exact length filter, i.e. the rows
    the array-intersect verify must touch."""
    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.queries.dedup import (
        PPJOIN_T_DEN,
        PPJOIN_T_NUM,
    )

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.split(F.col("text"), " +").alias("t")).repartition(
        "doc_id"
    )
    t = F.col("t")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i),
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
            ),
        )
    )
    sh = (
        tok.filter(F.size(t) >= 3)
        .select("doc_id", F.explode(shingles).alias("shingle"))
        .select("doc_id", F.xxhash64("shingle").alias("h"))
        .repartition("h")
    )
    dfs = sh.groupBy("h").agg(F.count("*").alias("df"))
    docs = (
        sh.join(dfs, "h")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df", "h"))), lambda s: s["h"]
            ).alias("hs"),
            F.count("*").alias("n"),
        )
        .withColumn(
            "plen",
            F.expr(
                f"cast(n - ((n * {PPJOIN_T_NUM} + {PPJOIN_T_DEN} - 1)"
                f" div {PPJOIN_T_DEN}) + 1 as int)"
            ),
        )
    )
    prefix = docs.select(
        "doc_id", "n", F.explode(F.expr("slice(hs, 1, plen)")).alias("h")
    )
    a = prefix.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"), "h")
    b = prefix.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"), "h")
    return (
        a.join(b, "h")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("n_a") * PPJOIN_T_NUM <= F.col("n_b") * PPJOIN_T_DEN)
            & (F.col("n_b") * PPJOIN_T_NUM <= F.col("n_a") * PPJOIN_T_DEN)
        )
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = _session()
    from osm_poi_database_maker_spark.queries import QUERIES

    dirs = {1: src}
    tag = os.path.basename(os.path.normpath(src))  # replicas are per-base-SF
    for n in (4, 16):
        dst = f"/tmp/scale16_growth_{tag}_{n}x"
        if not os.path.isdir(dst):
            print(f"building {n}x growth replica at {dst} ...")
            try:
                build_replica(src, dst, n, "growth")
            except Exception:
                shutil.rmtree(dst, ignore_errors=True)
                raise
        dirs[n] = dst

    rows = []
    for name in CHAIN:
        for n, sf_dir in dirs.items():
            _run(spark, name, sf_dir)  # warm-up
            dt, sw = _run(spark, name, sf_dir)
            out = QUERIES[name](spark, sf_dir).count()
            if name == "doc_minhash_pairs":
                capped, uncapped, saturated = _minhash_bucket_stats(spark, sf_dir)
                extra = (
                    f"cand {capped} (uncapped {uncapped},"
                    f" saturated buckets {saturated})"
                )
                cand = capped
            else:
                cand = _ppjoin_candidates(spark, sf_dir)
                ratio = cand / out if out else float("inf")
                extra = f"cand {cand} (cand/true {ratio:.2f})"
            rows.append((name, n, dt, sw, out, cand, extra))
            print(
                f"{name:20s} {n:3d}x  wall {dt:7.2f}s  shufW"
                f" {sw/1e6:9.2f} MB  out {out:9d}  {extra}"
            )

    print("\n| query | mult | wall s | shuffle-write MB | true pairs |"
          " candidates | note |")
    print("|---|---|---|---|---|---|---|")
    for name, n, dt, sw, out, cand, extra in rows:
        print(
            f"| {name} | {n}x | {dt:.2f} | {sw/1e6:.2f} | {out} | {cand} |"
            f" {extra.split('(')[-1].rstrip(')')} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
