"""r10 verdict #6: 16× constant-density stress of the dedup→curation
flagship chain (doc_minhash_pairs → doc_dedup_clusters →
doc_curation_pipeline) and emb_ivf_topk, recording WALL TIME, OUTPUT
ROWS, TOTAL SHUFFLE WRITE BYTES (Spark UI REST, per-run stage delta)
and CANDIDATE VOLUME (recomposed from the library's own staging) at
1×/4×/16×.

4× separates linear from quadratic; 16× separates linear from n·log n
and exercises the bucket caps under real saturation. Constant density
(replica tokens suffixed, embeddings perturbed) isolates data-volume
scaling from duplicate-mass scaling — the `growth` mode measurements
live in SCALE.md §r8/§r10.

Usage: python tools/scale16_r11.py [sf_dir]   (default /root/testdata/sf0.1)
Appends nothing; prints the SCALE.md §16x table body to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scale_experiment import build_replica  # noqa: E402  (same tools dir)

CHAIN = [
    "doc_minhash_pairs",
    "doc_dedup_clusters",
    "doc_curation_pipeline",
    "emb_ivf_topk",
]


def _session():
    """get_spark config + UI enabled (REST is the shuffle-metrics tap)."""
    from osm_poi_database_maker_spark.session import get_spark

    os.environ["SPARK_GRAFT_UI"] = "1"
    spark = get_spark("scale16-r11")
    if spark.sparkContext.uiWebUrl is None:
        # session factory pinned ui off: rebuild one session with UI on
        spark.stop()
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("scale16-r11")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.ui.enabled", "true")
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
            .getOrCreate()
        )
    return spark


def _stages(spark):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        return json.load(r)


def _run(spark, name, sf_dir):
    """One timed noop-write run; returns (seconds, shuffle_write_bytes)."""
    from osm_poi_database_maker_spark.queries import QUERIES

    before = {(s["stageId"], s["attemptId"]) for s in _stages(spark)}
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    sw = sum(
        s.get("shuffleWriteBytes", 0)
        for s in _stages(spark)
        if (s["stageId"], s["attemptId"]) not in before
    )
    return dt, sw


def _minhash_candidates(spark, sf_dir) -> int:
    """Capped band-bucket candidate-pair volume: Σ C(min(c,200), 2) over
    (band, bucket) — the exact pre-verify join size of minhash_near_dups."""
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
        .agg(F.least(F.count("*"), F.lit(200)).alias("c"))
    )
    row = occ.agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("cand")).collect()[0]
    return int(row.cand or 0)


def _ivf_candidates(spark, sf_dir) -> int:
    """Pre-rerank candidate rows of emb_ivf_topk's (probe=8, assign=2)
    configuration: the (cell-join ∧ id≠) row count before dedup."""
    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.queries.similarity import N_RECALL_QUERIES
    from osm_poi_database_maker_spark.similarity import (
        topcells_udf,
        train_ivf_centroids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_RECALL_QUERIES)
    cents = train_ivf_centroids(e, 16)
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.explode(topcells_udf(cents, 2)(F.col("embedding"))).alias("cell"),
    )
    qq = q.select(
        F.col("vec_id").alias("query_id"),
        F.explode(topcells_udf(cents, 8)(F.col("embedding"))).alias("cell"),
    )
    return (
        c.join(F.broadcast(qq), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .count()
    )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = _session()
    from osm_poi_database_maker_spark.queries import QUERIES

    dirs = {1: src}
    for n in (4, 16):
        dst = f"/tmp/scale16_const_{n}x"
        if not os.path.isdir(dst):
            print(f"building {n}x constant-density replica at {dst} ...")
            try:
                build_replica(src, dst, n, "constant")
            except Exception:
                shutil.rmtree(dst, ignore_errors=True)
                raise
        dirs[n] = dst

    rows = []
    for name in CHAIN:
        for n, sf_dir in dirs.items():
            _run(spark, name, sf_dir)  # warm-up (cold JIT/IO excluded)
            dt, sw = _run(spark, name, sf_dir)
            out = QUERIES[name](spark, sf_dir).count()
            cand = (
                _minhash_candidates(spark, sf_dir)
                if name == "doc_minhash_pairs"
                else _ivf_candidates(spark, sf_dir)
                if name == "emb_ivf_topk"
                else None
            )
            rows.append((name, n, dt, sw, out, cand))
            print(
                f"{name:24s} {n:3d}x  wall {dt:7.2f}s  shufW "
                f"{sw/1e6:9.2f} MB  out {out:9d}  cand {cand}"
            )

    print("\n| query | SF mult | wall s | shuffle-write MB | out rows | candidates |")
    print("|---|---|---|---|---|---|")
    for name, n, dt, sw, out, cand in rows:
        print(
            f"| {name} | {n}x | {dt:.2f} | {sw/1e6:.2f} | {out} |"
            f" {cand if cand is not None else '—'} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
