"""SparkSession factory.

Local test runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
builder config applies minus the master override. All settings here are
scale-first choices:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing),
* shuffle partitions sized to cores locally (cluster deployments override
  via ``spark.sql.shuffle.partitions`` / rely on AQE coalescing),
* Arrow enabled for every pandas-UDF boundary,
* UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "osm_poi_database_maker_spark") -> SparkSession:
    """Build (or reuse) the engine SparkSession."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst=true (the upstream default, restored r14):
        # size-only coalescing (=false) collapsed every byte-small
        # post-shuffle stage to ONE task, serializing the CPU-dense
        # verify stages (levenshtein / array_intersect / percentile
        # verifies are kilobytes of rows but milliseconds of CPU each) —
        # measured interleaved at sf0.1: doc_ppjoin_pairs 5.69→2.24 s,
        # customer_edit_pairs 5.96→4.90 s, no query slower. At cluster
        # scale the setting only floors byte-small shuffles at
        # defaultParallelism tasks; partitions above the advisory size
        # coalesce identically either way.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # prefer shuffled-hash over sort-merge when the planner's size
        # conditions hold, and let AQE rewrite SMJ→SHJ at runtime when
        # every post-shuffle build partition is under 64 MB (guide §3.1;
        # r14 interleaved A/B at sf0.1: every join query faster, e.g.
        # doc_ppjoin_pairs 3.06→2.20 s, brand_supplier_counts
        # 1.61→1.06 s, none slower — the hash build skips both sorts).
        # Sort-merge remains the fallback for build sides above the
        # threshold, so the OOM-safety story at 100 TB is unchanged.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # cost-based optimization consumes ANALYZE TABLE stats (O21) for
        # join reordering / build-side choice; AQE still re-plans from
        # actual runtime sizes on top
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        # runtime row-level filtering: inject a bloom filter built from a
        # selective join's build side into the probe-side scan — at
        # 100 TB this prunes most of a fact scan joined against a
        # filtered dim before the shuffle (tests/test_bloom.py pins the
        # injection; thresholds are Spark defaults, so tiny local
        # fixtures skip it and big cluster inputs get it automatically)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # keep single-JVM metastore noise (derby.log, metastore_db/,
        # spark-warehouse/) out of the repo root — ANALYZE TABLE (O21)
        # spins up the embedded Hive metastore, which otherwise writes
        # its log and warehouse dir into the working directory
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.stream.error.file=/tmp/ospdms_derby.log",
        )
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/ospdms_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
