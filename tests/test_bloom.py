"""Runtime bloom-filter join pruning: the session enables Spark's
runtime row-level filtering; this pins that a selective dim-filtered
join actually injects a bloom filter into the fact-side scan once the
size thresholds are met (they are sized for clusters, so the test
lowers them rather than relying on fixture sizes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_poi_database_maker_spark.io import load_table
from tests.conftest import SF_SMOKE


def test_bloom_filter_injected_for_selective_join(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10GB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: bloom injection targets non-broadcast
        # joins (a broadcast join already prunes via the hash table)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        l = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan or "BloomFilter" in plan, plan[:2000]
        # and the result is still correct
        assert joined.collect()[0]["n"] > 0
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
