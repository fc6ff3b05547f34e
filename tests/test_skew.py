"""Salted join correctness + bucketed-join shuffle elimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_poi_database_maker_spark.ops.skew import salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (id 7: 5000 rows) + a long tail
    hot = spark.range(5000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    tail = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("payload"))
    skewed = hot.unionByName(tail)
    dim = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label"))

    plain = skewed.join(dim, "k").select("k", "payload", "label")
    salted = salted_join(skewed, dim, "k").select("k", "payload", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # the salt actually spreads the hot key across reducers
    n_salts = (
        skewed.withColumn(
            "s", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(16))
        )
        .filter(F.col("k") == 7)
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts > 8


def test_salted_join_rejects_outer_shapes(spark):
    import pytest

    df = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(df, df, "k", how=how)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("x"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 5).alias("y"))
    write_bucketed(a, "bkt_a", "k", n_buckets=8, path=str(tmp_path / "a"))
    write_bucketed(b, "bkt_b", "k", n_buckets=8, path=str(tmp_path / "b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path so the assertion targets the shuffle,
        # not a broadcast of the (test-sized) table
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
