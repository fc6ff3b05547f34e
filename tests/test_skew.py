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


def test_basket_affinity_hot_order_capped(spark, monkeypatch):
    """One pathological 200-item basket must not go quadratic: the
    per-order item cap keeps the lowest _BASKET_ITEM_CAP part ids, so
    the hot order contributes C(cap,2) pairs, not C(200,2) — and normal
    baskets are untouched."""
    from osm_poi_database_maker_spark.queries import core as C

    rows = [(1, p) for p in range(200)]  # hot order: 200 distinct parts
    rows += [(o, p) for o in (2, 3, 4) for p in (500, 501)]  # normal pairs
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    monkeypatch.setattr(C, "load_table", lambda s, d, n: li)
    monkeypatch.setattr(C, "_BASKET_MIN_PAIRS", 1)
    monkeypatch.setattr(C, "_BASKET_TOP_K", 10**6)  # observe the full pair set

    out = C.q_basket_part_affinity(spark, "x").collect()
    # the normal baskets are untouched by the cap
    assert any(r.part_a == 500 and r.part_b == 501 and r.n_ab == 3 for r in out)
    # the hot basket contributes C(cap,2) pairs among the cap lowest part
    # ids — not C(200,2) = 19900
    cap = C._BASKET_ITEM_CAP
    hot_pairs = [r for r in out if r.part_b < 500]
    assert len(hot_pairs) == cap * (cap - 1) // 2
    assert all(r.part_a < cap and r.part_b < cap for r in hot_pairs)


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's OptimizeSkewedJoin must split a hot key's partition at
    RUNTIME (`skew=true` in the final adaptive SortMergeJoin) — the
    zero-code path that complements ops.skew.salted_join: salting is
    for when the planner can't see the skew (e.g. pre-aggregation),
    AQE handles it after the shuffle writes its map statistics. Thresholds
    are lowered so the fixture-scale hot key qualifies; results must be
    identical to the un-skew-optimized join."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # one hot key (0) carrying 190k rows with an INCOMPRESSIBLE pad
        # (skew detection reads compressed map-output sizes), 200 cold
        # keys with ~50 rows each. The skew read is pinned on the BARE
        # join: a downstream aggregate makes OptimizeSkewedJoin back off
        # (it won't risk changing output partitioning a parent may
        # reuse) — which is itself the documented behavior.
        left = (
            spark.range(200_000)
            .withColumn(
                "k", F.when(F.col("id") < 190_000, F.lit(0)).otherwise(F.col("id") % 200 + 1)
            )
            .withColumn("pad", F.sha2(F.col("id").cast("string"), 256))
        )
        right = spark.range(201).withColumnRenamed("id", "k").withColumn(
            "tag", F.concat(F.lit("t"), F.col("k"))
        )
        joined = left.join(right, "k")
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE never split the hot partition:\n{plan[:500]}"
        assert "AQEShuffleRead skewed" in plan
        # semantic neutrality: every row joined exactly once
        assert len(rows) == 200_000
        from collections import Counter

        per_tag = Counter(r["tag"] for r in rows)
        assert per_tag["t0"] == 190_000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
