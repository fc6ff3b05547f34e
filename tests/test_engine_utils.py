"""O15 dim cache, O16 routed sink, O21 catalog statistics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osm_poi_database_maker_spark import osm_fixtures as fx
from osm_poi_database_maker_spark.io import analyze_tables, register_catalog_tables
from osm_poi_database_maker_spark.pipeline import (
    build_toi_dim,
    cache_toi_dim,
    poi_nodes,
    poi_ways,
    route_pois,
)
from osm_poi_database_maker_spark.queries.osm import SETTINGS
from osm_poi_database_maker_spark.sink import write_routed
from tests.conftest import SF_SMOKE


def test_cache_toi_dim_materializes_once(spark, tmp_path):
    path = str(tmp_path / "toi_dim")
    fresh = cache_toi_dim(fx.taginfo_df(spark), SETTINGS, path)
    assert os.path.isdir(path)
    direct = build_toi_dim(fx.taginfo_df(spark), SETTINGS)
    assert sorted(map(tuple, fresh.collect())) == sorted(map(tuple, direct.collect()))
    # second call reads the cache (poison the source to prove it)
    poisoned = fx.taginfo_df(spark).limit(0)
    cached = cache_toi_dim(poisoned, SETTINGS, path)
    assert cached.count() == direct.count()


def test_route_pois_partitioned_write(spark, tmp_path):
    nodes_out = poi_nodes(fx.nodes_df(spark), fx.taginfo_df(spark), SETTINGS)
    ways_out = poi_ways(fx.ways_df(spark), fx.taginfo_df(spark), SETTINGS).select(
        "id", "version", "user_id",
        F.date_format("tstamp", "yyyy-MM-dd HH:mm:ss").alias("tstamp"),
        "changeset_id", "area_m2",
    )
    routed = route_pois(nodes_out, ways_out)
    types = {r.osm_type for r in routed.select("osm_type").distinct().collect()}
    assert types == {"node", "way"}
    out = str(tmp_path / "pois")
    write_routed(routed, out)
    assert os.path.isdir(os.path.join(out, "osm_type=node"))
    assert os.path.isdir(os.path.join(out, "osm_type=way"))
    back = spark.read.parquet(out)
    assert back.count() == routed.count()
    # partition pruning: a single-type read lists only that directory
    plan = back.filter(F.col("osm_type") == "node")._jdf.queryExecution().executedPlan().toString()
    assert "osm_type=node" in plan or back.filter(F.col("osm_type") == "node").count() == nodes_out.count()


def test_observe_progress_counters(spark):
    from pyspark.sql import Observation

    from osm_poi_database_maker_spark.pipeline import dedup_latest

    obs = Observation("o2")
    nodes = fx.nodes_df(spark).observe(
        obs, F.count(F.lit(1)).alias("rows_seen")
    )
    out = dedup_latest(nodes)
    n_out = out.count()
    # the observation saw every input row in the same job — no extra pass
    assert obs.get["rows_seen"] == len(fx.NODES)
    assert n_out == len({r[0] for r in fx.NODES})


def test_taginfo_from_json_reference_shape(spark, tmp_path):
    import json

    from osm_poi_database_maker_spark.io import taginfo_from_json

    tags_json = {
        "retrieval_date": "2026-08-13",
        "data": {
            "amenity": {"cafe": 120000, "bench": 90000},
            "shop": {"bakery": 45000},
        },
    }
    p = tmp_path / "tags.json"
    p.write_text(json.dumps(tags_json))
    rows = sorted(map(tuple, taginfo_from_json(spark, str(p)).collect()))
    assert rows == [
        ("amenity", "bench", 90000),
        ("amenity", "cafe", 120000),
        ("shop", "bakery", 45000),
    ]


def test_dead_letter_csv(spark, tmp_path):
    from osm_poi_database_maker_spark.sink import write_dead_letter

    df = spark.createDataFrame([(1, "bad geom"), (2, "dup id")], "id long, reason string")
    out = str(tmp_path / "dl")
    write_dead_letter(df, out, fmt="csv")
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2
    assert {"id", "reason", "_quarantined_at"} <= set(back.columns)


def test_analyze_tables_records_stats(spark):
    register_catalog_tables(spark, SF_SMOKE, ("orders",))
    stats = analyze_tables(spark, ("orders",))
    blob = stats["orders"].get("Statistics", "")
    assert "rows" in blob  # e.g. "123456 bytes, 1500 rows"
    # Catalyst sees the row count in the optimized plan's stats
    est = (
        spark.table("orders")._jdf.queryExecution().optimizedPlan().stats().rowCount().toString()
    )
    assert est != "None"


def test_taginfo_rest_fetch_roundtrip(spark, tmp_path):
    """Mocked-HTTP TagInfo fetch (reference filter.py:235-247): the
    query contract (rp=100, count_ways desc), the in_wiki / ';' client
    filters, the cache-or-fetch behavior (filter.py:281-299), and the
    round trip cache -> tags.json -> build_toi_dim equal to the
    fixture-built osm_toi_dim."""
    from urllib.parse import parse_qs, urlparse

    from osm_poi_database_maker_spark import osm_fixtures as fx
    from osm_poi_database_maker_spark.io import fetch_taginfo_cache
    from osm_poi_database_maker_spark.pipeline import toi_dim_from_cache
    from osm_poi_database_maker_spark.queries.osm import SETTINGS, q_osm_toi_dim

    calls = []

    def fake_get(url):
        calls.append(url)
        q = parse_qs(urlparse(url).query)
        assert q["rp"] == ["100"] and q["sortname"] == ["count_ways"]
        assert q["sortorder"] == ["desc"] and q["page"] == ["1"]
        key = q["key"][0]
        rows = sorted(
            (r for r in fx.TAGINFO if r[0] == key), key=lambda r: (-r[2], r[1])
        )
        # the API serves the top-100 RAW (in_wiki filtering is client-side)
        return {
            "data": [
                {"value": v, "count": c, "in_wiki": w} for (_, v, c, w) in rows[:100]
            ]
        }

    path = str(tmp_path / "tags.json")
    cache = fetch_taginfo_cache(
        ("amenity", "shop", "tourism"), path, http_get=fake_get, now_iso="2026-08-13T10:00"
    )
    assert len(calls) == 3
    assert cache["retrieval_date"] == "2026-08-13T10:00"
    # client-side filters applied at retrieval: no ';' values, no
    # in_wiki=false values anywhere in the cache
    vals = {v for kv in cache["data"].values() for v in kv}
    assert "bar;pub" not in vals and "nowiki" not in vals
    # cache hit: no further HTTP calls
    again = fetch_taginfo_cache(("amenity",), path, http_get=fake_get)
    assert again == cache and len(calls) == 3
    # round trip equals the fixture-built dimension exactly
    got = sorted(map(tuple, toi_dim_from_cache(spark, path, SETTINGS).collect()))
    want = sorted(map(tuple, q_osm_toi_dim(spark, "x").collect()))
    assert got == want


def test_bigram_pmi_planted_collocation(spark, monkeypatch):
    """A bigram that always co-occurs scores higher PMI than one diluted
    across contexts; counts below the min-count floor are excluded."""
    from osm_poi_database_maker_spark.queries import text as T
    from osm_poi_database_maker_spark.queries.text import (
        _PMI_MIN_COUNT,
        q_doc_bigram_pmi,
    )

    # "new york" appears 5x and "new" never precedes anything else;
    # "the cat" appears 5x but "the" also precedes "dog" 5x
    docs = spark.createDataFrame(
        [
            (1, " ".join(["new york"] * 5), "en", "s", 1),
            (2, " ".join(["the cat"] * 5), "en", "s", 1),
            (3, " ".join(["the dog"] * 5), "en", "s", 1),
            (4, "rare pair", "en", "s", 1),  # count 1 < floor
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(T, "load_table", lambda spark_, sf_, name_: docs)
    got = {(r.w1, r.w2): r for r in q_doc_bigram_pmi(spark, "x").collect()}
    assert ("rare", "pair") not in got
    assert ("new", "york") in got and ("the", "cat") in got
    assert got[("new", "york")].pmi > got[("the", "cat")].pmi
    assert all(r.c12 >= _PMI_MIN_COUNT for r in got.values())


def test_zipf_fit_on_planted_powerlaw(spark, monkeypatch):
    """A corpus built so token k appears floor(100/k) times fits a slope
    near -1 with high r2 (the Zipf shape the operator exists to detect)."""
    from osm_poi_database_maker_spark.queries import text as T
    from osm_poi_database_maker_spark.queries.text import q_doc_zipf_fit

    words = []
    for k in range(1, 21):
        words += [f"w{k:02d}"] * (100 // k)
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(T, "load_table", lambda spark_, sf_, name_: docs)
    r = q_doc_zipf_fit(spark, "x").collect()[0]
    assert r.n_types == 20 and r.n_tokens == sum(100 // k for k in range(1, 21))
    assert -1.2 < r.zipf_slope < -0.8
    assert r.zipf_r2 > 0.95


def test_discount_elasticity_planted(spark, monkeypatch):
    """regr_slope recovers a planted exact linear relationship and its
    perfect fit; a flat brand reports slope 0."""
    from osm_poi_database_maker_spark.queries import core as C

    # brand A: quantity = 10 + 100*discount exactly; brand B: constant
    li_rows = [(1, 10.0 + 100.0 * d, d) for d in (0.0, 0.02, 0.04, 0.06)] + [
        (2, 7.0, d) for d in (0.0, 0.05, 0.1)
    ]
    li = spark.createDataFrame(li_rows, "l_partkey long, l_quantity double, l_discount double")
    part = spark.createDataFrame([(1, "BrandA"), (2, "BrandB")], "p_partkey long, p_brand string")
    monkeypatch.setattr(
        C, "load_table",
        lambda s, sf, n: li if n == "lineitem" else part,
    )
    got = {r.p_brand: r for r in C.q_lineitem_discount_elasticity(spark, "x").collect()}
    assert got["BrandA"].qty_discount_slope == 100.0
    assert got["BrandA"].fit_r2 == 1.0
    assert got["BrandB"].qty_discount_slope == 0.0


def test_backlog_aging_planted(spark, monkeypatch):
    """Only orders with an unshipped line at the cutoff count; fully
    shipped orders drop out; age buckets floor at 30-day widths."""
    import datetime

    from osm_poi_database_maker_spark.queries import core as C

    def d(s):
        return datetime.date.fromisoformat(s)

    # newest order 2024-07-01 -> cutoff 2024-04-02
    orders = spark.createDataFrame(
        [
            (1, d("2024-04-01"), 100.0),   # age 1d  -> bucket 0, open
            (2, d("2024-02-01"), 200.0),   # age 61d -> bucket 2, open
            (3, d("2024-03-01"), 400.0),   # shipped before cutoff: closed
            (4, d("2024-07-01"), 800.0),   # after cutoff: not in backlog
        ],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    )
    li = spark.createDataFrame(
        [
            (1, d("2024-05-01")),   # ships after cutoff -> open
            (2, d("2024-04-03")),   # after cutoff -> open
            (2, d("2024-03-01")),   # one shipped line doesn't close it
            (3, d("2024-03-15")),   # all lines shipped by cutoff
            (4, d("2024-07-02")),
        ],
        "l_orderkey long, l_shipdate date",
    )
    monkeypatch.setattr(
        C, "load_table",
        lambda s, sf, n: orders if n == "orders" else li,
    )
    got = {r.age_bucket: r for r in C.q_orders_backlog_aging(spark, "x").collect()}
    assert set(got) == {0, 2}
    assert (got[0].n_orders, got[0].backlog_value) == (1, 100.0)
    assert (got[2].n_orders, got[2].backlog_value) == (1, 200.0)


def test_promo_share_planted(spark, monkeypatch):
    """Promo share is exactly promo_rev/total_rev per month; a month with
    no promo items reports 0."""
    import datetime

    from osm_poi_database_maker_spark.queries import core as C

    t = datetime.datetime.fromisoformat
    li = spark.createDataFrame(
        [
            (1, t("2024-01-05"), 100.0, 0.0),   # promo
            (2, t("2024-01-20"), 300.0, 0.0),   # standard
            (2, t("2024-02-10"), 50.0, 0.0),    # standard only
        ],
        "l_partkey long, l_shipdate timestamp, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    )
    monkeypatch.setattr(
        C, "load_table", lambda s, sf, n: li if n == "lineitem" else part
    )
    got = {r.ship_month: r for r in C.q_part_promo_share(spark, "x").collect()}
    assert got["2024-01"].promo_share_pct == 25.0
    assert got["2024-01"].total_revenue == 400.0
    assert got["2024-02"].promo_share_pct == 0.0


def test_small_qty_revenue_planted(spark, monkeypatch):
    """Only the target brand's below-half-average lines count; other
    brands never enter the threshold aggregate."""
    from osm_poi_database_maker_spark.queries import core as C

    # brand part 1: quantities 1, 10, 10, 10 -> avg 7.75, half 3.875
    li = spark.createDataFrame(
        [(1, 1.0, 11.0), (1, 10.0, 20.0), (1, 10.0, 30.0), (1, 10.0, 40.0),
         (2, 1.0, 999.0)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, C._SMALL_QTY_BRAND), (2, "Brand#99")], "p_partkey long, p_brand string"
    )
    monkeypatch.setattr(
        C, "load_table", lambda s, sf, n: li if n == "lineitem" else part
    )
    r = C.q_small_qty_revenue(spark, "x").collect()[0]
    assert r.n_small_items == 1
    assert r.small_qty_revenue == 11.0
    assert r.avg_yearly == round(11.0 / 7.0, 2)


def test_large_volume_customers_planted(spark, monkeypatch):
    """Orders straddling the 300-quantity threshold: 301 in, 300 out."""
    import datetime

    from osm_poi_database_maker_spark.queries import core as C

    t = datetime.datetime.fromisoformat
    li = spark.createDataFrame(
        [(1, 301.0), (2, 150.0), (2, 150.0)],
        "l_orderkey long, l_quantity double",
    )
    orders = spark.createDataFrame(
        [(1, 7, t("2024-01-01"), 1000.0), (2, 8, t("2024-02-01"), 2000.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(7, "Alice"), (8, "Bob")], "c_custkey long, c_name string"
    )
    monkeypatch.setattr(
        C, "load_table",
        lambda s, sf, n: {"lineitem": li, "orders": orders, "customer": cust}[n],
    )
    got = C.q_large_volume_customers(spark, "x").collect()
    assert len(got) == 1
    assert (got[0].c_name, got[0].o_orderkey, got[0].total_qty) == ("Alice", 1, 301.0)
    assert got[0].order_date == "2024-01-01"


def test_disjunctive_revenue_planted(spark, monkeypatch):
    """Each OR arm admits its own (brand, size, quantity) conjunction;
    a row failing all three arms contributes nothing."""
    from osm_poi_database_maker_spark.queries import core as C

    li = spark.createDataFrame(
        [(1, 5.0, 100.0, 0.0),    # arm 1: Brand#1 size 3 qty 5
         (2, 15.0, 200.0, 0.5),   # arm 2: Brand#13 size 8 qty 15
         (3, 25.0, 400.0, 0.0),   # arm 3: Brand#23 size 12 qty 25
         (1, 40.0, 999.0, 0.0)],  # qty outside every arm
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#1", 3), (2, "Brand#13", 8), (3, "Brand#23", 12)],
        "p_partkey long, p_brand string, p_size int",
    )
    monkeypatch.setattr(
        C, "load_table", lambda s, sf, n: li if n == "lineitem" else part
    )
    r = C.q_disjunctive_revenue(spark, "x").collect()[0]
    assert r.n_items == 3
    assert r.disc_revenue == 100.0 + 100.0 + 400.0


def test_idle_customer_balance_planted(spark, monkeypatch):
    """Above-average balance + no order after the data-derived cutoff;
    negative balances are excluded from the average."""
    import datetime

    from osm_poi_database_maker_spark.queries import core as C

    t = datetime.datetime.fromisoformat
    # positive balances 100, 300 -> avg 200; customer 3's -50 excluded
    cust = spark.createDataFrame(
        [(1, 0, 100.0), (2, 0, 300.0), (3, 0, -50.0), (4, 1, 300.0)],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    # newest order 2024-12-31 -> cutoff 2023-12-31; cust 2 ordered after it
    orders = spark.createDataFrame(
        [(2, t("2024-12-31")), (4, t("2023-06-01"))],
        "o_custkey long, o_orderdate timestamp",
    )
    nation = spark.createDataFrame(
        [(0, "ALPHA"), (1, "BETA")], "n_nationkey int, n_name string"
    )
    monkeypatch.setattr(
        C, "load_table",
        lambda s, sf, n: {"customer": cust, "orders": orders, "nation": nation}[n],
    )
    got = {r.n_name: r for r in C.q_idle_customer_balance(spark, "x").collect()}
    # cust 2 has a recent order (excluded); cust 1 below avg; cust 4 idle
    assert set(got) == {"BETA"}
    assert (got["BETA"].n_idle_customers, got["BETA"].idle_balance) == (1, 300.0)


def test_ancestor_closure_exact_paths(spark):
    """A planted forest yields exactly the linear-recursion row set:
    every (node, ancestor, dist) triple, across doubling split points."""
    from osm_poi_database_maker_spark.ops.recursion import ancestor_closure

    # chain 9 -> 7 -> 4 -> 1 -> 0 plus a side branch 8 -> 4
    edges = spark.createDataFrame(
        [(9, 7), (7, 4), (4, 1), (1, 0), (8, 4)], "node long, anc long"
    )
    got = {(r.node, r.ancestor, r.dist) for r in ancestor_closure(edges).collect()}
    want = {
        (9, 7, 1), (9, 4, 2), (9, 1, 3), (9, 0, 4),
        (7, 4, 1), (7, 1, 2), (7, 0, 3),
        (4, 1, 1), (4, 0, 2),
        (1, 0, 1),
        (8, 4, 1), (8, 1, 2), (8, 0, 3),
    }
    assert got == want


def test_ancestor_closure_depth_pow2_boundary(spark):
    """Depth exactly 2^max_rounds must complete: convergence detection
    costs one extra no-change round, which the loop now budgets for
    (r6 advice — previously a finished closure still raised)."""
    from osm_poi_database_maker_spark.ops.recursion import ancestor_closure

    # chain of depth 4 = 2^2:  4 -> 3 -> 2 -> 1 -> 0
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(4)], "node long, anc long"
    )
    got = {
        (r.node, r.ancestor, r.dist)
        for r in ancestor_closure(edges, max_rounds=2).collect()
    }
    want = {(n, a, n - a) for n in range(1, 5) for a in range(n)}
    assert got == want


def test_ancestor_closure_cycle_raises(spark):
    """A cycle can never converge; the rounds guard must trip."""
    import pytest

    from osm_poi_database_maker_spark.ops.recursion import ancestor_closure

    edges = spark.createDataFrame([(1, 2), (2, 1)], "node long, anc long")
    with pytest.raises(RuntimeError, match="did not converge"):
        ancestor_closure(edges, max_rounds=3)


def test_min_dist_closure_exact_mins(spark):
    """A planted diamond DAG yields exactly the min-distance closure:
    multi-parent nodes, multiple paths per pair, min() kept per pair."""
    from osm_poi_database_maker_spark.ops.recursion import min_dist_closure

    # 5 -> {4, 3}, 4 -> 2, 3 -> {2, 1}, 2 -> 1
    edges = spark.createDataFrame(
        [(5, 4), (5, 3), (4, 2), (3, 2), (3, 1), (2, 1)], "node long, anc long"
    )
    got = {(r.node, r.ancestor, r.dist) for r in min_dist_closure(edges).collect()}
    want = {
        (5, 4, 1), (5, 3, 1), (5, 2, 2), (5, 1, 2),
        (4, 2, 1), (4, 1, 2),
        (3, 2, 1), (3, 1, 1),
        (2, 1, 1),
    }
    assert got == want


def test_min_dist_closure_cycle_shortest_walks(spark):
    """Cycles are well-defined for the min-dist closure: the doubling
    reaches a true fixpoint of shortest-WALK distances, including
    (n, n, cycle_length) self rows — where the distinct-based
    ancestor_closure diverges on the same input."""
    from osm_poi_database_maker_spark.ops.recursion import min_dist_closure

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "node long, anc long")
    got = {(r.node, r.ancestor, r.dist) for r in min_dist_closure(edges).collect()}
    want = {
        (1, 2, 1), (2, 3, 1), (3, 1, 1),
        (1, 3, 2), (2, 1, 2), (3, 2, 2),
        (1, 1, 3), (2, 2, 3), (3, 3, 3),
    }
    assert got == want
