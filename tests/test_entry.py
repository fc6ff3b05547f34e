"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["event_type", "n_events", "sum_value", "avg_value", "n_users"]


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_sketch_stats_within_tolerance(spark):
    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.queries.events import q_events_sketch_stats

    rows = {r.event_type: r for r in q_events_sketch_stats(spark, SF_SMOKE).collect()}
    e = load_table(spark, SF_SMOKE, "events")
    exact = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for t, a in rows.items():
        x = exact[t]
        # in-band exact columns agree with the independent recompute
        assert a.exact_users == x.users
        assert abs(a.p50_exact - x.p50) < 1e-3
        # every sketch meets its published error contract
        assert a.users_within_bound
        assert a.p50_within_rank_bound and a.p95_within_rank_bound


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_on_smoke_sf(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    # schema resolvable and executable; row count non-negative by definition
    assert df.count() >= 0
