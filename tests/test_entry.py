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


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_on_smoke_sf(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    # schema resolvable and executable; row count non-negative by definition
    assert df.count() >= 0
