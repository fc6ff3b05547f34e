"""Fast oracle hygiene: every registered DuckDB oracle must plan
(EXPLAIN) against the smoke fixtures without executing. Catches SQL
syntax/column drift in seconds; value parity is tools/check.py's job."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in _TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return c


def _oracles():
    from osm_poi_database_maker_spark.queries import ORACLES

    return sorted(ORACLES)


@pytest.mark.parametrize("name", _oracles())
def test_oracle_explains(con, name):
    from osm_poi_database_maker_spark.queries import ORACLES

    con.execute(f"EXPLAIN {ORACLES[name]}")


@pytest.mark.parametrize("name", _oracles())
def test_oracle_no_hugeint_output(con, name):
    """DuckDB types integer sum() as HUGEINT (int128); the driver's
    pandas-side canonicalizer renders HUGEINT as float64 and the value
    hash breaks (15.0 vs 15 — the r6 failure class). Binding the oracle
    and checking output types keeps the class unshippable."""
    from osm_poi_database_maker_spark.queries import ORACLES

    rel = con.sql(ORACLES[name])
    huge = [
        c
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in ("HUGEINT", "UHUGEINT")
    ]
    assert not huge, f"oracle {name} emits HUGEINT column(s) {huge}"
