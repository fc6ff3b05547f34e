"""Query registry: every operator exposed through the driver contract.

Each submodule defines ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → equivalent DuckDB SQL). Conventions that
keep the driver's order-insensitive value-hash stable across engines:

* alias every computed column identically in Spark and SQL;
* round double aggregates (``F.round(...)`` / ``round(...)``) so
  partial-aggregation order can't flip low bits;
* cast timestamps to formatted strings at the output boundary;
* break every top-k / row_number tie with a deterministic key.
"""

from __future__ import annotations

from . import core, dedup, events, multimodal, osm, similarity, streaming_queries, text

_MODULES = (core, events, text, dedup, similarity, osm, multimodal, streaming_queries)

QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(getattr(_m, "ORACLES", {}))
