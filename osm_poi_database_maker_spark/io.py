"""Fixture loaders / table registry.

The driver materializes a TPC-H-ish star schema plus ``events``,
``documents`` and ``embeddings`` parquet tables under
``/root/testdata/sf{0.001,0.01,0.1}`` (see ``TESTDATA.md``). Everything in
the engine reads through :func:`load_tables` so the same code serves local
fixtures and a production lakehouse path.

Scale note: each table is a plain ``spark.read.parquet`` — Catalyst handles
column pruning and predicate pushdown into the scan; at cluster scale the
paths would be partitioned directories and the loaders are unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The events fixture stores ts as parquet TIMESTAMP(NANOS), which the
    # Spark reader rejects outright; read it as raw nanos and truncate to
    # microsecond timestamps (same truncation DuckDB applies on read).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
