"""Driver-checked streaming queries.

Each runs a real Structured Streaming query (file source → watermarked
stateful op → memory sink, availableNow trigger) to completion and
returns the materialized result. Because the streaming transforms reuse
the batch twins' expressions, the results are oracle-checkable with the
SAME DuckDB SQL — certifying streaming semantics, not just plumbing.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from .. import streaming as S
from .events import ORACLE_HOURLY, ORACLE_SESSION


def _materialize(df: DataFrame, spark: SparkSession, mode: str) -> DataFrame:
    name = f"strq_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def q_stream_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _materialize(S.windowed_counts(S.stream_events(spark, sf_dir)), spark, "complete")


def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _materialize(S.session_counts(S.stream_events(spark, sf_dir)), spark, "complete")


def q_stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _materialize(
        S.stateful_user_counts(S.stream_events(spark, sf_dir)), spark, "update"
    )


def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = S.stream_events(spark, sf_dir)
    deduped = S.dedup_within_watermark(stream.union(stream))
    out = _materialize(deduped, spark, "append")
    return out.select("event_id", "event_type", "user_id")


ORACLE_STATEFUL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
"""

ORACLE_STREAM_DEDUP = """
SELECT event_id, event_type, user_id FROM events
"""

QUERIES = {
    "stream_hourly_window": q_stream_hourly_window,
    "stream_session_windows": q_stream_session_windows,
    "stream_stateful_user_totals": q_stream_stateful_user_totals,
    "stream_dedup_watermark": q_stream_dedup_watermark,
}

ORACLES = {
    "stream_hourly_window": ORACLE_HOURLY,
    "stream_session_windows": ORACLE_SESSION,
    "stream_stateful_user_totals": ORACLE_STATEFUL,
    "stream_dedup_watermark": ORACLE_STREAM_DEDUP,
}
