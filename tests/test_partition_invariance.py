"""Partition-count invariance: registered query results must not depend
on spark.sql.shuffle.partitions.

The driver's value-hash gate compares Spark against DuckDB at ONE
partitioning; these pins prove the Spark side is stable across
partitionings — the execution-layer property that makes the gate
meaningful at any cluster size. The sample is chosen adversarially:
queries whose aggregates involve floating point (log-ratio averages,
percentile interpolation, covariance passes), where partial-aggregation
ORDER is exactly what varies with the partition count. The repo's
rounding discipline (round at the output boundary, exact-integer
sufficient statistics where possible) is what's being certified.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# float-aggregation-heavy representatives + one window/rank query
_SAMPLE = [
    "doc_dsir_importance",      # per-doc avg of log ratios
    "events_sketch_stats",      # percentile interpolation + HLL contract
    "doc_bigram_logprob",       # avg(ln) per doc
    "emb_whitening_audit",      # two covariance sufficient-stat passes
    "lineitem_hist_quantiles",  # histogram + nearest-rank quantiles
    "doc_sentence_dedup",       # window rank over a string-keyed shuffle
    # r12 additions with float partial-aggregation or global rank
    "doc_kn_bigram_lm",         # avg(ln) of a 3-table smoothed ratio
    "emb_zscore_ood",           # stats collect + TakeOrdered top-k
    "doc_softdedup_reweight",   # per-doc avg(df) into a log-damped ratio
    "events_reservoir_sample",  # WindowGroupLimit bottom-k per group
]


@pytest.mark.parametrize("name", _SAMPLE)
def test_result_invariant_to_shuffle_partitions(spark, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    key = "spark.sql.shuffle.partitions"
    had = spark.conf.get(key)
    try:
        spark.conf.set(key, "3")
        low = sorted(tuple(r) for r in fn(spark, SF_SMOKE).collect())
        spark.conf.set(key, "32")
        high = sorted(tuple(r) for r in fn(spark, SF_SMOKE).collect())
    finally:
        spark.conf.set(key, had)
    assert low == high and len(low) > 0
