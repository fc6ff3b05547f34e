"""Round-12 additions: aHash int64-overflow loud guard, tie-robust GK
rank-interval gate, OPQ oracle constant interpolation, plus the r12
query additions' pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SF_GATE = "/root/testdata/sf0.01"


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "lineitem", "events", "embeddings", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_image_ahash_oversized_payload_raises(spark):
    """Past the int64-exact bound the cross-multiplied threshold would
    WRAP silently in numpy (the DuckDB side would instead raise on
    BIGINT overflow) — the Spark side must fail loudly too (r11 advice
    #2). In-bound payloads keep hashing."""
    from pyspark.errors.exceptions.captured import PythonException

    from osm_poi_database_maker_spark.multimodal import (
        AHASH_INT64_SAFE_BYTES,
        image_ahash,
    )

    assert 5_000_000 < AHASH_INT64_SAFE_BYTES < 6_000_000  # ~5 MB
    ok = spark.createDataFrame(
        [(1, bytes(range(256)) * 4)], "doc_id long, payload binary"
    )
    assert image_ahash(ok).count() == 1
    big = spark.createDataFrame(
        [(2, b"\xff" * (AHASH_INT64_SAFE_BYTES + 1))],
        "doc_id long, payload binary",
    )
    with pytest.raises(PythonException, match="int64-exact bound"):
        image_ahash(big).collect()


def test_ahash_exact_at_the_int64_bound():
    """The binary-searched bound itself is exact: the worst-case
    compare at AHASH_INT64_SAFE_BYTES fits int64, at +1 it does not."""
    from osm_poi_database_maker_spark.multimodal import (
        AHASH_INT64_SAFE_BYTES,
        _ahash_int64_safe_bytes,
    )

    assert _ahash_int64_safe_bytes() == AHASH_INT64_SAFE_BYTES

    def worst(L, n_cells=64):
        base, rem = divmod(L, n_cells)
        cmax = base + 1 if rem else base
        lhs = n_cells * base * (base + 1) * 255 * cmax
        a_hi = 255 * (base + 1) * rem
        b_lo = 255 * base * (n_cells - rem)
        rhs = cmax * (a_hi * base + b_lo * (base + 1))
        return max(lhs, rhs)

    assert worst(AHASH_INT64_SAFE_BYTES) < 1 << 63
    assert worst(AHASH_INT64_SAFE_BYTES + 1) >= 1 << 63


def test_sketch_rank_gate_tie_robust(spark, tmp_path):
    """A value duplicated across most of a group occupies a rank
    INTERVAL; the old <=-count gate overshoots the target by the tie
    multiplicity and trips spuriously. The interval-intersection gate
    (r11 advice #3) must pass such a fixture."""
    from osm_poi_database_maker_spark.queries.events import (
        q_events_sketch_stats,
    )

    rows = [
        (i, "2024-01-01 00:00:00", i % 7, "tied", 1.0, "{}")
        for i in range(400)
    ] + [(400 + i, "2024-01-01 00:00:00", i, "tied", 2.0, "{}") for i in range(4)]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    (row,) = q_events_sketch_stats(spark, str(tmp_path)).collect()
    # 404 events, 400 of them the same value: count(<= 1.0) = 400 vs
    # target rank 202 ± 1.04 — the old gate fails, the interval gate
    # [count(<)+1, count(<=)] = [1, 400] ∋ 202 passes.
    assert row.p50_within_rank_bound
    assert row.p95_within_rank_bound


def test_opq_oracle_tracks_constants():
    """ORACLE_OPQ_CODES interpolates _OPQ_M/_OPQ_K (r11 advice #4) so a
    constant bump cannot desync the oracle from the Spark side."""
    from osm_poi_database_maker_spark.queries import similarity as s

    assert f"{s._OPQ_M} AS m_sub" in s.ORACLE_OPQ_CODES
    assert f"{s._OPQ_K} AS n_codes" in s.ORACLE_OPQ_CODES


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_GATE])
def test_band_bucket_occupancy_headroom_both_sfs(sf_dir):
    """r11 verdict #4, generalized from the r11 gate-SF-only pin: band
    bucket occupancy asserted at BOTH SFs for every banded LSH join.

    ahash/phash: the exact all-pairs oracles are valid only while no
    bucket reaches the 200 cap (pigeonhole equivalence breaks above
    it) — a fixture regeneration that saturates a bucket must fail
    HERE, loudly, not as a silent gate divergence.

    SRP: the cap is REPLICATED in the oracle (capped CTE), so
    saturation is lossy-but-engine-symmetric by documented design;
    the pin instead bounds HOW saturated (occupancy < 4x cap keeps
    per-bucket candidate recall cap/occ above ~25%), so a fixture
    drift toward one mega-bucket still fails loudly."""
    from osm_poi_database_maker_spark.queries import multimodal as mm
    from osm_poi_database_maker_spark.queries import similarity as sim

    con = _duck(sf_dir)
    checks = (
        ("ahash", mm.ORACLE_AHASH_PAIRS_BIG, "banded", "band, val", 200, 1),
        ("phash", mm.ORACLE_PHASH_PAIRS_BIG, "banded", "band, val", 200, 1),
        ("srp", sim.ORACLE_SRP, "bands", "band, bval",
         sim._SRP_BUCKET_CAP, 4),
    )
    for name, sql, cte, keys, cap, mult in checks:
        occ_sql = (
            sql.split("capped AS")[0]
            + "q AS (SELECT 1)\nSELECT max(c) FROM"
            f" (SELECT {keys}, count(*) AS c FROM {cte} GROUP BY 1, 2)"
        )
        (occ,) = con.execute(occ_sql).fetchone()
        assert occ < cap * mult, (
            f"{name}: occupancy {occ} >= {cap}x{mult} at {sf_dir}"
        )


def test_fertility_semantics(spark):
    """Pieces can never undercount words (every word yields >= 1 piece),
    so fertility >= 1 wherever words exist; byte counts cover pieces."""
    from osm_poi_database_maker_spark.queries.text import (
        q_doc_tokenizer_fertility,
    )

    rows = q_doc_tokenizer_fertility(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_pieces >= r.n_words
        assert r.fertility_r is None or r.fertility_r >= 1.0
        assert r.n_docs > 0


def test_kn_bigram_lm_is_a_proper_smoothing(spark):
    """Kneser-Ney log-probs are log of probabilities < 1 (negative),
    cover the same bigram stream as the MLE scorer (identical
    n_bigrams per doc), and never assign -inf (the discount never
    zeroes a seen bigram because the continuation term is > 0)."""
    from osm_poi_database_maker_spark.queries.text import (
        q_doc_bigram_logprob,
        q_doc_kn_bigram_lm,
    )

    kn = {r.doc_id: r for r in q_doc_kn_bigram_lm(spark, SF_SMOKE).collect()}
    mle = {
        r.doc_id: r for r in q_doc_bigram_logprob(spark, SF_SMOKE).collect()
    }
    assert kn.keys() == mle.keys() and kn
    import math

    for doc_id, r in kn.items():
        assert r.n_bigrams == mle[doc_id].n_bigrams
        assert r.avg_kn_logprob < 0
        assert math.isfinite(r.avg_kn_logprob)


def test_softdedup_weights_semantics(spark):
    """Weights live in (0, 1]; exact duplicates are damped at least by
    their copy count; commonness never falls below 1."""
    from osm_poi_database_maker_spark.queries.dedup import (
        q_doc_softdedup_reweight,
    )

    rows = q_doc_softdedup_reweight(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r.soft_weight_r <= 1.0
        assert r.commonness_r >= 1.0
        if r.n_copies > 1:
            assert r.soft_weight_r <= 1.0 / r.n_copies + 1e-9


def test_manifest_skipping_is_lossless(spark):
    """The pruning decision must be lossless (no match inside a pruned
    shard), the scan must cover every match, and the fixture predicate
    must actually prune (scan fraction strictly < 1)."""
    from osm_poi_database_maker_spark.queries.core import (
        q_lineitem_manifest_skipping,
    )

    (row,) = q_lineitem_manifest_skipping(spark, SF_SMOKE).collect()
    assert row.pruned_no_match
    assert row.rows_scanned >= row.rows_matched
    assert 0 < row.n_pruned < row.n_shards
    assert 0 < row.scan_fraction_r < 1.0
    assert row.rows_total > row.rows_scanned


def test_reservoir_sample_is_partition_stable_bottom_k(spark):
    """The sample is the EXACT bottom-k by Lehmer priority per group —
    recomputed independently here — and every group emits min(k, n)
    rows with contiguous ranks."""
    from osm_poi_database_maker_spark.queries.events import (
        _RES_K,
        q_events_reservoir_sample,
    )
    from osm_poi_database_maker_spark.queries.text import (
        _LEHMER_A,
        _LEHMER_M,
    )
    from osm_poi_database_maker_spark.io import load_table

    got = q_events_reservoir_sample(spark, SF_SMOKE).collect()
    by_type = {}
    for r in got:
        by_type.setdefault(r.event_type, []).append(r)
    all_events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type"
    ).collect()
    want = {}
    for r in all_events:
        h = (r.event_id % _LEHMER_M) * _LEHMER_A % _LEHMER_M * _LEHMER_A % _LEHMER_M
        want.setdefault(r.event_type, []).append((h, r.event_id))
    for etype, expect in want.items():
        expect.sort()
        expect_ids = [eid for _, eid in expect[:_RES_K]]
        rows = sorted(by_type[etype], key=lambda r: r.rk)
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        assert [r.event_id for r in rows] == expect_ids


def test_ppjoin_collapsed_equals_direct(spark):
    """ppjoin_pairs_collapsed must produce the EXACT row set of the
    direct join — on the real fixture and on an adversarial frame of
    verbatim twin clusters, near-dups, and shingle-free short docs."""
    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.queries.dedup import (
        ppjoin_pairs,
        ppjoin_pairs_collapsed,
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    base = " ".join(f"w{i}" for i in range(12))
    near = " ".join(f"w{i}" for i in range(11)) + " zz"  # high overlap
    other = " ".join(f"q{i}" for i in range(12))
    frame = spark.createDataFrame(
        [
            (1, base), (2, base), (3, base),          # twin cluster A
            (4, near),                                 # near-dup of A
            (5, other), (6, other),                    # twin cluster B
            (7, "too short"), (8, "too short"),        # shingle-free twins
            (9, "w0 w1 w2"),                           # minimal 1-shingle doc
        ],
        "doc_id long, text string",
    )
    assert rows(ppjoin_pairs_collapsed(frame)) == rows(ppjoin_pairs(frame))
    got = {(r.doc_a, r.doc_b): r for r in ppjoin_pairs_collapsed(frame).collect()}
    assert got[(1, 2)].jaccard == 1.0 and got[(1, 2)].shared == 10
    assert (7, 8) not in got  # shingle-free twins emit nothing

    d = load_table(spark, SF_SMOKE, "documents")
    assert rows(ppjoin_pairs_collapsed(d)) == rows(ppjoin_pairs(d))
