"""Round-9 additions: PII-boundary portability, monotone KMV stamp,
composed POI pipeline, streaming heavy hitters."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_pii_boundary_portability(spark, tmp_path):
    """Spark (Java regex) and DuckDB (RE2) must COUNT IDENTICALLY on
    text where a non-ASCII word character abuts a digit — the case
    where \\b diverges (Java: Unicode word char suppresses the
    boundary; RE2: ASCII-only, boundary present). The patterns use
    explicit ASCII boundary classes instead of \\b, so both engines
    treat é/ключ/漢 as boundaries and the planted PII below COUNTS in
    both (r8 advice #2)."""
    d = str(tmp_path / "docs")
    rows = [
        # non-ASCII letters adjacent to every boundary-sensitive pattern
        (1, "café123-45-6789 plain", "en", "a", 1),
        (2, "x 123-45-6789é tail", "en", "a", 1),
        (3, "ключ555-123-4567 cyrillic", "en", "a", 1),
        (4, "漢123.45.67.89字 cjk", "en", "a", 1),
        # ASCII word chars must still SUPPRESS the boundary in both
        (5, "under_123-45-6789 underscore", "en", "b", 1),
        (6, "digits9123-45-6789 run", "en", "b", 1),
        # the documented single-separator adjacency undercount: two
        # SSNs one space apart count as ONE in both engines (the first
        # match's trailing boundary consumes the only separator)
        (7, "123-45-6789 123-45-6789", "en", "c", 1),
        (8, "plain 123-45-6789 ok and 10.0.0.1", "en", "c", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    from osm_poi_database_maker_spark.queries.profiling import (
        ORACLE_PII_SCAN,
        q_doc_pii_scan,
    )

    got = {r["source"]: r.asDict() for r in q_doc_pii_scan(spark, d).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    rel = con.sql(ORACLE_PII_SCAN)
    oracle = {
        row[rel.columns.index("source")]: dict(zip(rel.columns, row))
        for row in rel.fetchall()
    }
    assert got == oracle, f"engines diverge: spark={got} duck={oracle}"
    # the ASCII-boundary semantics: non-ASCII adjacency COUNTS ...
    assert got["a"]["n_ssn"] == 2 and got["a"]["n_phone"] == 1
    assert got["a"]["n_ipv4"] == 1
    # ... ASCII word chars still suppress ...
    assert got["b"]["n_ssn"] == 0 and got["b"]["n_docs_flagged"] == 0
    # ... and single-separator adjacency undercounts deterministically
    assert got["c"]["n_ssn"] == 2  # doc 7 counts 1, doc 8 counts 1


def test_kmv_day_stamp_strictly_monotone_across_batches():
    """The rolling-KMV state op must emit a strictly increasing n_seen
    stamp even after the sketch saturates at K minima, so newest-wins
    selection is deterministic under multi-micro-batch replays (r8
    advice #1). Feed the updater two batches over the SAME day with
    enough users to saturate K long before the second batch."""
    import pandas as pd

    from osm_poi_database_maker_spark.streaming import _kmv_day_update

    class FakeState:
        def __init__(self):
            self._v, self.exists = None, False

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

        def getCurrentWatermarkMs(self):
            return 0

    k = 8
    upd = _kmv_day_update(k)
    state = FakeState()
    b1 = pd.DataFrame({"user_id": list(range(1, 101))})  # saturates K=8
    b2 = pd.DataFrame({"user_id": list(range(1, 51))})  # pure replay, no new minima
    (out1,) = list(upd((7,), [b1], state))
    (out2,) = list(upd((7,), [b2], state))
    n1, n2 = int(out1["n_seen"][0]), int(out2["n_seen"][0])
    assert len(out1["minima"][0]) == k == len(out2["minima"][0])
    assert out1["minima"][0] == out2["minima"][0]  # sketch fixpoint: no new minima
    assert n2 > n1, "stamp must grow on replayed rows even at saturation"
    assert (n1, n2) == (100, 150)


def test_edit_pairs_big_oracle_matches_brute(tmp_path):
    """The SF ≥ 0.1 FastSS-candidate oracle (ORACLE_EDIT_PAIRS_BIG)
    must be byte-identical to the brute O(n²) theta-join oracle — run
    both on the same sf0.01 customer table (r8 verdict "What's wrong"
    #1: the brute form is 143.8 s at sf0.1 and quadratic in SF)."""
    from osm_poi_database_maker_spark.queries.profiling import (
        ORACLE_EDIT_PAIRS,
        ORACLE_EDIT_PAIRS_BIG,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/customer.parquet')"
    )
    brute = sorted(con.sql(ORACLE_EDIT_PAIRS).fetchall())
    fast = sorted(con.sql(ORACLE_EDIT_PAIRS_BIG).fetchall())
    assert brute == fast and brute, f"oracles diverge: {brute} vs {fast}"


def test_mg_shard_update_decrement_path_keeps_superset():
    """The streaming MG updater must exercise the generalized decrement
    (vocabulary ≫ K) and STILL retain every token whose true count
    exceeds N/(K+1) — the superset guarantee mg_finalize relies on —
    across multiple micro-batches, with a strictly monotone stamp."""
    import pandas as pd

    from osm_poi_database_maker_spark.streaming import _mg_shard_update

    class FakeState:
        def __init__(self):
            self._v, self.exists = None, False

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

    k = 8
    upd = _mg_shard_update(k)
    state = FakeState()
    # skewed stream split over 3 micro-batches: 'hot' appears 300×,
    # 'warm' 120×, plus 600 singletons (vocab 602 ≫ K=8)
    batches = []
    for b in range(3):
        toks = ["hot"] * 100 + ["warm"] * 40 + [f"x{b}_{i}" for i in range(200)]
        batches.append(pd.DataFrame({"w": toks}))
    stamps = []
    for b in batches:
        (out,) = list(upd((0,), [b], state))
        stamps.append(int(out["n_seen"][0]))
        assert len(out["tokens"][0]) <= k
    n_total = sum(len(b) for b in batches)  # 1020
    # true heavy set: count*(K+1) > N → hot (300*9=2700>1020), warm (120*9=1080>1020)
    final_tokens = set(out["tokens"][0])
    assert {"hot", "warm"} <= final_tokens, f"superset violated: {final_tokens}"
    assert stamps == sorted(stamps) and len(set(stamps)) == 3
    assert stamps[-1] == n_total


def test_poi_pipeline_full_survivors(spark):
    """The composed EP1 cascade must keep exactly the per-operator
    fixtures' survivors — node/way id 100 both present (disjoint id
    spaces ride the osm_type route), the dup-id node resolved to v2,
    invalid geometry quarantined on both branches."""
    from osm_poi_database_maker_spark.queries.osm import q_osm_poi_pipeline_full

    rows = q_osm_poi_pipeline_full(spark, "/root/testdata/sf0.001").collect()
    nodes = {r["id"] for r in rows if r["osm_type"] == "node"}
    ways = {r["id"] for r in rows if r["osm_type"] == "way"}
    assert nodes == {1, 2, 3, 4, 11, 12, 13, 14, 16, 17, 100}
    assert ways == {100, 101, 106}
    by = {(r["osm_type"], r["id"]): r for r in rows}
    # dup node 16: v2 wins — its COPY line carries version 2 and the v2 name
    line16 = by[("node", 16)]["copy_line"].split("\t")
    assert line16[1] == "2" and "Dup v2" in line16[5]
    # escaping survived the hstore + COPY layers (node 14: backslash, quote)
    assert "\\\\" in by[("node", 14)]["copy_line"]
    # way rows carry ring size + area; node rows carry coords
    assert by[("way", 100)]["n_points"] == 5 and by[("way", 100)]["area_r"] > 0
    assert by[("node", 100)]["lon_r"] == 5.26 and by[("node", 100)]["n_points"] is None


def test_hdr_bucket_boundaries_and_bound(spark):
    """HDR bucket coordinates must agree between the batch form (base-2
    string render) and the streaming form (searchsorted bit_length) at
    the hostile power-of-two boundaries, and the sketch estimate must
    honor the 2^-S relative bound on every quantile row."""
    import numpy as np

    from osm_poi_database_maker_spark.queries.events import (
        _HDR_SUB_BITS,
        hdr_bucketize,
        q_events_hdr_quantiles,
    )

    vals = []
    for k in range(1, 40):
        vals += [2**k - 1, 2**k, 2**k + 1]
    vals = sorted(set(vals))
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    got = {
        r["cents"]: (r["shift"], r["bucket"])
        for r in df.select("cents", *hdr_bucketize(F.col("cents"))).collect()
    }
    powers = np.left_shift(np.int64(1), np.arange(63, dtype=np.int64))
    for v in vals:
        blen = int(np.searchsorted(powers, np.int64(v), side="right"))
        assert blen == v.bit_length()
        shift = max(blen - 1 - _HDR_SUB_BITS, 0)
        assert got[v] == (shift, v >> shift), f"coords diverge at {v}"
        # bucket fits the 6-bit packing the stream state relies on
        assert (v >> shift) < 64
    rows = q_events_hdr_quantiles(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r["within_bound"] for r in rows)
    assert all(r["rel_err"] <= 2.0**-_HDR_SUB_BITS for r in rows)


def test_purged_folds_invariants(spark):
    """Per fold: test+train+purged == N, blocks tile the span without
    overlap, and every fold is usable on the fixture."""
    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.queries.curation import q_events_purged_folds

    sf = "/root/testdata/sf0.001"
    n = load_table(spark, sf, "events").count()
    rows = sorted(
        q_events_purged_folds(spark, sf).collect(), key=lambda r: r["fold"]
    )
    assert len(rows) == 5
    for r in rows:
        assert r["n_test"] + r["n_train"] + r["n_purged"] == n
        assert r["fold_usable"]
    for a, b in zip(rows, rows[1:]):
        assert a["block_hi"] == b["block_lo"]  # contiguous, non-overlapping
    assert sum(r["n_test"] for r in rows) == n  # blocks tile the span


def test_fps_big_oracle_matches_original():
    """The SF ≥ 0.1 incremental-FPS oracle must be byte-identical to
    the original full-pair-table oracle (117 s vs 0.9 s at sf0.1)."""
    from osm_poi_database_maker_spark.queries.similarity import (
        ORACLE_FPS,
        ORACLE_FPS_BIG,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet')"
    )
    orig = con.sql(ORACLE_FPS).fetchall()
    inc = con.sql(ORACLE_FPS_BIG).fetchall()
    assert orig == inc and len(orig) == 8


def test_pcm_resample_exactness_hostile_inputs(spark):
    """The rational resampler must match a pure-python reference on the
    hostile shapes: odd trailing byte (dropped), minimum length n=2,
    and the final-position clamp (pos+1 past the last sample)."""
    from osm_poi_database_maker_spark.multimodal import (
        RESAMPLE_L,
        RESAMPLE_M,
        pcm_resample_stats,
    )

    import struct

    def ref(samples):
        L, M = RESAMPLE_L, RESAMPLE_M
        n = len(samples)
        if n < 2:
            return None
        n_out = ((n - 1) * L) // M + 1
        out = []
        for j in range(n_out):
            pos, fm = (j * M) // L, (j * M) % L
            nxt = samples[min(pos + 1, n - 1)]
            out.append(samples[pos] * (L - fm) + nxt * fm)
        return (n, n_out, sum(out), min(out), max(out))

    cases = {
        1: [32767, -32768],                      # n=2 extremes
        2: [0, 1, 2, 3, 4],                      # odd n: clamp at tail
        3: [-5, 10, -15, 20, -25, 30, -35, 40],  # even n
        4: [100] * 7,                            # constant
    }
    rows = []
    for doc_id, samples in cases.items():
        payload = b"".join(struct.pack("<h", s) for s in samples)
        if doc_id == 2:
            payload += b"\x07"  # trailing odd byte must be dropped
        rows.append((doc_id, bytearray(payload)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in pcm_resample_stats(df).collect()}
    for doc_id, samples in cases.items():
        n, n_out, s, mn, mx = ref(samples)
        r = got[doc_id]
        assert (r["n_in"], r["n_out"], r["out_sum"], r["out_min"], r["out_max"]) == (
            n, n_out, s, mn, mx
        ), f"doc {doc_id}"


def test_ray_cast_concave_polygon(spark):
    """The crossing-number expression must reject points inside the
    BBOX but outside a CONCAVE polygon's notch — the case a bbox-only
    join gets wrong — and accept points in the solid part."""
    from osm_poi_database_maker_spark.queries.osm import _ray_cast_sql

    # L-shaped (concave) ring: unit square minus the top-right quadrant
    ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 0.5), (0.5, 0.5), (0.5, 1.0),
            (0.0, 1.0), (0.0, 0.0)]
    cases = [
        (1, 0.25, 0.25, True),   # solid lower-left
        (2, 0.75, 0.25, True),   # solid lower-right
        (3, 0.25, 0.75, True),   # solid upper-left
        (4, 0.75, 0.75, False),  # the notch: inside bbox, OUTSIDE polygon
        (5, 1.5, 0.5, False),    # outside bbox entirely
    ]
    df = spark.createDataFrame(
        [
            (i, x, y, [{"lon": a, "lat": b} for a, b in ring])
            for (i, x, y, _e) in cases
        ],
        "pid long, pt_lon double, pt_lat double, "
        "ring array<struct<lon: double, lat: double>>",
    )
    got = {
        r["pid"]: r["inside"]
        for r in df.select(
            "pid", F.expr(_ray_cast_sql("ring", "pt_lon", "pt_lat")).alias("inside")
        ).collect()
    }
    assert got == {i: e for (i, _x, _y, e) in cases}
