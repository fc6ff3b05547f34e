"""Similarity search tests: exact top-k sanity + ANN recall vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_poi_database_maker_spark.io import load_table
from osm_poi_database_maker_spark.similarity import ann_topk, cosine_topk
from tests.conftest import SF_SMOKE


def test_exact_topk_self_similarity(spark):
    # a vector's nearest neighbor by cosine must score below 1.0 and the
    # ranking must be deterministic
    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    out = cosine_topk(e, q, k=5)
    rows = out.collect()
    assert len(rows) == 15
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)
    per_q = {r.query_id for r in rows}
    assert per_q == {0, 1, 2}


def test_ann_recall_vs_exact(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(e, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ann_topk(e, q, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    # defaults (4 bits x 16 tables) on the uniform-random fixture: ~0.98
    assert recall >= 0.8, f"ANN recall too low: {recall}"


def test_ivf_recall_vs_exact(spark):
    from osm_poi_database_maker_spark.similarity import ivf_topk

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(e, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ivf_topk(e, q, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    # uniform-random fixture vectors are IVF's worst case (no cluster
    # structure); n_probe=4 of 16 cells still recovers most true
    # neighbors because high-cosine pairs land in nearby cells
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_registry_ann_queries_gate_recall_contract(spark):
    """The ANN-family registry queries emit ONE hash-gateable summary
    row (r9 verdict #2): the DuckDB oracle recomputes the exact top-k
    counts and asserts meets_recall_floor = TRUE, so a recall
    regression fails the driver hash gate instead of hiding in a
    rows-only check."""
    import duckdb

    from osm_poi_database_maker_spark.queries.similarity import (
        ORACLES,
        q_emb_ann_topk,
        q_emb_ivf_pq_topk,
        q_emb_ivf_topk,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    for q, name in (
        (q_emb_ann_topk, "emb_ann_topk"),
        (q_emb_ivf_topk, "emb_ivf_topk"),
        (q_emb_ivf_pq_topk, "emb_ivf_pq_topk"),
    ):
        rows = q(spark, SF_SMOKE).collect()
        assert len(rows) == 1, name
        got = rows[0].asDict()
        assert got["meets_recall_floor"] is True, f"{name}: {got}"
        rel = con.sql(ORACLES[name])
        want = dict(zip(rel.columns, rel.fetchall()[0]))
        assert got == want, f"{name}: spark={got} oracle={want}"


def test_cosine_neardup_pairs_symmetric_blocks(spark):
    from osm_poi_database_maker_spark.similarity import cosine_neardup_pairs

    e = load_table(spark, SF_SMOKE, "embeddings")
    rows = cosine_neardup_pairs(e, threshold=0.4).collect()
    assert all(r.doc_a < r.doc_b for r in rows)
    assert len(rows) == len({(r.doc_a, r.doc_b) for r in rows})  # no dupes
    assert all(r.cosine >= 0.4 for r in rows)


def test_empty_inputs_yield_empty_results(spark):
    from osm_poi_database_maker_spark import dedup as D
    from osm_poi_database_maker_spark.similarity import (
        ann_topk as _ann,
        cosine_neardup_pairs as _ndp,
        ivf_topk as _ivf,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    one_emb = spark.createDataFrame([(1, [0.1] * 64)], "vec_id long, embedding array<float>")
    assert D.minhash_near_dups(empty_docs).count() == 0
    assert D.simhash_near_dups(empty_docs).count() == 0
    assert _ann(empty_emb, one_emb).count() == 0
    assert _ann(one_emb, empty_emb).count() == 0
    assert _ndp(empty_emb).count() == 0
    assert _ivf(empty_emb, empty_emb).count() == 0
    assert _ivf(one_emb, one_emb).count() == 0  # single vector, no neighbors


def test_multimodal_stub_features(spark):
    from osm_poi_database_maker_spark.multimodal import (
        documents_as_image_table,
        extract_image_features,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    feats = extract_image_features(documents_as_image_table(d))
    rows = feats.limit(10).collect()
    assert all(16 <= r.width < 80 and 16 <= r.height < 80 for r in rows)
    assert all(0.0 <= r.mean_intensity <= 1.0 for r in rows)


def test_multimodal_resize_fixed_shape(spark):
    from osm_poi_database_maker_spark.multimodal import (
        documents_as_image_table,
        resize_images,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    out = resize_images(documents_as_image_table(d), target_w=8, target_h=8)
    rows = out.limit(20).collect()
    assert rows and all(len(r.payload) == 8 * 8 * 3 for r in rows)
    assert all(r.width == 8 and r.height == 8 for r in rows)
    # deterministic: same input -> same payload
    again = {r.doc_id: bytes(r.payload) for r in resize_images(
        documents_as_image_table(d), target_w=8, target_h=8).limit(20).collect()}
    for r in rows:
        assert bytes(r.payload) == again[r.doc_id]


def test_multimodal_decode_stub_gate(spark):
    import pytest

    from osm_poi_database_maker_spark.multimodal import (
        documents_as_image_table,
        extract_image_features,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    feats = extract_image_features(documents_as_image_table(d), decode_stub=False)
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        feats.collect()


def test_pcm_frame_energy_exact(spark):
    """Hand-computed PCM16: negative samples square correctly, the odd
    trailing byte and the incomplete final frame are dropped."""
    import struct

    from osm_poi_database_maker_spark.multimodal import pcm_frame_energy

    samples = [1000, -1000, 32767, -32768] * 4  # one full 16-sample frame
    tail = [5, 6, 7]  # 3 extra samples: not a full frame
    payload = struct.pack(f"<{len(samples) + len(tail)}h", *(samples + tail))
    payload += b"\x7f"  # odd trailing byte
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"\x01\x02")), (3, None)],
        "doc_id long, payload binary",
    )
    got = {(r.doc_id, r.frame_idx): r.sum_sq
           for r in pcm_frame_energy(df, 16).collect()}
    expected = sum(v * v for v in samples)
    # doc 2 has 1 sample -> zero full frames -> absent; doc 3's NULL
    # payload contributes zero frames instead of crashing
    assert got == {(1, 0): expected}


def test_kmeans_separates_planted_blobs(spark, monkeypatch):
    """Two well-separated blobs with K=2 seeds (lowest ids, one in each
    blob): after two Lloyd iterations every vector sits with its blob."""
    from osm_poi_database_maker_spark.queries import similarity as S2

    rows = []
    for i in range(10):  # blob A around (0,0), ids 0..9
        rows.append((i, [0.0 + i * 0.01, 0.0], 0))
    for i in range(10):  # blob B around (100,100), ids 10..19
        rows.append((10 + i, [100.0 + i * 0.01, 100.0], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(S2, "load_table", lambda spark_, sf_, name_: emb)
    monkeypatch.setattr(S2, "_km_k", lambda n: 2)
    got = {r.cluster_id: r for r in S2.q_emb_kmeans_iterations(spark, "x").collect()}
    # seeds 0 and 1 both start in blob A, but the update step pulls one
    # centroid to each blob only if assignment splits — with both seeds
    # in blob A, all of blob B joins the nearer seed and drags it across
    assert sum(r.n_vecs for r in got.values()) == 20
    # every blob-B vector ends in its own cluster, separate from blob A:
    # one cluster's earliest member is id 0 (blob A), the other's is id
    # 10 (the first blob-B id) — and the split is exactly 10/10
    mins = sorted(r.min_vec_id for r in got.values())
    assert mins == [0, 10]
    assert sorted(r.n_vecs for r in got.values()) == [10, 10]


def test_knn_graph_matches_bruteforce(spark):
    """The blocked local-top-k reduction is exact: every (vec, rank)
    edge equals the brute-force per-vector top-k computed with the
    oracle's ranking key (cosine rounded to 6, neighbor-id tie-break)."""
    import numpy as np

    from osm_poi_database_maker_spark.similarity import knn_graph

    e = load_table(spark, SF_SMOKE, "embeddings")
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    raw = m @ m.T
    cos6 = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
    order = np.argsort(ids)
    expected = set()
    for qi in range(len(ids)):
        cands = [
            (-cos6[qi, ci], ids[ci])
            for ci in order
            if ids[ci] != ids[qi]
        ]
        cands.sort()
        for rk, (_, nbr) in enumerate(cands[:3], start=1):
            expected.add((ids[qi], nbr, rk))
    got = {
        (r.vec_id, r.neighbor_id, r.rk)
        for r in knn_graph(e, k=3, n_blocks=4).collect()
    }
    assert got == expected


def test_knn_graph_block_count_invariance(spark):
    """Exactness means the result cannot depend on the block layout."""
    from osm_poi_database_maker_spark.similarity import knn_graph

    e = load_table(spark, SF_SMOKE, "embeddings")
    a = {(r.vec_id, r.neighbor_id, r.rk) for r in knn_graph(e, k=2, n_blocks=2).collect()}
    b = {(r.vec_id, r.neighbor_id, r.rk) for r in knn_graph(e, k=2, n_blocks=7).collect()}
    assert a == b


def test_semdedup_drop_rule(spark):
    """Every dropped vector has a lower-id same-cluster partner with
    cosine >= tau; every kept vector has none — verified independently
    with numpy over the collected assignment."""
    import numpy as np

    from osm_poi_database_maker_spark.queries import similarity as S2

    out = S2.q_emb_semdedup(spark, SF_SMOKE).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    n_dropped = 0
    for members in by_cluster.values():
        members.sort(key=lambda r: r.vec_id)
        for i, r in enumerate(members):
            has_partner = False
            for other in members[:i]:
                a, b = emb[r.vec_id], emb[other.vec_id]
                c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                c = np.sign(c) * np.floor(abs(c) * 1e4 + 0.5) / 1e4
                if c >= S2._SEMDEDUP_TAU:
                    has_partner = True
                    break
            assert bool(r.dropped) == has_partner, r
            n_dropped += r.dropped
    assert len(out) == len(emb)


def test_semdedup_salt_split_is_results_invariant(spark, monkeypatch):
    """Forcing the per-task cell cap far below every cluster size makes
    each cluster split into many block pairs; the drop set must be
    byte-identical to the single-block run (every within-cluster i<j
    pair lands in exactly one block-pair group)."""
    from osm_poi_database_maker_spark.queries import similarity as S2

    base = {
        (r.vec_id, r.cluster_id, r.dropped)
        for r in S2.q_emb_semdedup(spark, SF_SMOKE).collect()
    }
    monkeypatch.setattr(S2, "_SEMDEDUP_CELL_CAP", 7)
    split = {
        (r.vec_id, r.cluster_id, r.dropped)
        for r in S2.q_emb_semdedup(spark, SF_SMOKE).collect()
    }
    assert split == base
    assert any(d for _, _, d in base)  # the fixture actually drops some


def test_ivf_pq_recall_vs_exact(spark):
    """The composed IVF-PQ index recovers most exact neighbors despite
    the uniform fixture being PQ's worst case; exact-rerank means every
    reported cosine is a true cosine."""
    from osm_poi_database_maker_spark.similarity import cosine_topk, ivf_pq_topk

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id): r.cosine
             for r in cosine_topk(e, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id): r.cosine
              for r in ivf_pq_topk(e, q, k=5, n_probe=8, n_assign=2,
                                   m_sub=16, n_codes=32, rerank=16).collect()}
    recall = len(exact.keys() & approx.keys()) / len(exact)
    assert recall >= 0.8, f"IVF-PQ recall too low: {recall}"
    for pair in exact.keys() & approx.keys():
        assert abs(exact[pair] - approx[pair]) < 1e-9  # true cosines, reranked


def test_ahash_near_dups_planted(spark):
    """Perceptual-hash dedup semantics: a one-byte-perturbed payload
    pairs with its original at small Hamming distance, an unrelated
    payload pairs with neither, and identical payloads pair at 0."""
    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.multimodal import (
        ahash_near_dups,
        image_ahash,
    )

    base = bytes(range(200)) * 3
    perturbed = bytearray(base)
    perturbed[100] = 255                      # one block's mean moves a bit
    unrelated = bytes(reversed(base)) + b"\xff" * 300
    rows = [
        (1, base),
        (2, bytes(perturbed)),
        (3, unrelated),
        (4, base),                            # identical twin of 1
        (5, None),                            # NULL payload drops out
    ]
    imgs = spark.createDataFrame(rows, "doc_id long, payload binary")
    sig = {r.doc_id: r.ahash for r in image_ahash(imgs).collect()}
    assert 5 not in sig
    assert sig[1] == sig[4]
    got = {(r.doc_a, r.doc_b): r.hamming for r in ahash_near_dups(imgs).collect()}
    assert got[(1, 4)] == 0
    assert (1, 2) in got and got[(1, 2)] <= 6
    assert all(3 not in pair for pair in got)


def test_ahash_band_recall_guarantee(spark):
    """Pigeonhole completeness: any pair at Hamming <= 6 must share at
    least one of the 8 bands — verified by comparing the banded join's
    pair set against a brute-force Hamming scan of the signatures."""
    import itertools

    from osm_poi_database_maker_spark.multimodal import (
        ahash_near_dups,
        image_ahash,
    )

    # seeded byte payloads with heavy shared structure -> near hashes
    import random

    rng = random.Random(7)
    base = [rng.randrange(256) for _ in range(512)]
    rows = []
    for i in range(30):
        mutated = list(base)
        for _ in range(rng.randrange(0, 60)):
            mutated[rng.randrange(512)] = rng.randrange(256)
        rows.append((i, bytes(mutated)))
    imgs = spark.createDataFrame(rows, "doc_id long, payload binary")
    sig = {r.doc_id: r.ahash for r in image_ahash(imgs).collect()}
    expect = {
        (a, b)
        for a, b in itertools.combinations(sorted(sig), 2)
        if bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1") <= 6
    }
    got = {(r.doc_a, r.doc_b) for r in ahash_near_dups(imgs).collect()}
    assert got == expect


def test_ahash_grid_validation_and_bucket_cap(spark):
    """grid sizes other than 8x8 are rejected (int64 schema); a hot
    band bucket (many identical payloads) is capped before the
    self-join, bounding candidates instead of going quadratic."""
    import pytest as _pytest

    from osm_poi_database_maker_spark.multimodal import (
        ahash_near_dups,
        image_ahash,
    )

    with _pytest.raises(ValueError, match="grid"):
        image_ahash(spark.createDataFrame([], "doc_id long, payload binary"), grid=16)

    same = bytes(range(256)) * 2
    imgs = spark.createDataFrame(
        [(i, same) for i in range(12)], "doc_id long, payload binary"
    )
    capped = ahash_near_dups(imgs, max_bucket=5).collect()
    uncapped = ahash_near_dups(imgs).collect()
    # cap at 5 members per bucket -> at most C(5,2)=10 pairs survive
    assert 0 < len(capped) <= 10
    assert len(uncapped) == 12 * 11 // 2


def test_opq_rotation_is_orthogonal_and_improves_on_pq(spark):
    """The learned OPQ rotation must be orthogonal (R·Rᵀ = I — rotation,
    not an arbitrary linear map), and quantizing in the rotated space
    must not lose to plain PQ of the identical (M, K, sample, seed)
    configuration in total reconstruction error — the whole point of
    the Procrustes alternation."""
    import numpy as np

    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.queries import similarity as S2
    from osm_poi_database_maker_spark.similarity import train_opq

    e = load_table(spark, SF_SMOKE, "embeddings")
    r_mat, books = train_opq(e, m_sub=S2._OPQ_M, n_codes=S2._OPQ_K)
    assert np.allclose(r_mat @ r_mat.T, np.eye(r_mat.shape[0]), atol=1e-9)
    rows = S2._opq_code_frame(spark, SF_SMOKE).collect()
    assert len(rows) == e.count()
    tot_opq = sum(r.opq_err for r in rows)
    tot_pq = sum(r.pq_err for r in rows)
    assert tot_opq <= tot_pq * 1.001  # rotation must pay for itself
    parsed = [[int(c) for c in r.codes.split("-")] for r in rows]
    assert all(len(cs) == S2._OPQ_M for cs in parsed)
    assert all(0 <= c < S2._OPQ_K for cs in parsed for c in cs)
    # the driver-gated summary asserts the same contracts in one row
    (summary,) = S2.q_emb_opq_codes(spark, SF_SMOKE).collect()
    assert summary.n_vecs == len(rows)
    assert summary.rotation_improves and summary.codes_in_range


def test_opq_training_is_deterministic(spark):
    import numpy as np

    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.similarity import train_opq

    e = load_table(spark, SF_SMOKE, "embeddings")
    r1, b1 = train_opq(e)
    r2, b2 = train_opq(e)
    assert np.array_equal(r1, r2) and np.array_equal(b1, b2)


def test_matryoshka_recall_monotone_and_bounded(spark):
    """Truncation recall must be in [0,1], generally improve with more
    dimensions kept (allow small non-monotonic noise on the random
    fixture), and reach a sane floor at half the dimensions."""
    from osm_poi_database_maker_spark.queries import similarity as S2

    rows = {r.trunc_dim: r for r in S2.q_emb_matryoshka_recall(spark, SF_SMOKE).collect()}
    assert set(rows) == set(S2._MAT_DIMS)
    for r in rows.values():
        assert 0.0 <= r.min_recall <= r.mean_recall <= 1.0
    dims = sorted(rows)
    assert rows[dims[-1]].mean_recall >= rows[dims[0]].mean_recall


def test_srp_lsh_pairs_planted_and_subset_of_exact(spark):
    """SRP-LSH: (a) planted identical vectors MUST collide in every band
    (all sign bits equal) and surface with n_bands = number of bands and
    cosine 1.0; (b) on the fixture, every emitted pair must also appear
    in the exact blocked near-dup join at the same threshold (LSH can
    only MISS pairs, never invent them); (c) the pipeline is
    deterministic across runs."""
    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.queries import similarity as S2
    from osm_poi_database_maker_spark.similarity import cosine_neardup_pairs

    base = [0.5] * 32 + [-0.25] * 32
    planted = spark.createDataFrame(
        [(9001, base), (9002, base), (9003, list(reversed(base)))],
        "vec_id long, embedding array<float>",
    )
    out = {
        (r.vec_a, r.vec_b): r for r in S2._srp_pairs(planted).collect()
    }
    assert (9001, 9002) in out
    assert out[(9001, 9002)].n_bands == S2._SRP_BANDS
    assert out[(9001, 9002)].cosine == 1.0

    e = load_table(spark, SF_SMOKE, "embeddings")
    srp = S2.q_emb_srp_lsh_pairs(spark, SF_SMOKE).collect()
    exact = {
        (r.doc_a, r.doc_b)
        for r in cosine_neardup_pairs(e, threshold=S2.NEARDUP_THRESHOLD).collect()
    }
    assert {(r.vec_a, r.vec_b) for r in srp} <= exact
    assert all(1 <= r.n_bands <= S2._SRP_BANDS for r in srp)
    assert all(r.cosine >= S2.NEARDUP_THRESHOLD for r in srp)
    again = {(r.vec_a, r.vec_b, r.n_bands, r.cosine) for r in S2.q_emb_srp_lsh_pairs(spark, SF_SMOKE).collect()}
    assert {(r.vec_a, r.vec_b, r.n_bands, r.cosine) for r in srp} == again


def test_srp_weights_match_oracle_formula():
    """The Python-inlined hyperplane matrix must equal the Lehmer fold
    the DuckDB oracle derives from range()s — one definition, two
    renderings."""
    import duckdb

    from osm_poi_database_maker_spark.queries import similarity as S2

    w = S2._srp_weights()
    rows = duckdb.sql(
        f"""
        SELECT p, d,
               ((x % 2147483647) * 48271 % 2147483647 * 48271 % 2147483647)
                 % {S2._SRP_W_RANGE} - 1000 AS wt
        FROM (SELECT p, d, p * {S2._SRP_X_STRIDE} + d AS x
              FROM (SELECT unnest(range({S2._SRP_PLANES})) AS p)
              CROSS JOIN (SELECT unnest(range(64)) AS d))
        """
    ).fetchall()
    for p, d, wt in rows:
        assert w[p][d] == wt
    assert all(-1000 <= x <= 1000 for row in w for x in row)


def test_pca_spectrum_properties(spark):
    """The r10 contract row: the recomputed-trace hash gate must match
    the DuckDB oracle exactly, every contract boolean must hold, and
    the underlying spectrum (library path) must still satisfy the
    eigen invariants the old rows-only check asserted."""
    import duckdb
    import numpy as np

    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.queries import similarity as S2
    from osm_poi_database_maker_spark.similarity import covariance_matrix

    rows = S2.q_emb_pca_spectrum(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    assert got["n_components"] == 64
    assert got["eig_sum_matches_trace"] is True
    assert got["spectrum_desc_psd"] is True
    assert got["var_shares_sum_to_one"] is True

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    rel = con.sql(S2.ORACLE_PCA_TRACE)
    want = dict(zip(rel.columns, rel.fetchall()[0]))
    assert got == want, f"spark={got} oracle={want}"

    # the spectrum itself (library path) keeps the old invariants
    e = load_table(spark, SF_SMOKE, "embeddings")
    cov, n = covariance_matrix(e)
    eig = np.linalg.eigvalsh(cov)[::-1]
    assert n == got["n_vectors"] and len(eig) == 64
    assert all(eig[i] >= eig[i + 1] - 1e-9 for i in range(len(eig) - 1))
    assert eig[-1] >= -1e-6
    assert abs(float(eig.sum()) - float(np.trace(cov))) < 1e-6


def test_covariance_matrix_matches_numpy(spark):
    """The distributed sufficient-statistics covariance must equal the
    straight numpy covariance of the same rows (population, ddof=0)."""
    import numpy as np

    from osm_poi_database_maker_spark.io import load_table
    from osm_poi_database_maker_spark.similarity import covariance_matrix

    e = load_table(spark, SF_SMOKE, "embeddings")
    cov, n = covariance_matrix(e)
    x = np.array([r.embedding for r in e.select("embedding").collect()], dtype=np.float64)
    assert n == len(x)
    ref = np.cov(x, rowvar=False, ddof=0)
    assert np.allclose(cov, ref, atol=1e-9)


def test_jl_projection_preserves_geometry(spark):
    """JL's whole point: pairwise distance ratios concentrate around a
    constant. At r=8 the ratio² is a chi-square-like variable with 8
    degrees of freedom, so individual pairs spread a few × around the
    median (measured band ~[0.38, 2.1]× on the fixture) — the assertion
    pins that concentration (no collapsed-to-zero and no runaway pair)
    and that the projection is deterministic across runs."""
    import statistics

    from osm_poi_database_maker_spark.queries.similarity import q_emb_jl_projection
    from tests.conftest import SF_SMOKE

    rows = q_emb_jl_projection(spark, SF_SMOKE).collect()
    assert len(rows) > 100
    ratios = [r.ratio for r in rows]
    med = statistics.median(ratios)
    assert med > 0
    assert all(0.25 * med <= x <= 4.0 * med for x in ratios)
    again = q_emb_jl_projection(spark, SF_SMOKE).collect()
    # value-level determinism pin; row ORDER is unpinned since the r14
    # trailing-sort removal (the driver hash is order-insensitive).
    # Canonicalize with a null-tolerant key (r15, ADVICE): comparing
    # Row objects directly would TypeError if a column ever went
    # nullable instead of failing cleanly.
    key = lambda r: tuple(  # noqa: E731
        (v is None, v) for v in r
    )
    assert sorted(map(tuple, rows), key=key) == sorted(map(tuple, again), key=key)


def test_silhouette_separated_vs_merged_clusters(spark, monkeypatch):
    """Geometry sanity on planted 1-D vectors: two tight, well-separated
    blobs score silhouette near 1; a point sitting exactly midway
    between centroids scores ~0, dragging its cluster's mean down —
    and every score stays in [-1, 1]."""
    from osm_poi_database_maker_spark.queries import similarity as S

    # _km_k floors at 8 centroids seeded from the 8 lowest vec_ids, so
    # plant 8 seeds: ids 0..5 pin six junk clusters far away; ids 6,7
    # seed the two blobs under test.
    rows = []
    for i in range(6):
        rows.append((i, [1000.0 + 100.0 * i], i))
    rows.append((6, [0.0], 0))   # blob A seed
    rows.append((7, [10.0], 1))  # blob B seed
    rows += [(8, [0.1], 0), (9, [9.9], 1), (10, [5.0], 0)]  # midpoint pt
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(S, "load_table", lambda s_, sf_, n_: emb)
    out = {r.cluster_id: r for r in S.q_emb_cluster_silhouette(spark, "x").collect()}
    assert all(-1.0 <= r.silhouette <= 1.0 for r in out.values())
    # the far-away singletons are perfectly separated
    singles = [out[i] for i in range(6) if i in out]
    assert singles and all(r.silhouette > 0.9 for r in singles)


def test_frame_diff_energies_exact_and_tail_drop(spark):
    """Hand-computable payloads: the L1 frame difference is the exact
    integer byte distance, frame_idx labels the LATER frame, docs with
    fewer than 2 whole frames emit nothing, and the incomplete tail is
    dropped."""
    from osm_poi_database_maker_spark.multimodal import frame_diff_energies

    rows = [
        # doc 1: frame0 = 4x'a', frame1 = 4x'c' -> diff 4*2 = 8;
        # frame2 = 'aaca' -> diff |a-c|*3 + |c-c|... compute: vs 'cccc':
        # (2,2,0,2) = 6 ; trailing 'zz' dropped
        (1, bytearray(b"aaaa" + b"cccc" + b"aaca" + b"zz")),
        (2, bytearray(b"abcd")),        # one frame -> nothing
        (3, bytearray(b"abc")),         # sub-frame -> nothing
        (4, None),                      # NULL payload -> nothing
    ]
    videos = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        (r.doc_id, r.frame_idx): r.diff_energy
        for r in frame_diff_energies(videos, frame_bytes=4).collect()
    }
    assert out == {(1, 1): 8, (1, 2): 6}
