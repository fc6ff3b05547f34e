"""Property-based tests (SURVEY §5.3): hstore escaping round-trips
through a real hstore parser; WKB codecs round-trip bit-exactly."""

from __future__ import annotations

import struct

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from osm_poi_database_maker_spark.geo import wkb_point_hex, wkb_polygon_hex
from osm_poi_database_maker_spark.ops.tags import hstore_literal


def parse_hstore(s: str) -> dict[str, str]:
    """Minimal strict parser of the `"k"=>"v",...` literal grammar
    PostgreSQL accepts (backslash escapes for ``\\`` and ``"``)."""
    if s == "":
        return {}
    out: dict[str, str] = {}
    i = 0

    def read_quoted(i: int) -> tuple[str, int]:
        assert s[i] == '"', s[i:]
        i += 1
        buf: list[str] = []
        while True:
            c = s[i]
            if c == "\\":
                buf.append(s[i + 1])
                i += 2
            elif c == '"':
                return "".join(buf), i + 1
            else:
                buf.append(c)
                i += 1

    while i < len(s):
        k, i = read_quoted(i)
        assert s[i : i + 2] == "=>"
        i += 2
        v, i = read_quoted(i)
        out[k] = v
        if i < len(s):
            assert s[i] == ","
            i += 1
    return out


def _norm(s: str) -> str:
    # the reference's sanitizer maps newline/CR/tab to spaces (lossy by
    # design, filter.py:92-100); everything else must round-trip exactly
    return s.replace("\n", " ").replace("\r", " ").replace("\t", " ")


# keys exclude the normalized whitespace chars so two distinct keys can't
# collide post-normalization; values exercise the full escape surface
_KEY = st.text(
    st.characters(blacklist_characters='\n\r\t', blacklist_categories=("Cs",)),
    min_size=1,
    max_size=12,
)
_VAL = st.text(
    st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=20
)


@settings(max_examples=25, deadline=None)
@given(st.dictionaries(_KEY, _VAL, min_size=0, max_size=6))
def test_hstore_literal_roundtrips_through_parser(spark, tags):
    pairs = []
    for k, v in tags.items():
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs) if pairs else F.create_map().cast("map<string,string>")
    lit = spark.range(1).select(hstore_literal(m).alias("h")).collect()[0].h
    assert parse_hstore(lit) == {_norm(k): _norm(v) for k, v in tags.items()}


_COORD = st.floats(
    min_value=-180.0, max_value=180.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(_COORD, _COORD), min_size=1, max_size=16))
def test_wkb_point_roundtrip_bit_exact(coords):
    lon = pd.Series([c[0] for c in coords])
    lat = pd.Series([c[1] for c in coords])
    hexes = wkb_point_hex.func(lon, lat)
    for (x, y), h in zip(coords, hexes):
        raw = bytes.fromhex(h)
        assert raw[0] == 1 and raw[1:5] == b"\x01\x00\x00\x00"
        dx, dy = struct.unpack("<dd", raw[5:21])
        # bit-exact (covers -0.0, subnormals, ties)
        assert struct.pack("<d", dx) == struct.pack("<d", x)
        assert struct.pack("<d", dy) == struct.pack("<d", y)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(_COORD, _COORD), min_size=3, max_size=8))
def test_wkb_polygon_roundtrip(pts):
    ring = [{"lon": x, "lat": y} for x, y in pts] + [{"lon": pts[0][0], "lat": pts[0][1]}]
    h = wkb_polygon_hex.func(pd.Series([ring]))[0]
    raw = bytes.fromhex(h)
    order, gtype, nrings, npts = struct.unpack("<BIII", raw[:13])
    assert (order, gtype, nrings, npts) == (1, 3, 1, len(ring))
    decoded = [
        struct.unpack("<dd", raw[13 + 16 * i : 29 + 16 * i]) for i in range(npts)
    ]
    assert decoded[0] == decoded[-1]
    for (x, y), (dx, dy) in zip([(p["lon"], p["lat"]) for p in ring], decoded):
        assert struct.pack("<d", dx) == struct.pack("<d", x)
        assert struct.pack("<d", dy) == struct.pack("<d", y)


def test_pack_sequences_invariants(spark):
    """Packing invariants: offsets stay inside the context window, packs
    are monotone within a shard, and cum_before is consistent with the
    running sum of earlier docs in the shard."""
    from osm_poi_database_maker_spark.queries.text import PACK_CTX, q_doc_pack_sequences

    rows = q_doc_pack_sequences(spark, SF_SMOKE).collect()
    assert rows
    by_shard = {}
    for r in rows:
        assert 0 <= r.pack_offset < PACK_CTX
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        cum = 0
        last_pack = 0
        for r in shard_rows:
            assert r.cum_before == cum
            assert r.pack_id >= last_pack
            cum += r.n_tokens
            last_pack = r.pack_id


def test_pii_scrub_plants_and_counts(spark):
    from osm_poi_database_maker_spark.queries.text import q_doc_pii_scrub

    rows = q_doc_pii_scrub(spark, SF_SMOKE).collect()
    assert rows
    # every planted doc carries exactly one email, one ip, one id run
    assert all(r.n_emails == 1 and r.n_ips == 1 and r.n_idnums == 1 for r in rows)
    assert all(len(r.scrubbed_sha) == 64 for r in rows)


@settings(max_examples=20, deadline=None)
@given(
    st.binary(min_size=0, max_size=200),
    st.integers(min_value=1, max_value=8),
)
def test_pcm_energy_matches_pure_python(spark, payload, frame_samples):
    """pcm_frame_energy == a struct-module reference for arbitrary bytes
    (sign handling, odd tails, incomplete frames)."""
    from osm_poi_database_maker_spark.multimodal import pcm_frame_energy

    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    got = {
        (r.doc_id, r.frame_idx): r.sum_sq
        for r in pcm_frame_energy(df, frame_samples).collect()
    }
    n_samples = len(payload) // 2
    vals = [
        struct.unpack_from("<h", payload, 2 * i)[0] for i in range(n_samples)
    ]
    want = {}
    for f in range(n_samples // frame_samples):
        chunk = vals[f * frame_samples:(f + 1) * frame_samples]
        want[(1, f)] = sum(v * v for v in chunk)
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.binary(min_size=0, max_size=400), min_size=1, max_size=8
    )
)
def test_ahash_matches_pure_python(spark, payloads):
    """image_ahash's vectorized reduceat path must equal an independent
    pure-Python re-derivation (np.array_split boundaries, exact
    cross-multiplied mean threshold for ≥64-byte payloads / float
    threshold below, MSB-first packing) for arbitrary byte payloads."""
    from osm_poi_database_maker_spark.multimodal import image_ahash

    def expected(b: bytes) -> int | None:
        if not b:
            return None
        import numpy as np

        arr = np.frombuffer(b, dtype=np.uint8)
        cells = np.array_split(arr, 64)
        if len(arr) >= 64:
            # exact rational comparison sᵢ/cᵢ > (1/64)·Σⱼ sⱼ/cⱼ with
            # Fraction — fully independent of production's int64
            # cross-multiplication
            from fractions import Fraction

            means = [Fraction(int(c.sum()), len(c)) for c in cells]
            thresh = Fraction(sum(means), 64)
            bits = [m > thresh for m in means]
        else:
            # np.mean over the means, mirroring production's pairwise
            # reduction — a sequential Python sum can differ in the
            # last ulp and flip a threshold-straddling bit
            fmeans = np.array(
                [c.astype(np.float64).mean() if len(c) else 0.0 for c in cells]
            )
            bits = list(fmeans > fmeans.mean())
        h = 0
        for bit in bits:
            h = (h << 1) | int(bit)
        return h - (1 << 64) if h >= 1 << 63 else h

    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.ahash for r in image_ahash(df).collect()}
    want = {i: expected(p) for i, p in rows if p}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_incremental_dedup_containment_bounds(spark, data):
    """hist_overlap is always in [0,1]; an incoming doc whose text IS a
    history doc has exact_dup=1; admit is exactly the documented
    predicate over the emitted columns."""
    from osm_poi_database_maker_spark.queries import dedup as D

    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = data.draw(
        st.lists(
            st.lists(st.sampled_from(vocab), min_size=3, max_size=12).map(
                " ".join
            ),
            min_size=4,
            max_size=10,
        )
    )
    rows = [(i if i % 2 == 0 else i * 10 + 8, t, "en", "s", 1)
            for i, t in enumerate(texts)]
    # ensure at least one exact cross-split duplicate
    rows.append((9998, rows[0][1], "en", "s", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import unittest.mock as mock

    with mock.patch.object(D, "load_table", lambda s, sf, n: docs):
        out = D.q_doc_incremental_dedup(spark, "x").collect()
    assert out
    for r in out:
        assert 0.0 <= r.hist_overlap <= 1.0
        assert r.admit == int(r.exact_dup == 0 and r.hist_overlap < 0.8)
    by_id = {r.doc_id: r for r in out}
    assert by_id[9998].exact_dup == 1 and by_id[9998].admit == 0


def test_round5_plan_shapes(spark):
    """Physical-plan contracts of the round-5 operators: decorrelation
    becomes semi+anti hash joins (no CartesianProduct, no per-row
    Python); RRF pools come from TakeOrderedAndProject (no global sort);
    the Q8 snowflake keeps its semi-join region prune; substring dedup
    joins on the 8-byte gram hash (SortMergeJoin/ShuffledHashJoin or
    broadcast — never a nested-loop)."""
    from tests.conftest import SF_SMOKE

    from osm_poi_database_maker_spark.queries.core import q_nation_market_share
    from osm_poi_database_maker_spark.queries.dedup import q_doc_substring_dedup
    from osm_poi_database_maker_spark.queries.events import (
        q_events_multi_exists,
        q_events_ohlc_bars,
    )
    from osm_poi_database_maker_spark.queries.text import q_doc_hybrid_rrf

    def plan_of(q):
        return q(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()

    p = plan_of(q_events_multi_exists)
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p

    p = plan_of(q_doc_hybrid_rrf)
    assert "TakeOrderedAndProject" in p  # pools AND final top-k
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p

    p = plan_of(q_nation_market_share)
    assert "LeftSemi" in p  # region prune is a semi-join key set
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p

    p = plan_of(q_doc_substring_dedup)
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p

    p = plan_of(q_events_ohlc_bars)
    assert "Window" not in p  # one combining aggregate, no per-bar window
    assert "min_by" in p and "max_by" in p


def test_round6_plan_shapes(spark):
    """Physical-plan contracts of the round-6 operators: the Q-shape
    decorrelations run as hash joins with broadcast dims and window-free
    top-k; the scalar-total queries use the whitelisted 1-row broadcast
    nested-loop, never a CartesianProduct; and every new operator stays
    JVM-side (no BatchEvalPython anywhere — SRP-LSH, CMS, and the Bloom
    membership test are pure expressions)."""
    from tests.conftest import SF_SMOKE

    from osm_poi_database_maker_spark.queries.core import (
        q_brand_supplier_counts,
        q_excess_shipped_suppliers,
        q_important_part_stock,
        q_min_cost_supplier,
        q_shipping_lag_buckets,
    )
    from osm_poi_database_maker_spark.queries.curation import (
        q_doc_bloom_decontaminate,
    )
    from osm_poi_database_maker_spark.queries.events import q_events_cms_counts
    from osm_poi_database_maker_spark.queries.similarity import q_emb_srp_lsh_pairs

    def plan_of(q):
        return q(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()

    for q in (
        q_min_cost_supplier,
        q_important_part_stock,
        q_shipping_lag_buckets,
        q_brand_supplier_counts,
        q_excess_shipped_suppliers,
        q_events_cms_counts,
        q_emb_srp_lsh_pairs,
        q_doc_bloom_decontaminate,
    ):
        p = plan_of(q)
        assert "CartesianProduct" not in p, q.__name__
        assert "BatchEvalPython" not in p, q.__name__

    p = plan_of(q_min_cost_supplier)
    assert "TakeOrderedAndProject" in p  # top-100, never a global sort
    assert "BroadcastHashJoin" in p  # region/nation dims broadcast

    p = plan_of(q_brand_supplier_counts)
    assert "LeftAnti" in p  # NOT IN decorrelated, not re-scanned

    p = plan_of(q_excess_shipped_suppliers)
    # the part-prefix semi-join lives inside the localCheckpointed
    # (supplier, part) frame's RDD lineage (invisible to this plan);
    # what must be visible: the dominance threshold runs as a HASH join
    # with the residual qty*2 > total condition, never a nested loop
    assert "BroadcastHashJoin" in p or "ShuffledHashJoin" in p or "SortMergeJoin" in p

    p = plan_of(q_events_cms_counts)
    assert "BroadcastHashJoin" in p  # the sketch broadcasts to probes


def test_round6b_plan_shapes(spark):
    """Physical-plan contracts of the round-6 continuation operators.

    winnow: the codepoint array must stay materialized behind its
    round-robin exchange (the CollapseProject re-split trap) and the
    window mins must flow through ONE Generate + one doc_id window —
    no Python, no cartesian. custdist: the orders side pre-aggregates
    BEFORE the outer join. gapfill: exactly one Window (the LOCF
    carry) and no cartesian spine blow-up. zoo: the four ranked
    functions share ONE Window node. containment: directions expand
    via Generate, not a self-union re-join."""
    from tests.conftest import SF_SMOKE

    from osm_poi_database_maker_spark.queries.core import (
        q_customer_order_distribution,
        q_order_window_zoo,
    )
    from osm_poi_database_maker_spark.queries.dedup import (
        q_doc_containment_pairs,
        q_doc_winnow_fingerprints,
    )
    from osm_poi_database_maker_spark.queries.events import q_events_gapfill_locf

    def plan_of(q):
        return q(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()

    for q in (
        q_doc_winnow_fingerprints,
        q_doc_containment_pairs,
        q_customer_order_distribution,
        q_events_gapfill_locf,
        q_order_window_zoo,
    ):
        p = plan_of(q)
        assert "CartesianProduct" not in p, q.__name__
        assert "BatchEvalPython" not in p, q.__name__

    p = plan_of(q_doc_winnow_fingerprints)
    assert "RoundRobinPartitioning" in p  # the barrier exchange survives
    assert p.count("Generate") == 1  # one posexplode, no array re-eval
    assert p.count("split(") <= 1  # the re-split trap stays dead

    p = plan_of(q_order_window_zoo)
    assert p.count("Window") == 1  # all four functions share one spec

    p = plan_of(q_events_gapfill_locf)
    assert p.count("Window") == 1  # only the LOCF carry

    p = plan_of(q_doc_containment_pairs)
    assert "Generate" in p  # array-side direction expansion


# --- round-8 fold operators: Misra-Gries sketch and window-funnel fold ---


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=600),
    st.integers(min_value=1, max_value=7),
)
def test_mg_sketch_superset_property(tokens, n_batches):
    """For ANY stream and ANY batch split, every item with true count
    > N/(K+1) must survive the partition sketch, counters stay ≤ K,
    and every retained lower bound is ≤ the true count (MG only
    subtracts)."""
    from collections import Counter

    from osm_poi_database_maker_spark.queries import text as T

    stream = [f"t{v}" for v in tokens]
    size = max(1, len(stream) // n_batches)
    batches = [
        pd.DataFrame({"w": stream[i : i + size]})
        for i in range(0, len(stream), size)
    ]
    out = list(T._mg_partition_sketch(iter(batches)))[0]
    lb = dict(zip(out["token"], out["lb"]))
    true = Counter(stream)
    n = len(stream)
    assert len(lb) <= T._MG_K
    for tok, c in true.items():
        if c * (T._MG_K + 1) > n:
            assert tok in lb, (tok, c, n)
    for tok, b in lb.items():
        assert 0 < b <= true[tok]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # ts (µs scale shrunk)
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_wfunnel_fold_matches_brute_force(evs, n_batches):
    """The suffix-min funnel fold equals a brute-force exists-chain
    search for ANY event stream and ANY micro-batch split (no
    watermark → nothing folds, the exact path)."""
    from osm_poi_database_maker_spark import streaming as S

    rows = [
        {"ts_us": t * S._WFUNNEL_WINDOW_US // 100, "event_id": i, "event_type": y}
        for i, (t, y) in enumerate(evs)
    ]
    W = S._WFUNNEL_WINDOW_US

    def brute(rs):
        rs = sorted((r["ts_us"], r["event_id"], r["event_type"]) for r in rs)
        lvl = 0
        for a, (tv, _, yv) in enumerate(rs):
            if yv != "view":
                continue
            lvl = max(lvl, 1)
            for b in range(a + 1, len(rs)):
                tc, _, yc = rs[b]
                if yc == "click" and tc - tv <= W:
                    lvl = max(lvl, 2)
                    for c in range(b + 1, len(rs)):
                        tp, _, yp = rs[c]
                        if yp == "purchase" and tp - tv <= W:
                            return 3
        return lvl

    class _St:
        exists = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    st_ = _St()
    size = max(1, len(rows) // n_batches)
    out = None
    for i in range(0, len(rows), size):
        chunk = pd.DataFrame(rows[i : i + size])
        res = list(S._wfunnel_update((1,), [chunk], st_))
        if res:
            out = res[0]
    want = brute(rows)
    got = int(out["level"].iloc[0]) if out is not None else 0
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False),
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_sign_signature_matches_pure_python(spark, vecs):
    """sign_signature over arbitrary-length vectors (including >64-dim,
    the r11-advice regression class) must equal the bit-for-bit Python
    reference: bit d set iff v_d > 0, dims past 64 ignored, shorter
    vectors zero-padded."""
    from osm_poi_database_maker_spark.similarity import sign_signature

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r.sign_sig for r in sign_signature(df).collect()}
    for i, v in enumerate(vecs):
        want = 0
        for d, x in enumerate(v[:64]):
            if x > 0:
                want |= 1 << d
        if want >= 1 << 63:
            want -= 1 << 64
        assert got[i] == want, (i, v)


def test_kn_bigram_formula_is_a_probability_distribution():
    """The interpolated Kneser-Ney formula the query implements,
    P(w2|w1) = (max(c12−D,0) + D·N1+(w1,·)·N1+(·,w2)/N1+(··)) / c1,
    must sum to EXACTLY 1 over the full bigram-type vocabulary for
    every context w1 (the identity holds because Σ max(c12−D,0) =
    c1 − D·N1+(w1,·) when every seen count ≥ 1 > D, and Σ Pcont = 1).
    A formula bug (wrong normalizer, wrong continuation table) breaks
    this identity immediately."""
    import itertools
    from collections import Counter

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat sleeps",
        "a lazy dog and a lazy cat",
        "san francisco san francisco san jose",
    ]
    D = 0.75
    bigrams = []
    for doc in corpus:
        t = doc.split()
        bigrams += list(zip(t, t[1:]))
    c12 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    types = set(c12)
    n_fw = Counter(w1 for w1, _ in types)
    n_bw = Counter(w2 for _, w2 in types)
    n_types = len(types)
    vocab2 = {w2 for _, w2 in types}
    for w1 in c1:
        total = sum(
            (max(c12.get((w1, w2), 0) - D, 0.0)
             + D * n_fw[w1] * n_bw[w2] / n_types) / c1[w1]
            for w2 in vocab2
        )
        assert abs(total - 1.0) < 1e-12, (w1, total)
