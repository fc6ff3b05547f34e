"""Embedding similarity search: exact broadcast top-k + LSH-bucketed ANN.

Exact path (the oracle baseline, also in queries/similarity.py): broadcast
the query batch against the collection, score with a pure-expression dot
product, per-query top-k window. No shuffle of the collection.

Approximate path for 100 TB: random-hyperplane LSH — each vector gets a
B-bit signature per table (sign of dot with B fixed pseudo-random planes);
candidates share a signature in ≥1 table; exact cosine reranks candidates
only. The planes are generated ONCE from a fixed seed on the driver and
inlined as literals, so signatures are deterministic and reproducible
across runs/engines. Collection-side signatures would be precomputed and
bucketed at rest (partitionBy(signature)) in a production lakehouse,
making a query a partition-pruned scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

DIM = 64


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    collection: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force,
    broadcast queries). Deterministic rank: rounded cosine desc, id asc."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = collection.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).withColumn(
        "cosine", cosine(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("cosine", 6)), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rk")
    )


def _planes(n_tables: int, n_bits: int, dim: int, seed: int = 42) -> list[list[list[float]]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """B-bit signature for one table: bit b = sign(vec · plane_b)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in plane]),
                    lambda v, p: v.cast("double") * p,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for plane in planes
    ]
    sig = F.lit(0).cast("long")
    for b in bits:
        sig = F.shiftleft(sig, 1) + b
    return sig


def ann_topk(
    collection: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 16,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: LSH candidate generation + exact rerank.

    Shuffle pattern: both sides hash into (table, signature) buckets; the
    join is an equi join on the bucket key — never a cross join. Recall
    rises with n_tables, candidate-set selectivity with n_bits.

    Defaults (4 bits × 16 tables → recall ≈0.98 on the uniform-random
    fixture embeddings, ANN's worst case) suit near-orthogonal vectors;
    real embedding corpora with neighbor cosines ≳0.8 should RAISE n_bits
    (8–16) for far smaller candidate sets at the same recall — p(bit
    match) = 1 − θ/π governs the tradeoff.
    """
    # (n_tables*n_bits, DIM) plane matrix: all signatures for a batch of
    # vectors are one numpy matmul — Arrow-vectorized, ~100x faster than
    # evaluating 64 interpreted zip_with/aggregate dot products per row
    plane_mat = np.asarray(_planes(n_tables, n_bits, DIM)).reshape(n_tables * n_bits, DIM)
    bit_weights = 1 << np.arange(n_bits - 1, -1, -1)  # first plane = MSB

    @pandas_udf("array<long>")
    def table_sigs(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)  # (batch, DIM)
        bits = (m @ plane_mat.T) >= 0  # (batch, n_tables*n_bits)
        sigs = (
            bits.reshape(-1, n_tables, n_bits) * bit_weights
        ).sum(axis=2)  # (batch, n_tables)
        return pd.Series(list(sigs.astype(np.int64)))

    def with_sigs(df: DataFrame, idc: str, vc: str) -> DataFrame:
        # signatures only — column pruning drops the vector from the
        # candidate join; vectors are joined back for the rerank so the
        # widest shuffle of the plan ships (id, table, sig) not (… + vec)
        return df.select(F.col(idc), F.posexplode(table_sigs(F.col(vc)))).select(
            idc, F.col("pos").alias("table"), F.col("col").alias("sig")
        )

    # barrier: spread the collection before the 16-table signature
    # projection (a small parquet file scans as one partition) and reuse
    # the same exchange for signature generation and the rerank join
    c_base = collection.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).repartition("neighbor_id")
    q_base = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = with_sigs(c_base, "neighbor_id", "c_vec")
    q = with_sigs(q_base, "query_id", "q_vec")
    cand = (
        c.join(F.broadcast(q), ["table", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        cand.join(c_base, "neighbor_id")
        .join(F.broadcast(q_base), "query_id")
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("cosine", 6)), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rk")
    )
