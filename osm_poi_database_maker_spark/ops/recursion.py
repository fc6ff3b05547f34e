"""Recursive-query surface: transitive closure of functional graphs.

Spark has no ``WITH RECURSIVE``; this module provides the standard
substitution for the linear-recursion case (each node has at most one
parent edge — org charts, referral chains, category trees, Fenwick-style
aggregation paths): pointer doubling. Where a recursive CTE walks one
edge per pass (O(depth) sequential joins — at 100 TB depth-30 chains
mean 30 shuffles), doubling squares the reach every round, so the whole
closure materializes in ceil(log2(max_depth)) self-joins; each round is
one shuffle on the join key plus a distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(edges: DataFrame, max_rounds: int = 12) -> DataFrame:
    """Full ancestor closure of a functional parent graph.

    Input: ``(node, anc)`` — one parent edge per non-root node; the
    graph must be acyclic (a cycle never converges and trips the
    ``max_rounds`` guard). Output: ``(node, ancestor, dist)`` — every
    ancestor of every node with its path length, exactly the rows a
    linear recursive CTE produces.

    Invariant: after round k the frame holds every ancestor path of
    length ≤ 2^k (every prefix of a path is itself a path, so the
    x.ancestor = y.node join composes all splits and ``distinct``
    collapses them — in a functional graph (node, ancestor) pairs are
    unique per dist, so no min() is needed). ``max_rounds = 12`` covers
    depth 4096: detecting convergence costs one extra no-change round,
    so the loop runs ``max_rounds + 1`` iterations — depth 2^max_rounds
    completes its closure on round max_rounds and the +1 round proves
    it. Each round eagerly checkpoints to cut the doubling lineage and
    make the convergence count a cheap scan.
    """
    closure = (
        edges.select(
            F.col("node").cast("long").alias("node"),
            F.col("anc").cast("long").alias("ancestor"),
            F.lit(1).cast("long").alias("dist"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = closure.count()
    for _ in range(max_rounds + 1):
        x, y = closure.alias("x"), closure.alias("y")
        doubled = x.join(y, F.col("x.ancestor") == F.col("y.node")).select(
            F.col("x.node").alias("node"),
            F.col("y.ancestor").alias("ancestor"),
            (F.col("x.dist") + F.col("y.dist")).alias("dist"),
        )
        closure = closure.unionByName(doubled).distinct().localCheckpoint(eager=True)
        n_now = closure.count()
        if n_now == n_prev:
            return closure
        n_prev = n_now
    raise RuntimeError(
        f"ancestor_closure did not converge in {max_rounds} doubling rounds "
        f"(depth > {2 ** max_rounds}): cyclic input or pathological hierarchy"
    )
