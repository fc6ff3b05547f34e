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


def min_dist_closure(edges: DataFrame, max_rounds: int = 12) -> DataFrame:
    """Shortest-distance closure of a multi-parent DAG — the
    non-functional-graph recursion case (BOM graphs, category DAGs,
    citation ancestries, where a node has SEVERAL parent edges and a
    pair is reachable along many paths of different lengths).

    Input: ``(node, anc)`` distinct parent edges. Output:
    ``(node, ancestor, dist)`` with dist = the MINIMUM edge count over
    all paths — exactly the rows a recursive CTE plus
    ``GROUP BY node, ancestor → min(dist)`` produces. Unlike
    :func:`ancestor_closure`, CYCLES are well-defined here: min() gives
    the doubling a true fixpoint (shortest-WALK distances, finite for
    every reachable pair), so a cycle of length L simply yields
    ``(n, n, L)`` self-rows instead of diverging — a recursive CTE
    needs an explicit depth guard for the same input.

    Where :func:`ancestor_closure` dedups with ``distinct`` (in a
    functional graph each (node, anc, dist) path is unique), a DAG
    needs a min() re-aggregation per doubling round. Invariant: after
    round k every pair whose shortest distance is ≤ 2^k carries that
    exact distance — split a shortest path at its midpoint: both halves
    are shortest paths of length ≤ 2^(k-1), exact by induction; the
    self-join records their sum, and min() can keep no overestimate
    because every recorded dist is a realizable path length.

    Work bound — semi-naive doubling: composing the WHOLE closure with
    itself each round recomputes every old∘old pair it already derived;
    instead each round composes only the round's DELTA (pairs new or
    improved last round) with the closure, in both orders. Completeness
    holds because any shortest path of length ≤ 2^(k+1) splits into two
    exact halves ≤ 2^k, and if both halves were already exact a round
    earlier their composition (≤ 2^k) was produced then — so at least
    one half sits in the delta. The delta shrinks geometrically once
    reach saturates, so total join input approaches the CTE's
    O(paths) while keeping the O(log depth) round count. Convergence =
    empty delta (exact, no checksum). Per round: two delta⋈closure
    joins + one min() re-aggregation + one anti-join for the next
    delta, all key-partitioned; lazy localCheckpoints cut the lineage
    with the stats/anti-join action materializing each round in one
    job.
    """
    closure = (
        edges.select(
            F.col("node").cast("long").alias("node"),
            F.col("anc").cast("long").alias("ancestor"),
            F.lit(1).cast("long").alias("dist"),
        )
        .groupBy("node", "ancestor")
        .agg(F.min("dist").alias("dist"))
        .localCheckpoint(eager=False)
    )
    delta = closure
    for _ in range(max_rounds + 1):
        x, y = delta.alias("x"), closure.alias("y")
        fwd = x.join(y, F.col("x.ancestor") == F.col("y.node")).select(
            F.col("x.node").alias("node"),
            F.col("y.ancestor").alias("ancestor"),
            (F.col("x.dist") + F.col("y.dist")).alias("dist"),
        )
        p, q = closure.alias("p"), delta.alias("q")
        bwd = p.join(q, F.col("p.ancestor") == F.col("q.node")).select(
            F.col("p.node").alias("node"),
            F.col("q.ancestor").alias("ancestor"),
            (F.col("p.dist") + F.col("q.dist")).alias("dist"),
        )
        new_closure = (
            closure.unionByName(fwd)
            .unionByName(bwd)
            .groupBy("node", "ancestor")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        delta = new_closure.join(
            closure, ["node", "ancestor", "dist"], "left_anti"
        ).localCheckpoint(eager=False)
        closure = new_closure
        if delta.limit(1).count() == 0:
            return closure
    raise RuntimeError(
        f"min_dist_closure did not converge in {max_rounds} doubling rounds "
        f"(shortest-path depth > {2 ** max_rounds}): pathological diameter"
    )
