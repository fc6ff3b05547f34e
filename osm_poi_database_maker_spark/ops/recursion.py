"""Recursive-query surface: transitive closure of functional graphs.

Spark has no ``WITH RECURSIVE``; this module provides the standard
substitution for the linear-recursion case (each node has at most one
parent edge — org charts, referral chains, category trees, Fenwick-style
aggregation paths): pointer doubling. Where a recursive CTE walks one
edge per pass (O(depth) sequential joins — at 100 TB depth-30 chains
mean 30 shuffles), doubling squares the reach every round, so the whole
closure materializes in ceil(log2(max_depth)) self-joins.

Round structure (optimization round r14, guide §2.4 "remove shuffles
outright"): both closures share one semi-naive delta loop. Each round
composes only the DELTA (pairs new or improved last round) with the
closure, in both orders, then folds closure ∪ fwd ∪ bwd through ONE
(node, ancestor) min-aggregation that carries an ``old`` flag column
(old rows keep their previous dist, composed rows carry NULL), so the
next delta is ``min(dist) < min(old)`` — a FILTER over the aggregated
frame instead of the previous implementation's per-round LEFT-ANTI
join of the full closure against itself (one whole closure-sized
shuffle removed per round), and the previous ``distinct`` over
(node, ancestor, dist) triples with per-split-point multiplicity
(ancestor_closure) collapses into the same aggregation. Convergence
and the cycle guard ride a 1-row flags aggregate over the lazily
checkpointed round frame — exactly one job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doubling_closure(
    edges: DataFrame,
    max_rounds: int,
    detect_cycles: bool,
    caller: str,
    dedup_edges: bool = True,
) -> DataFrame:
    """Shared semi-naive pointer-doubling loop over ``(node, anc)`` edges.

    Returns ``(node, ancestor, dist)`` with dist = the MINIMUM edge count
    over all paths. Invariant: after round k every pair whose shortest
    distance is ≤ 2^k carries that exact distance — split a shortest path
    at its midpoint: both halves are shortest paths of length ≤ 2^(k-1),
    exact by induction; the composition records their sum, and min() can
    keep no overestimate because every recorded dist is a realizable path
    length. Completeness of the delta composition: any shortest path of
    length ≤ 2^(k+1) splits into two exact halves ≤ 2^k, and if both
    halves were already exact a round earlier their composition was
    produced then — so at least one half sits in the delta.

    ``detect_cycles`` raises the moment any self-pair (node == ancestor)
    materializes — a node is self-reachable iff the graph has a cycle,
    so this is the exact acyclicity guard (and fires in O(log cycle-len)
    rounds instead of only at ``max_rounds`` exhaustion).
    """
    closure = edges.select(
        F.col("node").cast("long").alias("node"),
        F.col("anc").cast("long").alias("ancestor"),
        F.lit(1).cast("long").alias("dist"),
    )
    if dedup_edges:
        # multi-parent inputs may repeat (node, anc); a functional graph
        # (ancestor_closure's contract: ≤ 1 parent edge per node) cannot,
        # so its caller skips this shuffle (r14, guide §2.1)
        closure = closure.groupBy("node", "ancestor").agg(F.min("dist").alias("dist"))
    closure = closure.localCheckpoint(eager=False)
    # Self-loop edges (the cycle the delta loop's improvements would
    # never flag) surface as (n, n, 1) rows of round 0's aggregated
    # frame, so the `any_self` flag below catches them — no upfront
    # probe job (r14: one job per closure query removed).
    delta = closure
    improved = F.col("old").isNull() | (F.col("dist") < F.col("old"))
    for rnd in range(max_rounds + 1):
        x, y = delta.alias("x"), closure.alias("y")
        fwd = x.join(y, F.col("x.ancestor") == F.col("y.node")).select(
            F.col("x.node").alias("node"),
            F.col("y.ancestor").alias("ancestor"),
            (F.col("x.dist") + F.col("y.dist")).alias("dist"),
        )
        if rnd == 0:
            # round 1 has delta == closure, so the two composition
            # orders produce identical row sets — one join suffices
            cand = fwd
        else:
            p, q = closure.alias("p"), delta.alias("q")
            bwd = p.join(q, F.col("p.ancestor") == F.col("q.node")).select(
                F.col("p.node").alias("node"),
                F.col("q.ancestor").alias("ancestor"),
                (F.col("p.dist") + F.col("q.dist")).alias("dist"),
            )
            cand = fwd.unionByName(bwd)
        allc = (
            closure.withColumn("old", F.col("dist"))
            .unionByName(cand.withColumn("old", F.lit(None).cast("long")))
            .groupBy("node", "ancestor")
            .agg(F.min("dist").alias("dist"), F.min("old").alias("old"))
            .localCheckpoint(eager=False)
        )
        # one job: materializes the round's frame AND answers both
        # "anything new/improved?" and "any self-pair?" (cycle guard)
        flags = allc.agg(
            F.max(improved.cast("int")).alias("any_new"),
            F.max((F.col("node") == F.col("ancestor")).cast("int")).alias(
                "any_self"
            ),
        ).collect()[0]
        closure = allc.select("node", "ancestor", "dist")
        delta = allc.filter(improved).select("node", "ancestor", "dist")
        if detect_cycles and flags["any_self"]:
            raise RuntimeError(
                f"{caller} did not converge: cyclic input "
                "(a node is reachable from itself)"
            )
        if not flags["any_new"]:
            return closure
    raise RuntimeError(
        f"{caller} did not converge in {max_rounds} doubling rounds "
        f"(depth > {2 ** max_rounds}): pathological hierarchy"
    )


def ancestor_closure(edges: DataFrame, max_rounds: int = 12) -> DataFrame:
    """Full ancestor closure of a functional parent graph.

    Input: ``(node, anc)`` — one parent edge per non-root node; the
    graph must be acyclic (a cycle raises — detected exactly via
    self-reachability, see :func:`_doubling_closure`). Output:
    ``(node, ancestor, dist)`` — every ancestor of every node with its
    path length, exactly the rows a linear recursive CTE produces: in a
    functional graph each (node, ancestor) pair has exactly ONE path,
    so the shared min-dist loop's minimum IS that unique path length.
    ``max_rounds = 12`` covers depth 4096; detecting convergence costs
    one extra no-change round, so the loop runs ``max_rounds + 1``
    iterations.
    """
    return _doubling_closure(
        edges,
        max_rounds,
        detect_cycles=True,
        caller="ancestor_closure",
        # functional graph: ≤ 1 parent edge per node, so (node, anc)
        # pairs are unique by contract — no dedup shuffle needed
        dedup_edges=False,
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
    """
    return _doubling_closure(
        edges, max_rounds, detect_cycles=False, caller="min_dist_closure"
    )
