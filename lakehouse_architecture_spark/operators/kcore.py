"""k-core decomposition by iterative peeling — the graph-curation
operator that isolates the dense backbone of a relation graph (link
spam filtering, community cores, recommendation candidate pruning).

The k-core of an undirected graph is the maximal subgraph in which
every node has degree >= k; the standard algorithm peels nodes of
degree < k until a fixpoint. Distributed shape per round: one
degree aggregate (both edge orientations unioned, one shuffle) and two
left-semi joins filtering the edge relation to surviving endpoints —
the edge relation only ever SHRINKS, so round cost is bounded by the
current subgraph, and each round materializes via
``operators.iterative.loop_round`` (lineage truncation + explicit
release of the superseded round's blocks; pass ``checkpoint_dir`` for
the executor-loss-safe reliable variant on real clusters — see that
module's durability caveat). Rounds are data-bounded (the peel
terminates in at most the longest degeneracy-ordering chain; single
digits on every corpus measured), and the loop is driver-bounded by
``max_rounds``.

Fixpoint idempotence is the cross-engine contract: peeling past
convergence changes nothing, so an oracle that unrolls a FIXED number
of rounds R >= the true convergence round reads exactly the same core
relation the early-stopping loop returns (queries/relational.py's
`parts_coorder_kcore` exploits this with R = 16).

Cited reference behavior: standard algorithm (Seidman 1983, "Network
structure and minimum degree"); no counterpart in the reference repo —
part of the implied-analytics graph family (components, triangles,
PageRank, k-core).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.iterative import loop_round


def kcore_peel(
    edges: DataFrame,
    k: int,
    max_rounds: int = 16,
    checkpoint_dir: str | None = None,
) -> dict:
    """Peel ``edges`` (undirected, ``src < dst``, distinct) to the
    k-core fixpoint.

    Returns ``{"edges", "rounds", "converged", "n_edges"}`` where
    ``rounds`` is the first round whose peel removed nothing (the
    convergence round), or ``max_rounds`` with ``converged=False`` if
    the loop was cut off early — callers comparing against an unrolled
    oracle should emit both so a depth shortfall reads as an honest
    mismatch, not a silent wrong answer. ``checkpoint_dir`` selects
    reliable round checkpoints for cluster runs (identical cores,
    executor-loss-safe; see operators/iterative.py).
    """
    cur = loop_round(
        edges.select("src", "dst"), checkpoint_dir=checkpoint_dir
    )
    prev_cnt = cur.count()
    rounds = 0
    converged = False
    while rounds < max_rounds:
        deg = (
            cur.select(F.col("src").alias("node"))
            .unionAll(cur.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("node")
        nxt = loop_round(
            cur.join(
                keep.withColumnRenamed("node", "src"), "src", "left_semi"
            )
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst"),
            prev=cur,
            checkpoint_dir=checkpoint_dir,
        )
        cnt = nxt.count()
        rounds += 1
        cur = nxt
        if cnt == prev_cnt:
            # peeling only removes edges, so equal counts mean equal
            # sets: fixpoint reached
            converged = True
            prev_cnt = cnt
            break
        prev_cnt = cnt
    return {
        "edges": cur,
        "rounds": rounds,
        "converged": converged,
        "n_edges": prev_cnt,
    }


def _hindex_round(adj: DataFrame, cur: DataFrame) -> DataFrame:
    """One h-index sweep: re-value every node as the H-index of its
    neighbors' current values, carrying the previous value alongside
    as ``c_prev`` (the loop's convergence count reads it for free).

    Plan shape (asserted by tests/test_plans.py): the neighbor-values
    join pins shuffle_hash — both loop relations are lineage-truncated
    LogicalRDDs with unknown compile-time stats, and AQE's runtime
    estimate happily broadcasts the ADJACENCY side when its compressed
    shuffle bytes squeeze under the threshold — a driver OOM at bench
    SF and the wrong plan at any scale (2|E| rows). Shuffled-hash
    streams the edge relation and builds only the node-values
    partition, the shape that holds at 100 TB where the node relation
    outgrows broadcast too. The H-index itself is a row_number window
    partitioned by node (ties are order-insensitive for the H
    statistic), never a per-node collect_list."""
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(F.col("cv").desc())
    nb = adj.join(
        cur.select(
            F.col("node").alias("nbr"), F.col("c").alias("cv")
        ).hint("shuffle_hash"),
        "nbr",
    ).select("node", "cv")
    hidx = (
        nb.withColumn("rn", F.row_number().over(w))
        .groupBy("node")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("cv") >= F.col("rn"), F.col("rn"))),
                F.lit(0),
            )
            .cast("long")
            .alias("c")
        )
    )
    return hidx.join(
        cur.select("node", F.col("c").alias("c_prev")), "node"
    )


def core_numbers(
    edges: DataFrame,
    max_rounds: int = 32,
    checkpoint_dir: str | None = None,
) -> dict:
    """Per-node core numbers (the full degeneracy decomposition) of an
    undirected graph — core(v) = the largest k such that v survives in
    the k-core. Where :func:`kcore_peel` answers ONE fixed k, this
    answers every k at once: the curation-ranking production form
    ("how deep in the dense backbone is each node").

    Algorithm: the h-index fixpoint (Lü/Chen/Ren/Zhou/Zhang/Stanley
    2016, "The H-index of a network node and its relation to degree
    and coreness", Nature Communications — public result): start from
    c_0(v) = deg(v) and iterate c_{t+1}(v) = H{c_t(u) : u in N(v)}
    (the largest h with at least h neighbors valued >= h); the
    sequence is per-node monotone non-increasing and converges to the
    exact core number. A k-at-a-time peel would nest a full
    :func:`kcore_peel` fixpoint per distinct k (hundreds of Spark
    jobs on a dense graph); the h-index form is ONE join + ONE
    node-partitioned window + ONE aggregate per round, and the round
    count is the graph's correction depth (19 on the sf0.01 co-order
    graph), independent of how many distinct core levels exist.

    Distributed shape per round: neighbor values via an edge-keyed
    join (2|E| rows, both orientations), the H-index via a
    row_number window PARTITIONED BY node over those rows (descending
    value; ties are order-insensitive for the H statistic, so the
    result is deterministic) — never a per-node collect_list, so
    executor memory is flat in max degree. Rounds materialize via
    :func:`operators.iterative.loop_round` (block release +
    ``checkpoint_dir`` reliable option).

    Fixpoint idempotence is the cross-engine contract, exactly as in
    :func:`kcore_peel`: iterating past convergence changes nothing,
    so a DuckDB oracle that unrolls R >= the true convergence round
    reads the same core numbers, and a depth shortfall surfaces as
    converged=false on both engines.

    Returns ``{"cores": DataFrame(node, c), "rounds", "converged",
    "n_nodes"}``; ``c`` is exact (long).
    """
    e = edges.select("src", "dst")
    adj = loop_round(
        e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionAll(
            e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        ),
        checkpoint_dir=checkpoint_dir,
    )
    # cur_cp is the round's CHECKPOINTED relation (the freeable leaf);
    # cur is at most a projection over it
    cur_cp = loop_round(
        adj.groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("c")),
        checkpoint_dir=checkpoint_dir,
    )
    cur = cur_cp
    n_nodes = cur_cp.count()
    rounds = 0
    converged = False
    while rounds < max_rounds:
        nxt = loop_round(
            _hindex_round(adj, cur),
            prev=cur_cp,
            checkpoint_dir=checkpoint_dir,
        )
        changed = nxt.filter(F.col("c") != F.col("c_prev")).count()
        rounds += 1
        cur_cp = nxt
        cur = nxt.select("node", "c")
        if changed == 0:
            converged = True
            break
    return {
        "cores": cur,
        "rounds": rounds,
        "converged": converged,
        "n_nodes": n_nodes,
    }
