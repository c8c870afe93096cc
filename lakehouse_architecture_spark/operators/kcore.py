"""k-core decomposition by iterative peeling — the graph-curation
operator that isolates the dense backbone of a relation graph (link
spam filtering, community cores, recommendation candidate pruning).

The k-core of an undirected graph is the maximal subgraph in which
every node has degree >= k; the standard algorithm peels nodes of
degree < k until a fixpoint. Distributed shape per round: one
degree aggregate (both edge orientations unioned, one shuffle) and two
left-semi joins filtering the edge relation to surviving endpoints —
the edge relation only ever SHRINKS, so round cost is bounded by the
current subgraph, and each round's result is eagerly
``localCheckpoint``-ed (the iterative-loop doctrine shared with
PageRank/BPE: the count action materializes the round anyway, and
truncating lineage keeps round r's plan from stacking r semi-joins
deep). Rounds are data-bounded (the peel terminates in at most the
longest degeneracy-ordering chain; single digits on every corpus
measured), and the loop is driver-bounded by ``max_rounds``.

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


def kcore_peel(
    edges: DataFrame, k: int, max_rounds: int = 16
) -> dict:
    """Peel ``edges`` (undirected, ``src < dst``, distinct) to the
    k-core fixpoint.

    Returns ``{"edges", "rounds", "converged", "n_edges"}`` where
    ``rounds`` is the first round whose peel removed nothing (the
    convergence round), or ``max_rounds`` with ``converged=False`` if
    the loop was cut off early — callers comparing against an unrolled
    oracle should emit both so a depth shortfall reads as an honest
    mismatch, not a silent wrong answer.
    """
    cur = edges.select("src", "dst").localCheckpoint(eager=True)
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
        nxt = (
            cur.join(
                keep.withColumnRenamed("node", "src"), "src", "left_semi"
            )
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
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
