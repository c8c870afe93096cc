"""Distributed PageRank over an edge relation — graph centrality for
the co-occurrence graphs a curation pipeline mines (products bought
together, documents linked by near-dup bands, entities co-mentioned).

Reference parity note: the reference engine has no graph operators;
this extends the §2.11 LLM-pipeline surface (SURVEY.md) beyond the
connected-components election (operators/components.py) to importance
ranking on the same edge-relation representation.

Per iteration (classic damped PageRank, Brin & Page 1998):

    pr_{t+1}(v) = (1-d) + d * [ Σ_{(u,v) in E} pr_t(u)/deg(u)
                                + dangling_mass_t / n ]

expressed as ONE edge-keyed join + ONE dst-keyed aggregate; the
dangling mass (rank parked on nodes with no out-edges) rides the
per-round 1-row certificate collect as a carried Python double (r17 —
it used to be a per-round aggregate subtree + broadcast exchange
inside every round's job), never a per-node collect. Ranks materialize
each round via operators.iterative.loop_round (lineage truncation +
release of the superseded round's blocks; ``checkpoint_dir`` selects
the executor-loss-safe reliable variant for cluster runs), so plan
depth and executor storage both stay flat across iterations. With
sum(pr_0) = n the update conserves total mass at n exactly (modulo
float addition), which the QA query pins as an oracle boolean
alongside the convergence residual.

Exchange-free rounds (r13, the recipe measured on the core-numbers
loop): the edge relation is hash-partitioned by ``dst`` ONCE and
PERSISTED (an InMemoryRelation preserves outputPartitioning; a
checkpointed LogicalRDD reports it unknown), and each round's share
relation — node-grain, |V| known from the loop's own count — is
explicitly BROADCAST while it fits (cap 2M rows). The contribution
join then never exchanges the edge relation, its output stays
dst-partitioned, and the dst aggregate runs in place: a round's heavy
relation is SCANNED, not shuffled. Above the cap the join falls back
to the plain shuffle pair, the 100 TB shape where each iteration
shuffles |E| contribution rows with map-side partial aggregation on
dst; iteration count is the convergence budget (10-20 dominates for
web-like spectra), independent of corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.iterative import loop_round


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_dir: str | None = None,
) -> dict:
    """Rank nodes of the directed graph ``edges`` (for an undirected
    co-occurrence graph, pass both orientations of each pair).

    Returns ``{"ranks": DataFrame(node, pr), "n_nodes": int,
    "delta_max": float}`` — ``delta_max`` is the largest per-node
    change of the final iteration, the convergence certificate a
    caller turns into a loud check (QA queries pin it as a boolean).
    Self-loops and duplicate edges are the caller's policy; this
    operator takes the edge relation as given.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # dst-partitioned + persisted: the per-round contribution join
    # broadcasts the share side, so the edge relation is never
    # exchanged again and the dst aggregate reuses this partitioning
    # (see module docstring). Unpersisted before return.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(n_part, "dst")
        .persist()
    )
    nodes = loop_round(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct(),
        checkpoint_dir=checkpoint_dir,
    )
    n = nodes.count()
    bcast_share = n <= 2_000_000
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # out-degree rides with the rank relation so the per-iteration join
    # is rank->edges only (nodes without out-edges carry deg 0 and
    # contribute via the dangling term instead)
    state = loop_round(
        nodes.join(deg, nodes.node == deg.src, "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"))
        .withColumn("pr", F.lit(1.0)),
        prev=nodes,
        checkpoint_dir=checkpoint_dir,
    )
    delta_max = float("nan")
    # state_cp is the round's CHECKPOINTED relation (the thing whose
    # blocks loop_round can free once the next round materializes);
    # state is at most a projection over it
    state_cp = state
    # Dangling mass rides the per-round 1-row certificate collect
    # (r17, guide §1.2): the former per-round dangling SUBTREE (a scan
    # of state + aggregate + broadcast exchange inside every round's
    # job) is replaced by a Python double carried between rounds — the
    # next round's update folds it in as a literal, numerically the
    # same value the broadcast row held. m_0 is the dangling-node
    # count (pr_0 = 1), one tiny aggregate over the checkpointed init.
    m = float(
        state.filter(F.col("deg") == 0)
        .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m"))
        .collect()[0]
        .m
    )
    for _ in range(iters):
        # deg > 0 before the division: ANSI mode makes /0 an error,
        # and dangling nodes contribute via the teleport term, not
        # the edge join
        share = state.filter(F.col("deg") > 0).select(
            F.col("node").alias("src"),
            (F.col("pr") / F.col("deg")).alias("share"),
        )
        contrib = (
            e.join(F.broadcast(share) if bcast_share else share, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        new = (
            state.join(contrib, state.node == contrib.dst, "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.lit(m) / F.lit(float(n))
                    )
                ).alias("pr"),
                F.col("pr").alias("pr_prev"),
            )
        )
        new = loop_round(new, prev=state_cp, checkpoint_dir=checkpoint_dir)
        cert = new.agg(
            F.max(F.abs(F.col("pr") - F.col("pr_prev"))).alias("d"),
            F.coalesce(
                F.sum(F.when(F.col("deg") == 0, F.col("pr"))), F.lit(0.0)
            ).alias("m"),
        ).collect()[0]
        delta_max = float(cert.d)
        m = float(cert.m)
        state_cp = new
        state = new.drop("pr_prev")
    # ranks is a projection over the checkpointed final round; the
    # edge cache is dead weight now
    e.unpersist(blocking=False)
    return {
        "ranks": state.select("node", "pr"),
        "n_nodes": n,
        "delta_max": delta_max,
    }


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 12,
    checkpoint_dir: str | None = None,
) -> dict:
    """Personalized PageRank (Haveliwala 2002, "Topic-sensitive
    PageRank"): the teleport distribution concentrates on a SEED set
    instead of being uniform, so rank mass diffuses outward from the
    seeds through the graph — the seed-expansion primitive curation
    pipelines use for data selection ("find everything related to this
    trusted set") and recommendation ("products in the orbit of these
    products").

        ppr_{t+1}(v) = (1-d)·s(v) + d·[ Σ_{(u,v)∈E} ppr_t(u)/deg(u)
                                        + dangling_mass_t · s(v) ]

    with ``s`` uniform over ``seeds`` (a DataFrame with a ``node``
    column) and ppr_0 = s, so total mass is exactly 1 every round
    (the damped update is measure-preserving with dangling mass
    re-teleported to the seeds). Per-round cost is identical to
    :func:`pagerank`: one edge-keyed join + one dst aggregate, rounds
    materialized via :func:`operators.iterative.loop_round`.

    Unlike the global variant, the iteration is a LINEAR fixed-depth
    recurrence from a deterministic start, so a cross-engine oracle
    can unroll the exact same T iterations in SQL and compare VALUES
    (rounded, the double-summation-order allowance) — no
    invariant-style certificates needed.

    Returns ``{"ranks": DataFrame(node, sv, pr), "n_nodes", "n_seeds",
    "delta_max"}``.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    # same exchange-free round shape as :func:`pagerank`: dst-
    # partitioned persisted edges + broadcast share under the cap
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(n_part, "dst")
        .persist()
    )
    nodes = loop_round(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct(),
        checkpoint_dir=checkpoint_dir,
    )
    n = nodes.count()
    bcast_share = n <= 2_000_000
    # Normalize the seed set before it defines the teleport measure
    # (r12 ADVICE): duplicates in ``seeds`` would duplicate node rows
    # through the left join below, and a seed absent from the graph
    # would silently shrink total teleport mass below 1 while still
    # counting toward n_seeds. Dedup, then keep only seeds that are
    # actual graph nodes, and recompute n_seeds from that set.
    seed_set = seeds.select("node").distinct().join(nodes, "node", "semi")
    n_seeds = seed_set.count()
    if n_seeds < 1:
        raise ValueError("seeds must be non-empty and present in the graph")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    sv = F.when(
        F.col("seed_node").isNotNull(), F.lit(1.0) / F.lit(float(n_seeds))
    ).otherwise(F.lit(0.0))
    state = loop_round(
        nodes.join(deg, nodes.node == deg.src, "left")
        .join(
            F.broadcast(seed_set.select(F.col("node").alias("seed_node"))),
            nodes.node == F.col("seed_node"),
            "left",
        )
        .select(
            "node",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            sv.alias("sv"),
        )
        .withColumn("pr", F.col("sv")),
        prev=nodes,
        checkpoint_dir=checkpoint_dir,
    )
    delta_max = float("nan")
    state_cp = state
    # dangling mass as a carried Python double (r17) — same fold as
    # :func:`pagerank`; m_0 = Σ sv over deg-0 nodes (pr_0 = sv)
    m = float(
        state.filter(F.col("deg") == 0)
        .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m"))
        .collect()[0]
        .m
    )
    for _ in range(iters):
        share = state.filter(F.col("deg") > 0).select(
            F.col("node").alias("src"),
            (F.col("pr") / F.col("deg")).alias("share"),
        )
        contrib = (
            e.join(F.broadcast(share) if bcast_share else share, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        new = (
            state.join(contrib, state.node == contrib.dst, "left")
            .select(
                "node",
                "deg",
                "sv",
                (
                    F.lit(1.0 - damping) * F.col("sv")
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.lit(m) * F.col("sv")
                    )
                ).alias("pr"),
                F.col("pr").alias("pr_prev"),
            )
        )
        new = loop_round(new, prev=state_cp, checkpoint_dir=checkpoint_dir)
        cert = new.agg(
            F.max(F.abs(F.col("pr") - F.col("pr_prev"))).alias("d"),
            F.coalesce(
                F.sum(F.when(F.col("deg") == 0, F.col("pr"))), F.lit(0.0)
            ).alias("m"),
        ).collect()[0]
        delta_max = float(cert.d)
        m = float(cert.m)
        state_cp = new
        state = new.drop("pr_prev")
    e.unpersist(blocking=False)
    return {
        "ranks": state.select("node", "sv", "pr"),
        "n_nodes": n,
        "n_seeds": n_seeds,
        "delta_max": delta_max,
    }


def weighted_pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_dir: str | None = None,
) -> dict:
    """PageRank over a WEIGHTED directed graph: each node distributes
    its rank across out-edges in proportion to edge weight
    (contribution along (u, v, w) = pr(u) * w / wdeg(u), wdeg = sum of
    u's out-weights) — the production norm for co-occurrence graphs,
    where a pair co-ordered 40 times should pull rank harder than a
    pair co-ordered once. Reduces exactly to :func:`pagerank` when all
    weights are 1 (pinned by test). Deliberately a SEPARATE function:
    the unweighted operator backs five standing oracle rows and stays
    byte-unchanged.

    Same exchange-free round shape as :func:`pagerank` (module
    docstring): the weighted edge relation is dst-partitioned and
    persisted, the node-grain share relation (pr / wdeg) broadcasts
    under the 2M-node cap, and rounds materialize via ``loop_round``
    (superseded-block release; ``checkpoint_dir`` for the reliable
    cluster mode). Same update form as the unweighted operator
    (sum-=-n normalization): pr <- (1-d) + d*(inflow + m/n) with m the
    dangling mass (wdeg = 0 nodes).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("w"),
        )
        .repartition(n_part, "dst")
        .persist()
    )
    # Weight-sign guard (r14 ADVICE): w <= 0 silently corrupts the
    # measure — a node whose out-weights sum to 0 despite having edges
    # is misclassified as dangling, and a negative-wdeg node neither
    # contributes nor counts as dangling, LEAKING rank mass with no
    # error. NaN is neither null nor <= 0 in SQL comparisons yet
    # poisons every downstream wdeg sum, so it gets its own predicate
    # (r15 ADVICE). One limit(1) probe on the persisted edge relation
    # (it materializes here anyway for the first round).
    if (
        e.filter(F.col("w").isNull() | F.isnan("w") | (F.col("w") <= 0))
        .limit(1)
        .count()
        > 0
    ):
        e.unpersist(blocking=False)
        raise ValueError(
            "weighted_pagerank requires strictly positive edge "
            f"weights; found {weight} null, NaN, or <= 0"
        )
    nodes = loop_round(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct(),
        checkpoint_dir=checkpoint_dir,
    )
    n = nodes.count()
    bcast_share = n <= 2_000_000
    wdeg = e.groupBy("src").agg(F.sum("w").alias("wdeg"))
    state = loop_round(
        nodes.join(wdeg, nodes.node == wdeg.src, "left")
        .select("node", F.coalesce("wdeg", F.lit(0.0)).alias("wdeg"))
        .withColumn("pr", F.lit(1.0)),
        prev=nodes,
        checkpoint_dir=checkpoint_dir,
    )
    delta_max = float("nan")
    state_cp = state
    # dangling mass as a carried Python double (r17) — same fold as
    # :func:`pagerank`; m_0 is the wdeg-0 node count (pr_0 = 1)
    m = float(
        state.filter(F.col("wdeg") == 0.0)
        .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m"))
        .collect()[0]
        .m
    )
    for _ in range(iters):
        share = state.filter(F.col("wdeg") > 0.0).select(
            F.col("node").alias("src"),
            (F.col("pr") / F.col("wdeg")).alias("share"),
        )
        contrib = (
            e.join(F.broadcast(share) if bcast_share else share, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("share") * F.col("w")).alias("inflow"))
        )
        new = (
            state.join(contrib, state.node == contrib.dst, "left")
            .select(
                "node",
                "wdeg",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.lit(m) / F.lit(float(n))
                    )
                ).alias("pr"),
                F.col("pr").alias("pr_prev"),
            )
        )
        new = loop_round(new, prev=state_cp, checkpoint_dir=checkpoint_dir)
        cert = new.agg(
            F.max(F.abs(F.col("pr") - F.col("pr_prev"))).alias("d"),
            F.coalesce(
                F.sum(F.when(F.col("wdeg") == 0.0, F.col("pr"))),
                F.lit(0.0),
            ).alias("m"),
        ).collect()[0]
        delta_max = float(cert.d)
        m = float(cert.m)
        state_cp = new
        state = new.drop("pr_prev")
    e.unpersist(blocking=False)
    return {
        "ranks": state.select("node", "wdeg", "pr"),
        "n_nodes": n,
        "delta_max": delta_max,
    }
