"""Physical-plan audits: the scale properties we design for must be
visible in `.explain` output, not just claimed.

- selective predicates reach the parquet scan (PushedFilters);
- projections prune the read schema (ReadSchema);
- dimension joins broadcast (no shuffle of the small side);
- semi/anti RI joins stay joins (no driver-side IN-list);
- whole-stage codegen covers the hot path.
"""

from __future__ import annotations

from lakehouse_architecture_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_q6_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    # range predicates on shipdate/discount/quantity pushed to the scan
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    # only the needed columns are read
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_partkey" not in read_schema
    assert "l_extendedprice" in read_schema


def test_q3_broadcasts_dimension(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastExchange" in plan
    # the customer dimension must never shuffle-sort for this join
    assert "SortMergeJoin" not in plan


def test_ri_check_is_a_join_not_an_in_list(spark, sf_dir):
    plan = _plan(spark, sf_dir, "validate_lineitem_fk_invalid")
    # the v1 reference collected keys to the driver (glue_etl.py:126-147);
    # this engine must keep RI distributed
    assert "Join" in plan
    assert "isin" not in plan.lower()


def test_semi_anti_joins_stay_equi_keyed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q21_sole_late_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_agg_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # two HashAggregates around one Exchange = map-side partial agg
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_q12_date_range_pushed_down(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q12_late_priority_counts")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    # conditional-count agg is still a 2-phase hash aggregate
    assert plan.count("HashAggregate") >= 2


def test_q18_no_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q18_large_volume_customers")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_minhash_signatures_have_no_shuffle(spark, sf_dir):
    """Map-side minhash: the signature projection must not aggregate or
    shuffle beyond the single explicit round-robin repartition of the
    unsplittable scan."""
    from lakehouse_architecture_spark.operators.minhash import (
        gram_arrays,
        minhash_signatures_from_grams,
    )
    from lakehouse_architecture_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures_from_grams(gram_arrays(docs, "text", "doc_id"))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = sigs._jdf.queryExecution().explainString(mode)
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
    # the only exchange is the explicit round-robin repartition — no
    # hash shuffle anywhere in the signature path
    assert plan.count("RoundRobinPartitioning") == 1
    assert "HashPartitioning" not in plan
    # seeds are real literals, not accidentally-bound lambda variables
    assert "0:" in plan and "Column<" not in plan


def test_knn_bruteforce_is_arrow_batched(spark, sf_dir):
    """The large-corpus branch of the adaptive KNN must be the Arrow
    path: MapInPandas scoring, relational top-k, no cross join."""
    from lakehouse_architecture_spark.operators.similarity import (
        knn_bruteforce_auto,
    )
    from lakehouse_architecture_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    out = knn_bruteforce_auto(emb, q, k=5, switchover=0)  # force Arrow
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    assert "MapInPandas" in plan          # Arrow/BLAS scoring path
    assert "CartesianProduct" not in plan  # corpus never cross-joins
    assert "Window" in plan                # global top-k stays relational


def test_sql_string_plans_like_dataframes(spark, sf_dir):
    """User SQL through catalog.sql gets the same physical treatment:
    broadcast dims, partial aggs, no nested loops."""
    plan = _plan(spark, sf_dir, "sql_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_candidate_pairs_single_aggregation_no_join(spark):
    """LSH candidate generation must be one bucket groupBy + array-side
    pair expansion — never a self-join of the band relation."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.operators.minhash import candidate_pairs

    bands = spark.createDataFrame(
        [(1, 0, "k1"), (2, 0, "k1"), (3, 1, "k2")],
        "doc long, band int, band_key string",
    )
    plan = (
        candidate_pairs(bands)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan  # pairs come from the bucket arrays


def test_minhash_signatures_map_side_from_grams(spark):
    """Signature projection from gram arrays: zero exchanges, zero
    aggregates in the optimized plan (pure map-side)."""
    from lakehouse_architecture_spark.operators.minhash import (
        minhash_signatures_from_grams,
    )

    g = spark.createDataFrame(
        [(1, ["a b c", "b c d"])], "doc long, grams array<string>"
    )
    plan = (
        minhash_signatures_from_grams(g)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Aggregate" not in plan and "Exchange" not in plan


def test_simhash_fingerprints_map_side(spark):
    """Map-side simhash: no aggregation exchange in the whole
    fingerprint plan (the per-bit votes are array folds)."""
    from lakehouse_architecture_spark.operators.simhash import simhash_fingerprints

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "jumps over the dog")],
        "doc_id long, text string",
    )
    plan = (
        simhash_fingerprints(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Aggregate" not in plan


def test_tfidf_partial_topk_before_shuffle(spark, sf_dir):
    """The per-doc top-3 ranking must push a WindowGroupLimit below the
    exchange (map-side partial top-k), and the corpus doc count must
    arrive as a broadcast, not a shuffle."""
    plan = _plan(spark, sf_dir, "docs_tfidf_top_terms")
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row count crossJoin only
    assert plan.count("CartesianProduct") == 0


def test_emb_lsh_no_cartesian(spark, sf_dir):
    """Sign-LSH candidate generation must be a keyed join on
    (band, key) — never a cartesian of the corpus."""
    plan = _plan(spark, sf_dir, "emb_near_dup_lsh_strict")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gapfill_spine_is_broadcast(spark, sf_dir):
    """The calendar spine derives from a 1-row bounds aggregate; the
    spine-to-hourly join must broadcast, not shuffle the hourly side
    into a sort-merge join."""
    plan = _plan(spark, sf_dir, "events_gapfilled_hourly")
    assert "SortMergeJoin" not in plan


def test_anomaly_stats_broadcast_back(spark, sf_dir):
    """Per-type stats (few rows) must broadcast back onto the hourly
    aggregate — the fact table is scanned exactly once."""
    plan = _plan(spark, sf_dir, "events_anomaly_zscore")
    assert "BroadcastHashJoin" in plan
    scan_lines = [
        l for l in plan.splitlines() if "Scan parquet" in l and "events" in l
    ]
    assert len(scan_lines) <= 2  # hourly agg reused; no third scan


def test_q2_dimensions_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q2_min_cost_supplier")
    assert plan.count("BroadcastHashJoin") >= 4  # part/supp/nation/region
    assert "CartesianProduct" not in plan


def test_hll_rollup_plan_is_sketch_only(spark, sf_dir):
    """The production HLL rollup must carry NO exact-distinct aggregate
    — that cost belongs to the events_hll_accuracy_qa companion, or the
    query's own plan would be exact-distinct-bound, defeating the
    sketch's 100 TB argument."""
    plan = _plan(spark, sf_dir, "events_hll_sketch_rollup")
    assert "count(distinct" not in plan.lower()
    assert "Expand" not in plan
    assert "hll_sketch_agg" in plan


def test_p95_window_ranks_aggregated_relation(spark, sf_dir):
    """The exact-p95 window must consume the (event_type, value)
    frequency aggregate, never raw events: a window partitioned by the
    5-value event_type key over raw rows sorts ~1/5 of the corpus in
    one task at scale (the low-cardinality window trap, r5 plan
    audit). Asserted structurally: no row_number over raw rows, and
    every Window node sits strictly above the value-collapsing
    HashAggregate pair in the physical plan."""
    import re

    plan = _plan(spark, sf_dir, "events_value_p95_by_type")
    assert "row_number" not in plan.lower()
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    win_ids = [int(m) for m in re.findall(r"\((\d+)\) Window", plan)]
    assert agg_ids and win_ids
    # node ids are topological (children first): aggregates feed windows
    assert max(agg_ids) < min(win_ids)


def test_int8_quantization_no_shuffle(spark, sf_dir):
    """The codec is a narrow map: no exchange anywhere in the plan."""
    plan = _plan(spark, sf_dir, "emb_int8_quantization")
    assert "Exchange" not in plan


def test_curation_funnel_single_agg_no_window(spark, sf_dir):
    """The r5 funnel derives stages 1-4 from ONE aggregate over the
    cached base and stage 5 from a count of dropped ids — the r4
    keep-one WINDOW (and its per-stage lineage re-scans) must stay
    gone, or the regex-heavy lang-ID lineage re-materializes per
    stage."""
    plan = _plan(spark, sf_dir, "docs_curation_funnel")
    assert "Window" not in plan
    assert "InMemoryTableScan" in plan  # stage counts read the cache


def test_lsh_verify_decimal_only_after_prefilter(spark, sf_dir):
    """The strict sign-LSH verify defers decimal math to prefilter
    survivors: no CheckOverflow/decimal expression may appear in the
    per-row projections BEFORE the candidate join (the old shape ran a
    BigDecimal fold per corpus row). Heuristic: the plan's decimal
    casts must all sit above the join — i.e. strictly fewer decimal
    mentions than joins+rows would imply; concretely the scan-side
    projections contain no 'decimal(30,18)'."""
    plan = _plan(spark, sf_dir, "emb_near_dup_lsh_strict")
    # formatted explain lists numbered nodes; find the first join node
    # and assert no decimal cast occurs in any Project BEFORE it.
    lines = plan.splitlines()
    first_join = next(
        i for i, l in enumerate(lines) if "Join" in l or "join" in l
    )
    pre_join = "\n".join(lines[:first_join])
    assert "decimal(30,18)" not in pre_join


def test_signup_conversion_is_hash_join(spark, sf_dir):
    """The time-bounded funnel's range predicates ride an equi hash
    join on user_id — never a nested-loop over event pairs."""
    plan = _plan(spark, sf_dir, "events_signup_to_purchase_1h")
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # broadcast locally, shuffled at scale


def test_rare_token_ratio_no_cartesian(spark, sf_dir):
    """Inverted-index topology: the document-frequency join keys on
    token; nothing corpus-squared appears in the plan."""
    plan = _plan(spark, sf_dir, "docs_rare_token_ratio")
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_new_vs_returning_single_user_shuffle_family(spark, sf_dir):
    """Growth accounting joins two user-keyed aggregates — hash join,
    no nested loop, and the day rollup is partial-aggregated."""
    plan = _plan(spark, sf_dir, "events_daily_new_vs_returning")
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x2 stages


def test_source_overlap_no_shingle_self_join(spark, sf_dir):
    """The source-overlap matrix must unfold pairs from per-shingle
    source SETS — a shingle-keyed self-join would explode C(n,2) rows
    per OCCURRENCE of a stop-shingle. Asserted: no sort-merge join at
    all, and the only joins are the broadcast size lookups."""
    import re

    plan = _plan(spark, sf_dir, "docs_source_shingle_overlap")
    assert "SortMergeJoin" not in plan
    # numbered detail nodes only (the tree section double-counts)
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) <= 2


def test_pareto_windows_are_bucket_partitioned(spark, sf_dir):
    """The two-phase prefix sum must never run an unpartitioned window
    over the per-customer relation: every Window node's spec either
    partitions by the bucket column (the per-customer rank/cumsum) or
    consumes the ~1001-row bucket aggregate (which sits strictly above
    the bucket-collapsing HashAggregate in the plan)."""
    import re

    plan = _plan(spark, sf_dir, "orders_pareto_concentration")
    specs = re.findall(r"\(\d+\) Window\n(?:.*\n)*?Arguments: .*", plan)
    win_args = [
        m for m in re.findall(r"\(\d+\) Window\s*\n[^(]*", plan)
    ]
    assert win_args, "expected Window nodes in the Pareto plan"
    for block in win_args:
        assert "bucket" in block, block


def test_shingle_explode_not_inferred_below_exchange(spark, sf_dir):
    """Regression guard for the InferFiltersFromGenerate trap (r7): the
    heavy gram expression must never appear in a Filter BELOW the
    spread_scan Exchange — explode_outer + post-explode null filter
    keeps the inferred predicate out. Asserted on the raw shingle
    relation: the scan-side Filter (if any) must not contain the
    normalize/split expression."""
    from lakehouse_architecture_spark.operators.minhash import shingles
    from lakehouse_architecture_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = shingles(docs, "text", "doc_id")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    import re

    exchange_ids = [int(m) for m in re.findall(r"\((\d+)\) Exchange", plan)]
    assert exchange_ids, "spread_scan repartition expected on 1-file scans"
    # any Filter below the exchange (higher node id = deeper) must not
    # inline the tokenization expression
    for m in re.finditer(r"\((\d+)\) Filter\n(?:Input[^\n]*\n)?Condition : ([^\n]*)", plan):
        node_id, cond = int(m.group(1)), m.group(2)
        if node_id > min(exchange_ids):
            assert "regexp_replace" not in cond, (
                "gram expression leaked below the repartition:\n" + cond
            )


def test_session_percentiles_window_over_session_aggregate(spark, sf_dir):
    """The percentile windows must rank the session-length frequency
    aggregate, not raw sessions (bounded by distinct lengths)."""
    import re

    plan = _plan(spark, sf_dir, "events_session_length_percentiles")
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    win_ids = [int(m) for m in re.findall(r"\((\d+)\) Window", plan)]
    assert agg_ids and len(win_ids) >= 2
    # topological ids (children first): the sessionization window is the
    # deepest window, the percentile windows the shallowest — the
    # session/frequency aggregates must sit BETWEEN them, i.e. the
    # percentile window consumes an aggregate, never raw sessions
    assert any(min(win_ids) < a < max(win_ids) for a in agg_ids), (
        win_ids,
        agg_ids,
    )

def test_bucketed_join_has_no_shuffle_exchange(spark, sf_dir):
    """Both sides bucketed on the join key => the custkey sort-merge
    join plans WITHOUT any shuffle Exchange (the point of the bucketed
    layout); the plain parquet control of the SAME join re-hashes both
    sides. The merge hint pins the join strategy — at demo scale the
    planner would otherwise broadcast the dimension, which hides the
    layout property under test."""
    from lakehouse_architecture_spark.queries.catalog_sql import (
        bucketed_pair,
    )
    from lakehouse_architecture_spark.sources.tables import load_table

    orders, customer = bucketed_pair(spark, sf_dir)
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    simple = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    join = orders.hint("merge").join(
        customer, orders.o_custkey == customer.c_custkey
    )
    plan = join._jdf.queryExecution().explainString(simple)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in join._jdf.queryExecution().explainString(fmt)

    po = load_table(spark, sf_dir, "orders")
    pc = load_table(spark, sf_dir, "customer")
    control = po.hint("merge").join(pc, po.o_custkey == pc.c_custkey)
    cplan = control._jdf.queryExecution().explainString(simple)
    assert "Exchange hashpartitioning" in cplan


def test_bloom_prefilter_fact_side_is_shuffle_free(spark, sf_dir):
    """The literal-array Bloom probe must evaluate at scan time: the
    pruned fact relation's plan is scan + filter only — no Exchange,
    no join, no explode anywhere on the fact side."""
    from lakehouse_architecture_spark.operators.bloom import bloom_prefilter
    from lakehouse_architecture_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter("o_orderpriority = '1-URGENT'")
        .select("o_orderkey")
    )
    pruned = bloom_prefilter(li, "l_orderkey", dim, "o_orderkey")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = pruned._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Generate" not in plan  # no explode on the probed side
    assert "Filter" in plan


def test_shared_span_pairs_posting_join_shape(spark, sf_dir):
    """The ExactSubstr pair query must stay a DF-capped POSTING-LIST
    equi-join on span — never a cartesian/nested-loop product (the
    doc_a < doc_b condition is a post-join filter on an equi-key
    join), and the span relation must be built via explode_outer so
    InferFiltersFromGenerate can't inline the window expression below
    an exchange (the r7 shingle trap)."""
    plan = _plan(spark, sf_dir, "docs_shared_span_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the documents scan reads only what the spans need
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" in read_schema
    assert "lang" not in read_schema


def test_copied_span_profile_no_self_join(spark, sf_dir):
    """The per-doc copied-ratio profile is aggregates only — exactly
    one (span-grain) join, no pair self-join, no cartesian: it must
    stay strictly cheaper than the pair view so it can run
    corpus-wide first."""
    plan = _plan(spark, sf_dir, "docs_copied_span_profile")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hindex_round_pins_shuffle_hash_no_broadcast_of_adj(spark):
    """The core-numbers round join must SHUFFLE-HASH with the
    node-values side as build — the r12 sf0.1 probe showed AQE
    broadcasting the 2|E|-row adjacency side (lineage-truncated loop
    relations carry no compile-time stats), OOMing the driver. The
    hint must survive in the compiled plan."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.operators.kcore import _hindex_round

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    adj = edges.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).unionAll(
        edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    )
    cur = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("c"))
    plan = _hindex_round(adj, cur)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    # the H-index is a window + aggregate, never a collect_list
    assert "collect_list" not in plan

    # the r13 fast path: with the node-values side explicitly
    # broadcast and the adjacency node-partitioned + PERSISTED (a
    # localCheckpoint would report unknown partitioning and force the
    # window to re-exchange 2|E| rows every sweep — observed), the
    # sweep must never exchange the adjacency: join, window, and
    # aggregate all run on the preserved partitioning.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj_p = adj.repartition(n_part, "node").persist()
    try:
        adj_p.count()
        bc = _hindex_round(adj_p, cur, broadcast_values=True)
        bplan = bc._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in bplan
        assert "ShuffledHashJoin" not in bplan
        # the window + aggregate above the join must reuse the
        # cached partitioning: no exchange between the join and the
        # plan root (exchanges below the join — the values-side
        # groupBy, the cached plan's own repartition — are fine)
        above_join = bplan.split("BroadcastHashJoin")[0]
        assert "Exchange hashpartitioning" not in above_join, bplan
    finally:
        adj_p.unpersist(blocking=False)


def test_fuzzy_d2_join_is_sort_merge(spark, sf_dir):
    """The d2 variant self-join must stay sort-merge (the pinned merge
    hint): an AQE broadcast of the multi-million-row variant relation
    OOMed at bench SF, and SMJ is the only shape that survives scale."""
    plan = _plan(spark, sf_dir, "customers_fuzzy_pairs_d2")
    assert "SortMergeJoin" in plan


def test_components_propagation_exchange_free(spark):
    """The r13 label-propagation shape: with the symmetric edge
    relation b-partitioned + persisted and labels broadcast, the
    per-round min-label aggregate must reuse the cached partitioning —
    BroadcastHashJoin, and no exchange between the join and the
    aggregate above it."""
    from pyspark.sql import functions as F

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a long, b long"
    )
    sym = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(n_part, "b")
        .persist()
    )
    try:
        sym.count()
        labels = (
            sym.select(F.col("a").alias("doc"))
            .distinct()
            .withColumn("comp", F.col("doc"))
            .localCheckpoint(eager=True)
        )
        prop_min = (
            sym.join(F.broadcast(labels.withColumnRenamed("doc", "a")), "a")
            .select(F.col("b").alias("doc"), "comp")
            .groupBy("doc")
            .agg(F.min("comp").alias("pcomp"))
        )
        plan = prop_min._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        above_join = plan.split("BroadcastHashJoin")[0]
        assert "Exchange hashpartitioning" not in above_join, plan
    finally:
        sym.unpersist(blocking=False)
