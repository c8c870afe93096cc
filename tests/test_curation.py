"""Curation operator tests: connected components find planted chains,
dedup keeps one representative, packing respects budgets."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.components import (
    connected_components,
    dedup_keep_one_per_component,
)
from lakehouse_architecture_spark.operators.packing import (
    pack_greedy,
    pack_stats,
)


def test_components_merge_chains(spark):
    # 1-2, 2-3 (one chain), 5-6 (a pair), 9 isolated (no edges)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    labels = {r.doc: r.comp for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_components_long_chain_converges(spark):
    # a 12-node path: needs several propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    labels = {r.doc: r.comp for r in connected_components(edges).collect()}
    assert set(labels.values()) == {0} and len(labels) == 13


def test_dedup_keeps_one_per_component(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(7)], "doc_id long, text string"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    labels = connected_components(edges)
    kept = sorted(
        r.doc_id
        for r in dedup_keep_one_per_component(docs, labels, "doc_id").collect()
    )
    # representatives 1 and 5 survive; singletons 0 and 4 untouched
    assert kept == [0, 1, 4, 5]


def test_dedup_keep_best_elects_highest_score(spark):
    """Keep-best keeps the highest-score member per component (ties:
    lowest id) and leaves singletons untouched."""
    from lakehouse_architecture_spark.operators.components import (
        dedup_keep_best_per_component,
    )

    # component {1,2,3}: doc 2 longest; component {5,6}: tie -> keep 5;
    # singletons 0 and 4 kept regardless of score
    docs = spark.createDataFrame(
        [(0, 1), (1, 10), (2, 99), (3, 50), (4, 2), (5, 7), (6, 7)],
        "doc_id long, n_chars long",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    labels = connected_components(edges)
    kept = sorted(
        r.doc_id
        for r in dedup_keep_best_per_component(
            docs, labels, "doc_id", "n_chars"
        ).collect()
    )
    assert kept == [0, 2, 4, 5]


def test_pack_greedy_budget_and_order(spark):
    rows = [(i, 0, 100) for i in range(10)]  # 10 docs x 100 tokens, 1 shard
    df = spark.createDataFrame(rows, "doc_id long, shard int, n_tokens long")
    packed = pack_greedy(df, "n_tokens", "doc_id", "shard", 300)
    by_doc = {r.doc_id: r.pack_id for r in packed.collect()}
    # 300-token budget -> 3 docs per bin, assigned in doc_id order
    assert by_doc == {i: i // 3 for i in range(10)}
    stats = pack_stats(packed, "n_tokens", "shard").collect()
    assert all(r.bin_tokens <= 300 for r in stats)


def test_pack_oversized_doc_advances_offset(spark):
    df = spark.createDataFrame(
        [(1, 0, 50), (2, 0, 900), (3, 0, 50)],
        "doc_id long, shard int, n_tokens long",
    )
    packed = {r.doc_id: r.pack_id for r in pack_greedy(
        df, "n_tokens", "doc_id", "shard", 100
    ).collect()}
    # doc 2 starts in bin 0 (offset 50) and overflows it; its 900 tokens
    # advance the running offset so doc 3 lands 9 bins later, never in
    # an already-overfull bin
    assert packed[1] == 0 and packed[2] == 0 and packed[3] == 9


def test_pack_shards_are_independent(spark):
    df = spark.createDataFrame(
        [(1, 0, 80), (2, 1, 80), (3, 0, 80), (4, 1, 80)],
        "doc_id long, shard int, n_tokens long",
    )
    packed = pack_greedy(df, "n_tokens", "doc_id", "shard", 80)
    per_shard = {
        (r.shard, r.doc_id): r.pack_id for r in packed.collect()
    }
    # each shard restarts its own running sum
    assert per_shard[(0, 1)] == 0 and per_shard[(1, 2)] == 0
    assert per_shard[(0, 3)] == 1 and per_shard[(1, 4)] == 1


def test_pii_scrub_planted(spark):
    from lakehouse_architecture_spark.queries.curation import EMAIL_RE, PHONE_RE

    df = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob.smith+x@mail.co.uk now"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    text = F.col("text")
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    out = {
        r.doc_id: (r.n_emails, r.n_phones, r.s)
        for r in df.select(
            "doc_id",
            F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).alias("n_emails"),
            F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)).alias("n_phones"),
            scrubbed.alias("s"),
        ).collect()
    }
    assert out[1][0] == 2 and "<EMAIL>" in out[1][2] and "alice" not in out[1][2]
    assert out[2][1] == 1 and "<PHONE>" in out[2][2] and "555" not in out[2][2]
    assert out[3] == (0, 0, "no pii here at all")
