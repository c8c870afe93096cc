"""Semantics checks that the oracle can't express: approximate-aggregate
accuracy vs exact, and as-of join ordering edge (same-timestamp click
counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_spark.queries.advanced import (
    approx_distinct_and_quantile,
    asof_join_purchase_click,
)
from lakehouse_architecture_spark.sources.tables import load_table


def test_approx_aggregates_close_to_exact(spark, sf_dir):
    """The query now carries its own QA: exact twins plus tolerance-band
    booleans. Verify the exact columns against an independent aggregate
    and that every band boolean holds."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.n, r.med)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("med"),
        )
        .collect()
    }
    rows = approx_distinct_and_quantile(spark, sf_dir).collect()
    assert len(rows) == len(exact)
    for r in rows:
        n, med = exact[r.l_returnflag]
        assert r.exact_orders == n
        assert r.exact_median == med
        assert r.approx_orders_ok and r.approx_median_ok


def test_exact_quantile_anchors_have_no_percentile_buffer(spark, sf_dir):
    """r16 doctrine pin: the exact-median/quantile anchors must NOT go
    through the Percentile aggregate (one per-group value→count map in
    a single aggregation buffer — memory bounded by distinct values,
    an executor-OOM shape at 100×). The optimized plans may contain
    percentile_approx (a bounded sketch) but never plain percentile."""
    from lakehouse_architecture_spark.queries.advanced import quantiles_exact

    for fn in (approx_distinct_and_quantile, quantiles_exact):
        plan = fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        # 'percentile(' matches the exact aggregate only —
        # percentile_approx( continues with '_', not '('
        assert "percentile(" not in plan, fn.__name__


def test_grouped_interpolated_quantiles_matches_percentile(spark):
    """Value identity of the bucketed interpolated-quantile operator vs
    F.percentile on a corpus with ties, odd/even group sizes, a
    single-row group, null values (dropped), and a null group key
    (kept)."""
    from lakehouse_architecture_spark.operators.quantiles import (
        grouped_interpolated_quantiles,
    )

    rows = []
    # group a: 101 near-unique values (odd n, exercises many buckets)
    rows += [("a", float((i * 37) % 101)) for i in range(101)]
    # group b: even n with heavy ties
    rows += [("b", float(v)) for v in [1, 1, 2, 2, 3, 3, 9, 9]]
    # group c: a single row; group d: only a null value (drops out)
    rows += [("c", 42.0), ("d", None)]
    # null group key: legitimate group
    rows += [(None, float(v)) for v in [5, 6, 7]]
    df = spark.createDataFrame(rows, "grp string, v double").repartition(8)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    got = {
        (r.grp, r.q): r.q_value
        for r in grouped_interpolated_quantiles(
            df, ["grp"], "v", qs, n_buckets=7
        ).collect()
    }
    want = {}
    for r in (
        df.filter(F.col("v").isNotNull())
        .groupBy("grp")
        .agg(*[
            F.percentile("v", F.lit(q)).alias(f"p{i}")
            for i, q in enumerate(qs)
        ])
        .collect()
    ):
        for i, q in enumerate(qs):
            want[(r.grp, q)] = r[f"p{i}"]
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert ("d", 0.5) not in got  # all-null group has no order statistic


def test_asof_join_same_ts_click_counts(spark, sf_dir):
    out = asof_join_purchase_click(spark, sf_dir)
    rows = out.collect()
    assert all(
        r.asof_click_ms is None or r.asof_click_ms <= r.purchase_ms
        for r in rows
    )
    # purchases with no prior click yield null asof (left-join semantics)
    assert {r.asof_click_ms is None for r in rows} <= {True, False}


def test_hll_sketch_estimates_close_to_exact(spark, sf_dir):
    """The accuracy-QA companion must find every HLL estimate within 5%
    of exact (per day and for the merged total), and the production
    rollup itself must emit one row per day plus the NULL-day total."""
    from lakehouse_architecture_spark.queries.events import (
        events_hll_accuracy_qa,
        events_hll_sketch_rollup,
    )

    qa = events_hll_accuracy_qa(spark, sf_dir).collect()
    assert any(r.day is None for r in qa)  # merged-total row present
    assert all(r.est_within_5pct for r in qa)

    rollup = events_hll_sketch_rollup(spark, sf_dir).collect()
    assert len(rollup) == len(qa)
    assert all(r.est_in_count_band for r in rollup)
    assert all(r.n_events > 0 for r in rollup)

    from lakehouse_architecture_spark.queries.events import _hll_daily_rollup

    lib = _hll_daily_rollup(spark, sf_dir).collect()
    assert all(r.est_users > 0 for r in lib)  # raw-estimate library path


def test_chunk_manifest_invariants(spark, sf_dir):
    """Coverage and overlap invariants of the sliding-window chunker:
    chunks tile each doc exactly (first starts at 1, last ends at
    n_tokens, consecutive starts advance by the stride), every
    non-final chunk is the full budget, and every doc chunks."""
    from collections import defaultdict

    from lakehouse_architecture_spark.queries.text import (
        _CHUNK_STRIDE,
        _CHUNK_TOKENS,
        docs_chunk_manifest,
    )
    from lakehouse_architecture_spark.sources.tables import load_table

    rows = docs_chunk_manifest(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert len(by_doc) == n_docs  # every doc yields >= 1 chunk
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = chunks[0].n_tokens
        assert chunks[0].start_tok == 1
        assert chunks[-1].end_tok == n
        for i, c in enumerate(chunks):
            assert c.start_tok == i * _CHUNK_STRIDE + 1
            assert c.n_chunk_tokens == c.end_tok - c.start_tok + 1 or n == 0
            if i < len(chunks) - 1:
                assert c.n_chunk_tokens == _CHUNK_TOKENS


def test_session_day_segments_edges(spark):
    """Hand-verified edge cases of the sweep-line segment builder
    (queries/events._session_day_segments): a session crossing
    midnight splits into per-day clipped segments; a single-event
    session is a zero-length interval; endpoints are inclusive ms."""
    from lakehouse_architecture_spark.queries.events import (
        _session_day_segments,
    )

    rows = [
        # user 1: one session 23:50 -> 00:10 next day (two events,
        # 20-min gap < 30-min session gap) — must split into 2 days
        (1, 1, "2025-03-01 23:50:00"),
        (2, 1, "2025-03-02 00:10:00"),
        # user 2: a single event — zero-length session
        (3, 2, "2025-03-01 12:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string"
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))
    seg = {
        (str(r.day), r.seg_s, r.seg_e)
        for r in _session_day_segments(ev).collect()
    }
    ms = lambda s: int(
        spark.sql(f"SELECT unix_millis(timestamp'{s}')").collect()[0][0]
    )
    d1_end = ms("2025-03-01 00:00:00") + 86399999
    d2_start = ms("2025-03-02 00:00:00")
    assert ("2025-03-01", ms("2025-03-01 23:50:00"), d1_end) in seg
    assert ("2025-03-02", d2_start, ms("2025-03-02 00:10:00")) in seg
    assert (
        "2025-03-01",
        ms("2025-03-01 12:00:00"),
        ms("2025-03-01 12:00:00"),
    ) in seg
    assert len(seg) == 3


def test_overlap_pair_sweep_identity_hand_case(spark, tmp_path):
    """The sweep identity pairs(t) = S_t*A_t + C(S_t,2) against a
    hand-enumerated interval set, including the tie cases the oracle
    proves at corpus scale: simultaneous starts, an end touching a
    start (inclusive ends -> overlap), and a zero-length session."""
    import pandas as pd

    from lakehouse_architecture_spark.queries.events import (
        events_session_overlap_pairs,
    )

    base = "2025-03-01 "
    rows = []
    eid = 0

    def sess(uid, *times):
        nonlocal eid
        for t in times:
            nonlocal rows
            eid += 1
            rows.append((eid, uid, base + t, "click", 1.0, "{}"))

    # u1: [10:00, 11:00]; u2: [10:30, 12:00]; u3: [11:00, 11:10]
    # (starts exactly when u1 ends -> overlaps u1 AND u2);
    # u4: zero-length at 10:30 (overlaps u1 and u2's start instant)
    sess(1, "10:00:00", "10:20:00", "10:40:00", "11:00:00")
    sess(2, "10:30:00", "11:00:00", "11:30:00", "12:00:00")
    sess(3, "11:00:00", "11:10:00")
    sess(4, "10:30:00")
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "user_id", "ts_s", "event_type", "value", "props"],
    )
    p = str(tmp_path / "events.parquet")
    sdf = spark.createDataFrame(pdf).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    sdf.write.parquet(p)
    # hand count: pairs = {u1,u2}, {u1,u3}, {u2,u3}, {u1,u4}, {u2,u4} = 5
    (tmp_path / "x").mkdir()
    import shutil

    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    shutil.move(p, sf + "/events.parquet")
    out = events_session_overlap_pairs(spark, sf).collect()
    assert len(out) == 1
    assert out[0].n_overlap_pairs == 5 and out[0].n_segments == 4


def test_bpe_encode_stats_keeps_empty_sources(spark, tmp_path):
    """The r14 ADVICE contract, pinned: the dictionary-encode rewrite
    joins on exploded words, so zero-token documents (and whole
    sources of them) vanished from the per-source rollup. The left
    join back onto the document spine must keep them as
    (0, 0, true) rows — a source whose docs are all empty/whitespace
    still appears."""
    import pandas as pd

    from lakehouse_architecture_spark.queries.text import (
        docs_bpe_encode_stats,
    )

    pdf = pd.DataFrame(
        [
            (1, "the cat sat on the mat", "en", "normal", 22),
            (2, "the mat sat on the cat", "en", "normal", 22),
            (3, "", "en", "empty_src", 0),
            (4, "   ", "en", "empty_src", 3),
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    spark.createDataFrame(pdf).write.parquet(sf + "/documents.parquet")
    rows = {r.source: r for r in docs_bpe_encode_stats(spark, sf).collect()}
    assert set(rows) == {"normal", "empty_src"}
    e = rows["empty_src"]
    assert (e.n_words, e.n_chars, bool(e.tokens_within_bounds)) == (
        0,
        0,
        True,
    )
    n = rows["normal"]
    assert n.n_words == 12 and n.n_chars == 34
    assert bool(n.tokens_within_bounds) and bool(n.sample_matches_reference)


def test_asof_forward_tolerance_boundaries(spark, tmp_path):
    """Boundary semantics of the forward as-of: a click at the exact
    purchase instant is NOT 'strictly after'; a click at exactly +1h
    is inside the tolerance (<=); the first admissible click wins even
    with later ones present; no-click users emit null."""
    import pandas as pd

    from lakehouse_architecture_spark.queries.advanced import (
        asof_join_forward_tolerance,
    )

    base = "2025-03-01 "
    rows = []
    eid = 0

    def ev(uid, t, typ):
        nonlocal eid
        eid += 1
        rows.append((eid, uid, base + t, typ, 1.0, "{}"))
        return eid

    p1 = ev(1, "10:00:00", "purchase")
    ev(1, "10:00:00", "click")      # same instant: excluded
    ev(1, "10:30:00", "click")      # first strictly-after: the answer
    ev(1, "10:45:00", "click")      # later: ignored
    p2 = ev(2, "10:00:00", "purchase")
    ev(2, "11:00:00", "click")      # exactly +1h: included (<=)
    p3 = ev(3, "10:00:00", "purchase")
    ev(3, "11:00:01", "click")      # 1h + 1s: outside -> null
    p4 = ev(4, "10:00:00", "purchase")  # no clicks at all -> null
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "user_id", "ts_s", "event_type", "value", "props"],
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    spark.createDataFrame(pdf).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.parquet(sf + "/events.parquet")
    got = {
        r.event_id: r.next_click_ms
        for r in asof_join_forward_tolerance(spark, sf).collect()
    }
    assert set(got) == {p1, p2, p3, p4}
    from datetime import datetime, timezone

    def ms(t):
        return int(
            datetime.fromisoformat(base + t)
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1000
        )

    assert got[p1] == ms("10:30:00")
    assert got[p2] == ms("11:00:00")
    assert got[p3] is None
    assert got[p4] is None


def test_vq_rollup_grain_path_matches_two_scan_path(spark, sf_dir, monkeypatch):
    """The r16 size-adaptive dispatch in the quantile rollups: the
    at-scale single-scan (day[, type], vc)-grain branch must emit
    EXACTLY the rows of the local two-scan branch (bucket = f(vc) and
    integer counts re-sum exactly, so both are the same relation by
    construction — this pins it). Local data sits far below the
    crossover, so the grain branch is forced by dropping the threshold."""
    import lakehouse_architecture_spark.queries.events as events_mod

    for fn in (
        events_mod.events_value_quantile_rollup,
        events_mod.events_value_quantile_rollup_by_type,
    ):
        small = sorted(map(str, fn(spark, sf_dir).collect()))
        monkeypatch.setattr(events_mod, "_VQ_GRAIN_SCAN_BYTES", -1)
        big = sorted(map(str, fn(spark, sf_dir).collect()))
        monkeypatch.undo()
        assert small == big, f"{fn.__name__}: grain path diverged"
        assert small, f"{fn.__name__}: degenerate empty result"
