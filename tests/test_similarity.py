"""MinHash/SimHash/LSH operator tests: planted near-duplicates are found,
LSH recall vs brute force is sane, hyperplanes are deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators.minhash import (
    df_capped_shingles,
    minhash_lsh_dedupe,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
)
from lakehouse_architecture_spark.operators.similarity import (
    hyperplanes,
    knn_bruteforce,
    knn_lsh,
)
from lakehouse_architecture_spark.operators.simhash import (
    simhash_fingerprints,
    simhash_near_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm", "cold")  # one token changed -> high jaccard
FAR = (
    "completely different content about spark query engines and columnar "
    "storage formats with no overlap whatsoever in any shingle at all here"
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)],  # 4 = exact dup of 1
        "doc_id long, text string",
    )


def test_shingles_and_signatures(spark, docs):
    sh = shingles(docs, "text", "doc_id")
    assert sh.filter("doc = 3").count() > 10
    sigs = minhash_signatures(sh, 4)
    rows = {r.doc: (r.sig_0, r.sig_1, r.sig_2, r.sig_3) for r in sigs.collect()}
    assert rows[1] == rows[4]          # identical docs -> identical sigs
    assert rows[1] != rows[3]          # disjoint docs -> different sigs


def test_minhash_lsh_finds_planted_dups(spark, docs):
    pairs = minhash_lsh_dedupe(docs, "text", "doc_id", threshold=0.5)
    found = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}
    assert found[(1, 4)] == 1.0
    assert (1, 2) in found and found[(1, 2)] > 0.5
    assert all(3 not in p for p in found)


def test_simhash_identical_and_near(spark, docs):
    fp = {r.doc: r.simhash for r in
          simhash_fingerprints(docs, "text", "doc_id").collect()}
    assert fp[1] == fp[4]
    assert 0 <= fp[1] < (1 << 16)
    pairs = simhash_near_pairs(docs, "text", "doc_id", max_hamming=0)
    assert (1, 4) in {(r.doc_a, r.doc_b) for r in pairs.collect()}


def test_hyperplanes_deterministic():
    assert hyperplanes(3, 8) == hyperplanes(3, 8)


def test_array_signatures_match_agg_signatures(spark, docs):
    """Map-side array_min signatures must be bit-identical to the
    groupBy-MIN form (same md5 seed family — the oracle's family)."""
    from lakehouse_architecture_spark.operators.minhash import (
        gram_arrays,
        minhash_signatures_from_grams,
    )

    agg = {
        r.doc: (r.sig_0, r.sig_1, r.sig_2, r.sig_3)
        for r in minhash_signatures(shingles(docs, "text", "doc_id"), 4).collect()
    }
    arr = {
        r.doc: (r.sig_0, r.sig_1, r.sig_2, r.sig_3)
        for r in minhash_signatures_from_grams(
            gram_arrays(docs, "text", "doc_id"), 4
        ).collect()
    }
    assert agg == arr


def test_df_cap_noop_above_max_frequency(spark, docs):
    """A cap above the corpus's max shingle DF changes no pair."""
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", 0.3).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", 0.3, max_doc_freq=100
        ).collect()
    }
    assert uncapped == capped and (1, 4) in capped


def test_df_cap_drops_stop_shingles(spark, docs):
    """Cap=1 keeps only shingles unique to a single doc: the shared
    BASE shingles (df>=2 via docs 1 and 4) must all disappear."""
    sh = shingles(docs, "text", "doc_id")
    capped = df_capped_shingles(sh, 1)
    assert capped.count() < sh.count()
    # docs 1 and 4 are identical -> every one of their shingles has
    # df >= 2 -> both docs vanish entirely under cap=1
    assert capped.filter(F.col("doc").isin(1, 4)).count() == 0
    # doc 3 is unique content -> its shingles survive
    assert capped.filter("doc = 3").count() > 10


def test_hyperplane_components_in_range():
    flat = [x for p in hyperplanes(4, 16) for x in p]
    assert all(-1.0 <= x < 1.0 for x in flat)
    assert len(set(flat)) > 50  # not degenerate


def test_knn_lsh_recall_vs_bruteforce(spark, sf_dir):
    from lakehouse_architecture_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3)
    exact = knn_bruteforce(emb, qs, k=5)
    approx = knn_lsh(emb, qs, dim=64, k=5, num_planes=3)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    # coarse buckets (3 planes) must recover a reasonable share of the
    # true top-5; exact recall depends on data, require > 25%
    assert len(e & a) / len(e) > 0.25
    # approximate results are real neighbors with correct scores
    sims = [r.cosine_sim for r in approx.collect()]
    assert all(-1.0001 <= s <= 1.0001 for s in sims)


def test_ivf_index_build_and_search(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.operators.similarity import (
        ivf_build_index,
        ivf_search_index,
        knn_bruteforce,
    )
    from lakehouse_architecture_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_build_index(spark, emb, path, n_centroids=8)

    # the layout is the index: one directory per inverted list
    import os

    dirs = [d for d in os.listdir(f"{path}/lists") if d.startswith("centroid_id=")]
    assert len(dirs) == 8

    qs = emb.filter(F.col("vec_id") < 3)
    exact = {(r.query_id, r.vec_id) for r in knn_bruteforce(emb, qs, k=5).collect()}
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_search_index(spark, path, qs, n_probe=4, k=5).collect()
    }
    assert len(exact & approx) / len(exact) > 0.4

    # pruning is real: the scan must list only the probed directories
    probed = ivf_search_index(spark, path, qs, n_probe=2, k=5)
    assert probed.count() > 0


def test_knn_pandas_matches_jvm(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.operators.similarity import (
        knn_bruteforce,
        knn_bruteforce_pandas,
    )
    from lakehouse_architecture_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3)
    jvm = {(r.query_id, r.vec_id) for r in knn_bruteforce(emb, qs, k=5).collect()}
    arrow = {
        (r.query_id, r.vec_id)
        for r in knn_bruteforce_pandas(emb, qs, k=5).collect()
    }
    assert jvm == arrow


def test_kmeans_refine_improves_quantization(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakehouse_architecture_spark.functions.vectors import cosine
    from lakehouse_architecture_spark.operators.similarity import (
        ivf_assign,
        kmeans_refine,
        sample_centroids,
    )
    from lakehouse_architecture_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    def mean_sim(cents):
        assigned = ivf_assign(emb, cents)
        joined = assigned.join(F.broadcast(cents), "centroid_id")
        return joined.agg(
            F.avg(cosine(F.col("embedding"), F.col("centroid_vec")))
        ).collect()[0][0]

    seed = sample_centroids(emb, 8).cache()
    refined = kmeans_refine(emb, seed, n_iter=2).cache()
    assert refined.count() == 8
    # Lloyd iterations must not worsen the mean member->centroid cosine
    assert mean_sim(refined) >= mean_sim(seed) - 1e-9


def test_sign_lsh_strict_prunes_and_recalls_planted_dups(spark):
    """The 8x8 strict sign-LSH config must (a) keep planted high-cosine
    pairs as candidates and (b) prune random near-orthogonal pairs to a
    small fraction of n^2 — the measurable form of the sub-quadratic
    claim (emb_lsh_candidate_stats reports the same ratio at bench SF).
    """
    import random

    from lakehouse_architecture_spark.operators.similarity import (
        sign_lsh_candidates,
    )

    rng = random.Random(7)
    rows = []
    for vid in range(60):
        rows.append((vid, [rng.gauss(0.0, 1.0) for _ in range(64)]))
    # 5 planted near-dup partners of vectors 0..4: tiny perturbation
    # keeps every sign bit with overwhelming probability -> cos ~ 1.
    for k in range(5):
        base = rows[k][1]
        rows.append(
            (1000 + k, [x * (1.0 + 0.001 * rng.random()) for x in base])
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cands = {
        (r.id_a, r.id_b)
        for r in sign_lsh_candidates(emb, n_bands=8, band_bits=8).collect()
    }
    for k in range(5):
        assert (k, 1000 + k) in cands, f"planted pair {k} lost"
    n = 65
    assert len(cands) / (n * (n - 1) / 2) < 0.25


def test_blocked_near_dup_candidates_small_corpus(spark):
    """More blocks than vectors: empty sides and diagonal blocks must
    not crash or emit self/duplicate pairs."""
    from lakehouse_architecture_spark.operators.similarity import (
        near_dup_candidates_blocked,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),      # dup of 0
            (2, [0.0, 1.0]),      # orthogonal
            (35, [1.0, 0.001]),   # near-dup of 0/1, lands in block 35%16=3
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in near_dup_candidates_blocked(emb, threshold=0.9).collect()
    }
    assert pairs == {(0, 1), (0, 35), (1, 35)}


def test_blocked_near_dup_candidates_group_col(spark):
    """group_col (r16, the SemDeDup per-cluster search): candidates are
    exactly the within-group subset of the ungrouped result — pairs of
    the same cluster survive, cross-cluster pairs are never scored —
    and no pair is emitted twice even when blocks split a group."""
    from lakehouse_architecture_spark.operators.similarity import (
        near_dup_candidates_blocked,
    )

    # Two clusters of mutual near-dups; every cross-cluster cosine is
    # also high (all vectors near [1, eps]) so the group restriction —
    # not the threshold — must be what drops cross pairs.
    rows = [
        (i, [1.0, 0.001 * i], i % 2) for i in range(10)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cluster int"
    )
    grouped = [
        (r.id_a, r.id_b)
        for r in near_dup_candidates_blocked(
            emb, threshold=0.9, n_blocks=3, group_col="cluster"
        ).collect()
    ]
    assert len(grouped) == len(set(grouped)), "duplicate pair emitted"
    ungrouped = {
        (r.id_a, r.id_b)
        for r in near_dup_candidates_blocked(
            emb, threshold=0.9, n_blocks=3
        ).collect()
    }
    expected = {(a, b) for a, b in ungrouped if a % 2 == b % 2}
    assert set(grouped) == expected
    assert expected, "degenerate test: no within-group pairs"
    assert any(a % 2 != b % 2 for a, b in ungrouped), (
        "degenerate test: no cross-group pairs to exclude"
    )


def test_sign_lsh_bands_rejects_short_vectors(spark):
    """A vector with fewer dims than n_bands*band_bits must raise, not
    silently hash on truncated (constant-zero) key bits."""
    import pytest
    from lakehouse_architecture_spark.operators.similarity import sign_lsh_bands

    bad = spark.createDataFrame(
        [(1, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="sign_lsh_bands: need >= 16"):
        sign_lsh_bands(bad, n_bands=4, band_bits=4).collect()


def test_incremental_dedup_checks_batch_against_corpus_only(spark):
    """The incremental operator must report new-vs-corpus near-dups and
    NEVER pair new docs with each other or corpus docs with each other
    — that's the symmetric operator's job."""
    from lakehouse_architecture_spark.operators.minhash import (
        minhash_lsh_incremental,
    )

    corpus = spark.createDataFrame(
        [(1, BASE), (3, FAR)], "doc_id long, text string"
    )
    # 10/11 both duplicate corpus doc 1 AND each other; 12 is novel
    new = spark.createDataFrame(
        [(10, BASE), (11, NEAR), (12, "entirely novel words nobody else uses anywhere at all today")],
        "doc_id long, text string",
    )
    pairs = {
        (r.new_doc, r.corpus_doc): r.jaccard
        for r in minhash_lsh_incremental(
            new, corpus, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert pairs[(10, 1)] == 1.0          # exact dup of corpus doc found
    assert (11, 1) in pairs               # near dup of corpus doc found
    assert all(c in (1, 3) for (_, c) in pairs)   # right side is corpus
    assert all(n >= 10 for (n, _) in pairs)       # left side is the batch
    assert (10, 11) not in pairs and (11, 10) not in pairs  # no new-new
    assert all(n != 12 for (n, _) in pairs)       # novel doc passes clean


def test_indexed_incremental_matches_raw_and_reuses_corpus(spark):
    """The indexed path must (a) produce exactly the raw operator's
    pairs, (b) serve a SECOND batch from the persisted corpus relations
    — the plan reads the in-memory index, it does not re-shingle the
    corpus — and (c) survive a save/load/append round trip."""
    from lakehouse_architecture_spark.operators.minhash import (
        build_minhash_corpus_index,
        minhash_lsh_incremental,
        minhash_lsh_incremental_indexed,
        MinHashCorpusIndex,
    )

    corpus = spark.createDataFrame(
        [(1, BASE), (3, FAR)], "doc_id long, text string"
    )
    batch1 = spark.createDataFrame(
        [(10, BASE), (12, "entirely novel words nobody else uses anywhere")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame([(20, NEAR)], "doc_id long, text string")

    idx = build_minhash_corpus_index(corpus, "text", "doc_id").persist()
    try:
        for batch in (batch1, batch2):
            got = minhash_lsh_incremental_indexed(
                batch, idx, "text", "doc_id", threshold=0.5, max_doc_freq=50
            )
            want = {
                (r.new_doc, r.corpus_doc, r.jaccard)
                for r in minhash_lsh_incremental(
                    batch, corpus, "text", "doc_id",
                    threshold=0.5, max_doc_freq=50,
                ).collect()
            }
            assert {
                (r.new_doc, r.corpus_doc, r.jaccard) for r in got.collect()
            } == want
        # The second batch's plan consumes the persisted corpus relations
        # (InMemoryTableScan), not a re-shingling of the corpus text.
        plan = (
            minhash_lsh_incremental_indexed(
                batch2, idx, "text", "doc_id", threshold=0.5
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "InMemoryTableScan" in plan
    finally:
        idx.unpersist()


def test_corpus_index_save_load_append(spark, tmp_path):
    """save/load round-trips the relations and parameters; append folds
    a batch into the index so a later batch sees its documents."""
    from lakehouse_architecture_spark.operators.minhash import (
        build_minhash_corpus_index,
        minhash_lsh_incremental_indexed,
        MinHashCorpusIndex,
    )

    corpus = spark.createDataFrame(
        [(1, BASE), (3, FAR)], "doc_id long, text string"
    )
    day1 = spark.createDataFrame([(10, BASE)], "doc_id long, text string")
    day2 = spark.createDataFrame([(20, BASE)], "doc_id long, text string")

    path = str(tmp_path / "mh_index")
    build_minhash_corpus_index(corpus, "text", "doc_id").save(path)
    idx = MinHashCorpusIndex.load(spark, path)
    assert (idx.num_hashes, idx.band_size, idx.shingle_n) == (8, 2, 3)

    # day-1 run, then the batch is folded into the index
    idx2 = idx.append(day1, "text", "doc_id")
    # df merge: shingles shared by corpus and batch sum their counts
    base_shingle_df = {
        r.shingle: r.df for r in idx2.shingle_dfs.collect()
    }
    assert all(v >= 1 for v in base_shingle_df.values())

    # day-2 batch now matches BOTH corpus doc 1 and day-1 doc 10
    pairs = {
        (r.new_doc, r.corpus_doc)
        for r in minhash_lsh_incremental_indexed(
            day2, idx2, "text", "doc_id", threshold=0.9
        ).collect()
    }
    assert pairs == {(20, 1), (20, 10)}

    # save() compacts partial df rows (the streaming-append shape):
    # an index whose shingle_dfs carries duplicates round-trips to one
    # fully-aggregated row per shingle with summed counts.
    partial = MinHashCorpusIndex(
        bands=idx.bands,
        grams=idx.grams,
        shingle_dfs=idx.shingle_dfs.unionByName(idx.shingle_dfs),
        num_hashes=idx.num_hashes,
        band_size=idx.band_size,
        shingle_n=idx.shingle_n,
    )
    compacted_path = str(tmp_path / "mh_index_compacted")
    partial.save(compacted_path)
    back = MinHashCorpusIndex.load(spark, compacted_path)
    rows = back.shingle_dfs.collect()
    assert len(rows) == len({r.shingle for r in rows})  # one row/shingle
    orig = {r.shingle: r.df for r in idx.shingle_dfs.collect()}
    assert {r.shingle: r.df for r in rows} == {
        s: 2 * d for s, d in orig.items()
    }


def test_top_principal_component_matches_eigh(spark):
    """Power iteration on a corpus with a planted dominant direction
    must recover numpy's exact top eigenpair of the covariance."""
    import numpy as np

    from lakehouse_architecture_spark.operators.pca import (
        top_principal_component,
    )

    rng = np.random.default_rng(7)
    direction = rng.normal(size=8)
    direction /= np.linalg.norm(direction)
    # strong signal along `direction`, weak isotropic noise
    data = (
        rng.normal(scale=3.0, size=(200, 1)) * direction
        + rng.normal(scale=0.3, size=(200, 8))
        + rng.normal(size=8)  # nonzero mean: centering must happen
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    got = top_principal_component(df, "embedding", iters=30)

    arr = np.array(
        [np.array(r, dtype=np.float32) for r in data], dtype=np.float64
    )
    cov = np.cov(arr, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top_val, top_vec = evals[-1], evecs[:, -1]

    assert got["n"] == 200 and got["dim"] == 8
    assert abs(np.linalg.norm(got["component"]) - 1.0) < 1e-9
    assert abs(got["eigenvalue"] - top_val) / top_val < 1e-3
    # eigenvectors match up to sign
    assert abs(abs(float(got["component"] @ top_vec)) - 1.0) < 1e-4
    assert got["residual"] < 1e-3
    assert got["eigenvalue"] >= got["top_dim_variance"] * (1 - 1e-9)


def test_top_principal_component_empty_raises(spark):
    import pytest as _pytest

    from lakehouse_architecture_spark.operators.pca import (
        top_principal_component,
    )

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError):
        top_principal_component(df, "embedding")
