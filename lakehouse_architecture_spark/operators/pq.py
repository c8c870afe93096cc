"""Product quantization (PQ): the ANN memory-compression layer.

Jégou et al. 2011 ("Product quantization for nearest neighbor
search"), the FAISS-style scale path: split each d-dim vector into
``n_sub`` subvectors, learn a small L2 codebook per block, and store
each vector as ``n_sub`` byte codes — 256 bytes of float32 become 8
bytes (32x), which is what lets a 100 TB embedding corpus hold its
index in cluster memory. Complements the symmetric int8 quantization
already in `queries/embeddings.py` (4x): PQ trades more error for 8x
more compression.

Scale/portability doctrine shared with the rest of the repo:

- TRAINING (per-block Lloyd) is the only iterative part; each
  iteration is one aggregate per block, codebooks live on the driver
  (k * sub_dim floats — bounded, the centroid-collect doctrine).
- ENCODING is a PURE PROJECTION: the codebooks inline as literal
  arrays and the argmin over k block-distances is a static expression
  (the score_logistic / bloom-literal pattern) — encoding 100 TB is a
  single scan, no shuffle, no join, no Python.
- Seeds are md5-ranked rows (deterministic, engine-portable), ties in
  the argmin break to the LOWEST code id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _block(vec_col: str, j: int, sub_dim: int) -> Column:
    return F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim)


def _dists_expr(sub: Column, codebook: list[list[float]]) -> Column:
    """Array of squared L2 distances from ``sub`` to each centroid:
    the codebook inlines as a literal array<array<double>> and the
    distances come from transform + an order-pinned zip_with/aggregate
    fold (0.0 + x1 == x1, so the fold is the plain sequential sum).

    Was fully unrolled (sub_dim * k static terms per block) on the
    codegen-wins assumption — but the ENCODE projection stacks n_sub
    blocks x 3 references, and at 8x16x8 janino refuses the generated
    method outright, leaving an interpreted evaluation of a ~3000-node
    tree. Measured at sf0.1 (interleaved A/B, 5 reps, bit-identical
    results): unrolled 8.34 s vs this form 1.36 s per encode+aggregate
    pass — the dot_fixed-vs-zip_with lesson again: past the codegen
    method-size limit, compact HOF trees beat unrolled scalar ones."""
    cb = F.array(
        *[F.array(*[F.lit(float(c)) for c in cent]) for cent in codebook]
    )
    return F.transform(
        cb,
        lambda cent: F.aggregate(
            F.zip_with(
                sub,
                cent,
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ),
    )


def _best_code(sub: Column, codebook: list[list[float]]) -> Column:
    """``struct(d, i)`` of the nearest centroid: distance + code in one
    expression with the literal-heavy distance array referenced ONCE.
    ``array_position(darr, array_min(darr))`` embeds ``darr`` (k
    centroids of inlined literals) twice per block, doubling the
    already planning-bound expression tree (r16: this query's wall is
    ~100% analysis/codegen at any local SF — sf0.001 == sf0.1 timing).
    Struct ordering compares ``d`` then ``i``, so ties break to the
    LOWEST code id — exactly ``array_position``'s first-match rule."""
    darr = _dists_expr(sub, codebook)
    idx = F.sequence(F.lit(0), F.lit(len(codebook) - 1))
    return F.array_min(
        F.zip_with(
            darr, idx, lambda d, i: F.struct(d.alias("d"), i.alias("i"))
        )
    )


def pq_train(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    n_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    seed_codebooks: list[list[list[float]]] | None = None,
) -> list[list[list[float]]]:
    """Per-block L2 codebooks, ``codebooks[j][c][t]``. Seeds are the k
    md5-first rows' subvectors (or ``seed_codebooks`` when the caller
    already holds them — skips the md5 top-k scan); each Lloyd
    iteration is ONE assign-and-average aggregate covering every block
    (r16, guide §2.4: blocks are independent, so the per-block argmin
    projections stack into a single scan and the per-(block, code,
    position) means come back from one groupBy — iters x n_sub scan
    jobs collapse to iters). Empty clusters keep their previous
    centroid, so k never shrinks."""
    if seed_codebooks is not None:
        codebooks = [[list(c) for c in cb] for cb in seed_codebooks]
        sub_dim = len(codebooks[0][0])
    else:
        dim = len(emb.select(vec_col).first()[0])
        if dim % n_sub != 0:
            raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
        sub_dim = dim // n_sub
        h = F.md5(F.col(id_col).cast("string"))
        seed_rows = (
            emb.select(F.col(vec_col).alias("v"), h.alias("h"))
            .orderBy("h", "v")
            .limit(k)
            .collect()
        )
        if len(seed_rows) < k:
            raise ValueError(f"need >= {k} vectors to seed {k} codes")
        codebooks = [
            [
                [float(x) for x in r["v"][j * sub_dim : (j + 1) * sub_dim]]
                for r in seed_rows
            ]
            for j in range(n_sub)
        ]
    for _ in range(iters):
        code_cols = []
        for j in range(n_sub):
            best = _best_code(_block(vec_col, j, sub_dim), codebooks[j])
            code_cols.append(best["i"].cast("int"))
        assigned = emb.select(
            F.array(*code_cols).alias("codes"), F.col(vec_col).alias("v")
        )
        pos = F.col("pos")
        block = (pos / sub_dim).cast("int")
        means = (
            assigned.select("codes", F.posexplode("v").alias("pos", "x"))
            .select(
                block.alias("block"),
                F.element_at("codes", block + 1).alias("code"),
                (pos % sub_dim).alias("sub_pos"),
                F.col("x").cast("double").alias("x"),
            )
            .groupBy("block", "code", "sub_pos")
            .agg(F.avg("x").alias("m"))
            .collect()  # bounded: n_sub * k * sub_dim rows (= dim * k)
        )
        new_cbs = [[list(c) for c in cb] for cb in codebooks]
        for r in means:
            new_cbs[int(r["block"])][int(r["code"])][int(r["sub_pos"])] = (
                float(r["m"])
            )
        codebooks = new_cbs
    return codebooks


def pq_encode(
    emb: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """``emb`` + ``pq_codes`` (array<int>, one code per block) +
    ``pq_sq_err`` (the exact squared reconstruction error, free from
    the same argmin). Pure narrow projection — no shuffle at any
    corpus size."""
    n_sub = len(codebooks)
    sub_dim = len(codebooks[0][0])
    # Two-stage projection: materialize each block's (d, i) struct once,
    # then extract both fields — a single select would re-embed the
    # literal-heavy struct expression per extraction (see _best_code).
    bests = emb.select(
        "*",
        *[
            _best_code(_block(vec_col, j, sub_dim), codebooks[j]).alias(
                f"_pq_best_{j}"
            )
            for j in range(n_sub)
        ],
    )
    total_err = F.col("_pq_best_0")["d"]
    for j in range(1, n_sub):
        total_err = total_err + F.col(f"_pq_best_{j}")["d"]
    return bests.select(
        *emb.columns,
        F.array(
            *[
                F.col(f"_pq_best_{j}")["i"].cast("int")
                for j in range(n_sub)
            ]
        ).alias("pq_codes"),
        total_err.alias("pq_sq_err"),
    )


def pq_adc_expr(
    codebooks: list[list[list[float]]], query_vec: list[float]
) -> Column:
    """Asymmetric-distance (ADC) expression over a ``pq_codes`` column:
    the per-query lookup tables lut[j][c] = ||q_sub_j - codebook[j][c]||²
    are computed driver-side (n_sub * k floats — bounded) and inlined,
    so scoring a row is n_sub literal-array lookups + adds. Scanning
    100 TB of 8-byte codes with this expression is the FAISS query
    shape: no decode, no shuffle, no Python."""
    n_sub = len(codebooks)
    sub_dim = len(codebooks[0][0])
    if len(query_vec) != n_sub * sub_dim:
        raise ValueError(
            f"query dim {len(query_vec)} vs codebook dim {n_sub * sub_dim}"
        )
    total = F.lit(0.0)
    for j, cb in enumerate(codebooks):
        qs = [float(x) for x in query_vec[j * sub_dim : (j + 1) * sub_dim]]
        lut = F.array(
            *[
                F.lit(sum((q - c[t]) ** 2 for t, q in enumerate(qs)))
                for c in cb
            ]
        )
        total = total + F.element_at(
            lut, F.element_at("pq_codes", j + 1) + F.lit(1)
        )
    return total


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC distance over an encoded corpus (ascending, id
    tie-break). This is the SHORTLIST stage — PQ distances are
    quantized, so production reranks the shortlist exactly against the
    raw vectors of just those k rows (shortlist >> final k); the
    operator returns (id, adc_dist) for the caller to rerank/join."""
    d = pq_adc_expr(codebooks, query_vec)
    return (
        encoded.select(F.col(id_col), d.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )
