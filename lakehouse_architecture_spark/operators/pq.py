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
- ENCODING is a PURE PROJECTION over Arrow batches (r17, guide §4.2 /
  r16 verdict order #5): the codebooks ride the task closure as a tiny
  ndarray (n_sub*k*sub_dim doubles, ~8 KB) and each batch's argmin is
  three vectorized numpy ops — encoding 100 TB is a single scan, no
  shuffle, no join. The former shape inlined the codebooks as literal
  arrays into a JVM HOF expression; at 8x16x8 that ~8k-node tree made
  the row's wall ~100% ANALYSIS/CODEGEN at any local SF (r16 ledger:
  sf0.001 == sf0.1 timing), re-paid for every distinct codebook (each
  Lloyd iteration plans a fresh tree). The numpy fold reproduces the
  JVM expression BIT-FOR-BIT: (x-c)² summed sequentially over sub_dim
  (numpy's pairwise summation only kicks in past 128 addends), block
  errors added in block order, and argmin's first-match rule equal to
  the struct-min lowest-code tie-break — asserted by the roundtrip
  test and an interleaved identity check.
- Seeds are md5-ranked rows (deterministic, engine-portable), ties in
  the argmin break to the LOWEST code id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)


def _codes_errs_fn(cb: "np.ndarray"):
    """Factory for the per-batch (codes, per-block errors) kernel over
    a captured (n_sub, k, sub_dim) float64 codebook. A FACTORY, not a
    module-level kernel, deliberately: cloudpickle serializes the
    returned closure BY VALUE, so the Python workers never need this
    package importable (a module-level function pickles by reference
    and breaks when the worker's path lacks the repo — the repo's
    nested-closure convention for every Arrow function). Distances are
    the sequential (x-c)² folds of the old JVM expression
    (bit-identical, see module docstring); argmin takes the FIRST
    minimum = lowest code id."""
    n_sub, _k, sub_dim = cb.shape

    def codes_errs(V: "np.ndarray"):
        X = V.reshape(V.shape[0], n_sub, sub_dim)
        diff = X[:, :, None, :] - cb[None, :, :, :]
        sq = diff * diff
        # STRICTLY sequential accumulation over sub_dim: numpy's .sum
        # uses an 8-way-unrolled pairwise reduction whose rounding
        # order differs from the JVM fold (measured: codes/errors
        # drifted in the last ulp); an explicit left-to-right chain of
        # vectorized adds reproduces ((t1+t2)+t3)+... exactly.
        d = sq[:, :, :, 0].copy()
        for t in range(1, sub_dim):
            d += sq[:, :, :, t]
        codes = d.argmin(axis=2)
        errs = np.take_along_axis(d, codes[:, :, None], axis=2)[:, :, 0]
        return codes, errs

    return codes_errs


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
        kern = _codes_errs_fn(np.asarray(codebooks, dtype=np.float64))

        def assign(batches, kern=kern):
            import pandas as pd

            for pdf in batches:
                if len(pdf):
                    V = np.array(list(pdf["v"]), dtype=np.float64)
                    codes, _errs = kern(V)
                    yield pd.DataFrame(
                        {
                            "codes": list(codes.astype(np.int32)),
                            "v": list(pdf["v"]),
                        }
                    )

        assigned = emb.select(F.col(vec_col).alias("v")).mapInPandas(
            assign, schema="codes array<int>, v array<double>"
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
    the same argmin). Pure narrow Arrow projection — no shuffle at any
    corpus size; the codebook rides the task closure (~8 KB), so the
    plan carries NO literal tree to analyze or codegen (module
    docstring — the old expression form was planning-bound). Select
    only the columns you need before calling: an opaque function ships
    (and scans) every column it is handed (guide §4.2)."""
    cb = np.asarray(codebooks, dtype=np.float64)
    out_schema = StructType(
        list(emb.schema.fields)
        + [
            StructField("pq_codes", ArrayType(IntegerType())),
            StructField("pq_sq_err", DoubleType()),
        ]
    )

    kern = _codes_errs_fn(cb)

    def encode(batches):
        for pdf in batches:
            if len(pdf):
                V = np.array(list(pdf[vec_col]), dtype=np.float64)
                codes, errs = kern(V)
                out = pdf.copy()
                out["pq_codes"] = list(codes.astype(np.int32))
                # sequential block-order chain (d_0 + d_1 + ...), same
                # ulp-level reasoning as the kernel's sub_dim fold
                tot = errs[:, 0].copy()
                for j in range(1, errs.shape[1]):
                    tot += errs[:, j]
                out["pq_sq_err"] = tot
                yield out

    return emb.mapInPandas(encode, schema=out_schema)


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
