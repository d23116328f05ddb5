"""Deterministic orthogonal rotation for PQ (the OPQ dispatch).

Product quantization splits a vector into contiguous subspaces and
quantizes each independently; when the data's variance is UNBALANCED
across those subspaces (a decaying eigenvalue spectrum, a few loud
blocks), the loud subspaces exhaust their code budget while the quiet
ones waste theirs. OPQ (Ge et al., CVPR'13) fixes this with an
orthogonal rotation before quantization. The data-independent flavor
implemented here is the HD transform (sign-flip diagonal D, then a
permutation that interleaves input blocks, then a block-diagonal
Walsh–Hadamard H_b) — the "fast rotation" family (QuickADC /
structured OPQ): every entry is ±1, so on the engine's
integer-quantized embeddings the rotation is INTEGER-EXACT, and

    dot(R(x), R(y)) = b · dot(x, y)        (exactly, b = block size)

because H_b·H_bᵀ = b·I and D, P are orthogonal — nearest-neighbor
order, ties included, is preserved bit-for-bit at a known scale.

Whether the rotation HELPS is a property of the data, not a default:
on iid dims it is a no-op (error ratio ≈ 1), on a decaying spectrum it
wins (measured ~4× on the ramp-structured gate corpus), and on
one-outlier-dim-per-block data it LOSES badly (plain PQ's contiguous
split already isolates the outliers; spreading them poisons every
subspace — measured ~36× worse). ``opq_train_dispatch`` therefore
MEASURES: it trains plain and rotated codebooks, computes each one's
exact integer quantization error (the OPQ objective), and returns
whichever wins after un-scaling — the dispatch the property tests pin
on all three data shapes.

Plan shape: the rotation is one narrow projection — ``dim`` unrolled
output components of ``block`` ±element_at terms each (64×8 = 512
terms at the gate's geometry: codegen-sized, the PQ unrolled-LUT
discipline, far under the srp_lsh 2048-term cliff). Training cost is
2× pq_train at dispatch time only; serving pays one extra narrow
projection per batch.

Reference analog: none (VERDICT r8 ask #4).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEF_BLOCK = 8


def _hsign(r: int, c: int) -> int:
    """Walsh–Hadamard entry H[r][c] = (−1)^popcount(r AND c)."""
    return -1 if bin(r & c).count("1") % 2 else 1


def rotation_signs(dim: int, seed: str = "opq") -> list[int]:
    """Deterministic ±1 diagonal: md5 parity per component."""
    return [
        1 if int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest(), 16) % 2 == 0
        else -1
        for j in range(dim)
    ]


def rotation_perm(dim: int, block: int = _DEF_BLOCK) -> list[int]:
    """Block-interleaving permutation (index-grid transpose): output
    block b draws one component from every input block, so a loud
    input block spreads across all subspaces."""
    if dim % block:
        raise ValueError(f"dim {dim} not divisible by block {block}")
    return [(i % block) * (dim // block) + i // block for i in range(dim)]


def rotate_expr(
    vec_col: str, dim: int, block: int = _DEF_BLOCK, seed: str = "opq"
) -> str:
    """SQL array expression for R(x) = blockdiag(H_b)·P·D·x — fully
    unrolled (dim × block signed element_at terms, inside whole-stage
    codegen; no lambda, rule 10)."""
    signs = rotation_signs(dim, seed)
    perm = rotation_perm(dim, block)
    comps = []
    for i in range(dim):
        b, r = divmod(i, block)
        terms = []
        for c in range(block):
            j = perm[b * block + c]  # input component feeding (b, c)
            s = _hsign(r, c) * signs[j]
            op = "+" if s > 0 else "-"
            terms.append(f"{op} element_at({vec_col}, {j + 1})")
        comps.append("(" + " ".join(terms).lstrip("+ ") + ")")
    return "array(" + ", ".join(comps) + ")"


def rotate_vector(
    vec: list[int], block: int = _DEF_BLOCK, seed: str = "opq"
) -> list[int]:
    """Pure-Python reference of ``rotate_expr`` (differential tests)."""
    dim = len(vec)
    signs = rotation_signs(dim, seed)
    perm = rotation_perm(dim, block)
    out = []
    for i in range(dim):
        b, r = divmod(i, block)
        acc = 0
        for c in range(block):
            j = perm[b * block + c]
            acc += _hsign(r, c) * signs[j] * vec[j]
        out.append(acc)
    return out


def hadamard_rotate(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str | None = None,
    dim: int | None = None,
    block: int = _DEF_BLOCK,
    seed: str = "opq",
) -> DataFrame:
    """Add the rotated vector column (replaces ``vec_col`` in place
    when ``out_col`` is None). One narrow projection."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    return df.withColumn(
        out_col or vec_col, F.expr(rotate_expr(vec_col, dim, block, seed))
    )


def pq_quantization_error(
    df: DataFrame,
    cb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Exact integer Σ‖x − c(x)‖² over the corpus for one trained
    codebook — the OPQ objective. Per-row error = ‖x‖² − 2·x·c(x) +
    ‖c(x)‖², all integer (quantized vectors × bigint centroids; the
    per-row value stays ≪ 2^53 so the unrolled double dot is exact,
    and the corpus sum accumulates in BIGINT)."""
    from .similarity import (
        _DOT,
        _PQ_KEY_PAD,
        _pq_cb_index,
        _pq_dims,
        pq_encode,
    )

    n_sub, sub = _pq_dims(cb)
    coded = pq_encode(df, cb, vec_col, id_col, dims=(n_sub, sub))
    joined = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
        .join(coded, "id")
        .crossJoin(_pq_cb_index(cb))
    )
    xc_terms = " + ".join(
        "("
        + _DOT.format(
            a=f"slice(__v, {mi * sub + 1}, {sub})",
            b=(
                f"element_at(__cbm, {mi}L * {_PQ_KEY_PAD}"
                f" + element_at(codes, {mi + 1})).centroid"
            ),
        )
        + ")"
        for mi in range(n_sub)
    )
    n2 = _DOT.format(a="__v", b="__v")
    row_err = (
        f"cast(({n2}) - 2D * ({xc_terms}) + cast(approx_n2 as double)"
        " as bigint)"
    )
    out = joined.select(F.expr(row_err).alias("__e")).agg(
        F.sum("__e").alias("err")
    ).collect()[0]["err"]
    return int(out)


def opq_train_dispatch(
    df: DataFrame,
    n_sub: int = 8,
    codes: int = 16,
    max_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block: int = _DEF_BLOCK,
    seed: str = "opq",
) -> dict:
    """Train plain AND rotated PQ codebooks and pick by MEASURED
    integer quantization error — the OPQ dispatch.

    The rotated corpus lives at scale² = ``block``, so the comparison
    un-scales: rotated wins iff err_rot < block · err_plain. Returns
    {rotated: bool, cb: winning codebook, err_plain, err_rot} — a
    caller that serves the rotated codebook must rotate queries and
    corpus with the SAME (block, seed) (dot products then come back
    at exactly block× scale; cosine and rank order are unchanged).
    """
    from .similarity import pq_train

    dim = len(df.select(vec_col).first()[0])
    rot = hadamard_rotate(df, vec_col, "__rv", dim, block, seed)
    rot = rot.select(F.col(id_col), F.col("__rv")).localCheckpoint(
        eager=False
    )
    cb_plain = pq_train(df, n_sub, codes, max_iters, vec_col, id_col)
    cb_plain = cb_plain.localCheckpoint(eager=False)
    cb_rot = pq_train(rot, n_sub, codes, max_iters, "__rv", id_col)
    cb_rot = cb_rot.localCheckpoint(eager=False)
    err_plain = pq_quantization_error(df, cb_plain, vec_col, id_col)
    err_rot = pq_quantization_error(rot, cb_rot, "__rv", id_col)
    rotated = err_rot < block * err_plain
    return {
        "rotated": rotated,
        "cb": cb_rot if rotated else cb_plain,
        "err_plain": err_plain,
        "err_rot": err_rot,
        "block": block,
        "seed": seed,
    }
