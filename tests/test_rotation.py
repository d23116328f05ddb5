"""OPQ rotation dispatch (operators/rotation.py): orthogonality and
scale identities, Spark-vs-Python differential, and the measured
dispatch on the three data shapes (ramp → rotate, iid → indifferent,
one-outlier-per-block → keep plain)."""

from __future__ import annotations

import random

import pytest

from jobinsight_data_pipeline_v2_spark.operators.rotation import (
    _hsign,
    hadamard_rotate,
    opq_train_dispatch,
    pq_quantization_error,
    rotate_expr,
    rotate_vector,
    rotation_perm,
    rotation_signs,
)


def test_hadamard_matrix_orthogonality():
    """H_b · H_bᵀ = b · I for every block size used (the identity the
    ×block dot-scale rides on)."""
    for b in (4, 8):
        H = [[_hsign(r, c) for c in range(b)] for r in range(b)]
        for i in range(b):
            for j in range(b):
                s = sum(H[i][k] * H[j][k] for k in range(b))
                assert s == (b if i == j else 0)


def test_rotation_preserves_dot_at_block_scale():
    """dot(R x, R y) == block · dot(x, y) exactly, for random integer
    vectors at both geometries — order (ties included) preserved."""
    rng = random.Random(5)
    for dim, block in ((64, 8), (16, 4)):
        for _ in range(50):
            x = [rng.randrange(-10**6, 10**6) for _ in range(dim)]
            y = [rng.randrange(-10**6, 10**6) for _ in range(dim)]
            rx = rotate_vector(x, block)
            ry = rotate_vector(y, block)
            dot = sum(a * b for a, b in zip(x, y))
            rdot = sum(a * b for a, b in zip(rx, ry))
            assert rdot == block * dot


def test_rotation_components():
    """Permutation is a bijection interleaving blocks; signs are ±1
    and deterministic."""
    perm = rotation_perm(64, 8)
    assert sorted(perm) == list(range(64))
    # each output block draws one component from every input block
    for b in range(8):
        srcs = {perm[b * 8 + c] // 8 for c in range(8)}
        assert srcs == set(range(8))
    s = rotation_signs(64)
    assert set(s) <= {-1, 1} and s == rotation_signs(64)
    assert s != rotation_signs(64, seed="other")


def test_spark_expr_matches_python_reference(spark):
    """rotate_expr (the unrolled codegen projection) == rotate_vector
    component-for-component."""
    rng = random.Random(11)
    rows = [
        (i, [rng.randrange(-5000, 5000) for _ in range(16)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<long>")
    got = {
        r.vec_id: list(r.rv)
        for r in hadamard_rotate(df, "v", "rv", 16, block=4).collect()
    }
    for i, v in rows:
        assert got[i] == rotate_vector(v, block=4)


def _mk_structured(spark, shape: str, n=240, dim=16, seed=3):
    """Small integer corpora with the three variance structures."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        base = [rng.randrange(-300, 301) for _ in range(dim)]
        if shape == "ramp":
            v = [b * (1 << (j // 4)) for j, b in enumerate(base)]
        elif shape == "outlier":
            v = [b * (256 if j % 4 == 0 else 1) for j, b in enumerate(base)]
        else:  # iid
            v = base
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, v array<long>")


def test_dispatch_measures_and_picks_correctly(spark):
    """The OPQ dispatch on the three shapes (dim 16, block 4, n_sub 4):
    ramp-structured data must pick ROTATED with real margin;
    one-outlier-per-block data must keep PLAIN (rotation poisons every
    subspace); and on every shape the choice must equal the measured
    comparison it claims to make."""
    outcomes = {}
    for shape in ("ramp", "outlier", "iid"):
        df = _mk_structured(spark, shape)
        disp = opq_train_dispatch(
            df, n_sub=4, codes=8, max_iters=4, vec_col="v",
            id_col="vec_id", block=4,
        )
        assert disp["rotated"] == (
            disp["err_rot"] < disp["block"] * disp["err_plain"]
        )
        outcomes[shape] = disp
    assert outcomes["ramp"]["rotated"] is True
    r = outcomes["ramp"]
    assert r["err_rot"] * 2 < r["block"] * r["err_plain"]  # real margin
    assert outcomes["outlier"]["rotated"] is False
    o = outcomes["outlier"]
    assert o["err_rot"] > o["block"] * o["err_plain"]  # rotation LOSES
    # iid: rotation is ≈ a no-op — the scaled errors sit within 25%
    i = outcomes["iid"]
    lo, hi = sorted((i["err_rot"], i["block"] * i["err_plain"]))
    assert hi <= lo * 1.25


def test_quantization_error_is_exact_integer(spark):
    """pq_quantization_error equals a brute-force Python recompute on
    a tiny corpus (pins the unrolled err expression)."""
    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        pq_train,
    )

    df = _mk_structured(spark, "iid", n=60, dim=8, seed=9)
    cb = pq_train(df, n_sub=2, codes=4, max_iters=3, vec_col="v",
                  id_col="vec_id")
    cb = cb.localCheckpoint(eager=False)
    err = pq_quantization_error(df, cb, "v", "vec_id")
    books = {}
    for r in cb.collect():
        books.setdefault(r.m, []).append(list(r.centroid))
    want = 0
    for row in df.collect():
        v = list(row.v)
        for m in range(2):
            sv = v[m * 4 : (m + 1) * 4]
            want += min(
                sum((a - b) ** 2 for a, b in zip(sv, c))
                for c in books[m]
            )
    assert err == want
