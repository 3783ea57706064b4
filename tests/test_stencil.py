"""Periodic-stencil micro matvec (micro/stencil.py).

The stencil matvec must equal the dense reduced periodic operator
K_c = Σ_e a_e D_eᵀ B_c D_e (with keep/pin folding) exactly, and the full
chunk-PCG tensor pipeline must be invariant (to reassociation level)
under HOMMX_MICRO_MATVEC=matfree|auto.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu.meshes import create_unit_cube, create_unit_square
from hommx_tpu.micro.engine import MicroEngine
from hommx_tpu.micro.stencil import (
    build_stencil,
    stencil_matvec,
    stencil_weights,
)


def _dense_K(eng, a_c, B=None):
    """Numpy reference: reduced periodic operator with keep/pin folding."""
    loc2red = np.asarray(eng.loc2red)
    Draw = np.asarray(eng.Draw, dtype=np.float64)  # (ne, r, nbl)
    pin = np.asarray(eng.pin_mask)
    n = eng.n_reduced
    Bm = np.eye(eng.r) if B is None else np.asarray(B, dtype=np.float64)
    Se = np.einsum("eri,rt,etj->eij", Draw, Bm, Draw) * np.asarray(
        a_c, dtype=np.float64
    )[:, None, None]
    K = np.zeros((n, n))
    for e in range(loc2red.shape[0]):
        idx = loc2red[e]
        K[np.ix_(idx, idx)] += Se[e]
    keep = ~pin
    K = K * np.outer(keep, keep)
    K[pin, pin] = 1.0
    return K


@pytest.mark.parametrize("mesh_fn", [
    lambda: create_unit_square(6, 6),
    lambda: create_unit_cube(3),
])
def test_stencil_matvec_matches_dense(mesh_fn):
    eng = MicroEngine(mesh_fn(), dtype=jnp.float64, solver="pcg")
    st = build_stencil(eng)
    assert st is not None
    rng = np.random.default_rng(0)
    C, s, n = 3, eng.s, eng.n_reduced
    a = jnp.asarray(rng.uniform(0.5, 3.0, (C, eng.nE)))
    P = jnp.asarray(rng.standard_normal((n, s, C)))
    ws = stencil_weights(st, a)
    out = np.asarray(stencil_matvec(st, ws, P))
    for c in range(C):
        K = _dense_K(eng, np.asarray(a)[c])
        np.testing.assert_allclose(
            out[:, :, c], K @ np.asarray(P)[:, :, c], rtol=1e-12, atol=1e-12
        )


def test_stencil_matvec_matches_dense_with_map():
    """Stratified-map case: per-cell B_K = GᵀG enters the weights."""
    eng = MicroEngine(create_unit_square(5, 5), dtype=jnp.float64, solver="pcg")
    st = build_stencil(eng)
    assert st is not None
    rng = np.random.default_rng(1)
    C, s, n = 2, eng.s, eng.n_reduced
    a = jnp.asarray(rng.uniform(0.5, 3.0, (C, eng.nE)))
    G = rng.standard_normal((C, 2, 2)) + 2 * np.eye(2)
    B_K = jnp.asarray(np.einsum("cmr,cmt->crt", G, G))
    P = jnp.asarray(rng.standard_normal((n, s, C)))
    ws = stencil_weights(st, a, B_K)
    out = np.asarray(stencil_matvec(st, ws, P))
    for c in range(C):
        K = _dense_K(eng, np.asarray(a)[c], B=np.asarray(B_K)[c])
        np.testing.assert_allclose(
            out[:, :, c], K @ np.asarray(P)[:, :, c], rtol=1e-12, atol=1e-12
        )


def test_stencil_unavailable_cases():
    eng = MicroEngine(create_unit_square(4, 4), bs=2, coeff_kind="tensor4",
                      dtype=jnp.float64)
    assert build_stencil(eng) is None  # bs > 1
    eng2 = MicroEngine(create_unit_square(4, 4), micro_degree=2,
                       dtype=jnp.float64, solver="pcg")
    assert build_stencil(eng2) is None  # P2
    # unstructured micro meshes are rejected upstream (periodic map
    # construction requires a box-periodic mesh), so structure=None can
    # only be reached with a hand-built SimplexMesh; guard directly:
    eng3 = MicroEngine(create_unit_square(4, 4), dtype=jnp.float64,
                       solver="pcg")
    object.__setattr__(eng3.mesh, "structure", None)
    assert build_stencil(eng3) is None


def _astar(eng, coeff, centers, G_fn=None):
    return np.asarray(
        jax.jit(
            lambda c: eng.tensors_chunk_pcg(coeff, c, G_fn=G_fn)
        )(centers)
    )


def test_chunk_pcg_stencil_matches_matfree():
    """End-to-end A* through the chunk PCG: stencil ≡ matfree."""
    mesh = create_unit_square(8, 8)
    coeff = lambda x, y: 1.5 + x[0] + jnp.sin(2 * jnp.pi * y[0]) * jnp.cos(
        2 * jnp.pi * y[1]
    )
    centers = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (5, 2)), dtype=jnp.float64
    )
    eng = MicroEngine(mesh, dtype=jnp.float64, solver="pcg")
    assert eng._get_stencil() is not None  # stencil path actually engaged
    A_st = _astar(eng, coeff, centers)
    os.environ["HOMMX_MICRO_MATVEC"] = "matfree"
    try:
        eng2 = MicroEngine(mesh, dtype=jnp.float64, solver="pcg")
        assert eng2._get_stencil() is None
        A_mf = _astar(eng2, coeff, centers)
    finally:
        os.environ.pop("HOMMX_MICRO_MATVEC")
    np.testing.assert_allclose(A_st, A_mf, rtol=0, atol=1e-9)


@pytest.mark.parametrize("mesh_fn", [
    lambda: create_unit_square(6, 6),
    lambda: create_unit_cube(3),
])
def test_stencil_pcg_pallas_matches_xla_loop(mesh_fn):
    """The fused Pallas chunk-PCG (interpret mode on CPU) reproduces the
    XLA Krylov loop: same iterates (to reassociation) and iteration count,
    both on raw and scaling-folded weights (micro/stencil_pcg.py)."""
    from hommx_tpu.micro.engine import _chunk_pcg_raw
    from hommx_tpu.micro.stencil import scale_weights
    from hommx_tpu.micro.stencil_pcg import stencil_pcg_pallas

    eng = MicroEngine(mesh_fn(), dtype=jnp.float32, solver="pcg")
    st = build_stencil(eng)
    assert st is not None
    rng = np.random.default_rng(7)
    C, s, n = 5, eng.s, eng.n_reduced
    a = jnp.asarray(rng.uniform(0.5, 3.0, (C, eng.nE)), dtype=jnp.float32)
    ws = stencil_weights(st, a)
    F = jnp.asarray(
        rng.standard_normal((n, s, C)), dtype=jnp.float32
    ) * (~eng.pin_mask)[:, None, None]
    Minv = eng._get_K0inv().astype(jnp.float32)

    matvec = lambda P: stencil_matvec(st, ws, P)
    prec = lambda R: (Minv @ R.reshape(n, -1)).reshape(n, s, C)
    X_ref, it_ref = _chunk_pcg_raw(matvec, prec, F, 1e-6, 200)
    X_pl, it_pl = stencil_pcg_pallas(
        ws, F, Minv, st.shape, st.offsets, 1e-6, 200, interpret=True
    )
    assert int(it_pl) == int(it_ref)
    np.testing.assert_allclose(
        np.asarray(X_pl), np.asarray(X_ref), rtol=0, atol=5e-5
    )

    # scaling folded into the weights ≡ the symmetrically scaled operator
    sc2 = jnp.where(
        eng.pin_mask[:, None],
        1.0,
        jnp.asarray(rng.uniform(0.5, 2.0, (n, C)), dtype=jnp.float32),
    ).astype(jnp.float32)
    ws_s = scale_weights(st, ws, sc2)
    sc = sc2[:, None, :]
    mv_scaled = lambda P: sc * matvec(sc * P)
    Y_ref, jt_ref = _chunk_pcg_raw(mv_scaled, prec, F, 1e-6, 200)
    Y_pl, jt_pl = stencil_pcg_pallas(
        ws_s, F, Minv, st.shape, st.offsets, 1e-6, 200, interpret=True
    )
    # weight folding (sc⊙w⊙roll(sc)) rounds differently from sc*(K(sc*P)),
    # so the lockstep stop can land one iteration apart — both converged
    assert abs(int(jt_pl) - int(jt_ref)) <= 1
    np.testing.assert_allclose(
        np.asarray(Y_pl), np.asarray(Y_ref), rtol=0, atol=5e-5
    )


def test_chunk_pcg_stencil_matches_matfree_stratified():
    """Same with a Dθᵀ map (B_K-weighted stencil) and the fft prec."""
    mesh = create_unit_square(8, 8)
    coeff = lambda x, y: jnp.where(jnp.cos(2 * jnp.pi * y[0]) < 0, 5.0, 0.5)

    def G_fn(x):
        return jnp.array([[jnp.cos(x[0]), 1.0], [1.0, 0.0]])

    centers = jnp.asarray(
        np.random.default_rng(4).uniform(0, 1, (4, 2)), dtype=jnp.float64
    )
    for prec in ("k0inv", "fft"):
        eng = MicroEngine(mesh, dtype=jnp.float64, solver="pcg",
                          cell_prec=prec)
        A_st = _astar(eng, coeff, centers, G_fn=G_fn)
        os.environ["HOMMX_MICRO_MATVEC"] = "matfree"
        try:
            eng2 = MicroEngine(mesh, dtype=jnp.float64, solver="pcg",
                               cell_prec=prec)
            A_mf = _astar(eng2, coeff, centers, G_fn=G_fn)
        finally:
            os.environ.pop("HOMMX_MICRO_MATVEC")
        np.testing.assert_allclose(A_st, A_mf, rtol=0, atol=1e-9)
