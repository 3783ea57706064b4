"""On-device Pallas kernel gates (real Mosaic, not the interpreter).

Run: ``HOMMX_TEST_TPU=1 python -m pytest tests/test_runtpu.py --runtpu -q``
(~2-4 min, dominated by two remote Mosaic compiles through the axon
tunnel).  The CPU suite covers these kernels in interpreter mode only; a
real-Mosaic divergence already happened once (int64 poison under x64,
commit 9c97469) and was caught by a bench anomaly — this gate catches the
next one with a test (round-3 verdict item 7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.runtpu


def _require_tpu():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs the real TPU backend (HOMMX_TEST_TPU=1)")


def test_stencil_pcg_pallas_on_device_matches_xla():
    """The fused Pallas stencil chunk-PCG (micro/stencil_pcg.py) on real
    Mosaic matches the XLA while-loop path on the production 16x16 scalar
    workload (same engine, HOMMX_STENCIL_PCG toggles the route)."""
    _require_tpu()
    import os

    from hommx_tpu.meshes import create_unit_square
    from hommx_tpu.micro.engine import MicroEngine

    coeff = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.uniform(0, 1, (512, 2)), dtype=jnp.float32)

    outs = {}
    for mode in ("auto", "xla"):
        os.environ["HOMMX_STENCIL_PCG"] = mode
        try:
            eng = MicroEngine(
                create_unit_square(16), bs=1, coeff_kind="scalar",
                dtype=jnp.float32,
            )
            outs[mode] = jax.device_get(
                jax.jit(
                    lambda c: eng.tensors_for_centers(coeff, c, chunk=512)
                )(centers)
            )
        finally:
            del os.environ["HOMMX_STENCIL_PCG"]
    rel = np.max(np.abs(outs["auto"] - outs["xla"])) / np.max(
        np.abs(outs["xla"])
    )
    assert np.isfinite(outs["auto"]).all()
    assert rel < 5e-5, rel  # same Krylov process up to f32 reassociation


def test_blocked_cholesky_on_device_matches_cho_factor():
    """The hand-blocked batched Cholesky (ops/batched_chol.py) on device
    matches XLA's cho_factor/cho_solve route at f32 tolerance."""
    _require_tpu()
    from hommx_tpu.ops.batched_chol import blocked_solve_spd

    rng = np.random.default_rng(1)
    C, n, s = 256, 96, 6
    G = rng.standard_normal((C, n, n)).astype(np.float32)
    K = np.einsum("cik,cjk->cij", G, G) + 10 * np.eye(n, dtype=np.float32)
    B = rng.standard_normal((C, n, s)).astype(np.float32)
    K, B = jnp.asarray(K), jnp.asarray(B)

    with jax.default_matmul_precision("highest"):
        X_b = jax.device_get(jax.jit(blocked_solve_spd)(K, B))
        cf = jax.jit(
            lambda K, B: jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(K), B
            )
        )
        X_x = jax.device_get(cf(K, B))
    rel = np.max(np.abs(X_b - X_x)) / np.max(np.abs(X_x))
    assert np.isfinite(X_b).all()
    assert rel < 5e-5, rel


def test_dia_spmv_pallas_on_device_matches_shifts():
    """The Pallas DIA SpMV kernel (ops/dia.py, the production macro-CG
    matvec) on real Mosaic matches the XLA shift formulation."""
    _require_tpu()
    from hommx_tpu.meshes import create_unit_square
    from hommx_tpu.models.common import MacroSystem
    from hommx_tpu.ops.dia import dia_spmv, dia_spmv_pallas, ell_vals_to_dia
    from hommx_tpu.ops.function_space import FunctionSpace

    V = FunctionSpace(create_unit_square(96, 96), 1)
    sys = MacroSystem(V, jnp.float32)
    rng = np.random.default_rng(2)
    vals = jnp.asarray(
        rng.standard_normal(np.asarray(sys.cols).size), dtype=jnp.float32
    )
    dvals = ell_vals_to_dia(sys.dia, vals)
    x = jnp.asarray(rng.standard_normal(V.num_dofs), dtype=jnp.float32)
    y_p = jax.device_get(
        jax.jit(lambda d, v: dia_spmv_pallas(d, sys.dia.offsets, v))(dvals, x)
    )
    y_x = jax.device_get(
        jax.jit(lambda d, v: dia_spmv(d, sys.dia.offsets, v))(dvals, x)
    )
    denom = np.max(np.abs(y_x)) + 1e-30
    assert np.max(np.abs(y_p - y_x)) / denom < 1e-5


def test_poisson_hmm_end_to_end_on_device_matches_golden():
    """Full PoissonHMM.solve() on the REAL backend vs the frozen f64 CPU
    golden functionals (round-4 verdict item 3: end-to-end TPU
    correctness was pinned only indirectly via bench checksums).  Same
    config as test_golden.py::poisson_hmm, f32 on device."""
    _require_tpu()
    from hommx_tpu import PoissonHMM, create_unit_square
    from tests.test_golden import GOLDEN, _functionals

    macro = create_unit_square(8, 8)
    micro = create_unit_square(8, 8)

    def A(x, y):
        return 0.33 + 0.15 * (
            jnp.sin(2 * jnp.pi * x[0]) + jnp.sin(2 * jnp.pi * y[0])
        )

    u = PoissonHMM(
        macro, A, lambda x: 1.0, micro, 0.1 / 8, dtype=jnp.float32
    ).solve()
    got = _functionals(macro, u)
    want = GOLDEN["poisson_hmm"]
    for g, w in zip(got, want):
        assert np.isfinite(g)
        assert abs(g - w) / abs(w) < 1e-4, (got, want)


def test_elasticity_beam_end_to_end_on_device_matches_golden():
    """Small stratified-elasticity beam solve() on the REAL backend vs
    the frozen f64 CPU goldens at f32 tolerance (same config as
    test_golden.py::elasticity_stratified_3d — contrast-1e5 rotated
    fibers, f32 micro + f64 macro, the production path)."""
    _require_tpu()
    from hommx_tpu import (
        LinearElasticityStratifiedHMM,
        create_box,
        create_unit_cube,
        dirichletbc,
    )
    from hommx_tpu.ops.function_space import boundary_dofs
    from hommx_tpu.utils.validation import hooke_tensor
    from tests.test_golden import GOLDEN, _functionals

    L, W = 1.0, 0.4
    macro = create_box([[0, 0, 0], [L, W, 0.1]], [5, 2, 2])
    micro = create_unit_cube(3)

    def circ(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < ((2 * jnp.pi) ** 2 / 16)

    mu = lambda x, y: jnp.where(circ(y[1], y[2]), 100.0, 0.001)
    A = hooke_tensor(3, mu, lambda x, y: 1.0)

    def Dtheta(x):
        gamma = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(gamma), jnp.sin(gamma)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    hmm = LinearElasticityStratifiedHMM(
        macro, A, lambda x: jnp.array([0.0, 0.0, -0.008]), micro, 2**-5,
        Dtheta, dtype=jnp.float32,
    )
    V = hmm.function_space
    hmm.set_boundary_conditions(
        dirichletbc(
            np.zeros(3), boundary_dofs(V, lambda x: np.isclose(x[0], 0)), V
        )
    )
    got = _functionals(macro, hmm.solve())
    want = GOLDEN["elasticity_stratified_3d"]
    for g, w in zip(got, want):
        assert np.isfinite(g)
        assert abs(g - w) / abs(w) < 2e-3, (got, want)
