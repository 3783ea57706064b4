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
