"""Cross-strategy consistency sweep: every micro-engine configuration must
produce the same homogenized tensors as the f64 direct (Cholesky) solver.
One deterministic sweep over {dim} x {bs} x {micro_degree} x {strategy,
preconditioner, scaling, rank} catches interaction bugs the per-feature
tests cannot."""

import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import create_unit_cube, create_unit_square
from hommx_tpu.micro.engine import MicroEngine
from tests.utils import hooke_tensor


def _coeff(dim, kind):
    if kind == "scalar":
        return lambda x, y: 1.5 + x[0] + jnp.sin(2 * jnp.pi * y[0]) * 0.8
    return hooke_tensor(
        dim, lambda x, y: 1.0 + 0.5 * jnp.sin(2 * jnp.pi * y[0]), lambda x, y: 1.0
    )


CASES = [
    # (dim, bs, kind, micro_degree, engine_kwargs)
    (2, 1, "scalar", 1, dict(solver="pcg")),
    (2, 1, "scalar", 1, dict(solver="pcg", diag_scale=False)),
    (2, 1, "scalar", 1, dict(solver="pcg", coeff_rank=2)),
    (2, 1, "scalar", 1, dict(solver="pcg", cell_prec="fft")),
    (2, 1, "scalar", 1, dict(solver="pcg", coeff_rank=2, cell_prec="fft")),
    (2, 1, "scalar", 2, dict(solver="pcg")),
    (2, 2, "tensor4", 1, dict(solver="pcg")),
    (2, 2, "tensor4", 2, dict(solver="pcg")),
    (3, 1, "scalar", 1, dict(solver="pcg")),
    (3, 1, "scalar", 1, dict(solver="pcg", cell_prec="fft")),
    (3, 3, "tensor4", 1, dict(solver="pcg")),
]


@pytest.mark.parametrize("dim,bs,kind,deg,kw", CASES)
def test_strategy_matches_direct(dim, bs, kind, deg, kw):
    mesh = create_unit_square(8, 8) if dim == 2 else create_unit_cube(3)
    A = _coeff(dim, kind)
    centers = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (12, dim)))
    ref_eng = MicroEngine(
        mesh, bs=bs, coeff_kind=kind, dtype=jnp.float64, micro_degree=deg
    )  # auto -> cholesky at f64
    ref = np.asarray(ref_eng.tensors_for_centers(A, centers))
    eng = MicroEngine(
        mesh, bs=bs, coeff_kind=kind, dtype=jnp.float64, micro_degree=deg, **kw
    )
    out = np.asarray(eng.tensors_for_centers(A, centers))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-8, (kw, err)


@pytest.mark.parametrize("dim,bs,kind,deg,kw", CASES)
def test_strategy_f32_close_to_f64(dim, bs, kind, deg, kw):
    """The same sweep at f32 must land within the documented tolerance."""
    mesh = create_unit_square(8, 8) if dim == 2 else create_unit_cube(3)
    A = _coeff(dim, kind)
    centers64 = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (12, dim)))
    ref_eng = MicroEngine(
        mesh, bs=bs, coeff_kind=kind, dtype=jnp.float64, micro_degree=deg
    )
    ref = np.asarray(ref_eng.tensors_for_centers(A, centers64))
    eng = MicroEngine(
        mesh, bs=bs, coeff_kind=kind, dtype=jnp.float32, micro_degree=deg, **kw
    )
    out = np.asarray(
        eng.tensors_for_centers(A, centers64.astype(jnp.float32))
    )
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 5e-4, (kw, err)
