"""f64-accurate ITERATIVE macro path (round 3).

Above ``direct_threshold`` the macro solve is CG; for elasticity those
systems reach κ~1e7, where merely STORING the matrix in f32 costs
percent-level solution error (the reason the direct path has always been
f64).  The CG path now assembles in f64 too (``BaseHMM._macro_f64``) and
runs an f64 PCG whose multigrid V-cycle preconditioner is applied in f32
on TPU (``ops/solvers.py::_prec_in_f32``) — preconditioner precision
changes only the iteration count, never the attainable accuracy, so the
Krylov loop pays emulated-f64 cost only for the SpMV and vector updates.

These CPU tests force the f32-preconditioner cast via ``HOMMX_MG_PREC=f32``
to pin the EXACT mixed program the TPU runs against the native-f64 direct
solve.  Reference anchor: the GAMG-preconditioned distributed KSP on the
elasticity examples (``examples/linear_elasticity/rotated_fibers.py:98``,
``hmm.py:157,482-483``), which is f64 throughout under PETSc.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hommx_tpu import (
    LinearElasticityHMM,
    create_box,
    create_unit_cube,
    dirichletbc,
)
from hommx_tpu.meshes import create_box as _create_box
from hommx_tpu.models.common import MacroSystem, macro_precs
from hommx_tpu.ops.function_space import boundary_dofs
from hommx_tpu.ops.solvers import _prec_in_f32, dense_solve_ell, solve_ell
from hommx_tpu.utils.options import SolverOptions
from hommx_tpu.utils.validation import hooke_tensor

from tests.test_mixed_refine import _hooke, _system


def test_prec_in_f32_policy(monkeypatch):
    # f32 Krylov loops never cast (they already match the V-cycle dtype)
    monkeypatch.setenv("HOMMX_MG_PREC", "f32")
    assert not _prec_in_f32(jnp.float32)
    assert _prec_in_f32(jnp.float64)
    monkeypatch.setenv("HOMMX_MG_PREC", "native")
    assert not _prec_in_f32(jnp.float64)


def test_f64_cg_with_f32_vcycle_reaches_f64(monkeypatch):
    """solve_ell on an ill-conditioned f64 beam-elasticity system with the
    forced f32 V-cycle matches the native-f64 direct solve to f64 level,
    with a finite (preconditioned) iteration count."""
    mesh = _create_box([[0, 0, 0], [1, 0.4, 0.1]], [8, 4, 4])
    sys, vals_bc, b_bc = _system(mesh, 3, _hooke(3, 1e4), "tensor4")
    assert b_bc.dtype == jnp.float64 and sys.mg is not None
    x_ref = dense_solve_ell(vals_bc, sys.cols, b_bc)

    opts = SolverOptions(method="cg", maxiter=3000)
    mg, amg = macro_precs(sys, opts)
    assert mg is not None  # the f64 route keeps the preconditioner

    monkeypatch.setenv("HOMMX_MG_PREC", "f32")
    x32, k32, _ = solve_ell(vals_bc, sys.cols, b_bc, opts, dia=sys.dia, mg=mg)
    monkeypatch.setenv("HOMMX_MG_PREC", "native")
    x64, k64, _ = solve_ell(vals_bc, sys.cols, b_bc, opts, dia=sys.dia, mg=mg)

    # the comparison is κ·eps_f64-limited (κ ≈ 3.8e9 equilibrated): both
    # sides are at the f64 limit, so they agree to ~1e-7, not 1e-11 —
    # same tolerance rationale as test_mixed_refine's beam gate
    scale = float(jnp.max(jnp.abs(x_ref)))
    assert float(jnp.max(jnp.abs(x32 - x_ref))) < 1e-6 * scale
    assert float(jnp.max(jnp.abs(x64 - x_ref))) < 1e-6 * scale
    # the cast (+ the f32 bottom-level Gershgorin shift) costs iterations,
    # not accuracy — measured 52 vs 10 native on this κ=3.8e9 system,
    # still far from the unpreconditioned thousands
    assert int(k64) < 100
    assert int(k32) < 100


def test_f64_cg_with_f32_amg_vcycle_reaches_f64(monkeypatch):
    """The UNSTRUCTURED analogue of the f32-V-cycle gate: an f64 Delaunay
    system above the direct cap takes the aggregation-AMG branch of
    ``solve_ell``; with the forced f32 cast (``amg_setup(...,
    f32_bottom_guard=True)``) it must still match the native-f64 direct
    solve to f64 level."""
    from tests.test_amg import _delaunay_mesh, _system as _amg_system

    mesh = _delaunay_mesh(72)  # 5329 dofs > direct_threshold
    _, sys, vals_bc, b_bc = _amg_system(mesh)
    assert b_bc.dtype == jnp.float64 and sys.mg is None
    x_ref = dense_solve_ell(vals_bc, sys.cols, b_bc)

    opts = SolverOptions(method="cg", maxiter=3000)
    mg, amg = macro_precs(sys, opts)
    assert mg is None and amg is not None

    monkeypatch.setenv("HOMMX_MG_PREC", "f32")
    x32, k32, _ = solve_ell(vals_bc, sys.cols, b_bc, opts, amg=amg)
    monkeypatch.setenv("HOMMX_MG_PREC", "native")
    x64, k64, _ = solve_ell(vals_bc, sys.cols, b_bc, opts, amg=amg)

    scale = float(jnp.max(jnp.abs(x_ref)))
    assert float(jnp.max(jnp.abs(x32 - x_ref))) < 1e-9 * scale
    assert float(jnp.max(jnp.abs(x64 - x_ref))) < 1e-9 * scale
    # the cast costs only iterations, bounded like the structured case
    assert int(k64) < 100
    assert int(k32) < 100


def test_elasticity_hmm_cg_route_matches_direct(monkeypatch):
    """End-to-end: an elasticity HMM forced onto the CG macro route takes
    the f64 assembly + f64 PCG + f32 V-cycle path and reproduces the
    direct-path solution to f64 level."""
    monkeypatch.setenv("HOMMX_MG_PREC", "f32")

    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0 * (1 + 0.001 * x[0]), 0.001)
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)

    def build(opts):
        macro = create_box([[0, 0, 0], [1.0, 0.4, 0.1]], [6, 4, 2])
        micro = create_unit_cube(3)
        s = LinearElasticityHMM(
            macro, A_el, lambda x: jnp.array([0.0, 0.0, -0.01]), micro,
            2**-5, dtype=jnp.float64, options_global_solve=opts,
        )
        s.set_boundary_conditions(
            dirichletbc(
                np.zeros(3),
                boundary_dofs(s.function_space, lambda x: np.isclose(x[0], 0)),
                s.function_space,
            )
        )
        return s

    sd = build(SolverOptions(method="direct"))
    ud = sd.solve()

    sc = build(SolverOptions(method="cg"))
    assert sc._macro_f64 and sc._macro_method == "cg"
    uc = sc.solve()
    assert sc.diagnostics["macro_iterations"] > 0

    rel = float(
        np.linalg.norm(uc.array - ud.array) / np.linalg.norm(ud.array)
    )
    assert rel < 1e-9, rel
