"""Mixed-precision refinement solve (ops/solvers.py::_mixed_refine_ell).

This is the EXACT program the TPU direct macro path runs (dense_solve_ell
routes to it on the tpu/axon backends); it is backend-agnostic by
construction so these CPU tests pin its accuracy contract against the
native-f64 Cholesky: f32 factorization + explicit-inverse correction +
early-exit f64 refinement must reach f64-level accuracy, including on the
ill-conditioned thin-beam elasticity system the fixed-8-sweep version was
tuned on (reference direct-solver anchor:
``test/integration/test_integration_poisson.py:207-212``).
"""

import numpy as np
import jax.numpy as jnp

from hommx_tpu.meshes import create_box, create_unit_square
from hommx_tpu.models.common import MacroSystem
from hommx_tpu.models.fem import fem_assemble_values, _load_vector
from hommx_tpu.ops.assembly import apply_dirichlet
from hommx_tpu.ops.function_space import (
    FunctionSpace,
    dirichletbc,
    locate_dofs_geometrical,
)
from hommx_tpu.ops.solvers import _mixed_refine_ell, dense_solve_ell


def _system(mesh, bs, coeff, kind):
    V = FunctionSpace(mesh, bs)
    sys = MacroSystem(V, jnp.float64)
    vals = fem_assemble_values(sys, coeff, kind, 2)
    rhs = (
        (lambda x: jnp.asarray(1.0))
        if bs == 1
        else (lambda x: jnp.zeros(bs).at[-1].set(-1.0))
    )
    b = _load_vector(sys, rhs, 2)
    dofs = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 0.0))
    bc = dirichletbc(np.zeros(bs) if bs > 1 else 0.0, dofs, V)
    from hommx_tpu.models.common import merge_bcs

    mask, bvals = merge_bcs([bc], V.num_dofs, jnp.float64)
    vals_bc, b_bc = apply_dirichlet(
        vals, sys.cols, sys.diag_slots, b, mask, bvals, dia=sys.dia
    )
    return sys, vals_bc, b_bc


def _hooke(d, contrast):
    def hooke(x):
        # sharp two-phase stiffness: drives the condition number up
        mu = jnp.where(x[0] > 0.5, contrast, 1.0)
        lam = 2.0 * mu
        eye = jnp.eye(d)
        return lam * jnp.einsum("ij,kl->ijkl", eye, eye) + mu * (
            jnp.einsum("ik,jl->ijkl", eye, eye)
            + jnp.einsum("il,jk->ijkl", eye, eye)
        )

    return hooke


def test_mixed_refine_matches_f64_poisson():
    mesh = create_unit_square(16, 16)
    sys, vals_bc, b_bc = _system(
        mesh, 1, lambda x: 1.0 + 0.5 * jnp.sin(3 * x[0]) * x[1], "scalar"
    )
    x64 = dense_solve_ell(vals_bc, sys.cols, b_bc)  # native f64 Cholesky
    x = _mixed_refine_ell(vals_bc, sys.cols, b_bc)
    scale = float(jnp.max(jnp.abs(x64)))
    assert float(jnp.max(jnp.abs(x - x64))) < 1e-11 * scale


def test_mixed_refine_matches_f64_beam_elasticity():
    """Thin-beam 3D elasticity with 1e4 stiffness contrast — the
    ill-conditioned regime the mixed-precision path exists for."""
    mesh = create_box([[0, 0, 0], [1, 0.4, 0.1]], [8, 4, 4])
    sys, vals_bc, b_bc = _system(mesh, 3, _hooke(3, 1e4), "tensor4")
    x64 = dense_solve_ell(vals_bc, sys.cols, b_bc)
    x = _mixed_refine_ell(vals_bc, sys.cols, b_bc)
    scale = float(jnp.max(jnp.abs(x64)))
    # the comparison itself is κ·eps_f64-limited (κ ≈ 3.8e9 equilibrated):
    # both solves are at the f64 limit, so they agree to ~1e-7, not 1e-11
    assert float(jnp.max(jnp.abs(x - x64))) < 1e-6 * scale


def test_mixed_refine_early_exit_is_safe():
    """A well-conditioned system converges (early exit) to the same
    accuracy as a hard sweep cap."""
    mesh = create_unit_square(8, 8)
    sys, vals_bc, b_bc = _system(mesh, 1, lambda x: 2.0, "scalar")
    x_few = _mixed_refine_ell(vals_bc, sys.cols, b_bc)
    x_many = _mixed_refine_ell(vals_bc, sys.cols, b_bc, max_sweeps=64)
    assert float(jnp.max(jnp.abs(x_few - x_many))) == 0.0

    # zero RHS must return exactly zero, not NaN
    x0 = _mixed_refine_ell(vals_bc, sys.cols, jnp.zeros_like(b_bc))
    assert float(jnp.max(jnp.abs(x0))) == 0.0


def test_mixed_refine_scan_backend_matches_xla():
    """The 'scan' factorization backend (fixed-shape blocked Cholesky +
    blocked substitution, ops/batched_chol.py) solves to the same f64
    level as the 'xla' backend, including on the ill-conditioned beam
    (where its padded identity rows and Gershgorin shift both engage)."""
    mesh = create_unit_square(16, 16)
    sys, vals_bc, b_bc = _system(
        mesh, 1, lambda x: 1.0 + 0.5 * jnp.sin(3 * x[0]) * x[1], "scalar"
    )
    x_x = _mixed_refine_ell(vals_bc, sys.cols, b_bc, factor_backend="xla")
    x_s = _mixed_refine_ell(vals_bc, sys.cols, b_bc, factor_backend="scan")
    scale = float(jnp.max(jnp.abs(x_x)))
    assert float(jnp.max(jnp.abs(x_s - x_x))) < 1e-11 * scale

    mesh = create_box([[0, 0, 0], [1, 0.4, 0.1]], [8, 4, 4])
    sys, vals_bc, b_bc = _system(mesh, 3, _hooke(3, 1e4), "tensor4")
    x64 = dense_solve_ell(vals_bc, sys.cols, b_bc)
    x_s = _mixed_refine_ell(vals_bc, sys.cols, b_bc, factor_backend="scan")
    scale = float(jnp.max(jnp.abs(x64)))
    assert float(jnp.max(jnp.abs(x_s - x64))) < 1e-6 * scale


def test_gather_assembly_matches_scatter():
    """The gather-formulation assembly (per-slot contributor table, used on
    TPU where scatter-add serializes) reproduces the scatter-add assembly
    to reassociation level on scalar and vector systems."""
    from hommx_tpu.models.fem import fem_assemble_values, _local_matrices
    from hommx_tpu.models.common import MacroSystem
    from hommx_tpu.ops.assembly import assemble_ell, build_gather_assembly
    from hommx_tpu.ops.function_space import FunctionSpace

    for mesh, bs, coeff, kind in [
        (create_unit_square(12, 9), 1,
         lambda x: 1.0 + 0.5 * jnp.sin(3 * x[0]) * x[1], "scalar"),
        (create_box([[0, 0, 0], [1, 0.4, 0.1]], [6, 3, 3]), 3,
         _hooke(3, 1e3), "tensor4"),
    ]:
        V = FunctionSpace(mesh, bs)
        sys = MacroSystem(V, jnp.float64)
        S_loc = _local_matrices(sys, coeff, kind, 2)
        v_scatter = assemble_ell(sys.pattern, S_loc, sys.slots)
        g = build_gather_assembly(sys.pattern)
        assert g is not None
        v_gather = assemble_ell(sys.pattern, S_loc, sys.slots, gather=g)
        scale = float(jnp.max(jnp.abs(v_scatter)))
        assert float(jnp.max(jnp.abs(v_gather - v_scatter))) < 1e-13 * scale


def test_mixed_refine_dia_matvec_matches_ell():
    """With a DIA view (structured meshes) the refinement residual SpMV
    runs as shifted multiply-adds; trajectories differ only by
    reassociation, both reaching the f64 limit."""
    mesh = create_unit_square(16, 16)
    sys, vals_bc, b_bc = _system(
        mesh, 1, lambda x: 1.0 + 0.5 * jnp.sin(3 * x[0]) * x[1], "scalar"
    )
    assert sys.dia is not None
    x_ell = _mixed_refine_ell(vals_bc, sys.cols, b_bc)
    x_dia = _mixed_refine_ell(vals_bc, sys.cols, b_bc, dia=sys.dia)
    scale = float(jnp.max(jnp.abs(x_ell)))
    assert float(jnp.max(jnp.abs(x_dia - x_ell))) < 1e-10 * scale
