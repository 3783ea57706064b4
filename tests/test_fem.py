"""Single-scale FEM layer tests (macro stage in isolation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import (
    PoissonFEM,
    SolverOptions,
    create_interval,
    create_unit_square,
    dirichletbc,
)
from hommx_tpu.models.fem import fem_solve
from hommx_tpu.ops.function_space import Function, FunctionSpace, boundary_dofs

from tests.utils import calc_l2_norm


def test_poisson_manufactured_convergence():
    """-Δu = 2π² sin(πx)sin(πy), u = sin·sin: O(h²) L² convergence."""
    f = lambda x: 2 * jnp.pi**2 * jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])
    exact = lambda x: jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])
    errs = []
    for n in (8, 16, 32):
        mesh = create_unit_square(n, n)
        u = PoissonFEM(mesh, lambda x: 1.0, f).solve()
        errs.append(calc_l2_norm(mesh, u, exact=exact))
    assert errs[1] / errs[0] < 0.3
    assert errs[2] / errs[1] < 0.3


def test_poisson_1d():
    """1D diffusion (reference ``helpers.py:26-65`` capability)."""
    mesh = create_interval(64)
    V = FunctionSpace(mesh, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V), V)]
    # -u'' = 1, u(0)=u(1)=0 -> u = x(1-x)/2
    u = fem_solve(V, lambda x: 1.0, lambda x: 1.0, bcs)
    exact = lambda x: x[0] * (1 - x[0]) / 2
    err = calc_l2_norm(mesh, u, exact=exact)
    assert err < 1e-4


def test_nonzero_dirichlet_lifting():
    """Laplace with u = 1 + x² + y² on the boundary, A=1, f=-4 ⇒ exact P1
    nodal solution is the interpolant (for f=−Δu constant)."""
    mesh = create_unit_square(16, 16)
    V = FunctionSpace(mesh, 1)
    g = Function(V).interpolate(lambda x: 1 + x[0] ** 2 + x[1] ** 2)
    bcs = [dirichletbc(g, boundary_dofs(V))]
    u = fem_solve(V, lambda x: 1.0, lambda x: -4.0, bcs)
    err = calc_l2_norm(mesh, u, exact=lambda x: 1 + x[0] ** 2 + x[1] ** 2)
    assert err < 5e-3  # dominated by O(h²) interpolation error of the exact u


def test_cg_matches_direct():
    mesh = create_unit_square(12, 12)
    V = FunctionSpace(mesh, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V), V)]
    f = lambda x: jnp.sin(3 * x[0]) + x[1]
    u_dir = fem_solve(V, lambda x: 1.0 + x[0], f, bcs, SolverOptions(method="direct"))
    u_cg = fem_solve(
        V, lambda x: 1.0 + x[0], f, bcs, SolverOptions(method="cg", atol=1e-14, rtol=1e-14)
    )
    assert float(jnp.max(jnp.abs(u_dir.array - u_cg.array))) < 1e-9
    assert u_cg.solver_iterations > 0


def test_matrix_coefficient_fem():
    """Anisotropic matrix coefficient: check symmetry + solution positivity."""
    mesh = create_unit_square(10, 10)
    V = FunctionSpace(mesh, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V), V)]
    M = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    u = fem_solve(V, lambda x: M, lambda x: 1.0, bcs)
    vals = np.asarray(u.array)
    assert vals.max() > 0
    interior = np.setdiff1d(np.arange(V.num_dofs), boundary_dofs(V))
    assert (vals[interior] > 0).all()
