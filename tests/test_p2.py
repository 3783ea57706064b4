"""P2 (quadratic) element tests: convergence order, BCs, 3D, structure."""

import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import create_unit_cube, create_unit_square, dirichletbc
from hommx_tpu.models.fem import fem_solve
from hommx_tpu.ops.function_space import Function, FunctionSpace, boundary_dofs
from hommx_tpu.utils.validation import l2_norm_space


def test_p2_space_structure():
    mesh = create_unit_square(4, 4)
    V = FunctionSpace(mesh, 1, degree=2)
    # 5x5 grid: 25 vertices; edges of a 4x4 right-diagonal triangulation:
    # horizontal 5*4 + vertical 5*4 + diagonal 16 = 56
    assert V.num_nodes == 25 + 56
    assert V.dofs_per_cell == 6
    # edge midpoints present in dof coordinates
    coords = V.tabulate_dof_coordinates()
    assert coords.shape == (81, 2)


def test_p2_partition_of_unity_and_gradients():
    from hommx_tpu.ops.p2 import p2_basis

    rng = np.random.default_rng(0)
    for d in (2, 3):
        xi = jnp.asarray(rng.uniform(0, 0.3, (5, d)))
        phi, dlam = p2_basis(xi, d)
        assert np.allclose(np.asarray(phi).sum(axis=1), 1.0, atol=1e-12)
        # the constant-1 function has zero gradient: Σ_k c[q,k,i] must be
        # the same for every barycentric direction i (since Σ_i ∇λ_i = 0)
        colsum = np.asarray(dlam).sum(axis=1)  # (nq, d+1)
        assert np.allclose(colsum, colsum[:, :1], atol=1e-12)


def test_p2_exactness_for_quadratics():
    """P2 interpolation of a quadratic is exact; the FEM solution of a
    problem whose exact solution is quadratic is nodally exact."""
    mesh = create_unit_square(5, 5)
    V = FunctionSpace(mesh, 1, degree=2)
    exact = lambda x: 1 + x[0] ** 2 + 2 * x[1] ** 2  # -Δu = -6
    g = Function(V).interpolate(exact)
    bcs = [dirichletbc(g, boundary_dofs(V))]
    u = fem_solve(V, lambda x: 1.0, lambda x: -6.0, bcs)
    err = l2_norm_space(u, exact=exact)
    assert err < 1e-10, err


def test_p2_convergence_third_order():
    """-Δu = 2π² sin sin: P2 converges at O(h³) in L²."""
    f = lambda x: 2 * jnp.pi**2 * jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])
    exact = lambda x: jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])
    errs = []
    for n in (4, 8, 16):
        mesh = create_unit_square(n, n)
        V = FunctionSpace(mesh, 1, degree=2)
        bcs = [dirichletbc(0.0, boundary_dofs(V), V)]
        u = fem_solve(V, lambda x: 1.0, f, bcs, quad_degree=4, rhs_degree=4)
        errs.append(l2_norm_space(u, exact=exact))
    rate1 = np.log2(errs[0] / errs[1])
    rate2 = np.log2(errs[1] / errs[2])
    assert rate2 > 2.7, (errs, rate1, rate2)


def test_p2_beats_p1_at_same_mesh():
    f = lambda x: 2 * jnp.pi**2 * jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])
    exact = lambda x: jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])
    mesh = create_unit_square(8, 8)
    V1 = FunctionSpace(mesh, 1, degree=1)
    V2 = FunctionSpace(mesh, 1, degree=2)
    u1 = fem_solve(V1, lambda x: 1.0, f, [dirichletbc(0.0, boundary_dofs(V1), V1)])
    u2 = fem_solve(
        V2, lambda x: 1.0, f, [dirichletbc(0.0, boundary_dofs(V2), V2)],
        quad_degree=4, rhs_degree=4,
    )
    e1 = l2_norm_space(u1, exact=exact)
    e2 = l2_norm_space(u2, exact=exact)
    assert e2 < e1 / 10


def test_p2_3d():
    mesh = create_unit_cube(3)
    V = FunctionSpace(mesh, 1, degree=2)
    exact = lambda x: x[0] ** 2 + x[1] ** 2 + x[2] ** 2  # -Δu = -6
    g = Function(V).interpolate(exact)
    bcs = [dirichletbc(g, boundary_dofs(V))]
    u = fem_solve(V, lambda x: 1.0, lambda x: -6.0, bcs)
    err = l2_norm_space(u, exact=exact)
    assert err < 1e-9, err


def test_p2_variable_coefficient():
    """div(A∇u) with A = 1+x: manufactured u = x(1-x) (1D-like in 2D);
    f = -d/dx((1+x)(1-2x)) = 4x - 1... solve and compare convergence."""
    exact = lambda x: jnp.sin(jnp.pi * x[0])
    # -d/dx((1+x) d/dx sin(pi x)) = pi^2 (1+x) sin(pi x) - pi cos(pi x)
    f = lambda x: jnp.pi**2 * (1 + x[0]) * jnp.sin(jnp.pi * x[0]) - jnp.pi * jnp.cos(
        jnp.pi * x[0]
    )
    errs = []
    for n in (4, 8):
        mesh = create_unit_square(n, n)
        V = FunctionSpace(mesh, 1, degree=2)
        g = Function(V).interpolate(exact)  # u = sin(πx) ≠ 0 on y-faces
        bcs = [dirichletbc(g, boundary_dofs(V))]
        u = fem_solve(V, lambda x: 1.0 + x[0], f, bcs, quad_degree=4, rhs_degree=5)
        errs.append(l2_norm_space(u, exact=exact))
    assert np.log2(errs[0] / errs[1]) > 2.6, errs


def test_p2_vector_not_implemented():
    mesh = create_unit_square(4, 4)
    V = FunctionSpace(mesh, 2, degree=2)
    with pytest.raises(NotImplementedError):
        fem_solve(
            V,
            lambda x: jnp.einsum("ik,jl->ijkl", jnp.eye(2), jnp.eye(2))
            + jnp.einsum("il,jk->ijkl", jnp.eye(2), jnp.eye(2)),
            lambda x: jnp.zeros(2),
            [],
        )
