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


def _hooke2(mu, lam):
    I = jnp.eye(2)
    return (
        lam * jnp.einsum("ij,kl->ijkl", I, I)
        + mu * (jnp.einsum("ik,jl->ijkl", I, I) + jnp.einsum("il,jk->ijkl", I, I))
    )


def test_p2_vector_elasticity_quadratic_exact():
    """Vector P2: quadratic displacement fields are captured exactly.
    u = (x², y²), constant Hooke (μ=1, λ=1): σ = λ tr(e) I + 2μ e with
    e = diag(2x, 2y); f = -div σ = -(2λ+4μ, 2λ+4μ) constant."""
    mesh = create_unit_square(4, 4)
    V = FunctionSpace(mesh, 2, degree=2)
    exact = lambda x: jnp.array([x[0] ** 2, x[1] ** 2])
    g = Function(V).interpolate(exact)
    bcs = [dirichletbc(g, boundary_dofs(V))]
    mu, lam = 1.0, 1.0
    f = lambda x: jnp.array([-(2 * lam + 4 * mu), -(2 * lam + 4 * mu)])
    u = fem_solve(V, lambda x: _hooke2(mu, lam), f, bcs, quad_degree=4, rhs_degree=4)
    err = l2_norm_space(u, exact=exact)
    assert err < 1e-10, err


def test_p2_point_eval_and_cross_mesh():
    """P2 point evaluation is exact for quadratics (at arbitrary points, not
    just nodes) and supports cross-mesh interpolation in both directions."""
    from hommx_tpu.ops.interpolation import eval_p1, interpolate_nonmatching

    exact = lambda x: 1 + x[0] ** 2 + 2 * x[0] * x[1]
    V2 = FunctionSpace(create_unit_square(6, 6), 1, degree=2)
    u2 = Function(V2).interpolate(exact)
    pts = np.random.default_rng(0).uniform(0.05, 0.95, (40, 2))
    vals = np.asarray(eval_p1(u2, pts))
    ref = np.array([float(exact(p)) for p in pts])
    assert np.abs(vals - ref).max() < 1e-12

    # P2 -> P1 on a non-nested mesh: nodal values exact (source is exact)
    V1 = FunctionSpace(create_unit_square(9, 9), 1)
    g1 = interpolate_nonmatching(V1, u2)
    ref1 = np.array([float(exact(p)) for p in V1.tabulate_dof_coordinates()])
    assert np.abs(np.asarray(g1.array) - ref1).max() < 1e-12

    # P1 -> P2: source is only piecewise linear, so compare against the
    # source's own affine extension (cell-located eval), not the quadratic
    u1 = Function(V1).interpolate(exact)
    V2b = FunctionSpace(create_unit_square(7, 7), 1, degree=2)
    g2 = interpolate_nonmatching(V2b, u1)
    ref2 = np.asarray(eval_p1(u1, V2b.tabulate_dof_coordinates()))
    assert np.abs(np.asarray(g2.array) - ref2).max() < 1e-12


def test_p2_vector_beats_p1():
    """Clamped beam: P2 displacement at the same mesh is closer to a fine-P1
    reference than P1 is (softening with element order)."""
    import numpy as _np

    from hommx_tpu import create_rectangle

    mu, lam = 1.0, 1.25
    f = lambda x: jnp.array([0.0, -0.01])

    def clamp(V):
        return [dirichletbc(_np.zeros(2),
                            boundary_dofs(V, lambda x: _np.isclose(x[0], 0)), V)]

    mesh = create_rectangle([[0, 0], [1.0, 0.2]], [10, 3])
    V1 = FunctionSpace(mesh, 2, degree=1)
    V2 = FunctionSpace(mesh, 2, degree=2)
    u1 = fem_solve(V1, lambda x: _hooke2(mu, lam), f, clamp(V1))
    u2 = fem_solve(V2, lambda x: _hooke2(mu, lam), f, clamp(V2), quad_degree=4)
    tip1 = float(jnp.min(u1.array.reshape(-1, 2)[:, 1]))
    tip2 = float(jnp.min(u2.array.reshape(-1, 2)[:, 1]))
    # fine P1 reference
    ref = create_rectangle([[0, 0], [1.0, 0.2]], [80, 24])
    Vr = FunctionSpace(ref, 2, degree=1)
    ur = fem_solve(Vr, lambda x: _hooke2(mu, lam), f, clamp(Vr))
    tipr = float(jnp.min(ur.array.reshape(-1, 2)[:, 1]))
    assert abs(tip2 - tipr) < abs(tip1 - tipr) / 3, (tip1, tip2, tipr)
