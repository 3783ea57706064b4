"""Poisson HMM integration tests — mirror of the reference suite
(``test/integration/test_integration_poisson.py``).  Fast versions run in CI;
``--runslow`` enables the exact reference-sized fine-mesh gates.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import (
    PoissonFEM,
    PoissonHMM,
    PoissonPeriodicHMM,
    PoissonStratifiedHMM,
    create_unit_cube,
    create_unit_square,
    dirichletbc,
)
from hommx_tpu.models.fem import fem_solve
from hommx_tpu.ops.function_space import Function, FunctionSpace, boundary_dofs

from tests.utils import (
    calc_l2_error,
    calc_l2_norm,
    relative_l2_vs_reference,
    zero_dirichlet_bcs,
)

MESH_N = 15
EPS = 0.1 / MESH_N


@pytest.fixture(scope="module")
def macro_mesh():
    return create_unit_square(MESH_N, MESH_N)


@pytest.fixture(scope="module")
def micro_mesh():
    return create_unit_square(MESH_N, MESH_N)


def test_analytical_example_1(macro_mesh, micro_mesh):
    """Reference ``test_integration_poisson.py:121-143``: laminate coefficient
    with closed-form homogenized limit; gate: squared L² error < 5e-5."""

    def A(x, y):
        return 1.0 / (2.0 + jnp.cos(2 * jnp.pi * y[0]))

    def f(x):
        return (
            jnp.pi**2
            * (0.5 + 1.0 / jnp.sqrt(3.0))
            * jnp.sin(jnp.pi * x[0])
            * jnp.sin(jnp.pi * x[1])
        )

    def solution(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    u = PoissonHMM(macro_mesh, A, f, micro_mesh, EPS).solve()
    err = calc_l2_norm(macro_mesh, u, exact=solution)
    assert err**2 < 5e-5, f"L^2 error too big {err**2=}"


def test_analytical_example_2(macro_mesh, micro_mesh):
    """Reference ``test_integration_poisson.py:146-185``: x-dependent laminate."""

    def A(x, y):
        return 0.33 + 0.15 * (jnp.sin(2 * jnp.pi * x[0]) + jnp.sin(2 * jnp.pi * y[0]))

    def f(x):
        return (
            3.25696945235949
            * jnp.sqrt(
                (0.454545454545455 * jnp.sin(2 * jnp.pi * x[0]) + 1) ** 2
                - 0.206611570247934
            )
            * jnp.sin(jnp.pi * x[0])
            * jnp.sin(jnp.pi * x[1])
            + jnp.pi**2
            * (0.15 * jnp.sin(2 * jnp.pi * x[0]) + 0.33)
            * jnp.sin(jnp.pi * x[0])
            * jnp.sin(jnp.pi * x[1])
            - 2.96088132032681
            * (0.454545454545455 * jnp.sin(2 * jnp.pi * x[0]) + 1)
            * jnp.sin(jnp.pi * x[1])
            * jnp.cos(jnp.pi * x[0])
            * jnp.cos(2 * jnp.pi * x[0])
            / jnp.sqrt(
                (0.454545454545455 * jnp.sin(2 * jnp.pi * x[0]) + 1) ** 2
                - 0.206611570247934
            )
        )

    def solution(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    u = PoissonHMM(macro_mesh, A, f, micro_mesh, EPS).solve()
    err = calc_l2_norm(macro_mesh, u, exact=solution)
    assert err**2 < 5e-5, f"L^2 error too big {err**2=}"


def test_periodic_poisson_hmm_matches_periodic_homogenization(macro_mesh, micro_mesh):
    """Exact identity gate (reference ``test_integration_poisson.py:188-240``):
    for A = A(y), PoissonHMM ≡ PoissonPeriodicHMM in solution (1e-12) and
    assembled matrix (Frobenius 1e-8)."""

    def A_y(y):
        return 2.0 + jnp.sin(2 * jnp.pi * y[0])

    def A(x, y):
        return A_y(y)

    f = lambda x: 1.0

    hmm = PoissonHMM(macro_mesh, A, f, micro_mesh, EPS)
    hmm.set_boundary_conditions(zero_dirichlet_bcs(hmm.function_space))
    u_hmm = hmm.solve()

    periodic = PoissonPeriodicHMM(macro_mesh, A_y, f, micro_mesh, EPS)
    periodic.set_boundary_conditions(zero_dirichlet_bcs(periodic.function_space))
    u_periodic = periodic.solve()

    error = calc_l2_error(macro_mesh, u_hmm, u_periodic)
    assert error < 1e-12, f"PoissonHMM and PoissonPeriodicHMM differ: {error=}"

    A_hmm = hmm.matrix_dense()
    A_per = periodic.matrix_dense()
    assert A_hmm.shape == A_per.shape
    matrix_diff = np.linalg.norm(A_hmm - A_per)
    assert matrix_diff < 1e-8, f"Stiffness matrices differ: {matrix_diff=}"


def test_3d_no_oscillation_matrix_identity():
    """3D fast gate: for A = A(x) (no y-dependence) the HMM matrix equals the
    plain FEM matrix with centroid quadrature *exactly* (A*(c_T) = A(c_T)·I)."""
    macro = create_unit_cube(4)
    micro = create_unit_cube(3)

    A = lambda x, y: 1.1 + x[0]
    f = lambda x: 1.0

    hmm = PoissonHMM(macro, A, f, micro, 1 / 8)
    u_hmm = hmm.solve()

    V = FunctionSpace(macro, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V), V)]
    u_fem = fem_solve(V, lambda x: 1.1 + x[0], f, bcs, quad_degree=1)

    err = calc_l2_error(macro, u_hmm, u_fem)
    assert err < 1e-12, f"{err=}"


@pytest.mark.slow
def test_3d(tmp_path):
    """Reference ``test_integration_poisson.py:243-294``: 6³ macro HMM vs 64³
    fine FEM, eps = 2⁻³, relative L² < 0.05."""
    eps = 1 / 2**3
    macro = create_unit_cube(6)
    micro = create_unit_cube(6)

    A = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])
    f = lambda x: 1.0

    phmm = PoissonHMM(macro, A, f, micro, eps)
    u_phmm = phmm.solve()

    ref = create_unit_cube(2**6)
    V_ref = FunctionSpace(ref, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V_ref), V_ref)]
    u_ref = fem_solve(
        V_ref, lambda x: A(x, x / eps), f, bcs, quad_degree=2,
    )
    rel = relative_l2_vs_reference(u_phmm, u_ref)
    assert rel < 0.05, f"{rel=}"


def _darcy_bcs(V):
    lo, hi = V.mesh.bounding_box()
    left = boundary_dofs(V, lambda x: np.isclose(x[0], lo[0]))
    right = boundary_dofs(V, lambda x: np.isclose(x[0], hi[0]))
    return [dirichletbc(1.0, left, V), dirichletbc(0.0, right, V)]


def _bc_fn(x):
    return 1 + x[0] ** 2 + x[1] ** 2


def _custom_bc_case(macro_mesh, micro_mesh, eps, ref_n, A, atol):
    """Shared body of the custom-BC tests (reference
    ``test_integration_poisson.py:322-473``)."""
    f = lambda x: 1.0

    phmm = PoissonHMM(macro_mesh, A, f, micro_mesh, eps)
    V = phmm.function_space
    bc_interp = Function(V).interpolate(_bc_fn)
    phmm.set_boundary_conditions(dirichletbc(bc_interp, boundary_dofs(V)))
    u_phmm = phmm.solve()

    ref = create_unit_square(ref_n, ref_n)
    V_ref = FunctionSpace(ref, 1)
    bc_ref = Function(V_ref).interpolate(_bc_fn)
    bcs = [dirichletbc(bc_ref, boundary_dofs(V_ref))]
    u_ref = fem_solve(V_ref, lambda x: A(x, x / eps), f, bcs, quad_degree=2)

    rel = relative_l2_vs_reference(u_phmm, u_ref)
    assert rel < atol, f"{rel=} {atol=}"


def test_custom_boundary_condition(macro_mesh, micro_mesh):
    """Fast variant: eps = 2⁻⁴ against a 256² fine mesh."""
    A = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])
    _custom_bc_case(macro_mesh, micro_mesh, 2**-4, 2**8, A, 4e-3)


def test_custom_boundary_condition_no_homogenization(macro_mesh, micro_mesh):
    """A = A(x) only: HMM reduces to coarse FEM (reference ``:398-473``)."""
    A = lambda x, y: 1.1 + x[0]
    _custom_bc_case(macro_mesh, micro_mesh, 2**-4, 2**8, A, 1e-3)


@pytest.mark.slow
def test_custom_boundary_condition_reference_sized(macro_mesh, micro_mesh):
    """Exact reference gate: eps = 2⁻⁶ vs 1024² fine FEM, rel L² < 8e-4."""
    A = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])
    _custom_bc_case(macro_mesh, micro_mesh, 2**-6, 2**10, A, 8e-4)


@pytest.mark.slow
def test_custom_boundary_condition_no_homogenization_reference_sized(
    macro_mesh, micro_mesh
):
    A = lambda x, y: 1.1 + x[0]
    _custom_bc_case(macro_mesh, micro_mesh, 2**-6, 2**10, A, 5e-4)


def _stratified_case(macro_mesh, micro_mesh, eps, ref_n, atol):
    """Reference ``test_integration_poisson.py:481-572``: genuinely 2D
    rotation map θ."""
    A = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])
    f = lambda x: 1.0
    tf = 0.2

    def theta(x):
        factor = tf * jnp.cos(jnp.pi / 2 * x[1]) * jnp.cos(jnp.pi / 2 * x[0])
        return jnp.array([x[0] - factor * x[1], x[1] + factor * x[0]])

    def Dtheta(x):
        a0 = jnp.pi / 2 * x[0]
        a1 = jnp.pi / 2 * x[1]
        fac = tf * jnp.cos(a0) * jnp.cos(a1)
        df0 = -tf * (jnp.pi / 2) * jnp.sin(a0) * jnp.cos(a1)
        df1 = -tf * (jnp.pi / 2) * jnp.cos(a0) * jnp.sin(a1)
        return jnp.array(
            [[1 - x[1] * df0, fac + x[0] * df0], [-fac - x[1] * df1, 1 + x[0] * df1]]
        )

    phmm = PoissonStratifiedHMM(macro_mesh, A, f, micro_mesh, eps, Dtheta)
    phmm.set_boundary_conditions(zero_dirichlet_bcs(phmm.function_space))
    u_phmm = phmm.solve()

    ref = create_unit_square(ref_n, ref_n)
    V_ref = FunctionSpace(ref, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V_ref), V_ref)]
    u_ref = fem_solve(V_ref, lambda x: A(x, theta(x) / eps), f, bcs, quad_degree=2)

    rel = relative_l2_vs_reference(u_phmm, u_ref)
    assert rel < atol, f"{rel=} {atol=}"


def test_stratified(macro_mesh, micro_mesh):
    _stratified_case(macro_mesh, micro_mesh, 2**-4, 2**8, 2e-2)


@pytest.mark.slow
def test_stratified_reference_sized(macro_mesh, micro_mesh):
    """Exact reference gate: eps = 2⁻⁶ vs 1024², rel L² < 1e-2."""
    _stratified_case(macro_mesh, micro_mesh, 2**-6, 2**10, 1e-2)
