"""End-to-end differentiability of the HMM pipeline.

``build_pipeline`` is one traced program — coefficient → micro correctors
→ homogenized tensors → macro assembly → macro solve → u — and round 2
makes the macro solve differentiable on the ITERATIVE paths too, via an
implicit-function-theorem VJP (ops/solvers.py::make_implicit_solver; the
adjoint is one extra solve with the same symmetric operator).  This is a
capability the reference architecture cannot express: its cell and global
solves are opaque PETSc KSP calls (reference ``hmm.py:420-426,482-483``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import PoissonHMM, create_unit_square
from hommx_tpu.utils.options import SolverOptions


def _loss_fn(options):
    """Scalar loss of the full HMM solve as a function of a coefficient
    parameter θ (micro stage: exact Cholesky path on CPU f64)."""
    macro = create_unit_square(8, 8)
    micro = create_unit_square(6, 6)

    def make(theta):
        A = lambda x, y: 1.1 + theta * x[0] + 0.5 * jnp.sin(2 * jnp.pi * y[0])
        hmm = PoissonHMM(
            macro, A, lambda x: 1.0, micro, 2**-4,
            options_global_solve=options,
        )
        step, centers = hmm.build_pipeline()
        return step, centers

    step, centers = make(1.0)

    # re-trace with theta as a traced argument: rebuild the closure inside
    def loss(theta):
        A = lambda x, y: 1.1 + theta * x[0] + 0.5 * jnp.sin(2 * jnp.pi * y[0])
        hmm = PoissonHMM(
            macro, A, lambda x: 1.0, micro, 2**-4,
            options_global_solve=options,
        )
        step, centers = hmm.build_pipeline()
        u = step(centers)
        return jnp.sum(u * u)

    return loss


@pytest.mark.parametrize(
    "options",
    [
        SolverOptions(method="cg", pc="mg", rtol=1e-12, atol=0.0),
        SolverOptions(method="cg", pc="jacobi", rtol=1e-12, atol=0.0),
        SolverOptions(method="direct"),
    ],
    ids=["cg-mg", "cg-jacobi", "direct"],
)
def test_grad_through_full_pipeline(options):
    """jax.grad through micro solve + assembly + macro solve matches finite
    differences on every macro-solver path (the iterative ones exercise the
    implicit VJP)."""
    loss = _loss_fn(options)
    g = float(jax.grad(loss)(1.0))
    h = 1e-5
    fd = float((loss(1.0 + h) - loss(1.0 - h)) / (2 * h))
    assert np.isfinite(g)
    assert abs(g - fd) < 1e-5 * max(1.0, abs(fd)), (g, fd)


def test_grad_through_single_scale_fem():
    """fem_solve_fn: grad through the single-scale FEM solve (assembly +
    implicit macro solve) matches finite differences."""
    from hommx_tpu.models.fem import fem_solve_fn
    from hommx_tpu.ops.function_space import (
        FunctionSpace,
        dirichletbc,
        boundary_dofs,
    )

    mesh = create_unit_square(12, 12)
    V = FunctionSpace(mesh, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V), V)]
    coeff = lambda th, x: 1.0 + th * x[0] * x[1]
    solve = fem_solve_fn(
        V, coeff, 1.0, bcs,
        options=SolverOptions(method="cg", rtol=1e-13, atol=0.0),
    )
    loss = lambda th: jnp.sum(solve(th) ** 2)
    g = float(jax.grad(loss)(0.7))
    h = 1e-6
    fd = float((loss(0.7 + h) - loss(0.7 - h)) / (2 * h))
    assert abs(g - fd) < 1e-6 * max(1.0, abs(fd)), (g, fd)


def test_grad_through_micro_chunk_pcg():
    """The f32-style chunk-PCG micro path is differentiable too
    (lax.custom_linear_solve implicit rule), matching the exact Cholesky
    path's gradient (run here in f64 for a clean finite-difference gate)."""
    from hommx_tpu.micro.engine import MicroEngine

    micro = create_unit_square(8, 8)
    centers = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (5, 2)))

    def make_loss(solver, **kw):
        eng = MicroEngine(
            micro, bs=1, coeff_kind="scalar", dtype=jnp.float64,
            solver=solver, pcg_tol=1e-13, **kw
        )

        def loss(theta):
            A = lambda x, y: 1.1 + theta * x[0] + 0.5 * jnp.sin(
                2 * jnp.pi * y[0]
            )
            return jnp.sum(eng.tensors_for_centers(A, centers) ** 2)

        return loss

    loss_pcg = make_loss("pcg", pcg_strategy="matfree")
    loss_cho = make_loss("cholesky")
    g_pcg = float(jax.grad(loss_pcg)(1.0))
    g_cho = float(jax.grad(loss_cho)(1.0))
    h = 1e-6
    fd = float((loss_cho(1.0 + h) - loss_cho(1.0 - h)) / (2 * h))
    assert abs(g_pcg - g_cho) < 1e-7 * max(1.0, abs(g_cho)), (g_pcg, g_cho)
    assert abs(g_pcg - fd) < 1e-5 * max(1.0, abs(fd)), (g_pcg, fd)


def test_clamped_columns_zero_gradient():
    """Columns the energy clamp forces to the zero corrector return a
    gradient consistent with their primal: zero (round-2 advisor finding —
    previously the implicit VJP was that of the UNCLAMPED system against a
    zeroed primal).  maxiter=0 leaves the initial iterate X0 = M⁻¹F, whose
    energy on K = 1000·I is E = 500·‖F‖² − ‖F‖² > 0, so every column clamps;
    with enough iterations no column clamps and the implicit gradient is the
    analytic one."""
    from hommx_tpu.micro.engine import _solve_linear

    n, s, C = 8, 2, 3
    K = 1000.0 * jnp.eye(n)
    matvec = lambda X: jnp.einsum("nm,msc->nsc", K, X)
    prec = lambda R: R
    rng = np.random.default_rng(11)
    F = jnp.asarray(rng.standard_normal((n, s, C)))

    def loss(F, maxiter):
        X, _ = _solve_linear(matvec, prec, F, 1e-13, maxiter, False, True)
        return jnp.sum(X**2), X

    (val, X0), g0 = jax.value_and_grad(
        lambda F: loss(F, 0), has_aux=True
    )(F)
    assert float(jnp.max(jnp.abs(X0))) == 0.0  # all columns clamped
    assert float(val) == 0.0
    assert float(jnp.max(jnp.abs(g0))) == 0.0  # ... and their gradients

    (_, X1), g1 = jax.value_and_grad(
        lambda F: loss(F, 200), has_aux=True
    )(F)
    assert np.allclose(np.asarray(X1), np.asarray(F) / 1000.0, atol=1e-12)
    assert np.allclose(np.asarray(g1), 2.0 * np.asarray(F) / 1e6, atol=1e-12)


def test_second_derivative_through_full_pipeline():
    """Second-order autodiff — jax.grad(jax.grad(J)) through micro solves,
    homogenized tensors, assembly, and the macro solve — matches a central
    finite difference of the (exact) first derivative.  This is what
    powers Newton-type inverse design (examples/inverse_design.py, which
    recovers a microstructure contrast to machine precision in ~6 steps)."""
    loss = _loss_fn(SolverOptions(method="direct"))
    g = jax.grad(loss)
    h2 = float(jax.grad(lambda t: g(t))(1.0))
    h = 1e-4
    fd2 = float((g(1.0 + h) - g(1.0 - h)) / (2 * h))
    assert np.isfinite(h2)
    assert abs(h2 - fd2) < 1e-4 * max(1.0, abs(fd2)), (h2, fd2)
