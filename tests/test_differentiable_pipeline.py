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
