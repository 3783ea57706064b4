#!/usr/bin/env python
"""Standalone periodic variational solves on the unit cell.

The reference's ``PeriodicLinearProblem`` accepts arbitrary forms (a, L)
on the MPC-constrained space (reference ``cell_problem.py:303-388``) —
a user can solve any periodic problem, not just HMM cell problems.
``MicroEngine.solve_periodic`` is that surface here:

    a(u, v) = ∫_Y ∇v · A(x₀, y) ∇u dy = ∫_Y f·v dy + ∫_Y g·∇v dy

This example solves
  1. a manufactured periodic Poisson problem (f-load) and reports the
     O(h²) error sequence, and
  2. the HMM generator cell problem itself through the g-load form,
     verifying it reproduces the engine's corrector.

Run: python examples/diffusion/periodic_cell_load.py
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from hommx_tpu import create_unit_square
from hommx_tpu.micro.engine import MicroEngine


def main():
    # 1. manufactured solution: -div(grad u) = f on the periodic cell
    print("periodic Poisson, u = sin(2πy₀)cos(2πy₁):")
    for n in (8, 16, 32, 64):
        eng = MicroEngine(create_unit_square(n), dtype=jnp.float64)
        f = lambda y: (
            8 * jnp.pi**2
            * jnp.sin(2 * jnp.pi * y[0]) * jnp.cos(2 * jnp.pi * y[1])
        )
        u = eng.solve_periodic(lambda x, y: 1.0, rhs=f)
        verts = np.asarray(eng.mesh.vertices)
        ue = np.sin(2 * np.pi * verts[:, 0]) * np.cos(2 * np.pi * verts[:, 1])
        un = np.array(u)
        un -= un.mean()
        ue -= ue.mean()
        err = np.linalg.norm(un - ue) / np.linalg.norm(ue)
        print(f"  n={n:3d}: rel l2 error {err:.2e}")

    # 2. the HMM cell problem via the gradient load g = -A e₀
    eng = MicroEngine(create_unit_square(16), dtype=jnp.float64, solver="pcg")
    A = lambda x, y: 1.0 + 0.5 * jnp.sin(2 * jnp.pi * y[0])
    x0 = jnp.zeros(2)
    g = lambda y: -jnp.asarray([A(x0, y), 0.0])
    u = eng.solve_periodic(A, grad_rhs=g, x_center=x0)
    _, X = eng.cell_tensor(eng.element_coeff(A, x0))
    red = np.asarray(eng.pmap.reduced_index)
    Xf = np.array(np.asarray(X)[red, 0])
    un = np.array(u)
    un -= un.mean()
    Xf -= Xf.mean()
    print(
        "generator cell problem via grad_rhs: max |Δ| vs engine corrector "
        f"= {np.max(np.abs(un - Xf)):.2e}"
    )


if __name__ == "__main__":
    main()
