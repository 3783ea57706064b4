#!/usr/bin/env python
"""2D PoissonHMM on a 5x5 rectangle with Darcy-style left/right BCs,
compared against a fine-mesh FEM reference.

Port of reference ``examples/hmm.py`` (same coefficient, BCs, and meshes).
Run with --quick for a smaller reference mesh.
"""

import argparse
import time

import jax.numpy as jnp
import numpy as np

from hommx_tpu import (
    PoissonHMM,
    create_rectangle,
    create_unit_square,
    dirichletbc,
)
from hommx_tpu.models.fem import fem_solve
from hommx_tpu.ops.function_space import FunctionSpace, boundary_dofs
from hommx_tpu.utils.validation import relative_l2_vs_reference

eps = 1 / 2**5


def A(x, y):
    return 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])


def f(x):
    return 0.0


def darcy_bcs(V):
    lo, hi = V.mesh.bounding_box()
    left = boundary_dofs(V, lambda x: np.isclose(x[0], lo[0]))
    right = boundary_dofs(V, lambda x: np.isclose(x[0], hi[0]))
    return [dirichletbc(1.0, left, V), dirichletbc(0.0, right, V)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    N = 15
    msh = create_rectangle([[0, 0], [5, 5]], [N, N])
    msh_micro = create_unit_square(N, N)

    t0 = time.time()
    phmm = PoissonHMM(msh, A, f, msh_micro, eps)
    phmm.set_boundary_conditions(darcy_bcs(phmm.function_space))
    u_phmm = phmm.solve()
    print(f"HMM solve: {time.time() - t0:.2f}s "
          f"({msh.num_cells} cells x {msh.dim} correctors)")

    N_ref = 2**5 if args.quick else 2**7
    ref = create_rectangle([[0, 0], [5, 5]], [N_ref, N_ref])
    V_ref = FunctionSpace(ref, 1)
    u_ref = fem_solve(V_ref, lambda x: A(x, x / eps), f, darcy_bcs(V_ref))

    rel = relative_l2_vs_reference(u_phmm, u_ref)
    print(f"relative error of hmm against FEM ref for {eps=}, N={N_ref} is {rel}")

    if args.plot:
        phmm.plot_solution(filename="hmm_2d.png", title="$u_{hmm}$")
        print("wrote hmm_2d.png")


if __name__ == "__main__":
    main()
