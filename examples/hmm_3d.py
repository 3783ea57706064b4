#!/usr/bin/env python
"""3D PoissonHMM on the unit cube vs a fine FEM reference.

Port of reference ``examples/hmm_3d.py`` (N=6 macro/micro, eps=2⁻³,
reference 2⁶ cube by default).
"""

import argparse
import time

import jax.numpy as jnp

from hommx_tpu import PoissonHMM, create_unit_cube
from hommx_tpu.models.fem import fem_solve
from hommx_tpu.ops.function_space import FunctionSpace, boundary_dofs, dirichletbc
from hommx_tpu.utils.validation import relative_l2_vs_reference

eps = 1 / 2**3


def A(x, y):
    return 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])


def f(x):
    return 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    N = 6
    msh = create_unit_cube(N)
    msh_micro = create_unit_cube(N)
    phmm = PoissonHMM(msh, A, f, msh_micro, eps)
    print(f"macro cells: {msh.num_cells}, micro reduced dofs: "
          f"{phmm._engine.n_reduced}")

    t0 = time.time()
    u_phmm = phmm.solve()
    print(f"HMM solve: {time.time() - t0:.2f}s")

    N_ref = 2**4 if args.quick else 2**6
    ref = create_unit_cube(N_ref)
    V_ref = FunctionSpace(ref, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V_ref), V_ref)]
    t0 = time.time()
    u_ref = fem_solve(V_ref, lambda x: A(x, x / eps), f, bcs)
    print(f"fine FEM ({N_ref}^3): {time.time() - t0:.2f}s")

    rel = relative_l2_vs_reference(u_phmm, u_ref)
    print(f"relative error of hmm against FEM ref for {eps=}, {N=}, {N_ref=} is {rel}")

    # 3D boundary-surface plot (reference pyvista plot, hmm.py:493-511)
    phmm.plot_solution(filename="hmm_3d.png", title="3D Poisson HMM solution")
    print("wrote hmm_3d.png")


if __name__ == "__main__":
    main()
