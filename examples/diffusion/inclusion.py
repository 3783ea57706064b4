#!/usr/bin/env python
"""Wavy circular-inclusion diffusion with PoissonStratifiedHMM.

Port of reference ``examples/diffusion/inclusion.py``: periodic circular
inclusions A = 0.001 inside / 0.1 outside a radius-1/4 disk, deformed by
θ(x) = (x₀ + ½ sin 2πx₁, x₁).
"""

import argparse
import time

import jax.numpy as jnp
import numpy as np

from hommx_tpu import PoissonStratifiedHMM, create_unit_square, dirichletbc
from hommx_tpu.models.fem import fem_solve
from hommx_tpu.ops.function_space import FunctionSpace, boundary_dofs
from hommx_tpu.utils.plotting import func_to_png
from hommx_tpu.utils.validation import relative_l2_vs_reference


def circle_indicator(a, b):
    # 1-periodic wrapped distance around 1/2 in each coordinate
    da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
    db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
    r = 0.25
    return (da**2 + db**2) < ((2 * jnp.pi) ** 2 * r**2)


def A(x, y):
    return jnp.where(circle_indicator(y[0], y[1]), 0.001, 0.1)


def f(x):
    return 1.0


def theta(x):
    return jnp.array([x[0] + 0.5 * jnp.sin(2 * jnp.pi * x[1]), x[1]])


def Dtheta(x):
    # Dθᵀ_ij = ∂θ_j/∂x_i
    return jnp.array(
        [[1.0, 0.0], [0.5 * 2 * jnp.pi * jnp.cos(2 * jnp.pi * x[1]), 1.0]]
    )


eps = 2 ** (-5)


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

    nx = 30
    msh = create_unit_square(nx, nx)
    msh_micro = create_unit_square(nx, nx)

    t0 = time.time()
    pshmm = PoissonStratifiedHMM(
        msh, A, f, msh_micro, eps, Dtheta, quad_degree_micro=2
    )
    pshmm.set_boundary_conditions(darcy_bcs(pshmm.function_space))
    u_pshmm = pshmm.solve()
    print(f"stratified HMM solve: {time.time() - t0:.2f}s")

    N_ref = 2**7 if args.quick else 2**9
    ref = create_unit_square(N_ref, N_ref)
    V_ref = FunctionSpace(ref, 1)
    t0 = time.time()
    u_ref = fem_solve(V_ref, lambda x: A(x, theta(x) / eps), f, darcy_bcs(V_ref))
    print(f"fine FEM ({N_ref}^2): {time.time() - t0:.2f}s")

    print(f"relative L^2 error is: {relative_l2_vs_reference(u_pshmm, u_ref)}")

    if args.plot:
        func_to_png("diffusion_wavy_inclusion_stratified_hmm",
                    pshmm.function_space, u_pshmm, title="$u_{hmm}$")
        print("wrote png")


if __name__ == "__main__":
    main()
