#!/usr/bin/env python
"""Wavy-laminate diffusion with PoissonStratifiedHMM.

Port of reference ``examples/diffusion/laminate.py``: a sharp laminate
coefficient A(y) = 5 or 0.05 depending on sign(cos 2πy₀), deformed by
θ(x) = (x₁ − sin 2πx₀, x₁), with Darcy left/right boundary conditions.

Note on Dθᵀ: the reference example passes a (2,1) matrix which cannot
typecheck in its own UFL forms (latent bug; SURVEY.md §2.5).  Here we pass
the honest square Jacobian transpose of the θ above.
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


def A(x, y):
    return jnp.where(jnp.cos(2 * jnp.pi * y[0]) < 0, 5.0, 0.05)


def f(x):
    return 1.0


def theta(x):
    # Only θ₀ enters the physical coefficient (A depends on y₀ alone).  The
    # completion θ₁ = x₀ keeps det Dθ ≡ -1, so the deformed cell problem is
    # never degenerate.  (The reference's θ₁ = x₁ makes Dθ singular wherever
    # cos 2πx₀ = 0 — with a square map that degenerates the cell problem;
    # the homogenized tensor is independent of the completion since A is a
    # y₀-laminate.)
    return jnp.array([x[1] - jnp.sin(2 * jnp.pi * x[0]), x[0]])


def Dtheta(x):
    # Dθᵀ_ij = ∂θ_j/∂x_i for θ = (x₁ − sin 2πx₀, x₀)
    return jnp.array(
        [[-2 * jnp.pi * jnp.cos(2 * jnp.pi * x[0]), 1.0], [1.0, 0.0]]
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
    pshmm = PoissonStratifiedHMM(msh, A, f, msh_micro, eps, Dtheta)
    pshmm.set_boundary_conditions(darcy_bcs(pshmm.function_space))
    u_pshmm = pshmm.solve()
    print(f"stratified HMM solve: {time.time() - t0:.2f}s")

    # Primary validation: the exact homogenized limit.  For a two-phase
    # laminate the effective tensor is closed-form (harmonic mean along the
    # layer normal n = ∇θ₀, arithmetic mean across), so the eps→0 limit
    # solution is computable without resolving the eps-oscillations.
    aa = 0.5 * (5.0 + 0.05)
    ah = 1.0 / (0.5 * (1 / 5.0 + 1 / 0.05))

    def Astar_exact(x):
        n = jnp.array([-2 * jnp.pi * jnp.cos(2 * jnp.pi * x[0]), 1.0])
        nh = n / jnp.linalg.norm(n)
        return aa * jnp.eye(2) + (ah - aa) * jnp.outer(nh, nh)

    N_ref = 2**7 if args.quick else 2**8
    ref = create_unit_square(N_ref, N_ref)
    V_ref = FunctionSpace(ref, 1)
    t0 = time.time()
    u_hom = fem_solve(V_ref, Astar_exact, f, darcy_bcs(V_ref))
    print(f"homogenized-limit FEM ({N_ref}^2): {time.time() - t0:.2f}s")
    rel = relative_l2_vs_reference(u_pshmm, u_hom)
    print(f"relative L^2 error vs exact homogenized limit: {rel}")

    u_ref = u_hom
    if not args.quick:
        # Secondary (informational): the heterogeneous fine-mesh solve.  At
        # eps = 2⁻⁵ with contrast 100 the eps-gap itself is O(10%) and a
        # mesh resolving the discontinuous laminate needs ≳ 2¹⁰ cells/side,
        # so this number is NOT a convergence gate (the reference example
        # prints the same kind of number, ``laminate.py:230``).
        N_het = 2**9
        het = create_unit_square(N_het, N_het)
        V_het = FunctionSpace(het, 1)
        t0 = time.time()
        u_het = fem_solve(V_het, lambda x: A(x, theta(x) / eps), f, darcy_bcs(V_het))
        print(f"heterogeneous fine FEM ({N_het}^2): {time.time() - t0:.2f}s")
        print("relative L^2 vs heterogeneous fine FEM (informational): "
              f"{relative_l2_vs_reference(u_pshmm, u_het)}")

    if args.plot:
        func_to_png("diffusion_wavy_laminate_stratified_hmm",
                    pshmm.function_space, u_pshmm, title="$u_{hmm}$")
        func_to_png("diffusion_wavy_laminate_reference", V_ref, u_ref,
                    title="$u_{ref}$")
        print("wrote pngs")


if __name__ == "__main__":
    main()
