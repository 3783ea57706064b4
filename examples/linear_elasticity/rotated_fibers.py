#!/usr/bin/env python
"""3D rotated-fiber beam with LinearElasticityStratifiedHMM — the flagship
configuration (BASELINE.json config 5).

Port of reference ``examples/linear_elasticity/rotated_fibers.py``: a clamped
[0,1]x[0,0.4]x[0,0.1] beam with stiff circular fibers (μ = 100 inside,
0.001 outside) whose direction rotates from longitudinal to vertical with
height, via the stratified map γ(x₁) = π/2 · x₁ / W.

Dθᵀ note: the reference ships a non-square (3,2) matrix that cannot
typecheck in its own UFL forms (latent bug, SURVEY.md §2.5); we pass the
square rotation R_γ in the (0,2) plane it gestures at (same dropped γ'
terms).
"""

import argparse
import time

import jax.numpy as jnp
import numpy as np

from hommx_tpu import (
    LinearElasticityStratifiedHMM,
    create_box,
    create_unit_cube,
    dirichletbc,
)
from hommx_tpu.ops.function_space import boundary_dofs
from hommx_tpu.utils.validation import hooke_tensor

L, W, H = 1.0, 0.4, 0.1
delta = W / L
g = 0.05 * delta**2
eps = 2 ** (-5)


def circle_indicator(a, b):
    da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
    db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
    return (da**2 + db**2) < ((2 * jnp.pi) ** 2 / 16)


def mu(x, y):
    # stiff fiber along y0, circular cross-section in the (y1, y2) plane
    return jnp.where(circle_indicator(y[1], y[2]), 100.0, 0.001)


A_tensor = hooke_tensor(3, mu, lambda x, y: 1.0)


def Dtheta(x):
    """Square rotation in the (0,2) plane, γ from 0 (bottom) to π/2 (top)."""
    gamma = 0.5 * jnp.pi * x[1] / W
    c, s = jnp.cos(gamma), jnp.sin(gamma)
    Dth = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    return Dth.T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--macro", type=int, nargs=3, default=None)
    args = ap.parse_args()

    macro_n = args.macro or ([10, 3, 3] if args.quick else [20, 6, 6])
    domain = create_box([[0, 0, 0], [L, W, H]], macro_n)
    cell_box = create_unit_cube(4)

    f = lambda x: jnp.array([0.0, 0.0, -g])
    lehmm = LinearElasticityStratifiedHMM(
        domain, A_tensor, f, cell_box, eps, Dtheta
    )
    dofs = boundary_dofs(lehmm.function_space, lambda x: np.isclose(x[0], 0))
    lehmm.set_boundary_conditions(
        dirichletbc(np.zeros(3), dofs, lehmm.function_space)
    )

    print(f"macro cells: {domain.num_cells} "
          f"(= {domain.num_cells * 12} reference-equivalent cell solves), "
          f"micro reduced dofs: {lehmm._engine.n_reduced}")
    t0 = time.time()
    u = lehmm.solve()
    dt = time.time() - t0
    vals = np.asarray(u.array).reshape(-1, 3)
    print(f"solve: {dt:.2f}s; max |u| = {np.abs(vals).max():.5f}, "
          f"tip deflection u_z min = {vals[:, 2].min():.5f}")
    assert np.isfinite(vals).all()

    # warped boundary-surface plot (reference pyvista warp_by_vector beam)
    lehmm.plot_solution(filename="rotated_fibers.png", warp=0.25,
                        title="rotated-fiber beam, |u| (warped)")
    print("wrote rotated_fibers.png")


if __name__ == "__main__":
    main()
