#!/usr/bin/env python
"""PoissonHMM on an UNSTRUCTURED (Delaunay) macro mesh.

The reference supports arbitrary macro meshes through
``helpers.mesh_from_delaunay`` + PETSc GAMG/MUMPS
(reference ``helpers.py:125-209``, ``test_integration_poisson.py:207-212``);
here the same surface runs on a jittered-grid Delaunay triangulation with
the aggregation-AMG macro preconditioner (ops/amg.py) when the system is
large enough for the CG path, and validates against the structured-mesh
solution interpolated cross-mesh.
"""

import argparse
import time

import jax.numpy as jnp
import numpy as np

from hommx_tpu import PoissonHMM, create_unit_square, mesh_from_delaunay
from hommx_tpu.ops.interpolation import eval_p1

eps = 1 / 2**5


def A(x, y):
    return 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])


def jittered_delaunay(n, jitter=0.25, seed=3):
    from scipy.spatial import Delaunay

    g = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(g, g, indexing="ij")
    pts = np.stack([X.reshape(-1), Y.reshape(-1)], axis=1)
    rng = np.random.default_rng(seed)
    interior = (
        (pts[:, 0] > 0) & (pts[:, 0] < 1) & (pts[:, 1] > 0) & (pts[:, 1] < 1)
    )
    pts[interior] += rng.uniform(-jitter, jitter, (int(interior.sum()), 2)) / n
    return mesh_from_delaunay(pts, Delaunay(pts).simplices)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=72,
                    help="macro grid resolution before jittering "
                         "(72 → 5329 dofs, above the direct cap → CG+AMG)")
    args = ap.parse_args()

    micro = create_unit_square(16, 16)
    macro_u = jittered_delaunay(args.n)
    assert macro_u.structure is None  # genuinely unstructured

    t0 = time.perf_counter()
    hmm = PoissonHMM(macro_u, A, lambda x: 1.0, micro, eps)
    u = hmm.solve()
    its = hmm.diagnostics["macro_iterations"]
    path = "AMG-preconditioned CG" if its else "dense direct (below cap)"
    print(f"unstructured solve: {time.perf_counter() - t0:.2f} s, "
          f"{hmm.diagnostics['num_cells']} cells, "
          f"macro iterations {its} ({path})")

    # cross-check against the structured-mesh solution at the jittered nodes
    macro_s = create_unit_square(args.n, args.n)
    hmm_s = PoissonHMM(macro_s, A, lambda x: 1.0, micro, eps)
    u_s = hmm_s.solve()
    at_nodes = np.asarray(eval_p1(u_s, macro_u.vertices))
    rel = float(
        np.linalg.norm(np.asarray(u.array) - at_nodes)
        / np.linalg.norm(at_nodes)
    )
    print(f"rel l2 vs structured-mesh solution at the jittered nodes: "
          f"{rel:.2e}")
    assert rel < 5e-2, rel


if __name__ == "__main__":
    main()
