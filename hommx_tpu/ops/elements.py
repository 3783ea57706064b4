"""P1 simplex element kernels: affine geometry, basis gradients, quadrature.

Replaces UFL/FFCx/Basix codegen (reference compiles every form via
``fem.form``; see reference ``hmm.py:644-667``).  All functions are pure JAX
and shape-static, so they vmap/jit/shard cleanly.

Conventions: a cell has vertices p_0..p_d; the affine map is
x = p_0 + J xi with J[:, i] = p_{i+1} - p_0.  P1 basis: lambda_0 = 1-sum(xi),
lambda_i = xi_i.  Gradients: grad lambda_i = row i-1 of J^{-1} (i >= 1),
grad lambda_0 = -sum of the others.
"""

from __future__ import annotations

import jax.numpy as jnp

from hommx_tpu.ops.quadrature import simplex_rule

__all__ = [
    "cell_geometry",
    "quad_points_physical",
    "p1_basis_at",
]


def _inv_and_det(J):
    """Explicit inverse+determinant for (..., d, d), d in {1,2,3}."""
    d = J.shape[-1]
    if d == 1:
        det = J[..., 0, 0]
        inv = (1.0 / det)[..., None, None]
        return inv, det
    if d == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, e = J[..., 1, 0], J[..., 1, 1]
        det = a * e - b * c
        inv = (
            jnp.stack(
                [jnp.stack([e, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
            )
            / det[..., None, None]
        )
        return inv, det
    # d == 3: adjugate
    m = J
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    det = (
        m[..., 0, 0] * c00 + m[..., 0, 1] * c10 + m[..., 0, 2] * c20
    )
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None], det


def cell_geometry(vertices, cells):
    """Per-cell P1 geometry.

    Args:
        vertices: (nv, d) array.
        cells: (nc, d+1) int array.

    Returns:
        grads: (nc, d+1, d) — gradient of each P1 basis function on each cell.
        vols:  (nc,) — cell measures |T|.
    """
    d = vertices.shape[1]
    p = vertices[cells]  # (nc, d+1, d)
    # J columns = p_i - p_0  -> J[a, b] = (p_{b+1} - p_0)[a]
    E = p[:, 1:, :] - p[:, :1, :]  # (nc, d, d): row i = p_{i+1}-p_0
    J = jnp.swapaxes(E, -1, -2)  # columns are edge vectors
    Jinv, det = _inv_and_det(J)
    fact = {1: 1.0, 2: 2.0, 3: 6.0}[d]
    vols = jnp.abs(det) / fact
    grads_1d = Jinv  # row i of J^{-1} = grad lambda_{i+1}
    g0 = -jnp.sum(grads_1d, axis=-2, keepdims=True)
    grads = jnp.concatenate([g0, grads_1d], axis=-2)  # (nc, d+1, d)
    return grads, vols


def quad_points_physical(vertices, cells, degree: int):
    """Physical quadrature points and weights for every cell.

    Returns:
        xq: (nc, nq, d) physical points.
        wq: (nc, nq) weights with sum_q wq[c, q] = |T_c|.
        lam: (nq, d+1) P1 basis values at the local quadrature points.
    """
    d = vertices.shape[1]
    xi, w = simplex_rule(d, degree)
    xi = jnp.asarray(xi, dtype=vertices.dtype)
    w = jnp.asarray(w, dtype=vertices.dtype)
    lam = p1_basis_at(xi)  # (nq, d+1)
    p = vertices[cells]  # (nc, d+1, d)
    xq = jnp.einsum("qa,cad->cqd", lam, p)
    _, vols = cell_geometry(vertices, cells)
    wq = vols[:, None] * w[None, :]
    return xq, wq, lam


def p1_basis_at(xi):
    """P1 basis values at local points xi (nq, d) -> (nq, d+1)."""
    lam0 = 1.0 - jnp.sum(xi, axis=-1, keepdims=True)
    return jnp.concatenate([lam0, xi], axis=-1)
