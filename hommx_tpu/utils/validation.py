"""Validation utilities: L² norms/errors, cross-mesh comparison, standard
boundary conditions, Hooke-tensor builder.

Plays the role of the reference's ``helpers.py`` + the per-test utility
functions (``test_integration_poisson.py:15-57``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from hommx_tpu.ops.assembly import l2_norm_fn
from hommx_tpu.ops.function_space import (
    FunctionSpace,
    dirichletbc,
    locate_dofs_geometrical,
)
from hommx_tpu.ops.interpolation import interpolate_nonmatching

__all__ = [
    "calc_l2_error",
    "calc_l2_norm",
    "calc_h1_error",
    "zero_dirichlet_bcs",
    "relative_l2_vs_reference",
    "relative_h1_vs_reference",
    "hooke_tensor",
]


def calc_l2_error(mesh, u1, u2, bs: int = 1) -> float:
    """L² norm of the difference of two P1 functions on the same mesh."""
    a1 = u1.array if hasattr(u1, "array") else u1
    a2 = u2.array if hasattr(u2, "array") else u2
    return float(
        l2_norm_fn(jnp.asarray(mesh.vertices), jnp.asarray(mesh.cells), a1 - a2, bs=bs)
    )


def calc_l2_norm(mesh, u, bs: int = 1, exact: Optional[Callable] = None) -> float:
    """L² norm of a P1 function, or of (u - exact) for a callable exact."""
    arr = u.array if hasattr(u, "array") else u
    return float(
        l2_norm_fn(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.cells), arr, bs=bs, exact=exact
        )
    )


def l2_norm_space(u, exact: Optional[Callable] = None, degree: int = 4) -> float:
    """L² norm of a Function (or of u - exact), degree-aware (P1 and P2).

    ``calc_l2_norm`` is the P1 fast path; this one evaluates the actual
    basis of ``u.space`` at quadrature points."""
    import jax

    from hommx_tpu.ops.elements import p1_basis_at, quad_points_physical
    from hommx_tpu.ops.quadrature import simplex_rule

    V = u.space
    mesh = V.mesh
    verts = jnp.asarray(mesh.vertices)
    cells = jnp.asarray(mesh.cells)
    xq, wq, _ = quad_points_physical(verts, cells, degree)
    xi, _ = simplex_rule(mesh.dim, degree)
    if V.degree == 1:
        phi = p1_basis_at(jnp.asarray(xi))
    else:
        from hommx_tpu.ops.p2 import p2_basis

        phi, _ = p2_basis(jnp.asarray(xi), mesh.dim)
    uv = u.array.reshape(-1, V.bs)[jnp.asarray(V.cell_nodes())]  # (nc, nb, bs)
    uq = jnp.einsum("qk,ckb->cqb", phi, uv)
    if exact is not None:
        ex = jax.vmap(jax.vmap(exact))(xq).reshape(uq.shape)
        uq = uq - ex
    return float(jnp.sqrt(jnp.sum(wq * jnp.sum(uq * uq, axis=-1))))


def calc_h1_error(mesh, u1, u2, bs: int = 1) -> float:
    """H¹ seminorm of the difference of two P1 functions on the same mesh
    (the H1 parity metric of BASELINE.md)."""
    from hommx_tpu.ops.assembly import h1_seminorm_fn

    a1 = u1.array if hasattr(u1, "array") else u1
    a2 = u2.array if hasattr(u2, "array") else u2
    return float(
        h1_seminorm_fn(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.cells), a1 - a2, bs=bs
        )
    )


def relative_h1_vs_reference(u_coarse, u_fine) -> float:
    """Relative H¹-seminorm difference vs an interpolated fine solution."""
    from hommx_tpu.ops.assembly import h1_seminorm_fn

    V = u_coarse.space
    u_ref_i = interpolate_nonmatching(V, u_fine)
    err = calc_h1_error(V.mesh, u_coarse, u_ref_i, bs=V.bs)
    nrm = float(
        h1_seminorm_fn(
            jnp.asarray(V.mesh.vertices),
            jnp.asarray(V.mesh.cells),
            u_ref_i.array,
            bs=V.bs,
        )
    )
    return err / nrm


def zero_dirichlet_bcs(V: FunctionSpace):
    """Zero Dirichlet BC on the bounding-box boundary (reference
    ``test_integration_poisson.py:41-57``)."""
    mesh = V.mesh
    lo, hi = mesh.bounding_box()

    def marker(x):
        m = np.zeros(x.shape[1], dtype=bool)
        for k in range(mesh.dim):
            m |= np.isclose(x[k], lo[k]) | np.isclose(x[k], hi[k])
        return m

    dofs = locate_dofs_geometrical(V, marker)
    val = 0.0 if V.bs == 1 else np.zeros(V.bs)
    return [dirichletbc(val, dofs, V)]


def relative_l2_vs_reference(u_coarse, u_fine) -> float:
    """Interpolate a fine-mesh solution onto the coarse space and return the
    relative L² difference (the reference's regression-gate pattern,
    ``test_integration_poisson.py:289-294``)."""
    V = u_coarse.space
    u_ref_i = interpolate_nonmatching(V, u_fine)
    err = calc_l2_error(V.mesh, u_coarse, u_ref_i, bs=V.bs)
    nrm = calc_l2_norm(V.mesh, u_ref_i, bs=V.bs)
    return err / nrm


def hooke_tensor(dim: int, mu_fn: Callable, lam_fn: Callable) -> Callable:
    """Isotropic Hooke tensor A_ijkl = λ δij δkl + μ (δik δjl + δil δjk)
    with x,y-dependent Lamé callables (the pattern of reference
    ``test_integration_linear_elasticity.py:84-93``)."""

    def A(x, y):
        I = jnp.eye(dim)
        mu = mu_fn(x, y)
        lam = lam_fn(x, y)
        return (
            lam * jnp.einsum("ij,kl->ijkl", I, I)
            + mu
            * (jnp.einsum("ik,jl->ijkl", I, I) + jnp.einsum("il,jk->ijkl", I, I))
        )

    return A
