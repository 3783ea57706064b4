"""The batched micro cell-problem engine — the performance core.

Replaces the reference's hot loop (``hmm.py:310-369``): per macro cell,
``num_basis_functions`` PETSc assemble+solve round trips through dolfinx_mpc.
Here the whole batch of macro quadrature points runs as one jitted pipeline
of matmuls (MXU) + batched Cholesky:

    for every macro cell c (vmapped, chunked, shard_map-able):
        A_q   = coeff(c_T, y_q)              # user JAX callable at micro
                                             # quadrature points
        K_c   = D_cᵀ diag(w ⊗ A_q) D_c       # reduced periodic cell operator
        X_c   = cholesky_solve(K_c, F_c)     # s = d (scalar) or d² (elastic)
                                             # generator correctors
        Φ_c   = E + D_c X_c                  # corrected gradient fields
        A*_c  = (1/|Y|) Φ_cᵀ (w ⊗ A_q) Φ_c   # homogenized tensor at c_T

The mathematical identity with the reference: every reference cell-problem
RHS is linear in the constant macro-basis gradient (``hmm.py:371-395``
interpolates an affine function), so the reference's per-basis-function
correctors are exactly linear combinations of the generator correctors X_c,
and the reference's local stiffness ``S_loc`` (``hmm.py:361-369``) equals
|T| · P A*_c Pᵀ with P the macro P1 gradient/strain coefficients.  The
1/eps² · eps² cancellation (``hmm.py:652-667``) happens symbolically here.

Gradient-operator layout: D is a dense (nQ, r, n_red) operator taking
reduced dof vectors to gradient components at every micro quadrature point
(r = d for scalar problems, d² = flattened ∂u_i/∂y_j for elasticity).
Periodicity is eliminated by *construction* of D through the reduced vertex
index (see micro/periodic.py), replacing dolfinx_mpc constrained assembly.
The constant-nullspace (translations) is removed by pinning the dofs of
reduced vertex 0 — correctors shift by a constant, gradients and A* do not
(replaces the PETSc NullSpace dance of ``cell_problem.py:345-361``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.config import default_dtype
from hommx_tpu.meshes.simplex import SimplexMesh
from hommx_tpu.micro.periodic import build_periodic_map
from hommx_tpu.ops.elements import cell_geometry, quad_points_physical

__all__ = ["MicroEngine"]


def _sym_map(M: jnp.ndarray) -> jnp.ndarray:
    """(d², d²) map taking a flattened gradient H_{pq}=∂u_p/∂y_q to the
    deformed strain e_D(u)_{ij} = ½ Σ_k (M_ik H_jk + M_jk H_ik).

    With M = I this is plain symmetrization H → e(u); with M = Dθᵀ(c_T) it is
    the stratified strain of the reference (``hmm.py:1024-1030``, using
    nabla_grad = gradᵀ).
    """
    d = M.shape[0]
    eye = jnp.eye(d, dtype=M.dtype)
    # T[(i,j),(p,q)] = 1/2 (M[i,q] δ[p,j] + M[j,q] δ[p,i])
    T = 0.5 * (
        jnp.einsum("iq,pj->ijpq", M, eye) + jnp.einsum("jq,pi->ijpq", M, eye)
    )
    return T.reshape(d * d, d * d)


class MicroEngine:
    """Batched periodic cell-problem solver on one replicated micro mesh.

    Args:
        micro_mesh: the unit-cell mesh Y (reference requires the unit cell on
            COMM_SELF, ``hmm.py:97-100``; here it is simply replicated data).
        bs: block size — 1 for scalar diffusion, d for elasticity.
        coeff_kind: 'scalar' | 'matrix' | 'tensor4' — shape of the user
            coefficient A(x, y) (scalar, (d,d), or (d,d,d,d)).
        quad_degree: micro quadrature degree (elementwise; replaces FFCx's
            automatic degree estimation).
        dtype: compute dtype.
    """

    def __init__(
        self,
        micro_mesh: SimplexMesh,
        bs: int = 1,
        coeff_kind: str = "scalar",
        quad_degree: int = 2,
        dtype=None,
    ):
        self.mesh = micro_mesh
        self.bs = int(bs)
        self.coeff_kind = coeff_kind
        self.quad_degree = int(quad_degree)
        self.dtype = dtype or default_dtype()
        d = micro_mesh.dim
        self.d = d
        if bs not in (1, d):
            raise ValueError("bs must be 1 (scalar) or dim (vector)")
        self.r = d if bs == 1 else d * d  # gradient components per point
        self.s = d if bs == 1 else d * d  # number of generator problems
        self.pmap = build_periodic_map(micro_mesh)
        self.n_reduced = self.pmap.n_reduced * self.bs
        self.volume_Y = micro_mesh.volume()
        self._build_operators()

    # -- static operator construction (host, once) --------------------------
    def _build_operators(self):
        mesh, d, bs = self.mesh, self.d, self.bs
        verts = jnp.asarray(mesh.vertices, dtype=self.dtype)
        cells = jnp.asarray(mesh.cells)
        grads, vols = cell_geometry(verts, cells)  # (ne, d+1, d), (ne,)
        xq, wq, _ = quad_points_physical(verts, cells, self.quad_degree)
        ne, nq = wq.shape
        self.nQ = ne * nq
        self.yq = np.asarray(xq).reshape(self.nQ, d)  # micro coords of q-points
        self.w = np.asarray(wq).reshape(self.nQ)

        red = self.pmap.reduced_index  # (nv,)
        cells_np = mesh.cells
        grads_np = np.asarray(grads)  # (ne, d+1, d)
        nred = self.n_reduced

        # Dense gradient operator D: (nQ, r, nred).
        D = np.zeros((ne, self.r, self.pmap.n_reduced * bs), dtype=np.float64)
        for a in range(d + 1):
            red_vert = red[cells_np[:, a]]  # (ne,)
            if bs == 1:
                # D[e, k, red_vert] += grad_a[k]
                np.add.at(
                    D, (np.arange(ne)[:, None], np.arange(d)[None, :], red_vert[:, None]),
                    grads_np[:, a, :],
                )
            else:
                # component i of the vector dof at this vertex contributes
                # grad_a[j] to gradient entry H_{ij} (row i*d+j)
                for i in range(bs):
                    rows = np.arange(i * d, (i + 1) * d)
                    cols = red_vert * bs + i
                    np.add.at(
                        D,
                        (np.arange(ne)[:, None], rows[None, :], cols[:, None]),
                        grads_np[:, a, :],
                    )
        # replicate per quadrature point (P1 gradients are elementwise const)
        D = np.repeat(D, nq, axis=0)  # (nQ, r, nred)
        self.D = jnp.asarray(D, dtype=self.dtype)

        # generator fields E: (r, s)
        if bs == 1:
            E = np.eye(d)
        else:
            E = np.zeros((d * d, d * d))
            for k in range(d):
                for l in range(d):
                    Ekl = np.zeros((d, d))
                    Ekl[k, l] += 0.5
                    Ekl[l, k] += 0.5
                    E[:, k * d + l] = Ekl.reshape(-1)
        self.E = jnp.asarray(E, dtype=self.dtype)

        # nullspace pinning: the bs dofs of reduced vertex 0
        pin = np.zeros(nred, dtype=bool)
        pin[:bs] = True
        self.pin_mask = jnp.asarray(pin)
        self.w_dev = jnp.asarray(self.w, dtype=self.dtype)
        self.yq_dev = jnp.asarray(self.yq, dtype=self.dtype)
        if bs == d:
            self.D_sym = jnp.einsum(
                "rs,qsn->qrn", _sym_map(jnp.eye(d, dtype=self.dtype)), self.D
            )

    # -- coefficient canonicalization ---------------------------------------
    def _coeff_at_quad(self, coeff: Callable, x_center: jnp.ndarray) -> jnp.ndarray:
        """A(c_T, y_q) for all micro quadrature points → (nQ, r, r) canonical
        matrix form (scalar a → a·I acting on gradient components)."""
        d = self.d

        def at_point(y):
            val = coeff(x_center, y)
            return jnp.asarray(val, dtype=self.dtype)

        vals = jax.vmap(at_point)(self.yq_dev)
        if self.coeff_kind == "scalar":
            return vals.reshape(self.nQ, 1, 1) * jnp.eye(self.r, dtype=self.dtype)
        if self.coeff_kind == "matrix":
            return vals.reshape(self.nQ, d, d)
        # tensor4: A[i,j,k,l] with test index (ij), trial (kl)
        return vals.reshape(self.nQ, d * d, d * d)

    # -- the per-cell kernel -------------------------------------------------
    def _corr_operator(self, G: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Gradient operator on the corrector side, optionally mapped by
        G = Dθᵀ(c_T) (stratified variants, reference ``hmm.py:759-789``)."""
        if G is None:
            return self.D if self.bs == 1 else self.D_sym
        if self.bs == 1:
            return jnp.einsum("ij,qjn->qin", G, self.D)
        return jnp.einsum("rs,qsn->qrn", _sym_map(G), self.D)

    def cell_tensor(self, Aq: jnp.ndarray, G: Optional[jnp.ndarray] = None):
        """Homogenized tensor A* (s, s) and generator correctors X (nred, s)
        for one macro quadrature point.

        Aq: (nQ, r, r) canonical coefficient values at micro quad points.
        """
        Dc = self._corr_operator(G)  # (nQ, r, nred)
        w = self.w_dev
        nQ, r, nred = Dc.shape

        # Z[q, i, n] = Σ_j Aq[q, i, j] Dc[q, j, n]   (test-side contraction)
        Z = jnp.einsum("qij,qjn->qin", Aq, Dc)
        Kfull = jnp.einsum(
            "qin,qim->nm", Dc * w[:, None, None], Z
        )  # K[n,m] = Σ_q w Dᵀ A D
        # RHS F[n, s] = -Σ_q w Dc[q,:,n]ᵀ Aq[q] E[:,s]
        AE = jnp.einsum("qij,js->qis", Aq, self.E)  # (nQ, r, s)
        F = -jnp.einsum("qin,q,qis->ns", Dc, w, AE)

        # pin translations (constant nullspace)
        keep = jnp.logical_not(self.pin_mask).astype(self.dtype)
        K = Kfull * keep[:, None] * keep[None, :] + jnp.diag(
            self.pin_mask.astype(self.dtype)
        )
        F = F * keep[:, None]

        c, low = jax.scipy.linalg.cho_factor(K)
        X = jax.scipy.linalg.cho_solve((c, low), F)  # (nred, s)

        # corrected fields and homogenized tensor
        Phi = self.E[None, :, :] + jnp.einsum("qrn,ns->qrs", Dc, X)  # (nQ, r, s)
        APhi = jnp.einsum("qij,qjs->qis", Aq, Phi)
        # Astar[n_test, m_trial] = (1/|Y|) Σ_q w Φ[:,n]ᵀ A Φ[:,m]
        Astar = jnp.einsum("qrn,q,qrm->nm", Phi, w, APhi) / self.volume_Y
        return Astar, X

    # -- batched over macro quadrature points --------------------------------
    def tensors_for_centers(
        self,
        coeff: Callable,
        centers: jnp.ndarray,
        G_fn: Optional[Callable] = None,
        chunk: int = 0,
        with_correctors: bool = False,
    ):
        """A*(c_T) for a batch of macro cell centers (nc, d).

        Args:
            coeff: JAX callable A(x, y).
            G_fn: optional Dθᵀ(x) callable (stratified variants).
            chunk: cells per vmapped chunk (0 = auto).
        Returns: (nc, s, s) tensors [and (nc, nred, s) correctors].
        """
        centers = jnp.asarray(centers, dtype=self.dtype)
        nc = centers.shape[0]
        chunk = chunk or self._auto_chunk(nc)

        def one(x):
            Aq = self._coeff_at_quad(coeff, x)
            G = None if G_fn is None else jnp.asarray(G_fn(x), dtype=self.dtype)
            Astar, X = self.cell_tensor(Aq, G)
            return (Astar, X) if with_correctors else Astar

        return _map_chunked(one, centers, chunk)

    def _auto_chunk(self, nc: int) -> int:
        # keep the dominant temporaries (K, Dc copies) under ~1 GB
        itemsize = jnp.dtype(self.dtype).itemsize
        per_cell = (
            self.n_reduced * self.n_reduced
            + 3 * self.nQ * self.r * max(self.s, self.r)
            + 2 * self.nQ * self.r * self.n_reduced  # worst case: mapped Dc + Z
        ) * itemsize
        budget = 1 << 30
        return int(np.clip(budget // max(per_cell, 1), 1, max(nc, 1)))


def _map_chunked(fn, xs, chunk: int):
    """vmap(fn) over xs in chunks via lax.map (bounds peak memory)."""
    n = xs.shape[0]
    chunk = max(1, min(chunk, n))
    n_pad = (-n) % chunk
    xs_p = jnp.concatenate([xs, jnp.repeat(xs[:1], n_pad, axis=0)], axis=0)
    xs_c = xs_p.reshape((n + n_pad) // chunk, chunk, *xs.shape[1:])
    out = jax.lax.map(jax.vmap(fn), xs_c)
    return jax.tree_util.tree_map(
        lambda o: o.reshape(-1, *o.shape[2:])[:n], out
    )
