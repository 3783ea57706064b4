"""Block periodic-stencil micro matvec (vector problems, P1).

The scalar chunk PCG already exploits the torus structure of the reduced
periodic dof space (micro/stencil.py): K·p = Σ_k w_k ⊙ roll(p, -Δ_k).
The SAME structure holds for vector (elasticity) cell problems — the
verdict's "the vector stencil is the same torus with (bs, bs) blocks per
offset": each reduced NODE couples to the fixed ≤3^d periodic grid
offsets, with a (bs, bs) coefficient block per (node, offset) instead of
a scalar weight,

    K[p·bs+bi, q·bs+bj] = Σ_{e,a,b} D_{e,(a,bi)}ᵀ A_K(c, e) D_{e,(b,bj)},
        node(e, a) = p, node(e, b) = q, Δ = grid(q) − grid(p).

The matvec becomes Σ_k W_k · roll(P, -Δ_k) — K·bs²·s multiply-adds per
grid site with the cell axis minor (full vector lanes), instead of the
matrix-free expand/weight/reduce matmuls (O(nE·r·(n + r·s)) per
iteration — ~40× more FLOPs on the 16³ elasticity cell, the round-4
763-iteration route's per-iteration cost).  It is also the algebraic
form the torus multigrid preconditioner (micro/mg_prec.py) coarsens.

Weight assembly per chunk reuses the densek element-block einsum
(``blocks[c,e,a·bs+bi,b·bs+bj] = Draw
ᵀ A_K Draw``) and scatters the
(a, b) node-pair blocks onto their static (node, offset) targets —
O(nE·nbl²) values, the same count as the dense-K scatter, but into a
(n·K, bs, bs) target instead of (n, n): memory O(n·3^d·bs²) per cell, so
16³ elasticity cells hold a 2.2 MB stencil instead of a 600 MB dense K.

Pinning (the constant-translation nullspace) is folded into the weights
exactly like the scalar stencil: couplings with a pinned endpoint are
zeroed at assembly (a static per-(e, a, b) mask) and the pinned node's
self block is restored to the identity, so the stencil matvec equals the
engine's ``keep``/``pinf``-guarded matvec bitwise in structure.

Replaces: PETSc MatMult inside the reference's per-basis cell KSP solves
(reference ``cell_problem.py``, via ``hmm.py:420-426``); the reference
has no counterpart formulation — this is the TPU-native exploitation of
the periodic grid, extended from the scalar stencil to elasticity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "BlockStencil",
    "build_block_stencil",
    "block_stencil_weights",
    "block_stencil_matvec",
    "scale_block_weights",
]


@dataclass(frozen=True)
class BlockStencil:
    """Static block-stencil data (host numpy; trace-local constants)."""

    shape: Tuple[int, ...]  # torus grid dims, prod = n_nodes
    bs: int  # block size (= dim for elasticity)
    offsets: np.ndarray  # (K, dim) periodic grid offsets (canonical mod)
    tgt: np.ndarray  # (nE·nnd·nnd,) scatter target (node·K + k)
    keep: np.ndarray  # (nE·nnd·nnd,) 0/1 pin mask per contribution
    self_k: int  # index of the zero offset
    pinned: np.ndarray  # pinned reduced node ids


def build_block_stencil(engine) -> Optional[BlockStencil]:
    """Host-side block-stencil construction for a MicroEngine, or None.

    Requires a structured box micro mesh whose reduced periodic NODES are
    the raster torus grid (micro/stencil.py::torus_coords) and P1 micro
    elements.  Works for any block size (bs = 1 reproduces the scalar
    stencil's couplings with 1×1 blocks; the scalar path keeps its own
    optimized weight formulations)."""
    from hommx_tpu.micro.stencil import torus_coords

    tc = torus_coords(engine)
    if tc is None:
        return None
    shape, coords = tc
    bs = engine.bs
    red = np.asarray(engine.pmap.reduced_index)
    node_cells = np.asarray(engine._node_cells)  # (nE, nnd)
    red_cells = red[node_cells]  # (nE, nnd) reduced node per local node
    nE, nnd = red_cells.shape
    sh = np.asarray(shape)

    # per (e, a, b): offset Δ = grid(node(e,b)) − grid(node(e,a)) mod shape
    p = red_cells[:, :, None]  # (nE, nnd, 1) target node
    q = red_cells[:, None, :]  # (nE, 1, nnd) source node
    off = (coords[q] - coords[p]) % sh  # (nE, nnd, nnd, dim)
    off_flat = np.ravel_multi_index(
        np.moveaxis(off, -1, 0), shape
    )  # (nE, nnd, nnd) offset key as raveled index
    keys = np.unique(off_flat)
    offsets = np.stack(np.unravel_index(keys, shape), axis=-1)  # (K, dim)
    k_of = np.full(int(np.prod(shape)), -1, dtype=np.int64)
    k_of[keys] = np.arange(keys.size)
    K = keys.size

    # pinned node set: the engine pins the bs dofs of reduced vertex 0
    # (engine pin_mask[:bs]); as a NODE set that is exactly node 0
    pin_nodes = np.zeros(int(np.prod(shape)), dtype=bool)
    pin_nodes[0] = True

    tgt = (p * K + k_of[off_flat]).reshape(-1)  # (nE·nnd·nnd,)
    dead = pin_nodes[p] | pin_nodes[q]  # either endpoint pinned
    keep = np.logical_not(dead).astype(np.float64).reshape(-1)

    zero = int(np.ravel_multi_index((0,) * len(shape), shape))
    self_k = int(k_of[zero])
    return BlockStencil(
        shape=shape,
        bs=bs,
        offsets=offsets.astype(np.int64),
        tgt=tgt.astype(np.int64),
        keep=keep,
        self_k=self_k,
        pinned=np.nonzero(pin_nodes)[0],
    )


def block_stencil_weights(st: BlockStencil, engine, A_K) -> jnp.ndarray:
    """Per-chunk block weights W (K, n_nodes, bs, bs, C) from the mapped
    per-element coefficient blocks A_K (C, nE, r, r).

    One einsum builds the element blocks (the densek assembly's
    ``blocks``), one static scatter-add groups them by (node, offset).
    """
    C = A_K.shape[0]
    bs = st.bs
    nE, nnd = np.asarray(engine._node_cells).shape
    n_nodes = int(np.prod(st.shape))
    K = st.offsets.shape[0]
    # element blocks (C, nE, nbl, nbl), nbl = nnd·bs
    blocks = jnp.einsum(
        "erl,cert,etm->celm", engine.Draw, A_K, engine.Draw
    )
    # (C, nE, a, bi, b, bj) -> (C, nE·nnd·nnd, bs, bs)
    vals = blocks.reshape(C, nE, nnd, bs, nnd, bs)
    vals = jnp.moveaxis(vals, 3, 4).reshape(C, nE * nnd * nnd, bs, bs)
    vals = vals * jnp.asarray(st.keep, dtype=vals.dtype)[None, :, None, None]
    W = jnp.zeros((C, n_nodes * K, bs, bs), dtype=vals.dtype)
    W = W.at[:, jnp.asarray(st.tgt)].add(vals)
    W = W.reshape(C, n_nodes, K, bs, bs)
    # identity self block at pinned nodes (replaces the keep/pin guards)
    if st.pinned.size:
        eye = jnp.eye(bs, dtype=vals.dtype)
        W = W.at[:, jnp.asarray(st.pinned), st.self_k].set(eye[None, None])
    # cells minor for the matvec: (K, n_nodes, bs, bs, C)
    return jnp.moveaxis(W, 0, -1).transpose(1, 0, 2, 3, 4)


def block_stencil_matvec(st: BlockStencil, W, P):
    """K·P via periodic rolls: P (n_nodes·bs, s, C) → same shape.

    W: (K, n_nodes, bs, bs, C) as returned by block_stencil_weights.
    Per offset one roll of the grid-shaped field and one tiny (bi, bj)
    contraction, elementwise over (grid, C) — VPU work with the cell
    axis on the lanes.
    """
    nbs, s, C = P.shape
    bs = st.bs
    dim = len(st.shape)
    Pg = P.reshape(*st.shape, bs, s, C)
    axes = tuple(range(dim))
    out = None
    for k in range(st.offsets.shape[0]):
        off = st.offsets[k]
        if all(int(o) == 0 for o in off):
            x = Pg
        else:
            x = jnp.roll(Pg, tuple(-int(o) for o in off), axis=axes)
        Wk = W[k].reshape(*st.shape, bs, bs, C)
        term = jnp.einsum("...ijc,...jsc->...isc", Wk, x)
        out = term if out is None else out + term
    return out.reshape(nbs, s, C)


def scale_block_weights(st: BlockStencil, W, sc2):
    """Fold the symmetric diagonal scaling into the block weights:
    (S K S)[p·bs+bi, (p+Δ)·bs+bj] = sc[p,bi]·W_k[p,bi,bj]·sc[p+Δ,bj].

    ``sc2`` is (n_nodes·bs, C) with 1.0 at pinned dofs (the engine's
    ``sc``), which preserves the identity self block at pins exactly.
    """
    n_nodes = int(np.prod(st.shape))
    bs = st.bs
    C = sc2.shape[-1]
    scn = sc2.reshape(n_nodes, bs, C)
    g = scn.reshape(*st.shape, bs, C)
    axes = tuple(range(len(st.shape)))
    out = []
    for k in range(st.offsets.shape[0]):
        off = st.offsets[k]
        if all(int(o) == 0 for o in off):
            rolled = scn
        else:
            rolled = jnp.roll(
                g, tuple(-int(o) for o in off), axis=axes
            ).reshape(n_nodes, bs, C)
        out.append(
            W[k] * scn[:, :, None, :] * rolled[:, None, :, :]
        )
    return jnp.stack(out, axis=0)
