"""Periodic-stencil micro matvec for the chunk block-PCG (scalar P1).

Cell-problem micro meshes are box-periodic structured grids (the reference
has the same constraint, ``cell_problem.py:97-100``), so the reduced
periodic dof space is exactly the torus grid and the per-cell operator

    K_c[p, q] = Σ_{e,i,j} a[c, e] · (D_{e,i}ᵀ B_c D_{e,j}),
        loc2red[e, i] = p, loc2red[e, j] = q

couples each node only to a FIXED small set of periodic grid offsets
(7 in 2D, ≤15 in 3D for the uniform simplex tessellations).  The chunk
PCG's matrix-free matvec ``D2ᵀ(a ⊙ (D2·p))`` — two (nE·r, n)-by-(n, s·C)
matmuls, ~4 GFLOP per chunk iteration on the 16² benchmark mesh —
becomes Σ_k w_k ⊙ roll(p, -Δ_k): K elementwise multiply-adds on
(grid…, s, C) arrays (~15 MFLOP), with the cell axis minor so the VPU
lanes stay full and the rolls move whole lane-tiles along major axes.

The stencil weights w_k(node, c) are assembled once per chunk by a
gather-formulation reduction over a host-precomputed contributor table
(same idea as ops/assembly.py::build_gather_assembly): for each
(offset k, node p) the ≤M contributing (element, i, j) triples are
static; per chunk one gather from the reduced coefficient ``a`` and a
tiny einsum produce all weights.  Nullspace pinning is folded into the
weights (zeroed couplings + identity self-weight), so the stencil matvec
equals the engine's ``keep``/``pinf``-guarded matvec exactly.

Replaces: PETSc MatMult inside KSPSolve for the cell problems (reference
``cell_problem.py``, via ``hmm.py:420-426``); there is no counterpart
formulation in the reference — this exploits the periodic grid structure
the TPU way (static offsets, no indices in the hot loop).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "MicroStencil",
    "build_stencil",
    "stencil_weights",
    "stencil_matvec",
    "torus_coords",
]

# Size gate for the dense matmul formulations: above this many (K·n·nE)
# entries the dense operators' extra flops/constants outweigh the gather
# path's HBM traffic (the 16x16 benchmark mesh is 0.9M; 32x32 is 14.7M).
_DENSE_CAP = 4_000_000


@dataclass(frozen=True)
class MicroStencil:
    """Static stencil data (host numpy; embedded as constants per trace)."""

    shape: Tuple[int, ...]  # torus grid dims, prod = n_reduced
    offsets: np.ndarray  # (K, dim) periodic grid offsets
    te: List[np.ndarray]  # per offset: (n, M_k) element indices (pad = nE)
    gB: List[np.ndarray]  # per offset: (n, M_k, r, r) geometry tensors
    gw: List[np.ndarray]  # per offset: (n, M_k) identity-contracted gB
    self_k: int  # index of the zero offset (self coupling)
    pinned: np.ndarray  # pinned reduced node ids (identity rows)
    teF: np.ndarray  # (n, MF) element indices of (e, i)→node contributions
    gD: np.ndarray  # (n, MF, r) test gradients D_{e,i} (zeroed at pins)
    # Dense (MXU) formulations of the gather tables — the weight/RHS maps
    # are LINEAR in the reduced coefficient ``a``, so on small cell meshes
    # each becomes one shared-operand matmul instead of a (C, n, M) gather
    # (measured 4-5x on the per-chunk weight assembly; None above the
    # _DENSE_CAP size gate, where the gather's O(M/nE) sparsity wins).
    Wd: Optional[np.ndarray] = None  # (K·n, nE) identity-B_K weight map
    Wsym: Optional[np.ndarray] = None  # (K, n, nE, nsym) B_K-sym weight map
    WF: Optional[np.ndarray] = None  # (n, nE, r) dense RHS gradient map


def torus_coords(engine):
    """(shape, coords) of the reduced periodic NODE space as the raster
    torus grid, or None if the micro mesh is not a structured box whose
    reduced nodes raster-order onto the grid.

    ``shape`` is the grid dims (prod = number of reduced nodes) and
    ``coords`` is (n_nodes, dim) integer grid coordinates of reduced node
    p (verified to equal unravel_index(p, shape) — the identity the FFT
    preconditioner, the stencil matvecs, and the torus multigrid all rely
    on; re-checked here so an exotic mesh quietly falls back).  bs-aware
    callers multiply by the block size themselves.
    """
    st = engine.mesh.structure
    if st is None or engine.micro_degree != 1:
        return None
    shape = tuple(int(x) for x in np.asarray(st.shape))
    n_nodes = engine.n_reduced // engine.bs
    if int(np.prod(shape)) != n_nodes:
        return None
    red = np.asarray(engine.pmap.reduced_index)
    first = np.full(n_nodes, -1, dtype=np.int64)
    seen = np.zeros(n_nodes, dtype=bool)
    for v, p in enumerate(red):
        if not seen[p]:
            seen[p] = True
            first[p] = v
    verts = np.asarray(engine.mesh.vertices, dtype=np.float64)[first]
    lo = np.asarray(st.lo, dtype=np.float64)
    h = (np.asarray(st.hi, dtype=np.float64) - lo) / np.asarray(shape)
    coords = np.rint((verts - lo) / h).astype(np.int64) % np.asarray(shape)
    if not np.array_equal(
        np.ravel_multi_index(coords.T, shape), np.arange(n_nodes)
    ):
        return None
    return shape, coords


def build_stencil(engine) -> Optional[MicroStencil]:
    """Host-side stencil construction for a MicroEngine, or None.

    Requires a structured box micro mesh whose reduced periodic dofs are
    the raster-ordered torus grid (verified against the representative
    vertex coordinates), P1 micro elements, and a scalar problem (bs=1).
    """
    if engine.bs != 1:
        return None
    tc = torus_coords(engine)
    if tc is None:
        return None
    shape, coords = tc
    n = engine.n_reduced
    dim = engine.d

    loc2red = np.asarray(engine.loc2red)  # (ne, nbl)
    Draw = np.asarray(engine.Draw, dtype=np.float64)  # (ne, r, nbl)
    pin = np.asarray(engine.pin_mask)
    ne, nbl = loc2red.shape
    r = engine.r
    grid_of = coords  # (n, dim), grid coords of reduced node p

    # group contributions by periodic offset Δ = grid(q) − grid(p)
    groups: dict = {}
    for i in range(nbl):
        for j in range(nbl):
            p = loc2red[:, i]
            q = loc2red[:, j]
            off = (grid_of[q] - grid_of[p]) % np.asarray(shape)
            # geometry tensor D_{e,i} ⊗ D_{e,j}: (ne, r, r)
            g = Draw[:, :, i][:, :, None] * Draw[:, :, j][:, None, :]
            # pinning: zero couplings with a pinned endpoint (keep·keep);
            # the identity at pinned rows is restored in stencil_weights
            dead = pin[p] | pin[q]
            g = np.where(dead[:, None, None], 0.0, g)
            for e in range(ne):
                key = tuple(off[e])
                groups.setdefault(key, []).append((int(p[e]), e, g[e]))

    offsets = sorted(groups.keys())
    zero = tuple([0] * dim)
    if zero not in offsets:
        offsets.append(zero)
        groups[zero] = []
        offsets = sorted(offsets)
    te_list, gB_list, gw_list = [], [], []
    for off in offsets:
        per_node: List[list] = [[] for _ in range(n)]
        for p, e, g in groups[off]:
            per_node[p].append((e, g))
        M = max(1, max(len(c) for c in per_node))
        te = np.full((n, M), ne, dtype=np.int32)  # pad slot = ne (a = 0)
        gB = np.zeros((n, M, r, r), dtype=np.float64)
        for p, contribs in enumerate(per_node):
            for m, (e, g) in enumerate(contribs):
                te[p, m] = e
                gB[p, m] = g
        te_list.append(te)
        gB_list.append(gB)
        gw_list.append(np.einsum("nmrr->nm", gB))

    # RHS table: per node p, the (e, i) contributions with loc2red[e,i]=p
    # (the load F = −D2ᵀ(Ā Tᵀ E) keep-masked is a gather-reduce over it)
    per_node_F: List[list] = [[] for _ in range(n)]
    for i in range(nbl):
        p = loc2red[:, i]
        for e in range(ne):
            if not pin[p[e]]:
                per_node_F[p[e]].append((e, Draw[e, :, i]))
    MF = max(1, max(len(c) for c in per_node_F))
    teF = np.full((n, MF), ne, dtype=np.int32)
    gD = np.zeros((n, MF, r), dtype=np.float64)
    for p, contribs in enumerate(per_node_F):
        for m, (e, g) in enumerate(contribs):
            teF[p, m] = e
            gD[p, m] = g

    # dense matmul forms (gate: total dense entries small enough that the
    # O(nE/M) extra flops stay cheap MXU work instead of HBM pressure)
    K = len(te_list)
    Wd = Wsym = WF = None
    if K * n * ne <= _DENSE_CAP:
        nsym = r * (r + 1) // 2
        Wd = np.zeros((K, n, ne), dtype=np.float64)
        Wsym = np.zeros((K, n, ne, nsym), dtype=np.float64)
        pairs = [(i, i) for i in range(r)] + [
            (i, j) for i in range(r) for j in range(i + 1, r)
        ]
        for k in range(K):
            tek, gBk = te_list[k], gB_list[k]
            for p in range(n):
                for m in range(tek.shape[1]):
                    e = tek[p, m]
                    if e >= ne:
                        continue
                    Wd[k, p, e] += np.trace(gBk[p, m])
                    for si, (i, j) in enumerate(pairs):
                        # symmetric B_K: off-diagonal pairs contribute
                        # gB[i,j] + gB[j,i] against B_K[i,j]
                        v = gBk[p, m, i, j]
                        if i != j:
                            v = v + gBk[p, m, j, i]
                        Wsym[k, p, e, si] += v
        Wd = Wd.reshape(K * n, ne)
        WF = np.zeros((n, ne, r), dtype=np.float64)
        for p in range(n):
            for m in range(teF.shape[1]):
                e = teF[p, m]
                if e < ne:
                    WF[p, e] += gD[p, m]
    return MicroStencil(
        shape=shape,
        offsets=np.asarray(offsets, dtype=np.int64),
        te=te_list,
        gB=gB_list,
        gw=gw_list,
        self_k=offsets.index(zero),
        pinned=np.nonzero(pin)[0],
        teF=teF,
        gD=gD,
        Wd=Wd,
        Wsym=Wsym,
        WF=WF,
    )


def stencil_weights(st: MicroStencil, a, B_K=None):
    """Per-chunk stencil weights, one (n, C) array per offset.

    Dense path (``st.Wd``/``st.Wsym`` present): the weights are linear in
    ``a``, so all K offsets assemble as ONE (K·n, nE)-by-(nE, C) matmul —
    MXU work with a single read of ``a`` instead of K (C, n, M) gathers.

    Args:
        st: the static stencil.
        a: (C, nE) reduced scalar coefficient.
        B_K: optional per-cell (C, r, r) gradient-map Gram GᵀG (stratified
            problems); None means identity.
    """
    C = a.shape[0]
    K = len(st.te)
    n = st.te[0].shape[0]
    if st.Wd is not None and B_K is None:
        W = jnp.asarray(st.Wd, dtype=a.dtype)  # (K·n, nE)
        ws_all = (W @ a.T).reshape(K, n, C)
        ws = [ws_all[k] for k in range(K)]
    elif st.Wsym is not None and B_K is not None:
        r = B_K.shape[-1]
        nsym = r * (r + 1) // 2
        Wsym = jnp.asarray(st.Wsym, dtype=a.dtype)  # (K, n, nE, nsym)
        t1 = (
            Wsym.transpose(0, 1, 3, 2).reshape(K * n * nsym, -1) @ a.T
        ).reshape(K, n, nsym, C)
        pairs = [(i, i) for i in range(r)] + [
            (i, j) for i in range(r) for j in range(i + 1, r)
        ]
        Bs = jnp.stack([B_K[:, i, j] for (i, j) in pairs], axis=0)  # (nsym, C)
        ws_all = jnp.einsum("knsc,sc->knc", t1, Bs)
        ws = [ws_all[k] for k in range(K)]
    else:
        a_pad = jnp.concatenate([a, jnp.zeros((C, 1), a.dtype)], axis=1)
        ws = []
        for k in range(K):
            av = a_pad[:, st.te[k]]  # (C, n, M)
            if B_K is None:
                wk = jnp.einsum("cnm,nm->nc", av, st.gw[k].astype(a.dtype))
            else:
                wk = jnp.einsum(
                    "cnm,nmrt,crt->nc", av, st.gB[k].astype(a.dtype), B_K
                )
            ws.append(wk)
    if st.pinned.size:
        ws[st.self_k] = ws[st.self_k].at[st.pinned, :].set(1.0)
    return ws


def scale_weights(st: MicroStencil, ws, sc2):
    """Fold the symmetric diagonal scaling into the weights: the scaled
    operator (S K S)[p, p+Δk] = sc[p]·w_k[p]·sc[p+Δk], so
    ``ws_s[k] = sc2 ⊙ ws[k] ⊙ roll(sc2, -Δk)`` — this lets a solver (the
    fused Pallas PCG) run on the scaled system with no scaling inside its
    loop.  ``sc2`` is (n, C) with 1.0 at pinned rows (the engine's ``sc``),
    which preserves the identity self-weight at pins exactly."""
    n, C = sc2.shape
    g = sc2.reshape(*st.shape, C)
    axes = tuple(range(len(st.shape)))
    out = []
    for k, off in enumerate(st.offsets):
        if all(int(o) == 0 for o in off):
            rolled = sc2
        else:
            rolled = jnp.roll(
                g, tuple(-int(o) for o in off), axis=axes
            ).reshape(n, C)
        out.append(sc2 * ws[k] * rolled)
    return out


def stencil_rhs(st: MicroStencil, a, E, TE=None):
    """Generator load F = −D2ᵀ(Ā Tᵀ E) (keep-masked) by gather-reduce.

    Replaces the matrix-free build (a (nE, r, s, C) broadcast intermediate
    plus a (nE·r, n)ᵀ matmul) with one gather from ``a`` and a tiny einsum
    over the static contributor gradients — algebraically identical.

    Args:
        a: (C, nE) reduced coefficient.
        E: (r, s) static generators (used when TE is None).
        TE: optional per-cell (C, r, s) mapped generators Tᵀ(c)·E.
    Returns: (n, s, C).
    """
    C = a.shape[0]
    if st.WF is not None:
        WF = jnp.asarray(st.WF, dtype=a.dtype)  # (n, nE, r)
        n, nE, r = WF.shape
        if TE is None:
            RE = jnp.einsum("ner,rs->nse", WF, E)  # static fold
            s = E.shape[1]
            return -(RE.reshape(n * s, nE) @ a.T).reshape(n, s, C)
        H = (WF.transpose(0, 2, 1).reshape(n * r, nE) @ a.T).reshape(n, r, C)
        return -jnp.einsum("nrc,crs->nsc", H, TE)
    a_pad = jnp.concatenate([a, jnp.zeros((C, 1), a.dtype)], axis=1)
    av = a_pad[:, st.teF]  # (C, n, MF)
    gD = jnp.asarray(st.gD, dtype=a.dtype)
    if TE is None:
        gE = jnp.einsum("nmr,rs->nms", gD, E)  # static fold
        return -jnp.einsum("cnm,nms->nsc", av, gE)
    return -jnp.einsum("cnm,nmr,crs->nsc", av, gD, TE)


def stencil_astar(st: MicroStencil, ws, a, E, F, X, TE=None):
    """Homogenized tensor by the exact bilinear expansion.

    A*(X̃)·|Y| = Σ_e a_e (E + T·D X̃)ᵀ (E + T·D X̃) expands ALGEBRAICALLY
    (with F = −D2ᵀ(Ā Tᵀ E), K = D2ᵀ(a TᵀT)D2, the PCG system K X = F) to

        (Σ_e a_e)·(EᵀE)  −  FᵀX̃  −  X̃ᵀF  +  X̃ᵀ K X̃

    for ANY iterate X̃ (the keep/pin foldings cancel because X̃ and F
    vanish at pinned rows; E itself is unmapped in Φ, so Term1 carries no
    T) — this equals the engine's Φᵀ Ā Φ contraction without
    materializing the (nE, r, s, C) gradient fields: one stencil matvec
    and three (s, s, C) dots.  The quadratic accuracy of the Galerkin
    energy in the PCG residual is preserved exactly (X̃ᵀKX̃ is computed,
    not replaced by X̃ᵀF).

    Returns: (C, s, s) — NOT divided by |Y| (the engine applies 1/|Y|).
    """
    del TE  # Term1 is T-independent; kept in the signature for clarity
    a_sum = jnp.sum(a, axis=1)  # (C,)
    T1 = a_sum[:, None, None] * (E.T @ E)[None]
    FX = jnp.einsum("nsc,ntc->cst", F, X)  # (C, s, s)
    KX = stencil_matvec(st, ws, X)
    XKX = jnp.einsum("nsc,ntc->cst", X, KX)
    return T1 - FX - jnp.swapaxes(FX, -1, -2) + XKX


def stencil_matvec(st: MicroStencil, ws, P):
    """K·P via periodic rolls: P (n, s, C) → (n, s, C).

    Equals the engine's guarded matvec (keep/pin semantics are folded into
    the weights).  The grid axes are major, so ``jnp.roll`` moves whole
    lane-tiles; every multiply-add runs with the cell axis on the lanes.
    """
    n, s, C = P.shape
    dim = len(st.shape)
    Pg = P.reshape(*st.shape, s, C)
    out = None
    axes = tuple(range(dim))
    for k, off in enumerate(st.offsets):
        if all(o == 0 for o in off):
            x = Pg
        else:
            x = jnp.roll(Pg, tuple(-int(o) for o in off), axis=axes)
        term = ws[k].reshape(*st.shape, 1, C) * x
        out = term if out is None else out + term
    return out.reshape(n, s, C)
