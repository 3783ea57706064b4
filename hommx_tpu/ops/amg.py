"""Aggregation-based algebraic multigrid for UNSTRUCTURED macro systems.

Companion to the geometric hierarchy (ops/multigrid.py), covering the mesh
classes it declines: Delaunay / file meshes (``helpers.py:125-209`` of the
reference are part of its supported surface) and P2 dof layouts.  Together
they replace PETSc GAMG, which accepts any mesh
(``test_integration_poisson.py:207-212``, ``rotated_fibers.py:98``).

TPU-first constraints shape the design:

  * **Static everything.**  Aggregation (greedy, on the ELL adjacency
    graph) runs on host once per mesh; every level's ELL sparsity pattern
    and all transfer index maps are precomputed arrays, so the traced
    per-operator setup (``amg_setup``) is a handful of gathers and
    scatter-adds with fixed shapes.
  * **Smoothed aggregation with STATIC sparsity** (the default).  The
    classic objection — the triple product A_c = Pᵀ A P has dynamic
    sparsity — does not actually apply: P's PATTERN is value-independent
    (row i couples to the aggregates of its graph neighbours), so the
    patterns of P, AP and PᵀAP are all host-precomputable.  Only P's
    VALUES are traced: P = (I − ω D⁻¹A) P₀ with ω = 4/(3 λmax(D⁻¹A)),
    the standard Jacobi prolongation smoother.  The whole triple product
    becomes two static scatter-adds over precomputed contributor tables.
    Measured on the 72²-point jittered-Delaunay Poisson system: 21 PCG
    iterations (plain) → single digits (smoothed), closing the quality gap
    to PETSc GAMG's smoothed-aggregation default.
  * **Plain aggregation kept** (``smoothed=False``): piecewise-constant P,
    strength in the smoother, coarse-correction over-relaxation ω=1.8 —
    cheaper setup, more iterations; retained as the A/B fallback.
  * **Dense bottom inverse** below ``bottom_max`` dofs, exactly like the
    geometric hierarchy (Newton–Schulz on TPU, Cholesky elsewhere).

Dirichlet handling mirrors mg_setup: BC rows are identity rows after
``apply_dirichlet`` (zero off-diagonal mass), detected per level by the
zmask trick; P's BC rows are zeroed (traced values — the static pattern
keeps the slots), so BC coupling cannot leak into the coarse operator.
Aggregates carrying no interior mass become identity rows on the coarse
level, recursively.

The V-cycle (equal pre/post Chebyshev smoothing, variational hierarchy) is
an SPD preconditioner and composes with CG in ops/solvers.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AMGStructure", "build_amg_structure", "amg_setup", "amg_vcycle"]

#: target coarsest size for the dense bottom inverse (see multigrid.py)
_BOTTOM_MAX = 1500
#: stop coarsening when a level shrinks by less than this factor
_MIN_COARSEN = 1.2
#: Chebyshev smoothing degree — one higher than the geometric hierarchy's:
#: aggregation transfers shift more of the work onto the smoother
#: (measured 35 → 31 PCG iterations on the 72²-point Delaunay system)
_CHEB_DEGREE = 3
#: PLAIN-aggregation coarse-correction over-relaxation: the
#: piecewise-constant coarse space is too stiff and systematically
#: UNDERestimates corrections; scaling by ω ∈ (0, 2) keeps the cycle
#: symmetric (the correction term is P(ωA_c⁻¹)Pᵀ, still SPD) while fixing
#: the bias — the standard plain-aggregation remedy.  Measured on the
#: 72²-point Delaunay system: ω 1.0 → 31 its, 1.8 → 21.  The smoothed
#: hierarchy does not need it (its coarse space is consistent) and uses 1.
_OVERCORRECT = 1.8


@dataclasses.dataclass(frozen=True)
class _ALevel:
    """One level: its ELL pattern + the transfer data down to the next.

    ``cols``/``diag_slots`` describe THIS level's operator layout; the
    transfer members are None on the bottom level.  The ``p_*``/``ap_*``/
    ``c_*`` members are the smoothed-aggregation index maps (None on plain
    hierarchies): see ``_sa_maps`` for their construction.
    """

    n_dofs: int
    cols: np.ndarray  # (N, K) ELL column indices
    diag_slots: np.ndarray  # (N,)
    slot_rows: np.ndarray  # (N*K,) row of each flat slot
    real_slots: np.ndarray  # (N*K,) bool — structurally present entries
    agg_dof: Optional[np.ndarray] = None  # (N,) fine dof → coarse dof
    slot_map: Optional[np.ndarray] = None  # (N*K,) flat slot → coarse slot
    power_vec: Optional[np.ndarray] = None  # λmax power-iteration start
    # --- smoothed-aggregation transfer (None on plain hierarchies) ---
    p_cols: Optional[np.ndarray] = None  # (N, KP) coarse col of each P slot
    p_rows: Optional[np.ndarray] = None  # (N*KP,) row of each flat P slot
    p0_slot: Optional[np.ndarray] = None  # (N, m) P slots of the tentative P₀
    p0_w: Optional[np.ndarray] = None  # (N, m) static P₀ kernel weights
    a_to_p: Optional[np.ndarray] = None  # (N*K, m) A slot → P slots (trash pad)
    ps_w: Optional[np.ndarray] = None  # (N*K, m) static smoothing weights w0[j]
    ap_contrib: Optional[tuple] = None  # (a_slot, p_slot, ap_slot) arrays
    n_ap: int = 0  # flat size of the AP value array
    c_contrib: Optional[tuple] = None  # (p_slot, ap_slot, out_slot) arrays


@dataclasses.dataclass(frozen=True)
class AMGStructure:
    bs: int
    levels: tuple  # of _ALevel
    smoothed: bool = False

    @property
    def num_levels(self) -> int:
        return len(self.levels)


def _greedy_aggregate(adj_rows, adj_cols, n_nodes: int):
    """Greedy aggregation: every unaggregated node in turn seeds an
    aggregate of itself + its unaggregated neighbours (the classic plain
    aggregation; every node is covered in one pass).  Input: the node
    adjacency as COO arrays sorted by row.

    The inherently sequential sweep runs in the native C++ host runtime
    when available (identical output by construction; the Python loop is
    the fallback and the equivalence gate, tests/test_native.py)."""
    order = np.argsort(adj_rows, kind="stable")
    rows_s, cols_s = adj_rows[order], adj_cols[order]
    starts = np.searchsorted(rows_s, np.arange(n_nodes + 1))
    from hommx_tpu import native

    res = native.greedy_aggregate_native(rows_s, cols_s, n_nodes)
    if res is not None:
        agg, na = res
    else:
        agg = np.full(n_nodes, -1, dtype=np.int64)
        na = 0
        for i in range(n_nodes):
            if agg[i] >= 0:
                continue
            agg[i] = na
            for j in cols_s[starts[i] : starts[i + 1]]:
                if agg[j] < 0:
                    agg[j] = na
            na += 1
    return _merge_singletons(np.asarray(agg), int(na), cols_s, starts)


def _merge_singletons(agg, na, cols_s, starts):
    """Post-pass: fold singleton aggregates into a neighbouring aggregate.

    The greedy sweep strands nodes whose neighbours were all taken by
    earlier seeds (~10-20% on Delaunay graphs) as singletons, which
    interpolate poorly — a singleton's P₀ column has one entry, so even
    the smoothed P barely spreads it.  Each singleton joins the aggregate
    of its first differently-aggregated neighbour (isolated nodes stay).
    Runs on the output of BOTH the native and Python sweeps (pure numpy),
    preserving their equivalence; ids are recompressed afterwards."""
    agg = agg.copy()
    n_nodes = agg.shape[0]
    sizes = np.bincount(agg, minlength=na)
    for i in np.nonzero(sizes[agg] == 1)[0]:
        for j in cols_s[starts[i] : starts[i + 1]]:
            if agg[j] != agg[i]:
                sizes[agg[j]] += 1
                sizes[agg[i]] -= 1
                agg[i] = agg[j]
                break
    uniq, agg = np.unique(agg, return_inverse=True)
    return agg.astype(np.int64).reshape(n_nodes), len(uniq)


def _ell_from_coo(rows, cols, n: int):
    """Host ELL layout from unique COO pairs; returns (cols_arr, K,
    pair_slot) with pair_slot the flat slot of each input pair."""
    keys = rows.astype(np.int64) * n + cols.astype(np.int64)
    uniq = np.unique(keys)
    urows = (uniq // n).astype(np.int64)
    ucols = (uniq % n).astype(np.int64)
    counts = np.bincount(urows, minlength=n)
    K = int(counts.max())
    row_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(uniq.shape[0]) - row_starts[urows]
    uslot = (urows * K + pos).astype(np.int64)
    cols_arr = np.zeros((n, K), dtype=np.int32)
    cols_arr.reshape(-1)[uslot] = ucols
    # lookup: slot of an arbitrary (row, col) pair via searchsorted on keys
    lookup = (uniq, uslot)
    diag = np.zeros(n, dtype=np.int64)
    dmask = urows == ucols
    diag[urows[dmask]] = uslot[dmask]
    return cols_arr, K, lookup, diag


def _ell_rect(rows, cols, nrows: int, ncols: int):
    """Host ELL layout for a rectangular pattern from (possibly repeated)
    COO pairs.  Returns (cols_arr (nrows, K), K, (ukeys, uslot), real)
    where ``real`` marks structurally present flat slots and the lookup
    maps an arbitrary present (row, col) pair to its flat slot."""
    keys = rows.astype(np.int64) * ncols + cols.astype(np.int64)
    uniq = np.unique(keys)
    urows = (uniq // ncols).astype(np.int64)
    ucols = (uniq % ncols).astype(np.int64)
    counts = np.bincount(urows, minlength=nrows)
    K = int(counts.max())
    row_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(uniq.shape[0]) - row_starts[urows]
    uslot = (urows * K + pos).astype(np.int64)
    cols_arr = np.zeros((nrows, K), dtype=np.int32)
    cols_arr.reshape(-1)[uslot] = ucols
    real = np.zeros(nrows * K, dtype=bool)
    real[uslot] = True
    return cols_arr, K, (uniq, uslot), real


def _ragged_enumerate(rep):
    """For groups of sizes ``rep``: the within-group index 0..rep_g-1 of
    every element of the concatenation (the standard cumsum trick)."""
    csum = np.concatenate([[0], np.cumsum(rep)[:-1]])
    return np.arange(int(rep.sum())) - np.repeat(csum, rep)


def _aggregate_qr(B, agg, bs_l: int, na: int, m: int):
    """Per-aggregate thin QR of the near-kernel rows (host, numpy).

    SA's tentative prolongation P₀ stacks, per aggregate g, the orthonormal
    factor Q_g of the kernel block B[dofs(g)] as a (|dofs(g)|, m) column
    block; the coarse kernel rows become R_g, so the hierarchy carries the
    kernel exactly level to level (B = P₀ B_c).  Column scaling/mixing of
    P never changes the V-cycle correction P A_c⁻¹ Pᵀ, so orthonormality
    costs nothing and keeps every coarse operator well scaled.

    Returns (w0 (N, m) static P₀ weights per fine dof, Bc (na·m, m) coarse
    kernel).  Rank-deficient blocks (aggregate smaller than m dofs) leave
    zero columns; the empty coarse diagonals get the identity fix.
    """
    N = B.shape[0]
    agg_of_dof = agg[np.arange(N) // bs_l]
    order = np.argsort(agg_of_dof, kind="stable")
    bounds = np.searchsorted(agg_of_dof[order], np.arange(na + 1))
    w0 = np.zeros((N, m))
    Bc = np.zeros((na * m, m))
    for g in range(na):
        d = order[bounds[g] : bounds[g + 1]]
        Q, R = np.linalg.qr(B[d], mode="reduced")
        r = Q.shape[1]
        w0[d, :r] = Q
        Bc[g * m : g * m + r, :] = R
    return w0, Bc


def _sa_maps(rows_d, cols_d, r_idx, agg0, w0, N: int, K: int, Nc: int, m: int):
    """Host index maps for the smoothed-aggregation transfer and triple
    product, all with static sparsity.

    With the tentative P₀ holding, per fine dof i, the m static kernel
    weights ``w0[i]`` in coarse columns ``agg0[i] + t`` (t < m), and
    P = (I − ω D⁻¹A) P₀, the pattern of P's row i is
    { agg0[j] + t : j in the graph row of i } — purely structural.  The
    patterns of AP = A·P and A_c = Pᵀ·(AP) follow by the same closure, so
    every product collapses to a gather-multiply + scatter-add over
    contributor tables built here once per mesh.

    Args: real A entries as COO (rows_d, cols_d) with flat slots r_idx;
    agg0 (N,) the FIRST coarse dof of each fine dof's aggregate; w0 the
    static P₀ weights.
    Returns (p_cols, p_rows, p0_slot, a_to_p, ps_w, ap_contrib, n_ap,
    c_contrib, cols_c, Kc, diag_c, real_c).
    """
    ar_m = np.arange(m, dtype=np.int64)
    # ---- P pattern --------------------------------------------------
    pr = np.concatenate(
        [np.repeat(rows_d, m), np.repeat(np.arange(N, dtype=np.int64), m)]
    )
    pc = np.concatenate(
        [
            (agg0[cols_d][:, None] + ar_m).reshape(-1),
            (agg0[:, None] + ar_m).reshape(-1),
        ]
    )
    p_cols, KP, (pkeys, puslot), p_real = _ell_rect(pr, pc, N, Nc)

    def pslot(r, c):
        return puslot[np.searchsorted(pkeys, r * np.int64(Nc) + c)]

    p0_slot = pslot(
        np.repeat(np.arange(N, dtype=np.int64), m),
        (agg0[:, None] + ar_m).reshape(-1),
    ).reshape(N, m)
    # smoothing term slots/weights: A slot (i,j) spreads into the m coarse
    # columns of j's aggregate with the static kernel weights w0[j]
    a_to_p = np.full((N * K, m), N * KP, dtype=np.int64)  # padding → trash
    a_to_p[r_idx] = pslot(
        np.repeat(rows_d, m), (agg0[cols_d][:, None] + ar_m).reshape(-1)
    ).reshape(-1, m)
    ps_w = np.zeros((N * K, m))
    ps_w[r_idx] = w0[cols_d]
    p_rows = np.repeat(np.arange(N, dtype=np.int64), KP)

    # ---- AP = A·P: one contribution per (real A slot (i,j)) × (real P
    # slot (j, q)) pair ------------------------------------------------
    p_rslots = np.nonzero(p_real)[0]
    p_rows_of = p_rslots // KP
    p_row_starts = np.searchsorted(p_rows_of, np.arange(N + 1))
    p_deg = np.diff(p_row_starts)
    rep = p_deg[cols_d]
    contrib_a = np.repeat(r_idx, rep)
    contrib_i = np.repeat(rows_d, rep)
    contrib_p = p_rslots[np.repeat(p_row_starts[cols_d], rep) + _ragged_enumerate(rep)]
    ap_c = p_cols.reshape(-1)[contrib_p].astype(np.int64)
    ap_cols, K_AP, (apkeys, apuslot), ap_real = _ell_rect(
        contrib_i, ap_c, N, Nc
    )
    contrib_ap = apuslot[
        np.searchsorted(apkeys, contrib_i * np.int64(Nc) + ap_c)
    ]
    ap_contrib = (
        contrib_a.astype(np.int64),
        contrib_p.astype(np.int64),
        contrib_ap.astype(np.int64),
    )

    # ---- A_c = Pᵀ·AP: one contribution per fine row i per (real P slot
    # (i,I)) × (real AP slot (i,c)) pair --------------------------------
    ap_rslots = np.nonzero(ap_real)[0]
    ap_rows_of = ap_rslots // K_AP
    ap_row_starts = np.searchsorted(ap_rows_of, np.arange(N + 1))
    ap_deg = np.diff(ap_row_starts)
    rep2 = ap_deg[p_rows_of]
    c_p = np.repeat(p_rslots, rep2)
    c_ap = ap_rslots[
        np.repeat(ap_row_starts[p_rows_of], rep2) + _ragged_enumerate(rep2)
    ]
    cI = p_cols.reshape(-1)[c_p].astype(np.int64)
    cc = ap_cols.reshape(-1)[c_ap].astype(np.int64)
    cols_c, Kc, (ckeys, cuslot), real_c = _ell_rect(cI, cc, Nc, Nc)
    c_out = cuslot[np.searchsorted(ckeys, cI * np.int64(Nc) + cc)]
    c_contrib = (
        c_p.astype(np.int64),
        c_ap.astype(np.int64),
        c_out.astype(np.int64),
    )
    # coarse diagonal slots — structurally always present: every aggregate
    # I has a member row i with P slot (i, I) and AP slot (i, I)
    dkeys = np.arange(Nc, dtype=np.int64) * Nc + np.arange(Nc)
    dpos = np.searchsorted(ckeys, dkeys)
    assert np.array_equal(ckeys[dpos], dkeys), "coarse diagonal missing"
    diag_c = cuslot[dpos]
    return (
        p_cols, p_rows, p0_slot, a_to_p, ps_w, ap_contrib, N * K_AP,
        c_contrib, cols_c, Kc, diag_c, real_c,
    )


def build_amg_structure(
    pattern,
    bs: int,
    bottom_max: Optional[int] = None,
    smoothed: bool = True,
    near_kernel: Optional[np.ndarray] = None,
) -> Optional[AMGStructure]:
    """Static hierarchy from an ELLPattern (host, once per mesh).

    ``smoothed=True`` (default) builds the smoothed-aggregation transfer
    maps (GAMG-class convergence); ``smoothed=False`` keeps the cheaper
    piecewise-constant hierarchy.  ``near_kernel`` is an (N, m) static
    basis of the operator's near-null space fitted by the tentative
    prolongation (smoothed hierarchies only); default: the m=bs
    per-component constants.  For elasticity pass the rigid-body modes —
    exactly PETSc GAMG's ``MatSetNearNullSpace`` contract (the reference
    relies on GAMG's default translations; we do strictly better by
    deriving the modes from the dof coordinates, see
    ``models/common.py::MacroSystem.amg``).  The kernel is carried level
    to level by per-aggregate QR, so every level fits it exactly.

    Returns None when the system is already at/below the bottom size or
    the graph will not coarsen (degenerate patterns).
    """
    from hommx_tpu.ops.multigrid import _default_bottom_max

    if bottom_max is None:
        bottom_max = max(_default_bottom_max(), _BOTTOM_MAX)
    rng = np.random.default_rng(11)

    N = pattern.num_dofs
    K = pattern.row_width
    cols = np.asarray(pattern.cols, dtype=np.int64)
    real = np.zeros(N * K, dtype=bool)
    real[np.asarray(pattern.slots).reshape(-1)] = True
    diag_slots = np.asarray(pattern.diag_slots, dtype=np.int64)
    if N <= bottom_max:
        return None

    if smoothed:
        if near_kernel is None:
            B = np.zeros((N, bs))
            B[np.arange(N), np.arange(N) % bs] = 1.0
        else:
            B = np.asarray(near_kernel, dtype=np.float64)
            assert B.shape[0] == N, "near_kernel rows must match dofs"
    m = B.shape[1] if smoothed else bs
    bs_l = bs  # node block size of the CURRENT level (m below the top)

    levels = []
    while N > bottom_max:
        n_nodes = N // bs_l
        slot_rows = np.repeat(np.arange(N, dtype=np.int64), K)
        r_idx = np.nonzero(real)[0]
        rows_d = slot_rows[r_idx]
        cols_d = cols.reshape(-1)[r_idx]
        # node graph (block rows); component-diagonal blocks suffice for
        # adjacency since vertex coupling is full per node pair
        rows_n = rows_d // bs_l
        cols_n = cols_d // bs_l
        agg, na = _greedy_aggregate(rows_n, cols_n, n_nodes)
        if na * m * _MIN_COARSEN > N:
            break  # graph refuses to coarsen — stop here
        Nc = na * m
        if smoothed:
            w0, Bc = _aggregate_qr(B, agg, bs_l, na, m)
            agg0 = agg[np.arange(N, dtype=np.int64) // bs_l] * m
            (
                p_cols, p_rows, p0_slot, a_to_p, ps_w, ap_contrib, n_ap,
                c_contrib, cols_c, Kc, diag_c, real_c,
            ) = _sa_maps(rows_d, cols_d, r_idx, agg0, w0, N, K, Nc, m)
            levels.append(
                _ALevel(
                    N, cols.astype(np.int32), diag_slots, slot_rows, real,
                    None, None, rng.standard_normal(N),
                    p_cols=p_cols, p_rows=p_rows, p0_slot=p0_slot,
                    p0_w=w0, a_to_p=a_to_p, ps_w=ps_w,
                    ap_contrib=ap_contrib, n_ap=n_ap, c_contrib=c_contrib,
                )
            )
            B = Bc
        else:
            # coarse dof of each fine dof: same component in the aggregate
            comp = np.arange(N, dtype=np.int64) % bs_l
            agg_dof = agg[np.arange(N, dtype=np.int64) // bs_l] * bs_l + comp
            crows = agg_dof[rows_d]
            ccols = agg_dof[cols_d]
            cols_c, Kc, (ukeys, uslot), diag_c = _ell_from_coo(
                crows, ccols, Nc
            )
            # flat fine slot → flat coarse slot; padding slots go to a
            # trash entry one past the end (dropped after the scatter)
            keys = crows * Nc + ccols
            slot_map = np.full(N * K, Nc * Kc, dtype=np.int64)
            slot_map[r_idx] = uslot[np.searchsorted(ukeys, keys)]
            levels.append(
                _ALevel(
                    N, cols.astype(np.int32), diag_slots, slot_rows, real,
                    agg_dof, slot_map, rng.standard_normal(N),
                )
            )
            # next level's structural mask: every coarse slot some real
            # fine slot maps to
            real_c = np.zeros(Nc * Kc, dtype=bool)
            real_c[uslot] = True
        N, K, cols, real, diag_slots = (
            Nc, Kc, cols_c.astype(np.int64), real_c, diag_c,
        )
        bs_l = m
    if not levels:
        return None
    levels.append(
        _ALevel(
            N, cols.astype(np.int32), diag_slots,
            np.repeat(np.arange(N, dtype=np.int64), K), real,
        )
    )
    return AMGStructure(bs, tuple(levels), smoothed=smoothed)


def _dense_inverse(dense, f32_guard: bool = False):
    """Symmetrized dense inverse — Newton–Schulz on TPU (pure matmuls;
    triangular solves are latency-bound there), Cholesky elsewhere.  Same
    trade as the geometric bottom level (ops/multigrid.py).  With
    ``f32_guard`` an f32 bottom matrix is equilibrated and shifted by
    4e-6·Gershgorin before inversion — the f64-Krylov cast path's defense
    against κ·eps_f32 breakdown (see multigrid.mg_setup)."""
    dense = 0.5 * (dense + dense.T)
    n = dense.shape[0]
    sc = None
    if f32_guard and dense.dtype == jnp.float32:
        dg = jnp.einsum("ii->i", dense)
        sc = jnp.where(dg > 0, jax.lax.rsqrt(jnp.maximum(dg, 1e-30)), 1.0)
        dense = sc[:, None] * dense * sc[None, :]
        gersh = jnp.max(jnp.sum(jnp.abs(dense), axis=1))
        dense = dense + (4e-6 * gersh) * jnp.eye(n, dtype=dense.dtype)
        inv = _dense_inverse(dense)
        return sc[:, None] * inv * sc[None, :]
    if jax.default_backend() in ("tpu", "axon"):
        eye = jnp.eye(n, dtype=dense.dtype)
        l1 = jnp.max(jnp.sum(jnp.abs(dense), axis=0))
        linf = jnp.max(jnp.sum(jnp.abs(dense), axis=1))
        X0 = dense / (l1 * linf)
        binv = jax.lax.fori_loop(
            0, 50, lambda i, X: X @ (2.0 * eye - dense @ X), X0
        )
        return 0.5 * (binv + binv.T)
    cho = jax.scipy.linalg.cho_factor(dense)
    return jax.scipy.linalg.cho_solve(cho, jnp.eye(n, dtype=dense.dtype))


def amg_setup(struct: AMGStructure, vals, f32_bottom_guard: bool = False):
    """Traced per-operator setup: Galerkin values per level, smoother data,
    bottom inverse.  On smoothed hierarchies each level additionally forms
    the traced P values (one scatter over the static pattern) and runs the
    triple product as two contributor-table scatter-adds.

    Args:
        vals: (N·K,) BC-applied ELL values of the fine operator.
        f32_bottom_guard: harden the f32 bottom inverse for the f64-Krylov
            cast path (see multigrid.mg_setup).
    """
    from hommx_tpu.ops.multigrid import _smoother  # noqa: F401 (doc anchor)
    from hommx_tpu.ops.sparse import ell_to_dense, spmv

    state = []
    v = vals.reshape(-1)
    for li, lev in enumerate(struct.levels):
        N = lev.n_dofs
        cols_j = jnp.asarray(lev.cols)
        diag = v[jnp.asarray(lev.diag_slots)]
        rowsum = jnp.zeros(N, dtype=v.dtype).at[jnp.asarray(lev.slot_rows)].add(
            jnp.abs(v)
        )
        offdiag = rowsum - jnp.abs(diag)
        zmask = (offdiag > 0).astype(v.dtype)
        if li == struct.num_levels - 1:
            dense = ell_to_dense(v, cols_j)
            state.append(
                {
                    "zmask": zmask,
                    "binv": _dense_inverse(dense, f32_guard=f32_bottom_guard),
                }
            )
            break
        dinv = jnp.where(jnp.abs(diag) > 0, 1.0 / diag, 1.0)
        papply = lambda r, dinv=dinv: dinv * r
        matvec = lambda x, v=v, cols_j=cols_j: spmv(v, cols_j, x)
        gersh = jnp.max(dinv * rowsum)
        w = jnp.asarray(lev.power_vec, dtype=v.dtype)
        w = w / jnp.linalg.norm(w)

        def body(_, w, matvec=matvec, papply=papply):
            u = papply(matvec(w))
            return u / (jnp.linalg.norm(u) + 1e-30)

        w = jax.lax.fori_loop(0, 16, body, w)
        Aw = matvec(w)
        lam = jnp.vdot(Aw, papply(Aw)) / (jnp.vdot(w, Aw) + 1e-30)
        lmax = jnp.minimum(gersh, 1.3 * lam)
        entry = {
            "vals": v, "cols": cols_j, "zmask": zmask,
            "papply": papply, "lmax": lmax,
        }
        nxt = struct.levels[li + 1]
        if struct.smoothed:
            # traced P values over the static pattern:
            #   P = (I − ω D⁻¹A) P₀,  ω = 4/(3 λmax(D⁻¹A)),
            # with P₀'s static kernel weights (p0_w) and the smoothing
            # spread weights (ps_w = w0[j] per A slot); BC rows zeroed
            # (zmask); BC columns of A are already zero after symmetric
            # Dirichlet elimination.
            omega = (4.0 / 3.0) / lmax
            m = lev.p0_slot.shape[1]
            NP = N * lev.p_cols.shape[1]
            dinvr = dinv[jnp.asarray(lev.slot_rows)]
            zr = zmask[jnp.asarray(lev.slot_rows)]
            Pv = jnp.zeros(NP + 1, dtype=v.dtype)
            Pv = Pv.at[jnp.asarray(lev.p0_slot.reshape(-1))].add(
                jnp.asarray(lev.p0_w.reshape(-1), dtype=v.dtype)
                * jnp.repeat(zmask, m)
            )
            sm = -omega * dinvr * v * zr  # (N·K,) traced smoothing factor
            Pv = Pv.at[jnp.asarray(lev.a_to_p.reshape(-1))].add(
                jnp.asarray(lev.ps_w.reshape(-1), dtype=v.dtype)
                * jnp.repeat(sm, m)
            )
            Pv = Pv[:NP]
            ca, cp, cap = (jnp.asarray(a) for a in lev.ap_contrib)
            APv = jnp.zeros(lev.n_ap, dtype=v.dtype)
            APv = APv.at[cap].add(v[ca] * Pv[cp])
            qp, qap, qout = (jnp.asarray(a) for a in lev.c_contrib)
            vc = jnp.zeros(nxt.n_dofs * nxt.cols.shape[1], dtype=v.dtype)
            vc = vc.at[qout].add(Pv[qp] * APv[qap])
            entry["Pv"] = Pv
        else:
            # Galerkin restriction of the values: A_c[I,J] = Σ A[i,j] over
            # the aggregate pair, BC rows/cols masked out (their coupling
            # must not leak into the coarse operator)
            zr = zmask[jnp.asarray(lev.slot_rows)]
            zc = zmask[jnp.asarray(lev.cols).reshape(-1)]
            vc = jnp.zeros(
                nxt.n_dofs * nxt.cols.shape[1] + 1, dtype=v.dtype
            )
            vc = vc.at[jnp.asarray(lev.slot_map)].add(v * zr * zc)
            vc = vc[:-1]
        state.append(entry)
        # identity diagonal where an aggregate carried no interior mass
        dc = vc[jnp.asarray(nxt.diag_slots)]
        fix = (jnp.abs(dc) == 0).astype(v.dtype)
        vc = vc.at[jnp.asarray(nxt.diag_slots)].add(fix)
        v = vc
    return state


def amg_vcycle(struct: AMGStructure, state, r):
    """One V(ν,ν) aggregation-AMG cycle — SPD (variational hierarchy,
    symmetric Chebyshev smoothing); composes with CG."""
    return _acycle(struct, state, r, 0)


def _acycle(struct, state, b, li):
    from hommx_tpu.ops.multigrid import _cheby, _cheby_from
    from hommx_tpu.ops.sparse import spmv

    st = state[li]
    if li == struct.num_levels - 1:
        return st["binv"] @ b
    lev = struct.levels[li]
    matvec = lambda x: spmv(st["vals"], st["cols"], x)
    x = _cheby(matvec, st["papply"], b, st["lmax"], _CHEB_DEGREE)
    r = b - matvec(x)
    nxt = struct.levels[li + 1]
    if struct.smoothed:
        # rc = Pᵀ r and e = P e_c over the static P pattern (P's BC rows
        # are zero by construction, so no extra masking is needed)
        Pv = st["Pv"]
        pcf = jnp.asarray(lev.p_cols.reshape(-1))
        prow = jnp.asarray(lev.p_rows)
        rc = jnp.zeros(nxt.n_dofs, dtype=b.dtype).at[pcf].add(Pv * r[prow])
        ec = _acycle(struct, state, rc, li + 1)
        KP = lev.p_cols.shape[1]
        x = x + jnp.sum(
            (Pv * ec[pcf]).reshape(lev.n_dofs, KP), axis=1
        )
    else:
        agg = jnp.asarray(lev.agg_dof)
        rc = jnp.zeros(nxt.n_dofs, dtype=b.dtype).at[agg].add(
            r * st["zmask"]
        )
        rc = rc * state[li + 1]["zmask"]
        ec = _acycle(struct, state, rc, li + 1)
        x = x + _OVERCORRECT * (ec * state[li + 1]["zmask"])[agg] * st["zmask"]
    return _cheby_from(matvec, st["papply"], b, x, st["lmax"], _CHEB_DEGREE)
