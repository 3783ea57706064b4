"""Aggregation-based algebraic multigrid for UNSTRUCTURED macro systems.

Companion to the geometric hierarchy (ops/multigrid.py), covering the mesh
classes it declines: Delaunay / file meshes (``helpers.py:125-209`` of the
reference are part of its supported surface) and P2 dof layouts.  Together
they replace PETSc GAMG, which accepts any mesh
(``test_integration_poisson.py:207-212``, ``rotated_fibers.py:98``).

TPU-first constraints shape the design:

  * **Static everything.**  Aggregation (greedy, on the ELL adjacency
    graph) runs on host once per mesh; every level's ELL sparsity pattern
    and the fine-slot → coarse-slot scatter map are precomputed index
    arrays.  The traced per-operator setup (``amg_setup``) is then one
    masked scatter-add per level — Galerkin A_c = Pᵀ A P is EXACT for
    piecewise-constant P because (PᵀAP)[I,J] = Σ_{i∈I, j∈J} A[i,j] is a
    plain segment reduction of the fine values.
  * **Piecewise-constant P, strength in the smoother.**  Smoothed
    aggregation would make P operator-dependent (dynamic sparsity in the
    triple product — untraceable with static shapes); instead the transfer
    stays a gather/segment-sum and robustness comes from Chebyshev
    smoothing (reused from ops/multigrid.py) and small aggregates
    (seed + unaggregated neighbours, ~4-8 nodes), giving a deeper but
    cheap hierarchy.
  * **Dense bottom inverse** below ``bottom_max`` dofs, exactly like the
    geometric hierarchy (Newton–Schulz on TPU, Cholesky elsewhere).

Dirichlet handling mirrors mg_setup: BC rows are identity rows after
``apply_dirichlet`` (zero off-diagonal mass), detected per level by the
zmask trick and masked out of restriction/prolongation; aggregates of only
BC dofs become identity rows on the coarse level, recursively.

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
#: piecewise-constant transfers shift more of the work onto the smoother
#: (measured 35 → 31 PCG iterations on the 72²-point Delaunay system)
_CHEB_DEGREE = 3
#: coarse-correction over-relaxation: plain (unsmoothed) aggregation
#: systematically UNDERestimates corrections — the piecewise-constant
#: coarse space is too stiff — and scaling the correction by ω ∈ (0, 2)
#: keeps the cycle symmetric (the correction term is P(ωA_c⁻¹)Pᵀ, still
#:  SPD) while fixing the bias; the standard plain-aggregation remedy.
#: Measured on the 72²-point Delaunay system: ω 1.0 → 31 its, 1.8 → 21.
_OVERCORRECT = 1.8


@dataclasses.dataclass(frozen=True)
class _ALevel:
    """One level: its ELL pattern + the transfer data down to the next.

    ``cols``/``diag_slots`` describe THIS level's operator layout; the
    transfer members are None on the bottom level.
    """

    n_dofs: int
    cols: np.ndarray  # (N, K) ELL column indices
    diag_slots: np.ndarray  # (N,)
    slot_rows: np.ndarray  # (N*K,) row of each flat slot
    real_slots: np.ndarray  # (N*K,) bool — structurally present entries
    agg_dof: Optional[np.ndarray] = None  # (N,) fine dof → coarse dof
    slot_map: Optional[np.ndarray] = None  # (N*K,) flat slot → coarse slot
    power_vec: Optional[np.ndarray] = None  # λmax power-iteration start


@dataclasses.dataclass(frozen=True)
class AMGStructure:
    bs: int
    levels: tuple  # of _ALevel

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
    from hommx_tpu import native

    res = native.greedy_aggregate_native(rows_s, cols_s, n_nodes)
    if res is not None:
        return res
    starts = np.searchsorted(rows_s, np.arange(n_nodes + 1))
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
    return agg, na


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


def build_amg_structure(
    pattern, bs: int, bottom_max: Optional[int] = None
) -> Optional[AMGStructure]:
    """Static hierarchy from an ELLPattern (host, once per mesh).

    Returns None when the system is already at/below the bottom size or the
    graph will not coarsen (degenerate patterns).
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

    levels = []
    while N > bottom_max:
        n_nodes = N // bs
        slot_rows = np.repeat(np.arange(N, dtype=np.int64), K)
        r_idx = np.nonzero(real)[0]
        rows_d = slot_rows[r_idx]
        cols_d = cols.reshape(-1)[r_idx]
        # node graph (block rows); component-diagonal blocks suffice for
        # adjacency since vertex coupling is full per node pair
        rows_n = rows_d // bs
        cols_n = cols_d // bs
        agg, na = _greedy_aggregate(rows_n, cols_n, n_nodes)
        if na * bs * _MIN_COARSEN > N:
            break  # graph refuses to coarsen — stop here
        # coarse dof of each fine dof: same component within the aggregate
        comp = np.arange(N, dtype=np.int64) % bs
        agg_dof = agg[np.arange(N, dtype=np.int64) // bs] * bs + comp
        Nc = na * bs
        crows = agg_dof[rows_d]
        ccols = agg_dof[cols_d]
        cols_c, Kc, (ukeys, uslot), diag_c = _ell_from_coo(crows, ccols, Nc)
        # flat fine slot → flat coarse slot; padding slots go to a trash
        # entry one past the end (dropped after the scatter)
        keys = crows * Nc + ccols
        slot_map = np.full(N * K, Nc * Kc, dtype=np.int64)
        slot_map[r_idx] = uslot[np.searchsorted(ukeys, keys)]
        levels.append(
            _ALevel(
                N, cols.astype(np.int32), diag_slots, slot_rows, real,
                agg_dof, slot_map, rng.standard_normal(N),
            )
        )
        # next level's structural mask: every coarse slot some real fine
        # slot maps to
        real_c = np.zeros(Nc * Kc, dtype=bool)
        real_c[uslot] = True
        N, K, cols, real, diag_slots = Nc, Kc, cols_c.astype(np.int64), real_c, diag_c
    if not levels:
        return None
    levels.append(
        _ALevel(
            N, cols.astype(np.int32), diag_slots,
            np.repeat(np.arange(N, dtype=np.int64), K), real,
        )
    )
    return AMGStructure(bs, tuple(levels))


def _dense_inverse(dense):
    """Symmetrized dense inverse — Newton–Schulz on TPU (pure matmuls;
    triangular solves are latency-bound there), Cholesky elsewhere.  Same
    trade as the geometric bottom level (ops/multigrid.py)."""
    dense = 0.5 * (dense + dense.T)
    n = dense.shape[0]
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


def amg_setup(struct: AMGStructure, vals):
    """Traced per-operator setup: Galerkin values per level (one masked
    scatter-add each), Jacobi/Chebyshev smoother data, bottom inverse.

    Args:
        vals: (N·K,) BC-applied ELL values of the fine operator.
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
            state.append({"zmask": zmask, "binv": _dense_inverse(dense)})
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
        state.append(
            {
                "vals": v, "cols": cols_j, "zmask": zmask,
                "papply": papply, "lmax": lmax,
            }
        )
        # Galerkin restriction of the values: A_c[I,J] = Σ A[i,j] over the
        # aggregate pair, BC rows/cols masked out (their coupling must not
        # leak into the coarse operator)
        nxt = struct.levels[li + 1]
        zr = zmask[jnp.asarray(lev.slot_rows)]
        zc = zmask[jnp.asarray(lev.cols).reshape(-1)]
        vc = jnp.zeros(nxt.n_dofs * nxt.cols.shape[1] + 1, dtype=v.dtype)
        vc = vc.at[jnp.asarray(lev.slot_map)].add(v * zr * zc)
        vc = vc[:-1]
        # identity diagonal where an aggregate carried no interior mass
        dc = vc[jnp.asarray(nxt.diag_slots)]
        fix = (jnp.abs(dc) == 0).astype(v.dtype)
        vc = vc.at[jnp.asarray(nxt.diag_slots)].add(fix)
        v = vc
    return state


def amg_vcycle(struct: AMGStructure, state, r):
    """One V(ν,ν) aggregation-AMG cycle — SPD (variational piecewise-
    constant hierarchy, symmetric Chebyshev smoothing); composes with CG."""
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
    agg = jnp.asarray(lev.agg_dof)
    rc = jnp.zeros(nxt.n_dofs, dtype=b.dtype).at[agg].add(r * st["zmask"])
    rc = rc * state[li + 1]["zmask"]
    ec = _acycle(struct, state, rc, li + 1)
    x = x + _OVERCORRECT * (ec * state[li + 1]["zmask"])[agg] * st["zmask"]
    return _cheby_from(matvec, st["papply"], b, x, st["lmax"], _CHEB_DEGREE)
