"""Geometric multigrid preconditioner for structured macro systems.

Replaces the AMG-class preconditioning the reference gets from PETSc GAMG
(``examples/linear_elasticity/rotated_fibers.py:98``) and MUMPS LU
(``test_integration_poisson.py:207-212``) on macro systems beyond the dense
direct cap.  The design is TPU-first throughout:

  * **Grid hierarchy, not graph coarsening.**  hommx macro meshes come from
    ``create_rectangle``/``create_box`` and carry a ``BoxStructure``; vertex
    dofs form a lexicographic grid, so full coarsening (halve every axis) is
    index arithmetic with *static* shapes — no setup graphs, no dynamic
    sparsity, nothing XLA can't trace.
  * **Transfer operators as interleave/slice programs.**  Prolongation is the
    exact P1 finite-element interpolation on the structured triangulation
    (fine vertex = midpoint of a coarse mesh edge for every off-lattice
    class, including the diagonal classes of the 2D split and the 3D Kuhn
    chains), written as stacked slices + reshapes — zero gathers/scatters.
    Restriction is its exact adjoint (padding + adds), so the hierarchy is
    variational and the V-cycle is SPD.
  * **Galerkin coarse operators by lattice probing.**  Coarse stencils stay
    inside {-1,0,1}^d (linear interpolation of a nearest-neighbour block
    stencil), and offsets are injective mod 3, so A_c = PᵀAP is recovered
    *exactly* from 3^d·bs probing vectors — a single batched DIA SpMV per
    level (``dia_spmv_cols``) instead of a sparse triple product.  The whole
    setup is traced: it lives inside the jitted macro solve and is
    differentiable like everything else.
  * **Chebyshev smoothing** (dot-product-free, so no extra reductions in the
    inner loop) with a traced power-iteration λmax estimate, and a dense
    Cholesky bottom solve.

The V-cycle with equal pre/post Chebyshev smoothing is a symmetric positive
definite preconditioner, composed with CG in ``ops/solvers.py`` — the
TPU-native analogue of the reference's ``{"ksp_type": "cg", "pc_type":
"gamg"}`` configuration.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MGStructure", "build_mg_structure", "mg_setup", "mg_vcycle"]

#: coarsest-level size cap for the dense Cholesky bottom solve
_BOTTOM_MAX = 1500
#: Chebyshev smoothing degree (matvecs per pre/post smoothing application)
_CHEB_DEGREE = 2


# ---------------------------------------------------------------------------
# transfer operators: P1 interpolation / adjoint on vertex grids
# ---------------------------------------------------------------------------


def _interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Merge a (n+1 entries) and b (n entries) along ``axis`` into 2n+1
    entries: out[2i] = a[i], out[2i+1] = b[i].  Pure stack + reshape."""
    n = b.shape[axis]
    a_head = jax.lax.slice_in_dim(a, 0, n, axis=axis)
    pairs = jnp.stack([a_head, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] = 2 * n
    merged = pairs.reshape(shape)
    a_last = jax.lax.slice_in_dim(a, n, n + 1, axis=axis)
    return jnp.concatenate([merged, a_last], axis=axis)


def _avg(x: jnp.ndarray, axes) -> jnp.ndarray:
    """0.5·(x at lower corner + x shifted +1 along every axis in ``axes``) —
    the midpoint value of the coarse mesh edge along the (increasing)
    direction spanned by ``axes``."""
    lo, hi = x, x
    for ax in axes:
        n = x.shape[ax]
        lo = jax.lax.slice_in_dim(lo, 0, n - 1, axis=ax)
        hi = jax.lax.slice_in_dim(hi, 1, n, axis=ax)
    return 0.5 * (lo + hi)


def _avg_adj(b: jnp.ndarray, axes) -> jnp.ndarray:
    """Adjoint of _avg: scatter 0.5·b to both edge endpoints (as pads)."""
    pad_lo = [(0, 0)] * b.ndim
    pad_hi = [(0, 0)] * b.ndim
    for ax in axes:
        pad_lo[ax] = (0, 1)
        pad_hi[ax] = (1, 0)
    return 0.5 * (jnp.pad(b, pad_lo) + jnp.pad(b, pad_hi))


def _prolong_grid(xc: jnp.ndarray, d: int, diagonal: str, caxes) -> jnp.ndarray:
    """P1 interpolation coarse grid → fine grid, coarsened along ``caxes``
    only (semicoarsening for anisotropic meshes; full coarsening = all axes).
    Leading ``d`` grid axes; trailing axes — components, probe batch — ride
    along unchanged.

    Every monotone grid offset q ∈ {0,1}^d is a mesh edge (2D split
    triangles, 3D Kuhn chains), so the fine vertex 2I+q is the midpoint of
    coarse edge (I, I+q) and midpoint averaging IS the exact P1
    interpolation.  2D with diagonal='left' has the one exception: the box
    diagonal runs (i+1,j)-(i,j+1)."""
    caxes = tuple(caxes)
    blocks = {}
    for q in itertools.product((0, 1), repeat=len(caxes)):
        axes = [caxes[i] for i in range(len(caxes)) if q[i]]
        if d == 2 and diagonal == "left" and len(axes) == 2:
            blocks[q] = 0.5 * (xc[1:, :-1] + xc[:-1, 1:])
        else:
            blocks[q] = xc if not axes else _avg(xc, axes)
    for i in reversed(range(len(caxes))):
        merged = {}
        for q in itertools.product((0, 1), repeat=i):
            merged[q] = _interleave(
                blocks[q + (0,)], blocks[q + (1,)], axis=caxes[i]
            )
        blocks = merged
    return blocks[()]


def _restrict_grid(yf: jnp.ndarray, d: int, diagonal: str, caxes) -> jnp.ndarray:
    """Exact adjoint of _prolong_grid (variational restriction)."""
    caxes = tuple(caxes)
    out = None
    for q in itertools.product((0, 1), repeat=len(caxes)):
        slicer = [slice(None)] * yf.ndim
        for i, ax in enumerate(caxes):
            slicer[ax] = slice(q[i], None, 2)
        blk = yf[tuple(slicer)]
        axes = [caxes[i] for i in range(len(caxes)) if q[i]]
        if d == 2 and diagonal == "left" and len(axes) == 2:
            pad_a = [(1, 0), (0, 1)] + [(0, 0)] * (blk.ndim - 2)
            pad_b = [(0, 1), (1, 0)] + [(0, 0)] * (blk.ndim - 2)
            term = 0.5 * (jnp.pad(blk, pad_a) + jnp.pad(blk, pad_b))
        else:
            term = blk if not axes else _avg_adj(blk, axes)
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# static structure (host, once per mesh)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _Level:
    """Static data of one level of the hierarchy.

    Level 0 is the fine system (operator supplied by the caller in DIA
    form); levels ≥ 1 get their operator from Galerkin probing.
    """

    intervals: tuple  # grid intervals per axis (nx, ny[, nz])
    grid: tuple  # vertex counts per axis
    offsets: tuple  # flat dof offsets of the stencil (levels ≥ 1)
    node_offsets: tuple  # grid node offsets, aligned with ``offsets`` groups
    res_masks: Optional[np.ndarray]  # (3^d, n_nodes) residue-class masks
    perms: Optional[np.ndarray]  # (n_node_offsets, 3^d) probe permutations
    power_vec: Optional[np.ndarray] = None  # fixed λmax power-iteration start
    coarsen_axes: tuple = ()  # axes halved relative to the parent level


@dataclasses.dataclass(frozen=True)
class MGStructure:
    """Static multigrid hierarchy for a structured box macro mesh."""

    d: int
    bs: int
    diagonal: str
    levels: tuple  # of _Level
    fine_offsets: tuple  # DIA offsets of the fine operator

    @property
    def num_levels(self) -> int:
        return len(self.levels)


def _node_residues(grid) -> np.ndarray:
    """Ravel of the per-axis mod-3 residue class of every grid node."""
    idx = np.indices(grid)  # (d, *grid)
    r = np.zeros(grid, dtype=np.int64)
    for ax in range(len(grid)):
        r = r * 3 + idx[ax] % 3
    return r.reshape(-1)


def build_mg_structure(
    structure, bs: int, dia, bottom_max: int = _BOTTOM_MAX
) -> Optional[MGStructure]:
    """Build the static hierarchy, or None when multigrid does not apply
    (unstructured mesh, no DIA view, or no even-refinement level available).

    Args:
        structure: the mesh's BoxStructure (grid intervals + diagonal).
        bs: dof block size (1 scalar, d elasticity).
        dia: the fine operator's DIAPattern (offsets reused for level 0).
    """
    if structure is None or dia is None:
        return None
    intervals = tuple(int(n) for n in structure.shape)
    d = len(intervals)
    if d not in (2, 3):
        return None
    grid = tuple(n + 1 for n in intervals)
    if int(np.prod(grid)) * bs != dia.num_dofs:
        return None  # dof layout is not the plain vertex grid
    diagonal = getattr(structure, "diagonal", "right")

    rng = np.random.default_rng(7)
    levels = [
        _Level(
            intervals, grid, tuple(dia.offsets), (), None, None,
            rng.standard_normal(int(np.prod(grid)) * bs),
        )
    ]
    node_offsets = tuple(itertools.product((-1, 0, 1), repeat=d))
    extents = np.asarray(structure.hi, dtype=np.float64) - np.asarray(
        structure.lo, dtype=np.float64
    )
    cur = intervals
    while True:
        # semicoarsening for anisotropic meshes: coarsen the strongly
        # coupled (small-h) axes only — coarsening a weakly coupled axis
        # leaves error modes the point/block smoother cannot damp (classic
        # robustness rule; the thin-beam meshes of the elasticity examples
        # have 3-4× element anisotropy).  An axis is coarsenable while its
        # interval count is even and ≥ 4; among coarsenable axes, those
        # within 2× of the smallest h are halved — h doubles there, so the
        # hierarchy equalizes h before coarsening the rest.
        h = extents / np.asarray(cur, dtype=np.float64)
        cand = [ax for ax in range(d) if cur[ax] % 2 == 0 and cur[ax] >= 4]
        if not cand:
            break
        h_min = min(h[ax] for ax in cand)
        caxes = tuple(ax for ax in cand if h[ax] < 2.0 * h_min * 0.999)
        cur = tuple(n // 2 if ax in caxes else n for ax, n in enumerate(cur))
        cgrid = tuple(n + 1 for n in cur)
        n_nodes = int(np.prod(cgrid))
        # flat dof offset of node offset δ, component shift dc:
        # (Σ_ax δ_ax · stride_ax) · bs + dc  (row-major vertex-grid strides)
        offs = []
        strides = [1] * d
        for ax in range(d - 2, -1, -1):
            strides[ax] = strides[ax + 1] * cgrid[ax + 1]
        for dlt in node_offsets:
            flat = sum(dlt[ax] * strides[ax] for ax in range(d))
            for dc in range(-(bs - 1), bs):
                offs.append(flat * bs + dc)
        res = _node_residues(cgrid)  # (n_nodes,)
        nm = 3**d
        masks = np.zeros((nm, n_nodes), dtype=np.float64)
        masks[res, np.arange(n_nodes)] = 1.0
        # perms[iδ, m] = residue index of (m − δ) mod 3 (per axis):
        # extraction reads probe m through mask class (m − δ) mod 3
        m_digits = np.array(
            list(itertools.product((0, 1, 2), repeat=d)), dtype=np.int64
        )  # (nm, d) aligned with the residue encoding above
        perms = np.zeros((len(node_offsets), nm), dtype=np.int64)
        for i, dlt in enumerate(node_offsets):
            shifted = (m_digits - np.asarray(dlt)) % 3
            code = np.zeros(nm, dtype=np.int64)
            for ax in range(d):
                code = code * 3 + shifted[:, ax]
            perms[i] = code
        levels.append(
            _Level(
                cur, cgrid, tuple(offs), node_offsets, masks, perms,
                rng.standard_normal(n_nodes * bs), caxes,
            )
        )
        if n_nodes * bs <= bottom_max:
            break
    if len(levels) < 2:
        return None
    return MGStructure(d, bs, diagonal, tuple(levels), tuple(dia.offsets))


# ---------------------------------------------------------------------------
# traced setup (per assembled operator) + V-cycle application
# ---------------------------------------------------------------------------


def _spmv_cols(vals, offsets, X):
    from hommx_tpu.ops.dia import dia_spmv_cols

    return dia_spmv_cols(vals, offsets, X)


def _to_grid(x, grid, bs):
    """(N, ...) flat dof vector(s) → (*grid, bs, ...) grid layout."""
    return x.reshape(grid + (bs,) + x.shape[1:])


def _to_flat(xg, n, d):
    return xg.reshape((n,) + xg.shape[d + 1 :])


def _diag_of(vals, offsets):
    """Diagonal of a DIA operator (the offset-0 row of vals)."""
    i0 = offsets.index(0)
    return vals[i0]


def _cheby(matvec, papply, b, lmax, degree=_CHEB_DEGREE):
    """Chebyshev smoothing iteration for A x = b from x = 0, targeting the
    eigenvalue interval [0.1·λ, 1.1·λ] of M⁻¹A (the GAMG recipe; M = point
    or block Jacobi, applied by ``papply``).  Dot-free: only matvecs and
    axpys, the right shape for the TPU vector unit."""
    lo, hi = 0.1 * lmax, 1.1 * lmax
    theta, delta = 0.5 * (hi + lo), 0.5 * (hi - lo)
    sigma = theta / delta
    rho = 1.0 / sigma
    # x0 = 0 ⇒ r0 = b
    z = papply(b)
    dvec = z / theta
    x = dvec
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        z = papply(b - matvec(x))
        dvec = rho_new * rho * dvec + (2.0 * rho_new / delta) * z
        x = x + dvec
        rho = rho_new
    return x


def _cheby_from(matvec, papply, b, x, lmax, degree=_CHEB_DEGREE):
    """Chebyshev smoothing continuing from iterate x (post-smoothing):
    smooth the error equation A e = b − A x and add the correction, which
    keeps the polynomial identical to _cheby (symmetric V-cycle)."""
    r = b - matvec(x)
    return x + _cheby(matvec, papply, r, lmax, degree)


def _block_jacobi(vals, offsets, n_nodes, bs):
    """Per-node bs×bs diagonal blocks of a flat-DIA block operator.

    Entry (row=(n,ci), col=(n,cj)) lives at flat offset cj−ci; rows of that
    offset whose ci would push cj out of [0,bs) belong to a *different node's*
    block (o = δ·bs + dc is ambiguous without ci) and are skipped."""
    B = jnp.zeros((n_nodes, bs, bs), dtype=vals.dtype)
    for dc in range(-(bs - 1), bs):
        if dc not in offsets:
            continue
        col = vals[offsets.index(dc)].reshape(n_nodes, bs)
        for ci in range(bs):
            cj = ci + dc
            if 0 <= cj < bs:
                B = B.at[:, ci, cj].set(col[:, ci])
    return 0.5 * (B + jnp.swapaxes(B, -1, -2))


def _smoother(vals, offsets, n_dofs, bs, v0):
    """Build the smoothing preconditioner (point/block Jacobi) and the
    Chebyshev λmax(M⁻¹A) estimate.

    λmax: a power iteration (16 traced matvecs — noise next to one solve)
    converges from below; 10% headroom on top, capped by the rigorous
    Gershgorin-type bound λmax(M⁻¹A) ≤ λmax(M⁻¹D)·λmax(D⁻¹A) (absolute DIA
    row sums are exact row sums of |A|).  Chebyshev tolerates an
    overestimate (slightly weaker smoothing) but diverges on an
    underestimate, so the cap keeps pathological cases safe.

    Returns (papply, lmax).
    """
    i0 = offsets.index(0)
    diag = vals[i0]
    dinv = jnp.where(jnp.abs(diag) > 0, 1.0 / diag, 1.0)
    gersh = jnp.max(dinv * jnp.sum(jnp.abs(vals), axis=0))
    if bs == 1:
        papply = lambda r: dinv * r
        cap = gersh
    else:
        n_nodes = n_dofs // bs
        B = _block_jacobi(vals, offsets, n_nodes, bs)
        Binv = jnp.linalg.inv(B)
        papply = lambda r: jnp.einsum(
            "nij,nj...->ni...", Binv, r.reshape((n_nodes, bs) + r.shape[1:])
        ).reshape(r.shape)
        # λmax(B⁻¹D) ≤ max_n ‖Binv_n·D_n‖_F (Frobenius ≥ spectral norm)
        Dn = jax.vmap(jnp.diag)(diag.reshape(n_nodes, bs))
        BiD = jnp.einsum("nij,njk->nik", Binv, Dn)
        cap = gersh * jnp.max(
            jnp.sqrt(jnp.sum(BiD * BiD, axis=(1, 2)))
        )
    matvec = lambda v: _spmv_cols(vals, offsets, v[:, None])[:, 0]

    def body(_, v):
        w = papply(matvec(v))
        return w / (jnp.linalg.norm(w) + 1e-30)

    v = jax.lax.fori_loop(0, 16, body, v0 / (jnp.linalg.norm(v0) + 1e-30))
    Av = matvec(v)
    # ⟨Av, M⁻¹Av⟩/⟨v, Av⟩ — the Rayleigh quotient of A^½M⁻¹A^½ at A^½v,
    # hence a lower bound on λmax(M⁻¹A) that needs only M⁻¹ (papply)
    lam = jnp.vdot(Av, papply(Av)) / (jnp.vdot(v, Av) + 1e-30)
    return papply, jnp.minimum(cap, 1.1 * lam)


def _coarsen(struct: MGStructure, lev_idx: int, vals_f, offsets_f, zmask_f):
    """Galerkin coarse operator A_c = P̃ᵀ A_f P̃ (with P̃ = Z_f P Z_c the
    BC-masked interpolation) by mod-3 lattice probing — see module docstring.

    Returns (vals_c, zmask_c): DIA values on the coarse level's offsets and
    the coarse keep-mask (0 at Dirichlet dofs).
    """
    d, bs = struct.d, struct.bs
    lev_f, lev_c = struct.levels[lev_idx - 1], struct.levels[lev_idx]
    n_f = int(np.prod(lev_f.grid)) * bs
    n_c = int(np.prod(lev_c.grid)) * bs
    nm = 3**d
    dtype = vals_f.dtype
    masks = jnp.asarray(lev_c.res_masks, dtype=dtype)  # (nm, n_nodes_c)

    # coarse keep-mask by injection (coarse node I ↔ fine node at 2I on the
    # coarsened axes, I elsewhere)
    caxes = lev_c.coarsen_axes
    zg = _to_grid(zmask_f, lev_f.grid, bs)
    slicer = [slice(None)] * zg.ndim
    for ax in caxes:
        slicer[ax] = slice(None, None, 2)
    zmask_c = _to_flat(zg[tuple(slicer)], n_c, d)

    # probe block: X[node·bs + c, m·bs + cj] = mask_m[node] · δ_{c,cj}
    eye = jnp.eye(bs, dtype=dtype)
    X = jnp.einsum("mn,cj->ncmj", masks, eye).reshape(n_c, nm * bs)
    X = X * zmask_c[:, None]

    # Y = Z_c R Z_f A Z_f P Z_c X  — one batched fine SpMV
    Xg = _to_grid(X, lev_c.grid, bs)
    Pf = _to_flat(_prolong_grid(Xg, d, struct.diagonal, caxes), n_f, d)
    Pf = Pf * zmask_f[:, None]
    APf = _spmv_cols(vals_f, offsets_f, Pf) * zmask_f[:, None]
    Y = _to_flat(
        _restrict_grid(_to_grid(APf, lev_f.grid, bs), d, struct.diagonal, caxes),
        n_c,
        d,
    )
    Y = Y * zmask_c[:, None]
    # Yr[n, ci, m, cj]
    Yr = Y.reshape(-1, bs, nm, bs)

    node_offsets = lev_c.node_offsets
    vals_rows = []
    for i, _ in enumerate(node_offsets):
        Mi = masks[np.asarray(lev_c.perms[i])]  # (nm, n_nodes_c), static perm
        # Z[n, ci, cj] = Σ_m Yr[n, ci, m, cj] · Mi[m, n]
        Z = jnp.einsum("ncmj,mn->ncj", Yr, Mi)
        for dc in range(-(bs - 1), bs):
            cols = []
            for ci in range(bs):
                cj = ci + dc
                if 0 <= cj < bs:
                    cols.append(Z[:, ci, cj])
                else:
                    cols.append(jnp.zeros(Z.shape[0], dtype=dtype))
            vals_rows.append(jnp.stack(cols, axis=1).reshape(-1))
    vals_c = jnp.stack(vals_rows, axis=0)  # (n_offsets, n_c)

    # identity diagonal at coarse Dirichlet dofs (probing left them zero)
    i0 = lev_c.offsets.index(0)
    vals_c = vals_c.at[i0].set(
        jnp.where(zmask_c > 0, vals_c[i0], jnp.ones_like(zmask_c))
    )
    return vals_c, zmask_c


def _dense_from_dia(vals, offsets, n):
    """Materialize a small DIA operator as dense (bottom level only) with a
    single static scatter.  Wrap-around slots hold exact zeros (no such grid
    edge), so clipping the out-of-range rows per offset is the only masking
    needed; the (static) flat index and value-gather arrays are host-built."""
    flat_idx, val_idx = [], []
    for i, off in enumerate(offsets):
        rows = np.arange(max(0, -off), min(n, n - off))
        if rows.size == 0:
            continue
        flat_idx.append(rows * n + rows + off)
        val_idx.append(i * n + rows)
    flat_idx = jnp.asarray(np.concatenate(flat_idx))
    val_idx = jnp.asarray(np.concatenate(val_idx))
    dense = jnp.zeros(n * n, dtype=vals.dtype)
    dense = dense.at[flat_idx].add(vals.reshape(-1)[val_idx])
    return dense.reshape(n, n)


def mg_setup(struct: MGStructure, fine_vals):
    """Per-operator traced setup: Galerkin hierarchy, smoother diagonals,
    λmax estimates, bottom factorization.

    Args:
        struct: static hierarchy from build_mg_structure.
        fine_vals: (n_offsets, N) DIA values of the BC-applied fine operator
            (``ell_vals_to_dia`` output).
    Returns a pytree consumed by :func:`mg_vcycle`.
    """
    d, bs = struct.d, struct.bs
    offsets0 = struct.fine_offsets
    # Dirichlet rows are eliminated to the identity by apply_dirichlet: a row
    # with zero off-diagonal mass is a BC row (no plumbing of the BC mask)
    i0 = offsets0.index(0)
    offdiag = sum(
        jnp.abs(fine_vals[i]) for i in range(len(offsets0)) if i != i0
    )
    zmask = (offdiag > 0).astype(fine_vals.dtype)

    state = []
    vals, offsets, zm = fine_vals, offsets0, zmask
    for li in range(struct.num_levels):
        lev = struct.levels[li]
        n = int(np.prod(lev.grid)) * bs
        if li == struct.num_levels - 1:
            dense = _dense_from_dia(vals, offsets, n)
            dense = 0.5 * (dense + dense.T)
            cho = jax.scipy.linalg.cho_factor(dense)
            state.append({"vals": vals, "zmask": zm, "cho": cho})
            break
        v0 = jnp.asarray(lev.power_vec, dtype=vals.dtype)
        papply, lmax = _smoother(vals, offsets, n, bs, v0)
        state.append({"vals": vals, "papply": papply, "lmax": lmax,
                      "zmask": zm})
        vals, zm = _coarsen(struct, li + 1, vals, offsets, zm)
        offsets = struct.levels[li + 1].offsets
    return state


def mg_vcycle(struct: MGStructure, state, r):
    """One V(ν,ν) cycle applied to the residual r — the preconditioner
    application M⁻¹r.  Symmetric positive definite (variational hierarchy +
    identical pre/post Chebyshev smoothing), so it composes with CG."""
    return _vcycle(struct, state, r, 0)


def _vcycle(struct, state, b, li):
    d, bs = struct.d, struct.bs
    lev = struct.levels[li]
    st = state[li]
    vals = st["vals"]
    offsets = lev.offsets if li else struct.fine_offsets
    matvec = lambda v: _spmv_cols(vals, offsets, v[:, None])[:, 0]
    if li == struct.num_levels - 1:
        return jax.scipy.linalg.cho_solve(st["cho"], b)
    x = _cheby(matvec, st["papply"], b, st["lmax"])
    r = b - matvec(x)
    lev_c = struct.levels[li + 1]
    caxes = lev_c.coarsen_axes
    n_c = int(np.prod(lev_c.grid)) * bs
    rg = _to_grid(r * st["zmask"], lev.grid, bs)
    rc = _to_flat(_restrict_grid(rg, d, struct.diagonal, caxes), n_c, d)
    rc = rc * state[li + 1]["zmask"]
    ec = _vcycle(struct, state, rc, li + 1)
    eg = _to_grid(ec * state[li + 1]["zmask"], lev_c.grid, bs)
    n_f = int(np.prod(lev.grid)) * bs
    x = x + _to_flat(_prolong_grid(eg, d, struct.diagonal, caxes), n_f, d) * st["zmask"]
    return _cheby_from(matvec, st["papply"], b, x, st["lmax"])
