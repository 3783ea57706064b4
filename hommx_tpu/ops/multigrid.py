"""Geometric multigrid preconditioner for structured macro systems.

Replaces the AMG-class preconditioning the reference gets from PETSc GAMG
(``examples/linear_elasticity/rotated_fibers.py:98``) and MUMPS LU
(``test_integration_poisson.py:207-212``) on macro systems beyond the dense
direct cap.  The design is TPU-first throughout:

  * **Grid hierarchy, not graph coarsening.**  hommx macro meshes come from
    ``create_rectangle``/``create_box`` and carry a ``BoxStructure``; vertex
    dofs form a lexicographic grid, so coarsening is index arithmetic with
    *static* shapes — no setup graphs, no dynamic sparsity, nothing XLA
    can't trace.  Anisotropic meshes (the thin-beam elasticity examples)
    are semicoarsened: only the strongly coupled (small-h) axes are halved
    per level, equalizing h — the classic robustness rule for point/block
    smoothers.
  * **Operators in block-stencil form.**  Every level's operator is stored
    as per-node-offset bs×bs blocks on the vertex grid,
    ``bvals[k, node, ci, cj]`` with k ranging over the ≤3^d node offsets
    — a matvec is one pad + (per offset) one static slice and one einsum.
    This keeps traced graphs small (the flat-DIA formulation put ~400 ops
    per 3D-elasticity matvec inside the CG while_loop and stalled the
    remote XLA compiler) and is the natural layout for the Galerkin
    algebra below.
  * **Transfer operators as interleave/slice programs.**  Prolongation is
    the exact P1 finite-element interpolation on the structured
    triangulation (fine vertex = midpoint of a coarse mesh edge for every
    off-lattice class, including the diagonal classes of the 2D split and
    the 3D Kuhn chains), written as stacked slices + reshapes — zero
    gathers/scatters.  Restriction is its exact adjoint (padding + adds),
    so the hierarchy is variational and the V-cycle is SPD.
  * **Galerkin coarse operators by lattice probing.**  Coarse stencils
    stay inside {-1,0,1}^d (linear interpolation of a nearest-neighbour
    block stencil), and offsets are injective mod 3, so A_c = PᵀAP is
    recovered *exactly* from 3^d·bs probing vectors — one batched stencil
    matvec per level instead of a sparse triple product.  The whole setup
    is traced: it lives inside the jitted macro solve and is
    differentiable like everything else.
  * **Chebyshev smoothing** (dot-product-free, so no extra reductions in
    the inner loop) with point-Jacobi (scalar) or block-Jacobi
    (elasticity) preconditioning and a power-iteration λmax estimate
    capped by a rigorous Gershgorin-type bound; the bottom level applies a
    precomputed dense inverse (one MXU matvec per cycle — TPU triangular
    solves are latency-bound).

The V-cycle with equal pre/post Chebyshev smoothing is a symmetric
positive definite preconditioner, composed with CG in ``ops/solvers.py`` —
the TPU-native analogue of the reference's ``{"ksp_type": "cg",
"pc_type": "gamg"}`` configuration.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MGStructure", "build_mg_structure", "mg_setup", "mg_vcycle"]

#: coarsest-level size cap for the dense bottom solve.  Backend-dependent:
#: on TPU the V-cycle cost is dominated by per-op *latency* at the small
#: coarse levels, so fewer levels + a large dense bottom (one MXU matvec
#: per cycle via the precomputed inverse) wins; on CPU (f64 test path) the
#: dense-inverse setup is the expensive part, so the bottom stays small.
_BOTTOM_MAX = 1500
#: Chebyshev smoothing degree (matvecs per pre/post smoothing application)
_CHEB_DEGREE = 2


def _default_bottom_max() -> int:
    try:
        if jax.default_backend() in ("tpu", "axon"):
            # large enough to cut hierarchy depth (per-op latency), small
            # enough that the Newton–Schulz bottom inverse (O(n³) per
            # iteration) stays in the tens of milliseconds
            return 2500
    except Exception:  # pragma: no cover
        pass
    return _BOTTOM_MAX


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
    form, re-packed into block-stencil layout by the static ``fine_src`` /
    ``fine_dst`` maps on MGStructure); levels ≥ 1 get their operator from
    Galerkin probing.
    """

    intervals: tuple  # grid intervals per axis (nx, ny[, nz])
    grid: tuple  # vertex counts per axis
    node_offsets: tuple  # grid node offsets δ ∈ {-1,0,1}^d of the stencil
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
    fine_src: np.ndarray  # gather indices into flat (n_off·N) DIA values
    fine_dst: np.ndarray  # matching scatter indices into flat stencil vals
    # odd-interval grids are ghost-padded to even (see build_mg_structure):
    # real_idx maps original flat dofs → padded flat dofs (None: no padding),
    # ghost_diag_dst marks the padded stencil's ghost diagonal slots
    real_idx: Optional[np.ndarray] = None
    ghost_diag_dst: Optional[np.ndarray] = None

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


def _grid_strides(grid) -> list:
    d = len(grid)
    strides = [1] * d
    for ax in range(d - 2, -1, -1):
        strides[ax] = strides[ax + 1] * grid[ax + 1]
    return strides


def _decompose_offset(flat: int, strides, d: int):
    """Balanced mixed-radix decomposition of a flat node offset into per-axis
    digits in {-1,0,1}; None if the offset is not a nearest-neighbour step
    (possible only for DIA slots that hold exact zeros)."""
    digits = []
    rem = flat
    for ax in range(d):
        best = min((-1, 0, 1), key=lambda v: abs(rem - v * strides[ax]))
        digits.append(best)
        rem -= best * strides[ax]
    return tuple(digits) if rem == 0 else None


def _probe_tables(cgrid, node_offsets, d):
    """Residue-class masks and probe permutations for Galerkin extraction."""
    n_nodes = int(np.prod(cgrid))
    res = _node_residues(cgrid)
    nm = 3**d
    masks = np.zeros((nm, n_nodes), dtype=np.float64)
    masks[res, np.arange(n_nodes)] = 1.0
    # perms[iδ, m] = residue index of (m − δ) mod 3 (per axis): extraction
    # reads probe m through mask class (m − δ) mod 3
    m_digits = np.array(
        list(itertools.product((0, 1, 2), repeat=d)), dtype=np.int64
    )
    perms = np.zeros((len(node_offsets), nm), dtype=np.int64)
    for i, dlt in enumerate(node_offsets):
        shifted = (m_digits - np.asarray(dlt)) % 3
        code = np.zeros(nm, dtype=np.int64)
        for ax in range(d):
            code = code * 3 + shifted[:, ax]
        perms[i] = code
    return masks, perms


def build_mg_structure(
    structure, bs: int, dia, bottom_max: Optional[int] = None
) -> Optional[MGStructure]:
    """Build the static hierarchy, or None when multigrid does not apply
    (unstructured mesh, no DIA view, or no even-refinement level available).

    Args:
        structure: the mesh's BoxStructure (grid intervals + diagonal).
        bs: dof block size (1 scalar, d elasticity).
        dia: the fine operator's DIAPattern (offsets re-packed for level 0).
    """
    if structure is None or dia is None:
        return None
    if bottom_max is None:
        bottom_max = _default_bottom_max()
    intervals = tuple(int(n) for n in structure.shape)
    d = len(intervals)
    if d not in (2, 3):
        return None
    grid = tuple(n + 1 for n in intervals)
    if int(np.prod(grid)) * bs != dia.num_dofs:
        return None  # dof layout is not the plain vertex grid
    if any(g < 3 for g in grid):
        return None  # offset decomposition needs ≥3 vertices per axis
    diagonal = getattr(structure, "diagonal", "right")
    rng = np.random.default_rng(7)

    # Odd-interval axes are ghost-padded to even (round 3): one extra
    # interval of decoupled identity rows at the far end makes the axis
    # coarsenable.  The padded operator is block-diag(A, I), so the V-cycle
    # restricted back to the real dofs stays SPD (congruence E M_pad Eᵀ),
    # and ghost rows ride the existing Dirichlet identity-row machinery
    # (zero off-diagonal mass ⇒ zmask 0).  This closes the reference gap
    # where GAMG accepts the default 15×15-descended odd meshes
    # (``test_integration_poisson.py:60-73``) but the round-2 geometric
    # hierarchy declined them.
    intervals_p = tuple(n + 1 if (n % 2 and n >= 3) else n for n in intervals)
    grid_p = tuple(n + 1 for n in intervals_p)
    padded = intervals_p != intervals
    n_nodes_f = int(np.prod(grid_p))

    # fine-level re-pack: flat DIA slot (offset o, row (n, ci)) → stencil
    # block (δ, n, ci, cj) with cj ≡ ci + o (mod bs) and δ the balanced
    # decomposition of (o - (cj - ci))/bs IN THE ORIGINAL grid strides
    # (DIA offsets live in the original flat index space); destination
    # indices use the padded grid.  Slots whose δ leaves {-1,0,1}^d hold
    # exact zeros (no such grid edge) and are dropped.
    N = int(np.prod(grid)) * bs
    strides = _grid_strides(grid)
    fine_node_offsets = []
    pack = []  # (offset_index, ci, cj, δ_index)
    for oi, o in enumerate(dia.offsets):
        for ci in range(bs):
            cj = (ci + o) % bs
            node_flat = (o - (cj - ci)) // bs
            digits = _decompose_offset(node_flat, strides, d)
            if digits is None:
                continue
            if digits not in fine_node_offsets:
                fine_node_offsets.append(digits)
            pack.append((oi, ci, cj, fine_node_offsets.index(digits)))
    fine_node_offsets = tuple(fine_node_offsets)
    if padded:
        coords = np.stack(
            np.meshgrid(*[np.arange(g) for g in grid], indexing="ij"), axis=-1
        ).reshape(-1, d)
        strides_p = _grid_strides(grid_p)
        rows = coords @ np.asarray(strides_p, dtype=np.int64)  # orig→padded
        real_mask = np.zeros(n_nodes_f, dtype=bool)
        real_mask[rows] = True
        ghost = np.nonzero(~real_mask)[0]
        i0d = fine_node_offsets.index((0,) * d)
        comp = np.arange(bs, dtype=np.int64)
        ghost_diag_dst = (
            ((i0d * n_nodes_f + ghost[:, None]) * bs + comp[None, :]) * bs
            + comp[None, :]
        ).reshape(-1)
        real_idx = (rows[:, None] * bs + comp[None, :]).reshape(-1)
    else:
        rows = np.arange(n_nodes_f, dtype=np.int64)
        real_idx = None
        ghost_diag_dst = None
    src, dst = [], []
    for oi, ci, cj, di in pack:
        src.append(oi * N + np.arange(N // bs, dtype=np.int64) * bs + ci)
        dst.append(((di * n_nodes_f + rows) * bs + ci) * bs + cj)
    fine_src = np.concatenate(src)
    fine_dst = np.concatenate(dst)

    levels = [
        _Level(
            intervals_p, grid_p, fine_node_offsets, None, None,
            rng.standard_normal(n_nodes_f * bs),
        )
    ]
    node_offsets = tuple(itertools.product((-1, 0, 1), repeat=d))
    # padded axes keep their physical h (the ghost interval is fictitious):
    # scale extents so the semicoarsening heuristic sees the true h
    extents = np.asarray(structure.hi, dtype=np.float64) - np.asarray(
        structure.lo, dtype=np.float64
    )
    extents = extents * (
        np.asarray(intervals_p, dtype=np.float64)
        / np.asarray(intervals, dtype=np.float64)
    )
    cur = intervals_p
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
        masks, perms = _probe_tables(cgrid, node_offsets, d)
        levels.append(
            _Level(
                cur, cgrid, node_offsets, masks, perms,
                rng.standard_normal(n_nodes * bs), caxes,
            )
        )
        if n_nodes * bs <= bottom_max:
            break
    if len(levels) < 2:
        return None
    return MGStructure(
        d, bs, diagonal, tuple(levels), tuple(dia.offsets), fine_src,
        fine_dst, real_idx, ghost_diag_dst,
    )


# ---------------------------------------------------------------------------
# traced setup (per assembled operator) + V-cycle application
# ---------------------------------------------------------------------------


def _to_grid(x, grid, bs):
    """(N, ...) flat dof vector(s) → (*grid, bs, ...) grid layout."""
    return x.reshape(grid + (bs,) + x.shape[1:])


def _to_flat(xg, n, d):
    return xg.reshape((n,) + xg.shape[d + 1 :])


def _stencil_matvec(bvals, lev: _Level, bs: int, X):
    """Block-stencil SpMV on the vertex grid, applied to columns X (N, B):
    one zero-pad of the grid, per node offset one static slice, then one
    fused contraction with the (node, bs, bs) blocks.  Out-of-grid
    neighbours read the zero padding (their block values are exact zeros
    anyway).

    For solve vectors (B = 1, the CG hot path) the contraction is written
    as a broadcast multiply + sum — pure VPU elementwise work.  Per-offset
    einsums were measured at ~0.5ms each on the axon backend (tiny 3×3
    dot_generals pay fixed MXU dispatch), putting a 3-level V-cycle at
    ~115ms; the elementwise form removes every small dot_general from the
    CG loop body.  The wide probing batch (B = 3^d·bs, once per setup)
    keeps the einsum, where the contraction is large enough to matter."""
    grid = lev.grid
    d = len(grid)
    B = X.shape[1]
    nd = len(lev.node_offsets)
    xg = X.reshape(grid + (bs, B))
    xp = jnp.pad(xg, [(1, 1)] * d + [(0, 0), (0, 0)])
    slices = [
        xp[tuple(slice(1 + dlt[ax], 1 + dlt[ax] + grid[ax]) for ax in range(d))]
        for dlt in lev.node_offsets
    ]
    S = jnp.stack(slices, axis=0)  # (nδ, *grid, bs, B)
    Bv = bvals.reshape((nd,) + grid + (bs, bs))
    if B == 1:
        # y[..., i] = Σ_k Σ_j Bv[k, ..., i, j] · S[k, ..., j]
        y = jnp.sum(Bv * S[..., 0][..., None, :], axis=(0, -1))
        return y.reshape(X.shape)
    y = jnp.einsum("k...ij,k...jb->...ib", Bv, S)
    return y.reshape(X.shape)


def _pack_fine(struct: MGStructure, fine_vals):
    """Flat DIA values → level-0 block-stencil values (one static scatter);
    ghost-padded rows (odd-grid padding) get the identity diagonal."""
    lev0 = struct.levels[0]
    n_nodes = int(np.prod(lev0.grid))
    bs = struct.bs
    out = jnp.zeros(
        len(lev0.node_offsets) * n_nodes * bs * bs, dtype=fine_vals.dtype
    )
    out = out.at[jnp.asarray(struct.fine_dst)].set(
        fine_vals.reshape(-1)[jnp.asarray(struct.fine_src)]
    )
    if struct.ghost_diag_dst is not None:
        out = out.at[jnp.asarray(struct.ghost_diag_dst)].set(1.0)
    return out.reshape(len(lev0.node_offsets), n_nodes, bs, bs)


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


def _smoother(bvals, lev: _Level, bs: int, v0):
    """Build the smoothing preconditioner (point/block Jacobi) and the
    Chebyshev λmax(M⁻¹A) estimate for one level.

    λmax: a power iteration (16 traced matvecs — noise next to one solve)
    converges from below; 30% headroom on top (power iteration from a fixed
    stored start vector can sit well under λmax when the top eigenspace is
    nearly orthogonal to it — wide headroom costs a little smoothing
    strength but is safe against the underestimate that makes Chebyshev
    AMPLIFY the top modes), capped by the rigorous Gershgorin-type bound
    λmax(M⁻¹A) ≤ λmax(M⁻¹D)·λmax(D⁻¹A) (per-row absolute sums of the
    stencil blocks are exact row sums of |A|), which only bounds
    overestimates.

    Returns (papply, lmax).
    """
    i0 = lev.node_offsets.index((0,) * len(lev.grid))
    n_nodes = bvals.shape[1]
    Bdiag = bvals[i0]  # (n_nodes, bs, bs)
    diag = jnp.einsum("nii->ni", Bdiag).reshape(-1)  # (N,)
    dinv = jnp.where(jnp.abs(diag) > 0, 1.0 / diag, 1.0)
    rowsum = jnp.sum(jnp.abs(bvals), axis=(0, 3)).reshape(-1)  # (N,)
    gersh = jnp.max(dinv * rowsum)
    if bs == 1:
        papply = lambda r: dinv * r
        cap = gersh
    else:
        from hommx_tpu.ops.elements import _inv_and_det

        Bsym = 0.5 * (Bdiag + jnp.swapaxes(Bdiag, -1, -2))
        # closed-form adjugate inverse: batched LU (jnp.linalg.inv) on tiny
        # matrices is latency-bound on TPU; the adjugate is elementwise,
        # and so is the application (broadcast-multiply + sum — no tiny
        # batched dot_generals in the CG loop body)
        Binv, _ = _inv_and_det(Bsym)
        papply = lambda r: jnp.sum(
            Binv * r.reshape(n_nodes, bs)[:, None, :], axis=-1
        ).reshape(r.shape)
        # λmax(B⁻¹D) ≤ max_n ‖Binv_n·D_n‖_F (Frobenius ≥ spectral norm)
        Dn = jax.vmap(jnp.diag)(diag.reshape(n_nodes, bs))
        BiD = jnp.einsum("nij,njk->nik", Binv, Dn)
        cap = gersh * jnp.max(jnp.sqrt(jnp.sum(BiD * BiD, axis=(1, 2))))
    matvec = lambda v: _stencil_matvec(bvals, lev, bs, v[:, None])[:, 0]

    def body(_, v):
        w = papply(matvec(v))
        return w / (jnp.linalg.norm(w) + 1e-30)

    v = jax.lax.fori_loop(0, 16, body, v0 / (jnp.linalg.norm(v0) + 1e-30))
    Av = matvec(v)
    # ⟨Av, M⁻¹Av⟩/⟨v, Av⟩ — the Rayleigh quotient of A^½M⁻¹A^½ at A^½v,
    # hence a lower bound on λmax(M⁻¹A) that needs only M⁻¹ (papply)
    lam = jnp.vdot(Av, papply(Av)) / (jnp.vdot(v, Av) + 1e-30)
    return papply, jnp.minimum(cap, 1.3 * lam)


def _coarsen(struct: MGStructure, lev_idx: int, bvals_f, zmask_f):
    """Galerkin coarse operator A_c = P̃ᵀ A_f P̃ (with P̃ = Z_f P Z_c the
    BC-masked interpolation) by mod-3 lattice probing — see module docstring.

    Returns (bvals_c, zmask_c): stencil blocks on the coarse level and the
    coarse keep-mask (0 at Dirichlet dofs).
    """
    d, bs = struct.d, struct.bs
    lev_f, lev_c = struct.levels[lev_idx - 1], struct.levels[lev_idx]
    n_f = int(np.prod(lev_f.grid)) * bs
    n_c = int(np.prod(lev_c.grid)) * bs
    nm = 3**d
    dtype = bvals_f.dtype
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

    # Y = Z_c R Z_f A Z_f P Z_c X  — one batched stencil SpMV
    Xg = _to_grid(X, lev_c.grid, bs)
    Pf = _to_flat(_prolong_grid(Xg, d, struct.diagonal, caxes), n_f, d)
    Pf = Pf * zmask_f[:, None]
    APf = _stencil_matvec(bvals_f, lev_f, bs, Pf) * zmask_f[:, None]
    Y = _to_flat(
        _restrict_grid(_to_grid(APf, lev_f.grid, bs), d, struct.diagonal, caxes),
        n_c,
        d,
    )
    Y = Y * zmask_c[:, None]
    Yr = Y.reshape(-1, bs, nm, bs)  # [n, ci, m, cj]

    blocks = []
    for i in range(len(lev_c.node_offsets)):
        Mi = masks[np.asarray(lev_c.perms[i])]  # (nm, n_nodes_c), static perm
        # Z[n, ci, cj] = Σ_m Yr[n, ci, m, cj] · Mi[m, n]
        blocks.append(jnp.einsum("ncmj,mn->ncj", Yr, Mi))
    bvals_c = jnp.stack(blocks, axis=0)  # (nδ, n_nodes_c, bs, bs)

    # identity diagonal at coarse Dirichlet dofs (probing left them zero)
    i0 = lev_c.node_offsets.index((0,) * d)
    zn = zmask_c.reshape(-1, bs)
    diag_blk = bvals_c[i0]
    eye_fill = jnp.einsum("nc,cd->ncd", 1.0 - zn, jnp.eye(bs, dtype=dtype))
    keep = jnp.minimum(zn[:, :, None], zn[:, None, :])
    bvals_c = bvals_c.at[i0].set(diag_blk * keep + eye_fill)
    return bvals_c, zmask_c


def _dense_from_stencil(bvals, lev: _Level, bs: int):
    """Materialize a small stencil operator as dense (bottom level only)
    with a single static scatter; out-of-grid neighbour entries are exact
    zeros and their (host-computed) index rows are simply dropped."""
    grid = lev.grid
    d = len(grid)
    n_nodes = int(np.prod(grid))
    n = n_nodes * bs
    coords = np.stack(
        np.meshgrid(*[np.arange(g) for g in grid], indexing="ij"), axis=-1
    ).reshape(-1, d)
    strides = _grid_strides(grid)
    flat_idx, val_idx = [], []
    for k, dlt in enumerate(lev.node_offsets):
        nbr = coords + np.asarray(dlt)
        valid = np.all((nbr >= 0) & (nbr < np.asarray(grid)), axis=1)
        rows_n = np.nonzero(valid)[0]
        cols_n = rows_n + sum(dlt[ax] * strides[ax] for ax in range(d))
        for ci in range(bs):
            for cj in range(bs):
                flat_idx.append((rows_n * bs + ci) * n + cols_n * bs + cj)
                val_idx.append(((k * n_nodes + rows_n) * bs + ci) * bs + cj)
    flat_idx = jnp.asarray(np.concatenate(flat_idx))
    val_idx = jnp.asarray(np.concatenate(val_idx))
    dense = jnp.zeros(n * n, dtype=bvals.dtype)
    dense = dense.at[flat_idx].add(bvals.reshape(-1)[val_idx])
    return dense.reshape(n, n)


def mg_setup(struct: MGStructure, fine_vals, f32_bottom_guard: bool = False):
    """Per-operator traced setup: Galerkin hierarchy, smoother blocks, λmax
    estimates, bottom inverse.

    Args:
        struct: static hierarchy from build_mg_structure.
        fine_vals: (n_offsets, N) DIA values of the BC-applied fine operator
            (``ell_vals_to_dia`` output).
        f32_bottom_guard: harden the f32 bottom-level inverse against
            κ·eps_f32 breakdown (equilibrate + 4e-6·Gershgorin shift) — set
            by the f64-Krylov path that casts its V-cycle to f32
            (ops/solvers.py::_prec_in_f32), where the fine operator can be
            arbitrarily ill-conditioned.  Off by default so native-f32
            solves (which the pipeline only routes well-conditioned-enough
            systems onto) keep their exact previous behavior and iteration
            counts.
    Returns a pytree consumed by :func:`mg_vcycle`.
    """
    bs = struct.bs
    bvals = _pack_fine(struct, fine_vals)
    # Dirichlet rows are eliminated to the identity by apply_dirichlet: a row
    # with zero off-diagonal mass is a BC row (no plumbing of the BC mask)
    lev0 = struct.levels[0]
    i0 = lev0.node_offsets.index((0,) * struct.d)
    offdiag = jnp.sum(jnp.abs(bvals), axis=(0, 3)) - jnp.abs(
        jnp.einsum("nii->ni", bvals[i0])
    )
    zmask = (offdiag.reshape(-1) > 0).astype(fine_vals.dtype)

    state = []
    zm = zmask
    for li in range(struct.num_levels):
        lev = struct.levels[li]
        if li == struct.num_levels - 1:
            dense = _dense_from_stencil(bvals, lev, bs)
            dense = 0.5 * (dense + dense.T)
            # explicit inverse, not a stored factorization: per-cycle
            # triangular solves are latency-bound on TPU (measured ~15ms at
            # n≈1000), and so is the Cholesky-based inverse itself (~1.9s at
            # n≈3300).  On TPU the inverse is computed by Newton–Schulz
            # iteration — pure MXU matmuls, X ← X(2I − AX), quadratically
            # convergent from the classic ‖A‖₁‖A‖∞ scaling init — leaving
            # one dense matvec per cycle.  CPU (f64 test path) keeps the
            # Cholesky inverse.
            n = dense.shape[0]
            # f32 robustness: past κ·eps_f32 ≈ 1 the f32 inverse of the raw
            # bottom matrix breaks down (Cholesky NaNs; Newton–Schulz loses
            # the low modes) — equilibrate and apply the same
            # 4e-6·Gershgorin diagonal shift as the mixed-precision direct
            # path (ops/solvers.py::_mixed_refine_ell).  The V-cycle is a
            # preconditioner, so the perturbation costs iterations, never
            # attainable accuracy; the f64 (CPU parity) path is unchanged.
            sc = None
            if f32_bottom_guard and dense.dtype == jnp.float32:
                dg = jnp.einsum("ii->i", dense)
                sc = jnp.where(
                    dg > 0, jax.lax.rsqrt(jnp.maximum(dg, 1e-30)), 1.0
                )
                dense = sc[:, None] * dense * sc[None, :]
                gersh = jnp.max(jnp.sum(jnp.abs(dense), axis=1))
                dense = dense + (4e-6 * gersh) * jnp.eye(n, dtype=dense.dtype)
            if jax.default_backend() in ("tpu", "axon"):
                eye = jnp.eye(n, dtype=bvals.dtype)
                l1 = jnp.max(jnp.sum(jnp.abs(dense), axis=0))
                linf = jnp.max(jnp.sum(jnp.abs(dense), axis=1))
                X0 = dense / (l1 * linf)  # = Aᵀ/(‖A‖₁‖A‖∞), A symmetric
                binv = jax.lax.fori_loop(
                    0, 50, lambda i, X: X @ (2.0 * eye - dense @ X), X0
                )
                binv = 0.5 * (binv + binv.T)
            else:
                cho = jax.scipy.linalg.cho_factor(dense)
                binv = jax.scipy.linalg.cho_solve(
                    cho, jnp.eye(n, dtype=bvals.dtype)
                )
            if sc is not None:
                binv = sc[:, None] * binv * sc[None, :]
            state.append({"bvals": bvals, "zmask": zm, "binv": binv})
            break
        v0 = jnp.asarray(lev.power_vec, dtype=bvals.dtype)
        papply, lmax = _smoother(bvals, lev, bs, v0)
        state.append(
            {"bvals": bvals, "papply": papply, "lmax": lmax, "zmask": zm}
        )
        bvals, zm = _coarsen(struct, li + 1, bvals, zm)
    return state


def mg_vcycle(struct: MGStructure, state, r):
    """One V(ν,ν) cycle applied to the residual r — the preconditioner
    application M⁻¹r.  Symmetric positive definite (variational hierarchy +
    identical pre/post Chebyshev smoothing), so it composes with CG.  On
    ghost-padded hierarchies (odd-interval grids) the residual is embedded
    with zeros on the ghost dofs and the correction restricted back — a
    congruence E M_pad Eᵀ of the SPD padded V-cycle, hence still SPD."""
    if struct.real_idx is None:
        return _vcycle(struct, state, r, 0)
    lev0 = struct.levels[0]
    n_pad = int(np.prod(lev0.grid)) * struct.bs
    idx = jnp.asarray(struct.real_idx)
    r_p = jnp.zeros(n_pad, dtype=r.dtype).at[idx].set(r)
    return _vcycle(struct, state, r_p, 0)[idx]


def _vcycle(struct, state, b, li):
    d, bs = struct.d, struct.bs
    lev = struct.levels[li]
    st = state[li]
    if li == struct.num_levels - 1:
        return st["binv"] @ b
    matvec = lambda v: _stencil_matvec(st["bvals"], lev, bs, v[:, None])[:, 0]
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
