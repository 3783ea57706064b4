"""DIA (diagonal) sparse format + Pallas TPU SpMV kernel.

P1 stiffness matrices on structured meshes have a small, fixed set of
column offsets (7 in 2D, ~15 in 3D), so SpMV collapses to

    y = Σ_d vals_d ∘ shift(x, offset_d)

with *static* offsets — no gather, which is exactly what the TPU wants
(replaces the PETSc MatAIJ SpMV inside KSP, reference ``hmm.py:482-483``).
The Pallas kernel blocks the rows, keeps the padded x vector in VMEM, and
accumulates all diagonals per block, reading x once per block instead of
once per diagonal.  A pure-jnp fallback with identical numerics covers CPU
and unsupported shapes; unstructured meshes (many distinct offsets) stay on
the gather-based ELL path (ops/sparse.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.ops.sparse import ELLPattern

__all__ = [
    "DIAPattern",
    "build_dia_from_ell",
    "dia_spmv",
    "dia_spmv_cols",
    "dia_spmv_pallas",
]

# P1 block stencils stay well under this: 7 (2D scalar) / 21 (2D elasticity)
# / 15 (3D scalar) / 75 (3D elasticity) distinct offsets.  Unstructured
# meshes blow past it and stay on the ELL gather path.
_MAX_DIAGONALS = 96


@dataclasses.dataclass(frozen=True)
class DIAPattern:
    """Static DIA conversion data derived from an ELLPattern.

    Attributes:
        offsets: (nd,) sorted distinct column offsets (col - row).
        ell_to_dia: (N*K,) flat index into the (nd, N) DIA value array for
            every ELL slot (padding slots point at a scratch slot nd*N).
        ell_off_index: (N, K) diagonal index of every ELL slot (-1 padding) —
            enables gather-free per-column operations on ELL values (e.g.
            Dirichlet column elimination) via shifted row vectors.
        num_dofs: N.
    """

    offsets: tuple
    ell_to_dia: np.ndarray
    ell_off_index: np.ndarray
    num_dofs: int

    @property
    def num_diagonals(self) -> int:
        return len(self.offsets)


def build_dia_from_ell(pattern: ELLPattern) -> Optional[DIAPattern]:
    """DIA conversion for an ELL pattern; None if too many distinct offsets
    (unstructured mesh) for the format to pay off."""
    N, K = pattern.num_dofs, pattern.row_width
    rows = np.repeat(np.arange(N), K)
    cols = pattern.cols.reshape(-1).astype(np.int64)
    # real slots are exactly those the assembly scatters into; everything
    # else is ELL padding (zero values) and is routed to a scratch cell
    used = np.unique(pattern.slots)
    offs_used = cols[used] - rows[used]
    uniq = np.unique(offs_used)
    if len(uniq) > _MAX_DIAGONALS:
        return None
    off_index = {int(o): i for i, o in enumerate(uniq.tolist())}
    scratch = len(uniq) * N
    out = np.full(N * K, scratch, dtype=np.int64)
    oidx = np.array([off_index[int(o)] for o in offs_used.tolist()], dtype=np.int64)
    out[used] = oidx * N + rows[used]
    ell_off = np.full(N * K, -1, dtype=np.int8)
    ell_off[used] = oidx
    return DIAPattern(
        tuple(int(o) for o in uniq),
        out.astype(np.int32),
        ell_off.reshape(N, K),
        N,
    )


def ell_vals_to_dia(dia: DIAPattern, ell_vals: jnp.ndarray) -> jnp.ndarray:
    """Scatter the flat ELL value array into (nd, N) DIA storage (+scratch)."""
    nd, N = dia.num_diagonals, dia.num_dofs
    out = jnp.zeros(nd * N + 1, dtype=ell_vals.dtype)
    out = out.at[jnp.asarray(dia.ell_to_dia)].add(ell_vals)
    return out[: nd * N].reshape(nd, N)


def gather_cols(dia: DIAPattern, row_vec: jnp.ndarray) -> jnp.ndarray:
    """(N, K) array with entry [i, k] = row_vec[cols[i, k]] — the per-column
    lookup of ELL operations, computed WITHOUT a gather: each ELL slot's
    column is row + (static) offset, so the lookup is a static shift of
    ``row_vec`` selected by the static per-slot diagonal index."""
    N = dia.num_dofs
    P = max(max(abs(o) for o in dia.offsets), 1)
    rp = jnp.pad(row_vec, (P, P))
    out = jnp.zeros(dia.ell_off_index.shape, dtype=row_vec.dtype)
    for d, off in enumerate(dia.offsets):
        shifted = jax.lax.dynamic_slice(rp, (P + off,), (N,))
        sel = jnp.asarray(dia.ell_off_index == d)
        out = jnp.where(sel, shifted[:, None], out)
    return out


def dia_spmv(dia_vals: jnp.ndarray, offsets, x: jnp.ndarray) -> jnp.ndarray:
    """Reference jnp DIA SpMV: y[i] = Σ_d vals[d, i] * x[i + off_d]."""
    N = x.shape[0]
    P = max(max(abs(o) for o in offsets), 1)
    xp = jnp.pad(x, (P, P))
    y = jnp.zeros_like(x)
    for d, off in enumerate(offsets):
        y = y + dia_vals[d] * jax.lax.dynamic_slice(xp, (P + off,), (N,))
    return y


def dia_spmv_cols(dia_vals: jnp.ndarray, offsets, X: jnp.ndarray) -> jnp.ndarray:
    """DIA SpMV applied to a block of column vectors X (N, B):
    Y[i, b] = Σ_d vals[d, i] * X[i + off_d, b] — the multi-vector companion
    of :func:`dia_spmv` for block solves and probing against a DIA operator
    (multigrid's Galerkin probing uses its own grid-structured
    ``_stencil_matvec`` instead; this is the public multi-RHS entry)."""
    N = X.shape[0]
    P = max(max(abs(o) for o in offsets), 1)
    Xp = jnp.pad(X, ((P, P), (0, 0)))
    Y = jnp.zeros_like(X)
    for d, off in enumerate(offsets):
        shifted = jax.lax.dynamic_slice_in_dim(Xp, P + off, N, axis=0)
        Y = Y + dia_vals[d][:, None] * shifted
    return Y


def dia_spmv_pallas(
    dia_vals: jnp.ndarray,
    offsets,
    x: jnp.ndarray,
    block: int = 2048,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Pallas TPU DIA SpMV.

    Grid over row blocks; the padded x lives in VMEM and each block reads it
    once per diagonal via *static* offset slices (no gather).  Out-of-range
    contributions are masked by the zero padding.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    LANES = 128
    SUB = 8  # f32 sublane granularity
    BR = block // LANES  # rows per grid step
    assert BR % SUB == 0, "block must be a multiple of 1024"
    N = x.shape[0]
    nd = dia_vals.shape[0]
    P = max(max(abs(o) for o in offsets), 1)
    # row halo: largest |offset| in rows + the H-row window overhang, aligned
    PR = -(-(P // LANES + 2 * SUB + 2) // SUB) * SUB
    Rdata = -(-N // block) * BR  # data rows, multiple of BR
    Npad2 = Rdata * LANES
    xp = jnp.pad(x, (PR * LANES, PR * LANES + (Npad2 - N))).reshape(-1, LANES)
    vp = jnp.pad(dia_vals, ((0, 0), (0, Npad2 - N))).reshape(nd, Rdata, LANES)
    H = BR + 2 * SUB  # per-offset row window (covers rr + column carry)

    def shifted(W, rr, dc):
        """W flattened-shifted by rr rows + dc lanes: out[r,c] = W[r+rr +
        (c+dc)//128, (c+dc)%128] for r < BR (static sublane/lane rolls)."""
        A1 = W if rr == 0 else pltpu.roll(W, jnp.int32(H - rr), 0)
        A2 = pltpu.roll(W, jnp.int32(H - rr - 1), 0)
        if dc:
            A1 = pltpu.roll(A1, jnp.int32(LANES - dc), 1)
            A2 = pltpu.roll(A2, jnp.int32(LANES - dc), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 1)
        return jnp.where(col < LANES - dc, A1, A2)[:BR, :]

    def kernel(v_ref, x_ref, y_ref):
        # Mosaic needs sublane-aligned row loads: each diagonal offset is
        # decomposed into an aligned row-window start plus static sublane
        # and lane rolls with a column-carry select.
        i = pl.program_id(0)
        acc = jnp.zeros((BR, LANES), dtype=y_ref.dtype)
        for d, off in enumerate(offsets):  # static unrolled loop
            dr, dc = divmod(off, LANES)  # dc in [0, 128)
            q8, rr = divmod(dr + PR, SUB)
            start = pl.multiple_of(i * BR + q8 * SUB, SUB)
            W = x_ref[pl.ds(start, H), :]
            acc = acc + v_ref[d] * shifted(W, rr, dc)
        y_ref[:, :] = acc

    # index-map literals must be i32: under jax_enable_x64 a bare Python 0
    # traces as i64 and Mosaic rejects the mixed-width index tuple
    zero = np.int32(0)
    y = pl.pallas_call(
        kernel,
        grid=(Rdata // BR,),
        in_specs=[
            pl.BlockSpec(
                (nd, BR, LANES), lambda i: (zero, i, zero), memory_space=pltpu.VMEM
            ),
            # full padded x (2D), resident across grid steps
            pl.BlockSpec(xp.shape, lambda i: (zero, zero), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BR, LANES), lambda i: (i, zero), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Rdata, LANES), x.dtype),
        interpret=interpret,
    )(vp, xp)
    return y.reshape(-1)[:N]
