"""Double-float32 ("two-float") arithmetic for the TPU macro assembly.

The macro stage of the direct-solve path runs in f64 (matrix entries at
κ~1e9 cannot live in f32 — see models/hmm.py on ``_macro_f64``), but the
TPU has no native f64: XLA emulates every f64 op in software on the VPU,
and the beam's macro assembly chain (S_loc einsum + gather assembly +
Dirichlet lifting, ~5 MFLOP of actual arithmetic) measures ~110 ms of
emulation overhead — two thirds of the warm macro stage
(benchmarks/macro_profile.py).

This module replaces that emulated-f64 arithmetic with hand-rolled
double-float arithmetic on (hi, lo) float32 pairs, built from the classic
error-free transforms (Dekker 1971, Knuth TAOCP §4.2.2):

- ``two_sum(a, b)``   — exact sum: returns (s, e) with s + e == a + b.
- ``two_prod(a, b)``  — exact product by Dekker splitting (no FMA on the
  VPU): returns (p, e) with p + e == a * b exactly (f32 inputs).
- df add/mul on (hi, lo) pairs, worst-case relative error O(2⁻⁴⁸) per op
  vs f64's 2⁻⁵³ — 16 ulp-f64 per operation, far below the 1e-13 relative
  residual target of the mixed-precision refinement solver
  (ops/solvers.py::_mixed_refine_ell), and 6 orders below the f32
  micro-stage error already present in the A* input.

Every op is exact IEEE-f32 VPU arithmetic (elementwise mul/add are NOT
routed through the bf16 MXU passes — only matmuls are), so the transforms
hold on TPU exactly as on CPU, where the unit tests pin them against
native f64 bit-for-bit.

Replaces: nothing in the reference (the reference runs PETSc f64 on CPU,
``hmm.py:144-149``); this is the TPU-native answer to "assemble in f64"
on an f32 machine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "two_sum",
    "two_prod",
    "df_add",
    "df_mul",
    "df_from_f64",
    "df_from_any",
    "df_to_f64",
    "df_where",
    "sloc_einsum_df",
    "assemble_gather_df",
    "apply_dirichlet_df",
]

_SPLIT = jnp.float32(4097.0)  # 2**ceil(24/2) + 1, Dekker splitter for f32


def two_sum(a, b):
    """Error-free sum: (s, e) with fl(a+b) = s and a + b = s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """two_sum under the precondition |a| >= |b| (3 ops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _dekker_split(a):
    """Split f32 a into hi + lo with 12-bit mantissas (exact products)."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: (p, e) with a * b = p + e exactly (f32)."""
    p = a * b
    ah, al = _dekker_split(a)
    bh, bl = _dekker_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(x, y):
    """(hi,lo) + (hi,lo) — sloppy double-float add, error O(2^-48)."""
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return _quick_two_sum(s, e)


def df_mul(x, y):
    """(hi,lo) * (hi,lo) double-float product."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _quick_two_sum(p, e)


def df_from_f64(a):
    """Split an f64 (or f32) array into a (hi, lo) f32 pair.

    Captures the leading 48 bits of the f64 value — relative
    representation error ≤ 2⁻⁴⁹."""
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(a.dtype)).astype(jnp.float32)
    return hi, lo


def df_from_any(a):
    """df view of an array: exact (lo = 0) for f32 input, split for f64."""
    if a.dtype == jnp.float32:
        return a, jnp.zeros_like(a)
    return df_from_f64(a)


def df_to_f64(x):
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def df_where(m, x, y):
    return jnp.where(m, x[0], y[0]), jnp.where(m, x[1], y[1])


def df_tree_reduce(x, axis):
    """df sum-reduce along ``axis`` by binary halving (zero-padded to a
    power of two — exact in df adds).  O(log n) df_add passes over large
    arrays instead of n small ones: both the op count (XLA compile time)
    and the HBM round trips stay logarithmic."""
    from jax import lax

    hi, lo = x
    n = hi.shape[axis]
    p = 1 << max(n - 1, 0).bit_length()
    if p != n:
        pad = [(0, 0)] * hi.ndim
        pad[axis] = (0, p - n)
        hi, lo = jnp.pad(hi, pad), jnp.pad(lo, pad)
    while p > 1:
        p //= 2
        a = (
            lax.slice_in_dim(hi, 0, p, axis=axis),
            lax.slice_in_dim(lo, 0, p, axis=axis),
        )
        b = (
            lax.slice_in_dim(hi, p, 2 * p, axis=axis),
            lax.slice_in_dim(lo, p, 2 * p, axis=axis),
        )
        hi, lo = df_add(a, b)
    return jnp.squeeze(hi, axis), jnp.squeeze(lo, axis)


def sloc_einsum_df(vols_df, P_df, A_T):
    """Per-cell stiffness blocks in double-float:

        S[c,m,n] = vols[c] * Σ_{r,t} P[c,m,r] · A_T[c,r,t] · P[c,n,t]

    — the df equivalent of the f64 ``einsum("c,cmr,crt,cnt->cmn", ...)``
    in the macro assembly (models/common.py::assemble_macro_system; the
    scalar bs=1 variant is the same contraction with P = grads, r = t = d).

    Each contraction materializes the full broadcast product tensor once
    (a few MB — trivially fits HBM) and tree-reduces the tiny generator
    axis (r, t ≤ 9) — all exact-compensated f32 VPU arithmetic; the MXU
    is useless here (bf16-decomposed f32 matmuls are not exact, which
    Dekker's transform requires).

    Args:
        vols_df: df (nc,) cell volumes.
        P_df: df (nc, nb, r) strain/gradient coefficients.
        A_T: (nc, r, t) homogenized tensor batch, f32 or f64.
    Returns: df (nc, nb, nb).
    """
    A_df = df_from_any(A_T)
    # B[c,m,t] = Σ_r P[c,m,r] A[c,r,t]
    Pm = (P_df[0][:, :, :, None], P_df[1][:, :, :, None])  # (nc,nb,r,1)
    Am = (A_df[0][:, None, :, :], A_df[1][:, None, :, :])  # (nc,1,r,t)
    B = df_tree_reduce(df_mul(Pm, Am), axis=2)  # (nc,nb,t)
    # S0[c,m,n] = Σ_t B[c,m,t] P[c,n,t]
    Bt = (B[0][:, :, None, :], B[1][:, :, None, :])  # (nc,nb,1,t)
    Pn = (P_df[0][:, None, :, :], P_df[1][:, None, :, :])  # (nc,1,nb,t)
    S0 = df_tree_reduce(df_mul(Bt, Pn), axis=3)  # (nc,nb,nb)
    v = (vols_df[0][:, None, None], vols_df[1][:, None, None])
    return df_mul(S0, v)


def assemble_gather_df(S_df, gather):
    """Gather-formulation ELL assembly in double-float.

    The df companion of ``assemble_ell(..., gather=...)``
    (ops/assembly.py): per ELL slot, fetch its (static, padded)
    contributor entries from the flat element-matrix array and df-sum
    them.  ONE f32 gather each for hi/lo replaces the emulated-f64
    gather; the contributor axis tree-reduces in df.

    Args:
        S_df: df (nc, nb, nb) element blocks.
        gather: (num_slots, m) int32 contributor table
            (ops/assembly.py::build_gather_assembly).
    Returns: df (num_slots,) flat ELL values.
    """
    zero = jnp.zeros((1,), jnp.float32)
    hi = jnp.concatenate([S_df[0].reshape(-1), zero])
    lo = jnp.concatenate([S_df[1].reshape(-1), zero])
    return df_tree_reduce((hi[gather], lo[gather]), axis=1)


def apply_dirichlet_df(vals_df, cols, diag_slots, b64, bc_mask, bc_values64,
                       dia=None):
    """Symmetric Dirichlet elimination with a double-float matrix.

    Mirrors ``ops/assembly.py::apply_dirichlet`` (itself the reference
    recipe, ``hmm.py:453-480``) with the lifting matvec and the row/column
    elimination in df arithmetic; the right-hand side stays true f64 (a
    single (N,) vector — the emulated-f64 cost is negligible and the rhs
    accuracy feeds straight into the refinement solver's residuals).

    Returns: (vals_df', b64').
    """
    N, K = cols.shape
    u_df = df_from_f64(jnp.where(bc_mask, bc_values64, 0.0))
    keep_row = jnp.logical_not(bc_mask)
    if dia is not None:
        from hommx_tpu.ops.dia import gather_cols

        y_df = _dia_spmv_df(vals_df, dia, u_df)
        keep_col = gather_cols(dia, keep_row)
    else:
        y_df = _ell_spmv_df(vals_df, cols, u_df)
        keep_col = keep_row[cols]
    b64 = b64 - df_to_f64(y_df)
    keep = (keep_row[:, None] & keep_col).reshape(-1)
    hi = jnp.where(keep, vals_df[0].reshape(N * K), 0.0)
    lo = jnp.where(keep, vals_df[1].reshape(N * K), 0.0)
    is_diag = jnp.zeros(N * K, dtype=bool).at[diag_slots].set(True)
    bc_flat = jnp.repeat(bc_mask, K)
    hi = jnp.where(is_diag & bc_flat, 1.0, hi)
    lo = jnp.where(is_diag & bc_flat, 0.0, lo)
    b64 = jnp.where(bc_mask, bc_values64, b64)
    return (hi, lo), b64


def _dia_spmv_df(vals_df, dia, x_df):
    """df DIA SpMV: ELL→DIA is a permutation scatter on hi/lo (distinct
    (row, col) pairs map to distinct DIA cells; only padding collides, on
    the discarded scratch cell), then one df multiply over the stacked
    static shifts and a tree reduction over the diagonal axis."""
    from hommx_tpu.ops.dia import ell_vals_to_dia

    dh = ell_vals_to_dia(dia, vals_df[0])
    dl = ell_vals_to_dia(dia, vals_df[1])
    offsets = dia.offsets
    N = x_df[0].shape[0]
    P = max(max(abs(o) for o in offsets), 1)
    xh = jnp.pad(x_df[0], (P, P))
    xl = jnp.pad(x_df[1], (P, P))
    sh = jnp.stack(
        [jax.lax.dynamic_slice(xh, (P + o,), (N,)) for o in offsets]
    )
    sl = jnp.stack(
        [jax.lax.dynamic_slice(xl, (P + o,), (N,)) for o in offsets]
    )
    return df_tree_reduce(df_mul((dh, dl), (sh, sl)), axis=0)


def _ell_spmv_df(vals_df, cols, x_df):
    """df ELL SpMV (unstructured fallback): gather hi/lo, df-reduce rows."""
    N, K = cols.shape
    vh = vals_df[0].reshape(N, K)
    vl = vals_df[1].reshape(N, K)
    prod = df_mul((vh, vl), (x_df[0][cols], x_df[1][cols]))
    return df_tree_reduce(prod, axis=1)
