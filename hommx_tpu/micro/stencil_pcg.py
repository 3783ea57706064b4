"""Fused Pallas chunk-PCG for the periodic-stencil micro path (TPU).

The XLA chunk-PCG loop (micro/engine.py::_chunk_pcg_raw) is HBM-bound: every
iteration streams ~15 (n, s, C)-sized arrays through HBM (Krylov state
updates, reductions, best-iterate tracking) — measured ~13 ms of the
headline benchmark's ~21 ms of real per-rep compute, at ~1% arithmetic
intensity.  This kernel runs the ENTIRE PCG loop inside one pallas_call
with the Krylov state resident in VMEM: per (s, grid…, Cb) block, the only
HBM traffic is one read of the stencil weights / RHS and one write of the
solution — everything else is VPU elementwise work on VMEM plus one
(n, n)-by-(n, Cb) MXU matmul per iteration for the shared preconditioner.

Semantics are EXACTLY those of ``_chunk_pcg_raw`` (same per-column
breakdown guards, converged-column freeze, best-iterate tracking, stall
counter, lockstep max-relative-residual stop), so iteration counts and
returned iterates match the XLA path bit-for-bit up to matmul
reassociation; the energy clamp and the implicit-diff wrapper stay outside
(micro/engine.py::_solve_linear).

Replaces: the innermost KSP iteration of the reference's per-cell PETSc
solves (reference ``hmm.py:420-426``); no counterpart structure exists in
the reference — this is the TPU-native formulation of that hot loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil_pcg_pallas", "pallas_pcg_available"]

# VMEM working-set budget (bytes) used to pick the cell-block width Cb.
# We raise the Mosaic scoped-vmem limit to 64 MB (v5e has 128 MB/core) and
# budget half of it: inputs are double-buffered by the pipeline, the while
# loop carries 6 Krylov arrays, and matvec/prec keep several (s, n, Cb)
# temporaries live — measured usage is ~2x the naive estimate, hence the
# conservative multiplier in _block_width.
_VMEM_LIMIT = 64 * 2**20
_VMEM_BUDGET = 32 * 2**20
_LANES = 128


def pallas_pcg_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _roll_neg(x, o: int, axis: int):
    """roll(x, -o, axis) for static 0 <= o < size via two static slices."""
    if o == 0:
        return x
    sl_hi = [slice(None)] * x.ndim
    sl_lo = [slice(None)] * x.ndim
    sl_hi[axis] = slice(o, None)
    sl_lo[axis] = slice(0, o)
    return jnp.concatenate([x[tuple(sl_hi)], x[tuple(sl_lo)]], axis=axis)


def _block_width(n: int, K: int, s: int, C: int) -> int:
    """Largest lane-aligned Cb whose working set fits the VMEM budget.

    The naive per-column count (double-buffered in/out blocks + 6 Krylov
    carries) undercounts Mosaic's stack by ~2.2x (matvec roll/term
    temporaries, prec matmul staging) — measured 17.5 MB vs 7.9 MB estimated
    on the 3D K=15 stencil — so apply a 2.5x safety multiplier."""
    per_col = (2 * (K + s + s) * n + 6 * s * n) * 4  # dbuf in/out + carries
    per_col = (per_col * 5) // 2
    cb = max(_LANES, (_VMEM_BUDGET - 2 * n * n * 4) // max(per_col, 1))
    cb = (cb // _LANES) * _LANES
    return int(min(cb, max(_LANES, (C // _LANES) * _LANES), C))


def _pcg_kernel(
    ws_ref, F_ref, Minv_ref, X_ref, it_ref, *,
    shape: Tuple[int, ...], offsets, s: int, tol: float, maxiter: int,
):
    dim = len(shape)
    n = int(np.prod(shape))
    Cb = F_ref.shape[-1]
    dtype = F_ref.dtype
    grid_axes = tuple(range(1, 1 + dim))  # state layout: (s, *shape, Cb)

    ws = [ws_ref[k].reshape(*shape, Cb) for k in range(len(offsets))]
    F = F_ref[:].reshape(s, *shape, Cb)
    Minv = Minv_ref[:]

    def matvec(P):
        out = None
        for k, off in enumerate(offsets):
            x = P
            for ax, o in enumerate(off):
                x = _roll_neg(x, int(o), 1 + ax)
            term = ws[k][None] * x
            out = term if out is None else out + term
        return out

    def prec(R):
        Rf = R.reshape(s, n, Cb)
        zs = [
            jax.lax.dot(
                Minv, Rf[i], precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dtype,
            )
            for i in range(s)
        ]
        return jnp.stack(zs, axis=0).reshape(s, *shape, Cb)

    def colsum(x):  # (s, *shape, Cb) -> (s, Cb)
        return jnp.sum(x, axis=grid_axes)

    # x64 may be enabled globally: keep EVERY scalar in the working dtype
    # (a Python-float comparison would promote to f64, which Mosaic cannot
    # squeeze to a scalar register)
    eps = jnp.asarray(1e-30, dtype=dtype)
    tolv = jnp.asarray(tol, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)
    one = jnp.asarray(1.0, dtype=dtype)
    shrink = jnp.asarray(1.0 - 1e-4, dtype=dtype)
    zero_i = jnp.asarray(0, jnp.int32)
    one_i = jnp.asarray(1, jnp.int32)
    maxiter_i = jnp.asarray(maxiter, jnp.int32)
    stall_cap = jnp.asarray(60, jnp.int32)
    X = prec(F)
    R = F - matvec(X)
    Z = prec(R)
    P = Z
    rz = colsum(R * Z)
    fnorm = jnp.sqrt(colsum(F * F)) + eps
    rel0 = jnp.sqrt(colsum(R * R)) / fnorm

    def cond(state):
        X, R, P, rz, k, bX, brel, stall = state
        rel = jnp.max(jnp.sqrt(colsum(R * R)) / fnorm)
        return (rel > tolv) & (k < maxiter_i) & (stall < stall_cap)

    def body(state):
        X, R, P, rz, k, bX, brel, stall = state
        KP = matvec(P)
        pkp = colsum(P * KP)
        ok = (pkp > zero) & jnp.isfinite(pkp) & jnp.isfinite(rz) & (brel >= tolv)
        alpha = jnp.where(ok, rz / jnp.where(ok, pkp, one), zero)
        bc = (slice(None),) + (None,) * dim + (slice(None),)
        X = X + P * alpha[bc]
        R = R - KP * alpha[bc]
        Z = prec(R)
        rz_new = colsum(R * Z)
        beta = jnp.where(rz > zero, rz_new / jnp.where(rz > zero, rz, one), zero)
        P = Z + P * beta[bc]
        rel = jnp.sqrt(colsum(R * R)) / fnorm
        improved = (rel < brel * shrink) & jnp.isfinite(rel)
        bX = jnp.where(improved[bc], X, bX)
        brel = jnp.where(improved, jnp.minimum(rel, brel), brel)
        # NOT jnp.any / Python ints: under x64 those create 64-bit
        # scalars, which Mosaic cannot lower — reduce and count in int32
        any_improved = jnp.max(improved.astype(jnp.int32)) > zero_i
        stall = jnp.where(any_improved, zero_i, stall + one_i)
        return X, R, P, rz_new, k + one_i, bX, brel, stall

    state = (X, R, P, rz, jnp.asarray(0, jnp.int32), X, rel0,
             jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    X_ref[:] = out[5].reshape(s, n, Cb)
    it_ref[pl.program_id(0), 0] = out[4]


def stencil_pcg_pallas(ws, F, Minv, shape, offsets, tol, maxiter,
                       interpret=None):
    """Solve the (pre-scaled) stencil systems K X = F for a whole chunk.

    Args:
        ws: list of K (n, C) weight arrays (scaling already folded in).
        F: (n, s, C) right-hand sides (scaled).
        Minv: (n, n) shared dense preconditioner.
        shape: torus grid dims (prod = n).
        offsets: (K, dim) static periodic offsets.
        tol, maxiter: as in ``_chunk_pcg_raw``.
        interpret: run the Pallas interpreter (defaults to True off-TPU,
            same convention as ops/dia.py — lets CPU tests cover the kernel).

    Returns (bX (n, s, C) best iterate — UNCLAMPED, iterations int32).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n, s, C = F.shape
    K = len(ws)
    Cb = _block_width(n, K, s, C)
    pad = (-C) % Cb
    Wk = jnp.stack(ws, axis=0)  # (K, n, C)
    Ff = jnp.moveaxis(F, 1, 0)  # (s, n, C)
    if pad:
        # padded columns solve a unit-weight system with zero RHS: X = 0
        # from the first prec apply, and cannot affect the lockstep stop
        # (their relative residual is 0/eps = 0)
        Wk = jnp.pad(Wk, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
        Ff = jnp.pad(Ff, ((0, 0), (0, 0), (0, pad)))
    nblk = (C + pad) // Cb

    kern = functools.partial(
        _pcg_kernel,
        shape=tuple(int(x) for x in shape),
        offsets=tuple(tuple(int(o) for o in off) for off in offsets),
        s=s, tol=float(tol), maxiter=int(maxiter),
    )
    # index-map literals must be i32: under jax_enable_x64 a bare Python 0
    # traces as i64, which Mosaic cannot legalize (same fix as ops/dia.py)
    z = np.int32(0)
    X, its = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((K, n, Cb), lambda i: (z, z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, n, Cb), lambda i: (z, z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (z, z), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s, n, Cb), lambda i: (z, z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 1), lambda i: (z, z),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, n, C + pad), F.dtype),
            jax.ShapeDtypeStruct((nblk, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(Wk, Ff, Minv)
    bX = jnp.moveaxis(X, 0, 1)[:, :, :C]  # (n, s, C)
    return bX, jnp.max(its)
