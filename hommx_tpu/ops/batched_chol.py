"""Hand-blocked batched Cholesky for the elasticity cell-problem batch.

XLA's batched ``cho_factor``/``cho_solve`` on TPU runs the panel recursion
with small intra-batch ops and leaves the MXU idle: measured 269 ms on the
(4320, 192, 192) rotated-fiber batch (~57 GFLOP/s effective).  This module
implements the same blocked right-looking factorization with the panel
loop unrolled in Python (n/nb static panels), so all the heavy work — the
panel solve and the Schur update — is batch-major batched matmuls that XLA
maps straight onto the MXU: 67 ms on the same batch at ``highest`` matmul
precision, solution agreeing with the XLA path to 8.7e-7
(benchmarks/batched_chol_kernel.py).

This replaces the innermost solver of the reference's per-cell PETSc KSP
round trips (reference ``hmm.py:420-426``) on the TPU f32 elasticity path;
the f64/CPU parity paths keep LAPACK-backed ``cho_factor``.

Everything here is plain jnp primitives, so the factorization is natively
differentiable by tracing (like the cho_factor path it replaces).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "blocked_cholesky",
    "blocked_cho_solve",
    "blocked_solve_spd",
    "scan_blocked_cholesky",
    "scan_blocked_solve",
]


def _pad_spd(K, B, nb):
    """Pad the system to a block-size multiple with decoupled identity
    rows (zero RHS), preserving SPD-ness and the solution."""
    n = K.shape[1]
    n_pad = (-n) % nb
    if n_pad == 0:
        return K, B, n
    C = K.shape[0]
    Kp = jnp.zeros((C, n + n_pad, n + n_pad), K.dtype)
    Kp = Kp.at[:, :n, :n].set(K)
    Kp = Kp.at[:, n:, n:].set(
        jnp.broadcast_to(jnp.eye(n_pad, dtype=K.dtype), (C, n_pad, n_pad))
    )
    Bp = jnp.zeros((C, n + n_pad, B.shape[2]), B.dtype)
    Bp = Bp.at[:, :n, :].set(B)
    return Kp, Bp, n


def blocked_cholesky(K, nb=32):
    """Batched lower-Cholesky of SPD ``K`` (C, n, n), ``n % nb == 0``.

    Returns ``(panels, dinvs)``: per panel p the (C, n - p·nb, nb) column
    block of L, and the inverted (C, nb, nb) diagonal blocks (reused by
    the triangular solves — applying ``Lpp⁻¹`` as a matmul replaces the
    latency-bound substitution sweeps of ``cho_solve``).

    The diagonal-block factorization and inversion are the only sequential
    scalar recursions (nb static steps each, elementwise over the batch);
    pivots are clamped at 1e-30 so a non-SPD block yields large-but-finite
    factors rather than NaN (the engine's refinement/energy guards handle
    the fallout, matching the cho_factor path's behavior).
    """
    C, n, _ = K.shape
    assert n % nb == 0, "pad the system first (_pad_spd)"
    npan = n // nb
    Kw = K
    panels = []
    dinvs = []
    for p in range(npan):
        a, b = p * nb, (p + 1) * nb
        A = Kw[:, a:b, a:b]
        # unblocked Cholesky of the diagonal block: nb rank-1 updates
        cols = []
        for j in range(nb):
            piv = jnp.sqrt(jnp.maximum(A[:, j, j], 1e-30))
            col = A[:, :, j] / piv[:, None]
            col = col.at[:, :j].set(0.0)
            cols.append(col)
            A = A - col[:, :, None] * col[:, None, :]
        Lpp = jnp.stack(cols, axis=-1)  # (C, nb, nb) lower
        # row-wise forward substitution for Lpp^{-1}: nb static steps
        rows = []
        eye = jnp.eye(nb, dtype=K.dtype)
        for i in range(nb):
            r = jnp.broadcast_to(eye[i], (C, nb))
            if i:
                acc = sum(
                    Lpp[:, i, k][:, None] * rows[k] for k in range(i)
                )
                r = r - acc
            rows.append(r / Lpp[:, i, i][:, None])
        Dinv = jnp.stack(rows, axis=1)  # (C, nb, nb) = Lpp^{-1}
        dinvs.append(Dinv)
        if b < n:
            # panel solve + Schur update: the MXU work
            Lp_off = jnp.einsum("cik,cjk->cij", Kw[:, b:, a:b], Dinv)
            Kw = Kw.at[:, b:, b:].add(
                -jnp.einsum("cik,cjk->cij", Lp_off, Lp_off)
            )
            panels.append(jnp.concatenate([Lpp, Lp_off], axis=1))
        else:
            panels.append(Lpp)
    return panels, dinvs


def blocked_cho_solve(panels, dinvs, B, nb=32):
    """Solve ``L Lᵀ X = B`` for ``B`` (C, n, s) from ``blocked_cholesky``.

    Both substitution phases are static npan-step block recursions of
    batched matmuls (off-diagonal apply + ``Lpp⁻¹`` matmul)."""
    C, n, s = B.shape
    npan = n // nb
    ys = []
    for p in range(npan):
        a = p * nb
        rhs = B[:, a:a + nb, :]
        for q in range(p):
            off = (p - q) * nb
            Lblk = panels[q][:, off:off + nb, :]
            rhs = rhs - jnp.einsum("cij,cjs->cis", Lblk, ys[q])
        ys.append(jnp.einsum("cij,cjs->cis", dinvs[p], rhs))
    xs = [None] * npan
    for p in reversed(range(npan)):
        rhs = ys[p]
        for q in range(p + 1, npan):
            off = (q - p) * nb
            Lblk = panels[p][:, off:off + nb, :]  # block L[q, p]
            rhs = rhs - jnp.einsum("cji,cjs->cis", Lblk, xs[q])
        xs[p] = jnp.einsum("cji,cjs->cis", dinvs[p], rhs)
    return jnp.concatenate(xs, axis=1)


def blocked_solve_spd(K, B, nb=32):
    """Batched SPD solve ``K X = B`` (K (C, n, n), B (C, n, s)) via the
    blocked factorization; pads to a block multiple internally."""
    Kp, Bp, n = _pad_spd(K, B, nb)
    panels, dinvs = blocked_cholesky(Kp, nb)
    X = blocked_cho_solve(panels, dinvs, Bp, nb)
    return X[:, :n, :]


# ---------------------------------------------------------------------------
# Single large matrix: fixed-shape scan-blocked factorization
#
# The batched kernels above unroll the panel loop in Python, which is fine
# for many small cell systems (n ≈ 200, 6 panels) but would compile ~100
# unrolled panels for one macro-sized matrix (n ≈ 3-4k).  Here the panel
# loop is a lax.scan with FIXED shapes instead: the carry is the full
# working matrix, each step consumes one (n, nb) column panel located by
# dynamic_slice, and the Schur update is a full-width rank-nb matmul with
# the already-factored rows masked to zero.  The update does ~3× the
# minimal flops (n²·nb per panel instead of the shrinking trailing block),
# but every flop is an MXU matmul — on TPU that beats XLA's CholeskyExpander,
# whose per-panel unblocked recursions and triangular solves are
# latency-bound.  Used by ops/solvers.py::_mixed_refine_ell as the
# 'scan' factorization backend for the f32 macro factorization.
# ---------------------------------------------------------------------------


def _factor_block_inv(D, dtype_eps=1e-30):
    """Unblocked Cholesky L and explicit inverse L⁻¹ of one SPD (nb, nb)
    block; nb static, both recursions unrolled (nb rank-1 update steps +
    nb substitution rows, each a vector op)."""
    nb = D.shape[0]
    cols = []
    for j in range(nb):
        piv = jnp.sqrt(jnp.maximum(D[j, j], dtype_eps))
        col = D[:, j] / piv
        col = col.at[:j].set(0.0)
        cols.append(col)
        D = D - col[:, None] * col[None, :]
    L = jnp.stack(cols, axis=-1)
    eye = jnp.eye(nb, dtype=L.dtype)
    rows = []
    for i in range(nb):
        r = eye[i]
        if i:
            r = r - L[i, :i] @ jnp.stack(rows)
        rows.append(r / L[i, i])
    Linv = jnp.stack(rows, axis=0)
    return L, Linv


def scan_blocked_cholesky(A, nb=64):
    """Lower-Cholesky of one SPD ``A`` (n, n) as a fixed-shape lax.scan.

    ``n % nb == 0`` (pad with decoupled identity rows upstream).  Returns
    ``(panels, dinvs)``: panels (npan, n, nb) holds the column panels of L
    (rows above each panel's diagonal block zeroed), dinvs (npan, nb, nb)
    the inverted diagonal blocks — the same layout the batched kernels
    use, applied by :func:`scan_blocked_solve` as matmuls instead of
    latency-bound substitution sweeps."""
    n = A.shape[0]
    assert n % nb == 0, "pad the system first"
    npan = n // nb
    idx = jnp.arange(n)

    def step(W, p):
        j = p * nb
        C = jax.lax.dynamic_slice(W, (0, j), (n, nb))
        D = jax.lax.dynamic_slice(W, (j, j), (nb, nb))
        _, Linv = _factor_block_inv(D)
        Lcol = C @ Linv.T  # rows [j, j+nb) give D·L⁻ᵀ = L_pp exactly
        Lcol = jnp.where(idx[:, None] >= j, Lcol, jnp.zeros_like(Lcol))
        W = W - Lcol @ Lcol.T
        return W, (Lcol, Linv)

    _, (panels, dinvs) = jax.lax.scan(step, A, jnp.arange(npan))
    return panels, dinvs


def scan_blocked_solve(panels, dinvs, B):
    """Solve ``L Lᵀ X = B`` (B (n, s)) from :func:`scan_blocked_cholesky`.

    Both substitution phases are scans whose per-step work is one (nb, s)
    diagonal-inverse matmul plus one full-width accumulator matmul; the
    backward phase reads row-slices across the stacked panels (the
    transposed blocks) with one dynamic_slice."""
    npan, n, nb = panels.shape
    s = B.shape[1]

    def fwd(ACC, inp):
        panel, dinv, p = inp
        j = p * nb
        rhs = jax.lax.dynamic_slice(ACC, (j, 0), (nb, s))
        y = dinv @ rhs
        # rows [j, j+nb) zero out; rows below accumulate the L21·y term
        ACC = ACC - panel @ y
        return ACC, y

    _, ys = jax.lax.scan(fwd, B, (panels, dinvs, jnp.arange(npan)))
    Y = ys.reshape(n, s)

    def bwd(ACC, inp):
        dinv, p = inp
        j = p * nb
        rhs = jax.lax.dynamic_slice(ACC, (j, 0), (nb, s))
        x = dinv.T @ rhs
        # subtract (L[p, q])ᵀ x from every earlier block q < p: the row
        # slice panels[:, j:j+nb, :] is L[p, q] for all q (zero for q > p)
        rows_p = jax.lax.dynamic_slice(panels, (0, j, 0), (npan, nb, nb))
        contrib = jnp.einsum("qij,is->qjs", rows_p, x).reshape(n, s)
        ACC = ACC - contrib
        return ACC, x

    _, xs = jax.lax.scan(
        bwd, Y, (dinvs, jnp.arange(npan)), reverse=True
    )
    return xs.reshape(n, s)
