#!/usr/bin/env python
"""Microbenchmark: XLA's batched Cholesky vs a hand-blocked batched
factorization on the elasticity cell-problem shape (C=4320, n=192, s=6).

Hypothesis: XLA's cho_factor/cho_solve on TPU run the panel recursion with
small intra-batch ops and leave the MXU idle (~57 GFLOP/s measured on the
rotated-fiber micro stage).  A blocked right-looking Cholesky with the
panel loop UNROLLED in Python (n/nb = 6 static panels) does all heavy work
— panel solve and Schur update — as batch-major batched matmuls, which XLA
maps straight onto the MXU.

The candidate factorization below is what `micro/engine.py` would adopt if
it wins; the accuracy gate compares against the XLA path on the same data.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if "--highest" in sys.argv:
    jax.config.update("jax_default_matmul_precision", "highest")


def blocked_chol(K, nb=32):
    """Batched lower-Cholesky of SPD K (C, n, n), n % nb == 0.

    Returns (L, Linv_diag) where L is the lower factor and Linv_diag the
    list of inverted diagonal blocks (reused by the solve).  All panel
    arithmetic is batched matmuls; the only sequential scalar work is the
    nb-step factorization/inversion of the (C, nb, nb) diagonal blocks.
    """
    C, n, _ = K.shape
    npan = n // nb
    Kw = K
    L_panels = []   # per panel: (C, n - p*nb, nb) column block of L
    Dinvs = []

    for p in range(npan):
        a, b = p * nb, (p + 1) * nb
        Kpp = Kw[:, a:b, a:b]
        # unblocked Cholesky of the (C, nb, nb) diagonal block: nb static
        # steps, each elementwise over the batch
        Lpp = jnp.zeros_like(Kpp)
        A = Kpp
        cols = []
        for j in range(nb):
            pivot = jnp.sqrt(jnp.maximum(A[:, j, j], 1e-30))  # (C,)
            col = A[:, :, j] / pivot[:, None]                  # (C, nb)
            col = col.at[:, :j].set(0.0)
            cols.append(col)
            A = A - col[:, :, None] * col[:, None, :]
        Lpp = jnp.stack(cols, axis=-1)  # (C, nb, nb) lower
        # forward-substitution inverse of Lpp: nb static steps
        inv_cols = []
        eye = jnp.eye(nb, dtype=K.dtype)
        for j in range(nb):
            e = jnp.broadcast_to(eye[:, j], (C, nb))
            x = jnp.zeros((C, nb), K.dtype)
            # solve Lpp x = e_j by forward substitution (rows j..nb-1)
            for i in range(j, nb):
                s = e[:, i] - jnp.einsum("ck,ck->c", Lpp[:, i, :i], x[:, :i]) \
                    if i else e[:, i]
                x = x.at[:, i].set(s / Lpp[:, i, i])
            inv_cols.append(x)
        Dinv = jnp.stack(inv_cols, axis=-1)  # (C, nb, nb) = Lpp^{-1}
        Dinvs.append(Dinv)
        if b < n:
            # panel solve: Lp = K[b:, a:b] @ Dinv^T   (batched matmul)
            Lp_off = jnp.einsum("cik,cjk->cij", Kw[:, b:, a:b], Dinv)
            # Schur update: K[b:, b:] -= Lp_off @ Lp_off^T
            Kw = Kw.at[:, b:, b:].add(
                -jnp.einsum("cik,cjk->cij", Lp_off, Lp_off)
            )
            L_panels.append(jnp.concatenate([Lpp, Lp_off], axis=1))
        else:
            L_panels.append(Lpp)
    return L_panels, Dinvs


def blocked_solve(L_panels, Dinvs, B, nb=32):
    """Solve L L^T X = B for B (C, n, s) given blocked_chol output."""
    C, n, s = B.shape
    npan = n // nb
    # forward: L Y = B
    Ys = []
    for p in range(npan):
        a = p * nb
        rhs = B[:, a:a + nb, :]
        for q in range(p):
            # L block (p, q) lives in L_panels[q] rows (p-q)*nb:...
            off = (p - q) * nb
            Lblk = L_panels[q][:, off:off + nb, :]
            rhs = rhs - jnp.einsum("cij,cjs->cis", Lblk, Ys[q])
        Ys.append(jnp.einsum("cij,cjs->cis", Dinvs[p], rhs))
    # backward: L^T X = Y
    Xs = [None] * npan
    for p in reversed(range(npan)):
        rhs = Ys[p]
        for q in range(p + 1, npan):
            off = (q - p) * nb
            Lblk = L_panels[p][:, off:off + nb, :]  # = L[q-block, p-block]
            rhs = rhs - jnp.einsum("cji,cjs->cis", Lblk, Xs[q])
        Xs[p] = jnp.einsum("cji,cjs->cis", Dinvs[p], rhs)
    return jnp.concatenate(Xs, axis=1)


def main():
    C, n, s = 4320, 192, 6
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    def make_K(seed):
        r = np.random.default_rng(seed)
        G = r.standard_normal((C, n, n)).astype(np.float32)
        K = np.einsum("cik,cjk->cij", G, G) / n + np.eye(n, dtype=np.float32)
        return jnp.asarray(K, dtype)

    B = jnp.asarray(rng.standard_normal((C, n, s)), dtype)

    def timeit(fn, label, *args, reps=3):
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(*args)))
            ts.append(time.perf_counter() - t0)
        print(f"{label:38s} {np.median(ts)*1e3:8.1f} ms  reps="
              + ",".join(f"{t*1e3:.0f}" for t in ts))
        return out

    K = make_K(1)

    @jax.jit
    def xla_chol_solve(K, B):
        cf = jax.scipy.linalg.cho_factor(K)
        return jax.scipy.linalg.cho_solve(cf, B)

    @jax.jit
    def xla_chol_only(K):
        return jnp.linalg.cholesky(K)

    @jax.jit
    def hand_chol_solve(K, B):
        Lp, Di = blocked_chol(K)
        return blocked_solve(Lp, Di, B)

    @jax.jit
    def hand_chol_only(K):
        Lp, Di = blocked_chol(K)
        return Lp[0]

    X0 = timeit(xla_chol_solve, "XLA cho_factor+cho_solve", K, B)
    timeit(xla_chol_only, "XLA cholesky only", K)
    X1 = timeit(hand_chol_solve, "hand-blocked factor+solve", K, B)
    timeit(hand_chol_only, "hand-blocked factor only", K)

    rel = float(jnp.max(jnp.abs(X1 - X0)) / jnp.max(jnp.abs(X0)))
    print(f"hand vs XLA solution rel diff: {rel:.2e}")


if __name__ == "__main__":
    main()
