#!/usr/bin/env python
"""A/B: panel-substitution solves vs explicit-inverse matmul solves.

The round-4 phase profile put the elasticity direct route's SOLVE phase
(2 blocked substitution solves + refinement matvec) at ~33 ms on the
4320-cell rotated-fiber batch — bigger than the factorization itself
(~10 ms).  The substitutions run ~60 skinny (C,32,32)x(C,32,6) batched
matmuls in a sequential chain; forming L**-1 (block substitution against
the identity: 192-wide, MXU-shaped) or K**-1 = L**-T L**-1 once turns
every solve into ONE skinny matmul.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/chol_solve_inverse.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from hommx_tpu.ops.batched_chol import (
    _pad_spd,
    blocked_cho_solve,
    blocked_cholesky,
)


def blocked_linv(panels, dinvs, nb):
    """Explicit L^-1 (C, n, n) from the blocked factorization: block
    forward substitution against the identity, full row-width."""
    npan = len(dinvs)
    n = npan * nb
    C = dinvs[0].shape[0]
    eye = jnp.eye(n, dtype=dinvs[0].dtype)
    rows = []
    for p in range(npan):
        rhs = jnp.broadcast_to(eye[p * nb:(p + 1) * nb], (C, nb, n))
        for k in range(p):
            Lpk = panels[k][:, (p - k) * nb:(p - k + 1) * nb, :]
            rhs = rhs - jnp.einsum("cij,cjn->cin", Lpk, rows[k])
        rows.append(jnp.einsum("cij,cjn->cin", dinvs[p], rhs))
    return jnp.concatenate(rows, axis=1)


def main():
    C, n, s, nb = 4320, 192, 6, 32
    rng = np.random.default_rng(0)
    dtype = jnp.float32

    def timed(label, jfn, inputs, reps=3):
        out = jfn(inputs[0])
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            out = jfn(inputs[1 + i])
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            ts.append(time.perf_counter() - t0)
        print(f"{label:24s} med {1e3 * np.median(ts):7.1f} ms")
        return out

    def mk():
        G = rng.standard_normal((C, n, n)).astype(np.float32)
        K = np.einsum("cik,cjk->cij", G, G) + 10 * np.eye(n, dtype=np.float32)
        F = rng.standard_normal((n, s, C)).astype(np.float32)
        return jnp.asarray(K), jnp.asarray(F)

    inputs = [mk() for _ in range(4)]

    with jax.default_matmul_precision("highest"):
        def route_subst(args):
            K, F = args
            panels, dinvs = blocked_cholesky(K, nb)

            def solve(B):  # (n,s,C) -> (n,s,C)
                Bs = jnp.transpose(B, (2, 0, 1))
                Y = blocked_cho_solve(panels, dinvs, Bs, nb)
                return jnp.transpose(Y, (1, 2, 0))

            X = solve(F)
            R = F - jnp.einsum("cnm,msc->nsc", K, X)
            return X + solve(R)

        def route_linv(args):
            K, F = args
            panels, dinvs = blocked_cholesky(K, nb)
            W = blocked_linv(panels, dinvs, nb)  # (C, n, n) = L^-1

            def solve(B):
                Y = jnp.einsum("ckn,ksc->csc"[0:4] + ",ksc->csc", W, B) \
                    if False else jnp.einsum("ckn,ksc->nsc",
                                             jnp.swapaxes(W, 1, 2), B)
                return Y

            def solve2(B):
                Y1 = jnp.einsum("ckm,msc->ksc", W, B)       # L^-1 B
                return jnp.einsum("ckn,ksc->nsc", W, Y1)    # L^-T (.)

            X = solve2(F)
            R = F - jnp.einsum("cnm,msc->nsc", K, X)
            return X + solve2(R)

        def route_kinv(args):
            K, F = args
            panels, dinvs = blocked_cholesky(K, nb)
            W = blocked_linv(panels, dinvs, nb)
            Kinv = jnp.einsum("ckn,ckm->cnm", W, W)  # L^-T L^-1

            def solve(B):
                return jnp.einsum("cnm,msc->nsc", Kinv, B)

            X = solve(F)
            R = F - jnp.einsum("cnm,msc->nsc", K, X)
            return X + solve(R)

        j_sub = jax.jit(route_subst)
        j_linv = jax.jit(route_linv)
        j_kinv = jax.jit(route_kinv)
        x0 = timed("factor+subst (current)", j_sub, inputs)
        x1 = timed("factor+Linv matmuls", j_linv, inputs)
        x2 = timed("factor+Kinv matmul", j_kinv, inputs)
        r1 = float(jnp.max(jnp.abs(x1 - x0)) / jnp.max(jnp.abs(x0)))
        r2 = float(jnp.max(jnp.abs(x2 - x0)) / jnp.max(jnp.abs(x0)))
        print(f"Linv vs subst rel: {r1:.2e};  Kinv vs subst rel: {r2:.2e}")

        # isolate: factorization alone
        def fac_only(args):
            K, _ = args
            return blocked_cholesky(K, nb)[0][-1]
        timed("factor only", jax.jit(fac_only), inputs)


if __name__ == "__main__":
    main()
