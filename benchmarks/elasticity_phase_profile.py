#!/usr/bin/env python
"""Phase-level profile of the elasticity chunk-Cholesky micro stage.

Times each phase of ``MicroEngine.tensors_chunk_pcg`` (cholesky route) as
its own warm jitted call on fresh inputs, so the ~25-30 ms tunnel
dispatch floor per call can be subtracted when reading the numbers:

  1. coeff     — vmapped ``_raw_coeff`` (Hooke tensor at nE*r quad points)
  2. A_K       — the T^T Ae T strain-map einsum
  3. blocks+Kc — element blocks einsum + scatter assembly of (C, n, n)
  4. factor    — equilibration + blocked batched Cholesky
  5. solve     — 2x blocked solves (s RHS) + refinement matvec
  6. astar     — Phi^T Abar Phi contraction
  7. full      — the production ``tensors_for_centers`` call (reference)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/elasticity_phase_profile.py
(append — overwriting PYTHONPATH unregisters the axon plugin)
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(label, jfn, inputs, reps=3):
    out = jfn(inputs[0])
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = jfn(inputs[1 + i])
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{label:12s} med {1e3 * np.median(ts):7.1f} ms  min {1e3 * min(ts):7.1f}")
    return out


def main():
    from hommx_tpu import create_unit_cube
    from hommx_tpu.micro.engine import MicroEngine, _sym_map
    from hommx_tpu.utils.validation import hooke_tensor

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64

    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(
        circle(y[1], y[2]), 100.0 * (1.0 + 0.001 * x[0]), 0.001
    )
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)
    W = 0.4

    def G_fn(x):
        gamma = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(gamma), jnp.sin(gamma)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    micro = create_unit_cube(4)
    eng = MicroEngine(micro, bs=3, coeff_kind="tensor4", quad_degree=2,
                      dtype=dtype, solver="cholesky")
    C = 4320
    nE, r, s, n = eng.nE, eng.r, eng.s, eng.n_reduced
    print(f"C={C} nE={nE} r={r} s={s} n={n} nbl={eng.loc2red.shape[1]}")

    rng = np.random.default_rng(0)
    reps = 3
    centers = [
        jnp.asarray(rng.uniform(0, 1, (C, 3)), dtype=dtype)
        for _ in range(reps + 1)
    ]

    # phase 1: coefficient eval
    coeff_fn = jax.jit(
        lambda c: jax.vmap(lambda x: eng._raw_coeff(A_el, x))(c)
    )
    raw0 = timed("coeff", coeff_fn, centers)

    # phase 2: strain-map einsum (the OLD A_K route, kept for reference)
    def ak_fn(c):
        Ae = jax.vmap(lambda x: eng._raw_coeff(A_el, x))(c)
        G = jax.vmap(lambda x: jnp.asarray(G_fn(x), dtype=dtype))(c)
        T = jax.vmap(_sym_map)(G)
        return jnp.einsum("cmr,cemt,ctn->cern", T, Ae, T)
    ak_j = jax.jit(ak_fn)
    timed("coeff+A_K", ak_j, centers)

    # phase 3: Kron-map Kc assembly (the production route since the Kron
    # fast path landed — A_K never materialized)
    def kc_fn(c):
        Ae = jax.vmap(lambda x: eng._raw_coeff(A_el, x))(c)
        G = jax.vmap(lambda x: jnp.asarray(G_fn(x), dtype=dtype))(c)
        T = jax.vmap(_sym_map)(G)
        TkT = jnp.einsum("cmr,ctn->cmtrn", T, T).reshape(C, r * r, r * r)
        AKv = jnp.einsum("cex,cxy->cey", Ae.reshape(C, nE, r * r), TkT)
        blocks_flat = jnp.einsum(
            "cex,exy->cey", AKv, eng._get_kron_M()
        ).reshape(C, -1)
        rows = eng.loc2red[:, :, None]
        cols = eng.loc2red[:, None, :]
        flat = jnp.asarray((rows * n + cols).reshape(-1))
        Kc = jnp.zeros((C, n * n), dtype=dtype)
        Kc = Kc.at[:, flat].add(blocks_flat)
        keepn = jnp.logical_not(eng.pin_mask).astype(dtype)
        pinn = eng.pin_mask.astype(dtype)
        return Kc.reshape(C, n, n) * keepn[None, :, None] * keepn[
            None, None, :
        ] + jnp.diag(pinn)[None]
    kc_j = jax.jit(kc_fn)
    Kc0 = timed("coeff+KcKron", kc_j, centers)

    # phase 4: factor only (fresh Kc input so nothing folds)
    from hommx_tpu.ops.batched_chol import (
        _pad_spd, blocked_cho_solve, blocked_cholesky,
    )
    Kcs = [jnp.asarray(np.asarray(Kc0) * (1.0 + 1e-4 * i)) for i in range(reps + 1)]

    def factor_fn(Kc):
        dp = jnp.einsum("cnn->nc", Kc)
        d0p = eng._K0diag
        bad = eng.pin_mask[:, None] | (dp <= 0) | ~jnp.isfinite(dp)
        sc = jnp.where(
            bad, 1.0, jnp.sqrt(d0p[:, None] / jnp.where(bad, 1.0, dp))
        ).astype(dtype)
        scm = sc.T
        Ks = Kc * scm[:, :, None] * scm[:, None, :]
        Ksp, _, n_orig = _pad_spd(Ks, Ks[:, :, :1], 32)
        panels, dinvs = blocked_cholesky(Ksp, 32)
        return panels[0]
    eng._get_K0inv()
    timed("factor", jax.jit(factor_fn), Kcs)

    # phase 5: factor + solves + refinement (= _chol_chunk_solve)
    def solve_fn(Kc):
        F = jnp.ones((n, s, C), dtype=dtype)
        return eng._chol_chunk_solve(Kc, F)
    timed("factor+solve", jax.jit(solve_fn), Kcs)

    # phase 5b: RHS build F = -Σ_e D_eᵀ (Tᵀ Ā_e) E
    D2 = eng.D.reshape(nE * r, n)
    keep = jnp.logical_not(eng.pin_mask).astype(dtype)[:, None, None]

    def rhs_fn(c):
        A_F = ak_fn(c)  # same shape/cost class as the true Tᵀ Ā_e product
        AE = jnp.einsum("cert,ts->ersc", A_F, eng.E)
        return -(D2.T @ AE.reshape(nE * r, s * C)).reshape(n, s, C) * keep
    timed("coeff+rhs", jax.jit(rhs_fn), centers)

    # phase 6: bilinear-expansion A* from a fresh iterate X (n, s, C)
    # (the production contraction: ΦᵀĀΦ = EᵀĀE − FᵀX − XᵀF + XᵀKcX)
    Xs = [jnp.asarray(rng.standard_normal((n, s, C)), dtype=dtype)
          for _ in range(reps + 1)]
    F0 = jnp.ones((n, s, C), dtype=dtype)

    def astar_fn(X):
        c = centers[0]
        Ae = jax.vmap(lambda x: eng._raw_coeff(A_el, x))(c)
        Kc = kc_fn(c)
        KX = jnp.einsum("cnm,msc->nsc", Kc, X)
        XtF = jnp.einsum("nsc,nmc->csm", X, F0)
        XtKX = jnp.einsum("nsc,nmc->csm", X, KX)
        Abar = jnp.sum(Ae, axis=1)
        term1 = jnp.einsum("rs,crt,tm->csm", eng.E, Abar, eng.E)
        return (
            term1 - XtF - jnp.swapaxes(XtF, 1, 2) + XtKX
        ) / eng.volume_Y
    timed("astar(+Kc)", jax.jit(astar_fn), Xs)

    # phase 7: the full production call at one chunk
    full = jax.jit(
        lambda c: eng.tensors_for_centers(A_el, c, G_fn=G_fn, chunk=C)
    )
    timed("full(1chunk)", full, centers)
    full_auto = jax.jit(
        lambda c: eng.tensors_for_centers(A_el, c, G_fn=G_fn)
    )
    timed("full(auto)", full_auto, centers)


if __name__ == "__main__":
    main()
