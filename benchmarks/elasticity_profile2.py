#!/usr/bin/env python
"""Phase-by-phase cost split of the elasticity per-cell densek micro path.

Round-3 follow-up to elasticity_profile.py, which showed the PCG iterations
are ~free (maxiter=1 ≈ full time) — the per-cell setup dominates.  This
times each phase as its own jit on device-resident inputs.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(tag, jfn, *args, reps=3):
    out = jfn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(jnp.abs(first[:1].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _i in range(reps):
        out = jfn(*args)
        first = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(jnp.abs(first[:1].astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2)}), flush=True)
    return out


def main():
    from hommx_tpu import create_unit_cube
    from hommx_tpu.micro.engine import MicroEngine, _block_pcg_matfree
    from hommx_tpu.utils.validation import hooke_tensor

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64

    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)

    micro = create_unit_cube(4)
    eng = MicroEngine(micro, bs=3, coeff_kind="tensor4", quad_degree=2,
                      dtype=dtype)
    C = 540
    centers = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (C, 3)), dtype=dtype
    )
    prec = "highest"

    def with_prec(f):
        def g(*a):
            with jax.default_matmul_precision(prec):
                return f(*a)
        return jax.jit(g)

    # A. coefficient evaluation + quadrature reduction
    coeff_fn = with_prec(
        lambda c: jax.vmap(lambda x: eng._raw_coeff(A_el, x))(c)
    )
    Ae = timed("A_coeff_eval", coeff_fn, centers)  # (C, nE, 9, 9)

    # B. grad-map conjugation A_K = T'AeT, A_F = T'Ae (T = sym map here)
    T = eng._eye_sym

    def conj(Ae):
        A_K = jnp.einsum("mr,cemt,tn->cern", T, Ae, T)
        A_F = jnp.einsum("mr,cemt->cert", T, Ae)
        return A_K, A_F

    A_K, A_F = timed("B_conjugation", with_prec(conj), Ae)

    # C. dense assembly (current default for n_red<=512)
    K_d = timed(
        "C_assemble_dense", with_prec(jax.vmap(eng._assemble_dense)), A_K
    )

    # D. scatter assembly (classical FEM path)
    K_s = timed(
        "D_assemble_scatter", with_prec(jax.vmap(eng._assemble_scatter)), A_K
    )
    print("assembly agree:",
          float(jnp.max(jnp.abs(K_d - K_s)) / jnp.max(jnp.abs(K_d))))

    # E. RHS build
    keep = jnp.logical_not(eng.pin_mask).astype(dtype)

    def rhs(A_F):
        AE = jnp.einsum("cert,ts->cers", A_F, eng.E)
        F_loc = -jnp.einsum("erl,cers->cels", eng.Draw, AE)
        F = jnp.zeros((C, eng.n_reduced, eng.s), dtype=dtype)
        F = F.at[:, eng.loc2red.reshape(-1)].add(
            F_loc.reshape(C, -1, eng.s)
        )
        return F * keep[None, :, None]

    F = timed("E_rhs", with_prec(rhs), A_F)

    # F. the PCG solve alone, on the precomputed K (with diag scaling)
    pinf = eng.pin_mask.astype(dtype)
    Minv = eng._get_K0inv()

    def solve(K, F):
        K = K * keep[None, :, None] * keep[None, None, :] + jnp.diag(pinf)[None]

        def one(K, F):
            sc = eng._scale_from_diag(jnp.diagonal(K))[:, None]
            Y = _block_pcg_matfree(
                lambda p: sc * (K @ (sc * p)), sc * F, Minv,
                eng.pcg_tol, eng.pcg_maxiter,
            )
            return sc * Y

        return jax.vmap(one)(K, F)

    X = timed("F_pcg_solve", with_prec(solve), K_d, F)

    # F2. batched Cholesky solve alone
    def chol(K, F):
        K = K * keep[None, :, None] * keep[None, None, :] + jnp.diag(pinf)[None]

        def one(K, F):
            c, low = jax.scipy.linalg.cho_factor(K)
            return jax.scipy.linalg.cho_solve((c, low), F)

        return jax.vmap(one)(K, F)

    timed("F2_cholesky_solve", with_prec(chol), K_d, F)

    # G. corrected fields + A* contraction
    def astar(Ae, X):
        def one(Ae, X):
            X_loc = X[eng.loc2red]
            DX = jnp.einsum("erl,els->ers", eng.Draw, X_loc)
            DX = jnp.einsum("rt,ets->ers", T, DX)
            Phi = eng.E[None, :, :] + DX
            return jnp.einsum("ern,ert,etm->nm", Phi, Ae, Phi) / eng.volume_Y

        return jax.vmap(one)(Ae, X)

    timed("G_astar", with_prec(astar), Ae, X)


if __name__ == "__main__":
    main()
