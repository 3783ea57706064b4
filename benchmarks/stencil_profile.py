"""Phase profile of the headline scalar chunk-PCG stencil path (bench.py).

Times each pipeline phase as its own jitted program on the full 32768-cell
batch (chunked like production where it matters), so the ~20 ms of per-rep
compute beyond the ~27 ms tunnel dispatch floor can be attributed:
coefficient eval, stencil weights, RHS build, PCG loop, A* contraction.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.meshes import create_unit_square
from hommx_tpu.micro.engine import MicroEngine, _chunk_pcg
from hommx_tpu.micro.stencil import (
    stencil_astar,
    stencil_matvec,
    stencil_rhs,
    stencil_weights,
)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def timeit(fn, *args, reps=5):
    fn(*args)
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64
    micro = create_unit_square(16, 16)
    engine = MicroEngine(micro, bs=1, coeff_kind="scalar", quad_degree=2, dtype=dtype)
    st = engine._get_stencil()
    assert st is not None

    n_cells = 32768
    chunk = 2048
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.uniform(0, 1, size=(n_cells, 2)), dtype=dtype)

    def coeff(x, y):
        return 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])

    E = engine.E
    n, s = engine.n_reduced, engine.s
    Minv = engine._get_K0inv()

    @jax.jit
    def f_coeff(c):
        return jax.vmap(lambda x: engine._raw_coeff(coeff, x))(c)

    a_full = f_coeff(centers)

    @jax.jit
    def f_weights(a):
        return stencil_weights(st, a, None)

    @jax.jit
    def f_rhs(a):
        return stencil_rhs(st, a, E)

    @jax.jit
    def f_scale(a):
        dD = jnp.einsum("ern,ern->en", engine.D, engine.D)
        dp = jnp.einsum("ce,en->nc", a, dD)
        d0p = jnp.einsum("e,en->n", jnp.sum(engine.wq_dev, axis=1), dD)
        bad = engine.pin_mask[:, None] | (dp <= 0) | ~jnp.isfinite(dp)
        return jnp.where(
            bad, 1.0, jnp.sqrt(d0p[:, None] / jnp.where(bad, 1.0, dp))
        ).astype(dtype)[:, None, :]

    def pcg_chunk(a):
        ws = stencil_weights(st, a, None)
        F = stencil_rhs(st, a, E)
        sc = f_scale.__wrapped__(a) if hasattr(f_scale, "__wrapped__") else None
        # replicate the production scaled solve
        dD = jnp.einsum("ern,ern->en", engine.D, engine.D)
        dp = jnp.einsum("ce,en->nc", a, dD)
        d0p = jnp.einsum("e,en->n", jnp.sum(engine.wq_dev, axis=1), dD)
        bad = engine.pin_mask[:, None] | (dp <= 0) | ~jnp.isfinite(dp)
        sc = jnp.where(
            bad, 1.0, jnp.sqrt(d0p[:, None] / jnp.where(bad, 1.0, dp))
        ).astype(dtype)[:, None, :]

        def mv(P):
            return sc * stencil_matvec(st, ws, sc * P)

        def prec(R):
            C = R.shape[-1]
            return (Minv @ R.reshape(n, s * C)).reshape(n, s, C)

        X, it = _chunk_pcg(mv, prec, sc * F, engine.pcg_tol, engine.pcg_maxiter)
        X = sc * X
        A = stencil_astar(st, ws, a, E, F, X) / engine.volume_Y
        return A, it

    @jax.jit
    def f_full(c):
        a = jax.vmap(lambda x: engine._raw_coeff(coeff, x))(c)
        return jax.lax.map(pcg_chunk, a.reshape(-1, chunk, a.shape[1]))

    @jax.jit
    def f_prod(c):
        return engine.tensors_for_centers(coeff, c, chunk=chunk)

    t_coeff = timeit(f_coeff, centers)
    t_w = timeit(f_weights, a_full)
    t_rhs = timeit(f_rhs, a_full)
    t_scale = timeit(f_scale, a_full)
    A_full, iters = f_full(centers)
    print("iters per chunk:", np.asarray(iters))
    t_full = timeit(f_full, centers)
    t_prod = timeit(f_prod, centers)

    # PCG-iteration-only probe: matvec + prec + axpys on one full Krylov
    # state, chunked, times a single iteration's arrays
    ws_full = f_weights(a_full)
    F_full = f_rhs(a_full)

    @jax.jit
    def f_iter(P):
        def one(args):
            w, p = args
            Kp = stencil_matvec(st, list(w), p)
            Z = (Minv @ Kp.reshape(n, -1)).reshape(p.shape)
            return p + 0.5 * Z - 0.1 * Kp

        wsr = [w.reshape(n, -1, chunk).transpose(1, 0, 2) for w in ws_full]
        Pr = P.reshape(n, s, -1, chunk).transpose(2, 0, 1, 3)
        return jax.lax.map(one, (tuple(wsr), Pr))

    t_iter = timeit(f_iter, F_full)

    print(f"coeff eval      : {t_coeff:7.2f} ms")
    print(f"stencil weights : {t_w:7.2f} ms")
    print(f"stencil rhs     : {t_rhs:7.2f} ms")
    print(f"diag scale      : {t_scale:7.2f} ms")
    print(f"one PCG iter    : {t_iter:7.2f} ms")
    print(f"full (script)   : {t_full:7.2f} ms")
    print(f"full (engine)   : {t_prod:7.2f} ms")


if __name__ == "__main__":
    main()
