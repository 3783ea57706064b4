#!/usr/bin/env python
"""Phase-level profile of the elasticity micro stage (round-3 perf work).

Splits the 3D stiff-fiber config (benchmarks/suite.py config 4) into its
cost components to aim the optimization: PCG iteration counts, per-iteration
matvec cost, one-time assembly cost, and the final contraction.  Run on the
TPU; results recorded in docs/performance.md.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from hommx_tpu import create_unit_cube
    from hommx_tpu.micro.engine import MicroEngine
    from hommx_tpu.utils.validation import hooke_tensor

    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=540)
    ap.add_argument("--micro", type=int, default=4)
    ap.add_argument("--maxiter", type=int, default=1500)
    ap.add_argument("--rotated", action="store_true",
                    help="use the beam's per-cell rotation map (stratified)")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64

    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)

    G_fn = None
    if args.rotated:
        W = 0.4

        def G_fn(x):
            gamma = 0.5 * jnp.pi * x[1] / W
            c, s = jnp.cos(gamma), jnp.sin(gamma)
            return jnp.array(
                [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]
            ).T

    micro = create_unit_cube(args.micro)
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.uniform(0, 1, (args.cells, 3)), dtype=dtype)

    def timed(tag, engine, fn):
        jfn = jax.jit(fn)
        out = jfn(centers)
        first = out[0] if isinstance(out, tuple) else out
        _ = float(jnp.sum(jnp.where(jnp.isfinite(first), first, 0.0)))
        t0 = time.perf_counter()
        reps = 3 if on_tpu else 1
        for _i in range(reps):
            out = jfn(centers)
            first = out[0] if isinstance(out, tuple) else out
            chk = float(jnp.sum(jnp.where(jnp.isfinite(first), first, 0.0)))
        dt = (time.perf_counter() - t0) / reps
        sps = args.cells * engine.s / dt
        rec = {"tag": tag, "seconds": round(dt, 4),
               "solves_per_sec": round(sps, 1), "checksum": chk}
        if isinstance(out, tuple) and len(out) > 1:
            rec["lockstep_iters"] = int(np.asarray(out[-1]).max())
        print(json.dumps(rec), flush=True)
        return dt

    def make(maxiter=None, **kw):
        return MicroEngine(
            micro, bs=3, coeff_kind="tensor4", quad_degree=2, dtype=dtype,
            pcg_maxiter=maxiter or args.maxiter, **kw,
        )

    # 1. production default: per-cell densek PCG
    eng = make()
    timed("percell-densek", eng,
          lambda c: eng.tensors_for_centers(A_el, c, G_fn=G_fn))

    # 2. same with maxiter=1 → isolates assembly + RHS + contraction overhead
    eng1 = make(maxiter=1)
    timed("percell-densek-maxiter1", eng1,
          lambda c: eng1.tensors_for_centers(A_el, c, G_fn=G_fn))

    # 3. chunk densek with iteration count (lockstep worst-column count)
    engc = make()
    timed("chunk-densek+iters", engc,
          lambda c: engc.tensors_chunk_pcg(A_el, c, G_fn=G_fn, with_iters=True))

    # 4. chunk matfree with iteration count
    engm = make(pcg_strategy="matfree")
    timed("chunk-matfree+iters", engm,
          lambda c: engm.tensors_chunk_pcg(A_el, c, G_fn=G_fn, with_iters=True))

    # 5. cholesky reference (exactness + batched-factorization cost)
    engch = make()
    engch.solver = "cholesky"
    timed("percell-cholesky", engch,
          lambda c: engch.tensors_for_centers(A_el, c, G_fn=G_fn))


if __name__ == "__main__":
    main()
