#!/usr/bin/env python
"""Batch-size scaling + strategy sweep for the elasticity micro stage.

elasticity_profile2.py showed every per-phase jit sits at the ~25-40 ms
tunnel dispatch floor at 540 cells — the real compute must be separated by
scaling the batch.  This sweeps cell counts and engine configurations in
one process (the tunnel serializes anyway).
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
    ap.add_argument("--micro", type=int, default=4)
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64

    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)
    W = 0.4

    def G_fn(x):
        gamma = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(gamma), jnp.sin(gamma)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    micro = create_unit_cube(args.micro)
    rng = np.random.default_rng(0)

    def bench(tag, C, rotated=False, chunk=0, **kw):
        eng = MicroEngine(micro, bs=3, coeff_kind="tensor4", quad_degree=2,
                          dtype=dtype, **kw)
        centers = jnp.asarray(rng.uniform(0, 1, (C, 3)), dtype=dtype)
        g = G_fn if rotated else None
        jfn = jax.jit(
            lambda c: eng.tensors_for_centers(A_el, c, G_fn=g, chunk=chunk)
        )
        out = jfn(centers)
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        reps = 3
        for _i in range(reps):
            out = jfn(centers)
            chk = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "tag": tag, "cells": C, "ms": round(dt * 1e3, 1),
            "solves_per_sec": round(C * eng.s / dt, 1), "checksum": chk,
        }), flush=True)

    for C in (540, 2160, 8640):
        bench("densek-default", C)
    bench("densek-rotated", 4320, rotated=True)
    # scatter assembly (skips the (nE*r,nred)^T@(nE*r,nred) dense K build)
    for C in (2160, 8640):
        bench("densek-scatter-asm", C, assembly="scatter")
    bench("densek-scatter-rotated", 4320, rotated=True, assembly="scatter")
    # bigger chunks (scatter assembly shrinks the per-cell footprint)
    bench("densek-scatter-c4096", 8640, assembly="scatter", chunk=4096)
    # cholesky at scale
    bench("cholesky", 2160, solver="cholesky")
    bench("cholesky-scatter", 2160, solver="cholesky", assembly="scatter")


if __name__ == "__main__":
    main()
