#!/usr/bin/env python
"""Elasticity micro-stage perf matrix with FRESH inputs per rep.

profile3/4 reused one centers array across timing reps; the axon tunnel can
memoize results for identical input buffers (bench.py defends against this
— these profiles did not), which made the aligned-fiber runs read as the
~30 ms dispatch floor.  Every rep here gets fresh centers, like bench.py.
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

    # weak x-dependence so every fresh-centers rep has a distinct checksum
    # (the memoization guard needs output variation; physics unchanged at
    # the 0.1% level)
    mu = lambda x, y: jnp.where(
        circle(y[1], y[2]), 100.0 * (1.0 + 0.001 * x[0]), 0.001
    )
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
        g = G_fn if rotated else None
        jfn = jax.jit(
            lambda c: eng.tensors_for_centers(A_el, c, G_fn=g, chunk=chunk)
        )
        reps = 3
        batches = [
            jnp.asarray(rng.uniform(0, 1, (C, 3)), dtype=dtype)
            for _ in range(reps + 1)
        ]
        _ = float(jnp.sum(jfn(batches[0])))
        t0 = time.perf_counter()
        checks = []
        for i in range(reps):
            checks.append(float(jnp.sum(jfn(batches[i + 1]))))
        dt = (time.perf_counter() - t0) / reps
        assert len(set(checks)) == reps, "identical rep results (memoized?)"
        print(json.dumps({
            "tag": tag, "cells": C, "ms": round(dt * 1e3, 1),
            "solves_per_sec": round(C * eng.s / dt, 1),
        }), flush=True)

    # aligned fiber (suite config 4 workload) — honest numbers
    bench("pcg-aligned", 2160)
    bench("chol-aligned", 2160, solver="cholesky")
    # rotated beam workload
    bench("pcg-rotated", 4320, rotated=True)
    bench("chol-rotated", 4320, rotated=True, solver="cholesky")
    bench("chol-rot-scatter", 4320, rotated=True, solver="cholesky",
          assembly="scatter")
    bench("chol-rot-scatter-c512", 4320, rotated=True, solver="cholesky",
          assembly="scatter", chunk=512)
    bench("chol-rot-c512", 4320, rotated=True, solver="cholesky", chunk=512)


if __name__ == "__main__":
    main()
