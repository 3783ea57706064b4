#!/usr/bin/env python
"""Micro-stage strategy shootout on a GENERAL (full-rank) coefficient.

The headline bench (bench.py) exercises the exact low-rank path; this one
measures what a user with an arbitrary A(x, y) gets, across the engine's
strategies, to drive the general-coefficient optimization work
(docs/performance.md records results).
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from hommx_tpu.meshes import create_unit_square
    from hommx_tpu.micro.engine import MicroEngine

    p = argparse.ArgumentParser()
    p.add_argument("--cells", type=int, default=32768)
    p.add_argument("--micro", type=int, default=16)
    args = p.parse_args()

    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64

    micro = create_unit_square(args.micro, args.micro)
    n_cells = args.cells
    rng = np.random.default_rng(0)

    # genuinely full-rank over the cell batch: the y-oscillation phase and
    # frequency content depend smoothly on x (no Σ_k f_k(x) g_k(y) form)
    def coeff(x, y):
        return (
            1.1
            + x[0]
            + jnp.sin(2 * jnp.pi * y[0] + 3.0 * x[1])
            * (0.5 + 0.4 * jnp.cos(2 * jnp.pi * y[1] * (1.0 + 0.5 * x[0])))
        )

    def run_config(name, chunk, **engine_kwargs):
        engine = MicroEngine(
            micro, bs=1, coeff_kind="scalar", quad_degree=2, dtype=dtype,
            **engine_kwargs,
        )

        @jax.jit
        def run(c):
            return engine.tensors_for_centers(coeff, c, chunk=chunk)

        reps = 3 if on_tpu else 1
        batches = [
            jnp.asarray(rng.uniform(0, 1, size=(n_cells, 2)), dtype=dtype)
            for _ in range(reps + 1)
        ]
        t0 = time.perf_counter()
        chk0 = float(jnp.sum(run(batches[0])))  # host readback = sync
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        checks = [float(jnp.sum(run(batches[i + 1]))) for i in range(reps)]
        dt = (time.perf_counter() - t0) / reps
        sps = n_cells * engine.s / dt
        print(
            json.dumps(
                {
                    "strategy": name,
                    "solves_per_sec": round(sps, 1),
                    "warm_s": round(dt, 3),
                    "cold_s": round(cold, 1),
                    "checksum": checks[-1],
                }
            ),
            flush=True,
        )
        return sps

    chunk = 4096 if on_tpu else 256
    run_config("densek-k0inv (default)", chunk)
    run_config("chunk-matfree-k0inv", chunk, pcg_strategy="matfree")
    run_config("chunk-fft", chunk, cell_prec="fft")
    run_config("chunk-fft-c8192", 8192 if on_tpu else 256, cell_prec="fft")


if __name__ == "__main__":
    main()
