#!/usr/bin/env python
"""Chunk-size + Kc-placement sweep for the elasticity micro stage.

Round-4 measurements on the C=8640 fresh-input rotated-fiber workload
(one v5e chip): chunk 720/1080/1440/2160/4320/8640 ->
257/285/274/266/249/216k solves/s (moderate chunks overlap lax.map
iterations best), and HOMMX_KC_ASSEMBLY=gather loses to the scatter
default (231k at chunk 4320).  bench.py's elasticity row runs chunk 1080
on this basis.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/elasticity_chunk_sweep.py
"""
import os
import time
import numpy as np
import jax
import jax.numpy as jnp
from hommx_tpu import create_unit_cube
from hommx_tpu.micro.engine import MicroEngine
from hommx_tpu.utils.validation import hooke_tensor

def circle(a, b):
    da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
    db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
    return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0 * (1.0 + 0.001 * x[0]), 0.001)
A_el = hooke_tensor(3, mu, lambda x, y: 1.0)

def G_fn(x):
    g = 0.5 * jnp.pi * x[1] / 0.4
    c, s = jnp.cos(g), jnp.sin(g)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

micro = create_unit_cube(4)
rng = np.random.default_rng(1)
C = 8640
batches = [jnp.asarray(rng.uniform(0, 1, (C, 3)), jnp.float32) for _ in range(4)]

def bench(tag, chunk, kc_mode=None):
    if kc_mode:
        os.environ["HOMMX_KC_ASSEMBLY"] = kc_mode
    try:
        eng = MicroEngine(micro, bs=3, coeff_kind="tensor4", dtype=jnp.float32)
        run = jax.jit(lambda c: eng.tensors_for_centers(A_el, c, G_fn=G_fn, chunk=chunk))
        t0 = time.perf_counter()
        _ = float(jnp.sum(run(batches[0])))
        print(f"{tag:28s} compile {time.perf_counter()-t0:5.1f}s", flush=True)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run(batches[1 + i])))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"{tag:28s} med {1e3*dt:7.1f} ms = {C*eng.s/dt/1e3:7.1f}k solves/s", flush=True)
    finally:
        if kc_mode:
            del os.environ["HOMMX_KC_ASSEMBLY"]

bench("chunk4320 (prod)", 4320)
bench("chunk8640 single", 8640)
bench("chunk2160", 2160)
bench("chunk4320 kc=gather", 4320, "gather")
