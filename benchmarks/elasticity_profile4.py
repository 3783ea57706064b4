#!/usr/bin/env python
"""Accuracy + perf matrix for the rotated-fiber elasticity micro stage.

profile3 exposed the real beam-scale bottleneck: per-cell rotations blow up
the lockstep PCG iteration count (4320 rotated cells: 439 ms vs 54 ms for
8640 aligned cells), while batched Cholesky at n_red = 192 is as fast as
PCG and iteration-free.  This measures the f32 scaled-Cholesky path's
accuracy against emulated-f64 reference tensors and times the
solver x assembly x chunk matrix on the rotated config.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from hommx_tpu import create_unit_cube
    from hommx_tpu.micro.engine import MicroEngine
    from hommx_tpu.utils.validation import hooke_tensor

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

    micro = create_unit_cube(4)
    rng = np.random.default_rng(0)

    # ---- accuracy: 16 rotated cells, f64 reference (emulated on TPU) ----
    cen16 = jnp.asarray(rng.uniform(0, 1, (16, 3)))
    eng64 = MicroEngine(micro, bs=3, coeff_kind="tensor4", dtype=jnp.float64)
    ref = np.asarray(
        jax.jit(lambda c: eng64.tensors_for_centers(A_el, c, G_fn=G_fn))(cen16)
    )
    scale = np.abs(ref).max()

    def acc(tag, **kw):
        eng = MicroEngine(micro, bs=3, coeff_kind="tensor4", dtype=dtype, **kw)
        out = np.asarray(
            jax.jit(
                lambda c: eng.tensors_for_centers(A_el, c, G_fn=G_fn)
            )(cen16.astype(dtype))
        )
        err = np.abs(out - ref).max() / scale
        print(json.dumps({"tag": "acc-" + tag, "rel_err": float(err)}),
              flush=True)

    acc("pcg-densek")
    acc("cholesky-scaled", solver="cholesky")
    acc("cholesky-raw", solver="cholesky", diag_scale=False)

    # ---- perf matrix on 4320 rotated cells ----
    C = 4320
    centers = jnp.asarray(rng.uniform(0, 1, (C, 3)), dtype=dtype)

    def bench(tag, chunk=0, **kw):
        eng = MicroEngine(micro, bs=3, coeff_kind="tensor4", dtype=dtype, **kw)
        jfn = jax.jit(
            lambda c: eng.tensors_for_centers(A_el, c, G_fn=G_fn, chunk=chunk)
        )
        out = jfn(centers)
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        for _i in range(3):
            out = jfn(centers)
            chk = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / 3
        print(json.dumps({
            "tag": tag, "ms": round(dt * 1e3, 1),
            "solves_per_sec": round(C * eng.s / dt, 1), "checksum": chk,
        }), flush=True)

    bench("pcg-densek-default")
    bench("chol-dense-cdef", solver="cholesky")
    bench("chol-dense-c512", solver="cholesky", chunk=512)
    bench("chol-scatter-cdef", solver="cholesky", assembly="scatter")
    bench("chol-scatter-c1024", solver="cholesky", assembly="scatter",
          chunk=1024)
    bench("chol-scatter-c2048", solver="cholesky", assembly="scatter",
          chunk=2048)


if __name__ == "__main__":
    main()
