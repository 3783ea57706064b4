"""Correctness + speed check: fused Pallas stencil PCG vs the XLA loop.

Runs the headline benchmark workload both ways in one process (the gate
env var is read per-call) and compares homogenized tensors.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.meshes import create_unit_square, create_unit_cube
from hommx_tpu.micro.engine import MicroEngine


def run(engine, coeff, centers, chunk):
    f = jax.jit(lambda c: engine.tensors_for_centers(coeff, c, chunk=chunk))
    out = f(centers)
    _ = float(jnp.sum(out))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(jnp.sum(f(centers)))
        ts.append(time.perf_counter() - t0)
    return np.asarray(out), float(np.median(ts)) * 1e3


def main():
    import os

    dtype = jnp.float32
    rng = np.random.default_rng(0)

    for name, mesh, d in [
        ("2D 16x16", create_unit_square(16, 16), 2),
        ("3D 4^3", create_unit_cube(4), 3),
    ]:
        engine = MicroEngine(mesh, bs=1, coeff_kind="scalar", quad_degree=2,
                             dtype=dtype)
        n_cells = 32768 if d == 2 else 8192
        centers = jnp.asarray(
            rng.uniform(0, 1, size=(n_cells, d)), dtype=dtype
        )

        def coeff(x, y):
            return 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])

        os.environ["HOMMX_STENCIL_PCG"] = "xla"
        A_xla, t_xla = run(engine, coeff, centers, 2048)
        os.environ["HOMMX_STENCIL_PCG"] = "auto"
        A_pl, t_pl = run(engine, coeff, centers, 2048)
        rel = float(np.max(np.abs(A_pl - A_xla)) / np.max(np.abs(A_xla)))
        print(f"{name}: xla {t_xla:.1f} ms, pallas {t_pl:.1f} ms, "
              f"rel diff {rel:.2e}")
        assert rel < 5e-5, rel


if __name__ == "__main__":
    main()
