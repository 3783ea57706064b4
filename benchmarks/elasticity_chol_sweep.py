#!/usr/bin/env python
"""Round-3 follow-up: where does the elasticity chunk-Cholesky time go,
and what beats it?

The rotated-fiber micro stage is latency-bound (~97 us/cell against
~7 MFLOP/cell).  Candidates measured here on the REAL workload (4320
stratified rotated-fiber cells, 4^3 micro cube, contrast 1e5):

  A. current default (_chol_chunk_solve) at the auto chunk
  B. chunk-size sweep (auto / 1024 / 2160 / 4320) — the lax.map chunks
     run sequentially, each paying dispatch + panel latency
  C. explicit inverse apply: jnp.linalg.inv on the equilibrated operator
     + matmul apply + one refinement sweep (trades the sequential
     triangular solves for one more n^3 but all-matmul work)

Accuracy gate for every candidate: max |A* - A*_ref| / |A*_ref| vs the
f64 per-cell Cholesky reference, must stay at the documented ~5e-7 level.

Timing: host-readback sync (block_until_ready is not a reliable barrier
through the axon tunnel); fresh-input reps (x-modulated rotation angle)
to defeat any caching.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from hommx_tpu.meshes import create_unit_cube, create_box
from hommx_tpu.micro.engine import MicroEngine
from hommx_tpu.utils.validation import hooke_tensor


def main():
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64

    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)
    W = 0.4

    def Dt3(x):
        g = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(g), jnp.sin(g)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    macro = create_box([[0, 0, 0], [1.0, W, 0.1]], [20, 6, 6])
    verts = np.asarray(macro.vertices)
    centers_np = verts[np.asarray(macro.cells)].mean(axis=1)
    nc = centers_np.shape[0]
    micro = create_unit_cube(4)
    print(f"# cells={nc}")

    eng = MicroEngine(micro, bs=3, coeff_kind="tensor4", quad_degree=1,
                      dtype=dtype)
    print(f"# n_red={eng.n_reduced} nE={eng.nE} s={eng.s} "
          f"auto_chunk={eng._auto_chunk(nc)}")

    rng = np.random.default_rng(7)

    def centers_rep(i):
        # jitter the x-coordinate (rotation angle is x1-driven; jitter all
        # coords so every rep is fresh data without changing the physics
        # much)
        return jnp.asarray(
            centers_np + 1e-6 * rng.standard_normal(centers_np.shape),
            dtype=dtype,
        )

    def timeit(fn, label, reps=3):
        out = fn(centers_rep(0))
        _ = float(jnp.sum(out))  # compile+warm
        ts = []
        for i in range(reps):
            c = centers_rep(i + 1)
            _ = float(jnp.sum(c))  # materialize input before the clock
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(c)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{label:42s} {med*1e3:8.1f} ms  "
              f"({nc*eng.s/med/1e3:7.1f}k solves/s)  reps="
              + ",".join(f"{t*1e3:.0f}" for t in ts))
        return out

    # f64 per-cell reference for the accuracy gate (CPU fallback dtype is
    # already f64; on TPU run the emulated-f64 per-cell path once)
    ref_eng = MicroEngine(micro, bs=3, coeff_kind="tensor4", quad_degree=1,
                          dtype=jnp.float64)
    A_ref = np.asarray(ref_eng.tensors_for_centers(
        A_el, jnp.asarray(centers_np, jnp.float64), G_fn=Dt3))

    def gate(A, label):
        rel = float(np.max(np.abs(np.asarray(A, np.float64) - A_ref))
                    / np.max(np.abs(A_ref)))
        print(f"  accuracy {label}: {rel:.2e}")

    # A/B: default route at several chunks
    for chunk in (0, 1024, 2160, 4320):
        f = jax.jit(lambda c, ch=chunk: eng.tensors_for_centers(
            A_el, c, G_fn=Dt3, chunk=ch))
        A = timeit(f, f"chol chunk={chunk or 'auto'}")
        gate(A, f"chunk={chunk or 'auto'}")

    # C: explicit-inverse apply (monkey-patched solve kernel)
    orig = MicroEngine._chol_chunk_solve

    def inv_solve(self, Kc, F):
        n = self.n_reduced
        dp = jnp.einsum("cnn->nc", Kc)
        self._get_K0inv()
        d0p = self._K0diag
        bad = self.pin_mask[:, None] | (dp <= 0) | ~jnp.isfinite(dp)
        sc = jnp.where(bad, 1.0,
                       jnp.sqrt(d0p[:, None] / jnp.where(bad, 1.0, dp))
                       ).astype(self.dtype)
        scm = sc.T
        Ks = Kc * scm[:, :, None] * scm[:, None, :]
        Kinv = jnp.linalg.inv(Ks)

        def solve_scaled(B):
            Bs = jnp.transpose(B * sc[:, None, :], (2, 0, 1))
            Y = jnp.einsum("cnm,cms->cns", Kinv, Bs)
            return jnp.transpose(Y, (1, 2, 0)) * sc[:, None, :]

        X = solve_scaled(F)
        R = F - jnp.einsum("cnm,msc->nsc", Kc, X)
        X = X + solve_scaled(R)
        R = F - jnp.einsum("cnm,msc->nsc", Kc, X)
        return X + solve_scaled(R)

    MicroEngine._chol_chunk_solve = inv_solve
    try:
        for chunk in (0, 4320):
            f = jax.jit(lambda c, ch=chunk: eng.tensors_for_centers(
                A_el, c, G_fn=Dt3, chunk=ch))
            A = timeit(f, f"inv+2 refinements chunk={chunk or 'auto'}")
            gate(A, f"inv chunk={chunk or 'auto'}")
    finally:
        MicroEngine._chol_chunk_solve = orig


if __name__ == "__main__":
    main()
