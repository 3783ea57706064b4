#!/usr/bin/env python
"""Reproduce the round-5 torus-MG iteration measurements
(docs/performance.md "Round 5").

Sweeps the cell preconditioners (k0inv / fft / mg) and the MG smoothing
degree on the contrast-1e5 stiff-fiber elasticity cell at 8³ and 16³,
plus the scalar contrast-1e5 inclusion at 32² — the numbers quoted in
the round-5 docs table.  Runs on CPU (f64; several minutes) or TPU.

Run: python benchmarks/mg_iteration_sweep.py [--quick]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu import create_unit_cube, create_unit_square
from hommx_tpu.micro.engine import MicroEngine
from hommx_tpu.utils.validation import hooke_tensor


def circle(a, b):
    da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
    db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
    return (da**2 + db**2) < ((2 * jnp.pi) ** 2 / 16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="8³ only")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    # scalar 32² contrast-1e5 inclusion
    Ac = lambda x, y: jnp.where(
        (jnp.abs(y[0] - 0.5) < 0.25) & (jnp.abs(y[1] - 0.5) < 0.25),
        1e5, 1.0,
    )
    centers2 = jnp.asarray(rng.uniform(0, 1, (4, 2)))
    print("scalar 32², contrast 1e5, tol 1e-11:")
    for prec in ("k0inv", "fft", "mg"):
        eng = MicroEngine(
            create_unit_square(32), dtype=jnp.float64, solver="pcg",
            cell_prec=prec, pcg_tol=1e-11, pcg_maxiter=4000,
        )
        t0 = time.time()
        _, it = eng.tensors_chunk_pcg(
            Ac, centers2, with_iters=True, implicit_diff=False
        )
        print(f"  {prec:6s}: {int(it):4d} iterations  ({time.time()-t0:.1f}s)")

    # elasticity stiff fiber, contrast 1e5 (the near-incompressible
    # stress fixture: mu 100/0.001, lambda 1)
    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)
    centers3 = jnp.asarray(rng.uniform(0, 1, (2, 3)))
    sizes = (8,) if args.quick else (8, 16)
    for n in sizes:
        tol = 1e-9 if n == 8 else 1e-7
        print(f"elasticity {n}³, contrast 1e5, tol {tol:g}:")
        eng_f = MicroEngine(
            create_unit_cube(n), bs=3, coeff_kind="tensor4",
            dtype=jnp.float64, solver="pcg", pcg_strategy="matfree",
            cell_prec="fft", pcg_tol=tol, pcg_maxiter=6000,
        )
        t0 = time.time()
        _, it = eng_f.tensors_chunk_pcg(
            A_el, centers3, with_iters=True, implicit_diff=False
        )
        print(f"  fft       : {int(it):4d} iterations  ({time.time()-t0:.1f}s)")
        for nu in (2, 4, 8, 10):
            eng_m = MicroEngine(
                create_unit_cube(n), bs=3, coeff_kind="tensor4",
                dtype=jnp.float64, solver="pcg", pcg_strategy="matfree",
                cell_prec="mg", mg_nu=nu, pcg_tol=tol, pcg_maxiter=6000,
            )
            t0 = time.time()
            _, it = eng_m.tensors_chunk_pcg(
                A_el, centers3, with_iters=True, implicit_diff=False
            )
            print(
                f"  mg (nu={nu:2d}): {int(it):4d} iterations  "
                f"({time.time()-t0:.1f}s)"
            )

    # the contrast-vs-incompressibility diagnosis: same jump, bounded
    # Poisson ratio -> mesh-independent ~10-12 iterations
    mu2 = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A_b = hooke_tensor(3, mu2, mu2)  # lambda scaled with mu
    print("elasticity, SAME jump but lambda=mu (bounded Poisson ratio):")
    for n in sizes:
        eng_b = MicroEngine(
            create_unit_cube(n), bs=3, coeff_kind="tensor4",
            dtype=jnp.float64, solver="pcg", pcg_strategy="matfree",
            cell_prec="mg", pcg_tol=1e-9, pcg_maxiter=6000,
        )
        t0 = time.time()
        _, it = eng_b.tensors_chunk_pcg(
            A_b, centers3, with_iters=True, implicit_diff=False
        )
        print(f"  {n}³ mg    : {int(it):4d} iterations  ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
