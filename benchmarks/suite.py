#!/usr/bin/env python
"""Benchmark suite over the five BASELINE.json configurations.

Prints one JSON line per configuration with cold (compile-inclusive) and
warm end-to-end solve times plus micro-stage throughput.  The headline
driver metric stays in ../bench.py; this suite is the broad-coverage view
(docs/performance.md records results).

Timing methodology: host-readback sync after every solve (block_until_ready
is not a reliable barrier through the axon TPU tunnel).

Deduplication honesty: every throughput row passes ``dedup_cells=False``.
The suite coefficients vary in only ONE macro coordinate, so the default
cell-problem memoization (models/hmm.py) would collapse each row to a few
hundred unique solves and inflate micro_solves_per_sec by 10-100x — the
same benchmark-fiction class as the round-3 constant-folding finding.
Throughput rows therefore measure real per-solve work; the separate
``*_dedup`` row reports the wall-clock win dedup gives the DEFAULT
``solve()`` path on the flagship beam, with ``unique_cells`` shown so the
reduction is explicit.
"""

import argparse
import json
import os
import sys
import time

# the package is used from the source tree (not pip-installed); the
# per-config subprocesses run with sys.path[0] = benchmarks/, so the repo
# root must be added explicitly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _sync(u):
    return float(np.abs(np.asarray(u.array)).max())


def _run(make_solver, name, nrhs_equiv):
    t0 = time.perf_counter()
    solver = make_solver()
    u = solver.solve()
    chk = _sync(u)
    cold = time.perf_counter() - t0
    # warm: re-run the full pipeline (micro stage + macro) with caches hot
    solver._A_star = None
    t0 = time.perf_counter()
    u = solver.solve()
    chk = _sync(u)
    warm = time.perf_counter() - t0
    nc = solver.diagnostics["num_cells"]
    nu = solver.diagnostics["unique_cells"]
    d = {
        "config": name,
        "cells": nc,
        "unique_cells": nu,
        "cold_seconds": round(cold, 2),
        "warm_seconds": round(warm, 3),
        # throughput counts the solves actually PERFORMED (unique), not
        # the cells covered — see the dedup note in the module docstring
        "micro_solves_per_sec": round(
            nu * nrhs_equiv / max(solver.diagnostics["micro_seconds"], 1e-9), 1
        ),
        "diverged_cells": int(solver.diagnostics["diverged_cells"].size),
        "macro_iterations": int(solver.diagnostics["macro_iterations"]),
        "checksum": chk,
    }
    print(json.dumps(d), flush=True)
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller meshes")
    ap.add_argument(
        "--config", type=int, default=0,
        help="run only config #k in THIS process (internal; 0 = parent "
        "mode, which runs every config in its own subprocess)",
    )
    args = ap.parse_args()

    if args.config == 0:
        # Per-config process isolation: after ~3 full HMM pipelines'
        # compiled programs + constants accumulate in one process, the
        # axon TPU backend starts failing executions with a bare
        # INVALID_ARGUMENT (reproduced: configs 1+2+3 crash config 3's
        # first solve; any two of them pass).  Each row is cold-measured
        # anyway, so isolation changes no semantics — and it matches how
        # the driver runs bench.py.
        import subprocess

        for k in range(1, 9):
            cmd = [sys.executable, __file__, "--config", str(k)]
            if args.quick:
                cmd.append("--quick")
            r = subprocess.run(cmd, env=dict(os.environ))
            if r.returncode != 0:
                print(
                    json.dumps(
                        {"config": f"#{k}", "error": f"exit {r.returncode}"}
                    ),
                    flush=True,
                )
        return
    k_only = args.config

    from hommx_tpu import (
        LinearElasticityHMM,
        LinearElasticityStratifiedHMM,
        PoissonHMM,
        PoissonStratifiedHMM,
        create_box,
        create_rectangle,
        create_unit_cube,
        create_unit_square,
        dirichletbc,
    )
    from hommx_tpu.ops.function_space import boundary_dofs
    from hommx_tpu.utils.validation import hooke_tensor

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    f32 = jnp.float32
    f64 = jnp.float64
    q = args.quick

    # 1. 2D PoissonHMM, x-dependent laminate (examples/hmm.py config)
    def c1():
        n = 16 if q else 64
        macro = create_rectangle([[0, 0], [5, 5]], [n, n])
        micro = create_unit_square(16, 16)
        A = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])
        # exactly rank-2 over cells (affine-in-x + x-independent term):
        # the low-rank path is numerically exact (check_coeff_rank ~5e-13)
        return PoissonHMM(macro, A, lambda x: 1.0, micro, 1 / 2**5,
                          dtype=f32 if on_tpu else f64, dedup_cells=False,
                          engine_kwargs={"coeff_rank": 2, "solver": "pcg"})

    if k_only == 1:
        _run(c1, "2d_poisson_laminate", 2)

    # 2. 2D PoissonStratifiedHMM, wavy laminate
    def c2():
        n = 16 if q else 48
        macro = create_unit_square(n, n)
        micro = create_unit_square(24, 24)
        A = lambda x, y: jnp.where(jnp.cos(2 * jnp.pi * y[0]) < 0, 5.0, 0.05)

        def Dtheta(x):
            return jnp.array(
                [[-2 * jnp.pi * jnp.cos(2 * jnp.pi * x[0]), 1.0], [1.0, 0.0]]
            )

        # the FFT-symbol preconditioner sees each cell's G^T G anisotropy
        # (shared K0^-1 cannot): 2.7x on TPU (37k -> 100k solves/s)
        s = PoissonStratifiedHMM(macro, A, lambda x: 1.0, micro, 2**-4, Dtheta,
                                 dtype=f32 if on_tpu else f64,
                                 dedup_cells=False,
                                 engine_kwargs={"cell_prec": "fft"})
        return s

    if k_only == 2:
        _run(c2, "2d_stratified_wavy_laminate", 2)

    # 3. 3D PoissonHMM on the unit cube (examples/hmm_3d.py config)
    def c3():
        n = 4 if q else 6
        macro = create_unit_cube(n)
        micro = create_unit_cube(6)
        A = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])
        return PoissonHMM(macro, A, lambda x: 1.0, micro, 1 / 2**3,
                          dtype=f32 if on_tpu else f64, dedup_cells=False,
                          engine_kwargs={"coeff_rank": 2, "solver": "pcg"})

    if k_only == 3:
        _run(c3, "3d_poisson_cube", 3)

    # 4. 3D LinearElasticityHMM with stiff circular fiber (contrast 1e5)
    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    # NOTE (round 3): the config's coefficient must depend on x.  With an
    # x-independent A(y), XLA constant-folds the ENTIRE micro stage to a
    # compile-time constant (legitimately — but the "benchmark" then
    # measures the ~30 ms dispatch floor; round-2's 164k solves/s on this
    # row was that artifact).  The 0.1%-level x-modulation below keeps the
    # physics while forcing real per-cell computation.
    mu_x = lambda x, y: jnp.where(
        circle(y[1], y[2]), 100.0 * (1.0 + 0.001 * x[0]), 0.001
    )
    A_el_x = hooke_tensor(3, mu_x, lambda x, y: 1.0)
    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)

    def c4():
        macro = create_box([[0, 0, 0], [1.0, 0.4, 0.4]], [6, 3, 3] if q else [10, 3, 3])
        micro = create_unit_cube(4)
        # f32 is accurate here since the scaled direct micro solve + f64
        # macro stage + full-f32 matmul precision (docs/performance.md)
        s = LinearElasticityHMM(macro, A_el_x, lambda x: jnp.array([0.0, 0.0, -0.01]),
                                micro, 2**-5, dtype=f32 if on_tpu else f64,
                                dedup_cells=False)
        s.set_boundary_conditions(
            dirichletbc(np.zeros(3),
                        boundary_dofs(s.function_space, lambda x: np.isclose(x[0], 0)),
                        s.function_space))
        return s

    if k_only == 4:
        _run(c4, "3d_elasticity_fiber", 9)

    # 5. 3D rotated-fiber beam (flagship, BASELINE config 5)
    W = 0.4

    def Dtheta3(x):
        gamma = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(gamma), jnp.sin(gamma)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    def c5(dedup=False, refine=1):
        macro = create_box(
            [[0, 0, 0], [1.0, W, 0.1]],
            [10, 3, 3] if q else [20 * refine, 6 * refine, 6 * refine],
        )
        micro = create_unit_cube(4)
        s = LinearElasticityStratifiedHMM(
            macro, A_el, lambda x: jnp.array([0.0, 0.0, -0.008]), micro, 2**-5,
            Dtheta3, dtype=f32 if on_tpu else f64, dedup_cells=dedup)
        s.set_boundary_conditions(
            dirichletbc(np.zeros(3),
                        boundary_dofs(s.function_space, lambda x: np.isclose(x[0], 0)),
                        s.function_space))
        return s

    if k_only == 5:
        _run(c5, "3d_rotated_fiber_beam", 12)

    # 5b. the same beam with the DEFAULT solve() path (dedup_cells=True):
    # the rotated-fiber coefficient depends on x only through the rotation
    # angle γ(x₂), so the 4320-cell batch collapses to the distinct
    # (angle, barycenter-parity) classes — this row shows the wall-clock
    # a default user actually gets, with unique_cells making the
    # reduction explicit (throughput is computed on unique solves)
    if k_only == 6:
        _run(lambda: c5(dedup=True), "3d_rotated_fiber_beam_dedup", 12)

    # 6. at-scale MG-path HMM (round-3 verdict item 6): 128² macro ×
    # 16² micro Poisson — 16,641 macro dofs, above direct_threshold, so
    # the macro stage runs CG + geometric-multigrid V-cycle + the Pallas
    # DIA SpMV INSIDE a full HMM solve (the composition previously only
    # benchmarked standalone in macro_mg_bench.py)
    def c6():
        n = 32 if q else 128
        macro = create_rectangle([[0, 0], [5, 5]], [n, n])
        micro = create_unit_square(16, 16)
        A = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])
        return PoissonHMM(macro, A, lambda x: 1.0, micro, 1 / 2**5,
                          dtype=f32 if on_tpu else f64, dedup_cells=False)

    if k_only == 7:
        d6 = _run(c6, "2d_poisson_mg_macro_128", 2)
        assert d6["cells"] == (2048 if q else 32768)

    # 7. at-scale ELASTICITY macro (round 3): the rotated-fiber beam
    # refined 2× per axis — 40×12×12 = 34,560 tets, 20,787 macro dofs >
    # direct_threshold, so the macro stage takes the f64-assembled CG with
    # the f32-applied geometric V-cycle preconditioner
    # (ops/solvers.py::_prec_in_f32) — f64-accurate at-scale elasticity,
    # the regime the reference runs as mpirun + GAMG.  Default solve()
    # path (dedup collapses the 34,560 cells to the distinct rotation
    # classes, shown via unique_cells).
    if k_only == 8:
        _run(lambda: c5(dedup=True, refine=2), "3d_beam_40x12x12_mg_f64", 12)


if __name__ == "__main__":
    main()
