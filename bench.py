#!/usr/bin/env python
"""Benchmark: micro cell-problem solves/sec on the available accelerator.

Headline metric (BASELINE.json north star): batched periodic micro
cell-problem corrector solves per second.  One "solve" = one corrector
linear system (assemble + solve against one RHS) — the unit of work the
reference performs as a full PETSc assemble+KSP round trip per macro basis
function (reference ``hmm.py:420-426``).  We count ``num_macro_cells × d``
generator solves (the d-RHS factorization is the algorithm, not an
accounting trick: it produces the identical HMM stiffness).  For scale:
the reference's own count would be ``cells × (d+1)`` basis solves for the
same output.

The benchmark runs the GENERAL coefficient path — the chunk-level
matrix-free block-PCG with the cell axis kept minor (micro/engine.py) —
with no structural assumptions (no ``coeff_rank`` declaration): this is
the throughput an arbitrary ``A(x, y)`` gets.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 1e5 (the v5e-8 target; this runs on however many
chips are visible).  The headline stays the 2D-scalar steady-state rate;
``extra_rows`` carries the 3D-scalar and 3D-elasticity (x-dependent
stiff-fiber, the reference's flagship workload class) medians so the
driver captures regressions on the vector and 3D paths every round
(round-3 verdict item 5).
"""

import json
import multiprocessing
import time

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.meshes import create_unit_square
from hommx_tpu.micro.engine import MicroEngine


def _probe_backend(q):
    try:
        import jax as _jax

        q.put(_jax.devices()[0].platform)
    except Exception as e:  # pragma: no cover - probe child
        q.put(f"error: {e}")


def _backend_alive(timeout_s=240.0):
    """Bounded device probe in a child process.

    The axon TPU tunnel can go down for hours, in which case
    ``jax.devices()`` blocks FOREVER (no error) — a bare benchmark run
    would hang the driver.  Probe in a subprocess with a timeout so the
    failure mode is a fast, honest error JSON instead of a hang."""
    ctx = multiprocessing.get_context("fork")
    q = ctx.Queue()
    p = ctx.Process(target=_probe_backend, args=(q,), daemon=True)
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join(5)
        return None
    try:
        return q.get_nowait()
    except Exception:
        return None


def main():
    platform = _backend_alive()
    if platform is None or str(platform).startswith("error"):
        print(json.dumps({
            "metric": "micro_cell_solves_per_sec",
            "value": 0,
            "unit": "solves/s",
            "vs_baseline": 0,
            "error": "accelerator backend unavailable (axon tunnel down "
                     "or init failure) — no measurement taken",
        }))
        return
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64

    # Workload: 2D Poisson HMM micro stage — 2^20 macro quadrature points
    # (a 512x512 P1 macro mesh has 524k cells; 3D runs are larger still),
    # 16x16 unit-cell micro mesh (n_red = 256), d = 2 generator solves each.
    # The batch is sized for STEADY-STATE throughput: the axon tunnel has a
    # fixed ~24 ms dispatch+readback latency per call, so small batches
    # measure latency, not the device (32k cells: 2.0M solves/s; 1M cells:
    # 7.2M — the full latency/throughput curve is in docs/performance.md).
    micro = create_unit_square(16, 16)
    engine = MicroEngine(
        micro, bs=1, coeff_kind="scalar", quad_degree=2, dtype=dtype,
    )

    n_cells = 1048576 if on_tpu else 4096
    rng = np.random.default_rng(0)

    def coeff(x, y):
        return 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])

    # round-3 sweep (fresh-input 5-rep medians): 2048 → 1.06M, 4096 → 1.00M,
    # 8192 → 0.90M, 16384 → 0.76M solves/s (at 32k cells, pre-Pallas-PCG);
    # with the fused Pallas PCG at 1M cells, 2048 edges out 4096 (7.18 vs
    # 6.93M)
    chunk = 2048 if on_tpu else 256

    @jax.jit
    def run(c):
        return engine.tensors_for_centers(coeff, c, chunk=chunk)

    # compile + warm up; fresh inputs per rep (defends against any
    # result-memoization in the runtime tunnel — and the coefficient
    # depends on x, so nothing constant-folds; see docs/performance.md on
    # the round-3 benchmark-fiction findings)
    reps = 5 if on_tpu else 1
    batches = [
        jnp.asarray(rng.uniform(0, 1, size=(n_cells, 2)), dtype=dtype)
        for _ in range(reps + 1)
    ]
    # NOTE: sync via a host readback (float(sum)) — on the axon TPU tunnel
    # jax.block_until_ready can return before execution finishes, which
    # would make the timings fiction.
    _ = float(jnp.sum(run(batches[0])))
    times = []
    checksums = []
    for i in range(reps):
        t0 = time.perf_counter()
        checksums.append(float(jnp.sum(run(batches[i + 1]))))
        times.append(time.perf_counter() - t0)
    assert len(set(checksums)) == reps, "reps produced identical results"

    # the axon tunnel shows ±30% run-to-run variance: report the MEDIAN as
    # the headline (the driver-reproducible number) plus the per-rep times,
    # the spread, and the outlier-TRIMMED median (min/max reps dropped —
    # round-4 verdict item 5: one bad rep was moving extra rows a lot)
    dt = float(np.median(times))
    nrhs = engine.s  # d generator correctors per cell
    solves_per_sec = n_cells * nrhs / dt
    result = {
        "metric": "micro_cell_solves_per_sec",
        "value": round(float(solves_per_sec), 1),
        "unit": "solves/s",
        "vs_baseline": round(float(solves_per_sec) / 1e5, 3),
        "reps_ms": [round(t * 1e3, 1) for t in times],
        "spread_pct": round(
            100.0 * (max(times) - min(times)) / dt, 1
        ),
        "trimmed_value": round(n_cells * nrhs / _trimmed(times), 1),
        "extra_rows": _extra_rows(on_tpu, dtype),
    }
    print(json.dumps(result))


def _trimmed(times):
    """Median with the min and max reps dropped (outlier-robust; equals
    the plain median for fewer than 4 reps)."""
    if len(times) < 4:
        return float(np.median(times))
    t = sorted(times)[1:-1]
    return float(np.median(t))


def _measure(engine, coeff, G_fn, n_cells, dim, chunk, dtype, reps):
    """Median-of-reps fresh-input steady-state rate for one engine config."""
    rng = np.random.default_rng(1)
    run = jax.jit(
        lambda c: engine.tensors_for_centers(coeff, c, G_fn=G_fn, chunk=chunk)
    )
    batches = [
        jnp.asarray(rng.uniform(0, 1, size=(n_cells, dim)), dtype=dtype)
        for _ in range(reps + 1)
    ]
    _ = float(jnp.sum(run(batches[0])))
    times, checksums = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        checksums.append(float(jnp.sum(run(batches[i + 1]))))
        times.append(time.perf_counter() - t0)
    assert len(set(checksums)) == reps, "reps produced identical results"
    dt = float(np.median(times))
    return {
        "value": round(n_cells * engine.s / dt, 1),
        "unit": "solves/s",
        "reps_ms": [round(t * 1e3, 1) for t in times],
        "spread_pct": round(100.0 * (max(times) - min(times)) / dt, 1),
        "trimmed_value": round(n_cells * engine.s / _trimmed(times), 1),
    }


def _extra_rows(on_tpu, dtype):
    """3D-scalar and 3D-elasticity steady-state rows (driver-captured so
    the vector/3D paths cannot regress silently)."""
    from hommx_tpu.meshes import create_unit_cube
    from hommx_tpu.utils.validation import hooke_tensor

    rows = []
    # round-4 verdict item 5: 3 reps let one bad tunnel rep move the
    # driver-captured numbers — 5 reps + trimmed medians everywhere
    reps = 5 if on_tpu else 1

    # 3D scalar: 8^3 unit cell (n_red = 512), x-dependent coefficient
    eng3 = MicroEngine(
        create_unit_cube(8), bs=1, coeff_kind="scalar", quad_degree=2,
        dtype=dtype,
    )
    coeff3 = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0]) * jnp.cos(
        2 * jnp.pi * y[2]
    )
    n3 = 131072 if on_tpu else 64
    r = _measure(eng3, coeff3, None, n3, 3, 2048 if on_tpu else 32,
                 dtype, reps)
    r["metric"] = "micro_scalar3d_solves_per_sec"
    rows.append(r)

    # 3D elasticity: the rotated-stiff-fiber beam class (x-dependent Hooke
    # coefficient AND x-dependent rotation — nothing constant-folds, no
    # dedup), 4^3 unit cell, Voigt s=6 generator solves per cell
    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(
        circle(y[1], y[2]), 100.0 * (1.0 + 0.001 * x[0]), 0.001
    )
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)

    def G_fn(x):
        g = 0.5 * jnp.pi * x[1] / 0.4
        c, s = jnp.cos(g), jnp.sin(g)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    eng_el = MicroEngine(
        create_unit_cube(4), bs=3, coeff_kind="tensor4", quad_degree=2,
        dtype=dtype,
    )
    # chunk sweep on the C=8640 fresh-input workload (round 4, one TPU
    # session): 720/1080/1440/2160/4320/8640 -> 257/285/274/266/249/216k
    # solves/s — moderate chunks overlap lax.map iterations best
    nel = 8640 if on_tpu else 24
    r = _measure(eng_el, A_el, G_fn, nel, 3, 1080 if on_tpu else 24,
                 dtype, reps)
    r["metric"] = "micro_elasticity3d_solves_per_sec"
    rows.append(r)

    # 16³-elasticity via the torus-MG matrix-free route (round-4 verdict
    # item 1: high micro resolutions must have a driver-captured
    # throughput row, not just a capability test).  Small cell batch —
    # the per-cell state at n_red = 12288 is large; the metric is
    # per-cell-problem throughput at high resolution.
    if on_tpu:
        eng16 = MicroEngine(
            create_unit_cube(16), bs=3, coeff_kind="tensor4",
            quad_degree=2, dtype=dtype, solver="pcg",
            pcg_strategy="matfree", cell_prec="mg",
        )
        r = _measure(eng16, A_el, G_fn, 8, 3, 8, dtype, 3)
        r["metric"] = "micro_elasticity_16cubed_mg_solves_per_sec"
        rows.append(r)

    # Flagship-beam END-TO-END with dedup (round-4 verdict item 8): the
    # production fast path users actually hit on the rotated-fiber
    # example — x-independent Hooke + 6 distinct stratified-map heights
    # dedups 4320 macro cells to a handful of unique cell problems.
    # Fresh model per rep (the honest one-shot UX, including retrace).
    if on_tpu:
        rows.append(_beam_dedup_row(dtype))
    return rows


def _beam_dedup_row(dtype):
    from hommx_tpu import (
        LinearElasticityStratifiedHMM,
        create_box,
        create_unit_cube,
        dirichletbc,
    )
    from hommx_tpu.ops.function_space import boundary_dofs
    from hommx_tpu.utils.validation import hooke_tensor

    W = 0.4

    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)

    def Dt3(x):
        g = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(g), jnp.sin(g)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    macro = create_box([[0, 0, 0], [1.0, W, 0.1]], [20, 6, 6])
    micro = create_unit_cube(4)
    h = LinearElasticityStratifiedHMM(
        macro, A_el, lambda x: jnp.array([0.0, 0.0, -0.008]),
        micro, 2**-5, Dt3, dtype=dtype, dedup_cells=True,
    )
    h.set_boundary_conditions(
        dirichletbc(
            np.zeros(3),
            boundary_dofs(h.function_space, lambda x: np.isclose(x[0], 0)),
            h.function_space,
        )
    )
    # cold = the one-shot UX (construction + traces + compiles + solve)
    t0 = time.perf_counter()
    u = h.solve()
    cold = time.perf_counter() - t0
    check0 = float(jnp.sum(u.array * u.array))
    assert np.isfinite(check0)
    # warm = the production fast path: re-run the FULL pipeline (dedup'd
    # micro stage + macro solve) on the compiled programs — what a
    # parameter sweep or repeated solve actually pays.  Only the A*
    # cache is dropped; the fingerprint classes are input-determined and
    # legitimately persist.
    times, checks = [], []
    for _ in range(5):
        h._A_star = None
        t0 = time.perf_counter()
        u = h.solve()
        checks.append(float(jnp.sum(u.array * u.array)))
        times.append(time.perf_counter() - t0)
    assert all(np.isfinite(checks)) and len(set(checks)) == 1
    assert abs(checks[0] - check0) < 1e-6 * max(abs(check0), 1e-30)
    dt = float(np.median(times))
    return {
        "metric": "beam_dedup_end_to_end_s",
        "value": round(dt, 3),
        "unit": "s",
        "reps_ms": [round(t * 1e3, 1) for t in times],
        "spread_pct": round(100.0 * (max(times) - min(times)) / dt, 1),
        "trimmed_value": round(_trimmed(times), 3),
        "cold_s": round(cold, 2),
        "n_unique": getattr(h, "_n_unique", None),
    }


if __name__ == "__main__":
    main()
