"""Profile the beam macro stage internals on TPU (round 3).

The beam's warm solve is ~0.47 s with the micro stage at ~166 ms; the
remaining cost is the f64 macro stage.  This script times each macro
sub-phase as its own warm jitted call (subtract the ~27 ms dispatch
floor per call when reading the numbers) to locate the dominant cost:
  - S_loc einsum (emulated f64 on TPU)
  - assemble_ell scatter (f64)
  - apply_dirichlet (f64)
  - dense_solve_ell mixed-precision refinement (cho_factor + 8 sweeps)
Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/macro_profile.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu import (
    LinearElasticityStratifiedHMM, create_box, create_unit_cube,
    dirichletbc,
)
from hommx_tpu.ops.function_space import boundary_dofs
from hommx_tpu.utils.validation import hooke_tensor
from hommx_tpu.ops.solvers import dense_solve_ell
from hommx_tpu.ops.assembly import assemble_ell, apply_dirichlet


def timed(label, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    # sync via scalar readback (device->host bulk readback is ~10 MB/s)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{label:34s} med {1e3*np.median(ts):8.1f} ms  min {1e3*min(ts):8.1f}")
    return out


def main():
    W = 0.4

    def Dtheta3(x):
        gamma = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(gamma), jnp.sin(gamma)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    circ = lambda a, b: (
        jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5))) ** 2
        + jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5))) ** 2
    ) < (2 * jnp.pi) ** 2 / 16
    mu = lambda x, y: jnp.where(circ(y[1], y[2]), 100.0, 0.001)
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)

    macro = create_box([[0, 0, 0], [1.0, W, 0.1]], [20, 6, 6])
    micro = create_unit_cube(4)
    s = LinearElasticityStratifiedHMM(
        macro, A_el, lambda x: jnp.array([0.0, 0.0, -0.008]), micro, 2**-5,
        Dtheta3, dtype=jnp.float32, dedup_cells=True)
    s.set_boundary_conditions(
        dirichletbc(np.zeros(3),
                    boundary_dofs(s.function_space, lambda x: np.isclose(x[0], 0)),
                    s.function_space))

    print("warm-up solve (compiles everything)...")
    t0 = time.perf_counter()
    u = s.solve()
    print(f"cold solve: {time.perf_counter()-t0:.2f} s; diag={s.diagnostics}")
    for rep in range(3):
        t0 = time.perf_counter()
        u = s.solve()
        dt = time.perf_counter() - t0
        d = s.diagnostics
        print(f"warm solve {rep}: {dt:.3f} s  micro {d['micro_seconds']:.3f} "
              f"macro {d['macro_seconds']:.3f}")

    # --- macro internals ---
    sys = s._sys
    A_star = jax.block_until_ready(s.homogenized_tensors())
    from hommx_tpu.models.common import merge_bcs
    mask, bvals = merge_bcs(s._bcs, s._V_macro.num_dofs, jnp.float64)
    b = s._b_load
    nd = int(b.shape[0])
    print(f"macro dofs: {nd}, cells: {sys.cells.shape[0]}")

    strain_P = sys.strain_P64

    def sloc(A_star):
        A_T = jnp.swapaxes(A_star, -1, -2).astype(jnp.float64)
        return jnp.einsum("c,cmr,crt,cnt->cmn", sys.vols64, strain_P, A_T,
                          sys.strain_P64)

    S_loc = timed("S_loc einsum (f64)", jax.jit(sloc), A_star)
    vals = timed("assemble_ell (f64)", jax.jit(
        lambda S: assemble_ell(sys.pattern, S, sys.slots)), S_loc)
    vals_bc, b_bc = timed("apply_dirichlet (f64)", jax.jit(
        lambda v: apply_dirichlet(v, sys.cols, sys.diag_slots, b, mask,
                                  bvals, dia=sys.dia)), vals)
    x = timed("dense_solve_ell (mixed prec)", jax.jit(
        lambda v, bb: dense_solve_ell(v, sys.cols, bb, dia=sys.dia)),
              vals_bc, b_bc)

    # factor-backend A/B (round 3: explicit-inverse PCG refinement)
    from hommx_tpu.ops.solvers import _mixed_refine_ell

    timed("  _mixed_refine_ell xla", jax.jit(
        lambda v, bb: _mixed_refine_ell(v, sys.cols, bb,
                                        factor_backend="xla")),
          vals_bc, b_bc)
    timed("  _mixed_refine_ell scan", jax.jit(
        lambda v, bb: _mixed_refine_ell(v, sys.cols, bb,
                                        factor_backend="scan")),
          vals_bc, b_bc)

    # the fused program, as solve() runs it
    asm, _ = s._macro_jit
    timed("fused macro program", asm, A_star, mask, bvals, b)

    # breakdown of the dense solve: factorization vs refinement sweeps
    from hommx_tpu.ops.sparse import ell_to_dense, spmv

    def facto(vals):
        A32 = ell_to_dense(vals.astype(jnp.float32), sys.cols)
        A32 = 0.5 * (A32 + A32.T)
        diag = jnp.einsum("nk,nk->n",
                          vals.astype(jnp.float32).reshape(nd, -1),
                          (sys.cols == jnp.arange(nd)[:, None]).astype(jnp.float32))
        sc = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
        As = sc[:, None] * A32 * sc[None, :]
        c, _ = jax.scipy.linalg.cho_factor(As)
        return c

    c32 = timed("  cho_factor f32 (3087^2)", jax.jit(facto), vals_bc)

    def sweeps(c32, vals, b):
        vals64 = vals.astype(jnp.float64)
        b64 = b.astype(jnp.float64)

        def body(x, _):
            r = b64 - spmv(vals64, sys.cols, x)
            dz = jax.scipy.linalg.cho_solve((c32, False), r.astype(jnp.float32))
            return x + dz.astype(jnp.float64), None

        x, _ = jax.lax.scan(body, jnp.zeros_like(b64), None, length=8)
        return x

    timed("  8 refinement sweeps", jax.jit(sweeps), c32, vals_bc, b_bc)

    def one_solve(c32, b):
        return jax.scipy.linalg.cho_solve((c32, False), b.astype(jnp.float32))

    timed("  1 cho_solve (tri solves)", jax.jit(one_solve), c32, b_bc)


if __name__ == "__main__":
    main()
