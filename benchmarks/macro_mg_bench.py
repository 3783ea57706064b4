#!/usr/bin/env python
"""Macro-stage multigrid benchmark: MG-PCG vs Jacobi-CG vs dense direct.

Run on the accelerator (no platform forcing).  Prints one JSON line per
configuration: iteration counts, warm solve milliseconds, and the crossover
evidence used to tune ``SolverOptions.direct_threshold``
(docs/performance.md records results).
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _bench(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda o: np.asarray(o), out)  # host sync
    t0 = time.perf_counter()
    out = fn(*args)
    s = jax.tree_util.tree_map(lambda o: float(np.asarray(o).ravel()[0]), out)
    return time.perf_counter() - t0, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="substring filter on config name")
    cli = ap.parse_args()

    from hommx_tpu.meshes import create_box, create_unit_square
    from hommx_tpu.models.common import MacroSystem, merge_bcs
    from hommx_tpu.models.fem import fem_assemble_values, _load_vector
    from hommx_tpu.ops.assembly import apply_dirichlet
    from hommx_tpu.ops.dia import dia_spmv, ell_vals_to_dia
    from hommx_tpu.ops.function_space import (
        FunctionSpace,
        dirichletbc,
        locate_dofs_geometrical,
    )
    from hommx_tpu.ops.multigrid import build_mg_structure, mg_setup, mg_vcycle
    from hommx_tpu.ops.solvers import _ell_diag, cg_matfree, pcg_prec

    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64
    rtol = 1e-6 if on_tpu else 1e-10

    def hooke(x):
        lam = 1.0 + 5.0 * x[1]
        mu = 0.5 + 2.0 * x[0]
        eye = jnp.eye(3)
        return lam * jnp.einsum("ij,kl->ijkl", eye, eye) + mu * (
            jnp.einsum("ik,jl->ijkl", eye, eye)
            + jnp.einsum("il,jk->ijkl", eye, eye)
        )

    configs = [
        (
            "poisson-256",
            create_unit_square(256, 256),
            1,
            lambda x: 1.0 + 0.9 * jnp.sin(4 * x[0]) * jnp.cos(4 * x[1]),
            "scalar",
            lambda x: np.isclose(x[0], 0) | np.isclose(x[0], 1),
        ),
        (
            "poisson-512",
            create_unit_square(512, 512),
            1,
            lambda x: 1.0 + 0.9 * jnp.sin(4 * x[0]) * jnp.cos(4 * x[1]),
            "scalar",
            lambda x: np.isclose(x[0], 0) | np.isclose(x[0], 1),
        ),
        (
            "beam-40x12x12",
            create_box([[0, 0, 0], [1, 0.4, 0.1]], [40, 12, 12]),
            3,
            hooke,
            "tensor4",
            lambda x: np.isclose(x[0], 0.0),
        ),
    ]

    for name, mesh, bs, coeff, kind, marker in configs:
        if cli.only and cli.only not in name:
            continue
        V = FunctionSpace(mesh, bs)
        sys = MacroSystem(V, dtype)
        rhs = (
            (lambda x: jnp.asarray(1.0))
            if bs == 1
            else (lambda x: jnp.asarray([0.0, 0.0, -1.0]))
        )
        dofs = locate_dofs_geometrical(V, marker)
        bc = dirichletbc(0.0 if bs == 1 else np.zeros(bs), dofs, V)
        mask, bvals = merge_bcs([bc], V.num_dofs, dtype)

        # assembly must be jitted: eager ops on the axon backend each pay a
        # remote compile (+~25ms dispatch), so an eager 512² assembly alone
        # takes minutes
        @jax.jit
        def assemble(mask, bvals):
            vals = fem_assemble_values(sys, coeff, kind, 2)
            b = _load_vector(sys, rhs, 2)
            return apply_dirichlet(
                vals, sys.cols, sys.diag_slots, b, mask, bvals, dia=sys.dia
            )

        vals_bc, b_bc = jax.block_until_ready(assemble(mask, bvals))
        mg = build_mg_structure(mesh.structure, bs, sys.dia)

        @jax.jit
        def solve_mg(v, r):
            dv = ell_vals_to_dia(sys.dia, v)
            st = mg_setup(mg, dv)
            mv = lambda u: dia_spmv(dv, sys.dia.offsets, u)
            return pcg_prec(
                mv, lambda rr: mg_vcycle(mg, st, rr), r,
                rtol=rtol, atol=0.0, maxiter=5000,
            )

        @jax.jit
        def solve_j(v, r):
            dv = ell_vals_to_dia(sys.dia, v)
            mv = lambda u: dia_spmv(dv, sys.dia.offsets, u)
            return cg_matfree(
                mv, _ell_diag(v, sys.cols), r,
                rtol=rtol, atol=0.0, maxiter=50000,
            )

        t0 = time.perf_counter()
        x, it, res = solve_mg(vals_bc, b_bc)
        x = jax.block_until_ready(x)
        chk = float(np.abs(np.asarray(x)).max())
        compile_mg = time.perf_counter() - t0
        t_mg, (x_mg, it_mg, res_mg) = _bench(solve_mg, vals_bc, b_bc)

        t0 = time.perf_counter()
        out = jax.block_until_ready(solve_j(vals_bc, b_bc))
        compile_j = time.perf_counter() - t0
        t_j, (x_j, it_j, res_j) = _bench(solve_j, vals_bc, b_bc)
        diff = float(
            jnp.max(jnp.abs(x_mg - x_j)) / (jnp.max(jnp.abs(x_j)) + 1e-30)
        )
        print(
            json.dumps(
                {
                    "config": name,
                    "dofs": int(V.num_dofs),
                    "mg_iters": int(it_mg),
                    "mg_ms": round(t_mg * 1e3, 1),
                    "mg_compile_s": round(compile_mg, 1),
                    "jacobi_iters": int(it_j),
                    "jacobi_ms": round(t_j * 1e3, 1),
                    "sol_diff": diff,
                    "max_u": chk,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
