"""TPU check: df macro assembly accuracy + beam warm-solve timing.

Runs the golden elasticity_stratified_3d configuration on the TPU (df
assembly default) and compares the solution functionals to the frozen
f64 CPU golden values, then times the full-size beam warm solve with the
df assembly vs the emulated-f64 assembly (HOMMX_MACRO_ASSEMBLY=f64).
Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/df_check.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from hommx_tpu import (
    LinearElasticityStratifiedHMM, create_box, create_unit_cube, dirichletbc,
)
from hommx_tpu.ops.function_space import boundary_dofs
from hommx_tpu.utils.validation import hooke_tensor


def beam(n=(20, 6, 6), micro_n=4, dtype=jnp.float32):
    W = 0.4

    def circ(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < ((2 * jnp.pi) ** 2 / 16)

    mu = lambda x, y: jnp.where(circ(y[1], y[2]), 100.0, 0.001)
    A = hooke_tensor(3, mu, lambda x, y: 1.0)

    def Dtheta(x):
        gamma = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(gamma), jnp.sin(gamma)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    s = LinearElasticityStratifiedHMM(
        create_box([[0, 0, 0], [1.0, W, 0.1]], list(n)), A,
        lambda x: jnp.array([0.0, 0.0, -0.008]), create_unit_cube(micro_n),
        2**-5, Dtheta, dtype=dtype)
    s.set_boundary_conditions(dirichletbc(
        np.zeros(3), boundary_dofs(s.function_space,
                                   lambda x: np.isclose(x[0], 0)),
        s.function_space))
    return s


def functionals(s, u):
    from hommx_tpu.ops.assembly import l2_norm_fn
    verts = jnp.asarray(s._V_macro.mesh.vertices)
    cells = jnp.asarray(s._V_macro.mesh.cells)
    arr = u.array.reshape(-1, 3)
    outs = []
    for c in range(3):
        outs.append(float(l2_norm_fn(verts, cells, arr[:, c].astype(jnp.float64))))
    return outs


def main():
    print("backend:", jax.default_backend())
    # --- accuracy: golden config ---
    s = beam(n=(5, 2, 2), micro_n=3)
    u = s.solve()
    from hommx_tpu.ops.assembly import l2_norm_fn
    verts = jnp.asarray(s._V_macro.mesh.vertices, jnp.float64)
    cells = jnp.asarray(s._V_macro.mesh.cells)
    l2 = float(l2_norm_fn(verts, cells, u.array.astype(jnp.float64)))
    mx = float(jnp.max(jnp.abs(u.array)))
    print(f"golden cfg: l2={l2!r} max={mx!r}")
    print("frozen f64 golden: (0.0003321179417961123, 0.05658411139956721)")
    print(f"rel l2 diff vs golden: {abs(l2-0.0003321179417961123)/0.0003321179417961123:.3e}")
    print(f"rel max diff vs golden: {abs(mx-0.05658411139956721)/0.05658411139956721:.3e}")

    # --- timing: full beam, df vs f64 assembly ---
    for mode in ("df", "f64"):
        os.environ["HOMMX_MACRO_ASSEMBLY"] = mode
        s = beam()
        t0 = time.perf_counter()
        u = s.solve()
        float(jnp.sum(u.array.astype(jnp.float32)))
        cold = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            u = s.solve()
            float(jnp.sum(u.array.astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        d = s.diagnostics
        print(f"{mode}: cold {cold:.1f}s warm med {1e3*np.median(times):.0f} ms "
              f"(min {1e3*min(times):.0f})  macro {d['macro_seconds']*1e3:.0f} ms "
              f"micro {d['micro_seconds']*1e3:.0f} ms")
        tip = float(jnp.max(jnp.abs(u.array)))
        print(f"   max|u| = {tip!r}")
    os.environ.pop("HOMMX_MACRO_ASSEMBLY")


if __name__ == "__main__":
    main()
