#!/usr/bin/env python
"""A/B: Kron-map Kc assembly vs the class-P strain-factored assembly.

The elasticity strain map factors as T = S . R_M (static symmetrizer
compose per-cell rotation), and S^T A S is a PERMUTE-ADD of the raw Hooke
blocks, so the per-pair stiffness weights

    w[(a,i),(b,j)] = (M g_a)^T Asym[(.,i),(.,j)] (M g_b)

need ONE batched (pairs, d^2) @ (d^2, ncell*d^2) matmul per element class
(structured meshes have nt classes with shared gradients) instead of the
81x81 TkT Kron contractions (30 GMAC -> 2.2 GMAC on the beam chunk).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/kc_classp.py [--cpu]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def classp_blocks_flat(eng, Ae, Mrot):
    """(C, nE*nbl^2) element blocks via the class-P factored contraction.

    Ae: (C, nE, r, r) raw coefficient blocks; Mrot: (C, d, d) or None.
    """
    C, nE = Ae.shape[0], eng.nE
    d = eng.d
    nv = d + 1
    npair = nv * nv
    r = eng.r
    # static: class structure + per-class vertex gradients
    Draw = np.asarray(eng.Draw, dtype=np.float64)
    keys = {}
    cls = np.array([keys.setdefault(Draw[e].tobytes(), len(keys))
                    for e in range(nE)])
    nt = len(keys)
    assert np.array_equal(cls, np.tile(np.arange(nt), nE // nt))
    ncell = nE // nt
    grads = np.zeros((nt, nv, d))
    for t in range(nt):
        for a in range(nv):
            grads[t, a] = Draw[t, 0:d, a * d]  # component-0 block row
    grads_j = jnp.asarray(grads, dtype=Ae.dtype)

    # Asym = S A S: permute-adds over the (i,j) row / (k,l) col indices
    perm = np.arange(r).reshape(d, d).T.reshape(-1)
    Asym = 0.25 * (
        Ae + Ae[:, :, perm, :] + Ae[:, :, :, perm] + Ae[:, :, perm][:, :, :, perm]
    )
    # Ar2[(i',j'), (i,j)] = Asym[(i'*d+i), (j'*d+j)]: static index permute
    xi, yi = np.meshgrid(np.arange(r), np.arange(r), indexing="ij")
    ip, jp = xi // d, xi % d
    i_, j_ = yi // d, yi % d
    src_r = ip * d + i_
    src_c = jp * d + j_
    Ar2 = Asym[:, :, src_r, src_c]  # (C, nE, r, r)
    Ar2 = Ar2.reshape(C, ncell, nt, r, r)

    # P[c,t,(a,b),(i',j')] = (M g_a)[i'] (M g_b)[j']
    if Mrot is None:
        Mg = jnp.broadcast_to(grads_j, (C, nt, nv, d))
    else:
        Mg = jnp.einsum("ciq,tav->ctai"[:-1] + "v->ctai",
                        Mrot, grads_j) if False else jnp.einsum(
            "ciq,taq->ctai", Mrot, grads_j)
    P = jnp.einsum("ctai,ctbj->ctabij", Mg, Mg).reshape(
        C, nt, npair, d * d
    )
    # batched matmul per (c, t): (npair, d2) @ (d2, ncell*r)
    Ar2m = jnp.transpose(Ar2, (0, 2, 3, 1, 4)).reshape(
        C, nt, d * d, ncell * r
    )
    w = jnp.einsum("ctpx,ctxy->ctpy", P, Ar2m)  # (C, nt, npair, ncell*r)
    # -> blocks[c, e=(g,t), (a,i),(b,j)]
    w = w.reshape(C, nt, nv, nv, ncell, d, d)
    blocks = jnp.transpose(w, (0, 4, 1, 2, 5, 3, 6))  # c,g,t,a,i,b,j
    return blocks.reshape(C, -1)


def kron_blocks_flat(eng, Ae, T):
    C, nE, r = Ae.shape[0], eng.nE, eng.r
    TkT = jnp.einsum("cmr,ctn->cmtrn", T, T).reshape(C, r * r, r * r)
    AKv = jnp.einsum("cex,cxy->cey", Ae.reshape(C, nE, r * r), TkT)
    return jnp.einsum("cex,exy->cey", AKv, eng._get_kron_M()).reshape(C, -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--C", type=int, default=4320)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hommx_tpu import create_unit_cube
    from hommx_tpu.micro.engine import MicroEngine, _sym_map
    from hommx_tpu.utils.validation import hooke_tensor

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64
    eng = MicroEngine(create_unit_cube(4), bs=3, coeff_kind="tensor4",
                      dtype=dtype, solver="cholesky")
    C = args.C

    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(
        circle(y[1], y[2]), 100.0 * (1.0 + 0.001 * x[0]), 0.001
    )
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)
    W = 0.4

    def G_fn(x):
        g = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(g), jnp.sin(g)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    rng = np.random.default_rng(0)
    centers = [jnp.asarray(rng.uniform(0, 1, (C, 3)), dtype=dtype)
               for _ in range(4)]

    with jax.default_matmul_precision("highest"):
        def raw(cs):
            Ae = jax.vmap(lambda x: eng._raw_coeff(A_el, x))(cs)
            Mrot = jax.vmap(lambda x: jnp.asarray(G_fn(x), dtype=dtype))(cs)
            return Ae, Mrot

        def route_kron(cs):
            Ae, Mrot = raw(cs)
            T = jax.vmap(_sym_map)(Mrot)
            return kron_blocks_flat(eng, Ae, T)

        def route_classp(cs):
            Ae, Mrot = raw(cs)
            return classp_blocks_flat(eng, Ae, Mrot)

        jk = jax.jit(route_kron)
        jc = jax.jit(route_classp)
        jr = jax.jit(raw)

        def timed(label, jfn, reps=3):
            out = jfn(centers[0])
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                out = jfn(centers[1 + i])
                float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
                ts.append(time.perf_counter() - t0)
            print(f"{label:16s} med {1e3 * np.median(ts):7.1f} ms")
            return out

        b0 = timed("raw coeff", jr)
        b1 = timed("kron", jk)
        b2 = timed("classp", jc)
        rel = float(jnp.max(jnp.abs(b2 - b1)) / jnp.max(jnp.abs(b1)))
        print(f"classp vs kron rel: {rel:.2e}")


if __name__ == "__main__":
    main()
