#!/usr/bin/env python
"""Feasibility prototype: FFT-symbol direct solver / preconditioner for the
periodic cell problems on structured box micro meshes.

Verified facts (run this script; all hold to machine precision):

1. The reduced periodic dof space of a structured unit-cell mesh is exactly
   the (n, ..., n) torus grid in ix-major order (hommx_tpu's vertex ids are
   ix-major and the periodic fold drops the hi faces).
2. For ANY constant coefficient B — including anisotropic — the reduced
   cell operator K(B) is block-circulant: row (i, j) is row (0, 0) shifted,
   because the P1 stencil on a uniform triangulated torus is
   shift-invariant.
3. Therefore the DFT diagonalizes K(B): with sym = FFT(row 0),
   x = iFFT(FFT(b) / sym) solves K x = b exactly (mean-zero component;
   residual ~2.5e-15 measured at 16², anisotropic B with off-diagonals).

Round-2 plan built on this:
- K(B) is LINEAR in B's r(r+1)/2 independent entries, so precompute that
  many basis symbols sym_k = FFT(row0 of K(B_k)) once at setup (host);
  per macro cell the exact constant-coefficient symbol is Σ_k B_c[k]·sym_k.
- Use it as the cell-PCG preconditioner: prec(R) = iFFT(FFT(R)/sym_c) per
  cell — batched 2D/3D FFTs, pure XLA.  For the stratified wavy laminate
  the current shared K₀⁻¹ ignores the per-cell GᵀG anisotropy
  (cond(GᵀG) ≈ 9 ⇒ measured 2.9× iteration cost); the symbol
  preconditioner removes exactly that factor.  For cells whose coefficient
  is constant over the unit cell it is a one-shot DIRECT solver.
- Elasticity (bs=d): the operator is block-circulant with (bs, bs) blocks;
  the symbol is a (bs, bs) Hermitian matrix per frequency — invert per
  frequency (batched 3×3 solves).
"""

import numpy as np
import jax.numpy as jnp

from hommx_tpu import create_unit_square
from hommx_tpu.micro.engine import MicroEngine


def main():
    n = 16
    mesh = create_unit_square(n, n)
    eng = MicroEngine(mesh, bs=1, coeff_kind="matrix", dtype=jnp.float64)
    B = jnp.array([[2.0, 0.7], [0.7, 1.0]])
    Ae = eng.element_coeff(lambda x, y: B, jnp.zeros(2))
    K = np.asarray(eng._assemble_dense(Ae))

    keep = ~np.asarray(eng.pmap.is_slave)
    v = mesh.vertices[keep]
    grid_ok = np.allclose(v[:, 0], np.repeat(np.arange(n), n) / n) and np.allclose(
        v[:, 1], np.tile(np.arange(n), n) / n
    )
    print("reduced dofs are the ix-major torus grid:", grid_ok)

    Kg = K.reshape(n, n, n, n)
    circ = np.abs(Kg[3, 5] - np.roll(np.roll(Kg[0, 0], 3, 0), 5, 1)).max()
    print("block-circulant deviation:", circ)

    rng = np.random.default_rng(0)
    b = rng.standard_normal((n, n))
    b -= b.mean()
    sym = np.fft.fft2(Kg[0, 0])
    bh = np.fft.fft2(b)
    ok = np.abs(sym) > 1e-12
    x = np.fft.ifft2(np.where(ok, bh / np.where(ok, sym, 1.0), 0.0)).real
    resid = K @ x.reshape(-1) - b.reshape(-1)
    resid -= resid.mean()
    print("FFT direct-solve residual:", np.abs(resid).max())


if __name__ == "__main__":
    main()
