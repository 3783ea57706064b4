"""DIA sparse format and the Pallas TPU SpMV kernel (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import create_unit_cube, create_unit_square, mesh_from_delaunay
from hommx_tpu.ops import dia as diam
from hommx_tpu.ops.assembly import assemble_ell, assemble_p1_stiffness_local
from hommx_tpu.ops.sparse import build_ell_pattern, spmv


def _matrix_for(mesh):
    verts = jnp.asarray(mesh.vertices)
    cells = jnp.asarray(mesh.cells)
    pat = build_ell_pattern(mesh.cells, mesh.num_vertices)
    coeff = jnp.broadcast_to(
        jnp.eye(mesh.dim) * 2.0 + 0.1, (mesh.num_cells, mesh.dim, mesh.dim)
    )
    S = assemble_p1_stiffness_local(verts, cells, coeff)
    vals = assemble_ell(pat, S, jnp.asarray(pat.slots))
    return pat, vals


@pytest.mark.parametrize("make", [lambda: create_unit_square(13), lambda: create_unit_cube(5)])
def test_dia_matches_ell(make):
    mesh = make()
    pat, vals = _matrix_for(mesh)
    d = diam.build_dia_from_ell(pat)
    assert d is not None
    dv = diam.ell_vals_to_dia(d, vals)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(mesh.num_vertices))
    y_ell = spmv(vals, jnp.asarray(pat.cols), x)
    y_dia = diam.dia_spmv(dv, d.offsets, x)
    assert np.allclose(np.asarray(y_ell), np.asarray(y_dia), atol=1e-12)


@pytest.mark.parametrize("make", [lambda: create_unit_square(13), lambda: create_unit_cube(5)])
def test_pallas_kernel_matches(make):
    """The Pallas DIA kernel (interpret mode on CPU) reproduces the ELL SpMV."""
    mesh = make()
    pat, vals = _matrix_for(mesh)
    d = diam.build_dia_from_ell(pat)
    dv = diam.ell_vals_to_dia(d, vals).astype(jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(mesh.num_vertices), jnp.float32
    )
    y_ell = spmv(vals.astype(jnp.float32), jnp.asarray(pat.cols), x)
    y_pl = diam.dia_spmv_pallas(dv, d.offsets, x, block=1024)
    assert np.allclose(np.asarray(y_ell), np.asarray(y_pl), atol=1e-4)


def test_unstructured_mesh_falls_back():
    """Unstructured meshes have too many offsets — DIA conversion declines."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(3)
    pts = np.concatenate(
        [np.array([[0, 0], [1, 0], [0, 1], [1, 1.0]]), rng.uniform(0, 1, (120, 2))]
    )
    mesh = mesh_from_delaunay(pts, Delaunay(pts).simplices)
    pat, _ = _matrix_for(mesh)
    d = diam.build_dia_from_ell(pat)
    assert d is None  # solve path then stays on gather-based ELL


def test_random_offsets_pallas():
    """Kernel handles assorted offset patterns incl. multi-vreg shifts."""
    N = 5000
    offsets = (-2050, -129, -1, 0, 3, 128, 1029)
    rng = np.random.default_rng(4)
    dv = jnp.asarray(rng.standard_normal((len(offsets), N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    y_ref = diam.dia_spmv(dv, offsets, x)
    y = diam.dia_spmv_pallas(dv, offsets, x, block=1024)
    assert np.allclose(np.asarray(y_ref), np.asarray(y), atol=1e-4)


def test_pallas_matvec_inside_cg_while_loop():
    """The production TPU CG runs the Pallas kernel inside lax.while_loop
    (ops/solvers.py); gate the composition here in interpret mode so the
    CPU CI covers the code shape even though the real kernel is TPU-only."""
    import jax

    from hommx_tpu.ops.solvers import pcg_prec

    N = 2000
    offsets = (-129, -1, 0, 1, 129)
    rng = np.random.default_rng(5)
    dv = np.abs(rng.standard_normal((len(offsets), N))).astype(np.float32)
    # make it SPD-ish: dominant diagonal
    dv[2] = np.sum(np.abs(dv), axis=0) + 1.0
    dv = jnp.asarray(dv)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32)
    dinv = 1.0 / dv[2]

    def mv_pallas(v):
        return diam.dia_spmv_pallas(dv, offsets, v, block=1024, interpret=True)

    def mv_ref(v):
        return diam.dia_spmv(dv, offsets, v)

    x_p, it_p, _ = jax.jit(
        lambda b: pcg_prec(mv_pallas, lambda r: dinv * r, b, rtol=1e-5,
                           atol=0.0, maxiter=200)
    )(b)
    x_r, it_r, _ = pcg_prec(mv_ref, lambda r: dinv * r, b, rtol=1e-5,
                            atol=0.0, maxiter=200)
    assert np.allclose(np.asarray(x_p), np.asarray(x_r), atol=1e-4)
    assert abs(int(it_p) - int(it_r)) <= 1


def test_dia_spmv_cols_matches_per_column():
    """dia_spmv_cols (multi-RHS) agrees with dia_spmv applied per column."""
    mesh = create_unit_square(9)
    pat, vals = _matrix_for(mesh)
    d = diam.build_dia_from_ell(pat)
    dv = diam.ell_vals_to_dia(d, vals)
    X = jnp.asarray(
        np.random.default_rng(7).standard_normal((mesh.num_vertices, 4))
    )
    Y = diam.dia_spmv_cols(dv, d.offsets, X)
    for b in range(X.shape[1]):
        yb = diam.dia_spmv(dv, d.offsets, X[:, b])
        assert np.allclose(np.asarray(Y[:, b]), np.asarray(yb), atol=1e-12)
