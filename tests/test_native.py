"""Native C++ host runtime: equivalence against the numpy fallbacks."""

import numpy as np
import pytest

from hommx_tpu import create_unit_cube, create_unit_square, mesh_from_delaunay
from hommx_tpu import native


requires_native = pytest.mark.skipif(
    not native.available, reason="native host runtime not built"
)


def test_native_builds():
    """The toolchain exists in this image, so the native module must load."""
    assert native.available


@requires_native
@pytest.mark.parametrize("make", [lambda: create_unit_square(9), lambda: create_unit_cube(4)])
def test_ell_pattern_matches_numpy(make):
    import os

    mesh = make()
    res = native.build_ell_pattern_native(mesh.cells, mesh.num_vertices)
    assert res is not None
    cols_n, slots_n, diag_n, K_n = res

    os.environ["HOMMX_TPU_NO_NATIVE"] = "1"
    try:
        # numpy reference path (force fallback by calling the internals)
        from hommx_tpu.ops import sparse as sp

        nc, nb = mesh.cells.shape
        num_dofs = mesh.num_vertices
        rows = np.repeat(mesh.cells, nb, axis=1).reshape(-1)
        cols = np.tile(mesh.cells, (1, nb)).reshape(-1)
        keys = rows.astype(np.int64) * num_dofs + cols
        uniq, inverse = np.unique(keys, return_inverse=True)
        urows = (uniq // num_dofs).astype(np.int64)
        ucols = (uniq % num_dofs).astype(np.int64)
        counts = np.bincount(urows, minlength=num_dofs)
        K = int(counts.max())
        assert K == K_n
        row_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos_in_row = np.arange(uniq.shape[0]) - row_starts[urows]
        pair_slot = (urows * K + pos_in_row).astype(np.int64)
        cols_ref = np.zeros((num_dofs, K), dtype=np.int32)
        cols_ref.reshape(-1)[pair_slot] = ucols
        slots_ref = pair_slot[inverse].reshape(nc, nb, nb)
        assert (cols_n == cols_ref).all()
        assert (slots_n == slots_ref).all()
        # diagonal slots point at (r, r)
        flat_cols = cols_n.reshape(-1)
        assert (flat_cols[diag_n] == np.arange(num_dofs)).all()
    finally:
        del os.environ["HOMMX_TPU_NO_NATIVE"]


@requires_native
def test_periodic_match_matches_python():
    mesh = create_unit_cube(6)
    masters_n, slave_n = native.periodic_match_native(mesh.vertices)
    # python path
    x = mesh.vertices
    lo, hi = x.min(axis=0), x.max(axis=0)
    on_hi = np.isclose(x, hi[None, :])
    is_slave = on_hi.any(axis=1)
    assert (slave_n == is_slave).all()
    target = np.where(on_hi, lo[None, :], x)
    for v in np.nonzero(is_slave)[0]:
        assert np.allclose(mesh.vertices[masters_n[v]], target[v])


@requires_native
def test_locate_cells_matches():
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(7)
    pts = np.concatenate(
        [np.array([[0, 0], [1, 0], [0, 1], [1, 1.0]]), rng.uniform(0, 1, (60, 2))]
    )
    mesh = mesh_from_delaunay(pts, Delaunay(pts).simplices)
    q = rng.uniform(0.05, 0.95, (40, 2))
    out = native.locate_cells_native(mesh.vertices, mesh.cells, q)
    assert out is not None
    for p, c in zip(q, out):
        cp = mesh.vertices[mesh.cells[c]]
        T = (cp[1:] - cp[0]).T
        xi = np.linalg.solve(T, p - cp[0])
        lam = np.concatenate([[1 - xi.sum()], xi])
        assert lam.min() > -1e-8


@requires_native
def test_greedy_aggregate_matches_python():
    """Native greedy aggregation produces the IDENTICAL aggregation as the
    Python reference sweep (same seed-in-index-order semantics)."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(9)
    pts = np.concatenate(
        [np.array([[0, 0], [1, 0], [0, 1], [1, 1.0]]), rng.uniform(0, 1, (200, 2))]
    )
    mesh = mesh_from_delaunay(pts, Delaunay(pts).simplices)
    n = mesh.num_vertices
    cells = np.asarray(mesh.cells)
    rows = np.repeat(cells, 3, axis=1).reshape(-1)
    cols = np.tile(cells, (1, 3)).reshape(-1)
    order = np.argsort(rows, kind="stable")
    rows_s, cols_s = rows[order], cols[order]

    out = native.greedy_aggregate_native(rows_s, cols_s, n)
    assert out is not None
    agg_n, na_n = out

    starts = np.searchsorted(rows_s, np.arange(n + 1))
    agg = np.full(n, -1, dtype=np.int64)
    na = 0
    for i in range(n):
        if agg[i] >= 0:
            continue
        agg[i] = na
        for j in cols_s[starts[i] : starts[i + 1]]:
            if agg[j] < 0:
                agg[j] = na
        na += 1
    assert na_n == na
    assert np.array_equal(agg_n, agg)
