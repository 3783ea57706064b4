"""Point evaluation of P1/P2 functions and cross-mesh interpolation.

Replaces DOLFINx ``Function.eval`` (reference ``hmm.py:388-393``) and
``interpolate_nonmatching`` (reference ``test_integration_poisson.py:15-24``).
Point → cell location is analytic on structured box meshes (both grid-box
index and the triangle/tet within the box follow from local coordinates);
unstructured meshes fall back to a host-side uniform-grid binning search.
"""

from __future__ import annotations

import numpy as np

from hommx_tpu.meshes.simplex import SimplexMesh, _KUHN_PERMS

__all__ = ["locate_cells", "eval_p1", "interpolate_nonmatching"]

_PERM_INDEX = {perm: i for i, perm in enumerate(_KUHN_PERMS)}


def locate_cells(mesh: SimplexMesh, points: np.ndarray) -> np.ndarray:
    """Cell index containing each point (host-side; clamped to the domain)."""
    points = np.asarray(points, dtype=np.float64)
    if mesh.structure is not None:
        return _locate_structured(mesh, points)
    return _locate_binned(mesh, points)


def _locate_structured(mesh: SimplexMesh, points: np.ndarray) -> np.ndarray:
    st = mesh.structure
    d = mesh.dim
    n = np.asarray(st.shape)
    h = (st.hi - st.lo) / n
    rel = (points - st.lo) / h  # grid coordinates
    idx = np.clip(np.floor(rel).astype(np.int64), 0, n - 1)  # (np, d)
    loc = np.clip(rel - idx, 0.0, 1.0)  # local coords in box
    if d == 1:
        return idx[:, 0].astype(np.int32)
    if d == 2:
        box = idx[:, 0] * n[1] + idx[:, 1]
        if st.diagonal == "right":
            # t0 = (v00, v10, v11): below the (0,0)->(1,1) diagonal
            tri = np.where(loc[:, 0] >= loc[:, 1], 0, 1)
        else:
            # diagonal='left': t0 = (v00, v10, v01) contains the (0,0)
            # corner, i.e. the region below the (1,0)->(0,1) diagonal
            tri = np.where(loc[:, 0] + loc[:, 1] <= 1.0, 0, 1)
        return (box * 2 + tri).astype(np.int32)
    box = (idx[:, 0] * n[1] + idx[:, 1]) * n[2] + idx[:, 2]
    order = np.argsort(-loc, axis=1, kind="stable")  # descending coord order
    perm_idx = np.array([_PERM_INDEX[tuple(o)] for o in order], dtype=np.int64)
    return (box * 6 + perm_idx).astype(np.int32)


def _locate_binned(mesh: SimplexMesh, points: np.ndarray, bins_per_axis=None) -> np.ndarray:
    """Uniform-grid binning point location for unstructured meshes.

    Dispatches to the native C++ runtime when available."""
    from hommx_tpu import native

    res = native.locate_cells_native(mesh.vertices, mesh.cells, points)
    if res is not None:
        return res
    d = mesh.dim
    lo, hi = mesh.bounding_box()
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    nb = bins_per_axis or max(1, int(round(mesh.num_cells ** (1.0 / d) / 2)))
    cellsv = mesh.vertices[mesh.cells]  # (nc, d+1, d)
    cmin = ((cellsv.min(axis=1) - lo) / span * nb).astype(np.int64).clip(0, nb - 1)
    cmax = ((cellsv.max(axis=1) - lo) / span * nb).astype(np.int64).clip(0, nb - 1)
    # bucket -> cell lists
    buckets = {}
    for c in range(mesh.num_cells):
        ranges = [range(cmin[c, k], cmax[c, k] + 1) for k in range(d)]
        import itertools

        for key in itertools.product(*ranges):
            buckets.setdefault(key, []).append(c)
    pkey = ((points - lo) / span * nb).astype(np.int64).clip(0, nb - 1)
    out = np.zeros(points.shape[0], dtype=np.int32)
    for i, pt in enumerate(points):
        cand = buckets.get(tuple(pkey[i]), None)
        if not cand:
            cand = range(mesh.num_cells)
        best, best_viol = 0, np.inf
        for c in cand:
            lam = _barycentric(mesh.vertices[mesh.cells[c]], pt)
            viol = -min(lam.min(), 0.0)
            if viol < best_viol:
                best, best_viol = c, viol
                if viol <= 1e-12:
                    break
        out[i] = best
    return out


def _barycentric(cell_pts: np.ndarray, pt: np.ndarray) -> np.ndarray:
    d = cell_pts.shape[1]
    T = (cell_pts[1:] - cell_pts[0]).T  # (d, d)
    xi = np.linalg.solve(T, pt - cell_pts[0])
    return np.concatenate([[1.0 - xi.sum()], xi])


def eval_p1(func, points, cells=None):
    """Evaluate a P1/P2 Function at arbitrary points.

    If ``cells`` is given the affine extension of that cell is used even if
    the point lies outside it — matching the reference's
    ``v_macro.eval(..., cells=cells)`` semantics (``hmm.py:388-393``) which
    underpin the macro→micro interpolation.
    """
    import jax.numpy as jnp

    V = func.space
    mesh = V.mesh
    degree = getattr(V, "degree", 1)
    points = np.asarray(points, dtype=np.float64)[:, : mesh.dim]
    if cells is None:
        cells = locate_cells(mesh, points)
    cp = mesh.vertices[mesh.cells[cells]]  # (np, d+1, d)
    T = np.swapaxes(cp[:, 1:, :] - cp[:, :1, :], 1, 2)  # (np, d, d)
    xi = np.linalg.solve(T, (points - cp[:, 0, :])[..., None])[..., 0]
    lam = np.concatenate([1.0 - xi.sum(axis=1, keepdims=True), xi], axis=1)
    if degree == 1:
        nodes = mesh.cells[cells]  # (np, d+1)
        basis = lam
    else:
        from hommx_tpu.ops.p2 import EDGE_PAIRS

        nodes = V.cell_nodes()[cells]  # (np, nb)
        phi_v = lam * (2.0 * lam - 1.0)
        phi_e = np.stack(
            [4.0 * lam[:, i] * lam[:, j] for (i, j) in EDGE_PAIRS[mesh.dim]],
            axis=1,
        )
        basis = np.concatenate([phi_v, phi_e], axis=1)
    uv = np.asarray(func.array).reshape(-1, V.bs)[nodes]  # (np, nb, bs)
    vals = np.einsum("pa,pab->pb", basis, uv)
    return jnp.asarray(vals if V.bs > 1 else vals[:, 0])


def interpolate_nonmatching(V_to, func_from):
    """Interpolate a P1/P2 function onto another space by nodal evaluation.

    Nodal (Lagrange) interpolation: evaluate ``func_from`` at every dof
    coordinate of ``V_to`` — valid for both P1 and P2 targets since both are
    nodal bases.  Reference: ``test_integration_poisson.py:15-24``.
    """
    from hommx_tpu.ops.function_space import Function

    pts = V_to.tabulate_dof_coordinates()
    vals = eval_p1(func_from, pts)
    return Function(V_to, np.asarray(vals).reshape(-1))
