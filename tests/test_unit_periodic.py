"""Periodic constraint structure tests.

Mirror of the reference's unit tests (``test/unit/test_unit.py:25-103``):
only boundary dofs are slaves, each slave's master is one lattice vector
away (faces) or the multi-axis fold (edges/corners), the far corner maps to
the origin.
"""

import numpy as np
import pytest

from hommx_tpu import create_unit_cube, create_unit_square
from hommx_tpu.micro.periodic import build_periodic_map


def test_periodic_boundary_conditions_unit_square():
    msh = create_unit_square(10, 10)
    pmap = build_periodic_map(msh)
    points = msh.vertices
    boundary = set(msh.boundary_vertices().tolist())

    slaves = set(np.nonzero(pmap.is_slave)[0].tolist())
    for dof in range(len(points)):
        if dof not in boundary:
            assert dof not in slaves, "Non boundary DoF should not be constrained"
        if np.allclose(points[dof], [1, 1]):
            assert dof in slaves
            master = pmap.masters[dof]
            assert np.allclose(points[master], [0, 0]), (
                "DoF at (1, 1) should be slave of DoF at (0, 0)"
            )
            continue
        if dof in slaves:
            master = pmap.masters[dof]
            assert master in boundary, "Master DoF should also be a boundary DoF"
            diff = np.abs(points[master] - points[dof])
            assert np.allclose(diff, [1, 0]) or np.allclose(diff, [0, 1])


def test_periodic_boundary_conditions_unit_cube():
    msh = create_unit_cube(10)
    pmap = build_periodic_map(msh)
    points = msh.vertices
    boundary = set(msh.boundary_vertices().tolist())
    slaves = set(np.nonzero(pmap.is_slave)[0].tolist())

    for dof in range(len(points)):
        if dof not in boundary:
            assert dof not in slaves
        if np.allclose(points[dof], [1, 1, 1]):
            assert dof in slaves
            assert np.allclose(points[pmap.masters[dof]], [0, 0, 0])
            continue
        handled = False
        for i, j in ((0, 1), (0, 2), (1, 2)):
            if np.allclose(points[dof][[i, j]], [1, 1]):
                assert dof in slaves
                assert np.allclose(points[pmap.masters[dof]][[i, j]], [0, 0])
                handled = True
        if handled:
            continue
        if dof in slaves:
            master = pmap.masters[dof]
            assert master in boundary
            diff = np.abs(points[master] - points[dof])
            assert (
                np.allclose(diff, [1, 0, 0])
                or np.allclose(diff, [0, 1, 0])
                or np.allclose(diff, [0, 0, 1])
            )


def test_reduced_count_2d():
    msh = create_unit_square(8, 8)
    pmap = build_periodic_map(msh)
    # 9x9 grid -> 8x8 reduced periodic lattice
    assert pmap.n_reduced == 64
    # expansion is a projection: reduced values land on both master and slave
    u_red = np.arange(pmap.n_reduced, dtype=float)
    u = pmap.expand(u_red)
    assert u.shape == (81,)
    for v in np.nonzero(pmap.is_slave)[0]:
        assert u[v] == u[pmap.masters[v]]


def test_periodic_1d_raises():
    from hommx_tpu import create_interval

    with pytest.raises(ValueError):
        build_periodic_map(create_interval(4))


def test_non_matching_faces_raise():
    """A mesh whose opposing faces don't match periodically must raise."""
    from hommx_tpu.meshes.simplex import SimplexMesh

    # unit square with an extra midpoint on the right face only
    verts = np.array(
        [[0, 0], [1, 0], [0, 1], [1, 1], [1, 0.5], [0.5, 0.5]], dtype=float
    )
    cells = np.array([[0, 1, 5], [1, 4, 5], [4, 3, 5], [3, 2, 5], [2, 0, 5]])
    msh = SimplexMesh(verts, cells)
    with pytest.raises(ValueError, match="periodic"):
        build_periodic_map(msh)
