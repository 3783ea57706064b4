"""Mesh and quadrature layer tests (layer 1 of SURVEY.md §7)."""

import numpy as np
import pytest

from hommx_tpu import (
    create_box,
    create_interval,
    create_rectangle,
    create_unit_cube,
    create_unit_square,
    mesh_from_delaunay,
    rescale_mesh,
)
from hommx_tpu.ops.interpolation import locate_cells
from hommx_tpu.ops.quadrature import simplex_rule


def test_unit_square_counts_and_volume():
    m = create_unit_square(7, 5)
    assert m.num_vertices == 8 * 6
    assert m.num_cells == 7 * 5 * 2
    assert np.isclose(m.volume(), 1.0)


def test_unit_cube_counts_and_volume():
    m = create_unit_cube(3)
    assert m.num_vertices == 4**3
    assert m.num_cells == 27 * 6
    assert np.isclose(m.volume(), 1.0)
    assert (m.cell_volumes() > 0).all()


def test_rectangle_and_box_volume():
    m = create_rectangle([[0, 0], [5, 5]], [15, 15])
    assert np.isclose(m.volume(), 25.0)
    b = create_box([[0, 0, 0], [1.0, 0.4, 0.1]], [10, 4, 2])
    assert np.isclose(b.volume(), 0.04)


def test_interval():
    m = create_interval(10)
    assert np.isclose(m.volume(), 1.0)
    assert set(m.boundary_vertices()) == {0, 10}


def test_boundary_vertices_2d():
    m = create_unit_square(4, 4)
    b = m.boundary_vertices()
    coords = m.vertices[b]
    on_bdry = (
        np.isclose(coords[:, 0], 0)
        | np.isclose(coords[:, 0], 1)
        | np.isclose(coords[:, 1], 0)
        | np.isclose(coords[:, 1], 1)
    )
    assert on_bdry.all()
    assert len(b) == 16  # 4*4 boundary vertices of a 5x5 grid


def test_rescale_mesh():
    m = create_unit_square(4, 4)
    r = rescale_mesh(m, scale=2.0, shift=[1.0, -1.0])
    assert np.isclose(r.vertices.min(axis=0), [1.0, -1.0]).all()
    assert np.isclose(r.vertices.max(axis=0), [3.0, 1.0]).all()
    assert np.isclose(r.volume(), 4.0)


def test_mesh_from_delaunay():
    from scipy.spatial import Delaunay

    x = np.linspace(0, 1, 5)
    X, Y = np.meshgrid(x, x)
    pts = np.stack([X, Y], axis=-1).reshape(-1, 2)
    tris = Delaunay(pts).simplices
    m = mesh_from_delaunay(pts, tris)
    assert np.isclose(m.volume(), 1.0)


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_quadrature_exactness(dim, degree):
    """Rule of given degree integrates monomials of that degree exactly on
    the reference simplex."""
    import itertools
    from math import factorial

    pts, w = simplex_rule(dim, degree)
    for powers in itertools.product(range(degree + 1), repeat=dim):
        if sum(powers) > degree:
            continue
        approx = float(np.sum(w * np.prod(pts ** np.array(powers), axis=1)))
        # exact: ∫_simplex Π x_i^a_i dx * d! (weights normalized to measure 1)
        num = np.prod([factorial(a) for a in powers])
        exact = num / factorial(sum(powers) + dim) * factorial(dim)
        assert np.isclose(approx, exact, atol=1e-12), (powers, approx, exact)


@pytest.mark.parametrize("make,n", [(create_unit_square, 9), (create_unit_cube, 4)])
def test_locate_cells_structured(make, n):
    m = make(n)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.01, 0.99, size=(200, m.dim))
    cells = locate_cells(m, pts)
    # verify containment via barycentric coordinates
    for p, c in zip(pts, cells):
        cp = m.vertices[m.cells[c]]
        T = (cp[1:] - cp[0]).T
        xi = np.linalg.solve(T, p - cp[0])
        lam = np.concatenate([[1 - xi.sum()], xi])
        assert lam.min() > -1e-10, (p, c, lam)


def test_locate_cells_unstructured():
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(1)
    pts = np.concatenate(
        [
            np.array([[0, 0], [1, 0], [0, 1], [1, 1.0]]),
            rng.uniform(0, 1, size=(40, 2)),
        ]
    )
    m = mesh_from_delaunay(pts, Delaunay(pts).simplices)
    q = rng.uniform(0.05, 0.95, size=(50, 2))
    cells = locate_cells(m, q)
    for p, c in zip(q, cells):
        cp = m.vertices[m.cells[c]]
        T = (cp[1:] - cp[0]).T
        xi = np.linalg.solve(T, p - cp[0])
        lam = np.concatenate([[1 - xi.sum()], xi])
        assert lam.min() > -1e-8


def test_locate_cells_left_diagonal():
    """diagonal='left' meshes record their split and point location honors it
    (regression: the locator used to assume the 'right' split and returned
    non-containing cells for half the points)."""
    m = create_unit_square(4, 4, diagonal="left")
    assert m.structure.diagonal == "left"
    rng = np.random.default_rng(7)
    pts = rng.uniform(0.01, 0.99, size=(100, 2))
    cells = locate_cells(m, pts)
    for p, c in zip(pts, cells):
        cp = m.vertices[m.cells[c]]
        T = (cp[1:] - cp[0]).T
        xi = np.linalg.solve(T, p - cp[0])
        lam = np.concatenate([[1 - xi.sum()], xi])
        assert lam.min() > -1e-10, (p, c, lam)


def test_quadrature_degree5_triangle():
    """The 2D degree-5 rule is genuinely degree-5 exact (regression: it used
    to alias the degree-4 rule, silently under-integrating)."""
    import itertools
    from math import factorial

    pts, w = simplex_rule(2, 5)
    for a, b in itertools.product(range(6), repeat=2):
        if a + b > 5:
            continue
        approx = float(np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b))
        exact = factorial(a) * factorial(b) / factorial(a + b + 2) * 2
        assert np.isclose(approx, exact, atol=1e-13), (a, b, approx, exact)
