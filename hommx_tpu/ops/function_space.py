"""Function spaces, functions and Dirichlet boundary conditions.

Mirrors the slice of the DOLFINx API the reference uses
(``fem.functionspace``, ``fem.Function``, ``fem.dirichletbc``,
``fem.locate_dofs_topological`` — reference ``hmm.py:124,632-636``) on top of
array meshes.  P1 and P2 Lagrange (scalar or d-vector) spaces are
supported; the reference itself is P1-only.

Dof layout: node-major, component-minor — dof = node * bs + component,
matching PETSc blocked index unrolling (reference ``hmm.py:31-40``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from hommx_tpu.config import default_dtype
from hommx_tpu.meshes.simplex import SimplexMesh

__all__ = [
    "FunctionSpace",
    "Function",
    "DirichletBC",
    "functionspace",
    "dirichletbc",
    "locate_dofs_geometrical",
    "boundary_dofs",
]


class FunctionSpace:
    """P1/P2 Lagrange space (bs=1 scalar, bs=d vector) on a simplex mesh.

    P2 (degree=2) adds edge-midpoint dofs (ops/p2.py); the HMM macro space
    is always P1 (reference parity), P2 serves the single-scale FEM path.
    """

    def __init__(self, mesh: SimplexMesh, bs: int = 1, degree: int = 1):
        self.mesh = mesh
        self.bs = int(bs)
        self.degree = int(degree)
        if self.degree not in (1, 2):
            raise NotImplementedError("only P1 and P2 Lagrange are supported")
        if self.degree == 2:
            from hommx_tpu.ops.p2 import build_edges, p2_cell_dofs, p2_dof_coordinates

            self.edges, self.cell_edges = build_edges(
                mesh.cells, mesh.num_vertices
            )
            self._cell_nodes = p2_cell_dofs(
                mesh.cells, self.cell_edges, mesh.num_vertices
            )
            self._dof_coords = p2_dof_coordinates(mesh.vertices, self.edges)
        else:
            self._cell_nodes = mesh.cells
            self._dof_coords = mesh.vertices

    @property
    def dim(self) -> int:
        return self.mesh.dim

    @property
    def num_nodes(self) -> int:
        return self._dof_coords.shape[0]

    @property
    def num_dofs(self) -> int:
        return self.num_nodes * self.bs

    @property
    def dofs_per_cell(self) -> int:
        """Basis functions per cell (reference hmm.py:138-140)."""
        return self._cell_nodes.shape[1] * self.bs

    def tabulate_dof_coordinates(self) -> np.ndarray:
        """(num_nodes, dim) node coordinates (P1: vertices; P2: + midpoints)."""
        return self._dof_coords

    def cell_nodes(self) -> np.ndarray:
        """(num_cells, nodes_per_cell) node indices per cell."""
        return self._cell_nodes

    def cell_dofs_unrolled(self) -> np.ndarray:
        """(num_cells, dofs_per_cell) unrolled scalar dof indices per cell."""
        cells = self._cell_nodes
        if self.bs == 1:
            return cells
        comp = np.arange(self.bs)
        return (cells[:, :, None] * self.bs + comp[None, None, :]).reshape(
            cells.shape[0], -1
        )

    def boundary_nodes(self) -> np.ndarray:
        """Node indices on the mesh boundary (vertices; + midpoints of
        boundary edges for P2)."""
        bverts = self.mesh.boundary_vertices()
        if self.degree == 1:
            return bverts
        facets = self.mesh.boundary_facets()  # (nf, d) sorted
        d = self.mesh.dim
        import itertools

        bedges = set()
        for pair in itertools.combinations(range(d), 2):
            for f in facets[:, list(pair)]:
                bedges.add((int(f[0]), int(f[1])))
        if d == 2:
            bedges = {tuple(f) for f in facets.tolist()}
        edge_keys = {tuple(e): i for i, e in enumerate(self.edges.tolist())}
        mid_ids = [
            self.mesh.num_vertices + edge_keys[e]
            for e in bedges
            if e in edge_keys
        ]
        return np.concatenate([bverts, np.asarray(sorted(mid_ids), dtype=np.int64)])

    def __eq__(self, other):
        return (
            isinstance(other, FunctionSpace)
            and other.mesh is self.mesh
            and other.bs == self.bs
            and other.degree == self.degree
        )

    def __hash__(self):
        return hash((id(self.mesh), self.bs, self.degree))

    def __repr__(self):
        return (
            f"FunctionSpace(P{self.degree}, bs={self.bs}, mesh={self.mesh!r})"
        )


def functionspace(mesh: SimplexMesh, element=("Lagrange", 1)) -> FunctionSpace:
    """DOLFINx-style constructor: ``functionspace(mesh, ("Lagrange", 1))`` or
    ``functionspace(mesh, ("Lagrange", 2, (dim,)))`` for vector spaces."""
    family, degree, *shape = element
    if family not in ("Lagrange", "P", "CG") or degree not in (1, 2):
        raise NotImplementedError("only P1/P2 Lagrange spaces are supported")
    bs = 1 if not shape else int(np.prod(shape[0]))
    return FunctionSpace(mesh, bs, degree)


class Function:
    """A coefficient vector over a FunctionSpace.

    ``f.array`` is the flat (num_dofs,) jnp array.  ``f.x.array`` also works
    (DOLFINx-compat sugar: ``u.x.array`` appears throughout the reference).
    """

    def __init__(self, V: FunctionSpace, array=None):
        self.space = V
        if array is None:
            array = jnp.zeros(V.num_dofs, dtype=default_dtype())
        self.array = jnp.asarray(array)

    # DOLFINx-compat: u.x.array
    @property
    def x(self) -> "Function":
        return self

    @property
    def function_space(self) -> FunctionSpace:
        return self.space

    def values(self) -> jnp.ndarray:
        """(num_nodes, bs) view of the dof vector."""
        return self.array.reshape(self.space.num_nodes, self.space.bs)

    def interpolate(self, fn: Callable):
        """Set dof values from a callable x -> scalar/(bs,) value.

        ``fn`` receives one point of shape (dim,) and is vmapped over nodes
        (JAX-traceable callables) with a numpy fallback.
        """
        import jax

        coords = jnp.asarray(self.space.tabulate_dof_coordinates())
        try:
            vals = jax.vmap(fn)(coords)
        except Exception:
            vals = jnp.asarray(
                np.stack([np.asarray(fn(np.asarray(c))) for c in np.asarray(coords)])
            )
        self.array = jnp.asarray(vals, dtype=self.array.dtype).reshape(-1)
        return self

    def eval(self, points) -> jnp.ndarray:
        from hommx_tpu.ops.interpolation import eval_p1

        return eval_p1(self, points)

    def copy(self) -> "Function":
        return Function(self.space, self.array)

    def scatter_forward(self):  # single-program: no halos to exchange
        return self


class DirichletBC:
    """Dirichlet condition in canonical (unrolled dofs, values) form."""

    def __init__(self, dofs: np.ndarray, values: np.ndarray, V: FunctionSpace):
        self.dofs = np.asarray(dofs, dtype=np.int32)
        self.values = np.asarray(values, dtype=np.float64)
        assert self.dofs.shape == self.values.shape
        self.space = V

    @property
    def g(self):  # reference-compat: bc.g.value
        return self.values


def dirichletbc(
    value: Union[float, Sequence[float], Function],
    dofs: np.ndarray,
    V: Optional[FunctionSpace] = None,
) -> DirichletBC:
    """Build a DirichletBC from node indices + value.

    Args:
        value: scalar, (bs,) vector (one value per component), or a Function
            whose dof values are sampled at the given nodes.
        dofs: node indices (NOT unrolled); every component of a vector space
            node is constrained, matching ``fem.locate_dofs_topological`` on a
            non-subspaced vector space (reference ``test_..._elasticity.py:118``).
        V: the function space (inferred from a Function value).
    """
    dofs = np.asarray(dofs, dtype=np.int32)
    if isinstance(value, Function):
        V = value.space if V is None else V
        bs = V.bs
        unrolled = (dofs[:, None] * bs + np.arange(bs)[None, :]).reshape(-1)
        vals = np.asarray(value.array)[unrolled]
        return DirichletBC(unrolled, vals, V)
    if V is None:
        raise ValueError("V required for non-Function values")
    bs = V.bs
    unrolled = (dofs[:, None] * bs + np.arange(bs)[None, :]).reshape(-1)
    value = np.asarray(value, dtype=np.float64)
    if value.ndim == 0:
        vals = np.full(unrolled.shape, float(value))
    else:
        if value.shape != (bs,):
            raise ValueError(f"vector bc value must have shape ({bs},)")
        vals = np.tile(value, dofs.shape[0])
    return DirichletBC(unrolled, vals, V)


def locate_dofs_geometrical(V: FunctionSpace, marker: Callable) -> np.ndarray:
    """Node indices where ``marker(x)`` is True.

    ``marker`` gets coordinates with shape (dim, N) (DOLFINx marker
    convention: ``lambda x: np.isclose(x[0], left) | ...``, reference
    ``hmm.py:606-630``) and returns a boolean mask of length N.
    """
    x = V.tabulate_dof_coordinates().T  # (dim, N); P2 includes midpoints
    mask = np.asarray(marker(x), dtype=bool)
    return np.nonzero(mask)[0].astype(np.int32)


def boundary_dofs(V: FunctionSpace, marker: Optional[Callable] = None) -> np.ndarray:
    """Node indices on the mesh boundary, optionally filtered by a marker.

    Equivalent to ``locate_entities_boundary`` + ``locate_dofs_topological``
    (reference ``hmm.py:606-635``): a Lagrange dof is a boundary dof iff its
    node (vertex, or edge midpoint for P2) lies on a boundary facet.
    """
    bnodes = V.boundary_nodes()
    if marker is None:
        return bnodes.astype(np.int32)
    x = V.tabulate_dof_coordinates()[bnodes].T
    mask = np.asarray(marker(x), dtype=bool)
    return bnodes[mask].astype(np.int32)
