"""Reference-compatible helpers module.

Mirrors the names of the reference's ``hommx.helpers`` (``helpers.py:1-315``)
so reference users can migrate imports 1:1:

    from hommx_tpu.helpers import solve_diffusion_2d, rescale_mesh, PoissonFEM
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from hommx_tpu.meshes.simplex import (  # noqa: F401
    mesh_from_delaunay,
    mesh_from_file,
    rescale_mesh,
    rescale_mesh_in_place,
)
from hommx_tpu.models.fem import PoissonFEM, fem_solve  # noqa: F401
from hommx_tpu.ops.function_space import (
    FunctionSpace,
    boundary_dofs,
    dirichletbc,
)
from hommx_tpu.utils.plotting import plot_fem_function  # noqa: F401

__all__ = [
    "solve_diffusion_1d",
    "solve_diffusion_2d",
    "mesh_from_file",
    "mesh_from_delaunay",
    "rescale_mesh",
    "rescale_mesh_in_place",
    "PoissonFEM",
    "plot_fem_function",
]


def solve_diffusion_1d(epsilon: float, nx: int, A_callable: Callable) -> np.ndarray:
    """1D multiscale diffusion solve: -d/dx(A(x) du/dx) = 1, u(0)=u(1)=0.

    Mirrors reference ``helpers.py:26-65``; returns the dof array.
    """
    from hommx_tpu.meshes import create_interval

    msh = create_interval(nx)
    V = FunctionSpace(msh, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V), V)]
    u = fem_solve(V, lambda x: A_callable(x), lambda x: 1.0, bcs)
    return np.asarray(u.array)


def solve_diffusion_2d(epsilon: float, nx: int, A_callable: Callable) -> np.ndarray:
    """2D multiscale diffusion solve on the unit square with f = 1 and zero
    Dirichlet BCs (mirrors reference ``helpers.py:68-122``, minus the
    interactive plot).  Returns values sorted into an (nx+1, nx+1) grid.
    """
    from hommx_tpu.meshes import create_unit_square

    msh = create_unit_square(nx, nx)
    V = FunctionSpace(msh, 1)
    bcs = [dirichletbc(0.0, boundary_dofs(V), V)]
    u = fem_solve(V, lambda x: A_callable(x), lambda x: 1.0, bcs)
    coords = V.tabulate_dof_coordinates()
    # lexicographic (x-major) order; a weighted-sum key would collide once
    # nx >= weight (scrambling the grid silently)
    ix = np.lexsort((coords[:, 1], coords[:, 0]))
    return np.asarray(u.array)[ix].reshape(nx + 1, nx + 1)
