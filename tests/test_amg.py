"""Aggregation-AMG for unstructured macro systems (ops/amg.py).

Round-3 closure of the round-2 gap: the reference's GAMG accepts any mesh
(``test_integration_poisson.py:207-212``), while the geometric hierarchy
requires structured grids — Delaunay/file meshes above the direct cap had
only Jacobi-CG.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import create_unit_square
from hommx_tpu.meshes import mesh_from_delaunay
from hommx_tpu.models.common import MacroSystem, macro_precs, merge_bcs
from hommx_tpu.models.fem import _load_vector, fem_assemble_values
from hommx_tpu.ops.amg import amg_setup, amg_vcycle, build_amg_structure
from hommx_tpu.ops.assembly import apply_dirichlet
from hommx_tpu.ops.function_space import (
    FunctionSpace,
    dirichletbc,
    locate_dofs_geometrical,
)
from hommx_tpu.ops.solvers import (
    _ell_diag,
    cg_matfree,
    dense_solve_ell,
    pcg_prec,
)
from hommx_tpu.ops.sparse import spmv


def _delaunay_mesh(n):
    """Genuinely unstructured mesh: jittered grid points, Delaunay cells."""
    from scipy.spatial import Delaunay

    g = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(g, g, indexing="ij")
    pts = np.stack([X.reshape(-1), Y.reshape(-1)], axis=1)
    rng = np.random.default_rng(3)
    interior = (
        (pts[:, 0] > 0) & (pts[:, 0] < 1) & (pts[:, 1] > 0) & (pts[:, 1] < 1)
    )
    pts[interior] += rng.uniform(-0.3, 0.3, (int(interior.sum()), 2)) / n
    tri = Delaunay(pts)
    return mesh_from_delaunay(pts, tri.simplices)


def _system(mesh):
    V = FunctionSpace(mesh, 1)
    sys = MacroSystem(V, jnp.float64)
    vals = fem_assemble_values(
        sys, lambda x: 1.0 + 0.5 * jnp.sin(3 * x[0]) * x[1], "scalar", 2
    )
    b = _load_vector(sys, lambda x: jnp.asarray(1.0), 2)
    dofs = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 0.0))
    mask, bvals = merge_bcs([dirichletbc(0.0, dofs, V)], V.num_dofs, jnp.float64)
    vals_bc, b_bc = apply_dirichlet(
        vals, sys.cols, sys.diag_slots, b, mask, bvals, dia=sys.dia
    )
    return V, sys, vals_bc, b_bc


def test_amg_structure_and_exact_galerkin():
    """The plain hierarchy builds on a Delaunay mesh and the traced level-1
    operator equals the dense Pᵀ A P (piecewise-constant P) exactly."""
    mesh = _delaunay_mesh(56)  # 3249 dofs > CPU bottom_max 1500
    V, sys, vals_bc, b_bc = _system(mesh)
    assert mesh.structure is None and sys.mg is None
    struct = build_amg_structure(sys.pattern, 1, smoothed=False)
    assert struct is not None and struct.num_levels >= 2
    state = amg_setup(struct, vals_bc)

    from hommx_tpu.ops.sparse import ell_to_dense

    lev0 = struct.levels[0]
    A = np.asarray(ell_to_dense(vals_bc, jnp.asarray(lev0.cols)))
    zm = np.asarray(state[0]["zmask"])
    nc = struct.levels[1].n_dofs
    P = np.zeros((lev0.n_dofs, nc))
    P[np.arange(lev0.n_dofs), lev0.agg_dof] = zm  # BC rows masked out
    Ac_ref = P.T @ A @ P
    # identity fill on empty-aggregate diagonals
    empty = np.abs(np.diag(Ac_ref)) == 0
    Ac_ref[empty, empty] = 1.0
    key = "vals" if struct.num_levels > 2 else None
    if key is None:
        Ac = np.asarray(
            state[1]["binv"]
        )  # bottom stores the inverse — compare by product
        assert np.abs(Ac @ Ac_ref - np.eye(nc)).max() < 1e-8
    else:
        Ac = np.asarray(
            ell_to_dense(state[1]["vals"], jnp.asarray(struct.levels[1].cols))
        )
        assert np.abs(Ac - Ac_ref).max() < 1e-11


def test_amg_smoothed_exact_galerkin():
    """The smoothed hierarchy's traced level-1 operator equals the dense
    Pᵀ A P computed from the traced P values over the static pattern —
    the contributor-table SpGEMM is exact."""
    mesh = _delaunay_mesh(56)
    V, sys, vals_bc, b_bc = _system(mesh)
    struct = build_amg_structure(sys.pattern, 1, smoothed=True)
    assert struct is not None and struct.smoothed
    state = amg_setup(struct, vals_bc)

    from hommx_tpu.ops.sparse import ell_to_dense

    lev0 = struct.levels[0]
    A = np.asarray(ell_to_dense(vals_bc, jnp.asarray(lev0.cols)))
    nc = struct.levels[1].n_dofs
    KP = lev0.p_cols.shape[1]
    Pv = np.asarray(state[0]["Pv"])
    P = np.zeros((lev0.n_dofs, nc))
    np.add.at(P, (np.arange(lev0.n_dofs * KP) // KP, lev0.p_cols.reshape(-1)), Pv)
    # BC rows of P are structurally present but zero-valued
    zm = np.asarray(state[0]["zmask"])
    assert np.abs(P[zm == 0]).max() == 0.0
    Ac_ref = P.T @ A @ P
    empty = np.abs(np.diag(Ac_ref)) == 0
    Ac_ref[empty, empty] = 1.0
    if struct.num_levels > 2:
        Ac = np.asarray(
            ell_to_dense(state[1]["vals"], jnp.asarray(struct.levels[1].cols))
        )
        assert np.abs(Ac - Ac_ref).max() < 1e-11
    else:
        Ac = np.asarray(state[1]["binv"])
        assert np.abs(Ac @ Ac_ref - np.eye(nc)).max() < 1e-8


@pytest.mark.parametrize(
    "smoothed,max_its", [(True, 15), (False, 33)], ids=["smoothed", "plain"]
)
def test_amg_pcg_matches_direct_and_beats_jacobi(smoothed, max_its):
    """AMG-PCG on a Delaunay system above direct_threshold matches the
    direct solve.  Smoothed aggregation must reach the structured
    geometric-MG count (~11 its — measured 11); plain aggregation keeps
    the round-2 verdict gate of <=3x that count (measured 21)."""
    mesh = _delaunay_mesh(72)  # 5329 dofs > direct_threshold 4096
    V, sys, vals_bc, b_bc = _system(mesh)
    struct = build_amg_structure(sys.pattern, 1, smoothed=smoothed)
    assert struct is not None
    state = amg_setup(struct, vals_bc)
    matvec = lambda v: spmv(vals_bc, jnp.asarray(sys.cols), v)
    x_amg, it_amg, _ = pcg_prec(
        matvec, lambda r: amg_vcycle(struct, state, r), b_bc,
        atol=0.0, rtol=1e-11, maxiter=400,
    )
    x_ref = dense_solve_ell(vals_bc, sys.cols, b_bc)
    scale = float(jnp.max(jnp.abs(x_ref)))
    assert float(jnp.max(jnp.abs(x_amg - x_ref))) < 1e-9 * scale

    _, it_j, _ = cg_matfree(
        matvec, _ell_diag(vals_bc, sys.cols), b_bc,
        atol=0.0, rtol=1e-11, maxiter=10000,
    )
    assert int(it_amg) <= max_its, (int(it_amg), int(it_j))
    assert int(it_amg) * 3 < int(it_j)


def test_amg_routed_through_solver_api():
    """macro_precs routes unstructured CG systems to AMG, structured ones
    to geometric MG, and the public solve matches the Jacobi-CG solution."""
    from hommx_tpu.ops.solvers import solve_ell
    from hommx_tpu.utils.options import SolverOptions

    mesh = _delaunay_mesh(56)
    V, sys, vals_bc, b_bc = _system(mesh)
    opts = SolverOptions(method="cg", rtol=1e-11, atol=0.0)
    mg, amg = macro_precs(sys, opts)
    assert mg is None and amg is not None
    x_amg, it_amg, _ = solve_ell(
        vals_bc, sys.cols, b_bc, opts, dia=sys.dia, mg=mg, amg=amg
    )
    x_j, it_j, _ = solve_ell(
        vals_bc, sys.cols, b_bc,
        SolverOptions(method="cg", pc="jacobi", rtol=1e-11, atol=0.0),
        dia=sys.dia,
    )
    assert float(jnp.max(jnp.abs(x_amg - x_j))) < 1e-7
    assert int(it_amg) * 3 < int(it_j)

    m_struct = create_unit_square(24, 24)
    sys_s = MacroSystem(FunctionSpace(m_struct, 1), jnp.float64)
    mg_s, amg_s = macro_precs(sys_s, opts)
    assert mg_s is not None and amg_s is None


@pytest.mark.parametrize(
    "variant,max_its",
    [("rigid", 25), ("translations", 35), ("plain", 60)],
)
def test_amg_unstructured_elasticity(variant, max_its):
    """Aggregation AMG on an unstructured 2D VECTOR (elasticity) system:
    component-wise aggregation + block-row graph; gates correctness vs the
    direct solve and a strong Jacobi margin.  Measured: 20 its with the
    rigid-body near-kernel (the MacroSystem.amg default — GAMG with
    NearNullSpace), 28 with translations only (GAMG's own default), 43
    plain, 804 Jacobi."""

    def hooke2(x):
        lam, mu = 1.0 + 0.3 * x[0], 0.5
        eye = jnp.eye(2)
        return lam * jnp.einsum("ij,kl->ijkl", eye, eye) + mu * (
            jnp.einsum("ik,jl->ijkl", eye, eye)
            + jnp.einsum("il,jk->ijkl", eye, eye)
        )

    mesh = _delaunay_mesh(56)  # 6498 dofs at bs=2
    V = FunctionSpace(mesh, 2)
    sys = MacroSystem(V, jnp.float64)
    vals = fem_assemble_values(sys, hooke2, "tensor4", 2)
    b = _load_vector(sys, lambda x: -jnp.ones(2) / 2, 2)
    dofs = locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 0.0))
    mask, bvals = merge_bcs(
        [dirichletbc(np.zeros(2), dofs, V)], V.num_dofs, jnp.float64
    )
    vals_bc, b_bc = apply_dirichlet(
        vals, sys.cols, sys.diag_slots, b, mask, bvals, dia=sys.dia
    )
    if variant == "rigid":
        struct = sys.amg  # rigid-body near-kernel via MacroSystem
    else:
        struct = build_amg_structure(
            sys.pattern, 2, smoothed=variant == "translations"
        )
    assert struct is not None
    state = amg_setup(struct, vals_bc)
    matvec = lambda v: spmv(vals_bc, jnp.asarray(sys.cols), v)
    x, it, _ = pcg_prec(
        matvec, lambda r: amg_vcycle(struct, state, r), b_bc,
        atol=0.0, rtol=1e-11, maxiter=600,
    )
    x_ref = dense_solve_ell(vals_bc, sys.cols, b_bc)
    scale = float(jnp.max(jnp.abs(x_ref)))
    assert float(jnp.max(jnp.abs(x - x_ref))) < 1e-9 * scale
    assert int(it) <= max_its
    _, it_j, _ = cg_matfree(
        matvec, _ell_diag(vals_bc, sys.cols), b_bc,
        atol=0.0, rtol=1e-11, maxiter=20000,
    )
    assert int(it) * 5 < int(it_j)
