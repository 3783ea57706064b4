"""Single-scale P1/P2 FEM solvers (fine-mesh references & the macro stage).

Replaces the reference's DOLFINx ``LinearProblem`` usage: the convenience
``PoissonFEM`` class (reference ``helpers.py:212-302``) and the fine-mesh
reference solves its tests build inline (``test_integration_poisson.py:
253-285``).  Coefficients are plain JAX callables ``A(x) -> scalar | (d,d) |
(d,d,d,d)``; assembly evaluates them at element quadrature points.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.config import default_dtype
from hommx_tpu.models.common import (
    MacroSystem,
    macro_precs,
    merge_bcs,
    probe_coeff_kind,
)
from hommx_tpu.ops.assembly import apply_dirichlet, assemble_ell, assemble_load_vector
from hommx_tpu.ops.elements import quad_points_physical
from hommx_tpu.ops.function_space import (
    DirichletBC,
    Function,
    FunctionSpace,
    boundary_dofs,
    dirichletbc,
)
from hommx_tpu.ops.solvers import solve_ell
from hommx_tpu.utils.options import SolverOptions

__all__ = [
    "fem_assemble_values",
    "fem_solve",
    "fem_solve_fn",
    "PoissonFEM",
    "LinearElasticityFEM",
]


def _local_matrices(sys: MacroSystem, coeff: Callable, kind: str, degree: int):
    """Per-cell stiffness blocks for a pointwise coefficient A(x).

    P1: gradients are cellwise constant.  P2 (scalar): per-quadrature-point
    basis gradients ∇φ_k(x_q) = Σ_i c[q,k,i] ∇λ_i (ops/p2.py)."""
    V = sys.V
    d = V.mesh.dim
    if V.degree == 2:
        degree = max(degree, 3)  # quadratic basis gradients are degree 1
    xq, wq, _ = quad_points_physical(sys.verts, sys.cells, degree)  # (nc,nq,..)

    def coeff_mat(x):
        val = jnp.asarray(coeff(x), dtype=sys.dtype)
        if kind == "scalar":
            return val * jnp.eye(d, dtype=sys.dtype)
        if kind == "matrix":
            return val
        return val.reshape(d * d, d * d)

    Aq = jax.vmap(jax.vmap(coeff_mat))(xq)  # (nc, nq, r, r)
    if V.degree == 2:
        from hommx_tpu.ops.p2 import p2_basis
        from hommx_tpu.ops.quadrature import simplex_rule

        xi, _ = simplex_rule(d, degree)
        _, dlam = p2_basis(jnp.asarray(xi, sys.dtype), d)  # (nq, nb, d+1)
        B = jnp.einsum("qki,cid->cqkd", dlam, sys.grads)  # ∇φ at quad pts
        if V.bs == 1:
            return jnp.einsum("cq,cqkd,cqde,cqle->ckl", wq, B, Aq, B)
        # vector P2 elasticity: per-qp strain coefficients of basis (a, i):
        # e(v_{a,i})_{kl} = ½(δ_ik ∂φ_a/∂x_l + δ_il ∂φ_a/∂x_k)
        eye = jnp.eye(d, dtype=sys.dtype)
        P = 0.5 * (
            jnp.einsum("ik,cqal->cqaikl", eye, B)
            + jnp.einsum("il,cqak->cqaikl", eye, B)
        )
        nb_nodes = B.shape[2]
        P = P.reshape(B.shape[0], B.shape[1], nb_nodes * d, d * d)
        return jnp.einsum("cq,cqmr,cqrt,cqnt->cmn", wq, P, Aq, P)
    if V.bs == 1:
        # S[a,b] = Σ_q w_q ∇λ_aᵀ A(x_q) ∇λ_b   (rows = test)
        return jnp.einsum("cq,cad,cqde,cbe->cab", wq, sys.grads, Aq, sys.grads)
    # elasticity: S[m,n] = Σ_q w_q P_m (ij) Ā[(ij),(kl)] P_n (kl)
    return jnp.einsum("cq,cmr,cqrt,cnt->cmn", wq, sys.strain_P, Aq, sys.strain_P)


def _load_vector(sys: MacroSystem, f_fn: Callable, degree: int):
    """Degree-aware load vector b_i = ∫ f φ_i dx."""
    V = sys.V
    if V.degree == 1:
        return assemble_load_vector(
            sys.verts, sys.cells, f_fn, bs=V.bs, degree=degree
        )
    from hommx_tpu.ops.p2 import p2_basis
    from hommx_tpu.ops.quadrature import simplex_rule

    degree = max(degree, 3)
    xq, wq, _ = quad_points_physical(sys.verts, sys.cells, degree)
    xi, _ = simplex_rule(V.mesh.dim, degree)
    phi, _ = p2_basis(jnp.asarray(xi, sys.dtype), V.mesh.dim)  # (nq, nb)
    nodes = jnp.asarray(V.cell_nodes())
    if V.bs == 1:
        fvals = jax.vmap(jax.vmap(f_fn))(xq).reshape(wq.shape)
        contrib = jnp.einsum("cq,qk->ck", wq * fvals, phi)
        b = jnp.zeros(V.num_dofs, dtype=contrib.dtype)
        return b.at[nodes.reshape(-1)].add(contrib.reshape(-1))
    fvals = jax.vmap(jax.vmap(f_fn))(xq).reshape(*wq.shape, V.bs)
    contrib = jnp.einsum("cq,cqb,qk->ckb", wq, fvals, phi)
    b = jnp.zeros(V.num_dofs, dtype=contrib.dtype)
    dofs = (nodes[:, :, None] * V.bs + jnp.arange(V.bs)[None, None, :]).reshape(-1)
    return b.at[dofs].add(contrib.reshape(-1))


def fem_assemble_values(sys: MacroSystem, coeff: Callable, kind: str, degree: int):
    S_loc = _local_matrices(sys, coeff, kind, degree)
    return assemble_ell(sys.pattern, S_loc, sys.slots, gather=sys.gather_asm)


def fem_solve(
    V: FunctionSpace,
    coeff: Callable,
    f: Union[Callable, Sequence[float], float],
    bcs: Sequence[DirichletBC],
    options: Optional[SolverOptions] = None,
    quad_degree: int = 2,
    rhs_degree: int = 2,
    dtype=None,
) -> Function:
    """Solve ∫ A ∇u·∇v = ∫ f v (or the elasticity analogue) with Dirichlet BCs."""
    import jax

    dtype = dtype or default_dtype()
    options = SolverOptions.from_any(options)
    kind = probe_coeff_kind(coeff, V.mesh.dim, nargs=1)
    sys = MacroSystem(V, dtype)
    f_fn = _as_source(f, V.bs)
    mask, bvals = merge_bcs(bcs, V.num_dofs, dtype)

    # Two jitted stages, not one: on TPU eager dispatch costs ~25ms/op so
    # everything must be traced, BUT composing the scatter-assembly and the
    # CG while-loop into one XLA module triggers a pathologically slow
    # (~8 min) compile on the TPU backend; split, each stage compiles in
    # seconds and the extra dispatch is negligible.
    @jax.jit
    def run_assemble(mask, bvals):
        vals = fem_assemble_values(sys, coeff, kind, quad_degree)
        b = _load_vector(sys, f_fn, rhs_degree)
        return apply_dirichlet(
            vals, sys.cols, sys.diag_slots, b, mask, bvals, dia=sys.dia
        )

    mg, amg = macro_precs(sys, options)

    @jax.jit
    def run_solve(vals_bc, b_bc):
        return solve_ell(
            vals_bc, sys.cols, b_bc, options, dia=sys.dia, mg=mg, amg=amg
        )

    vals_bc, b_bc = run_assemble(mask, bvals)
    x, iters, res = run_solve(vals_bc, b_bc)
    fn = Function(V, x)
    fn.solver_iterations = int(iters)
    fn.solver_residual = float(res)
    return fn


def fem_solve_fn(
    V: FunctionSpace,
    coeff: Callable,
    f,
    bcs,
    options=None,
    quad_degree: int = 2,
    rhs_degree: int = 2,
    dtype=None,
):
    """Differentiable single-scale FEM solve as a pure function of a
    coefficient parameter vector.

    Returns ``solve(theta) -> x`` where ``coeff(theta, x_pt)`` and
    ``f(theta, x_pt)`` receive the parameter; the macro solve carries the
    implicit-function-theorem VJP (``ops/solvers.py::make_implicit_solver``),
    so ``jax.grad`` through the solve is exact on every solver path — the
    single-scale counterpart of the differentiable HMM pipeline.
    """
    from hommx_tpu.ops.solvers import make_implicit_solver

    dtype = dtype or default_dtype()
    options = SolverOptions.from_any(options)
    sys = MacroSystem(V, dtype)
    mask, bvals = merge_bcs(bcs, V.num_dofs, dtype)
    mg, amg = macro_precs(sys, options)
    implicit = make_implicit_solver(
        sys.cols, options, dia=sys.dia, mg=mg, amg=amg
    )

    def solve(theta):
        kind = probe_coeff_kind(lambda x: coeff(theta, x), V.mesh.dim, nargs=1)
        vals = fem_assemble_values(
            sys, lambda x: coeff(theta, x), kind, quad_degree
        )
        b = _load_vector(sys, _as_source_theta(f, theta, V.bs), rhs_degree)
        vals_bc, b_bc = apply_dirichlet(
            vals, sys.cols, sys.diag_slots, b, mask, bvals, dia=sys.dia
        )
        return implicit(vals_bc, b_bc)

    return solve


def _as_source_theta(f, theta, bs):
    if callable(f):
        return lambda x: f(theta, x)
    return _as_source(f, bs)


def _as_source(f, bs: int) -> Callable:
    """Normalize the rhs: callable | constant scalar | constant vector."""
    if callable(f):
        return f
    arr = jnp.asarray(f, dtype=default_dtype())
    if bs == 1:
        return lambda x: arr
    return lambda x: jnp.broadcast_to(arr, (bs,))


class PoissonFEM:
    """Fine-mesh Poisson solver with automatic zero BC on the box boundary
    (mirrors reference ``helpers.py:212-302``)."""

    def __init__(
        self,
        msh,
        A: Callable,
        f,
        options: Optional[SolverOptions] = None,
        quad_degree: int = 2,
        degree: int = 1,
    ):
        self._V = FunctionSpace(msh, 1, degree=degree)
        self._coeff = A
        self._f = f
        self._options = SolverOptions.from_any(options)
        self._quad_degree = quad_degree
        self._bcs = [dirichletbc(0.0, boundary_dofs(self._V), self._V)]
        self._u: Optional[Function] = None

    @property
    def function_space(self) -> FunctionSpace:
        return self._V

    def set_boundary_conditions(self, bcs):
        self._bcs = bcs if isinstance(bcs, list) else [bcs]

    def solve(self) -> Function:
        self._u = fem_solve(
            self._V,
            self._coeff,
            self._f,
            self._bcs,
            self._options,
            quad_degree=self._quad_degree,
        )
        return self._u

    def plot_solution(self, u: Optional[Function] = None, **kw):
        from hommx_tpu.utils.plotting import plot_fem_function

        return plot_fem_function(self._V, u or self._u, **kw)


class LinearElasticityFEM:
    """Fine-mesh linear-elasticity solver (A(x) is a (d,d,d,d) Hooke tensor).

    The reference builds these solves inline in its elasticity tests
    (``test_integration_linear_elasticity.py:106-122``); here it is a class.
    No default boundary conditions (like ``LinearElasticityHMM``).
    """

    def __init__(
        self,
        msh,
        A: Callable,
        f,
        options: Optional[SolverOptions] = None,
        quad_degree: int = 2,
        degree: int = 1,
    ):
        self._V = FunctionSpace(msh, msh.dim, degree=degree)
        self._coeff = A
        self._f = f
        self._options = SolverOptions.from_any(options)
        self._quad_degree = quad_degree
        self._bcs: list = []
        self._u: Optional[Function] = None

    @property
    def function_space(self) -> FunctionSpace:
        return self._V

    def set_boundary_conditions(self, bcs):
        self._bcs = bcs if isinstance(bcs, list) else [bcs]

    def solve(self) -> Function:
        self._u = fem_solve(
            self._V,
            self._coeff,
            self._f,
            self._bcs,
            self._options,
            quad_degree=self._quad_degree,
        )
        return self._u
