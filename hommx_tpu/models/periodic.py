"""Classical periodic homogenization (A = A(y), no slow variable).

Mirrors the reference ``BasePeriodicHMM`` / ``PoissonPeriodicHMM``
(``hmm.py:1070-1279``): solve d directional cell problems on one micro mesh,
build the constant effective tensor A*, then one plain FEM macro solve with
A* as the coefficient.  ``ElasticityPeriodicHMM`` extends the same machinery
to Hooke tensors (d(d+1)/2 generator problems) — a capability the reference
lacks but which falls out of the shared micro engine.

The exact identity PoissonHMM ≡ PoissonPeriodicHMM for A = A(y) (both the
solutions and the assembled matrices; reference
``test_integration_poisson.py:188-240``) holds here *by construction*: both
classes call the same ``MicroEngine.cell_tensor``.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.config import default_dtype
from hommx_tpu.micro.engine import MicroEngine
from hommx_tpu.models.common import MacroSystem, merge_bcs, probe_coeff_kind
from hommx_tpu.models.fem import _as_source
from hommx_tpu.ops.assembly import apply_dirichlet, assemble_ell, assemble_load_vector
from hommx_tpu.ops.function_space import DirichletBC, Function, FunctionSpace
from hommx_tpu.ops.solvers import solve_ell
from hommx_tpu.ops.sparse import ell_to_dense
from hommx_tpu.utils.options import SolverOptions, cell_problem_engine_kwargs

__all__ = ["BasePeriodicHMM", "PoissonPeriodicHMM", "ElasticityPeriodicHMM"]


class BasePeriodicHMM:
    """Shared machinery for periodic homogenization solvers."""

    _bs = 1

    def __init__(
        self,
        msh,
        A: Callable,
        f,
        msh_micro,
        eps: float = 1.0,
        options_global_solve: Union[SolverOptions, dict, None] = None,
        options_cell_problem: Union[SolverOptions, dict, None] = None,
        *,
        quad_degree_micro: int = 2,
        quad_degree_rhs: int = 2,
        dtype=None,
        petsc_options_global_solve: Optional[dict] = None,
        petsc_options_cell_problem: Optional[dict] = None,
        petsc_options_prefix: str = "",
    ):
        """Args mirror the reference ctor (``hmm.py:1077-1132``); ``A`` is a
        single-argument callable ``A(y)``."""
        if msh_micro.dim not in (2, 3):
            raise ValueError("Only 2D and 3D periodic homogenization supported.")
        if msh_micro.volume() == 0.0:
            raise ValueError("Micro cell volume is zero; check the input mesh.")
        self._msh = msh
        self._cell_mesh = msh_micro
        self._coeff = A
        self._eps = float(eps)
        self._tdim = msh_micro.dim
        self._dtype = dtype or default_dtype()
        options_global_solve = options_global_solve or petsc_options_global_solve
        options_cell_problem = options_cell_problem or petsc_options_cell_problem
        self._options_global = SolverOptions.from_any(options_global_solve)
        self._options_cell = SolverOptions.from_any(options_cell_problem)
        self._quad_degree_rhs = quad_degree_rhs

        bs = self._bs if self._bs else 1
        self._V_macro = FunctionSpace(msh, bs)
        self._V_micro = FunctionSpace(msh_micro, bs)
        kind = probe_coeff_kind(A, self._tdim, nargs=1)
        # cell-problem solver options reach the micro engine (reference
        # parity, hmm.py:1102-1103: default {"ksp_atol": 1e-12} cell opts)
        cell_kw = cell_problem_engine_kwargs(options_cell_problem)
        self._engine = MicroEngine(
            msh_micro,
            bs=bs,
            coeff_kind=kind,
            quad_degree=quad_degree_micro,
            dtype=self._dtype,
            **cell_kw,
        )
        self._f_fn = _as_source(f, bs)
        self._bcs: list[DirichletBC] = []
        self._A_hom: Optional[np.ndarray] = None
        self._correctors: Optional[list] = None
        self._sys: Optional[MacroSystem] = None
        self._last_vals_bc = None
        self._u: Optional[Function] = None

    # -- reference API -------------------------------------------------------
    @property
    def function_space(self) -> FunctionSpace:
        return self._V_macro

    def set_boundary_conditions(self, bcs):
        self._bcs = bcs if isinstance(bcs, list) else [bcs]

    def set_right_hand_side(self, f):
        self._f_fn = _as_source(f, self._V_macro.bs)

    def compute_effective_tensor(self) -> np.ndarray:
        """Solve the generator cell problems and return A_hom
        (reference ``hmm.py:1219-1245``).

        Scalar: (d, d).  Elasticity: (d, d, d, d) Hooke tensor.
        """
        coeff2 = lambda x, y: self._coeff(y)  # engine signature is A(x, y)
        centers = jnp.zeros((1, self._tdim), dtype=self._dtype)
        Astar, X = self._engine.tensors_for_centers(
            coeff2, centers, with_correctors=True
        )
        Astar = np.asarray(Astar[0])
        X = np.asarray(X[0])  # (n_red, s) generator correctors, reduced space
        # expand correctors to full micro dof vectors (backsubstitution)
        bs = self._V_micro.bs
        red = self._engine.pmap.reduced_index
        full = np.zeros((self._V_micro.num_dofs, X.shape[1]))
        for c in range(bs):
            full[c::bs, :] = X[red * bs + c, :]
        self._correctors = [
            Function(self._V_micro, full[:, s]) for s in range(X.shape[1])
        ]
        self._A_hom = self._tensor_from_astar(Astar)
        return self._A_hom

    def _tensor_from_astar(self, Astar: np.ndarray) -> np.ndarray:
        return Astar  # scalar case: (d, d) directly

    @property
    def correctors(self):
        return self._correctors

    @property
    def A_hom(self) -> Optional[np.ndarray]:
        return self._A_hom

    def solve(self) -> Function:
        """Macro FEM solve with the constant effective tensor
        (reference ``hmm.py:1247-1256``)."""
        if self._A_hom is None:
            self.compute_effective_tensor()
        if self._sys is None:
            self._sys = MacroSystem(self._V_macro, self._dtype)
        sys = self._sys
        mask, bvals = merge_bcs(self._bcs, self._V_macro.num_dofs, self._dtype)

        # two jitted stages (see models/fem.py for the rationale)
        @jax.jit
        def run_assemble(mask, bvals):
            S_loc = self._macro_local_matrices(sys)
            vals = assemble_ell(sys.pattern, S_loc, sys.slots, gather=sys.gather_asm)
            b = assemble_load_vector(
                sys.verts, sys.cells, self._f_fn,
                bs=self._V_macro.bs, degree=self._quad_degree_rhs,
            )
            return apply_dirichlet(
                vals, sys.cols, sys.diag_slots, b, mask, bvals, dia=sys.dia
            )

        from hommx_tpu.models.common import macro_precs

        mg, amg = macro_precs(sys, self._options_global)

        @jax.jit
        def run_solve(vals_bc, b_bc):
            return solve_ell(
                vals_bc, sys.cols, b_bc, self._options_global, dia=sys.dia,
                mg=mg, amg=amg,
            )

        vals_bc, b_bc = run_assemble(mask, bvals)
        x, iters, res = run_solve(vals_bc, b_bc)
        self._last_vals_bc = vals_bc
        self._u = Function(self._V_macro, x)
        self._u.solver_iterations = int(iters)
        self._u.solver_residual = float(res)
        return self._u

    def _macro_local_matrices(self, sys: MacroSystem) -> jnp.ndarray:
        A = jnp.asarray(self._A_hom.T, dtype=self._dtype)  # engine index order
        return jnp.einsum("c,cad,de,cbe->cab", sys.vols, sys.grads, A, sys.grads)

    def matrix_dense(self) -> np.ndarray:
        if self._last_vals_bc is None:
            raise RuntimeError("call solve() first")
        return np.asarray(ell_to_dense(self._last_vals_bc, self._sys.cols))

    def plot_solution(self, u: Optional[Function] = None, **kw):
        from hommx_tpu.utils.plotting import plot_fem_function

        return plot_fem_function(self._V_macro, u or self._u, **kw)


class PoissonPeriodicHMM(BasePeriodicHMM):
    """Periodic homogenization for scalar diffusion (reference
    ``hmm.py:1259-1279``)."""

    _bs = 1


class ElasticityPeriodicHMM(BasePeriodicHMM):
    """Periodic homogenization for linear elasticity: A(y) is a (d,d,d,d)
    Hooke tensor; ``A_hom`` is the homogenized Hooke tensor.  (Extension
    beyond the reference's scalar-only periodic path.)"""

    def __init__(self, msh, A, f, msh_micro, *args, **kwargs):
        self._bs = msh_micro.dim
        super().__init__(msh, A, f, msh_micro, *args, **kwargs)

    def _tensor_from_astar(self, Astar: np.ndarray) -> np.ndarray:
        d = self._tdim
        # engine layout: Astar[(ij),(kl)] -> Hooke A[i,j,k,l] with the
        # engine's test/trial orientation (see MicroEngine.cell_tensor)
        return Astar.reshape(d, d, d, d)

    def _macro_local_matrices(self, sys: MacroSystem) -> jnp.ndarray:
        d = self._tdim
        A = jnp.asarray(self._A_hom.reshape(d * d, d * d).T, dtype=self._dtype)
        return jnp.einsum("c,cmr,rt,cnt->cmn", sys.vols, sys.strain_P, A, sys.strain_P)
