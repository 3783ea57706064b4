"""The batched micro cell-problem engine — the performance core.

Replaces the reference's hot loop (``hmm.py:310-369``): per macro cell,
``num_basis_functions`` PETSc assemble+solve round trips through dolfinx_mpc.
Here the whole batch of macro quadrature points runs as one jitted pipeline
of matmuls (MXU) + batched Cholesky:

    for every macro cell c (vmapped, chunked, shard_map-able):
        Ā_e   = Σ_q w_eq A(c_T, y_eq)        # coefficient reduced to one
                                             # (r×r) block per micro element
        K_c   = Σ_e D_eᵀ (T_cᵀ Ā_e T_c) D_e  # reduced periodic cell operator
        X_c   = cholesky_solve(K_c, F_c)     # s = d (scalar) or d² (elastic)
                                             # generator correctors
        Φ_c,e = E + T_c D_e X_c              # corrected per-element fields
        A*_c  = (1/|Y|) Σ_e Φᵀ Ā_e Φ         # homogenized tensor at c_T

P1 gradients are constant per micro element, so the quadrature collapses
into Ā_e *before* any O(n_red) work — the q-axis never touches the big
contractions.  K_c has two interchangeable builds:

  * ``dense``  — K_c = D_flatᵀ Z_flat, one big MXU matmul over the
    (nE·r, n_red) dense gradient operator.  Best for small/medium micro
    meshes (n_red ≲ 512): pure matmul, no scatter.
  * ``scatter`` — per-element (nbl×nbl) blocks scattered into the dense
    reduced matrix (the classical FEM assembly, batched).  O(nE·nbl²)
    instead of O(nE·r·n_red²): asymptotically right for large micro meshes.

The mathematical identity with the reference: every reference cell-problem
RHS is linear in the constant macro-basis gradient (``hmm.py:371-395``
interpolates an affine function), so the reference's per-basis-function
correctors are exactly linear combinations of the generator correctors X_c,
and the reference's local stiffness ``S_loc`` (``hmm.py:361-369``) equals
|T| · P A*_c Pᵀ with P the macro P1 gradient/strain coefficients.  The
1/eps² · eps² cancellation (``hmm.py:652-667``) happens symbolically here.

Periodicity is eliminated by *construction* through the reduced vertex index
(see micro/periodic.py), replacing dolfinx_mpc constrained assembly.  The
constant nullspace (translations) is removed by pinning the dofs of reduced
vertex 0 — correctors shift by a constant, gradients and A* do not (replaces
the PETSc NullSpace dance of ``cell_problem.py:345-361``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.config import default_dtype
from hommx_tpu.meshes.simplex import SimplexMesh
from hommx_tpu.micro.periodic import build_periodic_map
from hommx_tpu.ops.elements import cell_geometry, quad_points_physical

__all__ = ["MicroEngine"]


def _with_precision(fn):
    """Trace the wrapped engine method under the engine's matmul precision
    (None → inherit the framework default set in config.py)."""
    import functools

    @functools.wraps(fn)
    def wrapped(self, *args, **kwargs):
        if self.matmul_precision is None:
            return fn(self, *args, **kwargs)
        with jax.default_matmul_precision(self.matmul_precision):
            return fn(self, *args, **kwargs)

    return wrapped


def _sym_map(M: jnp.ndarray) -> jnp.ndarray:
    """(d², d²) map taking a flattened gradient H_{pq}=∂u_p/∂y_q to the
    deformed strain e_D(u)_{ij} = ½ Σ_k (M_ik H_jk + M_jk H_ik).

    With M = I this is plain symmetrization H → e(u); with M = Dθᵀ(c_T) it is
    the stratified strain of the reference (``hmm.py:1024-1030``, using
    nabla_grad = gradᵀ).
    """
    d = M.shape[0]
    eye = jnp.eye(d, dtype=M.dtype)
    # T[(i,j),(p,q)] = 1/2 (M[i,q] δ[p,j] + M[j,q] δ[p,i])
    T = 0.5 * (
        jnp.einsum("iq,pj->ijpq", M, eye) + jnp.einsum("jq,pi->ijpq", M, eye)
    )
    return T.reshape(d * d, d * d)


class MicroEngine:
    """Batched periodic cell-problem solver on one replicated micro mesh.

    Args:
        micro_mesh: the unit-cell mesh Y (reference requires the unit cell on
            COMM_SELF, ``hmm.py:97-100``; here it is simply replicated data).
        bs: block size — 1 for scalar diffusion, d for elasticity.
        coeff_kind: 'scalar' | 'matrix' | 'tensor4' — shape of the user
            coefficient A(x, y) (scalar, (d,d), or (d,d,d,d)).
        quad_degree: micro quadrature degree (elementwise; replaces FFCx's
            automatic degree estimation).
        dtype: compute dtype.
        assembly: 'auto' | 'dense' | 'scatter' — K build strategy (see
            module docstring).
    """

    def __init__(
        self,
        micro_mesh: SimplexMesh,
        bs: int = 1,
        coeff_kind: str = "scalar",
        quad_degree: int = 2,
        dtype=None,
        assembly: str = "auto",
        solver: str = "auto",
        pcg_strategy: Optional[str] = None,
        pcg_tol: Optional[float] = None,
        pcg_maxiter: int = 1500,
        diag_scale: bool = True,
        matmul_precision: Optional[str] = None,
        micro_degree: int = 1,
        coeff_rank: int = 0,
        cell_prec: str = "k0inv",
        chol_backend: str = "auto",
        mg_nu: int = 0,
    ):
        self.mesh = micro_mesh
        self.bs = int(bs)
        self.coeff_kind = coeff_kind
        self.quad_degree = int(quad_degree)
        self.dtype = dtype or default_dtype()
        d = micro_mesh.dim
        self.d = d
        if bs not in (1, d):
            raise ValueError("bs must be 1 (scalar) or dim (vector)")
        if micro_degree not in (1, 2):
            raise ValueError("micro_degree must be 1 or 2")
        self.micro_degree = int(micro_degree)
        self.r = d if bs == 1 else d * d  # gradient components per element
        # Number of generator problems actually SOLVED: d for scalar,
        # d(d+1)/2 for elasticity (round 3).  The d² symmetrized generators
        # E_kl of the reference formulation satisfy E[:,kl] == E[:,lk]
        # exactly (minor symmetry), so their correctors and every derived
        # quantity are duplicates; the engine solves the Voigt set and
        # expands A*/correctors back to the (d², d²) layout on output
        # (_expand_astar/_expand_cols) — identical results, 2D: 4→3,
        # 3D: 9→6 right-hand sides through the whole solve pipeline.
        self.s = d if bs == 1 else d * (d + 1) // 2
        self.s_full = d if bs == 1 else d * d  # output layout (macro side)
        if micro_degree == 2:
            # P2 cell problems: periodic identification extends to edge-
            # midpoint dofs by the same hi→lo fold rule (periodic.py); the
            # engine's per-element pipeline is reused unchanged by treating
            # each (element, quadrature point) pair as an "effective element"
            # with its own constant gradient operator (see
            # _build_operators_impl).
            from hommx_tpu.micro.periodic import build_periodic_map_points
            from hommx_tpu.ops.p2 import (
                build_edges,
                p2_cell_dofs,
                p2_dof_coordinates,
            )

            edges, cell_edges = build_edges(
                micro_mesh.cells, micro_mesh.num_vertices
            )
            self._node_cells = p2_cell_dofs(
                micro_mesh.cells, cell_edges, micro_mesh.num_vertices
            )
            self.pmap = build_periodic_map_points(
                p2_dof_coordinates(micro_mesh.vertices, edges)
            )
        else:
            self._node_cells = micro_mesh.cells
            self.pmap = build_periodic_map(micro_mesh)
        self.n_reduced = self.pmap.n_reduced * self.bs
        self.volume_Y = micro_mesh.volume()
        if assembly == "auto":
            if bs > 1 and jnp.dtype(self.dtype) == jnp.float32:
                # round 3: scatter assembly avoids the per-cell
                # (nE·r, n)ᵀ(nE·r, n) dense-K matmul (255 MFLOP + a 2.6 MB
                # intermediate per 3D-elasticity cell) — measured 490 vs
                # 547 ms on the 4320-cell rotated-fiber micro stage
                assembly = "scatter"
            else:
                assembly = "dense" if self.n_reduced <= 512 else "scatter"
        self.assembly = assembly
        if solver == "auto":
            # Scalar f32 → chunk-level block-PCG (the matmul-shaped TPU
            # fast path, ~1M solves/s).  Block/tensor (elasticity) f32 →
            # diag-scaled batched Cholesky + one refinement sweep (round 3):
            # at cell-problem sizes (n_red ≈ 200) the batched factorization
            # costs the same as a handful of PCG iterations, has NO
            # iteration-count sensitivity to per-cell rotations or
            # coefficient contrast (the lockstep chunk PCG pays the worst
            # cell's count on every cell), never takes the zero-corrector
            # fallback, and measures MORE accurate (4.9e-7 vs 1.9e-6
            # against f64 on the rotated stiff-fiber cells).  f64 keeps
            # the exact Cholesky parity path.
            if jnp.dtype(self.dtype) != jnp.float32:
                solver = "cholesky"
            elif coeff_kind == "scalar" and bs == 1:
                solver = "pcg"
            else:
                solver = "cholesky"
        self.solver = solver
        # PCG strategy by iteration-cost structure:
        #   * scalar coefficients → chunk matrix-free: K is never
        #     materialized, every Krylov op is a shared-operand matmul with
        #     the cell axis minor (full TPU vector lanes); 1.05M vs 107k
        #     solves/s on the 16×16-micro benchmark (round 2, after the
        #     cell-minor layout fix).  Scalar cell problems converge in few
        #     iterations (shared-K₀ spectral equivalence), so skipping the
        #     per-cell Gram assembly dominates.
        #   * block/tensor problems → densek: with s = d² simultaneous RHS
        #     and the high iteration counts of contrast-heavy elasticity
        #     cells, the dense K·p matvec (n²·s per iter) is ~40× cheaper
        #     than the matrix-free expand/weight/reduce (nE·r·(n + r·s));
        #     the one-time assembly amortizes immediately (measured 139k
        #     vs 2.9k solves/s on the 3D stiff-fiber config).
        if pcg_strategy is None:
            pcg_strategy = (
                "matfree" if coeff_kind == "scalar" and bs == 1 else "densek"
            )
        if pcg_strategy not in ("densek", "matfree"):
            raise ValueError("pcg_strategy must be 'densek' or 'matfree'")
        self.pcg_strategy = pcg_strategy
        if pcg_tol is None:
            # The homogenized tensor's diagonal entries are CG energies,
            # which converge QUADRATICALLY in the residual (δA*_mm ≈
            # κ·r²·scale), and off-diagonals as √κ·r — residual 1e-5 is
            # ample even for ill-conditioned cells.  Cells whose energy
            # never descends below the zero corrector are clamped and
            # reported instead (see _block_pcg_matfree / BaseHMM.solve).
            pcg_tol = 1e-5 if jnp.dtype(self.dtype) == jnp.float32 else 1e-11
        self.pcg_tol = float(pcg_tol)
        self.pcg_maxiter = int(pcg_maxiter)
        # Per-cell symmetric diagonal scaling of the PCG system: solve
        # (S K S) Y = S F with S = diag(√(d₀/d)), d = diag(K_c), d₀ = diag(K₀),
        # then X = S Y.  This rebalances row magnitudes across the coefficient
        # contrast (soft shear rows are otherwise drowned by stiff rows in
        # f32) while keeping the shared K₀⁻¹ preconditioner well-matched —
        # the scaled system's diagonal is ≈ d₀ by construction.  Measured:
        # ~50× lower f32 tensor error on the contrast-1e5 fiber cell.  The CG
        # energy is invariant (½YᵀSKSY − (SF)ᵀY = ½XᵀKX − FᵀX), so the
        # zero-corrector energy clamp keeps its exact semantics.
        self.diag_scale = bool(diag_scale)
        # TPU f32 matmuls round inputs to bf16 by default (see config.py —
        # the framework default is "high").  Elasticity / tensor-coefficient
        # cell problems get "highest": their matmuls are small and
        # bandwidth-bound, so the extra passes are nearly free (+6% measured
        # on the beam) for 14× lower tensor error at contrast 2e5.
        if matmul_precision is None and (
            self.bs > 1 or coeff_kind != "scalar"
        ):
            matmul_precision = "highest"
        self.matmul_precision = matmul_precision
        # Chunk-Cholesky factorization backend (see ops/batched_chol.py):
        # XLA's batched cho_factor/cho_solve is latency-bound on TPU
        # (~57 GFLOP/s on the rotated-fiber batch); the hand-blocked
        # factorization keeps the heavy work in batch-major matmuls — 4×
        # on the same batch at identical tolerance.  'auto' uses it on the
        # TPU f32 path and keeps LAPACK-backed cho_factor elsewhere.
        if chol_backend not in ("auto", "xla", "blocked"):
            raise ValueError("chol_backend must be 'auto'|'xla'|'blocked'")
        self.chol_backend = chol_backend
        # Low-rank coefficient structure (opt-in, scalar coefficients only):
        # when A(x, y) = Σ_k f_k(x) g_k(y) with ≤ coeff_rank terms, the
        # per-element reduction a(c, e) has rank ≤ coeff_rank over the cell
        # batch, so K(c) = Σ_k u_k(c) K_k with coeff_rank *shared* basis
        # Gram matrices — per-cell K assembly (the densek bottleneck, ~80%
        # of per-cell time) disappears and every PCG matvec becomes
        # shared-operand matmuls.  EXACT when the declared rank covers the
        # coefficient (verify with ``check_coeff_rank``); measured 2× on the
        # 16×16-micro scalar benchmark.
        self.coeff_rank = int(coeff_rank)
        # cell_prec="fft": FFT-symbol preconditioner for the chunk PCG
        # (P1 on structured box meshes).  The reduced periodic dof
        # space is exactly the ix-major torus grid and the constant-
        # coefficient operator K(B) is block-circulant, so its DFT symbol —
        # LINEAR in B's entries — diagonalizes it exactly
        # (benchmarks/fft_preconditioner_feasibility.py).  Per cell the
        # preconditioner uses the mean coefficient and the cell's GᵀG
        # anisotropy, removing the iteration cost of the stratified maps
        # that the shared isotropic K₀⁻¹ cannot see.  Designed for scalar
        # problems: on strongly heterogeneous elasticity (e.g. inclusion
        # contrast 1e5) the MEAN-coefficient symbol is a weak
        # preconditioner — columns may hit the iteration cap and take the
        # zero-corrector fallback (watch ``diagnostics['fallback_cells']``);
        # the per-cell dense-K default is both faster and robust there.
        # cell_prec="mg" (round 5): torus geometric multigrid V-cycle on
        # the periodic stencil form of the per-cell operator
        # (micro/mg_prec.py) — mesh-size-robust where the FFT symbol is
        # contrast-weak (763 lockstep iterations on the 16³ contrast-1e5
        # fiber cell, round-4 verdict) and feasible at sizes where the
        # dense K₀ inverse is not.  Scalar AND vector (elasticity)
        # problems; requires a structured box micro mesh.
        if cell_prec not in ("k0inv", "fft", "mg"):
            raise ValueError("cell_prec must be 'k0inv', 'fft' or 'mg'")
        # Chebyshev smoothing degree for cell_prec='mg' (0 = auto; see
        # micro/chunk.py::_mg_nu for the measured degree/iteration curve)
        self.mg_nu = int(mg_nu)
        self.cell_prec = cell_prec
        self._fft_syms = None
        self._K0inv = None
        self._K0diag = None
        self._build_operators()

    # -- static operator construction (host, once) --------------------------
    def _build_operators(self):
        from hommx_tpu.config import host_setup

        with host_setup():  # eager setup math stays off the TPU (config.py)
            self._build_operators_impl()

    def _build_operators_impl(self):
        from hommx_tpu.micro.percell import build_operators

        build_operators(self)

    def element_coeff(self, coeff: Callable, x_center: jnp.ndarray) -> jnp.ndarray:
        """Ā_e = Σ_q w_eq A(c_T, y_eq) in canonical (ne, r, r) matrix form.

        P1 micro gradients are elementwise constant, so this is the only
        place quadrature appears; scalar coefficients stay scalar until the
        final broadcast (Ā_e = ā_e · I acting on gradient components).
        """
        d = self.d

        def at_point(y):
            return jnp.asarray(coeff(x_center, y), dtype=self.dtype)

        vals = jax.vmap(jax.vmap(at_point))(self.yq_dev)  # (ne, nq, ...)
        if self.coeff_kind == "scalar":
            a_e = jnp.einsum("eq,eq->e", self.wq_dev, vals.reshape(self.nE, self.nq))
            return a_e[:, None, None] * jnp.eye(self.r, dtype=self.dtype)
        if self.coeff_kind == "matrix":
            return jnp.einsum(
                "eq,eqij->eij", self.wq_dev, vals.reshape(self.nE, self.nq, d, d)
            )
        # tensor4: A[i,j,k,l] -> (d², d²) with test rows (ij), trial cols (kl)
        return jnp.einsum(
            "eq,eqrt->ert",
            self.wq_dev,
            vals.reshape(self.nE, self.nq, d * d, d * d),
        )

    # -- the per-cell kernel -------------------------------------------------
    def _grad_map(self, G: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
        """(r, r) map applied to corrector-side gradients: None (scalar,
        unmapped), G = Dθᵀ (stratified scalar), symmetrization (elasticity),
        or the deformed-strain map (stratified elasticity,
        reference ``hmm.py:1024-1030``)."""
        if self.bs == 1:
            return G  # None or (d, d)
        return self._eye_sym if G is None else _sym_map(G)

    @_with_precision
    def cell_tensor(self, Ae: jnp.ndarray, G: Optional[jnp.ndarray] = None):
        """Homogenized tensor A* (s, s) and generator correctors X (nred, s)
        for one macro quadrature point (per-cell route; see
        micro/percell.py::cell_tensor)."""
        from hommx_tpu.micro.percell import cell_tensor

        return cell_tensor(self, Ae, G)

    @_with_precision
    def solve_periodic(
        self, coeff, rhs=None, grad_rhs=None, x_center=None
    ) -> jnp.ndarray:
        """Standalone periodic variational solve a(u, v) = L(v) on the
        unit cell — the general ``PeriodicLinearProblem`` surface
        (reference ``cell_problem.py:303-388``); see
        micro/percell.py::solve_periodic for the full contract."""
        from hommx_tpu.micro.percell import solve_periodic

        return solve_periodic(self, coeff, rhs, grad_rhs, x_center)

    def _expand_astar(self, A: jnp.ndarray) -> jnp.ndarray:
        """Voigt (…, s, s) → full (…, d², d²) tensor layout (exact: the
        expanded entries are duplicates by minor symmetry)."""
        if self.sym_expand is None:
            return A
        e = jnp.asarray(self.sym_expand)
        return A[..., e[:, None], e[None, :]]

    def _expand_cols(self, X: jnp.ndarray) -> jnp.ndarray:
        """Voigt (…, s) correctors → full (…, d²) column layout."""
        if self.sym_expand is None:
            return X
        return X[..., jnp.asarray(self.sym_expand)]

    def _get_K0inv(self) -> jnp.ndarray:
        if self._K0inv is None:
            # unit-coefficient reduced operator, pinned, inverted once
            Ae0 = jnp.einsum(
                "e,rt->ert",
                jnp.sum(self.wq_dev, axis=1),
                jnp.eye(self.r, dtype=self.dtype),
            )
            T = self._grad_map(None)
            A_K = Ae0 if T is None else jnp.einsum("mr,emt,tn->ern", T, Ae0, T)
            K0 = (
                self._assemble_dense(A_K)
                if self.assembly == "dense"
                else self._assemble_scatter(A_K)
            )
            keep = jnp.logical_not(self.pin_mask).astype(self.dtype)
            K0 = K0 * keep[:, None] * keep[None, :] + jnp.diag(
                self.pin_mask.astype(self.dtype)
            )
            # invert in f64 for a high-quality preconditioner, store in dtype
            K0_64 = np.asarray(K0, dtype=np.float64)
            K0inv = np.linalg.inv(K0_64)
            self._K0inv = jnp.asarray(K0inv, dtype=self.dtype)
            self._K0diag = jnp.asarray(np.diag(K0_64), dtype=self.dtype)
        return self._K0inv

    def _get_K0diag(self, force_scatter: bool = False) -> jnp.ndarray:
        """Exact diag(K₀) (unit-coefficient pinned operator) WITHOUT
        assembling or inverting K₀ — the diagonal scaling only needs this
        reference scale.  Small spaces go through the cached inverse build
        (bitwise-identical numerics to the assembled path); large spaces
        (16³ elasticity cells, where a dense K₀ is infeasible) compute the
        diagonal by the per-element scatter formula (``force_scatter``
        exercises it on small spaces for the equivalence test)."""
        if self._K0diag is None:
            if self.n_reduced <= 4096 and not force_scatter:
                self._get_K0inv()
            else:
                Draw = np.asarray(self.Draw, dtype=np.float64)
                wsum = np.sum(np.asarray(self.wq, dtype=np.float64), axis=1)
                T = self._grad_map(None)
                if T is None:
                    AD = Draw * wsum[:, None, None]
                else:
                    Tn = np.asarray(T, dtype=np.float64)
                    AD = np.einsum(
                        "rt,etl->erl", Tn.T @ Tn, Draw
                    ) * wsum[:, None, None]
                l2r = np.asarray(self.loc2red)
                d0 = np.zeros(self.n_reduced)
                # per-(element, local-dof) SELF terms cover the diagonal
                # exactly when no element has two local dofs folded onto
                # the same reduced dof; a 1-element-wide periodic mesh
                # aliases them, and the intra-element CROSS terms then
                # also land on the diagonal (round-4 advisor finding) —
                # take the exact O(nE·nbl²) pair scatter in that case
                # (host, setup-only; the degenerate case is tiny anyway)
                aliased = any(
                    np.unique(row).size != row.size for row in l2r
                )
                if aliased:
                    vals = np.einsum("erl,erm->elm", Draw, AD)
                    same = l2r[:, :, None] == l2r[:, None, :]
                    np.add.at(
                        d0,
                        np.broadcast_to(l2r[:, :, None], same.shape)[same],
                        vals[same],
                    )
                else:
                    dl = np.einsum("erl,erl->el", Draw, AD)
                    np.add.at(d0, l2r.reshape(-1), dl.reshape(-1))
                d0[np.asarray(self.pin_mask)] = 1.0
                self._K0diag = jnp.asarray(d0, dtype=self.dtype)
        return self._K0diag

    def _scale_from_diag(self, d: jnp.ndarray) -> jnp.ndarray:
        """S = √(d₀/d) per reduced dof (see __init__ on diag_scale); pinned
        dofs and non-positive entries are left unscaled.  ``d`` may carry
        trailing batch axes after the dof axis."""
        d0 = self._get_K0diag().reshape((-1,) + (1,) * (d.ndim - 1))
        pin = self.pin_mask.reshape(d0.shape)
        bad = pin | (d <= 0) | ~jnp.isfinite(d)
        return jnp.where(
            bad, 1.0, jnp.sqrt(d0 / jnp.where(bad, 1.0, d))
        ).astype(self.dtype)

    def _assemble_dense(self, A_K: jnp.ndarray) -> jnp.ndarray:
        """K = D_flatᵀ (A_K D)_flat — one MXU matmul over (nE·r, nred)."""
        Z = jnp.einsum("ert,etn->ern", A_K, self.D)  # (ne, r, nred)
        nE, r, nred = Z.shape
        return jax.lax.dot_general(
            self.D.reshape(nE * r, nred),
            Z.reshape(nE * r, nred),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=A_K.dtype,
        )

    def _assemble_scatter(self, A_K: jnp.ndarray) -> jnp.ndarray:
        """Classical FEM assembly: per-element (nbl, nbl) blocks scattered
        into the dense reduced operator.  O(nE·nbl²) values."""
        vals = jnp.einsum(
            "erl,ert,etm->elm", self.Draw, A_K, self.Draw
        )  # (ne, nbl, nbl)
        rows = self.loc2red[:, :, None]  # (ne, nbl, 1)
        cols = self.loc2red[:, None, :]  # (ne, 1, nbl)
        flat = (rows * self.n_reduced + cols).reshape(-1)
        K = jnp.zeros(self.n_reduced * self.n_reduced, dtype=A_K.dtype)
        K = K.at[flat].add(vals.reshape(-1))
        return K.reshape(self.n_reduced, self.n_reduced)

    # -- chunk-level PCG path (the TPU fast path) ----------------------------
    def _raw_coeff(self, coeff: Callable, x_center: jnp.ndarray) -> jnp.ndarray:
        """Per-element reduced coefficient in compact form: (nE,) for scalar
        coefficients, (nE, r, r) canonical blocks otherwise."""
        d = self.d

        def at_point(y):
            return jnp.asarray(coeff(x_center, y), dtype=self.dtype)

        vals = jax.vmap(jax.vmap(at_point))(self.yq_dev)
        if self.coeff_kind == "scalar":
            return jnp.einsum("eq,eq->e", self.wq_dev, vals.reshape(self.nE, self.nq))
        if self.coeff_kind == "matrix":
            return jnp.einsum(
                "eq,eqij->eij", self.wq_dev, vals.reshape(self.nE, self.nq, d, d)
            )
        return jnp.einsum(
            "eq,eqrt->ert",
            self.wq_dev,
            vals.reshape(self.nE, self.nq, d * d, d * d),
        )

    @_with_precision
    def tensors_chunk_pcg(
        self, coeff, centers, G_fn=None, with_correctors=False,
        with_iters=False, implicit_diff=True,
    ):
        """A*(c_T) for one chunk of centers — the TPU fast path (see
        micro/chunk.py::tensors_chunk_pcg for the full layout story)."""
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod.tensors_chunk_pcg(
            self, coeff, centers, G_fn, with_correctors, with_iters,
            implicit_diff,
        )

    def _chol_chunk_solve(self, Kc, F):
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._chol_chunk_solve(self, Kc, F)

    def _chol_refine(self) -> bool:
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._chol_refine(self)

    def _use_chol_kernel(self, n: int) -> bool:
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._use_chol_kernel(self, n)

    def _bilinear_astar(self) -> bool:
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._bilinear_astar(self)

    def _use_pallas_pcg(self) -> bool:
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._use_pallas_pcg(self)

    def _get_stencil(self):
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._get_stencil(self)

    def _get_kron_M(self):
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._get_kron_M(self)

    def _get_kc_gather(self):
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._get_kc_gather(self)

    def _get_fft_symbols(self):
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._get_fft_symbols(self)

    def _get_block_stencil(self):
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._get_block_stencil(self)

    def _get_mg_levels(self, offsets, shape):
        from hommx_tpu.micro import chunk as _chunkmod

        return _chunkmod._get_mg_levels(self, offsets, shape)

    def check_coeff_rank(self, coeff, centers, rank: Optional[int] = None):
        """Host-side residual of the rank-R interpolative factorization of
        a(c, e) over the given cell centers.

        Call once before enabling ``coeff_rank``: a residual at rounding
        level (≲1e-6) means the declared rank covers the coefficient and the
        low-rank path is numerically exact; a large residual means the
        coefficient is not (numerically) of the form Σ_k f_k(x) g_k(y) with
        ≤ R terms and ``coeff_rank`` must not be used.
        """
        rank = rank or self.coeff_rank or 1
        centers = jnp.asarray(centers, dtype=self.dtype)
        a = np.asarray(
            jax.vmap(lambda x: self._raw_coeff(coeff, x))(centers),
            dtype=np.float64,
        )
        if a.ndim != 2:
            raise ValueError("coeff_rank applies to scalar coefficients only")
        nc = a.shape[0]
        anchors = np.linspace(0, nc - 1, min(rank, nc)).astype(int)
        V = a[anchors]
        U = np.linalg.pinv(V @ V.T, rcond=1e-12) @ (V @ a.T)
        return float(np.abs(a - U.T @ V).max() / max(np.abs(a).max(), 1e-300))

    def nocorrector_tensors(self, coeff, centers, G_fn=None):
        """A⁰(c_T) = (1/|Y|) Σ_e Eᵀ Ā_e E — the zero-corrector tensors.

        By energy minimization the exact A*(c_T) diagonal is bounded above by
        A⁰'s diagonal, so ``diag(A*) > diag(A⁰)`` flags a diverged iterative
        cell solve (the f32 PCG path can diverge silently on extreme
        coefficient contrast; see BaseHMM.solve's divergence guard).
        """
        centers = jnp.asarray(centers, dtype=self.dtype)

        def one(x):
            Ae = self.element_coeff(coeff, x)
            A0 = self._expand_astar(
                jnp.einsum("rn,ert,tm->nm", self.E, Ae, self.E) / self.volume_Y
            )
            # within-cell coefficient contrast estimate (ratio of largest to
            # smallest canonical-block diagonal entry over micro elements —
            # diagonals see the soft shear moduli that a trace would mask):
            # large contrast bounds the accuracy of the f32 PCG path
            dg = jnp.einsum("err->er", Ae)
            contrast = jnp.max(dg) / jnp.maximum(jnp.min(dg), 1e-30)
            return A0, contrast

        return jax.vmap(one)(centers)

    # -- batched over macro quadrature points --------------------------------
    def tensors_for_centers(
        self,
        coeff: Callable,
        centers: jnp.ndarray,
        G_fn: Optional[Callable] = None,
        chunk: int = 0,
        with_correctors: bool = False,
        implicit_diff: bool = True,
    ):
        """A*(c_T) for a batch of macro cell centers (nc, d).

        Args:
            coeff: JAX callable A(x, y).
            G_fn: optional Dθᵀ(x) callable (stratified variants).
            chunk: cells per vmapped chunk (0 = auto).
        Returns: (nc, s, s) tensors [and (nc, nred, s) correctors].
        """
        centers = jnp.asarray(centers, dtype=self.dtype)
        nc = centers.shape[0]
        chunk = chunk or self._auto_chunk(nc)

        # NOTE: non-scalar densek deliberately stays on the per-cell vmapped
        # route — measured 143.6k vs 62.4k solves/s on the 3D stiff-fiber
        # config against the chunk-level dense matvec (identical checksums):
        # at s = d² RHS the batched K@P matmul dominates and prefers the
        # (C, n, s) layout, the opposite trade from the scalar chunk path.
        # The chunk dense-K matvec remains reachable via cell_prec='fft'.
        use_chunk = (
            self.pcg_strategy == "matfree"
            or self.cell_prec in ("fft", "mg")
            or (self.coeff_rank > 0 and self.coeff_kind == "scalar")
        )
        # f32 block/tensor Cholesky rides the chunk machinery too (round 3):
        # same Kc assembly as densek, batched direct solve, and — decisive —
        # the chunk-level CELL-MINOR layout for the RHS and Φ/A* stages.
        # The per-cell einsum layout ran those as tiny padded per-cell
        # contractions: measured 115 ms of the 456 ms rotated-fiber micro
        # stage in the final contraction alone.
        chol_route = (
            self.solver == "cholesky"
            and self.bs > 1
            and jnp.dtype(self.dtype) == jnp.float32
            and self.D is not None
        )
        # the chunk machinery is D-free (round 4): matfree uses loc2red
        # gathers, densek assembles Kc from the per-element Draw blocks —
        # so large micro spaces (16³ elasticity, D over its size cap)
        # route here instead of falling back to the per-cell path, whose
        # dense-K₀ preconditioner cannot exist at that size
        if chol_route or (self.solver == "pcg" and use_chunk):
            import os

            if (
                chol_route
                and not with_correctors
                and os.environ.get("HOMMX_CHOL_SOLVE_BATCH", "0") == "1"
                # resident whole-batch operators + panels ≈ 2·nc·n²
                # floats; decline past ~6 GB and take the in-chunk route
                and 2 * nc * self.n_reduced**2 * 4 <= (6 << 30)
            ):
                # round-5 opt-in: assemble per chunk, factor+solve the
                # WHOLE batch once (the dispatch-latency-bound phase
                # amortizes with C), contract per batch — see
                # micro/chunk.py::tensors_chol_batched
                from hommx_tpu.micro import chunk as _chunkmod

                return _chunkmod.tensors_chol_batched(
                    self, coeff, centers, G_fn, chunk
                )
            return _map_chunked(
                lambda cs: self.tensors_chunk_pcg(
                    coeff, cs, G_fn, with_correctors=with_correctors,
                    implicit_diff=implicit_diff,
                ),
                centers,
                chunk,
                chunk_fn=True,
            )

        def one(x):
            Ae = self.element_coeff(coeff, x)
            G = None if G_fn is None else jnp.asarray(G_fn(x), dtype=self.dtype)
            Astar, X = self.cell_tensor(Ae, G)
            return (Astar, X) if with_correctors else Astar

        return _map_chunked(one, centers, chunk)

    def _auto_chunk(self, nc: int) -> int:
        # keep the dominant per-cell temporaries under ~1 GB
        itemsize = jnp.dtype(self.dtype).itemsize
        if jnp.dtype(self.dtype) == jnp.float64:
            itemsize *= 2  # TPU f64 emulation stores float32 pairs
        chol_chunk = (
            self.solver == "cholesky"
            and self.bs > 1
            and jnp.dtype(self.dtype) == jnp.float32
        )
        chunk_path = self.solver == "pcg" or (
            chol_chunk and self.D is not None
        )
        if chunk_path:
            # the chunk PCG never materializes K; per-cell state is the
            # gradient-field work arrays (nE·r·s) and the (n, s) Krylov
            # vectors (X R P Z KP bX + einsum temporaries).  Capped at 2048:
            # chunk-level PCG is lockstep (a chunk iterates until its worst
            # cell converges), and both the lockstep tail isolation on
            # heterogeneous problems and the measured median throughput
            # curve (round 3, fresh-input 5-rep medians on the benchmark
            # config: 1.06M at 2048, 1.00M at 4096, 0.90M at 8192, 0.76M
            # at 16384) favour moderate chunks over maximal ones.
            per_cell = (
                16 * self.nE * self.r * self.s + 10 * self.n_reduced * self.s
            ) * itemsize
            if (
                self.pcg_strategy == "densek" or chol_chunk
            ) and self.coeff_kind != "scalar":
                # dense-K / chunk-Cholesky strategies materialize the
                # per-cell reduced operator (plus its equilibrated copy and
                # factor on the Cholesky route) and the element-block
                # scatter source
                per_cell += (
                    (4 if chol_chunk else 2)
                    * self.n_reduced
                    * self.n_reduced
                    + self.nE * self.nbl * self.nbl
                ) * itemsize
            # The chunk-Cholesky route wants LARGE chunks: with the blocked
            # factorization the heavy work is batch-major matmuls whose MXU
            # utilization grows with the batch (rotated-fiber beam, blocked
            # backend: 307 ms at chunk 491, 178 ms at 1024, 163 ms at 2160,
            # 173 ms at 4320) — so it gets a 4 GB budget (HBM is 16 GB on
            # v5e; the estimate stays conservative for large micro meshes).
            # The lockstep PCG keeps the 1 GB / 2048 cap: its chunk curve
            # favours moderate chunks (see above).
            budget = (4 << 30) if chol_chunk else (1 << 30)
            cap = 2048 if not chol_chunk else 4096
            limit = int(np.clip(budget // max(per_cell, 1), 1, min(nc, cap)))
            if nc > limit:
                # equalize: _map_chunked pads the batch to a chunk multiple,
                # so a chunk size just under nc/k wastes up to a full
                # chunk of duplicated cells (measured 399 ms at chunk 1966
                # vs 159 ms at 2160 on the 4320-cell rotated-fiber batch —
                # 3 chunks with 1578 padded cells vs 2 exact ones).  Using
                # ceil(nc / ceil(nc / limit)) keeps chunks equal-sized
                # within the memory budget with at most k-1 padded cells.
                limit = int(np.ceil(nc / np.ceil(nc / limit)))
            return limit
        # per-cell dense path (cholesky / densek): the assembled K (n_red²),
        # the dense-D contraction intermediate Z (nE·r·n_red — dominant for
        # elasticity), and the per-element coefficient blocks
        z_term = (
            self.nE * self.r * self.n_reduced
            if self.D is not None and self.assembly == "dense"
            else 0
        )
        per_cell = (
            2 * self.n_reduced * self.n_reduced
            + 2 * z_term
            + 4 * self.nE * self.r * max(self.r, self.nbl)
        ) * itemsize
        budget = 1 << 30
        return int(np.clip(budget // max(per_cell, 1), 1, max(nc, 1)))




# Krylov machinery lives in micro/krylov.py since the round-5 split; the
# names are re-exported here because tests/benchmarks import them from
# this module (the historical home).
from hommx_tpu.micro.krylov import (  # noqa: E402  (re-export)
    _amp_cap,
    _block_pcg_matfree,
    _chunk_pcg,
    _chunk_pcg_raw,
    _clamp_good,
    _map_chunked,
    _solve_linear,
)
