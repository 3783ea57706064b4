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
        if cell_prec not in ("k0inv", "fft"):
            raise ValueError("cell_prec must be 'k0inv' or 'fft'")
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
        mesh, d, bs = self.mesh, self.d, self.bs
        # geometry in f64 regardless of compute dtype: quadrature-point
        # coordinates feed the user coefficient, and discontinuous
        # coefficients (laminates, inclusions) are knife-edge sensitive to
        # point placement — f32-rounded points flip indicator functions at
        # interface-aligned points (SURVEY.md §7 "hard parts"), which showed
        # up as ~10% assembly differences between dtypes
        f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        verts = jnp.asarray(mesh.vertices, dtype=f64)
        cells = jnp.asarray(mesh.cells)
        grads, vols = cell_geometry(verts, cells)  # (ne, d+1, d), (ne,)
        quad_degree = self.quad_degree
        if self.micro_degree == 2:
            # ∇P2·∇P2 integrands are quadratic — degree-2 rules minimum
            quad_degree = max(quad_degree, 2)
        xq, wq, lam_q = quad_points_physical(verts, cells, quad_degree)
        ne, nq = wq.shape
        grads_np = np.asarray(grads)  # (ne, d+1, d) = ∇λ_a per cell

        red = self.pmap.reduced_index  # (n_nodes,)
        node_cells = self._node_cells  # (ne, nnd): P1 vertices or P2 nodes
        nnd = node_cells.shape[1]
        nbl = nnd * bs  # local dofs per micro element
        self.nbl = nbl

        if self.micro_degree == 2:
            # P2 gradients vary per quadrature point, so the P1 trick of
            # folding quadrature into Ā_e does not apply across points.
            # Instead each (element, q) pair becomes an *effective element*
            # with constant gradients ∇φ_k(x_q) = Σ_i c[q,k,i]·∇λ_i and
            # weight w_eq — the entire downstream engine (coefficient
            # reduction, PCG, diagonal scaling, A* contraction) is reused
            # verbatim with nE → ne·nq.
            from hommx_tpu.ops.p2 import p2_basis

            xi = np.asarray(lam_q)[:, 1:]  # local coords of the quad points
            _, dlam = p2_basis(jnp.asarray(xi), d)  # (nq, nnd, d+1)
            dphi = np.einsum(
                "qki,eid->eqkd", np.asarray(dlam), grads_np
            )  # (ne, nq, nnd, d)
            ne_eff = ne * nq
            dphi = dphi.reshape(ne_eff, nnd, d)
            Draw = np.zeros((ne_eff, self.r, nbl), dtype=np.float64)
            for a in range(nnd):
                if bs == 1:
                    Draw[:, :, a] = dphi[:, a, :]
                else:
                    for i in range(bs):
                        Draw[:, i * d : (i + 1) * d, a * bs + i] = dphi[:, a, :]
            node_cells = np.repeat(node_cells, nq, axis=0)  # (ne·nq, nnd)
            self.yq = np.asarray(xq).reshape(ne_eff, 1, d)
            self.wq = np.asarray(wq).reshape(ne_eff, 1)
            ne, nq = ne_eff, 1
        else:
            # local gradient operator Draw: (ne, r, nbl) — P1 gradients are
            # elementwise constant, so quadrature folds into Ā_e
            Draw = np.zeros((ne, self.r, nbl), dtype=np.float64)
            for a in range(d + 1):
                if bs == 1:
                    Draw[:, :, a] = grads_np[:, a, :]
                else:
                    for i in range(bs):
                        # component i of vector dof (a, i) contributes
                        # grad_a[j] to gradient entry H_{ij} (row i*d+j)
                        Draw[:, i * d : (i + 1) * d, a * bs + i] = grads_np[
                            :, a, :
                        ]
            self.yq = np.asarray(xq)  # (ne, nq, d) quadrature points (f64)
            self.wq = np.asarray(wq)  # (ne, nq) weights, Σ = |Y|
        self.nE, self.nq = ne, nq
        self.Draw = jnp.asarray(Draw, dtype=self.dtype)

        # local -> reduced dof map (ne, nbl)
        red_cells = red[node_cells]  # (ne, nnd)
        if bs == 1:
            loc2red = red_cells
        else:
            comp = np.arange(bs)
            loc2red = (red_cells[:, :, None] * bs + comp[None, None, :]).reshape(
                ne, nbl
            )
        self.loc2red = jnp.asarray(loc2red)

        nred = self.n_reduced
        # The dense reduced gradient operator D (ne, r, nred) is *shared*
        # across all macro cells, so it can afford to be much larger than a
        # per-cell dense K — build it whenever it fits comfortably.
        if ne * self.r * nred <= 5e7:
            D = np.zeros((ne, self.r, nred), dtype=np.float64)
            e_idx = np.arange(ne)[:, None, None]
            r_idx = np.arange(self.r)[None, :, None]
            np.add.at(D, (e_idx, r_idx, loc2red[:, None, :]), Draw)
            self.D = jnp.asarray(D, dtype=self.dtype)
        else:
            self.D = None
        if self.assembly == "dense" and self.D is None:
            raise ValueError("dense assembly requested but operator too large")

        # generator fields E: (r, s) — the Voigt set for elasticity (the
        # distinct symmetrized generators; see __init__ on self.s)
        if bs == 1:
            E = np.eye(d)
            self.sym_expand = None
        else:
            pairs = [(k, l) for k in range(d) for l in range(k, d)]
            E = np.zeros((d * d, len(pairs)))
            for j, (k, l) in enumerate(pairs):
                Ekl = np.zeros((d, d))
                Ekl[k, l] += 0.5
                Ekl[l, k] += 0.5
                E[:, j] = Ekl.reshape(-1)
            # expansion map Voigt column → (k·d+l) full column
            self.sym_expand = np.asarray(
                [
                    pairs.index((min(k, l), max(k, l)))
                    for k in range(d)
                    for l in range(d)
                ]
            )
        self.E = jnp.asarray(E, dtype=self.dtype)

        # nullspace pinning: the bs dofs of reduced vertex 0
        pin = np.zeros(nred, dtype=bool)
        pin[:bs] = True
        self.pin_mask = jnp.asarray(pin)
        # quadrature COORDINATES stay f64 (coefficient sampling robustness);
        # everything downstream of coefficient VALUES uses the compute dtype
        self.yq_dev = jnp.asarray(self.yq, dtype=f64)
        self.wq_dev = jnp.asarray(self.wq, dtype=self.dtype)
        self._eye_sym = (
            _sym_map(jnp.eye(d, dtype=self.dtype)) if bs == d else None
        )
        if self.solver == "pcg" and self.cell_prec != "fft":
            self._get_K0inv()  # build eagerly — np.linalg.inv can't trace
        elif self.solver == "pcg" or (
            self.solver == "cholesky"
            and self.diag_scale
            and jnp.dtype(self.dtype) == jnp.float32
        ):
            # only the diagonal scaling reference is needed (the f32
            # Cholesky equilibration, and the pcg+fft route whose
            # preconditioner is the FFT symbol): skip the dense K₀ inverse
            # entirely — at 16³-elasticity cell sizes (n_red ≈ 12k) it is
            # infeasible, and this is exactly what makes large micro
            # resolutions runnable (round-3 verdict item 1)
            self._get_K0diag()
        if self.cell_prec == "fft":
            self._get_fft_symbols()  # eager — host FFT can't trace

    # -- coefficient reduction ----------------------------------------------
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
        for one macro quadrature point.

        Ae: (ne, r, r) per-element reduced coefficient (see element_coeff).
        G:  optional Dθᵀ(c_T) gradient map (stratified variants).
        """
        Ae = jnp.asarray(Ae, dtype=self.dtype)
        if G is not None:
            G = jnp.asarray(G, dtype=self.dtype)
        T = self._grad_map(G)
        # test/trial-mapped per-element coefficient blocks:
        #   K-side:  Tᵀ Ā T   (both sides correctors)
        #   F-side:  Tᵀ Ā     (test corrector, trial macro field E)
        if T is None:
            A_K = Ae
            A_F = Ae
        else:
            # mapped fields are T·(gradient): K-side Tᵀ Ā T, F-side Tᵀ Ā
            A_K = jnp.einsum("mr,emt,tn->ern", T, Ae, T)
            A_F = jnp.einsum("mr,emt->ert", T, Ae)

        # RHS F[n, s] = -Σ_e D_eᵀ (Tᵀ Ā_e) E
        AE = jnp.einsum("ert,ts->ers", A_F, self.E)  # (ne, r, s)
        F_loc = -jnp.einsum("erl,ers->els", self.Draw, AE)  # (ne, nbl, s)
        F = jnp.zeros((self.n_reduced, self.s), dtype=Ae.dtype)
        F = F.at[self.loc2red.reshape(-1)].add(F_loc.reshape(-1, self.s))

        # pin translations (constant nullspace)
        keep = jnp.logical_not(self.pin_mask).astype(Ae.dtype)
        pinf = self.pin_mask.astype(Ae.dtype)
        F = F * keep[:, None]

        if self.solver == "cholesky" or self.pcg_strategy == "densek":
            K = (
                self._assemble_dense(A_K)
                if self.assembly == "dense"
                else self._assemble_scatter(A_K)
            )
            K = K * keep[:, None] * keep[None, :] + jnp.diag(pinf)
            if self.solver == "cholesky":
                if jnp.dtype(self.dtype) == jnp.float32 and self.diag_scale:
                    # f32 robustness on contrast-heavy cells (round 3):
                    # symmetric diagonal equilibration K_s = S K S (same S
                    # as the PCG path — brings κ near its diagonal-scaled
                    # optimum) + one iterative-refinement sweep, which
                    # removes the O(κ_s·eps) factorization error at the
                    # cost of one matvec + one triangular solve.  Unlike
                    # the PCG path, the direct solve has NO
                    # iteration-count sensitivity to per-cell rotations —
                    # the stratified beam cells cost the same as aligned
                    # ones (measured 5x end-to-end on the rotated-fiber
                    # profile, benchmarks/elasticity_profile3.py).
                    sc = self._scale_from_diag(jnp.diagonal(K))[:, None]
                    Ks = sc * K * sc.T
                    c, low = jax.scipy.linalg.cho_factor(Ks)
                    Y = jax.scipy.linalg.cho_solve((c, low), sc * F)
                    X = sc * Y
                    R = F - K @ X
                    X = X + sc * jax.scipy.linalg.cho_solve((c, low), sc * R)
                else:
                    c, low = jax.scipy.linalg.cho_factor(K)
                    X = jax.scipy.linalg.cho_solve((c, low), F)
            elif self.diag_scale:
                sc = self._scale_from_diag(jnp.diagonal(K))[:, None]
                Y = _block_pcg_matfree(
                    lambda p: sc * (K @ (sc * p)), sc * F,
                    self._get_K0inv(), self.pcg_tol, self.pcg_maxiter,
                )
                X = sc * Y
            else:
                X = _block_pcg_matfree(
                    lambda p: K @ p, F, self._get_K0inv(), self.pcg_tol,
                    self.pcg_maxiter,
                )
        else:
            # Matrix-free PCG: K is never materialized.  K·p is applied as
            # D̃ᵀ (Ā ∘ (D̃ p)) with the *shared* gradient operator D̃ — under
            # vmap over macro cells this turns every PCG step into one
            # shared-operand matmul with (cells × s) columns, i.e. pure MXU
            # work with per-cell memory traffic of O(nE·r²) (the coefficient
            # blocks) instead of O(n_red²) (the assembled K).
            def matvec(p):
                pk = p * keep[:, None]
                if self.D is not None:
                    Dp = jnp.einsum("ern,ns->ers", self.D, pk)
                    w = jnp.einsum("ert,ets->ers", A_K, Dp)
                    Kp = jnp.einsum("ern,ers->ns", self.D, w)
                else:
                    p_loc = pk[self.loc2red]  # (ne, nbl, s)
                    Dp = jnp.einsum("erl,els->ers", self.Draw, p_loc)
                    w = jnp.einsum("ert,ets->ers", A_K, Dp)
                    wl = jnp.einsum("erl,ers->els", self.Draw, w)
                    Kp = (
                        jnp.zeros_like(p)
                        .at[self.loc2red.reshape(-1)]
                        .add(wl.reshape(-1, self.s))
                    )
                return Kp * keep[:, None] + pinf[:, None] * p

            if self.diag_scale:
                # exact diag(K) without materializing K
                if self.D is not None:
                    d = jnp.einsum("ern,ert,etn->n", self.D, A_K, self.D)
                else:
                    dl = jnp.einsum(
                        "erl,ert,etl->el", self.Draw, A_K, self.Draw
                    )
                    d = (
                        jnp.zeros(self.n_reduced, dtype=Ae.dtype)
                        .at[self.loc2red.reshape(-1)]
                        .add(dl.reshape(-1))
                    )
                sc = self._scale_from_diag(d)[:, None]
                Y = _block_pcg_matfree(
                    lambda p: sc * matvec(sc * p), sc * F,
                    self._get_K0inv(), self.pcg_tol, self.pcg_maxiter,
                )
                X = sc * Y
            else:
                X = _block_pcg_matfree(
                    matvec, F, self._get_K0inv(), self.pcg_tol, self.pcg_maxiter
                )

        # corrected per-element fields Φ_e = E + T D_e X_loc
        X_loc = X[self.loc2red]  # (ne, nbl, s)
        DX = jnp.einsum("erl,els->ers", self.Draw, X_loc)  # (ne, r, s)
        if T is not None:
            DX = jnp.einsum("rt,ets->ers", T, DX)
        Phi = self.E[None, :, :] + DX  # (ne, r, s)
        # Astar[n_test, m_trial] = (1/|Y|) Σ_e Φ[:,n]ᵀ Ā_e Φ[:,m]
        Astar = jnp.einsum("ern,ert,etm->nm", Phi, Ae, Phi) / self.volume_Y
        return self._expand_astar(Astar), self._expand_cols(X)

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
        """A*(c_T) for one chunk of centers — the TPU fast path.

        Layout-conscious chunk-level block-PCG: all cells' generator RHS are
        flattened into one column axis, so every Krylov operation is a
        *shared-operand* matmul ``(nE·r, n) @ (n, s·C)`` (MXU-shaped — a
        per-cell formulation would run d-column-skinny matmuls at ~1% lane
        utilization), with the cell axis C kept minor so elementwise work
        fills the TPU vector lanes (see the axis-conventions note below).
        K is never materialized; per-iteration memory traffic is O(C·nE)
        coefficient scalars instead of O(C·n²) assembled entries.
        """
        C = centers.shape[0]
        nE, r, s, n = self.nE, self.r, self.s, self.n_reduced
        raw = jax.vmap(lambda x: self._raw_coeff(coeff, x))(centers)
        G = (
            None
            if G_fn is None
            else jax.vmap(lambda x: jnp.asarray(G_fn(x), dtype=self.dtype))(centers)
        )
        D2 = None if self.D is None else self.D.reshape(nE * r, n)
        keep = jnp.logical_not(self.pin_mask).astype(self.dtype)[:, None, None]
        pinf = self.pin_mask.astype(self.dtype)[:, None, None]

        # Axis conventions: gradient fields (nE, r, s, C); Krylov state
        # (n, s, C); per-cell maps (C, r, r); scalar coefficient reductions
        # a (C, nE).  The big cell axis C is ALWAYS the minor (last)
        # dimension: TPU tiles use the last dim for the 128-wide vector
        # lanes, and the s-minor layout (s = 2..9) was measured to waste
        # ~4.5× on every elementwise op in the CG loop.
        scalar_sep = self.coeff_kind == "scalar"
        # Route flags, hoisted above the coefficient mapping so the A_K
        # materialization can be skipped on the Kron fast path below.
        chol_chunk = self.solver == "cholesky" and not scalar_sep
        densek_chunk = (
            self.pcg_strategy == "densek" or chol_chunk
        ) and not scalar_sep
        fft_prec = self.cell_prec == "fft" and not chol_chunk
        if scalar_sep:
            a = raw  # (C, nE); canonical Ā_e = a[c,e]·I — kept separable
            a_w = a.T[:, None, None, :]  # (nE, 1, 1, C) broadcast weight
            B_K = None if G is None else jnp.einsum("cmr,cmt->crt", G, G)  # GᵀG
            B_F = None if G is None else jnp.swapaxes(G, 1, 2)  # Gᵀ
            B_Phi = G  # field map T = G (None → identity)
        else:
            Ae_blocks = raw  # (C, nE, r, r) canonical
            if self.bs == self.d:
                T = (
                    jnp.broadcast_to(self._eye_sym, (C, r, r))
                    if G is None
                    else jax.vmap(_sym_map)(G)
                )
            else:  # matrix coefficient, scalar problem
                T = G
            if T is None:
                A_K, A_F, B_Phi = Ae_blocks, Ae_blocks, None
            else:
                A_F = jnp.einsum("cmr,cemt->cert", T, Ae_blocks)
                B_Phi = T
                if densek_chunk and not fft_prec:
                    # Kron fast path: A_K = Tᵀ Ā T is consumed ONLY by the
                    # Kc assembly here, and building it as a (C, nE, r, r)
                    # einsum puts the tiny r dims on the (8,128) tile.
                    # Skip it — the assembly below contracts Ā directly
                    # against T⊗T and the static Draw⊗Draw map as two
                    # batch-major MXU matmuls (measured 67.8 → 54.4 ms on
                    # the rotated-fiber Kc build, /tmp A/B, exact
                    # reassociation of the same sum).
                    A_K = None
                else:
                    A_K = jnp.einsum("cmr,cemt,ctn->cern", T, Ae_blocks, T)

        # dense-K chunk strategy (block/tensor problems): assemble the
        # per-cell reduced operators ONCE (batched scatter of element
        # blocks) and run the chunk PCG with a batched dense matvec — at
        # s simultaneous RHS and contrast-driven iteration counts the
        # n²-per-iteration matvec is far cheaper than matrix-free
        # expand/weight/reduce, while the chunk-level (n, s, C) layout
        # keeps every elementwise CG op on full vector lanes.  The
        # chunk Cholesky route (the f32 elasticity default, round 3)
        # reuses the same Kc assembly and replaces the Krylov loop with a
        # batched direct solve (_chol_chunk_solve).  (chol_chunk /
        # densek_chunk / fft_prec flags are hoisted above the coefficient
        # mapping.)
        if densek_chunk:
            if A_K is None:
                # Kron fast path (see the coefficient mapping above):
                # blocks[c,e,l,m] = Draw[e,r,l]·T[c,m̄,r]·Ā[c,e,m̄,t̄]·
                # T[c,t̄,t]·Draw[e,t,m], contracted as
                # (C,nE,r²)·(C,r²,r²)·(nE,r²,nbl²) — the per-cell T⊗T and
                # the static Draw⊗Draw Gram stay MXU-shaped instead of
                # r-tiny einsum stages.
                TkT = jnp.einsum("cmr,ctn->cmtrn", T, T).reshape(
                    C, r * r, r * r
                )
                AKv = jnp.einsum(
                    "cex,cxy->cey", Ae_blocks.reshape(C, nE, r * r), TkT
                )
                blocks_flat = jnp.einsum(
                    "cex,exy->cey", AKv, self._get_kron_M()
                ).reshape(C, -1)  # (C, nE·nbl²)
            else:
                blocks_flat = jnp.einsum(
                    "erl,cert,etm->celm", self.Draw, A_K, self.Draw
                ).reshape(C, -1)
            kcg = self._get_kc_gather()
            if kcg is not None:
                # gather-table assembly (see _get_kc_gather): element blocks
                # stay in the einsum's natural cell-major (C, src) layout —
                # a source-major (src, C) variant forces XLA to materialize
                # the (C, nE, r, r) coefficient batch with the tiny r dims
                # on the (8,128) tile (measured 25× padding blowup → OOM at
                # chunk 4320) — then one fixed-width contributor gather and
                # one placement gather along the minor source axis; keep/pin
                # masking is static per target
                tab, inv_map, keep_vec, pin_vec = kcg
                bft = jnp.concatenate(
                    [blocks_flat, jnp.zeros((C, 1), self.dtype)], axis=1
                )
                vals = jnp.sum(bft[:, jnp.asarray(tab)], axis=2)  # (C, nnz)
                vals = vals * jnp.asarray(keep_vec, self.dtype)[
                    None, :
                ] + jnp.asarray(pin_vec, self.dtype)[None, :]
                vals = jnp.concatenate(
                    [vals, jnp.zeros((C, 1), self.dtype)], axis=1
                )
                Kc = vals[:, jnp.asarray(inv_map)].reshape(C, n, n)
            else:
                rows = self.loc2red[:, :, None]
                cols = self.loc2red[:, None, :]
                flat = jnp.asarray((rows * n + cols).reshape(-1))
                Kc = jnp.zeros((C, n * n), dtype=self.dtype)
                Kc = Kc.at[:, flat].add(blocks_flat)
                keepn = jnp.logical_not(self.pin_mask).astype(self.dtype)
                pinn = self.pin_mask.astype(self.dtype)
                Kc = Kc.reshape(C, n, n) * keepn[None, :, None] * keepn[
                    None, None, :
                ] + jnp.diag(pinn)[None]

        # Low-rank coefficient path (see __init__ on coeff_rank): factorize
        # a ≈ U V through R anchor cells (f64 — interpolative, exact when the
        # declared rank covers the coefficient), precompute R shared basis
        # Grams K_k, and matvec as K p = Σ_k u_k (K_k p) — all shared-operand
        # matmuls, no per-cell K.
        # Periodic-stencil matvec (micro/stencil.py): on structured box
        # micro meshes the reduced dof space is the torus grid, and K·p
        # becomes Σ_k w_k ⊙ roll(p, -Δ_k) — ~280× fewer FLOPs per chunk
        # iteration than the matrix-free expand/weight/reduce matmuls.
        # Takes precedence over the low-rank path (its R shared dense
        # matvecs are still n² per iteration).
        stencil = (
            self._get_stencil()
            if scalar_sep and not densek_chunk and self.solver == "pcg"
            else None
        )
        if stencil is not None:
            from hommx_tpu.micro.stencil import (
                stencil_astar,
                stencil_matvec,
                stencil_rhs,
                stencil_weights,
            )

            stencil_ws = stencil_weights(stencil, a, B_K)

        lowrank = (
            self.coeff_rank > 0
            and scalar_sep
            and B_K is None
            and self.D is not None
            and stencil is None
        )
        if lowrank:
            R = min(self.coeff_rank, C)
            anchors = jnp.asarray(np.linspace(0, C - 1, R).astype(np.int64))
            a64 = a.astype(jnp.float64)
            V = a64[anchors]  # (R, nE)
            U = jnp.linalg.pinv(V @ V.T, rcond=1e-12) @ (V @ a64.T)  # (R, C)
            keepn = jnp.logical_not(self.pin_mask).astype(jnp.float64)
            w = jnp.repeat(V, r, axis=1).reshape(R, nE * r)
            D2_64 = D2.astype(jnp.float64)
            Kb = jnp.einsum("kz,zn,zm->knm", w, D2_64, D2_64)
            Kb = (Kb * keepn[None, :, None] * keepn[None, None, :]).astype(
                self.dtype
            )
            U = U.astype(self.dtype)

        def expand(cols):  # (n, s, C) -> (nE, r, s, C) gradient fields
            if D2 is not None:
                return (D2 @ cols.reshape(n, s * C)).reshape(nE, r, s, C)
            # D-free route (large micro spaces, e.g. 16³ elasticity cells
            # where the shared dense operator exceeds its size cap):
            # gather local dofs and apply the per-element Draw blocks
            p_loc = cols[self.loc2red]  # (nE, nbl, s, C)
            return jnp.einsum("erl,elsc->ersc", self.Draw, p_loc)

        def reduce_(fields):  # (nE, r, s, C) -> (n, s, C)
            if D2 is not None:
                return (D2.T @ fields.reshape(nE * r, s * C)).reshape(
                    n, s, C
                )
            wl = jnp.einsum("erl,ersc->elsc", self.Draw, fields)
            return (
                jnp.zeros((n, s, C), dtype=fields.dtype)
                .at[self.loc2red.reshape(-1)]
                .add(wl.reshape(nE * self.nbl, s, C))
            )

        def apply_map(B, fields):  # per-cell (r,r) block on gradient fields
            return fields if B is None else jnp.einsum("crt,etsc->ersc", B, fields)

        def apply_AK(Dp):  # weight gradient fields by the K-side coefficient
            if scalar_sep:
                return apply_map(B_K, Dp) * a_w
            return jnp.einsum("cert,etsc->ersc", A_K, Dp)

        def matvec(P):
            if densek_chunk:
                # keep/pin structure is baked into Kc (identity at pins)
                return jnp.einsum("cnm,msc->nsc", Kc, P)
            if stencil is not None:
                # keep/pin semantics are folded into the weights
                return stencil_matvec(stencil, stencil_ws, P)
            Pk = P * keep
            if lowrank:
                KP = jnp.einsum("knm,msc->knsc", Kb, Pk)
                Kp = jnp.einsum("kc,knsc->nsc", U, KP)
            else:
                Kp = reduce_(apply_AK(expand(Pk)))
            return Kp * keep + pinf * P

        # RHS: F = -Σ_e D_eᵀ (Tᵀ Ā_e) E
        E = self.E  # (r, s)
        if scalar_sep and stencil is not None:
            # gather-table build (micro/stencil.py) — algebraically equal
            # to the matrix-free reduce below, no (nE, r, s, C) intermediate
            GE = None if B_F is None else jnp.einsum("crt,ts->crs", B_F, E)
            F = stencil_rhs(stencil, a, E, TE=GE)
        elif scalar_sep:
            # AE[e, r, s, c] = a[c, e] · (Gᵀ E)[c, r, s]
            GE = E[None] if B_F is None else jnp.einsum("crt,ts->crs", B_F, E)
            AE = a_w * jnp.moveaxis(
                jnp.broadcast_to(GE, (C, r, s)), 0, -1
            )[None]
            F = -reduce_(AE) * keep
        else:
            AE = jnp.einsum("cert,ts->ersc", A_F, E)
            F = -reduce_(AE) * keep

        if fft_prec and not scalar_sep:
            # elasticity / tensor coefficients: (bs, bs) Hermitian symbol per
            # frequency from the volume-mean coefficient block (includes the
            # stratified strain map, already folded into A_K); per-frequency
            # closed-form small-matrix inverse
            from hommx_tpu.ops.elements import _inv_and_det

            syms, grid = self._get_fft_symbols()  # (nsym, bs, bs, *grid)
            bsz, d_ = self.bs, self.d
            Bbar = jnp.sum(A_K, axis=1) / self.volume_Y  # (C, r, r)
            Bbar = 0.5 * (Bbar + jnp.swapaxes(Bbar, -1, -2))
            coords = jnp.concatenate(
                [
                    jnp.stack([Bbar[:, i, i] for i in range(r)], axis=1),
                    jnp.stack(
                        [
                            Bbar[:, i, j]
                            for i in range(r)
                            for j in range(i + 1, r)
                        ],
                        axis=1,
                    ),
                ],
                axis=1,
            ).astype(syms.dtype)
            # (*grid, C, bs, bs) per-frequency symbol
            S = jnp.einsum("ck,kab...->...cab", coords, syms)
            tr = jnp.einsum("...cii->...c", S)
            alpha = jnp.max(jnp.abs(tr), axis=tuple(range(d_)))[
                (None,) * d_ + (slice(None), None, None)
            ] / bsz + jnp.asarray(1e-30, S.real.dtype)
            eye = jnp.eye(bsz, dtype=S.dtype)
            inv0, det = _inv_and_det(S)
            bad = (jnp.abs(det) < 1e-10 * jnp.abs(alpha[..., 0, 0]) ** bsz)[
                ..., None, None
            ]
            Sg = jnp.where(bad, alpha * eye, S)
            inv, _ = _inv_and_det(Sg)
            # (*grid, s, bs_i, bs_j, C): cells stay the minor dim everywhere
            invc = jnp.moveaxis(inv, d_, -1)[
                (slice(None),) * d_ + (None,)
            ]
            fft_axes = tuple(range(d_))

            def prec(R):  # (n = nodes·bs, s, C)
                Rg = R.reshape(*grid, bsz, s, C)
                Rh = jnp.fft.fftn(Rg, axes=fft_axes)
                Rv = jnp.moveaxis(Rh, -3, -2)  # (*grid, s, bs_j, C)
                Xv = jnp.sum(invc * Rv[..., None, :, :], axis=-2)
                Xh = jnp.moveaxis(Xv, -2, -3)  # (*grid, bs, s, C)
                out = jnp.fft.ifftn(Xh, axes=fft_axes).real
                return out.astype(R.dtype).reshape(n, s, C)

        elif fft_prec:
            # per-cell constant-coefficient symbol: volume-mean coefficient
            # times the cell's (possibly anisotropic) B_K = GᵀG, assembled
            # from the precomputed basis symbols (linear in B's entries)
            syms, grid = self._get_fft_symbols()
            d_ = self.d
            nsym = syms.shape[0]
            if B_K is None:
                coords = jnp.concatenate(
                    [
                        jnp.ones((C, d_), dtype=self.dtype),
                        jnp.zeros((C, nsym - d_), dtype=self.dtype),
                    ],
                    axis=1,
                )
            else:
                diag_c = jnp.stack([B_K[:, i, i] for i in range(d_)], axis=1)
                off = [
                    B_K[:, i, j]
                    for i in range(d_)
                    for j in range(i + 1, d_)
                ]
                coords = (
                    jnp.concatenate([diag_c, jnp.stack(off, axis=1)], axis=1)
                    if off
                    else diag_c
                ).astype(self.dtype)
            abar = jnp.sum(a, axis=1) / self.volume_Y  # (C,) mean coefficient
            sym_c = jnp.einsum("ck,k...->c...", coords * abar[:, None], syms)
            smax = jnp.max(
                jnp.abs(sym_c), axis=tuple(range(1, 1 + d_)), keepdims=True
            )
            # the zero-frequency symbol is exactly 0 (constant nullspace,
            # handled by pinning): replace with the max to keep the
            # preconditioner SPD on the full space
            sym_c = jnp.where(jnp.abs(sym_c) > 1e-8 * smax, sym_c, smax)
            sym_b = jnp.moveaxis(sym_c, 0, -1)[..., None, :]  # (*grid, 1, C)
            fft_axes = tuple(range(d_))

            def prec(R):  # (n, s, C): exact inverse at the mean coefficient
                Rg = R.reshape(*grid, s, C)
                Rh = jnp.fft.fftn(Rg, axes=fft_axes)
                out = jnp.fft.ifftn(Rh / sym_b, axes=fft_axes).real
                return out.astype(R.dtype).reshape(n, s, C)

        elif not chol_chunk:
            Minv = self._get_K0inv()

            def prec(R):
                return (Minv @ R.reshape(n, s * C)).reshape(n, s, C)

        if chol_chunk:
            X, iters = self._chol_chunk_solve(Kc, F), jnp.array(0)
        elif self.diag_scale:
            # Per-dof diagonal for the symmetric scaling.  Scalar problems
            # use a proxy from per-element mean coefficient magnitudes,
            # d[n,c] ≈ Σ_e t[c,e]·Σ_r D[e,r,n]² (exact for unmapped scalar
            # coefficients: the block is a[c,e]·I shared over elements).
            # Block/tensor problems compute the EXACT diag(K) — the proxy
            # ignores within-block anisotropy, which on contrast-2e5
            # elasticity cells leaves the f32 PCG unscaled where it matters
            # and diverges (regression caught when the chunk path became
            # the elasticity default); the exact diagonal is one einsum,
            # no K materialization.  The reference scale d₀ uses the unit
            # coefficient through the same formula, so the ratio is
            # self-consistent.
            if scalar_sep:
                t = (
                    a
                    if B_K is None
                    else a * (jnp.einsum("crr->c", B_K) / r)[:, None]
                )  # (C, nE)
                wsum = jnp.sum(self.wq_dev, axis=1)
                if self.D is not None:
                    dD = jnp.einsum(
                        "ern,ern->en", self.D, self.D
                    )  # (nE, n) geometry
                    dp = jnp.einsum("ce,en->nc", t, dD)
                    d0p = jnp.einsum("e,en->n", wsum, dD)
                else:
                    # D-free proxy by per-element scatter (large grids)
                    dDl = jnp.einsum(
                        "erl,erl->el", self.Draw, self.Draw
                    )  # (nE, nbl)
                    tl = jnp.einsum("ce,el->elc", t, dDl)
                    dp = (
                        jnp.zeros((n, C), dtype=self.dtype)
                        .at[self.loc2red.reshape(-1)]
                        .add(tl.reshape(-1, C))
                    )
                    d0p = (
                        jnp.zeros(n, dtype=self.dtype)
                        .at[self.loc2red.reshape(-1)]
                        .add((wsum[:, None] * dDl).reshape(-1))
                    )
            elif densek_chunk:
                dp = jnp.einsum("cnn->nc", Kc)  # exact diag, free from Kc
                d0p = self._get_K0diag()
            else:
                if self.D is not None:
                    dp = jnp.einsum(
                        "ern,cert,etn->nc", self.D, A_K, self.D
                    )
                else:
                    # D-free exact diag(K) by per-element scatter (large
                    # micro spaces, e.g. 16³ elasticity cells)
                    dl = jnp.einsum(
                        "erl,cert,etl->cel", self.Draw, A_K, self.Draw
                    )
                    dp = (
                        jnp.zeros((n, C), dtype=self.dtype)
                        .at[self.loc2red.reshape(-1)]
                        .add(
                            jnp.moveaxis(dl, 0, -1).reshape(-1, C)
                        )
                    )
                d0p = self._get_K0diag()  # exact, matching dp's exactness
            bad = self.pin_mask[:, None] | (dp <= 0) | ~jnp.isfinite(dp)
            sc = jnp.where(
                bad, 1.0, jnp.sqrt(d0p[:, None] / jnp.where(bad, 1.0, dp))
            ).astype(self.dtype)[:, None, :]  # (n, 1, C)
            if fft_prec:
                # the FFT prec approximates K⁻¹; on the scaled system the
                # matching preconditioner is the congruence S⁻¹ K⁻¹ S⁻¹
                # (K₀⁻¹ is used raw by design: scaling matches diag(SKS) to
                # diag(K₀))
                inv_sc = 1.0 / sc
                base_prec = prec
                prec_eff = lambda R: inv_sc * base_prec(inv_sc * R)
            else:
                prec_eff = prec
            raw = None
            if stencil is not None and not fft_prec and self._use_pallas_pcg():
                # fused Pallas PCG (micro/stencil_pcg.py): fold the scaling
                # into the weights and run the whole Krylov loop in VMEM
                from hommx_tpu.micro.stencil import scale_weights
                from hommx_tpu.micro.stencil_pcg import stencil_pcg_pallas

                ws_s = scale_weights(stencil, stencil_ws, sc[:, 0, :])
                raw = lambda B: stencil_pcg_pallas(
                    ws_s, B, Minv, stencil.shape, stencil.offsets,
                    self.pcg_tol, self.pcg_maxiter,
                )
            Y, iters = _solve_linear(
                lambda P: sc * matvec(sc * P), prec_eff, sc * F,
                self.pcg_tol, self.pcg_maxiter, with_iters, implicit_diff,
                raw=raw,
            )
            X = sc * Y
        else:
            raw = None
            if stencil is not None and not fft_prec and self._use_pallas_pcg():
                from hommx_tpu.micro.stencil_pcg import stencil_pcg_pallas

                raw = lambda B: stencil_pcg_pallas(
                    stencil_ws, B, Minv, stencil.shape, stencil.offsets,
                    self.pcg_tol, self.pcg_maxiter,
                )
            X, iters = _solve_linear(
                matvec, prec, F, self.pcg_tol, self.pcg_maxiter, with_iters,
                implicit_diff, raw=raw,
            )

        # corrected fields Φ = E + T·(D X) and A* = (1/|Y|) Φᵀ Ā Φ.
        # On the stencil path the Φ contraction is computed by its exact
        # bilinear expansion (micro/stencil.py::stencil_astar) — one
        # stencil matvec + three (s, s, C) dots instead of the (nE, r, s, C)
        # gradient fields; identical for any iterate X.
        if stencil is not None:
            Astar = (
                stencil_astar(stencil, stencil_ws, a, E, F, X)
                / self.volume_Y
            )
        elif densek_chunk and self._bilinear_astar():
            # Bilinear expansion on the materialized Kc:
            #   ΦᵀĀΦ = EᵀĀE − FᵀX − XᵀF + XᵀKX
            # (F = −D₂ᵀTᵀĀE and K = D₂ᵀTᵀĀTD₂; X vanishes on pinned dofs,
            # so XᵀKcX = XᵀKX despite the identity pin rows).  Replaces the
            # three (nE, r, s, C) gradient-field intermediates — which XLA
            # lays out with the tiny r/s dims on the (8,128) tile at ~19-25×
            # padding (measured 85 ms of the 204 ms rotated-fiber micro
            # stage) — with one Kc matvec and three (s, s, C)-sized dots.
            # Identical for any iterate X in exact arithmetic; in f32 the
            # terms cancel at zero-corrector-energy scale, which LOOKS
            # dangerous at high contrast but was measured harmless: on the
            # rotated-fiber beam cells (contrast 1e5, f64 ground truth)
            # both forms land within 7e-7 relative — bilinear max 6.8e-7,
            # Φ quadratic form max 6.2e-7 (A/B in docs/performance.md).
            # The 4e-5 beam-checksum move when this landed is the macro
            # solve amplifying an equally-accurate-but-different f32 A*,
            # not a precision loss.  ``HOMMX_ASTAR=phi`` opts back into the
            # cancellation-free quadratic form as a diagnostic.
            KX = jnp.einsum("cnm,msc->nsc", Kc, X)
            XtF = jnp.einsum("nsc,nmc->csm", X, F)
            XtKX = jnp.einsum("nsc,nmc->csm", X, KX)
            Abar = jnp.sum(Ae_blocks, axis=1)  # (C, r, r)
            term1 = jnp.einsum("rs,crt,tm->csm", E, Abar, E)
            Astar = (
                term1 - XtF - jnp.swapaxes(XtF, 1, 2) + XtKX
            ) / self.volume_Y
        else:
            TDX = apply_map(B_Phi, expand(X))  # (nE, r, s, C)
            Phi = E[None, :, :, None] + TDX
            if scalar_sep:
                APhi = Phi * a_w
            else:
                APhi = jnp.einsum("cert,etsc->ersc", Ae_blocks, Phi)
            Astar = jnp.einsum("ernc,ermc->cnm", Phi, APhi) / self.volume_Y
        out = (self._expand_astar(Astar),)
        if with_correctors:
            # (n, s, C) -> (C, n, s): same layout as the per-cell path
            out = out + (self._expand_cols(jnp.transpose(X, (2, 0, 1))),)
        if with_iters:
            # lockstep chunk-PCG iteration count (the whole chunk iterates
            # until its worst column converges) — the diagnostic for tuning
            # chunk size on heterogeneous problems
            out = out + (iters,)
        return out[0] if len(out) == 1 else out

    def _chol_chunk_solve(self, Kc, F):
        """Diag-equilibrated batched Cholesky + one refinement sweep on the
        chunk-assembled operators (the f32 elasticity default, round 3).

        Layouts: Kc (C, n, n) batch-major (XLA's batched Cholesky wants
        it); F and the returned X keep the chunk path's cell-minor
        (n, s, C) convention — the transposes are noise next to the n³/3
        factorization.  Equilibration K_s = S K S with S = √(d₀/d) (same
        as the PCG diag scaling) plus one f32 refinement sweep give
        4.9e-7-level tensors on contrast-1e5 rotated-fiber cells — better
        than the PCG path's 1.9e-6 (benchmarks/elasticity_profile4.py) —
        with NO iteration-count sensitivity and no zero-corrector
        fallbacks.  Natively differentiable (cho_factor/cho_solve carry
        JVP/VJP rules), so this path needs no custom_linear_solve."""
        n = self.n_reduced
        C = Kc.shape[0]
        if self.diag_scale:
            dp = jnp.einsum("cnn->nc", Kc)
            d0p = self._get_K0diag()
            bad = self.pin_mask[:, None] | (dp <= 0) | ~jnp.isfinite(dp)
            sc = jnp.where(
                bad, 1.0, jnp.sqrt(d0p[:, None] / jnp.where(bad, 1.0, dp))
            ).astype(self.dtype)  # (n, C)
        else:
            sc = jnp.ones((n, C), dtype=self.dtype)
        scm = sc.T  # (C, n)
        Ks = Kc * scm[:, :, None] * scm[:, None, :]
        if self._use_chol_kernel(n):
            # fused Pallas factor+solve (ops/chol_kernel.py): the whole
            # direct solve — factorization, both substitution phases and
            # the refinement sweep — runs in one pallas_call per cell
            # block with the cell axis on the vector lanes, one HBM read
            # of (Ks, F) and one write of X.  Refinement runs in the
            # equilibrated system (algebraically the same correction as
            # the unscaled sweep below).  The Pallas body is not
            # differentiable, so the solve is wrapped in
            # lax.custom_linear_solve: gradients are the implicit ones of
            # the exact solve (adjoint = the same fused solve, symmetric
            # system), matching the natively-differentiated XLA path.
            from hommx_tpu.ops.chol_kernel import fused_chol_solve

            Fs = F * sc[:, None, :]

            def mv(v):
                return jnp.einsum("cnm,msc->nsc", Ks, v)

            def solve(_mv, b):
                return fused_chol_solve(Ks, b)

            Xs = jax.lax.custom_linear_solve(
                mv, Fs, solve, symmetric=True
            )
            return Xs * sc[:, None, :]
        use_blocked = self.chol_backend == "blocked" or (
            self.chol_backend == "auto"
            and jax.default_backend() in ("tpu", "axon")
            and jnp.dtype(self.dtype) == jnp.float32
        )
        if use_blocked:
            # hand-blocked batched factorization (ops/batched_chol.py):
            # 4× over XLA's cho_factor/cho_solve on the rotated-fiber
            # batch — the panel solve and Schur update stay batch-major
            # MXU matmuls instead of latency-bound substitution sweeps
            from hommx_tpu.ops.batched_chol import (
                _pad_spd,
                blocked_cho_solve,
                blocked_cholesky,
            )

            nb = 32
            Ksp, _, n_orig = _pad_spd(Ks, Ks[:, :, :1], nb)
            panels, dinvs = blocked_cholesky(Ksp, nb)
            n_pad = Ksp.shape[1]

            def cho_solve_batch(Bs):  # (C, n, s)
                if n_pad != n_orig:
                    Bs = jnp.concatenate(
                        [
                            Bs,
                            jnp.zeros(
                                (C, n_pad - n_orig, Bs.shape[2]), Bs.dtype
                            ),
                        ],
                        axis=1,
                    )
                Y = blocked_cho_solve(panels, dinvs, Bs, nb)
                return Y[:, :n_orig, :]

        else:
            cfac = jax.scipy.linalg.cho_factor(Ks)
            cho_solve_batch = lambda Bs: jax.scipy.linalg.cho_solve(cfac, Bs)

        def solve_scaled(B):  # (n, s, C) unscaled rhs → (n, s, C)
            Bs = jnp.transpose(B * sc[:, None, :], (2, 0, 1))
            Y = cho_solve_batch(Bs)
            return jnp.transpose(Y, (1, 2, 0)) * sc[:, None, :]

        X = solve_scaled(F)
        if not self._chol_refine():
            return X
        R = F - jnp.einsum("cnm,msc->nsc", Kc, X)
        return X + solve_scaled(R)

    def _chol_refine(self) -> bool:
        """Whether the chunk direct solve runs its refinement sweep (one
        Kc matvec + one extra substitution solve).  Round-4 measurements
        on the contrast-1e5 stiff-fiber cells: accuracy is at the
        f32-attainable floor either way (TPU, vs f64 ground truth:
        4.0e-7 with the sweep, 3.0e-7 without; CPU LAPACK f32: 5.3e-7 vs
        5.5e-7), and at the tuned chunk size the sweep costs ~nothing
        (185.2 vs 186.8 ms on the C=8640 beam workload — the lax.map
        pipeline hides its latency).  Default ON: free robustness for
        conditioning regimes the measurement does not cover;
        ``HOMMX_CHOL_REFINE=0`` is the measured opt-out."""
        import os

        return os.environ.get("HOMMX_CHOL_REFINE", "1") != "0"

    def _use_chol_kernel(self, n: int) -> bool:
        """Route the chunk direct solve through the fused Pallas
        factor+solve kernel (ops/chol_kernel.py) — OPT-IN via
        ``HOMMX_CHOL_KERNEL=pallas`` (TPU + f32 + the (n, n, Cb) working
        set must fit VMEM).  Not the default: the Mosaic compile of the
        statically-unrolled factorization takes tens of minutes, far
        outweighing its per-call win for any fresh-compile user (the
        XLA blocked path compiles in seconds and is within ~2x of the
        kernel's runtime); kept as a tested, measured experiment."""
        import os

        if os.environ.get("HOMMX_CHOL_KERNEL", "xla") != "pallas":
            return False
        if self.dtype != jnp.float32 or self.chol_backend == "xla":
            return False
        try:
            if jax.default_backend() not in ("tpu", "axon"):
                return False
        except Exception:  # pragma: no cover
            return False
        from hommx_tpu.ops.chol_kernel import fused_chol_block, probe_compile

        if fused_chol_block(n) <= 0:
            return False
        # fall back fast on toolchains where the Mosaic compile is
        # pathological (round-3 verdict: the opt-in otherwise hangs the
        # session >25 min); the probe warns and returns False on timeout
        # so the solve proceeds on the XLA blocked route
        # (HOMMX_CHOL_KERNEL_STRICT=1 makes the timeout raise instead)
        return probe_compile(n, self.s)

    def _bilinear_astar(self) -> bool:
        """Whether the dense-K chunk route contracts A* by the bilinear
        expansion EᵀĀE − FᵀX − XᵀF + XᵀKX (default: faster, no (nE, r, s, C)
        gradient-field intermediates) instead of the Φᵀ Ā Φ quadratic form
        (``HOMMX_ASTAR=phi``, diagnostic opt-out).  The expansion's f32
        cancellation was A/B-verified harmless against f64 ground truth on
        the contrast-1e5 rotated-fiber cells: both forms within 7e-7
        relative (docs/performance.md, "A* contraction accuracy")."""
        import os

        return os.environ.get("HOMMX_ASTAR", "bilinear") == "bilinear"

    def _use_pallas_pcg(self) -> bool:
        """Route the stencil chunk-PCG through the fused Pallas kernel
        (micro/stencil_pcg.py): TPU backend + f32 only (the CPU/f64 parity
        paths keep the XLA loop); ``HOMMX_STENCIL_PCG=xla`` reverts."""
        import os

        if os.environ.get("HOMMX_STENCIL_PCG", "auto") == "xla":
            return False
        if self.dtype != jnp.float32:
            return False
        try:
            return jax.default_backend() in ("tpu", "axon")
        except Exception:  # pragma: no cover
            return False

    def _get_stencil(self):
        """Cached periodic grid stencil (micro/stencil.py), or None.

        Available for scalar P1 problems on structured box micro meshes
        whose reduced dofs are the raster torus grid (all
        ``create_unit_square/cube`` / ``create_box`` meshes).
        ``HOMMX_MICRO_MATVEC=matfree`` disables it (A/B runs)."""
        if getattr(self, "_stencil", False) is False:
            import os

            if os.environ.get("HOMMX_MICRO_MATVEC", "auto") == "matfree":
                self._stencil = None
            else:
                from hommx_tpu.config import host_setup
                from hommx_tpu.micro.stencil import build_stencil

                with host_setup():
                    self._stencil = build_stencil(self)
        return self._stencil

    def _get_kron_M(self) -> jnp.ndarray:
        """Static per-element Gram map M[e, (r,t), (l,m)] = Draw[e,r,l]·
        Draw[e,t,m] for the Kron fast-path Kc assembly.  Size nE·r²·nbl²
        (~18 MB f32 for the 4³ elasticity cell).

        The cache holds NUMPY (trace-local constant rule, see
        build_gather_assembly): caching the traced jnp array would leak a
        tracer out of the first jit that touches it."""
        if getattr(self, "_kron_M", None) is None:
            Draw_np = np.asarray(self.Draw, dtype=np.float64)
            nE, r, nbl = Draw_np.shape
            M_np = np.einsum("erl,etm->ertlm", Draw_np, Draw_np).reshape(
                nE, r * r, nbl * nbl
            )
            self._kron_M = np.asarray(M_np, dtype=self.dtype)
        return jnp.asarray(self._kron_M)

    def _get_kc_gather(self):
        """Host-precomputed gather tables for the chunk dense-K assembly,
        or None (CPU backends keep the scatter).

        The per-cell reduced operator Kc is assembled from the element
        blocks (C, nE, nbl, nbl); the hypothesis was that the scatter-add
        ``at[:, flat].add`` would serialize on TPU under duplicate target
        indices (the pathology the macro assembly hit —
        ops/assembly.py::build_gather_assembly).  Inverting the map on the
        host turns the assembly into a fixed-width gather + reduction over
        the ~m contributors of each of the nnz coupled dof pairs (m ≈
        #elements sharing the pair, ≤24 for 3D P1 vertex diagonals),
        followed by one placement gather into the dense (n, n) layout, with
        the keep/pin masking folded into static per-target vectors.
        MEASURED: unlike the macro case (scatter over a shared target),
        this scatter's duplicate indices live on the MINOR axis with the
        big cell batch C major, and XLA already vectorizes it over C — the
        gather variant is 5% SLOWER on the rotated-fiber production config
        (214.8 vs 204.2 ms micro stage, identical checksums; a
        source-major (src, C) layout is worse still, forcing the (C, nE,
        r, r) coefficient batch onto (8,128) tiles at 25× padding → OOM).
        So the default is scatter on every backend; ``HOMMX_KC_ASSEMBLY=
        gather`` opts in (kept equivalence-tested).  Tables are NUMPY
        (trace-local constant rule, see build_gather_assembly)."""
        if getattr(self, "_kc_gather", False) is False:
            import os

            mode = os.environ.get("HOMMX_KC_ASSEMBLY", "scatter")
            want = mode == "gather"
            if not want:
                self._kc_gather = None
                return None
            n = self.n_reduced
            l2r = np.asarray(self.loc2red, dtype=np.int64)  # (nE, nbl)
            flat = (l2r[:, :, None] * n + l2r[:, None, :]).reshape(-1)
            nz, inv = np.unique(flat, return_inverse=True)
            counts = np.bincount(inv)
            m = int(counts.max()) if counts.size else 0
            if m == 0 or m > 64:  # pathological mesh: keep the scatter
                self._kc_gather = None
                return None
            order = np.argsort(inv, kind="stable")
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            pos = np.arange(flat.size) - starts[inv[order]]
            tab = np.full((nz.size, m), flat.size, dtype=np.int64)
            tab[inv[order], pos] = order
            inv_map = np.full(n * n, nz.size, dtype=np.int64)
            inv_map[nz] = np.arange(nz.size)
            pin = np.asarray(self.pin_mask)
            keepn = np.logical_not(pin)
            ti, tj = nz // n, nz % n
            keep_vec = (keepn[ti] & keepn[tj]).astype(np.float64)
            pin_vec = ((ti == tj) & pin[ti]).astype(np.float64)
            self._kc_gather = (
                tab.astype(np.int32),
                inv_map.astype(np.int32),
                keep_vec,
                pin_vec,
            )
        return self._kc_gather

    def _get_fft_symbols(self):
        """DFT symbols of the reduced periodic operator for a basis of
        constant coefficients (see __init__ on cell_prec; feasibility in
        benchmarks/fft_preconditioner_feasibility.py).

        Returns (syms, grid): syms (nsym, *grid) real — symbols are real
        because the circulant stencil is symmetric — where nsym = d +
        d(d-1)/2 spans the symmetric constant coefficient matrices, and the
        symbol of any constant B is the matching linear combination.
        """
        if self._fft_syms is None:
            st = self.mesh.structure
            if st is None or self.micro_degree != 1:
                raise ValueError(
                    "cell_prec='fft' requires a structured box micro mesh "
                    "and P1 micro elements"
                )
            shape = tuple(int(x) for x in np.asarray(st.shape))
            bs = self.bs
            if int(np.prod(shape)) * bs != self.n_reduced:
                raise ValueError("reduced dof space is not the torus grid")
            r = self.r
            # symmetric basis of the canonical (r, r) coefficient blocks
            basis = []
            for i in range(r):
                E = np.zeros((r, r))
                E[i, i] = 1.0
                basis.append(E)
            for i in range(r):
                for j in range(i + 1, r):
                    E = np.zeros((r, r))
                    E[i, j] = E[j, i] = 1.0
                    basis.append(E)
            wsum = np.sum(np.asarray(self.wq, dtype=np.float64), axis=1)
            D64 = np.asarray(self.Draw, dtype=np.float64)  # (nE, r, nbl)
            loc2red = np.asarray(self.loc2red)
            syms = []  # per basis element: (bs, bs, *grid) complex symbol
            for B in basis:
                Ae = wsum[:, None, None] * B[None]
                cols = []
                for j in range(bs):  # unit impulse at node 0, component j
                    e0 = np.zeros(self.n_reduced)
                    e0[j] = 1.0
                    p_loc = e0[loc2red]  # (nE, nbl)
                    Dp = np.einsum("erl,el->er", D64, p_loc)
                    w = np.einsum("ert,et->er", Ae, Dp)
                    wl = np.einsum("erl,er->el", D64, w)
                    col = np.zeros(self.n_reduced)
                    np.add.at(col, loc2red.reshape(-1), wl.reshape(-1))
                    # (grid..., bs): response at every node/component
                    cols.append(col.reshape(shape + (bs,)))
                blk = np.stack(cols, axis=-1)  # (grid..., bs_out, bs_in)
                S = np.fft.fftn(blk, axes=tuple(range(len(shape))))
                if bs == 1:
                    # scalar circulant symbols are real; keep (*grid) shape
                    syms.append(S.real[..., 0, 0])
                else:
                    # (bs_out, bs_in, *grid); Hermitian per frequency
                    syms.append(np.moveaxis(S, (-2, -1), (0, 1)))
            cdtype = (
                self.dtype
                if bs == 1
                else (
                    jnp.complex64
                    if jnp.dtype(self.dtype) == jnp.float32
                    else jnp.complex128
                )
            )
            self._fft_syms = (
                jnp.asarray(np.stack(syms), dtype=cdtype),
                shape,
            )
        return self._fft_syms

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
            or self.cell_prec == "fft"
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


def _amp_cap(dtype) -> float:
    """Amplification-clamp threshold of the energy clamp (≈1/√eps of the
    working dtype).  In f32, an iterate beyond ~1e4× the preconditioned-RHS
    scale makes the quadratic form E(X) pure cancellation noise, so such
    columns are rejected; in f64 the same noise floor sits at ~1e8, and a
    legitimately high-amplification cell (coefficient contrast ~1e5 with
    ``diag_scale`` off) that converges correctly must NOT be zeroed."""
    return 1e4 if jnp.dtype(dtype) == jnp.float32 else 1e8


def _block_pcg_matfree(matvec, F, Minv, tol, maxiter):
    """Block-CG with s simultaneous RHS on one SPD system given as a matvec,
    preconditioned by the explicit shared inverse Minv = K₀⁻¹ (columns
    iterate in lockstep; converged columns are frozen by the 0/0 guards).

    Spectral equivalence of K₀ (unit coefficient) and K_c makes the iteration
    count depend on the coefficient *contrast* of A(c_T, ·), not on the micro
    mesh resolution.  Under vmap over macro cells every operation is a
    shared-operand matmul — pure MXU work.
    """
    eps = jnp.asarray(1e-30, dtype=F.dtype)
    X = Minv @ F
    R = F - matvec(X)
    Z = Minv @ R
    P = Z
    rz = jnp.sum(R * Z, axis=0)  # (s,)
    fnorm = jnp.linalg.norm(F, axis=0) + eps
    rel0 = jnp.linalg.norm(R, axis=0) / fnorm
    # the stall counter's update depends on the residuals, so under
    # shard_map it is varying over the mesh axis; tie the *initial* counter
    # to the data too (always 0) or the while_loop carry types mismatch
    stall0 = jnp.asarray(0) + jnp.where(jnp.isfinite(rel0), 0.0, 0.0).sum().astype(
        jnp.asarray(0).dtype
    )
    best = (X, rel0)  # best-residual iterate per column: finite-precision CG
    # on ill-conditioned systems can drift upward after stagnating; returning
    # the best iterate bounds the error at the f32-attainable level instead
    # of diverging

    def cond(state):
        X, R, P, rz, k, bX, brel, stall = state
        rel = jnp.max(jnp.linalg.norm(R, axis=0) / fnorm)
        # exit on convergence, iteration cap, or stagnation (no column
        # improved its best residual for 60 iterations — the f32-attainable
        # accuracy for this conditioning has been reached)
        return (rel > tol) & (k < maxiter) & (stall < 60)

    def body(state):
        X, R, P, rz, k, bX, brel, stall = state
        KP = matvec(P)
        pkp = jnp.sum(P * KP, axis=0)
        # guard CG breakdown (pkp <= 0 or non-finite can occur in f32 on
        # extreme-contrast coefficients): freeze the column instead of
        # stepping with a garbage alpha.  Columns that have CONVERGED
        # (best residual below tol) are frozen too: in lockstep they would
        # otherwise keep stepping, and on near-singular high-contrast cells
        # f32 CG then drifts along near-null modes — the iterate grows
        # unboundedly while its residual stays small, and the energy clamp
        # becomes cancellation noise (measured: two beam cells at 3e26
        # inside a 521-cell chunk, perfectly convergent in isolation).
        ok = (
            (pkp > 0) & jnp.isfinite(pkp) & jnp.isfinite(rz) & (brel >= tol)
        )
        alpha = jnp.where(ok, rz / jnp.where(ok, pkp, 1.0), 0.0)
        X = X + P * alpha[None, :]
        R = R - KP * alpha[None, :]
        Z = Minv @ R
        rz_new = jnp.sum(R * Z, axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        P = Z + P * beta[None, :]
        rel = jnp.linalg.norm(R, axis=0) / fnorm
        # any measurable improvement resets the stall counter: a percent-level
        # threshold would abandon slowly-converging ill-conditioned columns
        improved = (rel < brel * (1.0 - 1e-4)) & jnp.isfinite(rel)
        bX = jnp.where(improved[None, :], X, bX)
        brel = jnp.where(improved, jnp.minimum(rel, brel), brel)
        stall = jnp.where(jnp.any(improved), 0, stall + 1)
        return X, R, P, rz_new, k + 1, bX, brel, stall

    state = (X, R, P, rz, jnp.array(0), best[0], best[1], stall0)
    out = jax.lax.while_loop(cond, body, state)
    bX = out[5]
    # energy clamp: the CG energy E(X) = ½⟨X,KX⟩ − ⟨F,X⟩ of the returned
    # iterate must beat E(0) = 0 (the zero corrector); columns that fail
    # (f32 divergence on ill-conditioned cells) fall back to X = 0, whose
    # homogenized tensor is the physical zero-corrector upper bound.
    # The clamp additionally rejects non-finite iterates and iterates
    # amplified beyond ~1e4× the preconditioned-RHS scale: at that size the
    # f32 quadratic form is cancellation noise (a drifting near-null-mode
    # iterate can fake E < 0), and a cell genuinely needing more
    # amplification is beyond f32 fidelity anyway — the zero-corrector
    # fallback + report is its documented handling.
    E = 0.5 * jnp.sum(bX * matvec(bX), axis=0) - jnp.sum(F * bX, axis=0)
    x0n = jnp.linalg.norm(Minv @ F, axis=0)
    good = (
        (E < 0)
        & jnp.all(jnp.isfinite(bX), axis=0)
        & (jnp.linalg.norm(bX, axis=0) <= _amp_cap(F.dtype) * (x0n + eps))
    )
    return jnp.where(good[None, :], bX, 0.0)


def _solve_linear(matvec, prec, F, tol, maxiter, with_iters, implicit_diff,
                  raw=None):
    """Chunk PCG with implicit differentiation.

    ``lax.custom_linear_solve`` attaches the implicit-function-theorem
    gradient (the adjoint is the same symmetric solve), which the PCG
    while_loop cannot provide by unrolling — this is what makes the f32
    chunk path differentiable like the Cholesky path.  The iteration-count
    diagnostic bypasses the custom rule (it is not differentiable and not
    needed under grad), and so does the shard_map micro stage
    (custom_linear_solve does not compose with manual axes;
    ``implicit_diff=False``).

    Clamped columns (zero-corrector fallback) are handled CONSISTENTLY with
    the primal: the raw solve carries the implicit VJP, and the energy clamp
    is applied *outside* it as ``where(good, X, 0)`` on the non-differentiable
    boolean mask — so a clamped column returns primal 0 AND gradient 0 (the
    primal is locally the constant 0), instead of the unclamped system's
    gradient against a zeroed primal (round-2 advisor finding).

    ``raw`` optionally replaces the XLA Krylov loop with an equivalent
    solver ``raw(B) -> (bX_unclamped, iters)`` for the SAME operator (the
    fused Pallas stencil kernel, micro/stencil_pcg.py); the energy clamp
    and the implicit VJP wrapper are applied identically around it."""
    raw_solve = raw if raw is not None else (
        lambda B: _chunk_pcg_raw(matvec, prec, B, tol, maxiter)
    )
    if with_iters or not implicit_diff:
        bX, iters = raw_solve(F)
        good = _clamp_good(matvec, prec, F, bX)
        return jnp.where(good[None], bX, 0.0), iters
    X = jax.lax.custom_linear_solve(
        matvec,
        F,
        solve=lambda mv, B: raw_solve(B)[0],
        symmetric=True,
    )
    good = _clamp_good(matvec, prec, F, jax.lax.stop_gradient(X))
    return jnp.where(good[None], X, 0.0), None


def _clamp_good(matvec, prec, F, bX):
    """Energy-clamp acceptance mask (s, C) for a raw block-PCG iterate: the
    CG energy E(X) = ½⟨X,KX⟩ − ⟨F,X⟩ must beat E(0) = 0 (the zero corrector),
    the iterate must be finite, and its amplification over the
    preconditioned-RHS scale must stay below the working-dtype noise floor
    (see _amp_cap).  Inputs are treated as constants (boolean output —
    no gradient flows through the mask)."""
    eps = jnp.asarray(1e-30, dtype=F.dtype)
    E = 0.5 * jnp.sum(bX * matvec(bX), axis=0) - jnp.sum(F * bX, axis=0)
    x0n = jnp.sqrt(jnp.sum(prec(F) * prec(F), axis=0))
    return (
        (E < 0)
        & jnp.all(jnp.isfinite(bX), axis=0)
        & (jnp.sqrt(jnp.sum(bX * bX, axis=0)) <= _amp_cap(F.dtype) * (x0n + eps))
    )


def _chunk_pcg(matvec, prec, F, tol, maxiter):
    """Clamped chunk block-CG: _chunk_pcg_raw + the zero-corrector energy
    clamp (see _clamp_good).  Returns (X, iterations)."""
    bX, iters = _chunk_pcg_raw(matvec, prec, F, tol, maxiter)
    good = _clamp_good(matvec, prec, F, bX)
    return jnp.where(good[None], bX, 0.0), iters


def _chunk_pcg_raw(matvec, prec, F, tol, maxiter):
    """Block-CG over a whole chunk: work arrays (n, s, C), per-(rhs, cell)
    step sizes in lockstep; converged columns are frozen by the 0/0 guards.
    The iteration stops when the worst column's relative residual is below
    tol (or at maxiter).  Returns the UNCLAMPED best iterate (X, iterations);
    callers apply the energy clamp (_clamp_good)."""
    eps = jnp.asarray(1e-30, dtype=F.dtype)
    X = prec(F)
    R = F - matvec(X)
    Z = prec(R)
    P = Z
    rz = jnp.sum(R * Z, axis=0)  # (C, s)
    fnorm = jnp.sqrt(jnp.sum(F * F, axis=0)) + eps
    rel0 = jnp.sqrt(jnp.sum(R * R, axis=0)) / fnorm
    # data-tied initial stall counter (see _block_pcg_matfree)
    stall0 = jnp.asarray(0) + jnp.where(jnp.isfinite(rel0), 0.0, 0.0).sum().astype(
        jnp.asarray(0).dtype
    )
    # best-residual iterate per column (see _block_pcg_matfree)

    def cond(state):
        X, R, P, rz, k, bX, brel, stall = state
        rel = jnp.max(jnp.sqrt(jnp.sum(R * R, axis=0)) / fnorm)
        return (rel > tol) & (k < maxiter) & (stall < 60)

    def body(state):
        X, R, P, rz, k, bX, brel, stall = state
        KP = matvec(P)
        pkp = jnp.sum(P * KP, axis=0)
        # guard CG breakdown (pkp <= 0 or non-finite can occur in f32 on
        # extreme-contrast coefficients): freeze the column instead of
        # stepping with a garbage alpha.  CONVERGED columns (best residual
        # below tol) are frozen too — see _block_pcg_matfree's body for the
        # lockstep near-null-mode drift this prevents.
        ok = (
            (pkp > 0) & jnp.isfinite(pkp) & jnp.isfinite(rz) & (brel >= tol)
        )
        alpha = jnp.where(ok, rz / jnp.where(ok, pkp, 1.0), 0.0)
        X = X + P * alpha[None]
        R = R - KP * alpha[None]
        Z = prec(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        P = Z + P * beta[None]
        rel = jnp.sqrt(jnp.sum(R * R, axis=0)) / fnorm
        # any measurable improvement resets the stall counter: a percent-level
        # threshold would abandon slowly-converging ill-conditioned columns
        improved = (rel < brel * (1.0 - 1e-4)) & jnp.isfinite(rel)
        bX = jnp.where(improved[None], X, bX)
        brel = jnp.where(improved, jnp.minimum(rel, brel), brel)
        stall = jnp.where(jnp.any(improved), 0, stall + 1)
        return X, R, P, rz_new, k + 1, bX, brel, stall

    state = (X, R, P, rz, jnp.array(0), X, rel0, stall0)
    out = jax.lax.while_loop(cond, body, state)
    return out[5], out[4]


def _map_chunked(fn, xs, chunk: int, chunk_fn: bool = False):
    """Apply fn over xs in chunks via lax.map (bounds peak memory).

    chunk_fn=False: fn maps one element (vmapped per chunk).
    chunk_fn=True:  fn maps a whole chunk at once (chunk-level kernels).
    """
    n = xs.shape[0]
    chunk = max(1, min(chunk, n))
    n_pad = (-n) % chunk
    xs_p = jnp.concatenate([xs, jnp.repeat(xs[:1], n_pad, axis=0)], axis=0)
    xs_c = xs_p.reshape((n + n_pad) // chunk, chunk, *xs.shape[1:])
    out = jax.lax.map(fn if chunk_fn else jax.vmap(fn), xs_c)
    return jax.tree_util.tree_map(
        lambda o: o.reshape(-1, *o.shape[2:])[:n], out
    )
