"""HMM solver classes — the public API of hommx_tpu.

Mirrors the class surface of the reference (``src/hommx/hmm.py``):
``PoissonHMM``, ``PoissonStratifiedHMM``, ``LinearElasticityHMM``,
``LinearElasticityStratifiedHMM`` with ``solve()``,
``set_boundary_conditions()``, ``set_right_hand_side()`` and the
``function_space`` property.

Control flow is inverted relative to the reference (SURVEY.md §7): instead of
a Python loop that re-assembles and KSP-solves one cell problem per macro
basis function (reference ``hmm.py:310-432``), ``solve()`` runs

    micro stage:  A*(c_T) for every macro cell — one batched jitted pipeline
                  (see micro/engine.py for the math and the reference mapping)
    macro stage:  S_loc[c] = |T_c| · P_c A*(c_T)ᵀ P_cᵀ, ELL scatter assembly,
                  symmetric Dirichlet lifting, CG / dense-Cholesky solve.

The ``eps`` argument is kept for API parity; it cancels exactly in the
reference's scaling chain (1/eps² stiffness scaling × eps² from interpolating
the macro basis onto the eps-scaled micro cell, reference ``hmm.py:366-369``
with ``hmm.py:388-393``), so it does not enter the computation here.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.config import default_dtype
from hommx_tpu.micro.engine import MicroEngine
from hommx_tpu.models.common import (
    MacroSystem,
    assemble_macro_system,
    macro_precs,
    merge_bcs,
    probe_coeff_kind,
)
from hommx_tpu.models.fem import _as_source
from hommx_tpu.ops.assembly import assemble_load_vector
from hommx_tpu.ops.function_space import (
    DirichletBC,
    Function,
    FunctionSpace,
    dirichletbc,
    locate_dofs_geometrical,
)
from hommx_tpu.ops.solvers import solve_ell
from hommx_tpu.ops.sparse import ell_to_dense
from hommx_tpu.utils.options import SolverOptions, cell_problem_engine_kwargs

__all__ = [
    "BaseHMM",
    "PoissonHMM",
    "PoissonStratifiedHMM",
    "LinearElasticityHMM",
    "LinearElasticityStratifiedHMM",
]

logger = logging.getLogger("hommx_tpu")


class BaseHMM:
    """Common HMM machinery (mirrors reference ``BaseHMM``, hmm.py:53-511).

    Subclasses set ``_bs`` (1 for scalar, dim for elasticity) and may supply a
    gradient map ``_G_fn`` (stratified variants).
    """

    _bs: int = 1

    def __init__(
        self,
        msh,
        A: Callable,
        f,
        msh_micro,
        eps: float,
        options_global_solve: Union[SolverOptions, dict, None] = None,
        options_cell_problem: Union[SolverOptions, dict, None] = None,
        *,
        quad_degree_micro: int = 2,
        quad_degree_rhs: int = 2,
        dtype=None,
        chunk: int = 0,
        engine_kwargs: Optional[dict] = None,
        shard_mesh=None,
        dedup_cells: bool = True,
        dedup_verify: int = 0,
        # reference-compat aliases
        petsc_options_global_solve: Optional[dict] = None,
        petsc_options_cell_problem: Optional[dict] = None,
        petsc_options_prefix: str = "",
    ):
        """Args mirror the reference ctor (``hmm.py:63-171``).

        Args:
            msh: macro SimplexMesh.
            A: coefficient, JAX callable ``A(x, y)`` with x the macro cell
                center c_T and y the micro coordinate; 1-periodic in y.
                Returns scalar/(d,d) (Poisson) or (d,d,d,d) (elasticity).
            f: right-hand side — JAX callable ``f(x)`` or a constant.
            msh_micro: the unit-cell micro mesh (replicated data; the
                reference's COMM_SELF requirement is moot without MPI).
            eps: microscopic scale parameter (API parity; cancels, see module
                docstring).
            options_global_solve / options_cell_problem: SolverOptions or
                PETSc-style dicts.
            engine_kwargs: extra MicroEngine options (e.g. ``solver``,
                ``pcg_tol``, ``diag_scale``) for expert tuning.
            shard_mesh: optional 1D ``jax.sharding.Mesh`` — ``solve()`` then
                runs the micro stage sharded over the macro-cell batch and
                routes CG macro solves through the row-sharded psum-CG
                (parallel/macro.py), multigrid-preconditioned when
                available.  The TPU-native analogue of the reference's
                "launch the same code under mpirun" transparency
                (``hmm.py:544-551``): same class, same call, N devices.
            dedup_cells: memoize identical cell problems (round 3).  Two
                macro cells whose solve inputs — the reduced coefficient
                blocks A(c_T, y_q) and the stratified map Dθᵀ(c_T) — are
                bitwise equal have the same homogenized tensor; ``solve()``
                fingerprints the inputs on device, solves one representative
                per class, and scatters the tensors back.  Structured
                configurations collapse dramatically (the rotated-fiber
                beam is 18 distinct cell problems among 4320 cells — the
                reference re-solves all 51,840 basis systems,
                ``hmm.py:420-426``), while genuinely x-varying coefficients
                dedup to nothing and skip the path.  Exact for the direct
                micro solver; for the lockstep chunk PCG results can move
                within solver tolerance (chunk composition changes).
                ``diagnostics["unique_cells"]`` records the class count.
            dedup_verify: opt-in dedup audit — re-solve up to this many
                random NON-representative class members and assert their
                tensors match their class representative.  The dedup key
                is 16 f32 random projections of the solve inputs: bitwise-
                equal inputs always land in one class, and a collision
                between genuinely distinct cells (probability ~2⁻³⁸⁴ per
                pair for non-adversarial data, but never zero) would
                silently reuse the wrong tensor; the audit catches it at
                the cost of k extra cell solves.  Raises RuntimeError on
                disagreement beyond solver tolerance.
        """
        if msh.dim not in (2, 3):
            raise ValueError("Topology should be 3D or 2D")
        if msh.dim != msh_micro.dim:
            raise ValueError("Micro and macro mesh should have the same dimensionality.")
        self._msh = msh
        self._cell_mesh = msh_micro
        self._coeff = A
        self._eps = float(eps)
        self._dtype = dtype or default_dtype()
        self._tdim = msh.dim
        options_global_solve = options_global_solve or petsc_options_global_solve
        options_cell_problem = options_cell_problem or petsc_options_cell_problem
        self._options_global = SolverOptions.from_any(options_global_solve)
        self._options_cell = SolverOptions.from_any(options_cell_problem)
        self._chunk = chunk
        self._quad_degree_rhs = quad_degree_rhs
        self._shard_mesh = shard_mesh
        self._dedup_cells = bool(dedup_cells)
        self._dedup_verify = int(dedup_verify)
        self._n_unique: Optional[int] = None
        self._fp_jit = None
        self._dedup_cache = False  # False = not yet computed (None is valid)

        bs = self._block_size()
        self._V_macro = FunctionSpace(msh, bs)
        self._sys = MacroSystem(self._V_macro, self._dtype)
        kind = self._coeff_kind()
        # cell-problem solver options reach the micro engine (reference
        # parity: petsc_options_cell_problem is wired into every corrector
        # solve, hmm.py:153-155,424); explicit engine_kwargs win
        cell_kw = cell_problem_engine_kwargs(options_cell_problem)
        cell_kw.update(engine_kwargs or {})
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
        self._A_star: Optional[jnp.ndarray] = None
        self._last_vals_bc = None
        self._needs_reassembly = True
        self._u: Optional[Function] = None
        # Macro-stage precision: macro elasticity systems reach κ~1e7 (sharp
        # coefficient contrast), where merely *storing* the assembled matrix
        # in f32 costs percent-level solution error (measured 4e-3 on the
        # rotated-fiber beam vs 1e-5 with an f64 macro stage).  Whenever the
        # global solve takes the dense direct path (which already factorizes
        # in f64), the assembly runs in f64 too — the macro stage is tiny by
        # HMM design, so this is free.  The CG path (large, well-conditioned
        # Poisson systems) stays in the pipeline dtype.
        m = self._options_global.method
        if m == "auto":
            m = (
                "direct"
                if self._V_macro.num_dofs <= self._options_global.direct_threshold
                else "cg"
            )
        self._macro_method = m
        # f64 also covers ITERATIVE elasticity (above direct_threshold):
        # a vector macro system's κ~1e7 makes f32 matrix storage alone a
        # percent-level error, so the CG path assembles in f64 (double-f32
        # on TPU) and runs an f64 PCG whose V-cycle preconditioner is
        # applied in f32 (ops/solvers.py) — preconditioner precision
        # affects only the iteration count, never the attainable accuracy.
        self._macro_f64 = m == "direct" or self._V_macro.bs > 1
        self._macro_jit = None
        self._tensor_jit = None
        self._a0_jit = None
        self._nan_jit = None
        self._b_load = None
        #: per-solve telemetry: phase timings, solver iterations/residual,
        #: NaN guard results (SURVEY.md §5: the reference's failure detection
        #: is a NaN check per local matrix, hmm.py:320-323, and KSP
        #: convergence logging, hmm.py:427-430,485-488)
        self.diagnostics: dict = {}

    # -- subclass hooks ------------------------------------------------------
    def _block_size(self) -> int:
        return self._bs if self._bs != 0 else 1

    def _coeff_kind(self) -> str:
        return probe_coeff_kind(self._coeff, self._tdim, nargs=2)

    def _G_fn(self) -> Optional[Callable]:
        """Gradient map Dθᵀ(x) for stratified variants; None otherwise."""
        return None

    # -- reference API -------------------------------------------------------
    @property
    def function_space(self) -> FunctionSpace:
        return self._V_macro

    def set_boundary_conditions(self, bcs):
        """Set Dirichlet BCs (single or list; reference ``hmm.py:276-287``)."""
        self._bcs = bcs if isinstance(bcs, list) else [bcs]
        self._needs_reassembly = True

    def set_right_hand_side(self, f):
        """Replace the rhs f (reference ``hmm.py:289-296``; unlike the
        reference quirk noted in SURVEY §2.5, ``f`` receives a real point x).
        """
        self._f_fn = _as_source(f, self._V_macro.bs)
        # the load vector is cached across solves (f and the mesh are
        # static); only the cache is invalidated — the jitted assembly
        # program takes b as an argument, so no recompile on rhs sweeps
        self._b_load = None

    def homogenized_tensors(self) -> jnp.ndarray:
        """A*(c_T) per macro cell, (nc, s, s) — the micro stage output.

        With ``shard_mesh`` the cell batch is sharded over the device mesh
        (GSPMD partitions the batched cell solves; the batch axis is
        embarrassingly parallel, so no communication is introduced) — the
        analogue of the reference's each-rank-owns-its-cells loop
        (``hmm.py:307,544-551``)."""
        if self._A_star is None:
            if self._tensor_jit is None:

                def micro(centers):
                    centers = self._shard_cells(centers)
                    return self._engine.tensors_for_centers(
                        self._coeff, centers, G_fn=self._G_fn(), chunk=self._chunk
                    )

                self._tensor_jit = jax.jit(micro)
            centers = self._sys.centers
            classes = self._dedup_classes(centers) if self._dedup_cells else None
            if classes is not None:
                rep, inverse = classes
                A_u = jax.block_until_ready(
                    self._tensor_jit(centers[jnp.asarray(rep)])
                )
                if self._dedup_verify > 0:
                    self._audit_dedup(centers, rep, inverse, A_u)
                self._A_star = A_u[jnp.asarray(inverse)]
            else:
                self._A_star = jax.block_until_ready(self._tensor_jit(centers))
        return self._A_star

    def _audit_dedup(self, centers, rep, inverse, A_u):
        """Dedup audit (``dedup_verify=k``): re-solve up to k random
        non-representative class members and compare against their class
        representative's tensor.  A fingerprint collision between distinct
        cells would produce a order-of-magnitude disagreement, far above
        the solver-tolerance threshold used here (members are bitwise-
        identical inputs, so a legitimate re-solve agrees to solver
        accuracy — exactly for the direct micro solver, within PCG
        tolerance for the chunk paths, whose lockstep composition
        changes with the audit batch)."""
        rng = np.random.default_rng(0xA0D17)
        members = np.setdiff1d(
            np.arange(centers.shape[0]), np.asarray(rep)
        )
        if members.size == 0:
            return
        k = min(self._dedup_verify, int(members.size))
        sample = rng.choice(members, size=k, replace=False)
        A_resolved = jax.block_until_ready(
            self._tensor_jit(centers[jnp.asarray(sample)])
        )
        A_claimed = A_u[jnp.asarray(np.asarray(inverse)[sample])]
        # Collision threshold: re-solved members agree to SOLVER accuracy,
        # so the audit must tolerate the engine's effective tolerance — a
        # user-loosened iterative solve (cell_problem_engine_kwargs, e.g.
        # ksp_atol=1e-1) legitimately moves re-solves by ~pcg_tol, and a
        # fixed dtype threshold would raise a spurious collision error
        # (round-4 advisor finding).  Fingerprint collisions between
        # DISTINCT cells disagree at O(1), far above any sane tolerance.
        tol = 1e-4 if jnp.dtype(self._dtype) == jnp.float32 else 1e-8
        if self._engine.solver == "pcg":
            tol = max(tol, 10.0 * self._engine.pcg_tol)
        scale = jnp.max(jnp.abs(A_u))
        diff = jnp.max(jnp.abs(A_resolved - A_claimed)) / (scale + 1e-300)
        if not bool(diff < tol):
            raise RuntimeError(
                f"dedup audit failed: re-solved class members disagree with "
                f"their representatives (rel {float(diff):.2e} > {tol:.0e}) "
                f"— fingerprint collision between distinct cell problems; "
                f"re-run with dedup_cells=False"
            )
        logger.info(
            "dedup audit: %d re-solved members agree (rel %.2e)",
            k, float(diff),
        )

    def _dedup_classes(self, centers):
        """Exact-duplicate classes of the cell batch: (rep_indices,
        inverse) with ``A_star = A_star_unique[inverse]``, or None when
        deduplication does not pay (< 2× reduction).

        The class key fingerprints EVERYTHING cell-specific that enters the
        micro solve — the quadrature-reduced coefficient blocks
        ``A(c_T, y_q)`` and the stratified map ``Dθᵀ(c_T)`` — via 16 fixed
        random projections per cell, evaluated on device (a full readback
        of the raw coefficient data would crawl through the ~10 MB/s
        device→host tunnel; the fingerprints are a few hundred KB).
        Bitwise-equal inputs give bitwise-equal fingerprints (same traced
        program, data-parallel); distinct inputs colliding in all 16 f32
        projections is negligible for non-adversarial data.

        The jitted fingerprint program is cached on the instance: rebuilding
        it per solve re-traces the full coefficient evaluation (~0.4 s on
        the rotated-fiber beam — larger than the deduplicated solve itself).
        The RESULT is cached too: the coefficient and the cell centers are
        both fixed at construction, and the per-solve fingerprint dispatch
        + (nc, 16) readback costs ~50 ms through the tunnel.
        """
        if self._dedup_cache is not False:
            return self._dedup_cache
        nc = int(centers.shape[0])
        if nc < 16:
            self._dedup_cache = None
            return None
        if self._fp_jit is None:
            eng = self._engine
            coeff = self._coeff
            G_fn = self._G_fn()
            k = 16
            rng = np.random.default_rng(0x5EED)

            def fp(x):
                raw = eng._raw_coeff(coeff, x).reshape(-1)
                W = jnp.asarray(
                    rng.standard_normal((raw.shape[0], k)), dtype=raw.dtype
                )
                out = raw @ W
                if G_fn is not None:
                    g = jnp.asarray(G_fn(x), dtype=out.dtype).reshape(-1)
                    Wg = jnp.asarray(
                        rng.standard_normal((g.shape[0], k)), dtype=out.dtype
                    )
                    out = out + g @ Wg
                return out

            self._fp_jit = jax.jit(jax.vmap(fp))
        keys = np.asarray(self._fp_jit(centers))
        uniq, rep, inverse = np.unique(
            keys, axis=0, return_index=True, return_inverse=True
        )
        n_unique = int(uniq.shape[0])
        if n_unique * 2 > nc:
            # not enough duplication to pay for the indirection; every cell
            # is actually solved, so diagnostics must report the full count
            self._n_unique = None
            self._dedup_cache = None
            return None
        self._n_unique = n_unique
        logger.info(
            "micro stage deduplicated: %d cells -> %d unique cell problems",
            nc, n_unique,
        )
        self._dedup_cache = (
            rep.astype(np.int64), inverse.reshape(-1).astype(np.int64)
        )
        return self._dedup_cache

    def _shard_cells(self, centers):
        """Sharding constraint on the macro-cell batch (no-op without
        ``shard_mesh``)."""
        if self._shard_mesh is None:
            return centers
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.lax.with_sharding_constraint(
            centers,
            NamedSharding(
                self._shard_mesh, PartitionSpec(self._shard_mesh.axis_names[0])
            ),
        )

    def cell_correctors(self, cells=None):
        """Generator correctors on the micro mesh for selected macro cells.

        Replaces the reference's per-(cell, basis-function) corrector solves
        (``hmm.py:397-432``) with one batched call.  The s correctors span
        the cell-problem solutions: the corrector for macro basis gradient g
        is ``X @ coeffs(g)`` by linearity (Poisson: coeffs = g itself;
        elasticity: the symmetrized generator expansion).

        Args:
            cells: macro cell indices (default: all cells).
        Returns:
            (A_star, X_full): homogenized tensors (nc_sel, s, s) and
            correctors (nc_sel, n_micro_nodes·bs, s) expanded back to the
            full periodic micro node set (P2 micro spaces include edge
            nodes after the vertex block).
        """
        centers = self._sys.centers
        if cells is not None:
            centers = centers[jnp.asarray(np.asarray(cells))]
        A_star, X = self._engine.tensors_for_centers(
            self._coeff, centers, G_fn=self._G_fn(), with_correctors=True
        )
        eng = self._engine
        red = np.asarray(eng.pmap.reduced_index)  # (n_nodes,)
        comp = np.arange(eng.bs)
        idx = (red[:, None] * eng.bs + comp[None, :]).reshape(-1)
        return A_star, X[:, jnp.asarray(idx), :]

    def local_stiffness(self) -> jnp.ndarray:
        """S_loc per cell, (nc, nb, nb) — equals the reference's per-cell
        output ``S_loc * |T|/|Y|`` (``hmm.py:366-369``)."""
        A_star = self.homogenized_tensors()
        A_T = jnp.swapaxes(A_star, -1, -2)  # reference index order, see engine
        sys = self._sys
        if self._V_macro.bs == 1:
            return jnp.einsum("c,cad,cde,cbe->cab", sys.vols, sys.grads, A_T, sys.grads)
        return jnp.einsum(
            "c,cmr,crt,cnt->cmn", sys.vols, sys.strain_P, A_T, sys.strain_P
        )

    def solve(self) -> Function:
        """Assemble the HMM system and solve (reference ``hmm.py:434-491``).

        The macro stage runs as ONE jitted program (critical on TPU, where
        eager dispatch through the runtime tunnel costs ~25 ms/op); the
        micro-stage output A*(c_T) is cached across solves so BC/rhs sweeps
        only re-run the macro stage (the reference's ``_needs_reassembly``
        optimization, ``hmm.py:300-301``, strengthened: BC changes never
        re-trigger the cell problems here).
        """
        sys = self._sys
        t0 = time.perf_counter()
        A_star = self.homogenized_tensors()
        t_micro = time.perf_counter() - t0

        # NaN guard on the micro-stage output (reference hmm.py:320-323
        # logs and continues; we do the same, naming the offending cells).
        # Computed ON DEVICE: reading A* back for a host-side check costs
        # ~70-120 ms on the beam through the ~10-15 MB/s axon readback
        # tunnel; the per-cell bool mask is a few KB.  On the fused direct
        # path the any-NaN flag rides the macro program's packed stats
        # readback instead of its own dispatch+sync (each costs ~25 ms
        # through the tunnel); the per-cell indices are only read back on
        # the rare flagged solve.
        if self._nan_jit is None:
            self._nan_jit = jax.jit(lambda a: jnp.isnan(a).any(axis=(1, 2)))
        nan_cells = np.array([], dtype=np.int64)
        if self._macro_method != "direct":
            nan_cells = np.nonzero(np.asarray(self._nan_jit(A_star)))[0]
            if nan_cells.size:
                logger.error(
                    "Something went wrong when calculating the homogenized tensor "
                    "on %d cells (first: %s)", nan_cells.size, nan_cells[:5].tolist()
                )
        # divergence guard: energy minimization bounds diag(A*) by the
        # zero-corrector tensor's diagonal; a violation means the iterative
        # cell solve diverged (e.g. f32 PCG on extreme coefficient contrast
        # — use dtype=jnp.float64 for such problems)
        diverged_cells = np.array([], dtype=np.int64)
        if self._engine.solver == "pcg":
            if self._a0_jit is None:
                # the full guard runs on device (one dispatch, bool-mask
                # readback) — the previous host-side version read back the
                # (nc, s, s) zero-corrector tensor batch every solve
                def _guard(A_star, c):
                    A0, contrast = self._engine.nocorrector_tensors(
                        self._coeff, c, G_fn=self._G_fn()
                    )
                    d_star = jnp.einsum("cii->ci", A_star)
                    d_zero = jnp.einsum("cii->ci", A0)
                    diverged = (d_star > 1.05 * d_zero + 1e-9).any(axis=1)
                    tiny = jnp.asarray(
                        jnp.finfo(d_zero.dtype).tiny, d_zero.dtype
                    )
                    ratio = d_star / jnp.maximum(d_zero, tiny)
                    med = jnp.median(ratio, axis=0)
                    fallback = ((ratio > 0.999) & (med[None, :] < 0.95)).any(
                        axis=1
                    )
                    # scalar summary packed into ONE array: the host reads
                    # it back in a single sync and only fetches the per-cell
                    # masks when a flag is actually set (~25 ms per sync
                    # through the tunnel)
                    stats = jnp.stack(
                        [
                            jnp.max(contrast).astype(jnp.float64),
                            diverged.any().astype(jnp.float64),
                            fallback.any().astype(jnp.float64),
                        ]
                    )
                    return diverged, fallback, stats

                self._a0_jit = jax.jit(_guard)
            diverged_m, fallback_m, gstats = self._a0_jit(
                A_star, sys.centers
            )
            gstats = np.asarray(gstats)
            contrast = float(gstats[0])
            diverged_cells = (
                np.nonzero(np.asarray(diverged_m))[0]
                if gstats[1]
                else np.array([], dtype=np.int64)
            )
            if diverged_cells.size:
                logger.error(
                    "Cell-problem solve diverged on %d cells (homogenized "
                    "tensor exceeds its zero-corrector energy bound; first: "
                    "%s). Likely cause: float32 PCG on a high-contrast "
                    "coefficient — pass dtype=jnp.float64.",
                    diverged_cells.size,
                    diverged_cells[:5].tolist(),
                )
            elif contrast > 1e7 and jnp.dtype(self._dtype) == jnp.float32:
                # With per-cell diagonal scaling, full-f32 matmul precision
                # and the f64 macro stage, contrast 2e5 is measured accurate
                # to ~2e-5 end-to-end; the warning now fires only near the
                # f32 epsilon scale where the solver is genuinely unvalidated.
                logger.warning(
                    "Coefficient contrast ~%.1e approaches the float32 "
                    "epsilon scale; verify against dtype=jnp.float64 or use "
                    "it outright for certified results.",
                    contrast,
                )
            # zero-corrector fallback detector: the f32 PCG clamps columns
            # whose energy never beats the zero corrector (bounded, physical,
            # but stiffer than exact).  A cell is flagged when one of its
            # generators sits at the zero-corrector bound while the median
            # cell's corrector visibly lowers that generator's energy.
            # (mask computed in _guard above, on device; fetched only when
            # the packed any-flag is set)
            fallback_cells = (
                np.nonzero(np.asarray(fallback_m))[0]
                if gstats[2]
                else np.array([], dtype=np.int64)
            )
            if fallback_cells.size:
                logger.warning(
                    "%d cells returned the zero-corrector fallback tensor "
                    "(float32 cell solve could not descend below the "
                    "zero-corrector energy; typically extreme local "
                    "conditioning). Result is a bounded upper-stiffness "
                    "approximation — pass dtype=jnp.float64 for full "
                    "accuracy. First cells: %s",
                    fallback_cells.size,
                    fallback_cells[:5].tolist(),
                )
            self.diagnostics_contrast = contrast
            self._fallback_cells = fallback_cells


        fallback_cells = getattr(self, "_fallback_cells", np.array([], dtype=np.int64))
        # f64 macro stage: BC values must not round-trip through f32 (the
        # whole point of the f64 direct path is κ~1e7 robustness)
        bc_dtype = jnp.float64 if self._macro_f64 else self._dtype
        mask, bvals = merge_bcs(self._bcs, self._V_macro.num_dofs, bc_dtype)
        if self._b_load is None:
            verts = sys.verts64 if self._macro_f64 else sys.verts
            self._b_load = jax.block_until_ready(
                jax.jit(
                    lambda v, c: assemble_load_vector(
                        v,
                        c,
                        self._f_fn,
                        bs=self._V_macro.bs,
                        degree=self._quad_degree_rhs,
                    )
                )(verts, sys.cells)
            )
        if self._macro_jit is None:
            # Two stages on the CG path: composing scatter-assembly with the
            # CG while-loop in one XLA module compiles pathologically slowly
            # on TPU.  The direct path has no while_loop, so its whole macro
            # stage (assemble + mixed-precision direct solve) fuses into ONE
            # program — each separate jitted call costs ~25-30 ms fixed
            # dispatch latency through the axon tunnel.
            if self._macro_method == "direct":

                def _fused(A_star, mask, bvals, b):
                    vals_bc, b_bc = self._macro_assemble(A_star, mask, bvals, b)
                    x, it, r = self._macro_solve(vals_bc, b_bc)
                    # iteration count, residual and the micro-stage NaN flag
                    # packed into ONE tiny array: the host syncs once per
                    # solve instead of once per scalar (~25 ms each through
                    # the tunnel)
                    stats = jnp.stack(
                        [
                            jnp.asarray(it, jnp.float64),
                            jnp.asarray(r, jnp.float64),
                            jnp.isnan(A_star).any().astype(jnp.float64),
                        ]
                    )
                    return vals_bc, x, stats

                self._macro_jit = (jax.jit(_fused), None)
            else:

                def _slv(vals_bc, b_bc):
                    x, it, r = self._macro_solve(vals_bc, b_bc)
                    # packed (iters, residual): one host sync, not two
                    return x, jnp.stack(
                        [jnp.asarray(it, x.dtype), jnp.asarray(r, x.dtype)]
                    )

                self._macro_jit = (
                    jax.jit(self._macro_assemble),
                    jax.jit(_slv),
                )
        asm, slv = self._macro_jit
        t0 = time.perf_counter()
        if slv is None:
            vals_bc, x, stats = asm(A_star, mask, bvals, self._b_load)
            stats = np.asarray(stats)  # the solve's single host sync
            iters, res = int(stats[0]), float(stats[1])
            if stats[2]:
                nan_cells = np.nonzero(np.asarray(self._nan_jit(A_star)))[0]
                logger.error(
                    "Something went wrong when calculating the homogenized "
                    "tensor on %d cells (first: %s)",
                    nan_cells.size, nan_cells[:5].tolist(),
                )
        else:
            vals_bc, b_bc = asm(A_star, mask, bvals, self._b_load)
            x, stats = slv(vals_bc, b_bc)
            stats = np.asarray(stats)  # one sync for both scalars
            iters, res = int(stats[0]), float(stats[1])
        t_macro = time.perf_counter() - t0
        if iters >= self._options_global.maxiter:
            logger.error(
                "Something went wrong in the global problem solve: CG hit "
                "maxiter=%d with residual %.3e", iters, res,
            )
        self._last_vals_bc = vals_bc
        self._needs_reassembly = False
        self.diagnostics = {
            "micro_seconds": t_micro,
            "macro_seconds": t_macro,
            "macro_iterations": iters,
            "macro_residual": res,
            "nan_cells": nan_cells,
            "diverged_cells": diverged_cells,
            "fallback_cells": fallback_cells,
            "num_cells": int(sys.centers.shape[0]),
            "unique_cells": self._n_unique or int(sys.centers.shape[0]),
        }
        self._u = Function(self._V_macro, x.astype(self._dtype))
        self._u.solver_iterations = iters
        self._u.solver_residual = res
        return self._u

    def _macro_assemble(self, A_star, mask, bvals, b):
        """Pure macro assembly: A* batch → BC-applied system.

        On the direct-solve path the whole assembly runs in f64 with the f64
        geometry shadows (see __init__ on _macro_f64) — in double-float32
        pairs on TPU backends, where native f64 is software-emulated
        (ops/twofloat.py; ``HOMMX_MACRO_ASSEMBLY`` overrides).  ``b`` is
        the pre-assembled load vector (cached across solves — f and the
        mesh are static; see ``set_right_hand_side``)."""
        return assemble_macro_system(
            self._sys, A_star, b, mask, bvals,
            bs=self._V_macro.bs, macro_f64=self._macro_f64,
        )

    def _use_sharded_macro(self) -> bool:
        """Sharded macro CG applies when: a mesh is set, the solve is on
        the iterative path (the tiny direct-path systems stay replicated,
        like the reference's sub-communicator direct solves), and row
        sharding is admissible — DIA halo structure on structured meshes,
        the all-gather ELL SpMV otherwise.  The f64 iterative elasticity
        path (round-3 verdict item 3) shards too: PETSc GAMG+CG is
        distributed for every config under mpirun
        (``rotated_fibers.py:98`` with ``hmm.py:157,482-483``)."""
        if self._shard_mesh is None or self._macro_method != "cg":
            return False
        from hommx_tpu.parallel.macro import (
            can_shard_macro,
            can_shard_macro_ell,
        )

        nd = self._shard_mesh.devices.size
        if can_shard_macro(self._sys.dia, nd):
            return True
        return self._sys.dia is None and can_shard_macro_ell(
            self._V_macro.num_dofs, nd
        )

    def _macro_solve(self, vals_bc, b_bc):
        sys = self._sys
        mg, amg = macro_precs(sys, self._options_global)
        if self._use_sharded_macro():
            from hommx_tpu.parallel.macro import make_sharded_solver

            solver = make_sharded_solver(
                self._shard_mesh, sys.dia, sys.cols, self._options_global,
                mg=mg, amg=amg,
            )
            return solver.full(vals_bc, b_bc)
        return solve_ell(
            vals_bc, sys.cols, b_bc, self._options_global, dia=sys.dia,
            mg=mg, amg=amg,
        )

    def build_pipeline(self, shard_mesh=None, shard_mode: str = "auto"):
        """Return a pure jittable function ``step(centers) -> u`` running the
        entire HMM solve (micro stage + macro assembly + macro solve).

        This is the TPU-first capability the reference architecture cannot
        express: the whole solver is one traced program — jit it, grad
        through it, or shard it.  With ``shard_mesh`` (a 1D
        ``jax.sharding.Mesh``; defaults to the constructor's), the micro
        stage is sharded over the macro-cell batch (the TPU-native
        replacement for the reference's MPI domain decomposition,
        ``hmm.py:544-551``) and a CG macro solve runs row-sharded with psum
        collectives and the multigrid V-cycle preconditioner when available
        (parallel/macro.py — the analogue of the reference's
        COMM_WORLD-partitioned KSP under GAMG, ``hmm.py:144-149,482-483``
        with ``rotated_fibers.py:98``); the small-system direct path stays
        replicated (macro systems are small by HMM design).

        Args:
            shard_mesh: optional 1D device mesh.
            shard_mode: how the micro stage is sharded.
                ``"auto"`` (default) — a GSPMD sharding constraint on the
                cell batch; composes with implicit differentiation, so the
                sharded pipeline is differentiable end-to-end exactly like
                the unsharded one.  ``"shard_map"`` — explicit per-device
                blocks (each device runs the full engine strategy stack on
                its local cells); primal-only: the micro stage drops the
                implicit-diff rule (``lax.custom_linear_solve`` does not
                compose with shard_map's manual axes), while the macro
                solve keeps its VJP in both modes.

        Returns: (step_fn, example_centers).  ``centers`` must have static
        shape (num_cells, dim); with shard_map, num_cells must divide the
        device count evenly.

        Note: the pipeline does NOT deduplicate cell problems (dedup
        requires a data-dependent host-side class structure, which a pure
        traced program cannot carry) — every cell is solved on every call.
        On heavily structured configurations where ``solve()`` collapses
        the batch (the rotated-fiber beam is 18 unique problems among
        4320 cells), the pipeline therefore does up to that factor more
        micro work per step than ``solve()``; it is the right tool when
        differentiating or scanning over coefficients, where the inputs
        change every call and dedup would not help anyway.
        """
        engine = self._engine
        sys = self._sys
        coeff = self._coeff
        G_fn = self._G_fn()
        f_fn = self._f_fn
        bs = self._V_macro.bs
        rhs_degree = self._quad_degree_rhs
        bc_dtype = jnp.float64 if self._macro_f64 else self._dtype
        mask, bvals = merge_bcs(self._bcs, self._V_macro.num_dofs, bc_dtype)
        options = self._options_global
        chunk = self._chunk
        shard_mesh = shard_mesh if shard_mesh is not None else self._shard_mesh
        if shard_mode not in ("auto", "shard_map"):
            raise ValueError("shard_mode must be 'auto' or 'shard_map'")

        def micro_stage(centers):
            if shard_mesh is not None and shard_mode == "shard_map":
                from jax.sharding import PartitionSpec as P

                shard_map = getattr(jax, "shard_map", None)
                if shard_map is None:  # pragma: no cover - older jax
                    from jax.experimental.shard_map import shard_map as _sm

                    shard_map = _sm
                # each shard runs the full engine strategy stack (densek /
                # matfree / low-rank chunk PCG) on its local cell block, so
                # multi-chip inherits every single-chip optimization.
                # implicit_diff off: custom_linear_solve does not compose
                # with shard_map's manual axes
                return shard_map(
                    lambda cs: engine.tensors_for_centers(
                        coeff, cs, G_fn=G_fn, chunk=chunk, implicit_diff=False
                    ),
                    mesh=shard_mesh,
                    in_specs=P(shard_mesh.axis_names[0]),
                    out_specs=P(shard_mesh.axis_names[0]),
                )(centers)
            if shard_mesh is not None:  # "auto": GSPMD batch partitioning
                from jax.sharding import NamedSharding, PartitionSpec

                centers = jax.lax.with_sharding_constraint(
                    centers,
                    NamedSharding(
                        shard_mesh, PartitionSpec(shard_mesh.axis_names[0])
                    ),
                )
            return engine.tensors_for_centers(coeff, centers, G_fn=G_fn, chunk=chunk)

        macro_f64 = self._macro_f64
        dtype = self._dtype
        method = options.method
        if method == "auto":
            method = (
                "direct"
                if self._V_macro.num_dofs <= options.direct_threshold
                else "cg"
            )
        from hommx_tpu.parallel.macro import (
            can_shard_macro,
            can_shard_macro_ell,
        )

        shard_macro = (
            shard_mesh is not None
            and method == "cg"
            and (
                can_shard_macro(sys.dia, shard_mesh.devices.size)
                or (
                    sys.dia is None
                    and can_shard_macro_ell(
                        self._V_macro.num_dofs, shard_mesh.devices.size
                    )
                )
            )
        )
        # implicit-function-theorem VJP: the pipeline is differentiable
        # end-to-end through the macro solve (iterative paths included),
        # sharded or not — the sharded solver wraps the row-sharded psum-CG
        # (MG/AMG-preconditioned when available) in the same implicit rule.
        if shard_macro:
            from hommx_tpu.parallel.macro import make_sharded_solver

            _mg, _amg = macro_precs(sys, options)
            _implicit_solve = make_sharded_solver(
                shard_mesh, sys.dia, sys.cols, options, mg=_mg, amg=_amg
            )
        else:
            from hommx_tpu.ops.solvers import make_implicit_solver

            _mg, _amg = macro_precs(sys, options)
            _solve_x = make_implicit_solver(
                sys.cols, options, dia=sys.dia, mg=_mg, amg=_amg
            )
            _implicit_solve = lambda v, b: (_solve_x(v, b), None, None)
        verts = sys.verts64 if macro_f64 else sys.verts

        def step(centers):
            A_star = micro_stage(centers)
            b = assemble_load_vector(verts, sys.cells, f_fn, bs=bs, degree=rhs_degree)
            vals_bc, b_bc = assemble_macro_system(
                sys, A_star, b, mask, bvals, bs=bs, macro_f64=macro_f64
            )
            x = _implicit_solve(vals_bc, b_bc)[0]
            return x.astype(dtype)

        return step, sys.centers

    def matrix_dense(self) -> np.ndarray:
        """Assembled (BC-applied) macro matrix as dense numpy — debugging and
        parity gates (replaces ``petsc_helper.petsc_matrix_to_numpy`` on
        ``hmm._A``, reference ``test_integration_poisson.py:236-240``)."""
        if self._last_vals_bc is None:
            raise RuntimeError("call solve() first")
        return np.asarray(ell_to_dense(self._last_vals_bc, self._sys.cols))

    def plot_solution(self, u: Optional[Function] = None, **kw):
        from hommx_tpu.utils.plotting import plot_fem_function

        return plot_fem_function(self._V_macro, u or self._u, **kw)


class PoissonHMM(BaseHMM):
    r"""HMM for the multiscale Poisson problem (reference ``hmm.py:514-667``).

    Solves  -div(A(x, x/eps) ∇u) = f  with the HMM bilinear form

        a_H(v, w) = Σ_T |T|/|Y| ∫_Y A(c_T, y)(∇v + ∇ṽ)·(∇w + ∇w̃) dy

    where the correctors ṽ solve the periodic cell problem
    ∫ A ∇ṽ·∇z = -∫ A ∇v·∇z.  A zero Dirichlet BC on the bounding-box
    boundary is installed by default (reference ``hmm.py:598-636``).
    """

    _bs = 1

    def __init__(self, msh, A, f, msh_micro, eps, *args, **kwargs):
        super().__init__(msh, A, f, msh_micro, eps, *args, **kwargs)
        self._bcs = [_box_boundary_zero_bc(self._V_macro)]


class PoissonStratifiedHMM(PoissonHMM):
    r"""Stratified/deformed-laminate Poisson HMM (reference ``hmm.py:670-789``).

    The coefficient is A(x, θ(x)/eps); the user supplies
    ``Dtheta_transpose(x) -> (d, d)`` with entries (∂θ_j/∂x_i), which maps
    corrector gradients in all three cell-problem forms
    (reference ``hmm.py:759-789``).
    """

    def __init__(
        self,
        msh,
        A,
        f,
        msh_micro,
        eps,
        Dtheta_transpose: Callable,
        *args,
        **kwargs,
    ):
        self._Dtheta_t = Dtheta_transpose
        super().__init__(msh, A, f, msh_micro, eps, *args, **kwargs)

    def _G_fn(self):
        return self._Dtheta_t


class LinearElasticityHMM(BaseHMM):
    r"""HMM for multiscale linear elasticity (reference ``hmm.py:792-922``).

    A(x, y) is a fourth-order Hooke tensor (d,d,d,d); the cell problems use
    the strain e(u) = ½(∇u + ∇uᵀ).  No default boundary conditions
    (reference ``hmm.py:806-807``) — set them via
    :meth:`set_boundary_conditions`.
    """

    def __init__(self, msh, A, f, msh_micro, eps, *args, **kwargs):
        self._bs = msh.dim
        super().__init__(msh, A, f, msh_micro, eps, *args, **kwargs)


class LinearElasticityStratifiedHMM(LinearElasticityHMM):
    r"""Stratified elasticity HMM (reference ``hmm.py:925-1067``).

    Corrector strains use the deformed strain
    e_D(u) = ½(Dθᵀ ∇̄u + (Dθᵀ ∇̄u)ᵀ) with ∇̄ = nabla_grad = gradᵀ
    (the grad/nabla_grad ordering note of reference ``hmm.py:1027-1029``);
    the macro basis part keeps the plain strain e (reference
    ``hmm.py:1043-1067``).
    """

    def __init__(
        self, msh, A, f, msh_micro, eps, Dtheta_transpose: Callable, *args, **kwargs
    ):
        self._Dtheta_t = Dtheta_transpose
        super().__init__(msh, A, f, msh_micro, eps, *args, **kwargs)

    def _G_fn(self):
        return self._Dtheta_t


def _box_boundary_zero_bc(V: FunctionSpace) -> DirichletBC:
    """Zero Dirichlet BC on the bounding-box boundary (reference
    ``hmm.py:598-636`` uses min/max coordinate markers)."""
    mesh = V.mesh
    lo, hi = mesh.bounding_box()

    def marker(x):
        m = np.zeros(x.shape[1], dtype=bool)
        for k in range(mesh.dim):
            m |= np.isclose(x[k], lo[k]) | np.isclose(x[k], hi[k])
        return m

    dofs = locate_dofs_geometrical(V, marker)
    return dirichletbc(0.0 if V.bs == 1 else np.zeros(V.bs), dofs, V)
