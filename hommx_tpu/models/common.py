"""Shared machinery for the solver classes: coefficient probing, strain
coefficient matrices, BC merging, and the macro solve pipeline."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.ops.elements import cell_geometry
from hommx_tpu.ops.function_space import DirichletBC, FunctionSpace
from hommx_tpu.ops.sparse import build_ell_pattern

__all__ = [
    "probe_coeff_kind",
    "strain_coefficients",
    "merge_bcs",
    "MacroSystem",
    "macro_precs",
    "assemble_macro_system",
]


def _df_assembly(sys, macro_f64: bool) -> bool:
    """Whether the f64 macro assembly should run in double-float32.

    On TPU backends every f64 op is software-emulated on the VPU and the
    assembly chain (tiny FLOPs) measures ~110 ms of pure emulation
    overhead on the rotated-fiber beam; the df path (ops/twofloat.py)
    computes the same chain in exact-compensated f32 pairs at O(2⁻⁴⁸)
    relative error — far below the refinement solver's 1e-13 target and
    the f32 A* input error.  Native-f64 backends (CPU) keep true f64.
    ``HOMMX_MACRO_ASSEMBLY=df|f64`` overrides (trace-time).
    """
    if not macro_f64:
        return False
    import os

    mode = os.environ.get("HOMMX_MACRO_ASSEMBLY", "auto")
    if mode == "f64":
        return False
    if mode != "df" and jax.default_backend() not in ("tpu", "axon"):
        return False
    return sys.gather_asm is not None


def assemble_macro_system(sys, A_star, b, mask, bvals, *, bs, macro_f64):
    """A*(c_T) batch → BC-applied macro ELL system (vals_bc, b_bc).

    The shared macro assembly of ``BaseHMM._macro_assemble`` and
    ``build_pipeline``: per-cell stiffness einsum (reference
    ``hmm.py:334-369``), global ELL assembly (``hmm.py:325-330,442``),
    symmetric Dirichlet lifting (``hmm.py:453-480``).

    On the f64 direct path the chain runs either in true f64 (native-f64
    backends) or in double-float32 on TPU (see :func:`_df_assembly`); the
    returned values are f64 either way.
    """
    from hommx_tpu.ops.assembly import apply_dirichlet, assemble_ell

    if _df_assembly(sys, macro_f64):
        from hommx_tpu.ops import twofloat as tf

        P64 = sys.strain_P64 if bs > 1 else sys.grads64
        A_T = jnp.swapaxes(A_star, -1, -2)
        S_df = tf.sloc_einsum_df(
            tf.df_from_f64(sys.vols64), tf.df_from_f64(P64), A_T
        )
        vals_df = tf.assemble_gather_df(S_df, sys.gather_asm)
        vals_df, b_bc = tf.apply_dirichlet_df(
            vals_df,
            sys.cols,
            sys.diag_slots,
            b.astype(jnp.float64),
            mask,
            bvals.astype(jnp.float64),
            dia=sys.dia,
        )
        return tf.df_to_f64(vals_df), b_bc
    if macro_f64:
        vols = sys.vols64
        P = sys.strain_P64 if bs > 1 else sys.grads64
        A_T = jnp.swapaxes(A_star, -1, -2).astype(jnp.float64)
        bvals = bvals.astype(jnp.float64)
        b = b.astype(jnp.float64)
    else:
        vols = sys.vols
        P = sys.strain_P if bs > 1 else sys.grads
        A_T = jnp.swapaxes(A_star, -1, -2)  # reference index order
    if bs == 1:
        S_loc = jnp.einsum("c,cad,cde,cbe->cab", vols, P, A_T, P)
    else:
        S_loc = jnp.einsum("c,cmr,crt,cnt->cmn", vols, P, A_T, P)
    vals = assemble_ell(sys.pattern, S_loc, sys.slots, gather=sys.gather_asm)
    return apply_dirichlet(
        vals, sys.cols, sys.diag_slots, b, mask, bvals, dia=sys.dia
    )


def macro_precs(sys, options):
    """(mg, amg) preconditioner structures for the iterative macro path —
    (None, None) when the solve is certainly direct or the options exclude
    multigrid, so the lazy hierarchy builds never run for solves that
    cannot use them.  f64 iterative systems (elasticity above the direct
    threshold) DO get the hierarchy: the V-cycle preconditioner runs in
    f32 on TPU while the Krylov loop stays f64 (ops/solvers.py)."""
    method = options.method
    if method == "auto":
        method = (
            "direct" if sys.V.num_dofs <= options.direct_threshold else "cg"
        )
    if method != "cg" or options.pc not in ("auto", "mg"):
        return None, None
    return sys.mg, sys.amg


def probe_coeff_kind(coeff: Callable, dim: int, nargs: int = 2) -> str:
    """Classify A(x, y) (or A(y)) output: 'scalar' | 'matrix' | 'tensor4'.

    Uses eval_shape — no device execution (coefficients may be expensive and
    eager execution on the TPU backend is slow)."""
    spec = jax.ShapeDtypeStruct((dim,), jnp.float32)
    try:
        out = jax.eval_shape(lambda *a: jnp.asarray(coeff(*a)), *([spec] * nargs))
        shape = out.shape
    except Exception:
        x = jnp.zeros((dim,))
        shape = jnp.shape(jnp.asarray(coeff(*((x, x)[:nargs]))))
    if shape == ():
        return "scalar"
    if shape == (dim, dim):
        return "matrix"
    if shape == (dim, dim, dim, dim):
        return "tensor4"
    raise ValueError(f"unsupported coefficient shape {shape} for dim={dim}")


def strain_coefficients(grads: jnp.ndarray, d: int) -> jnp.ndarray:
    """P[c, m, (kl)] = e(v_m)_{kl} for the vector basis m = vertex*d + comp.

    grads: (nc, d+1, d) P1 gradients.  e(v_{a,i})_{kl} =
    ½(δ_ik ∂λ_a/∂x_l + δ_il ∂λ_a/∂x_k).
    """
    nc, nb0, _ = grads.shape
    eye = jnp.eye(d, dtype=grads.dtype)
    # E[c, a, i, k, l]
    E = 0.5 * (
        jnp.einsum("ik,cal->caikl", eye, grads)
        + jnp.einsum("il,cak->caikl", eye, grads)
    )
    return E.reshape(nc, nb0 * d, d * d)


def merge_bcs(
    bcs: Sequence[DirichletBC], num_dofs: int, dtype
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Combine DirichletBCs into a (mask, values) pair over all dofs.

    Later BCs win on overlapping dofs (matches the reference's sequential
    per-bc application, ``hmm.py:453-480``).
    """
    mask = np.zeros(num_dofs, dtype=bool)
    vals = np.zeros(num_dofs, dtype=np.float64)
    for bc in bcs:
        mask[bc.dofs] = True
        vals[bc.dofs] = bc.values
    return jnp.asarray(mask), jnp.asarray(vals, dtype=dtype)


class MacroSystem:
    """Static assembly data for the macro FEM system on a function space."""

    def __init__(self, V: FunctionSpace, dtype):
        from hommx_tpu.config import host_setup
        from hommx_tpu.ops.dia import build_dia_from_ell

        self.V = V
        self.dtype = dtype
        self.cell_dofs = V.cell_dofs_unrolled()
        self.pattern = build_ell_pattern(self.cell_dofs, V.num_dofs)
        # DIA view of the sparsity (structured meshes): turns the CG SpMV
        # into static shifted multiply-adds — ~20x faster than gather on TPU
        self.dia = build_dia_from_ell(self.pattern)
        with host_setup():  # eager setup math stays off the TPU (config.py)
            self.slots = jnp.asarray(self.pattern.slots)
            self.cols = jnp.asarray(self.pattern.cols)
            self.diag_slots = jnp.asarray(self.pattern.diag_slots)
            # Geometry is computed in f64 and kept both ways: the f64 shadows
            # feed the f64 macro stage (direct-solve path — macro elasticity
            # systems reach κ~1e7, where f32 matrix entries alone cost
            # percent-level solution error), the dtype views feed the f32 CG
            # pipeline.  Same lesson as the micro quadrature coordinates:
            # geometry stays f64 regardless of the compute dtype.
            self.cells = jnp.asarray(V.mesh.cells)
            self.verts64 = jnp.asarray(V.mesh.vertices, dtype=jnp.float64)
            grads64, vols64 = cell_geometry(self.verts64, self.cells)
            self.grads64, self.vols64 = grads64, vols64
            self.verts = self.verts64.astype(dtype)
            self.grads = grads64.astype(dtype)  # (nc, d+1, d)
            self.vols = vols64.astype(dtype)  # (nc,)
            self.centers = jnp.mean(
                self.verts64[self.cells], axis=1
            ).astype(dtype)  # c_T
            if V.bs > 1:
                self.strain_P64 = strain_coefficients(grads64, V.bs)
                self.strain_P = self.strain_P64.astype(dtype)  # (nc, nb, d²)
        self._mg = False  # lazily built (False = not yet, None = unavailable)
        self._amg = False
        self._gather_asm = False

    @property
    def gather_asm(self):
        """Gather-formulation contributor table for the macro assembly
        (ops/assembly.py::build_gather_assembly), built lazily on TPU
        backends only: the scatter-add serializes there (and pays the
        emulated-f64 penalty per colliding add), while on CPU the scatter
        is fine and the table would be wasted memory.  None when
        unavailable (CPU, or pathological multiplicity)."""
        if self._gather_asm is False:
            import os

            import jax as _jax

            from hommx_tpu.config import host_setup
            from hommx_tpu.ops.assembly import build_gather_assembly

            want = _jax.default_backend() in ("tpu", "axon") or (
                # df assembly forced on a CPU backend (tests/A-B runs)
                os.environ.get("HOMMX_MACRO_ASSEMBLY") == "df"
            )
            if want:
                with host_setup():
                    self._gather_asm = build_gather_assembly(self.pattern)
            else:
                self._gather_asm = None
        return self._gather_asm

    @property
    def mg(self):
        """Geometric-multigrid hierarchy for the macro operator (structured
        meshes with a DIA view; None otherwise).  Built lazily: the direct
        path never needs it."""
        if self._mg is False:
            from hommx_tpu.ops.multigrid import build_mg_structure

            # P2 dofs (vertices + edge midpoints) are not the vertex grid
            self._mg = (
                build_mg_structure(self.V.mesh.structure, self.V.bs, self.dia)
                if getattr(self.V, "degree", 1) == 1
                else None
            )
        return self._mg

    @property
    def amg(self):
        """Aggregation-AMG hierarchy (ops/amg.py) — the preconditioner for
        the mesh classes the geometric hierarchy declines (Delaunay/file
        meshes, P2 layouts).  None when geometric MG is available (it is
        stronger) or the system is below the bottom size."""
        if self._amg is False:
            if self.mg is not None:
                self._amg = None
            else:
                from hommx_tpu.ops.amg import build_amg_structure

                self._amg = build_amg_structure(
                    self.pattern, self.V.bs,
                    near_kernel=self._rigid_modes(),
                )
        return self._amg

    def _rigid_modes(self):
        """Static near-null-space basis for the AMG tentative prolongation:
        per-component translations + rotations from the dof coordinates
        when the block size matches the dimension (elasticity) — the
        analogue of handing PETSc GAMG the rigid-body ``NearNullSpace``
        (strictly stronger than the reference, which leaves GAMG on its
        translation-only default).  None for scalar systems (the
        translations-only default inside build_amg_structure)."""
        bs, d = self.V.bs, self.V.dim
        if bs != d or d < 2:
            return None
        x = np.asarray(self.V.tabulate_dof_coordinates(), dtype=np.float64)
        # center + scale so rotation columns are O(1) like the translations
        x = x - x.mean(axis=0)
        x = x / max(float(np.abs(x).max()), 1e-30)
        n_nodes = x.shape[0]
        m = bs + (d * (d - 1)) // 2
        B = np.zeros((n_nodes * bs, m))
        B[np.arange(n_nodes * bs), np.arange(n_nodes * bs) % bs] = 1.0
        pairs = [(0, 1)] if d == 2 else [(0, 1), (0, 2), (1, 2)]
        for k, (a, b) in enumerate(pairs):
            B[np.arange(n_nodes) * bs + a, bs + k] = -x[:, b]
            B[np.arange(n_nodes) * bs + b, bs + k] = x[:, a]
        return B
