"""Global FEM assembly, Dirichlet lifting, load vectors, and integrals.

Replaces the PETSc assembly + BC pipeline of the reference
(``hmm.py:298-332`` global scatter, ``hmm.py:441-480`` rhs assembly and
symmetric Dirichlet lifting via ``zeroRowsColumns``).  Everything below is
jittable; patterns and index arrays are static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.ops.elements import cell_geometry, quad_points_physical
from hommx_tpu.ops.sparse import ELLPattern, spmv

__all__ = [
    "assemble_ell",
    "build_gather_assembly",
    "apply_dirichlet",
    "assemble_load_vector",
    "integrate",
    "l2_norm_fn",
    "assemble_p1_stiffness_local",
]


def assemble_ell(
    pattern: ELLPattern,
    S_loc: jnp.ndarray,
    slots: jnp.ndarray,
    gather: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Assemble per-cell blocks (nc, nb, nb) into the flat ELL value array.

    Default: one XLA scatter-add over ``slots`` (``pattern.slots`` on
    device) — replaces the reference's per-cell ``A.setValues(...,
    ADD_VALUES)`` loop (reference ``hmm.py:325-330``).

    With ``gather`` (from :func:`build_gather_assembly`), the same sum is
    computed as a gather + row reduction instead: per ELL slot, fetch its
    (padded) contributor entries from the flat element-matrix array and
    sum.  Scatter-add with duplicate indices serializes on TPU (and in
    emulated f64 pays the penalty per colliding add), while the gather
    formulation is a vectorized fetch over a STATIC contributor table —
    the assembly becomes shape-regular MXU/VPU work.  Both orders sum the
    same contributions; results differ only by floating-point
    reassociation (≤ a few ulp).
    """
    if gather is not None:
        flat = jnp.concatenate(
            [S_loc.reshape(-1), jnp.zeros((1,), S_loc.dtype)]
        )
        return jnp.sum(flat[gather], axis=1)
    vals = jnp.zeros(pattern.num_dofs * pattern.row_width, dtype=S_loc.dtype)
    return vals.at[slots.reshape(-1)].add(S_loc.reshape(-1))


def build_gather_assembly(pattern: ELLPattern, max_mult: int = 32):
    """Host-side inversion of the assembly scatter map.

    Returns an int32 ``(num_slots, m)`` table: per flat ELL slot, the
    indices of its contributing entries in ``S_loc.reshape(-1)``, padded
    with the sentinel ``S_loc.size`` (which indexes an appended zero in
    :func:`assemble_ell`).  ``m`` is the maximum contributor multiplicity
    (≈ number of cells sharing a dof pair — ~24 for 3D P1 vertex
    diagonals).  Returns None when ``m > max_mult`` (pathological meshes:
    the padded table would waste memory; keep the scatter).

    Returns NUMPY (not jnp): callers cache the table lazily and the first
    touch can happen inside an active jit trace, where ``jnp.asarray``
    would produce a trace-local constant — caching THAT leaks a tracer
    into every later trace (UnexpectedTracerError).  A numpy table embeds
    as a fresh constant per consuming trace instead."""
    slots = pattern.slots.reshape(-1).astype(np.int64)
    num_slots = pattern.num_dofs * pattern.row_width
    counts = np.bincount(slots, minlength=num_slots)
    m = int(counts.max()) if counts.size else 0
    if m == 0 or m > max_mult:
        return None
    order = np.argsort(slots, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(slots.size) - starts[slots[order]]
    contrib = np.full((num_slots, m), slots.size, dtype=np.int64)
    contrib[slots[order], pos] = order
    return contrib.astype(np.int32)


def apply_dirichlet(
    vals: jnp.ndarray,
    cols: jnp.ndarray,
    diag_slots: jnp.ndarray,
    b: jnp.ndarray,
    bc_mask: jnp.ndarray,
    bc_values: jnp.ndarray,
    dia=None,
):
    """Symmetric Dirichlet elimination by lifting.

    Mirrors the reference recipe exactly (``hmm.py:453-480``):
        b  <- b - A @ u_bc          (lifting, keeps symmetry)
        A  <- zero bc rows & cols, 1 on the bc diagonal
        b  <- bc values on bc rows

    Entirely gather/scatter-free when a DIAPattern is supplied (the lifting
    matvec runs in diagonal format and the bc-diagonal write is an
    elementwise mask) — TPU gathers and scatters are both slow to run and
    pathologically slow to compile.

    Args:
        bc_mask: (N,) bool, True at constrained dofs.
        bc_values: (N,) bc value at constrained dofs (0 elsewhere).
        dia: optional DIAPattern for the lifting matvec.
    Returns: (vals', b')
    """
    N, K = cols.shape
    u_bc = jnp.where(bc_mask, bc_values, 0.0)
    keep_row = jnp.logical_not(bc_mask).astype(vals.dtype)  # (N,)
    if dia is not None:
        from hommx_tpu.ops.dia import dia_spmv, ell_vals_to_dia, gather_cols

        b = b - dia_spmv(ell_vals_to_dia(dia, vals), dia.offsets, u_bc)
        keep_col = gather_cols(dia, keep_row)  # (N, K), gather-free
    else:
        b = b - spmv(vals, cols, u_bc)
        keep_col = keep_row[cols]  # (N, K)
    v = vals.reshape(N, K) * keep_row[:, None] * keep_col
    # unit diagonal on bc rows, written as an elementwise select.  The true
    # diagonal slots come from diag_slots (ELL padding slots alias column 0
    # and would otherwise match a naive cols == row test on row 0).
    is_diag = (
        jnp.zeros(N * K, dtype=bool).at[diag_slots].set(True).reshape(N, K)
    )
    v = jnp.where(is_diag & bc_mask[:, None], jnp.ones_like(v), v)
    b = jnp.where(bc_mask, bc_values, b)
    return v.reshape(-1), b


def assemble_load_vector(vertices, cells, f, bs: int = 1, degree: int = 2):
    """b_i = ∫ f · v_i dx with quadrature of given degree.

    Replaces ``fem.form(inner(f(x), v)*dx)`` + ``_assemble_vector_array``
    (reference ``hmm.py:129-133,445-450``).

    Args:
        f: JAX callable x:(d,) -> scalar (bs=1) or (bs,) vector.
    Returns: (num_vertices*bs,) load vector.
    """
    xq, wq, lam = quad_points_physical(vertices, cells, degree)  # (nc,nq,d),(nc,nq),(nq,nb0)
    fvals = jax.vmap(jax.vmap(f))(xq)  # (nc, nq) or (nc, nq, bs)
    if bs == 1:
        fvals = fvals.reshape(xq.shape[0], xq.shape[1])
        contrib = jnp.einsum("cq,qa->ca", wq * fvals, lam)  # (nc, nb0)
        b = jnp.zeros(vertices.shape[0], dtype=contrib.dtype)
        return b.at[cells.reshape(-1)].add(contrib.reshape(-1))
    fvals = fvals.reshape(xq.shape[0], xq.shape[1], bs)
    contrib = jnp.einsum("cq,cqk,qa->cak", wq, fvals, lam)  # (nc, nb0, bs)
    b = jnp.zeros(vertices.shape[0] * bs, dtype=contrib.dtype)
    dofs = (cells[:, :, None] * bs + jnp.arange(bs)[None, None, :]).reshape(-1)
    return b.at[dofs].add(contrib.reshape(-1))


def integrate(vertices, cells, fn, degree: int = 4):
    """∫ fn(x) dx over the mesh with the given quadrature degree."""
    xq, wq, _ = quad_points_physical(vertices, cells, degree)
    vals = jax.vmap(jax.vmap(fn))(xq)
    return jnp.sum(wq * vals.reshape(wq.shape))


def l2_norm_fn(vertices, cells, u_nodes, bs: int = 1, exact=None, degree: int = 4):
    """L² norm of (u_h - exact) for a P1 function; exact may be None.

    ``exact`` is a JAX callable x -> scalar/(bs,).  Replaces the reference's
    ``assemble_scalar(form(inner(u1-u2, u1-u2)*dx))`` error computations
    (``test_integration_poisson.py:27-38``).
    """
    xq, wq, lam = quad_points_physical(vertices, cells, degree)
    uv = u_nodes.reshape(-1, bs)[cells]  # (nc, nb0, bs)
    uq = jnp.einsum("qa,cab->cqb", lam, uv)  # (nc, nq, bs)
    if exact is not None:
        ex = jax.vmap(jax.vmap(exact))(xq).reshape(uq.shape)
        uq = uq - ex
    return jnp.sqrt(jnp.sum(wq * jnp.sum(uq * uq, axis=-1)))


def h1_seminorm_fn(vertices, cells, u_nodes, bs: int = 1, exact_grad=None, degree: int = 4):
    """H¹ seminorm |u_h|₁ of a P1 function, or |u_h - exact|₁ given a JAX
    callable ``exact_grad(x) -> (d,)`` / ``(bs, d)`` (BASELINE.md's H1 parity
    metric).  P1 gradients are elementwise constant."""
    grads, vols = cell_geometry(vertices, cells)  # (nc, nb0, d), (nc,)
    uv = u_nodes.reshape(-1, bs)[cells]  # (nc, nb0, bs)
    gu = jnp.einsum("cab,cad->cbd", uv, grads)  # (nc, bs, d), const per cell
    if exact_grad is None:
        return jnp.sqrt(jnp.sum(vols * jnp.sum(gu * gu, axis=(1, 2))))
    xq, wq, _ = quad_points_physical(vertices, cells, degree)
    ge = jax.vmap(jax.vmap(exact_grad))(xq)  # (nc, nq, [bs,] d)
    ge = ge.reshape(xq.shape[0], xq.shape[1], bs, vertices.shape[1])
    diff = gu[:, None, :, :] - ge
    return jnp.sqrt(jnp.sum(wq * jnp.sum(diff * diff, axis=(2, 3))))


def assemble_p1_stiffness_local(vertices, cells, coeff_at_cell):
    """Per-cell stiffness S_loc for elementwise-constant matrix coefficient.

    Args:
        coeff_at_cell: (nc, d, d) coefficient A evaluated per cell (for HMM
            this is the homogenized tensor A*(c_T); reference ``hmm.py:366-369``
            scales the micro integral into exactly this form).
    Returns: (nc, nb0, nb0) with S[c,a,b] = |T_c| * ∇λ_a · A_c ∇λ_b.
    """
    grads, vols = cell_geometry(vertices, cells)  # (nc, nb0, d), (nc,)
    return jnp.einsum("c,cad,cde,cbe->cab", vols, grads, coeff_at_cell, grads)
