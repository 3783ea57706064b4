"""Static operator construction and the per-cell solve route.

``build_operators`` runs once at engine construction (host, eager): the
per-element gradient operators, reduced dof maps, generator fields, and
nullspace pinning.  ``cell_tensor`` is the per-cell (vmapped) solve route
— dense/scatter K assembly + Cholesky or preconditioned block-CG for one
macro quadrature point.  Split out of micro/engine.py (round 5, zero
behavior change); both are reachable through the same ``MicroEngine``
methods as before.

See micro/engine.py's module docstring for the math and the reference
mapping (reference ``hmm.py:310-369``, ``cell_problem.py:303-388``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hommx_tpu.micro.engine import _sym_map
from hommx_tpu.micro.krylov import _block_pcg_matfree
from hommx_tpu.ops.elements import cell_geometry, quad_points_physical

__all__ = ["build_operators", "cell_tensor"]


def build_operators(eng):
    mesh, d, bs = eng.mesh, eng.d, eng.bs
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
    quad_degree = eng.quad_degree
    if eng.micro_degree == 2:
        # ∇P2·∇P2 integrands are quadratic — degree-2 rules minimum
        quad_degree = max(quad_degree, 2)
    xq, wq, lam_q = quad_points_physical(verts, cells, quad_degree)
    ne, nq = wq.shape
    grads_np = np.asarray(grads)  # (ne, d+1, d) = ∇λ_a per cell

    red = eng.pmap.reduced_index  # (n_nodes,)
    node_cells = eng._node_cells  # (ne, nnd): P1 vertices or P2 nodes
    nnd = node_cells.shape[1]
    nbl = nnd * bs  # local dofs per micro element
    eng.nbl = nbl

    if eng.micro_degree == 2:
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
        Draw = np.zeros((ne_eff, eng.r, nbl), dtype=np.float64)
        for a in range(nnd):
            if bs == 1:
                Draw[:, :, a] = dphi[:, a, :]
            else:
                for i in range(bs):
                    Draw[:, i * d : (i + 1) * d, a * bs + i] = dphi[:, a, :]
        node_cells = np.repeat(node_cells, nq, axis=0)  # (ne·nq, nnd)
        eng.yq = np.asarray(xq).reshape(ne_eff, 1, d)
        eng.wq = np.asarray(wq).reshape(ne_eff, 1)
        # P2 basis VALUES at the quadrature points (for load-vector
        # assembly in solve_periodic): per effective element, one row
        phi_np, _ = p2_basis(jnp.asarray(xi), d)
        eng.phi_q = np.tile(np.asarray(phi_np), (ne, 1)).reshape(
            ne_eff, 1, nnd
        )
        ne, nq = ne_eff, 1
    else:
        # local gradient operator Draw: (ne, r, nbl) — P1 gradients are
        # elementwise constant, so quadrature folds into Ā_e
        Draw = np.zeros((ne, eng.r, nbl), dtype=np.float64)
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
        eng.yq = np.asarray(xq)  # (ne, nq, d) quadrature points (f64)
        eng.wq = np.asarray(wq)  # (ne, nq) weights, Σ = |Y|
        # P1 basis values at the quadrature points = barycentric coords
        # (shared across elements); for load-vector assembly
        eng.phi_q = np.broadcast_to(
            np.asarray(lam_q)[None], (ne, nq, nnd)
        ).copy()
    eng.nE, eng.nq = ne, nq
    eng.Draw = jnp.asarray(Draw, dtype=eng.dtype)

    # local -> reduced dof map (ne, nbl)
    red_cells = red[node_cells]  # (ne, nnd)
    if bs == 1:
        loc2red = red_cells
    else:
        comp = np.arange(bs)
        loc2red = (red_cells[:, :, None] * bs + comp[None, None, :]).reshape(
            ne, nbl
        )
    eng.loc2red = jnp.asarray(loc2red)

    nred = eng.n_reduced
    # The dense reduced gradient operator D (ne, r, nred) is *shared*
    # across all macro cells, so it can afford to be much larger than a
    # per-cell dense K — build it whenever it fits comfortably.
    if ne * eng.r * nred <= 5e7:
        D = np.zeros((ne, eng.r, nred), dtype=np.float64)
        e_idx = np.arange(ne)[:, None, None]
        r_idx = np.arange(eng.r)[None, :, None]
        np.add.at(D, (e_idx, r_idx, loc2red[:, None, :]), Draw)
        eng.D = jnp.asarray(D, dtype=eng.dtype)
    else:
        eng.D = None
    if eng.assembly == "dense" and eng.D is None:
        raise ValueError("dense assembly requested but operator too large")

    # generator fields E: (r, s) — the Voigt set for elasticity (the
    # distinct symmetrized generators; see __init__ on eng.s)
    if bs == 1:
        E = np.eye(d)
        eng.sym_expand = None
    else:
        pairs = [(k, l) for k in range(d) for l in range(k, d)]
        E = np.zeros((d * d, len(pairs)))
        for j, (k, l) in enumerate(pairs):
            Ekl = np.zeros((d, d))
            Ekl[k, l] += 0.5
            Ekl[l, k] += 0.5
            E[:, j] = Ekl.reshape(-1)
        # expansion map Voigt column → (k·d+l) full column
        eng.sym_expand = np.asarray(
            [
                pairs.index((min(k, l), max(k, l)))
                for k in range(d)
                for l in range(d)
            ]
        )
    eng.E = jnp.asarray(E, dtype=eng.dtype)

    # nullspace pinning: the bs dofs of reduced vertex 0
    pin = np.zeros(nred, dtype=bool)
    pin[:bs] = True
    eng.pin_mask = jnp.asarray(pin)
    # quadrature COORDINATES stay f64 (coefficient sampling robustness);
    # everything downstream of coefficient VALUES uses the compute dtype
    eng.yq_dev = jnp.asarray(eng.yq, dtype=f64)
    eng.wq_dev = jnp.asarray(eng.wq, dtype=eng.dtype)
    eng._eye_sym = (
        _sym_map(jnp.eye(d, dtype=eng.dtype)) if bs == d else None
    )
    if eng.solver == "pcg" and eng.cell_prec not in ("fft", "mg"):
        eng._get_K0inv()  # build eagerly — np.linalg.inv can't trace
    elif eng.solver == "pcg" or (
        eng.solver == "cholesky"
        and eng.diag_scale
        and jnp.dtype(eng.dtype) == jnp.float32
    ):
        # only the diagonal scaling reference is needed (the f32
        # Cholesky equilibration, and the pcg+fft route whose
        # preconditioner is the FFT symbol): skip the dense K₀ inverse
        # entirely — at 16³-elasticity cell sizes (n_red ≈ 12k) it is
        # infeasible, and this is exactly what makes large micro
        # resolutions runnable (round-3 verdict item 1)
        eng._get_K0diag()
    if eng.cell_prec == "fft":
        eng._get_fft_symbols()  # eager — host FFT can't trace

# -- coefficient reduction ----------------------------------------------

def cell_tensor(eng, Ae: jnp.ndarray, G: Optional[jnp.ndarray] = None):
    """Homogenized tensor A* (s, s) and generator correctors X (nred, s)
    for one macro quadrature point.

    Ae: (ne, r, r) per-element reduced coefficient (see element_coeff).
    G:  optional Dθᵀ(c_T) gradient map (stratified variants).
    """
    Ae = jnp.asarray(Ae, dtype=eng.dtype)
    if G is not None:
        G = jnp.asarray(G, dtype=eng.dtype)
    T = eng._grad_map(G)
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
    AE = jnp.einsum("ert,ts->ers", A_F, eng.E)  # (ne, r, s)
    F_loc = -jnp.einsum("erl,ers->els", eng.Draw, AE)  # (ne, nbl, s)
    F = jnp.zeros((eng.n_reduced, eng.s), dtype=Ae.dtype)
    F = F.at[eng.loc2red.reshape(-1)].add(F_loc.reshape(-1, eng.s))

    # pin translations (constant nullspace)
    keep = jnp.logical_not(eng.pin_mask).astype(Ae.dtype)
    pinf = eng.pin_mask.astype(Ae.dtype)
    F = F * keep[:, None]

    if eng.solver == "cholesky" or eng.pcg_strategy == "densek":
        K = (
            eng._assemble_dense(A_K)
            if eng.assembly == "dense"
            else eng._assemble_scatter(A_K)
        )
        K = K * keep[:, None] * keep[None, :] + jnp.diag(pinf)
        if eng.solver == "cholesky":
            if jnp.dtype(eng.dtype) == jnp.float32 and eng.diag_scale:
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
                sc = eng._scale_from_diag(jnp.diagonal(K))[:, None]
                Ks = sc * K * sc.T
                c, low = jax.scipy.linalg.cho_factor(Ks)
                Y = jax.scipy.linalg.cho_solve((c, low), sc * F)
                X = sc * Y
                R = F - K @ X
                X = X + sc * jax.scipy.linalg.cho_solve((c, low), sc * R)
            else:
                c, low = jax.scipy.linalg.cho_factor(K)
                X = jax.scipy.linalg.cho_solve((c, low), F)
        elif eng.diag_scale:
            sc = eng._scale_from_diag(jnp.diagonal(K))[:, None]
            Y = _block_pcg_matfree(
                lambda p: sc * (K @ (sc * p)), sc * F,
                eng._get_K0inv(), eng.pcg_tol, eng.pcg_maxiter,
            )
            X = sc * Y
        else:
            X = _block_pcg_matfree(
                lambda p: K @ p, F, eng._get_K0inv(), eng.pcg_tol,
                eng.pcg_maxiter,
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
            if eng.D is not None:
                Dp = jnp.einsum("ern,ns->ers", eng.D, pk)
                w = jnp.einsum("ert,ets->ers", A_K, Dp)
                Kp = jnp.einsum("ern,ers->ns", eng.D, w)
            else:
                p_loc = pk[eng.loc2red]  # (ne, nbl, s)
                Dp = jnp.einsum("erl,els->ers", eng.Draw, p_loc)
                w = jnp.einsum("ert,ets->ers", A_K, Dp)
                wl = jnp.einsum("erl,ers->els", eng.Draw, w)
                Kp = (
                    jnp.zeros_like(p)
                    .at[eng.loc2red.reshape(-1)]
                    .add(wl.reshape(-1, eng.s))
                )
            return Kp * keep[:, None] + pinf[:, None] * p

        if eng.diag_scale:
            # exact diag(K) without materializing K
            if eng.D is not None:
                d = jnp.einsum("ern,ert,etn->n", eng.D, A_K, eng.D)
            else:
                dl = jnp.einsum(
                    "erl,ert,etl->el", eng.Draw, A_K, eng.Draw
                )
                d = (
                    jnp.zeros(eng.n_reduced, dtype=Ae.dtype)
                    .at[eng.loc2red.reshape(-1)]
                    .add(dl.reshape(-1))
                )
            sc = eng._scale_from_diag(d)[:, None]
            Y = _block_pcg_matfree(
                lambda p: sc * matvec(sc * p), sc * F,
                eng._get_K0inv(), eng.pcg_tol, eng.pcg_maxiter,
            )
            X = sc * Y
        else:
            X = _block_pcg_matfree(
                matvec, F, eng._get_K0inv(), eng.pcg_tol, eng.pcg_maxiter
            )

    # corrected per-element fields Φ_e = E + T D_e X_loc
    X_loc = X[eng.loc2red]  # (ne, nbl, s)
    DX = jnp.einsum("erl,els->ers", eng.Draw, X_loc)  # (ne, r, s)
    if T is not None:
        DX = jnp.einsum("rt,ets->ers", T, DX)
    Phi = eng.E[None, :, :] + DX  # (ne, r, s)
    # Astar[n_test, m_trial] = (1/|Y|) Σ_e Φ[:,n]ᵀ Ā_e Φ[:,m]
    Astar = jnp.einsum("ern,ert,etm->nm", Phi, Ae, Phi) / eng.volume_Y
    return eng._expand_astar(Astar), eng._expand_cols(X)


def solve_periodic(eng, coeff, rhs=None, grad_rhs=None, x_center=None):
    """Standalone periodic variational solve on the unit cell Y — the
    general-form ``PeriodicLinearProblem`` analogue (reference
    ``cell_problem.py:303-388``): the reference lets a user solve ANY
    periodic problem a(u, v) = L(v) on an MPC-constrained space; this is
    the same surface for this FEM.  Solves

        a(u, v) = ∫_Y ∇v · A(x₀, y) ∇u dy  =  L(v)
        L(v)    = ∫_Y f(y) · v dy  +  ∫_Y g(y) · ∇v dy

    on the reduced periodic space with the constant nullspace pinned
    (vertex pinning replaces the reference's PETSc NullSpace handling,
    ``cell_problem.py:345-361``).  As in the reference's pure-periodic
    setting, L must be compatible (zero total force per component for
    the f term); the pinned solve fixes the arbitrary constant.

    Args:
        coeff: the engine's coefficient callable A(x, y) (same contract
            as the HMM coefficient: scalar / (d,d) / (d,d,d,d) matching
            ``coeff_kind``).
        rhs: optional load callable f(y) → scalar (bs=1) or (bs,).
        grad_rhs: optional gradient-weighted load g(y) → (r,)
            (r = d for scalar, d² flattened-gradient rows for vector) —
            the HMM cell problems themselves are of this form.
        x_center: macro point x₀ passed to the coefficient (default 0).

    Returns:
        u on the FULL periodic node set, shape (n_nodes·bs,) — the
        reduced solution expanded through the periodic map (the analogue
        of the reference returning a Function on the MPC space).
    """
    if rhs is None and grad_rhs is None:
        raise ValueError("solve_periodic needs rhs and/or grad_rhs")
    d = eng.d
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    x0 = (
        jnp.zeros(d, dtype=f64)
        if x_center is None
        else jnp.asarray(x_center, dtype=f64)
    )
    Ae = eng.element_coeff(coeff, x0)  # (nE, r, r)
    n = eng.n_reduced
    bs, s = eng.bs, 1

    # load vector
    b = jnp.zeros((n,), dtype=eng.dtype)
    wq = jnp.asarray(eng.wq, dtype=eng.dtype)  # (nE, nq)
    if rhs is not None:
        fv = jax.vmap(jax.vmap(lambda y: jnp.asarray(rhs(y), dtype=eng.dtype)))(
            eng.yq_dev
        )  # (nE, nq) scalar or (nE, nq, bs)
        fv = fv.reshape(eng.nE, eng.nq, bs)
        phi = jnp.asarray(eng.phi_q, dtype=eng.dtype)  # (nE, nq, nnd)
        b_loc = jnp.einsum("eq,eqi,eqa->eai", wq, fv, phi).reshape(
            eng.nE, -1
        )  # (nE, nnd·bs) in (a, i) dof order = loc2red order
        b = b.at[eng.loc2red.reshape(-1)].add(b_loc.reshape(-1))
    if grad_rhs is not None:
        gv = jax.vmap(
            jax.vmap(lambda y: jnp.asarray(grad_rhs(y), dtype=eng.dtype))
        )(eng.yq_dev)  # (nE, nq, r)
        ge = jnp.einsum("eq,eqr->er", wq, gv)  # quadrature-reduced
        b_loc = jnp.einsum("er,erl->el", ge, eng.Draw)
        b = b.at[eng.loc2red.reshape(-1)].add(b_loc.reshape(-1))
    keep = jnp.logical_not(eng.pin_mask).astype(eng.dtype)
    b = b * keep

    if n <= 4096:
        T = eng._grad_map(None)
        A_K = Ae if T is None else jnp.einsum("mr,emt,tn->ern", T, Ae, T)
        K = (
            eng._assemble_dense(A_K)
            if eng.assembly == "dense" and eng.D is not None
            else eng._assemble_scatter(A_K)
        )
        K = K * keep[:, None] * keep[None, :] + jnp.diag(
            eng.pin_mask.astype(eng.dtype)
        )
        c = jax.scipy.linalg.cho_factor(K)
        u = jax.scipy.linalg.cho_solve(c, b)
    else:
        # large spaces: one-cell chunk PCG on the same operator (the MG
        # preconditioner when the mesh is structured, Jacobi otherwise)
        from hommx_tpu.micro.krylov import _chunk_pcg_raw

        T = eng._grad_map(None)
        A_K1 = (
            Ae[None]
            if T is None
            else jnp.einsum("mr,emt,tn->ern", T, Ae, T)[None]
        )  # (1, nE, r, r)
        keep3 = keep[:, None, None]
        pinf3 = eng.pin_mask.astype(eng.dtype)[:, None, None]

        bst = eng._get_block_stencil()
        if bst is not None:
            from hommx_tpu.micro.block_stencil import (
                block_stencil_matvec,
                block_stencil_weights,
            )

            Wb = block_stencil_weights(bst, eng, A_K1)
            matvec = lambda P: block_stencil_matvec(bst, Wb, P)
        else:

            def matvec(P):
                Pk = (P * keep3)[:, 0, 0]
                p_loc = Pk[eng.loc2red]
                Dp = jnp.einsum("erl,el->er", eng.Draw, p_loc)
                w = jnp.einsum("ert,et->er", A_K1[0], Dp)
                wl = jnp.einsum("erl,er->el", eng.Draw, w)
                Kp = (
                    jnp.zeros((n,), dtype=P.dtype)
                    .at[eng.loc2red.reshape(-1)]
                    .add(wl.reshape(-1))
                )
                return Kp[:, None, None] * keep3 + pinf3 * P

        mg_levels = (
            eng._get_mg_levels(bst.offsets, bst.shape)
            if bst is not None
            else None
        )
        if mg_levels is not None:
            from hommx_tpu.micro.chunk import _mg_nu
            from hommx_tpu.micro.mg_prec import mg_prec, mg_setup

            prec = mg_prec(
                mg_levels, mg_setup(mg_levels, Wb), nu=_mg_nu(eng)
            )
        else:
            dl = jnp.einsum(
                "erl,ert,etl->el", eng.Draw, A_K1[0], eng.Draw
            )
            dg = (
                jnp.zeros((n,), dtype=eng.dtype)
                .at[eng.loc2red.reshape(-1)]
                .add(dl.reshape(-1))
            )
            dg = jnp.where(eng.pin_mask | (dg <= 0), 1.0, dg)
            prec = lambda R: R / dg[:, None, None]
        tol = eng.pcg_tol
        u3, _ = _chunk_pcg_raw(
            matvec, prec, b[:, None, None], tol, eng.pcg_maxiter
        )
        u = u3[:, 0, 0]

    # expand to the full periodic node set
    red = np.asarray(eng.pmap.reduced_index)
    comp = np.arange(bs)
    idx = (red[:, None] * bs + comp[None, :]).reshape(-1)
    return u[jnp.asarray(idx)]
