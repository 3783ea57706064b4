"""Linear solvers: preconditioned CG on ELL SpMV, dense direct fallback.

Replaces PETSc KSP/PC (reference ``hmm.py:153-168,482-488``).  The macro
systems produced by HMM are SPD after symmetric Dirichlet lifting, so
Jacobi-preconditioned CG covers the iterative path; small systems (the usual
HMM macro meshes — the whole point of HMM is a *coarse* macro mesh) take a
dense Cholesky, which stands in for the reference's LU/MUMPS configurations
(``test_integration_poisson.py:207-212``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hommx_tpu.ops.sparse import ell_to_dense, spmv

__all__ = [
    "cg_ell",
    "dense_solve_ell",
    "solve_ell",
    "cg_matfree",
    "pcg_prec",
    "make_implicit_solver",
    "implicit_wrap",
]


@partial(jax.jit, static_argnames=("maxiter",))
def cg_ell(vals, cols, b, x0=None, atol=1e-12, rtol=1e-12, maxiter=10000):
    """Jacobi-preconditioned conjugate gradients on an ELL matrix.

    Returns (x, iterations, final residual norm).  Convergence flag mirrors
    the reference's ``KSP.getConvergedReason()`` check (``hmm.py:485-488``):
    ``iters < maxiter`` means converged.
    """
    matvec = lambda v: spmv(vals, cols, v)
    return cg_matfree(matvec, _ell_diag(vals, cols), b, x0, atol, rtol, maxiter)


def _ell_diag(vals, cols):
    N, K = cols.shape
    rows = jnp.broadcast_to(jnp.arange(N)[:, None], (N, K))
    isdiag = (cols == rows).astype(vals.dtype)
    return jnp.sum(vals.reshape(N, K) * isdiag, axis=1)


def cg_matfree(matvec, diag, b, x0=None, atol=1e-12, rtol=1e-12, maxiter=10000):
    """Matrix-free PCG with Jacobi preconditioner ``diag``."""
    dinv = jnp.where(jnp.abs(diag) > 0, 1.0 / diag, 1.0)
    return pcg_prec(matvec, lambda r: dinv * r, b, x0, atol, rtol, maxiter)


def pcg_prec(matvec, prec, b, x0=None, atol=1e-12, rtol=1e-12, maxiter=10000):
    """Matrix-free PCG with an arbitrary SPD preconditioner callable
    ``prec(r) -> z`` (Jacobi diag, multigrid V-cycle, ...)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = prec(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(atol, rtol * bnorm)

    def cond(state):
        x, r, p, rz, k = state
        return jnp.logical_and(jnp.linalg.norm(r) > tol, k < maxiter)

    def body(state):
        x, r, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, r, p, rz, k = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))
    return x, k, jnp.linalg.norm(r)


def _dense_solve_f64(A, b64):
    """f64-accurate dense SPD solve (native-f64 backends; the TPU path
    goes through :func:`_mixed_refine_ell` instead)."""
    A = 0.5 * (A + A.T)
    c, low = jax.scipy.linalg.cho_factor(A)
    return jax.scipy.linalg.cho_solve((c, low), b64)


def _mixed_refine_ell(
    vals, cols, b, max_sweeps=200, factor_backend=None, dia=None
):
    """f64-accurate SPD solve by f32 factorization + f64 PCG refinement.

    The TPU has no native f64 Cholesky (emulation is ~4× slower than this
    whole routine), so: equilibrate, factorize ONE f32 dense copy, then
    polish in f64 with residuals from the ELL gather-SpMV.  Three
    TPU-specific choices over the textbook refinement loop:

    - The correction applies an EXPLICIT inverse (one multi-RHS
      triangular-solve pair at factorization time) instead of per-sweep
      ``cho_solve`` calls: a single-RHS triangular solve on TPU is a
      latency-bound sequential substitution, while the n-RHS solve is
      blocked onto the MXU and each sweep's correction becomes one
      (n,n)·(n,) f32 matvec.
    - The polish loop is PCG (preconditioner = the symmetrized f32
      inverse), not Richardson: Richardson refinement requires the
      contraction κ(equilibrated)·eps_f32 < 1 and silently DIVERGES on
      e.g. thin-beam elasticity with sharp 1e4 stiffness contrast, while
      PCG converges whenever the preconditioned spectrum is merely
      bounded.  Same per-sweep cost (one f64 SpMV + one f32 matvec).
      The factorization carries a δ = 4e-6·Gershgorin diagonal shift:
      beyond κ(equilibrated) ≈ 1/eps_f32 the f32 CAST of the matrix is
      indefinite and the unshifted factorization breaks down (measured on
      a κ=3.8e9 beam: garbage at 1.4e-3 relative error); the shift keeps
      the factorization SPD and PCG absorbs the perturbation (82 → 64
      sweeps measured with δ between 1e-6 and 4e-6·gersh, f64-limit
      accuracy).  For well-conditioned systems the shift costs at most a
      couple of extra sweeps, which the early exit claws back.
    - The loop is a device-side while_loop that exits at 1e-13 relative
      residual instead of a fixed sweep count: well-conditioned systems
      stop in a few sweeps, ill-conditioned ones run to ``max_sweeps``.

    Backend-agnostic by construction (plain jnp) so CPU tests can verify
    the exact program the TPU runs.

    ``factor_backend`` selects how the f32 factorization runs: ``"xla"``
    (cho_factor + explicit inverse via one multi-RHS triangular solve) or
    ``"scan"`` (the fixed-shape scan-blocked factorization of
    ops/batched_chol.py, correction applied by blocked substitution
    matmuls — no n² inverse).  Default from ``HOMMX_MACRO_FACTOR``
    (trace-time), falling back to ``"xla"``.
    """
    if factor_backend is None:
        import os

        factor_backend = os.environ.get("HOMMX_MACRO_FACTOR", "xla")
    vals64 = vals.astype(jnp.float64)
    b64 = b.astype(jnp.float64)
    A32 = ell_to_dense(vals.astype(jnp.float32), cols)
    A32 = 0.5 * (A32 + A32.T)
    diag = _ell_diag(vals64, cols)
    sc64 = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-300))
    sc32 = sc64.astype(jnp.float32)
    As = sc32[:, None] * A32 * sc32[None, :]
    gersh = jnp.max(jnp.sum(jnp.abs(As), axis=1))
    As = As + (4e-6 * gersh) * jnp.eye(As.shape[0], dtype=As.dtype)
    n = b.shape[0]
    if factor_backend == "scan":
        from hommx_tpu.ops.batched_chol import (
            scan_blocked_cholesky,
            scan_blocked_solve,
        )

        nb = 64
        n_pad = (-n) % nb
        if n_pad:
            Ap = jnp.eye(n + n_pad, dtype=As.dtype)
            Ap = Ap.at[:n, :n].set(As)
        else:
            Ap = As
        panels, dinvs = scan_blocked_cholesky(Ap, nb=nb)

        def prec(r):
            r32 = (sc64 * r).astype(jnp.float32)
            if n_pad:
                r32 = jnp.concatenate(
                    [r32, jnp.zeros((n_pad,), jnp.float32)]
                )
            z = scan_blocked_solve(panels, dinvs, r32[:, None])[:n, 0]
            return sc64 * z.astype(jnp.float64)

    else:
        c32 = jax.scipy.linalg.cho_factor(As)
        Minv = jax.scipy.linalg.cho_solve(
            c32, jnp.eye(n, dtype=jnp.float32)
        )
        Minv = 0.5 * (Minv + Minv.T)  # PCG needs an SPD preconditioner

        def prec(r):
            return sc64 * (Minv @ (sc64 * r).astype(jnp.float32)).astype(
                jnp.float64
            )

    tol = 1e-13 * jnp.linalg.norm(b64)

    # the refinement residual SpMV: DIA shifted multiply-adds when the
    # sparsity has a DIA view (structured meshes) — no f64 gather per
    # sweep, the same reason the CG path prefers DIA (ops/dia.py)
    if dia is not None:
        from hommx_tpu.ops.dia import dia_spmv, ell_vals_to_dia

        dvals64 = ell_vals_to_dia(dia, vals64)
        matvec = lambda v: dia_spmv(dvals64, dia.offsets, v)
    else:
        matvec = lambda v: spmv(vals64, cols, v)
    r0 = b64
    z0 = prec(r0)
    rz0 = jnp.vdot(r0, z0)

    def cond(state):
        x, r, p, rz, rn, k = state
        ok = jnp.logical_and(rn > tol, k < max_sweeps)
        return jnp.logical_and(ok, rz > 0.0)  # breakdown = f64 limit hit

    def body(state):
        x, r, p, rz, rn, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, p, rz_new, jnp.linalg.norm(r), k + 1

    x, _, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros_like(b64), r0, z0, rz0, jnp.linalg.norm(r0),
         jnp.array(0)),
    )
    return x


def dense_solve_ell(vals, cols, b, dia=None):
    """Dense direct solve of the ELL system (small macro systems).

    Runs in f64 regardless of the pipeline dtype when x64 is enabled:
    f32 Cholesky breaks down (NaN) beyond condition ~1e7, which thin-beam
    elasticity with high-contrast homogenized tensors reaches easily.  The
    system is small (direct path is size-capped), so the upcast is cheap;
    symmetrization guards against assembly asymmetry noise exceeding
    the smallest eigenvalues.

    On TPU (f64 emulated) this is mixed-precision iterative refinement —
    see :func:`_mixed_refine_ell` (the emulated-f64 dense matrix is never
    materialized; sweep residuals come from the DIA shifted-madds SpMV
    when ``dia`` is given, else the ELL gather-SpMV — either way N·K
    values, ~12× less memory traffic per sweep than a dense f64 matvec).

    Not jitted itself (``dia`` is a static host object): every production
    call site sits inside a model-level jit, which inlines it.
    """
    dt = b.dtype
    if jax.config.jax_enable_x64:
        if jax.default_backend() in ("tpu", "axon"):
            return _mixed_refine_ell(vals, cols, b, dia=dia).astype(dt)
        A = ell_to_dense(vals.astype(jnp.float64), cols)
        x = _dense_solve_f64(A, b.astype(jnp.float64))
        return x.astype(dt)
    A = ell_to_dense(vals, cols)
    A = 0.5 * (A + A.T)
    c, low = jax.scipy.linalg.cho_factor(A)
    return jax.scipy.linalg.cho_solve((c, low), b)


def make_implicit_solver(cols, options, dia=None, mg=None, amg=None):
    """Differentiable macro solve via the implicit function theorem.

    The iterative paths (CG while_loop) are not reverse-mode
    differentiable by unrolling, and unrolling would be the wrong
    derivative anyway; the implicit rule is exact at convergence: with
    A x = b and A symmetric,

        ∂L/∂b    = λ,            A λ = ∂L/∂x   (one extra solve, same
                                               solver/preconditioner)
        ∂L/∂a_k  = −λ_i x_j      for ELL slot k holding entry (i, j).

    This is what makes ``BaseHMM.build_pipeline`` differentiable
    end-to-end through the macro CG — a capability the reference
    architecture cannot express (its solve is a PETSc KSP call).

    Returns a function ``solve(vals, b) -> x`` with the custom VJP
    attached; the static assembly context (cols/options/dia/mg) is closed
    over.
    """
    return implicit_wrap(
        lambda vals, b: solve_ell(
            vals, cols, b, options, dia=dia, mg=mg, amg=amg
        )[0],
        cols,
    )


def implicit_wrap(solve_fn, cols):
    """Attach the implicit-function-theorem VJP (see make_implicit_solver)
    to an arbitrary symmetric ELL solve ``solve_fn(vals, b) -> x`` — e.g.
    the row-sharded psum-CG (parallel/macro.py), whose while_loop has no
    reverse rule of its own.  The adjoint solve reuses ``solve_fn``, so a
    sharded forward gets a sharded backward."""

    @jax.custom_vjp
    def solve(vals, b):
        return solve_fn(vals, b)

    def fwd(vals, b):
        x = solve_fn(vals, b)
        return x, (vals, x)

    def bwd(residuals, xbar):
        vals, x = residuals
        lam = solve_fn(vals, xbar)  # A symmetric ⇒ adjoint = same solve
        vbar = -(lam[:, None] * x[jnp.asarray(cols)]).reshape(vals.shape)
        return vbar, lam

    solve.defvjp(fwd, bwd)
    return solve


def _prec_in_f32(dtype) -> bool:
    """Whether an f64 Krylov loop should apply its V-cycle preconditioner
    in f32.

    Preconditioner precision changes only the ITERATION COUNT of PCG, never
    the attainable accuracy (the residual/solution recursions stay f64);
    the cast preconditioner is still a fixed SPD linear operator, so PCG
    theory applies unchanged.  On TPU — where f64 arithmetic is emulated at
    ~10× cost — this makes the f64 macro path for at-scale elasticity
    (κ~1e7 systems above ``direct_threshold``) pay f64 only for the cheap
    SpMV + vector updates while the smoothing/coarse-grid work runs at
    native f32 speed.  Native-f64 backends (CPU) keep the f64 V-cycle.

    ``HOMMX_MG_PREC`` (trace-time): ``"f32"`` forces the cast (CPU tests
    verify the exact mixed program the TPU runs), ``"native"`` disables it.
    """
    import os

    if dtype != jnp.float64:
        return False
    mode = os.environ.get("HOMMX_MG_PREC", "auto")
    if mode == "f32":
        return True
    if mode == "native":
        return False
    return jax.default_backend() in ("tpu", "axon")


def solve_ell(vals, cols, b, options, dia=None, mg=None, amg=None):
    """Dispatch on SolverOptions: 'direct', 'cg', or 'auto'.

    With a DIAPattern (``dia``), the CG matvec runs in diagonal format —
    the Pallas kernel on TPU, the XLA shift formulation elsewhere
    (ops/dia.py) — instead of the gather-based ELL SpMV.  With an
    MGStructure (``mg``, structured meshes) and ``options.pc`` 'auto'/'mg',
    CG is preconditioned by the geometric-multigrid V-cycle
    (ops/multigrid.py); unstructured/P2 systems take the aggregation-AMG
    V-cycle instead when ``amg`` is given (ops/amg.py).  Together these
    stand in for the reference's GAMG configurations
    (``examples/linear_elasticity/rotated_fibers.py:98``).
    """
    method = options.method
    if method == "auto":
        method = "direct" if b.shape[0] <= options.direct_threshold else "cg"
    if method == "direct":
        x = dense_solve_ell(vals, cols, b, dia=dia)
        return x, jnp.array(0), jnp.array(0.0, dtype=b.dtype)
    if mg is None and amg is not None and options.pc in ("auto", "mg"):
        from hommx_tpu.ops.amg import amg_setup, amg_vcycle

        matvec = lambda v: spmv(vals, cols, v)
        if _prec_in_f32(b.dtype):
            state = amg_setup(
                amg, vals.astype(jnp.float32), f32_bottom_guard=True
            )
            prec = lambda r: amg_vcycle(
                amg, state, r.astype(jnp.float32)
            ).astype(b.dtype)
        else:
            state = amg_setup(amg, vals)
            prec = lambda r: amg_vcycle(amg, state, r)
        return pcg_prec(
            matvec,
            prec,
            b,
            atol=options.atol,
            rtol=options.rtol,
            maxiter=options.maxiter,
        )
    if dia is not None:
        from hommx_tpu.ops.dia import dia_spmv, dia_spmv_pallas, ell_vals_to_dia

        dvals = ell_vals_to_dia(dia, vals)
        # The Pallas DIA kernel drives the CG matvec on TPU (f32, systems
        # large enough to amortize the block grid): measured 22% faster
        # end-to-end than the XLA shift formulation at 512² (151 vs 195 ms,
        # identical iterates).  Round 1 could not nest pallas_call in
        # lax.while_loop on the axon remote compiler; that now works (only
        # fori_loop still stalls), so the kernel is the production path.
        # CPU/f64 and small systems keep the XLA shifts.
        use_pallas = (
            jax.default_backend() in ("tpu", "axon")
            and b.dtype == jnp.float32
            and b.shape[0] >= 4096
        )
        if use_pallas:
            matvec = lambda v: dia_spmv_pallas(dvals, dia.offsets, v)
        else:
            matvec = lambda v: dia_spmv(dvals, dia.offsets, v)
        if mg is not None and options.pc in ("auto", "mg"):
            from hommx_tpu.ops.multigrid import mg_setup, mg_vcycle

            if _prec_in_f32(b.dtype):
                state = mg_setup(
                    mg, dvals.astype(jnp.float32), f32_bottom_guard=True
                )
                prec = lambda r: mg_vcycle(
                    mg, state, r.astype(jnp.float32)
                ).astype(b.dtype)
            else:
                state = mg_setup(mg, dvals)
                prec = lambda r: mg_vcycle(mg, state, r)
            return pcg_prec(
                matvec,
                prec,
                b,
                atol=options.atol,
                rtol=options.rtol,
                maxiter=options.maxiter,
            )
        return cg_matfree(
            matvec,
            _ell_diag(vals, cols),
            b,
            atol=options.atol,
            rtol=options.rtol,
            maxiter=options.maxiter,
        )
    return cg_ell(
        vals,
        cols,
        b,
        atol=options.atol,
        rtol=options.rtol,
        maxiter=options.maxiter,
    )
