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
    """f64-accurate dense SPD solve.

    On TPU (f64 emulated, Cholesky slow) this runs mixed-precision
    iterative refinement: equilibrate, factorize once in f32, then refine
    with f64 residuals — each sweep contracts the error by
    κ(equilibrated)·eps_f32, so a handful of sweeps reach the same ~1e-8
    level the emulated-f64 factorization delivers, at ~4× less time
    (measured 284 → 67 ms on the 3087-dof beam system).  Elsewhere (native
    f64) it is a plain Cholesky.
    """
    A = 0.5 * (A + A.T)
    if jax.default_backend() in ("tpu", "axon"):
        sc = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(A), 1e-300))
        As = sc[:, None] * A * sc[None, :]
        c32 = jax.scipy.linalg.cho_factor(As.astype(jnp.float32))

        def body(x, _):
            r = b64 - A @ x
            dz = jax.scipy.linalg.cho_solve(c32, (sc * r).astype(jnp.float32))
            return x + sc * dz.astype(jnp.float64), None

        x, _ = jax.lax.scan(body, jnp.zeros_like(b64), None, length=8)
        return x
    c, low = jax.scipy.linalg.cho_factor(A)
    return jax.scipy.linalg.cho_solve((c, low), b64)


@jax.jit
def dense_solve_ell(vals, cols, b):
    """Dense direct solve of the ELL system (small macro systems).

    Runs in f64 regardless of the pipeline dtype when x64 is enabled:
    f32 Cholesky breaks down (NaN) beyond condition ~1e7, which thin-beam
    elasticity with high-contrast homogenized tensors reaches easily.  The
    system is small (direct path is size-capped), so the upcast is cheap;
    symmetrization guards against assembly asymmetry noise exceeding
    the smallest eigenvalues.

    On TPU (f64 emulated) this is mixed-precision iterative refinement:
    equilibrate + factorize ONE f32 dense copy (the emulated-f64 dense
    matrix is never materialized — building it was an O(N²) f64 scatter
    costing more than the factorization), then refine with f64 residuals
    computed by the ELL gather-SpMV (N·K values, ~12× less memory traffic
    per sweep than a dense f64 matvec).  Each sweep contracts the error by
    κ(equilibrated)·eps_f32, so a handful of sweeps reach the ~1e-8 level
    of an emulated-f64 factorization at a fraction of its time.
    """
    dt = b.dtype
    if jax.config.jax_enable_x64:
        if jax.default_backend() in ("tpu", "axon"):
            vals64 = vals.astype(jnp.float64)
            b64 = b.astype(jnp.float64)
            A32 = ell_to_dense(vals.astype(jnp.float32), cols)
            A32 = 0.5 * (A32 + A32.T)
            diag = _ell_diag(vals64, cols)
            sc64 = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-300))
            sc32 = sc64.astype(jnp.float32)
            As = sc32[:, None] * A32 * sc32[None, :]
            c32 = jax.scipy.linalg.cho_factor(As)

            def body(x, _):
                r = b64 - spmv(vals64, cols, x)
                dz = jax.scipy.linalg.cho_solve(c32, (sc64 * r).astype(jnp.float32))
                return x + sc64 * dz.astype(jnp.float64), None

            x, _ = jax.lax.scan(body, jnp.zeros_like(b64), None, length=8)
            return x.astype(dt)
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
        x = dense_solve_ell(vals, cols, b)
        return x, jnp.array(0), jnp.array(0.0, dtype=b.dtype)
    if mg is None and amg is not None and options.pc in ("auto", "mg"):
        from hommx_tpu.ops.amg import amg_setup, amg_vcycle

        matvec = lambda v: spmv(vals, cols, v)
        state = amg_setup(amg, vals)
        return pcg_prec(
            matvec,
            lambda r: amg_vcycle(amg, state, r),
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

            state = mg_setup(mg, dvals)
            return pcg_prec(
                matvec,
                lambda r: mg_vcycle(mg, state, r),
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
