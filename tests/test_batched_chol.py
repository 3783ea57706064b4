"""Hand-blocked batched Cholesky (ops/batched_chol.py) — the TPU f32
elasticity factorization backend (4× over XLA's cho_factor/cho_solve on
the rotated-fiber batch; see benchmarks/batched_chol_kernel.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hommx_tpu.ops.batched_chol import blocked_solve_spd


def _spd_batch(C, n, dtype, seed=0, cond=1.0):
    r = np.random.default_rng(seed)
    G = r.standard_normal((C, n, n))
    K = np.einsum("cik,cjk->cij", G, G) / n + np.eye(n)
    if cond != 1.0:
        s = np.exp(np.linspace(0, np.log(cond), n))
        K = K * s[None, :, None] * s[None, None, :]
    return jnp.asarray(K, dtype)


@pytest.mark.parametrize("n", [32, 64, 192])
def test_blocked_solve_matches_direct_f64(n):
    C, s = 7, 5
    K = _spd_batch(C, n, jnp.float64, seed=n)
    B = jnp.asarray(
        np.random.default_rng(1).standard_normal((C, n, s)), jnp.float64
    )
    X = blocked_solve_spd(K, B)
    X_ref = jnp.linalg.solve(K, B)
    assert float(jnp.max(jnp.abs(X - X_ref))) < 1e-10 * float(
        jnp.max(jnp.abs(X_ref))
    )


@pytest.mark.parametrize("n", [20, 40, 100])
def test_blocked_solve_padding(n):
    """n not a multiple of the 32 block: identity padding must be exact."""
    C, s = 3, 2
    K = _spd_batch(C, n, jnp.float64, seed=n)
    B = jnp.asarray(
        np.random.default_rng(2).standard_normal((C, n, s)), jnp.float64
    )
    X = blocked_solve_spd(K, B)
    X_ref = jnp.linalg.solve(K, B)
    assert float(jnp.max(jnp.abs(X - X_ref))) < 1e-10 * float(
        jnp.max(jnp.abs(X_ref))
    )


def test_blocked_solve_illconditioned():
    """Graded diagonal (cond ~1e6): stays accurate in f64, consistent with
    the equilibrate-then-refine usage in the engine."""
    C, n, s = 4, 96, 3
    K = _spd_batch(C, n, jnp.float64, seed=9, cond=1e3)  # κ ~ 1e6
    B = jnp.asarray(
        np.random.default_rng(3).standard_normal((C, n, s)), jnp.float64
    )
    X = blocked_solve_spd(K, B)
    R = B - jnp.einsum("cnm,cms->cns", K, X)
    assert float(jnp.max(jnp.abs(R))) < 1e-7 * float(jnp.max(jnp.abs(B)))


def test_blocked_solve_differentiable():
    """The factorization is plain jnp primitives — jax.grad must flow
    (the engine's elasticity path relies on it, like cho_solve's rules)."""
    C, n, s = 2, 32, 1
    K0 = _spd_batch(C, n, jnp.float64, seed=5)
    B = jnp.asarray(
        np.random.default_rng(4).standard_normal((C, n, s)), jnp.float64
    )

    def loss(t):
        K = K0 + t * jnp.eye(n, dtype=jnp.float64)
        return jnp.sum(blocked_solve_spd(K, B) ** 2)

    g = jax.grad(loss)(0.0)
    eps = 1e-5
    fd = (loss(eps) - loss(-eps)) / (2 * eps)
    assert abs(float(g) - float(fd)) < 1e-5 * max(abs(float(fd)), 1.0)


def test_engine_blocked_backend_matches_xla():
    """Engine-level: the f32 chunk-Cholesky route with chol_backend
    'blocked' vs 'xla' on the stratified elasticity workload — identical
    physics, ~f32-level agreement."""
    import hommx_tpu as hx
    from hommx_tpu.micro.engine import MicroEngine
    from hommx_tpu.utils.validation import hooke_tensor

    A_el = hooke_tensor(
        2, lambda x, y: jnp.where(y[0] < 0.5, 10.0, 0.1), lambda x, y: 1.0
    )

    def Dt(x):
        g = 0.7 * x[1]
        c, s = jnp.cos(g), jnp.sin(g)
        return jnp.array([[c, s], [-s, c]]).T

    micro = hx.create_unit_square(6)
    centers = jnp.asarray(
        np.random.default_rng(6).uniform(0.1, 0.9, size=(24, 2)), jnp.float32
    )
    outs = {}
    for backend in ("xla", "blocked"):
        eng = MicroEngine(
            micro, bs=2, coeff_kind="tensor4", quad_degree=1,
            dtype=jnp.float32, chol_backend=backend,
        )
        assert eng.solver == "cholesky"
        outs[backend] = np.asarray(
            eng.tensors_for_centers(A_el, centers, G_fn=Dt)
        )
    scale = np.abs(outs["xla"]).max()
    assert np.abs(outs["blocked"] - outs["xla"]).max() < 1e-5 * scale
