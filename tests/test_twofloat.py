"""Double-float32 macro assembly (ops/twofloat.py).

The TPU runs the f64 direct-path macro assembly in (hi, lo) f32 pairs;
these tests pin the error-free transforms bit-for-bit against native f64
and the full df assembly chain against the true-f64 chain on the
golden-beam configuration — the exact program the TPU traces, executed on
CPU (the df path is plain jnp and backend-agnostic).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu.ops import twofloat as tf


def _rand(n, lo=-1e3, hi=1e3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.uniform(lo, hi, size=n).astype(np.float32), dtype=jnp.float32
    )


def test_two_sum_exact():
    a, b = _rand(4096, seed=1), _rand(4096, seed=2) * 1e-4
    s, e = jax.jit(tf.two_sum)(a, b)
    # f64 represents any sum of two f32 exactly
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    want = a.astype(jnp.float64) + b.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_two_prod_exact():
    a, b = _rand(4096, seed=3), _rand(4096, seed=4)
    p, e = jax.jit(tf.two_prod)(a, b)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    # product of two f32 (24-bit) values is exact in f64 (48 < 53 bits)
    want = a.astype(jnp.float64) * b.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_df_roundtrip_and_mul():
    rng = np.random.default_rng(5)
    x64 = jnp.asarray(rng.uniform(-10, 10, 2048), dtype=jnp.float64)
    y64 = jnp.asarray(rng.uniform(-10, 10, 2048), dtype=jnp.float64)
    dx, dy = tf.df_from_f64(x64), tf.df_from_f64(y64)
    # representation error ≤ 2^-49 relative
    np.testing.assert_allclose(
        np.asarray(tf.df_to_f64(dx)), np.asarray(x64), rtol=2**-48, atol=0
    )
    # df error is relative to OPERAND magnitudes (2^-48 · |x||y|), not to
    # the (possibly cancelled) result
    prod = np.asarray(tf.df_to_f64(jax.jit(tf.df_mul)(dx, dy)))
    bound = np.abs(np.asarray(x64)) * np.abs(np.asarray(y64)) * 2.0**-46
    assert np.all(np.abs(prod - np.asarray(x64 * y64)) <= bound + 1e-300)
    tot = np.asarray(tf.df_to_f64(jax.jit(tf.df_add)(dx, dy)))
    bound = (np.abs(np.asarray(x64)) + np.abs(np.asarray(y64))) * 2.0**-46
    assert np.all(np.abs(tot - np.asarray(x64 + y64)) <= bound + 1e-300)


def _beam_system():
    """Tiny rotated-fiber beam macro system (golden-test configuration)."""
    from hommx_tpu import (
        LinearElasticityStratifiedHMM,
        create_box,
        create_unit_cube,
        dirichletbc,
    )
    from hommx_tpu.ops.function_space import boundary_dofs
    from hommx_tpu.utils.validation import hooke_tensor

    L, W = 1.0, 0.4

    def circ(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < ((2 * jnp.pi) ** 2 / 16)

    mu = lambda x, y: jnp.where(circ(y[1], y[2]), 100.0, 0.001)
    A = hooke_tensor(3, mu, lambda x, y: 1.0)

    def Dtheta(x):
        gamma = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(gamma), jnp.sin(gamma)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    hmm = LinearElasticityStratifiedHMM(
        create_box([[0, 0, 0], [L, W, 0.1]], [5, 2, 2]),
        A,
        lambda x: jnp.array([0.0, 0.0, -0.008]),
        create_unit_cube(3),
        2**-5,
        Dtheta,
    )
    V = hmm.function_space
    hmm.set_boundary_conditions(
        dirichletbc(np.zeros(3), boundary_dofs(V, lambda x: np.isclose(x[0], 0)), V)
    )
    return hmm


def test_df_assembly_matches_f64_chain():
    """df-assembled system ≡ f64-assembled system to ~2^-48 on the beam."""
    from hommx_tpu.models.common import assemble_macro_system, merge_bcs

    hmm = _beam_system()
    A_star = hmm.homogenized_tensors()
    sys = hmm._sys
    mask, bvals = merge_bcs(hmm._bcs, hmm._V_macro.num_dofs, jnp.float64)
    b = hmm._b_load if hmm._b_load is not None else None
    if b is None:
        hmm.solve()
        b = hmm._b_load
    os.environ["HOMMX_MACRO_ASSEMBLY"] = "df"
    try:
        sys._gather_asm = False  # rebuild the lazy table under the env
        vals_df, b_df = assemble_macro_system(
            sys, A_star, b, mask, bvals, bs=3, macro_f64=True
        )
        assert sys.gather_asm is not None  # df path actually taken
    finally:
        os.environ.pop("HOMMX_MACRO_ASSEMBLY")
        sys._gather_asm = False
    vals_64, b_64 = assemble_macro_system(
        sys, A_star, b, mask, bvals, bs=3, macro_f64=True
    )
    ref = float(jnp.max(jnp.abs(vals_64)))
    err = float(jnp.max(jnp.abs(vals_df - vals_64)))
    assert err <= 2**-44 * ref, (err, ref)
    err_b = float(jnp.max(jnp.abs(b_df - b_64)))
    ref_b = float(jnp.max(jnp.abs(b_64))) + 1e-300
    assert err_b <= 1e-10 * ref_b, (err_b, ref_b)


def test_df_end_to_end_beam_solution():
    """Full beam solve with the df macro assembly matches the f64 solve."""
    u64 = np.asarray(_beam_system().solve().array)
    os.environ["HOMMX_MACRO_ASSEMBLY"] = "df"
    try:
        u_df = np.asarray(_beam_system().solve().array)
    finally:
        os.environ.pop("HOMMX_MACRO_ASSEMBLY")
    scale = np.max(np.abs(u64))
    assert np.max(np.abs(u_df - u64)) <= 1e-8 * scale


def test_df_scalar_path_matches():
    """Scalar (bs=1) df assembly against f64 on a Poisson direct solve."""
    from hommx_tpu import PoissonHMM, create_unit_square

    def make():
        return PoissonHMM(
            create_unit_square(8, 8),
            lambda x, y: 1.0 + 0.5 * jnp.sin(2 * jnp.pi * y[0]) + x[0],
            lambda x: 1.0,
            create_unit_square(8, 8),
            0.1 / 8,
        )

    u64 = np.asarray(make().solve().array)
    os.environ["HOMMX_MACRO_ASSEMBLY"] = "df"
    try:
        u_df = np.asarray(make().solve().array)
    finally:
        os.environ.pop("HOMMX_MACRO_ASSEMBLY")
    np.testing.assert_allclose(u_df, u64, rtol=0, atol=1e-9 * np.max(np.abs(u64)))


def test_df_unstructured_ell_fallback():
    """apply_dirichlet_df's ELL (dia=None) branch matches the DIA branch."""
    from hommx_tpu.models.common import merge_bcs

    hmm = _beam_system()
    hmm.solve()
    sys = hmm._sys
    A_star = hmm.homogenized_tensors()
    mask, bvals = merge_bcs(hmm._bcs, hmm._V_macro.num_dofs, jnp.float64)
    from hommx_tpu.ops.assembly import build_gather_assembly

    gather = build_gather_assembly(sys.pattern)
    P_df = tf.df_from_f64(sys.strain_P64)
    v_df = tf.df_from_f64(sys.vols64)
    S_df = tf.sloc_einsum_df(v_df, P_df, jnp.swapaxes(A_star, -1, -2))
    vals_df = tf.assemble_gather_df(S_df, gather)
    b64 = hmm._b_load.astype(jnp.float64)
    out_dia = tf.apply_dirichlet_df(
        vals_df, sys.cols, sys.diag_slots, b64, mask,
        bvals.astype(jnp.float64), dia=sys.dia,
    )
    out_ell = tf.apply_dirichlet_df(
        vals_df, sys.cols, sys.diag_slots, b64, mask,
        bvals.astype(jnp.float64), dia=None,
    )
    np.testing.assert_allclose(
        np.asarray(tf.df_to_f64(out_dia[0])),
        np.asarray(tf.df_to_f64(out_ell[0])),
        rtol=0, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(out_dia[1]), np.asarray(out_ell[1]), rtol=0, atol=1e-11
    )
