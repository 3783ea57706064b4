"""Cross-strategy consistency sweep: every micro-engine configuration must
produce the same homogenized tensors as the f64 direct (Cholesky) solver.
One deterministic sweep over {dim} x {bs} x {micro_degree} x {strategy,
preconditioner, scaling, rank} catches interaction bugs the per-feature
tests cannot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import create_unit_cube, create_unit_square
from hommx_tpu.micro.engine import MicroEngine
from tests.utils import hooke_tensor


def _coeff(dim, kind):
    if kind == "scalar":
        return lambda x, y: 1.5 + x[0] + jnp.sin(2 * jnp.pi * y[0]) * 0.8
    return hooke_tensor(
        dim, lambda x, y: 1.0 + 0.5 * jnp.sin(2 * jnp.pi * y[0]), lambda x, y: 1.0
    )


CASES = [
    # (dim, bs, kind, micro_degree, engine_kwargs)
    (2, 1, "scalar", 1, dict(solver="pcg")),
    (2, 1, "scalar", 1, dict(solver="pcg", diag_scale=False)),
    (2, 1, "scalar", 1, dict(solver="pcg", coeff_rank=2)),
    (2, 1, "scalar", 1, dict(solver="pcg", cell_prec="fft")),
    (2, 1, "scalar", 1, dict(solver="pcg", coeff_rank=2, cell_prec="fft")),
    (2, 1, "scalar", 2, dict(solver="pcg")),
    (2, 2, "tensor4", 1, dict(solver="pcg")),
    (2, 2, "tensor4", 2, dict(solver="pcg")),
    (3, 1, "scalar", 1, dict(solver="pcg")),
    (3, 1, "scalar", 1, dict(solver="pcg", cell_prec="fft")),
    (3, 3, "tensor4", 1, dict(solver="pcg")),
]


@pytest.mark.parametrize("dim,bs,kind,deg,kw", CASES)
def test_strategy_matches_direct(dim, bs, kind, deg, kw):
    mesh = create_unit_square(8, 8) if dim == 2 else create_unit_cube(3)
    A = _coeff(dim, kind)
    centers = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (12, dim)))
    ref_eng = MicroEngine(
        mesh, bs=bs, coeff_kind=kind, dtype=jnp.float64, micro_degree=deg
    )  # auto -> cholesky at f64
    ref = np.asarray(ref_eng.tensors_for_centers(A, centers))
    eng = MicroEngine(
        mesh, bs=bs, coeff_kind=kind, dtype=jnp.float64, micro_degree=deg, **kw
    )
    out = np.asarray(eng.tensors_for_centers(A, centers))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-8, (kw, err)


@pytest.mark.parametrize("dim,bs,kind,deg,kw", CASES)
def test_strategy_f32_close_to_f64(dim, bs, kind, deg, kw):
    """The same sweep at f32 must land within the documented tolerance."""
    mesh = create_unit_square(8, 8) if dim == 2 else create_unit_cube(3)
    A = _coeff(dim, kind)
    centers64 = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (12, dim)))
    ref_eng = MicroEngine(
        mesh, bs=bs, coeff_kind=kind, dtype=jnp.float64, micro_degree=deg
    )
    ref = np.asarray(ref_eng.tensors_for_centers(A, centers64))
    eng = MicroEngine(
        mesh, bs=bs, coeff_kind=kind, dtype=jnp.float32, micro_degree=deg, **kw
    )
    out = np.asarray(
        eng.tensors_for_centers(A, centers64.astype(jnp.float32))
    )
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 5e-4, (kw, err)


def test_chunk_cholesky_elasticity_route():
    """Round 3: the f32 elasticity default routes through the chunk-level
    batched scaled Cholesky (engine.solver 'cholesky' + chunk machinery) —
    gate its accuracy against f64 on a contrast-1e5 rotated-fiber config
    and its Voigt expansion shapes (s solved = d(d+1)/2, output d²)."""
    from hommx_tpu.utils.validation import hooke_tensor

    def circle(a, b):
        da = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        db = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (da**2 + db**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(
        circle(y[1], y[2]), 100.0 * (1 + 0.001 * x[0]), 0.001
    )
    A_el = hooke_tensor(3, mu, lambda x, y: 1.0)

    def G_fn(x):
        g = 0.5 * jnp.pi * x[1] / 0.4
        c, s = jnp.cos(g), jnp.sin(g)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    mesh = create_unit_cube(4)
    centers = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (10, 3)))
    ref = MicroEngine(mesh, bs=3, coeff_kind="tensor4", dtype=jnp.float64)
    A64 = np.asarray(ref.tensors_for_centers(A_el, centers, G_fn=G_fn))
    eng = MicroEngine(mesh, bs=3, coeff_kind="tensor4", dtype=jnp.float32)
    assert eng.solver == "cholesky" and eng.assembly == "scatter"
    assert eng.s == 6 and eng.s_full == 9
    A32, X = eng.tensors_for_centers(
        A_el, centers.astype(jnp.float32), G_fn=G_fn, with_correctors=True
    )
    assert A32.shape == (10, 9, 9)
    assert X.shape == (10, eng.n_reduced, 9)
    err = np.abs(np.asarray(A32) - A64).max() / np.abs(A64).max()
    assert err < 5e-6, err
    # Voigt duplicate columns are exact duplicates after expansion
    Xn = np.asarray(X)
    assert np.array_equal(Xn[..., 1], Xn[..., 3])  # (0,1) == (1,0)


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 1e-13), (jnp.float32, 2e-6)])
def test_kc_gather_assembly_matches_scatter(monkeypatch, dtype, tol):
    """The TPU gather-table Kc assembly (HOMMX_KC_ASSEMBLY=gather, see
    MicroEngine._get_kc_gather) must reproduce the scatter assembly: the
    chunk dense-K / chunk-Cholesky routes produce the same homogenized
    tensors.  f64 pins near machine precision (only summation order
    differs); f32 allows rounding-order noise."""
    from hommx_tpu.utils.validation import hooke_tensor

    mu = lambda x, y: jnp.where(
        (y[0] - 0.5) ** 2 + (y[1] - 0.5) ** 2 < 0.09,
        50.0 * (1.0 + 0.2 * x[0]),
        0.5 + 0.3 * jnp.sin(2 * jnp.pi * y[1]),
    )
    A_el = hooke_tensor(2, mu, lambda x, y: 1.0)

    def G_fn(x):
        g = 0.4 * x[1]
        c, s = jnp.cos(g), jnp.sin(g)
        return jnp.array([[c, s], [-s, c]]).T

    mesh = create_unit_square(6, 6)
    centers = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (9, 2)), dtype=dtype
    )
    # chunk-Cholesky route needs f32; at f64 force the chunk dense-K PCG
    kw = (
        dict(solver="cholesky")
        if jnp.dtype(dtype) == jnp.float32
        else dict(solver="pcg", pcg_strategy="densek", cell_prec="fft")
    )

    def run(mode):
        monkeypatch.setenv("HOMMX_KC_ASSEMBLY", mode)
        eng = MicroEngine(
            mesh, bs=2, coeff_kind="tensor4", dtype=dtype, **kw
        )
        out = np.asarray(
            eng.tensors_for_centers(A_el, centers, G_fn=G_fn, chunk=9)
        )
        if mode == "gather":
            assert eng._kc_gather is not None  # path actually exercised
        return out

    scatter = run("scatter")
    gather = run("gather")
    err = np.abs(gather - scatter).max() / np.abs(scatter).max()
    assert err < tol, err


def test_kron_kc_assembly_matches_einsum_route():
    """The Kron fast-path Kc assembly (A_K never materialized; element
    blocks built as (C,nE,r²)·(C,r²,r²)·(nE,r²,nbl²) matmuls, see
    tensors_chunk_pcg) is an exact reassociation of the TᵀĀT einsum
    route.  cell_prec='fft' keeps A_K materialized (the symbol needs it),
    so fft vs default on the f64 densek PCG pins new route vs old to the
    solver tolerance."""
    from hommx_tpu.utils.validation import hooke_tensor

    mu = lambda x, y: jnp.where(
        (y[0] - 0.5) ** 2 + (y[1] - 0.5) ** 2 < 0.09,
        50.0 * (1.0 + 0.2 * x[0]),
        0.5 + 0.3 * jnp.sin(2 * jnp.pi * y[1]),
    )
    A_el = hooke_tensor(2, mu, lambda x, y: 1.0)

    def G_fn(x):
        g = 0.4 * x[1]
        c, s = jnp.cos(g), jnp.sin(g)
        return jnp.array([[c, s], [-s, c]]).T

    mesh = create_unit_square(6, 6)
    centers = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (8, 2)))

    def run(**kw):
        eng = MicroEngine(
            mesh, bs=2, coeff_kind="tensor4", dtype=jnp.float64,
            solver="pcg", pcg_strategy="densek", **kw
        )
        return np.asarray(
            eng.tensors_for_centers(A_el, centers, G_fn=G_fn, chunk=8)
        )

    kron = run()  # default prec: Kron path (A_K skipped)
    einsum_route = run(cell_prec="fft")  # fft symbol forces A_K
    err = np.abs(kron - einsum_route).max() / np.abs(einsum_route).max()
    assert err < 1e-8, err


def test_kron_map_cache_survives_retrace():
    """The cached Kron Gram map must follow the trace-local constant rule
    (numpy in the cache, jnp per trace): two DISTINCT jit traces on one
    engine would otherwise leak the first trace's tracer into the second
    (regression: caught by the phase profiler after the Kron path
    landed)."""
    from hommx_tpu.utils.validation import hooke_tensor

    A_el = hooke_tensor(2, lambda x, y: 1.0 + 0.5 * y[0], lambda x, y: 1.0)
    mesh = create_unit_square(4, 4)
    eng = MicroEngine(
        mesh, bs=2, coeff_kind="tensor4", dtype=jnp.float64,
        solver="pcg", pcg_strategy="densek",
    )
    centers = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (8, 2)))
    f1 = jax.jit(lambda c: eng.tensors_for_centers(A_el, c, chunk=4))
    f2 = jax.jit(lambda c: eng.tensors_for_centers(A_el, c, chunk=8))
    a = np.asarray(f1(centers))  # first trace populates the cache
    b = np.asarray(f2(centers))  # second trace must not see a tracer
    assert np.allclose(a, b, rtol=1e-10)


def test_astar_phi_optout_matches_bilinear(monkeypatch):
    """``HOMMX_ASTAR=phi`` (the cancellation-free diagnostic contraction,
    micro/engine.py::_bilinear_astar) must agree with the default bilinear
    expansion on the dense-K chunk route — in f64 the two are exact
    reassociations of Phi' Abar Phi, so they pin each other to solver
    tolerance.  Covers both the per-cell strain map (G_fn) and the plain
    route, so the phi branch's apply_map(B_Phi, .) composition stays
    exercised."""
    from hommx_tpu.utils.validation import hooke_tensor

    mu = lambda x, y: jnp.where(
        (y[0] - 0.5) ** 2 + (y[1] - 0.5) ** 2 < 0.09, 20.0, 0.5
    ) * (1.0 + 0.2 * x[0])
    A_el = hooke_tensor(2, mu, lambda x, y: 1.0)

    def G_fn(x):
        g = 0.3 * x[1]
        c, s = jnp.cos(g), jnp.sin(g)
        return jnp.array([[c, s], [-s, c]]).T

    mesh = create_unit_square(5, 5)
    centers = jnp.asarray(np.random.default_rng(11).uniform(0, 1, (6, 2)))

    def run(astar, **kw):
        monkeypatch.setenv("HOMMX_ASTAR", astar)
        eng = MicroEngine(
            mesh, bs=2, coeff_kind="tensor4", dtype=jnp.float64,
            solver="pcg", pcg_strategy="densek",
        )
        return np.asarray(
            eng.tensors_for_centers(A_el, centers, chunk=6, **kw)
        )

    for kw in (dict(), dict(G_fn=G_fn)):
        bil = run("bilinear", **kw)
        phi = run("phi", **kw)
        err = np.abs(phi - bil).max() / np.abs(bil).max()
        assert err < 1e-8, (kw, err)


@pytest.mark.parametrize(
    "env",
    [
        {"HOMMX_ASTAR": "phi", "HOMMX_MICRO_MATVEC": "matfree"},
        {"HOMMX_ASTAR": "phi", "HOMMX_STENCIL_PCG": "xla"},
        {
            "HOMMX_MICRO_MATVEC": "matfree",
            "HOMMX_STENCIL_PCG": "xla",
            "HOMMX_KC_ASSEMBLY": "gather",
        },
        {
            "HOMMX_ASTAR": "phi",
            "HOMMX_MICRO_MATVEC": "matfree",
            "HOMMX_STENCIL_PCG": "xla",
        },
        {"HOMMX_CHOL_REFINE": "0"},
    ],
    ids=lambda e: "+".join(f"{k.split('_', 1)[1]}={v}" for k, v in e.items()),
)
def test_env_knob_combinations_match_default(monkeypatch, env):
    """Round-3 verdict weak #6: the HOMMX_* env knobs are equivalence-
    tested individually but not in COMBINATION.  Each combination must
    match the default route on both a scalar-stencil config and the
    elasticity chunk route."""
    rng = np.random.default_rng(5)
    centers2 = jnp.asarray(rng.uniform(0, 1, (9, 2)))
    centers3 = jnp.asarray(rng.uniform(0, 1, (5, 3)))
    A_sc = _coeff(2, "scalar")
    A_el = _coeff(3, "tensor4")

    def run():
        e_sc = MicroEngine(
            create_unit_square(8), bs=1, coeff_kind="scalar",
            dtype=jnp.float64, solver="pcg", pcg_tol=1e-12,
        )
        out_sc = e_sc.tensors_for_centers(A_sc, centers2)
        e_el = MicroEngine(
            create_unit_cube(3), bs=3, coeff_kind="tensor4",
            dtype=jnp.float64,
        )
        out_el = e_el.tensors_for_centers(A_el, centers3)
        return np.asarray(out_sc), np.asarray(out_el)

    ref_sc, ref_el = run()
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    got_sc, got_el = run()
    assert np.max(np.abs(got_sc - ref_sc)) / np.max(np.abs(ref_sc)) < 1e-9
    assert np.max(np.abs(got_el - ref_el)) / np.max(np.abs(ref_el)) < 1e-9
