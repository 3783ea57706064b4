"""Pinned golden-value regression gates.

The integration suite validates against *relative* anchors (fine-mesh FEM,
exact degenerations) computed in the same run — strong, but a regression
that hits both sides of a comparison (HMM and FEM share the element/
assembly/solver kernels) would cancel out.  These tests freeze absolute
solution functionals, computed once on the f64 CPU path (round 2,
2026-08-16), as hard-coded constants.  Any kernel drift — element geometry,
quadrature, periodic fold, micro solver, macro assembly/solve — moves them.

Modeled on BASELINE.json's parity gate ("match DOLFINx-computed errors to
1e-8", reference ``test/integration/test_integration_poisson.py:233-240``);
with no DOLFINx in this environment the frozen values are this repo's own
f64 output, which still pins the stack against itself going forward.

Regenerate (only after an *intentional* numerics change, with the diff
understood): ``python tests/test_golden.py --regen``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import (
    LinearElasticityHMM,
    LinearElasticityStratifiedHMM,
    PoissonFEM,
    PoissonHMM,
    PoissonPeriodicHMM,
    PoissonStratifiedHMM,
    create_box,
    create_rectangle,
    create_unit_cube,
    create_unit_square,
    dirichletbc,
)
from hommx_tpu.ops.function_space import boundary_dofs
from hommx_tpu.utils.validation import hooke_tensor

from tests.utils import calc_l2_norm

RTOL = 1e-8


def _functionals(mesh, u):
    """(L2 norm, max |dof|) — two independent solution functionals."""
    arr = np.asarray(u.array)
    return float(calc_l2_norm(mesh, u)), float(np.abs(arr).max())


# -- configs ----------------------------------------------------------------


def _poisson_hmm():
    macro = create_unit_square(8, 8)
    micro = create_unit_square(8, 8)

    def A(x, y):
        return 0.33 + 0.15 * (
            jnp.sin(2 * jnp.pi * x[0]) + jnp.sin(2 * jnp.pi * y[0])
        )

    u = PoissonHMM(macro, A, lambda x: 1.0, micro, 0.1 / 8).solve()
    return _functionals(macro, u)


def _poisson_stratified():
    # wavy laminate (examples/diffusion/laminate.py configuration, small)
    macro = create_unit_square(8, 8)
    micro = create_unit_square(8, 8)

    def A(x, y):
        return jnp.where(jnp.sin(2 * jnp.pi * y[1]) > 0.0, 2.0, 0.5)

    def Dtheta_t(x):
        # θ(x) = (x0, x1 − sin(2π x0));  Dθᵀ_{ij} = ∂θ_j/∂x_i
        return jnp.array(
            [[1.0, -2.0 * jnp.pi * jnp.cos(2.0 * jnp.pi * x[0])], [0.0, 1.0]]
        )

    u = PoissonStratifiedHMM(macro, A, lambda x: 1.0, micro, 2**-4, Dtheta_t).solve()
    return _functionals(macro, u)


def _elasticity_2d():
    macro = create_rectangle([[0.0, 0.0], [1.0, 0.25]], [8, 2])
    micro = create_unit_square(4, 4)
    mu = lambda x, y: jnp.where(jnp.sin(2 * jnp.pi * y[1]) > 0, 10.0, 1.0)
    A = hooke_tensor(2, mu, lambda x, y: 1.0)
    hmm = LinearElasticityHMM(
        macro, A, lambda x: jnp.array([0.0, -0.01]), micro, 2**-4
    )
    V = hmm.function_space
    hmm.set_boundary_conditions(
        dirichletbc(np.zeros(2), boundary_dofs(V, lambda x: np.isclose(x[0], 0)), V)
    )
    return _functionals(macro, hmm.solve())


def _elasticity_stratified_3d():
    # tiny rotated-fiber beam (examples/linear_elasticity/rotated_fibers.py)
    L, W = 1.0, 0.4
    macro = create_box([[0, 0, 0], [L, W, 0.1]], [5, 2, 2])
    micro = create_unit_cube(3)

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
        macro, A, lambda x: jnp.array([0.0, 0.0, -0.008]), micro, 2**-5, Dtheta
    )
    V = hmm.function_space
    hmm.set_boundary_conditions(
        dirichletbc(np.zeros(3), boundary_dofs(V, lambda x: np.isclose(x[0], 0)), V)
    )
    return _functionals(macro, hmm.solve())


def _periodic_tensor():
    micro = create_unit_square(16, 16)
    phmm = PoissonPeriodicHMM(
        create_unit_square(4, 4), lambda y: 2.0 + jnp.sin(2 * jnp.pi * y[0]),
        lambda x: 1.0, micro,
    )
    A_hom = np.asarray(phmm.compute_effective_tensor())
    return float(A_hom[0, 0]), float(A_hom[1, 1])


def _fem():
    msh = create_unit_square(32, 32)

    def A(x):
        return 1.0 + 0.5 * jnp.sin(2 * jnp.pi * x[0]) * jnp.sin(2 * jnp.pi * x[1])

    fem = PoissonFEM(msh, A, lambda x: 1.0)
    return _functionals(msh, fem.solve())


CONFIGS = {
    "poisson_hmm": _poisson_hmm,
    "poisson_stratified": _poisson_stratified,
    "elasticity_2d": _elasticity_2d,
    "elasticity_stratified_3d": _elasticity_stratified_3d,
    "periodic_tensor": _periodic_tensor,
    "fem": _fem,
}

# Frozen f64 CPU values (see module docstring). DO NOT update casually.
GOLDEN = {
    "poisson_hmm": (0.13615178178157605, 0.26585257192673567),
    "poisson_stratified": (0.03822425690690816, 0.06951174381273492),
    "elasticity_2d": (0.0007622814186560087, 0.014175229892888733),
    "elasticity_stratified_3d": (0.0003321179417961123, 0.05658411139956721),
    "periodic_tensor": (1.7357329281298157, 1.9999999999999982),
    "fem": (0.04186291691698005, 0.07429713437642609),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    got = CONFIGS[name]()
    want = GOLDEN[name]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=RTOL), (name, got, want)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        for name, fn in CONFIGS.items():
            print(f'    "{name}": {fn()},')
