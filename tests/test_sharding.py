"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hommx_tpu import create_unit_square
from hommx_tpu.micro.engine import MicroEngine
from hommx_tpu.parallel import device_mesh, shard_cells


@pytest.fixture(scope="module")
def engine():
    return MicroEngine(create_unit_square(8), bs=1, coeff_kind="scalar")


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_tensors_match_unsharded(engine):
    A = lambda x, y: 1.1 + x[0] + 0.5 * jnp.sin(2 * jnp.pi * y[0])
    centers = jnp.stack(
        [jnp.linspace(0.0, 1.0, 37), jnp.linspace(0.0, 2.0, 37)], axis=1
    )
    ref = engine.tensors_for_centers(A, centers)

    mesh = device_mesh()
    out = shard_cells(
        mesh,
        lambda c: jax.vmap(
            lambda x: engine.cell_tensor(engine.element_coeff(A, x))[0]
        )(c),
        centers,
    )
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_sharded_hmm_solve_matches(engine):
    """Full PoissonHMM with the micro stage sharded over 8 devices equals the
    single-device result (the dryrun_multichip path)."""
    from hommx_tpu import PoissonHMM

    macro = create_unit_square(10, 10)
    micro = create_unit_square(8, 8)
    A = lambda x, y: 1.1 + x[0] + jnp.sin(2 * jnp.pi * y[0])
    f = lambda x: 1.0

    hmm = PoissonHMM(macro, A, f, micro, 0.01)
    u_single = hmm.solve()

    hmm2 = PoissonHMM(macro, A, f, micro, 0.01)
    mesh = device_mesh()
    A_star = shard_cells(
        mesh,
        lambda c: jax.vmap(
            lambda x: hmm2._engine.cell_tensor(hmm2._engine.element_coeff(A, x))[0]
        )(c),
        hmm2._sys.centers,
    )
    hmm2._A_star = A_star
    u_sharded = hmm2.solve()
    assert float(jnp.max(jnp.abs(u_single.array - u_sharded.array))) < 1e-12
