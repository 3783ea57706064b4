"""Shared test helpers — re-exported from the package's validation module
(mirror of the reference's per-test utilities,
``test_integration_poisson.py:15-57``)."""

from hommx_tpu.utils.validation import (  # noqa: F401
    calc_l2_error,
    calc_l2_norm,
    hooke_tensor,
    relative_l2_vs_reference,
    zero_dirichlet_bcs,
)
