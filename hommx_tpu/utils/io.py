"""Checkpoint / resume of HMM state.

The reference has no checkpointing (SURVEY.md §5; its only cached state is
``_needs_reassembly`` and the cached ``A_hom``).  Here the expensive artifact
is the batch of per-cell homogenized tensors A*(c_T) — the entire micro-stage
output — so checkpointing it makes a solve resumable and lets users sweep
rhs/BCs without re-running the micro stage.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_hmm_state", "load_hmm_state"]


def save_hmm_state(path: str, hmm) -> None:
    """Dump the homogenized tensors (+ mesh fingerprint) of a BaseHMM to .npz."""
    A_star = hmm.homogenized_tensors()
    np.savez_compressed(
        path,
        A_star=np.asarray(A_star),
        macro_vertices=hmm._msh.vertices,
        macro_cells=hmm._msh.cells,
        eps=hmm._eps,
        bs=hmm._V_macro.bs,
    )


def load_hmm_state(path: str, hmm) -> None:
    """Restore homogenized tensors into a compatible BaseHMM instance.

    Raises if the macro mesh does not match the checkpoint fingerprint.
    """
    import jax.numpy as jnp

    data = np.load(path)
    if data["macro_vertices"].shape != hmm._msh.vertices.shape or not np.allclose(
        data["macro_vertices"], hmm._msh.vertices
    ):
        raise ValueError("checkpoint macro mesh does not match this solver")
    if int(data["bs"]) != hmm._V_macro.bs:
        raise ValueError("checkpoint block size does not match this solver")
    hmm._A_star = jnp.asarray(data["A_star"], dtype=hmm._dtype)
