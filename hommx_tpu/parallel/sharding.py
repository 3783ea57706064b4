"""Multi-chip sharding of the HMM pipeline.

Replaces MPI domain decomposition (reference ``hmm.py:544-551``: each rank
solves the cell problems of its *owned* macro cells; the micro mesh is
replicated on COMM_SELF).  The TPU-native analogue: shard the macro-cell
batch axis over a 1D ``jax.sharding.Mesh`` and keep the micro operators
replicated.  The micro stage needs **zero** communication (exactly like the
reference's COMM_SELF discipline); the macro assembly gathers the per-cell
homogenized tensors (the only collective, standing in for the reference's
``MatAssembly`` boundary exchange, ``hmm.py:442``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["device_mesh", "shard_cells"]


def device_mesh(devices=None, axis: str = "cells") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_cells(mesh: Mesh, tensor_fn, centers: jnp.ndarray, axis: str = "cells"):
    """Run ``tensor_fn(centers_chunk) -> (n, s, s)`` sharded over cells.

    Pads the batch to a multiple of the device count, shards the leading
    axis, and returns the (replicated) gathered result.  The per-cell
    homogenized-tensor computation is embarrassingly parallel, so XLA inserts
    a single all-gather at the output.
    """
    n = centers.shape[0]
    nd = mesh.devices.size
    n_pad = (-n) % nd
    centers_p = jnp.concatenate(
        [centers, jnp.repeat(centers[:1], n_pad, axis=0)], axis=0
    )
    sharding = NamedSharding(mesh, P(axis))
    centers_p = jax.device_put(centers_p, sharding)
    out = jax.jit(tensor_fn, in_shardings=sharding, out_shardings=NamedSharding(mesh, P()))(
        centers_p
    )
    return jax.tree_util.tree_map(lambda o: o[:n], out)
