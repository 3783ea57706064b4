"""Debug converters — parity with the reference's ``petsc_helper.py``.

The reference converts PETSc matrices/vectors to dense numpy for test
comparisons (``petsc_helper.py:8-24``); here the sparse objects are ELL/DIA
arrays and Functions.
"""

from __future__ import annotations

import numpy as np

from hommx_tpu.ops.sparse import ell_to_dense

__all__ = ["ell_matrix_to_numpy", "dia_matrix_to_numpy", "vector_to_numpy"]


def ell_matrix_to_numpy(vals, cols) -> np.ndarray:
    """Dense numpy matrix from ELL storage (reference
    ``petsc_matrix_to_numpy``)."""
    return np.asarray(ell_to_dense(vals, cols))


def dia_matrix_to_numpy(dia_vals, offsets) -> np.ndarray:
    """Dense numpy matrix from DIA storage."""
    dv = np.asarray(dia_vals)
    nd, N = dv.shape
    out = np.zeros((N, N))
    for d, off in enumerate(offsets):
        for i in range(max(0, -off), min(N, N - off)):
            out[i, i + off] = dv[d, i]
    return out


def vector_to_numpy(vec) -> np.ndarray:
    """Numpy copy of a Function's dof vector or array (reference
    ``petsc_vector_to_numpy``)."""
    arr = vec.array if hasattr(vec, "array") else vec
    return np.array(arr, copy=True)
