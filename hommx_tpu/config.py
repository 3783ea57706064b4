"""Global numerical configuration for hommx_tpu.

Precision policy
----------------
HMM parity gates (reference ``test_integration_poisson.py:233-240``: solution
identity < 1e-12, stiffness-matrix Frobenius diff < 1e-8) require float64
arithmetic.  On CPU we therefore enable JAX x64 and default every solver to
float64.  TPUs have no native float64; the benchmark/serving path runs the
micro engine in float32 (the Gram-matrix formulation is numerically benign:
SPD systems, Cholesky, condition numbers ~ coefficient contrast × O(N_micro)).

``default_dtype()`` picks float64 when x64 is enabled (tests / CPU) and
float32 otherwise (TPU serving).  Every public solver takes an explicit
``dtype`` override.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Enable x64 by default (scientific code; the parity gates need f64).  The
# TPU backend executes f64 by emulation — correct but slow — so the benchmark
# / serving path passes dtype=float32 explicitly instead of flipping this.
if os.environ.get("HOMMX_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# The axon TPU plugin ignores the JAX_PLATFORMS env var in some environments;
# honor HOMMX_FORCE_CPU=1 (and JAX_PLATFORMS=cpu, restoring its documented
# meaning) as a reliable CPU switch.
if (
    os.environ.get("HOMMX_FORCE_CPU") == "1"
    or os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
):
    jax.config.update("jax_platforms", "cpu")

# Matmul precision: the TPU MXU's native f32 matmul rounds inputs to bf16
# (8-bit mantissa) — measured 3.3e-3 relative error on homogenized tensors,
# 300× above the solver's documented 1e-5 tolerance.  "high" (3-pass bf16
# decomposition, ~f32-faithful) recovers 1.45e-5 at ~20% throughput cost and
# is the framework default; the micro engine upgrades elasticity/tensor
# problems to "highest" (6-pass, ~1e-7) where the per-cell matmuls are small
# and the upgrade is nearly free.  Override with HOMMX_TPU_MATMUL_PRECISION.
_prec = os.environ.get("HOMMX_TPU_MATMUL_PRECISION", "high")
if _prec != "none":
    jax.config.update("jax_default_matmul_precision", _prec)

# Persistent compilation cache: TPU compiles of the larger pipelines take
# tens of seconds through the remote compiler; cache them across processes.
if os.environ.get("HOMMX_TPU_COMPCACHE", "1") != "0":
    try:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/hommx_tpu_jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_dtype() -> jnp.dtype:
    """float64 where it is native (CPU — the parity/test path), float32 on
    TPU (f64 is emulated there; pass dtype=jnp.float64 explicitly to force)."""
    if not x64_enabled():
        return jnp.float32
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return jnp.float32
    except Exception:  # pragma: no cover
        pass
    return jnp.float64


def host_setup():
    """Context manager pinning eager setup computation to the CPU backend.

    On the axon TPU backend every eager op pays a multi-second remote
    compile + ~25ms dispatch; one-time setup math (element geometry, operator
    construction, K₀ inversion) belongs on the host.  Device transfer happens
    automatically when the arrays are consumed by a TPU-jitted program.
    """
    import contextlib

    try:
        return jax.default_device(jax.devices("cpu")[0])
    except Exception:  # pragma: no cover - CPU backend always exists
        return contextlib.nullcontext()
