"""JAX global configuration for the framework.

The FSI solver needs f64: reference Newton tolerances go down to
atol=1e-10 / rtol=1e-9 (reference: src/vasp/simulations/aneurysm.py:48-49) and
field-value regressions are at atol 1e-10
(reference: tests/test_create_hdf5_and_separate_viz.py:41-51).

On TPU, f64 is software-emulated by XLA; the performance strategy is
mixed-precision: f64 residuals / norms with an f32 inner Krylov solve used as
a preconditioner (iterative refinement), so the MXU hot path stays fast.
Set ``VASP_TPU_X64=0`` to opt out (f32 everywhere, loosened tolerances).
"""
import os

import jax
import jax.numpy as jnp

_X64 = os.environ.get("VASP_TPU_X64", "1") != "0"


def ensure_x64() -> None:
    # Honor an explicit JAX_PLATFORMS request programmatically: some
    # deployments ship a sitecustomize.py that imports jax and SETS
    # jax_platforms (e.g. to a remote-TPU plugin) in every process,
    # which silently overrides the env var. `JAX_PLATFORMS=cpu
    # vasp-tpu-run ...` must mean CPU even there — and must not hang
    # on an unreachable remote backend.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and jax.config.jax_platforms != env_platforms:
        if not jax._src.xla_bridge.backends_are_initialized():
            jax.config.update("jax_platforms", env_platforms)
    if _X64:
        jax.config.update("jax_enable_x64", True)
    # TPU f32 matmuls default to bf16-precision multiplies (eps ~8e-3):
    # measured to floor the f32 Krylov solve at ~1e-3 relative residual
    # where true-f32 arithmetic (CPU) reaches 1e-6. HIGHEST keeps f32
    # matmuls exact (multi-pass); the hot matvec is HBM-bound so the extra
    # MXU passes are invisible, and intentionally-bf16 data (banded
    # factors) is unaffected (precision config applies to f32 inputs).
    jax.config.update("jax_default_matmul_precision", "highest")


def default_float():
    """The framework-wide default floating dtype."""
    return jnp.float64 if _X64 else jnp.float32


def default_int():
    return jnp.int32
