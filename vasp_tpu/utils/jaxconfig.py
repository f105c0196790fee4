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
    if _X64:
        jax.config.update("jax_enable_x64", True)


def default_float():
    """The framework-wide default floating dtype."""
    return jnp.float64 if _X64 else jnp.float32


def default_int():
    return jnp.int32
