"""Per-block f32 residual noise floor: which blocks force the emulated-f64
element pass?

Hypothesis: the f32 cancellation noise comes from the stiff SOLID stress
terms (E ~ 1e6) and the fluid's rho/dt-scale terms, so a MIXED evaluation
(f64 on the small solid block, f32 elsewhere) may reach f64-grade accuracy
at a fraction of the cost. Measures, at a converged mid-trajectory state
of the bench tube: l2/linf of (R_dt - R_f64) for dt = f32, and for every
single-block-f64 combination.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_vasp"))

import jax.numpy as jnp
import numpy as np

import bench
from vasp_tpu.fem.timestepper import IterativeStepper, StepOptions


def main():
    n_theta, n_z = bench.SIZES[os.environ.get("SIZE", "small")]
    mesh, system, bc_set, load = bench.build(n_theta, n_z, quad_degree=3)
    asm = system.assembler
    mask = jnp.asarray(bc_set.mask)
    print(f"cells={mesh.num_cells} ndof={system.space.ndof}", flush=True)
    print("blocks:", [(b.name, b.dofs.shape[0]) for b in asm.blocks],
          flush=True)

    opts = StepOptions(atol=1e-6, rtol=1e-6, max_it=12, gmres_tol=1e-3,
                       gmres_restart=60, gmres_maxiter=120, jac_chunk=8192,
                       jac_dtype="f32", krylov_dtype="f32",
                       residual_dtype="f32")
    stepper = IterativeStepper(system, bc_set, opts, recompute_tstep=20)
    U = system.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    for k in range(1, 8):
        U0 = U
        U, stats = stepper.step(U, bcv, min(1.0, k / 6) * load, k)
    print(f"state at step 7: res={stats['residual']:.2e}", flush=True)

    def mask0(R):
        return jnp.where(mask, 0.0, R)

    @jax.jit
    def per_block(U, U0):
        parts64 = [b.residual_local(U, U0) for b in asm.blocks]
        parts32 = [b.residual_local(U, U0, dtype=jnp.float32)
                   for b in asm.blocks]
        outs = {}
        R64 = mask0(asm._accumulate(parts64, jnp.float64))
        outs["all_f32"] = mask0(asm._accumulate(parts32, jnp.float64)) - R64
        for i, b in enumerate(asm.blocks):
            mixed = [p64 if j == i else p32 for j, (p64, p32) in
                     enumerate(zip(parts64, parts32))]
            outs[f"f64[{b.name}]"] = mask0(
                asm._accumulate(mixed, jnp.float64)) - R64
        return outs, jnp.linalg.norm(R64)

    outs, n64 = per_block(U, U0)
    print(f"||R64|| = {float(n64):.3e}  (atol 1e-6)", flush=True)
    for k, v in outs.items():
        print(f"  {k:<24} l2 {float(jnp.linalg.norm(v)):.3e}   "
              f"linf {float(jnp.max(jnp.abs(v))):.3e}", flush=True)


if __name__ == "__main__":
    main()
