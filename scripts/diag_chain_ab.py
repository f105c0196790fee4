"""A/B the cross-step anchor chain at bench size on the current backend.

Runs the same ramped trajectory twice (chain off / chain on), compares the
final states, per-step residuals, and wall-clock. SIZE=small|half|full.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_vasp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

import bench
from vasp_tpu.fem.timestepper import IterativeStepper, StepOptions


def run(system, bc_set, load, chain, n_steps=12):
    opts = StepOptions(
        atol=1e-6, rtol=1e-6, max_it=12, gmres_tol=1e-3, gmres_restart=60,
        gmres_maxiter=120, jac_chunk=8192, overlap=2, jac_dtype="f32",
        krylov_dtype="f32", residual_dtype="f32", chain_anchor=chain)
    stepper = IterativeStepper(system, bc_set, opts, recompute_tstep=20)
    U = system.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    t0 = time.time()
    hist = []
    for k in range(1, n_steps + 1):
        U, stats = stepper.step(U, bcv, min(1.0, k / 6) * load, k)
        hist.append((stats["iterations"], stats["residual"]))
    U.block_until_ready()
    total = time.time() - t0
    # steady window (post-ramp, cached programs)
    t0 = time.time()
    for k in range(n_steps + 1, n_steps + 4):
        U, stats = stepper.step(U, bcv, load, k)
    U.block_until_ready()
    steady = (time.time() - t0) / 3
    return np.asarray(U), hist, total, steady, stepper


def main():
    n_theta, n_z = bench.SIZES[os.environ.get("SIZE", "small")]
    mesh, system, bc_set, load = bench.build(n_theta, n_z, quad_degree=3)
    print(f"cells={mesh.num_cells} ndof={system.space.ndof}", flush=True)

    U_off, h_off, tot_off, st_off, _ = run(system, bc_set, load, False)
    print(f"chain OFF: total {tot_off:.1f}s steady {st_off:.3f}s/step",
          flush=True)
    U_on, h_on, tot_on, st_on, stp = run(system, bc_set, load, True)
    print(f"chain ON : total {tot_on:.1f}s steady {st_on:.3f}s/step "
          f"(age={stp._chain_age})", flush=True)
    for k, (a, b) in enumerate(zip(h_off, h_on), 1):
        print(f"  step {k}: off iters={a[0]} res={a[1]:.3e} | "
              f"on iters={b[0]} res={b[1]:.3e}", flush=True)
    dv = np.max(np.abs(U_on - U_off))
    sc = np.max(np.abs(U_off))
    print(f"state diff: max|dU|={dv:.3e} (scale {sc:.3e}, "
          f"rel {dv / sc:.3e})", flush=True)


if __name__ == "__main__":
    main()
