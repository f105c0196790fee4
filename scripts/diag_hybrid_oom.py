"""Hybrid-lowmem probe: step timing + second-rebuild OOM dissection.

Runs the full bench size with the hybrid factor layout, prints the steady
step time FIRST (so the number survives a rebuild crash), then attempts a
second rebuild with client-side live-array accounting before/after.
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


def live_gb():
    tot = 0
    for a in jax.live_arrays():
        tot += a.size * a.dtype.itemsize
    return tot / 2**30


def main():
    from vasp_tpu.fem.timestepper import IterativeStepper, StepOptions

    size = os.environ.get("SIZE", "full")
    n_theta, n_z = bench.SIZES[size]
    mesh, system, bc_set, load = bench.build(n_theta, n_z, quad_degree=3)
    print(f"cells={mesh.num_cells} ndof={system.space.ndof}", flush=True)

    opts = StepOptions(
        atol=1e-6, rtol=1e-6, max_it=12, recompute=2,
        gmres_tol=1e-3, gmres_restart=60, gmres_maxiter=120,
        jac_chunk=8192, overlap=2, jac_dtype="f32", krylov_dtype="f32",
        residual_dtype="f32f",
        banded_factor_dtype=os.environ.get("BENCH_FDTYPE") or None,
    )
    stepper = IterativeStepper(system, bc_set, opts, recompute_tstep=20)
    U = system.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))

    def ramp(k, n_ramp=6):
        return min(1.0, k / n_ramp)

    t0 = time.time()
    for k in range(1, 7):
        U, stats = stepper.step(U, bcv, ramp(k) * load, k)
    U.block_until_ready()
    print(f"warm 6 steps (incl compile): {time.time()-t0:.1f}s "
          f"iters={stats['iterations']} res={stats['residual']:.2e}",
          flush=True)
    t0 = time.time()
    n = 3
    for k in range(7, 7 + n):
        U, stats = stepper.step(U, bcv, load, k)
    U.block_until_ready()
    print(f"steady: {(time.time()-t0)/n:.3f}s/step "
          f"(iters={stats['iterations']})", flush=True)
    print(f"live before 2nd rebuild: {live_gb():.2f} GiB", flush=True)
    for a in sorted(jax.live_arrays(),
                    key=lambda a: -a.size * a.dtype.itemsize)[:8]:
        print(f"  {a.shape} {a.dtype} "
              f"{a.size*a.dtype.itemsize/2**30:.2f} GiB", flush=True)
    t0 = time.time()
    stepper._rebuild(U, U, 10**6)
    jax.block_until_ready(stepper._pinv)
    print(f"2nd rebuild OK: {time.time()-t0:.2f}s  live={live_gb():.2f} GiB",
          flush=True)


if __name__ == "__main__":
    main()
