"""Per-phase timing of a production IterativeStepper step at bench size.

Times, on the TPU, at SIZE (default full 20,832 cells):
  - preconditioner rebuild (assemble + factorize)
  - element jacfwd (f32)
  - one banded preconditioner apply
  - one scaled matvec
  - one full GMRES direction solve (at production tol)
  - residual: raw f64, f32, Taylor-delta
  - one full production step (converged, post-ramp)
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


def timeit(f, *a, n=3):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    from vasp_tpu.fem.timestepper import IterativeStepper, StepOptions

    size = os.environ.get("SIZE", "full")
    n_theta, n_z = bench.SIZES[size]
    mesh, system, bc_set, load = bench.build(n_theta, n_z, quad_degree=3)
    ndof = system.space.ndof
    print(f"cells={mesh.num_cells} ndof={ndof}", flush=True)

    opts = StepOptions(
        atol=1e-6, rtol=1e-6, max_it=12,
        gmres_tol=1e-3, gmres_restart=60, gmres_maxiter=120,
        jac_chunk=8192, overlap=2, jac_dtype="f32", krylov_dtype="f32",
        residual_dtype=os.environ.get("RESID", "f32f"),
    )
    stepper = IterativeStepper(system, bc_set, opts, recompute_tstep=20)
    U = system.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))

    def ramp(k, n_ramp=6):
        return min(1.0, k / n_ramp)

    # warm through the ramp so we profile a converged production state
    t0 = time.time()
    for k in range(1, 7):
        U, stats = stepper.step(U, bcv, ramp(k) * load, k)
    U.block_until_ready()
    print(f"warm 6 steps (incl compile): {time.time()-t0:.1f}s "
          f"iters={stats['iterations']} res={stats['residual']:.2e}",
          flush=True)
    print(f"banded: lowmem={stepper._banded_lowmem} "
          f"c={stepper._bpat.c} nb={stepper._bpat.nb}", flush=True)

    # full-step wall-clock (3 steps)
    t0 = time.time()
    for k in range(7, 10):
        U, stats = stepper.step(U, bcv, load, k)
    U.block_until_ready()
    print(f"steady step: {(time.time()-t0)/3:.3f}s/step "
          f"(last iters={stats['iterations']})", flush=True)

    # rebuild
    t0 = time.time()
    stepper._rebuild(U, U, 10 ** 6)
    jax.block_until_ready(stepper._pinv)
    print(f"rebuild: {time.time()-t0:.3f}s", flush=True)

    blocks = stepper._blocks_dev
    asm = stepper._asm_of(blocks)
    mask = stepper.mask
    U0 = U

    # residual variants
    r64 = jax.jit(lambda u: asm.residual(u, U0))
    r32 = jax.jit(lambda u: asm.residual(u, U0, dtype=jnp.float32))
    print(f"residual f64: {timeit(r64, U):.3f}s", flush=True)
    print(f"residual f32: {timeit(r32, U):.3f}s", flush=True)
    RA = r64(U)
    dU = jnp.asarray(np.random.default_rng(0).normal(0, 1e-6, ndof))
    rdelta = jax.jit(lambda u: RA + asm.residual_delta(u, U, U0))
    print(f"residual delta: {timeit(rdelta, U + dU):.3f}s", flush=True)

    # jacfwd
    jac = jax.jit(lambda u: asm.element_jacobians(
        u, U0, chunk=opts.jac_chunk, dtype=jnp.float32))
    print(f"jacfwd f32: {timeit(jac, U):.3f}s", flush=True)
    jacs = jac(U)

    # cross-step anchor-chain primitives
    d2 = jax.jit(lambda u, a, u0n, u0o: asm.residual_delta2(u, a, u0n, u0o))
    t_d2 = timeit(lambda u: d2(u, U, U + dU, U), U + dU)
    print(f"residual delta2: {t_d2:.3f}s", flush=True)

    # matvec — jacs/pinv passed as ARGUMENTS (closures at this size embed
    # GB-scale constants in the HLO; the axon remote compiler 413s)
    dr, dc = stepper._dr, stepper._dc
    mv = jax.jit(lambda j, x: asm.matvec(j, dc.astype(jnp.float32) * x))
    x = jnp.ones(ndof, jnp.float32)
    print(f"matvec f32: {timeit(lambda v: mv(jacs, v), x):.3f}s", flush=True)

    # preconditioner apply
    pinv = stepper._pinv
    ap = jax.jit(lambda p, r: stepper._apply_banded(*p, r))
    print(f"banded apply: {timeit(lambda r: ap(pinv, r), x):.3f}s",
          flush=True)

    # one GMRES direction solve at production settings
    from vasp_tpu.fem.krylov import gmres

    @jax.jit
    def direction(j, p, R):
        drw = dr.astype(jnp.float32)
        dcw = dc.astype(jnp.float32)

        def matvec(v):
            t = dcw * jnp.where(mask, 0.0, v)
            y = asm.matvec(j, t).astype(jnp.float32)
            return jnp.where(mask, v, drw * y)

        Rs = (dr * R).astype(jnp.float32)
        y, info = gmres(matvec, Rs, M=lambda r: stepper._apply_banded(*p, r),
                        restart=opts.gmres_restart,
                        cycles=2, tol=opts.gmres_tol)
        return dc * y.astype(jnp.float64), info

    R = jnp.where(mask, 0.0, r64(U) + load)
    print(f"gmres direction: "
          f"{timeit(lambda r: direction(jacs, pinv, r)[0], R):.3f}s",
          flush=True)


if __name__ == "__main__":
    main()
