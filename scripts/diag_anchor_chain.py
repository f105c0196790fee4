"""Validate the cross-step anchor chain against raw f64 residuals.

Simulates the chain the production stepper runs: over a ramped multi-step
trajectory of the small bench tube, carry the exact residual anchor from
step to step via Assembler.residual_delta2 and compare every chained value
against the raw emulated-f64 evaluation. Reports max absolute drift.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import bench
from vasp_tpu.fem.timestepper import IterativeStepper, StepOptions


def main():
    n_theta, n_z = bench.SIZES[os.environ.get("SIZE", "small")]
    mesh, system, bc_set, load = bench.build(n_theta, n_z, quad_degree=3)
    asm = system.assembler
    mask = jnp.asarray(bc_set.mask)
    ndof = system.space.ndof
    print(f"cells={mesh.num_cells} ndof={ndof}", flush=True)

    opts = StepOptions(atol=1e-6, rtol=1e-6, max_it=12, gmres_tol=1e-3,
                       gmres_restart=60, gmres_maxiter=120, jac_chunk=8192,
                       jac_dtype="f32", krylov_dtype="f32",
                       residual_dtype="f32")
    stepper = IterativeStepper(system, bc_set, opts, recompute_tstep=20)
    U = system.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))

    def mask0(R):
        return jnp.where(mask, 0.0, R)

    r64 = jax.jit(lambda u, u0: mask0(asm.residual(u, u0)))
    ORDER = int(os.environ.get("ORDER", "3"))
    delta2 = jax.jit(lambda u, a, u0n, u0o: mask0(
        asm.residual_delta2(u, a, u0n, u0o, order=ORDER)))

    # trajectory: ramped steps like the bench
    states = [U]
    for k in range(1, 9):
        U, stats = stepper.step(U, bcv, min(1.0, k / 6) * load, k)
        states.append(U)
        print(f"step {k}: iters={stats['iterations']} "
              f"res={stats['residual']:.2e}", flush=True)

    # chain: anchor_n = mask0(asm.residual(U1_n, U_{n-1})) where
    # U1_n = where(mask, bcv, U_{n-1}) is the bc-applied Newton start.
    # Link n->n+1: anchor_{n+1} = R_end_n + delta2(U1_{n+1}, U*_n settled
    # residual...) — here we emulate the production chain exactly:
    #   R_end_n = mask0(res(U*_n, U_{n-1}))  (delta-grade in production)
    #   anchor_{n+1} = R_end_n + delta2(U1_{n+1}, U*_n; U*_n, U_{n-1})
    worst_link = 0.0
    worst_chain = 0.0
    U1 = jnp.where(mask, bcv, states[0])
    RA = r64(U1, states[0])  # raw seed (production: at rebuilds)
    for n in range(1, len(states)):
        Uprev = states[n - 1]
        Ustar = states[n]
        R_end_chain = RA + delta2(Ustar, U1, Uprev, Uprev)
        R_end_true = r64(Ustar, Uprev)
        err_end = float(jnp.max(jnp.abs(R_end_chain - R_end_true)))
        nrm_end = float(jnp.linalg.norm(R_end_chain - R_end_true))
        if n == len(states) - 1:
            break
        U1_next = jnp.where(mask, bcv, Ustar)
        RA = R_end_chain + delta2(U1_next, Ustar, Ustar, Uprev)
        RA_true = r64(U1_next, Ustar)
        err_link = float(jnp.max(jnp.abs(RA - RA_true)))
        nrm_link = float(jnp.linalg.norm(RA - RA_true))
        worst_link = max(worst_link, nrm_link)
        worst_chain = max(worst_chain, nrm_end)
        print(f"link {n}: R_end err max {err_end:.2e} l2 {nrm_end:.2e} | "
              f"anchor err max {err_link:.2e} l2 {nrm_link:.2e}",
              flush=True)
        U1 = U1_next
    print(f"WORST: in-step fine eval drift {worst_chain:.2e}, "
          f"chained anchor drift {worst_link:.2e} (atol target 1e-6)",
          flush=True)


if __name__ == "__main__":
    main()
