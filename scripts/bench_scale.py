"""Single-chip scaling ladder toward the 1M-dof north star (VERDICT r4
#6): measure (or record the OOM point of) FSI steps at ~0.5M and ~1M dofs
on the real TPU with the hybrid lowmem banded layout.

Geometry: long thin FSI tubes (few dofs per cross-section keep the RCM
band c small — factor memory scales as ndof*c, so the cross-section size
IS the single-chip memory knob; the width axis is what the SHARDED path
exists for).

Run one size per process (OOM kills the worker):
    PYTHONUNBUFFERED=1 python scripts/bench_scale.py 500k
    PYTHONUNBUFFERED=1 python scripts/bench_scale.py 1m
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_vasp"))
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import vasp_tpu.utils.jaxconfig  # noqa: F401

SIZES = {
    # name: (n_theta, n_r_fluid, n_r_solid, n_z)
    "250k": (8, 1, 1, 280),
    "500k": (8, 1, 1, 570),
    "600k": (8, 1, 1, 855),
    "1m": (8, 1, 1, 1140),
}


def main(size):
    from vasp_tpu.fem.dirichlet import DirichletBC
    from vasp_tpu.fem.timestepper import IterativeStepper, StepOptions
    from vasp_tpu.mesh.generate import fsi_tube_mesh
    from vasp_tpu.run.system import FSISystem

    n_theta, n_rf, n_rs, n_z = SIZES[size]
    t0 = time.time()
    # FIXED physical length, growing axial RESOLUTION: a length-growing
    # tube's bending compliance scales ~L^4 and the Newton step overshoots
    # into element inversion (measured: the 1.7 m 600k-dof variant stalls
    # at a load-proportional residual while 400k converges) — that is the
    # geometry, not the solver. Refining a 0.12 m tube keeps the physics
    # fixed while ndof grows; c stays at the cross-section bandwidth.
    mesh = fsi_tube_mesh(r_inner=0.002, r_outer=0.0026, length=0.12,
                         n_theta=n_theta, n_r_fluid=n_rf, n_r_solid=n_rs,
                         n_z=n_z)
    E, nu = 1e6, 0.45
    mu_s = E / (2 * (1 + nu))
    lam_s = nu * 2 * mu_s / (1 - 2 * nu)
    cfg = dict(dt=0.001, theta=0.501, rho_f=1.0e3, mu_f=1.5e-3, dx_f_id=1,
               rho_s=1e3, mu_s=mu_s, lambda_s=lam_s, dx_s_id=2,
               material_model="StVenantKirchoff", extrapolation="laplace",
               extrapolation_sub_type="constant", quadrature_degree=3)
    system = FSISystem(mesh, cfg)
    space = system.space
    print(f"{size}: cells={mesh.num_cells} ndof={space.ndof} "
          f"(mesh {time.time()-t0:.1f}s)", flush=True)
    bcs = []
    for marker in (2, 3, 11):
        p2d = space.p2_dofs_on_facets(marker)
        bcs.append(DirichletBC(space.field_dofs("d", p2d), 0.0))
    for marker in (2, 11):
        p2d = space.p2_dofs_on_facets(marker)
        bcs.append(DirichletBC(space.field_dofs("v", p2d), 0.0))
    bc_set = system.make_bcset(bcs)
    load = 150.0 * jnp.asarray(system.interface_pressure_load())
    opts = StepOptions(atol=1e-6, rtol=1e-6, max_it=12, recompute=2,
                      gmres_tol=1e-3, gmres_restart=60, gmres_maxiter=120,
                      jac_chunk=8192, overlap=2, jac_dtype="f32",
                      krylov_dtype=os.environ.get("BENCH_SCALE_KDT", "f32"),
                      residual_dtype="f32f")
    t0 = time.time()
    stepper = IterativeStepper(system, bc_set, opts, recompute_tstep=20)
    print(f"setup {time.time()-t0:.1f}s lowmem={stepper._banded_lowmem} "
          f"c={stepper._bpat.c} nb={stepper._bpat.nb} "
          f"factor_GB={stepper._bpat.nb*stepper._bpat.c**2*8/2**30:.2f}",
          flush=True)
    U = system.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    t0 = time.time()
    r = float(os.environ.get("BENCH_SCALE_RAMP", "0.2"))
    U1, stats = stepper.step(U, bcv, r * load, 1)
    U1.block_until_ready()
    print(f"step1 (compile+rebuild) {time.time()-t0:.1f}s "
          f"iters={int(stats['iterations'])} "
          f"probe_rel={getattr(stepper, '_last_rel', None)}", flush=True)
    t0 = time.time()
    U2, stats = stepper.step(U1, bcv, 2 * r * load, 2)
    U2.block_until_ready()
    dt_step = time.time() - t0
    t0 = time.time()
    stepper._rebuild(U2, U2, 10 ** 6)
    jax.block_until_ready(stepper._pinv)
    dt_rebuild = time.time() - t0
    print(json.dumps({
        "size": size, "ndof": space.ndof, "cells": mesh.num_cells,
        "c": stepper._bpat.c, "nb": stepper._bpat.nb,
        "sec_warm_step": round(dt_step, 3),
        "sec_rebuild": round(dt_rebuild, 3),
        "sec_per_step_amortized": round(dt_step + dt_rebuild / 20, 3),
        "newton_iters": int(stats["iterations"]),
        "residual": float(stats["residual"]),
        "device": jax.devices()[0].platform,
    }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "500k")
