"""Benchmark: wall-clock per FSI timestep vs the reference's anchor.

Reference anchor: 7.4 s per timestep on the offset-stenosis tutorial
(20,829 cells, dt=1e-3) with FEniCS/turtleFSI + MUMPS
(reference: docs/offset_stenosis.md:197; see BASELINE.md).

This benchmark builds an FSI tube at the same cell count, runs the fully
jitted timestep (Newton + matrix-free GMRES + element-block Schwarz) on the
available accelerator, and reports seconds/timestep. ``vs_baseline`` is the
speedup factor over the 7.4 s anchor (>1 = faster than reference).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

import os as _os
import jax as _jax

# persistent XLA compile cache: first compile of the 20k-cell step is
# minutes (remote TPU compile tunnel); subsequent runs hit the disk cache
_jax.config.update("jax_compilation_cache_dir",
                   _os.path.expanduser("~/.cache/jax_vasp"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REFERENCE_SEC_PER_STEP = 7.4
TARGET_CELLS = 20829


def build(n_theta, n_z, quad_degree):
    import jax.numpy as jnp

    from vasp_tpu.fem.dirichlet import DirichletBC
    from vasp_tpu.mesh.generate import fsi_tube_mesh
    from vasp_tpu.run.system import FSISystem

    mesh = fsi_tube_mesh(
        r_inner=0.002, r_outer=0.0026, length=0.04,
        n_theta=n_theta, n_r_fluid=3, n_r_solid=1, n_z=n_z,
        radius_profile=lambda z: 1.0 - 0.35 * np.exp(-((z - 0.012) / 0.004) ** 2),
    )
    E, nu = 1e6, 0.45
    mu_s = E / (2 * (1 + nu))
    lam_s = nu * 2 * mu_s / (1 - 2 * nu)
    cfg = dict(
        dt=0.001, theta=0.501,
        rho_f=1.0e3, mu_f=1.5e-3, dx_f_id=1,
        rho_s=1e3, mu_s=mu_s, lambda_s=lam_s, dx_s_id=2,
        material_model="StVenantKirchoff",
        extrapolation="laplace", extrapolation_sub_type="constant",
        quadrature_degree=quad_degree,
    )
    system = FSISystem(mesh, cfg)
    space = system.space
    bcs = []
    for marker in (2, 3, 11):
        p2d = space.p2_dofs_on_facets(marker)
        bcs.append(DirichletBC(space.field_dofs("d", p2d), 0.0))
    for marker in (2, 11):
        p2d = space.p2_dofs_on_facets(marker)
        bcs.append(DirichletBC(space.field_dofs("v", p2d), 0.0))
    bc_set = system.make_bcset(bcs)
    load = 150.0 * system.interface_pressure_load()
    return mesh, system, bc_set, jnp.asarray(load)


def main():
    import jax
    import jax.numpy as jnp

    from vasp_tpu.fem.timestepper import StepOptions, make_step_fn

    # 20,832 cells — matches the reference tutorial's 20,829-cell mesh
    n_theta, n_z = 16, 62
    mesh, system, bc_set, load = build(n_theta, n_z, quad_degree=3)
    ncells = mesh.num_cells
    ndof = system.space.ndof

    from vasp_tpu.fem.timestepper import IterativeStepper

    opts = StepOptions(
        atol=1e-6, rtol=1e-6, max_it=4,
        gmres_tol=1e-6, gmres_restart=60, gmres_maxiter=300,
        jac_chunk=8192, overlap=2, jac_dtype="f32",
    )
    # production configuration: Ruiz + RAS(2) GMRES Newton, preconditioner
    # rebuilt every 20 steps (the reference's recompute_tstep cadence)
    stepper = IterativeStepper(system, bc_set, opts, recompute_tstep=20)

    def step(U, bcv_, load_, tstep):
        return stepper.step(U, bcv_, load_, tstep)

    U = system.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))

    # warmup/compile (+ preconditioner build)
    t0 = time.time()
    U1, stats = step(U, bcv, load, 1)
    U1.block_until_ready()
    compile_s = time.time() - t0

    n_steps = int(os.environ.get("BENCH_STEPS", "5"))
    t0 = time.time()
    Uc = U1
    for k in range(n_steps):
        Uc, stats = step(Uc, bcv, load, 2 + k)
    Uc.block_until_ready()
    sec_per_step = (time.time() - t0) / n_steps

    ok = bool(jnp.all(jnp.isfinite(Uc)))
    result = {
        "metric": "sec_per_timestep_fsi20k",
        "value": round(sec_per_step, 4),
        "unit": "s/timestep",
        "vs_baseline": round(REFERENCE_SEC_PER_STEP / sec_per_step, 2),
    }
    print(json.dumps(result))
    if not ok:
        print("WARNING: non-finite state after benchmark", file=sys.stderr)
    print(
        f"# cells={ncells} ndof={ndof} device={jax.devices()[0].platform} "
        f"compile={compile_s:.1f}s newton_iters={int(stats['iterations'])} "
        f"residual={float(stats['residual']):.2e}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
