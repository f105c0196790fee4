"""Measure the sharded banded solve variants (thomas / chain / spike).

Measures, at the multichip-dryrun mid size (103k dofs, c=3096, 8 virtual
CPU devices), per variant:
  - rebuild wall (factorization program, includes assembly+Ruiz),
  - apply wall (one jitted preconditioner application),
  - probe rel (solve quality of the stored factors),
  - sequential DEPTH in block steps (the critical-path model).

Honesty note (CLAUDE.md: this host has ONE CPU core): the 8 virtual
devices timeshare, so the measured wall-clock equals TOTAL work summed
over devices — device-parallel phases do not speed up here. The
critical-path column is therefore reported as depth x (measured
per-block-step cost derived from the thomas apply), the wall an
ICI-connected 8-chip pod would see up to collective latency (each chain
phase ships (c,) = 12 KB over ICI, ~us). Run on real multi-chip
hardware, the depth ratio IS the speedup ratio; the serialized columns
here validate correctness-at-scale and total-work overhead only.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/bench_spike.py [size]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_vasp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from vasp_tpu.fem.timestepper import StepOptions
    from vasp_tpu.parallel.banded_shard import ShardedBandedStepper
    from vasp_tpu.parallel.shard import build_device_mesh

    size = sys.argv[1] if len(sys.argv) > 1 else "mid"
    n_theta, n_z = {"full": (14, 270), "mid": (14, 54),
                    "small": (8, 12)}.get(size, (8, 12))
    system, bc_set, load, U0, bcv = ge._build_small_system(
        n_theta=n_theta, n_z=n_z)
    opts = StepOptions(atol=1e-7, rtol=0.9, max_it=1, gmres_tol=1e-3,
                       gmres_restart=30, gmres_maxiter=30,
                       jac_chunk=8192, jac_dtype="f32",
                       krylov_dtype="f32")
    n_dev = len(jax.devices())
    mesh = build_device_mesh(n_dev, "dof")
    U1 = jnp.where(jnp.asarray(bc_set.mask), jnp.asarray(bcv), U0)
    results = {}
    for algo in ("thomas", "chain", "spike"):
        st = ShardedBandedStepper(system, bc_set, opts, mesh=mesh,
                                  recompute_tstep=20, algo=algo)
        plan = st.plan
        n, m, c = plan.n, plan.nb_loc, plan.c
        nb = n * m
        # rebuild (compile + run, then a second timed run)
        t0 = time.time()
        st._rebuild(U1, U0, 1)
        jax.block_until_ready(st._factors)
        t_compile = time.time() - t0
        t0 = time.time()
        st._rebuild(U1, U0, 1)
        jax.block_until_ready(st._factors)
        t_rebuild = time.time() - t0
        # one apply, jitted standalone
        dr, dc, F = st._factors
        from vasp_tpu.parallel.banded_shard import (
            make_sharded_banded_apply, make_sharded_chain_apply,
            make_sharded_spike_apply)

        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        if algo == "spike":
            ap = make_sharded_spike_apply(plan, "dof", st.spike_refine)
        elif algo == "chain":
            ap = make_sharded_chain_apply(plan, "dof")
        else:
            _a = make_sharded_banded_apply(plan, "dof")

            def ap(Fx, r):
                return _a(Fx["Sinv"], Fx["H"], Fx["G"], r)

        sm = jax.jit(shard_map(
            ap, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P("dof"), F), P("dof")),
            out_specs=P("dof"), check_vma=False))
        r = jnp.ones(plan.npad, jnp.float32)
        sm(F, r).block_until_ready()  # compile
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            x = sm(F, r)
        x.block_until_ready()
        t_apply = (time.time() - t0) / reps
        # sequential depth in block steps (critical-path model)
        depth = {
            "thomas": 2 * nb,
            "chain": 4 * m + 2 * (n - 1),
            "spike": (4 * m + 2 * (n - 1)) * (1 + st.spike_refine),
        }[algo]
        results[algo] = dict(
            rebuild_s=round(t_rebuild, 3),
            rebuild_compile_s=round(t_compile, 1),
            apply_s=round(t_apply, 4),
            probe_rel=float(st._last_rel),
            depth_block_steps=depth,
        )
        print(f"{algo}: {results[algo]}", flush=True)
    # derived critical-path estimate: per-block-step cost from the
    # MEASURED thomas apply (its wall IS 2 nb sequential block steps on
    # any host), scaled by each variant's depth
    nb = results and (2 * st.plan.n * st.plan.nb_loc)
    per_step = results["thomas"]["apply_s"] / (2 * st.plan.n
                                               * st.plan.nb_loc)
    for algo, rec in results.items():
        rec["critical_path_apply_s"] = round(
            per_step * rec["depth_block_steps"], 4)
    out = dict(size=size, ndof=system.space.ndof, c=st.plan.c,
               nb_loc=st.plan.nb_loc, n_devices=st.plan.n,
               results=results)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
