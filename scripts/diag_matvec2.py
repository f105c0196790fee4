"""Matvec accumulate-variant A/B at bench size (production plan assembler):
cumsum-diff plan vs plain scatter vs sorted segment_sum, f32."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_vasp"))
import jax.numpy as jnp
import numpy as np
import bench

def timeit(f, *a, n=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n

def main():
    from vasp_tpu.fem.assembly import Assembler, build_scatter_plan

    mesh, system, bc_set, load = bench.build(16, 62, quad_degree=3)
    asm0 = system.assembler
    ndof = system.space.ndof
    U = system.zero_state()
    jacs = jax.jit(lambda u: asm0.element_jacobians(
        u, U, chunk=8192, dtype=jnp.float32))(U)
    jax.block_until_ready(jacs)
    x = jnp.ones(ndof, jnp.float32)

    plan = build_scatter_plan(asm0.blocks, ndof)
    asm_plan = Assembler(ndof, asm0.blocks, scatter_plan=plan)
    print("plan keys:", list(plan.keys()), flush=True)

    f_plan = jax.jit(lambda j, v: asm_plan.matvec(j, v))
    f_scat = jax.jit(lambda j, v: asm0.matvec(j, v))
    r_plan = f_plan(jacs, x)
    r_scat = f_scat(jacs, x)
    err = float(jnp.abs(r_plan - r_scat).max() / jnp.abs(r_plan).max())
    print(f"plan-cumsum: {timeit(lambda v: f_plan(jacs, v), x)*1e3:.2f} ms",
          flush=True)
    print(f"plain scatter: {timeit(lambda v: f_scat(jacs, v), x)*1e3:.2f} ms "
          f"(rel dev {err:.1e})", flush=True)

    # sorted segment_sum via the plan's order/segids
    order = jnp.asarray(plan["order"])
    segids = jnp.asarray(plan["segids"])

    @jax.jit
    def f_seg(j, v):
        parts = []
        for b, A in zip(asm_plan.blocks, j):
            xe = v[b.dofs].astype(A.dtype)
            parts.append(asm_plan._elem_gemv(A, xe))
        flat = jnp.concatenate([p.reshape(-1) for p in parts])[order]
        return jax.ops.segment_sum(flat, segids, num_segments=ndof,
                                   indices_are_sorted=True)
    r_seg = f_seg(jacs, x)
    err2 = float(jnp.abs(r_seg - r_plan).max() / jnp.abs(r_plan).max())
    print(f"sorted segsum: {timeit(lambda v: f_seg(jacs, v), x)*1e3:.2f} ms "
          f"(rel dev {err2:.1e})", flush=True)

if __name__ == "__main__":
    main()
