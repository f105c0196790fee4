"""Decompose the emulated-f64 residual cost at full bench size.

Times, on the TPU, at the 20,832-cell bench mesh:
  - full f64 residual (element work f64, accumulate f64)
  - hybrid f32 residual (element work f32, accumulate f64)
  - element work only (no segment-sum), f64 and f32
  - segment-sum only (f64)
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


def timeit(f, *a, n=5):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    size = os.environ.get("SIZE", "full")
    n_theta, n_z = bench.SIZES[size]
    mesh, system, bc_set, load = bench.build(n_theta, n_z, quad_degree=3)
    from vasp_tpu.fem.assembly import Assembler, build_scatter_plan

    ndof = system.space.ndof
    plan0 = build_scatter_plan(system.assembler.blocks, ndof)
    asm = Assembler(ndof, system.assembler.blocks, scatter_plan=plan0)
    print(f"cells={mesh.num_cells} ndof={ndof}", flush=True)

    U = jnp.asarray(np.random.default_rng(0).normal(0, 1e-4, ndof))
    U0 = jnp.zeros(ndof)

    r64 = jax.jit(lambda u: asm.residual(u, U0))
    r32 = jax.jit(lambda u: asm.residual(u, U0, dtype=jnp.float32))

    def elems_only(u, dty):
        parts = [b.residual_local(u, U0, dtype=dty) for b in asm.blocks]
        return sum(p.sum() for p in parts)

    e64 = jax.jit(lambda u: elems_only(u, None))
    e32 = jax.jit(lambda u: elems_only(u, jnp.float32))

    plan = asm.scatter_plan
    nflat = int(plan["order"].shape[0])
    flat64 = jnp.asarray(np.random.default_rng(1).normal(size=nflat))

    seg64 = jax.jit(lambda f: jax.ops.segment_sum(
        f[plan["order"]], plan["segids"], num_segments=ndof,
        indices_are_sorted=True))

    print(f"resid f64      : {timeit(r64, U)*1e3:9.1f} ms", flush=True)
    print(f"resid f32-hyb  : {timeit(r32, U)*1e3:9.1f} ms", flush=True)
    print(f"elems f64 only : {timeit(e64, U)*1e3:9.1f} ms", flush=True)
    print(f"elems f32 only : {timeit(e32, U)*1e3:9.1f} ms", flush=True)
    print(f"segsum f64 only: {timeit(seg64, flat64)*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
