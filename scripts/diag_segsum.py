"""Decompose the segment-sum accumulation cost and test alternatives."""
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


def timeit(f, *a, n=10):
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
    from vasp_tpu.fem.assembly import build_scatter_plan

    ndof = system.space.ndof
    plan = build_scatter_plan(system.assembler.blocks, ndof)
    order = plan["order"]
    segids = plan["segids"]
    nflat = int(order.shape[0])
    print(f"ndof={ndof} nflat={nflat}", flush=True)

    rng = np.random.default_rng(0)
    flat64 = jnp.asarray(rng.normal(size=nflat))
    flat32 = flat64.astype(jnp.float32)
    sorted64 = jax.block_until_ready(jax.jit(lambda f: f[order])(flat64))

    gather64 = jax.jit(lambda f: f[order])
    gather32 = jax.jit(lambda f: f[order])
    seg_only64 = jax.jit(lambda s: jax.ops.segment_sum(
        s, segids, num_segments=ndof, indices_are_sorted=True))
    seg_unsorted64 = jax.jit(lambda s: jax.ops.segment_sum(
        s, segids, num_segments=ndof))

    # cumsum-based segmented reduction: R[i] = cs[end_i] - cs[start_i]
    seg_np = np.asarray(segids)
    starts = np.searchsorted(seg_np, np.arange(ndof), side="left")
    ends = np.searchsorted(seg_np, np.arange(ndof), side="right")
    starts_j = jnp.asarray(starts.astype(np.int32))
    ends_j = jnp.asarray(ends.astype(np.int32))

    def cumsum_seg(s):
        cs = jnp.concatenate([jnp.zeros(1, s.dtype), jnp.cumsum(s)])
        return cs[ends_j] - cs[starts_j]

    cumsum_seg_j = jax.jit(cumsum_seg)

    # f32 gather of hi/lo words then f64 combine
    def gather_split(f):
        hi = f.astype(jnp.float32)
        lo = (f - hi.astype(jnp.float64)).astype(jnp.float32)
        hs = hi[order].astype(jnp.float64) + lo[order].astype(jnp.float64)
        return hs

    gather_split_j = jax.jit(gather_split)

    print(f"gather f64     : {timeit(gather64, flat64)*1e3:8.1f} ms", flush=True)
    print(f"gather f32     : {timeit(gather32, flat32)*1e3:8.1f} ms", flush=True)
    print(f"gather split2  : {timeit(gather_split_j, flat64)*1e3:8.1f} ms", flush=True)
    print(f"segsum sorted64: {timeit(seg_only64, sorted64)*1e3:8.1f} ms", flush=True)
    print(f"segsum unsort64: {timeit(seg_unsorted64, sorted64)*1e3:8.1f} ms", flush=True)
    print(f"cumsum seg 64  : {timeit(cumsum_seg_j, sorted64)*1e3:8.1f} ms", flush=True)
    # end-to-end alternatives
    e2e_now = jax.jit(lambda f: jax.ops.segment_sum(
        f[order], segids, num_segments=ndof, indices_are_sorted=True))
    e2e_cs = jax.jit(lambda f: cumsum_seg(f[order]))
    print(f"e2e now (g+ss) : {timeit(e2e_now, flat64)*1e3:8.1f} ms", flush=True)
    print(f"e2e gather+cs  : {timeit(e2e_cs, flat64)*1e3:8.1f} ms", flush=True)
    # correctness
    a = np.asarray(e2e_now(flat64))
    b = np.asarray(e2e_cs(flat64))
    print(f"max |now-cs| = {np.abs(a-b).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
