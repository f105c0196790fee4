"""Phase-level timing of Assembler.matvec at bench size: gather+einsum vs
sorted-order gather vs cumsum vs boundary-diff, to find the 41 ms."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_vasp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
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
    mesh, system, bc_set, load = bench.build(16, 62, quad_degree=3)
    asm = system.assembler
    ndof = system.space.ndof
    U = system.zero_state()
    jacs = jax.jit(lambda u: asm.element_jacobians(
        u, U, chunk=8192, dtype=jnp.float32))(U)
    jax.block_until_ready(jacs)
    x = jnp.ones(ndof, jnp.float32)
    sizes = [tuple(np.asarray(b.dofs).shape) for b in asm.blocks]
    print("block sizes:", sizes, flush=True)
    print("plan keys:", None if asm.scatter_plan is None
          else list(asm.scatter_plan.keys()), flush=True)

    full = jax.jit(lambda j, v: asm.matvec(j, v))
    print(f"matvec full: {timeit(lambda v: full(jacs, v), x)*1e3:.2f} ms",
          flush=True)

    @jax.jit
    def einsum_only(j, v):
        acc = 0.0
        for b, A in zip(asm.blocks, j):
            xe = v[b.dofs].astype(A.dtype)
            ye = jnp.einsum("kab,kb->ka", A, xe,
                            preferred_element_type=A.dtype)
            acc = acc + ye.sum()
        return acc
    print(f"gather+einsum only: {timeit(lambda v: einsum_only(jacs, v), x)*1e3:.2f} ms", flush=True)

    parts0 = [jnp.ones(tuple(np.asarray(b.dofs).shape), jnp.float32)
              for b in asm.blocks]
    acc_f = jax.jit(lambda ps: asm._accumulate(ps, jnp.float32))
    print(f"accumulate only: {timeit(acc_f, parts0)*1e3:.2f} ms", flush=True)

if __name__ == "__main__":
    main()
