"""Batched element GEMV formulations A/B on the TPU: einsum(dot_general)
vs multiply+reduce (VPU) vs matmul, at bench-size element counts."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_vasp"))
import jax.numpy as jnp
import numpy as np

def timeit(f, *a, n=20):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n

K, n = 20832, 64
rng = np.random.default_rng(0)
A = jnp.asarray(rng.standard_normal((K, n, n)), jnp.float32)
x = jnp.asarray(rng.standard_normal((K, n)), jnp.float32)

f_ein = jax.jit(lambda A, x: jnp.einsum("kab,kb->ka", A, x,
                                        preferred_element_type=jnp.float32))
f_mul = jax.jit(lambda A, x: jnp.sum(A * x[:, None, :], axis=2))
f_mm = jax.jit(lambda A, x: jnp.matmul(A, x[..., None])[..., 0])

r_ein = f_ein(A, x)
for name, f in (("einsum", f_ein), ("mul+sum", f_mul), ("matmul", f_mm)):
    err = float(jnp.abs(f(A, x) - r_ein).max())
    print(f"{name}: {timeit(f, A, x)*1e3:.2f} ms (maxerr {err:.1e})",
          flush=True)
# traffic bound: A is 341 MB
print(f"traffic bound ~{A.size*4/8.1e11*1e3:.2f} ms at 810 GB/s", flush=True)
