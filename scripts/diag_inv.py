"""Cost split of the banded factorization's per-block work on TPU:
linalg.inv vs matmul at c=4488."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_vasp"))
import jax.numpy as jnp
import numpy as np

def timeit(f, *a, n=5):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n

c = 4488
rng = np.random.default_rng(0)
S = jnp.asarray(rng.standard_normal((c, c)), jnp.float32) + 10.0*jnp.eye(c, dtype=jnp.float32)
f_inv = jax.jit(jnp.linalg.inv)
f_mm = jax.jit(lambda a: a @ a)
f_lu = jax.jit(lambda a: jax.scipy.linalg.lu_factor(a)[0])
print(f"inv:    {timeit(f_inv, S)*1e3:.1f} ms", flush=True)
print(f"matmul: {timeit(f_mm, S)*1e3:.1f} ms", flush=True)
print(f"lu_factor: {timeit(f_lu, S)*1e3:.1f} ms", flush=True)
