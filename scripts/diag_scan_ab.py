"""A/B the Schur-scan factorization at full bench shape (nb=42, c=4488)
on the real TPU: current body (jnp.linalg.inv + 1 Newton polish) vs
blocked Schur-complement inversion (diag_blockinv.py measured 43.5 ->
28 ms/block on standalone inversions).

Run: PYTHONUNBUFFERED=1 python scripts/diag_scan_ab.py > /tmp/scan_ab.log 2>&1
"""
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

from vasp_tpu.fem import banded as banded_mod

C = int(os.environ.get("SCAN_C", "4488"))
NB = int(os.environ.get("SCAN_NB", "42"))


@jax.jit
def make_blocks(key):
    # diag-dominant f32 blocks so the Schur recursion stays benign:
    # this isolates TIMING; numerics are covered by the production probe.
    # Generated ON DEVICE — host-generated 10 GB took tens of minutes
    # through the axon tunnel.
    k1, k2, k3 = jax.random.split(key, 3)
    s = np.float32(0.1 / np.sqrt(C))
    D = jax.random.normal(k1, (NB, C, C), jnp.float32) * s \
        + jnp.eye(C, dtype=jnp.float32)[None]
    Cm = jax.random.normal(k2, (NB, C, C), jnp.float32) * (0.5 * s)
    Bm = jax.random.normal(k3, (NB, C, C), jnp.float32) * (0.5 * s)
    return Cm, D, Bm


def run(name, factorize):
    f = jax.jit(factorize, donate_argnums=(1,))
    for it in range(2):
        Cm, D, Bm = make_blocks(jax.random.PRNGKey(it))
        jax.block_until_ready((Cm, D, Bm))
        t0 = time.time()
        Sinv = jax.block_until_ready(f(Cm, D, Bm))
        dt = time.time() - t0
        print(f"{name:24s} iter{it} {dt:7.3f} s "
              f"({dt/NB*1e3:.1f} ms/block)", flush=True)
        s = float(jnp.linalg.norm(Sinv[-1]))
        del Sinv, Cm, D, Bm
        print(f"  |Sinv[-1]|={s:.3f}", flush=True)


def main():
    print(f"devices: {jax.devices()}  nb={NB} c={C}", flush=True)
    run("sinv32 (current)", banded_mod.factorize_banded_sinv32)
    run("sinv32 blocked lv3",
        lambda Cm, D, Bm: banded_mod.factorize_banded_lowmem(
            Cm, D, Bm, factor_dtype=jnp.float32, inv_levels=3))


if __name__ == "__main__":
    main()
