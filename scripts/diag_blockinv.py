"""Measure jnp.linalg.inv vs blocked Schur-complement inversion on the TPU
at the bench Schur-block size (c=4488).

VERDICT r4 #4: the rebuild's Schur scan (2.6 s of 5.9 s amortized rebuild)
is bound by ~42 sequential f32 LU inversions of 4488^2 blocks that the MXU
mostly idles through. A 2x2 recursive block inversion

    S = [[A, B], [C, D]],  Ai = inv(A), Sc = D - C Ai B, Sci = inv(Sc)
    Sinv = [[Ai + (Ai B) Sci (C Ai), -(Ai B) Sci],
            [-Sci (C Ai),            Sci       ]]

replaces the LU panel factorization with six half-size matmuls per level
(pure MXU) and a small LU base case. Unpivoted, so: max-equilibrate first
(like fem/banded._inv64) and Newton-polish after; the production path's
probe_rel + reactive escalation ladder guards the rest.

Run on the real TPU:
    PYTHONUNBUFFERED=1 python scripts/diag_blockinv.py > /tmp/blockinv.log 2>&1
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

import vasp_tpu.utils.jaxconfig  # noqa: F401  (highest matmul precision)

C = int(os.environ.get("BLOCKINV_C", "4488"))
K = int(os.environ.get("BLOCKINV_K", "8"))  # scan length for timing
LEVELS = [int(x) for x in os.environ.get("BLOCKINV_LEVELS", "2,3").split(",")]


def inv_blocked(S, levels, polish=1):
    """Blocked inverse: `levels` rounds of 2x2 Schur splitting, LU base.

    Equilibrates (row/col max) before and Newton-polishes after, so the
    unpivoted elimination only has to produce an O(1e-2)-accurate seed.
    """
    rs = 1.0 / jnp.maximum(jnp.max(jnp.abs(S), axis=1), 1e-30)
    Ss = S * rs[:, None]
    cs = 1.0 / jnp.maximum(jnp.max(jnp.abs(Ss), axis=0), 1e-30)
    Ss = Ss * cs[None, :]

    def rec(M, lv):
        n = M.shape[0]
        if lv == 0 or n % 2:
            return jnp.linalg.inv(M)
        h = n // 2
        A = M[:h, :h]
        B = M[:h, h:]
        Cc = M[h:, :h]
        D = M[h:, h:]
        Ai = rec(A, lv - 1)
        AiB = Ai @ B
        Sc = D - Cc @ AiB
        Sci = rec(Sc, lv - 1)
        CAi = Cc @ Ai
        tr = -(AiB @ Sci)
        bl = -(Sci @ CAi)
        tl = Ai - AiB @ bl
        return jnp.concatenate(
            [jnp.concatenate([tl, tr], axis=1),
             jnp.concatenate([bl, Sci], axis=1)], axis=0)

    X = rec(Ss, levels)
    n = S.shape[0]
    I2 = 2.0 * jnp.eye(n, dtype=S.dtype)
    for _ in range(polish):
        X = X @ (I2 - Ss @ X)
    return cs[:, None] * X * rs[None, :]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    # Schur-block stand-in: random + strong row scaling spread (cond ~1e6
    # after the spread; the equilibration inside inv_blocked removes most
    # of it, as it does for the real blocks).
    A = rng.standard_normal((C, C)) / np.sqrt(C)
    scale = np.logspace(0, -5, C)[rng.permutation(C)]
    A = A * scale[:, None] + np.diag(np.full(C, 0.5))
    S0 = jnp.asarray(A.astype(np.float32))
    # K slightly-perturbed copies for a scan-timing that can't be CSE'd
    eps = jnp.asarray((rng.standard_normal((K, C, C))
                       * 1e-4 / np.sqrt(C)).astype(np.float32))
    Sk = S0[None] + eps

    def timed(name, fn):
        f = jax.jit(lambda Ss: jax.lax.map(fn, Ss))
        t0 = time.time()
        out = jax.block_until_ready(f(Sk))
        t_compile = time.time() - t0
        t0 = time.time()
        out = jax.block_until_ready(f(Sk))
        dt = (time.time() - t0) / K
        # accuracy of the LAST inverse
        X = out[-1]
        resid = jnp.linalg.norm(Sk[-1] @ X - jnp.eye(C, dtype=jnp.float32))
        print(f"{name:28s} {dt*1e3:9.2f} ms/inv   |SX-I|_F={float(resid):.3e}"
              f"   (compile {t_compile:.1f}s)", flush=True)
        return dt

    t_lu = timed("jnp.linalg.inv", jnp.linalg.inv)
    timed("inv + 1 polish (scan body)",
          lambda S: inv_blocked(S, 0, polish=1))
    for lv in LEVELS:
        timed(f"inv_blocked lv={lv} pol=1",
              lambda S, lv=lv: inv_blocked(S, lv, polish=1))
        timed(f"inv_blocked lv={lv} pol=2",
              lambda S, lv=lv: inv_blocked(S, lv, polish=2))
    print(f"LU baseline {t_lu*1e3:.2f} ms/inv; scan has ~42 of these",
          flush=True)


if __name__ == "__main__":
    main()
