"""Matrix-free right-preconditioned GMRES, built for XLA/TPU.

Why not jax.scipy.sparse.linalg.gmres: its "batched" mode unrolls the whole
restart cycle into the graph (compile time explodes at restart ~ 40+), its
"incremental" mode rebuilds the Krylov projection per iteration, and both
internally use primitives without f64 TPU lowerings in places. This
implementation:

- fixed-shape Arnoldi basis (restart+1, n) updated with dynamic_update_slice
  inside lax.fori_loop — compact graph, compile time independent of restart,
- modified Gram-Schmidt with masked inner loop (no dynamic shapes),
- Givens rotations applied on the fly (running residual norm for free),
- manual back-substitution (no TriangularSolve/LU/QR primitives -> f64-safe
  on TPU),
- right preconditioning: the reported residual is the TRUE residual of the
  original system, so Newton tolerances are meaningful.

Replaces the reference's MUMPS direct solve of the monolithic Jacobian
(reference: src/vasp/simulations/offset_stenosis.py:44) with the
matrix-free Newton-Krylov path (SURVEY.md §7 build plan step 3).
"""
from functools import partial

import jax
import jax.numpy as jnp


def _identity(x):
    return x


def gmres(matvec, b, M=None, x0=None, restart=30, cycles=4, tol=1e-5,
          atol=0.0):
    """Solve A x = b. Returns (x, info) with info = (true_resnorm, ncycles).

    matvec: x -> A x;  M: right preconditioner application r -> M r
    (approximate A^{-1}); restart: Krylov dimension per cycle; cycles: max
    outer restarts; tol: relative residual target |b - Ax| <= tol*|b|."""
    M = M or _identity
    n = b.shape[0]
    m = restart
    dtype = b.dtype
    normb = jnp.linalg.norm(b)
    target = jnp.maximum(tol * normb, atol)
    x = jnp.zeros_like(b) if x0 is None else x0

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(r / safe_beta)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def body(j, carry):
            V, H, cs, sn, g = carry
            w = matvec(M(V[j]))
            # modified Gram-Schmidt (masked full-width loop)
            def mgs(i, wh):
                w, h = wh
                active = i <= j
                hij = jnp.where(active, jnp.dot(V[i], w), 0.0)
                w = w - hij * V[i]
                h = h.at[i].set(hij)
                return (w, h)

            w, h = jax.lax.fori_loop(0, m + 1, mgs, (w, jnp.zeros(m + 1, dtype)))
            hj1 = jnp.linalg.norm(w)
            h = h.at[j + 1].set(hj1)
            V = V.at[j + 1].set(w / jnp.where(hj1 > 0, hj1, 1.0))

            # apply previous Givens rotations to the new column
            def rot(i, h):
                active = i < j
                hi = jnp.where(active, cs[i] * h[i] + sn[i] * h[i + 1], h[i])
                hi1 = jnp.where(active, -sn[i] * h[i] + cs[i] * h[i + 1],
                                h[i + 1])
                return h.at[i].set(hi).at[i + 1].set(hi1)

            h = jax.lax.fori_loop(0, m, rot, h)
            # new rotation to annihilate h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            safe = jnp.where(denom > 0, denom, 1.0)
            c = jnp.where(denom > 0, h[j] / safe, 1.0)
            s = jnp.where(denom > 0, h[j + 1] / safe, 0.0)
            h = h.at[j].set(c * h[j] + s * h[j + 1]).at[j + 1].set(0.0)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            gj = g[j]
            g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            H = H.at[:, j].set(h[: m + 1])
            return (V, H, cs, sn, g)

        V, H, cs, sn, g = jax.lax.fori_loop(0, m, body,
                                            (V, H, cs, sn, g))

        # back-substitution: H[:m,:m] (upper triangular) y = g[:m]
        def backsub(i_rev, y):
            i = m - 1 - i_rev

            def dot_upper(k, acc):
                return acc + jnp.where(k > i, H[i, k] * y[k], 0.0)

            s = jax.lax.fori_loop(0, m, dot_upper, jnp.array(0.0, dtype))
            hii = H[i, i]
            yi = (g[i] - s) / jnp.where(jnp.abs(hii) > 1e-300, hii, 1.0)
            return y.at[i].set(jnp.where(jnp.abs(hii) > 1e-300, yi, 0.0))

        y = jax.lax.fori_loop(0, m, backsub, jnp.zeros(m, dtype))
        dx = M(V[:m].T @ y)
        return x + dx

    def cond(carry):
        x, k, rnorm = carry
        return (k < cycles) & (rnorm > target)

    def body(carry):
        x, k, _ = carry
        x = arnoldi_cycle(x)
        rnorm = jnp.linalg.norm(b - matvec(x))
        return (x, k + 1, rnorm)

    r0 = jnp.linalg.norm(b - matvec(x))
    x, k, rnorm = jax.lax.while_loop(cond, body, (x, 0, r0))
    return x, (rnorm, k)
