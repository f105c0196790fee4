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
          atol=0.0, reduce_fn=None):
    """Solve A x = b. Returns (x, info) with info = (true_resnorm, ncycles).

    matvec: x -> A x;  M: right preconditioner application r -> M r
    (approximate A^{-1}); restart: Krylov dimension per cycle; cycles: max
    outer restarts; tol: relative residual target |b - Ax| <= tol*|b|.

    reduce_fn: cross-shard sum (e.g. lax.psum bound to the mesh axis) for
    SPMD execution under shard_map where b/x/V rows are dof-sharded — every
    inner product and Gram-Schmidt projection is locally contracted then
    reduced; everything else (H, Givens, back-substitution) is replicated
    scalar work."""
    M = M or _identity
    red = reduce_fn if reduce_fn is not None else (lambda v: v)
    n = b.shape[0]
    m = restart
    dtype = b.dtype

    def _norm(v):
        return jnp.sqrt(red(jnp.dot(v, v)))

    normb = _norm(b)
    target = jnp.maximum(tol * normb, atol)
    x = jnp.zeros_like(b) if x0 is None else x0

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = _norm(r)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(r / safe_beta)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def arn_cond(carry):
            # early exit: |g[j]| is the RUNNING residual norm of the
            # original system (right preconditioning leaves it unchanged) —
            # without this every cycle burns all `restart` matvecs even
            # after converging at iteration 5
            j, V, H, cs, sn, g = carry
            return (j < m) & (jnp.abs(g[j]) > target)

        def body(carry):
            j, V, H, cs, sn, g = carry
            w = matvec(M(V[j]))
            # batched classical Gram-Schmidt with one reorthogonalization
            # (CGS2, numerically equivalent to MGS): unfilled V rows are
            # exactly zero so V @ w projects onto the filled basis only —
            # two (m+1, n) matmuls replace m+1 SEQUENTIAL masked dots
            # (the sequential-latency hot spot on TPU)
            h1 = red(V @ w)
            w = w - V.T @ h1
            h2 = red(V @ w)
            w = w - V.T @ h2
            h = h1 + h2
            hj1 = _norm(w)
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
            return (j + 1, V, H, cs, sn, g)

        j, V, H, cs, sn, g = jax.lax.while_loop(
            arn_cond, body, (0, V, H, cs, sn, g))
        # back-substitution below is exact for an early exit at j < m:
        # untouched H columns are zero, so their |H[i,i]| <= 1e-300 guard
        # yields y[i] = 0 and they drop out of the update

        # back-substitution: H[:m,:m] (upper triangular) y = g[:m]
        def backsub(i_rev, y):
            i = m - 1 - i_rev
            # y[k] for k <= i is still 0, so a full row dot equals the
            # strict-upper sum (one vectorized dot, not m scalar ops)
            s = jnp.dot(H[i, :m], y)
            hii = H[i, i]
            yi = (g[i] - s) / jnp.where(jnp.abs(hii) > 1e-300, hii, 1.0)
            return y.at[i].set(jnp.where(jnp.abs(hii) > 1e-300, yi, 0.0))

        y = jax.lax.fori_loop(0, m, backsub, jnp.zeros(m, dtype))
        dx = M(V[:m].T @ y)
        return x + dx, j

    def cond(carry):
        x, k, rnorm, it = carry
        return (k < cycles) & (rnorm > target)

    def body(carry):
        x, k, _, it = carry
        x, j = arnoldi_cycle(x)
        rnorm = _norm(b - matvec(x))
        return (x, k + 1, rnorm, it + j)

    r0 = _norm(b - matvec(x))
    x, k, rnorm, inner = jax.lax.while_loop(cond, body, (x, 0, r0, 0))
    # info: (true final residual norm, cycles used, TOTAL inner iterations
    # across cycles — the matvec/preconditioner-application count)
    return x, (rnorm, k, inner)
