"""Element-block additive Schwarz preconditioner (batched, MXU-friendly).

The monolithic FSI Jacobian is a saddle-point operator (zero pressure
diagonal), so plain Jacobi fails. Overlapping additive Schwarz on the
element blocks uses exactly the batched (K, 64, 64) element Jacobians the
assembler already produces: one batched inverse at Jacobian-rebuild time,
then each application is gather -> batched matvec -> scatter -> multiplicity
scaling. Inverses are computed in f32 (preconditioner accuracy is
irrelevant to the converged answer; XLA:TPU has no f64 LU) while the outer
Krylov iteration stays f64.
"""
import jax
import jax.numpy as jnp


def build_schwarz(blocks, jacs, bc_mask, ndof, eps=1e-8):
    """Returns (pinv_list, multiplicity). bc rows/cols replaced by identity;
    small diagonal regularization protects singular local saddle blocks."""
    pinv = []
    mult = jnp.zeros(ndof)
    for b, A in zip(blocks, jacs):
        nloc = A.shape[-1]
        bcm = bc_mask[b.dofs]  # (K,nloc) bool
        eye = jnp.eye(nloc, dtype=A.dtype)
        Amod = jnp.where(bcm[:, :, None], eye[None], A)
        Amod = jnp.where(bcm[:, None, :] & ~bcm[:, :, None], 0.0, Amod)
        diag_scale = jnp.maximum(jnp.abs(jnp.diagonal(Amod, axis1=1, axis2=2)),
                                 1.0)
        Amod = Amod + eps * jax.vmap(jnp.diag)(diag_scale)
        Ainv = jnp.linalg.inv(Amod.astype(jnp.float32)).astype(A.dtype)
        pinv.append(Ainv)
        mult = mult.at[b.dofs.reshape(-1)].add(1.0)
    # raw (unclamped) multiplicity: callers reduce across shards first,
    # then clamp
    return pinv, mult


def apply_schwarz(blocks, pinv, r):
    """Unscaled additive-Schwarz application; divide by the (globally
    reduced) multiplicity outside."""
    y = jnp.zeros_like(r)
    for b, Ai in zip(blocks, pinv):
        from vasp_tpu.fem.banded import bgemv

        ye = bgemv(Ai, r[b.dofs])
        y = y.at[b.dofs.reshape(-1)].add(ye.reshape(-1))
    return y
