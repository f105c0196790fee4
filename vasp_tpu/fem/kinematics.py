"""Continuum kinematics and material models (JAX, pointwise).

Provides the same quantities the reference consumes from
``turtleFSI.modules.common`` — F_, J_, E, S, get_eig
(reference: src/vasp/postprocessing/postprocessing_fenics/compute_stress_strain.py:13
and src/vasp/simulations/simulation_common.py:9) — implemented as pure JAX
functions of the displacement gradient so they can be vmapped over cells x
quadrature points and differentiated for Newton linearization.

All functions take ``grad_d``: the 3x3 displacement gradient d d_i / d X_j in
the reference configuration.
"""
import jax
import jax.numpy as jnp

I3 = jnp.eye(3)


def _eye(dtype):
    """dtype-matched identity: kernels run in f32 (jacfwd memory/MXU speed)
    or f64 (residuals); a f64 constant would silently promote everything."""
    return jnp.eye(3, dtype=dtype)


def F_(grad_d):
    """Deformation gradient F = I + grad(d)."""
    return _eye(grad_d.dtype) + grad_d


def J_(grad_d):
    """Jacobian determinant J = det F."""
    from vasp_tpu.fem.smallmat import det3
    return det3(F_(grad_d))


def E_(grad_d):
    """Green-Lagrange strain, CANCELLATION-FREE form.

    E = (F^T F - I)/2 == (H + H^T + H^T H)/2 with H = grad(d), exactly.
    The second form never subtracts the identity, so in f32 the roundoff
    is RELATIVE to |E| (~1e-3 strains here) instead of absolute at
    eps_f32 ~ 6e-8 per C entry — this is what makes pure-f32 solid
    residual kernels f64-grade (scripts/diag_mixed_residual.py)."""
    H = grad_d
    return 0.5 * (H + H.T + H.T @ H)


# ---------------- material models ----------------
# Strain-energy based, parameterized by the GREEN-LAGRANGE STRAIN E rather
# than C = I + 2E: every invariant is expressed as its deviation from the
# stress-free state (I1-3 = 2 tr E, ln J = log1p(...)/2, ...), so small
# strains never ride on top of O(1) identity entries — the f32 element
# kernels are then f64-grade (measured: all-f32 residual error drops from
# 2.7e-6 to the noise floor of the OTHER blocks; diag_mixed_residual.py).
# S = 2 dW/dC = dW/dE via autodiff, so adding a model is one scalar
# function. Parameter keys match the reference's solid_properties dicts
# (reference: src/vasp/simulations/avf.py:76-80, predeform.py:71-72).


def _invariant_deltas(E):
    """(I1 - 3, I2 - 3, 2 ln J) of C = I + 2E, each cancellation-free.

    det(C) = det(I + 2E) = 1 + x with
    x = 2 tr E + 2 ((tr E)^2 - tr E^2) + 8 det E (exact 3x3 expansion),
    so 2 ln J = ln det C = log1p(x)."""
    from vasp_tpu.fem.smallmat import det3
    trE = jnp.trace(E)
    trE2 = jnp.trace(E @ E)
    dI1 = 2.0 * trE
    dI2 = 4.0 * trE + 2.0 * (trE ** 2 - trE2)
    x = 2.0 * trE + 2.0 * (trE ** 2 - trE2) + 8.0 * det3(E)
    return dI1, dI2, jnp.log1p(x)


def W_st_venant_kirchoff(E, props):
    mu, lam = props["mu_s"], props["lambda_s"]
    return 0.5 * lam * jnp.trace(E) ** 2 + mu * jnp.trace(E @ E)


def W_mooney_rivlin(E, props):
    """Compressible Mooney-Rivlin with (C01, C10, C11) + lambda_s volumetric
    term; stress-free at E = 0."""
    C01, C10, C11 = props["C01"], props["C10"], props["C11"]
    lam = props["lambda_s"]
    dI1, dI2, lndetC = _invariant_deltas(E)
    lnJ = 0.5 * lndetC
    return (
        C01 * dI1
        + C10 * dI2
        + C11 * dI1 * dI2
        + 0.5 * lam * lnJ ** 2
        - (2.0 * C01 + 4.0 * C10) * lnJ
    )


def W_linear_elastic(E, props):
    """Linear (St.Venant with linearized strain is not expressible in W(C);
    kept as StVenantKirchoff alias for small strains)."""
    return W_st_venant_kirchoff(E, props)


_MATERIALS = {
    "StVenantKirchoff": W_st_venant_kirchoff,
    "MooneyRivlin": W_mooney_rivlin,
    "LinearElastic": W_linear_elastic,
}


def S_(grad_d, props):
    """Second Piola-Kirchhoff stress S = 2 dW/dC = dW/dE for the material
    model named in props['material_model'] (default StVenantKirchoff,
    matching the reference default_variables). E is computed
    cancellation-free from grad_d (see E_)."""
    model = props.get("material_model", "StVenantKirchoff")
    W = _MATERIALS[model]
    E = E_(grad_d)

    def W_of_E(Esym):
        return W(Esym, props)

    dWdE = jax.grad(W_of_E)(E)
    # symmetrize: E is symmetric; grad wrt full matrix gives dW/dE_ij
    # treating entries independent -> S = (dWdE + dWdE^T)/2 + diagonal
    # correction folded in by symmetry of W's invariants
    return 0.5 * (dWdE + dWdE.T)


def piola1(grad_d, props):
    """First Piola-Kirchhoff stress P = F S."""
    return F_(grad_d) @ S_(grad_d, props)


def get_eig(T):
    """Largest eigenvalue of a symmetric 3x3 tensor, closed-form (Cardano),
    matching the reference's numpy implementation semantics
    (reference: src/vasp/postprocessing/postprocessing_h5py/postprocessing_h5py_common.py:734-801).
    Safe to vmap/jit; handles near-isotropic tensors."""
    q = jnp.trace(T) / 3.0
    B = T - q * _eye(T.dtype)
    p2 = jnp.sum(B * B) / 2.0  # = tr(B^2)/2 for symmetric B... use full sum
    p = jnp.sqrt(jnp.maximum(p2 / 3.0, 1e-300))
    # r = det(B/p)/2 in [-1,1]
    from vasp_tpu.fem.smallmat import det3
    r = det3(B) / jnp.maximum(2.0 * p ** 3, 1e-300)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    eig_max = q + 2.0 * p * jnp.cos(phi)
    # degenerate isotropic case: all eigenvalues = q
    return jnp.where(p2 <= 1e-30, q, eig_max)
