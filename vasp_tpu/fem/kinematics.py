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
    """Green-Lagrange strain E = (F^T F - I)/2."""
    F = F_(grad_d)
    return 0.5 * (F.T @ F - _eye(F.dtype))


# ---------------- material models ----------------
# Strain-energy based: S = 2 dW/dC via autodiff, so adding a model is one
# scalar function. Parameter keys match the reference's solid_properties
# dicts (reference: src/vasp/simulations/avf.py:76-80, predeform.py:71-72).


def _invariants(C):
    I1 = jnp.trace(C)
    I2 = 0.5 * (I1 ** 2 - jnp.trace(C @ C))
    from vasp_tpu.fem.smallmat import det3
    J = jnp.sqrt(det3(C))
    return I1, I2, J


def W_st_venant_kirchoff(C, props):
    mu, lam = props["mu_s"], props["lambda_s"]
    E = 0.5 * (C - _eye(C.dtype))
    return 0.5 * lam * jnp.trace(E) ** 2 + mu * jnp.trace(E @ E)


def W_mooney_rivlin(C, props):
    """Compressible Mooney-Rivlin with (C01, C10, C11) + lambda_s volumetric
    term; stress-free at C = I."""
    C01, C10, C11 = props["C01"], props["C10"], props["C11"]
    lam = props["lambda_s"]
    I1, I2, J = _invariants(C)
    lnJ = jnp.log(J)
    return (
        C01 * (I1 - 3.0)
        + C10 * (I2 - 3.0)
        + C11 * (I1 - 3.0) * (I2 - 3.0)
        + 0.5 * lam * lnJ ** 2
        - (2.0 * C01 + 4.0 * C10) * lnJ
    )


def W_linear_elastic(C, props):
    """Linear (St.Venant with linearized strain is not expressible in W(C);
    kept as StVenantKirchoff alias for small strains)."""
    return W_st_venant_kirchoff(C, props)


_MATERIALS = {
    "StVenantKirchoff": W_st_venant_kirchoff,
    "MooneyRivlin": W_mooney_rivlin,
    "LinearElastic": W_linear_elastic,
}


def S_(grad_d, props):
    """Second Piola-Kirchhoff stress S = 2 dW/dC for the material model named
    in props['material_model'] (default StVenantKirchoff, matching the
    reference default_variables)."""
    model = props.get("material_model", "StVenantKirchoff")
    W = _MATERIALS[model]
    F = F_(grad_d)
    C = F.T @ F

    def W_of_C(Csym):
        return W(Csym, props)

    dWdC = jax.grad(W_of_C)(C)
    # symmetrize: C is symmetric; grad wrt full matrix gives dW/dC_ij treating
    # entries independent -> S = (dWdC + dWdC^T)
    return dWdC + dWdC.T


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
