"""Monolithic ALE FSI variational forms as batched JAX element kernels.

Discretization contract (rebuilt from the reference's problem files and
serialized solver config — see SURVEY.md §2.3):

- mixed unknown (d, v, p): P2 vector displacement, P2 vector velocity,
  P1 pressure on tets (Taylor-Hood),
- theta-scheme in time (theta=0.501 "shifted Crank-Nicolson" production,
  theta=1.0 backward Euler for prestress,
  reference: src/vasp/simulations/offset_stenosis.py:40, predeform.py:39),
- fluid: incompressible Navier-Stokes in ALE form on the *reference* domain,
- solid: total-Lagrangian hyperelasticity (StVenantKirchoff / MooneyRivlin),
- mesh lifting: laplace (constant/small_constant/volume/volume_change) or
  elastic, on the fluid domain
  (reference: src/vasp/simulations/cylinder.py:65-66),
- Robin BC on the solid outer wall: (k_s d + c_s v)·psi ds
  (reference: src/vasp/simulations/aneurysm.py:73-76),
- weak interface pressure on FSI facets: p(t) <n+, psi+> dS with the normal
  taken from the solid ('+') side (reference: src/vasp/simulations/cylinder.py:160-169).

Element kernels are pure functions (u_local, u_old_local, geometry) ->
local residual; Newton Jacobians are their exact linearizations via
jax.jacfwd, giving batched (Nc, 64, 64) element matrices that map straight
onto the TPU MXU.

Fluid form implemented (equivalent discretization of the reference's ALE
form; the continuity term uses div_ALE(v) = tr(grad v F^-1), avoiding basis
second derivatives):

  rho_f/dt J(d) (v - v0)·psi
  + th rho_f J(d)  [grad v  F(d)^-1  (v  - w)]·psi
  + (1-th) rho_f J(d0)[grad v0 F(d0)^-1 (v0 - w)]·psi        w = (d-d0)/dt
  + th J(d) sig_v(v,d) F(d)^-T : grad psi
  + (1-th) J(d0) sig_v(v0,d0) F(d0)^-T : grad psi
  - J(d) p F(d)^-T : grad psi                                 (pressure implicit)
  + J(d) tr(grad v F(d)^-1) gamma                             (continuity)

  sig_v(v,d) = mu_f (grad v F^-1 + F^-T grad v^T)

Solid form:

  rho_s/dt (v - v0)·psi + th P(d):grad psi + (1-th) P(d0):grad psi
  - rho_s g·psi
  rho_s [ (d - d0)/dt - (th v + (1-th) v0) ]·phi              (kinematic)
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vasp_tpu.fem.kinematics import S_
from vasp_tpu.fem.smallmat import det3, inv3
from vasp_tpu.fem.quadrature import tet_quadrature, tri_quadrature
from vasp_tpu.fem.shape import p1_tet, p2_tet, p2_tri


# constant P1 reference gradients on the tet [1-x-y-z, x, y, z]
_P1GRAD = np.array([[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0],
                    [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])


def _unpack_local(u):
    d = u[:30].reshape(10, 3)
    v = u[30:60].reshape(10, 3)
    p = u[60:64]
    return d, v, p


def _pack_local(rd, rv, rp):
    return jnp.concatenate([rd.reshape(-1), rv.reshape(-1), rp])


def _tabulate(quad_degree):
    pts, wq = tet_quadrature(quad_degree)
    N1, _ = p1_tet(pts)
    N2, dN2 = p2_tet(pts)
    return (
        jnp.asarray(wq),
        jnp.asarray(N1),
        jnp.asarray(N2),
        jnp.asarray(dN2),
    )


def make_fluid_kernel(
    rho_f,
    mu_f,
    dt,
    theta,
    lift="laplace",
    lift_sub="constant",
    lift_coeff=1.0,
    quad_degree=6,
    p_stab=0.0,
):
    """Fluid element residual kernel (ALE Navier-Stokes + mesh lifting).

    Returns kernel(u (64,), u0 (64,), Jinv (3,3), detJ (), vol ()) -> (64,).
    lift_coeff carries sub_type-dependent global scaling (e.g. 0.01*hmin^2
    for 'small_constant').
    """
    wq0, N10, N20, dN20 = _tabulate(quad_degree)
    th = float(theta)

    def kernel(u, u0, Jinv, detJ, vol):
        # dtype-polymorphic: tabulated constants follow the input dtype so
        # jacfwd can run natively in f32 (half the temp HBM, full MXU rate)
        dty = u.dtype
        wq, N1, N2, dN2 = (wq0.astype(dty), N10.astype(dty),
                           N20.astype(dty), dN20.astype(dty))
        de, ve, pe = _unpack_local(u)
        d0e, v0e, _ = _unpack_local(u0)
        G2 = dN2 @ Jinv  # (nq,10,3) physical gradients of P2 basis

        # quadrature-point values
        d_q = N2 @ de            # (nq,3)
        v_q = N2 @ ve
        v0_q = N2 @ v0e
        p_q = N1 @ pe            # (nq,)
        w_q = (d_q - (N2 @ d0e)) / dt  # mesh velocity

        grad = lambda coeff: jnp.einsum("ai,qaj->qij", coeff, G2)
        gd, gd0 = grad(de), grad(d0e)
        gv, gv0 = grad(ve), grad(v0e)

        eye = jnp.eye(3, dtype=dty)
        F = eye + gd
        F0 = eye + gd0
        Jd = det3(F)
        J0 = det3(F0)
        Fi = inv3(F, Jd)
        Fi0 = inv3(F0, J0)

        # ---- momentum ----
        # mass
        mom_val = rho_f / dt * Jd[:, None] * (v_q - v0_q)  # (nq,3) ·psi terms
        # convection (theta split), relative to mesh velocity w
        gvFi = jnp.einsum("qik,qkj->qij", gv, Fi)
        gvFi0 = jnp.einsum("qik,qkj->qij", gv0, Fi0)
        conv_n = jnp.einsum("qij,qj->qi", gvFi, v_q - w_q)
        conv_o = jnp.einsum("qij,qj->qi", gvFi0, v0_q - w_q)
        mom_val += rho_f * (th * Jd[:, None] * conv_n + (1 - th) * J0[:, None] * conv_o)

        # stress : grad psi  (gradient-test terms, (nq,3,3))
        sig_n = mu_f * (gvFi + jnp.swapaxes(gvFi, 1, 2))
        sig_o = mu_f * (gvFi0 + jnp.swapaxes(gvFi0, 1, 2))
        mom_grad = th * Jd[:, None, None] * jnp.einsum("qij,qkj->qik", sig_n, Fi)
        mom_grad += (1 - th) * J0[:, None, None] * jnp.einsum(
            "qij,qkj->qik", sig_o, Fi0
        )
        # pressure, fully implicit: -J p F^-T
        mom_grad -= (Jd * p_q)[:, None, None] * jnp.swapaxes(Fi, 1, 2)

        rv = jnp.einsum("q,qa,qi->ai", wq * detJ, N2, mom_val)
        rv += jnp.einsum("q,qij,qaj->ai", wq * detJ, mom_grad, G2)

        # ---- continuity ----
        divv = Jd * jnp.einsum("qij,qji->q", gv, Fi)
        rp = jnp.einsum("q,q,qb->b", wq * detJ, divv, N1)
        if p_stab:
            # Brezzi-Pitkaranta pressure stabilization:
            #   rp += (p_stab h^2 / mu_f) int grad p . grad q
            # Diagnosed on the reference fixture meshes (coarse, 2-3
            # elements across the lumen, velocity Dirichlet on almost every
            # boundary): the P2/P1 pair is inf-sup-MARGINAL — sigma_min(J)
            # ~ 7e-12 with (p,v) near-null saddle modes, so exact Newton
            # directions carry O(1e3) spurious pressure/velocity components
            # that the quadratic convection term blows up (the measured
            # predeform/stenosis slow tails). The stabilization lifts those
            # modes; consistency error is O(p_stab h^2) in mass balance.
            dN1c = jnp.asarray(_P1GRAD, dtype=dty)  # (4,3) const gradients
            G1 = dN1c @ Jinv  # (4,3)
            gp = pe @ G1  # (3,) grad p (P1 -> constant per cell)
            h2 = (6.0 * vol) ** (2.0 / 3.0)
            rp = rp + (p_stab * h2 / mu_f) * vol * (G1 @ gp)

        # ---- mesh lifting ----
        # biharmonic: the element kernel carries the FIRST Laplace
        # application (also the Ruiz/preconditioner surrogate); the
        # L M^-1 L - L correction is added globally by fem/biharmonic.py
        if lift in ("laplace", "biharmonic"):
            if lift_sub == "volume":
                alpha = lift_coeff / vol
                a_q = jnp.full(gd.shape[0], alpha, dtype=dty)
            elif lift_sub == "volume_change":
                a_q = lift_coeff / Jd
            else:  # constant / small_constant (coeff baked into lift_coeff)
                a_q = jnp.full(gd.shape[0], lift_coeff, dtype=dty)
            rd = jnp.einsum("q,qij,qaj->ai", wq * detJ * a_q, gd, G2)
        elif lift == "elastic":
            eps = 0.5 * (gd + jnp.swapaxes(gd, 1, 2))
            sig = 2.0 * eps + jnp.trace(eps, axis1=1, axis2=2)[:, None, None] * eye
            rd = jnp.einsum("q,qij,qaj->ai", wq * detJ * lift_coeff, sig, G2)
        elif lift == "no_extrapolation":
            rd = jnp.zeros((10, 3), dtype=dty)
        else:
            raise ValueError(f"unknown extrapolation: {lift}")

        return _pack_local(rd, rv, rp)

    return kernel


def make_solid_kernel(props, dt, theta, gravity=None, quad_degree=6):
    """Solid element residual kernel (total-Lagrangian hyperelasticity).

    props: solid_properties dict with material_model/rho_s/mu_s/lambda_s/C01...
    """
    wq0, N10, N20, dN20 = _tabulate(quad_degree)
    th = float(theta)
    rho_s = float(props["rho_s"])
    g0 = np.zeros(3) if gravity is None else np.asarray(gravity, np.float64)

    def kernel(u, u0, Jinv, detJ, vol):
        dty = u.dtype
        wq, N1, N2, dN2 = (wq0.astype(dty), N10.astype(dty),
                           N20.astype(dty), dN20.astype(dty))
        g = jnp.asarray(g0, dtype=dty)
        de, ve, pe = _unpack_local(u)
        d0e, v0e, _ = _unpack_local(u0)
        G2 = dN2 @ Jinv

        d_q = N2 @ de
        d0_q = N2 @ d0e
        v_q = N2 @ ve
        v0_q = N2 @ v0e
        gd = jnp.einsum("ai,qaj->qij", de, G2)
        gd0 = jnp.einsum("ai,qaj->qij", d0e, G2)

        # first Piola-Kirchhoff P = F S at each quadrature point
        def P1K(grad_d):
            return (jnp.eye(3, dtype=dty) + grad_d) @ S_(grad_d, props)

        P_n = jax.vmap(P1K)(gd)
        P_o = jax.vmap(P1K)(gd0)

        mom_val = rho_s / dt * (v_q - v0_q) - rho_s * g
        mom_grad = th * P_n + (1 - th) * P_o
        rv = jnp.einsum("q,qa,qi->ai", wq * detJ, N2, mom_val)
        rv += jnp.einsum("q,qij,qaj->ai", wq * detJ, mom_grad, G2)

        kin = rho_s * ((d_q - d0_q) / dt - (th * v_q + (1 - th) * v0_q))
        rd = jnp.einsum("q,qa,qi->ai", wq * detJ, N2, kin)

        rp = jnp.zeros(4, dtype=dty)
        return _pack_local(rd, rv, rp)

    return kernel


def make_robin_kernel(k_s, c_s, quad_degree=6):
    """Robin BC facet kernel on P2 triangles: (k_s d + c_s v)·psi ds
    (reference: src/vasp/simulations/aneurysm.py:73-76; external tissue
    support k*d + c*d_dot, reference: docs/aneurysm.md:154-170).

    kernel(u (36,) = [d(6x3), v(6x3)], area2 ()) -> (36,)
    area2 = |(x1-x0)x(x2-x0)| (twice the triangle area)."""
    pts, wq0 = tri_quadrature(quad_degree)
    N2t0, _ = p2_tri(pts)

    def kernel(u, area2):
        dty = u.dtype
        N2t = jnp.asarray(N2t0, dtype=dty)
        wq = jnp.asarray(wq0, dtype=dty)
        d = u[:18].reshape(6, 3)
        v = u[18:36].reshape(6, 3)
        d_q = N2t @ d
        v_q = N2t @ v
        val = k_s * d_q + c_s * v_q
        # the Robin traction tests the velocity (momentum) equation
        r = jnp.einsum("q,qa,qi->ai", wq * area2, N2t, val)
        return jnp.concatenate([jnp.zeros(18, dtype=dty), r.reshape(-1)])

    return kernel


def interface_pressure_vector(space, facet_verts, cells_plus, p2_tri_dofs,
                              quad_degree=6):
    """Assemble the geometry part b of the interface-pressure load so that
    R_v += P(t) * b. b[a,i] = sum_facets int_tri n_i N_a dGamma with n the
    unit normal oriented outward from the solid ('+') cell
    (reference: src/vasp/simulations/cylinder.py:164-169).

    Returns a dense (ndof,) numpy vector (assembled once; the load is linear
    in the scalar P(t))."""
    mesh = space.mesh
    pts, wq = tri_quadrature(quad_degree)
    N2t, _ = p2_tri(pts)

    x = mesh.coords[np.sort(facet_verts, axis=1)]  # (K,3,3)
    e1 = x[:, 1] - x[:, 0]
    e2 = x[:, 2] - x[:, 0]
    cr = np.cross(e1, e2)
    area2 = np.linalg.norm(cr, axis=1)
    n = cr / area2[:, None]
    # orient outward from the solid cell: from solid centroid toward facet
    solid_cent = mesh.coords[mesh.cells[cells_plus]].mean(axis=1)
    face_cent = x.mean(axis=1)
    flip = np.einsum("ki,ki->k", n, face_cent - solid_cent) < 0
    n[flip] *= -1.0

    # b_local[k,a,i] = sum_q wq * area2 * N_a(q) * n_i
    coeff = (wq[None, :] * area2[:, None])  # (K,nq)
    ba = np.einsum("kq,qa->ka", coeff, N2t)  # (K,6)
    b_local = ba[:, :, None] * n[:, None, :]  # (K,6,3)

    b = np.zeros(space.ndof)
    vdofs = space.field_dofs("v", p2_tri_dofs.reshape(-1)).reshape(-1, 6, 3)
    np.add.at(b, vdofs.reshape(-1), b_local.reshape(-1))
    return b
