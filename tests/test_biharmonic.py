"""Biharmonic mesh lifting (extrapolation="biharmonic", bc1/bc2 sub-types).

Reference vocabulary: src/vasp/simulations/cylinder.py:65-66 lists
[constant, small_constant, volume, volume_change, bc1, bc2]; the biharmonic
operator lives in turtleFSI. Implementation: discrete mixed form with a
lumped-mass-eliminated auxiliary field (fem/biharmonic.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vasp_tpu.fem.dirichlet import DirichletBC
from vasp_tpu.mesh.generate import fsi_tube_mesh
from vasp_tpu.run.system import FSISystem


def _system(extrapolation, sub_type, **extra):
    mesh = fsi_tube_mesh(r_inner=0.001, r_outer=0.0013, length=0.003,
                         n_theta=8, n_r_fluid=2, n_r_solid=1, n_z=3)
    E, nu = 1e6, 0.45
    mu_s = E / (2 * (1 + nu))
    lam_s = nu * 2 * mu_s / (1 - 2 * nu)
    cfg = dict(dt=0.001, theta=0.501, rho_f=1.025e3, mu_f=3.5e-3, dx_f_id=1,
               rho_s=1e3, mu_s=mu_s, lambda_s=lam_s, dx_s_id=2,
               material_model="StVenantKirchoff",
               extrapolation=extrapolation,
               extrapolation_sub_type=sub_type, quadrature_degree=2,
               atol=1e-10, rtol=1e-10, max_it=10, recompute=1,
               recompute_tstep=1, linear_solver="lu", verbose=False,
               **extra)
    sys_ = FSISystem(mesh, cfg)
    space = sys_.space
    bcs = []
    for m in (2, 3, 11):
        bcs.append(DirichletBC(space.field_dofs("d",
                                                space.p2_dofs_on_facets(m)),
                               0.0))
    for m in (2, 11):
        bcs.append(DirichletBC(space.field_dofs("v",
                                                space.p2_dofs_on_facets(m)),
                               0.0))
    bc_set = sys_.make_bcset(bcs)
    load = 100.0 * jnp.asarray(sys_.interface_pressure_load())
    return sys_, bc_set, load


@pytest.mark.parametrize("sub_type", ["bc1", "bc2"])
def test_biharmonic_converges_and_differs_from_laplace(sub_type):
    sys_b, bc_b, load = _system("biharmonic", sub_type)
    U0 = sys_b.zero_state()
    solver = sys_b.make_solver(bc_b)
    U_b, info = solver.solve(bc_b.apply(U0, 0.001), U0, t=0.001, tstep=1,
                             load=load)
    assert info["converged"], info
    assert np.all(np.isfinite(np.asarray(U_b)))

    sys_l, bc_l, load_l = _system("laplace", "constant")
    solver_l = sys_l.make_solver(bc_l)
    U_l, info_l = solver_l.solve(bc_l.apply(U0, 0.001), U0, t=0.001,
                                 tstep=1, load=load_l)
    assert info_l["converged"]

    # interface magnitudes are the same order (the lifting operator adds
    # spurious interface stiffness — turtleFSI's discretization shares the
    # property, which is why 'small_constant' exists; single-step transient
    # signs are not a robust invariant, so only magnitudes are compared)
    space = sys_b.space
    iface = space.p2_dofs_on_facets(22)

    def iface_mag(U):
        d = np.asarray(U)[space.field_dofs("d", iface)]
        return np.abs(d).max()

    m_b, m_l = iface_mag(U_b), iface_mag(U_l)
    assert m_l > 0 and m_b > 0
    assert 1e-3 < m_b / m_l < 1e3, (m_b, m_l)

    # ...but the INTERIOR fluid mesh motion differs (the lifting operator
    # is genuinely different: biharmonic smooths curvature, laplace
    # volume) — guards against the correction term being a silent no-op
    interior = np.setdiff1d(
        np.arange(space.n_p2),
        np.concatenate([space.p2_dofs_on_facets(m) for m in (2, 3, 11, 22)]))
    df_b = np.asarray(U_b)[space.field_dofs("d", interior)]
    df_l = np.asarray(U_l)[space.field_dofs("d", interior)]
    denom = np.abs(df_l).max()
    if denom > 1e-14:
        assert np.abs(df_b - df_l).max() > 1e-3 * denom


def test_biharmonic_iterative_stepper():
    """The TPU iterative path handles the lift correction (residual AND
    matvec) — converges to the LU solution.

    beta=1e-2: the banded preconditioner sees only the element-level
    Laplace surrogate (the L M^-1 L correction has a 2-ring stencil that
    does not fit the banded pattern), so GMRES quality degrades as beta
    grows; at the default beta=1 use the direct-LU path."""
    from vasp_tpu.fem.timestepper import IterativeStepper, StepOptions

    # bc2: the natural-w operator is the robustly convergent variant at
    # reduced beta (the soft-clamped bc1 needs beta ~1, see the sweep in
    # the module docstring of fem/biharmonic.py)
    sys_b, bc_b, load = _system("biharmonic", "bc2", biharmonic_beta=1e-2)
    U0 = sys_b.zero_state()
    solver = sys_b.make_solver(bc_b)
    U_lu, _ = solver.solve(bc_b.apply(U0, 0.001), U0, t=0.001, tstep=1,
                           load=load)
    opts = StepOptions(atol=1e-9, rtol=1e-9, max_it=10, gmres_tol=1e-8,
                       gmres_restart=60, gmres_maxiter=600)
    st = IterativeStepper(sys_b, bc_b, opts, recompute_tstep=20)
    bcv = jnp.asarray(bc_b.values_at(0.001))
    U_it, info = st.step(U0, bcv, load, tstep=1)
    res = float(info["residual"])
    assert res < 1e-9 * max(1.0, float(info["r0"])) or res < 1e-9
    a, b = np.asarray(U_lu), np.asarray(U_it)
    scale = max(np.abs(a).max(), np.abs(b).max())
    assert scale > 0
    # both solvers drive |R| to ~1e-9 but the equilibrated Jacobian is
    # ~1e6-conditioned, so two converged states may differ by
    # kappa * |R| / |dR/dU| ~ 1e-3 relative — assert that bound
    assert np.allclose(a, b, atol=2e-3 * scale), (
        np.abs(a - b).max(), scale)
