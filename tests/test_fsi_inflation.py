"""FSI coupling validation: pressurized tube inflation.

A ramped pressure on the FSI interface of a fluid+solid tube must inflate
the vessel (positive radial wall displacement), keep the mesh untangled
(min Jacobian > 0, the reference's entanglement guard,
reference: src/vasp/simulations/simulation_common.py:320-348), and converge
in few Newton iterations — the reference's smoke-test semantics
(reference: tests/test_simulations.py:93-125)."""
import numpy as np
import pytest

from vasp_tpu.bcs.waveforms import CosineRamp
from vasp_tpu.fem.dirichlet import DirichletBC
from vasp_tpu.fem.measures import dg0_project_jacobian
from vasp_tpu.mesh.generate import fsi_tube_mesh
from vasp_tpu.run.system import FSISystem

R_IN = 0.001
R_OUT = 0.0013
LENGTH = 0.004


@pytest.fixture(scope="module")
def inflated():
    mesh = fsi_tube_mesh(
        r_inner=R_IN, r_outer=R_OUT, length=LENGTH,
        n_theta=10, n_r_fluid=2, n_r_solid=1, n_z=5,
    )
    E = 1e6
    nu = 0.45
    mu_s = E / (2 * (1 + nu))
    lam_s = nu * 2 * mu_s / (1 - 2 * nu)
    cfg = dict(
        dt=0.001,
        theta=0.501,
        rho_f=1.025e3,
        mu_f=3.5e-3,
        dx_f_id=1,
        rho_s=1.0e3,
        mu_s=mu_s,
        nu_s=nu,
        lambda_s=lam_s,
        dx_s_id=2,
        material_model="StVenantKirchoff",
        extrapolation="laplace",
        extrapolation_sub_type="constant",
        atol=1e-8,
        rtol=1e-8,
        recompute=3,
        recompute_tstep=1,
        linear_solver="lu",
        verbose=False,
        quadrature_degree=4,
        fsi_id=22,
    )
    sys = FSISystem(mesh, cfg)
    space = sys.space

    # BCs match the reference cylinder case: v=0 at inlet and solid rings,
    # outlet traction-free (an incompressible sealed vessel could not
    # inflate), d=0 on inlet/outlet/solid rings.
    bcs = []
    for marker in (2, 3, 11):
        p2d = space.p2_dofs_on_facets(marker)
        bcs.append(DirichletBC(space.field_dofs("d", p2d), 0.0))
    for marker in (2, 11):
        p2d = space.p2_dofs_on_facets(marker)
        bcs.append(DirichletBC(space.field_dofs("v", p2d), 0.0))
    bc_set = sys.make_bcset(bcs)
    solver = sys.make_solver(bc_set)

    b_ifc = sys.interface_pressure_load()
    P_final = 5000.0
    ramp = CosineRamp(0.0, 0.01)

    U0 = sys.zero_state()
    U = U0
    iters = []
    t = 0.0
    for step in range(1, 4):
        t = step * cfg["dt"]
        P = ramp(t) * P_final
        U = bc_set.apply(U, t)
        U, info = solver.solve(U, U0, t=t, tstep=step, load=P * b_ifc)
        iters.append(info["iterations"])
        U0 = U
    return sys, U, iters


def test_wall_moves_outward(inflated):
    sys, U, iters = inflated
    d, v, p = sys.space.split(U)
    d = np.asarray(d)
    # radial displacement at interface vertices
    iface = sys.space.p2_dofs_on_facets(22)
    xy = sys.space.p2_coords[iface][:, :2]
    rhat = xy / np.linalg.norm(xy, axis=1, keepdims=True)
    dr = np.einsum("ki,ki->k", d[iface][:, :2], rhat)
    assert dr.mean() > 0, "pressure must inflate the vessel"
    # magnitude sanity: thin-walled tube hoop estimate d ~ P R^2 / (E h)
    scale = 5000 * R_IN ** 2 / (1e6 * (R_OUT - R_IN))
    assert 0.05 * scale < dr.mean() < 20 * scale


def test_mesh_not_entangled(inflated):
    sys, U, iters = inflated
    d, v, p = sys.space.split(U)
    jmin = float(np.min(np.asarray(dg0_project_jacobian(sys.space, d))))
    assert jmin > 0.5


def test_newton_iterations(inflated):
    sys, U, iters = inflated
    assert max(iters) <= 10


def test_fluid_dofs_finite(inflated):
    sys, U, iters = inflated
    assert np.all(np.isfinite(np.asarray(U)))
