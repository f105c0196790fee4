"""Analytic fluid validation: steady Poiseuille flow in a straight pipe.

The exact solution u_z = u_max (1 - r^2/R^2), p = G (L - z), G = 4 mu u_max/R^2
is quadratic in velocity and linear in pressure, hence exactly representable
in Taylor-Hood P2/P1 — the discrete solution must match to solver tolerance.
This is the same analytic anchor as the reference's Hagen-Poiseuille WSS
fixture (reference: tests/test_compute_hemodynamics.py:16-73)."""
import numpy as np
import pytest

from vasp_tpu.fem.dirichlet import DirichletBC
from vasp_tpu.fem.measures import BoundaryMeasure, dg0_project_speed
from vasp_tpu.mesh.generate import poiseuille_pipe_mesh
from vasp_tpu.run.system import FSISystem

R = 1.0
L = 3.0
MU = 1.0
RHO = 1.0
UMAX = 1.0
G = 4 * MU * UMAX / R ** 2  # pressure gradient


@pytest.fixture(scope="module")
def pipe_solution():
    mesh = poiseuille_pipe_mesh(radius=R, length=L, n_theta=10, n_r=3, n_z=6)
    cfg = dict(
        dt=1e12,  # steady: transient term vanishes
        theta=1.0,
        rho_f=RHO,
        mu_f=MU,
        dx_f_id=1,
        solid="no_solid",
        extrapolation="no_extrapolation",
        atol=1e-10,
        rtol=1e-12,
        recompute=1,
        recompute_tstep=1,
        linear_solver="lu",
        verbose=False,
        quadrature_degree=4,
    )
    sys = FSISystem(mesh, cfg)
    space = sys.space

    xyz = space.p2_coords
    r2 = xyz[:, 0] ** 2 + xyz[:, 1] ** 2

    def u_exact(coords):
        rr2 = coords[:, 0] ** 2 + coords[:, 1] ** 2
        u = np.zeros_like(coords)
        u[:, 2] = UMAX * (1.0 - rr2 / R ** 2)
        return u

    def p_exact(coords):
        return G * (L - coords[:, 2])

    # Dirichlet: velocity everywhere on inlet(2)/outlet(3)/wall(22); d = 0 on
    # all P2 dofs (fluid-only, rigid); pin pressure on outlet vertices to 0.
    all_p2 = np.arange(space.n_p2)
    bcs = [
        DirichletBC(space.field_dofs("d", all_p2), 0.0),
    ]
    # exact velocity on ALL boundaries: the quadratic/linear exact fields lie
    # in the P2/P1 space and satisfy NS pointwise on the polygonal prism, so
    # the discrete solution must equal the interpolant (wall edge-midpoint
    # dofs sit on chords where the parabola is nonzero).
    for marker in (2, 3, 22):
        p2d = space.p2_dofs_on_facets(marker)
        vals = u_exact(space.p2_coords[p2d])
        bcs.append(DirichletBC(space.field_dofs("v", p2d), vals.reshape(-1)))
    outlet_verts = mesh.facet_vertices(3)
    bcs.append(DirichletBC(space.pressure_dofs(outlet_verts), 0.0))

    bc_set = sys.make_bcset(bcs)
    solver = sys.make_solver(bc_set)
    U0 = sys.zero_state()
    U = bc_set.apply(U0, 0.0)
    U, info = solver.solve(U, U0, t=0.0, tstep=0)
    return sys, U, info, u_exact, p_exact


def test_velocity_exact(pipe_solution):
    sys, U, info, u_exact, p_exact = pipe_solution
    d, v, p = sys.space.split(U)
    v = np.asarray(v)
    ve = u_exact(sys.space.p2_coords)
    err = np.abs(v - ve).max()
    assert err < 1e-8, f"max velocity error {err}"


def test_pressure_exact(pipe_solution):
    sys, U, info, u_exact, p_exact = pipe_solution
    d, v, p = sys.space.split(U)
    p = np.asarray(p)
    pe = p_exact(sys.mesh.coords)
    err = np.abs(p - pe).max()
    assert err < 1e-6, f"max pressure error {err}"


def test_newton_converges_quickly(pipe_solution):
    sys, U, info, u_exact, p_exact = pipe_solution
    assert info["iterations"] <= 5


def test_flow_rate(pipe_solution):
    """Flow rate Q = int u.n = pi R^2 umax / 2 at the outlet."""
    sys, U, info, u_exact, p_exact = pipe_solution
    d, v, p = sys.space.split(U)
    outlet = BoundaryMeasure(sys.space, 3)
    Q = float(outlet.integrate_p2_dot_n(v))
    # the polygonal cross-section area, not pi R^2:
    area = outlet.area
    # exact integral over the polygonal domain of the quadratic profile is
    # close to the disc value; compare with loose tolerance
    assert abs(Q - np.pi * R ** 2 * UMAX / 2) / (np.pi * R ** 2 * UMAX / 2) < 0.05
    assert area < np.pi * R ** 2


def test_dg0_speed(pipe_solution):
    sys, U, info, u_exact, p_exact = pipe_solution
    d, v, p = sys.space.split(U)
    speeds = np.asarray(dg0_project_speed(sys.space, v))
    assert speeds.max() <= UMAX + 1e-6
    assert speeds.min() >= 0.0
