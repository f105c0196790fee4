"""Hemodynamics validation on analytic Hagen-Poiseuille flow.

Reference anchor: G=4, mu=1, R=1 -> WSS = G R/2 = 2 Pa; surface-averaged
TAWSS over the wall must be in (1.95, 2.05) and OSI in [0, 0.5]
(reference: tests/test_compute_hemodynamics.py:9-88)."""
import numpy as np
import pytest

from vasp_tpu.fem.functionspace import DVPSpace
from vasp_tpu.mesh.generate import poiseuille_pipe_mesh
from vasp_tpu.postprocessing.fields.hemodynamics import FluidBoundaryTables

G = 4.0
MU = 1.0
R = 1.0
L = 5.0


@pytest.fixture(scope="module")
def pipe_wss():
    mesh = poiseuille_pipe_mesh(radius=R, length=L, n_theta=24, n_r=4, n_z=8)
    space = DVPSpace(mesh)
    xyz = space.p2_coords
    r2 = xyz[:, 0] ** 2 + xyz[:, 1] ** 2
    u = np.zeros((space.n_p2, 3))
    u[:, 2] = G / (4 * MU) * (R ** 2 - r2)
    tables = FluidBoundaryTables(mesh, dx_f_id=1, quad_degree=2)
    # two identical timesteps (steady flow)
    tau = np.asarray(tables.wss_series(np.stack([u, u]), space.cell_dofs_p2,
                                       MU))
    return mesh, tables, tau


def test_tawss_poiseuille(pipe_wss):
    mesh, tables, tau = pipe_wss
    tau_mag = np.linalg.norm(tau, axis=2).mean(axis=0)
    # wall nodes only (exclude pipe ends, like the reference's Wall subdomain)
    wall_sel = np.zeros(len(tables.bnodes), bool)
    wall_facets = tables.markers == 22
    wall_sel[np.unique(tables.facet_bnodes[wall_facets])] = True
    z = tables.boundary_coords[:, 2]
    wall_sel &= (z > 0.1) & (z < L - 0.1)
    avg = tau_mag[wall_sel].mean()
    # the reference's tolerance band (tests/test_compute_hemodynamics.py:73)
    assert 1.95 < avg < 2.05, avg


def test_osi_bounds(pipe_wss):
    mesh, tables, tau = pipe_wss
    tau_mag = np.linalg.norm(tau, axis=2).mean(axis=0)
    wss_mean_mag = np.linalg.norm(tau.mean(axis=0), axis=1)
    osi = 0.5 * (1 - wss_mean_mag / np.maximum(tau_mag, 1e-300))
    assert osi.min() >= -1e-12
    assert osi.max() <= 0.5 + 1e-12
    # steady flow: OSI should be ~0 on the wall
    wall = tables.markers == 22
    nodes = np.unique(tables.facet_bnodes[wall])
    assert osi[nodes].max() < 1e-10


def test_wss_direction(pipe_wss):
    """WSS on the wall points along -z (flow drags the wall forward; the
    tangential traction on the fluid-side boundary opposes it)."""
    mesh, tables, tau = pipe_wss
    wall = tables.markers == 22
    nodes = np.unique(tables.facet_bnodes[wall])
    z = tables.boundary_coords[nodes, 2]
    interior = (z > 0.1) & (z < L - 0.1)
    tz = tau[0][nodes][interior, 2]
    assert np.all(np.abs(tz) > 1.5)
