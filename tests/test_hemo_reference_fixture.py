"""Cross-implementation hemodynamics parity on the REFERENCE's shipped
fixture (reference: tests/test_compute_hemodynamics.py:9-88 and
tests/test_data/hemodynamics_data/).

The reference test drives vasp-compute-hemo over a Hagen-Poiseuille
velocity series on its shipped 2442-vertex pipe mesh and asserts the
wall-averaged TAWSS lands in [1.95, 2.05] Pa (analytic WSS = G R / 2 = 2
with G=4, mu=1, R=1) plus OSI in [0, 0.5]. The fixture's precomputed
u.h5 series is not shipped in this checkout, but its generator IS
documented in the reference test docstring: u = G/(4 mu) (R^2 - r^2) x̂,
a QUADRATIC field — so the P2 interpolant on the same mesh reproduces it
EXACTLY, and the regenerated series is bit-deterministic. This test
therefore runs the full vasp-compute-hemo CLI on the reference's mesh +
reference's Checkpoint config + the reference-documented velocity, and
asserts the reference's own value bars plus tighter field-level ones.

The achievable floor on this mesh is geometric: facet normals of the
shipped polyhedral wall tilt away from the true radial direction, so
nodal TAWSS sits slightly below the analytic 2.0 even with the exact
(quadratic-exact) P2 velocity. MEASURED on the fixture (this pipeline,
CPU, deterministic): wall-average TAWSS 1.98554 (reference bar
[1.95, 2.05]), nodal-TAWSS rel L2 vs analytic 0.0393 over the interior
wall band (bar set at 0.05), OSI exactly 0 for the steady series,
880 wall-band facets.
"""
from pathlib import Path
import shutil

import h5py
import numpy as np
import pytest

REF_FIXTURE = Path("/root/reference/tests/test_data/hemodynamics_data")

pytestmark = pytest.mark.skipif(
    not REF_FIXTURE.exists(), reason="reference fixture not available")


G_PRESSURE = 4.0  # reference test: G = 4, mu = 1, R = 1
MU_F = 1.0
R_PIPE = 1.0
WSS_ANALYTIC = G_PRESSURE * R_PIPE / 2.0  # = 2 Pa


@pytest.fixture(scope="module")
def hemo_run(tmp_path_factory):
    from vasp_tpu.cli import compute_hemo
    from vasp_tpu.mesh.io import read_vasp_mesh

    folder = tmp_path_factory.mktemp("hemodynamics_data")
    shutil.copytree(REF_FIXTURE / "Mesh", folder / "Mesh")
    shutil.copytree(REF_FIXTURE / "Checkpoint", folder / "Checkpoint")

    mesh_path = folder / "Mesh" / "mesh_fluid.h5"
    mesh = read_vasp_mesh(mesh_path)
    xp2 = mesh.p2_coords  # (n_p2, 3): vertices then edge midpoints
    n_p2 = len(xp2)
    r2 = xp2[:, 1] ** 2 + xp2[:, 2] ** 2
    u = np.zeros((n_p2, 3))
    u[:, 0] = G_PRESSURE / (4.0 * MU_F) * (R_PIPE ** 2 - r2)

    # steady series in the repo's documented u.h5 contract (the layout
    # vasp-create-hdf5 writes: time, ids, velocity/vector_k)
    sep = folder / "Visualization_separate_domain"
    sep.mkdir()
    n_steps = 4
    with h5py.File(sep / "u.h5", "w") as f:
        f.create_dataset("time", data=0.1 * (1 + np.arange(n_steps)))
        f.create_dataset("ids", data=np.arange(n_p2, dtype=np.int64))
        for k in range(n_steps):
            f.create_dataset(f"velocity/vector_{k}", data=u)

    compute_hemo(["--folder", str(folder), "--mesh-path", str(mesh_path)])
    return folder, mesh


def _wall_band_facets(tables, wall_id=3):
    """Facet selector matching the reference test's Wall SubDomain:
    marker == wallId with centroid 0.1 < x < 4.9 (excludes pipe ends)."""
    cx = tables.boundary_coords[tables.facet_bnodes, 0].mean(axis=1)
    return (tables.markers == wall_id) & (cx > 0.1) & (cx < 4.9)


def test_reference_bar_wall_average_tawss(hemo_run):
    """The reference's own assert: area-weighted wall-average TAWSS in
    [1.95, 2.05] Pa (reference test_compute_hemodynamics.py:72-74)."""
    folder, mesh = hemo_run
    with h5py.File(folder / "Hemodynamic_indices" / "TAWSS.h5", "r") as f:
        tawss = f["VisualisationVector/0"][:].ravel()

    from vasp_tpu.postprocessing.fields.hemodynamics import (
        FluidBoundaryTables,
    )

    tables = FluidBoundaryTables(mesh, dx_f_id=1)
    sel = _wall_band_facets(tables)
    assert sel.sum() > 100
    # area-weighted average of the P1 boundary field (facet midpoint rule
    # = exact for P1): the reference assembles tawss * dx over the region
    area = tables.area2[sel] / 2.0
    vals = tawss[tables.facet_bnodes[sel]].mean(axis=1)
    avg = float((area * vals).sum() / area.sum())
    assert 1.95 < avg < 2.05, f"wall-average TAWSS {avg} outside bar"


def test_reference_bar_osi_range(hemo_run):
    """OSI in [0, 0.5] (reference test:83-88) — and ~0 for steady flow."""
    folder, _ = hemo_run
    with h5py.File(folder / "Hemodynamic_indices" / "OSI.h5", "r") as f:
        osi = f["VisualisationVector/0"][:].ravel()
    tol = 1e-12
    assert osi.min() >= -tol and osi.max() <= 0.5 + tol
    # steady series: the mean WSS vector equals the instantaneous one, so
    # OSI must vanish to projection roundoff
    assert osi.max() < 1e-3


def test_field_level_floors(hemo_run):
    """Tighter-than-reference field bars: nodal TAWSS vs the analytic
    2.0 over the interior wall band (rel L2 <= 0.05 — the floor is the
    shipped mesh's faceted-wall normal tilt, not the pipeline),
    RRT = 1/TAWSS, TWSSG = 0 for a steady series."""
    folder, mesh = hemo_run
    hd = folder / "Hemodynamic_indices"
    with h5py.File(hd / "TAWSS.h5", "r") as f:
        tawss = f["VisualisationVector/0"][:].ravel()
    with h5py.File(hd / "RRT.h5", "r") as f:
        rrt = f["VisualisationVector/0"][:].ravel()
    with h5py.File(hd / "TWSSG.h5", "r") as f:
        twssg = f["VisualisationVector/0"][:].ravel()

    from vasp_tpu.postprocessing.fields.hemodynamics import (
        FluidBoundaryTables,
    )

    tables = FluidBoundaryTables(mesh, dx_f_id=1)
    sel = _wall_band_facets(tables)
    nodes = np.unique(tables.facet_bnodes[sel])
    err = tawss[nodes] - WSS_ANALYTIC
    rel_l2 = np.linalg.norm(err) / np.linalg.norm(
        np.full_like(err, WSS_ANALYTIC))
    assert rel_l2 <= 0.05, f"TAWSS rel L2 vs analytic: {rel_l2}"

    # RRT = 1/|mean WSS| on nodes with nonzero WSS
    live = tawss > 0.5
    assert np.allclose(rrt[live] * tawss[live], 1.0, rtol=2e-3)
    # steady flow: TWSSG vanishes
    assert float(np.abs(twssg).max()) < 1e-8
