"""Unstructured Delaunay-core FSI meshing (the TetGen-equivalent stage).

Reference bar: vmtkMeshGeneratorFsi's TetGen core + prismatic boundary
layer (reference: src/vasp/preprocessing/vmtkmeshgeneratorfsi.py:137-426)
— unstructured interior, graded BL sheets, two conforming domains with
the 2/3/11/22/33 entity-id scheme.
"""
import os
from pathlib import Path

import numpy as np
import pytest

TUBE = Path("/root/reference/tests/test_data/tube/tube.stl")
ARTERY = Path("/root/reference/tests/test_data/artery/artery.stl")


@pytest.mark.skipif(not TUBE.exists(), reason="STL fixtures absent")
@pytest.mark.parametrize("stl", [TUBE, ARTERY], ids=["tube", "artery"])
def test_delaunay_fsi_mesh_structure(stl):
    from vasp_tpu.preprocessing.delaunay_mesh import delaunay_fsi_mesh

    m = delaunay_fsi_mesh(stl, scale_factor=1e-3)
    assert set(np.unique(m.cell_markers)) == {1, 2}
    assert set(np.unique(m.facet_markers)) == {2, 3, 11, 22, 33}
    # watertight marking: every exterior facet carries a marker and the
    # FSI interface is strictly interior
    fv, c0, l0, c1, l1 = m._facet_tables
    n_ext = int((c1 < 0).sum())
    assert int(np.isin(m.facet_markers, [2, 3, 11, 33]).sum()) == n_ext
    ext = {tuple(sorted(f)) for f in fv[c1 < 0].tolist()}
    iface = {tuple(sorted(f)) for f in
             m.facets[m.facet_markers == 22].tolist()}
    assert not (ext & iface)
    # positively oriented cells
    P = m.coords[m.cells]
    v6 = np.einsum("ij,ij->i",
                   np.cross(P[:, 1] - P[:, 0], P[:, 2] - P[:, 0]),
                   P[:, 3] - P[:, 0])
    assert (v6 > 0).all()
    # genuinely unstructured interior: the structured extruder gives every
    # interior fluid vertex a fixed valence pattern; Delaunay does not
    from collections import Counter

    val = Counter(np.bincount(m.cells.reshape(-1)))
    assert len(val) > 10  # broad valence distribution


@pytest.mark.skipif(not TUBE.exists(), reason="STL fixtures absent")
def test_delaunay_boundary_layer_grading():
    """BL prism sheets exist beneath the FSI interface with the
    SubLayerRatio grading (thinnest sheet at the wall)."""
    from vasp_tpu.preprocessing.delaunay_mesh import delaunay_fsi_mesh

    def wall_adjacent_median_vol(ratio):
        m = delaunay_fsi_mesh(TUBE, n_bl_fluid=3,
                              sublayer_ratio_fluid=ratio)
        fv, c0, l0, c1, l1 = m._facet_tables
        iset = {tuple(sorted(f)) for f in
                m.facets[m.facet_markers == 22].tolist()}
        key = [tuple(sorted(f)) for f in fv.tolist()]
        is_iface = np.array([k in iset for k in key])
        P = m.coords[m.cells]
        vol = np.abs(np.einsum(
            "ij,ij->i", np.cross(P[:, 1] - P[:, 0], P[:, 2] - P[:, 0]),
            P[:, 3] - P[:, 0])) / 6.0
        fc = np.concatenate([c0[is_iface], c1[is_iface]])
        fc = fc[fc >= 0]
        fluid_cells = np.unique(fc[m.cell_markers[fc] == 1])
        return float(np.median(vol[fluid_cells]))

    # with ratio=0.75 and 3 sheets the wall-adjacent sheet takes
    # 0.75^2/(1+0.75+0.75^2) = 0.243 of the BL thickness vs 1/3 uniform:
    # wall-adjacent prism tets shrink by ~0.73
    ratio = wall_adjacent_median_vol(0.75) / wall_adjacent_median_vol(1.0)
    assert 0.5 < ratio < 0.9, ratio


@pytest.mark.skipif(not TUBE.exists(), reason="STL fixtures absent")
def test_delaunay_cli(tmp_path):
    """`vasp-generate-mesh -i tube.stl --core delaunay` writes the full
    artifact set (reference CLI parity with the TetGen path)."""
    from vasp_tpu.preprocessing.pipeline import main_meshing

    out = tmp_path / "mesh" / "tube.h5"
    main_meshing([
        "-i", str(TUBE), "-o", str(out), "--core", "delaunay",
        "-el", "0.5", "--scale-factor", "1e-3", "--n-probes", "6",
    ])
    assert out.exists()
    assert out.with_name("tube_info.json").exists()
    assert out.with_name("tube_probe_point.json").exists()
    from vasp_tpu.mesh.io import read_vasp_mesh

    m = read_vasp_mesh(out)
    assert set(np.unique(m.cell_markers)) == {1, 2}
    assert {2, 3, 11, 22, 33}.issubset(set(np.unique(m.facet_markers)))


@pytest.mark.skipif(os.environ.get("VASP_GOLDEN") != "1" or
                    not TUBE.exists(),
                    reason="set VASP_GOLDEN=1 for the solver run")
def test_delaunay_mesh_solver_runs():
    """One FSI solver step converges on the unstructured mesh."""
    import jax.numpy as jnp

    from vasp_tpu.fem.dirichlet import DirichletBC
    from vasp_tpu.preprocessing.delaunay_mesh import delaunay_fsi_mesh
    from vasp_tpu.run.system import FSISystem

    mesh = delaunay_fsi_mesh(TUBE, edge_length=0.55, scale_factor=1e-3)
    E, nu = 1e6, 0.45
    mu_s = E / (2 * (1 + nu))
    lam_s = nu * 2 * mu_s / (1 - 2 * nu)
    cfg = dict(dt=0.001, theta=0.501, rho_f=1.0e3, mu_f=3.5e-3, dx_f_id=1,
               rho_s=1e3, mu_s=mu_s, lambda_s=lam_s, dx_s_id=2,
               material_model="StVenantKirchoff", extrapolation="laplace",
               extrapolation_sub_type="constant", quadrature_degree=2,
               atol=1e-7, rtol=1e-7, max_it=10, recompute=1,
               recompute_tstep=1, linear_solver="lu", verbose=False,
               raise_on_fail=False)
    s = FSISystem(mesh, cfg)
    space = s.space
    bcs = []
    for mk in (2, 3, 11):
        bcs.append(DirichletBC(
            space.field_dofs("d", space.p2_dofs_on_facets(mk)), 0.0))
    for mk in (2, 11):
        bcs.append(DirichletBC(
            space.field_dofs("v", space.p2_dofs_on_facets(mk)), 0.0))
    bc = s.make_bcset(bcs)
    load = 50.0 * jnp.asarray(s.interface_pressure_load())
    solver = s.make_solver(bc)
    U0 = s.zero_state()
    U, info = solver.solve(bc.apply(U0, 0.001), U0, t=0.001, tstep=1,
                           load=load)
    assert np.all(np.isfinite(np.asarray(U)))
