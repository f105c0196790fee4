"""Mesh substrate: connectivity, markers, I/O round-trip, generators."""
import numpy as np
import pytest

from vasp_tpu.mesh.generate import fsi_tube_mesh, poiseuille_pipe_mesh
from vasp_tpu.mesh.io import read_vasp_mesh, write_vasp_mesh
from vasp_tpu.mesh.tetmesh import TetMesh


def test_single_tet_connectivity():
    coords = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    cells = np.array([[0, 1, 2, 3]])
    m = TetMesh(coords, cells, np.ones(1))
    assert m.num_edges == 6
    assert np.isclose(m.cell_volumes[0], 1 / 6)
    fv, c0, l0, c1, l1 = m._facet_tables
    assert fv.shape == (4, 3)
    assert np.all(c1 == -1)


def test_two_tet_shared_facet():
    coords = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], float
    )
    cells = np.array([[0, 1, 2, 3], [1, 2, 3, 4]])
    facets = np.array([[1, 2, 3]])
    m = TetMesh(coords, cells, np.array([1, 2]), facets, np.array([22]))
    assert m.num_edges == 9 + 0  # 6 + 6 - 3 shared
    fv, cp, lp, cm, lm = m.interior_facets(22)
    assert len(cp) == 1
    # '+' side must be the higher cell marker (solid=2) -> cell 1
    assert cp[0] == 1 and cm[0] == 0


def test_tube_mesh_structure(tiny_tube):
    m = tiny_tube
    assert m.num_cells > 0
    # both domains present
    assert set(np.unique(m.cell_markers)) == {1, 2}
    # all marker classes present
    assert set(np.unique(m.facet_markers)) == {2, 3, 11, 22, 33}
    # positive volumes, conforming connectivity (every interior facet has 2 cells)
    assert np.all(m.cell_volumes > 0)
    # interface facets separate fluid and solid
    fv, cp, lp, cm, lm = m.interior_facets(22)
    assert len(cp) > 0
    assert np.all(m.cell_markers[cp] == 2)
    assert np.all(m.cell_markers[cm] == 1)


def test_tube_mesh_conforming():
    """Staircase prism split must produce a conforming mesh: every facet is
    shared by at most 2 cells and interior facet count matches Euler-style
    bookkeeping (4*Nc = 2*interior + exterior)."""
    m = fsi_tube_mesh(n_theta=8, n_r_fluid=2, n_r_solid=1, n_z=4)
    fv, c0, l0, c1, l1 = m._facet_tables
    n_int = int(np.sum(c1 >= 0))
    n_ext = int(np.sum(c1 < 0))
    assert 4 * m.num_cells == 2 * n_int + n_ext


def test_io_roundtrip(tmp_path, tiny_tube):
    path = tmp_path / "tube.h5"
    write_vasp_mesh(path, tiny_tube)
    m2 = read_vasp_mesh(path)
    assert np.allclose(m2.coords, tiny_tube.coords)
    assert np.array_equal(m2.cells, tiny_tube.cells)
    assert np.array_equal(m2.cell_markers, tiny_tube.cell_markers)
    # same marked facet set (rows may be permuted)
    a = {tuple(sorted(r)) + (v,) for r, v in zip(tiny_tube.facets.tolist(),
                                                 tiny_tube.facet_markers.tolist())}
    b = {tuple(sorted(r)) + (v,) for r, v in zip(m2.facets.tolist(),
                                                 m2.facet_markers.tolist())}
    assert a == b


def test_read_reference_cylinder(reference_cylinder_path):
    """Parity with the reference fixture mesh: node/cell counts and marker
    conventions (reference: tests/test_data/cylinder/cylinder.h5)."""
    m = read_vasp_mesh(reference_cylinder_path)
    assert m.num_vertices == 352
    assert m.num_cells == 1647
    assert set(np.unique(m.cell_markers)) == {1, 2}
    assert {2, 3, 11, 22, 33} <= set(np.unique(m.facet_markers))
    fv, cp, lp, cm, lm = m.interior_facets(22)
    assert len(cp) > 0
    assert np.all(m.cell_markers[cp] == 2)
    assert np.all(m.cell_markers[cm] == 1)
    assert np.all(m.cell_volumes > 0)


def test_poiseuille_mesh():
    m = poiseuille_pipe_mesh(n_theta=8, n_r=2, n_z=4)
    assert set(np.unique(m.facet_markers)) == {2, 3, 22}
    fv, cells, lf = m.exterior_facets(22)
    assert len(fv) > 0
