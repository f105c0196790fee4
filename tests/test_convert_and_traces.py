"""Mesh-format conversion (dolfin XML -> VaSP h5 with +1 marker offset) and
per-point time traces."""
import numpy as np

from vasp_tpu.mesh.convert import convert_xml_mesh_to_hdf5
from vasp_tpu.mesh.io import read_vasp_mesh


def _write_dolfin_xml(path):
    """Two-tet mesh in legacy DOLFIN XML with domain + facet markers."""
    xml = """<?xml version="1.0"?>
<dolfin xmlns:dolfin="http://fenicsproject.org">
  <mesh celltype="tetrahedron" dim="3">
    <vertices size="5">
      <vertex index="0" x="0" y="0" z="0"/>
      <vertex index="1" x="1" y="0" z="0"/>
      <vertex index="2" x="0" y="1" z="0"/>
      <vertex index="3" x="0" y="0" z="1"/>
      <vertex index="4" x="1" y="1" z="1"/>
    </vertices>
    <cells size="2">
      <tetrahedron index="0" v0="0" v1="1" v2="2" v3="3"/>
      <tetrahedron index="1" v0="1" v1="2" v2="3" v3="4"/>
    </cells>
    <domains>
      <mesh_value_collection type="uint" dim="3" size="2">
        <value cell_index="0" local_entity="0" value="0"/>
        <value cell_index="1" local_entity="0" value="1"/>
      </mesh_value_collection>
      <mesh_value_collection type="uint" dim="2" size="1">
        <value cell_index="0" local_entity="0" value="21"/>
      </mesh_value_collection>
    </domains>
  </mesh>
</dolfin>
"""
    path.write_text(xml)


def test_convert_xml_mesh(tmp_path):
    xml = tmp_path / "case.xml"
    _write_dolfin_xml(xml)
    out = convert_xml_mesh_to_hdf5(xml, scaling_factor=0.001)
    mesh = read_vasp_mesh(out)
    assert mesh.num_cells == 2
    # +1 offset: fluid 0->1, solid 1->2 (reference marker convention)
    assert set(mesh.cell_markers.tolist()) == {1, 2}
    # facet marker 21 -> 22 (fsi) on cell 0 local facet 0 = verts (1,2,3)
    assert mesh.facet_markers.tolist() == [22]
    assert sorted(mesh.facets[0].tolist()) == [1, 2, 3]
    assert np.isclose(mesh.coords.max(), 0.001)


def test_point_trace(cylinder_run, tmp_path):
    from vasp_tpu.postprocessing.spectral.point_trace import (
        create_point_trace,
    )

    ns, log, folder = cylinder_run
    written = create_point_trace(folder, [0, 5], quantity="v",
                                 component="mag", out_folder=tmp_path)
    assert len(written) == 2
    for base in written:
        assert base.with_suffix(".csv").exists()
        assert base.with_suffix(".png").exists()
    data = np.loadtxt(written[0].with_suffix(".csv"), delimiter=",")
    assert data.shape[1] == 2 and np.all(np.isfinite(data))
