"""Mesh format conversions.

Parity targets (reference: src/vasp/preprocessing/preprocessing_common.py):
- convert_xml_mesh_to_hdf5 (L198-248): legacy DOLFIN XML -> VaSP HDF5
  layout, applying the +1 marker offset so fluid=1/solid=2,
- convert_vtu_mesh_to_xdmf (L250-290): delegated to meshio when available
  (gated: meshio is not in this environment).
"""
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np

from vasp_tpu.mesh.io import write_vasp_mesh
from vasp_tpu.mesh.tetmesh import TetMesh


def read_dolfin_xml(path):
    """Parse a legacy DOLFIN XML tet mesh (+ optional mesh_function domain
    data embedded in <mesh_value_collection> / cell 'domains')."""
    tree = ET.parse(path)
    root = tree.getroot()
    mesh_el = root.find("mesh")
    verts_el = mesh_el.find("vertices")
    cells_el = mesh_el.find("cells")
    nv = int(verts_el.get("size"))
    coords = np.zeros((nv, 3))
    for v in verts_el:
        i = int(v.get("index"))
        coords[i] = [float(v.get("x", 0)), float(v.get("y", 0)),
                     float(v.get("z", 0))]
    nc = int(cells_el.get("size"))
    cells = np.zeros((nc, 4), np.int64)
    for c in cells_el:
        i = int(c.get("index"))
        cells[i] = [int(c.get(f"v{k}")) for k in range(4)]

    # cell domain markers (mesh_value_collection dim=3) and facet markers
    # (dim=2, entries are (cell_index, local_entity, value))
    cell_markers = np.zeros(nc, np.int64)
    facet_entries = []
    for mvc in root.iter("mesh_value_collection"):
        dim = int(mvc.get("dim"))
        for val in mvc:
            ci = int(val.get("cell_index"))
            le = int(val.get("local_entity"))
            value = int(val.get("value"))
            if dim == 3:
                cell_markers[ci] = value
            elif dim == 2:
                facet_entries.append((ci, le, value))
    return coords, cells, cell_markers, facet_entries


def convert_xml_mesh_to_hdf5(xml_path, scaling_factor=None, out_path=None):
    """DOLFIN XML -> VaSP HDF5, with the reference's +1 marker offset
    (meshing emits fluid=0/solid=1; the solver expects fluid=1/solid=2,
    reference: preprocessing_common.py:229-237). Returns the h5 path."""
    from vasp_tpu.mesh.tetmesh import TET_FACETS

    xml_path = Path(xml_path)
    coords, cells, cell_markers, facet_entries = read_dolfin_xml(xml_path)
    if scaling_factor:
        coords = coords * float(scaling_factor)
    cell_markers = cell_markers + 1  # fluid 0->1, solid 1->2

    facets = []
    fmarkers = []
    for ci, le, value in facet_entries:
        tri = cells[ci][list(TET_FACETS[le])]
        facets.append(np.sort(tri))
        fmarkers.append(value + 1)  # +1 offset like cells
    facets = np.asarray(facets, np.int64).reshape(-1, 3)
    fmarkers = np.asarray(fmarkers, np.int64)

    mesh = TetMesh(coords, cells, cell_markers, facets, fmarkers)
    out = Path(out_path) if out_path else xml_path.with_suffix(".h5")
    write_vasp_mesh(out, mesh)
    return out


def convert_vtu_mesh_to_xdmf(vtu_path, out_path=None):
    """VTU -> XDMF via meshio (reference: preprocessing_common.py:250-290).
    Gated: raises a clear error when meshio is unavailable."""
    try:
        import meshio
    except ImportError as e:
        raise RuntimeError(
            "convert_vtu_mesh_to_xdmf requires meshio, which is not "
            "available in this environment"
        ) from e
    vtu_path = Path(vtu_path)
    mesh = meshio.read(vtu_path)
    out = Path(out_path) if out_path else vtu_path.with_suffix(".xdmf")
    meshio.write(out, mesh)
    return out
