"""Shared postprocessing utilities.

Parity targets (reference: src/vasp/postprocessing/postprocessing_common.py):
- get_domain_ids (L16-60): node-id sets of fluid/solid/all domains,
- output_file_lists (L63-121): map timestep -> (h5 file, time, index) by
  parsing the XDMF time series (restart-split outputs supported),
- read_parameters_from_file (L124-145): Checkpoint/default_variables.json.
"""
import json
import re
from pathlib import Path

import h5py
import numpy as np

from vasp_tpu.mesh.io import read_vasp_mesh


def get_domain_ids(mesh_path, fluid_domain_id=1, solid_domain_id=2):
    """Return (fluid_ids, solid_ids, all_ids) vertex-id arrays. Accepts
    scalar or list domain ids (reference: postprocessing_common.py:42-50)."""
    mesh = read_vasp_mesh(mesh_path)
    fluid_ids = mesh.domain_vertices(np.atleast_1d(fluid_domain_id))
    solid_ids = mesh.domain_vertices(np.atleast_1d(solid_domain_id))
    all_ids = np.unique(np.concatenate([fluid_ids, solid_ids]))
    return fluid_ids, solid_ids, all_ids


def get_domain_ids_refined(mesh_path, fluid_domain_id=1, solid_domain_id=2):
    """Vertex ids on the refined (save_deg=2) output mesh: original vertices
    plus edge-midpoint nodes (numbered Nn + edge_id by construction)."""
    mesh = read_vasp_mesh(mesh_path)
    out = []
    for dom in (fluid_domain_id, solid_domain_id):
        ids = np.atleast_1d(dom)
        verts = mesh.domain_vertices(ids)
        edges = mesh.num_vertices + mesh.domain_edges(ids)
        out.append(np.concatenate([verts, edges]))
    fluid_ids, solid_ids = out
    all_ids = np.unique(np.concatenate([fluid_ids, solid_ids]))
    return fluid_ids, solid_ids, all_ids


def get_interface_ids(mesh_path, fsi_id=22, refined=False):
    """Vertex ids on the FSI interface
    (reference: postprocessing_h5py_common.py:90-121 computes fluid/solid
    node intersection; ours are the facet-marker nodes directly)."""
    mesh = read_vasp_mesh(mesh_path)
    verts = mesh.facet_vertices(np.atleast_1d(fsi_id))
    if not refined:
        return verts
    edges = mesh.num_vertices + mesh.facet_edges(np.atleast_1d(fsi_id))
    return np.concatenate([verts, edges])


def output_file_lists(xdmf_file):
    """Parse an output XDMF into (h5_names, times, indices) with the same
    regexes the reference uses (reference: postprocessing_common.py:63-121)."""
    lines = Path(xdmf_file).read_text().splitlines()
    checkpoint_data = any("FiniteElementFunction" in ln for ln in lines)
    h5s, times, idxs = [], [], []
    for line in lines:
        if "<Time Value" in line:
            times.append(float(re.findall('<Time Value="(.+?)"', line)[0]))
        if checkpoint_data and "vector" in line:
            h5s.append(re.findall(r'"HDF">(.*?):', line)[0])
            idxs.append(int(re.findall(r"_([0-9]+)\/vector", line)[0]))
        elif not checkpoint_data and "VisualisationVector" in line:
            h5s.append(re.findall('"HDF">(.+?):/', line)[0])
            idxs.append(
                int(re.findall("VisualisationVector/(.+?)</DataItem", line)[0])
            )
    return h5s, times, idxs


def read_parameters_from_file(folder):
    """Read Checkpoint/default_variables.json
    (reference: postprocessing_common.py:124-145)."""
    path = Path(folder) / "Checkpoint" / "default_variables.json"
    if not path.exists():
        return None
    with open(path) as f:
        return json.load(f)


def read_visualization_series(viz_folder, name):
    """Load all timesteps of a Visualization field into one array
    (T, N, ...) plus times. Handles restart-split h5 files."""
    viz_folder = Path(viz_folder)
    h5s, times, idxs = output_file_lists(viz_folder / f"{name}.xdmf")
    arrays = []
    open_files = {}
    try:
        for h5name, idx in zip(h5s, idxs):
            if h5name not in open_files:
                open_files[h5name] = h5py.File(viz_folder / h5name, "r")
            arrays.append(open_files[h5name][f"VisualisationVector/{idx}"][:])
    finally:
        for f in open_files.values():
            f.close()
    return np.stack(arrays, axis=0), np.asarray(times)
