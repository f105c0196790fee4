"""FSI meshing utilities (host-side numpy reimplementations).

Parity targets (reference: src/vasp/preprocessing/preprocessing_common.py):
- edge_length_evaluator (L292): DG0 mean-edge-length field,
- check_flatten_boundary (L333): project inlet/outlet nodes onto their
  least-squares plane when the facet normals' stdev exceeds 1e-3,
- map_thickness_to_mesh (L462): nearest-point thickness transfer,
- update_entity_ids_by_thickness (L499): thickness-range -> entity id,
- marker offset convention of convert_xml_mesh_to_hdf5 (L229-237):
  domain/boundary ids are written +1 so fluid=1, solid=2.
"""
import json
from pathlib import Path

import numpy as np

from vasp_tpu.mesh.tetmesh import TetMesh


def edge_length_evaluator(mesh: TetMesh) -> np.ndarray:
    """Per-cell mean edge length (DG0 field),
    reference: preprocessing_common.py:292-330."""
    x = mesh.coords[mesh.cells]  # (Nc,4,3)
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    lengths = np.stack(
        [np.linalg.norm(x[:, a] - x[:, b], axis=1) for a, b in pairs], axis=1
    )
    return lengths.mean(axis=1)


def check_flatten_boundary(mesh: TetMesh, markers=(2, 3), tol=1e-3):
    """Flatten inlet/outlet boundaries: if the facet normals of a marker
    have stdev > tol, project its nodes onto the least-squares plane
    (reference: preprocessing_common.py:333-459). Returns a new TetMesh."""
    coords = mesh.coords.copy()
    for marker in np.atleast_1d(markers):
        fv, cells, lf = mesh.exterior_facets(marker)
        if len(fv) == 0:
            continue
        x = coords[np.sort(fv, axis=1)]
        n = np.cross(x[:, 1] - x[:, 0], x[:, 2] - x[:, 0])
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-300)
        # orient consistently
        n[np.einsum("ki,i->k", n, n[0]) < 0] *= -1
        if n.std(axis=0).max() <= tol:
            continue
        nodes = np.unique(fv)
        pts = coords[nodes]
        centroid = pts.mean(axis=0)
        # least-squares plane normal: smallest singular vector
        _, _, vt = np.linalg.svd(pts - centroid, full_matrices=False)
        normal = vt[-1]
        dist = (pts - centroid) @ normal
        coords[nodes] = pts - dist[:, None] * normal[None, :]
    return TetMesh(coords, mesh.cells, mesh.cell_markers, mesh.facets,
                   mesh.facet_markers)


def map_thickness_to_mesh(mesh: TetMesh, surface_points, thickness_values):
    """Nearest-surface-point thickness per mesh vertex
    (reference: preprocessing_common.py:462-496)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(np.asarray(surface_points))
    _, idx = tree.query(mesh.coords)
    return np.asarray(thickness_values)[idx]


def update_entity_ids_by_thickness(mesh: TetMesh, thickness,
                                   thickness_ranges, solid_id=2,
                                   base_new_id=1002):
    """Re-mark solid cells whose mean vertex thickness falls in given ranges
    (reference: preprocessing_common.py:499-568). thickness_ranges: list of
    (lo, hi); cells in range k get id base_new_id + k*1000... following the
    reference's offsetting convention the k-th range maps to
    base_new_id + 1000*k."""
    cm = mesh.cell_markers.copy()
    cell_thick = np.asarray(thickness)[mesh.cells].mean(axis=1)
    solid = cm == solid_id
    for k, (lo, hi) in enumerate(thickness_ranges):
        sel = solid & (cell_thick >= lo) & (cell_thick < hi)
        cm[sel] = base_new_id + 1000 * k
    return TetMesh(mesh.coords, mesh.cells, cm, mesh.facets,
                   mesh.facet_markers)


# ---------------- sizing functions ----------------
def dist_sphere_constant(surface_points, edge_length):
    """Constant target edge length ("Size" array),
    reference: preprocessing.py dist_sphere_constant path (L397-435)."""
    return np.full(len(surface_points), float(edge_length))


def dist_sphere_curvature(surface_points, surface_tris, factor=1.0,
                          min_size=None, max_size=None):
    """Curvature-adaptive sizing: smaller elements where the discrete mean
    curvature is higher (the reference delegates to vmtk's curvature-based
    sizing; here: cotangent-free normal-variation estimate)."""
    pts = np.asarray(surface_points)
    tris = np.asarray(surface_tris)
    n = np.cross(pts[tris[:, 1]] - pts[tris[:, 0]],
                 pts[tris[:, 2]] - pts[tris[:, 0]])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-300)
    vert_n = np.zeros_like(pts)
    np.add.at(vert_n, tris.ravel(), np.repeat(n, 3, axis=0))
    norm = np.linalg.norm(vert_n, axis=1)
    cnt = np.zeros(len(pts))
    np.add.at(cnt, tris.ravel(), 1.0)
    cnt = np.maximum(cnt, 1.0)
    # 1 - |mean normal| in [0,1): 0 on flat regions, ->1 at high curvature
    rough = 1.0 - norm / cnt
    size = factor / (1.0 + 10.0 * rough)
    if min_size is not None or max_size is not None:
        size = np.clip(size, min_size, max_size)
    return size


def dist_sphere_diam(surface_points, centerline_points, centerline_radii,
                     coeff=0.1):
    """Diameter-proportional sizing: target edge length = coeff * local
    vessel diameter from the nearest centerline point (the reference's
    'diameter' method)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(np.asarray(centerline_points))
    _, idx = tree.query(np.asarray(surface_points))
    return coeff * 2.0 * np.asarray(centerline_radii)[idx]


def dist_sphere_spheres(surface_points, sphere_centers, sphere_radii,
                        distance_method="euclidean",
                        size_inside=0.1, size_outside=0.4):
    """Sphere-based sizing: distance to user spheres interpolates the target
    size (reference: preprocessing_common.py:60-120 semantics)."""
    pts = np.asarray(surface_points)
    centers = np.atleast_2d(sphere_centers)
    radii = np.atleast_1d(sphere_radii)
    d = np.min(
        np.linalg.norm(pts[:, None, :] - centers[None], axis=2)
        - radii[None],
        axis=1,
    )
    d = np.maximum(d, 0.0)
    scale = np.clip(d / (d.max() + 1e-300), 0.0, 1.0)
    return size_inside + (size_outside - size_inside) * scale


# ---------------- solid thickness ----------------
def distance_to_spheres_solid_thickness(surface_points, sphere_centers,
                                        sphere_radii, thickness_at_sphere,
                                        thickness_far):
    """Sphere-based variable wall thickness
    (reference: preprocessing_common.py:26-57 semantics, non-interactive)."""
    pts = np.asarray(surface_points)
    centers = np.atleast_2d(sphere_centers)
    radii = np.atleast_1d(sphere_radii)
    th_s = np.atleast_1d(thickness_at_sphere)
    d = np.linalg.norm(pts[:, None, :] - centers[None], axis=2) - radii[None]
    d = np.maximum(d, 0.0)
    nearest = d.argmin(axis=1)
    dmin = d[np.arange(len(pts)), nearest]
    w = np.exp(-dmin / (np.mean(radii) + 1e-300))
    return w * th_s[nearest] + (1 - w) * thickness_far


def gaussian_paint_thickness(surface_points, seed_points, seed_values,
                             base_value, sigma):
    """'Painted' thickness: Gaussian bumps around seed points on the base
    thickness (reference: preprocessing.py:465-487 Gaussian interpolation
    kernel semantics)."""
    pts = np.asarray(surface_points)
    out = np.full(len(pts), float(base_value))
    for p, v in zip(np.atleast_2d(seed_points), np.atleast_1d(seed_values)):
        w = np.exp(-np.sum((pts - p) ** 2, axis=1) / (2 * sigma ** 2))
        out = out * (1 - w) + v * w
    return out


# ---------------- mesh metadata ----------------
def write_mesh_info(mesh_path, inlet_area=None, mean_inflow_rate=None,
                    area_ratios=None, inlet_id=2, outlet_ids=(3,),
                    solid_side_wall_id=11, interface_fsi_id=22,
                    solid_outer_wall_id=33, **extra):
    """Write `<case>_info.json` (reference: preprocessing.py:598-621 and
    simulation_common.py:80-116 reader)."""
    mesh_path = Path(mesh_path)
    info = dict(
        mesh_path=str(mesh_path),
        inlet_area=inlet_area,
        mean_flow_rate=mean_inflow_rate,
        area_ratio=list(area_ratios) if area_ratios is not None else None,
        inlet_id=inlet_id,
        outlet_ids=list(outlet_ids),
        solid_side_wall_id=solid_side_wall_id,
        interface_fsi_id=interface_fsi_id,
        solid_outer_wall_id=solid_outer_wall_id,
    )
    info.update(extra)
    out = mesh_path.with_name(mesh_path.stem + "_info.json")
    with open(out, "w") as f:
        json.dump(info, f, indent=2)
    return out


def generate_probe_points(mesh: TetMesh, n_probes=10, fluid_id=1):
    """Probe points along the fluid-domain centerline-ish axis: sample the
    fluid-vertex centroid per axial bin (reference places probes along the
    centerline, preprocessing.py:598-621)."""
    verts = mesh.domain_vertices(fluid_id)
    pts = mesh.coords[verts]
    axis = np.argmax(pts.max(axis=0) - pts.min(axis=0))
    order = np.argsort(pts[:, axis])
    bins = np.array_split(order, n_probes)
    return np.stack([pts[b].mean(axis=0) for b in bins if len(b)], axis=0)


def write_probe_points(mesh_path, points):
    mesh_path = Path(mesh_path)
    out = mesh_path.with_name(mesh_path.stem + "_probe_point.json")
    with open(out, "w") as f:
        json.dump(np.asarray(points).tolist(), f)
    return out
