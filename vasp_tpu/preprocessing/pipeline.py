"""Surface -> FSI-mesh pipeline driver.

Parity target: vasp-generate-mesh (reference: src/vasp/preprocessing/
preprocessing.py:49-971 — SURVEY.md §3.1 call stack). The reference drives
VMTK/VTK/TetGen C++ geometry engines; this driver reproduces the pipeline
stages and artifacts:

  load/scale surface -> sizing ("Size" array) -> solid thickness
  ("Thickness") -> two-domain FSI mesh (fluid=1, solid=2; facets
  2/3../11/22/33) -> flatten inlet/outlet -> edge-length field ->
  mesh h5 + <case>_info.json + <case>_probe_point.json

Geometry backends:
- "parametric": tube/stenosis/bulge surfaces via vasp_tpu.mesh.generate
  (always available; used for tests/benchmarks),
- "vtk": the reference's VMTK path, used when vtk/vmtk are importable
  (gated; not available in this environment).
"""
import argparse
import json
from pathlib import Path

import numpy as np

from vasp_tpu.mesh.generate import fsi_tube_mesh
from vasp_tpu.mesh.io import write_vasp_mesh
from vasp_tpu.fem.functionspace import DVPSpace
from vasp_tpu.fem.measures import BoundaryMeasure
from vasp_tpu.preprocessing.preprocessing_common import (
    check_flatten_boundary,
    edge_length_evaluator,
    generate_probe_points,
    write_mesh_info,
    write_probe_points,
)


def _have_vtk():
    try:
        import vtk  # noqa: F401

        return True
    except ImportError:
        return False


def run_pre_processing(
    mesh_path,
    geometry="tube",
    r_inner=0.001,
    r_outer=0.0013,
    length=0.006,
    n_theta=16,
    n_r_fluid=3,
    n_r_solid=2,
    n_z=20,
    stenosis_severity=0.0,
    stenosis_offset=0.0,
    bulge=0.0,
    flatten_boundaries=True,
    n_probes=10,
    mean_inflow_rate=None,
    verbose=True,
):
    """Generate an FSI mesh + metadata artifacts at mesh_path."""
    mesh_path = Path(mesh_path)
    mesh_path.parent.mkdir(parents=True, exist_ok=True)

    scale = None
    offset = None
    if stenosis_severity > 0:
        z0, w = length * 0.4, length * 0.25

        def scale(z, z0=z0, w=w, s=stenosis_severity):
            if abs(z - z0) < w / 2:
                return 1.0 - 0.5 * s * (1 + np.cos(2 * np.pi * (z - z0) / w))
            return 1.0
    if bulge > 0:
        z0, w = length * 0.5, length / 3

        def scale(z, z0=z0, w=w, b=bulge):
            if abs(z - z0) < w / 2:
                return 1.0 + 0.5 * b * (1 + np.cos(2 * np.pi * (z - z0) / w))
            return 1.0
    if stenosis_offset > 0:
        z0, w = length * 0.4, length * 0.25

        def offset(z, z0=z0, w=w, o=stenosis_offset):
            if abs(z - z0) < w / 2:
                return (0.5 * o * (1 + np.cos(2 * np.pi * (z - z0) / w)), 0.0)
            return (0.0, 0.0)

    mesh = fsi_tube_mesh(
        r_inner=r_inner, r_outer=r_outer, length=length, n_theta=n_theta,
        n_r_fluid=n_r_fluid, n_r_solid=n_r_solid, n_z=n_z,
        radius_profile=scale, center_offset=offset,
    )
    if flatten_boundaries:
        mesh = check_flatten_boundary(mesh, markers=(2, 3))

    if verbose:
        print(f"Number of nodes: {mesh.num_vertices}")
        print(f"Number of cells: {mesh.num_cells}")

    write_vasp_mesh(mesh_path, mesh)
    edge_lengths = edge_length_evaluator(mesh)
    if verbose:
        print(f"Mean edge length: {edge_lengths.mean():.6e}")

    space = DVPSpace(mesh)
    inlet = BoundaryMeasure(space, 2)
    outlets = BoundaryMeasure(space, 3)
    area_ratio = [outlets.area / max(inlet.area, 1e-300)]
    write_mesh_info(
        mesh_path,
        inlet_area=inlet.area,
        mean_inflow_rate=mean_inflow_rate,
        area_ratios=area_ratio,
        mean_edge_length=float(edge_lengths.mean()),
    )
    probes = generate_probe_points(mesh, n_probes=n_probes)
    write_probe_points(mesh_path, probes)
    return mesh


def read_command_line(argv=None):
    """CLI mirroring the reference's main meshing flags
    (reference: preprocessing.py:648-971; VMTK-specific flags are accepted
    and reported unsupported when vtk is absent)."""
    p = argparse.ArgumentParser(prog="vasp-generate-mesh")
    p.add_argument("-i", "--input-model", default=None,
                   help="surface file (.vtp/.stl, requires vtk) or "
                        "'parametric'")
    p.add_argument("-o", "--mesh-path", required=True)
    p.add_argument("--geometry", default="tube",
                   choices=["tube", "stenosis", "aneurysm"])
    p.add_argument("--r-inner", type=float, default=0.001)
    p.add_argument("--r-outer", type=float, default=0.0013)
    p.add_argument("--length", type=float, default=0.006)
    p.add_argument("--n-theta", type=int, default=16)
    p.add_argument("--n-r-fluid", type=int, default=3)
    p.add_argument("--n-r-solid", type=int, default=2)
    p.add_argument("--n-z", type=int, default=20)
    p.add_argument("--stenosis-severity", type=float, default=0.0)
    p.add_argument("--stenosis-offset", type=float, default=0.0)
    p.add_argument("--bulge", type=float, default=0.0)
    p.add_argument("--no-flatten", action="store_true")
    p.add_argument("--n-probes", type=int, default=10)
    p.add_argument("--mean-inflow-rate", type=float, default=None)
    p.add_argument("--scale-factor", type=float, default=1.0,
                   help="coordinate scale applied to surface input "
                        "(e.g. 1e-3 for mm -> m; reference -sc flag)")
    p.add_argument("--add-flowextensions", type=float, default=0.0,
                   help="extend inlet/outlet by N local diameters "
                        "(reference -fli/-flo flags)")
    p.add_argument("-m", "--meshing-method", default="constant",
                   choices=["constant", "diameter", "curvature"],
                   help="axial sizing distribution (reference's "
                        "edge-length sizing methods, "
                        "preprocessing.py:397-435)")
    p.add_argument("--refine-region", type=float, nargs=4, default=None,
                   metavar=("X", "Y", "Z", "R"),
                   help="densify layers inside the sphere (reference "
                        "--refine-region, preprocessing.py:223-269)")
    p.add_argument("--refine-factor", type=float, default=4.0)
    p.add_argument("-sm", "--smoothing-method", default="no_smooth",
                   choices=["no_smooth", "laplace", "taubin", "voronoi"],
                   help="surface smoothing before meshing (reference "
                        "preprocessing.py:271-334; 'voronoi' smooths the "
                        "wall-radius envelope, the morphman analogue)")
    p.add_argument("-si", "--smoothing-iterations", type=int, default=25)
    p.add_argument("-sf", "--smoothing-factor", type=float, default=0.25,
                   help="voronoi envelope blend factor (reference -sf)")
    p.add_argument("--solid-thickness", default="constant",
                   help="'constant'/'variable' (fraction of local radius) "
                        "or a number (absolute thickness, input units)")
    return p.parse_args(argv)


def run_surface_pre_processing(input_model, mesh_path, n_z=40, n_theta=16,
                               n_r_fluid=3, n_r_solid=1,
                               solid_thickness=None, thickness_frac=0.25,
                               scale_factor=1.0, flow_extensions=0.0,
                               flatten_boundaries=True,
                               smoothing_method="no_smooth",
                               smoothing_iterations=25,
                               smoothing_factor=0.25,
                               meshing_method="constant",
                               refine_region=None, refine_factor=4.0,
                               n_probes=10, mean_inflow_rate=None,
                               verbose=True):
    """STL surface -> two-domain FSI mesh + the same metadata artifacts as
    the parametric path (reference pipeline stage P1 surface mode +
    P3 meshing; vasp_tpu/preprocessing/surface_mesh.py docstring for the
    structured reparameterization design)."""
    from vasp_tpu.preprocessing.surface_mesh import (extract_centerline,
                                                     surface_fsi_mesh)

    mesh_path = Path(mesh_path)
    mesh_path.parent.mkdir(parents=True, exist_ok=True)
    mesh = surface_fsi_mesh(
        input_model, n_z=n_z, n_theta=n_theta, n_r_fluid=n_r_fluid,
        n_r_solid=n_r_solid, solid_thickness=solid_thickness,
        thickness_frac=thickness_frac, scale_factor=scale_factor,
        flow_extensions=flow_extensions,
        smoothing_method=smoothing_method,
        smoothing_iterations=smoothing_iterations,
        smoothing_factor=smoothing_factor,
        meshing_method=meshing_method,
        refine_region=refine_region, refine_factor=refine_factor,
    )
    # centerline artifact (the reference writes <case>_centerline.vtp,
    # preprocessing.py:201-217; points + MIS radii as portable json)
    cl_pts, cl_r = extract_centerline(input_model)
    cl_path = mesh_path.with_name(mesh_path.stem + "_centerline.json")
    cl_path.write_text(json.dumps({
        "points": (np.asarray(cl_pts) * float(scale_factor)).tolist(),
        "mis_radius": (np.asarray(cl_r) * float(scale_factor)).tolist(),
    }))
    if flatten_boundaries:
        mesh = check_flatten_boundary(mesh, markers=(2, 3))
    if verbose:
        print(f"Number of nodes: {mesh.num_vertices}")
        print(f"Number of cells: {mesh.num_cells}")
    write_vasp_mesh(mesh_path, mesh)
    edge_lengths = edge_length_evaluator(mesh)
    if verbose:
        print(f"Mean edge length: {edge_lengths.mean():.6e}")
    space = DVPSpace(mesh)
    inlet = BoundaryMeasure(space, 2)
    outlets = BoundaryMeasure(space, 3)
    area_ratio = [outlets.area / max(inlet.area, 1e-300)]
    write_mesh_info(
        mesh_path,
        inlet_area=inlet.area,
        mean_inflow_rate=mean_inflow_rate,
        area_ratios=area_ratio,
        mean_edge_length=float(edge_lengths.mean()),
    )
    probes = generate_probe_points(mesh, n_probes=n_probes)
    write_probe_points(mesh_path, probes)
    return mesh


def main_meshing(argv=None):
    args = read_command_line(argv)
    if args.input_model and args.input_model != "parametric":
        # surface-based two-domain meshing (STL; numpy-only — the
        # reference's VMTK/TetGen stage rebuilt in surface_mesh.py)
        thickness = (None if args.solid_thickness in ("constant", "variable")
                     else float(args.solid_thickness))
        run_surface_pre_processing(
            args.input_model, args.mesh_path,
            n_z=args.n_z, n_theta=args.n_theta,
            n_r_fluid=args.n_r_fluid, n_r_solid=args.n_r_solid,
            solid_thickness=thickness,
            scale_factor=args.scale_factor,
            flow_extensions=args.add_flowextensions,
            flatten_boundaries=not args.no_flatten,
            smoothing_method=args.smoothing_method,
            smoothing_iterations=args.smoothing_iterations,
            smoothing_factor=args.smoothing_factor,
            meshing_method=args.meshing_method,
            refine_region=args.refine_region,
            refine_factor=args.refine_factor,
            n_probes=args.n_probes,
            mean_inflow_rate=args.mean_inflow_rate,
        )
        return
    geometry = args.geometry
    sev = args.stenosis_severity or (0.5 if geometry == "stenosis" else 0.0)
    blg = args.bulge or (0.8 if geometry == "aneurysm" else 0.0)
    run_pre_processing(
        args.mesh_path,
        geometry=geometry,
        r_inner=args.r_inner, r_outer=args.r_outer, length=args.length,
        n_theta=args.n_theta, n_r_fluid=args.n_r_fluid,
        n_r_solid=args.n_r_solid, n_z=args.n_z,
        stenosis_severity=sev, stenosis_offset=args.stenosis_offset,
        bulge=blg, flatten_boundaries=not args.no_flatten,
        n_probes=args.n_probes, mean_inflow_rate=args.mean_inflow_rate,
    )
