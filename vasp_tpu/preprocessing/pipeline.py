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
    p.add_argument("--core", default="structured",
                   choices=["structured", "delaunay", "delaunay-general"],
                   help="fluid-core mesher for surface input: structured "
                        "reparameterized tube, unstructured Delaunay "
                        "core + prismatic boundary layer (the reference's "
                        "TetGen+vmtk decomposition), or the general "
                        "offset-surface mesher for arbitrary anatomy "
                        "(branched/curved/dome; 'delaunay' auto-dispatches "
                        "here for surfaces with 3+ open ends)")
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
    p.add_argument("-stp", "--solid-thickness-parameters", type=float,
                   nargs="+", default=None,
                   help="constant: [thickness]; variable: [frac] of local "
                        "radius (reference -stp)")
    p.add_argument("-c", "--config", "--config-path", dest="config",
                   default=None,
                   help="JSON file of flag defaults (reference --config)")
    p.add_argument("-el", "--edge-length", type=float, default=None,
                   help="target edge length in input units; derives the "
                        "axial/circumferential resolution (reference -el)")
    p.add_argument("-nbf", "--number-of-sublayers-fluid", type=int,
                   default=None, help="alias of --n-r-fluid (reference)")
    p.add_argument("-nbs", "--number-of-sublayers-solid", type=int,
                   default=None, help="alias of --n-r-solid (reference)")
    p.add_argument("--sublayer-ratio-fluid", type=float, default=1.0,
                   help="radial grading of the fluid rings toward the "
                        "wall (reference SubLayerRatioFluid=0.75, "
                        "preprocessing_common.py:164; 1.0 = uniform)")
    p.add_argument("--sublayer-ratio-solid", type=float, default=1.0,
                   help="grading of the solid wall layers (reference "
                        "SubLayerRatioSolid=0.75; 1.0 = uniform)")
    p.add_argument("-fli", "--inlet-flowextension", type=float, default=None,
                   help="inlet extension in local diameters (reference -fli)")
    p.add_argument("-flo", "--outlet-flowextension", type=float,
                   default=None,
                   help="outlet extension in local diameters (reference "
                        "-flo)")
    p.add_argument("--fluid-volume-id", type=int, default=1,
                   help="written (post-offset) fluid cell id")
    p.add_argument("--solid-volume-id", type=int, default=2,
                   help="written (post-offset) solid cell id")
    p.add_argument("--solid-side-wall-id", type=int, default=11)
    p.add_argument("--interface-fsi-id", type=int, default=22)
    p.add_argument("--solid-outer-wall-id", type=int, default=33)
    p.add_argument("-fr", "--flow-rate-factor", type=float, default=1.0,
                   help="scales the ideal mean inflow rate written to "
                        "<case>_info.json (reference -fr)")
    p.add_argument("--mesh-format", default="hdf5",
                   choices=["hdf5", "xdmf"],
                   help="xdmf additionally writes an XDMF companion")
    p.add_argument("--compress-mesh", action="store_true",
                   help="gzip the mesh h5 datasets (reference default)")
    p.add_argument("--no-solid", action="store_true",
                   help="fluid-only mesh: no wall layer, lumen surface "
                        "takes the fsi id (reference --no-solid)")
    p.add_argument("--mesh-generation-retries", type=int, default=3,
                   help="coarsen and retry on meshing failure (reference "
                        "retry-with-alternative-remesh loop, "
                        "preprocessing.py:501-541)")
    p.add_argument("--coarsening-factor", type=float, default=1.0,
                   help="divide axial/circumferential resolution "
                        "(reference -cf)")
    p.add_argument("--resampling-step", type=float, default=None,
                   help="centerline resampling step (input units); sets "
                        "the centerline artifact density (reference -rs)")
    p.add_argument("--region-points", type=float, nargs="+", default=None,
                   help="x y z triples marking refinement regions; "
                        "combined with --refine-factor and the local "
                        "radius (reference --region-points)")
    p.add_argument("--distance-method", default="euclidean",
                   choices=["euclidean", "geodesic"],
                   help="accepted for reference-CLI compatibility; the "
                        "structured backend computes per-station radii so "
                        "both methods coincide")
    p.add_argument("--remove-all", action="store_true",
                   help="delete intermediate artifacts (centerline json) "
                        "after a successful run")
    p.add_argument("-mp", "--meshing-parameters", type=float, nargs="+",
                   default=None,
                   help="constant sizing: [edge length] (reference -mp "
                        "semantics); other methods ignore it")
    p.add_argument("--has-multiple-inlets", action="store_true",
                   help="bifurcated surface: mesh via the branched "
                        "backbone (preprocessing/bifurcation.py; reference "
                        "multi-inlet handling preprocessing.py:336-384)")
    p.add_argument("--extract-branch", action="store_true",
                   help="split the surface into branches and offset the "
                        "second daughter's solid ids by "
                        "--branch-ids-offset (reference "
                        "vmtkmeshgeneratorfsi.py:255-316)")
    p.add_argument("--branch-group-ids", type=int, nargs="+", default=None)
    p.add_argument("--branch-ids-offset", type=int, default=1000)
    p.add_argument("--verbosity", type=int, default=1)
    p.add_argument("--visualize", action="store_true",
                   help="write <mesh>_preview.png (matplotlib cross-"
                        "sections; replaces the reference's interactive "
                        "VTK render)")
    args = p.parse_args(argv)
    # config file: JSON of dest->value applied wherever the CLI value is
    # still the parser default (reference --config/--config-path)
    if args.config:
        cfg = json.loads(Path(args.config).read_text())
        for k, v in cfg.items():
            k = k.replace("-", "_")
            if hasattr(args, k) and getattr(args, k) == p.get_default(k):
                setattr(args, k, v)
    return args


def run_surface_pre_processing(input_model, mesh_path, n_z=40, n_theta=16,
                               n_r_fluid=3, n_r_solid=1,
                               solid_thickness=None, thickness_frac=0.25,
                               scale_factor=1.0, flow_extensions=0.0,
                               inlet_extension=None, outlet_extension=None,
                               no_solid=False,
                               flatten_boundaries=True,
                               smoothing_method="no_smooth",
                               smoothing_iterations=25,
                               smoothing_factor=0.25,
                               meshing_method="constant",
                               refine_region=None, refine_factor=4.0,
                               n_probes=10, mean_inflow_rate=None,
                               flow_rate_factor=1.0,
                               resampling_step=None,
                               compress_mesh=False, mesh_format="hdf5",
                               remove_all=False, visualize=False,
                               id_remap=None,
                               sublayer_ratio_fluid=1.0,
                               sublayer_ratio_solid=1.0,
                               core="structured", edge_length=None,
                               verbose=True):
    """STL surface -> two-domain FSI mesh + the same metadata artifacts as
    the parametric path (reference pipeline stage P1 surface mode +
    P3 meshing; vasp_tpu/preprocessing/surface_mesh.py docstring for the
    structured reparameterization design; core="delaunay" selects the
    unstructured TetGen-equivalent core,
    vasp_tpu/preprocessing/delaunay_mesh.py)."""
    from vasp_tpu.preprocessing.surface_mesh import (extract_centerline,
                                                     surface_fsi_mesh)

    mesh_path = Path(mesh_path)
    mesh_path.parent.mkdir(parents=True, exist_ok=True)
    if core in ("delaunay", "delaunay-general"):
        if flow_extensions or inlet_extension or outlet_extension:
            raise ValueError(
                "flow extensions are not supported with --core delaunay "
                "yet; add them to the surface first (vasp-generate-mesh "
                "--core structured --add-flowextensions)")
        kwargs = dict(
            edge_length=edge_length, n_bl_fluid=n_r_fluid,
            sublayer_ratio_fluid=sublayer_ratio_fluid,
            n_r_solid=n_r_solid, sublayer_ratio_solid=sublayer_ratio_solid,
            solid_thickness=solid_thickness, thickness_frac=thickness_frac,
            no_solid=no_solid, scale_factor=scale_factor,
        )
        if core == "delaunay-general":
            from vasp_tpu.preprocessing.general_mesh import \
                delaunay_fsi_mesh_general

            mesh = delaunay_fsi_mesh_general(input_model, **kwargs)
        else:
            from vasp_tpu.preprocessing.delaunay_mesh import \
                delaunay_fsi_mesh

            mesh = delaunay_fsi_mesh(input_model, **kwargs)
    else:
        mesh = surface_fsi_mesh(
            input_model, n_z=n_z, n_theta=n_theta, n_r_fluid=n_r_fluid,
            n_r_solid=n_r_solid, solid_thickness=solid_thickness,
            thickness_frac=thickness_frac, scale_factor=scale_factor,
            flow_extensions=flow_extensions,
            inlet_extension=inlet_extension,
            outlet_extension=outlet_extension,
            no_solid=no_solid,
            smoothing_method=smoothing_method,
            smoothing_iterations=smoothing_iterations,
            smoothing_factor=smoothing_factor,
            meshing_method=meshing_method,
            refine_region=refine_region, refine_factor=refine_factor,
            sublayer_ratio_fluid=sublayer_ratio_fluid,
            sublayer_ratio_solid=sublayer_ratio_solid,
        )
    # centerline artifact (the reference writes <case>_centerline.vtp,
    # preprocessing.py:201-217; points + MIS radii as portable json).
    # resampling_step sets the station spacing (reference -rs).
    cl_n_z = 100
    if resampling_step:
        _, _, L0 = _surface_extent(input_model)
        cl_n_z = max(3, int(round(L0 / float(resampling_step))))
    cl_pts, cl_r = extract_centerline(input_model, n_z=cl_n_z)
    cl_path = mesh_path.with_name(mesh_path.stem + "_centerline.json")
    cl_path.write_text(json.dumps({
        "points": (np.asarray(cl_pts) * float(scale_factor)).tolist(),
        "mis_radius": (np.asarray(cl_r) * float(scale_factor)).tolist(),
    }))
    _finalize_mesh_artifacts(
        mesh, mesh_path, flatten_boundaries=flatten_boundaries,
        compress_mesh=compress_mesh, mesh_format=mesh_format,
        mean_inflow_rate=mean_inflow_rate,
        flow_rate_factor=flow_rate_factor, n_probes=n_probes,
        visualize=visualize, id_remap=id_remap, verbose=verbose)
    if remove_all:
        cl_path.unlink(missing_ok=True)
    return mesh


def _finalize_mesh_artifacts(mesh, mesh_path, flatten_boundaries=True,
                             compress_mesh=False, mesh_format="hdf5",
                             mean_inflow_rate=None, flow_rate_factor=1.0,
                             n_probes=10, visualize=False, id_remap=None,
                             verbose=True):
    """Shared mesh finalization: flatten ends, write the .h5 (+xdmf),
    info json, probe points, preview — identical artifact set for the
    single-branch and branched meshing paths."""
    mesh_path = Path(mesh_path)
    if flatten_boundaries:
        mesh = check_flatten_boundary(mesh, markers=(2, 3))
    if verbose:
        print(f"Number of nodes: {mesh.num_vertices}")
        print(f"Number of cells: {mesh.num_cells}")
    # probes/info/preview analyze the CANONICAL ids (fluid=1/solid=2,
    # 2/3/11/22/33); only the WRITTEN mesh carries the user's id remap
    mesh_out = _remap_ids(mesh, id_remap) if id_remap else mesh
    write_vasp_mesh(mesh_path, mesh_out, compress=compress_mesh)
    if mesh_format == "xdmf":
        from vasp_tpu.mesh.io import write_mesh_xdmf

        write_mesh_xdmf(mesh_path)
    edge_lengths = edge_length_evaluator(mesh)
    if verbose:
        print(f"Mean edge length: {edge_lengths.mean():.6e}")
    space = DVPSpace(mesh)
    inlet = BoundaryMeasure(space, 2)
    outlets = BoundaryMeasure(space, 3)
    area_ratio = [outlets.area / max(inlet.area, 1e-300)]
    if mean_inflow_rate is None and flow_rate_factor != 1.0:
        # ideal inflow estimate scaled by the reference's flow-rate factor
        # (reference -fr: Q = factor * inlet area, preprocessing.py flow
        # rate assignment stage)
        mean_inflow_rate = float(flow_rate_factor) * inlet.area
    write_mesh_info(
        mesh_path,
        inlet_area=inlet.area,
        mean_inflow_rate=mean_inflow_rate,
        area_ratios=area_ratio,
        mean_edge_length=float(edge_lengths.mean()),
    )
    probes = generate_probe_points(mesh, n_probes=n_probes)
    write_probe_points(mesh_path, probes)
    if visualize:
        _write_preview(mesh, mesh_path.with_name(
            mesh_path.stem + "_preview.png"))
    return mesh


def run_branched_pre_processing(input_model, mesh_path, m=8,
                                n_r_solid=1, solid_thickness=None,
                                thickness_frac=0.25, scale_factor=1.0,
                                edge_factor=1.0, branch_ids_offset=0,
                                flatten_boundaries=True,
                                n_probes=10, mean_inflow_rate=None,
                                flow_rate_factor=1.0, compress_mesh=False,
                                mesh_format="hdf5", visualize=False,
                                id_remap=None, verbose=True):
    """Bifurcated STL -> two-domain FSI mesh + standard artifacts (the
    reference's --extract-branch / multi-inlet workflow,
    vmtkmeshgeneratorfsi.py:255-316; branched backbone in
    preprocessing/bifurcation.py)."""
    from vasp_tpu.preprocessing.bifurcation import (
        branched_specs_from_stl, bifurcation_fsi_mesh)

    mesh_path = Path(mesh_path)
    mesh_path.parent.mkdir(parents=True, exist_ok=True)
    parent, d1, d2 = branched_specs_from_stl(input_model)
    rbar = float(np.mean(parent.radii))
    dz = edge_factor * 2.0 * rbar / m

    def n_of(spec, lo):
        L = float(np.linalg.norm(np.diff(spec.centers, axis=0),
                                 axis=1).sum())
        return max(lo, int(round(L / dz)))

    mesh = bifurcation_fsi_mesh(
        parent, d1, d2, m=m, n_parent=n_of(parent, 3),
        n_daughter=n_of(d1, 4), thickness_frac=thickness_frac,
        solid_thickness=solid_thickness, n_r_solid=n_r_solid,
        scale_factor=scale_factor, branch_ids_offset=branch_ids_offset)
    # branched centerline artifact (parent + both daughters)
    cl_path = mesh_path.with_name(mesh_path.stem + "_centerline.json")
    cl_path.write_text(json.dumps({
        "branches": [
            {"points": (np.asarray(s.centers) * scale_factor).tolist(),
             "mis_radius": (np.asarray(s.radii) * scale_factor).tolist()}
            for s in (parent, d1, d2)
        ]}))
    if verbose:
        print(f"Branched mesh: parent {len(parent.centers)} stations, "
              f"junction at {parent.centers[-1].tolist()}")
    return _finalize_mesh_artifacts(
        mesh, mesh_path, flatten_boundaries=flatten_boundaries,
        compress_mesh=compress_mesh, mesh_format=mesh_format,
        mean_inflow_rate=mean_inflow_rate,
        flow_rate_factor=flow_rate_factor, n_probes=n_probes,
        visualize=visualize, id_remap=id_remap, verbose=verbose)


def _surface_extent(stl_path):
    """(mean radius, n_points, bbox diagonal length) of an STL surface —
    cheap sizing estimates for --edge-length/--resampling-step."""
    from vasp_tpu.preprocessing.surface_mesh import read_stl

    V, _ = read_stl(stl_path)
    lo, hi = V.min(axis=0), V.max(axis=0)
    L = float(np.linalg.norm(hi - lo))
    c = V.mean(axis=0)
    r_mean = float(np.linalg.norm(V - c, axis=1).mean())
    return r_mean, len(V), L


def _remap_ids(mesh, id_remap):
    """Rewrite cell/facet marker values ({'cells': {old: new},
    'facets': {old: new}}) — the reference's volume/entity-ID flags."""
    from vasp_tpu.mesh.tetmesh import TetMesh

    cm = mesh.cell_markers.copy()
    for old, new in (id_remap.get("cells") or {}).items():
        cm[mesh.cell_markers == old] = new
    fm = mesh.facet_markers.copy()
    for old, new in (id_remap.get("facets") or {}).items():
        fm[mesh.facet_markers == old] = new
    return TetMesh(mesh.coords, mesh.cells, cm, mesh.facets, fm)


def _write_preview(mesh, path):
    """Matplotlib preview: axial cross-section + marker histogram
    (replaces the reference's interactive VTK visualization gate)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    c = mesh.coords
    # slab within 5% of the z mid-plane (use the longest axis as "z")
    ax_long = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
    mid = 0.5 * (c[:, ax_long].max() + c[:, ax_long].min())
    w = 0.05 * (c[:, ax_long].max() - c[:, ax_long].min())
    cellc = c[mesh.cells].mean(axis=1)
    in_slab = np.abs(cellc[:, ax_long] - mid) < max(w, 1e-12)
    other = [a for a in range(3) if a != ax_long]
    sc = axes[0].scatter(cellc[in_slab, other[0]], cellc[in_slab, other[1]],
                         c=mesh.cell_markers[in_slab], s=4, cmap="coolwarm")
    axes[0].set_title("mid-plane cells by domain id")
    axes[0].set_aspect("equal")
    fig.colorbar(sc, ax=axes[0])
    ids, counts = np.unique(mesh.facet_markers, return_counts=True)
    axes[1].bar([str(i) for i in ids], counts)
    axes[1].set_title("marked facets per id")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def main_meshing(argv=None):
    args = read_command_line(argv)
    verbose = args.verbosity > 0
    branched = (args.has_multiple_inlets or args.extract_branch
                or args.branch_group_ids)
    if branched and (not args.input_model
                     or args.input_model == "parametric"):
        raise ValueError(
            "branch extraction / multi-inlet meshing needs a surface "
            "input (-i model.stl); the parametric generator is "
            "single-branch only")
    if args.meshing_parameters and args.meshing_method == "constant" \
            and args.edge_length is None:
        # reference -mp semantics: constant sizing's parameter IS the
        # target edge length
        args.edge_length = float(args.meshing_parameters[0])
    # reference aliases fold into the canonical knobs
    if args.number_of_sublayers_fluid is not None:
        args.n_r_fluid = args.number_of_sublayers_fluid
    if args.number_of_sublayers_solid is not None:
        args.n_r_solid = args.number_of_sublayers_solid
    if args.solid_thickness_parameters:
        stp = args.solid_thickness_parameters
        if args.solid_thickness == "variable":
            args.thickness_frac = float(stp[0])
        else:
            args.solid_thickness = str(stp[0])
    thickness_frac = getattr(args, "thickness_frac", 0.25)
    id_remap = {
        "cells": {1: args.fluid_volume_id, 2: args.solid_volume_id},
        "facets": {11: args.solid_side_wall_id,
                   22: args.interface_fsi_id,
                   33: args.solid_outer_wall_id},
    }
    if all(k == v for d in id_remap.values() for k, v in d.items()):
        id_remap = None

    if branched:
        # bifurcated-surface meshing (the reference's --extract-branch /
        # multi-inlet workflow, vmtkmeshgeneratorfsi.py:255-316; branched
        # backbone in preprocessing/bifurcation.py)
        thickness = (None if args.solid_thickness in ("constant", "variable")
                     else float(args.solid_thickness))
        m = max(4, args.n_theta // 2)
        edge_factor = 1.0
        if args.edge_length:
            r_mean, _, _ = _surface_extent(args.input_model)
            edge_factor = float(args.edge_length) * m / (2.0 * r_mean)
        if args.coarsening_factor != 1.0:
            m = max(4, int(round(m / args.coarsening_factor)))
            edge_factor *= args.coarsening_factor
        attempt = 0
        while True:
            try:
                run_branched_pre_processing(
                    args.input_model, args.mesh_path, m=m,
                    n_r_solid=args.n_r_solid,
                    solid_thickness=thickness,
                    thickness_frac=thickness_frac,
                    scale_factor=args.scale_factor,
                    edge_factor=edge_factor,
                    branch_ids_offset=(args.branch_ids_offset
                                       if args.extract_branch
                                       or args.branch_group_ids else 0),
                    flatten_boundaries=not args.no_flatten,
                    n_probes=args.n_probes,
                    mean_inflow_rate=args.mean_inflow_rate,
                    flow_rate_factor=args.flow_rate_factor,
                    compress_mesh=args.compress_mesh,
                    mesh_format=args.mesh_format,
                    visualize=args.visualize,
                    id_remap=id_remap, verbose=verbose,
                )
                return
            except Exception as exc:
                attempt += 1
                if attempt > max(0, args.mesh_generation_retries):
                    raise
                m = max(4, int(round(0.8 * m)))
                edge_factor *= 1.25
                print(f"Branched mesh generation failed ({exc}); retry "
                      f"{attempt} at coarser resolution m={m}", flush=True)

    if args.input_model and args.input_model != "parametric":
        # surface-based two-domain meshing (STL; numpy-only — the
        # reference's VMTK/TetGen stage rebuilt in surface_mesh.py)
        thickness = (None if args.solid_thickness in ("constant", "variable")
                     else float(args.solid_thickness))
        n_z, n_theta = args.n_z, args.n_theta
        if args.edge_length:
            # derive axial/circumferential resolution from the target edge
            # length (reference -el sizing; preprocessing.py:397-435)
            r_mean, _, L = _surface_extent(args.input_model)
            n_z = max(3, int(round(L / args.edge_length)))
            n_theta = max(8, 2 * int(round(
                np.pi * r_mean / args.edge_length)))
        if args.coarsening_factor != 1.0:
            n_z = max(3, int(round(n_z / args.coarsening_factor)))
            n_theta = max(8, int(round(n_theta / args.coarsening_factor)))
        refine_region = args.refine_region
        if args.region_points:
            pts = np.asarray(args.region_points, float).reshape(-1, 3)
            _, _, L = _surface_extent(args.input_model)
            refine_region = [[*p, 0.1 * L] for p in pts]
        edge_length = args.edge_length
        if args.core.startswith("delaunay") and edge_length is None:
            # concrete default so the retry loop can coarsen it
            r_mean, _, _ = _surface_extent(args.input_model)
            edge_length = r_mean / 3.0
        if args.core.startswith("delaunay") and args.coarsening_factor != 1.0:
            edge_length *= args.coarsening_factor
        # retry-with-coarsening loop (the reference retries meshing with
        # an alternative remesh on failure, preprocessing.py:501-541)
        attempt = 0
        while True:
            try:
                run_surface_pre_processing(
                    args.input_model, args.mesh_path,
                    core=args.core, edge_length=edge_length,
                    n_z=n_z, n_theta=n_theta,
                    n_r_fluid=args.n_r_fluid, n_r_solid=args.n_r_solid,
                    solid_thickness=thickness,
                    thickness_frac=thickness_frac,
                    no_solid=args.no_solid,
                    scale_factor=args.scale_factor,
                    flow_extensions=args.add_flowextensions,
                    inlet_extension=args.inlet_flowextension,
                    outlet_extension=args.outlet_flowextension,
                    flatten_boundaries=not args.no_flatten,
                    smoothing_method=args.smoothing_method,
                    smoothing_iterations=args.smoothing_iterations,
                    smoothing_factor=args.smoothing_factor,
                    meshing_method=args.meshing_method,
                    refine_region=refine_region,
                    refine_factor=args.refine_factor,
                    n_probes=args.n_probes,
                    mean_inflow_rate=args.mean_inflow_rate,
                    flow_rate_factor=args.flow_rate_factor,
                    resampling_step=args.resampling_step,
                    sublayer_ratio_fluid=args.sublayer_ratio_fluid,
                    sublayer_ratio_solid=args.sublayer_ratio_solid,
                    compress_mesh=args.compress_mesh,
                    mesh_format=args.mesh_format,
                    remove_all=args.remove_all,
                    visualize=args.visualize,
                    id_remap=id_remap,
                    verbose=verbose,
                )
                return
            except Exception as exc:
                attempt += 1
                if attempt > max(0, args.mesh_generation_retries):
                    raise
                n_z = max(3, int(round(0.8 * n_z)))
                n_theta = max(8, int(round(0.8 * n_theta)))
                if args.core.startswith("delaunay"):
                    edge_length *= 1.25
                    print(f"Mesh generation failed ({exc}); retry "
                          f"{attempt} at coarser edge length "
                          f"{edge_length:.4g}", flush=True)
                else:
                    print(f"Mesh generation failed ({exc}); retry "
                          f"{attempt} at coarser resolution n_z={n_z} "
                          f"n_theta={n_theta}", flush=True)
    geometry = args.geometry
    sev = args.stenosis_severity or (0.5 if geometry == "stenosis" else 0.0)
    blg = args.bulge or (0.8 if geometry == "aneurysm" else 0.0)
    n_z, n_theta = args.n_z, args.n_theta
    if args.edge_length:
        n_z = max(3, int(round(args.length / args.edge_length)))
        n_theta = max(8, 2 * int(round(
            np.pi * args.r_inner / args.edge_length)))
    if args.coarsening_factor != 1.0:
        n_z = max(3, int(round(n_z / args.coarsening_factor)))
        n_theta = max(8, int(round(n_theta / args.coarsening_factor)))
    mesh = run_pre_processing(
        args.mesh_path,
        geometry=geometry,
        r_inner=args.r_inner, r_outer=args.r_outer, length=args.length,
        n_theta=n_theta, n_r_fluid=args.n_r_fluid,
        n_r_solid=args.n_r_solid, n_z=n_z,
        stenosis_severity=sev, stenosis_offset=args.stenosis_offset,
        bulge=blg, flatten_boundaries=not args.no_flatten,
        n_probes=args.n_probes, mean_inflow_rate=args.mean_inflow_rate,
        verbose=verbose,
    )
    if id_remap or args.compress_mesh or args.mesh_format == "xdmf" \
            or args.visualize:
        if id_remap:
            mesh = _remap_ids(mesh, id_remap)
        write_vasp_mesh(Path(args.mesh_path), mesh,
                        compress=args.compress_mesh)
        if args.mesh_format == "xdmf":
            from vasp_tpu.mesh.io import write_mesh_xdmf

            write_mesh_xdmf(Path(args.mesh_path))
        if args.visualize:
            mp = Path(args.mesh_path)
            _write_preview(mesh, mp.with_name(mp.stem + "_preview.png"))
