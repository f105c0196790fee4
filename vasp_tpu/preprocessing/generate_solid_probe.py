"""Solid probe generation.

Parity target: vasp-generate-solid-probe
(reference: src/vasp/preprocessing/generate_solid_probe.py:36-88): pick 50
random solid-domain (marker 2) vertices inside a user box and write
`<case>_solid_probe.{csv,json}` next to the mesh."""
import argparse
import json
from pathlib import Path

import numpy as np

from vasp_tpu.postprocessing.common import get_domain_ids


def generate_solid_probe(mesh_path, fsi_region, n_probes=50, seed=None):
    import h5py

    mesh_path = Path(mesh_path)
    with h5py.File(mesh_path, "r") as mesh:
        coords = mesh["mesh/coordinates"][:, :]
    _, solid_ids, _ = get_domain_ids(mesh_path, 1, 2)
    x_min, x_max, y_min, y_max, z_min, z_max = fsi_region
    in_box = np.where(
        (coords[:, 0] > x_min) & (coords[:, 0] < x_max)
        & (coords[:, 1] > y_min) & (coords[:, 1] < y_max)
        & (coords[:, 2] > z_min) & (coords[:, 2] < z_max)
    )[0]
    ids = np.intersect1d(in_box, solid_ids)
    rng = np.random.default_rng(seed)
    n = min(n_probes, len(ids))
    ids = rng.choice(ids, n, replace=False)
    pts = coords[ids]
    np.savetxt(mesh_path.with_name(mesh_path.stem + "_solid_probe.csv"),
               pts, delimiter=",")
    out_json = mesh_path.with_name(mesh_path.stem + "_solid_probe.json")
    with open(out_json, "w") as f:
        json.dump(pts.tolist(), f)
    print(f"Solid probe saved to {out_json}")
    return out_json


def main(argv=None):
    parser = argparse.ArgumentParser(prog="vasp-generate-solid-probe")
    parser.add_argument("--mesh-path", type=Path, required=True)
    parser.add_argument("--fsi-region", type=float, nargs=6, required=True,
                        metavar=("X_MIN", "X_MAX", "Y_MIN", "Y_MAX",
                                 "Z_MIN", "Z_MAX"))
    args = parser.parse_args(argv)
    generate_solid_probe(args.mesh_path, args.fsi_region)
