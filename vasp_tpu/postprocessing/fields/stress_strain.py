"""Solid stress / strain postprocessing.

Parity target: vasp-compute-stress
(reference: src/vasp/postprocessing/postprocessing_fenics/compute_stress_strain.py):
from the solid displacement series compute per timestep
- Green-Lagrange strain E = (F^T F - I)/2,
- 2nd Piola-Kirchhoff S(d, solid_properties) per solid subdomain (same
  material library as the solver, reference L13, 199-211),
- true (Cauchy) stress sigma = (1/J) F S F^T (L211),
- max principal stress/strain via the closed-form Cardano eigenvalue
  (reference common.get_eig, L243-247),
- time-averaged max principal fields (L267-279).
Outputs: StressStrain/{TrueStress,GreenLagrangeStrain,MaxPrincipalStress,
MaxPrincipalStrain}.xdmf time series + MaxPrincipal{Stress,Strain}_avg.xdmf
(reference L171-279).

Fields are DG1 per solid cell (evaluated at the 4 cell vertices from exact
P2 gradients), batched over timesteps with jnp.
"""
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from vasp_tpu.fem.assembly import cell_geometry
from vasp_tpu.fem.kinematics import S_, get_eig, I3
from vasp_tpu.fem.shape import p2_tet
from vasp_tpu.fem.functionspace import DVPSpace
from vasp_tpu.fem.smallmat import det3
from vasp_tpu.mesh.io import read_vasp_mesh
from vasp_tpu.postprocessing.common import read_parameters_from_file
from vasp_tpu.run.output import VizWriter

# reference tet vertices in reference coords
_VERTS = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])


def _normalize_solid_props(params):
    props = params.get("solid_properties")
    if props:
        return props if isinstance(props, list) else [props]
    ids = np.atleast_1d(params.get("dx_s_id", 2)).tolist()
    out = []
    for k, i in enumerate(ids):
        def pick(key, default=None):
            v = params.get(key, default)
            if isinstance(v, (list, tuple)):
                return v[k]
            return v
        out.append({
            "dx_s_id": i,
            "material_model": pick("material_model", "StVenantKirchoff"),
            "rho_s": pick("rho_s", 1e3),
            "mu_s": pick("mu_s"), "lambda_s": pick("lambda_s"),
            "C01": pick("C01"), "C10": pick("C10"), "C11": pick("C11"),
        })
    return out


def compute_stress_strain(folder, mesh_path=None, stride=1, n_devices=None):
    """n_devices > 1 shards chunks of timesteps across a ("t",) device
    mesh (multi-chip stress/strain — the reference's MPI-parallel
    postprocessing equivalent, compute_stress_strain.py under mpirun;
    bitwise identical to the single-device stream)."""
    folder = Path(folder)
    params = read_parameters_from_file(folder) or {}
    mesh_path = Path(mesh_path) if mesh_path else folder / "Mesh" / "mesh.h5"
    mesh = read_vasp_mesh(mesh_path)
    space = DVPSpace(mesh)
    solid_props = _normalize_solid_props(params)
    save_deg = int(params.get("save_deg", 2))

    # displacement series on full-mesh P2 dofs
    sep = folder / "Visualization_separate_domain"
    d_file = None
    for cand in ("d.h5", "d_solid.h5"):
        if (sep / cand).exists():
            d_file = sep / cand
            break
    if d_file is None:
        from vasp_tpu.postprocessing.fields.create_hdf5 import create_hdf5

        create_hdf5(folder, mesh_path=mesh_path, extract_solid_only=True)
        d_file = sep / "d_solid.h5"
    n_p2 = space.n_p2
    with h5py.File(d_file, "r") as f:
        times = f["time"][:]
        ids = f["ids"][:]
        T = len(times)
        steps = list(range(0, T, stride))
        times = times[steps]

    Jinv, _, _ = cell_geometry(mesh.coords, mesh.cells)
    # P2 gradients at cell vertices
    _, dN2 = p2_tet(_VERTS)  # (4,10,3)

    # per solid subdomain: batched kernel over (cells, 4 verts)
    out_dir = folder / "StressStrain"
    out_dir.mkdir(parents=True, exist_ok=True)

    all_sel = []
    kernels = []
    for sp_ in solid_props:
        sel = np.nonzero(mesh.cell_markers == sp_["dx_s_id"])[0]
        if len(sel) == 0:
            continue
        props = {k: v for k, v in sp_.items() if v is not None}

        def make_kernel(props):
            def cellvert(grad_d):
                F = I3 + grad_d
                J = det3(F)
                E = 0.5 * (F.T @ F - I3)
                S = S_(grad_d, props)
                sig = (F @ S @ F.T) / J
                return sig, E

            return jax.vmap(jax.vmap(cellvert))

        all_sel.append(sel)
        kernels.append(make_kernel(props))

    solid_cells = np.concatenate(all_sel)
    # DG1 output mesh: solid cells with their own vertex list (discontinuous
    # per cell is collapsed to shared vertices for visualization)
    sub_cells = mesh.cells[solid_cells]
    verts = np.unique(sub_cells)
    remap = -np.ones(mesh.num_vertices, np.int64)
    remap[verts] = np.arange(len(verts))
    out_cells = remap[sub_cells]
    out_coords = mesh.coords[verts]
    nv = len(verts)

    # checkpoint-layout series (the format the reference's h5py stack reads:
    # <name>/<name>_{i}/vector + dof metadata; see CheckpointSeriesWriter).
    # Tensors are FULL DG1: one row of 9 components per (cell, vertex) —
    # reference writes the complete tensor fields, compute_stress_strain.py:
    # 171-236, and the spectral stack consumes the 6 distinct components
    # (postprocessing_h5py_common.py:380-399).
    from vasp_tpu.run.output import CheckpointSeriesWriter

    K = len(solid_cells)
    writers = {
        name: CheckpointSeriesWriter(
            out_dir, name, out_coords, out_cells, ncomp=1,
            cell_dofs=np.arange(K * 4).reshape(K, 4))
        for name in ("MaxPrincipalStress", "MaxPrincipalStrain")
    }
    tensor_writers = {
        name: CheckpointSeriesWriter(
            out_dir, name, out_coords, out_cells, ncomp=9,
            cell_dofs=np.arange(K * 36).reshape(K, 36))
        for name in ("TrueStress", "GreenLagrangeStrain")
    }

    mps_sum = np.zeros(nv)
    mpe_sum = np.zeros(nv)

    dofs = space.cell_dofs_p2[solid_cells]  # (K,10)
    G = np.einsum("qaj,kji->kqai", dN2, Jinv[solid_cells])  # (K,4,10,3)
    Gj = jnp.asarray(G)
    dofs_j = jnp.asarray(dofs)

    def one_step_full(d):
        """(n_p2, 3) displacement -> (sig, eps, mps, mpe) for all solid
        cells (subdomain material kernels applied segment-wise)."""
        de = d[dofs_j]  # (K,10,3)
        gd = jnp.einsum("kai,kqaj->kqij", de, Gj)  # (K,4,3,3)
        sigs, epss = [], []
        off = 0
        for sel, kern in zip(all_sel, kernels):
            s, e = kern(gd[off:off + len(sel)])
            sigs.append(s)
            epss.append(e)
            off += len(sel)
        sig = jnp.concatenate(sigs, axis=0)
        eps = jnp.concatenate(epss, axis=0)
        mps = jax.vmap(jax.vmap(get_eig))(sig)
        mpe = jax.vmap(jax.vmap(get_eig))(eps)
        return sig, eps, mps, mpe

    device_mesh = None
    if n_devices is not None and int(n_devices) > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()[:int(n_devices)]
        device_mesh = Mesh(np.array(devs), ("t",))
        sh = NamedSharding(device_mesh, P("t"))
        nd = int(device_mesh.devices.size)
        # chunk bounded by BOTH the displacement rows (~0.5 GB) and the
        # per-step OUTPUT tensors sig/eps (K,4,3,3 each — 72K doubles per
        # step, the dominant buffer), and never padded past the series
        # length rounded up to the device count (a 3-step test run must
        # not allocate a 70k-step padded chunk — measured host OOM)
        chunk = nd * max(1, int(2.2e7 / max(n_p2, 1)))
        K_all = len(solid_cells)
        chunk = min(chunk, nd * max(1, int(6e6 / max(K_all, 1))))
        chunk = min(chunk, ((len(times) + nd - 1) // nd) * nd)
        batched = jax.jit(jax.vmap(one_step_full), in_shardings=sh,
                          out_shardings=sh)
    else:
        chunk = 1
        one_jit = jax.jit(one_step_full)

    # collapse DG1 -> vertex values (average of adjacent cells)
    def to_nodes(vals):
        out = np.zeros(nv)
        cnt = np.zeros(nv)
        np.add.at(out, out_cells.ravel(), vals.ravel())
        np.add.at(cnt, out_cells.ravel(), 1.0)
        return out / np.maximum(cnt, 1.0)

    # STREAM the displacement series `chunk` steps at a time: O(chunk x
    # ndof) memory regardless of T (the reference postprocesses under MPI
    # for the same reason, compute_stress_strain.py; a 1M-dof x 30k-step
    # series cannot be materialized on one host). Multi-device chunks are
    # padded to a fixed shape (one compiled program) and sharded over "t".
    f_d = h5py.File(d_file, "r")
    for c0 in range(0, len(times), chunk):
        c1 = min(c0 + chunk, len(times))
        d_chunk = np.zeros((c1 - c0, n_p2, 3))
        for i, k in enumerate(range(c0, c1)):
            d_chunk[i, ids] = f_d[f"displacement/vector_{steps[k]}"][:]
        if device_mesh is not None:
            pad = chunk - (c1 - c0)
            if pad:
                d_chunk = np.concatenate(
                    [d_chunk, np.repeat(d_chunk[-1:], pad, axis=0)], axis=0)
            sig_c, eps_c, mps_c, mpe_c = (
                np.asarray(a)[:c1 - c0]
                for a in batched(jnp.asarray(d_chunk)))
        else:
            s, e, mp, me = one_jit(jnp.asarray(d_chunk[0]))
            sig_c, eps_c = np.asarray(s)[None], np.asarray(e)[None]
            mps_c, mpe_c = np.asarray(mp)[None], np.asarray(me)[None]
        for i, k in enumerate(range(c0, c1)):
            t = times[k]
            sig, eps = sig_c[i], eps_c[i]
            mps, mpe = mps_c[i], mpe_c[i]
            # DG1 per-(cell,vertex) values, flat — max-principal scalars
            # and FULL 9-component tensors (row-major per point)
            writers["MaxPrincipalStress"].write(mps.reshape(-1), float(t))
            writers["MaxPrincipalStrain"].write(mpe.reshape(-1), float(t))
            tensor_writers["TrueStress"].write(
                sig.reshape(-1, 9).reshape(-1), float(t))
            tensor_writers["GreenLagrangeStrain"].write(
                eps.reshape(-1, 9).reshape(-1), float(t))
            mps_sum += to_nodes(mps)
            mpe_sum += to_nodes(mpe)
    f_d.close()

    avg_writers = {
        "MaxPrincipalStress_avg": mps_sum / len(times),
        "MaxPrincipalStrain_avg": mpe_sum / len(times),
    }
    for name, arr in avg_writers.items():
        w = VizWriter(out_dir, name, out_coords, out_cells, vector=False)
        w.write(arr, 0.0)
    return dict(times=times, mps_avg=mps_sum / len(times),
                mpe_avg=mpe_sum / len(times))
