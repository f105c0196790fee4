"""Band-pass filtered mode visualization + windowed-RMS amplitude fields.

Parity target: vasp-create-hi-pass-viz
(reference: src/vasp/postprocessing/postprocessing_h5py/create_hi_pass_viz.py):
- Butterworth band-pass (or multiband pass/stop list) filtering of EVERY
  node's time series (L190-215),
- windowed-RMS amplitude fields (window 250 for d/v/p, 50 for strain,
  L222-228),
- writes the filtered field series + amplitude series as h5+XDMF in the
  VisualisationVector layout (L345-368), plus an amplitude-percentile CSV
  (L370-416).
"""
from pathlib import Path

import numpy as np

from vasp_tpu.mesh.io import read_vasp_mesh
from vasp_tpu.mesh.refine import refine_uniform
from vasp_tpu.postprocessing.common import (
    output_file_lists,
    read_parameters_from_file,
)
from vasp_tpu.postprocessing.spectral import core as spec
from vasp_tpu.run.output import VizWriter

_FIELD_FILE = {"v": "velocity", "d": "displacement", "p": "pressure"}
_DEFAULT_RMS_WINDOW = {"v": 250, "d": 250, "p": 250, "strain": 50}


def create_hi_pass_viz(folder, quantity="d", lowcut=25.0, highcut=100000.0,
                       filter_type="bandpass", mesh_path=None,
                       bands=None, amplitude=True, start_t=None, end_t=None,
                       stride=1):
    """Filter the node x time series of `quantity` and write
    Visualization_hi_pass/<q>_<low>_to_<high>.{h5,xdmf} (+ amplitude)."""
    import h5py

    folder = Path(folder)
    params = read_parameters_from_file(folder) or {}
    save_deg = int(params.get("save_deg", 2))
    mesh_path = Path(mesh_path) if mesh_path else folder / "Mesh" / "mesh.h5"

    if quantity == "strain":
        return _create_hi_pass_strain(folder, lowcut, highcut, bands,
                                      start_t, end_t, stride)

    mesh = read_vasp_mesh(mesh_path)
    out_mesh = refine_uniform(mesh) if save_deg == 2 else mesh

    viz = folder / "Visualization"
    name = _FIELD_FILE[quantity]
    h5s, times, idxs = output_file_lists(viz / f"{name}.xdmf")
    times = np.asarray(times)
    arrays = []
    cache = {}
    try:
        for h5name, idx in zip(h5s, idxs):
            if h5name not in cache:
                cache[h5name] = h5py.File(viz / h5name, "r")
            arrays.append(cache[h5name][f"VisualisationVector/{idx}"][:])
    finally:
        for f in cache.values():
            f.close()
    series = np.stack(arrays, axis=0)  # (T, N, c) or (T, N)
    fs = 1.0 / np.mean(np.diff(times)) if len(times) > 1 else 1.0

    flat = series.reshape(len(times), -1).T  # (N*c, T)
    if bands:
        # multiband pass/stop list (reference: create_hi_pass_viz.py:532-545)
        filtered = np.zeros_like(flat)
        for (lo, hi, btype) in bands:
            if btype == "pass":
                filtered += spec.butter_bandpass_filter(
                    flat, lowcut=lo, highcut=hi, fs=fs, order=6, btype="band"
                )
            else:
                filtered = spec.butter_bandpass_filter(
                    filtered, lowcut=lo, highcut=hi, fs=fs, order=6,
                    btype="stop",
                )
    else:
        highcut_eff = min(highcut, 0.5 * fs * 0.999)
        btype = "band" if filter_type in ("bandpass", "band") else filter_type
        if btype == "band" and highcut_eff >= 0.5 * fs * 0.99:
            btype = "highpass"
        filtered = spec.butter_bandpass_filter(
            flat, lowcut=lowcut, highcut=highcut_eff, fs=fs, order=6,
            btype=btype,
        )
    filtered_series = filtered.T.reshape(series.shape)

    out_dir = folder / "Visualization_hi_pass"
    tag = f"{quantity}_{int(lowcut)}_to_{int(highcut)}"
    vector = series.ndim == 3
    writer = VizWriter(out_dir, tag, out_mesh.coords, out_mesh.cells,
                       vector=vector)
    for k, t in enumerate(times):
        writer.write(filtered_series[k], float(t))

    results = dict(filtered=filtered_series, times=times)
    if amplitude:
        window = _DEFAULT_RMS_WINDOW.get(quantity, 250)
        window = min(window, len(times))
        rms = spec.calculate_windowed_rms(filtered, window, axis=-1)
        rms_series = rms.T.reshape(series.shape)
        # amplitude of vectors: RMS of the magnitude-equivalent (per
        # component then norm)
        amp_writer = VizWriter(out_dir, f"{tag}_amplitude", out_mesh.coords,
                               out_mesh.cells, vector=vector)
        for k, t in enumerate(times):
            amp_writer.write(rms_series[k], float(t))
        # percentile CSV (reference L370-416)
        if vector:
            amp_mag = np.linalg.norm(rms_series, axis=2)
        else:
            amp_mag = rms_series
        pcts = [5, 25, 50, 75, 95, 99]
        table = np.column_stack(
            [times] + [np.percentile(amp_mag, p, axis=1) for p in pcts]
        )
        np.savetxt(out_dir / f"{tag}_amplitude_percentiles.csv", table,
                   delimiter=",",
                   header="time," + ",".join(f"p{p}" for p in pcts))
        results["amplitude"] = rms_series
    return results


def _create_hi_pass_strain(folder, lowcut, highcut, bands, start_t, end_t,
                           stride):
    """Strain band-pass: filter the 6 distinct Green-Lagrange components,
    windowed-RMS their amplitudes, reassemble the symmetric amplitude
    tensor, and take its max-principal value per DG point — the reference's
    strain quantity (reference: create_hi_pass_viz.py:295-325; RMS window
    50, L222-228)."""
    import jax
    import jax.numpy as jnp

    from vasp_tpu.fem.kinematics import get_eig
    from vasp_tpu.postprocessing.spectral.transform import (
        create_transformed_matrix,
        _TENSOR_SLOTS,
    )
    from vasp_tpu.run.output import CheckpointSeriesWriter

    comps, times, npz_dir = create_transformed_matrix(
        folder, "strain", start_t=start_t, end_t=end_t, stride=stride)
    import pickle

    with open(npz_dir / "dof_info.pkl", "rb") as f:
        di = pickle.load(f)
    coords = di["mesh/geometry"]
    cells = di["mesh/topology"]
    K = len(cells)
    fs = 1.0 / np.mean(np.diff(times)) if len(times) > 1 else 1.0

    def filt(mat):
        if bands:
            out = np.zeros_like(mat)
            for (lo, hi, btype) in bands:
                if btype == "pass":
                    out += spec.butter_bandpass_filter(
                        mat, lowcut=lo, highcut=hi, fs=fs, order=6,
                        btype="band")
                else:
                    out = spec.butter_bandpass_filter(
                        out, lowcut=lo, highcut=hi, fs=fs, order=6,
                        btype="stop")
            return out
        hi_eff = min(highcut, 0.5 * fs * 0.999)
        btype = "band" if hi_eff < 0.5 * fs * 0.99 else "highpass"
        return spec.butter_bandpass_filter(mat, lowcut=lowcut,
                                           highcut=hi_eff, fs=fs, order=6,
                                           btype=btype)

    window = min(_DEFAULT_RMS_WINDOW["strain"], len(times))
    filtered = {c: filt(m) for c, m in comps.items()}  # (Npts, T) each
    rms = {c: spec.calculate_windowed_rms(m, window, axis=-1)
           for c, m in filtered.items()}

    # symmetric amplitude tensor per (point, time) -> max principal value
    npts, T = rms["11"].shape
    A = np.zeros((npts, T, 3, 3))
    for cname, slot in _TENSOR_SLOTS.items():
        i, j = divmod(slot, 3)
        A[:, :, i, j] = rms[cname]
        A[:, :, j, i] = rms[cname]
    eig = jax.jit(jax.vmap(jax.vmap(get_eig)))
    mps_amp = np.asarray(eig(jnp.asarray(A)))  # (Npts, T)

    out_dir = folder / "Visualization_hi_pass"
    tag = f"strain_{int(lowcut)}_to_{int(highcut)}"
    # filtered tensor series (checkpoint layout, full 9 components) and the
    # max-principal amplitude series
    wt = CheckpointSeriesWriter(out_dir, tag, coords, cells, ncomp=9,
                                cell_dofs=np.arange(K * 36).reshape(K, 36))
    wa = CheckpointSeriesWriter(out_dir, f"{tag}_amplitude", coords, cells,
                                ncomp=1,
                                cell_dofs=np.arange(K * 4).reshape(K, 4))
    full = np.zeros((npts, T, 9))
    for cname, slot in _TENSOR_SLOTS.items():
        i, j = divmod(slot, 3)
        full[:, :, 3 * i + j] = filtered[cname]
        full[:, :, 3 * j + i] = filtered[cname]
    for k, t in enumerate(times):
        wt.write(full[:, k, :].reshape(-1), float(t))
        wa.write(mps_amp[:, k], float(t))

    pcts = [5, 25, 50, 75, 95, 99]
    table = np.column_stack(
        [times] + [np.percentile(mps_amp, p, axis=0) for p in pcts])
    np.savetxt(out_dir / f"{tag}_amplitude_percentiles.csv", table,
               delimiter=",",
               header="time," + ",".join(f"p{p}" for p in pcts))
    return dict(times=times, amplitude=mps_amp)
