"""End-to-end driver test: cylinder problem, a few timesteps.

Mirrors the reference's solver smoke test semantics: run the problem for a
few steps, regex-scrape the log with the same patterns the reference's
log_plotter/tests use, and assert finite, non-negative flow quantities
(reference: tests/test_simulations.py:60-125)."""
import io
import re
from contextlib import redirect_stdout

import numpy as np
import pytest

from vasp_tpu.run.driver import run_simulation

# cylinder_run fixture is session-scoped in conftest.py (shared with the
# postprocessing pipeline tests)


def test_log_contract(cylinder_run):
    """The stdout must match the reference log regexes
    (reference: src/vasp/postprocessing/log_plotter.py:72-84)."""
    ns, log, folder = cylinder_run
    ts = re.findall(r"Solved for timestep (.*), t = (.*) in (.*) s", log)
    assert len(ts) == 3
    newton = re.findall(
        r"Newton iteration (.*): r \(atol\) = (.*) \(tol = .*\), "
        r"r \(rel\) = (.*) \(tol = .*\)", log)
    assert len(newton) >= 3
    flow = re.findall(r"\s*Flow Rate at Inlet: (.*)", log)
    assert len(flow) == 3
    velocity = re.findall(r"\s*Velocity \(mean, min, max\): (.*), (.*), (.*)",
                          log)
    cfl = re.findall(r"\s*CFL \(mean, min, max\): (.*), (.*), (.*)", log)
    re_num = re.findall(
        r"\s*Reynolds Numbers \(mean, min, max\): (.*), (.*), (.*)", log)
    for triple in velocity + cfl + re_num:
        vals = [float(x) for x in triple]
        assert all(np.isfinite(vals))
        assert all(v >= 0 for v in vals)
    # velocity should be nonzero once the ramp has started
    assert float(velocity[-1][2]) > 0


def test_outputs_written(cylinder_run):
    ns, log, folder = cylinder_run
    viz = folder / "Visualization"
    for name in ("velocity", "displacement", "pressure"):
        assert (viz / f"{name}.h5").exists()
        assert (viz / f"{name}.xdmf").exists()
    ckpt = folder / "Checkpoint"
    assert (ckpt / "default_variables.json").exists()
    for f in ("checkpoint_d1.h5", "checkpoint_v1.h5", "checkpoint_p1.h5"):
        assert (ckpt / f).exists()


def test_output_file_lists_contract(cylinder_run):
    """Our XDMF must be parseable by the reference's regex parser
    (reference: postprocessing_common.py:63-121). We reimplement the parse
    here with the same patterns."""
    ns, log, folder = cylinder_run
    xdmf = folder / "Visualization" / "velocity.xdmf"
    lines = xdmf.read_text().splitlines()
    times, h5names, indices = [], [], []
    for line in lines:
        if "<Time Value" in line:
            times.append(float(re.findall('<Time Value="(.+?)"', line)[0]))
        if "VisualisationVector" in line:
            h5names.append(re.findall('"HDF">(.+?):/', line)[0])
            indices.append(
                int(re.findall("VisualisationVector/(.+?)</DataItem", line)[0])
            )
    assert len(times) == 3
    assert indices == [0, 1, 2]
    assert all(n == "velocity.h5" for n in h5names)


def test_save_deg2_refined_output(cylinder_run):
    """save_deg=2 output lives on the refined mesh: cells = 8x, nodes =
    vertices + edges (reference invariant: tests/test_postprocess_mesh.py:38-42)."""
    import h5py

    ns, log, folder = cylinder_run
    mesh = ns["mesh"]
    with h5py.File(folder / "Visualization" / "velocity.h5", "r") as f:
        topo = f["Mesh/0/mesh/topology"]
        geom = f["Mesh/0/mesh/geometry"]
        assert topo.shape[0] == 8 * mesh.num_cells
        assert geom.shape[0] == mesh.num_vertices + mesh.num_edges
        v0 = f["VisualisationVector/2"][:]
        assert np.all(np.isfinite(v0))
        assert np.abs(v0).max() > 0


def test_restart(cylinder_run, tmp_path):
    """Restart from checkpoint continues the time series
    (reference restart_folder semantics, SURVEY.md §5.4)."""
    ns, log, folder = cylinder_run
    buf = io.StringIO()
    with redirect_stdout(buf):
        ns2 = run_simulation(
            "cylinder",
            overrides=dict(
                T=0.005,
                dt=0.001,
                folder=str(tmp_path / "restart_run"),
                restart_folder=str(folder),
                mesh_path=None,
                quadrature_degree=3,
                save_deg=1,
                verbose=True,
                atol=1e-7,
                rtol=1e-7,
            ),
        )
    log2 = buf.getvalue()
    ts = re.findall(r"Solved for timestep (\d+),", log2)
    assert ts[0] == "4"  # continues after step 3


def test_restart_same_folder_appends(cylinder_run, tmp_path):
    """Restarting INTO the same folder appends a new h5 to the series and
    the XDMF covers both (the reference's restart-split output layout,
    parsed by output_file_lists, reference: postprocessing_common.py:63-121)."""
    import shutil

    from vasp_tpu.postprocessing.common import output_file_lists

    ns, log, folder = cylinder_run
    work = tmp_path / "restart_inplace"
    shutil.copytree(folder, work)
    buf = io.StringIO()
    with redirect_stdout(buf):
        run_simulation(
            "cylinder",
            overrides=dict(
                T=0.005, dt=0.001, folder=str(work),
                restart_folder=str(work), mesh_path=None,
                quadrature_degree=3, save_deg=2, save_step=1,
                verbose=False, atol=1e-7, rtol=1e-7,
            ),
        )
    h5s, times, idxs = output_file_lists(work / "Visualization" /
                                         "velocity.xdmf")
    assert len(times) == 5  # 3 original + 2 new
    assert len(set(h5s)) == 2  # split across two files
    assert (work / "Visualization" / "velocity_r1.h5").exists()
    assert times == sorted(times)
