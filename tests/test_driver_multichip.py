"""Multi-chip simulation through the PUBLIC driver entry point.

The reference's `mpirun -np N turtleFSI` is a first-class user workflow
(reference: docs/simulation.md:13-19): the solve distributes across ranks
but the outputs are identical artifacts in the same layout. Here the same
contract runs through ``run_simulation`` with ``n_devices=8`` (virtual CPU
devices, conftest): the sharded run must write the same Visualization
files with fields matching the single-device iterative run to solver
tolerance (reductions and halo arithmetic reorder floating-point sums, so
byte-equality is not the right bar; the reference's MPI runs differ from
serial the same way)."""
import io
from contextlib import redirect_stdout

import h5py
import numpy as np
import pytest

from vasp_tpu.run.driver import run_simulation

OVERRIDES = dict(
    T=0.002, dt=0.001, mesh_path=None, quadrature_degree=2,
    save_deg=1, save_step=1, checkpoint_step=10,
    atol=1e-8, rtol=1e-8, linear_solver="gmres", gmres_tol=1e-6,
    recompute_tstep=1, verbose=True,
)


def _run(tmp_path, name, **extra):
    folder = tmp_path / name
    buf = io.StringIO()
    with redirect_stdout(buf):
        run_simulation("cylinder",
                       overrides=dict(OVERRIDES, folder=str(folder), **extra))
    return folder, buf.getvalue()


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multichip_driver")
    single = _run(tmp, "single")
    sharded = _run(tmp, "sharded", n_devices=8)
    return single, sharded


def test_sharded_driver_matches_single_device(pair):
    (f1, log1), (f8, log8) = pair
    assert "sharded iterative path" not in log1
    for name, scale_floor in (("velocity", 1e-3), ("displacement", 1e-9),
                              ("pressure", 1e-1)):
        with h5py.File(f1 / "Visualization" / f"{name}.h5") as h1, \
                h5py.File(f8 / "Visualization" / f"{name}.h5") as h8:
            keys = sorted(h1["VisualisationVector"].keys(), key=int)
            assert keys == sorted(h8["VisualisationVector"].keys(), key=int)
            for k in keys:
                a = np.asarray(h1["VisualisationVector"][k])
                b = np.asarray(h8["VisualisationVector"][k])
                assert a.shape == b.shape
                scale = max(np.abs(a).max(), scale_floor)
                err = np.abs(a - b).max() / scale
                assert err < 1e-4, (name, k, err)


def test_sharded_driver_log_contract(pair):
    """The sharded run keeps the exact stdout contract (log_plotter
    regexes; reference: docs/offset_stenosis.md:197)."""
    import re

    (_, _), (f8, log8) = pair
    ts = re.findall(r"Solved for timestep (.*), t = (.*) in (.*) s", log8)
    assert len(ts) == 2
    assert (f8 / "Checkpoint" / "default_variables.json").exists()
