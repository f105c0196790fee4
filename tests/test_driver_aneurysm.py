"""Aneurysm driver smoke: Womersley + Robin BC + mean-field accumulation and
finished() outputs (reference: src/vasp/simulations/aneurysm.py:153-222)."""
import io
import re
from contextlib import redirect_stdout

import h5py
import numpy as np
import pytest

from vasp_tpu.run.driver import run_simulation


@pytest.fixture(scope="module")
def aneurysm_run(tmp_path_factory):
    folder = tmp_path_factory.mktemp("aneurysm_results")
    buf = io.StringIO()
    with redirect_stdout(buf):
        ns = run_simulation(
            "aneurysm",
            overrides=dict(
                T=0.003,
                dt=0.001,
                folder=str(folder),
                mesh_path=None,
                quadrature_degree=2,
                save_deg=1,
                save_step=1,
                checkpoint_step=10,
                atol=1e-6,
                rtol=1e-6,
                recompute=5,
                recompute_tstep=1,
                # accumulate means from step 2 on (production: after one
                # cardiac cycle = 951 steps, reference aneurysm.py:38)
                save_solution_after_tstep=2,
                generated_mesh_params=dict(n_theta=8, n_z=8),
                verbose=True,
            ),
        )
    return ns, buf.getvalue(), folder


def test_aneurysm_smoke(aneurysm_run):
    ns, log, folder = aneurysm_run
    assert len(re.findall(r"Solved for timestep", log)) == 3
    # Robin BC active
    assert ns["cfg"]["robin_bc"] and ns["cfg"]["k_s"] == [1e5]
    jacs = [float(x) for x in re.findall(r"Minimum Jacobian: (.*)", log)]
    assert min(jacs) > 0


def test_aneurysm_mean_fields(aneurysm_run):
    """post_solve accumulates means after save_solution_after_tstep and
    finished() writes them (reference aneurysm.py:186-222)."""
    from vasp_tpu.postprocessing.common import output_file_lists

    ns, log, folder = aneurysm_run
    assert ns["mean_count"] == 2  # steps 2 and 3
    viz = folder / "Visualization"
    for name in ("d_mean", "u_mean", "p_mean"):
        # write_checkpoint layout (reference aneurysm.py:206-222) parsed by
        # the reference-layout tooling
        path = viz / f"{name}.h5"
        assert path.exists(), name
        h5s, times, idxs = output_file_lists(viz / f"{name}.xdmf")
        assert h5s == [f"{name}.h5"] and idxs == [0]
        with h5py.File(path) as f:
            arr = f[f"{name}/{name}_0/vector"][:]
            assert np.all(np.isfinite(arr))
            assert f[f"{name}/{name}_0/cell_dofs"].shape[0] > 0
    with h5py.File(viz / "u_mean.h5") as f:
        assert np.abs(f["u_mean/u_mean_0/vector"][:]).max() > 0
