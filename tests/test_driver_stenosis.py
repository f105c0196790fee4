"""Offset-stenosis driver smoke: Womersley inflow + pulsatile interface
pressure + FSI-sphere remarking through the full loop — the reference's
solver regression semantics (finite, non-negative velocity/CFL/Re,
reference: tests/test_simulations.py:17-57 for the case; golden values are
FEniCS-specific, so we assert the physical invariants + probe sanity)."""
import io
import re
from contextlib import redirect_stdout

import numpy as np
import pytest

from vasp_tpu.run.driver import run_simulation


@pytest.fixture(scope="module")
def stenosis_run(tmp_path_factory):
    folder = tmp_path_factory.mktemp("stenosis_results")
    buf = io.StringIO()
    with redirect_stdout(buf):
        ns = run_simulation(
            "offset_stenosis",
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
                # place the FSI sphere over the generated stenosis throat
                fsi_region=[0.0, 0.0, 0.012, 0.01],
                generated_mesh_params=dict(n_theta=8, n_z=10),
                verbose=True,
            ),
        )
    return ns, buf.getvalue(), folder


def test_stenosis_smoke(stenosis_run):
    ns, log, folder = stenosis_run
    ts = re.findall(r"Solved for timestep (\d+),", log)
    assert len(ts) == 3
    # Womersley inflow: nonzero flow rate at the inlet
    flow = [float(x) for x in re.findall(r"\s*Flow Rate at Inlet: (.*)", log)]
    assert len(flow) == 3 and all(np.isfinite(flow))
    assert flow[-1] > 0
    # probe prints in the reference format (both velocity and displacement)
    assert re.search(r"Probe Point 0: Velocity: \(.*\) \| Pressure: ", log)
    assert re.search(r"Probe Point 0: Displacement: \(", log)
    # min Jacobian guard printed and positive
    jacs = [float(x) for x in re.findall(r"Minimum Jacobian: (.*)", log)]
    assert len(jacs) == 3 and min(jacs) > 0
    # pulsatile pressure + ramp lines (log_plotter contract)
    assert len(re.findall(r"ramp_factor = (.*) m\^3/s", log)) >= 3
    assert len(re.findall(
        r"Instantaneous normal stress prescribed at the FSI interface", log
    )) >= 3
    # two-viscosity zone machinery: both fluid zones configured
    assert ns["cfg"]["mu_f"] == [1.5e-3, 1.0e-2]
    # velocity/CFL/Re triples finite and non-negative (reference semantics)
    for key in ("Velocity", "CFL", "Reynolds Numbers"):
        triples = re.findall(
            rf"\s*{key} \(mean, min, max\): (.*), (.*), (.*)", log)
        vals = np.array(triples, float)
        assert np.all(np.isfinite(vals)) and np.all(vals >= 0)
