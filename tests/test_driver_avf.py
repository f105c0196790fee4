"""AVF driver smoke: two parabolic inlets with patient-waveform series, two
MooneyRivlin solid domains, list-valued ids, Robin BC
(reference: src/vasp/simulations/avf.py)."""
import io
import re
from contextlib import redirect_stdout

import numpy as np
import pytest

from vasp_tpu.run.driver import run_simulation


@pytest.fixture(scope="module")
def avf_run(tmp_path_factory):
    folder = tmp_path_factory.mktemp("avf_results")
    buf = io.StringIO()
    with redirect_stdout(buf):
        ns = run_simulation(
            "avf",
            overrides=dict(
                T=0.0003,
                dt=0.0001,
                folder=str(folder),
                mesh_path=None,
                patient_data_path=None,  # synthetic physiological default
                quadrature_degree=2,
                save_deg=1,
                save_step=1,
                checkpoint_step=10,
                atol=1e-6,
                rtol=1e-6,
                recompute=5,
                recompute_tstep=1,
                vel_t_ramp=0.0002,
                p_t_ramp_start=0.0001,
                p_t_ramp_end=0.0003,
                generated_mesh_params=dict(n_theta=8, n_z=8),
                verbose=True,
            ),
        )
    return ns, buf.getvalue(), folder


def test_avf_smoke(avf_run):
    ns, log, folder = avf_run
    assert len(re.findall(r"Solved for timestep", log)) == 3
    mesh = ns["mesh"]
    # two solid domains present (artery 2, vein 1002)
    assert {2, 1002} <= set(np.unique(mesh.cell_markers))
    # two fsi interface id groups
    markers = set(np.unique(mesh.facet_markers))
    assert 22 in markers or 1022 in markers
    # flow through both inlets: inlet1 flow rate finite
    flow = [float(x) for x in re.findall(r"\s*Flow Rate at Inlet: (.*)", log)]
    assert len(flow) == 3 and all(np.isfinite(flow))
    jacs = [float(x) for x in re.findall(r"Minimum Jacobian: (.*)", log)]
    assert min(jacs) > 0
    # both MooneyRivlin domains configured with distinct properties
    props = ns["cfg"]["solid_properties"]
    assert props[0]["C11"] == 2.2e6 and props[1]["C11"] == 0.538e6
