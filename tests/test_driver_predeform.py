"""Predeform (prestress inflation) end-to-end: theta=1 backward Euler,
MooneyRivlin wall, Robin BC, FSI sphere restriction, then the
vasp-predeform-mesh inverse transform — BASELINE config 2 semantics
(reference: tests/test_predeform.py + src/vasp/simulations/predeform.py)."""
import io
import re
from contextlib import redirect_stdout

import numpy as np
import pytest

from vasp_tpu.mesh.io import read_vasp_mesh
from vasp_tpu.postprocessing.mesh_stages import predeform_mesh
from vasp_tpu.run.driver import run_simulation


@pytest.fixture(scope="module")
def predeform_run(tmp_path_factory):
    folder = tmp_path_factory.mktemp("predeform_results")
    buf = io.StringIO()
    with redirect_stdout(buf):
        ns = run_simulation(
            "predeform",
            overrides=dict(
                T=0.03,
                dt=0.01,
                folder=str(folder),
                mesh_path=None,
                quadrature_degree=2,
                save_deg=1,
                save_step=1,
                checkpoint_step=3,
                # KNOWN ISSUE (round-2 work): the theta=1 MooneyRivlin
                # inflation converges fast to ~1e-5 then enters a slow tail
                # concentrated at FSI-interface P2 edge dofs (where the
                # constant-pressure load lives: P2 vertex basis functions
                # integrate to zero over facets). The theta=0.501 FSI cases
                # converge to 1e-9+. Tolerances here reflect that.
                atol=5e-5,
                rtol=1e-4,
                # exact Newton (rebuild every iteration): test steps are
                # larger increments than production, where the reference's
                # chord reuse (recompute=20) relies on tiny dt
                recompute=1,
                recompute_tstep=1,
                # two-phase ramps squeezed into the short test horizon with
                # physiological per-step pressure increments
                t_start_v=0.0, t_end_v=0.01, t_start_p=0.01, t_end_p=0.05,
                v_max_final=0.05,
                P_final=400.0,
                verbose=True,
                generated_mesh_params=dict(n_theta=8, n_z=4),
            ),
        )
    return ns, buf.getvalue(), folder


def test_predeform_converges_and_inflates(predeform_run):
    ns, log, folder = predeform_run
    ts = re.findall(r"Solved for timestep (\d+),", log)
    assert len(ts) == 3
    # theta=1.0 was used
    assert ns["cfg"]["theta"] == 1.0
    # pressure ramp prints (reference InnerP format "P = ... Pa")
    ps = [float(x) for x in re.findall(r"^P = (.*) Pa$", log, re.M)]
    assert len(ps) >= 3
    assert ps[-1] > 0
    # wall moved outward under pressure
    d, v, p = ns["space"].split(ns["dvp_"]["n"])
    d = np.asarray(d)
    iface = ns["space"].p2_dofs_on_facets(22)
    if len(iface) == 0:
        pytest.skip("fsi sphere removed all interface facets")
    xy = ns["space"].p2_coords[iface][:, :2]
    rhat = xy / np.linalg.norm(xy, axis=1, keepdims=True)
    dr = np.einsum("ki,ki->k", d[iface][:, :2], rhat)
    assert np.isfinite(dr).all()
    assert dr.mean() > 0


def test_predeform_mesh_inverse(predeform_run):
    """vasp-predeform-mesh subtracts the final displacement
    (reference: tests/test_predeform.py:14-33 semantics)."""
    ns, log, folder = predeform_run
    out = predeform_mesh(folder)
    orig = read_vasp_mesh(folder / "Mesh" / "mesh.h5")
    pre = read_vasp_mesh(out)
    d, _, _ = ns["space"].split(ns["dvp_"]["n"])
    d = np.asarray(d)[: orig.num_vertices]
    assert np.allclose(pre.coords, orig.coords - d, atol=1e-12)
    # predeformed interior shrank where the wall inflated
    assert not np.allclose(pre.coords, orig.coords)
