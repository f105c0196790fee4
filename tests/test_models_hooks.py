"""Problem-module hook contracts for all bundled cases (no time loop):
set_problem_parameters defaults match the reference's values, meshes
generate with the right markers, create_bcs yields a consistent BC set and
load function (reference problem files in src/vasp/simulations/)."""
import numpy as np
import pytest

from vasp_tpu.run.config import default_variables
from vasp_tpu.run.driver import load_problem_module
from vasp_tpu.run.system import FSISystem

ALL_PROBLEMS = ["cylinder", "offset_stenosis", "aneurysm", "avf", "predeform"]


@pytest.mark.parametrize("name", ALL_PROBLEMS)
def test_problem_setup(name):
    mod = load_problem_module(name)
    cfg = default_variables()
    cfg = mod.set_problem_parameters(default_variables=cfg, **cfg) or cfg
    cfg["mesh_path"] = None  # force the self-contained generated geometry
    ns = dict(cfg)
    mesh = mod.get_mesh_domain_and_boundaries(**ns)
    assert mesh.num_cells > 0
    system = FSISystem(mesh, cfg)
    space = system.space
    ns.update(mesh=mesh, system=system, space=space)
    if hasattr(mod, "initiate"):
        upd = mod.initiate(**ns)
        if upd:
            ns.update(upd)
    out = mod.create_bcs(t=0.0, **{k: v for k, v in ns.items() if k != "t"})
    assert "bcs" in out and len(out["bcs"]) > 0
    bc_set = system.make_bcset(out["bcs"])
    assert bc_set.mask.sum() > 0
    vals = bc_set.values_at(0.001)
    assert np.all(np.isfinite(vals))
    if "load_fn" in out and out["load_fn"] is not None:
        # update time-dependent expressions, then build the load
        ns.update(out)
        if hasattr(mod, "pre_solve"):
            mod.pre_solve(**{**ns, "t": 0.001})
        load = out["load_fn"](0.001)
        assert np.all(np.isfinite(np.asarray(load)))


def test_reference_parameter_parity():
    """Spot-check that defaults match the reference problem files."""
    stenosis = load_problem_module("offset_stenosis")
    cfg = stenosis.set_problem_parameters(default_variables=default_variables(),
                                          **default_variables())
    assert cfg["Q_mean"] == 2.5e-06       # offset_stenosis.py:59
    assert cfg["mu_f"] == [1.5e-3, 1.0e-2]  # :60
    assert cfg["dx_f_id"] == [1, 1001]    # :61
    assert cfg["theta"] == 0.501
    assert cfg["T_Cycle"] == 0.951

    aneurysm = load_problem_module("aneurysm")
    cfg = aneurysm.set_problem_parameters(default_variables=default_variables(),
                                          **default_variables())
    assert cfg["atol"] == 1e-10 and cfg["rtol"] == 1e-9  # aneurysm.py:48-49
    assert cfg["robin_bc"] and cfg["k_s"] == [1e5] and cfg["c_s"] == [10]

    avf = load_problem_module("avf")
    cfg = avf.set_problem_parameters(default_variables=default_variables(),
                                     **default_variables())
    assert cfg["dt"] == 0.0001 and cfg["T"] == 3  # avf.py:41-42
    assert cfg["fsi_id"] == [22, 1022]
    assert cfg["solid_properties"][0]["C11"] == 2.2e6  # avf.py:77

    pre = load_problem_module("predeform")
    cfg = pre.set_problem_parameters(default_variables=default_variables(),
                                     **default_variables())
    assert cfg["theta"] == 1.0 and cfg["lmbda"] == 0.5  # predeform.py:39,48
    assert cfg["P_final"] == 11332.4
    assert cfg["save_deg"] == 1
