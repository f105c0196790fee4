"""Waveform library: Womersley flow-rate reproduction, ramps, interface
pressure, patient interpolation (reference parity: docs/aneurysm.md:48-70
formula and simulation_common.py:351-401)."""
import numpy as np
import pytest

from vasp_tpu.bcs.waveforms import (
    CosineRamp,
    FourierFlowWaveform,
    InterfacePressure,
    ParabolicInflow,
    PatientWaveform,
    WomersleyInflow,
)
from vasp_tpu.models.waveform_data import FC_MCA_10, load_fc


def _disk_points(R, n=4000, seed=0):
    rng = np.random.default_rng(seed)
    r = R * np.sqrt(rng.uniform(0, 1, n))
    th = rng.uniform(0, 2 * np.pi, n)
    return np.stack([r * np.cos(th), r * np.sin(th), np.zeros(n)], axis=1)


def test_womersley_flow_rate():
    """Integrating the Womersley profile over the inlet disk must reproduce
    Q(t) = Re{sum Cn e^{inwt}} at several times."""
    An, Bn = load_fc("FC_MCA_10")
    period, Q_mean, nu, R = 0.951, 2.5e-6, 3.5e-6, 0.002
    w = WomersleyInflow(An=An, Bn=Bn, period=period, Q_mean=Q_mean, nu=nu,
                        normal=[0, 0, 1], center=[0, 0, 0], radius=R)
    q = FourierFlowWaveform(An, Bn, period, Q_mean)
    pts = _disk_points(R, n=60000)
    area_per_pt = np.pi * R ** 2 / len(pts)
    for t in (0.0, 0.2, 0.45, 0.7):
        w.set_t(t)
        u = w(pts)  # (n,3), along -normal
        Q_num = -u[:, 2].sum() * area_per_pt
        assert abs(Q_num - q(t)) < 0.03 * abs(Q_mean), (t, Q_num, q(t))


def test_womersley_no_slip():
    An, Bn = load_fc("FC_MCA_10")
    w = WomersleyInflow(An=An, Bn=Bn, period=0.951, Q_mean=2.5e-6,
                        nu=3.5e-6, normal=[0, 0, 1], center=[0, 0, 0],
                        radius=0.002)
    w.set_t(0.3)
    rim = np.array([[0.002, 0.0, 0.0], [0.0, -0.002, 0.0]])
    u = w(rim)
    assert np.abs(u).max() < 1e-12


def test_cosine_ramp():
    r = CosineRamp(0.1, 0.3)
    assert r(0.0) == 0.0
    assert r(0.1) == 0.0
    assert abs(r(0.2) - 0.5) < 1e-12
    assert r(0.3) == 1.0
    assert r(1.0) == 1.0


def test_parabolic_inflow_profile():
    p = ParabolicInflow(v_max_final=2.0, t_ramp=0.1, normal=[0, 0, 1],
                        center=[0, 0, 0], area=np.pi * 0.01 ** 2)
    p.update(1.0)  # past ramp
    u_center = p(np.array([[0.0, 0.0, 0.0]]))
    assert abs(u_center[0, 2] + 2.0) < 1e-12  # along -normal
    u_wall = p(np.array([[0.01, 0.0, 0.0]]))
    assert abs(u_wall[0, 2]) < 1e-12


def test_interface_pressure_matches_reference_formula():
    """P(t) = ramp * |sum (An - iBn) e^{inwt}| * P_mean
    (reference: simulation_common.py:370-396)."""
    An, Bn = load_fc("FC_Pressure")
    P = InterfacePressure(t=0, t_ramp_start=0.0, t_ramp_end=0.2, An=An,
                          Bn=Bn, period=0.951, P_mean=11200, verbose=False)
    t = 0.5
    P.update(t)
    omega = 2 * np.pi / 0.951
    Pn = abs(sum((An[i] - 1j * Bn[i]) * np.exp(1j * i * omega * t)
                 for i in range(len(An))))
    assert abs(P.P - Pn * 11200) < 1e-9
    # during ramp
    P.update(0.1)
    assert 0 < P.P < 1.2 * 11200


def test_patient_waveform_interp():
    w = PatientWaveform(times=[0, 1, 2], values=[0.0, 1.0, 0.0], period=2.0)
    assert abs(w(0.5) - 0.5) < 1e-12
    assert abs(w(2.5) - 0.5) < 1e-12  # periodic


def test_fc_data_normalized():
    """Flow-rate Fourier tables are mean-normalized (C0 = 1)."""
    assert FC_MCA_10[0, 0] == 1.0 and FC_MCA_10[0, 1] == 0.0
