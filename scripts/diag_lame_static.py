"""Diagnose the Lame quasistatic test: is the STATIC equilibrium the Lame
bulge (wall carries P) or the spurious fluid-pressurized state (u~0)?

Runs the predeform model with dt=10 (mass terms ~0 -> every step is a
static FSI solve) and a 10-step cosine pressure ramp, then prints the
interface radial displacement and the fluid pressure stats per step.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_vasp"))

import numpy as np
from vasp_tpu.run.driver import run_simulation

a, b, L = 0.001, 0.0013, 0.010
E, nu = 1e6, 0.45
mu_s = E / (2 * (1 + nu))
lam_s = nu * 2 * mu_s / (1 - 2 * nu)
P = 1000.0

ns = run_simulation("predeform", dict(
    folder="/tmp/lame_static", mesh_path=None,
    generated_mesh_params=dict(
        r_inner=a, r_outer=b, length=L,
        n_theta=8, n_r_fluid=1, n_r_solid=2, n_z=5),
    fsi_region=[0.0, 0.0, 0.0, 1.0],
    robin_bc=False, solid_properties=None,
    material_model="StVenantKirchoff", mu_s=mu_s, lambda_s=lam_s,
    v_max_final=0.0, P_final=P,
    t_start_v=0.0, t_end_v=10.0, t_start_p=10.0, t_end_p=110.0,
    T=130.0, dt=10.0, quadrature_degree=3,
    lmbda=1.0, max_it=30, raise_on_fail=False, atol=1e-6, rtol=1e-6,
    save_deg=1, save_step=1000, checkpoint_step=1000, verbose=True,
))

space = ns["space"]
d, v, p = space.split(np.asarray(ns["dvp_"]["n"]))
d = d.reshape(-1, 3)
xy2 = np.asarray(space.p2_coords)
r = np.linalg.norm(xy2[:, :2], axis=1)
sel = (np.abs(r - a) < 0.05 * a) & (np.abs(xy2[:, 2]) < 0.15 * L)
er = xy2[sel, :2] / r[sel, None]
u_r = np.einsum("ij,ij->i", d[sel, :2], er)
A = P * a * a / (b * b - a * a)
u_exact = (1 + nu) / E * (A * (1 - 2 * nu) * a + A * b * b / a)
print("FINAL u_r mean=%.4e exact=%.4e ratio=%.3f" % (
    float(np.mean(u_r)), u_exact, float(np.mean(u_r)) / u_exact))
print("fluid p stats: mean=%.3f min=%.3f max=%.3f" % (
    float(np.mean(p)), float(np.min(p)), float(np.max(p))))
print("v stats: max|v|=%.3e" % float(np.max(np.abs(v))))
