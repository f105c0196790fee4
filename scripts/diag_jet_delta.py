"""Prototype: endgame residual via Taylor-delta (jet) around an f64 anchor.

R(U) = R64(A) + segsum(delta_e(U, A)) with delta_e the order-3 Taylor
polynomial of each element kernel along du = U - A, evaluated in f32.
Validates accuracy against the true f64 residual on a small CPU system.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import jet

from vasp_tpu.fem.dirichlet import DirichletBC
from vasp_tpu.fem.assembly import Assembler, build_scatter_plan
from vasp_tpu.mesh.generate import fsi_tube_mesh
from vasp_tpu.run.system import FSISystem


def build_small():
    mesh = fsi_tube_mesh(
        r_inner=0.001, r_outer=0.0013, length=0.003,
        n_theta=8, n_r_fluid=2, n_r_solid=1, n_z=3,
    )
    E, nu = 1e6, 0.45
    mu_s = E / (2 * (1 + nu))
    lam_s = nu * 2 * mu_s / (1 - 2 * nu)
    cfg = dict(
        dt=0.001, theta=0.501, rho_f=1.025e3, mu_f=3.5e-3, dx_f_id=1,
        rho_s=1e3, mu_s=mu_s, lambda_s=lam_s, dx_s_id=2,
        material_model="StVenantKirchoff", extrapolation="laplace",
        extrapolation_sub_type="constant", quadrature_degree=3,
        robin_bc=True, k_s=[1e5], c_s=[10], ds_s_id=[33],
    )
    return FSISystem(mesh, cfg)


def delta_local(block, U, A, U0, order=3):
    """Order-`order` Taylor delta of the block's local residual along
    U - A, element work in f32."""
    du = (U - A).astype(jnp.float32)
    if hasattr(block, "Jinv"):  # CellBlock
        args_a = [A[block.dofs].astype(jnp.float32),
                  U0[block.dofs].astype(jnp.float32),
                  block.Jinv.astype(jnp.float32),
                  block.detJ.astype(jnp.float32),
                  block.vol.astype(jnp.float32)]
        dargs = [du[block.dofs]] + [jnp.zeros_like(a) for a in args_a[1:]]
        fn = jax.vmap(block.kernel)
    else:  # FacetBlock
        args_a = [A[block.dofs].astype(jnp.float32),
                  block.area2.astype(jnp.float32)]
        dargs = [du[block.dofs], jnp.zeros_like(args_a[1])]
        fn = jax.vmap(block.kernel, in_axes=(0, 0))

    series = [tuple(dargs)] + [tuple(jnp.zeros_like(a) for a in args_a)
                               for _ in range(order - 1)]
    series = [tuple(s[i] for s in series) for i in range(len(args_a))]
    _, out_series = jet.jet(fn, tuple(args_a), tuple(series))
    return sum(out_series)


def main():
    system = build_small()
    ndof = system.space.ndof
    plan = build_scatter_plan(system.assembler.blocks, ndof)
    asm = Assembler(ndof, system.assembler.blocks, scatter_plan=plan)

    rng = np.random.default_rng(0)
    U0 = jnp.asarray(rng.normal(0.0, 1e-5, ndof))
    A = U0 + jnp.asarray(rng.normal(0.0, 1e-4, ndof))

    R_A = asm.residual(A, U0)
    scale = float(jnp.abs(R_A).max())
    print(f"ndof={ndof}  |R(A)|_max={scale:.3e}")

    for dmag in (1e-3, 1e-4, 1e-5, 1e-6):
        du = jnp.asarray(rng.normal(0.0, dmag, ndof))
        U = A + du
        R_true = asm.residual(U, U0)
        parts = [delta_local(b, U, A, U0) for b in asm.blocks]
        delta = asm._accumulate(parts, jnp.float64)
        R_delta = R_A + delta
        err = float(jnp.abs(R_delta - R_true).max())
        dnorm = float(jnp.abs(R_true - R_A).max())
        print(f"|du|~{dmag:.0e}: |dR|_max={dnorm:.3e} "
              f"abs_err={err:.3e} rel_to_dR={err/max(dnorm,1e-300):.2e}")


if __name__ == "__main__":
    main()
