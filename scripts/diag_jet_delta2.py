"""Jet-delta accuracy on a REAL Newton trajectory (small tube, CPU).

Runs a scipy-LU Newton on a ramped FSI step, records iterates, and checks
R64(A) + jet_delta(U_k, A) against the true f64 residual for endgame pairs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from diag_jet_delta import build_small, delta_local
from vasp_tpu.fem.assembly import Assembler, build_scatter_plan
from vasp_tpu.fem.dirichlet import DirichletBC


def main():
    system = build_small()
    space = system.space
    ndof = space.ndof
    plan = build_scatter_plan(system.assembler.blocks, ndof)
    asm = Assembler(ndof, system.assembler.blocks, scatter_plan=plan)

    bcs = []
    for m in (2, 3, 11):
        bcs.append(DirichletBC(space.field_dofs("d",
                                                space.p2_dofs_on_facets(m)),
                               0.0))
    for m in (2, 11):
        bcs.append(DirichletBC(space.field_dofs("v",
                                                space.p2_dofs_on_facets(m)),
                               0.0))
    bc_set = system.make_bcset(bcs)
    load = 150.0 * jnp.asarray(system.interface_pressure_load())
    mask = jnp.asarray(bc_set.mask)
    mask_np = np.asarray(bc_set.mask)

    U0 = jnp.zeros(ndof)
    U = jnp.where(mask, 0.0, U0)

    def resid(Uc):
        R = asm.residual(Uc, U0) + load
        return jnp.where(mask, 0.0, R)

    iterates = [U]
    for it in range(8):
        R = resid(U)
        rn = float(jnp.linalg.norm(R))
        print(f"it {it}: |R| = {rn:.3e}", flush=True)
        if rn < 1e-10:
            break
        jacs = asm.element_jacobians(U, U0)
        A_csr = asm.to_csr(jacs, bc_mask=mask_np)
        dx = spla.spsolve(A_csr.tocsc(), np.asarray(R))
        U = U - jnp.asarray(dx)
        iterates.append(U)

    # endgame pairs: anchor at iterate k, evaluate at k+1 and k+2
    for ka in range(1, len(iterates) - 1):
        A = iterates[ka]
        R_A = asm.residual(A, U0)
        for ku in range(ka + 1, min(ka + 3, len(iterates))):
            Uk = iterates[ku]
            R_true = asm.residual(Uk, U0)
            parts = [delta_local(b, Uk, A, U0) for b in asm.blocks]
            delta = asm._accumulate(parts, jnp.float64)
            err_vec = jnp.where(mask, 0.0, (R_A + delta) - R_true)
            err = float(jnp.abs(err_vec).max())
            rtrue = float(jnp.linalg.norm(jnp.where(mask, 0.0, R_true)))
            dumax = float(jnp.abs(Uk - A).max())
            print(f"anchor it{ka} -> it{ku}: |du|max={dumax:.2e} "
                  f"|R_true|={rtrue:.3e} delta_abs_err={err:.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
