"""Split the banded rebuild's assemble phase (2.9 s at full bench, the
largest rebuild piece) into separately-timed sub-stages on the real TPU:
element jacfwd, Ruiz scaling, jacobian scaling, planned scatter-assembly.

Run: PYTHONUNBUFFERED=1 python scripts/diag_assemble_profile.py > /tmp/asm_prof.log 2>&1
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_vasp"))
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import vasp_tpu.utils.jaxconfig  # noqa: F401

import bench


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from vasp_tpu.fem import banded as banded_mod
    from vasp_tpu.fem.scaling import ruiz_scales, scale_element_jacobians
    from vasp_tpu.fem.timestepper import IterativeStepper, StepOptions

    size = os.environ.get("ASM_SIZE", "full")
    n_theta, n_z = bench.SIZES[size]
    mesh, system, bc_set, load = bench.build(n_theta, n_z, quad_degree=3)
    opts = StepOptions(atol=1e-6, rtol=1e-6, max_it=12, recompute=2,
                      gmres_tol=1e-3, gmres_restart=60, gmres_maxiter=120,
                      jac_chunk=8192, overlap=2, jac_dtype="f32",
                      krylov_dtype="f32", residual_dtype="f32f")
    stepper = IterativeStepper(system, bc_set, opts, recompute_tstep=20)
    print(f"ndof={system.space.ndof} lowmem={stepper._banded_lowmem}",
          flush=True)
    bpat = stepper._bpat
    asm = stepper.asm
    mask = stepper.mask
    ndof = system.space.ndof
    diag_flat = jnp.asarray(
        banded_mod.identity_diag_slots(bpat, stepper.mask_np))
    plans = banded_mod.build_banded_assembly_plan(
        [np.asarray(b.dofs) for b in asm.blocks], bpat, stepper.mask_np)

    U = system.zero_state()
    U0 = U

    _asm = stepper._asm_of

    @jax.jit
    def jac_phase(U, U0, blocks):
        a = _asm(blocks)
        return a.element_jacobians(U, U0, chunk=opts.jac_chunk,
                                   dtype=jnp.float32)

    @jax.jit
    def ruiz_phase(jacs, blocks):
        a = _asm(blocks)
        return ruiz_scales(a.blocks, jacs, mask, ndof,
                           sweeps=opts.ruiz_sweeps)

    @jax.jit
    def scale_phase(jacs, dr, dc, blocks):
        a = _asm(blocks)
        return scale_element_jacobians(a.blocks, jacs, dr, dc)

    @jax.jit
    def scatter_phase(jf, plans):
        return banded_mod.assemble_banded_planned(jf, plans, bpat,
                                                  diag_flat,
                                                  mode="scatter")

    @jax.jit
    def cumsum_phase(jf, plans):
        return banded_mod.assemble_banded_planned(jf, plans, bpat,
                                                  diag_flat,
                                                  mode="cumsum")

    blocks = stepper._blocks_dev
    for it in range(2):
        t = {}
        t0 = time.time()
        jacs = jax.block_until_ready(jac_phase(U, U0, blocks))
        t["jacfwd"] = time.time() - t0
        t0 = time.time()
        dr, dc = jax.block_until_ready(ruiz_phase(jacs, blocks))
        t["ruiz"] = time.time() - t0
        t0 = time.time()
        jf = jax.block_until_ready(scale_phase(jacs, dr, dc, blocks))
        t["scale"] = time.time() - t0
        del jacs
        small = system.space.ndof < 120_000
        t0 = time.time()
        CDB = jax.block_until_ready(scatter_phase(jf, plans))
        t["scatter"] = time.time() - t0
        if small:
            # value check vs the cumsum variant (full size: both CDB
            # sets = 20 GB -> OOM, so A/B values at half size only)
            t0 = time.time()
            CDB2 = jax.block_until_ready(cumsum_phase(jf, plans))
            t["cumsum"] = time.time() - t0
            if it == 1:
                for i, nm in enumerate("CDB"):
                    d = float(jnp.max(jnp.abs(CDB[i] - CDB2[i])))
                    print(f"  {nm}: max|diff|={d:.3e}", flush=True)
            del CDB2
        del jf, CDB
        print(f"iter{it}: " + "  ".join(f"{k} {v:.3f}s"
                                        for k, v in t.items()), flush=True)


if __name__ == "__main__":
    main()
