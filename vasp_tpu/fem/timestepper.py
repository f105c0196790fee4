"""FSI timesteppers for the iterative (TPU) path.

Two designs, both solving the RUIZ-EQUILIBRATED system (see fem/scaling.py:
the raw monolithic FSI Jacobian spans ~12 decades and defeats every
preconditioner through rounding; equilibrated it is benign, cond ~ 4e6):

1. ``make_step_fn`` — one fully-jittable program per timestep (Newton under
   lax.while_loop), preconditioned by Ruiz + 6x6 node-block inverses. No
   host round-trips: usable inside shard_map for the multi-chip dryrun and
   for small/medium problems.

2. ``IterativeStepper`` — the production configuration: element Jacobians +
   Ruiz scales on device, then (only at Jacobian rebuilds, i.e. every
   ``recompute_tstep`` steps, like the reference amortizes its MUMPS
   factorization) a host step slices the scaled CSR into RAS subdomain
   blocks whose batched f32 inverses live on device; the Newton loop itself
   is one jitted program per step with GMRES + RAS (73 iterations to 1e-13
   on the tube benchmark vs stagnation for all single-level alternatives).
"""
import os
from functools import partial
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vasp_tpu.fem.krylov import gmres
from vasp_tpu.fem import ras as ras_mod
from vasp_tpu.fem.scaling import (
    apply_node_block,
    build_node_block,
    ruiz_scales,
    scale_element_jacobians,
)


def _backtrack_update(U, dx, residual_norm_fn, lmbda, n_halvings=4):
    """Damped Newton update: try lmbda, lmbda/2, ... and keep the candidate
    with the smallest residual norm (monotone decrease; an overlarge exact
    Newton step on a strongly nonlinear state otherwise regresses)."""
    import jax.numpy as _jnp

    def trial(k):
        lam = lmbda * (0.5 ** k)
        Ut = U - lam * dx
        return Ut, residual_norm_fn(Ut)

    Us, rs = [], []
    for k in range(n_halvings):
        Ut, rk = trial(k)
        Us.append(Ut)
        rs.append(rk)
    rs = _jnp.stack(rs)
    # NaN residual (e.g. inverted elements under log-J energies) = rejected
    rs = _jnp.where(_jnp.isnan(rs), _jnp.inf, rs)
    best = _jnp.argmin(rs)
    Ustack = _jnp.stack(Us)
    return Ustack[best], rs[best]


def _damped_update(U, dx, residual_norm_fn, rnorm_prev, lmbda,
                   n_halvings=4):
    """Full-step-first line search: near the root exact Newton descends
    with the full step, so ONE residual eval suffices (f64 residual
    assembly is 164 ms at 4k cells on TPU — the backtracking stack was the
    step's dominant cost). Only when the full step fails to decrease the
    residual does the halving search run (lax.cond: one branch executes)."""
    import jax.numpy as _jnp

    Ufull = U - lmbda * dx
    rfull = residual_norm_fn(Ufull)

    def accept(_):
        return Ufull, rfull

    def search(_):
        return _backtrack_update(U, dx, residual_norm_fn, lmbda, n_halvings)

    good = _jnp.isfinite(rfull) & (rfull < rnorm_prev)
    return jax.lax.cond(good, accept, search, None)


@dataclass(frozen=True)
class StepOptions:
    atol: float = 1e-7
    rtol: float = 1e-7
    max_it: int = 10
    lmbda: float = 1.0
    # within-step Jacobian reuse cadence (the reference's `recompute`
    # semantics, offset_stenosis.py:47): element Jacobians are recomputed
    # every `recompute` Newton iterations INSIDE a dispatch, reused (chord
    # Newton) in between. 1 = true Newton (default — CLAUDE.md landmine:
    # chord diverges on load-JUMP steps; smooth production steps tolerate
    # small cadences). Chunked dispatch re-freshens at every chunk entry,
    # and every escalation/retry dispatch starts fresh, so a chord stall
    # self-heals through the existing ladder.
    recompute: int = 1
    gmres_tol: float = 1e-6
    gmres_restart: int = 60
    gmres_maxiter: int = 300
    jac_chunk: Optional[int] = None
    # "f32" runs the Krylov matvecs on f32 element matrices (full-speed MXU;
    # inexact Newton with f64 residuals) — the TPU production setting
    jac_dtype: Optional[str] = None
    # "f32" runs the WHOLE Krylov space (basis, dots, Givens) in f32: TPU
    # has no native f64, so an f64 Arnoldi runs on emulated arithmetic.
    # Inexact Newton only needs ~1e-4 relative linear solves (residuals and
    # convergence checks stay f64), well within f32 GMRES reach on the
    # Ruiz-equilibrated system (cond ~4e6)
    krylov_dtype: Optional[str] = None
    # "f32" computes the residual's ELEMENT work in f32 with f64
    # accumulation (see Assembler.residual): noise floor ~1e-7 per dof —
    # use only with atol >= 1e-6 (the tutorial anchor config); default
    # f64 for tight-tolerance production runs
    residual_dtype: Optional[str] = None
    ruiz_sweeps: int = 4
    # preconditioner: "banded" (block-tridiagonal direct, fem/banded.py —
    # the production choice; the block-tridiagonal pattern covers the full
    # RCM band, so with f32 factors the apply is an essentially exact
    # solve: GMRES converges in ~1 inner iteration) or "ras" (dense
    # restricted additive Schwarz, small sizes)
    precond: str = "banded"
    # banded factor storage: None = auto (f32 at non-lowmem sizes — 1 vs 8
    # GMRES iterations at tol 1e-3, measured; the HYBRID layout at lowmem
    # scale: f32 Sinv + bf16 H/G, f32-grade preconditioning in 6.8 GB of
    # factors — all-f32 OOMs the 16 GB chip and all-bf16 costs ~5 inner
    # iterations/direction, both measured at 185k dofs). At lowmem scale
    # "hybrid"/"bf16"/"f32" force the layout ("bf16"/"f32" select the
    # legacy Sinv-only folded apply); at non-lowmem sizes "bf16" forces
    # bf16 factor storage.
    banded_factor_dtype: Optional[str] = None
    # RAS
    n_subdomains: Optional[int] = None  # default: ~1500 dofs per subdomain
    overlap: int = 2
    # hybrid-residual endgame switch: exact f64 residuals once the norm is
    # within endgame_factor * atol. 30 is the conservative default; the
    # bench anchor config uses 3 so only the FINAL Newton iteration pays
    # the ~1 s emulated-f64 element evaluation (measured at 185k dofs) —
    # a coarse-phase exit that CLAIMS convergence is then re-certified
    # with one exact residual on the host (step()) before being believed.
    endgame_factor: float = 30.0
    # Taylor-delta endgame (hybrid residuals only): anchor one exact f64
    # residual per Newton dispatch and evaluate later endgame residuals as
    # R64(anchor) + order-3 f32 Taylor delta along U - anchor
    # (Assembler.residual_delta) — the emulated-f64 element work is ~25x
    # the f32 one on TPU. Delta roundoff AND truncation scale with the
    # shrinking Newton update (measured 1e-8 absolute on the first endgame
    # step, 1e-11 after). Chunked dispatch re-anchors every NEWTON_CHUNK
    # iterations, bounding anchor staleness.
    delta_endgame: bool = True
    # GMRES forcing strategy: "fixed" solves every Newton direction to
    # gmres_tol; "ew" is Eisenstat-Walker choice 2 (eta_k =
    # gamma (r_k / r_{k-1})^2, safeguarded into [gmres_tol, ew_max] with
    # the over-solve floor 0.1 atol / r_k) — loose directions while the
    # outer iteration is far from the root, tight only when it pays.
    # Classical inexact-Newton theory (Eisenstat & Walker, SISC 1996);
    # biggest effect in damped tails where fixed 1e-3 over-solves every
    # iteration.
    forcing: str = "fixed"
    ew_gamma: float = 0.9
    ew_max: float = 1e-2
    # Cross-step anchor chain (residual_dtype="f32" + delta_endgame
    # only): carry the exact-residual anchor ACROSS timesteps instead of
    # re-evaluating one raw emulated-f64 residual per step. The anchor
    # R(U1_n; U0_n) of step n+1 comes from step n's exit residual via ONE
    # two-argument jet delta (Assembler.residual_delta2), and a raw f64
    # element pass runs every chain_reanchor steps to cap drift. MEASURED
    # (scripts/diag_anchor_chain.py): the drift is f32 jet ROUNDOFF
    # (order-4 jets change nothing), ~7e-7 l2 PER LINK at 36k dofs — so
    # multi-step chaining cannot hold atol=1e-6 and chain_reanchor
    # defaults to 1 (one raw anchor per step, all in-step fine evals as
    # deltas from it). residual_dtype="mixed" supersedes this entirely
    # (f64-grade at ~0.3x the raw cost with no drift) — the chain remains
    # for problems whose f32 noise is NOT block-separable.
    chain_anchor: bool = False
    chain_reanchor: int = 1
    # Carry element Jacobians ACROSS Newton dispatches/timesteps on the
    # recompute cadence (chord Newton, the reference's own semantic:
    # turtleFSI reuses the assembled Jacobian until `recompute` iterations
    # have accumulated since its build, which spans timesteps on 1-2-
    # iteration production steps — reference:
    # src/vasp/simulations/offset_stenosis.py:47 recompute=20). Only
    # converged exits persist the carry; stalls/escalations restart from
    # fresh Jacobians. Requires recompute > 1.
    jac_carry: bool = False
    # "extrapolate" starts Newton from the linear time-extrapolation
    # 2 U_n - U_{n-1} instead of U_n (consecutive-tstep calls only).
    # On converged production steps this removes one endgame Newton
    # iteration — the step's dominant cost is the ~1 s emulated-f64
    # residual each endgame iteration pays (measured at 185k dofs).
    # Newton still converges to the same solution (the start only seeds
    # the iteration); the reference starts from U_n (turtleFSI
    # newtonsolver), so "none" keeps its exact r0/rtol semantics.
    predictor: str = "none"

    def __post_init__(self):
        # validate eagerly: an invalid value used to surface only as a
        # bare KeyError once the problem tripped the lowmem threshold
        # (advisor r4) — fail at construction, at every size
        if self.banded_factor_dtype not in (None, "hybrid", "bf16", "f32"):
            raise ValueError(
                f"banded_factor_dtype={self.banded_factor_dtype!r}: "
                "expected None (auto), 'hybrid', 'bf16', or 'f32'")


def make_step_fn(assembler, bc_mask, options: StepOptions, layout=None,
                 reduce_fn=None, reduce_max_fn=None):
    """Fully-jittable step(U0, bc_values, load) -> (U, stats).

    Preconditioner: Ruiz + node-block (in-jit, shard-compatible). layout:
    (n_p2, off_p) of the DVP dof layout; inferred from the first cell block
    if omitted. Under shard_map, pass reduce_fn = psum and reduce_max_fn =
    pmax bound to the mesh axis (and layout explicitly: padded dof tables
    break the inference)."""
    mask = jnp.asarray(bc_mask)
    red = reduce_fn if reduce_fn is not None else (lambda x: x)
    opt = options
    ndof = assembler.ndof
    if layout is not None:
        n_p2, off_p = layout
    else:
        # v-dof indices live in [3 n2, 6 n2): max local-v column = 6 n2 - 1
        n_p2 = (int(np.asarray(assembler.blocks[0].dofs)[:, 30:60].max()) + 1) // 6
        off_p = 6 * n_p2

    def step(U0, bc_values, load):
        U1 = jnp.where(mask, bc_values, U0)

        # preconditioner setup from the step-start state (amortized; the
        # true Jacobian for matvecs is recomputed every Newton iteration)
        jacs0 = assembler.element_jacobians(U1, U0, chunk=opt.jac_chunk)
        dr, dc = ruiz_scales(assembler.blocks, jacs0, mask, ndof,
                             sweeps=opt.ruiz_sweeps,
                             reduce_max=reduce_max_fn)
        jacs_s = scale_element_jacobians(assembler.blocks, jacs0, dr, dc)
        pinv = build_node_block(assembler.blocks, jacs_s, mask, n_p2, off_p,
                                ndof, reduce_fn=reduce_fn)

        def residual_raw(U):
            R = red(assembler.residual(U, U0)) + load
            return jnp.where(mask, 0.0, R)

        def precond(r):
            return apply_node_block(pinv, r, n_p2, off_p)

        def newton_update(U):
            # exact fresh Jacobian: true Newton, not chord iteration (a
            # frozen Jacobian diverges on hard load-ramp steps)
            jacs = assembler.element_jacobians(U, U0, chunk=opt.jac_chunk)

            def matvec(x):
                t = dc * jnp.where(mask, 0.0, x)
                y = red(assembler.matvec(jacs, t))
                return jnp.where(mask, x, dr * y)

            Rs = dr * residual_raw(U)
            y, _ = gmres(
                matvec, Rs, M=precond, restart=opt.gmres_restart,
                cycles=max(1, opt.gmres_maxiter // opt.gmres_restart),
                tol=opt.gmres_tol,
            )
            return dc * y

        # convergence on the RAW residual norm (reference newtonsolver
        # semantics: atol/rtol on the assembled residual)
        r0 = jnp.linalg.norm(residual_raw(U1))
        r0_safe = jnp.where(r0 > 0, r0, 1.0)

        def cond(carry):
            U, it, rnorm = carry
            return ((it < opt.max_it) & (rnorm > opt.atol)
                    & (rnorm / r0_safe > opt.rtol))

        def body(carry):
            U, it, rnorm = carry
            dx = newton_update(U)
            U, rn = _damped_update(
                U, dx, lambda Ut: jnp.linalg.norm(residual_raw(Ut)),
                rnorm, opt.lmbda,
            )
            return (U, it + 1, rn)

        U, iters, rnorm = jax.lax.while_loop(cond, body, (U1, 0, r0))
        return U, dict(iterations=iters, residual=rnorm, r0=r0)

    return step


class IterativeStepper:
    """Production iterative path: Ruiz + RAS(overlap) GMRES Newton.

    Host work happens only at Jacobian rebuilds (every recompute_tstep
    steps); each timestep otherwise runs as jitted device programs."""

    def __init__(self, system, bc_set, options: StepOptions,
                 recompute_tstep=20):
        from vasp_tpu.fem.assembly import Assembler, arrays_to_blocks, \
            blocks_to_arrays

        self.asm = system.assembler
        self._lift = getattr(system, "lift", None)
        self.space = system.space
        self.opt = options
        self.mask_np = np.asarray(bc_set.mask)
        self.mask = jnp.asarray(bc_set.mask)
        self.recompute_tstep = int(recompute_tstep)
        self.ndof = self.asm.ndof
        self._last_rebuild = -(10 ** 9)
        self._pinv = None
        self._pattern = None
        self._dr = None
        self._dc = None
        self._jacs = None
        self._jac_carry = None  # (element jacs, iteration age) or None
        # predictor history (opt.predictor == "extrapolate")
        self._pred_prev = None
        self._pred_tstep = None
        # last escalation tier (rebuild-at-current-state + exact retry)
        # is disabled on the axon remote TPU worker: its allocator
        # reliably crashes/OOMs on the mid-step rebuild churn after the
        # ladder (~10 GB cumulative; measured on the reference stenosis
        # fixture, CLAUDE.md) — there the run keeps the best state and
        # warns instead
        self._rebuild_on_exact_stall = jax.default_backend() == "cpu"

        opt = options
        n_sub = opt.n_subdomains or max(2, self.ndof // 1500)
        self._n_sub = n_sub

        # block tables travel as jit ARGUMENTS, not baked constants (huge
        # compile-time difference at 20k-cell scale; the axon remote
        # compiler also rejects HLO with >~100 MB of embedded constants)
        from vasp_tpu.fem.assembly import build_scatter_plan

        skeleton, arrays = blocks_to_arrays(self.asm.blocks)
        self._skeleton = skeleton
        plan = build_scatter_plan(self.asm.blocks, self.ndof)
        self._blocks_dev = dict(
            blocks=jax.tree.map(jnp.asarray, arrays), plan=plan)
        if self._lift is not None:
            self._blocks_dev["lift"] = self._lift
        ndof = self.ndof

        def _asm(blocks):
            return Assembler(ndof, arrays_to_blocks(skeleton,
                                                    blocks["blocks"]),
                             scatter_plan=blocks["plan"])

        self._asm_of = _asm
        mask = self.mask

        @jax.jit
        def jac_and_ruiz(U, U0, blocks):
            asm = _asm(blocks)
            jacs = asm.element_jacobians(U, U0, chunk=opt.jac_chunk)
            dr, dc = ruiz_scales(asm.blocks, jacs, mask, ndof,
                                 sweeps=opt.ruiz_sweeps)
            return jacs, dr, dc

        self._jdtype = jnp.float32 if opt.jac_dtype == "f32" else None

        self._jac_and_ruiz = jac_and_ruiz
        self._newton = None  # built after first pattern (needs apply fn)

        # ---- cross-step anchor chain (opt.chain_anchor) ----
        # hybrid+delta only: the chain replaces the per-step raw
        # emulated-f64 residual anchor (~0.85 s at 185k dofs — the step's
        # dominant cost) with one jet delta2 (~0.2 s) per step, re-running
        # the raw f64 element pass only every chain_reanchor steps.
        self._chain_on = (bool(opt.chain_anchor)
                          and opt.residual_dtype == "f32"
                          and opt.delta_endgame)
        self._anc = None
        self._chain_prev = None
        self._chain_age = 10 ** 9  # first step always raw-anchors
        if self._chain_on:
            has_lift = self._lift is not None

            def lift_term(blocks, x):
                if not has_lift:
                    return 0.0
                from vasp_tpu.fem.biharmonic import correction_apply

                return correction_apply(blocks["lift"], x)

            @jax.jit
            def raw_anchor(U1, U0, load, blocks):
                asm = _asm(blocks)
                R = asm.residual(U1, U0) + load + lift_term(blocks, U1)
                return jnp.where(mask, 0.0, R)

            @jax.jit
            def chain_advance(R_exit, U_exit, U0_prev, load_prev,
                              U1, load_new, blocks):
                # anc_R = mask0(res(U1, U0=U_exit) + load_new + lift(U1))
                # from the previous step's exit residual
                #   R_exit = mask0(res(U_exit, U0_prev) + load_prev
                #                  + lift(U_exit))
                # via the two-argument jet delta (du = U1 - U_exit on the
                # state, du0 = U_exit - U0_prev on the previous-state arg)
                asm = _asm(blocks)
                d = asm.residual_delta2(U1, U_exit, U_exit, U0_prev)
                corr = (load_new - load_prev + d
                        + lift_term(blocks, U1 - U_exit))
                return R_exit + jnp.where(mask, 0.0, corr)

            self._raw_anchor = raw_anchor
            self._chain_advance = chain_advance

        self._precond = opt.precond
        if self._precond == "banded":
            from vasp_tpu.fem import banded as banded_mod

            self._bpat = banded_mod.build_banded_pattern(
                [np.asarray(b.dofs) for b in self.asm.blocks], ndof)
            iperm_dev = jnp.asarray(self._bpat.iperm)
            bpat = self._bpat
            # low-memory variant when the full H/G factors would not leave
            # HBM headroom (measured OOM at 190k dofs / 16 GB: c=4488,
            # nb=42 -> C/D/B 9.5 GB + H/G/Sinv 4.7 GB + temps)
            est_cdb = bpat.nb * bpat.c * bpat.c * 12  # f32 C+D+B bytes
            self._banded_lowmem = (est_cdb > 7 * 2 ** 30
                                   or os.environ.get("VASP_FORCE_LOWMEM")
                                   == "1")
            # lowmem factor layout: "hybrid" (default) keeps Sinv in f32
            # and the H/G recursion factors in bf16 — the H/G-form apply.
            # "bf16"/"f32" select the legacy Sinv-only folded apply with
            # that Sinv storage (f32 Sinv-only OOMs at 185k dofs).
            self._lowmem_mode = {None: "hybrid", "hybrid": "hybrid",
                                 "bf16": "bf16", "f32": "f32"}[
                self.opt.banded_factor_dtype
                if self._banded_lowmem else None]
            if self._banded_lowmem and self._lowmem_mode != "hybrid":
                self._apply_banded = banded_mod.make_banded_apply_lowmem(
                    bpat)
            else:
                self._apply_banded = banded_mod.make_banded_apply(bpat)
            diag_flat = jnp.asarray(
                banded_mod.identity_diag_slots(bpat, self.mask_np))
            # host-precomputed static scatter targets: the index math and
            # 2/3 of the scatter volume vanish from the rebuild (measured
            # 3.33 s -> see assemble_banded_planned)
            asm_plans = banded_mod.build_banded_assembly_plan(
                [np.asarray(b.dofs) for b in self.asm.blocks], bpat,
                self.mask_np)

            @jax.jit
            def assemble_phase(U, U0, blocks, plans):
                # everything here feeds the PRECONDITIONER: f32 jacobians
                # halve peak HBM (the Newton loop recomputes its own).
                # plans ride in as ARGUMENTS — closed-over device arrays
                # embed as HLO constants and the remote compiler rejects
                # >~100 MB programs (CLAUDE.md 413 landmine)
                asm = _asm(blocks)
                jacs = asm.element_jacobians(U, U0, chunk=opt.jac_chunk,
                                             dtype=jnp.float32)
                dr, dc = ruiz_scales(asm.blocks, jacs, mask, ndof,
                                     sweeps=opt.ruiz_sweeps)
                jf = scale_element_jacobians(asm.blocks, jacs, dr, dc)
                Cm, Dm, Bm = banded_mod.assemble_banded_planned(
                    jf, plans, bpat, diag_flat)
                return (dr.astype(jnp.float64), dc.astype(jnp.float64),
                        Cm, Dm, Bm)

            # two-phase rebuild with DONATED banded storage: the
            # factorization reuses the C/D/B buffers where possible.
            # The factorization reports err = worst block-inverse error
            # of the STORED bf16 factors; past 0.2 they are useless
            # (measured: M rel 48 on the reference's unstructured vmtk
            # fixture, Schur blockcond 2.3e9 — bf16 rounding alone is
            # the failure) and the rebuild escalates PERMANENTLY to the
            # emulated-f64 recursion with f32 factor storage for this
            # mesh (apply rel 5.6e-4 measured on the same fixture).
            self._banded_f64 = False
            self._last_rel = 0.0
            # probe-solve quality threshold (banded_mod._probe_rel): below
            # it the bf16 factors are definitely healthy (structured tubes
            # measure ~1e-2 at small/full partitions); above it they MAY
            # be broken — but magnitude alone does not predict Newton
            # failure (half-bench tube: rel 1.4e5 converges; vmtk stenosis
            # fixture: rel 4.9e2 stalls), so a bad probe only arms the
            # REACTIVE escalation in step(): factor-escalate when Newton
            # actually stalls under flagged factors.
            REL_MAX = float(os.environ.get("VASP_BANDED_RELMAX", "1.0"))
            self._rel_max = REL_MAX
            # blocked Schur inversion inside the factorization scans
            # (banded_mod._inv_blocked): MXU matmuls replace the LU panel
            # factorization — measured 2.54 -> 1.61 s for the full-bench
            # scan (nb=42, c=4488) at identical factor norms
            # (scripts/diag_scan_ab.py, VERDICT r4 #4). CPU keeps LU;
            # VASP_BANDED_INVLEVELS overrides (0 restores LU).
            inv_lv = banded_mod.default_inv_levels()
            if self._banded_lowmem and self._lowmem_mode == "hybrid":
                # HYBRID lowmem: f32 Sinv (the quality-binding factor —
                # bf16 Sinv costs ~5 GMRES inner iterations/direction
                # where f32 takes 1-2, measured 0.245 vs ~0.1 s at 185k
                # dofs) + bf16 H/G (iteration-count neutral, like the
                # bf16 C/B fold was). All-f32 factors OOM the 16 GB chip
                # (measured); three sequenced phases with donated f32
                # C/D/B cap the rebuild peak at ~12 GB.
                #
                # Factor escalation at lowmem scale is MEMORY-GATED, not
                # categorically off (r5): the old blanket skip was sized
                # for the c=4488 full bench, where f64-recursion temps on
                # the ~13.7 GB peak are a measured OOM — but lowmem also
                # triggers on LONG SMALL-BANDWIDTH problems (600k dofs at
                # c=1120: CDB+Sinv ~10.8 GB), where the f64 tier fits and
                # is genuinely needed (measured: anisotropic elements
                # break the f32 recursion there and Newton dead-ends at
                # 6e-4 with no tier to take). No probe here (keeping
                # C/D/B alive past the scan for one is a measured OOM
                # even at c=1120) — the RESIDUAL-stall ladder tries this
                # tier before giving up instead.
                est_peak = 4 * bpat.nb * bpat.c * bpat.c * 4
                esc_ok = est_peak < 11 * 2 ** 30
                self._lowmem_esc_ok = esc_ok
                sinv_phase = jax.jit(
                    partial(banded_mod.factorize_banded_sinv32,
                            inv_levels=inv_lv),
                    donate_argnums=(1,))
                if esc_ok:
                    sinv_f64_phase = jax.jit(
                        banded_mod.factorize_banded_f64_lowmem,
                        donate_argnums=(1,))
                # NOTE: these products keep the global highest-precision
                # (3-pass) matmul config even though H/G are stored bf16:
                # the one-pass bf16 variant was MEASURED SLOWER end-to-end
                # (0.86 -> 0.99 s/step full bench, reproduced twice) — the
                # extra INPUT rounding inside the product compounds with
                # the storage rounding and costs GMRES inner iterations
                # worth more than the saved MXU passes.
                mulcast = jax.jit(
                    lambda S, X: jnp.einsum(
                        "kab,kbc->kac", S, X,
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16),
                    donate_argnums=(1,))

                timing = os.environ.get("VASP_REBUILD_TIMING") == "1"

                def rebuild_banded(U, U0, blocks):
                    import time as _t
                    t0 = _t.time()
                    dr, dc, Cm, Dm, Bm = assemble_phase(U, U0, blocks,
                                                        asm_plans)
                    # phase barriers: XLA allocates a program's OUTPUTS at
                    # ENQUEUE time. Enqueueing the Schur scan while the
                    # assembly program is still executing adds the 3.4 GB
                    # f32 Sinv output on top of the assembly's ~11.7 GB
                    # in-flight peak — a measured OOM on the SECOND
                    # rebuild (the bf16 Sinv of the legacy path was 1.7 GB
                    # and squeaked under). Same for the H einsum behind
                    # the scan.
                    jax.block_until_ready(Dm)
                    t1 = _t.time()
                    if esc_ok and self._banded_f64:
                        Sinv = sinv_f64_phase(Cm, Dm, Bm)
                    else:
                        Sinv = sinv_phase(Cm, Dm, Bm)
                    jax.block_until_ready(Sinv)
                    t2 = _t.time()
                    H = mulcast(Sinv, Cm)  # frees C (donated)
                    jax.block_until_ready(H)
                    G = jax.block_until_ready(mulcast(Sinv, Bm))
                    if timing:
                        print(f"rebuild phases: assemble {t1-t0:.2f}s "
                              f"scan {t2-t1:.2f}s hg {_t.time()-t2:.2f}s",
                              flush=True)
                    return dr, dc, Sinv, H, G
            elif self._banded_lowmem:
                # keep C/B for the apply; only D is donated (dead after
                # the Schur scan). No escalation at lowmem scale: the
                # emulated-f64 factorization's block temps on top of the
                # ~13.7 GB f32 peak is a measured OOM (full bench,
                # c=4488), and the structured meshes that reach this size
                # have benign Schur conditioning (bf16 factors measured
                # converging to 1e-10 at 185k dofs).
                fdt = jnp.float32 if self._lowmem_mode == "f32" \
                    else jnp.bfloat16
                factorize_phase = jax.jit(
                    partial(banded_mod.factorize_banded_lowmem,
                            factor_dtype=fdt, inv_levels=inv_lv),
                    donate_argnums=(1,))
                cast16 = jax.jit(lambda a: a.astype(jnp.bfloat16),
                                 donate_argnums=(0,))

                def rebuild_banded(U, U0, blocks):
                    dr, dc, Cm, Dm, Bm = assemble_phase(U, U0, blocks,
                                                        asm_plans)
                    Sinv = factorize_phase(Cm, Dm, Bm)
                    # bf16 C/B for the APPLY only (factorization above ran
                    # on the f32 blocks): the lowmem apply is HBM-bound —
                    # ~10 GB read per application at full bench size, of
                    # which the two f32 C/B reads are 6.8 GB. bf16 halves
                    # them (preconditioner operator error ~4e-3, iteration-
                    # count neutral on the structured meshes that reach
                    # lowmem scale) and frees 3.4 GB of HBM.
                    # SYNC before enqueueing the casts: output buffers are
                    # allocated at ENQUEUE time, and +3.4 GB on top of the
                    # factorization's ~13.7 GB in-flight peak is a
                    # measured OOM (bf16cb bench attempt, RESOURCE_
                    # EXHAUSTED at the rebuild barrier).
                    jax.block_until_ready(Sinv)
                    Cm = cast16(Cm)
                    Bm = jax.block_until_ready(cast16(Bm))
                    return dr, dc, Sinv, Cm, Bm
            else:
                fdt = jnp.bfloat16 if self.opt.banded_factor_dtype == "bf16" \
                    else jnp.float32
                factorize_phase = jax.jit(
                    partial(banded_mod.factorize_banded, factor_dtype=fdt,
                            inv_levels=inv_lv),
                    donate_argnums=(0, 1, 2))
                factorize_f64 = jax.jit(banded_mod.factorize_banded_f64,
                                        donate_argnums=(0, 1, 2))

                def rebuild_banded(U, U0, blocks):
                    dr, dc, Cm, Dm, Bm = assemble_phase(U, U0, blocks,
                                                        asm_plans)
                    if not self._banded_f64:
                        Sinv, H, G, rel = factorize_phase(Cm, Dm, Bm)
                        # OPTIMISTIC bf16: a bad probe value alone does not
                        # escalate — the probe magnitude does not predict
                        # Newton failure (measured: rel 1.4e5 on the
                        # half-bench structured tube CONVERGES in 4 iters
                        # and escalating there cost 1.7 s/step, while
                        # rel 4.9e2 on the vmtk stenosis fixture hard-
                        # stalls Newton). The probe is recorded and step()
                        # escalates REACTIVELY when Newton actually stalls
                        # under flagged factors.
                        self._last_rel = float(rel)
                        return dr, dc, Sinv, H, G
                    Sinv, H, G = factorize_f64(Cm, Dm, Bm)
                    return dr, dc, Sinv, H, G

            self._rebuild_banded = rebuild_banded
            self._build_newton()

    # -------------- setup --------------
    def _rebuild(self, U, U0, tstep):
        import scipy.sparse as sp

        if self._precond == "banded":
            # free the PREVIOUS factors first: at full bench size they are
            # ~8 GB and holding them through the new assembly (another
            # ~10 GB of C/D/B) OOMs the 16 GB chip on the second rebuild
            self._pinv = None
            # a held cross-step Jacobian carry (~90 MB at bench size, but
            # resident on TOP of the ~12-13.7 GB rebuild peak) is exactly
            # the enqueue-time-allocation OOM class documented above —
            # drop it before the rebuild; the next dispatch re-jacfwds
            self._jac_carry = None
            dr, dc, *factors = self._rebuild_banded(U, U0,
                                                    self._blocks_dev)
            self._dr, self._dc = dr, dc
            self._pinv = tuple(factors)
            # sync before enqueueing consumers: a newton program queued
            # behind the donating factorization reproducibly crashed the
            # remote TPU worker (the synchronous phase-by-phase bisection
            # of the same sequence runs clean); the barrier costs nothing
            # here — the rebuild is already the step's sync point
            jax.block_until_ready(self._pinv)
            self._last_rebuild = tstep
            return

        jacs, dr, dc = self._jac_and_ruiz(U, U0, self._blocks_dev)
        self._jacs, self._dr, self._dc = jacs, dr, dc
        # host: scaled CSR + RAS blocks
        A = self.asm.to_csr(jacs, bc_mask=self.mask_np).tocsr()
        drn, dcn = np.asarray(dr), np.asarray(dc)
        A_s = sp.diags(drn) @ A @ sp.diags(dcn)
        if self._pattern is None:
            self._pattern = ras_mod.build_pattern_auto(
                (abs(A_s) + abs(A_s.T)).tocsr(), self.ndof, self._n_sub,
                overlap=self.opt.overlap, coords=self._dof_coords(),
            )
            self._apply_ras = ras_mod.make_apply(self._pattern, self.ndof)
            self._build_newton()
        blocks = ras_mod.extract_local_blocks(A_s.tocsr(), self._pattern,
                                              self.mask_np)
        self._pinv = ras_mod.invert_blocks(blocks, dtype=self._jdtype)
        self._last_rebuild = tstep

    def _dof_coords(self):
        """(ndof, 3) coordinates of every mixed dof — d/v components sit at
        their P2 node, p at its vertex. Used for compact spatial RAS
        subdomains (keeps all fields at a location in one subdomain, which
        the saddle-point local solves need)."""
        sp_ = self.space
        xy2 = np.asarray(sp_.p2_coords)
        dv = np.repeat(xy2, 3, axis=0)  # dof = 3*node + comp layout
        return np.concatenate([dv, dv, xy2[: sp_.n_p1]], axis=0)

    def _build_newton(self):
        opt = self.opt
        mask = self.mask
        asm_of = self._asm_of
        jdtype = self._jdtype
        if self._precond == "banded":
            apply_banded = self._apply_banded

            def precond_fn(pinv, r):
                return apply_banded(*pinv, r)
        else:
            apply_ras = self._apply_ras

            def precond_fn(pinv, r):
                return apply_ras(pinv, r)

        has_lift = self._lift is not None

        from functools import partial

        @partial(jax.jit, static_argnums=(10, 13, 16))
        def newton(U0, Ustart, bcv, load, dr, dc, pinv, blocks,
                   fine_start, it_cap, exact, anc_U, anc_R, chained,
                   jacs_in, jage, carried):
            # U0: previous-timestep state (enters the theta-scheme residual);
            # Ustart: Newton starting point (== U0 normally; mid-Newton best
            # state when retrying after a stall-triggered rebuild or
            # resuming the next host-side chunk).
            # fine_start: force exact f64 residuals from iteration 0 (host
            # retry after a coarse-phase stall at the f32 noise floor).
            # it_cap: TRACED per-dispatch iteration bound — the host chunks
            # long Newton solves into several short XLA executions (one
            # 50-iteration f64-heavy program reproducibly crashed the
            # remote TPU worker, apparently an execution watchdog; chunked
            # resumption also makes grinding damped steps interruptible)
            asm = asm_of(blocks)
            U1 = jnp.where(mask, bcv, Ustart)
            if has_lift:
                from vasp_tpu.fem.biharmonic import correction_apply

                def lift_term(x):
                    return correction_apply(blocks["lift"], x)
            else:
                def lift_term(x):
                    return 0.0

            # hybrid residual precision (residual_dtype="f32"): the f32
            # element-work residual (full MXU rate; f64 is ~8x emulated) is
            # used in the APPROACH phase, and the exact f64 one once the
            # norm is within ENDGAME_FACTOR of atol — the f32 noise floor
            # (~8e-7 at 185k dofs) otherwise makes the last Newton
            # iterations chase noise (measured: 2 extra iterations with the
            # converged residual sitting exactly on the floor)
            hybrid = opt.residual_dtype in ("f32", "mixed", "f32f")
            # "mixed" fine residuals: f64 element work only on the stiff
            # solid/facet blocks, f32 on the fluid — measured f64-grade
            # (error l2 5e-10 vs atol 1e-6, diag_mixed_residual.py) at
            # ~25-30% of the emulated-f64 cost. Supersedes the
            # Taylor-delta/anchor machinery wherever available.
            # "f32f" goes one further: the cancellation-free strain
            # formulation (fem/kinematics.py E_/_invariant_deltas) drops
            # the all-f32 residual error to l2 5.7e-9 at full bench scale
            # (diag_mixed_residual.py on 185k dofs) — fine evals run the
            # plain f32 element pass (~0.07 s vs 0.86 s emulated f64).
            # The f64 safety net stays: the host ladder still certifies /
            # escalates with exact residuals when the coarse phase claims
            # convergence or stalls (IterativeStepper._step_ladder).
            fine_dt = ({"mixed": "mixed", "f32f": jnp.float32}
                       .get(opt.residual_dtype))
            mixed = fine_dt is not None and not exact
            ENDGAME = opt.endgame_factor * opt.atol
            # Taylor-delta endgame (opt.delta_endgame): the f64 element
            # work is ~25x the f32 one on TPU (777 vs 31 ms at 185k dofs),
            # so instead of paying it every endgame iteration, the loop
            # anchors ONE exact f64 residual at the first fine evaluation
            # of each dispatch and computes later fine residuals as
            # R64(anchor) + order-3 Taylor delta along U - anchor
            # (Assembler.residual_delta; f32 element work whose roundoff
            # AND truncation scale with the shrinking Newton update —
            # measured 1e-8 absolute on the first endgame step of a real
            # trajectory, 1e-11 after). The exact escalation tier keeps
            # raw f64 residuals.
            use_delta = (hybrid and opt.delta_endgame and not exact
                         and not mixed)

            def residual_raw(U):
                R = asm.residual(U, U0) + load + lift_term(U)
                return jnp.where(mask, 0.0, R)

            def residual_f32(U):
                R = asm.residual(U, U0, dtype=jnp.float32) + load \
                    + lift_term(U)
                return jnp.where(mask, 0.0, R)

            def residual_mixed(U):
                R = asm.residual(U, U0, dtype=fine_dt) + load \
                    + lift_term(U)
                return jnp.where(mask, 0.0, R)

            def residual_fine(U, anc):
                if mixed:
                    return residual_mixed(U)
                if chained:
                    # cross-step anchor chain: (anc_U, anc_R) is a FIXED
                    # exact anchor of THIS step's residual (anc_R includes
                    # load + lift(anc_U)), maintained by the host across
                    # timesteps — no raw f64 element pass in the loop
                    d = asm.residual_delta(U, anc_U, U0)
                    if has_lift:
                        d = d + lift_term(U - anc_U)
                    return jnp.where(mask, 0.0, anc_R + d)
                if not use_delta:
                    return residual_raw(U)
                anchored, Aanc, RA = anc

                def dlt(_):
                    d = asm.residual_delta(U, Aanc, U0)
                    if has_lift:
                        d = d + lift_term(U - Aanc)
                    return jnp.where(mask, 0.0, RA + d)

                return jax.lax.cond(anchored, dlt,
                                    lambda _: residual_raw(U), None)

            def residual_sel(U, fine, anc):
                if not hybrid:
                    return residual_raw(U)
                return jax.lax.cond(fine, lambda _: residual_fine(U, anc),
                                    lambda _: residual_f32(U), None)

            def precond(r):
                return precond_fn(pinv, r)

            # exact (STATIC jit arg): the host's LAST escalation tier —
            # f64 element Jacobians AND f64 Krylov arithmetic, i.e. the
            # same direction quality as the LU path. The f32-direction
            # Newton pins at ~1e-4 on the reference's unstructured
            # stenosis fixture (measured identically on CPU and TPU;
            # stall ratio ~0.985/iter; f64 Krylov ALONE does not fix it —
            # measured 8.36e-5 -> 8.12e-5 — while LU with f64 Jacobians
            # converges the same steps to 1e-8). Dispatched only when the
            # f32 tiers stall; compile + memory cost paid on demand.
            kf32x = (opt.krylov_dtype == "f32") and not exact
            jdtx = None if exact else jdtype

            use_ew = opt.forcing == "ew" and not exact

            rec = max(1, int(opt.recompute))
            # carried (STATIC): element Jacobians carried in from a
            # PREVIOUS dispatch/timestep (the reference's recompute
            # semantic — turtleFSI's newtonsolver reuses the assembled
            # Jacobian across iterations AND timesteps until `recompute`
            # iterations have accumulated, reference:
            # src/vasp/simulations/offset_stenosis.py:47). jage is the
            # iteration age of jacs_in since its jacfwd; the in-loop
            # refresh keeps the cumulative cadence.

            def fresh_jacs(U):
                return asm.element_jacobians(U, U0, chunk=opt.jac_chunk,
                                             dtype=jdtx)

            def newton_update(U, R, eta, jacs):
                # jacs: element Jacobians for this direction — fresh each
                # iteration (true Newton, rec == 1) or reused on the
                # opt.recompute cadence (chord); only the preconditioner
                # is reused across steps either way.
                # R: the CURRENT residual vector (carried through the loop —
                # the f64 residual is ~1 s at full bench size, the step's
                # dominant cost, so it is evaluated ONCE per iteration)
                wdt = jnp.float32 if kf32x else jnp.float64
                drw, dcw = dr.astype(wdt), dc.astype(wdt)

                def matvec(x):
                    t = dcw * jnp.where(mask, 0.0, x)
                    y = asm.matvec(jacs, t).astype(wdt)
                    if has_lift:
                        y = y + lift_term(t).astype(wdt)
                    return jnp.where(mask, x, drw * y)

                Rs = (dr * R).astype(wdt)
                # the exact tier gets LU-grade solve effort: the stalls it
                # is dispatched for can be GMRES stagnation (restarted
                # f32-era tol/budget under a preconditioner+Ruiz frozen at
                # the last rebuild), not direction dtype — so tighten tol
                # and give it 5x the restart cycles
                gtol = min(opt.gmres_tol, 1e-5) if exact else opt.gmres_tol
                if use_ew:
                    # Eisenstat-Walker: eta is the traced per-iteration
                    # forcing term (gmres's running-residual early exit
                    # honors a traced tol)
                    gtol = eta.astype(jnp.float32 if kf32x else jnp.float64)
                gcyc = max(1, opt.gmres_maxiter // opt.gmres_restart)
                if exact:
                    gcyc *= 5
                y, _ = gmres(
                    matvec, Rs, M=precond, restart=opt.gmres_restart,
                    cycles=gcyc, tol=gtol,
                )
                return dc * y.astype(jnp.float64)

            # chained mode: every fine evaluation (including R0 and the
            # ENDGAME refine) is a jet delta from the host-maintained
            # exact anchor — the loop never runs the ~25x emulated-f64
            # element pass
            if mixed:
                fine0_fn = residual_mixed
            elif chained:
                def fine0_fn(u):
                    return residual_fine(u, None)
            else:
                fine0_fn = residual_raw
            if hybrid:
                fs = jnp.asarray(fine_start)
                R0 = jax.lax.cond(fs, fine0_fn, residual_f32, U1)
                r0 = jnp.linalg.norm(R0)

                def _refine(_):
                    Rf = fine0_fn(U1)
                    return Rf, jnp.linalg.norm(Rf)

                R0, r0 = jax.lax.cond(~fs & (r0 < ENDGAME), _refine,
                                      lambda _: (R0, r0), None)
                fine_init = fs | (r0 < ENDGAME)
            else:
                R0 = fine0_fn(U1)
                r0 = jnp.linalg.norm(R0)
                fine_init = jnp.bool_(True)
            r0_safe = jnp.where(r0 > 0, r0, 1.0)
            # delta-endgame anchor: whenever fine_init holds, R0 above came
            # from residual_raw, so (U1, R0) is a valid exact anchor
            anchored0 = fine_init if use_delta else jnp.bool_(False)

            def cond(carry):
                it, rnorm, stall = carry[1], carry[3], carry[4]
                return ((it < it_cap) & (rnorm > opt.atol)
                        & (rnorm / r0_safe > opt.rtol) & (stall < 2))

            def body(carry):
                if rec > 1:
                    (U, it, R, rnorm, stall, fine0, Ub, rb, Rb, rbf,
                     anchored, Aanc, RA, eta, jacs) = carry
                    jacs = jax.lax.cond(
                        (it > 0) & ((it + jage) % rec == 0),
                        fresh_jacs, lambda _: jacs, U)
                else:
                    (U, it, R, rnorm, stall, fine0, Ub, rb, Rb, rbf,
                     anchored, Aanc, RA, eta) = carry
                    jacs = fresh_jacs(U)
                anc = (anchored, Aanc, RA)
                dx = newton_update(U, R, eta, jacs)
                fine = fine0 | (rnorm < ENDGAME)
                # full-step-first: near the root exact Newton descends with
                # the full step — ONE residual eval; the halving search
                # (with one re-eval of the winning vector) only runs when
                # the full step fails to decrease the residual
                Ufull = U - opt.lmbda * dx
                Rfull = residual_sel(Ufull, fine, anc)
                rfull = jnp.linalg.norm(Rfull)

                def accept(_):
                    return Ufull, Rfull, rfull

                def search(_):
                    Us, rs = _backtrack_update(
                        U, dx,
                        lambda Ut: jnp.linalg.norm(
                            residual_sel(Ut, fine, anc)),
                        opt.lmbda,
                    )
                    return Us, residual_sel(Us, fine, anc), rs

                good = jnp.isfinite(rfull) & (rfull < rnorm)
                U, R, rn = jax.lax.cond(good, accept, search, None)
                # first fine evaluation of this dispatch used residual_raw
                # (anchored was False): the accepted (U, R) is an exact f64
                # pair — anchor there; later fine evals are Taylor deltas.
                # (chained mode anchors at the host-maintained cross-step
                # anchor instead — no in-loop anchoring)
                if use_delta and not chained:
                    new_anchor = fine & ~anchored
                    Aanc = jnp.where(new_anchor, U, Aanc)
                    RA = jnp.where(new_anchor, R, RA)
                    anchored = anchored | fine
                # residual not decreasing (line-searched): count a stall —
                # two in a row exits early so the host can either switch to
                # exact f64 residuals (a COARSE-phase stall usually means
                # the f32 noise floor, which is scale-dependent and can sit
                # ABOVE ENDGAME — measured 8e-5 on the stenosis fixture,
                # ENDGAME 3e-5) or rebuild the preconditioner, instead of
                # burning max_it iterations. The escalation decision lives
                # on the HOST (step()): an extra lax.cond nested in this
                # body reproducibly crashed the TPU worker (kernel fault).
                # the exact tier only counts near-zero progress as a
                # stall (0.98): slow damped tails (~0.9/iter, e.g. the
                # predeform pressure phase) are REAL convergence that
                # compounds to atol within max_it — the production tiers
                # keep the tighter 0.9 exit because their floors are
                # precision artifacts that never compound
                sthr = 0.98 if exact else 0.9
                stall = jnp.where(rn > sthr * rnorm, stall + 1, 0)
                # track the best state seen: a stalled tail can otherwise
                # END on a worse iterate than it started from. Rb/rbf:
                # the residual VECTOR of the best state and whether it is
                # fine-grade — the anchor chain continues from it
                better = rn < rb
                Ub = jnp.where(better, U, Ub)
                rb = jnp.where(better, rn, rb)
                Rb = jnp.where(better, R, Rb)
                rbf = jnp.where(better, fine, rbf)
                # Eisenstat-Walker choice 2 for the NEXT direction:
                # eta = gamma (r_k / r_{k-1})^2, floored by the over-solve
                # guard 0.1 atol / r_k, clipped into [gmres_tol, ew_max]
                eta_next = jnp.clip(
                    jnp.maximum(
                        opt.ew_gamma * (rn / jnp.maximum(rnorm, 1e-300))
                        ** 2,
                        0.1 * opt.atol / jnp.maximum(rn, 1e-300)),
                    opt.gmres_tol, opt.ew_max)
                out = (U, it + 1, R, rn, stall, fine, Ub, rb, Rb, rbf,
                       anchored, Aanc, RA, eta_next)
                return out + ((jacs,) if rec > 1 else ())

            init = (U1, 0, R0, r0, 0, fine_init, U1, r0, R0, fine_init,
                    anchored0, U1, R0, jnp.float64(opt.gmres_tol))
            if rec > 1:
                # iteration 0 consumes the carried-in Jacobians (cross-
                # dispatch chord Newton) or a fresh jacfwd
                init = init + ((jacs_in if carried else fresh_jacs(U1)),)
            final = jax.lax.while_loop(cond, body, init)
            (iters, stall, fine_end, U, rnorm, Rbest, rbfine) = (
                final[1], final[4], final[5], final[6], final[7],
                final[8], final[9])
            # stats as ONE stacked f64 vector: the host fetches a single
            # buffer per dispatch. Five small per-field fetches between
            # back-to-back Newton dispatches reproducibly crashed the
            # remote TPU worker (transfer/execute RPC race: the identical
            # sequence with 1-2 fetches runs clean); one fetch per chunk
            # is also simply fewer tunnel round-trips
            statv = jnp.stack([
                iters.astype(jnp.float64), rnorm.astype(jnp.float64),
                r0.astype(jnp.float64),
                (stall >= 2).astype(jnp.float64),
                fine_end.astype(jnp.float64),
                rbfine.astype(jnp.float64),
            ])
            # jacs ride out for the cross-step carry (device-resident —
            # no host traffic; rec == 1 recomputes every iteration and
            # has nothing to carry)
            return U, Rbest, statv, (final[14] if rec > 1 else ())

        self._newton = newton

    # -------------- public --------------
    # per-dispatch Newton iteration bound: one long XLA program (50
    # f64-heavy iterations) reproducibly crashed the remote TPU worker
    # (execution watchdog); 8-iteration chunks with host resumption keep
    # every dispatch short at one extra residual eval per chunk
    NEWTON_CHUNK = 8

    def _newton_chunked(self, U0, Ustart, bcv, load, fine_start, it_budget,
                        exact=False):
        """Drive self._newton in chunks of NEWTON_CHUNK iterations until
        convergence, stall, or it_budget. Returns (U, R, stats) with
        iterations summed over chunks and r0 from the FIRST chunk (the
        step's true starting residual); R is the returned state's residual
        vector (on device — feeds the cross-step anchor chain). exact=True
        selects the f64-Jacobian/f64-Krylov escalation variant (static jit
        arg — separate cached program, compiled on first use)."""
        chained = self._chain_on and not exact
        anc_U, anc_R = (self._anc if chained
                        else (U0, U0))  # unused placeholders when off
        # cross-dispatch Jacobian carry (opt.jac_carry): chord Newton on
        # the reference's recompute cadence ACROSS timesteps — turtleFSI
        # reuses the assembled Jacobian until `recompute` iterations have
        # accumulated since its build (reference:
        # src/vasp/simulations/offset_stenosis.py:47 recompute=20), which
        # spans steps on 1-2-iteration production steps. Saves the 0.116 s
        # jacfwd on carried steps at full bench size; any ladder
        # escalation or stall clears the carry (fresh Jacobians).
        rec = max(1, int(self.opt.recompute))
        use_carry = self.opt.jac_carry and rec > 1 and not exact
        jacs_c, age_c = (self._jac_carry if use_carry
                         and self._jac_carry is not None else (None, 0))
        U, fine, total, r0_first = Ustart, fine_start, 0, None
        while True:
            cap = min(self.NEWTON_CHUNK, it_budget - total)
            carried = jacs_c is not None
            U, R, statv, jacs_out = self._newton(
                U0, U, bcv, load, self._dr, self._dc,
                self._pinv, self._blocks_dev,
                fine, cap, exact, anc_U, anc_R,
                chained, jacs_c if carried else 0,
                jnp.int32(age_c), carried)
            sv = np.asarray(statv)  # single device->host fetch per chunk
            it = int(sv[0])
            total += it
            if use_carry and rec > 1:
                # UNWRAPPED age bookkeeping: in-loop refreshes fire at
                # body-iterations it_r in [1, it-1] with
                # (it_r + age_c) % rec == 0, i.e. it_r = k*rec - age_c.
                # If one fired, the carry's age is counted from the LAST
                # such point; otherwise it accumulates age_c + it — and a
                # stream of 1-iteration converged steps (it == 1, no
                # in-loop refresh possible at it == 0) must NOT wrap the
                # age mod rec, or the Jacobian grows unboundedly stale
                # (advisor r4, medium). An overdue carry is dropped
                # host-side so the next dispatch starts from fresh_jacs.
                k_max = (it - 1 + age_c) // rec
                it_last = k_max * rec - age_c
                if 1 <= it_last <= it - 1:
                    age_c = it - it_last
                else:
                    age_c = age_c + it
                if age_c >= rec:
                    jacs_c, age_c = None, 0
                else:
                    jacs_c = jacs_out
            if r0_first is None:
                r0_first = float(sv[2])
            fine = bool(sv[4])
            res = float(sv[1])
            converged = (res <= self.opt.atol
                         or res <= self.opt.rtol * max(r0_first, 1e-300))
            if (converged or bool(sv[3]) or it < cap
                    or total >= it_budget):
                break
        if use_carry:
            # persist across steps only on a CONVERGED exit: stalls and
            # escalations restart from fresh Jacobians
            self._jac_carry = (
                (jacs_c, age_c) if converged and jacs_c is not None
                else None)
        return U, R, dict(iterations=total, residual=res, r0=r0_first,
                          stalled=bool(sv[3]), fine=fine,
                          rfine=bool(sv[5]) or exact)

    def _setup_anchor(self, U0, bc_values, load, tstep):
        """Establish this step's exact-residual anchor (U1, anc_R): chained
        from the previous step's exit residual when the chain is unbroken
        (consecutive tstep, same state object, fine-grade exit, within the
        chain_reanchor drift budget), else one raw emulated-f64 element
        pass."""
        U1 = jnp.where(self.mask, bc_values, U0)
        prev = self._chain_prev
        if (prev is not None and prev["tstep"] == tstep - 1
                and prev["grade"] and prev["U"] is U0
                and self._chain_age < self.opt.chain_reanchor):
            anc_R = self._chain_advance(prev["R"], prev["U"], prev["U0"],
                                        prev["load"], U1, load,
                                        self._blocks_dev)
            self._chain_age += 1
        else:
            anc_R = self._raw_anchor(U1, U0, load, self._blocks_dev)
            self._chain_age = 0
        self._anc = (U1, anc_R)

    def step(self, U0, bc_values, load, tstep):
        if self._chain_on:
            self._setup_anchor(U0, bc_values, load, tstep)
        U, R, stats = self._step_ladder(U0, bc_values, load, tstep)
        if self._chain_on:
            # stash the exit pair for the next step's chain link
            self._chain_prev = dict(tstep=tstep, U=U, R=R, U0=U0, load=load,
                                    grade=bool(stats.get("rfine", False)))
        return U, stats

    def _step_ladder(self, U0, bc_values, load, tstep):
        fresh = False
        if (self._pinv is None
                or tstep - self._last_rebuild >= self.recompute_tstep):
            U1 = jnp.where(self.mask, bc_values, U0)
            self._rebuild(U1, U0, tstep)
            fresh = True
        # predictor: seed Newton with the linear time-extrapolation of the
        # last two states (consecutive tsteps only — a restart/jump gets
        # the plain U0 start). Only the starting point changes; the
        # theta-scheme residual stays anchored at U0.
        Ustart = U0
        if (self.opt.predictor == "extrapolate"
                and self._pred_prev is not None
                and tstep == self._pred_tstep + 1):
            Ustart = U0 + (U0 - self._pred_prev)
        self._pred_prev, self._pred_tstep = U0, tstep
        U, R, stats = self._newton_chunked(U0, Ustart, bc_values, load,
                                           False, self.opt.max_it)
        res = float(stats["residual"])
        r0 = float(stats["r0"])
        converged = (res <= self.opt.atol
                     or res <= self.opt.rtol * max(r0, 1e-300))
        if (converged and self.opt.residual_dtype in ("f32", "mixed")
                and not bool(stats["fine"])):
            # the COARSE (f32) phase claims convergence: its norm carries
            # the scale-dependent noise floor (~8e-7 at 185k dofs, 8.7e-5
            # on the stenosis fixture), so certify with exact residuals
            # before believing it — re-entering the same program with
            # fine_start=True evaluates one f64 R0 and exits immediately
            # when the claim holds, or continues Newton in f64 when it
            # does not (relevant for endgame_factor < ~8, where a
            # quadratic final iteration can cross atol while still coarse)
            it0 = int(stats["iterations"])
            U, R, stats = self._newton_chunked(U0, U, bc_values, load,
                                               True, self.opt.max_it)
            stats["iterations"] += it0
            res = float(stats["residual"])
            r0 = max(r0, float(stats["r0"]))
            converged = (res <= self.opt.atol
                         or res <= self.opt.rtol * max(r0, 1e-300))
        if (not converged and self._precond == "banded"
                and not getattr(self, "_banded_lowmem", False)
                and not self._banded_f64
                and self._last_rel > self._rel_max):
            # REACTIVE factor escalation: Newton stalled AND the probe had
            # flagged the bf16 factors. Only the conjunction escalates —
            # eager escalation on the probe alone was a measured 1.7 s/step
            # false positive on the half bench (rel 1.4e5 yet convergent),
            # while the vmtk stenosis fixture (rel 4.9e2) genuinely stalls
            # until the factorization is redone in emulated f64.
            print("Newton: stall under probe-flagged bf16 banded factors "
                  f"(solve quality {self._last_rel:.1e}) - escalating to "
                  "f64 factorization", flush=True)
            self._banded_f64 = True
            self._rebuild(U, U0, tstep)
            fresh = True
            it0 = int(stats["iterations"])
            U, R, stats = self._newton_chunked(
                U0, U, bc_values, load,
                bool(stats.get("fine", False)), self.opt.max_it)
            stats["iterations"] += it0
            res = float(stats["residual"])
            r0 = max(r0, float(stats["r0"]))
            converged = (res <= self.opt.atol
                         or res <= self.opt.rtol * max(r0, 1e-300))
        if (not converged
                and ((self.opt.residual_dtype in ("f32", "mixed")
                      and not bool(stats["fine"]))
                     or self.opt.residual_dtype == "f32f")):
            # coarse-phase stall: the f32 residual noise floor is scale-
            # dependent and can sit ABOVE the ENDGAME switch (measured
            # 8e-5 vs 3e-5 on the stenosis fixture) — the coarse loop then
            # grinds noise to the stall exit. Retry from the current state
            # with exact f64 residuals from iteration 0.
            # (f32f: the fine tier is itself f32-grade, so any unconverged
            # exit takes this path; the retry below re-confirms the stall
            # cheaply and the ladder then escalates to the exact=True
            # variant, whose residuals are raw f64 regardless of mode.)
            print("Newton: coarse-phase stall at the f32 residual floor "
                  f"({res:.3e}) - retrying with exact residuals", flush=True)
            it0 = int(stats["iterations"])
            res_pre = res
            U, R, stats = self._newton_chunked(U0, U, bc_values, load,
                                               True, self.opt.max_it)
            stats["iterations"] += it0
            res = float(stats["residual"])
            r0 = max(r0, float(stats["r0"]))
            converged = (res <= self.opt.atol
                         or res <= self.opt.rtol * max(r0, 1e-300))
            if not converged and res > 0.9 * res_pre:
                # exact residuals did not move the stall either: the f32
                # KRYLOV direction is the floor (measured identically on
                # CPU and TPU on the stenosis fixture; a same-state
                # preconditioner rebuild does NOT help — CPU: 8.7e-5 ->
                # 5.7e-5 after a full rebuild+retry ladder; f64-Krylov
                # with f32 Jacobians also stalls: 8.36e-5 -> 8.12e-5 — and
                # on large-bandwidth escalated patterns the rebuild churn
                # OOM-crashes the TPU worker). Escalate the DIRECTION to
                # LU-grade: f64 element Jacobians + f64 GMRES (LU
                # converges these steps to 1e-8, so the system is
                # solvable — only the direction quality was the floor).
                if getattr(self, "_banded_lowmem", False):
                    if (getattr(self, "_lowmem_esc_ok", False)
                            and not self._banded_f64):
                        # small-bandwidth lowmem (r5): the f64-recursion
                        # factor tier FITS here (est CDB+Sinv < 11 GiB)
                        # and a stall that survives exact residuals is
                        # the broken-f32-factor signature (measured:
                        # anisotropic 600k-dof elements) — try it before
                        # giving up. No probe exists on this path, so
                        # the residual stall is the trigger.
                        print("Newton: stall persists with exact "
                              f"residuals ({res:.3e}) - escalating to "
                              "f64 factorization (small-bandwidth "
                              "lowmem)", flush=True)
                        self._banded_f64 = True
                        res_pre2 = res
                        self._rebuild(U, U0, tstep)
                        it0 = int(stats["iterations"])
                        U, R, stats = self._newton_chunked(
                            U0, U, bc_values, load, True, self.opt.max_it)
                        stats["iterations"] += it0
                        res = float(stats["residual"])
                        r0 = max(r0, float(stats["r0"]))
                        converged = (res <= self.opt.atol
                                     or res <= self.opt.rtol
                                     * max(r0, 1e-300))
                        if converged:
                            return U, R, stats
                        if res > 0.5 * res_pre2:
                            # the f64 factors did not move the stall —
                            # the factors were NOT the problem (e.g. a
                            # direction/noise floor), so don't pay f64
                            # rebuilds for the rest of the run
                            self._banded_f64 = False
                    # f64 jacfwd at lowmem-scale problems is a measured
                    # OOM (round-1 full-bench failure mode): return the
                    # best state with the warning instead of the chip
                    print("Newton: stall persists with exact residuals "
                          f"({res:.3e}); f64-Jacobian escalation skipped "
                          "(problem too large for f64 jacfwd)", flush=True)
                    return U, R, stats
                print("Newton: stall persists with exact residuals "
                      f"({res:.3e}) - escalating to f64 Jacobians",
                      flush=True)
                it0 = int(stats["iterations"])
                U, R, stats = self._newton_chunked(U0, U, bc_values,
                                                   load, True,
                                                   self.opt.max_it,
                                                   exact=True)
                stats["iterations"] += it0
                res = float(stats["residual"])
                r0 = max(r0, float(stats["r0"]))
                converged = (res <= self.opt.atol
                             or res <= self.opt.rtol * max(r0, 1e-300))
                if converged or not self._rebuild_on_exact_stall:
                    # the axon remote TPU worker reliably dies (allocator
                    # crash/OOM at ~10 GB cumulative churn) on a mid-step
                    # rebuild after the escalation ladder — on that
                    # backend, return the best state with the warning
                    # rather than the whole run (CLAUDE.md)
                    return U, R, stats
                # LAST tier: fresh rebuild AT THE CURRENT STATE + exact
                # retry. The frozen Ruiz scaling + factors are what
                # stagnate GMRES on hard transient states (measured: f64
                # GMRES at tol 1e-5 x600 iterations still cannot deliver
                # the LU-grade direction under the stale M, while LU with
                # a fresh factorization converges the same step).
                print("Newton: rebuilding preconditioner at the current "
                      "state for the exact retry", flush=True)
                self._rebuild(U, U0, tstep)
                it0 = int(stats["iterations"])
                U, R, stats = self._newton_chunked(U0, U, bc_values,
                                                   load, True,
                                                   self.opt.max_it,
                                                   exact=True)
                stats["iterations"] += it0
                return U, R, stats
        if not converged and not fresh:
            # stall-triggered rebuild (NewtonSolver semantics,
            # fem/solver.py: "rebuild as soon as the residual stops
            # decreasing"): a preconditioner frozen recompute_tstep steps ago
            # degrades GMRES exactly on load-jump steps. Rebuild at the best
            # mid-Newton state and continue from it.
            self._rebuild(U, U0, tstep)
            it0 = int(stats["iterations"])
            U, R, stats = self._newton_chunked(
                U0, U, bc_values, load,
                bool(stats.get("fine", False)), self.opt.max_it)
            stats["iterations"] += it0
        return U, R, stats


class IterativeNewtonSolver:
    """Drop-in NewtonSolver replacement driving the TPU-native iterative
    path (fresh element Jacobians each Newton iteration, Ruiz-equilibrated
    RAS-preconditioned GMRES, jitted end to end).

    Selected from problem configs via linear_solver in
    ("gmres", "iterative", "ras") — the Krylov analogue of the reference's
    `linear_solver` vocabulary (reference: turtleFSI
    problem/__init__.py default_variables; VaSP configs say "mumps")."""

    def __init__(self, system, bc_set, step_options: StepOptions,
                 recompute_tstep: int = 20, verbose: bool = True,
                 raise_on_fail: bool = True, device_mesh=None):
        if device_mesh is not None and device_mesh.devices.size > 1:
            # multi-chip: the same step contract over a jax.sharding.Mesh
            # (dof-sharded state, halo-exchange assembly, block-axis-sharded
            # banded factors). The reference's `mpirun -np N turtleFSI`
            # workflow (reference: docs/simulation.md:13-19).
            from vasp_tpu.parallel.banded_shard import ShardedBandedStepper

            if getattr(system, "lift", None) is not None:
                raise NotImplementedError(
                    "biharmonic lifting is not supported on the sharded "
                    "path yet; use extrapolation=laplace/elastic or run "
                    "single-device")
            self.stepper = ShardedBandedStepper(
                system, bc_set, step_options, mesh=device_mesh,
                recompute_tstep=recompute_tstep)
            self.stepper.ndof = system.space.ndof
        else:
            self.stepper = IterativeStepper(system, bc_set, step_options,
                                            recompute_tstep=recompute_tstep)
        self.bc = bc_set
        self.opt = step_options
        self.verbose = verbose
        self.raise_on_fail = raise_on_fail

    def solve(self, U, U0, t, tstep, load=None):
        del U  # initial guess is the previous step (reference semantics)
        if load is None:
            load = jnp.zeros(self.stepper.ndof)
        bcv = jnp.asarray(self.bc.values_at(t))
        U1, stats = self.stepper.step(U0, bcv, load, tstep)
        it = int(stats["iterations"])
        res = float(stats["residual"])
        r0 = float(stats["r0"])
        rel = res / (r0 if r0 > 0 else 1.0)
        converged = res <= self.opt.atol or rel <= self.opt.rtol
        if self.verbose:
            print(f"Newton iteration {it}: r (atol) = {res:.3e} "
                  f"(tol = {self.opt.atol:.3e}), r (rel) = {rel:.3e} "
                  f"(tol = {self.opt.rtol:.3e})")
            if not converged:
                print(f"WARNING: Newton did not converge at timestep "
                      f"{tstep} (residual {res:.3e})")
        # same hard-failure bar as the LU path (fem/solver.py): an
        # unconverged state must not silently enter the trajectory
        # (reference: turtleFSI newtonsolver raises past max_it
        # unconditionally); problems opt out with raise_on_fail=False
        if not converged and self.raise_on_fail:
            raise RuntimeError(
                f"Newton failed at t={t} (tstep {tstep}): residual {res:.3e}"
                f" rel {rel:.3e} after {it} iterations")
        return U1, dict(iterations=it, residual=res, rel=rel,
                        converged=converged)
