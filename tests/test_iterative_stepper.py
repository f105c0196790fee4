"""IterativeStepper (Ruiz + RAS GMRES Newton): the production TPU path.

Must converge to the same solution as the direct-LU Newton path on a ramped
FSI tube step (the measured preconditioner: RAS(overlap=2) converges GMRES
in ~15-85 iterations where single-level methods stall — see fem/ras.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vasp_tpu.fem.dirichlet import DirichletBC
from vasp_tpu.fem.timestepper import IterativeStepper, StepOptions
from vasp_tpu.mesh.generate import fsi_tube_mesh
from vasp_tpu.run.system import FSISystem


@pytest.fixture(scope="module")
def tube_problem():
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
        extrapolation_sub_type="constant", quadrature_degree=2,
        robin_bc=True, k_s=[1e5], c_s=[10], ds_s_id=[33],
        atol=1e-10, rtol=1e-10, max_it=8, recompute=1, recompute_tstep=1,
        linear_solver="lu", verbose=False,
    )
    sys_ = FSISystem(mesh, cfg)
    space = sys_.space
    bcs = []
    for m in (2, 3, 11):
        bcs.append(DirichletBC(space.field_dofs("d",
                                                space.p2_dofs_on_facets(m)),
                               0.0))
    for m in (2, 11):
        bcs.append(DirichletBC(space.field_dofs("v",
                                                space.p2_dofs_on_facets(m)),
                               0.0))
    bc_set = sys_.make_bcset(bcs)
    load = 150.0 * jnp.asarray(sys_.interface_pressure_load())
    return sys_, bc_set, load


def test_ras_stepper_matches_lu(tube_problem):
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))

    # reference: direct-LU Newton
    solver = sys_.make_solver(bc_set)
    U_lu, info_lu = solver.solve(bc_set.apply(U0, 0.001), U0, t=0.001,
                                 tstep=1, load=load)

    opts = StepOptions(atol=1e-10, rtol=1e-10, max_it=8, gmres_tol=1e-9,
                       gmres_restart=60, gmres_maxiter=600, overlap=2)
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=20)
    U_it, info_it = stepper.step(U0, bcv, load, tstep=1)

    assert float(info_it["residual"]) < 1e-9
    a, b = np.asarray(U_lu), np.asarray(U_it)
    scale = np.abs(a).max()
    assert np.allclose(a, b, atol=1e-6 * scale), (
        np.abs(a - b).max(), scale
    )


def test_ras_stepper_reuses_preconditioner(tube_problem):
    """Second step must reuse the RAS inverse (no host rebuild) and still
    converge."""
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    opts = StepOptions(atol=1e-9, rtol=1e-9, max_it=8, gmres_tol=1e-8,
                       gmres_restart=60, gmres_maxiter=600, overlap=2)
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=20)
    U1, _ = stepper.step(U0, bcv, load, tstep=1)
    rebuild_step = stepper._last_rebuild
    U2, info2 = stepper.step(U1, bcv, 1.5 * load, tstep=2)
    assert stepper._last_rebuild == rebuild_step  # reused
    assert float(info2["residual"]) < 1e-9 * max(
        1.0, float(info2["r0"])
    ) or float(info2["residual"]) < 1e-9
    assert np.all(np.isfinite(np.asarray(U2)))


def _damage_pinv(stepper, seed=0, scale=5.0):
    """Corrupt the banded factors in place (elementwise random scaling):
    the miniature of the production disease — DEGRADED factors (bf16
    roundoff at blockcond ~2e9 on vmtk meshes, CLAUDE.md precision
    ladder) stalling Newton while the system itself stays solvable."""
    rng = np.random.default_rng(seed)
    first, *rest = stepper._pinv
    noise = jnp.asarray(rng.uniform(-1.0, 1.0, first.shape),
                        dtype=first.dtype)
    stepper._pinv = (first * (1.0 + scale * noise), *rest)


def test_stall_triggered_rebuild(tube_problem):
    """DEGRADED preconditioner factors at a non-rebuild step
    (recompute_tstep far in the future) must trip the stall detector,
    rebuild mid-step, and strictly improve on the no-rebuild Newton
    (VERDICT r1 weak #3; NewtonSolver's stall-rebuild semantics ported to
    the iterative path).

    The damage is INJECTED (random per-entry scaling of the factors): the
    round-3 cancellation-free kinematics removed every emergent stall on
    this structured fixture (measured: converges in <=3 iterations at load
    jumps up to 12x with gmres_maxiter down to 30), and the production
    stall driver is factor-quality degradation on unstructured meshes
    (CLAUDE.md precision-tier ladder), which this simulates directly."""
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    opts = StepOptions(atol=1e-9, rtol=1e-9, max_it=8, gmres_tol=1e-8,
                       gmres_restart=60, gmres_maxiter=60, overlap=2)
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=1000)
    U1, _ = stepper.step(U0, bcv, load, tstep=1)
    first_rebuild = stepper._last_rebuild
    _damage_pinv(stepper)

    # raw jitted Newton with the DAMAGED preconditioner (no host retry
    # logic); anc_U/anc_R are unused placeholders with chained=False
    U2_stale, _, statv_stale, _ = stepper._newton(
        U1, U1, bcv, 3.0 * load, stepper._dr, stepper._dc, stepper._pinv,
        stepper._blocks_dev, False, stepper.opt.max_it, False,
        U1, U1, False, 0, jnp.int32(0), False)
    # statv layout: [iterations, residual, r0, stalled, fine, rbfine]
    sv = np.asarray(statv_stale)
    info_stale = dict(iterations=int(sv[0]), residual=float(sv[1]),
                      stalled=bool(sv[3]))
    assert info_stale["stalled"], "damaged factors must stall raw Newton"

    # the public step(): detects the stall, rebuilds, continues — and with
    # best-state tracking NEVER ends on a worse iterate than the stale run
    U2, info2 = stepper.step(U1, bcv, 3.0 * load, tstep=2)
    assert np.all(np.isfinite(np.asarray(U2)))
    assert stepper._last_rebuild > first_rebuild, (
        "expected a stall-triggered mid-step rebuild"
    )
    assert float(info2["residual"]) <= float(info_stale["residual"]) * (
        1.0 + 1e-12)


def test_ras_stepper_f32_jacobian(tube_problem):
    """The TPU production setting: f32 element-Jacobian matvecs (inexact
    Newton, f64 residuals) must still converge to the f64 solution."""
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    opts = StepOptions(atol=1e-9, rtol=1e-9, max_it=10, gmres_tol=1e-6,
                       gmres_restart=60, gmres_maxiter=600, overlap=2,
                       jac_dtype="f32")
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=20)
    U_it, info = stepper.step(U0, bcv, load, tstep=1)
    assert float(info["residual"]) < 1e-9

    solver = sys_.make_solver(bc_set)
    U_lu, _ = solver.solve(bc_set.apply(U0, 0.001), U0, t=0.001, tstep=1,
                           load=load)
    a, b = np.asarray(U_lu), np.asarray(U_it)
    assert np.allclose(a, b, atol=1e-5 * np.abs(a).max())


def test_extrapolation_predictor(tube_problem):
    """predictor="extrapolate" seeds Newton with 2 U_n - U_{n-1} on
    consecutive steps. It must (a) converge to the same trajectory as the
    plain start, and (b) not take more Newton iterations on smooth ramp
    steps (on the TPU bench it removes one ~1.9 s endgame iteration)."""
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    base = dict(atol=1e-9, rtol=1e-9, max_it=10, gmres_tol=1e-8,
                gmres_restart=60, gmres_maxiter=600, overlap=2)

    def run(predictor):
        opts = StepOptions(predictor=predictor, **base)
        st = IterativeStepper(sys_, bc_set, opts, recompute_tstep=20)
        U, its = U0, []
        for k in (1, 2, 3):
            U, info = st.step(U, bcv, (0.5 + 0.25 * k) * load, tstep=k)
            its.append(int(info["iterations"]))
            assert float(info["residual"]) < 1e-8
        return np.asarray(U), its

    U_plain, its_plain = run("none")
    U_pred, its_pred = run("extrapolate")
    scale = np.abs(U_plain).max()
    assert np.allclose(U_plain, U_pred, atol=1e-6 * scale), (
        np.abs(U_plain - U_pred).max(), scale)
    assert sum(its_pred) <= sum(its_plain), (its_pred, its_plain)


def test_lowmem_banded_path(tube_problem, monkeypatch):
    """VASP_FORCE_LOWMEM exercises the full-bench-size code path (Sinv-only
    factors, C/B folded into the apply as bf16) on the small fixture: it
    must converge to the LU solution like the default path does."""
    monkeypatch.setenv("VASP_FORCE_LOWMEM", "1")
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    opts = StepOptions(atol=1e-9, rtol=1e-9, max_it=10, gmres_tol=1e-8,
                       gmres_restart=60, gmres_maxiter=600, overlap=2)
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=20)
    assert stepper._banded_lowmem
    U_it, info = stepper.step(U0, bcv, load, tstep=1)
    assert float(info["residual"]) < 1e-8
    # the apply-side C/B really are bf16 (the HBM-traffic optimization)
    Sinv, Cm, Bm = stepper._pinv
    assert Cm.dtype == jnp.bfloat16 and Bm.dtype == jnp.bfloat16

    solver = sys_.make_solver(bc_set)
    U_lu, _ = solver.solve(bc_set.apply(U0, 0.001), U0, t=0.001, tstep=1,
                           load=load)
    a, b = np.asarray(U_lu), np.asarray(U_it)
    assert np.allclose(a, b, atol=1e-5 * np.abs(a).max())


def test_endgame_factor_certified(tube_problem):
    """endgame_factor=3 (the bench anchor config): coarse f32 residuals
    carry Newton almost to atol and one exact evaluation certifies the
    exit — the result must still match the LU trajectory, and the final
    reported residual must be f64-certified (stats['fine'])."""
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    opts = StepOptions(atol=1e-6, rtol=1e-6, max_it=10, gmres_tol=1e-3,
                       gmres_restart=60, gmres_maxiter=120, overlap=2,
                       jac_dtype="f32", krylov_dtype="f32",
                       residual_dtype="f32", endgame_factor=3.0)
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=20)
    U_it, info = stepper.step(U0, bcv, load, tstep=1)
    assert float(info["residual"]) <= 1e-6
    assert bool(info["fine"]), "exit residual must be f64-certified"

    solver = sys_.make_solver(bc_set)
    U_lu, _ = solver.solve(bc_set.apply(U0, 0.001), U0, t=0.001, tstep=1,
                           load=load)
    a, b = np.asarray(U_lu), np.asarray(U_it)
    assert np.allclose(a, b, atol=2e-4 * np.abs(a).max()), (
        np.abs(a - b).max(), np.abs(a).max())


def test_lowmem_small_bandwidth_factor_escalation(tube_problem,
                                                  monkeypatch):
    """r5: the hybrid lowmem branch's f64-recursion factor tier is
    MEMORY-GATED, not categorically off — at small bandwidth (est
    CDB+Sinv < 11 GiB) a stall that survives the exact-residual retry
    escalates the FACTORIZATION before giving up (measured need: the
    fixed-length 600k-dof TPU ladder dead-ended at 6e-4 without it;
    there is no probe on this path, so the residual stall is the
    trigger)."""
    monkeypatch.setenv("VASP_FORCE_LOWMEM", "1")
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    # production residual mode: the coarse-stall -> exact-retry ladder
    # (which hosts the new tier) only exists for f32/mixed/f32f. atol at
    # the production 1e-6 — 1e-9 sits under the f32f floor and fires the
    # ladder on step 1's noise stall instead of the injected damage
    opts = StepOptions(atol=1e-6, rtol=1e-6, max_it=8, gmres_tol=1e-8,
                       gmres_restart=60, gmres_maxiter=60, overlap=2,
                       residual_dtype="f32f")
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=1000)
    assert stepper._banded_lowmem and stepper._lowmem_esc_ok
    U1, _ = stepper.step(U0, bcv, load, tstep=1)
    assert not stepper._banded_f64

    _damage_pinv(stepper)
    U2, info2 = stepper.step(U1, bcv, 3.0 * load, tstep=2)
    assert np.all(np.isfinite(np.asarray(U2)))
    # the ladder must reach the f64 factor tier (lowmem has no probe and
    # no generic stall-rebuild before it) and make real progress
    assert stepper._banded_f64, "expected the small-bandwidth f64 tier"
    assert float(info2["residual"]) < 1e-5, float(info2["residual"])


def test_reactive_factor_escalation(tube_problem):
    """Optimistic-bf16 policy: a probe-flagged factorization escalates to
    the f64 recursion ONLY when Newton actually stalls (probe magnitude
    alone is a measured false positive on structured meshes). Simulated by
    flagging the probe AND injecting factor damage (the production
    degraded-bf16 condition in miniature — see test_stall_triggered_rebuild
    on why no emergent stall exists on this fixture anymore)."""
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    opts = StepOptions(atol=1e-9, rtol=1e-9, max_it=8, gmres_tol=1e-8,
                       gmres_restart=60, gmres_maxiter=60, overlap=2)
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=1000)
    U1, _ = stepper.step(U0, bcv, load, tstep=1)
    assert not stepper._banded_f64  # healthy factors: no escalation

    # flag the probe + damage the factors: the next stall must take the
    # reactive branch
    stepper._last_rel = 1e9
    _damage_pinv(stepper)
    U2, info2 = stepper.step(U1, bcv, 3.0 * load, tstep=2)
    assert stepper._banded_f64, "stall + flagged probe must escalate"
    assert np.all(np.isfinite(np.asarray(U2)))
    # escalated f64 factors + rebuild must make real Newton progress on
    # the jump step within the 8+8 iteration test budget
    assert float(info2["residual"]) < 1e-5, float(info2["residual"])


def test_cumsum_accumulate_matches_segment_sum(tube_problem):
    """The f64 cumsum-diff accumulate (TPU fast path) must agree with the
    sorted segment_sum to f64 roundoff on a real residual."""
    import jax
    from vasp_tpu.fem.assembly import Assembler, build_scatter_plan

    sys_, bc_set, load = tube_problem
    ndof = sys_.space.ndof
    plan = build_scatter_plan(sys_.assembler.blocks, ndof)
    asm = Assembler(ndof, sys_.assembler.blocks, scatter_plan=plan)

    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.normal(0.0, 1e-4, ndof))
    U0 = jnp.zeros(ndof)
    R_cs = np.asarray(asm.residual(U, U0))

    plan_ss = {k: v for k, v in plan.items() if k in ("order", "segids")}
    asm_ss = Assembler(ndof, sys_.assembler.blocks, scatter_plan=plan_ss)
    R_ss = np.asarray(asm_ss.residual(U, U0))

    scale = np.abs(R_ss).max()
    assert np.abs(R_cs - R_ss).max() < 1e-12 * max(scale, 1.0)


def test_delta_endgame_matches_raw_f64(tube_problem):
    """The Taylor-delta endgame (the TPU production default) must converge
    to the same state as raw f64 endgame residuals (delta_endgame=False)
    at the bench anchor config."""
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    common = dict(atol=1e-6, rtol=1e-6, max_it=10, gmres_tol=1e-3,
                  gmres_restart=60, gmres_maxiter=120, overlap=2,
                  jac_dtype="f32", krylov_dtype="f32",
                  residual_dtype="f32")
    U_delta, info_d = IterativeStepper(
        sys_, bc_set, StepOptions(delta_endgame=True, **common),
        recompute_tstep=20).step(U0, bcv, load, tstep=1)
    U_raw, info_r = IterativeStepper(
        sys_, bc_set, StepOptions(delta_endgame=False, **common),
        recompute_tstep=20).step(U0, bcv, load, tstep=1)
    assert float(info_d["residual"]) <= 1e-6
    assert float(info_r["residual"]) <= 1e-6
    a, b = np.asarray(U_raw), np.asarray(U_delta)
    assert np.allclose(a, b, atol=1e-5 * np.abs(a).max()), (
        np.abs(a - b).max(), np.abs(a).max())


def test_ew_forcing_matches_fixed(tube_problem):
    """Eisenstat-Walker adaptive forcing (StepOptions.forcing="ew") must
    converge to the same state as fixed gmres_tol forcing — the loose
    early directions only change the path, not the root."""
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    common = dict(atol=1e-6, rtol=1e-6, max_it=10, gmres_tol=1e-3,
                  gmres_restart=60, gmres_maxiter=120, overlap=2,
                  jac_dtype="f32", krylov_dtype="f32",
                  residual_dtype="f32")
    U_ew, info_e = IterativeStepper(
        sys_, bc_set, StepOptions(forcing="ew", **common),
        recompute_tstep=20).step(U0, bcv, load, tstep=1)
    U_fx, info_f = IterativeStepper(
        sys_, bc_set, StepOptions(forcing="fixed", **common),
        recompute_tstep=20).step(U0, bcv, load, tstep=1)
    assert float(info_e["residual"]) <= 1e-6
    assert float(info_f["residual"]) <= 1e-6
    # two inexact-Newton paths converge to the SAME root only up to what
    # atol bounds through the conditioning (equilibrated cond ~4e6):
    # measured 5.7e-5 relative on this fixture
    a, b = np.asarray(U_fx), np.asarray(U_ew)
    assert np.allclose(a, b, atol=2e-4 * np.abs(a).max()), (
        np.abs(a - b).max(), np.abs(a).max())


def test_lowmem_hybrid_matches_lu(tube_problem, monkeypatch):
    """The HYBRID lowmem factor layout (f32 Sinv + bf16 H/G — the
    production layout at >=185k dofs, where all-f32 factors OOM the 16 GB
    chip and all-bf16 ones cost ~5 GMRES inner iterations/direction) must
    converge to the LU solution. Forced here via VASP_FORCE_LOWMEM on the
    tiny fixture; the H/G-form apply and the three-phase rebuild are the
    same code the full bench runs."""
    sys_, bc_set, load = tube_problem
    monkeypatch.setenv("VASP_FORCE_LOWMEM", "1")
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))

    solver = sys_.make_solver(bc_set)
    U_lu, _ = solver.solve(bc_set.apply(U0, 0.001), U0, t=0.001,
                           tstep=1, load=load)

    opts = StepOptions(atol=1e-9, rtol=1e-9, max_it=8, gmres_tol=1e-8,
                       gmres_restart=60, gmres_maxiter=600, overlap=2)
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=20)
    assert stepper._banded_lowmem and stepper._lowmem_mode == "hybrid"
    U_it, info_it = stepper.step(U0, bcv, load, tstep=1)
    assert float(info_it["residual"]) < 1e-8
    # second step reuses the hybrid factors; third forces a fresh rebuild
    # (the measured OOM class was the SECOND rebuild's enqueue overlap)
    U2, _ = stepper.step(U_it, bcv, load, tstep=2)
    stepper._rebuild(U2, U_it, 3)
    a, b = np.asarray(U_lu), np.asarray(U_it)
    scale = np.abs(a).max()
    assert np.allclose(a, b, atol=1e-5 * scale), (
        np.abs(a - b).max(), scale)


def test_jac_carry_unwrapped_age(tube_problem):
    """Advisor r4 (medium): on a stream of 1-iteration converged steps a
    carried Jacobian must NOT age past `recompute` undetected (the old
    mod-rec bookkeeping wrapped 19->0 silently). With recompute=3, after
    enough 1-2-iteration steps the host must drop the carry (forcing
    fresh element Jacobians) instead of wrapping its age."""
    sys_, bc_set, load = tube_problem
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    opts = StepOptions(atol=1e-8, rtol=1e-8, max_it=8, gmres_tol=1e-7,
                       gmres_restart=60, gmres_maxiter=600,
                       recompute=3, jac_carry=True)
    stepper = IterativeStepper(sys_, bc_set, opts, recompute_tstep=100)
    ages = []
    U = U0
    for tstep in range(1, 7):
        U, info = stepper.step(U, bcv, load, tstep=tstep)
        res = float(info["residual"])
        assert res < 1e-8 * max(1.0, float(info["r0"])) or res < 1e-8
        carry = stepper._jac_carry
        ages.append(None if carry is None else int(carry[1]))
    # the age must never reach recompute while a carry is held, and the
    # carry must actually cycle (dropped or refreshed at least once over
    # 6 steps of >=1 iteration each with recompute=3)
    held = [a for a in ages if a is not None]
    assert all(a < 3 for a in held), ages
    assert (None in ages) or (len(held) >= 2 and min(held) < max(held)), ages
