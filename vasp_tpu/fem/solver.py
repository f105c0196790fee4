"""Damped Newton solver with Jacobian reuse and pluggable linear solvers.

Replaces the reference's turtleFSI "newtonsolver" + MUMPS
(reference: src/vasp/simulations/offset_stenosis.py:44-48 and SURVEY.md §2.3):

- theta-scheme residual assembled by vasp_tpu.fem.assembly,
- Newton with constant damping ``lmbda``
  (reference: src/vasp/simulations/predeform.py:48),
- Jacobian reuse knobs ``recompute`` (iterations) / ``recompute_tstep``
  (timesteps),
- linear solvers:
    "lu"     — host sparse LU (scipy splu) of the monolithic Jacobian; the
               factorization is cached as long as the Jacobian is reused
               (this is the MUMPS-equivalent correctness path),
    "gmres"  — device-side matrix-free GMRES on the batched element
               Jacobians with an element-block additive-Schwarz
               preconditioner (the TPU production path).

Stdout follows the reference solver's de-facto log API consumed by
vasp-log-plotter and the regression tests
(reference: src/vasp/postprocessing/log_plotter.py:73-77 regexes):
  "Newton iteration {i}: r (atol) = {...} (tol = {...}), r (rel) = {...} (tol = {...})"
"""
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class NewtonOptions:
    atol: float = 1e-7
    rtol: float = 1e-7
    max_it: int = 50
    lmbda: float = 1.0
    recompute: int = 5
    recompute_tstep: int = 1
    linear_solver: str = "lu"  # "lu" | "gmres"
    gmres_tol: float = 1e-4
    gmres_restart: int = 50
    gmres_maxiter: int = 400
    verbose: bool = True
    raise_on_fail: bool = True


@dataclass
class NewtonState:
    jacs: Optional[list] = None
    lu = None
    pinv: Optional[list] = None  # Schwarz block inverses
    multiplicity: Optional[jnp.ndarray] = None
    last_rebuild_tstep: int = -(10 ** 9)
    iters_since_rebuild: int = 0


def _host_ruiz(A, bc_mask, sweeps=4):
    """Row/col max-norm equilibration of a scipy CSR (fem/scaling.py
    semantics, host-side, on the fully assembled matrix)."""
    import scipy.sparse as sp

    n = A.shape[0]
    dr = np.ones(n)
    dc = np.ones(n)
    for _ in range(sweeps):
        B = sp.diags(dr) @ A @ sp.diags(dc)
        B = abs(B)
        rmax = np.asarray(B.max(axis=1).todense()).ravel()
        cmax = np.asarray(B.max(axis=0).todense()).ravel()
        dr /= np.sqrt(np.maximum(rmax, 1e-30))
        dc /= np.sqrt(np.maximum(cmax, 1e-30))
        dr[bc_mask] = 1.0
        dc[bc_mask] = 1.0
    return dr, dc


class NewtonSolver:
    def __init__(self, assembler, bc_set, options: NewtonOptions,
                 lift=None):
        self.asm = assembler
        self.bc = bc_set
        self.opt = options
        self.state = NewtonState()
        self._bc_mask_dev = jnp.asarray(bc_set.mask)
        # biharmonic lifting correction: linear L M^-1 L - L term on the
        # fluid d-block (fem/biharmonic.py) — enters residual AND matvec
        self.lift = lift
        self._lift_csr = None

        if lift is not None:
            from vasp_tpu.fem.biharmonic import correction_apply

            def _extra(U):
                return correction_apply(lift, U)
        else:
            def _extra(U):
                return 0.0

        @jax.jit
        def _residual(U, U0, load):
            R = self.asm.residual(U, U0) + load + _extra(U)
            return jnp.where(self._bc_mask_dev, 0.0, R)

        self._residual = _residual

        @jax.jit
        def _matvec(jacs, x):
            y = self.asm.matvec(jacs, x) + _extra(
                jnp.where(self._bc_mask_dev, 0.0, x))
            return jnp.where(self._bc_mask_dev, x, y)

        self._matvec = _matvec
        self._jacfn = jax.jit(self.asm.element_jacobians)

    # ---------------- Jacobian management ----------------
    def _rebuild(self, U, U0, tstep):
        self.state.jacs = self._jacfn(U, U0)
        self.state.last_rebuild_tstep = tstep
        self.state.iters_since_rebuild = 0
        if self.opt.linear_solver == "lu":
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla

            # factorize the RUIZ-EQUILIBRATED matrix: the raw monolithic FSI
            # Jacobian spans ~12 decades and can exceed f64 LU accuracy
            # (cond * eps = O(1) -> ~0.5 Newton contraction instead of
            # one-shot; observed on the MooneyRivlin predeform case).
            # Equilibration runs on the FULLY ASSEMBLED host CSR so every
            # term — including the biharmonic lifting correction, which the
            # element Jacobians do not carry — is scaled.
            A = self.asm.to_csr(self.state.jacs, bc_mask=self.bc.mask)
            if self.lift is not None:
                if self._lift_csr is None:
                    from vasp_tpu.fem.biharmonic import correction_csr

                    C = correction_csr(self.lift, self.asm.ndof).tolil()
                    bcm = np.asarray(self.bc.mask)
                    idx = np.nonzero(bcm)[0]
                    C[idx, :] = 0.0
                    C[:, idx] = 0.0
                    self._lift_csr = C.tocsr()
                A = A + self._lift_csr
            drn, dcn = _host_ruiz(A, np.asarray(self.bc.mask), sweeps=4)
            A_s = (sp.diags(drn) @ A @ sp.diags(dcn)).tocsc()
            self.state.lu = spla.splu(A_s)
            self.state.A_s = A_s  # kept for the Levenberg fallback
            self.state.lu_dr = drn
            self.state.lu_dc = dcn
        else:
            self._build_schwarz()

    def _build_schwarz(self):
        """Element-block additive Schwarz: invert each element Jacobian with
        BC rows replaced by identity and a small pressure regularization, and
        precompute dof multiplicities for weighting."""
        eps = 1e-12
        pinv = []
        mult = jnp.zeros(self.asm.ndof)
        mask = self._bc_mask_dev
        for b, A in zip(self.asm.blocks, self.state.jacs):
            nloc = A.shape[-1]
            bcm = mask[b.dofs]  # (K,nloc)
            eye = jnp.eye(nloc)
            Amod = jnp.where(bcm[:, :, None], eye[None], A)
            Amod = jnp.where(bcm[:, None, :] & ~bcm[:, :, None], 0.0, Amod)
            # regularize (pressure zero-diagonal saddle blocks)
            diag_scale = jnp.maximum(
                jnp.abs(jnp.diagonal(Amod, axis1=1, axis2=2)), 1.0
            )
            Amod = Amod + eps * jax.vmap(jnp.diag)(diag_scale)
            pinv.append(jnp.linalg.inv(Amod))
            mult = mult.at[b.dofs.reshape(-1)].add(1.0)
        self.state.pinv = pinv
        self.state.multiplicity = jnp.maximum(mult, 1.0)

    def _precond(self, r):
        y = jnp.zeros_like(r)
        for b, Ai in zip(self.asm.blocks, self.state.pinv):
            re = r[b.dofs]
            from vasp_tpu.fem.banded import bgemv

            ye = bgemv(Ai, re)
            y = y.at[b.dofs.reshape(-1)].add(ye.reshape(-1))
        return y / self.state.multiplicity

    # ---------------- linear solve ----------------
    def _linear_solve(self, R):
        if self.opt.linear_solver == "lu":
            y = self.state.lu.solve(self.state.lu_dr * np.asarray(R))
            return jnp.asarray(self.state.lu_dc * y)
        jacs = self.state.jacs

        def mv(x):
            return self._matvec(jacs, x)

        dx, _ = jax.scipy.sparse.linalg.gmres(
            mv,
            R,
            tol=self.opt.gmres_tol,
            atol=0.0,
            restart=self.opt.gmres_restart,
            maxiter=self.opt.gmres_maxiter,
            M=self._precond,
            solve_method="incremental",
        )
        return dx

    # ---------------- Newton loop ----------------
    def solve(self, U, U0, t, tstep, load=None):
        """One nonlinear solve. U: initial guess (typically previous step with
        BCs applied); U0: previous timestep solution. Returns (U, info)."""
        opt = self.opt
        if load is None:
            load = jnp.zeros(self.asm.ndof)
        U = self.bc.apply(U, t)

        first_res = None
        prev_res = None
        stalled = False
        best_res = np.inf
        best_U = U
        no_progress = 0
        it = 0
        converged = False
        last_stall_rebuild = -10
        while it < opt.max_it:
            need_rebuild = (
                self.state.jacs is None
                or (it > 0 and self.state.iters_since_rebuild >= opt.recompute)
                or (
                    it == 0
                    and (tstep - self.state.last_rebuild_tstep)
                    >= opt.recompute_tstep
                )
                # safeguard beyond the reference's fixed reuse cadence: a
                # reused (chord) Jacobian can yield ASCENT directions on
                # strongly nonlinear steps — rebuild as soon as the residual
                # stops decreasing. BUT: if a FRESH Jacobian also stalls
                # (a genuine nonlinear valley, e.g. the predeform pressure
                # phase — line search crawls at ~0.9/iter with EXACT J),
                # re-rebuilding every iteration only burns factorizations;
                # allow at most one stall-rebuild per 3 iterations.
                or (stalled and self.state.iters_since_rebuild > 0
                    and it - last_stall_rebuild >= 3)
            )
            if need_rebuild:
                if stalled:
                    last_stall_rebuild = it
                self._rebuild(U, U0, tstep)

            R = self._residual(U, U0, load)
            res = float(jnp.linalg.norm(R))
            if first_res is None:
                first_res = res if res > 0 else 1.0
            rel = res / first_res
            if opt.verbose:
                print(
                    f"Newton iteration {it}: r (atol) = {res:.3e} "
                    f"(tol = {opt.atol:.3e}), r (rel) = {rel:.3e} "
                    f"(tol = {opt.rtol:.3e})"
                )
            if res < best_res:
                best_res, best_U = res, U
                no_progress = 0
            else:
                no_progress += 1
            if res < opt.atol or rel < opt.rtol:
                converged = True
                break
            if no_progress >= 5:
                # stagnation: the line-searched tail oscillates without
                # improving — return the best state seen
                break
            # A chord (reused-Jacobian) iteration converging slower than 2x
            # per iteration is cheaper to REBUILD than to ride out: measured
            # on the reference stenosis fixture, the frozen step-start
            # Jacobian decays the residual at ~0.85/iter (30+ iterations to
            # atol) while a fresh jacfwd Jacobian restores quadratic
            # convergence (9.8e-4 -> 3e-6 -> 2e-8). Unlike the reference,
            # our Jacobian rebuild is a cheap batched jacfwd, so the stall
            # threshold is deliberately trigger-happy; healthy fresh-J
            # iterations contract far below 0.5 and never trip it.
            stalled = prev_res is not None and res > 0.5 * prev_res
            prev_res = res

            def backtrack(dx, n_halvings=8):
                """Best damped candidate by residual norm; NaN = rejected
                (e.g. inverted elements under a log-J hyperelastic energy)."""
                best_U, best_r = None, np.inf
                for k in range(n_halvings):
                    lam = opt.lmbda * (0.5 ** k)
                    Ut = U - lam * dx
                    rt = float(jnp.linalg.norm(self._residual(Ut, U0, load)))
                    if np.isfinite(rt) and rt < best_r:
                        best_U, best_r = Ut, rt
                return best_U, best_r

            dx = self._linear_solve(R)
            cand_U, cand_r = backtrack(dx)
            if (cand_U is None or cand_r >= res) \
                    and self.state.iters_since_rebuild > 0:
                # no descent with a reused (chord) Jacobian: rebuild and
                # retry this iteration with the exact tangent
                self._rebuild(U, U0, tstep)
                dx = self._linear_solve(self._residual(U, U0, load))
                cand_U, cand_r = backtrack(dx)
            if (cand_U is None or cand_r >= res) \
                    and self.opt.linear_solver == "lu" \
                    and getattr(self.state, "A_s", None) is not None:
                # Levenberg fallback: no descent along the EXACT Newton
                # direction (a narrow curved valley — measured on the
                # stenosis fixture's early Womersley steps, where the line
                # search otherwise accepts ascent and oscillates). Solve
                # (A_s + mu I) on the equilibrated system — a trust-region
                # step in the scaled norm — escalating mu until a descent
                # direction appears.
                import scipy.sparse as sp
                import scipy.sparse.linalg as spla

                n = self.asm.ndof
                Rnp = self.state.lu_dr * np.asarray(R)
                for mu in (1e-4, 1e-3, 1e-2, 1e-1):
                    lu_mu = spla.splu(
                        (self.state.A_s
                         + mu * sp.identity(n, format="csc")).tocsc())
                    dxm = jnp.asarray(self.state.lu_dc * lu_mu.solve(Rnp))
                    cu, cr = backtrack(dxm)
                    if cu is not None and cr < 0.999 * res:
                        cand_U, cand_r = cu, cr
                        break
            if cand_U is None:
                raise RuntimeError(
                    f"Newton line search failed at timestep {tstep}: every "
                    f"damped candidate produced a non-finite residual "
                    f"(residual {res:.3e})"
                )
            if cand_r >= res and no_progress >= 2:
                # nothing descends even with exact J + Levenberg: stop
                # instead of wandering uphill (best state is returned)
                break
            U = cand_U
            self.state.iters_since_rebuild += 1
            it += 1

        if not converged:
            U, res = best_U, best_res
            rel = res / first_res if first_res else 1.0
            # reference semantics: turtleFSI's newtonsolver raises past
            # max_it unconditionally (SURVEY §2.3); problems opt out with
            # raise_on_fail=False in their config
            if opt.raise_on_fail:
                raise RuntimeError(
                    f"Newton solver did not converge in {it} iterations "
                    f"(best residual {res:.3e}, rel {rel:.3e})"
                )
        return U, dict(iterations=it, residual=res, rel=rel,
                       converged=converged)
