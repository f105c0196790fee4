"""FSISystem: build the monolithic FSI operator from a config dict.

This is the equivalent of turtleFSI's internal setup (mixed space, fluid /
solid / extrapolation forms, Robin BC), driven by the same configuration
vocabulary the reference's problem files use (SURVEY.md §2.3):
dx_f_id / mu_f lists for multi-viscosity zones
(reference: src/vasp/simulations/offset_stenosis.py:59-61), solid_properties
dicts per solid subdomain (reference: src/vasp/simulations/avf.py:76-80),
extrapolation + sub_type (reference: src/vasp/simulations/cylinder.py:65-66),
robin_bc/k_s/c_s/ds_s_id (reference: src/vasp/simulations/aneurysm.py:73-76).
"""
import jax.numpy as jnp
import numpy as np

from vasp_tpu.fem.assembly import Assembler, CellBlock, FacetBlock, cell_geometry
from vasp_tpu.fem.dirichlet import BCSet, DirichletBC
from vasp_tpu.fem.forms import (
    interface_pressure_vector,
    make_fluid_kernel,
    make_robin_kernel,
    make_solid_kernel,
)
from vasp_tpu.fem.functionspace import DVPSpace
from vasp_tpu.fem.solver import NewtonOptions, NewtonSolver


def normalize_fluid_properties(cfg):
    if cfg.get("fluid_properties"):
        props = cfg["fluid_properties"]
        return props if isinstance(props, list) else [props]
    ids = np.atleast_1d(cfg.get("dx_f_id", 1)).tolist()
    mus = cfg.get("mu_f", 1.0)
    rhos = cfg.get("rho_f", 1.0)
    mus = mus if isinstance(mus, (list, tuple)) else [mus] * len(ids)
    rhos = rhos if isinstance(rhos, (list, tuple)) else [rhos] * len(ids)
    return [
        {"dx_f_id": i, "rho_f": r, "mu_f": m} for i, r, m in zip(ids, rhos, mus)
    ]


def normalize_solid_properties(cfg):
    if cfg.get("solid") == "no_solid":
        return []
    props = cfg.get("solid_properties")
    if props:
        return props if isinstance(props, list) else [props]
    ids = np.atleast_1d(cfg.get("dx_s_id", 2)).tolist()
    out = []
    for k, i in enumerate(ids):
        def pick(key, default=None):
            val = cfg.get(key, default)
            if isinstance(val, (list, tuple)):
                return val[k]
            return val
        out.append(
            {
                "dx_s_id": i,
                "material_model": pick("material_model", "StVenantKirchoff"),
                "rho_s": pick("rho_s", 1e3),
                "mu_s": pick("mu_s"),
                "lambda_s": pick("lambda_s"),
                "C01": pick("C01"),
                "C10": pick("C10"),
                "C11": pick("C11"),
            }
        )
    return out


class FSISystem:
    """Monolithic DVP system on a TetMesh, configured like the reference."""

    def __init__(self, mesh, cfg):
        self.mesh = mesh
        self.cfg = dict(cfg)
        self.space = DVPSpace(mesh)
        space = self.space
        dt = float(cfg["dt"])
        theta = float(cfg.get("theta", 0.501))
        qd = int(cfg.get("quadrature_degree", 6))

        Jinv, detJ, vol = cell_geometry(mesh.coords, mesh.cells)
        self._geom = (Jinv, detJ, vol)

        lift = cfg.get("extrapolation", "laplace")
        lift_sub = cfg.get("extrapolation_sub_type", "constant")
        lift_coeff = 1.0
        if lift == "laplace" and lift_sub == "small_constant":
            lift_coeff = 0.01 * mesh.hmin ** 2
        self.lift = None
        if lift == "biharmonic":
            # build the correction tables FIRST: the element kernels carry
            # beta*gamma*L — the spectral surrogate of the true beta
            # L M^-1 L block — so the element-Jacobian-based preconditioners
            # see the right d-block magnitude (fem/biharmonic.py docstring).
            # beta=1 is the validated default; tunable via biharmonic_beta.
            from vasp_tpu.fem.biharmonic import build_biharmonic

            beta = float(cfg.get("biharmonic_beta", 1.0))
            self.lift = build_biharmonic(
                mesh, space,
                np.atleast_1d(cfg.get("dx_f_id", 1)).tolist(),
                sub_type=lift_sub,
                quad_degree=min(qd, 3),
                beta=beta,
            )
            lift_coeff = float(self.lift["beta_gamma"])

        blocks = []
        self.fluid_props = normalize_fluid_properties(cfg)
        self.solid_props = normalize_solid_properties(cfg)

        dofs_mixed = space.cell_dofs_mixed
        # d-dofs that carry the solid KINEMATIC equation (d-dot = v): every
        # d-dof owned by a solid cell. The fluid mesh-lifting form must not
        # contribute to those rows — the lifting "traction" otherwise
        # competes with (and at production scales, dominates) the kinematic
        # relation on the shared interface rows, decoupling the wall motion
        # from the solid physics (see CellBlock.rowmask; the reference
        # stack's equivalent is turtleFSI's delta=1e10 kinematic weight).
        solid_sel_all = [np.nonzero(mesh.cell_markers == sp["dx_s_id"])[0]
                         for sp in self.solid_props]
        if solid_sel_all and sum(len(s) for s in solid_sel_all):
            kin_d = np.unique(
                dofs_mixed[np.concatenate(solid_sel_all)][:, :30])
        else:
            kin_d = np.empty(0, np.int64)

        for fp in self.fluid_props:
            sel = np.nonzero(mesh.cell_markers == fp["dx_f_id"])[0]
            if len(sel) == 0:
                continue
            kern = make_fluid_kernel(
                rho_f=float(fp["rho_f"]),
                mu_f=float(fp["mu_f"]),
                dt=dt,
                theta=theta,
                lift=lift,
                lift_sub=lift_sub,
                lift_coeff=lift_coeff,
                quad_degree=qd,
                p_stab=float(cfg.get("p_stab", 0.0)),
            )
            rowmask = None
            if len(kin_d):
                bd = dofs_mixed[sel]
                rm = np.ones(bd.shape, np.float32)
                rm[:, :30] = (~np.isin(bd[:, :30], kin_d)).astype(np.float32)
                if (rm == 0.0).any():
                    rowmask = jnp.asarray(rm)
            blocks.append(
                CellBlock(
                    name=f"fluid_{fp['dx_f_id']}",
                    kernel=kern,
                    dofs=jnp.asarray(dofs_mixed[sel]),
                    Jinv=jnp.asarray(Jinv[sel]),
                    detJ=jnp.asarray(detJ[sel]),
                    vol=jnp.asarray(vol[sel]),
                    rowmask=rowmask,
                )
            )
        for sp in self.solid_props:
            sel = np.nonzero(mesh.cell_markers == sp["dx_s_id"])[0]
            if len(sel) == 0:
                continue
            kern = make_solid_kernel(
                props={k: v for k, v in sp.items() if v is not None},
                dt=dt,
                theta=theta,
                gravity=cfg.get("gravity"),
                quad_degree=qd,
            )
            blocks.append(
                CellBlock(
                    name=f"solid_{sp['dx_s_id']}",
                    kernel=kern,
                    dofs=jnp.asarray(dofs_mixed[sel]),
                    Jinv=jnp.asarray(Jinv[sel]),
                    detJ=jnp.asarray(detJ[sel]),
                    vol=jnp.asarray(vol[sel]),
                )
            )

        # Robin BC facet blocks (solid outer wall tissue support)
        if cfg.get("robin_bc"):
            ds_ids = np.atleast_1d(cfg["ds_s_id"]).tolist()
            k_list = cfg["k_s"]
            c_list = cfg["c_s"]
            k_list = k_list if isinstance(k_list, (list, tuple)) else [k_list] * len(ds_ids)
            c_list = c_list if isinstance(c_list, (list, tuple)) else [c_list] * len(ds_ids)
            for ds_id, k_s, c_s in zip(ds_ids, k_list, c_list):
                fv, cells, lf = mesh.exterior_facets(ds_id)
                if len(fv) == 0:
                    continue
                fv_sorted = np.sort(fv.astype(np.int64), axis=1)
                x = mesh.coords[fv_sorted]
                area2 = np.linalg.norm(
                    np.cross(x[:, 1] - x[:, 0], x[:, 2] - x[:, 0]), axis=1
                )
                p2d = space.facet_dofs_p2(fv_sorted)  # (K,6)
                d_idx = space.field_dofs("d", p2d.reshape(-1)).reshape(-1, 18)
                v_idx = space.field_dofs("v", p2d.reshape(-1)).reshape(-1, 18)
                dofs = np.concatenate([d_idx, v_idx], axis=1)  # (K,36)
                blocks.append(
                    FacetBlock(
                        name=f"robin_{ds_id}",
                        kernel=make_robin_kernel(float(k_s), float(c_s), qd),
                        dofs=jnp.asarray(dofs.astype(np.int32)),
                        area2=jnp.asarray(area2),
                    )
                )

        self.assembler = Assembler(space.ndof, blocks)

    # -------------- interface pressure load --------------
    def interface_pressure_load(self, fsi_id=None):
        """Geometry vector b with R_v += P(t) * b on the FSI interface
        (reference: src/vasp/simulations/cylinder.py:164-169)."""
        cfg = self.cfg
        fsi_id = fsi_id if fsi_id is not None else cfg.get("fsi_id", 22)
        fv, cp, lp, cm, lm = self.mesh.interior_facets(fsi_id)
        fv_sorted = np.sort(fv.astype(np.int64), axis=1)
        p2d = self.space.facet_dofs_p2(fv_sorted)
        b = interface_pressure_vector(
            self.space, fv_sorted, cp, p2d,
            quad_degree=int(cfg.get("quadrature_degree", 6)),
        )
        return jnp.asarray(b)

    # -------------- standard auto BCs --------------
    def auto_pressure_pin_bcs(self):
        """Pin pressure dofs with no equation: P1 dofs strictly interior to
        the solid (continuity only lives on the fluid)."""
        if not self.solid_props or not self.fluid_props:
            return []
        f_ids = [fp["dx_f_id"] for fp in self.fluid_props]
        s_ids = [sp["dx_s_id"] for sp in self.solid_props]
        pdofs = self.space.solid_only_pressure_dofs(f_ids, s_ids)
        if len(pdofs) == 0:
            return []
        return [DirichletBC(self.space.pressure_dofs(pdofs), 0.0)]

    def make_bcset(self, bcs, auto_pin_pressure=True):
        bcs = list(bcs)
        if auto_pin_pressure:
            bcs += self.auto_pressure_pin_bcs()
        return BCSet(self.space.ndof, bcs)

    def _resolve_device_mesh(self):
        """Device mesh for the solver, from the `n_devices` config knob
        (the reference's `mpirun -np N` analogue, docs/simulation.md:13-19).

        n_devices: int -> shard over that many devices; "auto"/"max" -> all
        visible; unset -> auto-shard only when MULTIPLE ACCELERATOR chips
        are visible (virtual CPU meshes opt in explicitly so single-chip
        CPU tests keep the single-device path)."""
        n_req = self.cfg.get("n_devices")
        if n_req in (None, "None", "", 0, 1, "1"):
            import jax

            devs = jax.devices()
            if len(devs) > 1 and devs[0].platform != "cpu":
                n_req = len(devs)
            else:
                return None
        from vasp_tpu.parallel.shard import build_device_mesh

        n = None if n_req in ("auto", "max") else int(n_req)
        if n == 1:
            return None
        return build_device_mesh(n, "dof")

    def make_solver(self, bc_set, **opts):
        cfg = self.cfg
        lin = cfg.get("linear_solver", "lu")
        if lin not in ("gmres", "iterative", "ras") \
                and cfg.get("n_devices") not in (None, "None", "", 0, 1, "1"):
            # reference configs say "mumps"; the multi-chip equivalent of a
            # parallel direct solve is the sharded banded-preconditioned
            # Newton-Krylov path (reference: mpirun -np N turtleFSI,
            # docs/simulation.md:13-19)
            print(f"n_devices={cfg['n_devices']}: running the sharded "
                  f"iterative path (linear_solver={lin!r} is single-device)")
            lin = "gmres"
        if lin in ("gmres", "iterative", "ras"):
            from vasp_tpu.fem.timestepper import (IterativeNewtonSolver,
                                                  StepOptions)

            sopts = StepOptions(
                atol=float(cfg.get("atol", 1e-7)),
                rtol=float(cfg.get("rtol", 1e-7)),
                max_it=int(cfg.get("max_it", 50)),
                lmbda=float(cfg.get("lmbda", 1.0)),
                # within-step Jacobian reuse on the ITERATIVE path
                # (StepOptions.recompute): its own knob, deliberately NOT
                # the problem configs' `recompute` — the reference default
                # cadences (20-30) assume MUMPS-grade directions, while
                # chord Newton on the Krylov path diverges on load-jump
                # steps (CLAUDE.md); opt in with jac_recompute=2-3 on
                # smooth production runs
                recompute=int(cfg.get("jac_recompute", 1)),
                gmres_tol=float(cfg.get("gmres_tol", 1e-6)),
                gmres_restart=int(cfg.get("gmres_restart", 60)),
                gmres_maxiter=int(cfg.get("gmres_maxiter", 300)),
                jac_chunk=int(cfg.get("jac_chunk", 8192)),
                overlap=int(cfg.get("ras_overlap", 2)),
                jac_dtype=str(cfg.get("jac_dtype", "f32")),
                krylov_dtype=cfg.get("krylov_dtype"),
                residual_dtype=cfg.get("residual_dtype"),
                precond=str(cfg.get("precond", "banded")),
                predictor=str(cfg.get("predictor", "none")),
                endgame_factor=float(cfg.get("endgame_factor", 30.0)),
                # cross-step anchor chain (opt-in; residual_dtype="mixed"
                # supersedes it — see StepOptions.chain_anchor)
                chain_anchor=bool(cfg.get("chain_anchor", False)),
                chain_reanchor=int(cfg.get("chain_reanchor", 1)),
            )
            import dataclasses as _dc
            known = {f.name for f in _dc.fields(sopts)}
            sopts = _dc.replace(sopts,
                                **{k: v for k, v in opts.items()
                                   if k in known})
            return IterativeNewtonSolver(
                self, bc_set, sopts,
                recompute_tstep=int(cfg.get("recompute_tstep", 20)),
                verbose=bool(cfg.get("verbose", True)),
                raise_on_fail=bool(cfg.get("raise_on_fail", True)),
                device_mesh=self._resolve_device_mesh(),
            )
        options = NewtonOptions(
            atol=float(cfg.get("atol", 1e-7)),
            rtol=float(cfg.get("rtol", 1e-7)),
            max_it=int(cfg.get("max_it", 50)),
            lmbda=float(cfg.get("lmbda", 1.0)),
            recompute=int(cfg.get("recompute", 5)),
            recompute_tstep=int(cfg.get("recompute_tstep", 1)),
            # reference configs say "mumps": our host direct-LU path is the
            # drop-in equivalent (reference: offset_stenosis.py:44)
            linear_solver={"mumps": "lu"}.get(
                cfg.get("linear_solver", "lu"), cfg.get("linear_solver", "lu")
            ),
            verbose=bool(cfg.get("verbose", True)),
            raise_on_fail=bool(cfg.get("raise_on_fail", True)),
        )
        for k, v in opts.items():
            setattr(options, k, v)
        return NewtonSolver(self.assembler, bc_set, options,
                            lift=self.lift)

    def zero_state(self):
        return jnp.zeros(self.space.ndof)
