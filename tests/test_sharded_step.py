"""Multi-chip sharded step vs single-chip reference (8 virtual CPU devices).

Validates the domain-decomposed SPMD path (SURVEY.md §2.4 TPU plan): block
arrays sharded over a 1-D device mesh, replicated state, psum-combined
assembly. The sharded Newton step must reproduce the single-chip jitted
step to solver tolerance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vasp_tpu.bcs.waveforms import CosineRamp
from vasp_tpu.fem.dirichlet import DirichletBC
from vasp_tpu.fem.timestepper import StepOptions, make_step_fn
from vasp_tpu.mesh.generate import fsi_tube_mesh
from vasp_tpu.parallel.shard import build_device_mesh, make_sharded_step
from vasp_tpu.run.system import FSISystem


@pytest.fixture(scope="module")
def small_system():
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
    )
    sys_ = FSISystem(mesh, cfg)
    space = sys_.space
    bcs = []
    for marker in (2, 3, 11):
        p2d = space.p2_dofs_on_facets(marker)
        bcs.append(DirichletBC(space.field_dofs("d", p2d), 0.0))
    for marker in (2, 11):
        p2d = space.p2_dofs_on_facets(marker)
        bcs.append(DirichletBC(space.field_dofs("v", p2d), 0.0))
    bc_set = sys_.make_bcset(bcs)
    # first-step physical load (the reference always ramps from 0;
    # an instantaneous large load makes Newton diverge for ANY exact
    # solver -- verified against the direct-LU path)
    load = 150.0 * sys_.interface_pressure_load()
    return sys_, bc_set, load


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_chip(small_system):
    sys_, bc_set, load = small_system
    opts = StepOptions(atol=1e-10, rtol=1e-10, max_it=6, gmres_tol=1e-9,
                       gmres_restart=120, gmres_maxiter=1200)

    single = jax.jit(make_step_fn(
        sys_.assembler, bc_set.mask, opts,
        layout=(sys_.space.n_p2, sys_.space.off_p),
    ))
    U0 = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    U1, stats1 = single(U0, bcv, load)
    assert np.isfinite(float(stats1["residual"]))
    assert int(stats1["iterations"]) >= 1
    # the step must actually converge (raw-residual tolerances)
    assert float(stats1["residual"]) < 1e-9 * max(1.0, float(stats1["r0"]))

    step8, mesh8 = make_sharded_step(sys_, bc_set.mask, opts,
                                     mesh=build_device_mesh(8))
    U1s, stats8 = step8(U0, bcv, load)

    a, b = np.asarray(U1), np.asarray(U1s)
    scale = np.abs(a).max()
    assert scale > 0
    assert np.allclose(a, b, atol=1e-6 * scale + 1e-14), (
        np.abs(a - b).max(), scale
    )


def test_sharded_operators_match(small_system):
    """The decisive SPMD correctness check: sharded residual assembly and
    element-Jacobian matvec must reproduce the single-chip operators to
    roundoff (the halo contributions meet in the psum)."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vasp_tpu.parallel.shard import (
        _rebuild_assembler,
        shard_system_blocks,
    )

    sys_, bc_set, load = small_system
    ndof = sys_.assembler.ndof
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal(ndof) * 1e-4)
    U0 = jnp.asarray(rng.standard_normal(ndof) * 1e-4)
    x = jnp.asarray(rng.standard_normal(ndof))

    R_single = np.asarray(sys_.assembler.residual(U, U0))
    jacs = sys_.assembler.element_jacobians(U, U0)
    y_single = np.asarray(sys_.assembler.matvec(jacs, x))

    jmesh = build_device_mesh(8)
    skeleton, arrays = shard_system_blocks(sys_, 8, pad_dof=ndof)
    blocks_sharded = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a),
                                 NamedSharding(jmesh, P("cells"))),
        arrays,
    )
    red = partial(jax.lax.psum, axis_name="cells")

    def inner(Up, U0p, xp, blocks_local):
        asm = _rebuild_assembler(skeleton, blocks_local, ndof + 1)
        R = red(asm.residual(Up, U0p))
        jl = asm.element_jacobians(Up, U0p)
        y = red(asm.matvec(jl, xp))
        return R, y

    sh = jax.jit(shard_map(
        inner, mesh=jmesh,
        in_specs=(P(), P(), P(),
                  jax.tree.map(lambda _: P("cells"), arrays)),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    z = jnp.zeros(1)
    R_sh, y_sh = sh(jnp.concatenate([U, z]), jnp.concatenate([U0, z]),
                    jnp.concatenate([x, z]), blocks_sharded)
    R_sh, y_sh = np.asarray(R_sh), np.asarray(y_sh)
    assert abs(R_sh[ndof]) < 1e-12
    assert np.allclose(R_sh[:ndof], R_single,
                       atol=1e-10 * max(1.0, np.abs(R_single).max()))
    assert np.allclose(y_sh[:ndof], y_single,
                       atol=1e-9 * max(1.0, np.abs(y_single).max()))


def test_sharded_step_inflates(small_system):
    """Physical sanity on the sharded path."""
    sys_, bc_set, load = small_system
    opts = StepOptions(atol=1e-8, rtol=1e-8, max_it=6, gmres_tol=1e-7,
                       gmres_restart=120, gmres_maxiter=1200)
    step8, _ = make_sharded_step(sys_, bc_set.mask, opts,
                                 mesh=build_device_mesh(8))
    U = sys_.zero_state()
    bcv = jnp.asarray(bc_set.values_at(0.001))
    U0 = U
    for _ in range(2):
        U_new, _ = step8(U, bcv, load)
        U0, U = U, U_new
    d, v, p = sys_.space.split(U)
    iface = sys_.space.p2_dofs_on_facets(22)
    xy = sys_.space.p2_coords[iface][:, :2]
    rhat = xy / np.linalg.norm(xy, axis=1, keepdims=True)
    dr = np.einsum("ki,ki->k", np.asarray(d)[iface][:, :2], rhat)
    assert dr.mean() > 0
