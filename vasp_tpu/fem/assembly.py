"""Block-based residual/Jacobian assembly: gather -> vmapped element kernel
-> scatter-add.

This replaces the reference stack's FFC-generated C++ element kernels +
DOLFIN assembly loops + PETSc matrices (SURVEY.md §2.2): here the "assembled
Jacobian" is the batched tensor of element matrices (Nc, 64, 64) produced by
jax.jacfwd of the element residual — matrix-free matvecs are batched small
matmuls (MXU-friendly), and Jacobian reuse (the reference's recompute /
recompute_tstep knobs, reference: src/vasp/simulations/offset_stenosis.py:47-48)
is caching this tensor.
"""
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def chunked_vmap(fn, args, chunk=None):
    """vmap fn over the leading axis, optionally in fixed-size chunks via
    lax.map to bound peak memory (jacfwd intermediates scale with batch x
    tangents x quadrature)."""
    K = args[0].shape[0]
    if chunk is None or K <= chunk:
        return jax.vmap(fn)(*args)
    pad = (-K) % chunk
    if pad:
        args = [jnp.concatenate([a, a[:pad]], axis=0) for a in args]
    nchunks = (K + pad) // chunk
    reshaped = tuple(a.reshape((nchunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(lambda xs: jax.vmap(fn)(*xs), reshaped)
    out = jax.tree.map(
        lambda o: o.reshape((nchunks * chunk,) + o.shape[2:])[:K], out
    )
    return out


def cell_geometry(coords, cells):
    """Affine map data per cell: (Jinv (Nc,3,3), detJ (Nc,), vol (Nc,)).

    x(xi) = x0 + A xi with A[:,j] = x_{j+1} - x_0; physical gradients are
    dN_ref @ Jinv with Jinv = A^{-1}."""
    xe = coords[cells]  # (Nc,4,3)
    A = np.stack([xe[:, 1] - xe[:, 0], xe[:, 2] - xe[:, 0], xe[:, 3] - xe[:, 0]],
                 axis=2)  # (Nc,3,3), columns are edge vectors
    detA = np.linalg.det(A)
    Jinv = np.linalg.inv(A)
    detJ = np.abs(detA)
    return Jinv, detJ, detJ / 6.0


@dataclass
class CellBlock:
    """A group of cells sharing one element kernel (one subdomain/material).

    rowmask (optional, (K, nloc) in {0,1}): zeroes selected LOCAL RESIDUAL
    ROWS of this block before scatter. Used to remove the fluid
    mesh-lifting equation from d-rows that carry the solid kinematic
    equation (d-dofs owned by any solid cell): the lifting operator's
    interface "traction" otherwise COMPETES with the kinematic relation
    (d-dot = v) on the shared rows — the kinematic term's scale
    rho_s/dt*h^3 is ~1e3x SMALLER than the Laplace lifting's h at
    production resolutions, so the wall displacement decouples from the
    solid physics (measured: a pressurized FSI tube converged, exactly,
    to HALF the Lame displacement with the fluid spuriously holding the
    other half — scripts/diag_lame_linear.py). The reference stack
    instead weights the kinematic form by delta=1e10 (turtleFSI
    modules/solid.py); masking is that limit delta -> inf without
    poisoning the residual norm or the f32 paths with a 10-decade scale."""

    name: str
    kernel: Callable  # (u(64,), u0(64,), Jinv(3,3), detJ(), vol()) -> (64,)
    dofs: jnp.ndarray  # (K,64) global indices into U
    Jinv: jnp.ndarray  # (K,3,3)
    detJ: jnp.ndarray  # (K,)
    vol: jnp.ndarray  # (K,)
    rowmask: Optional[jnp.ndarray] = None  # (K,64) 0/1 residual-row mask

    def gather(self, U):
        return U[self.dofs]

    def residual_local(self, U, U0, dtype=None):
        args = [U[self.dofs], U0[self.dofs], self.Jinv, self.detJ, self.vol]
        if dtype is not None:
            args = [a.astype(dtype) for a in args]
        r = jax.vmap(self.kernel)(*args)
        if self.rowmask is not None:
            r = r * self.rowmask.astype(r.dtype)
        return r

    def jacobian_local(self, U, U0, chunk=None, dtype=None):
        """dtype: compute jacfwd natively in this precision (the kernels are
        dtype-polymorphic). f32 halves the jacfwd temp HBM — the round-1
        full-size OOM was f64 tangent intermediates — and runs the MXU at
        full rate; residuals stay f64 (inexact Newton)."""
        jac = jax.jacfwd(self.kernel, argnums=0)
        args = [U[self.dofs], U0[self.dofs], self.Jinv, self.detJ, self.vol]
        if dtype is not None:
            args = [a.astype(dtype) for a in args]
        A = chunked_vmap(jac, args, chunk)
        if self.rowmask is not None:
            A = A * self.rowmask.astype(A.dtype)[:, :, None]
        return A


@dataclass
class FacetBlock:
    """A group of boundary triangles sharing one facet kernel (e.g. Robin)."""

    name: str
    kernel: Callable  # (u(nloc,), area2()) -> (nloc,)
    dofs: jnp.ndarray  # (K,nloc)
    area2: jnp.ndarray  # (K,)

    def residual_local(self, U, U0, dtype=None):
        args = [U[self.dofs], self.area2]
        if dtype is not None:
            args = [a.astype(dtype) for a in args]
        return jax.vmap(self.kernel, in_axes=(0, 0))(*args)

    def jacobian_local(self, U, U0, chunk=None, dtype=None):
        jac = jax.jacfwd(self.kernel, argnums=0)
        args = [U[self.dofs], self.area2]
        if dtype is not None:
            args = [a.astype(dtype) for a in args]
        return chunked_vmap(jac, args, chunk)


def blocks_to_arrays(blocks):
    """Split blocks into (static skeleton, array pytree). Passing the array
    pytree as jit ARGUMENTS (instead of closing over it) keeps megabytes of
    dof/geometry tables out of the HLO constant pool — embedded constants
    at 20k-cell scale made XLA compiles pathologically slow."""
    skeleton = []
    arrays = []
    for b in blocks:
        if isinstance(b, CellBlock):
            skeleton.append(("cell", b.name, b.kernel))
            data = dict(dofs=b.dofs, Jinv=b.Jinv, detJ=b.detJ, vol=b.vol)
            if b.rowmask is not None:
                data["rowmask"] = b.rowmask
            arrays.append(data)
        else:
            skeleton.append(("facet", b.name, b.kernel))
            arrays.append(dict(dofs=b.dofs, area2=b.area2))
    return skeleton, arrays


def arrays_to_blocks(skeleton, arrays):
    blocks = []
    for (kind, name, kernel), data in zip(skeleton, arrays):
        if kind == "cell":
            blocks.append(CellBlock(name, kernel, data["dofs"], data["Jinv"],
                                    data["detJ"], data["vol"],
                                    rowmask=data.get("rowmask")))
        else:
            blocks.append(FacetBlock(name, kernel, data["dofs"],
                                     data["area2"]))
    return blocks


def build_scatter_plan(blocks, ndof):
    """Sorted segment-sum structure for assembly scatters.

    TPU scatter-add over random indices is the measured hot spot of f64
    residual assembly (164 ms at 4k cells on v5e); a static sort of all
    (element, local-slot) contributions by global dof turns it into
    jax.ops.segment_sum with indices_are_sorted=True — contiguous,
    vectorized accumulation. The plan depends only on the dof tables."""
    all_dofs = np.concatenate(
        [np.asarray(b.dofs).reshape(-1) for b in blocks])
    order = np.argsort(all_dofs, kind="stable")
    sorted_dofs = all_dofs[order]
    # segment boundaries for the cumsum-diff reduction: R[i] =
    # cs[ends[i]] - cs[starts[i]] with cs the exclusive-prefix cumsum of
    # the sorted contributions. On TPU the scatter inside segment_sum is
    # the hot spot (measured 102 ms of the 150 ms f64 accumulate at 185k
    # dofs); cumsum + two boundary gathers is 35 ms end-to-end.
    starts = np.searchsorted(sorted_dofs, np.arange(ndof), side="left")
    ends = np.searchsorted(sorted_dofs, np.arange(ndof), side="right")
    return dict(order=jnp.asarray(order.astype(np.int32)),
                segids=jnp.asarray(sorted_dofs.astype(np.int32)),
                starts=jnp.asarray(starts.astype(np.int32)),
                ends=jnp.asarray(ends.astype(np.int32)))


class Assembler:
    """Residual / element-Jacobian / matvec over a list of blocks.

    scatter_plan (optional, from build_scatter_plan): accumulate via sorted
    segment-sum instead of scatter-add — the TPU production path."""

    def __init__(self, ndof: int, blocks, scatter_plan=None):
        self.ndof = ndof
        self.blocks = list(blocks)
        self.scatter_plan = scatter_plan

    def _accumulate(self, parts, dtype):
        """parts: per-block flat local contribution vectors (block order
        must match self.blocks).

        f64 path: prefix-cumsum over the sorted contributions + two
        boundary gathers (R[i] = cs[ends_i] - cs[starts_i]) — the TPU
        scatter inside segment_sum was the measured accumulate hot spot
        (102 of 150 ms at 185k dofs; cumsum-diff is 35 ms). The cumsum's
        running-sum magnitude bounds the boundary-diff error at
        ~eps64 * |running sum| (~1e-11 relative at 1.3M contributions) —
        fine for f64, NOT for f32, so the f32 accumulate keeps the sorted
        segment_sum."""
        flat = jnp.concatenate([p.reshape(-1).astype(dtype) for p in parts])
        plan = self.scatter_plan
        if plan is None:  # no precomputed plan: plain scatter-add
            R = jnp.zeros(self.ndof, dtype=dtype)
            dofs = jnp.concatenate(
                [b.dofs.reshape(-1) for b in self.blocks])
            return R.at[dofs].add(flat)
        if flat.dtype == jnp.float64 and "starts" in plan:
            s = flat[plan["order"]]
            cs = jnp.concatenate([jnp.zeros(1, s.dtype), jnp.cumsum(s)])
            return cs[plan["ends"]] - cs[plan["starts"]]
        return jax.ops.segment_sum(
            flat[plan["order"]], plan["segids"], num_segments=self.ndof,
            indices_are_sorted=True)

    def residual(self, U, U0, dtype=None):
        """dtype: compute the ELEMENT work in this precision (f32 = full
        MXU rate — f64 is emulated on TPU and was the step's dominant cost)
        while ACCUMULATING in U.dtype (f64). Per-dof noise floor is
        ~sqrt(n_contrib) * eps_f32 * term_scale ~ 1e-7 — legitimate for
        atol >= 1e-6 configurations; keep None (f64) for tighter
        tolerances.

        dtype="mixed": f64 element work ONLY on the non-fluid blocks
        (solid + facet terms), f32 on the fluid. Measured on the bench
        tube (scripts/diag_mixed_residual.py): the f32 cancellation noise
        lives ENTIRELY in the stiff solid stress terms (E ~ 1e6) — all-f32
        error l2 2.7e-6 vs mixed 5.1e-10 against the full-f64 residual —
        so the mixed evaluation is f64-grade at ~25-30% of the emulated
        f64 cost (the solid is ~1/4 of the cells)."""
        if dtype == "mixed":
            per_block = [jnp.float32 if b.name.startswith("fluid")
                         else None for b in self.blocks]
        else:
            per_block = [dtype] * len(self.blocks)
        if self.scatter_plan is not None:
            parts = [b.residual_local(U, U0, dtype=dt)
                     for b, dt in zip(self.blocks, per_block)]
            return self._accumulate(parts, U.dtype)
        R = jnp.zeros(self.ndof, dtype=U.dtype)
        for b, dt in zip(self.blocks, per_block):
            r = b.residual_local(U, U0, dtype=dt)
            R = R.at[b.dofs.reshape(-1)].add(r.reshape(-1).astype(U.dtype))
        return R

    def residual_delta(self, U, A, U0, order=3):
        """R(U) - R(A) as the order-`order` Taylor polynomial of each
        element kernel along du = U - A, element work in f32, f64
        accumulation.

        The TPU endgame fast path: the emulated-f64 element evaluation is
        ~25x the f32 one (777 vs 31 ms at 185k dofs), so Newton's endgame
        anchors ONE exact f64 residual per dispatch and evaluates the
        later iterations as R64(A) + residual_delta(U, A, U0). The delta
        coefficients carry magnitudes ~|J_e||du|, so their f32 roundoff
        (~eps32 |J_e||du|) and the Taylor truncation (~T (|du|/|u|)^4)
        both vanish as Newton contracts du -> 0 — measured 1e-8 absolute
        on the first endgame step of a real trajectory, 1e-11 after
        (scripts/diag_jet_delta2.py), versus atol 1e-6 targets."""
        from jax.experimental import jet

        du32 = (U - A).astype(jnp.float32)
        parts = []
        for b in self.blocks:
            if isinstance(b, CellBlock):
                prim = (A[b.dofs].astype(jnp.float32),
                        U0[b.dofs].astype(jnp.float32),
                        b.Jinv.astype(jnp.float32),
                        b.detJ.astype(jnp.float32),
                        b.vol.astype(jnp.float32))
                lead = du32[b.dofs]
                fn = jax.vmap(b.kernel)
            else:
                prim = (A[b.dofs].astype(jnp.float32),
                        b.area2.astype(jnp.float32))
                lead = du32[b.dofs]
                fn = jax.vmap(b.kernel, in_axes=(0, 0))
            zeros = [jnp.zeros_like(p) for p in prim]
            series = tuple(
                [lead if i == 0 else zeros[i]]
                + [zeros[i]] * (order - 1)
                for i in range(len(prim))
            )
            _, out_series = jet.jet(fn, prim, series)
            part = sum(out_series)
            if getattr(b, "rowmask", None) is not None:
                part = part * b.rowmask.astype(part.dtype)
            parts.append(part)
        return self._accumulate(parts, jnp.float64)

    def residual_delta2(self, U, A, U0new, U0old, order=3):
        """R(U; U0new) - R(A; U0old): the two-argument generalization of
        residual_delta, perturbing BOTH the state (du = U - A) and the
        previous-timestep state (du0 = U0new - U0old) of each element
        kernel. Element work in f32 jets, f64 accumulation.

        This is the cross-STEP anchor-chain primitive: at the start of
        timestep n+1 the exact-residual anchor R(U*_n; U*_{n-1}) carried
        from step n is converted into this step's anchor
        R(U1_{n+1}; U*_n) by ONE jet evaluation instead of a raw
        emulated-f64 element pass (~25x the f32 cost on TPU) — see
        IterativeStepper's anchor chain. Facet kernels take no u0
        argument (their residual is u0-independent by construction), so
        only the du lead applies there."""
        from jax.experimental import jet

        du32 = (U - A).astype(jnp.float32)
        du032 = (U0new - U0old).astype(jnp.float32)
        parts = []
        for b in self.blocks:
            if isinstance(b, CellBlock):
                prim = (A[b.dofs].astype(jnp.float32),
                        U0old[b.dofs].astype(jnp.float32),
                        b.Jinv.astype(jnp.float32),
                        b.detJ.astype(jnp.float32),
                        b.vol.astype(jnp.float32))
                leads = {0: du32[b.dofs], 1: du032[b.dofs]}
                fn = jax.vmap(b.kernel)
            else:
                prim = (A[b.dofs].astype(jnp.float32),
                        b.area2.astype(jnp.float32))
                leads = {0: du32[b.dofs]}
                fn = jax.vmap(b.kernel, in_axes=(0, 0))
            zeros = [jnp.zeros_like(p) for p in prim]
            series = tuple(
                [leads.get(i, zeros[i])] + [zeros[i]] * (order - 1)
                for i in range(len(prim))
            )
            _, out_series = jet.jet(fn, prim, series)
            part = sum(out_series)
            if getattr(b, "rowmask", None) is not None:
                part = part * b.rowmask.astype(part.dtype)
            parts.append(part)
        return self._accumulate(parts, jnp.float64)

    def element_jacobians(self, U, U0, chunk=None, dtype=None):
        """Batched element Jacobians; dtype=f32 computes the jacfwd natively
        in f32 (full MXU speed, half the temp HBM) — accurate enough for
        inexact-Newton: residuals stay f64."""
        return [b.jacobian_local(U, U0, chunk=chunk, dtype=dtype)
                for b in self.blocks]

    @staticmethod
    def _elem_gemv(A, xe):
        """Batched element matvec as a VPU multiply+reduce.

        einsum lowers to a batched (nloc x nloc)@(nloc,) dot_general whose
        tiny contraction maps badly onto the MXU — and under the global
        jax_default_matmul_precision=highest every f32 dot pays 3 bf16
        passes. The broadcast-multiply + sum runs on the VPU in TRUE f32:
        measured 3.11 -> 1.62 ms standalone at bench size (20832 x 64 x 64,
        exact vs the bf16-pass einsum's 1e-1 max error), ~4x the HBM
        traffic bound."""
        return jnp.sum(A * xe[:, None, :], axis=2)

    def matvec(self, jacs, x):
        """y = J x using cached element Jacobians. Runs in the Jacobians'
        dtype and casts back to x.dtype.

        f32 accumulation goes through the PLAIN scatter-add even when a
        scatter plan exists: measured at bench size (185k dofs, v5e) the
        f32 scatter is 23.4 ms vs the sorted segment_sum's 33.8 ms with
        bitwise-identical output (scripts/diag_matvec2.py) — the plan's
        sort-order gather costs more than the f32 scatter it avoids. The
        plan stays essential for the F64 residual accumulate (emulated-f64
        scatter was 102 of 150 ms there)."""
        acc_f64 = (x.dtype == jnp.float64
                   or any(A.dtype == jnp.float64 for A in jacs))
        if self.scatter_plan is not None and acc_f64:
            parts = []
            for b, A in zip(self.blocks, jacs):
                xe = x[b.dofs].astype(A.dtype)
                parts.append(self._elem_gemv(A, xe))
            return self._accumulate(parts, x.dtype)
        y = jnp.zeros(self.ndof, dtype=x.dtype)
        for b, A in zip(self.blocks, jacs):
            xe = x[b.dofs].astype(A.dtype)  # (K,nloc)
            ye = self._elem_gemv(A, xe)
            y = y.at[b.dofs.reshape(-1)].add(ye.reshape(-1).astype(y.dtype))
        return y

    def diagonal(self, jacs):
        diag = jnp.zeros(self.ndof)
        for b, A in zip(self.blocks, jacs):
            d = jnp.diagonal(A, axis1=1, axis2=2)
            diag = diag.at[b.dofs.reshape(-1)].add(d.reshape(-1))
        return diag

    # ---------------- host-side sparse export (direct solver path) ----------
    def to_csr(self, jacs, bc_mask: Optional[np.ndarray] = None):
        """Assemble a scipy CSR matrix from element Jacobians.

        bc_mask: boolean (ndof,) — constrained rows are replaced by identity
        (and their columns zeroed), the standard strong Dirichlet treatment."""
        import scipy.sparse as sp

        rows, cols, vals = [], [], []
        for b, A in zip(self.blocks, jacs):
            dofs = np.asarray(b.dofs)
            K, nloc = dofs.shape
            r = np.repeat(dofs, nloc, axis=1).reshape(-1)
            c = np.tile(dofs, (1, nloc)).reshape(-1)
            rows.append(r)
            cols.append(c)
            vals.append(np.asarray(A).reshape(-1))
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        vals = np.concatenate(vals)
        if bc_mask is not None:
            keep = ~(bc_mask[rows] | bc_mask[cols])
            rows, cols, vals = rows[keep], cols[keep], vals[keep]
            bc_dofs = np.nonzero(bc_mask)[0]
            rows = np.concatenate([rows, bc_dofs])
            cols = np.concatenate([cols, bc_dofs])
            vals = np.concatenate([vals, np.ones(len(bc_dofs))])
        M = sp.coo_matrix((vals, (rows, cols)), shape=(self.ndof, self.ndof))
        return M.tocsr()
