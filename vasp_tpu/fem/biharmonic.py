"""Biharmonic mesh lifting (discrete mixed form, matrix-free).

The reference vocabulary lists extrapolation="biharmonic" with sub-types
bc1/bc2 (reference: src/vasp/simulations/cylinder.py:65-66 and
predeform.py:77-78; the solver itself is turtleFSI's). The continuous
operator is the clamped biharmonic extension Delta^2 d = 0 on the fluid
domain, solved in turtleFSI as a mixed second-order system with an
auxiliary field w = -Delta d.

TPU-native design: instead of enlarging the monolithic DVP unknown with w,
the auxiliary field is ELIMINATED discretely with a lumped P2 mass matrix:

    R_d(d) = L M_l^{-1} L d        L = P2 vector Laplacian on fluid cells,
                                   M_l = lumped (row-sum) P2 mass

which is the standard discrete biharmonic (two stiffness applications, one
diagonal solve) — pure gather/einsum/segment-sum, linear in d, so the
Newton matvec applies the same operator.

The equation is SCALED by beta = hmin^2: the lifting extension d is
invariant under scaling of its (fictitious) equation, but the spurious
traction the lifting rows add at the FSI interface is not — unscaled,
L M_l^{-1} L rows are ~1/h^2 stiffer than Laplace rows, comparable to the
physical solid stiffness (measured: it flipped the sign of the wall
displacement on the test tube). beta = h^2 restores Laplace-level
contamination while keeping the biharmonic interior character. The element kernels keep a plain
Laplace contribution as the FIRST L application AND as the preconditioner
surrogate (Ruiz scaling and the banded/RAS/LU preconditioners see L, the
well-conditioned square root of the true d-block); this module supplies the
CORRECTION term L(M_l^{-1} L d) - L d so the assembled residual equals the
discrete biharmonic exactly.

Sub-types (auxiliary-field boundary treatment):
- "bc1": w SOFT-clamped (mass-penalized, x1e-4) at the inlet/outlet endcap
  nodes — flatter mesh motion at the caps. A HARD clamp (eliminating w
  rows) is structurally rank-deficient: discrete-harmonic extensions
  (L d = 0 at the surviving rows) become null modes — measured as
  |dx| ~ 5e3 Newton blowups with the residual stuck at 1e-4. The penalty
  form w = (M + gamma M_caps)^{-1} L d is the clamped limit with bounded
  conditioning and an empty null space.
- "bc2": w natural (no clamp) — softer response near boundaries; the
  operator's null space is constants only, removed by the d Dirichlet
  rows.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vasp_tpu.fem.quadrature import tet_quadrature
from vasp_tpu.fem.shape import p2_tet


def build_biharmonic(mesh, space, fluid_ids, sub_type="bc1",
                     quad_degree=2, clamp_ids=(2, 3), beta=None):
    """Precompute the arrays for the correction term. Returns a dict of
    device arrays (travels as jit ARGUMENTS through the stepper's block
    pytree — never baked as HLO constants)."""
    from vasp_tpu.fem.assembly import cell_geometry

    fluid_ids = np.atleast_1d(fluid_ids)
    sel = np.nonzero(np.isin(mesh.cell_markers, fluid_ids))[0]
    # P2 nodes owned by NON-fluid (solid) cells carry the solid kinematic
    # equation — the lifting correction must not write to their d-rows
    # (same rule as CellBlock.rowmask; see fem/assembly.py)
    solid_sel = np.nonzero(~np.isin(mesh.cell_markers, fluid_ids))[0]
    cells = mesh.cells[sel]
    Jinv, detJ, _ = cell_geometry(mesh.coords, mesh.cells)
    Jinv, detJ = Jinv[sel], detJ[sel]

    pts, wq = tet_quadrature(quad_degree)
    N2, dN2 = p2_tet(pts)  # (nq,10), (nq,10,3)
    # per-cell P2 stiffness Ke[a,b] = sum_q wq detJ (dNa J^-1)·(dNb J^-1)
    G = np.einsum("qaj,kji->kqai", dN2, Jinv)  # (K,nq,10,3)
    Ke = np.einsum("q,k,kqai,kqbi->kab", wq, detJ, G, G)  # (K,10,10)
    # lumped P2 mass over fluid cells: m_a = sum_e sum_q wq detJ N_a
    me = np.einsum("q,k,qa->ka", wq, detJ, N2)  # (K,10)
    p2dofs = space.cell_dofs_p2[sel]  # (K,10) P2 node ids
    n_p2 = space.n_p2
    m = np.zeros(n_p2)
    np.add.at(m, p2dofs.reshape(-1), me.reshape(-1))
    in_fluid = m > 0
    m = np.where(in_fluid, m, 1.0)

    # w soft-clamp (bc1): endcap (inlet/outlet) nodes only, via mass
    # penalty — see module docstring for why a hard clamp is singular
    minv = 1.0 / m
    if sub_type != "bc2":
        clamp = np.zeros(n_p2, bool)
        for mk in clamp_ids:
            fv, _, _ = mesh.exterior_facets(int(mk))
            if len(fv) == 0:
                continue
            fvs = np.sort(fv.astype(np.int64), axis=1)
            p2d = space.facet_dofs_p2(fvs)
            clamp[np.unique(p2d)] = True
        clamp &= in_fluid
        minv = np.where(clamp, 1e-4 * minv, minv)

    if beta is None:
        beta = float(mesh.hmin) ** 2
    # spectral surrogate scale: L M^-1 L ~ gamma L with gamma ~ diag(L)/m.
    # The element kernels carry beta*gamma*L so the banded/RAS/node-block
    # preconditioners (built from element Jacobians only — the 2-ring
    # correction stencil does not fit their patterns) see a d-block of the
    # RIGHT MAGNITUDE; without this the preconditioner d-rows are ~1/h^2
    # off and GMRES makes zero progress (measured).
    diagL = np.zeros(n_p2)
    np.add.at(diagL, p2dofs.reshape(-1),
              np.einsum("kaa->ka", Ke).reshape(-1))
    gamma = float(np.median((diagL * minv)[in_fluid]))
    dmask = np.ones(n_p2, np.float64)
    if len(solid_sel):
        dmask[np.unique(space.cell_dofs_p2[solid_sel])] = 0.0
    # NOTE: arrays only (valid jit-argument pytree; sizes derived from
    # shapes at trace time)
    return dict(
        Ke=jnp.asarray(Ke),
        p2dofs=jnp.asarray(p2dofs.astype(np.int32)),
        minv=jnp.asarray(minv),
        wfree=jnp.asarray(in_fluid),
        dmask=jnp.asarray(dmask),
        beta=jnp.asarray(float(beta)),
        beta_gamma=jnp.asarray(float(beta) * gamma),
    )


def _L_apply(lift, dvec):
    """y = L d, d as (n_p2, 3)."""
    de = dvec[lift["p2dofs"]]  # (K,10,3)
    ye = jnp.einsum("kab,kbi->kai", lift["Ke"].astype(dvec.dtype), de)
    y = jnp.zeros_like(dvec)
    return y.at[lift["p2dofs"].reshape(-1)].add(ye.reshape(-1, 3))


def correction_apply(lift, U):
    """R_extra over the full mixed vector: alpha(L M^-1 L - L) on d rows.

    Linear in U — serves as both residual contribution and Jacobian
    matvec."""
    n_d = 3 * lift["minv"].shape[0]
    d = U[:n_d].reshape(-1, 3)
    Ld = _L_apply(lift, d)
    w = Ld * lift["minv"].astype(d.dtype)[:, None]
    w = jnp.where(lift["wfree"][:, None], w, jnp.zeros((), d.dtype))
    # total d-block = beta L M^-1 L; element kernels carry beta*gamma*L
    rd = (lift["beta"].astype(d.dtype) * _L_apply(lift, w)
          - lift["beta_gamma"].astype(d.dtype) * Ld)
    # kinematic-row mask: no lifting contribution on solid-owned d-rows
    rd = rd * lift["dmask"].astype(d.dtype)[:, None]
    out = jnp.zeros_like(U)
    return out.at[:n_d].set(rd.reshape(-1).astype(U.dtype))


def correction_csr(lift, ndof):
    """Host scipy CSR of the correction (for the direct-LU path)."""
    import scipy.sparse as sp

    n_p2 = lift["minv"].shape[0]
    Ke = np.asarray(lift["Ke"])
    dofs = np.asarray(lift["p2dofs"])
    K, nloc = dofs.shape
    rows = np.repeat(dofs, nloc, axis=1).reshape(-1)
    cols = np.tile(dofs, (1, nloc)).reshape(-1)
    Ls = sp.coo_matrix((Ke.reshape(-1), (rows, cols)),
                       shape=(n_p2, n_p2)).tocsr()
    winv = np.asarray(lift["minv"]) * np.asarray(lift["wfree"])
    C = (float(lift["beta"]) * (Ls @ sp.diags(winv) @ Ls)
         - float(lift["beta_gamma"]) * Ls)
    # kinematic-row mask (same rule as correction_apply)
    C = (sp.diags(np.asarray(lift["dmask"])) @ C).tocoo()
    # expand scalar node operator to the 3 interleaved d components
    # (d dof = 3*node + comp)
    r = (3 * C.row[:, None] + np.arange(3)[None, :]).reshape(-1)
    c = (3 * C.col[:, None] + np.arange(3)[None, :]).reshape(-1)
    v = np.repeat(C.data, 3)
    return sp.coo_matrix((v, (r, c)), shape=(ndof, ndof)).tocsr()
