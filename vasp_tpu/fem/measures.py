"""Boundary measures, point evaluation, and DG projections.

Covers the reference's runtime observables machinery:
- inlet area / barycenter / normal via facet integrals
  (reference: src/vasp/simulations/cylinder.py:99-104, 172-177),
- flow rate  = |int v.n ds| (reference: simulation_common.py:278-280),
- DG0 local projection (|v| field, J(d) min-Jacobian guard,
  reference: simulation_common.py:225-346),
- parallel-safe probe evaluation (peval,
  reference: simulation_common.py:202-222).
"""
from dataclasses import dataclass
from functools import cached_property

import jax.numpy as jnp
import numpy as np

from vasp_tpu.fem.quadrature import tri_quadrature, tet_quadrature
from vasp_tpu.fem.shape import p2_tri, p1_tri, p1_tet, p2_tet


@dataclass
class BoundaryMeasure:
    """Integration over exterior facets with a given marker (a `ds(id)`)."""

    space: object
    marker: object
    quad_degree: int = 6

    def __post_init__(self):
        mesh = self.space.mesh
        fv, cells, lf = mesh.exterior_facets(self.marker)
        self.facet_verts = np.sort(fv.astype(np.int64), axis=1)
        self.cells = cells
        x = mesh.coords[self.facet_verts]  # (K,3,3)
        e1 = x[:, 1] - x[:, 0]
        e2 = x[:, 2] - x[:, 0]
        cr = np.cross(e1, e2)
        self.area2 = np.linalg.norm(cr, axis=1)  # = 2*area
        n = cr / np.maximum(self.area2[:, None], 1e-300)
        # orient outward: away from the attached cell centroid
        cc = mesh.coords[mesh.cells[cells]].mean(axis=1)
        fc = x.mean(axis=1)
        flip = np.einsum("ki,ki->k", n, fc - cc) < 0
        n[flip] *= -1.0
        self.normals = n
        self.x = x
        pts, wq = tri_quadrature(self.quad_degree)
        self.qp = pts
        self.wq = wq
        self.N2, _ = p2_tri(pts)
        self.N1, _ = p1_tri(pts)
        if len(self.facet_verts):
            self.dofs_p2 = self.space.facet_dofs_p2(self.facet_verts)
        else:
            self.dofs_p2 = np.zeros((0, 6), np.int32)
        self.dofs_p1 = self.facet_verts.astype(np.int32)

    @cached_property
    def quad_coords(self):
        """(K, nq, 3) physical coordinates of quadrature points."""
        x0 = self.x[:, 0]
        e1 = self.x[:, 1] - self.x[:, 0]
        e2 = self.x[:, 2] - self.x[:, 0]
        return (
            x0[:, None, :]
            + self.qp[None, :, 0, None] * e1[:, None, :]
            + self.qp[None, :, 1, None] * e2[:, None, :]
        )

    @cached_property
    def area(self) -> float:
        return float(np.sum(self.wq.sum() * self.area2))

    @cached_property
    def centroid(self) -> np.ndarray:
        xq = self.quad_coords  # (K,nq,3)
        integ = np.einsum("q,kqi->i", self.wq, xq * self.area2[:, None, None])
        return integ / self.area

    @cached_property
    def mean_normal(self) -> np.ndarray:
        """Unit-normalized integral of the outward normal
        (reference: src/vasp/simulations/cylinder.py:175-177)."""
        ni = np.einsum("k,ki->i", self.wq.sum() * self.area2, self.normals)
        return ni / np.linalg.norm(ni)

    def integrate_p2_dot_n(self, field):
        """int_Gamma (u . n) ds for a P2 vector field (n2,3) — flow rate."""
        ue = field[self.dofs_p2]  # (K,6,3)
        uq = jnp.einsum("qa,kai->kqi", jnp.asarray(self.N2), ue)
        un = jnp.einsum("kqi,ki->kq", uq, jnp.asarray(self.normals))
        return jnp.einsum("q,kq,k->", jnp.asarray(self.wq), un,
                          jnp.asarray(self.area2))

    def integrate_scalar_fn(self, fn):
        """int_Gamma f(x) ds for a coordinate function (host-side)."""
        vals = fn(self.quad_coords.reshape(-1, 3)).reshape(len(self.area2), -1)
        return float(np.einsum("q,kq,k->", self.wq, vals, self.area2))


# ---------------- DG0 projections ----------------
def dg0_project_speed(space, v, quad_degree=2):
    """DG0 (cellwise) L2-projection of |v| for a P2 field: cell average
    (reference local_project of sqrt(inner(v,v)) onto DG0,
    reference: simulation_common.py:253-317)."""
    pts, wq = tet_quadrature(quad_degree)
    N2, _ = p2_tet(pts)
    ve = v[space.cell_dofs_p2]  # (Nc,10,3)
    vq = jnp.einsum("qa,kai->kqi", jnp.asarray(N2), ve)
    speed = jnp.linalg.norm(vq, axis=2)  # (Nc,nq)
    wq = jnp.asarray(wq)
    return jnp.einsum("q,kq->k", wq, speed) / wq.sum()


def dg0_project_jacobian(space, d, quad_degree=2):
    """DG0 projection of J(d) = det(I + grad d) per cell
    (reference compute_minimum_jacobian, simulation_common.py:320-348)."""
    from vasp_tpu.fem.assembly import cell_geometry

    pts, wq = tet_quadrature(quad_degree)
    _, dN2 = p2_tet(pts)
    Jinv, detJ, vol = cell_geometry(space.mesh.coords, space.mesh.cells)
    de = d[space.cell_dofs_p2]  # (Nc,10,3)
    G2 = jnp.einsum("qaj,kjl->kqal", jnp.asarray(dN2), jnp.asarray(Jinv))
    gd = jnp.einsum("kai,kqaj->kqij", de, G2)  # (Nc,nq,3,3)
    from vasp_tpu.fem.smallmat import det3
    F = jnp.eye(3) + gd
    Jdet = det3(F)
    wq = jnp.asarray(wq)
    return jnp.einsum("q,kq->k", wq, Jdet) / wq.sum()


# ---------------- point evaluation (probes) ----------------
class PointProbes:
    """Evaluate (d, v, p) at fixed physical points (the reference's peval /
    print_probe_points, simulation_common.py:157-222). Cell search is done
    once on the host; evaluation is a tiny gather."""

    def __init__(self, space, points):
        from vasp_tpu.fem.assembly import cell_geometry

        self.space = space
        points = np.atleast_2d(np.asarray(points, np.float64))
        mesh = space.mesh
        Jinv, _, _ = cell_geometry(mesh.coords, mesh.cells)
        x0 = mesh.coords[mesh.cells[:, 0]]  # (Nc,3)
        cells = []
        bary = []
        for pt in points:
            # xi = A^{-1} (x - x0); Jinv rows are d(xi_j)/d(x_i) as stored
            xi = np.einsum("kji,ki->kj", Jinv, pt[None, :] - x0)
            lam0 = 1.0 - xi.sum(axis=1)
            lam = np.concatenate([lam0[:, None], xi], axis=1)
            ok = np.all(lam >= -1e-10, axis=1)
            idx = np.nonzero(ok)[0]
            if len(idx) == 0:
                # nearest fallback
                idx = [int(np.argmax(lam.min(axis=1)))]
            cells.append(int(idx[0]))
            bary.append(lam[idx[0]])
        self.cells = np.asarray(cells)
        self.points = points
        ref = np.stack([b[1:] for b in bary], axis=0)  # reference coords
        self.N2, _ = p2_tet(ref)  # (P,10) basis values at each point
        self.N1, _ = p1_tet(ref)
        self.dofs_p2 = space.cell_dofs_p2[self.cells]  # (P,10)
        self.dofs_p1 = space.cell_dofs_p1[self.cells]

    def eval_p2(self, field):
        """field (n2, m) or (n2,) -> (P, m)."""
        fe = np.asarray(field)[self.dofs_p2]  # (P,10,...)
        return np.einsum("pa,pa...->p...", self.N2, fe)

    def eval_p1(self, field):
        fe = np.asarray(field)[self.dofs_p1]
        return np.einsum("pa,pa...->p...", self.N1, fe)
