"""Unstructured two-domain FSI meshing (the TetGen-core equivalent).

The reference meshes the fluid lumen with TetGen (unstructured Delaunay
interior) plus a vmtk prismatic boundary layer inside vmtkMeshGeneratorFsi
(reference: src/vasp/preprocessing/vmtkmeshgeneratorfsi.py:137-426, TetGen
call at 399-426; sizing/sublayer parameters from
preprocessing_common.py:123-197). This module provides the same capability
without vtk/vmtk/tetgen binaries, with the same decomposition vmtk uses:

1. sample the CORE surface (wall offset inward by the boundary-layer
   thickness) and the lumen interior with jittered rings at the target
   edge length (jitter in the (t, theta) parameter plane, so points stay
   exactly on their nominal surfaces while the triangulation is
   unstructured),
2. Delaunay-tetrahedralize the core (scipy.spatial.Delaunay = Qhull) and
   keep in-core tets by a generalized-winding-number test against a fine
   closed triangulation of the offset surface (an analytic (t, theta)
   radius oracle self-disagrees by tens of percent on curved vessels, so
   classification must be geometric),
3. extrude the graded fluid boundary-layer sheets (SubLayerRatio
   grading, BoundaryLayerThicknessFactor x edge length) outward from the
   RESULTING core boundary triangles as prism stacks — Delaunay cannot
   recover a boundary with points stacked closely beneath it
   (empty-circumsphere violations), which is exactly why vmtk extrudes
   its boundary layer too,
4. extrude the solid wall further outward the same way; prisms split
   into tets with the sorted-diagonal rule, so everything conforms by
   construction.

Entity ids follow the project convention (inlet=2, outlet=3, solid end
rings=11, FSI interface=22, outer wall=33; cells fluid=1/solid=2 —
reference preprocessing_common.py generate_mesh id scheme).
"""
import numpy as np

from vasp_tpu.mesh.tetmesh import TetMesh
from vasp_tpu.preprocessing.surface_mesh import (graded_fractions, read_stl,
                                                 surface_tube_parameterization)


def _points_polar(centers, e1, e2, r, t, th):
    """Batched tube evaluation at per-point (t, theta): returns the local
    axis point c, radial unit direction, and wall radius rk."""
    t = np.asarray(t, np.float64)
    th = np.asarray(th, np.float64)
    nz = len(centers) - 1
    k = np.clip(np.floor(t).astype(int), 0, nz - 1)
    tk = t - k
    c = centers[k] * (1 - tk)[:, None] + centers[k + 1] * tk[:, None]
    E1 = e1[k] * (1 - tk)[:, None] + e1[k + 1] * tk[:, None]
    E2 = e2[k] * (1 - tk)[:, None] + e2[k + 1] * tk[:, None]
    E1 /= np.linalg.norm(E1, axis=1, keepdims=True)
    E2 -= (E1 * E2).sum(1, keepdims=True) * E1
    E2 /= np.linalg.norm(E2, axis=1, keepdims=True)
    n_theta = r.shape[1]
    jt = th / (2 * np.pi) * n_theta
    j0 = np.floor(jt).astype(int) % n_theta
    j1 = (j0 + 1) % n_theta
    wj = jt - np.floor(jt)
    rk = ((r[k, j0] * (1 - wj) + r[k, j1] * wj) * (1 - tk)
          + (r[k + 1, j0] * (1 - wj) + r[k + 1, j1] * wj) * tk)
    dirs = np.cos(th)[:, None] * E1 + np.sin(th)[:, None] * E2
    return c, dirs, rk


def _closed_param_surface(centers, e1, e2, r, depth=None, n_theta_surf=48):
    """Fine closed triangulation of the (optionally inward-offset)
    parameterized lumen surface, every face oriented OUTWARD, for
    winding-number classification. depth: per-station inward offset."""
    nz = len(centers) - 1
    m = n_theta_surf
    thetas = 2 * np.pi * np.arange(m) / m
    if depth is None:
        depth = np.zeros(nz + 1)
    rows = []
    for k in range(nz + 1):
        c, dirs, rk = _points_polar(
            centers, e1, e2, r,
            np.full(m, float(min(k, nz - 1e-9))), thetas)
        rad = np.maximum(rk - depth[k], 1e-12)
        rows.append(c + rad[:, None] * dirs)
    W = np.concatenate(rows, axis=0)
    T, out_ref = [], []
    for k in range(nz):
        b0, b1 = k * m, (k + 1) * m
        i = np.arange(m)
        j = (i + 1) % m
        a_k = 0.5 * (centers[k] + centers[k + 1])
        for tri in (np.stack([b0 + i, b0 + j, b1 + i], 1),
                    np.stack([b0 + j, b1 + j, b1 + i], 1)):
            T.append(tri)
            out_ref.append(np.broadcast_to(a_k, (m, 3)))
    c0 = len(W)
    W = np.concatenate([W, centers[[0]], centers[[nz]]], axis=0)
    i = np.arange(m)
    j = (i + 1) % m
    t0 = centers[1] - centers[0]
    tL = centers[nz] - centers[nz - 1]
    T.append(np.stack([np.full(m, c0), j, i], 1))
    out_ref.append(np.broadcast_to(centers[0] + t0, (m, 3)))
    T.append(np.stack([np.full(m, c0 + 1), nz * m + i, nz * m + j], 1))
    out_ref.append(np.broadcast_to(centers[nz] - tL, (m, 3)))
    T = np.concatenate(T, axis=0)
    out_ref = np.concatenate(out_ref, axis=0)
    A, B, C = W[T[:, 0]], W[T[:, 1]], W[T[:, 2]]
    n = np.cross(B - A, C - A)
    fc = (A + B + C) / 3.0
    flip = np.einsum("ij,ij->i", n, fc - out_ref) < 0
    T[flip] = T[flip][:, [0, 2, 1]]
    return W, T


def _winding_inside(W, T, P, chunk=1024):
    """Generalized winding number of points P w.r.t. the outward-oriented
    closed surface (W, T); True where strictly inside (w > 0.5)."""
    P = np.asarray(P, np.float64)
    A, B, C = W[T[:, 0]], W[T[:, 1]], W[T[:, 2]]
    out = np.empty(len(P))
    for lo in range(0, len(P), chunk):
        p = P[lo:lo + chunk]
        a = A[None] - p[:, None]
        b = B[None] - p[:, None]
        c = C[None] - p[:, None]
        la = np.linalg.norm(a, axis=2)
        lb = np.linalg.norm(b, axis=2)
        lc = np.linalg.norm(c, axis=2)
        det = np.einsum("ptk,ptk->pt", a, np.cross(b, c))
        den = (la * lb * lc + np.einsum("ptk,ptk->pt", a, b) * lc
               + np.einsum("ptk,ptk->pt", b, c) * la
               + np.einsum("ptk,ptk->pt", c, a) * lb)
        out[lo:lo + chunk] = np.arctan2(det, den).sum(axis=1) / (2 * np.pi)
    return np.abs(out) > 0.5


def _nearest_station_radius(V, centers, r):
    """Per-point nearest centerline station, local radial distance to the
    station axis, and the station's median vessel radius."""
    from scipy.spatial import cKDTree

    k = cKDTree(centers).query(np.asarray(V, np.float64))[1]
    tang = np.gradient(centers, axis=0)
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-30)
    rel = V - centers[k]
    ax = np.einsum("ij,ij->i", rel, tang[k])
    rad = np.linalg.norm(rel - ax[:, None] * tang[k], axis=1)
    return k, rad, np.median(r, axis=1)[k]


def _dome_patch(V, F, dome_mask):
    """Largest connected patch of faces fully inside the dome mask + its
    (largest) neck boundary ring, ordered. Connectivity filtering drops
    stray false-positive faces (curvature outliers) that would otherwise
    punch spurious holes in the classification surfaces."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    from vasp_tpu.preprocessing.surface_mesh import boundary_loops

    Fd = F[np.all(dome_mask[F], axis=1)]
    if len(Fd) == 0:
        return Fd, np.zeros(0, np.int64)
    # largest face-connected component (faces sharing a vertex connect)
    nf = len(Fd)
    vmap = {}
    rows, cols = [], []
    for fi, tri in enumerate(Fd):
        for v in tri:
            vmap.setdefault(int(v), []).append(fi)
    for fids in vmap.values():
        for a in fids[1:]:
            rows.append(fids[0])
            cols.append(a)
    g = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(nf, nf))
    ncomp, lab = connected_components(g, directed=False)
    if ncomp > 1:
        big = np.argmax(np.bincount(lab))
        Fd = Fd[lab == big]
    loops = boundary_loops(Fd)
    if not loops:
        return Fd, np.zeros(0, np.int64)
    ring = max(loops, key=len)
    return Fd, np.asarray(ring, np.int64)


def _patch_vertex_normals(V, Fd, n_smooth=3):
    """Area-weighted vertex normals of a face patch, Laplacian-smoothed
    over the patch graph (orientation as given by the face winding)."""
    n_f = np.cross(V[Fd[:, 1]] - V[Fd[:, 0]], V[Fd[:, 2]] - V[Fd[:, 0]])
    nv = np.zeros_like(V)
    for j in range(3):
        np.add.at(nv, Fd[:, j], n_f)
    e = np.concatenate([Fd[:, [0, 1]], Fd[:, [1, 2]], Fd[:, [2, 0]]])
    for _ in range(n_smooth):
        acc = nv.copy()
        np.add.at(acc, e[:, 0], nv[e[:, 1]])
        np.add.at(acc, e[:, 1], nv[e[:, 0]])
        nv = acc
    ln = np.linalg.norm(nv, axis=1, keepdims=True)
    return nv / np.maximum(ln, 1e-30)


def _close_patch(W, Fd, ring, apex):
    """Closed surface = patch + fan from `apex` over the ordered ring,
    globally oriented OUTWARD (positive enclosed volume)."""
    a_id = len(W)
    Wc = np.concatenate([W, apex[None]], axis=0)
    i = np.arange(len(ring))
    j = (i + 1) % len(ring)
    fan = np.stack([np.full(len(ring), a_id), ring[j], ring[i]], axis=1)
    T = np.concatenate([Fd, fan], axis=0)
    A, B, C = Wc[T[:, 0]], Wc[T[:, 1]], Wc[T[:, 2]]
    vol = np.einsum("ij,ij->i", A, np.cross(B, C)).sum() / 6.0
    if vol < 0:
        T = T[:, [0, 2, 1]]
    return Wc, T


def _poisson_thin(P, h_min, keep_first=0, rng=None):
    """Greedy Poisson-disk thinning via a uniform grid hash: keep points at
    least h_min apart (the first `keep_first` points are always kept)."""
    P = np.asarray(P, np.float64)
    order = np.arange(len(P))
    if rng is not None and len(P) > keep_first:
        tail = order[keep_first:]
        rng.shuffle(tail)
        order = np.concatenate([order[:keep_first], tail])
    cell = max(h_min, 1e-30)
    keys = np.floor(P / cell).astype(np.int64)
    grid = {}
    kept = []
    h2 = h_min * h_min
    for i in order:
        k = tuple(keys[i])
        ok = True
        if i >= keep_first:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        for j in grid.get((k[0] + dx, k[1] + dy,
                                           k[2] + dz), ()):
                            if ((P[i] - P[j]) ** 2).sum() < h2:
                                ok = False
                                break
                        if not ok:
                            break
                    if not ok:
                        break
                if not ok:
                    break
        if ok:
            kept.append(i)
            grid.setdefault(k, []).append(i)
    return np.asarray(sorted(kept), np.int64)


def _sorted_prism_tets(tri, bot, top):
    """Split prisms over triangles into 3 tets each with the
    sorted-diagonal rule: the quad-face diagonal depends only on the
    sorted order of the shared edge's SORT KEYS, so adjacent prisms (and
    stacked shells reusing the same keys) conform. tri: (K,3) sort keys
    (base triangle ids); bot/top: (K,3) actual vertex ids."""
    order = np.argsort(tri, axis=1)
    rows = np.arange(len(tri))[:, None]
    a, b, c = bot[rows, order].T
    A, B, C = top[rows, order].T
    return [np.stack([a, b, c, A], 1), np.stack([b, c, A, B], 1),
            np.stack([c, A, B, C], 1)]


def delaunay_fsi_mesh(stl_path, edge_length=None, n_bl_fluid=2,
                      sublayer_ratio_fluid=0.75,
                      bl_thickness_factor=0.85,
                      n_r_solid=1, sublayer_ratio_solid=1.0,
                      solid_thickness=None, thickness_frac=0.25,
                      no_solid=False, scale_factor=1.0, seed=0,
                      n_z_param=None, n_theta_param=24,
                      dome_detect=True, dome_factor=1.45) -> TetMesh:
    """Unstructured two-domain FSI mesh from an STL surface.

    edge_length: target tet edge length in INPUT units (default: a third
    of the median lumen radius — the reference derives it from
    --edge-length / dist_sphere sizing, preprocessing.py:223-269).
    n_bl_fluid / sublayer_ratio_fluid / bl_thickness_factor: fluid
    boundary-layer prism sheets (reference vmtk NumberOfSubLayers /
    SubLayerRatio / BoundaryLayerThicknessFactor,
    vmtkmeshgeneratorfsi.py:175-210). Solid parameters as in
    surface_fsi_mesh (constant solid_thickness or thickness_frac x local
    radius, graded by sublayer_ratio_solid).

    NON-TUBULAR anatomy (sidewall aneurysm dome — the reference's flagship
    clinical geometry, meshed there by vmtk/TetGen on arbitrary surfaces,
    vmtkmeshgeneratorfsi.py:137-426): with dome_detect, vertices whose
    radial distance exceeds dome_factor x the station's median vessel
    radius form a dome patch, the vessel is re-parameterized with the dome
    excluded, and the mesh is built on the UNION of the tube core and an
    offset dome core (winding-number classification against both closed
    surfaces); the dome patch's STL triangles themselves carry the dome
    sheet sites, and the prism extrusion runs along per-site outward
    directions (smoothed across the neck seam — the vmtk smoothed-warp-
    vector analogue)."""
    rng = np.random.default_rng(seed)
    V, F = read_stl(stl_path)
    from vasp_tpu.preprocessing.surface_mesh import boundary_loops

    if len(boundary_loops(F)) > 2:
        # branched anatomy (3+ open ends): the (z, theta) single-backbone
        # parameterization does not apply — dispatch to the general
        # offset-surface mesher (the reference handles arbitrary
        # surfaces through vmtk/TetGen, vmtkmeshgeneratorfsi.py:137-426)
        from vasp_tpu.preprocessing.general_mesh import \
            delaunay_fsi_mesh_general

        return delaunay_fsi_mesh_general(
            (V, F), edge_length=edge_length, n_bl_fluid=n_bl_fluid,
            sublayer_ratio_fluid=sublayer_ratio_fluid,
            bl_thickness_factor=bl_thickness_factor,
            n_r_solid=n_r_solid, sublayer_ratio_solid=sublayer_ratio_solid,
            solid_thickness=solid_thickness, thickness_frac=thickness_frac,
            no_solid=no_solid, scale_factor=scale_factor, seed=seed)
    if n_z_param is None:
        n_z_param = 40
    centers, e1, e2, r = surface_tube_parameterization(
        V, F, n_z=n_z_param, n_theta=n_theta_param)
    dome = None
    if dome_detect:
        # Guards against FALSE dome positives (measured on the reference
        # STLs): (a) cap-adjacent stations read inflated radii from the
        # end-ring parameterization (tube.stl: 22 offenders, ALL at
        # stations 1-3) — exclude them; (b) vessel curvature puts bend
        # vertices up to 1.67x the station median (artery.stl, mid-vessel)
        # — require a STRONG protrusion (>= dome_min_ratio, default 1.9;
        # a real dome head sits at 2x+) before engaging the dome path.
        dome_min_ratio = 1.9
        nz0 = len(centers) - 1

        def detect():
            k_v, rad_v, rmed_v = _nearest_station_radius(V, centers, r)
            interior = (k_v >= 3) & (k_v <= nz0 - 3)
            mask = interior & (rad_v > dome_factor * rmed_v)
            strong = interior & (rad_v > dome_min_ratio * rmed_v)
            return mask, strong, rmed_v

        dome_mask, strong, rmed_v = detect()
        param0 = (centers, e1, e2, r)
        if dome_mask.sum() >= 20:
            # re-parameterize the VESSEL with the dome excluded, then
            # re-detect against the cleaned radii. The STRONG guard is
            # applied to the CLEANED second pass only: on the first pass
            # the dome pollutes its own baseline (the centerline kernel is
            # pulled toward the dome mass and the dome raises its
            # station's median radius — measured: a 2.4x-true-ratio dome
            # reads 1.53x on the raw parameterization and the composite
            # never engaged), while bend vertices stay at ~1.5-1.7x even
            # after exclusion, so the false-positive protection holds.
            centers, e1, e2, r = surface_tube_parameterization(
                V, F, n_z=n_z_param, n_theta=n_theta_param,
                exclude_mask=dome_mask)
            dome_mask, strong, rmed_v = detect()
        if dome_mask.sum() >= 20 and strong.any():
            Fd, ring = _dome_patch(V, F, dome_mask)
            patch_vs = np.unique(Fd) if len(Fd) else np.zeros(0, np.int64)
            if (len(Fd) >= 10 and len(ring) >= 3
                    and strong[patch_vs].any()):
                dome = dict(mask=dome_mask, Fd=Fd, ring=ring,
                            rmed_v=rmed_v)
        if dome is None:
            # keep the ORIGINAL parameterization when the composite does
            # not engage: on bendy vessels (artery.stl) the moderate mask
            # can fire on bend vertices, and the exclusion-reparameterized
            # end frames tilt off the physical cap planes (measured: the
            # 2/3/11 cap markers vanish)
            centers, e1, e2, r = param0
    nz = len(centers) - 1
    if edge_length is None:
        edge_length = float(np.median(r)) / 3.0
    h = float(edge_length)
    seg = np.linalg.norm(np.diff(centers, axis=0), axis=1)
    s_cum = np.concatenate([[0.0], np.cumsum(seg)])
    total_len = s_cum[-1]

    # boundary-layer total thickness: factor x edge length, capped well
    # inside the local radius so the core never collapses
    rbar_st = r.mean(axis=1)
    bl_st = np.minimum(bl_thickness_factor * h, 0.35 * rbar_st)
    # depth levels from the wall inward, spacing smallest AT the wall
    # (SubLayerRatio grading): dep_frac[-1] == 1 is the core surface
    w = float(sublayer_ratio_fluid) ** np.arange(n_bl_fluid, 0, -1)
    dep_frac = np.cumsum(w) / w.sum()

    def bl_at(t):
        return float(np.interp(t, np.arange(nz + 1), bl_st))

    # ---- 1. core-surface sampling: jittered rings at ~h spacing --------
    # jitter lives in the (t, theta) parameter plane so each sampled site
    # stays exactly on its nominal surface and the whole radial stack
    # (core sheet -> BL sheets -> wall -> solid shells) shares one site
    n_st = max(3, int(round(total_len / (0.82 * h))) + 1)
    t_st = np.interp(np.linspace(0, total_len, n_st), s_cum,
                     np.arange(nz + 1))
    t_st[0], t_st[-1] = 0.0, float(nz)
    dt_mid = (t_st[min(1, n_st - 1)] - t_st[0])  # station spacing in t
    site_t, site_th = [], []
    for i, t in enumerate(t_st):
        k = min(int(np.floor(t)), nz - 1)
        tk = t - k
        rbar = float(rbar_st[k] * (1 - tk) + rbar_st[k + 1] * tk)
        r_core = max(rbar - bl_at(t), 0.3 * rbar)
        n_th = max(8, int(round(2 * np.pi * r_core / h)))
        off = (i * 0.381966) % 1.0  # golden-ratio ring twist
        th = 2 * np.pi * (np.arange(n_th) + off
                          + rng.uniform(-0.15, 0.15, n_th)) / n_th
        tj = np.full(n_th, t)
        if 0 < i < n_st - 1:  # end rings stay exactly on the cap planes
            tj = np.clip(t + rng.uniform(-0.2, 0.2, n_th) * dt_mid,
                         0.0, float(nz))
        site_t.append(tj)
        site_th.append(np.mod(th, 2 * np.pi))
    site_t = np.concatenate(site_t)
    site_th = np.concatenate(site_th)
    cS, dirS, rkS = _points_polar(centers, e1, e2, r, site_t, site_th)
    bl_site = np.interp(site_t, np.arange(nz + 1), bl_st)
    core_pts = cS + (rkS - bl_site)[:, None] * dirS

    # ---- 1b. sidewall-aneurysm dome: offset dome core + sites -----------
    dome_geo = None
    if dome is not None:
        from scipy.spatial import cKDTree

        Fd, ring = dome["Fd"], dome["ring"]
        nv = _patch_vertex_normals(V, Fd)
        dome_vs = np.unique(Fd)
        rc = V[ring].mean(axis=0)
        kc = int(np.argmin(np.linalg.norm(centers - rc, axis=1)))
        tang = np.gradient(centers, axis=0)[kc]
        tang /= max(np.linalg.norm(tang), 1e-30)
        rel = rc - centers[kc]
        dir_rc = rel - np.dot(rel, tang) * tang
        dir_rc /= max(np.linalg.norm(dir_rc), 1e-30)
        # fan apex pulled INSIDE the tube core so the dome-core region
        # overlaps the tube core (no classification gap at the neck)
        bl_neck = float(np.interp(kc, np.arange(nz + 1), bl_st))
        apex = rc - (bl_neck + h) * dir_rc
        # global orientation: the normal at the dome tip points away from
        # the apex (STL winding gives consistency, this fixes the sign)
        tip = dome_vs[np.argmax(np.linalg.norm(V[dome_vs] - rc, axis=1))]
        if np.dot(nv[tip], V[tip] - apex) < 0:
            nv = -nv
        bl_v = np.minimum(bl_thickness_factor * h, 0.35 * dome["rmed_v"])
        Wcore = V - bl_v[:, None] * nv
        Wc, Tc = _close_patch(Wcore, Fd, ring, apex)
        Wsh = V - (bl_v + 0.7 * h)[:, None] * nv
        Wshc, Tshc = _close_patch(Wsh, Fd, ring, apex)
        # dome sheet sites: thinned offset patch vertices
        keep_idx = _poisson_thin(Wcore[dome_vs], 0.7 * h, rng=rng)
        dome_sites = dome_vs[keep_idx]
        # tube core sites under the neck (inside the dome core) lie on the
        # REMOVED part of the union boundary: drop them, with a 0.6h
        # clearance ring around the dome sheet sites
        ins = _winding_inside(Wc, Tc, core_pts)
        d_near = cKDTree(Wcore[dome_sites]).query(core_pts)[0]
        keep_t = ~(ins | (d_near < 0.6 * h))
        site_t, site_th = site_t[keep_t], site_th[keep_t]
        cS, dirS, rkS = cS[keep_t], dirS[keep_t], rkS[keep_t]
        bl_site, core_pts = bl_site[keep_t], core_pts[keep_t]
        # dome interior lattice inside the shrunk dome core
        lo_b = Wcore[dome_vs].min(axis=0)
        hi_b = Wcore[dome_vs].max(axis=0)
        nx = np.maximum(((hi_b - lo_b) / (0.9 * h)).astype(int) + 1, 1)
        gx = [lo_b[d] + (np.arange(nx[d]) + 0.5) * (hi_b[d] - lo_b[d])
              / nx[d] for d in range(3)]
        X, Y, Z = np.meshgrid(*gx, indexing="ij")
        lat = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
        lat = lat + rng.uniform(-0.1 * h, 0.1 * h, lat.shape)
        lat = lat[_winding_inside(Wshc, Tshc, lat)]
        if len(lat):
            both = np.concatenate([Wcore[dome_sites], lat], axis=0)
            sel = _poisson_thin(both, 0.6 * h,
                                keep_first=len(dome_sites))
            lat = both[sel[sel >= len(dome_sites)]]
        dome_geo = dict(sheet_pts=Wcore[dome_sites],
                        sheet_wall=V[dome_sites],
                        sheet_dir=nv[dome_sites],
                        sheet_rk=dome["rmed_v"][dome_sites],
                        sheet_bl=bl_v[dome_sites],
                        lattice=lat, Wc=Wc, Tc=Tc)

    n_sites = len(core_pts)
    pts = [core_pts]
    groups = [np.full(n_sites, 1, np.int8)]  # 1 = core sheet

    # ---- 2. endcap disks + interior lattice (inside the core) ----------
    nrm0 = np.cross(e1[0], e2[0])
    nrm0 /= np.linalg.norm(nrm0)
    nrmL = np.cross(e1[-1], e2[-1])
    nrmL /= np.linalg.norm(nrmL)

    def polar_cloud(t, margin, tag, jitter_xyz=0.0, t_jitter=0.0):
        k = min(int(np.floor(t)), nz - 1)
        tk = t - k
        rbar = float(rbar_st[k] * (1 - tk) + rbar_st[k + 1] * tk)
        r_core = rbar - bl_at(t) - margin
        if r_core < 0.25 * h:
            return
        n_rings = max(1, int(round(r_core / h)))
        c, _, _ = _points_polar(centers, e1, e2, r, np.array([t]),
                                np.array([0.0]))
        pts.append(c)
        groups.append(np.full(1, tag, np.int8))
        for q in range(1, n_rings + 1):
            frac = (q - 0.25) / (n_rings + 0.25)
            n_th = max(5, int(round(2 * np.pi * r_core * frac / h)))
            th = 2 * np.pi * (np.arange(n_th) + rng.uniform(0, 1)) / n_th
            tj = np.full(n_th, t)
            if t_jitter > 0:
                tj = np.clip(t + rng.uniform(-t_jitter, t_jitter, n_th),
                             0.0, float(nz))
            cc, dd, rr = _points_polar(centers, e1, e2, r, tj, th)
            rad = np.maximum((rr - bl_at(t) - margin) * frac, 1e-12)
            P = cc + rad[:, None] * dd
            if jitter_xyz > 0:
                P = P + rng.uniform(-jitter_xyz, jitter_xyz, P.shape)
            pts.append(P)
            groups.append(np.full(len(P), tag, np.int8))

    polar_cloud(0.0, 0.0, 2)
    polar_cloud(float(nz), 0.0, 3)
    s_int = np.arange(0.7 * h, total_len - 0.69 * h, 0.9 * h)
    for s in s_int:
        t = float(np.interp(s, s_cum, np.arange(nz + 1)))
        polar_cloud(t, 0.7 * h, 4, jitter_xyz=0.1 * h)

    i_dome0 = sum(len(p) for p in pts)
    if dome_geo is not None:
        pts.append(dome_geo["sheet_pts"])
        groups.append(np.full(len(dome_geo["sheet_pts"]), 1, np.int8))
        pts.append(dome_geo["lattice"])
        groups.append(np.full(len(dome_geo["lattice"]), 5, np.int8))

    pts = np.concatenate(pts, axis=0)
    groups = np.concatenate(groups)

    # per-site extrusion geometry (wall anchor, outward direction, local
    # radius, BL thickness) for every SHEET point — tube sheet first,
    # dome sheet appended
    wall_pos = np.zeros_like(pts)
    out_dir = np.zeros_like(pts)
    rk_loc = np.zeros(len(pts))
    bl_loc = np.zeros(len(pts))
    wall_pos[:n_sites] = cS + rkS[:, None] * dirS
    out_dir[:n_sites] = dirS
    rk_loc[:n_sites] = rkS
    bl_loc[:n_sites] = bl_site
    if dome_geo is not None:
        nd = len(dome_geo["sheet_pts"])
        wall_pos[i_dome0:i_dome0 + nd] = dome_geo["sheet_wall"]
        out_dir[i_dome0:i_dome0 + nd] = dome_geo["sheet_dir"]
        rk_loc[i_dome0:i_dome0 + nd] = dome_geo["sheet_rk"]
        bl_loc[i_dome0:i_dome0 + nd] = dome_geo["sheet_bl"]

    # ---- 3. Delaunay core + winding classification ---------------------
    from scipy.spatial import Delaunay

    tri = Delaunay(pts)
    tets = tri.simplices.astype(np.int64)
    cent = pts[tets].mean(axis=1)
    Wsurf, Tsurf = _closed_param_surface(centers, e1, e2, r, depth=bl_st)
    # Keep rule: a tet containing ANY non-sheet vertex (cap disk, axis,
    # interior lattice — all strictly inside the lateral offset surface)
    # is in the lumen; only pure-sheet tets consult the winding test.
    # This (a) fills the cap-rim corners whose centroids read marginally
    # outside the chordal winding surface and (b) guarantees every
    # boundary face of the kept set is pure sheet/cap: a face with an
    # interior vertex has BOTH neighbor tets kept, so it stays interior.
    # Concave patches may drop thin pure-sheet lens tets; the prism
    # extrusion below starts from the exposed chord faces, so the mesh
    # stays conforming (the lens volume is covered by the prisms).
    pure_sheet = np.all(groups[tets] == 1, axis=1)
    inside = _winding_inside(Wsurf, Tsurf, cent) | ~pure_sheet
    if dome_geo is not None:
        # union classification: lumen = tube core OR dome core
        inside |= _winding_inside(dome_geo["Wc"], dome_geo["Tc"], cent)
    Pt = pts[tets]
    vol6 = np.einsum(
        "ij,ij->i", np.cross(Pt[:, 1] - Pt[:, 0], Pt[:, 2] - Pt[:, 0]),
        Pt[:, 3] - Pt[:, 0])
    inside &= np.abs(vol6) > 1e-9 * h ** 3
    tets = tets[inside]
    vol6 = vol6[inside]
    flip = vol6 < 0
    tets[flip] = tets[flip][:, [0, 2, 1, 3]]

    # ---- 4. core boundary faces ----------------------------------------
    faces = np.concatenate([tets[:, [1, 2, 3]], tets[:, [0, 2, 3]],
                            tets[:, [0, 1, 3]], tets[:, [0, 1, 2]]])
    fs = np.sort(faces, axis=1)
    uniq, counts = np.unique(fs, axis=0, return_counts=True)
    bnd = uniq[counts == 1]
    d0 = np.abs((pts - centers[0]) @ nrm0)
    dL = np.abs((pts - centers[-1]) @ nrmL)
    captol = 0.05 * h
    on0 = d0[bnd].max(axis=1) < captol
    onL = dL[bnd].max(axis=1) < captol
    lat_faces = bnd[~(on0 | onL)]
    # EVERY lateral core-boundary face must sit on the core sheet: they
    # are the prism extrusion bases, and a leaked face would leave a hole
    # in the boundary layer (exterior fluid facet with no marker)
    leak = np.any(groups[lat_faces] != 1, axis=1)
    if leak.any():
        raise RuntimeError(
            f"delaunay_fsi_mesh: {leak.sum()}/{len(lat_faces)} lateral "
            f"core-boundary faces leak off the core sheet — refine "
            f"edge_length (h={h:g})")

    # ---- 5. extrude BL sheets + wall + solid shells ---------------------
    shell_vids = np.unique(lat_faces)
    wallB = wall_pos[shell_vids]
    dirB = out_dir[shell_vids]
    rkB = rk_loc[shell_vids]
    blB = bl_loc[shell_vids]
    if dome_geo is not None:
        # smooth the extrusion directions over the sheet graph (the vmtk
        # smoothed-warp-vector analogue): at the neck seam the tube's
        # radial direction meets the dome's surface normal, and unsmoothed
        # directions there can cross; the WALL anchor stays exact (level
        # f=0 is wallB itself)
        lg = np.full(len(pts), -1, np.int64)
        lg[shell_vids] = np.arange(len(shell_vids))
        eg = np.concatenate([lat_faces[:, [0, 1]], lat_faces[:, [1, 2]],
                             lat_faces[:, [2, 0]]])
        eg = lg[eg]
        for _ in range(3):
            acc = dirB.copy()
            np.add.at(acc, eg[:, 0], dirB[eg[:, 1]])
            np.add.at(acc, eg[:, 1], dirB[eg[:, 0]])
            dirB = acc / np.maximum(
                np.linalg.norm(acc, axis=1, keepdims=True), 1e-30)
    # fluid levels outward from the core sheet: depths (from the wall)
    # dep_frac reversed, ending at the wall itself
    fl_depth = np.concatenate([dep_frac[::-1][1:], [0.0]])  # len n_bl_fluid
    if solid_thickness is not None:
        thickB = np.full(len(shell_vids), float(solid_thickness))
    else:
        thickB = thickness_frac * rkB
    frac_s = graded_fractions(n_r_solid, sublayer_ratio_solid) \
        if n_r_solid > 0 else np.zeros(0)
    offsets = [-blB * f for f in fl_depth]
    n_fluid_levels = len(offsets)
    if not no_solid:
        offsets += [thickB * f for f in frac_s]
    loc = np.full(len(pts), -1, np.int64)
    loc[shell_vids] = np.arange(len(shell_vids))
    base = len(pts)
    shells = [wallB + off[:, None] * dirB for off in offsets]
    n_total_pts = base + len(shells) * len(shell_vids)
    coords = np.concatenate([pts] + shells, axis=0)
    n_fluid_pts = base + n_fluid_levels * len(shell_vids)

    def vid(level, tri_global):
        if level == 0:
            return tri_global
        return base + (level - 1) * len(shell_vids) + loc[tri_global]

    cells = [tets]
    cell_markers = [np.full(len(tets), 1, np.int64)]
    for k in range(len(shells)):
        bot = vid(k, lat_faces)
        top = vid(k + 1, lat_faces)
        mk = 1 if k < n_fluid_levels else 2
        for tt in _sorted_prism_tets(lat_faces, bot, top):
            cells.append(tt)
            cell_markers.append(np.full(len(tt), mk, np.int64))
    cells = np.concatenate(cells, axis=0)
    cell_markers = np.concatenate(cell_markers)

    # orientation fix over the full cell set
    Pt = coords[cells]
    vol6 = np.einsum(
        "ij,ij->i", np.cross(Pt[:, 1] - Pt[:, 0], Pt[:, 2] - Pt[:, 0]),
        Pt[:, 3] - Pt[:, 0])
    cells[vol6 < 0] = cells[vol6 < 0][:, [0, 2, 1, 3]]

    # compact unused vertices (sites dropped with their outside tets)
    used = np.unique(cells)
    remap = np.full(len(coords), -1, np.int64)
    remap[used] = np.arange(len(used))
    coords = coords[used]
    cells = remap[cells]
    is_fluid_pt = used < n_fluid_pts
    d0 = np.abs((coords - centers[0]) @ nrm0)
    dL = np.abs((coords - centers[-1]) @ nrmL)

    # ---- 6. facet markers ------------------------------------------------
    mesh0 = TetMesh(coords * float(scale_factor), cells, cell_markers)
    fv, c0, l0, c1, l1 = mesh0._facet_tables
    exterior = c1 < 0
    m0 = cell_markers[c0]
    m1 = np.where(c1 >= 0, cell_markers[np.maximum(c1, 0)], m0)
    markers = np.zeros(len(fv), np.int64)
    markers[(~exterior) & (m0 != m1)] = 22  # FSI interface
    on0f = d0[fv].max(axis=1) < captol
    onLf = dL[fv].max(axis=1) < captol
    fluid_f = is_fluid_pt[fv].all(axis=1)
    markers[exterior & on0f & fluid_f] = 2
    markers[exterior & onLf & fluid_f] = 3
    if no_solid or n_r_solid == 0:
        markers[exterior & ~(on0f | onLf)] = 22
    else:
        markers[exterior & (on0f | onLf) & ~fluid_f] = 11
        markers[exterior & ~(on0f | onLf)] = 33
    keep = markers > 0
    out = TetMesh(coords * float(scale_factor), cells, cell_markers,
                  fv[keep], markers[keep])
    # introspection for tests/pipeline logs: did the dome COMPOSITE path
    # (union winding core + dome-sheet extrusion) actually engage, vs the
    # bump riding in as a plain radial graph r(z, theta)?
    # (TetMesh is a frozen dataclass — set via object.__setattr__)
    object.__setattr__(out, "_dome_engaged", dome is not None)
    return out
