"""Debug harness for delaunay_fsi_mesh boundary-leak classification."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from vasp_tpu.preprocessing import delaunay_mesh as dm

# re-run the guts with instrumentation
stl = "/root/reference/tests/test_data/tube/tube.stl"

import types


def instrumented(stl_path, edge_length=None, **kw):
    fn = dm.delaunay_fsi_mesh
    code = fn.__code__
    # easiest: copy the relevant prefix manually
    rng = np.random.default_rng(0)
    V, F = dm.read_stl(stl_path)
    centers, e1, e2, r = dm.surface_tube_parameterization(
        V, F, n_z=40, n_theta=24)
    nz = len(centers) - 1
    h = edge_length or float(np.median(r)) / 3.0
    seg = np.linalg.norm(np.diff(centers, axis=0), axis=1)
    s_cum = np.concatenate([[0.0], np.cumsum(seg)])
    total_len = s_cum[-1]
    n_bl_fluid, sublayer_ratio_fluid, bl_thickness_factor = 2, 0.75, 0.85
    bl_total_nom = bl_thickness_factor * h
    w = float(sublayer_ratio_fluid) ** np.arange(n_bl_fluid, 0, -1)
    dep_frac = np.cumsum(w) / w.sum()

    n_st = max(3, int(round(total_len / (0.82 * h))) + 1)
    t_st = np.interp(np.linspace(0, total_len, n_st), s_cum,
                     np.arange(nz + 1))
    t_st[0], t_st[-1] = 0.0, float(nz)
    pts, groups = [], []
    for i, t in enumerate(t_st):
        k = min(int(np.floor(t)), nz - 1)
        rbar = float(np.mean(r[k] * (1 - (t - k)) + r[k + 1] * (t - k)))
        n_th = max(8, int(round(2 * np.pi * rbar / h)))
        off = (i * 0.381966) % 1.0
        thetas = 2 * np.pi * (np.arange(n_th) + off) / n_th
        ring = dm._ring_points(centers, e1, e2, r, t, thetas)
        pts.append(ring)
        groups.append(np.full(n_th, 0, np.int8))
        bl_total = min(bl_total_nom, 0.35 * rbar)
        for dfrac in dep_frac:
            pts.append(dm._ring_points(centers, e1, e2, r, t, thetas,
                                       depth=bl_total * dfrac))
            groups.append(np.full(n_th, 1, np.int8))
    nrm0 = np.cross(e1[0], e2[0]); nrm0 /= np.linalg.norm(nrm0)
    nrmL = np.cross(e1[-1], e2[-1]); nrmL /= np.linalg.norm(nrmL)
    for t_end, tag in ((0.0, 2), (float(nz), 3)):
        k = 0 if t_end == 0.0 else nz
        r_end = float(np.mean(r[k]))
        bl_total = min(bl_total_nom, 0.35 * r_end)
        r_core = r_end - bl_total
        n_rings = max(1, int(round(r_core / h)))
        for q in range(n_rings):
            rad = r_core * (q + 0.5) / n_rings if n_rings > 1 else 0.0
            if q == 0 and n_rings > 1:
                rad = 0.0
            n_th = max(1, int(round(2 * np.pi * rad / h))) if rad > 0 else 1
            off = rng.uniform(0, 1)
            thetas = 2 * np.pi * (np.arange(n_th) + off) / n_th
            E1, E2, c = e1[k], e2[k], centers[k]
            dirs = (np.cos(thetas)[:, None] * E1[None]
                    + np.sin(thetas)[:, None] * E2[None])
            pts.append(c[None] + rad * dirs)
            groups.append(np.full(n_th, tag, np.int8))
    s_int = np.arange(0.7 * h, total_len - 0.69 * h, 0.9 * h)
    for s in s_int:
        t = float(np.interp(s, s_cum, np.arange(nz + 1)))
        k = min(int(np.floor(t)), nz - 1)
        rbar = float(np.mean(r[k] * (1 - (t - k)) + r[k + 1] * (t - k)))
        bl_total = min(bl_total_nom, 0.35 * rbar)
        r_core = rbar - bl_total - 0.55 * h
        if r_core < 0.2 * h:
            continue
        n_rings = max(1, int(round(r_core / h)))
        for q in range(n_rings):
            rad = r_core * (q + 0.5) / n_rings if n_rings > 1 else 0.0
            if q == 0 and n_rings > 1:
                rad = 0.0
            n_th = max(1, int(round(2 * np.pi * rad / h))) if rad > 0 else 1
            thetas = 2 * np.pi * (np.arange(n_th) + rng.uniform(0, 1)) / n_th
            E1, E2 = e1[k], e2[k]
            c = centers[k] * (1 - (t - k)) + centers[k + 1] * (t - k)
            dirs = (np.cos(thetas)[:, None] * E1[None]
                    + np.sin(thetas)[:, None] * E2[None])
            P = c[None] + rad * dirs
            P = P + rng.uniform(-0.15 * h, 0.15 * h, P.shape)
            pts.append(P)
            groups.append(np.full(len(P), 4, np.int8))
    pts = np.concatenate(pts, axis=0)
    groups = np.concatenate(groups)
    jit = rng.uniform(-0.02 * h, 0.02 * h, pts.shape)
    jit[groups == 0] = 0.0
    jit[groups == 2] = 0.0
    jit[groups == 3] = 0.0
    pts = pts + jit

    from scipy.spatial import Delaunay
    tri = Delaunay(pts)
    tets = tri.simplices.astype(np.int64)
    cent = pts[tets].mean(axis=1)
    tloc, rho, _, r_loc = dm._tube_locate(centers, e1, e2, r, cent)
    s0 = (cent - centers[0]) @ nrm0
    sL = (cent - centers[-1]) @ nrmL
    eps = 1e-4 * h
    inside = (rho <= r_loc * (1.0 - 2e-3)) & (s0 > eps) & (sL < -eps)
    Pt = pts[tets]
    vol6 = np.einsum("ij,ij->i",
                     np.cross(Pt[:, 1] - Pt[:, 0], Pt[:, 2] - Pt[:, 0]),
                     Pt[:, 3] - Pt[:, 0])
    inside &= np.abs(vol6) > 1e-10 * h ** 3
    tets_in = tets[inside]
    faces = np.concatenate([tets_in[:, [1, 2, 3]], tets_in[:, [0, 2, 3]],
                            tets_in[:, [0, 1, 3]], tets_in[:, [0, 1, 2]]])
    fs = np.sort(faces, axis=1)
    uniq, counts = np.unique(fs, axis=0, return_counts=True)
    bnd = uniq[counts == 1]
    d0 = np.abs((pts - centers[0]) @ nrm0)
    dL = np.abs((pts - centers[-1]) @ nrmL)
    captol = 0.05 * h
    on0 = d0[bnd].max(axis=1) < captol
    onL = dL[bnd].max(axis=1) < captol
    wall_faces = bnd[~(on0 | onL)]
    leak = groups[wall_faces].max(axis=1) > 0
    print("n pts", len(pts), "tets kept", inside.sum(), "/", len(tets))
    print("bnd faces", len(bnd), "cap0", on0.sum(), "capL", onL.sum(),
          "wall", len(wall_faces), "leak", leak.sum())
    lw = wall_faces[leak]
    gcomp = groups[lw]
    from collections import Counter
    print("leak group rows:", Counter(map(tuple, gcomp)).most_common(8))
    # where are the leaks? rho of leak-face centroids
    fc = pts[lw].mean(axis=1)
    tl, rh, _, rl = dm._tube_locate(centers, e1, e2, r, fc)
    print("leak rho/r_loc percentiles:",
          np.percentile(rh / rl, [5, 50, 95]).round(3))
    print("leak t percentiles:", np.percentile(tl, [5, 50, 95]).round(2),
          "of nz", nz)
    sl0 = (fc - centers[0]) @ nrm0
    print("leak s0 (dist from inlet plane) pct:",
          np.percentile(sl0, [5, 50, 95]).round(3), "h=", h)


instrumented(stl)
