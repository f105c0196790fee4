"""Replicates delaunay_fsi_mesh_general's site/classification pipeline on
tube.stl and inspects the provenance of leaking lateral faces."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from vasp_tpu.preprocessing.delaunay_mesh import (_patch_vertex_normals,
                                                  _poisson_thin,
                                                  _winding_inside)
from vasp_tpu.preprocessing.general_mesh import (_cap_planes, _close_surface,
                                                 _fill_cap, _local_radius)
from vasp_tpu.preprocessing.surface_mesh import (boundary_loops, read_stl,
                                                 remove_caps)

V, F = read_stl("/root/reference/tests/test_data/tube/tube.stl")
F = remove_caps(V, F, target_loops=2)
used = np.unique(F)
remap = np.full(len(V), -1, np.int64)
remap[used] = np.arange(len(used))
V, F = V[used], remap[F]
loops = boundary_loops(F)
rng = np.random.default_rng(0)
Wc_raw = V
T_raw = [F]
for ring in loops:
    apex = V[ring].mean(axis=0)
    a_id = len(Wc_raw)
    Wc_raw = np.concatenate([Wc_raw, apex[None]], axis=0)
    i = np.arange(len(ring))
    j = (i + 1) % len(ring)
    T_raw.append(np.stack([np.full(len(ring), a_id), ring[j], ring[i]], axis=1))
T_raw = np.concatenate(T_raw, axis=0)
vol_raw = np.einsum("ij,ij->i", Wc_raw[T_raw[:, 0]],
                    np.cross(Wc_raw[T_raw[:, 1]], Wc_raw[T_raw[:, 2]])).sum() / 6
Fo = F if vol_raw > 0 else F[:, [0, 2, 1]]
nv = _patch_vertex_normals(V, Fo)
rk_v = _local_radius(V, Fo, nv)
h = float(np.median(rk_v)) / 3
planes = _cap_planes(V, loops)
for li, ring in enumerate(loops):
    p0, n, _ = planes[li]
    V[ring] = V[ring] - np.outer((V[ring] - p0) @ n, n)
    nr = nv[ring] - np.outer(nv[ring] @ n, n)
    nv[ring] = nr / np.maximum(np.linalg.norm(nr, axis=1, keepdims=True), 1e-30)
bl_v = np.minimum(0.85 * h, 0.35 * rk_v)
W = V - bl_v[:, None] * nv
ring_vs = np.concatenate([np.asarray(r) for r in loops])
other_vs = np.setdiff1d(np.arange(len(V)), ring_vs)
order_vs = np.concatenate([ring_vs, other_vs])
kept = _poisson_thin(W[order_vs], 0.7 * h, keep_first=len(ring_vs), rng=rng)
sheet_vs = order_vs[kept]
pts = [W[sheet_vs]]
groups = [np.full(len(sheet_vs), 1, np.int8)]
for li, ring in enumerate(loops):
    p0, n, _ = planes[li]
    cap = _fill_cap(W[np.asarray(ring)], p0, n, h, rng)
    if len(cap):
        pts.append(cap)
        groups.append(np.full(len(cap), 2 + min(li, 1), np.int8))
Wsh = V - (bl_v + 0.7 * h)[:, None] * nv
Wshc, Tshc = _close_surface(Wsh, Fo, loops)
lo_b = W.min(axis=0)
hi_b = W.max(axis=0)
nx = np.maximum(((hi_b - lo_b) / (0.9 * h)).astype(int) + 1, 1)
gx = [lo_b[d] + (np.arange(nx[d]) + 0.5) * (hi_b[d] - lo_b[d]) / nx[d]
      for d in range(3)]
X, Y, Z = np.meshgrid(*gx, indexing="ij")
lat = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
lat = lat + rng.uniform(-0.1 * h, 0.1 * h, lat.shape)
lat = lat[_winding_inside(Wshc, Tshc, lat)]
for p0, n, area in planes:
    near = np.linalg.norm(lat - p0, axis=1) < 2.5 * np.sqrt(max(area, 1e-30) / np.pi)
    lat = lat[~(near & (np.abs((lat - p0) @ n) < 0.75 * h))]
fixed = np.concatenate(pts, axis=0)
both = np.concatenate([fixed, lat], axis=0)
sel = _poisson_thin(both, 0.6 * h, keep_first=len(fixed))
lat = both[sel[sel >= len(fixed)]]
pts.append(lat)
groups.append(np.full(len(lat), 4, np.int8))
pts = np.concatenate(pts, axis=0)
groups = np.concatenate(groups)

from scipy.spatial import Delaunay

Wcc, Tcc = _close_surface(W, Fo, loops)
tri = Delaunay(pts)
tets_all = tri.simplices.astype(np.int64)
cent = pts[tets_all].mean(axis=1)
pure_sheet = np.all(groups[tets_all] == 1, axis=1)
wind = _winding_inside(Wcc, Tcc, cent)
inside = wind | ~pure_sheet
Pt = pts[tets_all]
vol6 = np.einsum("ij,ij->i", np.cross(Pt[:, 1] - Pt[:, 0], Pt[:, 2] - Pt[:, 0]),
                 Pt[:, 3] - Pt[:, 0])
degen = np.abs(vol6) <= 1e-9 * h ** 3
inside &= ~degen
tets = tets_all[inside]
faces = np.concatenate([tets[:, [1, 2, 3]], tets[:, [0, 2, 3]],
                        tets[:, [0, 1, 3]], tets[:, [0, 1, 2]]])
fs = np.sort(faces, axis=1)
uniq, counts = np.unique(fs, axis=0, return_counts=True)
bnd = uniq[counts == 1]
captol = 0.05 * h
dcap = np.stack([np.abs((pts - p0) @ n) for p0, n, _ in planes], axis=1)
on_cap = dcap[bnd].max(axis=1) < captol
has_cap_site = np.isin(groups[bnd], (2, 3)).any(axis=1)
on_any = on_cap.any(axis=1) | has_cap_site
lat_faces = bnd[~on_any]
leak = np.any(groups[lat_faces] != 1, axis=1)
lf = lat_faces[leak]
print("n leak", len(lf), "  n degen tets", degen.sum(),
      " degen with lattice", (degen & ~pure_sheet).sum())

# adjacency of leak faces in FULL Delaunay
faces_all = np.concatenate([tets_all[:, [1, 2, 3]], tets_all[:, [0, 2, 3]],
                            tets_all[:, [0, 1, 3]], tets_all[:, [0, 1, 2]]])
fs_all = np.sort(faces_all, axis=1)
tid_all = np.tile(np.arange(len(tets_all)), 4)
import collections

fmap = collections.defaultdict(list)
for f, t in zip(map(tuple, fs_all.tolist()), tid_all):
    fmap[f].append(t)
for f in lf[:8]:
    key = tuple(sorted(f.tolist()))
    tids = fmap[key]
    msg = []
    for t in tids:
        msg.append(f"tet{t}: pure={pure_sheet[t]} wind={wind[t]} "
                   f"degen={degen[t]} kept={inside[t]}")
    print("face groups", groups[f], "| ", "; ".join(msg))
