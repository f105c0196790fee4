"""Probe: does delaunay_fsi_mesh handle a CURVED backbone + dome already?
(VERDICT r4 #7). Builds a quarter-torus tube with a sidewall dome on the
binormal side and runs the mesher + structural checks."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np


def curved_dome_stl(path, R=1.3, Rc=9.0, arc=1.2, A=1.8, sc_frac=0.5,
                    w=1.5, n_z=72, n_th=48, dome=True):
    """Tube of radius R along a circular arc of bend radius Rc spanning
    `arc` radians (arclength L = Rc*arc), optional Gaussian dome at
    s = sc_frac*L pointing along the binormal (out of the bend plane)."""
    from vasp_tpu.preprocessing.surface_mesh import write_stl

    L = Rc * arc
    s = np.linspace(0.0, L, n_z + 1)
    phi = s / Rc
    C = np.stack([Rc * np.sin(phi), np.zeros_like(phi),
                  Rc * (1 - np.cos(phi))], axis=1)
    T = np.stack([np.cos(phi), np.zeros_like(phi), np.sin(phi)], axis=1)
    N = np.stack([-np.sin(phi), np.zeros_like(phi), np.cos(phi)], axis=1)
    B = np.cross(T, N)
    th = 2 * np.pi * np.arange(n_th) / n_th
    S, TH = np.meshgrid(s, th, indexing="ij")
    ang = np.abs(np.mod(TH - np.pi / 2 + np.pi, 2 * np.pi) - np.pi)
    sc = sc_frac * L
    s2 = ((S - sc) / w) ** 2 + (R * ang / w) ** 2
    r = R + (A * np.exp(-s2 ** 1.5) if dome else 0.0)
    dirv = (np.cos(TH)[..., None] * N[:, None, :]
            + np.sin(TH)[..., None] * B[:, None, :])
    V = (C[:, None, :] + r[..., None] * dirv).reshape(-1, 3)

    def vid(i, j):
        return i * n_th + (j % n_th)

    F = []
    for i in range(n_z):
        for j in range(n_th):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            F.append([a, b, d])
            F.append([a, d, c])
    write_stl(path, V, np.asarray(F, np.int64))
    return R, L, A


def main():
    from vasp_tpu.preprocessing.delaunay_mesh import delaunay_fsi_mesh
    from vasp_tpu.preprocessing.surface_mesh import (
        read_stl, surface_tube_parameterization)
    from vasp_tpu.preprocessing.delaunay_mesh import _nearest_station_radius

    stl = "/tmp/curved_dome.stl"
    R, L, A = curved_dome_stl(stl)
    V, F = read_stl(stl)
    centers, e1, e2, r = surface_tube_parameterization(V, F)
    k_v, rad_v, rmed_v = _nearest_station_radius(V, centers, r)
    print(f"L={L:.2f} max rad ratio={np.max(rad_v / rmed_v):.2f} "
          f"n>1.45x={np.sum(rad_v > 1.45 * rmed_v)} "
          f"n>1.9x={np.sum(rad_v > 1.9 * rmed_v)}", flush=True)
    m = delaunay_fsi_mesh(stl, edge_length=0.5)
    print(f"mesh: {len(m.coords)} nodes {len(m.cells)} cells "
          f"cellmk={sorted(set(np.unique(m.cell_markers)))} "
          f"facetmk={sorted(set(np.unique(m.facet_markers)))}", flush=True)
    fv, c0, l0, c1, l1 = m._facet_tables
    n_ext = int((c1 < 0).sum())
    n_mk = int(np.isin(m.facet_markers, [2, 3, 11, 33]).sum())
    print(f"exterior facets {n_ext} marked {n_mk}", flush=True)
    P = m.coords[m.cells]
    v6 = np.einsum("ij,ij->i",
                   np.cross(P[:, 1] - P[:, 0], P[:, 2] - P[:, 0]),
                   P[:, 3] - P[:, 0])
    print(f"min vol6 {v6.min():.3e} (all>0: {(v6 > 0).all()})", flush=True)
    # dome presence: distance from the bend plane (y) beyond R
    y = np.abs(m.coords[:, 1])
    iface_vs = np.unique(m.facets[m.facet_markers == 22])
    fluid_vs = np.unique(m.cells[m.cell_markers == 1])
    print(f"iface max|y|={y[iface_vs].max():.2f} fluid max|y|="
          f"{y[fluid_vs].max():.2f} want > {R + 0.4 * A:.2f}", flush=True)


if __name__ == "__main__":
    main()
