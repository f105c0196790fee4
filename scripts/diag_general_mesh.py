"""Develop/debug driver for the general-surface mesher
(vasp_tpu/preprocessing/general_mesh.py): tube (sanity), curved dome,
branch junction, branch+dome."""
import sys
import traceback

sys.path.insert(0, "/root/repo")
import numpy as np


def branch_dome_stl(path, A=1.4, w=1.8, dome=True, m=8):
    """Y-junction wall surface extracted from the structured bifurcation
    template (facet 22 = FSI interface), optional Gaussian dome bump on
    daughter-1 pointing out of the branch plane (binormal +y)."""
    from vasp_tpu.preprocessing.bifurcation import (bifurcation_fsi_mesh,
                                                    template_specs)
    from vasp_tpu.preprocessing.delaunay_mesh import _patch_vertex_normals
    from vasp_tpu.preprocessing.surface_mesh import write_stl

    parent, d1, d2 = template_specs(r_parent=1.3, r_d1=1.05, r_d2=1.05,
                                    l_parent=8.0, l_daughter=10.0)
    mesh = bifurcation_fsi_mesh(parent, d1, d2, m=m, n_parent=10,
                                n_daughter=12, n_r_solid=1)
    fv = mesh.facets[mesh.facet_markers == 22]
    # orient each facet outward (away from its fluid cell)
    allfv, c0, l0, c1, l1 = mesh._facet_tables
    key = {tuple(sorted(f)): i for i, f in enumerate(allfv.tolist())}
    F = []
    for f in fv:
        i = key[tuple(sorted(f))]
        cf = c0[i] if mesh.cell_markers[c0[i]] == 1 else c1[i]
        cc = mesh.coords[mesh.cells[cf]].mean(axis=0)
        a, b, c = mesh.coords[f[0]], mesh.coords[f[1]], mesh.coords[f[2]]
        n = np.cross(b - a, c - a)
        F.append(f if np.dot(n, (a + b + c) / 3 - cc) > 0
                 else f[[0, 2, 1]])
    F = np.asarray(F, np.int64)
    used = np.unique(F)
    remap = np.full(len(mesh.coords), -1, np.int64)
    remap[used] = np.arange(len(used))
    V = mesh.coords[used].copy()
    F = remap[F]
    if dome:
        nv = _patch_vertex_normals(V, F)
        mid = d1.centers[len(d1.centers) // 2]
        # dome center: wall vertex nearest the daughter-1 midpoint,
        # displaced out of the branch plane
        q = V[np.argmin(np.linalg.norm(V - (mid + np.array([0, 1.05, 0])),
                                       axis=1))]
        dist = np.linalg.norm(V - q, axis=1)
        bump = A * np.exp(-((dist / w) ** 2) ** 1.5)
        V = V + bump[:, None] * nv
    write_stl(path, V, F)
    return V, F


def check(name, mesh, solver_step=False):
    fv, c0, l0, c1, l1 = mesh._facet_tables
    n_ext = int((c1 < 0).sum())
    n_mk = int(np.isin(mesh.facet_markers, [2, 3, 11, 33]).sum())
    P = mesh.coords[mesh.cells]
    v6 = np.einsum("ij,ij->i",
                   np.cross(P[:, 1] - P[:, 0], P[:, 2] - P[:, 0]),
                   P[:, 3] - P[:, 0])
    print(f"{name}: nodes={len(mesh.coords)} cells={len(mesh.cells)} "
          f"cellmk={sorted(int(x) for x in np.unique(mesh.cell_markers))} "
          f"facetmk={sorted(int(x) for x in np.unique(mesh.facet_markers))} "
          f"ext={n_ext} marked={n_mk} allpos={bool((v6 > 0).all())} "
          f"minv6={v6.min():.2e}", flush=True)
    return n_ext == n_mk and (v6 > 0).all()


def main():
    from vasp_tpu.preprocessing.general_mesh import delaunay_fsi_mesh_general

    which = sys.argv[1:] or ["tube", "curved", "branch", "branchdome"]
    if "tube" in which:
        try:
            m = delaunay_fsi_mesh_general(
                "/root/reference/tests/test_data/tube/tube.stl",
                scale_factor=1e-3)
            check("tube", m)
        except Exception:
            traceback.print_exc()
    if "curved" in which:
        try:
            sys.path.insert(0, "/root/repo/tests")
            from test_delaunay_mesh import _curved_dome_stl

            _curved_dome_stl("/tmp/curved_g.stl")
            m = delaunay_fsi_mesh_general("/tmp/curved_g.stl",
                                          edge_length=0.55)
            check("curved+dome", m)
            y = np.abs(m.coords[:, 1])
            ifv = np.unique(m.facets[m.facet_markers == 22])
            print(f"  iface max|y|={y[ifv].max():.2f} want>2.3", flush=True)
        except Exception:
            traceback.print_exc()
    if "branch" in which:
        try:
            branch_dome_stl("/tmp/branch.stl", dome=False)
            m = delaunay_fsi_mesh_general("/tmp/branch.stl",
                                          edge_length=0.55)
            check("branch", m)
        except Exception:
            traceback.print_exc()
    if "branchdome" in which:
        try:
            branch_dome_stl("/tmp/branchdome.stl", dome=True)
            m = delaunay_fsi_mesh_general("/tmp/branchdome.stl",
                                          edge_length=0.55)
            ok = check("branch+dome", m)
            y = m.coords[:, 1]
            ifv = np.unique(m.facets[m.facet_markers == 22])
            print(f"  iface max y={y[ifv].max():.2f}", flush=True)
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    main()
