"""Exactness and consistency of quadrature rules and shape functions."""
import numpy as np
import pytest

from vasp_tpu.fem.quadrature import tet_quadrature, tri_quadrature
from vasp_tpu.fem.shape import p1_tet, p2_tet, p1_tri, p2_tri, TET_EDGES


def _exact_tet_monomial(a, b, c):
    """int_tet x^a y^b z^c dx = a! b! c! / (a+b+c+3)!"""
    from math import factorial

    return (
        factorial(a) * factorial(b) * factorial(c) / factorial(a + b + c + 3)
    )


def _exact_tri_monomial(a, b):
    from math import factorial

    return factorial(a) * factorial(b) / factorial(a + b + 2)


@pytest.mark.parametrize("deg", [1, 2, 3, 4, 5, 6, 7, 8])
def test_tet_quadrature_exactness(deg):
    pts, w = tet_quadrature(deg)
    assert np.isclose(w.sum(), 1.0 / 6.0)
    for a in range(deg + 1):
        for b in range(deg + 1 - a):
            for c in range(deg + 1 - a - b):
                val = np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c)
                assert np.isclose(val, _exact_tet_monomial(a, b, c), rtol=1e-12), (
                    deg,
                    a,
                    b,
                    c,
                )


@pytest.mark.parametrize("deg", [1, 2, 3, 4, 5, 6])
def test_tri_quadrature_exactness(deg):
    pts, w = tri_quadrature(deg)
    assert np.isclose(w.sum(), 0.5)
    for a in range(deg + 1):
        for b in range(deg + 1 - a):
            val = np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b)
            assert np.isclose(val, _exact_tri_monomial(a, b), rtol=1e-12)


def test_partition_of_unity():
    pts, _ = tet_quadrature(4)
    for basis in (p1_tet, p2_tet):
        N, dN = basis(pts)
        assert np.allclose(N.sum(axis=1), 1.0)
        assert np.allclose(dN.sum(axis=1), 0.0, atol=1e-13)
    pts2, _ = tri_quadrature(4)
    for basis in (p1_tri, p2_tri):
        N, dN = basis(pts2)
        assert np.allclose(N.sum(axis=1), 1.0)
        assert np.allclose(dN.sum(axis=1), 0.0, atol=1e-13)


def test_p2_tet_nodal_values():
    """P2 basis is 1 at its own node, 0 at others."""
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float
    )
    mids = np.array([(verts[a] + verts[b]) / 2 for a, b in TET_EDGES])
    nodes = np.concatenate([verts, mids], axis=0)
    N, _ = p2_tet(nodes)
    assert np.allclose(N, np.eye(10), atol=1e-14)


def test_p2_gradient_fd():
    """Gradients match finite differences of values."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.25, size=(5, 3))
    N, dN = p2_tet(pts)
    h = 1e-6
    for k in range(3):
        dp = pts.copy()
        dp[:, k] += h
        Np, _ = p2_tet(dp)
        fd = (Np - N) / h
        assert np.allclose(fd, dN[:, :, k], atol=1e-5)
